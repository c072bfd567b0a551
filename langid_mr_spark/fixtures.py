"""Deterministic synthetic web_pages corpus (FIXTURES.md §1/§3, seed=42).

Generates the BASELINE.json input_hint schema
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
`lang` is the generator's ground-truth label — used only for evaluation,
never read by the pipeline. The html payload embeds `text` such that
textnorm.extract_text_from_html recovers it byte-identically (the input_hint
per-row invariant).

Case families mirror the reference's own test scenarios
(tests/test_enfr_gate.py, test_truncation.py — see FIXTURES.md §3), rewritten
as web-page text. No wall-clock, no global RNG: numpy default_rng(seed).
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd

from . import textnorm as TN

_EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

# (template_text, ground_truth_lang, family_tag)
CASES: list[tuple[str, str, str]] = [
    # clean high-confidence EN/FR (test_enfr_gate.py:16-52)
    ("the quick brown fox jumps over the lazy dog while we talk about the "
     "weather and the news of the day with our friends", "en", "clean_en"),
    ("you should know that we are here to help you with your questions and "
     "your orders every day of the week", "en", "clean_en"),
    ("bonjour je parle français avec mes amis et nous discutons souvent de "
     "musique et de cinéma pendant la soirée", "fr", "clean_fr"),
    ("vous devez savoir que nous sommes là pour vous aider avec vos "
     "questions et vos commandes tous les jours", "fr", "clean_fr"),
    # stopword-saturated (high ratio; lands high-conf with the real scorer)
    ("the and to of in you your for is on it that with this as at be are "
     "we our us story", "en", "sw_en"),
    ("le la les un une des et ou mais que qui pour avec sur pas ce cette "
     "est sont je tu il elle nous vous ils elles", "fr", "sw_fr"),
    # mixed-language mid-zone (p in [MID_LOWER, MID_UPPER), ratio-decided;
    # test_enfr_gate.py:55-91 analog with the real scorer)
    ("the weather report avec le soleil is here for you today mes amis "
     "and the news", "en", "mid_en"),
    ("le rapport de la météo with the sunshine est ici pour vous "
     "aujourd'hui mes amis et les nouvelles", "fr", "mid_fr"),
    # bracketed foreign boilerplate → pass-1 undecided, pass-2 accept
    # (vad_retry; test_enfr_gate.py:94-116 analog)
    ("[hola amigos página web menú principal] the quick brown fox jumps "
     "over the lazy dog [más información aquí]", "en", "vad_en"),
    ("[menú navegación página] bonjour je parle avec mes amis de la "
     "musique [derechos reservados aquí]", "fr", "vad_fr"),
    # stopword-poor / proper-noun heavy → VAD retry (lang_gate.py:383-396)
    ("bonjour musique incroyable liberté soleil amour montagne rivière "
     "château jardin", "fr", "sketchy"),
    ("Zanzibar Kilimanjaro Serengeti Okavango Madagascar Mozambique "
     "Botswana Namibia Tanzania safari", "other", "sketchy"),
    # non-EN/FR → fallback (test_enfr_gate.py:118-132)
    ("hola yo hablo español con mis amigos y hablamos a menudo de música y "
     "de cine durante la noche", "other", "non_enfr"),
    ("hallo ich spreche deutsch mit meinen freunden und wir reden oft über "
     "musik und kino am abend", "other", "non_enfr"),
    # boilerplate/music-only (test_enfr_gate.py:204-249)
    ("Music", "none", "music_only"),
    ("[music]", "none", "music_only"),
    ("musique", "none", "music_only"),
    ("♪", "none", "music_only"),
    ("[♪]", "none", "music_only"),
    ("[♫ OUTRO MUSIC PLAYING ♫]", "none", "music_only"),
    ("♬ soft music ♬", "none", "music_only"),
    ("♪ musique ♪", "none", "music_only"),
    ("background music only", "none", "music_only"),
    # filler+keyword mix that is NOT music-only (lang_gate.py:147-162)
    ("music outro anthony playing", "en", "not_music"),
    # truncation (test_truncation.py:28-36)
    ("one two three four five six seven eight nine ten eleven twelve and "
     "the rest of the words in the story are for you", "en", "truncation"),
    # short text (<6 tokens, lang_gate.py:357-359)
    ("hello there my friend", "en", "short"),
    # empty text (lang_gate.py:96-99)
    ("", "none", "empty"),
    # apostrophe tokenization (lang_gate.py:92)
    ("well, it's for the one and only story that we tell to you today my "
     "friends", "en", "apostrophe"),
    # PII scrub targets (north_star; SURVEY §2.3 X21)
    ("please contact alice@example.com or call +1-555-0100 from the office "
     "at 192.168.0.1 to get the report about the new offer today", "en", "pii"),
    # bracketed boilerplate around real text → pass-2 accept
    ("[header navigation menu] the story continues here with more words "
     "about the weather and the news for you and me today [footer "
     "copyright notice]", "en", "bracketed"),
]

_EN_WORDS = ("the and to of in you your for is on it that with this story "
             "weather news friends help questions orders day week time work "
             "house water light morning river garden music report offer").split()
_FR_WORDS = ("le la les un une des et ou que qui pour avec sur ce cette est "
             "je nous vous histoire musique cinéma soirée questions commandes "
             "jour semaine temps travail maison eau lumière matin jardin").split()
_ES_WORDS = ("hola el la los las un una y o que para con este esta es yo "
             "nosotros historia música cine noche preguntas pedidos día "
             "semana tiempo trabajo casa agua luz mañana jardín").split()

# Coherent running text per language (written for these fixtures — NOT the
# scorer's embedded training sentences): most real web pages are fluent
# prose that the first scoring pass decides, so most filler documents are
# contiguous spans of these, with a word-salad minority for the noisy tail.
_EN_PROSE = (
    "last night we walked along the river and watched the city lights come "
    "on one by one while the rain held off just long enough . the shop on "
    "the corner sells fresh bread every morning and the smell drifts down "
    "the whole street before the buses start running . she finished the "
    "report before lunch and spent the afternoon answering questions from "
    "the new team about the project and the plan for next week . if you "
    "want to learn a new skill you should practice a little every day and "
    "ask for help when you get stuck because that is how everyone improves "
    ". the garden needs water in the summer and the flowers near the fence "
    "always bloom first when the light returns in the spring ."
).split()
_FR_PROSE = (
    "hier soir nous avons marché le long de la rivière et regardé les "
    "lumières de la ville s'allumer une par une pendant que la pluie "
    "attendait encore un peu . la boutique du coin vend du pain frais "
    "chaque matin et l'odeur descend toute la rue avant le passage des "
    "premiers bus . elle a terminé le rapport avant midi et a passé "
    "l'après-midi à répondre aux questions de la nouvelle équipe sur le "
    "projet et le plan de la semaine prochaine . si vous voulez apprendre "
    "une nouvelle compétence il faut pratiquer un peu chaque jour et "
    "demander de l'aide quand on est bloqué parce que c'est ainsi que tout "
    "le monde progresse . le jardin a besoin d'eau en été et les fleurs "
    "près de la clôture fleurissent toujours en premier au printemps ."
).split()
_ES_PROSE = (
    "anoche caminamos a lo largo del río y vimos las luces de la ciudad "
    "encenderse una por una mientras la lluvia esperaba un poco más . la "
    "tienda de la esquina vende pan fresco cada mañana y el olor baja por "
    "toda la calle antes de que pasen los primeros autobuses . ella terminó "
    "el informe antes del mediodía y pasó la tarde respondiendo preguntas "
    "del nuevo equipo sobre el proyecto y el plan de la próxima semana . si "
    "quieres aprender una nueva habilidad debes practicar un poco cada día "
    "y pedir ayuda cuando te quedes atascado porque así es como todos "
    "mejoran ."
).split()


def _synth_text(rng: np.random.Generator, lang: str, n_words: int) -> str:
    # 70% coherent prose span (pass-1-decidable, like real fluent pages),
    # 30% word salad (the low-signal tail that exercises pass 2/3)
    if rng.random() < 0.7:
        prose = {"en": _EN_PROSE, "fr": _FR_PROSE, "other": _ES_PROSE}[lang]
        start = int(rng.integers(0, max(len(prose) - n_words, 1)))
        return " ".join(prose[start:start + n_words])
    pool = {"en": _EN_WORDS, "fr": _FR_WORDS, "other": _ES_WORDS}[lang]
    return " ".join(pool[i] for i in rng.integers(0, len(pool), n_words))


def make_corpus(n: int = 500, seed: int = 42,
                long_doc_every: int = 101) -> pd.DataFrame:
    """n-row corpus: the fixed case families cycled + seeded synthetic filler,
    with periodic 100×-length documents to exercise skew handling
    (FIXTURES.md §3 'long-doc skew')."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 == 0:
            text, lang, family = CASES[(i // 3) % len(CASES)]
        else:
            # web-realistic language mix; spans long enough that fluent
            # pages are mostly first-pass-decidable
            u = rng.random()
            lang = "en" if u < 0.45 else ("fr" if u < 0.75 else "other")
            text = _synth_text(rng, lang, int(rng.integers(15, 90)))
            family = f"synth_{lang}"
        if long_doc_every and i % long_doc_every == long_doc_every - 1 and text:
            text = " ".join([text] * 100)
            family += "_long"
        url = f"https://site{i % 97}.example/{hashlib.sha1(str(i).encode()).hexdigest()[:12]}"
        ts = _EPOCH + dt.timedelta(seconds=37 * i + 86400 * (i % 5))
        rows.append({
            "url": url,
            "warc_ts": ts,
            "html": TN.wrap_html(text, title=f"t{i}"),
            "text": text,
            "lang": lang,
            "family": family,
        })
    return pd.DataFrame(rows)


INPUT_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string, family string")


def corpus_df(spark, n: int = 500, seed: int = 42, num_partitions: int = 8):
    """Spark DataFrame in the input_hint schema (+ family tag for tests)."""
    pdf = make_corpus(n, seed)
    return spark.createDataFrame(pdf, schema=INPUT_SCHEMA).repartition(num_partitions)


def write_corpus(spark, path: str, n: int, seed: int = 42,
                 num_partitions: int = 32) -> None:
    corpus_df(spark, n, seed, num_partitions).write.mode("overwrite").parquet(path)
