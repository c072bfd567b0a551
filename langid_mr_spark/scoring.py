"""Deterministic language-ID and perplexity scorers.

The reference's model surface is four call sites on one lazily-loaded
faster-whisper singleton (SURVEY.md §2.4: M1-M6, detector.py:20-47). The
webtext swap per BASELINE.json north_star: a fastText-style hashed
character-trigram Naive-Bayes language identifier and a KenLM-style
character-n-gram log-probability ("perplexity") scorer — both pure functions
of the text, derived deterministically from small corpora embedded below
(no wall-clock, no RNG, no external downloads).

Vectorization: batch scoring is pure NumPy — all texts in an Arrow batch are
concatenated into one uint32 codepoint array, trigram bucket ids are computed
with vectorized rolling hashes, per-language log-prob lookups are dense-array
gathers, and per-document sums use np.add.reduceat. No per-row Python in the
hot path (input_hint requirement). The same `score_batch` function backs both
the Spark iterator pandas UDFs and the row-at-a-time oracle (batch of one),
so Spark-vs-oracle agreement is exact by construction.

Spark surface (iterator pandas UDFs ≙ M1's load-once singleton pattern:
the model table is materialized once per Python worker, then reused across
Arrow batches):
  - ``langid_scores_udf``: text → struct<lang:string, prob:double>   (M2/M4)
  - ``ppl_scores_udf``:    text → struct<ppl_en:double, ppl_fr:double> (M5)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import constants as C

# --- Embedded training corpora (deterministic "model weights") ---------------
# Small, hand-written sentence sets per language. These play the role of the
# reference's pretrained whisper weights: fixed data shipped with the engine.

_CORPORA: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog while we talk about the "
        "weather and the news of the day . this is a simple english sentence "
        "with many common words that people use every day . you should know "
        "that we are here to help you with your questions and your orders . "
        "there is more than one way to do it but the best way is often the "
        "simplest one . it was the best of times and it was the worst of "
        "times . please add these items to the cart and check out now for "
        "free shipping today only . what do you think about this new offer . "
        "they said that they would come here when the work was done . "
        "music is playing softly in the background of the room ."
    ),
    "fr": (
        "bonjour je parle français avec mes amis et nous discutons souvent "
        "de musique et de cinéma . c'est une phrase simple en français avec "
        "beaucoup de mots courants que les gens utilisent tous les jours . "
        "vous devez savoir que nous sommes là pour vous aider avec vos "
        "questions et vos commandes . il y a plus d'une façon de le faire "
        "mais la meilleure est souvent la plus simple . c'était le meilleur "
        "des temps et c'était le pire des temps . veuillez ajouter ces "
        "articles au panier et payer maintenant pour la livraison gratuite "
        "aujourd'hui seulement . que pensez vous de cette nouvelle offre . "
        "ils ont dit qu'ils viendraient ici quand le travail serait fini . "
        "la musique joue doucement dans le fond de la salle ."
    ),
    "es": (
        "hola yo hablo español con mis amigos y hablamos a menudo de música "
        "y de cine . esta es una frase sencilla en español con muchas "
        "palabras comunes que la gente usa todos los días . usted debe saber "
        "que estamos aquí para ayudarle con sus preguntas y sus pedidos . "
        "hay más de una manera de hacerlo pero la mejor suele ser la más "
        "sencilla . era el mejor de los tiempos y era el peor de los "
        "tiempos . por favor añada estos artículos al carrito y pague ahora "
        "para el envío gratis solo hoy . qué piensa usted de esta nueva "
        "oferta . ellos dijeron que vendrían aquí cuando el trabajo "
        "estuviera terminado . la música suena suavemente en el fondo ."
    ),
    "de": (
        "hallo ich spreche deutsch mit meinen freunden und wir reden oft "
        "über musik und kino . dies ist ein einfacher deutscher satz mit "
        "vielen häufigen wörtern die die leute jeden tag benutzen . sie "
        "sollten wissen dass wir hier sind um ihnen mit ihren fragen und "
        "ihren bestellungen zu helfen . es gibt mehr als einen weg aber der "
        "beste weg ist oft der einfachste . es war die beste aller zeiten "
        "und es war die schlimmste aller zeiten . bitte legen sie diese "
        "artikel in den warenkorb und zahlen sie jetzt für den kostenlosen "
        "versand nur heute . was denken sie über dieses neue angebot . sie "
        "sagten dass sie hierher kommen würden wenn die arbeit getan wäre . "
        "die musik spielt leise im hintergrund des raumes ."
    ),
}

LANGS: tuple[str, ...] = ("en", "fr", "es", "de")

# --- Hashed trigram model -----------------------------------------------------

_BUCKET_BITS = 18
_N_BUCKETS = 1 << _BUCKET_BITS
_MASK = np.uint64(_N_BUCKETS - 1)
_P1, _P2, _P3 = np.uint64(2654435761), np.uint64(40503), np.uint64(2862933555777941757)
# Softmax temperature: scales per-trigram avg log-prob differences into
# posteriors that spread across the gate's probability bands.
_TEMPERATURE = 3.0
_SMOOTH = 0.5  # additive smoothing per bucket


def _codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts → (uint32 codepoint array, int64 doc offsets)."""
    joined = "".join(texts)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return cps, offsets


def _trigram_buckets(cps: np.ndarray) -> np.ndarray:
    """Vectorized rolling hash of every length-3 window → bucket ids."""
    if cps.size < 3:
        return np.empty(0, dtype=np.int64)
    a = cps[:-2].astype(np.uint64)
    b = cps[1:-1].astype(np.uint64)
    c = cps[2:].astype(np.uint64)
    h = (a * _P1) ^ (b * _P2) ^ (c * _P3)
    return (h & _MASK).astype(np.int64)


def _build_tables() -> np.ndarray:
    """(n_langs, n_buckets) float64 log-prob table, built at import time."""
    tables = np.empty((len(LANGS), _N_BUCKETS), dtype=np.float64)
    for i, lang in enumerate(LANGS):
        text = _CORPORA[lang].lower()
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        buckets = _trigram_buckets(cps)
        counts = np.bincount(buckets, minlength=_N_BUCKETS).astype(np.float64)
        counts += _SMOOTH
        tables[i] = np.log(counts / counts.sum())
    return tables


_TABLES: np.ndarray | None = None


def get_tables() -> np.ndarray:
    """Lazy singleton, mirroring detector.get_model (detector.py:20-47)."""
    global _TABLES
    if _TABLES is None:
        _TABLES = _build_tables()
    return _TABLES


# Internal chunking budget (chars). A full 2048-doc × 4000-char Arrow batch
# allocates ~400 MB of fresh numpy intermediates; on this sandbox fresh
# pages fault at ~10 MB/s under co-tenant load, so a worker's FIRST batch
# could cost tens of seconds. Chunking bounds each allocation to a few MB —
# after the first chunk the allocator serves repeats from its arena (no new
# page faults). Chunk boundaries are whole documents and every per-document
# sum is an exact reduceat segment, so results are bit-identical to the
# unchunked computation (the oracle-parity invariant).
_CHUNK_CHARS = 500_000


def score_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch langid: returns (lang_idx int64[n], prob float64[n],
    avg_logprob float64[n_langs, n]).

    Documents with <3 characters have no trigrams: every language gets the
    EMPTY_LOGPROB_SENTINEL, posterior is uniform, argmax ties → LANGS[0]
    ("en", preserving Python max() first-key tie behavior, lang_gate.py:253).
    """
    n = len(texts)
    total_chars = sum(len(t) if t else 0 for t in texts)
    if n > 1 and total_chars > _CHUNK_CHARS:
        li_parts, pr_parts, avg_parts = [], [], []
        start, chars = 0, 0
        for i, t in enumerate(texts):
            chars += len(t) if t else 0
            if chars >= _CHUNK_CHARS and i + 1 > start:
                li, pr, av = _score_chunk(texts[start:i + 1])
                li_parts.append(li); pr_parts.append(pr); avg_parts.append(av)
                start, chars = i + 1, 0
        if start < n:
            li, pr, av = _score_chunk(texts[start:])
            li_parts.append(li); pr_parts.append(pr); avg_parts.append(av)
        return (np.concatenate(li_parts), np.concatenate(pr_parts),
                np.concatenate(avg_parts, axis=1))
    return _score_chunk(texts)


def _score_chunk(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    tables = get_tables()
    n = len(texts)
    lowered = [(t or "").lower() for t in texts]
    cps, offsets = _codepoints(lowered)
    buckets = _trigram_buckets(cps)

    # Trigram windows must not span document boundaries: a window starting at
    # position j belongs to doc d iff j+3 <= offsets[d+1].
    starts = offsets[:-1]
    ends = offsets[1:]
    n_tri = np.maximum(ends - starts - 2, 0)

    avg = np.full((len(LANGS), n), C.EMPTY_LOGPROB_SENTINEL, dtype=np.float64)
    if buckets.size:
        # Per-document EXACT segments [starts[d], ends[d]-2): interleaved
        # start/end reduceat indices so each doc sums precisely its own
        # trigram windows (cross-boundary windows fall into the ignored odd
        # segments). This makes the per-doc summation bit-identical to a
        # batch-of-one run — summing the same values over the same length —
        # so scores are independent of batch composition (the oracle-parity
        # invariant). Zero-padding keeps every index < len for reduceat.
        idx = np.empty(2 * n, dtype=np.int64)
        idx[0::2] = starts
        idx[1::2] = np.maximum(ends - 2, starts)
        for li in range(len(LANGS)):
            lp = tables[li, buckets]
            lp_pad = np.concatenate([lp, np.zeros(3, dtype=np.float64)])
            sums = np.add.reduceat(lp_pad, idx)[0::2]
            with np.errstate(invalid="ignore", divide="ignore"):
                avg[li] = np.where(n_tri > 0, sums / np.maximum(n_tri, 1),
                                   C.EMPTY_LOGPROB_SENTINEL)

    # Softmax over languages with temperature; sentinel rows → uniform.
    z = avg * _TEMPERATURE
    z = z - z.max(axis=0, keepdims=True)
    ez = np.exp(z)
    post = ez / ez.sum(axis=0, keepdims=True)
    # argmax with tie → lowest index (numpy argmax already picks first max)
    lang_idx = post.argmax(axis=0)
    prob = post[lang_idx, np.arange(n)]
    return lang_idx, prob, avg


def langid_one(text: str) -> tuple[str, float]:
    """Row-at-a-time twin used by the oracle — same code path, batch of 1."""
    idx, prob, _ = score_batch([text])
    return LANGS[int(idx[0])], float(prob[0])


def ppl_one(text: str) -> tuple[float, float]:
    """Oracle twin of the fallback scorer (M5, lang_gate.py:222-259)."""
    _, _, avg = score_batch([text])
    return float(avg[LANGS.index("en"), 0]), float(avg[LANGS.index("fr"), 0])


# --- Spark UDFs ----------------------------------------------------------------
#
# Poison-row capture (D5, runner.py:192-199): the reference retries a failing
# job MAX_RETRIES times and then marks it failed; at 100 TB of real web bytes
# one undecodable document must become an error ROW, not a task that dies 4×
# and kills the job. Each UDF scores the whole Arrow batch on the vectorized
# fast path (zero overhead when clean); if the batch throws, it re-scores
# row-at-a-time and captures per-row exceptions into the ``error`` field.
# gate.apply_gate routes rows with error IS NOT NULL to drop_reason='error'.

_LANGID_TYPE = T.StructType([
    T.StructField("lang", T.StringType()),
    T.StructField("prob", T.DoubleType()),
    T.StructField("error", T.StringType()),
])
_PPL_TYPE = T.StructType([
    T.StructField("ppl_en", T.DoubleType()),
    T.StructField("ppl_fr", T.DoubleType()),
    T.StructField("error", T.StringType()),
])


def _capture(batch_fn, texts: list[str], names: tuple[str, ...]) -> pd.DataFrame:
    """Run ``batch_fn(texts) -> tuple of arrays``; on failure isolate poison
    rows with batch-of-one retries. Always returns columns names + error."""
    n = len(texts)
    try:
        cols = batch_fn(texts)
        out = {k: v for k, v in zip(names, cols)}
        out["error"] = [None] * n
        return pd.DataFrame(out)
    except Exception:
        rows: dict[str, list] = {k: [] for k in names}
        errs: list[str | None] = []
        for t in texts:
            try:
                cols = batch_fn([t])
                for k, v in zip(names, cols):
                    rows[k].append(v[0])
                errs.append(None)
            except Exception as e:  # the poison row, captured not fatal
                for k in names:
                    rows[k].append(None)
                errs.append(f"{type(e).__name__}: {e}"[:200])
        rows["error"] = errs
        return pd.DataFrame(rows)


def make_langid_udf(batch_fn=None):
    """Build a langid scorer UDF from ``batch_fn: list[str] -> (langs,
    probs)``. Tests inject throwing functions to assert the poison-row
    contract; production uses score_batch."""
    if batch_fn is None:
        def batch_fn(texts):
            lang_idx, prob, _ = score_batch(texts)
            return np.array(LANGS)[lang_idx], prob

    @F.pandas_udf(_LANGID_TYPE)
    def udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        """M2/M4 analog: first-pass autodetect over the probe text.

        Iterator form so the model table is resolved once per Python worker
        (M1's singleton pattern, detector.py:20-47)."""
        get_tables()
        for series in it:
            yield _capture(batch_fn, series.fillna("").tolist(),
                           ("lang", "prob"))

    return udf


def make_ppl_udf(batch_fn=None):
    """Build the fallback EN/FR scorer UDF from ``batch_fn: list[str] ->
    (ppl_en, ppl_fr)`` with the same poison-row capture."""
    if batch_fn is None:
        i_en, i_fr = LANGS.index("en"), LANGS.index("fr")

        def batch_fn(texts):
            _, _, avg = score_batch(texts)
            return avg[i_en], avg[i_fr]

    @F.pandas_udf(_PPL_TYPE)
    def udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        """M5 analog: constrained EN-vs-FR scoring for the fallback branch.
        Returns per-language avg char-trigram log-prob (−99.0 sentinel on
        empty, lang_gate.py:244-245)."""
        get_tables()
        for series in it:
            yield _capture(batch_fn, series.fillna("").tolist(),
                           ("ppl_en", "ppl_fr"))

    return udf


langid_scores_udf = make_langid_udf()
ppl_scores_udf = make_ppl_udf()
