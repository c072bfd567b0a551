"""Cascade tests — every scenario from the reference's test_enfr_gate.py,
ported to DataFrame rows with injected scorers (the mock-detector pattern,
reference tests/conftest.py:24), asserted on BOTH the Spark gate and the
pure-Python oracle so the two are pinned to each other and to the reference.
"""

import pytest
from pyspark.sql import functions as F

from langid_mr_spark import constants as C
from langid_mr_spark import gate, oracle

EN_T = "the quick brown fox jumps over the lazy dog while we talk about the weather"
FR_T = "bonjour je parle francais avec mes amis et nous discutons souvent de musique"
MID_EN_T = "the and to of in you your for is on it that with this as at be are we our us"
MID_FR_T = ("le la les un une des et ou mais que qui pour avec sur pas ce "
            "cette est sont je tu il elle nous vous ils elles")
SKETCHY_T = "bonjour musique incroyable liberte soleil amour"
PROPER_T = "Zanzibar Kilimanjaro Serengeti Okavango Madagascar Mozambique Botswana"

SCHEMA = ("id int, text string, m_lang1 string, m_p1 double, "
          "m_lang2 string, m_p2 double, m_ppl_en double, m_ppl_fr double")


def run_cases(spark, cases, strict=False):
    """cases: list of (text, lang1, p1, lang2, p2, ppl_en, ppl_fr).
    Returns (spark_rows_by_id, oracle_results_by_id)."""
    rows = [(i, *c) for i, c in enumerate(cases)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = gate.apply_gate(
        df, text_col="text",
        scorer=lambda _: F.struct(F.col("m_lang1").alias("lang"),
                                  F.col("m_p1").alias("prob")),
        scorer2=lambda _: F.struct(F.col("m_lang2").alias("lang"),
                                   F.col("m_p2").alias("prob")),
        ppl_scorer=lambda _: F.struct(F.col("m_ppl_en").alias("ppl_en"),
                                      F.col("m_ppl_fr").alias("ppl_fr")),
        strict_reject=strict,
        persist_level=None,
    ).collect()
    got = {r["id"]: r for r in out}
    orc = {
        i: oracle.gate_one(
            c[0],
            lang_scorer=lambda _, c=c: (c[1], c[2]),
            lang_scorer2=lambda _, c=c: (c[3], c[4]),
            ppl_scorer=lambda _, c=c: (c[5], c[6]),
            strict_reject=strict,
        )
        for i, c in enumerate(cases)
    }
    assert set(got) == set(orc)
    for i in got:
        for f in ("gate_decision", "language", "detection_method", "use_vad",
                  "token_count", "music_only", "mid_zone", "keep",
                  "drop_reason", "gate_path", "pipeline_mode"):
            assert got[i][f] == orc[i][f], (i, f, got[i][f], orc[i][f])
        for f in ("probability", "en_ratio", "fr_ratio"):
            a, b = got[i][f], orc[i][f]
            assert (a is None) == (b is None) and (
                a is None or a == pytest.approx(b, abs=1e-12)), (i, f, a, b)
    return got, orc


def test_high_conf_accepts_en_fr(spark):
    got, _ = run_cases(spark, [
        (EN_T, "en", 0.9, "en", 0.9, -1.0, -2.0),
        (FR_T, "fr", 0.9, "fr", 0.9, -2.0, -1.0),
    ])
    for i, lang in ((0, "en"), (1, "fr")):
        r = got[i]
        assert r["gate_decision"] == "accepted_high_conf"
        assert r["language"] == lang
        assert r["detection_method"] == "autodetect"
        assert r["use_vad"] is False
        assert r["mid_zone"] is False
        assert r["music_only"] is False
        assert r["keep"] is True
        assert r["gate_path"] == "high_conf_base"
        assert r["pipeline_mode"] == "BASE"


def test_mid_zone_accepts_without_vad(spark):
    got, _ = run_cases(spark, [
        (MID_EN_T, "en", 0.68, "en", 0.0, -1.0, -2.0),
        (MID_FR_T, "fr", 0.70, "fr", 0.0, -1.0, -2.0),
    ])
    assert got[0]["gate_decision"] == "accepted_mid_zone_en"
    assert got[1]["gate_decision"] == "accepted_mid_zone_fr"
    for i in (0, 1):
        assert got[i]["use_vad"] is False
        assert got[i]["mid_zone"] is True
        assert got[i]["detection_method"] == "autodetect"
        assert got[i]["keep"] is True


def test_sketchy_mid_zone_triggers_vad(spark):
    # test_enfr_gate.py:94-116 — few EN stopwords at p=0.65 → VAD retry
    got, _ = run_cases(spark, [(SKETCHY_T, "en", 0.65, "en", 0.82, -1.0, -2.0)])
    r = got[0]
    assert r["gate_decision"] == "vad_retry"
    assert r["language"] == "en"
    assert r["detection_method"] == "autodetect-vad"
    assert r["use_vad"] is True
    assert r["music_only"] is False


def test_high_prob_unspeechy_guard(spark):
    # lang_gate.py:383-396 — p=0.91 alone is NOT enough (stopword-poor)
    got, _ = run_cases(spark, [(PROPER_T, "fr", 0.91, "fr", 0.95, -1.0, -2.0)])
    r = got[0]
    assert r["gate_decision"] == "vad_retry"
    assert r["use_vad"] is True
    # C6 reports FIRST-pass ratios/token_count (lang_gate.py:507-509)
    assert r["token_count"] == 7
    assert r["probability"] == 0.95


def test_vad_retry_low_then_accept(spark):
    # test_enfr_gate.py:173-188 — 0.3 then fr/0.8 via VAD
    got, _ = run_cases(spark, [("", "en", 0.3, "fr", 0.8, -1.0, -2.0)])
    r = got[0]
    assert r["gate_decision"] == "vad_retry"
    assert r["language"] == "fr"
    assert r["detection_method"] == "autodetect-vad"
    assert r["use_vad"] is True
    assert r["mid_zone"] is False  # 0.8 ≥ MID_UPPER


def test_fallback_picks_en(spark):
    # test_enfr_gate.py:118-132 — non-EN/FR → fallback, probability None
    got, _ = run_cases(spark, [("", "es", 0.4, "es", 0.4, -1.0, -2.0)])
    r = got[0]
    assert r["gate_decision"] == "fallback"
    assert r["language"] == "en"  # ppl_en > ppl_fr
    assert r["detection_method"] == "fallback"
    assert r["probability"] is None
    assert r["use_vad"] is True
    assert r["keep"] is True
    assert r["mid_zone"] is False  # None → 0.0 (lang_gate.py:187)
    assert r["gate_path"] == "fallback"
    assert r["pipeline_mode"] == "FALLBACK"


def test_fallback_tie_goes_en(spark):
    got, _ = run_cases(spark, [("", "es", 0.4, "es", 0.4, -5.0, -5.0)])
    assert got[0]["language"] == "en"  # Python max() tie → first key


def test_strict_reject(spark):
    # test_enfr_gate.py:134-143 — HTTP 400 becomes an error row (SURVEY §2.5)
    got, _ = run_cases(spark, [("", "es", 0.42, "es", 0.42, -1.0, -2.0)],
                       strict=True)
    r = got[0]
    assert r["gate_decision"] == "strict_reject"
    assert r["keep"] is False
    assert r["drop_reason"] == "non_en_fr_strict"


MUSIC_CASES = ["Music", "[music]", "musique"]
MUSIC_UNICODE = ["♪", "[♪]", "[♫ OUTRO MUSIC PLAYING ♫]", "♬ soft music ♬",
                 "♪ musique ♪"]


@pytest.mark.parametrize("t", MUSIC_CASES + MUSIC_UNICODE)
def test_music_only_short_circuits(spark, t):
    # test_enfr_gate.py:204-249 — C1 wins even at p=0.92
    got, _ = run_cases(spark, [(t, "en", 0.92, "en", 0.92, -1.0, -2.0)])
    r = got[0]
    assert r["gate_decision"] == "NO_SPEECH_MUSIC_ONLY"
    assert r["language"] == "none"
    assert r["music_only"] is True
    assert r["use_vad"] is False
    assert r["keep"] is False
    assert r["drop_reason"] == "music_only"
    assert r["en_ratio"] == 0.0 and r["fr_ratio"] == 0.0
    if t in MUSIC_CASES:
        assert r["token_count"] <= 2
    assert r["gate_path"] == "music_only"
    assert r["pipeline_mode"] == "MUSIC_ONLY"


def test_filler_keyword_mix_not_music(spark):
    # lang_gate.py:147-162 — non-filler residue "anthony" → NOT music-only
    got, _ = run_cases(spark,
                       [("music outro anthony playing", "en", 0.92,
                         "en", 0.92, -1.0, -2.0)])
    assert got[0]["gate_decision"] != "NO_SPEECH_MUSIC_ONLY"
    assert got[0]["music_only"] is False


def test_vad_pass_music_only(spark):
    # lang_gate.py:472-488 — C5: undecided pass-1, cleaned text music-only
    # text: brackets make pass1 text non-music; vad_clean strips the words
    # leaving pure glyph → music.  p1 low so pass 1 is undecided.
    got, _ = run_cases(spark,
                       [("♪ (instrumental interlude section) ♪", "en", 0.3,
                         "en", 0.3, -1.0, -2.0)])
    r = got[0]
    assert r["gate_decision"] == "NO_SPEECH_MUSIC_ONLY"
    assert r["detection_method"] == "autodetect-vad"
    assert r["use_vad"] is True
    assert r["music_only"] is True


def test_probability_band_edges(spark):
    got, _ = run_cases(spark, [
        (MID_EN_T, "en", 0.60, "en", 0.0, -1.0, -2.0),   # = MID_LOWER → mid
        (MID_EN_T, "en", 0.599, "en", 0.9, -1.0, -2.0),  # < MID_LOWER → vad
        (EN_T, "en", 0.79, "en", 0.0, -1.0, -2.0),       # = MID_UPPER → high
    ])
    assert got[0]["gate_decision"] == "accepted_mid_zone_en"
    assert got[1]["gate_decision"] == "vad_retry"
    assert got[2]["gate_decision"] == "accepted_high_conf"
    assert got[2]["mid_zone"] is False  # band is [0.60, 0.79)


def test_mid_zone_needs_margin_and_tokens(spark):
    # en_ratio must beat fr_ratio by STOPWORD_MARGIN and have ≥10 tokens
    few = "the and to of in"  # 5 tokens, all stopwords
    got, _ = run_cases(spark, [(few, "en", 0.68, "en", 0.1, -1.0, -2.0)])
    assert got[0]["gate_decision"] == "fallback"  # token guard → vad → fb
