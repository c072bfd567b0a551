"""Spark-expression vs pure-Python parity — the load-bearing dialect tests.

Every native Column helper in functions/exprs.py must agree exactly with its
textnorm twin over an adversarial string corpus (unicode word chars,
apostrophes, music glyphs, nested/mismatched brackets, whitespace variety)."""

import pytest
from pyspark.sql import functions as F

from langid_mr_spark import constants as C
from langid_mr_spark import textnorm as TN
from langid_mr_spark.functions import exprs as X

CORPUS = [
    "the quick brown fox",
    "well, it's for the one",
    "réduction gratuite aujourd'hui ça là",
    "ALLCAPS And MiXeD ÉÀÇ Ü ß STRASSE",
    "♪ musique ♪",
    "[♫ OUTRO MUSIC PLAYING ♫]",
    "[[nested] brackets]",
    "[ ( deep { <x> } ) ]",
    "[mismatched) pair]",
    "[a] and [b]",
    "",
    "   ",
    "\t\nwhitespace everywhere here",
    "a-b_c'd e.f,g;h",
    "1234 5678 90",
    "le la les un une des et ou",
    "background music only",
    "music outro anthony playing",
    "one two three four five six seven eight nine ten eleven twelve",
    "singleword",
    "[music",
    "music]",
    "[]",
    "[[[[[[deeper than eight]]]]]]",
    "( background music playing )",
]


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["t"])
    return df


def _collect(frame, col):
    return [r["out"] for r in frame.select(col.alias("out")).collect()]


def test_tokenize_parity(frame):
    got = _collect(frame, X.tokenize(F.col("t")))
    assert got == [TN.tokenize_text(t) for t in CORPUS]


def test_stopword_ratio_parity(frame):
    for lang, sw in (("en", C.EN_STOPWORDS), ("fr", C.FR_STOPWORDS)):
        got = _collect(frame, X.stopword_ratio(X.tokenize(F.col("t")), lang))
        want = [TN.compute_stopword_ratio(t, sw) for t in CORPUS]
        assert got == pytest.approx(want)


def test_strip_outer_brackets_parity(frame):
    got = _collect(frame, X.strip_outer_brackets(F.col("t")))
    want = [TN.strip_outer_brackets(t) for t in CORPUS]
    assert got == want


def test_is_music_only_parity(frame):
    got = _collect(frame, X.is_music_only(F.col("t")))
    want = [TN.is_music_only(t) for t in CORPUS]
    assert got == want


def test_truncate_parity(frame):
    got = _collect(frame, X.truncate_to_words(F.col("t")))
    want = [TN.truncate_to_words(t) for t in CORPUS]
    assert got == want


def test_snippet_parity(frame):
    got = _collect(frame, X.snippet_first_words(F.col("t")))
    want = [TN.snippet_first_words(t) for t in CORPUS]
    assert got == want


def test_vad_clean_parity(frame):
    got = _collect(frame, X.vad_clean(F.col("t")))
    want = [TN.vad_clean(t) for t in CORPUS]
    assert got == want


def test_safe_probability(spark):
    df = spark.createDataFrame(
        [("0.5",), ("abc",), (None,), ("1e-3",)], ["p"])
    got = [r["out"] for r in df.select(
        X.safe_probability(F.col("p")).alias("out")).collect()]
    assert got == [0.5, 0.0, 0.0, 0.001]


def test_iso_mapping_parity(spark):
    codes = ["en", "fr", "EN", "xx", "de"]
    df = spark.createDataFrame([(c,) for c in codes], ["c"])
    for fmt in C.ISO_FORMATS:
        got = [r["out"] for r in df.select(
            X.to_iso_code(F.col("c"), fmt).alias("out")).collect()]
        assert got == [TN.to_iso_code(c, fmt) for c in codes]
    iso = ["eng", "fre", "fra", "zzz"]
    df2 = spark.createDataFrame([(c,) for c in iso], ["c"])
    got = [r["out"] for r in df2.select(
        X.from_iso_code(F.col("c"), "iso639-2b").alias("out")).collect()]
    assert got == [TN.from_iso_code(c, "iso639-2b") for c in iso]


def test_language_label_parity(spark):
    codes = ["en", "fr", "es", "EN"]
    df = spark.createDataFrame([(c,) for c in codes], ["c"])
    got = [r["out"] for r in df.select(
        X.language_label(F.col("c")).alias("out")).collect()]
    assert got == [TN.get_language_label(c) for c in codes]


def test_mean_logprob(spark):
    df = spark.createDataFrame(
        [([-1.0, -2.0, -3.0],), ([],), (None,)],
        "arr array<double>")
    got = [r["out"] for r in df.select(
        X.mean_logprob(F.col("arr")).alias("out")).collect()]
    assert got == [-2.0, C.EMPTY_LOGPROB_SENTINEL, C.EMPTY_LOGPROB_SENTINEL]


def test_argmax_ties_to_en(spark):
    df = spark.createDataFrame([(-1.0, -1.0), (-1.0, -0.5), (-0.5, -1.0)],
                               ["e", "f"])
    got = [r["out"] for r in df.select(
        X.argmax_en_fr(F.col("e"), F.col("f")).alias("out")).collect()]
    assert got == ["en", "fr", "en"]  # tie → en (lang_gate.py:253)


def test_probe_unicode_boundary(spark):
    # substring must count characters (not bytes/UTF-16 units)
    long = "é" * (C.PROBE_CHARS + 100)
    df = spark.createDataFrame([(long,)], ["t"])
    got = df.select(X.probe(F.col("t")).alias("out")).collect()[0]["out"]
    assert got == TN.probe(long)
    assert len(got) == C.PROBE_CHARS


def test_strip_outer_brackets_depth_parity_beyond_unroll(spark):
    """Spark unroll and the Python twin agree ABOVE the shared depth bound
    (round-1 gap: the twin used to peel unboundedly and diverged at ≥9)."""
    from langid_mr_spark import constants as C

    d = C.BRACKET_STRIP_MAX_LAYERS
    cases = [
        "[" * k + core + "]" * k
        for k in (d - 1, d, d + 1, d + 3)
        for core in ("music", " music ", "[oops")
    ]
    frame = spark.createDataFrame([(t,) for t in cases], "t string")
    got = [r[0] for r in
           frame.select(X.strip_outer_brackets(F.col("t"))).collect()]
    want = [TN.strip_outer_brackets(t) for t in cases]
    assert got == want
