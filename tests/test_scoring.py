"""Scorer determinism + batch/scalar agreement + Spark-UDF agreement."""

import numpy as np
from pyspark.sql import functions as F

from langid_mr_spark import constants as C
from langid_mr_spark import scoring as S

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "bonjour je parle français avec mes amis",
    "hola yo hablo español con mis amigos",
    "hallo ich spreche deutsch mit meinen freunden",
    "",
    "ab",          # < 3 chars → no trigrams → sentinel path
    "♪ musique ♪",
    "x" * 5000,
]


def test_deterministic():
    a = S.score_batch(TEXTS)
    b = S.score_batch(TEXTS)
    assert (a[0] == b[0]).all()
    assert (a[1] == b[1]).all()
    assert (a[2] == b[2]).all()


def test_batch_equals_scalar():
    """The vectorized batch path must agree bit-exactly with batch-of-one
    (the oracle's path) — this is what makes Spark-vs-oracle F1 exact."""
    lang_idx, prob, avg = S.score_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        lang1, p1 = S.langid_one(t)
        assert S.LANGS[lang_idx[i]] == lang1
        assert prob[i] == p1
        e, f = S.ppl_one(t)
        assert avg[S.LANGS.index("en"), i] == e
        assert avg[S.LANGS.index("fr"), i] == f


def test_empty_and_short_sentinel():
    _, prob, avg = S.score_batch(["", "ab"])
    assert (avg == C.EMPTY_LOGPROB_SENTINEL).all()
    assert np.allclose(prob, 1.0 / len(S.LANGS))  # uniform posterior


def test_expected_languages():
    lang_idx, prob, _ = S.score_batch(TEXTS[:4])
    assert [S.LANGS[i] for i in lang_idx] == ["en", "fr", "es", "de"]
    assert (prob[:4] > 0.75).all()


def test_no_boundary_leakage():
    """Trigrams must not span document boundaries: scores of a doc are
    independent of its neighbors in the batch."""
    solo = S.score_batch(["the quick brown fox"])
    packed = S.score_batch(["zzz", "the quick brown fox", "ççç"])
    assert solo[1][0] == packed[1][1]
    assert (solo[2][:, 0] == packed[2][:, 1]).all()


def test_udfs_agree_with_batch(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["t"]).repartition(3)
    rows = df.select(
        "t",
        S.langid_scores_udf(F.col("t")).alias("s"),
        S.ppl_scores_udf(F.col("t")).alias("p"),
    ).collect()
    for r in rows:
        lang, prob = S.langid_one(r["t"])
        assert r["s"]["lang"] == lang
        assert r["s"]["prob"] == prob
        e, f = S.ppl_one(r["t"])
        assert r["p"]["ppl_en"] == e
        assert r["p"]["ppl_fr"] == f
