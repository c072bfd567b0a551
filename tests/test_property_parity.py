"""Property-based Spark↔Python parity fuzzing (hypothesis).

The byte-identity acceptance target rests on the native Column expressions
agreeing with the pure-Python spec on ARBITRARY text, not just curated
fixtures. Strategy: hypothesis draws batches of adversarial strings (word
chars incl. accents, apostrophes, brackets, music glyphs, mixed whitespace,
digits, punctuation); each example runs ONE Spark job over the whole batch
and compares every operator against its twin.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from langid_mr_spark import constants as C
from langid_mr_spark import oracle, scoring, scrub
from langid_mr_spark import textnorm as TN
from langid_mr_spark.functions import exprs as X

ALPHABET = (
    "abcdefghij éàçüß'    \t\n[](){}<>♪♫♬.,;!?-_@0123456789"
    "music musique the le "
)
texts = st.text(alphabet=ALPHABET, min_size=0, max_size=120)
batches = st.lists(texts, min_size=1, max_size=80)

SLOW = settings(max_examples=5, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(batch=batches)
@SLOW
def test_expr_parity_fuzz(spark, batch):
    df = spark.createDataFrame([(t,) for t in batch], ["t"])
    rows = df.select(
        "t",
        X.tokenize(F.col("t")).alias("toks"),
        X.stopword_ratio(X.tokenize(F.col("t")), "en").alias("en"),
        X.stopword_ratio(X.tokenize(F.col("t")), "fr").alias("fr"),
        X.strip_outer_brackets(F.col("t")).alias("stripped"),
        X.is_music_only(F.col("t")).alias("music"),
        X.truncate_to_words(F.col("t")).alias("trunc"),
        X.snippet_first_words(F.col("t")).alias("snip"),
        X.vad_clean(F.col("t")).alias("clean"),
        scrub.scrub_col(F.col("t")).alias("scrubbed"),
    ).collect()
    for r in rows:
        t = r["t"]
        assert r["toks"] == TN.tokenize_text(t), repr(t)
        assert r["en"] == TN.compute_stopword_ratio(t, C.EN_STOPWORDS), repr(t)
        assert r["fr"] == TN.compute_stopword_ratio(t, C.FR_STOPWORDS), repr(t)
        assert r["stripped"] == TN.strip_outer_brackets(t), repr(t)
        assert r["music"] == TN.is_music_only(t), repr(t)
        assert r["trunc"] == TN.truncate_to_words(t), repr(t)
        assert r["snip"] == TN.snippet_first_words(t), repr(t)
        assert r["clean"] == TN.vad_clean(t), repr(t)
        assert r["scrubbed"] == scrub.scrub_text(t), repr(t)


@given(batch=st.lists(texts, min_size=1, max_size=40))
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gate_parity_fuzz(spark, batch):
    """Full cascade Spark-vs-oracle on random text (real scorers)."""
    from langid_mr_spark import gate

    df = spark.createDataFrame(list(enumerate(batch)), ["i", "t"])
    got = {r["i"]: r for r in
           gate.apply_gate(df, text_col="t", persist_level=None).collect()}
    for i, t in enumerate(batch):
        o = oracle.gate_one(TN.probe(t))
        r = got[i]
        for f in ("gate_decision", "language", "detection_method",
                  "use_vad", "token_count", "music_only", "keep"):
            assert r[f] == o[f], (repr(t), f, r[f], o[f])
        a, b = r["probability"], o["probability"]
        assert (a is None) == (b is None) and (a is None or a == b), repr(t)


@given(batch=st.lists(texts, min_size=1, max_size=200))
@settings(max_examples=10, deadline=None)
def test_scorer_batch_independence_fuzz(batch):
    """Scores must not depend on batch composition (pure numpy, no Spark)."""
    lang_idx, prob, avg = scoring.score_batch(batch)
    for i, t in enumerate(batch):
        lone_idx, lone_prob, lone_avg = scoring.score_batch([t])
        assert lang_idx[i] == lone_idx[0], repr(t)
        assert prob[i] == lone_prob[0], repr(t)
        assert (avg[:, i] == lone_avg[:, 0]).all(), repr(t)


@given(t=texts)
@settings(max_examples=200, deadline=None)
def test_music_guard_is_necessary_condition(t):
    """The cheap rlike guard in exprs.is_music_only must never exclude a
    true music-only text (pure-Python check of the guard's logic)."""
    if TN.is_music_only(t):
        low = t.lower()
        assert "musi" in low or any(g in t for g in C.MUSIC_UNICODE_MARKERS)
