"""Poison-row handling (SURVEY §2.7 D5; reference runner.py:192-199).

The reference requeues a failing job and marks it failed after MAX_RETRIES.
The Spark analog: one undecodable/throwing document becomes a
drop_reason='error' ROW — captured per row inside the scoring/extraction
UDFs — instead of a task that dies 4× and kills the whole job. These tests
inject throwing scorers and assert N error rows, zero task failures, and
reconciled counters, mirroring the reference's retry-exhaustion test.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_mr_spark import constants as C
from langid_mr_spark import fixtures, gate, oracle, pipeline, scoring

MARK = "xqzpoisonzqx"


# Factories returning CLOSURES: cloudpickle ships closures by value to the
# Python workers (a module-level function would be pickled by reference to
# 'test_errors', which executors cannot import).

def _mk_lang_fn(prob: float, poison: bool = True):
    mark = MARK

    def fn(texts):
        if poison:
            for t in texts:
                if mark in t:
                    raise RuntimeError("model exploded on this document")
        import numpy as _np
        return _np.array(["en"] * len(texts)), _np.full(len(texts), prob)

    return fn


def _mk_ppl_fn():
    mark = MARK

    def fn(texts):
        for t in texts:
            if mark in t:
                raise RuntimeError("fallback scorer exploded")
        import numpy as _np
        return _np.full(len(texts), -3.0), _np.full(len(texts), -5.0)

    return fn


_lang_fn = _mk_lang_fn(0.9)
_lang_fn_low = _mk_lang_fn(0.1)
_ppl_fn = _mk_ppl_fn()


GOOD = "the cat and the dog run to the house now and then with the birds"


@pytest.fixture()
def docs(spark):
    rows = [(i, GOOD if i % 5 else f"{GOOD} {MARK}") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pass1_scorer_error_becomes_row(spark, docs):
    out = gate.apply_gate(
        docs, text_col="text",
        scorer=scoring.make_langid_udf(_lang_fn),
        persist_level=None,
    ).collect()
    assert len(out) == 20  # no row lost, no task died
    errs = [r for r in out if r["gate_decision"] == C.DECISION_ERROR]
    assert len(errs) == 4
    for r in errs:
        assert r["keep"] is False
        assert r["drop_reason"] == C.DROP_ERROR
        assert r["language"] == "none"
        assert r["probability"] is None
        assert r["use_vad"] is False
        assert r["token_count"] > 0  # native heuristics still computed
    kept = [r for r in out if r["gate_decision"] == C.DECISION_HIGH_CONF]
    assert len(kept) == 16


def test_pass3_scorer_error_becomes_row(spark, docs):
    out = gate.apply_gate(
        docs, text_col="text",
        scorer=scoring.make_langid_udf(_lang_fn_low),
        ppl_scorer=scoring.make_ppl_udf(_ppl_fn),
        persist_level=None,
    ).collect()
    assert len(out) == 20
    errs = [r for r in out if r["gate_decision"] == C.DECISION_ERROR]
    # marked rows now survive pass 1+2 scoring (wait: pass1 also throws)
    assert len(errs) == 4
    ok = [r for r in out if r["gate_decision"] == C.DECISION_FALLBACK]
    assert len(ok) == 16 and all(r["language"] == "en" for r in ok)


def test_pass3_only_error(spark, docs):
    """Scorer fine, fallback scorer poisoned → error surfaces at pass 3
    with use_vad=True (the row reached the VAD stage, like C7)."""
    out = gate.apply_gate(
        docs, text_col="text",
        scorer=scoring.make_langid_udf(_mk_lang_fn(0.1, poison=False)),
        ppl_scorer=scoring.make_ppl_udf(_ppl_fn),
        persist_level=None,
    ).collect()
    errs = [r for r in out if r["gate_decision"] == C.DECISION_ERROR]
    assert len(errs) == 4
    assert all(r["use_vad"] is True for r in errs)


def test_oracle_twin_agrees_on_error_rows(spark, docs):
    def py_lang(t):
        if MARK in t:
            raise RuntimeError("boom")
        return "en", 0.9

    got = {r["doc_id"]: r for r in gate.apply_gate(
        docs, text_col="text",
        scorer=scoring.make_langid_udf(_lang_fn),
        persist_level=None).collect()}
    for i, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        want = oracle.gate_one(text, lang_scorer=py_lang)
        assert got[i]["gate_decision"] == want["gate_decision"]
        assert got[i]["keep"] == want["keep"]
        assert got[i]["drop_reason"] == want["drop_reason"]


def test_extract_udf_captures_per_row_poison():
    """Drive the extraction UDF's raw generator with a batch containing a
    non-bytes payload: the vectorized path throws, the per-row fallback
    isolates exactly the poison row."""
    good = b"<html><p>hello world</p></html>"
    batch = pd.Series([good, 12345, None], dtype=object)
    out = list(pipeline.extract_text_udf.func(iter([batch])))[0]
    assert list(out["error"].isna()) == [True, False, True]
    assert out["extracted"][0] == "hello world"
    assert out["extracted"][2] == ""
    assert "AttributeError" in out["error"][1] or "Error" in out["error"][1]


def test_oracle_process_one_extract_error_row():
    """D5 parity (twin side): a payload the extractor cannot process makes
    process_one return an error ROW mirroring the pipeline's extract-error
    fold — never an exception."""
    r = oracle.process_one("u1", html=12345, text=None)  # non-bytes payload
    assert r["gate_decision"] == C.DECISION_ERROR
    assert r["keep"] is False and r["final_keep"] is False
    assert r["drop_reason"] == C.DROP_ERROR
    assert r["language"] == "none" and r["probability"] is None
    assert r["gate_path"] == C.GATE_PATH_UNKNOWN
    assert r["pipeline_mode"] == C.PIPELINE_MODE_UNKNOWN
    assert r["scrubbed_text"] == ""


def test_pipeline_errors_counted_and_isolated(spark):
    df = fixtures.corpus_df(spark, 40)
    df = df.withColumn(
        "text",
        F.when(F.xxhash64("url") % 7 == 0,
               F.concat(F.col("text"), F.lit(" " + MARK)))
        .otherwise(F.col("text")),
    )
    n_marked = df.filter(F.col("text").contains(MARK)).count()
    assert n_marked > 0
    out = pipeline.run_pipeline(
        df,
        scorer=scoring.make_langid_udf(_lang_fn),
        ppl_scorer=scoring.make_ppl_udf(_ppl_fn),
        use_html=False,
        persist_level=None,
    )
    rows = out.collect()
    assert len(rows) == 40
    errs = [r for r in rows if r["drop_reason"] == C.DROP_ERROR]
    assert len(errs) == n_marked
    assert all(r["keep"] is False and r["final_keep"] is False for r in errs)
    # counters reconcile (A9 'errors' counter)
    aggs = out.agg(*[a.alias(k) for k, a in pipeline.metric_aggs().items()]
                   ).collect()[0]
    assert aggs["errors"] == n_marked
    assert aggs["docs_in"] == 40
    assert aggs["docs_kept"] + aggs["docs_dropped"] == 40
