"""End-to-end corpus curation (curate.py): gate + quality → near-dup
collapse → canonical selection → caps/sampling, with a reconciling funnel
report."""

import pytest
from pyspark.sql import functions as F

from langid_mr_spark import curate, fixtures


@pytest.fixture(scope="module")
def corpus_with_dups(spark):
    df = fixtures.corpus_df(spark, 60)
    # re-ingest a DETERMINISTIC subset under new urls → exact-content
    # duplicates (limit() without order would pick different rows on every
    # re-evaluation of this lazy plan and corrupt the fixture)
    dups = (df.filter(F.xxhash64("url") % 10 == 0)
            .withColumn("url", F.concat(F.lit("dup://"), F.col("url"))))
    assert dups.count() > 0
    return df.unionByName(dups)


@pytest.fixture(scope="module")
def curated(spark, corpus_with_dups):
    out = curate.curate(corpus_with_dups, persist_level=None)
    rows = out.collect()
    return out, {r["url"]: r for r in rows}


def test_row_preservation_and_lineage(curated, corpus_with_dups):
    out, by_url = curated
    assert len(by_url) == corpus_with_dups.count()  # nothing lost
    for r in by_url.values():
        if r["curated"]:
            assert r["final_keep"] and r["is_canonical"]
        if r["is_canonical"]:
            assert r["canonical_url"] == r["url"]


def test_duplicates_collapse_to_one_canonical(curated):
    _, by_url = curated
    for url, r in by_url.items():
        if not url.startswith("dup://"):
            continue
        orig = by_url[url[len("dup://"):]]
        if r["final_keep"] and orig["final_keep"]:
            # same content, both kept → same cluster; the cluster's
            # representative is curated and is the min url; at most one of
            # the identical pair can be it (other near-dups may join the
            # cluster and take the canonical slot from both)
            assert r["canonical_url"] == orig["canonical_url"]
            assert not (r["is_canonical"] and orig["is_canonical"])
            canon = by_url[r["canonical_url"]]
            assert canon["is_canonical"]
            assert canon["url"] <= min(r["url"], orig["url"])


def test_report_reconciles(curated, corpus_with_dups):
    out, _ = curated
    rep = curate.curation_report(out).collect()[0]
    assert rep["docs_in"] == corpus_with_dups.count()
    assert rep["quality_kept"] == rep["canonical"] + rep["dropped_duplicate"]
    assert rep["curated"] == rep["canonical"]  # no cap/sample configured


def test_single_extraction_pass(spark, corpus_with_dups):
    """The funnel pays exactly one extraction UDF pass: run_pipeline carries
    the probe-bounded text (carry_text) and curate clusters on the carried
    column instead of re-running the UDF on survivors."""
    import inspect

    from langid_mr_spark import oracle, pipeline
    from langid_mr_spark.functions import exprs  # noqa: F401

    assert "extract_text_udf" not in inspect.getsource(curate.curate)
    out = pipeline.run_pipeline(corpus_with_dups, persist_level=None,
                                carry_text=True)
    assert "extracted_probe" in out.columns
    rows = {r["url"]: r for r in
            out.select("url", "extracted_probe").collect()}
    for r in corpus_with_dups.select("url", "html").limit(5).collect():
        want = oracle.TN.extract_text_from_html(r["html"])[:4000]
        assert rows[r["url"]]["extracted_probe"] == want
    # default output contract is unchanged
    assert "extracted_probe" not in pipeline.run_pipeline(
        corpus_with_dups, persist_level=None).columns


def test_per_lang_cap_and_sampling(spark, corpus_with_dups):
    out = curate.curate(corpus_with_dups, per_lang_cap=2,
                        sample_fraction=0.9, persist_level=None)
    per = (out.filter(F.col("curated"))
           .groupBy("language").agg(F.count(F.lit(1)).alias("n")).collect())
    assert per and all(r["n"] <= 2 for r in per)
    # sampling only ever removes
    base = curate.curate(corpus_with_dups, per_lang_cap=2,
                         persist_level=None)
    a = {r["url"] for r in out.filter("curated").select("url").collect()}
    b = {r["url"] for r in base.filter("curated").select("url").collect()}
    assert a <= b


def test_full_text_dedup_not_fooled_by_shared_prefix(spark):
    """r3 advice (medium): near-dup clustering must see the FULL extracted
    text — two long documents sharing a >PROBE_CHARS boilerplate prefix but
    diverging after it are NOT near-duplicates, even though their
    probe-bounded texts are byte-identical."""
    from langid_mr_spark import constants as C

    def sents(tag, n):
        return " ".join(
            f"{tag}{i}a {tag}{i}b the {tag}{i}c and {tag}{i}d of "
            f"{tag}{i}e {tag}{i}f" for i in range(n))

    prefix = sents("pp", 90)
    assert len(prefix) > C.PROBE_CHARS
    doc_a = prefix + " " + sents("qa", 200)
    doc_b = prefix + " " + sents("zb", 200)
    assert doc_a[:C.PROBE_CHARS] == doc_b[:C.PROBE_CHARS]  # probe-identical

    df = (spark.createDataFrame(
        [("doc://a", doc_a), ("doc://b", doc_b)], "url string, text string")
        .withColumn("warc_ts", F.to_timestamp(F.lit("2025-01-01")))
        .withColumn("lang", F.lit("en"))
        .withColumn("html", F.encode(F.col("text"), "UTF-8")))
    out = curate.curate(df, persist_level=None, use_html=False)
    by_url = {r["url"]: r for r in out.collect()}
    assert by_url["doc://a"]["final_keep"] and by_url["doc://b"]["final_keep"]
    for u in ("doc://a", "doc://b"):
        assert by_url[u]["is_canonical"], u
        assert by_url[u]["canonical_url"] == u
