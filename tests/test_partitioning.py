"""Skew handling (D1): salted repartition must spread a hot host's pages
across many partitions, and X12 language-code rewrite over the typed output."""

from pyspark.sql import functions as F

from langid_mr_spark import fixtures, pipeline


def test_salted_repartition_spreads_hot_host(spark):
    # one host owns 90% of rows — the Common-Crawl hot-host skew shape
    rows = [(f"https://hot.example/p{i}", i) for i in range(900)]
    rows += [(f"https://site{i}.example/x", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["url", "i"]).coalesce(1)

    out = pipeline.salted_repartition(df, 16, key="url", salt_buckets=16)
    parts = (
        out.filter(F.col("url").startswith("https://hot.example"))
        .select(F.spark_partition_id().alias("p"))
        .groupBy("p").count().collect()
    )
    assert len(parts) >= 8  # hot host spread over many partitions
    assert max(r["count"] for r in parts) <= 900 * 0.35  # no mega-partition


def test_rewrite_language_codes(spark):
    src = fixtures.corpus_df(spark, 60, num_partitions=2)
    out = pipeline.run_pipeline(src)
    rewritten = pipeline.rewrite_language_codes(out, "iso639-2b").collect()
    assert any(r["language"] == "eng" for r in rewritten)
    for r in rewritten:
        assert r["language"] not in ("en", "fr")  # mapped
        if r["language"] == "eng":
            assert r["score_meta"]["language"] in ("eng", "none")
        if r["language"] == "none":  # passthrough for non-mapped codes
            assert r["score_meta"]["language"] == "none"
