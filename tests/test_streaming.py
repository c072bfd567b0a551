"""Structured-Streaming incremental surface (D9): drain-new-files semantics
and equality with the batch pipeline."""

from pyspark.sql import functions as F

from langid_mr_spark import fixtures, pipeline, streaming


def test_incremental_equals_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    full = fixtures.make_corpus(90)
    part1, part2 = full.iloc[:60], full.iloc[60:]

    spark.createDataFrame(part1, schema=fixtures.INPUT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    streaming.incremental_run(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 60

    # second invocation with no new files: no duplicates
    streaming.incremental_run(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 60

    # new files land → only the delta is processed
    spark.createDataFrame(part2, schema=fixtures.INPUT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    streaming.incremental_run(spark, inp, out, ckpt)
    stream_out = spark.read.parquet(out)
    assert stream_out.count() == 90

    # equality with one batch run over the same 90 docs
    batch_out = pipeline.run_pipeline(
        spark.createDataFrame(full, schema=fixtures.INPUT_SCHEMA))
    a = stream_out.drop("dt", "batch_id")
    b = batch_out
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    # A3 windowed freshness metric runs over the output
    w = streaming.windowed_throughput(spark, out, "1 hour").collect()
    assert sum(r["docs"] for r in w) == 90


def test_streaming_dedup_single_drain_equals_batch(spark, tmp_path):
    """Batch-replay parity: one AvailableNow drain over a whole corpus is
    frame-equal to the batch operator dedup.exact_duplicates (same
    canonical = min id per content hash, same duplicate flags)."""
    from langid_mr_spark import dedup
    from pyspark.sql import functions as F

    inp = str(tmp_path / "pin")
    df = fixtures.corpus_df(spark, 50)
    dups = (df.filter(F.xxhash64("url") % 5 == 0)
            .withColumn("url", F.concat(F.lit("dup://"), F.col("url"))))
    df.unionByName(dups).coalesce(2).write.parquet(inp)

    streaming.streaming_exact_dedup(
        spark, inp, str(tmp_path / "pout"), str(tmp_path / "pckpt"))
    got = (spark.read.parquet(str(tmp_path / "pout"))
           .select("url", "is_duplicate", "canonical_url"))
    want = (dedup.exact_duplicates(spark.read.parquet(inp),
                                   id_col="url", text_col="text")
            .select("url", "is_duplicate",
                    F.col("canonical_id").alias("canonical_url")))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Stateful cross-batch dedup: duplicates within a micro-batch AND
    against documents seen in earlier invocations are flagged, with the
    seen-set restored from the checkpoint between runs."""
    inp = str(tmp_path / "din")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    import datetime as dt
    ts = dt.datetime(2024, 1, 1)
    batch1 = [
        ("u1", ts, b"x", "alpha text", "en", "f"),
        ("u2", ts, b"x", "alpha text", "en", "f"),   # in-batch dup of u1
        ("u3", ts, b"x", "beta text", "en", "f"),
    ]
    spark.createDataFrame(batch1, schema=fixtures.INPUT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    streaming.streaming_exact_dedup(spark, inp, out, ckpt)
    r1 = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert len(r1) == 3
    assert r1["u1"]["is_duplicate"] is False
    assert r1["u2"]["is_duplicate"] is True
    assert r1["u2"]["canonical_url"] == "u1"
    assert r1["u3"]["is_duplicate"] is False

    # second batch arrives later: dups against the STORED state, plus a
    # fresh doc
    batch2 = [
        ("u4", ts, b"x", "alpha text", "en", "f"),   # dup of batch-1 u1
        ("u5", ts, b"x", "gamma text", "en", "f"),   # new
    ]
    spark.createDataFrame(batch2, schema=fixtures.INPUT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(inp)
    streaming.streaming_exact_dedup(spark, inp, out, ckpt)
    r2 = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert len(r2) == 5
    assert r2["u4"]["is_duplicate"] is True
    assert r2["u4"]["canonical_url"] == "u1"
    assert r2["u5"]["is_duplicate"] is False
