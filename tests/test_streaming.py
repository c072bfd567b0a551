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
