"""Structured-Streaming surface (SURVEY.md §2.7 D9): incremental processing
of newly-arrived web pages.

The reference's worker pool busy-polls a SQLite queue with a 50 ms idle wait
(main.py:90-111). The Spark-native equivalent is a file-source stream over
the input directory with ``Trigger.AvailableNow`` — each invocation drains
whatever arrived since the last checkpoint and stops, giving the same
at-least-once/resume semantics as the D8 batch checkpointing but managed by
the engine's own offset log.

The streaming query reuses the IDENTICAL batch transform via foreachBatch —
one pipeline definition, two execution surfaces (micro-batch does not
support multi-pass persist/union DAGs inline, so foreachBatch is the
idiomatic bridge; Spark's own docs recommend exactly this pattern for
reusing batch writers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import pipeline

INPUT_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string, family string")


def incremental_run(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    **pipeline_kwargs,
) -> None:
    """Drain all unprocessed input files through the batch pipeline, then
    stop (Trigger.AvailableNow). Re-invoking after new files land processes
    only the delta — the streaming analog of run_resumable."""
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = pipeline.with_dt(
            pipeline.run_pipeline(batch_df, **pipeline_kwargs)
        ).withColumn("batch_id", F.lit(batch_id))
        out.write.mode("append").partitionBy("dt").parquet(output_dir)

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_throughput(spark: SparkSession, output_dir: str,
                        window: str = "5 minutes") -> DataFrame:
    """A3 analog (main.py:270-280): docs per tumbling event-time window of
    the processed output — the dashboard's freshness metric."""
    out = spark.read.parquet(output_dir)
    return (
        out.groupBy(F.window(F.col("warc_ts"), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.count(F.when(F.col("keep"), 1)).alias("kept"),
        )
        .select(F.col("w.start").alias("window_start"), "docs", "kept")
        .orderBy("window_start")
    )
