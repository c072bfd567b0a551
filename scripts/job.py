#!/usr/bin/env python
"""spark-submit entrypoint for the quality-filter pipeline.

    spark-submit --py-files dist/langid_mr_spark.zip scripts/job.py \
        --input  s3://bucket/web_pages \
        --output s3://bucket/web_pages_filtered \
        --run-id 2026-08-16 \
        --repartition 4096

On a cluster, parallelism/memory come from spark-submit flags
(--num-executors/--executor-cores/--executor-memory); this script never
sets a master so the same file works on YARN/K8s/standalone/local.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--repartition", type=int, default=None)
    ap.add_argument("--strict-reject", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from langid_mr_spark import pipeline

    spark = (
        SparkSession.builder.appName(f"langid-mr-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .getOrCreate()
    )
    done = pipeline.run_resumable(
        spark, args.input, args.output, run_id=args.run_id,
        repartition_n=args.repartition,
        strict_reject=args.strict_reject,
    )
    print(f"processed_partitions={done}")
    spark.stop()


if __name__ == "__main__":
    main()
