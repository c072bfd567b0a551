"""Bucketed tables for shuffle-free co-located joins.

At 10^12 documents the dominant cost of any url-keyed join (joining fresh
crawl batches against the existing filtered corpus, attaching dedup verdicts
back to documents) is the shuffle of the big side. Bucketing both tables by
the join key at write time moves that shuffle to write time ONCE and makes
every later join bucket-local (SortMergeJoin with no Exchange).

This mirrors the reference's prefix-ownership routing (cluster/router.py:
8-35 — a document's id prefix determines which node owns it): bucket id =
hash(url) % n_buckets is exactly deterministic ownership, managed by the
engine instead of hand-rolled HTTP proxying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str = "url",
                   n_buckets: int = 16, mode: str = "overwrite") -> None:
    """Persist as a bucketed+sorted table (bucket pruning + shuffle-free
    joins on `key` for every subsequent reader)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str = "url", how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst elides
    both Exchanges (assert via .explain: no shuffle on either side)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
