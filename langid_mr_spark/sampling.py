"""Deterministic sampling & stratification for corpus curation.

A training-data pipeline constantly needs reproducible subsets: "5% of the
corpus for eval", "at most N documents per language/domain", "the same
sample on every rerun and every engine". Random sampling (df.sample) is
seed- and partitioning-dependent; these operators derive the decision from
a content hash, so the subset is a pure function of the data — stable
across reruns, repartitioning, AND engines (md5-prefix arithmetic has an
exact DuckDB twin, like dedup.md5_long).

Scale notes: hash_fraction is a stateless projection (no shuffle);
stratified_cap is a two-phase per-group top-N — a skew-spread shuffle on
(group, partition-id) that keeps ≤ N rows per (group, partition), then a
per-group window over the bounded ≤ N·P candidates — so a 2-language cap
over 10¹² rows never funnels the corpus through 2 reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_long

# md5_long yields 60 bits (15 hex chars) → uniform in [0, 2^60)
_HASH_SPACE = float(1 << 60)


def hash_fraction(col: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a key column (+ optional salt —
    different salts give independent subsets of the same data)."""
    return md5_long(F.concat(col.cast("string"), F.lit(salt))) / F.lit(_HASH_SPACE)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         salt: str = "") -> DataFrame:
    """Keep rows whose hash_fraction(key) < fraction — the same rows on
    every run, every partitioning, every engine."""
    return df.filter(hash_fraction(F.col(key_col), salt) < fraction)


def stratified_cap(df: DataFrame, group_cols: list[str], n_per_group: int,
                   key_col: str, salt: str = "") -> DataFrame:
    """At most ``n_per_group`` rows per group, chosen by hash order (a
    deterministic uniform draw, not "first N encountered"), ties broken by
    the key itself.

    Two-phase per-group top-N so low-cardinality groups never funnel the
    whole corpus through one reducer (a per-language cap at web scale has
    ~10² groups over 10¹² rows — a single window per group would be a
    2-partition shuffle of everything). Phase 1 windows over
    (group, input-partition id): the shuffle key carries the partition id,
    spreading each group over every input partition's worth of reducers,
    and keeps only the per-partition top-N — a superset of the global
    top-N members from that partition. Phase 2 runs the global window per
    group over the bounded ≤ N·P candidates. Same order key both phases,
    so the result is IDENTICAL to the single-window semantics (and to the
    DuckDB oracle)."""
    order = [hash_fraction(F.col(key_col), salt).asc(), F.col(key_col).asc()]
    w1 = Window.partitionBy(*group_cols, "_pid").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n_per_group)
        .drop("_pid", "_r1")
        .withColumn("_rank", F.row_number().over(w2))
        .filter(F.col("_rank") <= n_per_group)
        .drop("_rank")
    )
