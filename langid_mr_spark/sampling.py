"""Deterministic sampling & stratification for corpus curation.

A training-data pipeline constantly needs reproducible subsets: "5% of the
corpus for eval", "at most N documents per language/domain", "the same
sample on every rerun and every engine". Random sampling (df.sample) is
seed- and partitioning-dependent; these operators derive the decision from
a content hash, so the subset is a pure function of the data — stable
across reruns, repartitioning, AND engines (md5-prefix arithmetic has an
exact DuckDB twin, like dedup.md5_long).

Scale notes: hash_fraction is a stateless projection (no shuffle);
stratified_cap is one shuffle on the group key (window rank) — the same
cost as any per-group top-k; at 10^12 rows use it after a coarse
hash_fraction pre-filter so the window input is already bounded.
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
    the key itself. One shuffle on the group columns."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_fraction(F.col(key_col), salt).asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n_per_group)
        .drop("_rank")
    )
