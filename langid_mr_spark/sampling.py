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


def pack_shards(df: DataFrame, token_budget: int, key_col: str,
                token_col: str, salt: str = "",
                num_partitions: int | None = None) -> DataFrame:
    """Greedy sequential packing of documents into fixed-token-budget
    training shards: documents are laid out in deterministic hash order
    (the same engine-stable order the sampler and cap use, ties broken by
    the key) and each document goes to the shard its starting token offset
    falls in — ``shard_id = exclusive_prefix_sum(tokens) div budget``.
    The assignment is a pure function of the data: identical across
    reruns, repartitioning, and engines.

    Scalable distributed prefix sum (NO single global window): rows are
    range-partitioned on the order key, each partition computes its local
    running sum with a window over its own partition id, and the bounded
    per-partition totals (one row per partition) are collected once and
    broadcast back as exclusive offsets — the classic two-pass prefix-sum
    recipe. The range-partitioned frame is localCheckpointed so the
    totals pass and the final pass read one materialization. Range
    boundaries don't affect the OUTPUT (the global prefix sum is the same
    wherever partitions split), only the parallelism."""
    spark = df.sparkSession
    order = hash_fraction(F.col(key_col), salt)
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = (df.withColumn("_ord", order)
         .repartitionByRange(n, F.col("_ord"), F.col(key_col))
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint(eager=True))
    totals = {r["_pid"]: r["t"] for r in
              d.groupBy("_pid").agg(F.sum(token_col).alias("t")).collect()}
    if not totals:
        return df.withColumn("shard_id", F.lit(0))
    offsets, acc = {}, 0
    for pid in sorted(totals):  # range partitions are globally ordered
        offsets[pid] = acc
        acc += totals[pid]
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv])
    # Explicit ROWS frame: the default RANGE frame would hand every row
    # tied on (_ord, key_col) — i.e. duplicate keys — the same cumulative
    # sum, diverging from the oracle's ROWS UNBOUNDED PRECEDING semantics.
    # Contract: ``key_col`` must be unique (it is the document identity);
    # with duplicate keys the within-tie order, hence the packing, is
    # undefined on both engines.
    w = (Window.partitionBy("_pid")
         .orderBy(F.col("_ord").asc(), F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = F.sum(F.col(token_col)).over(w)
    excl = mapping[F.col("_pid")] + run - F.col(token_col)
    # decimal division: exact integral floor-div beyond double's 2^53
    shard = F.floor(excl.cast("decimal(30,0)")
                    / F.lit(token_budget)).cast("int")
    return d.withColumn("shard_id", shard).drop("_ord", "_pid")


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
