"""Deterministic sampling/stratification: subset is a pure function of the
data — stable across reruns, repartitioning, and engines."""

from pyspark.sql import functions as F

from langid_mr_spark import fixtures, sampling


def test_sample_deterministic_and_partition_independent(spark):
    df = fixtures.corpus_df(spark, 200, num_partitions=8)
    a = {r["url"] for r in
         sampling.deterministic_sample(df, 0.2, "url").select("url").collect()}
    b = {r["url"] for r in
         sampling.deterministic_sample(df.repartition(3), 0.2, "url")
         .select("url").collect()}
    assert a == b and 0.05 < len(a) / 200 < 0.45


def test_salts_give_independent_subsets(spark):
    df = fixtures.corpus_df(spark, 200)
    a = {r["url"] for r in
         sampling.deterministic_sample(df, 0.5, "url", salt="a")
         .select("url").collect()}
    b = {r["url"] for r in
         sampling.deterministic_sample(df, 0.5, "url", salt="b")
         .select("url").collect()}
    assert a != b  # different salts → different draws


def test_stratified_cap_limits_each_group(spark):
    df = fixtures.corpus_df(spark, 300)
    out = sampling.stratified_cap(df, ["lang"], 5, "url")
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per and all(n <= 5 for n in per.values())
    # deterministic: same members on rerun
    out2 = sampling.stratified_cap(df, ["lang"], 5, "url")
    assert ({r["url"] for r in out.collect()}
            == {r["url"] for r in out2.collect()})


def test_stratified_cap_partition_independent(spark):
    """The two-phase cap must select the SAME members regardless of how
    the input is partitioned (phase 1's per-partition top-N is a superset
    of each partition's global-top-N members, so phase 2 sees them all)."""
    df = fixtures.corpus_df(spark, 300)
    a = {r["url"] for r in
         sampling.stratified_cap(df.repartition(1), ["lang"], 5, "url")
         .select("url").collect()}
    b = {r["url"] for r in
         sampling.stratified_cap(df.repartition(13), ["lang"], 5, "url")
         .select("url").collect()}
    assert a == b and len(a) > 0


def test_pack_shards_invariants_and_partition_independence(spark):
    """Greedy token-budget packing: each document's shard is the one its
    exclusive prefix offset falls in (so per-shard starting offsets fit in
    [k·B, (k+1)·B)), shards are contiguous in hash order, and the
    assignment is identical regardless of input partitioning (the two-pass
    prefix sum replaces a global window without changing the result)."""
    rows = [(f"doc{i:03d}", 50 + (i * 37) % 400) for i in range(80)]
    df = spark.createDataFrame(rows, "key string, n_tokens long")
    budget = 1000

    out = {r["key"]: r for r in
           sampling.pack_shards(df, budget, "key", "n_tokens").collect()}
    # python twin: same hash order, same exclusive prefix
    hf = {k: int(hashlib_md5_long(k)) for k, _ in rows}
    ordered = sorted(rows, key=lambda kv: (hf[kv[0]], kv[0]))
    run = 0
    for k, n in ordered:
        assert out[k]["shard_id"] == run // budget, k
        run += n

    for parts in (1, 7):
        again = {r["key"]: r["shard_id"] for r in sampling.pack_shards(
            df.repartition(parts), budget, "key", "n_tokens").collect()}
        assert again == {k: r["shard_id"] for k, r in out.items()}


def hashlib_md5_long(key: str) -> int:
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def test_stratified_cap_spreads_group_skew(spark):
    """Phase 1's shuffle key must include the input-partition id so a
    2-group corpus is NOT funneled through 2 reducers: the physical plan's
    first window Exchange hashes on (group, _pid)."""
    df = fixtures.corpus_df(spark, 100, num_partitions=8)
    two_group = df.withColumn("lang", F.col("lang").isin("en").cast("string"))
    plan = (sampling.stratified_cap(two_group, ["lang"], 3, "url")
            ._jdf.queryExecution().executedPlan().toString())
    assert "_pid" in plan
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_pid" in p and "lang" in p for p in parts), parts
