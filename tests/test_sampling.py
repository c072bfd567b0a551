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
