"""Retention purge / orphan / IN-list delete (S9-S13 analogs)."""

from pyspark.sql import functions as F

from langid_mr_spark import fixtures, maintenance as MT, pipeline


def test_purge_by_retention_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    src = pipeline.with_dt(fixtures.corpus_df(spark, 80, num_partitions=2))
    src.write.partitionBy("dt").parquet(path)

    before = spark.read.parquet(path)
    dts = sorted(str(r["dt"]) for r in before.select("dt").distinct().collect())
    cutoff = dts[2]  # purge the two oldest date partitions
    n_victims = before.filter(F.col("warc_ts") < cutoff).count()
    assert n_victims > 0

    removed = MT.purge_by_retention(spark, path, "warc_ts", cutoff)
    assert removed == n_victims

    after = spark.read.parquet(path)
    assert after.count() == 80 - n_victims
    assert after.filter(F.col("warc_ts") < cutoff).count() == 0
    # untouched newer partitions survive byte-for-byte (row-identical)
    newer_before = before.filter(F.col("dt") > cutoff).drop("dt")
    newer_after = after.filter(F.col("dt") > cutoff).drop("dt")
    assert newer_before.exceptAll(newer_after).count() == 0
    assert newer_after.exceptAll(newer_before).count() == 0


def test_purge_noop_when_nothing_expired(spark, tmp_path):
    path = str(tmp_path / "t2")
    pipeline.with_dt(fixtures.corpus_df(spark, 30, num_partitions=2)) \
        .write.partitionBy("dt").parquet(path)
    assert MT.purge_by_retention(spark, path, "warc_ts", "2020-01-01") == 0
    assert spark.read.parquet(path).count() == 30


def test_orphan_rows_left_anti(spark):
    files = spark.createDataFrame(
        [("u1",), ("u2",), ("u3",)], ["url"])
    jobs = spark.createDataFrame([("u1",), ("u3",)], ["url"])
    got = {r["url"] for r in MT.orphan_rows(files, jobs).collect()}
    assert got == {"u2"}


def test_delete_by_keys(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["url"])
    got = {r["url"] for r in MT.delete_by_keys(df, ["b"]).collect()}
    assert got == {"a", "c"}
