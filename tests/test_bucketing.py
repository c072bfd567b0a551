"""Bucketed co-located joins: the plan must contain NO shuffle Exchange."""

import pytest
from pyspark.sql import functions as F

from langid_mr_spark import bucketing, fixtures, pipeline
from tests.test_plans import plan_of


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, no_broadcast):
    src = fixtures.corpus_df(spark, 80, num_partitions=4)
    out = pipeline.run_pipeline(src)
    try:
        bucketing.write_bucketed(
            src.select("url", "warc_ts", "lang"), "web_pages_b", n_buckets=4)
        bucketing.write_bucketed(
            out.select("url", "keep", "gate_decision"), "filtered_b",
            n_buckets=4)

        joined = bucketing.bucketed_join(spark, "web_pages_b", "filtered_b")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan  # bucket-local join, no shuffle
        assert joined.count() == 80

        # control: the same join on unbucketed frames DOES shuffle
        a = spark.table("web_pages_b").repartition(4)
        b = spark.table("filtered_b").repartition(4)
        control = a.join(b, "url")
        assert "Exchange" in plan_of(control)
    finally:
        spark.sql("DROP TABLE IF EXISTS web_pages_b")
        spark.sql("DROP TABLE IF EXISTS filtered_b")
