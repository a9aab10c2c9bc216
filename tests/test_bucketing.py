"""Bucketed co-located joins: the 100 TB recipe for repeated joins on
the same key (SURVEY.md §4 — the reference's composite (topic,ts)
index becomes layout, not code). Writing both sides bucketed by the
join key lets sort-merge join run with NO Exchange on either side."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS users_b")
    ev = spark.range(0, 10_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 500).alias("user_id"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    users = spark.range(0, 500).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    (
        ev.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", str(tmp_path / "ev_b"))
        .saveAsTable("ev_b")
    )
    (
        users.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", str(tmp_path / "users_b"))
        .saveAsTable("users_b")
    )
    yield "ev_b", "users_b"
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS users_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ev_t, users_t = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ev_t).join(spark.table(users_t), "user_id")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: neither side shuffles
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """groupBy on the bucket key reuses the layout too."""
    ev_t, _ = bucketed_pair
    agg = spark.table(ev_t).groupBy("user_id").agg(F.sum("value").alias("s"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
