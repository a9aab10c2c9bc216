"""Skew handling: salted join equivalence + AQE skew config."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_event_stream_spark.operators.relational import salted_join


def _skewed_frames(spark):
    # 90% of rows share key 0 — the power-law head
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("rv")
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = {(r.lid, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.lid, r.rv) for r in salted_join(left, right, ["k"]).collect()}
    assert salted == plain and len(plain) == 5000


def test_salted_join_left_outer(spark):
    left, right = _skewed_frames(spark)
    # drop key 0 from the right so the hot key goes unmatched
    right2 = right.where(F.col("k") != 0)
    plain = {(r.lid, r.rv) for r in left.join(right2, "k", "left").collect()}
    salted = {
        (r.lid, r.rv)
        for r in salted_join(left, right2, ["k"], how="left").collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    """The hot key's rows must occupy every salt bucket."""
    left, _ = _skewed_frames(spark)
    n = (
        left.withColumn(
            "_salt", (F.monotonically_increasing_id() % 8).cast("int")
        )
        .where(F.col("k") == 0)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n == 8


def test_aqe_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
