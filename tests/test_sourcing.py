"""Event-sourcing fold tests (reference src/sourcing.ts semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_event_stream_spark.sourcing import (
    fold_balance_with_reset,
    init_balance,
    rehydrate_all,
    rehydrate_one,
)
from env_event_stream_spark.tables import load_table

DDL = "user_id bigint, version bigint, balance double"


def test_fold_order_and_version(spark):
    """Fold applies in (ts, tiebreak) order; version = event count
    (src/sourcing.ts:41-62)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 2), 3, "click", 10.0),
        (1, dt.datetime(2024, 1, 1, 0, 1), 2, "signup", 0.0),
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "click", 5.0),
        (1, dt.datetime(2024, 1, 1, 0, 3), 4, "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string, value double"
    )
    out = rehydrate_all(
        df, "user_id", "ts", fold_balance_with_reset, init_balance, DDL,
        tiebreak_col="event_id",
    ).collect()
    assert len(out) == 1
    # order: click(5) → signup(reset) → click(10) → purchase(7) = 17
    assert out[0].balance == 17.0
    assert out[0].version == 4


def test_rehydrate_one_matches_bulk(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    bulk = {
        r.user_id: r
        for r in rehydrate_all(
            ev, "user_id", "ts", fold_balance_with_reset, init_balance, DDL,
            tiebreak_col="event_id",
        ).collect()
    }
    one = rehydrate_one(
        ev, "user_id", 7, "ts", fold_balance_with_reset, init_balance, DDL,
        tiebreak_col="event_id",
    ).collect()[0]
    assert abs(one.balance - bulk[7].balance) < 1e-9
    assert one.version == bulk[7].version


def test_fold_matches_sql_identity(spark, sf_dir):
    """The applyInPandas fold equals the sum-since-last-signup SQL
    identity (same invariant the oracle checks)."""
    ev = load_table(spark, sf_dir, "events")
    folded = rehydrate_all(
        ev.select("user_id", "ts", "event_id", "event_type", "value"),
        "user_id", "ts", fold_balance_with_reset, init_balance, DDL,
        tiebreak_col="event_id",
    )
    ls = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.max("ts").alias("sts")
    )
    sql_side = (
        ev.join(ls, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("sts").isNull() | (F.col("ts") > F.col("sts")),
                            F.col("value"),
                        )
                    ),
                    F.lit(0.0),
                ),
                4,
            ).alias("balance_sql")
        )
    )
    joined = folded.withColumn("b", F.round("balance", 4)).join(
        sql_side, "user_id"
    )
    mismatch = joined.where(
        F.abs(F.col("b") - F.col("balance_sql")) > 1e-6
    ).count()
    assert mismatch == 0


def test_incremental_rehydrate_matches_full(spark, sf_dir):
    """Snapshot first half, fold only the tail — must equal the full
    fold (including keys with no new events and brand-new keys)."""
    from env_event_stream_spark.sourcing import (
        fold_balance_with_reset,
        init_balance,
        rehydrate_all,
        rehydrate_incremental,
        snapshot_states,
    )
    from env_event_stream_spark.tables import load_table

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cut = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    ddl = "user_id bigint, version bigint, balance double"

    snap = snapshot_states(
        ev.where(F.col("ts") <= cut), "user_id", "ts",
        fold_balance_with_reset, init_balance, ddl, tiebreak_col="event_id",
    )
    inc = rehydrate_incremental(
        ev, snap, "user_id", "ts", fold_balance_with_reset, init_balance,
        ["balance"], ddl, tiebreak_col="event_id",
    )
    full = rehydrate_all(
        ev, "user_id", "ts", fold_balance_with_reset, init_balance, ddl,
        tiebreak_col="event_id",
    )
    got = {r.user_id: (r.version, round(r.balance, 6)) for r in inc.collect()}
    want = {r.user_id: (r.version, round(r.balance, 6)) for r in full.collect()}
    assert got == want
