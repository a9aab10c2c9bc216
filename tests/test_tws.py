"""transformWithStateInPandas processors (streaming/tws.py).

The full streaming tests require the protobuf runtime (the TWS Python
state server's wire protocol); in this container TWS_AVAILABLE is
False and they skip. The pure-Python pieces (interval parsing, timer
arithmetic, processor construction) run everywhere.
"""

from __future__ import annotations

import datetime as dt

import pytest

from env_event_stream_spark.streaming.tws import (
    TWS_AVAILABLE,
    SessionMonitorProcessor,
    _interval_ms,
    sessionize_with_timers,
)

needs_tws = pytest.mark.skipif(
    not TWS_AVAILABLE, reason="google.protobuf runtime not installed"
)


def test_interval_ms_parser():
    assert _interval_ms("30 minutes") == 1_800_000
    assert _interval_ms("1 hour") == 3_600_000
    assert _interval_ms("500 milliseconds") == 500
    assert _interval_ms("2 days") == 172_800_000
    with pytest.raises(ValueError):
        _interval_ms("3 fortnights")


def test_processor_constructs_without_spark():
    p = SessionMonitorProcessor(gap_ms=60_000, value_col="v")
    assert p.gap_ms == 60_000 and p.value_col == "v"


def test_sessionize_refuses_non_utc_session(spark):
    """The timer-arm path reads TWS's naive timestamps as UTC, which
    only holds under session.timeZone=UTC (Arrow localizes to the
    SESSION tz). A sweep overriding the session timezone must get a
    loud refusal, not silently mis-armed timers (ADVICE r12). Guard
    runs driver-side BEFORE transformWithStateInPandas, so this
    needs no protobuf."""
    from env_event_stream_spark.streaming.tws import _require_utc_session

    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 1.0)], "key string, ts timestamp, value double"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="session.timeZone"):
            sessionize_with_timers(df, "key", "ts")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _require_utc_session(df)  # no raise under the pinned default
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@needs_tws
def test_sessionize_with_timers_end_to_end(spark, tmp_path):
    """Timer closes a session once the watermark passes last+gap."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    schema = "key string, ts timestamp, value double"
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows: list = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        out = sessionize_with_timers(
            stream, "key", "ts", gap="30 minutes", watermark="10 minutes"
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _e: rows.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", t(10), 1.0), ("a", t(10, 5), 2.0), ("b", t(10), 5.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert rows == []  # watermark has not passed 10:35 yet

    # 12:00 event → watermark 11:50 > both 10:35 timers → sessions close
    spark.createDataFrame([("a", t(12), 3.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    closed = {r.key: r for r in rows}
    assert closed["a"].n_events == 2 and closed["a"].total == 3.0
    assert closed["b"].n_events == 1 and closed["b"].total == 5.0
