"""Incrementally-maintained rollup view: per-batch partition merge
must equal a from-scratch aggregation of everything seen so far."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from env_event_stream_spark.streaming.matview import DailyRollupView

_SCHEMA = "ts timestamp, event_type string, value double"


def _rows(spec):
    return [(dt.datetime(2024, 1, d, h), t, float(v)) for (d, h, t, v) in spec]


def _utc(d):
    """collect() renders TimestampType in the process-local tz; key
    on the UTC instant so the assertions hold off-UTC too (found by
    the TZ=America/New_York invariance run)."""
    return d.astimezone(dt.timezone.utc).replace(tzinfo=None)


def _truth(spark, all_rows):
    df = spark.createDataFrame(all_rows, _SCHEMA)
    return {
        (_utc(r.day), r.event_type): (r.n, round(r.sv, 6))
        for r in df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }


def _view_state(view):
    return {
        (_utc(r.day), r.event_type): (r.n, round(r.sv, 6))
        for r in view.read().collect()
    }


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    view = DailyRollupView(
        spark, str(tmp_path / "rollup"), "ts", ["event_type"], {"sv": "value"}
    )
    b1 = _rows([(1, 9, "a", 1.5), (1, 10, "a", 2.0), (2, 9, "b", 3.0)])
    view.apply_batch(spark.createDataFrame(b1, _SCHEMA))
    assert _view_state(view) == _truth(spark, b1)

    # batch 2 touches day 1 again (merge) and adds day 3 (new part)
    b2 = _rows([(1, 23, "a", 4.0), (3, 1, "a", 7.0), (1, 5, "b", 1.0)])
    view.apply_batch(spark.createDataFrame(b2, _SCHEMA))
    assert _view_state(view) == _truth(spark, b1 + b2)

    # untouched day-2 partition survived both merges
    assert (dt.datetime(2024, 1, 2), "b") in _view_state(view)


def test_rollup_from_stream_with_idempotent_sink(spark, tmp_path):
    """Wired as a real streaming sink behind the epoch-commit guard."""
    from env_event_stream_spark.streaming.sinks import IdempotentBatchSink

    src = str(tmp_path / "src")
    view = DailyRollupView(
        spark, str(tmp_path / "rollup2"), "ts", ["event_type"], {"sv": "value"}
    )
    sink = IdempotentBatchSink(str(tmp_path / "commits"), view.apply_batch)

    rows = _rows([(1, 9, "a", 1.0), (2, 9, "a", 2.0), (2, 10, "b", 3.0)])
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema(_SCHEMA).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _view_state(view) == _truth(spark, rows)
