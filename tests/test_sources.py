"""Sources: reference FileEventStore JSON round-trip, id generation."""

from __future__ import annotations

import datetime as dt
import re

from env_event_stream_spark.functions.ids import event_id_expr
from env_event_stream_spark.sources import json_event_dir, write_json_event_dir
from env_event_stream_spark.storage.event_store import make_event


def test_json_event_dir_roundtrip(spark, tmp_path):
    """Read the reference's one-file-per-event layout
    (<topic>/<ts>_<id>.json) back into the canonical event frame."""
    rows = [
        make_event("orders", "order.placed", '{"amount": 1}',
                   {"src": "t"}, timestamp=dt.datetime(2024, 1, 1, 10, 0, 0),
                   event_id="e1"),
        make_event("orders", "order.paid", '{"amount": 2}', None,
                   timestamp=dt.datetime(2024, 1, 1, 11, 0, 0), event_id="e2"),
        make_event("users", "user.created", '{"u": "a"}', None,
                   timestamp=dt.datetime(2024, 1, 2, 9, 0, 0), event_id="e3"),
    ]
    n = write_json_event_dir(rows, str(tmp_path))
    assert n == 3
    # layout matches the reference: <base>/<topic>/<epoch_ms>_<id>.json
    assert (tmp_path / "orders" / "1704103200000_e1.json").exists()

    df = json_event_dir(spark, str(tmp_path))
    got = {r.id: r for r in df.collect()}
    assert set(got) == {"e1", "e2", "e3"}
    assert got["e1"].topic == "orders"
    assert got["e1"].timestamp == dt.datetime(2024, 1, 1, 10, 0, 0)
    assert got["e1"].payload == '{"amount": 1}'
    assert got["e1"].metadata == {"src": "t"}
    assert got["e3"].topic == "users"


def test_event_id_expr_format_and_uniqueness(spark):
    df = spark.range(500).select(event_id_expr().alias("id"))
    ids = [r.id for r in df.collect()]
    assert len(set(ids)) == 500
    # <base36 ts>-<11 hex>-<6 digits> (reference src/utils.ts:13-40)
    pat = re.compile(r"^[0-9a-z]+-[0-9a-f]{11}-\d{6}$")
    assert all(pat.match(i) for i in ids), ids[:3]


def test_python_datasource_roundtrip(spark, tmp_path):
    """The custom DataSource reads the reference layout with one input
    partition per topic (U4 — pluggable storage as a real Spark
    source, not just a path-glob reader)."""
    from env_event_stream_spark.sources.json_datasource import (
        JsonEventDataSource,
    )

    rows = [
        make_event("orders", "order.placed", '{"amount": 1}', {"s": "x"},
                   timestamp=dt.datetime(2024, 1, 1, 10), event_id="e1"),
        make_event("orders", "order.paid", '{"amount": 2}', None,
                   timestamp=dt.datetime(2024, 1, 1, 11), event_id="e2"),
        make_event("users", "user.created", '{"u": 1}', None,
                   timestamp=dt.datetime(2024, 1, 2, 9), event_id="e3"),
    ]
    write_json_event_dir(rows, str(tmp_path))

    spark.dataSource.register(JsonEventDataSource)
    df = (
        spark.read.format("env_json_events")
        .option("path", str(tmp_path))
        .load()
    )
    got = {r.id: r for r in df.collect()}
    assert set(got) == {"e1", "e2", "e3"}
    assert got["e1"].topic == "orders"
    assert got["e1"].timestamp == dt.datetime(2024, 1, 1, 10)
    assert got["e1"].metadata == {"s": "x"}
    assert got["e3"].type == "user.created"
    # filters compose on top of the source
    assert df.where("topic = 'orders'").count() == 2
