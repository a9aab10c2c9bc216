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
    # compare the INSTANT: collect() renders TimestampType in the
    # process-local tz (tz invariance run); the stored value is
    # 2024-01-01T10:00Z by the naive-UTC event contract
    assert got["e1"].timestamp.astimezone(dt.timezone.utc).replace(
        tzinfo=None
    ) == dt.datetime(2024, 1, 1, 10, 0, 0)
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


def test_jdbc_ddl_matches_reference_shape():
    """S10: the Postgres DDL is column-for-column the reference's
    CREATE TABLE (src/persistence.ts:262-288) — topic before type,
    created_at audit column, and the `<table>_<col>_idx` index
    naming. Two documented divergences: id stays TEXT (the reference
    default `idType: "uuid"` rejects its own generateId() output,
    which is not a UUID) and payload stays NULLABLE (this engine
    supports payload-less events; NOT NULL would reject them at
    mirror time)."""
    from env_event_stream_spark.sources.jdbc_store import DDL

    cols = [
        "id TEXT PRIMARY KEY",
        "topic TEXT NOT NULL",
        "type TEXT NOT NULL",
        "timestamp BIGINT NOT NULL",
        "schema_version TEXT NOT NULL",
        "payload JSONB",  # nullable (divergence: payload-less events)
        "metadata JSONB",
        "created_at TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP",
    ]
    # reference column ORDER preserved
    positions = [DDL.index(c) for c in cols]
    assert positions == sorted(positions)
    # pre-r12 index names are dropped (migration; no-op when fresh)
    for legacy in ("idx_events_topic", "idx_events_timestamp",
                   "idx_events_type", "idx_events_topic_timestamp"):
        assert f"DROP INDEX IF EXISTS {legacy};" in DDL
    for idx in (
        "events_topic_idx ON events (topic)",
        "events_timestamp_idx ON events (timestamp)",
        "events_type_idx ON events (type)",
        "events_topic_timestamp_idx ON events (topic, timestamp)",
    ):
        assert f"CREATE INDEX IF NOT EXISTS {idx}" in DDL


def test_jdbc_store_roundtrip_derby(spark, tmp_path):
    """S7/S8 (reference src/persistence.ts:299-402) against embedded
    Derby: append, filtered ordered limited read-back, and predicate
    pushdown into the database (the reference's hand-built WHERE)."""
    from env_event_stream_spark.sources.jdbc_store import JdbcEventStore

    store = JdbcEventStore(
        spark,
        f"jdbc:derby:{tmp_path}/db;create=true",
        table="events",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        createTableColumnTypes=(
            "id VARCHAR(64), type VARCHAR(64), topic VARCHAR(64), "
            "schema_version VARCHAR(16), payload VARCHAR(4096)"
        ),
    )
    store.save_events(
        spark.createDataFrame(
            [
                ("e1", "click", "web", 1000, "1.0", '{"a":1}'),
                ("e2", "view", "web", 2000, "1.0", '{"a":2}'),
                ("e3", "click", "app", 1500, "1.0", "{}"),
                ("e4", "click", "web", 50, "1.0", "{}"),  # below from_ts
                ("e5", "other", "web", 1200, "1.0", "{}"),  # type excluded
            ],
            "id string, type string, topic string, timestamp bigint,"
            " schema_version string, payload string",
        )
    )
    # metadata (incl. PushedFilters) is truncated at plan-build time —
    # widen before constructing the query
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        out = store.get_events(
            "web", from_ts=500, event_types=["click", "view"], limit=5
        )
        assert [(r.id, r.timestamp) for r in out.collect()] == [
            ("e1", 1000),
            ("e2", 2000),
        ]
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    # '*' marks filters the database applied (not re-checked by Spark)
    assert "*EqualTo(topic,web)" in plan

    # deletes run as ONE driver-side parameterized JDBC statement
    # (reference src/persistence.ts:404-425) — nothing scanned into
    # Spark. Strictly-before retention cutoff, then whole-topic drop.
    assert store.delete_events("web", 1200) == 2  # e4 (50), e1 (1000)
    assert store.delete_topic("app") == 1  # e3
    left = {r.id for r in store.get_events("web").collect()}
    assert left == {"e2", "e5"}
    assert store.get_events("app").count() == 0
    assert "*GreaterThanOrEqual(timestamp,500)" in plan


def test_python_datasource_streaming_incremental(spark, tmp_path):
    """The simpleStreamReader delivers only newly-arrived event files
    per micro-batch ({topic: last-filename} offsets), giving the
    reference's subscribe backlog+live semantics (src/topic.ts:71-86)
    with no-loss offset tracking."""
    from env_event_stream_spark.sources.json_datasource import (
        JsonEventDataSource,
    )

    src = str(tmp_path / "store")
    ckpt = str(tmp_path / "ck")
    write_json_event_dir(
        [
            make_event("orders", "order.placed", '{"n": 1}', None,
                       timestamp=dt.datetime(2024, 1, 1, 10), event_id="s1"),
            make_event("users", "user.created", '{"n": 2}', None,
                       timestamp=dt.datetime(2024, 1, 1, 11), event_id="s2"),
        ],
        src,
    )
    spark.dataSource.register(JsonEventDataSource)
    seen: list = []

    def run_once():
        stream = (
            spark.readStream.format("env_json_events")
            .option("path", src)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _e: seen.extend(r.id for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(seen) == ["s1", "s2"]

    # batch 2: one new file per topic — ONLY the new ids arrive
    write_json_event_dir(
        [
            make_event("orders", "order.paid", '{"n": 3}', None,
                       timestamp=dt.datetime(2024, 1, 1, 12), event_id="s3"),
        ],
        src,
    )
    seen.clear()
    run_once()
    assert seen == ["s3"]


def test_write_json_event_dir_epoch_ms_is_utc_everywhere(tmp_path):
    """The FileEventStore layout stores ABSOLUTE epoch ms
    (src/persistence.ts:143); the writer must produce the same bytes
    whatever the host timezone, for naive-UTC (the event contract)
    and tz-aware inputs alike. Fuzzes the instant over 50 years and
    three host timezones via tzset (the bug this pins: naive
    .timestamp() read the contract as process-local time)."""
    import json
    import os
    import time

    from hypothesis import given, settings
    from hypothesis import strategies as st

    if not hasattr(time, "tzset"):
        import pytest

        pytest.skip("tzset not available")

    @settings(max_examples=25, deadline=None)
    @given(
        epoch_s=st.integers(min_value=0, max_value=50 * 365 * 86400),
        tz_name=st.sampled_from(["UTC", "America/New_York", "Asia/Tokyo"]),
        aware=st.booleans(),
    )
    def run(epoch_s, tz_name, aware):
        old = os.environ.get("TZ")
        os.environ["TZ"] = tz_name
        time.tzset()
        try:
            naive_utc = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=epoch_s)
            ts = (
                naive_utc.replace(tzinfo=dt.timezone.utc) if aware else naive_utc
            )
            row = make_event(
                "t", "e.one", None, None, timestamp=ts, event_id="x1"
            )
            base = tmp_path / f"fuzz_{epoch_s}_{tz_name}_{aware}"
            write_json_event_dir([row], str(base))
            expect_ms = epoch_s * 1000
            path = base / "t" / f"{expect_ms}_x1.json"
            assert path.exists(), list((base / "t").iterdir())
            assert json.load(open(path))["timestamp"] == expect_ms
        finally:
            if old is None:
                del os.environ["TZ"]
            else:
                os.environ["TZ"] = old
            time.tzset()

    run()
