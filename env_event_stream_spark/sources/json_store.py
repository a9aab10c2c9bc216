"""Reader/writer for the reference's FileEventStore on-disk format.

The reference persists one JSON file per event at
``<base>/<topic>/<timestamp>_<eventId>.json`` (src/persistence.ts:
141-145); the filename encodes the sort key (``:143,168``) and reads
are filename-ordered. Here:

- ``json_event_dir`` reads a whole base dir (every topic) in ONE
  distributed ``spark.read.json`` pass with an explicit schema (no
  inference scan), deriving ``topic`` from the directory name — the
  migration path off the reference's storage;
- ``write_json_event_dir`` produces the same layout (driver-side,
  test/compat use only — parquet is the system of record; a
  JSON-file-per-event layout at 100 TB is a small-files disaster,
  which is exactly why the engine stores columnar).
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["json_event_dir", "write_json_event_dir"]

# On-disk JSON shape: Event with epoch-ms integer timestamp
# (src/types.ts:23 — timestamps are epoch-ms numbers in the reference).
_JSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("schemaVersion", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def json_event_dir(spark: SparkSession, base_path: str) -> DataFrame:
    """Read a reference FileEventStore directory into the canonical
    event frame (TimestampType ts). Topic comes from the JSON body
    (the reference writes it there too); epoch-ms → timestamp via
    timestamp_millis (exact integer path)."""
    df = spark.read.schema(_JSON_SCHEMA).option("recursiveFileLookup", "true").json(
        base_path
    )
    return df.select(
        "id",
        "type",
        "topic",
        F.timestamp_millis(F.col("timestamp")).alias("timestamp"),
        "schemaVersion",
        "payload",
        "metadata",
    )


def write_json_event_dir(rows: list[Row], base_path: str) -> int:
    """Write events in the reference's exact layout
    (``<topic>/<epoch_ms>_<id>.json``) — round-trip/compat helper."""
    n = 0
    for r in rows:
        # Event timestamps are naive-UTC by contract; naive
        # datetime.timestamp() would interpret them as PROCESS-LOCAL
        # time and write epoch-ms values shifted by the UTC offset
        # into the reference's layout (interop corruption — found by
        # the TZ=America/New_York invariance run of the test suite).
        ts = r.timestamp
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        ms = int(ts.timestamp() * 1000)
        d = os.path.join(base_path, r.topic)
        os.makedirs(d, exist_ok=True)
        doc = {
            "id": r.id,
            "type": r.type,
            "topic": r.topic,
            "timestamp": ms,
            "schemaVersion": r.schemaVersion,
            "payload": r.payload,
            "metadata": dict(r.metadata) if r.metadata else None,
        }
        with open(os.path.join(d, f"{ms}_{r.id}.json"), "w") as f:
            json.dump(doc, f)
        n += 1
    return n
