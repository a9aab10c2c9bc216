"""A true pluggable source (SURVEY.md §2.10 U4): the reference's
FileEventStore on-disk layout as a Spark Python DataSource.

The reference treats storage as a swappable interface
(src/types.ts:181-204); Spark's equivalent extension point is the
DataSource API. This source reads the exact one-JSON-file-per-event
layout (``<base>/<topic>/<epoch_ms>_<id>.json``,
src/persistence.ts:141-145) as::

    spark.dataSource.register(JsonEventDataSource)
    spark.read.format("env_json_events").option("path", base).load()

Partitioning: one input partition per topic directory — mirroring the
reference's per-topic layout and giving topic-level parallelism. (At
real scale you'd further split large topics by file ranges; the
sources/json_store.py batch reader via spark.read.json remains the
bulk-migration path — this class is the *interface parity* piece.)
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["JsonEventDataSource"]

_SCHEMA = (
    "id string, type string, topic string, timestamp timestamp, "
    "schemaVersion string, payload string, metadata map<string,string>"
)


class _TopicPartition(InputPartition):
    def __init__(self, topic_dir: str):
        self.topic_dir = topic_dir


class _JsonEventReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("env_json_events requires option('path', ...)")

    def partitions(self):
        topics = sorted(
            d
            for d in os.listdir(self.path)
            if os.path.isdir(os.path.join(self.path, d))
        )
        return [_TopicPartition(os.path.join(self.path, t)) for t in topics]

    def read(self, partition: _TopicPartition):
        # filename-sorted = timestamp order (src/persistence.ts:143,168)
        for name in sorted(os.listdir(partition.topic_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(partition.topic_dir, name)) as f:
                doc = json.load(f)
            ts = dt.datetime.fromtimestamp(
                doc["timestamp"] / 1000.0, tz=dt.timezone.utc
            ).replace(tzinfo=None)
            yield (
                doc.get("id"),
                doc.get("type"),
                doc.get("topic"),
                ts,
                doc.get("schemaVersion"),
                doc.get("payload")
                if isinstance(doc.get("payload"), (str, type(None)))
                else json.dumps(doc.get("payload")),
                doc.get("metadata"),
            )


class JsonEventDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "env_json_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _JsonEventReader(self.options)
