"""A true pluggable source (SURVEY.md §2.10 U4): the reference's
FileEventStore on-disk layout as a Spark Python DataSource.

The reference treats storage as a swappable interface
(src/types.ts:181-204); Spark's equivalent extension point is the
DataSource API. This source reads the exact one-JSON-file-per-event
layout (``<base>/<topic>/<epoch_ms>_<id>.json``,
src/persistence.ts:141-145) as::

    spark.dataSource.register(JsonEventDataSource)
    spark.read.format("env_json_events").option("path", base).load()
    spark.readStream.format("env_json_events").option("path", base).load()

The streaming form (simpleStreamReader) is the live subscription:
micro-batches deliver newly-arrived event files, offsets are
{topic: last filename}, and recovery replays an exact offset range.

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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
            yield _parse_file(os.path.join(partition.topic_dir, name))


def _parse_file(path: str):
    with open(path) as f:
        doc = json.load(f)
    ts = dt.datetime.fromtimestamp(
        doc["timestamp"] / 1000.0, tz=dt.timezone.utc
    ).replace(tzinfo=None)
    return (
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


class _JsonEventStreamReader(SimpleDataSourceStreamReader):
    """Live-subscription view of the FileEventStore layout: each
    micro-batch delivers the files that appeared since the last
    offset. The offset is {topic: last-consumed filename}; filenames
    are ``<epoch_ms>_<id>.json`` so lexicographic order IS publish
    order (src/persistence.ts:143,168) and an offset range replays
    deterministically (readBetweenOffsets — required for recovery).
    This is the reference's Topic.subscribe backlog+live semantics
    (src/topic.ts:71-86) with Spark's no-loss offset tracking."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("env_json_events requires option('path', ...)")

    def initialOffset(self) -> dict:
        return {}

    def _files(self, topic: str, after: str | None, upto: str | None = None):
        tdir = os.path.join(self.path, topic)
        names = sorted(
            n for n in os.listdir(tdir) if n.endswith(".json")
        )
        for n in names:
            if after is not None and n <= after:
                continue
            if upto is not None and n > upto:
                continue
            yield n

    def _topics(self):
        return sorted(
            d
            for d in os.listdir(self.path)
            if os.path.isdir(os.path.join(self.path, d))
        )

    def read(self, start: dict):
        rows = []
        end = dict(start)
        for topic in self._topics():
            last = start.get(topic)
            for name in self._files(topic, last):
                rows.append(_parse_file(os.path.join(self.path, topic, name)))
                end[topic] = name
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay is bounded EXACTLY by the recorded offset range: a
        # topic directory absent from `end` was created after the end
        # offset was captured, so none of its files belong to this
        # batch — replaying them here would emit events beyond `end`
        # that the next read() batch delivers again (duplicates on
        # recovery).
        for topic in self._topics():
            upto = end.get(topic)
            if upto is None:
                continue
            for name in self._files(topic, start.get(topic), upto):
                yield _parse_file(os.path.join(self.path, topic, name))

    def commit(self, end: dict) -> None:
        pass


class JsonEventDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "env_json_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _JsonEventReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _JsonEventStreamReader(self.options)
