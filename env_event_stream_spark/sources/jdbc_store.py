"""JDBC event store — the PostgresEventStore shape (reference
src/persistence.ts:240-425) over spark-jdbc.

Import-safe without a driver jar; every method builds the plan with
``format("jdbc")`` and predicate pushdown does what the reference's
hand-built WHERE clauses do (src/persistence.ts:341-368): topic/ts/
type predicates reach the database, ORDER BY + LIMIT fold into the
scan. The DDL mirrors the reference's table + indexes
(src/persistence.ts:260-294).

Exercised in-container against embedded Derby (Spark bundles the
driver): tests/test_sources.py verifies the round-trip and that the
topic/ts/type predicates reach the database (PushedFilters with the
``*``-confirmed marker). Derby maps StringType → CLOB, which its SQL
cannot compare — pass ``createTableColumnTypes`` with VARCHARs when
the backend needs it (Postgres does not). The parquet store remains
the system of record.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["JdbcEventStore", "DDL", "DLQ_DDL"]

# reference src/persistence.ts:262-288, column-for-column (topic
# before type, created_at audit column) and the reference's
# `<table>_<col>_idx` index naming. TWO deliberate divergences:
# (1) id is TEXT, not the reference default `idType: "uuid"`
# (src/persistence.ts:251) — the reference's own generateId()
# produces `<ts36>-<11hex>-<counter>` strings (src/utils.ts:13-40)
# which are NOT valid UUIDs, so its default-configured Postgres
# store rejects every id it generates ("invalid input syntax for
# type uuid"); TEXT is what actually interoperates.
# (2) payload is NULLABLE, not the reference's NOT NULL — this
# engine's event model allows payload-less events (EVENT_SCHEMA
# payload is nullable, broker.publish(topic, type) works), and a
# NOT NULL column would reject them at mirror time.
# The four DROP INDEX lines migrate a database initialized with the
# pre-r12 `idx_events_*` names — without them IF NOT EXISTS would
# leave BOTH generations of indexes (double write amplification);
# they are no-ops on a fresh database.
DDL = """
DROP INDEX IF EXISTS idx_events_topic;
DROP INDEX IF EXISTS idx_events_timestamp;
DROP INDEX IF EXISTS idx_events_type;
DROP INDEX IF EXISTS idx_events_topic_timestamp;
CREATE TABLE IF NOT EXISTS events (
  id TEXT PRIMARY KEY,
  topic TEXT NOT NULL,
  type TEXT NOT NULL,
  timestamp BIGINT NOT NULL,
  schema_version TEXT NOT NULL,
  payload JSONB,
  metadata JSONB,
  created_at TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP
);
CREATE INDEX IF NOT EXISTS events_topic_idx ON events (topic);
CREATE INDEX IF NOT EXISTS events_timestamp_idx ON events (timestamp);
CREATE INDEX IF NOT EXISTS events_type_idx ON events (type);
CREATE INDEX IF NOT EXISTS events_topic_timestamp_idx ON events (topic, timestamp);
"""

# reference src/deadletter.ts:285-304 (PostgresDeadLetterQueue
# initialize), column-for-column including the two audit timestamps
# and the DEFAULT 1 attempts counter. The reference's dlq_topic_idx /
# dlq_type_idx are EXPRESSION indexes over JSONB text-path extracts
# ((event_data->>'topic')) — the dialect feature Derby cannot
# exercise; tests/test_postgres_live.py applies this DDL to a real
# PostgreSQL 15 server and pins that the expression indexes build and
# serve the reference's getEvents predicate shape
# (src/deadletter.ts:364-381: event_data->>'topic' = $n equality,
# ORDER BY timestamp DESC, LIMIT $n).
DLQ_DDL = """
CREATE TABLE IF NOT EXISTS events_dlq (
  event_id TEXT PRIMARY KEY,
  event_data JSONB NOT NULL,
  error TEXT NOT NULL,
  subscription TEXT NOT NULL,
  timestamp BIGINT NOT NULL,
  attempts INTEGER NOT NULL DEFAULT 1,
  created_at TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP,
  last_updated TIMESTAMP WITH TIME ZONE DEFAULT CURRENT_TIMESTAMP
);
CREATE INDEX IF NOT EXISTS dlq_topic_idx ON events_dlq ((event_data->>'topic'));
CREATE INDEX IF NOT EXISTS dlq_type_idx ON events_dlq ((event_data->>'type'));
CREATE INDEX IF NOT EXISTS dlq_timestamp_idx ON events_dlq (timestamp);
CREATE INDEX IF NOT EXISTS dlq_subscription_idx ON events_dlq (subscription);
"""


class JdbcEventStore:
    def __init__(self, spark: SparkSession, url: str, table: str = "events",
                 **options: str):
        self.spark = spark
        self.url = url
        self.table = table
        self.options = options

    def _reader(self):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
        )
        for k, v in self.options.items():
            r = r.option(k, v)
        return r

    def get_events(
        self,
        topic: str,
        *,
        from_ts: int | None = None,
        to_ts: int | None = None,
        event_types: Sequence[str] | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """Predicates are Catalyst filters — spark-jdbc pushes them
        into the database WHERE clause, reproducing the reference's
        parameterized SQL (src/persistence.ts:327-402)."""
        df = self._reader().load().where(F.col("topic") == topic)
        if from_ts is not None:
            df = df.where(F.col("timestamp") >= from_ts)
        if to_ts is not None:
            df = df.where(F.col("timestamp") <= to_ts)
        if event_types:
            df = df.where(F.col("type").isin(list(event_types)))
        df = df.orderBy("timestamp")
        # limit <= 0 = no limit (the falsy-limit contract every
        # reference store shares; src/persistence.ts:63)
        if limit is not None and limit > 0:
            df = df.limit(limit)
        return df

    def save_events(self, df: DataFrame) -> None:
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .mode("append")
        )
        for k, v in self.options.items():
            w = w.option(k, v)
        w.save()

    # -- deletes -----------------------------------------------------------
    # Spark's JDBC source is read/append-only; deletes go through one
    # driver-side JDBC statement (exactly the reference's
    # parameterized DELETE, src/persistence.ts:404-425). The database
    # does the work via its topic/timestamp indexes — nothing is
    # scanned into Spark.

    def _execute_update(self, sql: str, params: Sequence) -> int:
        jvm = self.spark._jvm
        driver = self.options.get("driver")
        if driver:  # embedded drivers (Derby) need explicit registration
            jvm.java.lang.Class.forName(driver)
        user = self.options.get("user")
        password = self.options.get("password")
        if user is not None:
            conn = jvm.java.sql.DriverManager.getConnection(
                self.url, user, password or ""
            )
        else:
            conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            ps = conn.prepareStatement(sql)
            try:
                for i, p in enumerate(params):
                    ps.setObject(i + 1, p)
                return ps.executeUpdate()
            finally:
                ps.close()
        finally:
            conn.close()

    def delete_events(self, topic: str, before_ts: int) -> int:
        """Retention: remove a topic's events strictly before the
        cutoff (reference deleteEvents semantics). Returns rows
        deleted. Column identifiers are quoted because Spark's JDBC
        writer quotes them at CREATE time (case-sensitive lowercase
        on Derby; a no-op on Postgres)."""
        return self._execute_update(
            f'DELETE FROM {self.table} WHERE "topic" = ?'
            ' AND "timestamp" < ?',
            [topic, before_ts],
        )

    def delete_topic(self, topic: str) -> int:
        """Drop every event of a topic (broker deleteTopic)."""
        return self._execute_update(
            f'DELETE FROM {self.table} WHERE "topic" = ?', [topic]
        )
