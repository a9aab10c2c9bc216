"""Load the driver's synthetic parquet tables and register temp views.

Tables (FIXTURES.md §B): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under an
``sf_dir`` such as /root/testdata/sf0.01.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

__all__ = ["TABLE_NAMES", "load_table", "register_views", "prepare_session"]


def prepare_session(spark: SparkSession) -> SparkSession:
    """Pin session confs required for deterministic, oracle-comparable
    results regardless of who built the session (the driver builds its
    own). UTC timezone keeps collected timestamps identical to
    DuckDB's naive-UTC values."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
    # rejects; read as long nanos and convert (exact integer DIV so the
    # µs truncation matches DuckDB's ns→µs conversion).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/pruning into it."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every synthetic table as a temp view (idempotent) so
    operators can be written in either DataFrame or SQL form."""
    prepare_session(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
