"""JSON-Schema → StructType translation + DataFrame-level routing."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from env_event_stream_spark.schema_registry import (
    SchemaRegistry,
    json_schema_to_struct,
)

USER_SCHEMA = {
    "type": "object",
    "required": ["userId", "username"],
    "properties": {
        "userId": {"type": "string"},
        "username": {"type": "string"},
        "age": {"type": "integer"},
        "score": {"type": "number"},
        "active": {"type": "boolean"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "address": {
            "type": "object",
            "required": ["city"],
            "properties": {"city": {"type": "string"}, "zip": {"type": "string"}},
        },
    },
}


def test_translation_types():
    s = json_schema_to_struct(USER_SCHEMA)
    assert isinstance(s, T.StructType)
    by_name = {f.name: f for f in s.fields}
    assert isinstance(by_name["userId"].dataType, T.StringType)
    assert not by_name["userId"].nullable  # required
    assert by_name["age"].nullable
    assert isinstance(by_name["age"].dataType, T.LongType)
    assert isinstance(by_name["score"].dataType, T.DoubleType)
    assert isinstance(by_name["active"].dataType, T.BooleanType)
    assert isinstance(by_name["tags"].dataType, T.ArrayType)
    assert isinstance(by_name["tags"].dataType.elementType, T.StringType)
    assert isinstance(by_name["address"].dataType, T.StructType)


def test_split_routes_invalid_rows(spark):
    reg = SchemaRegistry()
    reg.register("user.created", USER_SCHEMA)
    rows = [
        ("user.created", '{"userId": "1", "username": "ann"}'),           # valid
        ("user.created", '{"userId": "2"}'),                              # missing req
        ("user.created", "not json at all"),                              # malformed
        ("user.created", '{"userId":"3","username":"bo","address":{}}'),  # nested req
        ("other.type", '{"free": "form"}'),                               # no schema → pass
    ]
    df = spark.createDataFrame(rows, "type string, payload string")
    valid, invalid = reg.split(df)
    v = {r.payload for r in valid.collect()}
    iv = invalid.collect()
    assert '{"userId": "1", "username": "ann"}' in v
    assert '{"free": "form"}' in v
    assert len(iv) == 3
    assert all("validation failed" in r.validation_error for r in iv)


def test_version_advisory(spark, caplog):
    """Version mismatch warns but validates against latest
    (src/schema.ts:56-61)."""
    reg = SchemaRegistry()
    reg.register("e", {"type": "object", "properties": {"a": {"type": "string"}}},
                 version="1.0")
    entry = reg.get("e", version="9.9")
    assert entry is not None
    assert entry.version == "1.0"
