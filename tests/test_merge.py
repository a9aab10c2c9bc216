"""CDC MERGE emulation: op semantics, same-key batch compaction, and
the deterministic conflict rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_event_stream_spark.operators.merge import merge_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, v double",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, name string, v double, op string, seq bigint"
    )


def _rowset(df):
    return sorted(map(tuple, df.collect()))


def test_merge_insert_update_delete(spark):
    ch = _changes(spark, [
        (2, "b2", 21.0, "update", 1),     # replace
        (3, None, 0.0, "delete", 1),      # drop
        (4, "d", 40.0, "insert", 1),      # new
        (5, "e", 50.0, "update", 1),      # unmatched update -> no-op
        (1, "a9", 99.0, "insert", 1),     # insert on existing -> no-op
    ])
    got = _rowset(merge_changes(_base(spark), ch, "id"))
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)]


def test_merge_upsert_both_sides(spark):
    ch = _changes(spark, [
        (1, "a2", 11.0, "upsert", 1),   # matched -> update
        (9, "i", 90.0, "upsert", 1),    # unmatched -> insert
    ])
    got = _rowset(merge_changes(_base(spark), ch, "id"))
    assert (1, "a2", 11.0) in got and (9, "i", 90.0) in got
    assert len(got) == 4


def test_merge_batch_compaction_latest_seq_wins(spark):
    ch = _changes(spark, [
        (2, "x", 1.0, "update", 1),
        (2, "y", 2.0, "update", 5),     # later seq wins
        (2, "z", 3.0, "update", 3),
        (3, "k", 9.0, "insert", 2),     # insert on existing: no-op...
        (3, None, 0.0, "delete", 2),    # ...same seq: delete outranks
    ])
    got = _rowset(merge_changes(_base(spark), ch, "id"))
    assert got == [(1, "a", 10.0), (2, "y", 2.0)]


def test_merge_is_idempotent_for_compacted_batch(spark):
    ch = _changes(spark, [(2, "b2", 21.0, "upsert", 1),
                          (3, None, 0.0, "delete", 1)])
    once = merge_changes(_base(spark), ch, "id")
    twice = merge_changes(once, ch, "id")
    assert _rowset(once) == _rowset(twice)
