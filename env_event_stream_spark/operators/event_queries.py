"""The reference's event-query surface as DataFrame builders.

The reference's whole "query language" is the option object of
``EventStore.getEvents`` (reference src/types.ts:190-198): topic
equality, timestamp range, event-type IN-list, ORDER BY timestamp ASC,
LIMIT — and the DLQ variant (src/types.ts:233-237) which sorts DESC.
Here each predicate is a Catalyst expression so it pushes down to the
parquet scan (verify with .explain(): PushedFilters).

Scale note: at 100 TB the events table is partitioned by topic (and
date-bucketed on ts); topic equality prunes partitions, ts-range skips
row groups via parquet min/max stats, and sort+limit compiles to
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["get_events", "get_dlq_events", "retention_candidates", "exists_probe"]


def _apply_filters(
    df: DataFrame,
    *,
    topic: str | None = None,
    topic_col: str = "topic",
    from_ts: datetime | str | None = None,
    to_ts: datetime | str | None = None,
    ts_col: str = "ts",
    event_types: Sequence[str] | None = None,
    type_col: str = "event_type",
    extra: Column | None = None,
) -> DataFrame:
    # Reference semantics: all bounds inclusive (src/persistence.ts:46-57).
    if topic is not None:
        df = df.where(F.col(topic_col) == F.lit(topic))
    if from_ts is not None:
        df = df.where(F.col(ts_col) >= F.lit(from_ts))
    if to_ts is not None:
        df = df.where(F.col(ts_col) <= F.lit(to_ts))
    if event_types is not None:
        df = df.where(F.col(type_col).isin(list(event_types)))
    if extra is not None:
        df = df.where(extra)
    return df


def get_events(
    df: DataFrame,
    *,
    topic: str | None = None,
    topic_col: str = "topic",
    from_ts: datetime | str | None = None,
    to_ts: datetime | str | None = None,
    ts_col: str = "ts",
    event_types: Sequence[str] | None = None,
    type_col: str = "event_type",
    limit: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """EventStore.getEvents (reference src/persistence.ts:28-69):
    filters -> ORDER BY ts ASC -> LIMIT.

    ``tiebreak_col`` makes the top-k deterministic when many rows share
    a timestamp (the reference relies on insertion order, which has no
    distributed analog)."""
    out = _apply_filters(
        df, topic=topic, topic_col=topic_col, from_ts=from_ts, to_ts=to_ts,
        ts_col=ts_col, event_types=event_types, type_col=type_col,
    )
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    out = out.orderBy(*order)
    # limit <= 0 means NO limit, as in the reference: the in-memory
    # store's `if (options.limit)` treats 0 as falsy
    # (src/persistence.ts:63) and the DLQ guard is explicit
    # `limit > 0` (src/deadletter.ts:66) — a ported caller passing
    # limit: 0 expects everything, not an empty frame.
    if limit is not None and limit > 0:
        out = out.limit(limit)
    return out


def get_dlq_events(
    df: DataFrame,
    *,
    topic: str | None = None,
    topic_col: str = "topic",
    event_type: str | None = None,
    type_col: str = "event_type",
    ts_col: str = "ts",
    limit: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """DeadLetterQueue.getEvents (reference src/deadletter.ts:39-72):
    equality filters -> ORDER BY ts DESC -> LIMIT (newest first)."""
    out = _apply_filters(
        df, topic=topic, topic_col=topic_col,
        event_types=[event_type] if event_type is not None else None,
        type_col=type_col,
    )
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    out = out.orderBy(*order)
    # limit <= 0 = no limit (src/deadletter.ts:66 `limit > 0`)
    if limit is not None and limit > 0:
        out = out.limit(limit)
    return out


def retention_candidates(
    df: DataFrame,
    before_ts: datetime | str,
    *,
    topic: str | None = None,
    topic_col: str = "topic",
    ts_col: str = "ts",
) -> DataFrame:
    """Rows a retention sweep would delete: ``ts < before`` (strict,
    reference src/persistence.ts:84: ``timestamp < beforeTimestamp``).
    Returned as a DataFrame so callers can count (A2) or anti-join."""
    out = df.where(F.col(ts_col) < F.lit(before_ts))
    if topic is not None:
        out = out.where(F.col(topic_col) == F.lit(topic))
    return out


def exists_probe(df: DataFrame, key_col: str, keys_df: DataFrame) -> DataFrame:
    """Aggregate-exists probe (reference src/sourcing.ts:227-231:
    "any event for this key?") generalized to all keys at once via a
    LEFT SEMI join — one distributed pass instead of per-key LIMIT 1
    round trips."""
    return keys_df.join(df, on=key_col, how="left_semi")
