"""Event-id generation (reference F1, src/utils.ts:13-40).

The reference's format is ``<epoch_ms base36>-<11 hex chars>-<6-digit
counter>``: a sortable time prefix, random entropy, and a per-process
counter. Two Spark forms:

- ``event_id_expr``    — faithful distributed analog, pure Catalyst:
  base36 time prefix via conv(), entropy from uuid(), a
  partition-local counter from monotonically_increasing_id(). Unique
  across a cluster without coordination.
- ``simple_id_expr``   — plain uuid() when sortability isn't needed.

Nondeterministic by nature → exercised by pytest, not the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["event_id_expr", "simple_id_expr"]


def event_id_expr(ts: Column | None = None) -> Column:
    """``<base36 epoch-ms>-<11 hex>-<6 digits>``. ``ts`` defaults to
    current_timestamp(); pass the event-time column for replayable
    ids."""
    ts_ms = (
        F.unix_millis(ts if ts is not None else F.current_timestamp())
    ).cast("bigint")
    base36 = F.lower(F.conv(ts_ms.cast("string"), 10, 36))
    entropy = F.substring(F.regexp_replace(F.expr("uuid()"), "-", ""), 1, 11)
    counter = F.lpad(
        (F.monotonically_increasing_id() % 1_000_000).cast("string"), 6, "0"
    )
    return F.concat_ws("-", base36, entropy, counter)


def simple_id_expr() -> Column:
    return F.expr("uuid()")
