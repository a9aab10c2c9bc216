"""Event-time windowing for streams (SURVEY.md §2.9 GAP operators).

The reference has NO event-time semantics (ordering is wall-clock
assign time, src/broker.ts:104). These builders add the full
Structured Streaming surface: watermarked tumbling/sliding/session
windows, streaming dedup, late-data policy. Each works on both a
batch DataFrame (tests/oracles) and a streaming one (same code path —
the stream/table duality of SURVEY.md §1.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

__all__ = [
    "tumbling",
    "sliding",
    "session",
    "dedup_within_watermark",
]


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    # Watermarks bound streaming state (mandatory at 100 TB: an
    # unbounded session/window state store WILL fall over); no-op on
    # batch frames.
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows."""
    df = _maybe_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration), *keys).agg(*aggs)


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide), *keys).agg(*aggs)


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-gap session windows (session_window built-in). The
    batch analog used by the oracle is the lag+cumsum sessionize in
    queries.py:evt_sessionize."""
    df = _maybe_watermark(df, ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates are only
    tracked inside the watermark horizon (state TTL — the difference
    between 'works in a demo' and 'runs for a month at 100 TB')."""
    if watermark and ts_col and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
