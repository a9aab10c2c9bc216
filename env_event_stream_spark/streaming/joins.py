"""Stream-stream and stream-static joins (SURVEY.md §2.3 GAP).

The reference's only join-shaped operation is the DLQ-retry lookup
(src/broker.ts:167-180) — a stream-to-table equi-join. These builders
add the full Structured Streaming join surface with the state-bounding
watermarks that make them viable long-running: an un-watermarked
stream-stream join buffers both sides forever."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "enrich_static"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOUR",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Keyed interval join: rows pair when right_ts ∈
    [left_ts - upper... left_ts + ...] per the range condition
    ``left_ts - upper <= right_ts <= left_ts - lower`` (right precedes
    left — the view-before-purchase shape). Watermarks + the time
    bound let Spark evict join state: state size is O(window), not
    O(stream). Works identically on batch frames (no watermark
    applied) for oracle parity."""
    if left_watermark and left.isStreaming:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark and right.isStreaming:
        right = right.withWatermark(right_ts, right_watermark)
    # DataFrame-object column refs (not "l.x" string parsing): unambiguous
    # even when a column name itself starts with "l." / "r."
    left, right = left.alias("l"), right.alias("r")
    lts, rts = left[left_ts], right[right_ts]
    cond = (rts >= lts - F.expr(upper)) & (rts <= lts - F.expr(lower))
    for k in keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)


def enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment (the DLQ-retry shape): the static side
    is re-read per micro-batch and broadcast — dimension updates are
    picked up without restarting the query."""
    return stream.join(F.broadcast(dim), on=on, how=how)
