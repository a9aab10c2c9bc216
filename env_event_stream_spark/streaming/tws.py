"""transformWithStateInPandas processors (Spark 4 next-gen keyed state).

The reference keeps two kinds of per-key lifecycle state the classic
``applyInPandasWithState`` path (stateful.py) cannot express natively:

- timer-driven expiry — the retention sweep wakes every 60 s and
  deletes old events (reference src/topic.ts:39-42,156-163); a
  subscription's retry clock is wall-time driven
  (src/subscription.ts:96);
- state TTL — ``retentionPeriod`` bounds how long a topic's data may
  live (src/topic.ts:30-35).

Spark 4's ``transformWithStateInPandas`` exposes exactly those two
primitives (``registerTimer`` / ``ttlDurationMs``), so the processors
here are the idiomatic scale path: the session monitor closes a key's
session when the EVENT-TIME watermark passes its last activity + gap —
no per-key polling, state evicted by the store itself, which is the
only shape that survives 100 TB of keys.

Runtime gate: the TWS Python state server speaks protobuf to the JVM
(pyspark/sql/streaming/proto/StateMessage_pb2.py imports
``google.protobuf``). This container ships no protobuf runtime, so
``TWS_AVAILABLE`` is False here and tests skip; the code itself is the
real implementation, exercised wherever protobuf is installed. The
equivalent applyInPandasWithState path (stateful.py) is fully
exercised in-container and remains the default engine path.
"""

from __future__ import annotations

import datetime as _dt
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame

try:  # the TWS worker protocol needs the protobuf runtime
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - container has no protobuf
    TWS_AVAILABLE = False

from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

if TYPE_CHECKING:  # only for annotations; pandas import stays lazy
    import pandas as pd

__all__ = [
    "TWS_AVAILABLE",
    "SessionMonitorProcessor",
    "TtlLatestStateProcessor",
    "sessionize_with_timers",
    "latest_state_with_ttl",
]


class SessionMonitorProcessor(StatefulProcessor):
    """Per-key activity session with event-time timer expiry.

    Accumulates (start, last, n_events, total) per key; every batch
    re-arms a single timer at ``last_activity + gap_ms``. When the
    watermark passes that point ``handleExpiredTimer`` emits ONE closed
    -session row and clears the state — the streaming analogue of the
    reference's retention sweep firing for an idle topic
    (src/topic.ts:156-163), but push-driven by the watermark instead of
    a 60 s poll over every key."""

    def __init__(self, gap_ms: int, value_col: str = "value"):
        self.gap_ms = gap_ms
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "session",
            "start timestamp, last timestamp, n_events bigint, total double",
        )

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator["pd.DataFrame"],
        timer_values: TimerValues,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        pdf = pd.concat(list(rows))
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        n, tot = len(pdf), float(pdf[self.value_col].sum())
        if self.state.exists():
            start, last, pn, pt = self.state.get()
            self.state.update((start, max(hi, last), pn + n, pt + tot))
            arm_from = max(hi, last)
        else:
            self.state.update((lo, hi, n, tot))
            arm_from = hi
        # single armed timer per key: re-arm on every activity
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        # arm_from is a naive-UTC wall-clock value from the state
        # store; naive .timestamp() would read it as process-local
        # time and mis-arm the timer by the UTC offset off-UTC hosts.
        # "naive == UTC" itself holds only under session.timeZone=UTC
        # (Arrow localizes to the SESSION tz) — enforced driver-side
        # by _require_utc_session in the factory
        if arm_from.tzinfo is None:
            arm_from = arm_from.replace(tzinfo=_dt.timezone.utc)
        self.handle.registerTimer(
            int(arm_from.timestamp() * 1000) + self.gap_ms
        )
        return iter([])

    def handleExpiredTimer(
        self,
        key: tuple,
        timer_values: TimerValues,
        expired_timer_info: ExpiredTimerInfo,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if self.state.exists():
            start, last, n, tot = self.state.get()
            self.state.clear()
            yield pd.DataFrame(
                [
                    {
                        "key": key[0],
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                        "total": tot,
                    }
                ]
            )

    def close(self) -> None:
        pass


class TtlLatestStateProcessor(StatefulProcessor):
    """Latest-value-per-key state that the store itself expires.

    ``ttlDurationMs`` is the native form of the reference's
    ``retentionPeriod`` (src/topic.ts:30-35): a key not refreshed
    within the TTL is evicted by RocksDB without any sweep job
    touching the other billion keys."""

    def __init__(self, ttl_ms: int):
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState(
            "latest", "ts timestamp, value double", ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator["pd.DataFrame"],
        timer_values: TimerValues,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        pdf = pd.concat(list(rows)).sort_values("ts")
        newest = pdf.iloc[-1]
        prev: Any = self.state.get() if self.state.exists() else None
        if prev is None or newest["ts"] >= prev[0]:
            self.state.update((newest["ts"], float(newest["value"])))
        cur = self.state.get()
        yield pd.DataFrame(
            [{"key": key[0], "ts": cur[0], "value": cur[1]}]
        )

    def close(self) -> None:
        pass


def sessionize_with_timers(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Timer-closed sessions over a stream keyed by ``key_col``.

    Unlike ``F.session_window`` (windows.py, emit-on-watermark
    aggregate), this keeps arbitrary per-key state and can emit
    mid-session heartbeats or side outputs — the general form."""
    _require_utc_session(events)
    gap_ms = _interval_ms(gap)
    stream = events.withWatermark(ts_col, watermark)
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionMonitorProcessor(gap_ms, value_col),
        outputStructType=(
            "key string, session_start timestamp, session_end timestamp,"
            " n_events bigint, total double"
        ),
        outputMode="Append",
        timeMode="EventTime",
    )


def latest_state_with_ttl(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    ttl: str = "1 hour",
) -> DataFrame:
    """Continuously-updated latest value per key with store-level TTL
    (processing-time, per TWS semantics)."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=TtlLatestStateProcessor(_interval_ms(ttl)),
        outputStructType="key string, ts timestamp, value double",
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def _require_utc_session(df: DataFrame) -> None:
    """The timer-arm path reads the naive timestamps TWS hands the
    processor as UTC (SessionMonitorProcessor.handleInputRows) — valid
    ONLY while spark.sql.session.timeZone is UTC, because the Arrow
    transfer localizes instants to the SESSION timezone, not the host
    one. tables.prepare_session pins UTC on the engine's own sessions,
    but the SPARK_GRAFT_EXTRA_CONF sweep hook (session.py) can
    override it; mis-armed timers fail SILENTLY (sessions close early/
    late by the UTC offset), so refuse loudly here instead
    (ADVICE r12). Driver-side check: processors run on executors
    where no conf is reachable."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"sessionize_with_timers requires spark.sql.session.timeZone="
            f"UTC (got {tz!r}): the timer-arm path reads TWS's naive "
            "session-local timestamps as UTC and would mis-arm by the "
            "offset. Re-pin the session timezone (tables.prepare_session) "
            "or derive the offset before arming."
        )


_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _interval_ms(spec: str) -> int:
    """'30 minutes' → 1800000. Tiny parser so callers use the same
    interval strings they pass to withWatermark."""
    n_s, unit = spec.strip().split()
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_MS:
        raise ValueError(f"unsupported interval unit: {spec!r}")
    return int(float(n_s) * _UNIT_MS[unit])
