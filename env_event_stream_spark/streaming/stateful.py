"""Live keyed state: the streaming twin of sourcing.rehydrate_all.

The reference rehydrates an aggregate by re-reading its whole history
on every load (src/sourcing.ts:197-219). Here the fold runs
CONTINUOUSLY: ``applyInPandasWithState`` keeps each key's state in the
checkpointed state store, folds only the new micro-batch's events into
it, and emits the updated state — O(new events) per batch instead of
O(history), which is the only workable shape at 100 TB event volume.

The same ``fold(state, event) -> state`` function drives both the
batch rehydrate (sourcing.py) and this live projection, so command
-side and query-side semantics can't drift."""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

FoldFn = Callable[[dict[str, Any], dict[str, Any]], dict[str, Any]]

__all__ = ["live_rehydrate"]


def live_rehydrate(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    fold: FoldFn,
    init: Callable[[], dict[str, Any]],
    state_fields: list[str],
    state_ddl: str,
    output_ddl: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Continuously-folded per-key state.

    ``state_fields`` names the fold-state dict keys persisted between
    micro-batches (in ``state_ddl`` order, plus an implicit leading
    ``version`` counter — one increment per event, matching
    src/sourcing.ts:47). Output rows are ``key, version,
    *state_fields`` per ``output_ddl``. Events are folded in (ts,
    tiebreak) order WITHIN each micro-batch; cross-batch order is
    arrival order, the same at-assign-time semantics as the reference
    broker (src/broker.ts:104). Use a watermark upstream if late data
    must be bounded."""
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            version = stored[0]
            s = dict(zip(state_fields, stored[1:]))
        else:
            version = 0
            s = init()
        rows = pd.concat(list(pdfs))
        if len(rows):
            rows = rows.sort_values(order_cols, kind="mergesort")
            for rec in rows.to_dict("records"):
                s = fold(s, rec)
                version += 1
        state.update((version, *(s[f] for f in state_fields)))
        yield pd.DataFrame([{key_col: key[0], "version": version, **s}])

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_ddl,
        stateStructType="version bigint, " + state_ddl,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
