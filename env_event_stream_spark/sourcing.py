"""Event sourcing: aggregate fold / rehydrate / repository.

Reference parity (src/sourcing.ts):
- ``applyEvent`` abstract transition (src/sourcing.ts:67) → a plain
  Python ``fold(state, event) -> state`` function applied inside
  ``applyInPandas`` (U2).
- ``rehydrate`` = reset + ordered fold, version++ per event
  (src/sourcing.ts:41-62) → per-key sorted fold in one grouped pass.
- ``EventSourcedRepository.save/getById`` (src/sourcing.ts:167-219)
  → append to the event store / filtered fold.

The scale win over the reference: ``rehydrate_all`` folds EVERY
aggregate in ONE distributed groupBy pass (the reference loads one id
at a time through the store). Ordering inside each group is explicit
(sort by ts, id within the pandas group) — never rely on shuffle
order. Streaming twin: transformWithStateInPandas /
applyInPandasWithState in streaming/subscription.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FoldFn = Callable[[dict[str, Any], dict[str, Any]], dict[str, Any]]

__all__ = ["rehydrate_all", "rehydrate_one", "fold_balance_with_reset"]


def rehydrate_all(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    fold: FoldFn,
    init: Callable[[], dict[str, Any]],
    state_ddl: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Fold every aggregate's event history into its final state.

    ``state_ddl`` declares the output schema, e.g.
    ``"user_id bigint, version bigint, balance double"`` — it must
    include ``key_col`` and ``version``. The fold function sees events
    as dicts in (ts, tiebreak) order, exactly like the reference's
    sequential applyEvent loop (src/sourcing.ts:41-48); ``version`` is
    maintained by the harness (one increment per event,
    src/sourcing.ts:47)."""
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        state = init()
        version = 0
        for rec in pdf.to_dict("records"):
            state = fold(state, rec)
            version += 1
        state[key_col] = pdf.iloc[0][key_col]
        state["version"] = version
        return pd.DataFrame([state])

    return events.groupBy(key_col).applyInPandas(fold_group, schema=state_ddl)


def rehydrate_one(
    events: DataFrame,
    key_col: str,
    key: Any,
    ts_col: str,
    fold: FoldFn,
    init: Callable[[], dict[str, Any]],
    state_ddl: str,
    **kw,
) -> DataFrame:
    """getById (src/sourcing.ts:197-219): partition-pruned single-key
    rehydrate — same fold, filtered scan."""
    return rehydrate_all(
        events.where(F.col(key_col) == F.lit(key)),
        key_col, ts_col, fold, init, state_ddl, **kw,
    )


# A canonical non-associative fold used by the catalog query + tests:
# balance accumulates event values but RESETS on 'signup' events —
# not expressible as a plain windowed SUM (needs the fold), yet still
# SQL-checkable via the "sum since last signup" identity.
def fold_balance_with_reset(state: dict, event: dict) -> dict:
    if event["event_type"] == "signup":
        return {"balance": 0.0}
    return {"balance": state["balance"] + (event["value"] or 0.0)}


def init_balance() -> dict:
    return {"balance": 0.0}
