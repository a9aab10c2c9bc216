"""CDC change application (MERGE INTO emulation) for keyed parquet
tables.

Spark's parquet writer has no MERGE; Delta/Iceberg provide it as a
table-format feature. At the operator level the semantics are simple
and worth owning: given a keyed base table and a change batch with an
op column (``insert`` / ``update`` / ``delete`` — the Debezium-style
CDC feed), produce/commit the merged table:

- delete: base rows with a matching key are dropped
- update: base rows with a matching key are replaced by the change row
- insert: change rows with no matching key are appended
  (an ``upsert`` op behaves as update-or-insert)

Deterministic conflict rule: if one batch carries several ops for the
same key, the row with the highest ``seq_col`` wins (ties broken by
op precedence delete > upsert/update > insert — a delete observed at
the same sequence number as an update is the later intent in every
CDC feed that compacts this way). This mirrors how Delta's MERGE
requires at most one source row per key — instead of erroring we
compact the batch first, which is what a streaming CDC apply needs.

Scale shape: one shuffle of the (small) change batch to compact it;
the base table joins the compacted batch on the key — broadcast when
the batch is batch-sized (the common case), sort-merge when someone
replays history. The rewrite is a full-table write here; partitioned
bases should route through dynamic partition overwrite with the
touched-partition filter (the matview pattern in
streaming/matview.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_changes"]

_OP_RANK = {"delete": 3, "upsert": 2, "update": 2, "insert": 1}


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC change batch to ``base``; returns the merged
    DataFrame (caller commits it — write parquet, or feed a matview).
    ``changes`` carries the base's data columns plus ``op_col`` and
    ``seq_col``. Unknown op strings fail LOUDLY — an unrecognized op
    could otherwise win compaction on seq and silently swallow a
    key's legitimate changes."""
    bad = (
        changes.where(~F.col(op_col).isin(*_OP_RANK))
        .select(op_col)
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"merge_changes: unknown op {bad[0][0]!r} "
            f"(expected one of {sorted(_OP_RANK)})"
        )
    data_cols = [c for c in base.columns]
    rank = F.create_map(
        *[x for k, v in _OP_RANK.items() for x in (F.lit(k), F.lit(v))]
    )[F.col(op_col)]
    # op_col ASC as the deterministic tertiary tie-break: update vs
    # upsert share rank 2, and without it the compaction winner at an
    # equal (seq, rank) would be partition-order-dependent
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), rank.desc(), F.col(op_col).asc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    upd = latest.where(F.col(op_col).isin("update", "upsert", "insert"))
    # base rows survive unless the winning change for their key is a
    # delete or a replacement (update/upsert); pure inserts for
    # existing keys are ignored (insert-only semantics), matching
    # MERGE ... WHEN NOT MATCHED THEN INSERT
    replacing = latest.where(
        F.col(op_col).isin("delete", "update", "upsert")
    ).select(key)
    kept = base.join(F.broadcast(replacing), key, "left_anti")

    # matched-key set stays BATCH-bounded: filter the base by the
    # (broadcast, small) change keys first, then distinct — never
    # broadcast or distinct the full base key set
    matched = (
        base.join(F.broadcast(latest.select(key).distinct()), key, "left_semi")
        .select(key)
        .distinct()
    )
    incoming = upd.select(*data_cols, op_col).join(
        F.broadcast(matched.withColumn("_ex", F.lit(1))), key, "left"
    )
    applied = incoming.where(
        (F.col(op_col).isin("update", "upsert") & F.col("_ex").isNotNull())
        | (F.col(op_col) == "upsert") & F.col("_ex").isNull()
        | (F.col(op_col) == "insert") & F.col("_ex").isNull()
    ).select(*data_cols)

    return kept.unionByName(applied)
