"""Mergeable streaming-sketch operators: distributed Misra-Gries
heavy hitters with an exact-recount tail.

The 100 TB frequent-items problem: a full ``groupBy(item)`` shuffles
the entire occurrence multiset — at corpus scale that is the whole
dataset moving for an answer that names a few hundred items. The
classic fix (Misra & Gries 1982; the MapReduce formulation is the
"mergeable summaries" result of Agarwal et al., PODS'12) is a
two-pass candidates-then-recount plan:

1. **Sketch pass** (map-only, zero shuffle): each partition folds its
   occurrences into a Misra-Gries summary of ``capacity`` counters.
   MG's guarantee, per partition p with n_p occurrences: a counter
   undercounts its item's true partition frequency by at most
   D_p <= n_p/(capacity+1) (every decrement round subtracts 1 from
   at least capacity+1 counters). Summed over partitions, any item
   with global frequency f > n/(capacity+1) must survive in at least
   one partition summary. With ``capacity >= phi_inverse - 1``, the
   survivor union is a SUPERSET of every phi-heavy hitter
   (f * phi_inverse > n). Only <= capacity * n_partitions candidate
   rows ever leave the map stage.
2. **Recount pass**: broadcast the (tiny) candidate set back over the
   occurrence stream, exact-count just the matching rows, and keep
   those over the threshold. Because the candidate set is a proven
   superset, the final output is EXACT — bit-equal to the full
   groupBy — which is what lets the driver value-hash it against a
   plain SQL oracle (contrast agg_approx_sketches, where the sketch
   VALUE is the output and only an error bound is checkable).

Cost shape at scale: two scans of the occurrence stream (scans are
cheap; both are map-side) versus one full-vocabulary shuffle. The
only shuffles here are the candidate distinct (<= capacity * P rows)
and the recount aggregation (candidate-matching rows only, map-side
combined to <= capacity * P partial rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_fold", "misra_gries_candidates", "heavy_hitters_exact"]


def mg_fold(counts: dict[str, int], items, capacity: int) -> dict[str, int]:
    """Fold a batch of item occurrences into a Misra-Gries summary of
    at most ``capacity`` counters (pandas value_counts bulk-add, then
    decrement rounds). Shared by the map-only batch sketch below and
    the streaming keyed-state twin (streaming_queries.
    doc_stream_heavy_hitters) so the two paths cannot drift. The
    undercount bound D <= n/(capacity+1) holds for ANY fold order, so
    the survivor set is a proven candidate superset regardless of
    batch/arrival order."""
    if len(items) == 0:
        return counts
    vc = items.value_counts()
    for item, c in zip(vc.index, vc.values):
        counts[item] = counts.get(item, 0) + int(c)
    while len(counts) > capacity:
        m = min(counts.values())
        counts = {k: v - m for k, v in counts.items() if v > m}
    return counts


def misra_gries_candidates(
    occurrences: DataFrame, item_col: str, *, capacity: int
) -> DataFrame:
    """Map-only Misra-Gries sketch per partition: one row per
    surviving counter, ``(item_col, mg_lower bigint)`` where
    ``mg_lower`` is the counter value (a lower bound on the
    partition-local frequency). Zero shuffle — summaries never merge
    across partitions here; the union of survivors is already the
    candidate superset (see module docstring)."""
    import pandas as pd

    out_schema = f"{item_col} string, mg_lower bigint"

    def sketch(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            counts = mg_fold(counts, pdf[item_col], capacity)
        yield pd.DataFrame(
            {
                item_col: list(counts.keys()),
                "mg_lower": list(counts.values()),
            }
        )

    return occurrences.select(item_col).mapInPandas(sketch, schema=out_schema)


def heavy_hitters_exact(
    occurrences: DataFrame,
    item_col: str,
    *,
    phi_inverse: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters (items with freq * phi_inverse > n,
    n = total occurrences) via the sketch-then-recount plan above.
    Output: ``(item_col, freq bigint, ppm bigint)`` where ppm is the
    integer-exact freq * 1_000_000 DIV n (integer math on both
    engines — no float-rounding tie risk), ordered freq DESC, item
    ASC. ``capacity`` defaults to ``phi_inverse`` — the smallest
    value (minus one) that keeps the candidate set a proven superset;
    raising it only admits more false candidates into the recount."""
    cap = capacity if capacity is not None else phi_inverse
    if cap < phi_inverse - 1:
        raise ValueError(
            f"capacity {cap} breaks the superset guarantee for "
            f"phi_inverse={phi_inverse} (need >= phi_inverse - 1)"
        )
    cand = (
        misra_gries_candidates(occurrences, item_col, capacity=cap)
        .select(item_col)
        .distinct()
    )
    total = occurrences.agg(F.count("*").alias("_n"))
    counted = (
        occurrences.join(F.broadcast(cand), item_col)
        .groupBy(item_col)
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("freq") * phi_inverse > F.col("_n"))
        .select(
            item_col,
            "freq",
            F.expr("freq * 1000000L DIV _n").cast("bigint").alias("ppm"),
        )
        .orderBy(F.col("freq").desc(), F.col(item_col).asc())
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog pieces, shared by the batch catalog query
# (evt_hll_distinct_users) and its streaming twin: md5-derived
# bucket/rho projection + the fixed-point estimator. Registers merge
# with max() — the property that makes the sketch distributable AND
# lets streaming state hold exactly (groups × m) integers.
# ---------------------------------------------------------------------------

HLL_M = 64  # buckets; ~1.04/sqrt(64) ≈ 13% standard error
_HLL_POW50 = 1125899906842624.0  # 2^50 fixed-point scale


def hll_project(df: DataFrame, key, group_cols: list[str]) -> DataFrame:
    """(group_cols..., bucket, rho) for each row — the map-side
    projection. rho (leading-zero rank of a 60-bit md5 suffix) is
    computed with STRING ops (TRIM(LEADING) + first-digit case; note
    Spark's two-arg ltrim is (trimStr, str) — reversed vs DuckDB —
    so the TRIM syntax is the only portable spelling)."""
    hx = F.md5(key.cast("string"))
    out = df.withColumn("_hx", hx).withColumn(
        "_stripped", F.expr("TRIM(LEADING '0' FROM substr(_hx, 3, 15))")
    )
    rho = F.when(F.col("_stripped") == "", F.lit(61)).otherwise(
        F.lit(4) * (F.lit(15) - F.length("_stripped"))
        + F.when(F.substring("_stripped", 1, 1) == "1", 3)
        .when(F.substring("_stripped", 1, 1).isin("2", "3"), 2)
        .when(F.substring("_stripped", 1, 1).isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + F.lit(1)
    )
    return out.select(
        *group_cols,
        (
            F.conv(F.substring("_hx", 1, 2), 16, 10).cast("bigint")
            % F.lit(HLL_M)
        ).alias("bucket"),
        rho.alias("rho"),
    )


def hll_registers(projected: DataFrame, group_cols: list[str]) -> DataFrame:
    """max-rho register per (group, bucket) — the mergeable state."""
    return projected.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("mrho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., hll_est) from the registers: fixed-point
    harmonic sum (exact bigint addition, one double conversion),
    linear-counting small-range correction. floor(x*1e4+0.5)/1e4
    rounding — identical IEEE ops in the SQL oracle."""
    z = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(1L, 50 - least(mrho, 50))"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1125899906842624)
        ).cast("bigint").alias("z_int"),
        (F.lit(HLL_M) - F.count("*")).alias("v_empty"),
    )
    raw = (
        F.lit(0.7213)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        * F.lit(_HLL_POW50)
        / F.col("z_int")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("v_empty") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_empty")),
    ).otherwise(raw)
    return z.select(
        *group_cols,
        (F.floor(est * 10000 + F.lit(0.5)) / 10000).alias("hll_est"),
        est.alias("_est_raw"),
    )
