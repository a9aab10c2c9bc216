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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005), md5-derived so the
# WHOLE sketch replays bit-for-bit in any engine: cell (r, c) holds
# the exact integer sum of all occurrences whose salted hash lands
# there, and a point estimate is min over the d rows — always an
# OVERestimate (collisions only add). State is d*w integers per
# group, whatever the key cardinality: the frequency sketch a
# dashboard keeps hot when the key space doesn't fit (contrast
# Misra-Gries above, which keeps candidate KEYS; CMS answers point
# queries for ANY key, at the price of +eps*n error, eps = e/w).
# Counts are order- and partition-independent bigint sums, so the
# streaming matview equals the batch sketch exactly and both share
# one full value-hash SQL oracle.
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows; P[overestimate > eps*n] <= e^-d
CMS_W = 64  # columns per row; eps = e/w


def cms_col(key, r: int):
    """Column index of ``key`` under salt row ``r`` — first 32 md5
    bits of 'r<r>:<key>' mod w; the exact expression the SQL oracle
    spells as ('0x' || substr(md5(...), 1, 8))::BIGINT % w."""
    salted = F.concat(F.lit(f"r{r}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")
        % F.lit(CMS_W)
    )


def cms_cells(df: DataFrame, key) -> DataFrame:
    """(r, col, cnt) cell table: each occurrence row feeds all d hash
    rows (map-side 4x projection), then ONE partial-aggregated
    groupBy whose exchange carries at most d*w rows per input
    partition — the sketch's mergeability IS Spark's map-side
    combine. Works unchanged as a streaming aggregation (counts are
    arrival-order independent)."""
    k = key.cast("string")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), cms_col(k, r).alias("col")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("p")
    ).select("p.r", "p.col")
    return pairs.groupBy("r", "col").agg(F.count("*").alias("cnt"))


def cms_point(cells: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """min-over-rows point estimates for each key in ``keys``: the
    cell table (d*w rows) broadcasts to the key side; no shuffle of
    the key set beyond its own distinct. LEFT join + coalesce(0):
    a key may hash to a cell no sketched row ever touched (the cell
    table stores only occupied cells), and an empty cell means
    estimate 0 for that row — an inner join would DROP the key (all
    cells empty) or inflate the min (some empty) for keys outside
    the sketched data, breaking 'CMS answers point queries for ANY
    key'."""
    k = F.col(key_col)
    pos = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), cms_col(k, r).alias("col")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.r", "p.col")
    return (
        pos.join(F.broadcast(cells), ["r", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_salt_values_sql() -> str:
    """The d-row VALUES list, derived from CMS_D (single source of
    truth with the Spark side — a hardcoded (0),(1),(2),(3) would
    silently diverge if CMS_D changed)."""
    return ", ".join(f"({r})" for r in range(CMS_D))


def cms_col_sql(key_sql: str, r_sql: str = "s.r") -> str:
    """DuckDB spelling of cms_col for the same key/salt."""
    return (
        f"('0x' || substr(md5('r' || CAST({r_sql} AS VARCHAR) || ':'"
        f" || CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT % {CMS_W}"
    )


def cms_oracle_cells_sql(source: str, key_sql: str) -> str:
    """DuckDB CTE body replaying the identical cell table."""
    return f"""
      SELECT s.r,
             {cms_col_sql(key_sql)} AS col,
             count(*) AS cnt
      FROM {source} CROSS JOIN (VALUES {cms_salt_values_sql()}) s(r)
      GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002;
# Beyer et al., SIGMOD'07 for the unbiased estimator and set ops).
# Where HLL only unions, KMV supports INTERSECTION estimates: keep
# the k smallest 60-bit md5 hashes of the distinct keys; the k-th
# smallest value h_k estimates density (distinct ~= (k-1) * 2^60 /
# h_k), and for two sketches the k smallest of their union, checked
# for membership in both, estimates Jaccard — md5-deterministic, so
# an SQL oracle replays every hash and the estimates value-hash.
# Merge = "k smallest of the union of sketches": the per-partition
# prefilter (map-side heap) is exactly that merge, so the sketch
# build never shuffles more than k rows per group per partition.
# ---------------------------------------------------------------------------

KMV_K = 128
KMV_DOMAIN = 1152921504606846976.0  # 2^60 — hash domain size


def kmv_hash(key):
    """60-bit md5 hash as bigint (15 hex digits), uniform on
    [0, 2^60) — matches ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_sketch(distinct_keyed: DataFrame, group_cols: list[str]) -> DataFrame:
    """k smallest hashes per group from a pre-distinct (group, h)
    frame, via the map-side-heap partial top-k (ascending): the
    exchange carries <= k rows per group per partition — the KMV
    merge operation itself."""
    from env_event_stream_spark.operators.relational import (
        top_k_per_group_partial,
    )

    return top_k_per_group_partial(
        distinct_keyed,
        group_cols,
        "h",
        KMV_K,
        descending=False,
        tiebreak="h",
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """(k-1) * 2^60 / h_k per group (unbiased KMV estimator); groups
    with fewer than k distinct keys report their exact sketch size
    (the sketch IS the distinct set there)."""
    return sketch.groupBy(*group_cols).agg(
        F.count("*").alias("_sk_n"), F.max("h").alias("_h_k")
    ).select(
        *group_cols,
        F.when(
            F.col("_sk_n") < F.lit(KMV_K),
            F.col("_sk_n").cast("double"),
        )
        .otherwise(
            F.floor(
                F.lit((KMV_K - 1) * KMV_DOMAIN)
                / F.col("_h_k")
                * 10000
                + F.lit(0.5)
            )
            / 10000
        )
        .alias("kmv_est"),
    )
