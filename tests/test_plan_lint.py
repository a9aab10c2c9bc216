"""Whole-catalog plan-lint gate: a cheap structural audit of a
SAMPLE of batch catalog plans per run (the full sweep is
tools/plan_lint.py -> PLANLINT.md). Guards the two absolute rules —
no row-at-a-time Python UDF outside the documented UDTF surface, no
quadratic join without an allowlist justification — on the entries
most likely to regress (the newest families), without paying the
full 191-plan build cost in CI."""

from __future__ import annotations

import pytest

from env_event_stream_spark.catalog import QUERIES
from conftest import require_default_broadcast

SPOT = [
    "evt_cms_user_freq",
    "evt_kmv_overlap",
    "dq_profile_lineitem",
    "graph_triangles_copurchase",
    "doc_split_leakage_guard",
    "doc_ppjoin_stats",
    "evt_value_drift_ks",
    "evt_hourly_seasonality",
    "emb_knn_pq_residual",
    "doc_source_keywords",
]


@pytest.mark.parametrize("name", SPOT)
def test_no_row_python_and_quadratic_is_justified(spark, sf_dir, name):
    import tools.plan_lint as L

    plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().sparkPlan().toString()
    assert "BatchEvalPython" not in plan or name in L.ROW_PYTHON_ALLOWED
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        assert name in L.NESTED_LOOP_ALLOWED, name


def test_global_window_detector_reads_plan_shapes():
    """count_global_windows parses real executedPlan toString shapes:
    `Window [exprs], [order]` = global (flagged), `Window [exprs],
    [part], [order]` = partitioned (not), WindowGroupLimit one group
    vs two. This detector is what replaced Spark's runtime
     'No Partition Defined' warning as the accidental-global-window
    tripwire (get_spark suppresses the log line), so its parsing is
    load-bearing."""
    import tools.plan_lint as L

    glob_w = (
        "+- Window [row_number() windowspecdefinition(v#1L DESC "
        "NULLS LAST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$())) AS rn#2], "
        "[v#1L DESC NULLS LAST]"
    )
    part_w = (
        "   +- Window [row_number() windowspecdefinition(v#1L, id#0L "
        "DESC NULLS LAST, specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), currentrow$())) AS rn#6], [v#1L], "
        "[id#0L DESC NULLS LAST]"
    )
    part_wgl = (
        "      +- WindowGroupLimit [v#1L], [id#0L DESC NULLS LAST], "
        "row_number(), 3, Partial"
    )
    glob_wgl = (
        "      +- WindowGroupLimit [id#0L DESC NULLS LAST], "
        "row_number(), 3, Final"
    )
    assert L.count_global_windows(glob_w) == 1
    assert L.count_global_windows(part_w) == 0
    assert L.count_global_windows(part_wgl) == 0
    assert L.count_global_windows(glob_wgl) == 1
    # partition-only window (no ORDER BY — min-over-user etc.) also
    # prints two groups but carries no sort directions: NOT global
    part_only = (
        "+- Window [min(CASE WHEN (event_type#3 = view) THEN ts#1 "
        "END) windowspecdefinition(user_id#2L, specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), unboundedfollowing$())) "
        "AS t1#9], [user_id#2L]"
    )
    assert L.count_global_windows(part_only) == 0
    plan = "\n".join([glob_w, part_w, part_wgl, glob_wgl, "+- Sort [x]"])
    assert L.count_global_windows(plan) == 2
    # WindowInPandas follows the Window format (order specs always
    # print the full 'ASC NULLS FIRST' form in real plans)
    assert (
        L.count_global_windows(
            "+- WindowInPandas [f(x) AS y#3], [o#1 ASC NULLS FIRST]"
        )
        == 1
    )
    assert (
        L.count_global_windows(
            "+- WindowInPandas [f(x) AS y#3], [k#2], [o#1 ASC NULLS FIRST]"
        )
        == 0
    )


def test_global_window_detector_on_live_plans(spark):
    """End-to-end on real plans: a global rank window is counted, the
    same window partitioned is not."""
    import tools.plan_lint as L
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    glob = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("v").desc()))
    ).where(F.col("rn") <= 3)
    part = df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.col("id") % 7).orderBy(F.col("v").desc())
        ),
    ).where(F.col("rn") <= 3)
    gplan = glob._jdf.queryExecution().executedPlan().toString()
    pplan = part._jdf.queryExecution().executedPlan().toString()
    assert L.count_global_windows(gplan) >= 1
    assert L.count_global_windows(pplan) == 0


def test_global_window_allowlist_entries_not_stale():
    """Every GLOBAL_WINDOW_ALLOWED key must be a real catalog query —
    a renamed/deleted query must not leave a dead justification
    behind (the dq_referential_integrity lesson from r12)."""
    import tools.plan_lint as L

    ghosts = [n for n in L.GLOBAL_WINDOW_ALLOWED if n not in QUERIES]
    assert not ghosts, ghosts


# Shuffle budgets for the r12 shared-frame reshapes: each of these
# queries used to replay an expensive multi-consumer frame per
# reference (the regression class costs +8..+17 exchanges), and the
# fix is a one-line materialization that a refactor could silently
# drop. Budget = PLANLINT-measured count + 2 headroom — loose enough
# for optimizer drift, tight enough that a reintroduced replay fails.
EXCHANGE_BUDGET = {
    "doc_minhash_accuracy": 6,  # measured 4 (was 22 pre-r12)
    "doc_ppjoin_stats": 9,  # measured 7 (was 24)
    "emb_mmr_diversity_eval": 20,  # measured 18 (was 27)
    "dq_referential_integrity": 16,  # measured 14 (was 21)
    "evt_kmv_overlap": 10,  # measured 8 (was 18)
    # r13: five per-threshold closure loops -> one vectorized
    # min-label sweep (stats legs are left joins on t, not scalar
    # crossJoins; a reintroduced per-threshold loop lands ex>=15)
    "er_threshold_sensitivity": 8,  # measured 6 (was 15)
}


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_reshaped_plans_hold_their_shuffle_budget(spark, sf_dir, name):
    require_default_broadcast(spark)  # broadcasts become shuffles
    # executedPlan (not sparkPlan): EnsureRequirements INSERTS the
    # Exchange nodes — same counting rule as tools/plan_lint.py
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_ex = (
        plan.count("Exchange ")
        - plan.count("BroadcastExchange ")
        - plan.count("ReusedExchange ")
        # r16: the dedup family spreads sub-split scans round-robin
        # before the shingle explode (operators/dedup._spread, a
        # no-op on real multi-file tables). That exchange carries the
        # raw pre-explode scan — tiny, deliberate, and replayed
        # wherever the scan was already replayed — so it is NOT the
        # regression class this budget guards (an expensive shared
        # frame re-derived per consumer always reappears as HASH
        # exchanges of the derived frame). Count only those.
        - plan.count("Exchange RoundRobinPartitioning")
    )
    assert n_ex <= EXCHANGE_BUDGET[name], (
        f"{name}: {n_ex} shuffle exchanges > budget "
        f"{EXCHANGE_BUDGET[name]} — a shared frame is being replayed "
        f"per consumer again (see the r12 reshape in its docstring)"
    )
    # r17 (VERDICT r16 item 2): the round-robin discount above must
    # not become a blind spot — cap rr at the plan-lint budget so an
    # accidental repartition(n) cannot hide behind the spread
    # exemption.
    from tools.plan_lint import RR_BUDGET

    n_rr = plan.count("Exchange RoundRobinPartitioning")
    assert n_rr <= RR_BUDGET.get(name, 0), (
        f"{name}: {n_rr} round-robin exchanges > RR_BUDGET "
        f"{RR_BUDGET.get(name, 0)} — a stray repartition(n) slipped "
        f"into the plan (only the deliberate sub-split scan spreads "
        f"are budgeted; see tools/plan_lint.py RR_BUDGET)"
    )


def test_rr_budget_catches_an_injected_stray_repartition(spark, sf_dir):
    """The gate's teeth (VERDICT r16 item 2 'done' criterion): inject
    a stray repartition(n) into a budgeted query's frame and assert
    the rr count now EXCEEDS its RR_BUDGET ceiling — i.e. the gate
    would fail, where the old unbounded discount stayed silent."""
    from tools.plan_lint import RR_BUDGET

    name = "dq_profile_lineitem"
    df = QUERIES[name](spark, sf_dir).repartition(7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_rr = plan.count("Exchange RoundRobinPartitioning")
    assert n_rr > RR_BUDGET.get(name, 0)
