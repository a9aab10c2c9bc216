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
    )
    assert n_ex <= EXCHANGE_BUDGET[name], (
        f"{name}: {n_ex} shuffle exchanges > budget "
        f"{EXCHANGE_BUDGET[name]} — a shared frame is being replayed "
        f"per consumer again (see the r12 reshape in its docstring)"
    )
