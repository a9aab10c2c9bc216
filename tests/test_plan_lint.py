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
