"""Regenerate PLANS.md: the actual `explain(formatted)` output for a
representative query per operator family, with the scale-relevant
plan features called out. The plan SHAPE is part of the contract
(tests/test_plans.py pins it); this artifact makes it reviewable
without running Spark.

Usage: python tools/plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_event_stream_spark.catalog import QUERIES
from env_event_stream_spark.session import get_spark

# query -> what to look at in its plan
PICKS = [
    ("evt_replay", "ts-range + type-IN reach the scan: PushedFilters + "
     "ReadSchema pruning; TakeOrdered for the bounded replay"),
    ("tpch_q1_pricing", "map-side partial aggregation: HashAggregate "
     "partial -> exchange carries group rows -> final"),
    ("join_revenue_by_region", "dims broadcast (BroadcastHashJoin), the "
     "fact table never shuffles for them; DECIMAL money sums"),
    ("topk_orders_global", "global top-k compiles to "
     "TakeOrderedAndProject — no full sort anywhere"),
    ("asof_purchase_prior_view", "as-of join = union + last-ignorenulls "
     "window: ONE user_id exchange, no cross product"),
    ("doc_minhash_pairs", "banded MinHash: signature projection, one "
     "doc_id shuffle, band-key equi-join — the corpus never crosses "
     "itself"),
    ("doc_decontaminate", "eval shingles broadcast; the (100 TB) train "
     "side is scanned in place, never shuffled"),
    ("emb_knn_ivf", "broadcast centroid probe (8 rows), cell_id "
     "equi-join bounds candidates to nprobe/ncells of the corpus"),
    ("doc_winnow_pairs", "fingerprint selection is ONE Arrow "
     "MapInPandas stage (zero shuffle), pair join is the bounded "
     "inverted-index equi-join"),
    ("window_top3_value_per_type", "map-side heap: MapInPandas "
     "prefilter BEFORE the window exchange — the shuffle sees "
     "survivors, not the stream"),
    ("evt_attribution_last_touch", "carry-forward window + rollup ride "
     "ONE user_id exchange"),
    ("doc_bm25_topk", "query-time BM25: no Generate (no posting "
     "lists), scalar stats broadcast (BroadcastNestedLoopJoin of one "
     "row), row-local tf scoring, rank over matched docs only"),
    ("emb_hard_negatives", "anchor batch broadcast; corpus reduces via "
     "partial_max(struct) map-side combine — corpus rows never "
     "shuffle"),
    ("evt_hist_percentiles_by_type", "histogram sketch tier: partial_count "
     "map-side combine on (type, bin); the exact-percentile branch is "
     "the accuracy readout only"),
    ("doc_exactsubstr_spans", "exactsubstr via seed-and-extend: 5-gram "
     "equi-join proposes matches, diagonal islands + per-pair top-1 — "
     "all pair-keyed exchanges, no suffix array, no cross product"),
    ("graph_pagerank_custsupp", "integer PageRank iteration: node-keyed "
     "join + grouped bigint sum, lineage cut by localCheckpoint "
     "(plan shows the checkpointed scan, not the iteration tower)"),
    ("evt_cms_user_freq", "Count-Min build: map-side 4x Generate into "
     "ONE partial-aggregated groupBy (exchange carries <= d*w rows "
     "per partition); 256-cell table broadcasts to the lookup side"),
    ("evt_kmv_overlap", "KMV sketch: distinct + map-side-heap partial "
     "top-k (<= k rows/group/partition cross the exchange); all "
     "pairwise estimation on broadcast 5x128-row sketches"),
    ("dq_profile_lineitem", "one-pass profiling: a single stack() melt "
     "scan (no per-column passes) into one groupBy; distinct expands "
     "to the two-phase partial distinct"),
    ("graph_triangles_copurchase", "degree-oriented wedge join: "
     "orientation via co-partitioned degree joins (no global rank "
     "window), closure is an equi-join on the (lo,hi) edge key"),
    ("join_size_cms_estimate", "sketch-composition cardinality "
     "estimate: each side streams once into cells; the 256-row cell "
     "join replaces any key-aligned meeting of the sides"),
    # round-9 families
    ("evt_cep_within", "windowed CEP automaton: ONE user-day exchange "
     "builds the sorted (initial, ts) sequences (ObjectHashAggregate "
     "of collect_list), then a single Arrow MapInPandas stage — the "
     "automaton itself never shuffles"),
    ("evt_cep_error_burst", "anchor-free CEP template degenerates to "
     "gaps-and-islands: two window functions + grouped agg, "
     "whole-stage codegen end to end, no Python stage at all"),
    ("doc_lcs_pairs", "byte-exact LCS: one gram explode scan, ONE "
     "groupBy(gram) emits candidate pairs JVM-side (no gram "
     "self-join), pair-bounded text joins feed a single Arrow "
     "suffix-automaton stage; note the gated repartitions that keep "
     "small-SF inputs parallel"),
    ("evt_holt_winters_daily", "seasonal smoothing on the calendar "
     "grid: map-side-combined daily counts, one window over "
     "|types|x|days|, the 14-lag integer weighted sums are pure "
     "codegen projections"),
    ("emb_whiten_stats", "whitening verification: one Arrow rotate "
     "(model is dim+dim^2 literals), posexplode to micro-unit pairs, "
     "64-key groupBy with partial_sum map-side combine"),
    # round-9 third-session families
    ("evt_acf_daily", "statistics tier on the shared calendar grid: "
     "map-side daily count, 7-row broadcast lag table, equi-joins on "
     "(type, day+k) — corpus-size-invariant"),
    ("dq_key_skew", "skew audit with NO sort and NO top-k window: "
     "stacked per-key counts, two grouped aggregations, 6-row "
     "per-edge stats broadcast back"),
    ("emb_kmeans_lloyd", "distributed Lloyd iteration: 8-row broadcast "
     "assignment pass (zip_with/aggregate, zero Python), "
     "map-side-combinable (cid, dim) sums, 8x64 driver model read"),
    ("graph_label_propagation", "LPA iteration: adjacency equi-join + "
     "grouped label count + PER-NODE argmax window (never global), "
     "localCheckpoint lineage truncation"),
    ("evt_compaction_plan", "manifest-level planning: one ordered "
     "window over the (type, day) segment manifest — metadata-sized, "
     "the data is only touched by the map-side byte sum"),
    ("graph_link_prediction", "wedge-bounded candidate generation, "
     "equi anti-join against edges, integer Jaccard, "
     "TakeOrderedAndProject top-20"),
    # round-10 families
    ("evt_cep_skip_modes_nested", "nested-pattern skip modes: shares "
     "the CEP family's single user-day exchange; all four counts "
     "(both policies, untimed + 4h) run in ONE Arrow MapInPandas "
     "stage per sequence row"),
    ("doc_unigram_lm_encode", "unigram-LM apply: Viterbi work is ONE "
     "Arrow stage over the DEDUPLICATED word list (O(vocab)); "
     "per-word piece counts broadcast back onto the (source, word) "
     "bag pre-agg — corpus rows never reach Python"),
    # round-11 families
    ("emb_decontaminate", "semantic decon k=1: broadcast eval matrix, "
     "per-train best via partial_min(struct) map-side combine below "
     "the ONE exchange (no Window, no post-shuffle sort), "
     "distributive top-50"),
    ("doc_quality_mixture", "quality-weighted mixture: three row-local "
     "rater scans joined on doc_id, vote + bucket tests are pure "
     "expressions, ONE partial-aggregated groupBy(source, votes) ends "
     "the plan"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans")
    spark.conf.set("spark.sql.maxMetadataStringLength", "300")
    out = [
        "# PLANS — executed physical plans for one query per family",
        "",
        f"Generated by `python tools/plans.py` at `{sf_dir}` "
        "(regenerate after plan-affecting changes; "
        "`tests/test_plans.py` enforces the load-bearing shapes in CI "
        "fashion).",
        "",
    ]
    for name, note in PICKS:
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # let AQE finalize
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0].rstrip()
        out.append(f"## {name}")
        out.append("")
        out.append(f"*{note}*")
        out.append("")
        out.append("```")
        out.append(plan)
        out.append("```")
        out.append("")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(PICKS)} plans)")


if __name__ == "__main__":
    main()
