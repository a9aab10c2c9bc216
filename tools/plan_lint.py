"""Automated anti-pattern audit of the ENTIRE batch catalog's
physical plans (the whole-catalog generalization of the per-family
pins in tests/test_plans.py): for every batch queries() entry, build
the DataFrame at sf0.01 and inspect the pre-AQE physical plan for

- CartesianProduct / BroadcastNestedLoopJoin — quadratic joins; only
  legitimate as DOCUMENTED exact tiers and tiny broadcast probes
  (the allowlist below names each, with why)
- BatchEvalPython — a row-at-a-time Python UDF in the plan (the slow
  path this repo bans; Arrow stages show as ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas and are fine)
- Exchange count — the shuffle budget (SCALING.md documents the
  per-family expectations)

Streaming entries are skipped: building them RUNS the stream (their
plan shape is pinned by the streaming pytest suite instead).

Usage: python tools/plan_lint.py [sf_dir]   -> writes PLANLINT.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_event_stream_spark.catalog import QUERIES
from env_event_stream_spark.session import get_spark

# entries whose construction executes a streaming query end-to-end
STREAMING = {
    n
    for n in QUERIES
    if n.startswith(("evt_stream_", "doc_stream_", "join_stream_"))
    or n == "evt_live_fold_stream"
}

# (query, marker) -> documented reason a quadratic operator is OK
NESTED_LOOP_ALLOWED = {
    # exact KNN tiers: the documented brute-force baselines the ANN
    # ladder is measured against
    "emb_knn_topk": "exact-KNN tier: corpus x 10-query broadcast NL join",
    "emb_decontaminate": "train corpus x broadcast KB-scale eval "
    "matrix (corpus-size-invariant small side) — the decontamination "
    "shape; the k=1 min(struct) partial agg reduces each partition "
    "to one best row per train doc before the exchange, so the "
    "shuffle carries |train| partials, not the scored expansion",
    "emb_knn_matryoshka": "exact rescore over prefix dims (eval tier)",
    "emb_knn_binary": "binary-quantized exact sweep (documented tier)",
    "emb_binary_recall_eval": "exact tier inside the recall eval",
    "emb_lsh_recall_eval": "exact tier inside the recall eval",
    "emb_ivf_recall_eval": "exact tier inside the recall eval",
    "emb_pq_recall_eval": "exact tier inside the recall eval",
    "emb_opq_recall_eval": "exact tier inside the recall eval",
    "emb_multiprobe_recall_eval": "exact tier inside the recall eval",
    "emb_pq_rerank_recall_eval": "exact tier inside the recall eval",
    "emb_residual_recall_eval": "exact tier inside the recall eval",
    "emb_knn_pq_rerank": "exact rerank of ADC top-10 candidates",
    "emb_hard_negatives": "anchor-batch broadcast probe (documented)",
    "emb_mmr_diversity_eval": "probe broadcast + 1-row metric crossJoins",
    "emb_whiten_labelknn_eval": "50-probe broadcast NL join (exact-KNN"
    " eval tier, corpus scanned once for both rankings)",
    "doc_source_psi": "1-row corpus-totals broadcast for the PSI reference",
    "emb_centroid_outliers": "8-row centroid broadcast probe",
    "emb_cluster_sample": "8-row centroid broadcast probe",
    "emb_knn_ivf": "centroid broadcast probe (8 rows)",
    "emb_knn_ivf_trained": "trained-centroid broadcast probe (10 rows)",
    "emb_knn_pq_adc": "centroid broadcast probe + LUT broadcast",
    "emb_knn_pq_trained": "trained-centroid broadcast probe",
    "emb_knn_pq_residual": "trained-centroid broadcast probe",
    "emb_knn_opq_adc": "rotation + centroid broadcast probes",
    "emb_knn_pq_persisted": "persisted-index probe (broadcast model)",
    "emb_knn_opq_persisted": "persisted-index probe (broadcast model)",
    "emb_quantize_int8": "per-dim scale row broadcast (1 row)",
    "join_range_price_band": "interval dim broadcast NL join (documented)",
    "emb_ivf_cell_stats": "8-row centroid broadcast assignment pass"
    " (the emb_knn_ivf shape; added after the r9 second-session lint)",
    "emb_whiten_ivf_eval": "exact tier inside the recall eval + 8-row"
    " centroid broadcasts in both spaces",
    # round-9 third-session additions (all bounded broadcast scalars)
    "evt_acf_daily": "7-row lag-table broadcast over the calendar grid",
    "evt_spearman_daily": "1-row calendar-bounds crossJoin",
    "evt_mannwhitney_shift": "1-row n/ties totals crossJoin",
    "doc_pmi_collocations": "1-row n_pairs scalar crossJoin",
    "evt_zorder_pruning_eval": "1-row rpf scalar + 4-probe x 128-file"
    " stats overlap join (both sides metadata-sized)",
    "emb_kmeans_lloyd": "8-row centroid broadcast assignment pass"
    " (the emb_knn_ivf shape, x ITERS)",
    "emb_kmeans_ivf_eval": "exact tier inside the recall eval +"
    " 8-row centroid broadcasts",
    "emb_kmeans_elbow": "30-row unioned centroid broadcast (one"
    " assignment pass scores all four k values)",
    "doc_priority_sample_eval": "1-row tau/total scalar crossJoins",
    "evt_seq_pair_support": "1-row user-day-total scalar crossJoin",
    # evt_markov_stationary was allowlisted here ("1-row n/total
    # scalar crossJoins") until r16 moved the power iteration onto
    # the collected |types|^2 matrix (driver-scale, model-sized
    # collect) — the plan is now a plain createDataFrame tail with
    # zero crossJoins; entry REMOVED per the stale-allowlist rule.
    # er_threshold_sensitivity was allowlisted here ("1-row
    # per-threshold stats scalar crossJoins") until r13 replaced its
    # five per-threshold closure loops with one vectorized min-label
    # sweep whose stats legs are left joins on t (cart=0 bnlj=0, ex
    # 15 -> 6) — entry REMOVED so a reintroduced cartesian fails the
    # gate instead of hiding behind a stale justification.
    "doc_bm25_topk": "1-row corpus-stats broadcast (documented)",
    "doc_rrf_hybrid": "1-row corpus-stats broadcast (BM25 leg)",
    "evt_kmv_overlap": "5x128-row sketch broadcasts; type-pair grid",
    "join_size_cms_estimate": "1-row scalar crossJoin (exact readout)",
    "evt_assoc_rules": "1-row basket-total crossJoin",
    "graph_triangles_copurchase": "1-row stat frames crossJoined",
    "doc_ppjoin_stats": "1-row stat frames crossJoined",
    "doc_split_leakage_guard": "1-row stats x 1-row leaks crossJoin",
    "evt_rolling_hll_wau": "calendar-grid broadcast range join",
    "doc_token_budget_recipe": "per-source scalar grid crossJoin",
    "doc_dsir_sample": "scalar budget crossJoin",
    "tpch_q22_dormant_rich": "scalar AVG subquery broadcast",
    "dq_validation_checks": "per-check 1-row frames crossJoined",
    # r16 typed-key split: the single string edge's group has a
    # CONSTANT edge literal, so its two stats equi-joins fold to
    # broadcast loops over the 1-row stats frame x the per-key count
    # table of ONE edge — |distinct event_type| rows, edge-bounded
    "dq_key_skew": "1-row stats joins in the single-string-edge group",
    # dq_referential_integrity was allowlisted here until r12 replaced
    # its per-edge 1-row crossJoins with one left join + conditional
    # agg (cart=0 bnlj=0) — the entry is deliberately REMOVED so a
    # reintroduced cartesian fails the gate instead of hiding behind
    # a stale justification.
    "evt_transition_eval": "1-row majority-baseline broadcast",
    "doc_lm_heldout_eval": "vocab/model broadcasts",
    "doc_unigram_logprob": "vocab broadcast",
    "doc_perplexity_buckets": "LM broadcast + tercile thresholds",
    "evt_gap_fill_daily": "calendar-grid broadcast",
    "doc_tfidf_top_terms": "1-row corpus-size (N) broadcast for the IDF term",
    "doc_token_histogram": "1-row corpus-total broadcast for bucket shares",
    "doc_phrase_heavy_hitters": "1-row phi-threshold scalar broadcast",
    "doc_source_keywords": "1-row global-token-total crossJoin",
    "evt_hist_percentiles_by_type": "|types|-row bin-grid broadcast",
}

# Python surfaces that are row-based BY DESIGN (the query exists to
# exercise that exact API) — everything else must be Arrow
ROW_PYTHON_ALLOWED = {
    "evt_props_kv_udtf": (
        "Python UDTF lateral surface (SURVEY U-gap demonstrator); "
        "the hot-path KV-explode twin is evt_props_key_freq, pure "
        "Catalyst"
    ),
}

# (query) -> documented reason an ORDER-BY-only (global, single
# partition) Window operator is OK. Spark's own runtime warning for
# this shape is suppressed in get_spark (session.py) because every
# instance below is deliberate and input-bounded — which makes THIS
# allowlist the gate that catches an accidental global window (the
# warning used to be the only tripwire, buried in driver logs).
# A global window is legitimate ONLY when its input frame is already
# reduced far below the source tables (a top-k cut, a grouped
# aggregate, a matched subset) — the reason must say what bounds it.
GLOBAL_WINDOW_ALLOWED = {
    # --- rank-emitting top-k: the frame under the window is ALREADY
    # a k-row cut (top_k/TakeOrderedAndProject or a rank<=k filter
    # the optimizer pushes as TakeOrderedAndProject below the Window
    # — plan-verified r13); the window survives because the rank/pos
    # column is part of the output contract
    "doc_bm25_topk": "rank over the top-20 cut of the MATCHED subset "
    "(rare-term df scale, not corpus; TakeOrderedAndProject below "
    "the Window)",
    "doc_rrf_hybrid": "three rank legs, each over a top-50/top-10 "
    "pool cut (pool-bounded whatever the corpus size)",
    "doc_dsir_sample": "rank over the 50-row Gumbel top-k cut "
    "(top_k before the window)",
    "doc_priority_sample_eval": "rank over the K+1-row priority cut "
    "(the tau readout needs the K+1st row, so a bare limit-K cannot "
    "replace the rank)",
    "doc_textrank_keywords": "pos over the top-15 pagerank cut "
    "(top_k before the window)",
    "graph_pagerank_custsupp": "pos over the top-20 pagerank cut "
    "(top_k per-partition heaps first — see the in-code comment)",
    "graph_pagerank_weighted": "pos over the top-20 pagerank cut "
    "(same top_k-then-rank shape)",
    "evt_cms_user_freq": "top-20 readout over the per-user exact "
    "aggregate (rank<=20 pushes TakeOrderedAndProject below; shared "
    "with evt_stream_cms_users)",
    # --- grouped-aggregate / grid inputs: the window input is an
    # aggregate orders of magnitude below the fact table; the
    # docstrings carry the at-scale swap where one exists
    "evt_rfm_segments": "three ntile(4) quartile cuts over the "
    "per-user aggregate (|users| rows; docstring documents the "
    "broadcast-cutpoint swap at billion-user scale)",
    "evt_rolling_dau": "7-day trailing sum over the DAILY rollup "
    "(|days| rows; events never see a global order)",
    "evt_user_growth_curve": "cumulative count over the |days| "
    "calendar grid",
    "evt_slo_burn_rate": "6h trailing sums over the HOURLY rollup "
    "(|hours| rows)",
    "evt_compaction_plan": "running-total bin pack over the |files| "
    "manifest (metadata scale, not data scale)",
    "evt_zorder_pruning_eval": "file-order scans over the 128-file "
    "stats manifest (metadata scale)",
    "evt_mannwhitney_shift": "rank accumulation over the DISTINCT-"
    "value aggregate (grouped first; in-code assert_true guards the "
    "overflow envelope and names block-ranking as the swap past "
    "2^31 observations)",
    "emb_ivf_cell_stats": "load-factor readout over the |cells| "
    "aggregate (8 rows)",
}


# Per-query ceiling on round-robin (spread) exchanges — VERDICT r16
# item 2: `rr` was split out of the keyed-shuffle budget because the
# deliberate sub-split scan spreads (operators/dedup._spread /
# tables.spread_small_scan — no-ops on real multi-file tables) are not
# the regression class `ex` guards, but an UNBOUNDED rr counter would
# let a future accidental `repartition(n)` on a derived frame slip in
# invisibly. Ceiling = the value measured when the spread was added
# (+0); any query not listed here must plan ZERO round-robin
# exchanges. A legitimate new spread must raise its entry here with a
# why, exactly like the allowlists above.
RR_BUDGET = {
    "doc_containment_pairs": 8,
    "doc_decontaminate": 2,
    "doc_exactsubstr_spans": 2,
    "doc_jaccard_pairs": 4,
    "doc_lcs_pairs": 1,
    "doc_lcs_scrub": 1,
    "doc_minhash_accuracy": 8,
    "doc_minhash_pairs": 6,
    "doc_minhash_scurve": 6,
    "doc_passage_dedup": 1,
    "doc_ppjoin_stats": 4,
    "doc_pretrain_pipeline": 4,
    "doc_pretrain_token_yield": 6,
    "doc_simhash": 1,
    "doc_simhash_pairs": 2,
    "doc_winnow_pairs": 4,
    "doc_winnow_spans": 4,
    "dq_profile_lineitem": 1,
}


def _bracket_groups(s: str) -> list[str]:
    """Split `[a], [b, [c]], [d]` into top-level bracket groups —
    window plan nodes print as `Window [exprs], [part], [order]`
    (partitioned) vs `Window [exprs], [order]` (global)."""
    groups: list[str] = []
    depth = 0
    cur: list[str] | None = None
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0 and cur is not None:
                groups.append("".join(cur))
                cur = None
                continue
        if cur is not None:
            cur.append(ch)
    return groups


_SORT_DIRECTION = re.compile(r" (ASC|DESC) NULLS (FIRST|LAST)")


def count_global_windows(plan: str) -> int:
    """ORDER-BY-only Window / WindowGroupLimit / WindowInPandas nodes
    (empty partitionSpec = all rows to ONE partition at execution).
    Window prints `[exprs], [part], [order]` when fully specified;
    TWO groups is ambiguous — `[exprs], [order]` (global, flagged) vs
    `[exprs], [part]` (partition-only, e.g. min-over-user windows,
    fine) — disambiguated by the sort directions an order spec always
    carries and a partition spec never does. WindowGroupLimit prints
    2 groups partitioned vs 1 global (its trailing rank-fn/limit args
    are unbracketed)."""
    n = 0
    for line in plan.splitlines():
        s = line.lstrip(" :+-*(0123456789)")
        if s.startswith(("Window ", "WindowInPandas ")):
            groups = _bracket_groups(s)
            if len(groups) == 2 and _SORT_DIRECTION.search(groups[-1]):
                n += 1
        elif s.startswith("WindowGroupLimit "):
            if len(_bracket_groups(s)) == 1:
                n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("planlint")
    rows = []
    bad_python = []
    bad_cartesian = []
    bad_globalwin = []
    bad_rr = []
    plan_errors = []
    # name -> (quad, pyrow, gwin, rr)
    measured: dict[str, tuple[int, int, int, int]] = {}
    for name in sorted(QUERIES):
        if name in STREAMING:
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            # executedPlan applies the preparation rules (notably
            # EnsureRequirements, which INSERTS the Exchange nodes —
            # sparkPlan() predates them and undercounts shuffles to
            # zero) but does NOT run the job; under AQE its toString
            # shows the initial physical plan, which is what the
            # shuffle budget is about.
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            # sanitize for the markdown table (Py4J messages are
            # multi-line and may contain '|') and RECORD the failure —
            # plan_errors fails the gate below: a query that cannot
            # even plan must never read as a green audit
            msg = str(exc)[:80].replace("|", "\\|").replace("\n", " ")
            rows.append((name, "ERROR", msg, ""))
            plan_errors.append(name)
            continue
        # count only SHUFFLE exchanges: "BroadcastExchange " and
        # "ReusedExchange " both contain the substring "Exchange ",
        # which silently inflated the shuffle counter for every
        # broadcast-joining / exchange-reusing query
        # round-robin spreads are counted SEPARATELY (rr): the dedup
        # family's _spread round-robins a sub-split scan before the
        # shingle explode (r16; no-op on real multi-file tables), and
        # the plan TEXT replays that exchange wherever the scan was
        # already referenced twice — at runtime cache/ReusedExchange
        # dedupe it. Folding those into `ex` would make the hash-
        # shuffle budget unreadable; splitting keeps `ex` = data
        # shuffles keyed by a column, `rr` = deliberate spreads.
        n_rr = plan.count("Exchange RoundRobinPartitioning")
        n_ex = (
            plan.count("Exchange ")
            - plan.count("BroadcastExchange ")
            - plan.count("ReusedExchange ")
            - n_rr
        )
        n_cart = plan.count("CartesianProduct")
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_pyrow = plan.count("BatchEvalPython")
        n_gwin = count_global_windows(plan)
        if n_pyrow and name not in ROW_PYTHON_ALLOWED:
            bad_python.append(name)
        if (n_cart or n_bnlj) and name not in NESTED_LOOP_ALLOWED:
            bad_cartesian.append(name)
        if n_gwin and name not in GLOBAL_WINDOW_ALLOWED:
            bad_globalwin.append(name)
        if n_rr > RR_BUDGET.get(name, 0):
            bad_rr.append(
                f"{name} (rr={n_rr} > budget {RR_BUDGET.get(name, 0)})"
            )
        measured[name] = (n_cart + n_bnlj, n_pyrow, n_gwin, n_rr)
        rows.append(
            (
                name,
                f"ex={n_ex} cart={n_cart} bnlj={n_bnlj} pyrow={n_pyrow}"
                f" gwin={n_gwin}" + (f" rr={n_rr}" if n_rr else ""),
                NESTED_LOOP_ALLOWED.get(name, "")
                or ROW_PYTHON_ALLOWED.get(name, ""),
                GLOBAL_WINDOW_ALLOWED.get(name, "") if n_gwin else "",
            )
        )
        spark.catalog.clearCache()

    # STALE-ALLOWLIST gate (r13): an allowlist justification whose
    # query no longer plans the flagged operator is dead weight AND a
    # latent hazard — if the query later regresses, the gate stays
    # silent behind a justification written for a different plan.
    # r12 removed one such entry by hand (dq_referential_integrity);
    # a r13 audit found 41 more (past reshapes and literal-inlined
    # models removed the joins, the entries lingered) — so the check
    # is now automatic and failing. Streaming entries are exempt
    # (never linted here).
    stale = []
    for allow, idx in (
        (NESTED_LOOP_ALLOWED, 0),
        (ROW_PYTHON_ALLOWED, 1),
        (GLOBAL_WINDOW_ALLOWED, 2),
        (RR_BUDGET, 3),
    ):
        for name in allow:
            if name in STREAMING:
                stale.append(f"{name} (streaming — never linted)")
            elif name in measured and measured[name][idx] == 0:
                stale.append(name)
            elif name not in measured and name not in QUERIES:
                stale.append(f"{name} (not a catalog query)")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLANLINT.md"), "w") as f:
        f.write(
            "# PLANLINT — whole-catalog physical-plan audit\n\n"
            f"Generated by `python tools/plan_lint.py` at `{sf_dir}` over "
            f"{len(rows)} batch catalog entries (streaming entries are "
            "pinned by the streaming pytest suite instead).\n\n"
            "Counters: `ex` = keyed Exchange (shuffle) operators "
            "(round-robin spread exchanges are split out as `rr` and "
            "capped per-query by RR_BUDGET — see tools/plan_lint.py "
            "for why), `cart` = "
            "CartesianProduct, `bnlj` = BroadcastNestedLoopJoin, `pyrow` "
            "= row-at-a-time Python UDF stages (BatchEvalPython; Arrow "
            "stages are fine and not counted), `gwin` = ORDER-BY-only "
            "(single-partition) window operators. Every nonzero "
            "cart/bnlj/gwin must carry an allowlist reason — an empty "
            "reason fails the gate. Spark's runtime warning for the "
            "gwin shape is suppressed in get_spark because every "
            "allowlisted instance is deliberate and input-bounded; "
            "THIS gate is what catches an accidental global window "
            "now.\n\n"
            f"- row-Python-UDF queries: **{len(bad_python)}** "
            f"{bad_python}\n"
            f"- unexplained quadratic joins: **{len(bad_cartesian)}** "
            f"{bad_cartesian}\n"
            f"- unexplained global windows: **{len(bad_globalwin)}** "
            f"{bad_globalwin}\n"
            f"- round-robin exchanges over RR_BUDGET: "
            f"**{len(bad_rr)}** {bad_rr}\n"
            f"- stale allowlist entries (justification without a "
            f"measured operator): **{len(stale)}** {stale}\n\n"
            "| query | counters | quadratic-join justification | "
            "global-window justification |\n"
            "|---|---|---|---|\n"
        )
        for name, counters, why, gwhy in rows:
            f.write(f"| {name} | {counters} | {why} | {gwhy} |\n")
    print(
        f"wrote PLANLINT.md: {len(rows)} entries, "
        f"{len(bad_python)} row-python, "
        f"{len(bad_cartesian)} unexplained quadratic, "
        f"{len(bad_globalwin)} unexplained global window, "
        f"{len(bad_rr)} over rr budget, "
        f"{len(stale)} stale allowlist"
    )
    if plan_errors:
        print(f"plan lint: {len(plan_errors)} queries failed to PLAN: "
              f"{plan_errors}", file=sys.stderr)
    if (
        bad_python
        or bad_cartesian
        or bad_globalwin
        or bad_rr
        or stale
        or plan_errors
    ):
        sys.exit(1)


if __name__ == "__main__":
    main()
