"""Physical-plan regression tests: the *shape* of the plan is part of
the contract (SURVEY.md §4 — everything the reference hand-built,
Catalyst must actually be doing for us). These catch silent
regressions like a broadcast hint lost in a refactor or a filter that
stopped reaching the parquet scan."""

from __future__ import annotations

import pytest

from env_event_stream_spark.catalog import QUERIES
from conftest import require_default_broadcast, require_wholestage_codegen


def _plan(spark, sf_dir, name: str) -> str:
    # untruncated scan metadata (PushedFilters cuts at 100 chars by
    # default) + execute first so AQE finalizes subplans and codegen
    # markers (*) appear
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    df = QUERIES[name](spark, sf_dir)
    df.collect()  # count() would execute a DIFFERENT QueryExecution
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_replay_filters_pushed_to_scan(spark, sf_dir):
    """P1-P4 predicates must reach the parquet reader (the reference
    hand-builds WHERE clauses, src/persistence.ts:341-368; for us this
    is PushedFilters + row-group skipping)."""
    plan = _plan(spark, sf_dir, "evt_replay")
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    # ts-range (raw nanos domain via load_events) and type-IN all pushed
    assert "GreaterThanOrEqual(ts" in pushed
    assert "LessThanOrEqual(ts" in pushed
    assert "In(event_type" in pushed


def test_projection_prunes_columns(spark, sf_dir):
    """P9: a 3-column projection must not read the whole events
    schema (ReadSchema shows what actually hits the scan)."""
    plan = _plan(spark, sf_dir, "evt_project")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read and "event_type" in read and "ts" in read
    assert "props" not in read and "value" not in read


def test_star_join_broadcasts_dims(spark, sf_dir):
    """Dims broadcast; the fact table shuffles at most once."""
    plan = _plan(spark, sf_dir, "join_revenue_by_region")
    assert plan.count("BroadcastHashJoin") >= 2
    plan5 = _plan(spark, sf_dir, "tpch_q5_local_supplier")
    assert "BroadcastHashJoin" in plan5


def test_global_topk_is_take_ordered(spark, sf_dir):
    """O3: sort+limit must compile to TakeOrderedAndProject, never a
    full sort."""
    plan = _plan(spark, sf_dir, "topk_orders_global")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_semi_anti_join_types(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi_anti")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    """Map-side combine: HashAggregate appears in partial AND final
    mode so the shuffle carries group rows, not raw rows."""
    plan = _plan(spark, sf_dir, "tpch_q1_pricing")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial" in plan


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    require_wholestage_codegen(spark)
    # executedPlan().toString() marks codegen'd spans with "*(n)"
    plan = _plan(spark, sf_dir, "tpch_q6_forecast")
    assert "*(1)" in plan


def test_exists_probe_is_semi_join_not_per_key(spark, sf_dir):
    """P8 upgrade: one pass, not a LIMIT-1 probe per key."""
    opt = _optimized(spark, sf_dir, "evt_exists_probe")
    assert "LeftSemi" in opt


def test_range_band_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_range_price_band")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_asof_join_no_cartesian(spark, sf_dir):
    """The as-of join must stay union+window — any Cartesian/loop join
    in the plan means the implementation regressed to cross-product."""
    plan = _plan(spark, sf_dir, "asof_purchase_prior_view")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_forward_no_cartesian(spark, sf_dir):
    """Forward as-of mirrors backward: union + first-over-following-
    frame window, never a cross product or per-row loop join."""
    plan = _plan(spark, sf_dir, "asof_purchase_next_view")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_never_crosses_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "doc_minhash_pairs")
    assert "CartesianProduct" not in plan


def test_simhash_signature_is_shuffle_free_map(spark, sf_dir):
    """The SimHash signature is a per-row map: it must run as
    mapInPandas with no data-dependent shuffle — no hash/range
    exchange, no aggregate — before the pair join's block-key
    equi-join. (A RoundRobin exchange is permitted: that's the
    deliberate small-input parallelism spread, a no-op on real
    multi-file tables.)"""
    plan = _plan(spark, sf_dir, "doc_simhash")
    assert "MapInPandas" in plan
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "HashAggregate" not in plan
    pairs_plan = _plan(spark, sf_dir, "doc_simhash_pairs")
    assert "CartesianProduct" not in pairs_plan


@pytest.mark.parametrize("name", ["tpch_q17_small_qty_avg", "tpch_q22_dormant_rich"])
def test_decorrelated_subqueries_stay_joins(spark, sf_dir, name):
    """Correlated subqueries must decorrelate to joins (no per-row
    re-execution shape survives in the optimized plan)."""
    opt = _optimized(spark, sf_dir, name)
    assert "Join" in opt


def test_unigram_logprob_broadcasts_vocab(spark, sf_dir):
    """The unigram LM score joins the corpus-sized token stream to
    the vocabulary — the vocab side must broadcast (it's model-sized,
    the token stream is corpus-sized and must not shuffle for it)."""
    plan = _plan(spark, sf_dir, "doc_unigram_logprob")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """Decontamination must probe broadcast eval shingles — the corpus
    side never shuffles for the candidate join (benchmarks are KBs,
    corpora are TBs)."""
    plan = _plan(spark, sf_dir, "doc_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_no_global_sort(spark, sf_dir):
    """Sequence packing windows per source shard: the plan must hash-
    partition on source, never collapse to a single partition (a
    global-ordered window would be Exchange SinglePartition — the
    classic silent scale killer)."""
    plan = _plan(spark, sf_dir, "doc_pack_sequences")
    assert "SinglePartition" not in plan
    assert "hashpartitioning(source" in plan


def test_chunking_and_quality_rules_are_pure_map_stages(spark, sf_dir):
    """Sliding-window chunking and the Gopher quality rules are
    row-local: their plans must contain NO exchange at all — at corpus
    scale they run as map-only passes fused into the scan."""
    for name in ("doc_chunk_overlap", "doc_gopher_quality_rules"):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange" not in plan, name


def test_funnel_and_cohorts_single_user_shuffle(spark, sf_dir):
    """The strict-sequence funnel and the cohort retention triangle
    shuffle the event stream ONCE on user_id (windows / collect_set
    aggregates share the partitioning); everything after is a rollup
    over tiny step/cohort cardinalities. Two exchanges total: the
    user_id one plus the final small rollup."""
    for name in ("evt_funnel_steps", "evt_cohort_retention"):
        # AQE's toString repeats the tree under "== Initial Plan ==" —
        # count exchanges in the final section only
        plan = _plan(spark, sf_dir, name).split("== Initial Plan ==")[0]
        assert plan.count("Exchange") <= 2, (name, plan.count("Exchange"))
        assert "hashpartitioning(user_id" in plan, name


def test_lsh_recall_eval_no_unexpected_cartesian(spark, sf_dir):
    """The eval's exact side is the documented brute-force tier (its
    crossJoin is intentional); the LSH side and the comparison joins
    must stay equi-joins — exactly one cross product in the plan."""
    plan = _plan(spark, sf_dir, "emb_lsh_recall_eval").split(
        "== Initial Plan =="
    )[0]
    n_cross = plan.count("CartesianProduct") + plan.count(
        "BroadcastNestedLoopJoin"
    )
    assert n_cross <= 1, n_cross


def test_pq_encode_is_row_local(spark, sf_dir):
    """PQ encoding (codebooks are driver-side literals) must be a
    pure map stage: no exchange anywhere in the final plan."""
    plan = _plan(spark, sf_dir, "emb_quantize_pq").split("== Initial Plan ==")[0]
    assert "Exchange" not in plan


def test_knn_pq_adc_no_cartesian(spark, sf_dir):
    """IVF-PQ candidates come from the cell_id equi-join; the only
    nested-loop joins are the broadcast-tiny centroid assignments
    (8 centroid rows), never corpus x corpus."""
    plan = _plan(spark, sf_dir, "emb_knn_pq_adc").split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan


def test_bigram_logprob_broadcasts_model(spark, sf_dir):
    """The prefix-count model is broadcast-hinted; the bigram model is
    unhinted by design (vocabulary-squared at corpus scale) but AQE
    must still broadcast it at this data size — check the FINAL plan
    (the AQE initial plan legitimately shows a sort-merge join)."""
    require_default_broadcast(spark)
    plan = _plan(spark, sf_dir, "doc_bigram_logprob").split(
        "== Initial Plan =="
    )[0]
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_knn_opq_adc_no_cartesian(spark, sf_dir):
    """OPQ adds only a row-local MapInPandas rotation in front of the
    IVF-PQ pipeline: candidates still come from the cell_id equi-join,
    never corpus x corpus."""
    plan = _plan(spark, sf_dir, "emb_knn_opq_adc").split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan


def test_dsir_models_broadcast_and_takeordered(spark, sf_dir):
    """DSIR's four model frames (bucket counts + totals for target and
    raw) are O(buckets)/scalars and must broadcast; the k-cut must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_dir, "doc_dsir_sample")
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 4
    assert "TakeOrderedAndProject" in plan


def test_repeated_ngram_no_cartesian(spark, sf_dir):
    """The boilerplate signal is pre-agg + gram-keyed equi-joins —
    no pair explosion, no cross product anywhere."""
    plan = _plan(spark, sf_dir, "doc_repeated_ngram_frac").split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan


def test_phrase_heavy_hitters_sketch_plan(spark, sf_dir):
    """The MG sketch pass is map-only (candidates come straight off
    the gram stream with no exchange feeding the python runner), the
    candidate set comes back as a BROADCAST join (never a shuffle of
    the occurrence stream on phrase), and the 1-row total joins as a
    broadcast nested loop. The only shuffles left are the candidate
    distinct and the recount's own aggregation."""
    plan = _plan(spark, sf_dir, "doc_phrase_heavy_hitters").split(
        "== Initial Plan =="
    )[0]
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # recount must not re-shuffle occurrences for the join itself:
    # the only Exchanges are candidate-distinct + final agg partials
    assert plan.count("Exchange hashpartitioning") <= 3


def test_knn_pq_rerank_broadcasts_candidates(spark, sf_dir):
    """The refine stage must fetch candidate vectors via BROADCAST of
    the |Q| x r_cand candidate list — never a corpus re-shuffle or a
    cross product beyond the stage-1 broadcast centroid probes."""
    require_default_broadcast(spark)
    plan = _plan(spark, sf_dir, "emb_knn_pq_rerank").split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_no_corpus_cross_join(spark, sf_dir):
    """SemDeDup's pair generation must be the cell_id self-EQUI-join
    (candidates bounded by cell population) — the only cross product
    allowed is the 8-row broadcast centroid probe inside the Arrow
    assignment, which is a closure, not a join; the victim set comes
    back as a broadcast."""
    plan = _plan(spark, sf_dir, "emb_semdedup").split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_quality_classifier_is_pure_map_stage(spark, sf_dir):
    """Learned-filter scoring is ONE row-local projection (weights as
    a literal array, token-order fold): no exchange, no join of any
    kind — the whole plan is scan-project."""
    plan = _plan(spark, sf_dir, "doc_quality_classifier").split(
        "== Initial Plan =="
    )[0]
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_perplexity_buckets_broadcasts_lm(spark, sf_dir):
    """The unigram LM (vocab counts + total) must broadcast back onto
    the token stream — the corpus-sized side shuffles only for the
    per-doc agg, never to meet the model."""
    plan = _plan(spark, sf_dir, "doc_perplexity_buckets")
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    assert "CartesianProduct" not in plan


def test_vocab_coverage_topk_and_broadcast(spark, sf_dir):
    """The vocabulary cut must be TakeOrdered (no global sort of the
    term table) and must broadcast onto the token stream."""
    plan = _plan(spark, sf_dir, "doc_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_centroid_outliers_broadcast_probe_takeordered(spark, sf_dir):
    """Cell scoring is a broadcast probe (8 centroid rows) and the
    outlier cut is TakeOrdered — the corpus is never shuffled to be
    scored, and there is no global sort."""
    plan = _plan(spark, sf_dir, "emb_centroid_outliers")
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_cluster_sample_single_cell_shuffle(spark, sf_dir):
    """Cluster-balanced sampling: broadcast cell-assign, then the only
    exchanges are the per-vector rn window and the per-cell quota
    window — no join shuffle of the corpus."""
    plan = _plan(spark, sf_dir, "emb_cluster_sample")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_attribution_single_user_shuffle(spark, sf_dir):
    """Last-touch attribution: the carry-forward window and the final
    rollup ride ONE user_id exchange + one tiny channel exchange."""
    plan = _plan(spark, sf_dir, "evt_attribution_last_touch").split(
        "== Initial Plan =="
    )[0]
    assert plan.count("Exchange") <= 2
    assert "hashpartitioning(user_id" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_winnow_pairs_bounded_join(spark, sf_dir):
    """Winnowing: fingerprint selection is a shuffle-free Arrow map
    stage; the pair stage is the bounded inverted-index equi-join —
    no cartesian anywhere."""
    plan = _plan(spark, sf_dir, "doc_winnow_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan


def test_partial_topk_prefilters_before_exchange(spark, sf_dir):
    """The map-side-heap top-k must run its MapInPandas prefilter
    BEFORE the window's hash exchange — the shuffle sees survivors,
    not the stream."""
    plan = _plan(spark, sf_dir, "window_top3_value_per_type").split(
        "== Initial Plan =="
    )[0]
    assert "MapInPandas" in plan
    # the prefilter appears below (after, in tree order) the exchange
    assert plan.index("MapInPandas") > plan.index("Exchange")
    assert "CartesianProduct" not in plan


def test_cms_cells_partial_aggregate_before_exchange(spark, sf_dir):
    """The CMS merge property must BE map-side combine: the cell
    groupBy's exchange follows a partial_count, so at most d*w rows
    leave each input partition — never the 4x projected stream."""
    from env_event_stream_spark.operators.sketches import cms_cells
    from pyspark.sql import functions as F

    df = cms_cells(
        spark.read.parquet(f"{sf_dir}/events.parquet"), F.col("user_id")
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    pre_exchange = plan.split("Exchange hashpartitioning")[-1]
    assert "partial_count" in pre_exchange
    assert "CartesianProduct" not in plan


def test_triangles_no_window_no_cartesian(spark, sf_dir):
    """Degree orientation must not reintroduce the global-rank window
    (a single-partition sort over |V|), and closure must stay an
    equi-join."""
    require_default_broadcast(spark)
    plan = _plan(spark, sf_dir, "graph_triangles_copurchase")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_profile_single_scan(spark, sf_dir):
    """The melt must read lineitem ONCE — one FileScan in the final
    plan (per-column UNION-of-scans, or the double scan Catalyst
    plans for implicit countDistinct-plus-min/max, are the shapes
    being avoided), and the (col, value) pre-aggregation must
    partial-combine before its exchange."""
    plan = _plan(spark, sf_dir, "dq_profile_lineitem")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "partial_count" in final.split("Exchange hashpartitioning")[-1]


def test_kmv_overlap_no_corpus_self_join(spark, sf_dir):
    """Everything pairwise runs on broadcast sketches; the events
    table itself appears only in sketch-build and the exact-tier
    scans, and the union-sketch join is broadcast."""
    require_default_broadcast(spark)
    plan = _plan(spark, sf_dir, "evt_kmv_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_priority_sample_is_distributive_topk(spark, sf_dir):
    """The DLT sample must ride TakeOrderedAndProject (per-partition
    heaps) — a global Sort here means the 100 TB no-global-sort
    argument silently regressed — with no Python stage anywhere."""
    plan = _plan(spark, sf_dir, "evt_priority_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan and "BatchEvalPython" not in plan


def test_nested_skip_modes_single_arrow_stage(spark, sf_dir):
    """All four nested-pattern counts (both policies, untimed + 4h)
    must run in ONE Arrow stage over the shared user-day sequences:
    exactly one MapInPandas, no row-Python, no extra exchange beyond
    the family's single user-day shuffle."""
    plan = _plan(spark, sf_dir, "evt_cep_skip_modes_nested")
    # AQE repeats the final subtree in toString — count unique nodes
    arrow = {l.lstrip(" +-:*") for l in plan.splitlines() if "MapInPandas" in l}
    assert len(arrow) == 1
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # user-day shuffle (+ AQE read)


def test_unigram_encode_vocab_bounded_python(spark, sf_dir):
    """Viterbi work must touch only the DEDUPLICATED word list (one
    Arrow stage fed by a distinct), with the per-word symbol counts
    BROADCAST back onto the (source, word) bag — corpus rows never
    reach Python and never shuffle for the model join."""
    plan = _plan(spark, sf_dir, "doc_unigram_lm_encode")
    arrow = {l.lstrip(" +-:*") for l in plan.splitlines() if "MapInPandas" in l}
    assert len(arrow) == 1
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_semantic_decon_k1_reduces_before_exchange(spark, sf_dir):
    """emb_decontaminate's k=1 reduction must be the map-side-
    combinable min(struct) aggregate, NOT a row_number window
    (VERDICT r10 finding; honest footnote — WindowGroupLimit would
    also have bounded the window's exchange on Spark 3.5+, but the
    aggregate skips the post-shuffle Sort + Window recompute and is
    ~1.8x faster measured, so THIS is the pinned shape)."""
    plan = _plan(spark, sf_dir, "emb_decontaminate")
    assert "Window" not in plan
    assert "partial_min" in plan
    # the partial agg must sit BELOW the query_id exchange
    ex = plan.index("Exchange hashpartitioning(query_id")
    assert plan.index("partial_min") > ex


def test_knn_topk_window_group_limit_pushed(spark, sf_dir):
    """knn_exact's k>1 window path relies on Spark's WindowGroupLimit
    rewrite to push a partial per-query top-k BELOW the shuffle —
    pin it so an expression change that stops the rewrite firing
    (e.g. losing the rank<=k filter shape) shows up as a plan
    regression, not a silent full-expansion exchange."""
    plan = _plan(spark, sf_dir, "emb_knn_topk")
    # plan strings print parents first, so "below the exchange" =
    # after it in the string: a Partial-mode group limit must follow
    # the query_id shuffle
    below = plan.split("Exchange hashpartitioning(query_id", 1)[1]
    assert "row_number(), 5, Partial" in below
