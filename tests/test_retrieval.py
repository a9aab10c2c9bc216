"""Retrieval family: BM25 / RRF hybrid / hard-negative mining, plus
the histogram-sketch percentile tier. Correctness is oracled by the
driver; these tests pin the SCALE-CRITICAL plan shapes and the
contract invariants the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_event_stream_spark.catalog import QUERIES
from env_event_stream_spark.retrieval_queries import BM25_TERMS


def _plan(spark, sf_dir, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    df = QUERIES[name](spark, sf_dir)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_is_query_time_shaped(spark, sf_dir):
    """BM25 must NOT build posting lists for a 3-term query: no
    explode (Generate) anywhere, no cartesian, no sort-merge join —
    the term stats ride a broadcast of one scalar row and scoring is
    row-local."""
    plan = _plan(spark, sf_dir, "doc_bm25_topk")
    assert "Generate" not in plan  # no explode of the token arrays
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats broadcast


def test_bm25_rare_term_outranks(spark, sf_dir):
    """idf sanity: every doc containing the rare term ('dup',
    df≈5%) must outscore every matched doc that lacks it — the
    separation BM25 exists to provide on this vocabulary."""
    rows = QUERIES["doc_bm25_topk"](spark, sf_dir).collect()
    assert len(rows) == 20
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.array_contains(
                F.split(F.trim("text"), r"\s+"), BM25_TERMS[0]
            ).alias("has_rare"),
        )
        .collect()
    )
    has_rare = {r.doc_id for r in docs if r.has_rare}
    # ranks are 1-based and dense; all rare-term docs in the top-20
    # must precede every non-rare doc
    ranks_rare = [r.rank for r in rows if r.doc_id in has_rare]
    ranks_other = [r.rank for r in rows if r.doc_id not in has_rare]
    if ranks_rare and ranks_other:
        assert max(ranks_rare) < min(ranks_other)


def test_rrf_monotone_and_bounded(spark, sf_dir):
    """RRF invariants: scores in (0, 2/(k+1)], fused_rank follows
    rrf_score desc, and a doc ranked by both rankers beats a doc
    with the same single rank."""
    rows = QUERIES["doc_rrf_hybrid"](spark, sf_dir).collect()
    assert rows
    by_rank = sorted(rows, key=lambda r: r.fused_rank)
    scores = [r.rrf_score for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= 2.0 / 61 + 1e-9 for s in scores)


def test_hard_negatives_corpus_not_shuffled(spark, sf_dir):
    """The corpus reduces via a map-side-combinable max(struct)
    against a broadcast anchor batch: no cartesian, no sort-merge
    join, and a partial aggregation stage must exist."""
    plan = _plan(spark, sf_dir, "emb_hard_negatives")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_max" in plan  # map-side combine of the struct max


def test_hard_negatives_labels_respected(spark, sf_dir):
    """pos_id shares the anchor's label, neg_id does not, and
    neither equals the anchor."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    for r in QUERIES["emb_hard_negatives"](spark, sf_dir).collect():
        assert r.pos_id != r.anchor_id and r.neg_id != r.anchor_id
        assert labels[r.pos_id] == labels[r.anchor_id]
        assert labels[r.neg_id] != labels[r.anchor_id]
        assert abs((r.pos_sim - r.neg_sim) - r.margin) < 1e-4


def test_hist_percentile_within_bin_of_order_stat(spark, sf_dir):
    """The estimator's actual guarantee: the hit bin (first with
    cum >= q*n) CONTAINS the ceil(q*n)-th order statistic, so the
    interpolated estimate is within ONE bin width of it. (Distance
    to the interpolated quantile_cont value is NOT bounded in bins —
    a sparse tail can put consecutive order stats many bins apart —
    which is exactly the error the `err` column exists to report.)"""
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    rows = QUERIES["evt_hist_percentiles_by_type"](spark, sf_dir).collect()
    assert len(rows) == 3 * len(vals)
    for r in rows:
        v = sorted(vals[r.event_type])
        w = (v[-1] - v[0]) / 128.0
        order_stat = v[math.ceil(r.q * len(v)) - 1]
        assert abs(r.hist_est - order_stat) <= w + 1e-9, (
            r.event_type,
            r.q,
            r.hist_est,
            order_stat,
            w,
        )


def test_hist_percentile_histogram_is_partial_agg(spark, sf_dir):
    """The (type, bin) histogram must map-side combine (partial
    count) — the property that makes it the 100 TB tier."""
    plan = _plan(spark, sf_dir, "evt_hist_percentiles_by_type")
    assert "partial_count" in plan
