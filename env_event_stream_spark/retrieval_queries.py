"""Ranked retrieval over the document/embedding corpus — the search
side of a training-data platform (find the docs a probe query hits:
curation spot-checks, contamination audits, eval-set provenance).

Three rungs:
- ``doc_bm25_topk``     — lexical BM25 (Robertson/Sparck Jones k1/b
  form, the Lucene/Elasticsearch default scorer).
- ``doc_rrf_hybrid``    — reciprocal-rank fusion of the BM25 ranking
  with an embedding-cosine ranking (the standard hybrid-search
  combiner; Cormack et al., k=60).
- ``emb_hard_negatives`` — triplet mining for contrastive training:
  per anchor, the hardest positive (same label, least similar is NOT
  wanted — hardest positive = most similar non-self) and hardest
  negative (different label, most similar).

Scale notes (100 TB): BM25 here is deliberately *query-time* shaped —
the query's terms are a tiny literal set, so term stats (df, avgdl,
N) are two scalar-row aggregates broadcast back onto a row-local
scoring pass; the corpus is never exploded and never shuffled (no
posting-list build — that's doc_tfidf_top_terms' shape). Per-term tf
uses size(filter(tokens)) per row, which whole-stage-codegens. The
final rank only sees docs that matched ≥1 query term. Hard-negative
mining broadcasts the anchor batch (a training batch is KBs) and
reduces the corpus with a map-side-combinable max(struct) — the
corpus never shuffles full rows, only |anchors|×2 partials per
partition.

Determinism: BM25 contributions are summed in FIXED term order (a
three-addend expression, not an agg over exploded rows) so the double
result is bit-identical to the DuckDB oracle; constants are spelled
as the same literals on both sides (2.2 not k1+1 — 1.2+1.0 rounds to
a different double than the literal 2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from env_event_stream_spark.functions.text import tokens
from env_event_stream_spark.functions.vectors import as_double, dot, l2_norm
from env_event_stream_spark.queries import query
from env_event_stream_spark.tables import load_table

# The probe query: one rare term ('dup', df≈5%) + two common terms —
# the classic BM25 demo shape where idf separates the rare term's
# contribution from the background.
BM25_TERMS = ("dup", "merge", "window")
_RRF_K = 60
_RRF_POOL = 50  # per-ranker candidate pool fused by RRF


def _eq_term(t: str):
    """One-param lambda factory for F.filter — a ``lambda x, t=t``
    default argument would widen the signature to the (element,
    index) form and silently compare against the INDEX (the repo's
    recorded higher-order-function pitfall)."""
    return lambda x: x == F.lit(t)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for docs matching ≥1 query term.

    Two passes: (1) row-local per-term tf + doc length, (2) one
    scalar aggregate row (N, avgdl, per-term df) broadcast back, then
    a row-local fixed-order score expression. No explode, no corpus
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    base = d.select(
        "doc_id",
        F.size(tk).cast("double").alias("dl"),
        *[
            F.size(F.filter(tk, _eq_term(t))).cast("double").alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = base.join(F.broadcast(stats))
    contribs = []
    for t in BM25_TERMS:
        tf, df = F.col(f"tf_{t}"), F.col(f"df_{t}")
        idf = F.log(
            (F.col("n") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        denom = tf + F.lit(1.2) * (
            F.lit(1.0) - F.lit(0.75)
            + F.lit(0.75) * F.col("dl") / F.col("avgdl")
        )
        contribs.append(
            F.when(tf > 0, idf * tf * F.lit(2.2) / denom).otherwise(F.lit(0.0))
        )
    # fixed-order sum: c0 + c1 + c2 — bit-identical across engines
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return scored.select("doc_id", score.alias("score")).where(
        F.col("score") > 0
    )


def _bm25_contrib_sql(t: str) -> str:
    return (
        f"(CASE WHEN tf_{t} > 0 THEN "
        f"ln((n - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0) * tf_{t} * 2.2 / "
        f"(tf_{t} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) "
        f"ELSE 0.0 END)"
    )


_BM25_CTES = r"""
t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      FROM documents),
b AS (SELECT doc_id,
             CAST(len(tk) AS DOUBLE) AS dl,
""" + ",\n".join(
    f"             CAST(len(list_filter(tk, x -> x = '{t}')) AS DOUBLE)"
    f" AS tf_{t}"
    for t in BM25_TERMS
) + r"""
      FROM t),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
""" + ",\n".join(
    f"             CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)"
    f" AS DOUBLE) AS df_{t}"
    for t in BM25_TERMS
) + r"""
      FROM b),
sc AS (SELECT doc_id,
              """ + " + ".join(
    _bm25_contrib_sql(t) for t in BM25_TERMS
) + r""" AS score
       FROM b CROSS JOIN s),
matched AS (SELECT doc_id, score FROM sc WHERE score > 0)
"""


@query(
    "doc_bm25_topk",
    "WITH "
    + _BM25_CTES
    + """
    SELECT doc_id, round(score, 6) AS bm25,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM matched)
    WHERE rank <= 20
    """,
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the fixed probe query (k1=1.2, b=0.75) — the
    Lucene-default lexical scorer, query-time shaped (see module
    docstring: scalar stats broadcast, row-local tf, no posting
    lists, corpus never shuffled). Only matched docs reach the final
    rank; the global top-k is a single-column sort over the matched
    subset, which at 100 TB is the scale of the rare-term df, not
    the corpus."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 20)
        .select("doc_id", F.round("score", 6).alias("bm25"), "rank")
    )


_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@query(
    "doc_rrf_hybrid",
    "WITH "
    + _BM25_CTES
    + f""",
    bmr AS (SELECT doc_id, row_number() OVER
                     (ORDER BY score DESC, doc_id ASC) AS rank_bm25
            FROM matched WHERE doc_id <> 0),
    qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings
           WHERE vec_id = 0),
    vs AS (SELECT vec_id AS doc_id,
                  {_COS_SQL.format(a="q", b="embedding::DOUBLE[]")} AS csim
           FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
    vr AS (SELECT doc_id, row_number() OVER
                    (ORDER BY csim DESC, doc_id ASC) AS rank_vec
           FROM vs),
    fused AS (
      SELECT doc_id,
             rank_bm25, rank_vec,
             coalesce(1.0 / ({_RRF_K} + rank_bm25), 0.0)
               + coalesce(1.0 / ({_RRF_K} + rank_vec), 0.0) AS rrf
      FROM (SELECT * FROM bmr WHERE rank_bm25 <= {_RRF_POOL}) b
      FULL JOIN (SELECT * FROM vr WHERE rank_vec <= {_RRF_POOL}) v
      USING (doc_id))
    SELECT doc_id,
           CAST(rank_bm25 AS BIGINT) AS rank_bm25,
           CAST(rank_vec AS BIGINT) AS rank_vec,
           round(rrf, 6) AS rrf_score,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
                AS BIGINT) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= 10
    """,
)
def doc_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: RRF (k=60) fusing the BM25 ranking with the
    embedding-cosine ranking for the same probe (text = BM25_TERMS,
    vector = doc 0's embedding; doc 0 itself excluded from both
    pools so the trivial self-hit doesn't pin rank 1). Each ranker
    contributes its top-50; docs found by only one ranker score with
    the other's term zeroed (full outer join). RRF is the
    score-scale-free combiner — no min-max normalization to tune,
    which is why it's the hybrid default in Elasticsearch/Vespa.

    Scale: both rankers end in a top-50 — pools are tiny whatever
    the corpus; the fusion join and final sort are driver-trivial.
    """
    bm = _bm25_scored(spark, sf_dir).where(F.col("doc_id") != 0)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bmr = (
        bm.withColumn("rank_bm25", F.row_number().over(wb))
        .where(F.col("rank_bm25") <= _RRF_POOL)
        .select("doc_id", "rank_bm25")
    )

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(
        as_double(F.col("embedding")).alias("q")
    )
    cand = e.where(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"), as_double(F.col("embedding")).alias("v")
    )
    vs = cand.join(F.broadcast(qv)).withColumn(
        "csim",
        dot(F.col("q"), F.col("v")) / (l2_norm(F.col("q")) * l2_norm(F.col("v"))),
    )
    wv = Window.orderBy(F.col("csim").desc(), F.col("doc_id").asc())
    vr = (
        vs.withColumn("rank_vec", F.row_number().over(wv))
        .where(F.col("rank_vec") <= _RRF_POOL)
        .select("doc_id", "rank_vec")
    )

    fused = bmr.join(vr, "doc_id", "full_outer").withColumn(
        "rrf",
        F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_bm25")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_vec")), F.lit(0.0)),
    )
    wf = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("bigint"))
        .where(F.col("fused_rank") <= 10)
        .select(
            "doc_id",
            F.col("rank_bm25").cast("bigint").alias("rank_bm25"),
            F.col("rank_vec").cast("bigint").alias("rank_vec"),
            F.round("rrf", 6).alias("rrf_score"),
            "fused_rank",
        )
    )


@query(
    "emb_hard_negatives",
    f"""
    WITH a AS (SELECT vec_id AS anchor_id, label AS a_label,
                      embedding::DOUBLE[] AS av
               FROM embeddings WHERE vec_id % 50 = 0),
    c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv
          FROM embeddings),
    s AS (SELECT anchor_id,
                 vec_id,
                 (label = a_label) AS same_label,
                 {_COS_SQL.format(a="av", b="cv")} AS csim
          FROM a JOIN c ON vec_id <> anchor_id),
    r AS (SELECT *, row_number() OVER
                 (PARTITION BY anchor_id, same_label
                  ORDER BY csim DESC, vec_id ASC) AS rn
          FROM s)
    SELECT anchor_id,
           max(CASE WHEN same_label THEN vec_id END) AS pos_id,
           round(max(CASE WHEN same_label THEN csim END), 6) AS pos_sim,
           max(CASE WHEN NOT same_label THEN vec_id END) AS neg_id,
           round(max(CASE WHEN NOT same_label THEN csim END), 6) AS neg_sim,
           round(max(CASE WHEN same_label THEN csim END)
                 - max(CASE WHEN NOT same_label THEN csim END), 6) AS margin
    FROM r WHERE rn = 1
    GROUP BY anchor_id
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for contrastive training: for each anchor
    (vec_id % 50 = 0 — the 'batch'), the hardest positive (most
    similar same-label neighbor) and hardest negative (most similar
    different-label vector), plus the triplet margin. Negative
    margins mark the anchors a contrastive update actually learns
    from (an impostor outranks the true neighbor).

    Scale: the anchor batch broadcasts; the corpus is scanned once
    and reduced with max(struct(csim, -vec_id)) per (anchor, side) —
    a map-side-combinable aggregate, so each partition emits at most
    |anchors|×2 partial rows and the corpus itself never shuffles.
    The struct max realizes the sim-desc, vec_id-asc tie-break
    (larger -vec_id = smaller vec_id)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        as_double(F.col("embedding")).alias("av"),
    ).withColumn("an", l2_norm(F.col("av")))
    c = e.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    s = (
        c.join(F.broadcast(a), F.col("vec_id") != F.col("anchor_id"))
        .withColumn(
            "csim", dot(F.col("av"), F.col("cv")) / (F.col("an") * F.col("cn"))
        )
        .withColumn("same_label", F.col("label") == F.col("a_label"))
    )
    best = s.groupBy("anchor_id", "same_label").agg(
        F.max(
            F.struct(
                F.col("csim").alias("csim"),
                (-F.col("vec_id")).alias("neg_vid"),
            )
        ).alias("b")
    )
    return best.groupBy("anchor_id").agg(
        F.max(F.when(F.col("same_label"), -F.col("b.neg_vid"))).alias("pos_id"),
        F.round(
            F.max(F.when(F.col("same_label"), F.col("b.csim"))), 6
        ).alias("pos_sim"),
        F.max(F.when(~F.col("same_label"), -F.col("b.neg_vid"))).alias("neg_id"),
        F.round(
            F.max(F.when(~F.col("same_label"), F.col("b.csim"))), 6
        ).alias("neg_sim"),
        F.round(
            F.max(F.when(F.col("same_label"), F.col("b.csim")))
            - F.max(F.when(~F.col("same_label"), F.col("b.csim"))),
            6,
        ).alias("margin"),
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (Carbonell & Goldstein '98) — the rung
# ABOVE plain top-k: relevance alone returns near-duplicate clusters
# (this corpus deliberately contains them); MMR trades relevance
# against redundancy with the selected set.
# ---------------------------------------------------------------------------

_MMR_POOL = 30  # relevance candidate pool per query
_MMR_K = 10  # results selected per query
_MMR_LAMBDA = 0.7  # relevance weight; (1 - lambda) penalizes redundancy
_MMR_QUERY_MOD = 100  # probe queries: vec_id % 100 == 0


def _r6(x: float) -> float:
    """floor(x*1e6 + 0.5)/1e6 in pure Python — the engine's tie-free
    6dp rounding, same IEEE ops, no round() tie semantics."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _seq_cosine(a: list[float], b: list[float]) -> float | None:
    """Sequential-fold cosine matching functions/vectors.py exactly:
    dot = left fold of (+, a[i]*b[i]); cos = d / (na * nb); None for
    zero vectors (the Catalyst helper's null contract)."""
    import math

    d = na = nb = 0.0
    for x, y in zip(a, b):
        d = d + x * y
        na = na + x * x
        nb = nb + y * y
    na, nb = math.sqrt(na), math.sqrt(nb)
    if not (na > 0.0 and nb > 0.0):
        return None
    return d / (na * nb)


def _mmr_select(
    rel: dict[int, float], sim: dict[tuple[int, int], float]
) -> list[tuple[int, int, float, float]]:
    """Engine-side greedy: (pos, id, rel, mmr) rows; linear scan with
    running best, id order so the smallest id wins exact-mmr ties."""
    import math

    remaining = sorted(rel)
    sel: list[int] = []
    out = []
    while remaining and len(sel) < _MMR_K:
        best_c, best_mmr = None, None
        for c in remaining:
            red = max((sim[(c, s)] for s in sel), default=0.0)
            mmr = _MMR_LAMBDA * rel[c] - (1 - _MMR_LAMBDA) * red
            if best_mmr is None or mmr > best_mmr:
                best_c, best_mmr = c, mmr
        sel.append(best_c)
        remaining.remove(best_c)
        out.append(
            (
                len(sel),
                best_c,
                rel[best_c],
                math.floor(best_mmr * 1e6 + 0.5) / 1e6,
            )
        )
    return out


def _mmr_select_oracle(
    rel: dict[int, float], sim: dict[tuple[int, int], float]
) -> list[tuple[int, int, float, float]]:
    """Oracle-side greedy: sort-based argmax on ((mmr, -id)) — a
    DELIBERATELY different implementation of the same contract
    (tests/test_trend_er_mmr.py fuzzes the two against each other)."""
    import math

    remaining, sel = sorted(rel), []
    out = []
    while remaining and len(sel) < _MMR_K:
        scored = sorted(
            (
                (
                    _MMR_LAMBDA * rel[c]
                    - (1 - _MMR_LAMBDA)
                    * max((sim[(c, s)] for s in sel), default=0.0),
                    -c,
                ),
                c,
            )
            for c in remaining
        )
        mmr, c = scored[-1][0][0], scored[-1][1]
        sel.append(c)
        remaining.remove(c)
        out.append(
            (len(sel), c, rel[c], math.floor(mmr * 1e6 + 0.5) / 1e6)
        )
    return out


_MMR_ORACLE_CACHE: dict[str, dict] = {}


def _mmr_oracle_state(sf_dir: str) -> dict:
    """Per-sf_dir memo of the oracle-side pure-Python MMR pipeline
    (rel maps, pool pair sims, top-k and MMR selections) — both lazy
    oracles (_mmr_oracle, _mmr_eval_oracle) read it, so the driver's
    oracle_sql() resolution computes the O(n^2) cosine pass once
    (the trained-model memoization precedent)."""
    if sf_dir in _MMR_ORACLE_CACHE:
        return _MMR_ORACLE_CACHE[sf_dir]
    import pyarrow.parquet as pq

    t = pq.read_table(
        sf_dir.rstrip("/") + "/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    ids = t.column("vec_id").to_pylist()
    byid = {
        i: [float(x) for x in v]
        for i, v in zip(ids, t.column("embedding").to_pylist())
    }
    state = {"qids": [], "rel": {}, "sim": {}, "top": {}, "mmr": {}}
    for qid in sorted(i for i in ids if i % _MMR_QUERY_MOD == 0):
        rel = {}
        for cid in ids:
            if cid == qid:
                continue
            c = _seq_cosine(byid[qid], byid[cid])
            if c is not None:
                rel[cid] = _r6(c)
        pool = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_POOL]
        sim = {}
        for i in pool:
            for j in pool:
                if i != j:
                    c = _seq_cosine(byid[i], byid[j])
                    sim[(i, j)] = _r6(c) if c is not None else 0.0
        pool_rel = {i: rel[i] for i in pool}
        state["qids"].append(qid)
        state["rel"][qid] = rel
        state["sim"][qid] = sim
        state["top"][qid] = pool[:_MMR_K]
        state["mmr"][qid] = _mmr_select_oracle(pool_rel, sim)
    _MMR_ORACLE_CACHE[sf_dir] = state
    return state


def _mmr_oracle() -> str:
    """Lazy oracle: an INDEPENDENT pure-Python MMR (pyarrow read +
    sequential-fold cosines + sort-based greedy), inlined as VALUES —
    the doc_bpe_learn_merges precedent: when the algorithm is
    inherently sequential, the oracle is a second implementation of
    the same exact contract, not the same code re-run."""
    from env_event_stream_spark.llm_queries import _oracle_sf_dir

    st = _mmr_oracle_state(_oracle_sf_dir())
    rows = []
    for qid in st["qids"]:
        for pos, vid, r, m in st["mmr"][qid]:
            rows.append((qid, pos, vid, r, m))
    vals = ", ".join(
        f"({q}, {p}, {v}, CAST({r!r} AS DOUBLE), CAST({m!r} AS DOUBLE))"
        for q, p, v, r, m in rows
    )
    return f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(pos AS BIGINT) AS pos,
           CAST(vec_id AS BIGINT) AS vec_id, rel, mmr
    FROM (VALUES {vals}) AS t(query_id, pos, vec_id, rel, mmr)
    """


def _mmr_pool_pairs(spark: SparkSession, sf_dir: str):
    """(pool, pairs) for the MMR family: per probe query the top-30
    relevance pool with ranks, and the pool x pool pairwise-sim
    table — all vector math Catalyst-side, 6dp tie-free rounded (see
    emb_mmr_diversify's determinism notes)."""
    from env_event_stream_spark.functions.vectors import (
        cosine_with_norms,
        l2_norm,
    )
    from env_event_stream_spark.llm_queries import _SPARK_TRAIN_DIRS

    _SPARK_TRAIN_DIRS.add(sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    # r16 (guide §2.3): per-vector L2 norms are computed ONCE here —
    # every downstream cosine is then a single zip_with fold (the dot)
    # instead of three, with bit-identical doubles (see
    # cosine_with_norms).
    v = e.select(
        "vec_id", as_double(F.col("embedding")).alias("cv")
    ).withColumn("nv", l2_norm(F.col("cv")))
    q = v.where(F.col("vec_id") % _MMR_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("cv").alias("qv"),
        F.col("nv").alias("nq"),
    )
    rel_raw = cosine_with_norms(
        F.col("qv"), F.col("cv"), F.col("nq"), F.col("nv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn("rel_raw", rel_raw)
        .where(F.col("rel_raw").isNotNull())
        .withColumn(
            "rel", F.floor(F.col("rel_raw") * 1e6 + F.lit(0.5)) / 1e6
        )
    )
    # r16 (guide §8): the top-30 window shuffles SCALARS only
    # (qid, vec_id, rel) — the vectors re-attach after the cut via a
    # corpus join on the pool's ~|Q|*30 survivor ids, so the exchange
    # never carries the embedding payload.
    w = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), F.col("vec_id").asc()
    )
    pool_ids = (
        scored.select("qid", "vec_id", "rel")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _MMR_POOL)
    )
    pool = pool_ids.join(v, "vec_id").select(
        "qid", "vec_id", "cv", "nv", "rel", "rn"
    )
    # materialize ONCE: pool feeds the greedy, the eval's metric
    # joins, and the pairs self-join below — without the checkpoint
    # the broadcast corpus-x-probe relevance scan replays per
    # reference (emb_mmr_diversity_eval's plan held ~6 copies of it)
    pool = pool.localCheckpoint(eager=True)
    p1, p2 = pool.alias("p1"), pool.alias("p2")
    pairs = p1.join(
        p2,
        (F.col("p1.qid") == F.col("p2.qid"))
        & (F.col("p1.vec_id") != F.col("p2.vec_id")),
    ).select(
        F.col("p1.qid").alias("qid"),
        F.col("p1.vec_id").alias("a"),
        F.col("p2.vec_id").alias("b"),
        F.col("p1.rel").alias("a_rel"),
        (
            F.floor(
                F.coalesce(
                    cosine_with_norms(
                        F.col("p1.cv"),
                        F.col("p2.cv"),
                        F.col("p1.nv"),
                        F.col("p2.nv"),
                    ),
                    F.lit(0.0),
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("sim"),
    ).localCheckpoint(eager=True)
    return pool.drop("nv"), pairs


@query("emb_mmr_diversify", _mmr_oracle)
def emb_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking: per probe query (vec_id % 100 == 0), take the
    top-30 cosine pool, then greedily select 10 maximizing
    0.7*relevance - 0.3*max-similarity-to-already-selected — the
    diversity-aware result page / dedup-aware retrieval rung of the
    ANN ladder (a near-dup cluster contributes ONE result instead of
    filling the page).

    Split by nature of the work: ALL vector math is Catalyst
    (broadcast query probe onto the corpus for relevance, pool x pool
    self-join for pairwise sims — both whole-stage-codegen'd
    sequential-fold cosines, 6dp tie-free rounded), while the
    inherently sequential greedy runs in one applyInPandas over the
    ~900 PRECOMPUTED scalars per query — Python never touches a
    vector, and groups parallelize across queries. 100 TB shape:
    relevance pass = the brute-force kNN shape (swap in the IVF probe
    for a real corpus); the greedy is O(K * pool) per query over
    KB-sized state. Determinism: greedy decisions compare doubles
    built from 6dp-rounded inputs with id tie-breaks — bit-identical
    to the oracle's independent sort-based implementation."""
    pool, pairs = _mmr_pool_pairs(spark, sf_dir)
    return _mmr_greedy_df(pool, pairs)


def _mmr_greedy_df(pool: DataFrame, pairs: DataFrame) -> DataFrame:
    """The sequential greedy as one applyInPandas over precomputed
    scalars. Groups come from pool LEFT-joined to pairs, so a probe
    whose pool has a single member still reaches the greedy (a pure
    pairs grouping would silently drop it while the Python oracle
    emits its one selection — a hash divergence on degenerate data)."""
    import pandas as pd

    rows = pool.select(
        "qid", F.col("vec_id").alias("a"), F.col("rel").alias("a_rel")
    ).join(pairs.select("qid", "a", "b", "sim"), ["qid", "a"], "left")

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        rel = {}
        sim = {}
        for a, b, ar, s in zip(
            pdf["a"], pdf["b"], pdf["a_rel"], pdf["sim"]
        ):
            rel[int(a)] = float(ar)
            if not pd.isna(b):
                sim[(int(a), int(b))] = float(s)
        out = [
            (qid, pos, vid, r, m)
            for pos, vid, r, m in _mmr_select(rel, sim)
        ]
        return pd.DataFrame(
            out, columns=["query_id", "pos", "vec_id", "rel", "mmr"]
        )

    return rows.groupBy("qid").applyInPandas(
        greedy,
        "query_id bigint, pos bigint, vec_id bigint, rel double, mmr double",
    )


# ---------------------------------------------------------------------------
# MMR eval twin (the recall-ladder discipline: every re-ranking rung
# ships with a measured justification): how much intra-list
# redundancy does MMR actually remove, and what does it cost in
# relevance, vs the plain top-k page at the same k.
# ---------------------------------------------------------------------------


def _avg6_to_4dp(vals: list[float], n: int) -> float:
    """DECIMAL(18,6)-sum / n -> floor 4dp, in pure Python with the
    engine's exact op order: 6dp values summed as integer micros
    (exact), correctly-rounded to double, one IEEE division, tie-free
    floor."""
    import math
    from fractions import Fraction

    s6 = sum(int(math.floor(v * 1e6 + 0.5)) for v in vals)
    d = float(Fraction(s6, 10**6))
    return math.floor(d / n * 1e4 + 0.5) / 1e4


def _mmr_eval_oracle() -> str:
    """Independent pure-Python twin of emb_mmr_diversity_eval (same
    contract as _mmr_oracle, single VALUES row; shares the memoized
    oracle pipeline state)."""
    from env_event_stream_spark.llm_queries import _oracle_sf_dir

    st = _mmr_oracle_state(_oracle_sf_dir())
    rel_top, rel_mmr, sim_top, sim_mmr = [], [], [], []
    for qid in st["qids"]:
        rel, sim = st["rel"][qid], st["sim"][qid]
        top = st["top"][qid]
        sel = [vid for _, vid, _, _ in st["mmr"][qid]]
        rel_top += [rel[i] for i in top]
        rel_mmr += [rel[i] for i in sel]
        sim_top += [sim[(i, j)] for i in top for j in top if i != j]
        sim_mmr += [sim[(i, j)] for i in sel for j in sel if i != j]
    nq = len(st["qids"])
    art = _avg6_to_4dp(rel_top, len(rel_top))
    arm = _avg6_to_4dp(rel_mmr, len(rel_mmr))
    ast_ = _avg6_to_4dp(sim_top, len(sim_top))
    asm = _avg6_to_4dp(sim_mmr, len(sim_mmr))
    return f"""
    SELECT CAST({nq} AS BIGINT) AS n_queries,
           CAST({art!r} AS DOUBLE) AS avg_rel_topk,
           CAST({arm!r} AS DOUBLE) AS avg_rel_mmr,
           CAST({ast_!r} AS DOUBLE) AS avg_pairsim_topk,
           CAST({asm!r} AS DOUBLE) AS avg_pairsim_mmr,
           CAST({ast_!r} AS DOUBLE) - CAST({asm!r} AS DOUBLE)
             AS redundancy_removed
    """


@query("emb_mmr_diversity_eval", _mmr_eval_oracle)
def emb_mmr_diversity_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MEASURED justification for the MMR rung: mean intra-list
    pairwise similarity and mean relevance of the plain top-10 page
    vs the MMR-10 page, over all probe queries. redundancy_removed
    is what the re-ranking buys; avg_rel_topk - avg_rel_mmr is what
    it costs — the eval twin every re-ranking stage needs before a
    rollout (the emb_*_recall_eval discipline applied to diversity).

    All similarities come from the SAME 6dp-rounded pool/pairs frames
    as the ranking itself; averages ride DECIMAL(18,6) sums (order-
    independent) finalized by one double division and a tie-free 4dp
    floor. Scale: pools are O(queries x 30), the metric joins touch
    nothing corpus-sized."""
    pool, pairs = _mmr_pool_pairs(spark, sf_dir)
    # the greedy applyInPandas feeds THREE metric legs (one relevance
    # join + both sides of the pairwise-sim join): materialize its
    # (queries x 10)-row output once instead of re-running the Python
    # stage per leg — same treatment as pool/pairs above
    sel_mmr = (
        _mmr_greedy_df(pool, pairs)
        .select(F.col("query_id").alias("qid"), "vec_id")
        .localCheckpoint(eager=True)
    )
    sel_top = pool.where(F.col("rn") <= _MMR_K).select("qid", "vec_id")

    def avg4(col):
        return F.floor(
            F.sum(col.cast("decimal(18,6)")).cast("double")
            / F.count("*")
            * 1e4
            + F.lit(0.5)
        ) / 1e4

    def rel_row(sel, name):
        return (
            pool.join(sel, ["qid", "vec_id"])
            .agg(avg4(F.col("rel")).alias(name))
        )

    def sim_row(sel, name):
        pa = sel.select("qid", F.col("vec_id").alias("a"))
        pb = sel.select("qid", F.col("vec_id").alias("b"))
        return (
            pairs.join(pa, ["qid", "a"])
            .join(pb, ["qid", "b"])
            .agg(avg4(F.col("sim")).alias(name))
        )

    nq = sel_top.agg(
        F.countDistinct("qid").cast("bigint").alias("n_queries")
    )
    out = (
        nq.crossJoin(rel_row(sel_top, "avg_rel_topk"))
        .crossJoin(rel_row(sel_mmr, "avg_rel_mmr"))
        .crossJoin(sim_row(sel_top, "avg_pairsim_topk"))
        .crossJoin(sim_row(sel_mmr, "avg_pairsim_mmr"))
    )
    return out.select(
        "n_queries",
        "avg_rel_topk",
        "avg_rel_mmr",
        "avg_pairsim_topk",
        "avg_pairsim_mmr",
        (F.col("avg_pairsim_topk") - F.col("avg_pairsim_mmr")).alias(
            "redundancy_removed"
        ),
    )
