"""IVF coarse-quantizer training: determinism, model shape, and
recall@k of the trained quantizer against the brute-force ground
truth (emb_knn_topk's knn_exact). The trained path is registered
rows-only in the catalog (iterative k-means is not SQL-expressible),
so THIS file is its correctness gate."""

from __future__ import annotations

from pyspark.sql import functions as F

import env_event_stream_spark.operators.similarity as S
from env_event_stream_spark.tables import load_table

_CELLS, _ITER, _PROBE, _K = 10, 10, 3, 3


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_train_ivf_centroids_deterministic_unit_model(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    a = S.train_ivf_centroids(
        e, id_col="vec_id", vec_col="embedding", n_cells=_CELLS, n_iter=3
    )
    b = S.train_ivf_centroids(
        e, id_col="vec_id", vec_col="embedding", n_cells=_CELLS, n_iter=3
    )
    # 9dp rounding inside the trainer makes re-runs bit-identical
    # despite distributed float-summation-order jitter
    assert a == b
    assert len(a) == _CELLS
    dim = len(a[0][1])
    for cid, vec in a:
        assert len(vec) == dim
        assert abs(sum(x * x for x in vec) - 1.0) < 1e-6  # unit sphere


def test_ivf_training_paths_agree(spark, sf_dir):
    """The driver-local sampled path (default, faiss-style bounded
    training set) and the distributed full-corpus mapInPandas path
    must produce the same model on a corpus that fits the cap — the
    only difference is where the float sums run."""
    e = load_table(spark, sf_dir, "embeddings")
    kw = dict(id_col="vec_id", vec_col="embedding", n_cells=4, n_iter=3)
    sampled = S.train_ivf_centroids(e, **kw)
    full = S.train_ivf_centroids(e, sample_cap=None, **kw)
    assert [c for c, _ in sampled] == [c for c, _ in full]
    for (_, a), (_, b) in zip(sampled, full):
        assert len(a) == len(b)
        assert max(abs(x - y) for x, y in zip(a, b)) < 1e-6


def test_multiprobe_lsh_recall_dominates_single_set(spark, sf_dir):
    """Bit-flip probing must strictly contain the single-set LSH
    candidate space (flips=0 IS the single set), so recall is
    monotone in n_flips and >= the plain knn_lsh recall. Measured at
    sf0.01: single 0.07 -> flips=1 0.17 -> flips=2 0.40 -> 0.77."""
    e = load_table(spark, sf_dir, "embeddings").cache()
    try:
        q = e.where(F.col("vec_id") < 10)
        kw = dict(id_col="vec_id", vec_col="embedding", k=_K)
        truth = _pairs(S.knn_exact(q, e, **kw))
        single = len(_pairs(S.knn_lsh(q, e, **kw)) & truth)
        r0 = len(_pairs(S.knn_lsh_multiprobe(q, e, n_flips=0, **kw)) & truth)
        r2 = len(_pairs(S.knn_lsh_multiprobe(q, e, n_flips=2, **kw)) & truth)
        assert r0 == single  # zero flips degenerates to single-set LSH
        assert r2 >= r0
    finally:
        e.unpersist()


def test_binary_quantized_knn_recall(spark, sf_dir):
    """BQ+rescore: 64 sign bits + Hamming shortlist-32 + exact rerank
    must beat the bucketed ANN paths on recall (it scans everything,
    just cheaper). Measured: 0.63 (sf0.001) / 0.80 (sf0.01)."""
    e = load_table(spark, sf_dir, "embeddings").cache()
    try:
        q = e.where(F.col("vec_id") < 10)
        kw = dict(id_col="vec_id", vec_col="embedding", k=_K)
        truth = _pairs(S.knn_exact(q, e, **kw))
        bq = _pairs(S.knn_binary(q, e, shortlist=32, **kw))
        assert len(bq & truth) / len(truth) >= 0.6
        # shortlist = corpus degenerates to exact: recall 1.0
        full = _pairs(S.knn_binary(q, e, shortlist=10_000, **kw))
        assert full == truth
    finally:
        e.unpersist()


def test_knn_binary_quotes_hostile_column_names(spark, sf_dir):
    """The r16 selectExpr rewrite interpolates id_col/vec_col into
    SQL strings; a column name containing a backtick must neither
    break the parse nor resolve to a different column (ADVICE r16 —
    the _bt escaping rule). Results must match the plain-name run."""
    e = load_table(spark, sf_dir, "embeddings").limit(40).cache()
    try:
        q = e.where(F.col("vec_id") < 5)
        kw = dict(k=_K, shortlist=8)
        plain = _pairs(
            S.knn_binary(q, e, id_col="vec_id", vec_col="embedding", **kw)
        )
        hq = q.withColumnRenamed("vec_id", "vec`id").withColumnRenamed(
            "embedding", "emb`arr"
        )
        he = e.withColumnRenamed("vec_id", "vec`id").withColumnRenamed(
            "embedding", "emb`arr"
        )
        hostile = _pairs(
            S.knn_binary(hq, he, id_col="vec`id", vec_col="emb`arr", **kw)
        )
        assert hostile == plain
    finally:
        e.unpersist()


def test_ivf_trained_recall_vs_ground_truth(spark, sf_dir):
    """recall@3 of the trained quantizer >= the untrained
    first-n_cells stand-in, and above an absolute floor — measured
    against exact brute-force cosine top-k (the emb_knn_topk path)."""
    e = load_table(spark, sf_dir, "embeddings").cache()
    try:
        q = e.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
        kw = dict(id_col="vec_id", vec_col="embedding", k=_K)
        truth = _pairs(S.knn_exact(q, e, **kw))
        assert truth
        cents = S.train_ivf_centroids(
            e, id_col="vec_id", vec_col="embedding",
            n_cells=_CELLS, n_iter=_ITER,
        )
        trained = _pairs(
            S.knn_ivf(q, e, n_cells=_CELLS, n_probe=_PROBE,
                      centroids=cents, **kw)
        )
        untrained = _pairs(
            S.knn_ivf(q, e, n_cells=_CELLS, n_probe=_PROBE, **kw)
        )
        r_tr = len(trained & truth) / len(truth)
        r_un = len(untrained & truth) / len(truth)
        # sf0.001: trained 0.600 vs untrained 0.567;
        # sf0.01:  trained 0.700 vs untrained 0.633
        assert r_tr >= r_un, (r_tr, r_un)
        assert r_tr >= 0.55, r_tr
    finally:
        e.unpersist()


def test_ivfpq_index_roundtrip_matches_live(spark, sf_dir):
    """build_ivfpq_index → search_ivfpq_index must return EXACTLY the
    rows knn_ivf_pq computes live with the same trained models — the
    persisted path (parquet codes + JSON model sidecar) loses nothing."""
    import tempfile

    from pyspark.sql import functions as F

    import env_event_stream_spark.operators.similarity as S
    from env_event_stream_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    kw = dict(id_col="vec_id", vec_col="embedding")
    path = tempfile.mkdtemp(prefix="ivfpq_rt_")
    S.build_ivfpq_index(e, path, m=4, k=8, n_cells=5, n_iter=5, **kw)
    got = sorted(
        tuple(r)
        for r in S.search_ivfpq_index(
            spark, path, q, k=3, n_probe=2, **kw
        ).collect()
    )
    cents = S.train_ivf_centroids(e, n_cells=5, n_iter=5, **kw)
    books = S.train_pq_codebooks(e, m=4, k=8, n_iter=5, **kw)
    live = sorted(
        tuple(r)
        for r in S.knn_ivf_pq(
            q, e, books, k=3, n_cells=5, n_probe=2, centroids=cents, **kw
        ).collect()
    )
    assert got == live  # exact equality, scores included


def test_ivfpq_index_search_prunes_partitions(spark, sf_dir):
    """The probe cells reach the index scan as literal partition
    filters — the search reads n_probe worth of cell partitions, not
    the whole index."""
    import tempfile

    from pyspark.sql import functions as F

    import env_event_stream_spark.operators.similarity as S
    from env_event_stream_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 10)
    path = tempfile.mkdtemp(prefix="ivfpq_pp_")
    S.build_ivfpq_index(
        e, path, m=4, k=8, n_cells=5, n_iter=5,
        id_col="vec_id", vec_col="embedding",
    )
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        df = S.search_ivfpq_index(
            spark, path, q, k=3, n_probe=2,
            id_col="vec_id", vec_col="embedding",
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    # the INDEX scan must carry the LITERAL probe-cell IN filter on the
    # partition column. NB: a bare `cell_id` / isnotnull check would
    # false-pass — the equi-join alone infers
    # `PartitionFilters: [isnotnull(cell_id), dynamicpruning...]` even
    # with the isin pruning removed (verified); only the static IN
    # list proves the scan reads n_probe cells.
    pruned = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln
        and "cell_id" in ln.split("PartitionFilters")[1]
        and " IN (" in ln.split("PartitionFilters")[1]
    ]
    assert pruned, plan[:2000]


def test_ivfpq_index_append_matches_fixed_model_search(spark, sf_dir):
    """Appending new vectors to a persisted index (encoded with the
    SAVED models, no retraining) must make search over the grown index
    exactly equal to a live knn_ivf_pq over the full corpus using the
    ORIGINAL half-corpus models — growth loses nothing and retrains
    nothing."""
    import tempfile

    from pyspark.sql import functions as F

    import env_event_stream_spark.operators.similarity as S
    from env_event_stream_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    half1 = e.where(F.col("vec_id") % 2 == 0)
    half2 = e.where(F.col("vec_id") % 2 == 1)
    q = e.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    kw = dict(id_col="vec_id", vec_col="embedding")

    path = tempfile.mkdtemp(prefix="ivfpq_app_")
    S.build_ivfpq_index(half1, path, m=4, k=8, n_cells=5, n_iter=5, **kw)
    S.append_to_ivfpq_index(half2, path, **kw)
    got = sorted(
        tuple(r)
        for r in S.search_ivfpq_index(
            spark, path, q, k=3, n_probe=2, **kw
        ).collect()
    )

    # live reference: models trained on half1 only, corpus = everything
    cents = S.train_ivf_centroids(half1, n_cells=5, n_iter=5, **kw)
    books = S.train_pq_codebooks(half1, m=4, k=8, n_iter=5, **kw)
    live = sorted(
        tuple(r)
        for r in S.knn_ivf_pq(
            q, e, books, k=3, n_cells=5, n_probe=2, centroids=cents, **kw
        ).collect()
    )
    assert got == live


def test_rerank_with_full_candidate_pool_matches_exact_on_pool(spark, sf_dir):
    """Refine-stage contract: the re-rank must reproduce knn_exact's
    scores EXACTLY (same cast/fold/round pipeline) — with the
    candidate pool widened to cover the probed cells entirely, every
    surviving difference from the ADC ordering is pure ranking
    correction, and each returned (query, neighbor, sim) must equal
    the brute-force pair when the neighbor is in the exact top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    books = S.train_pq_codebooks(
        e, id_col="vec_id", vec_col="embedding", m=8, k=8, n_iter=3
    )
    rr = S.knn_ivf_pq_rerank(
        q, e, books, id_col="vec_id", vec_col="embedding",
        k=3, r_cand=1000, n_cells=4, n_probe=4,  # probe ALL cells
    )
    ex = S.knn_exact(q, e, id_col="vec_id", vec_col="embedding", k=3)
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.sim) for r in rr.collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.sim) for r in ex.collect()
    )
    assert got == want


def test_semantic_dedup_keep_rule(spark):
    """Constructed two-cell corpus: ids 0/1 are the centroids. 10 and
    11 are near-identical (cos ~1) in cell 0 — the one FARTHER from
    the centroid must be kept; 12 sits alone in cell 1 and must
    survive untouched."""
    import math

    c0 = [1.0, 0.0, 0.0, 0.0]
    c1 = [0.0, 1.0, 0.0, 0.0]
    close = [0.9, 0.1, 0.0, 0.0]   # nearer to centroid 0
    far = [0.8, 0.1, 0.05, 0.0]    # same direction-ish, farther from c0
    lone = [0.1, 0.9, 0.0, 0.0]
    rows = [(0, c0), (1, c1), (10, close), (11, far), (12, lone)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {
        r.vec_id: r
        for r in S.semantic_dedup(
            df, id_col="vec_id", vec_col="embedding",
            threshold=0.9, n_cells=2,
        ).collect()
    }
    assert len(out) == 5

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    assert cos(close, far) > 0.9  # the pair really is a semantic dup
    assert out[10].cell_id == 0 and out[11].cell_id == 0
    assert out[11].keep is True   # farther from centroid: kept
    assert out[10].keep is False  # nearer to centroid: dropped
    assert out[12].keep is True and out[12].cell_id == 1
    # centroids themselves: 0 is a dup of 10/11 direction (cos(c0, close)
    # ~0.99 > 0.9) — exactly one of each dup group survives overall
    kept_cell0 = [v for v in out.values() if v.cell_id == 0 and v.keep]
    assert len(kept_cell0) == 1


def test_opq_persisted_index_matches_live_search(spark, sf_dir):
    """The OPQ rotation must round-trip the model sidecar exactly:
    a search against the persisted OPQ index returns row-for-row the
    live rotate->probe->ADC pipeline's answer (and the sidecar of a
    rotation-free index keeps working — rotation=None path)."""
    from env_event_stream_spark.ann_queries import (
        emb_knn_opq_adc,
        emb_knn_opq_persisted,
    )

    live = sorted(map(tuple, emb_knn_opq_adc(spark, sf_dir).collect()))
    pers = sorted(map(tuple, emb_knn_opq_persisted(spark, sf_dir).collect()))
    assert live == pers
    assert len(live) == 30


def test_nearest_cells_twins_agree_on_zero_norm_vector(spark, sf_dir):
    """Degenerate-input parity: a zero-norm vector must get the SAME
    cell assignment from the Catalyst path (try_divide -> NULL,
    sorts last) and the Arrow path (-inf, sorts last) — under ANSI
    mode a plain divide would throw on one side only."""
    from pyspark.sql import functions as F

    from env_event_stream_spark.operators import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(e.select("embedding").first().embedding)
    zero = spark.createDataFrame(
        [(999999, [0.0] * dim)], "vec_id bigint, embedding array<double>"
    )
    both = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(zero)
    cents = S.train_ivf_centroids(
        e, id_col="vec_id", vec_col="embedding", n_cells=4, n_iter=2
    )
    cent = S._centroid_frame(
        both, id_col="vec_id", vec_col="embedding", n_cells=4,
        centroids=cents,
    )
    cat = sorted(
        (r.vid, r.cell_id)
        for r in S._nearest_cells(
            both, cent, id_out="vid", id_col="vec_id",
            vec_col="embedding", n_probe=1,
        ).collect()
    )
    arr = sorted(
        (r.vid, r.cell_id)
        for r in S.nearest_cells_arrow(
            both, cent, id_out="vid", id_col="vec_id",
            vec_col="embedding", n_probe=1,
        ).collect()
    )
    assert cat == arr
    assert dict(cat)[999999] == min(c for c, _ in cents)


def test_ivf_cell_stats_partition_of_corpus(spark, sf_dir):
    # the audit must PARTITION the corpus: cells disjointly cover all
    # vectors, shares sum to ~1e6 ppm (floor loss < n_cells), exactly
    # one hottest flag, load factor consistent with share
    from env_event_stream_spark.ann_queries import emb_ivf_cell_stats
    from env_event_stream_spark.tables import load_table

    rows = emb_ivf_cell_stats(spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_corpus
    tot_ppm = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < tot_ppm <= 1_000_000
    assert sum(1 for r in rows if r["is_hottest"]) == 1
    hottest = max(rows, key=lambda r: (r["n_vectors"], -r["cell_id"]))
    assert hottest["is_hottest"]
    for r in rows:
        assert r["load_x10000"] == r["n_vectors"] * 8 * 10000 // n_corpus


def test_kmeans_lloyd_matches_python_replay(spark, sf_dir):
    """Full independent replay: quantize, init on lowest ids, three
    assignment/update rounds with floor-division centroids and
    empty-cluster carryover, final stats — every output cell must
    match the distributed run."""
    import math

    from env_event_stream_spark.catalog import QUERIES
    from env_event_stream_spark.ann_queries import (
        _KM_ITERS,
        _KM_K,
        _KM_Q,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    pts = {
        int(r.vec_id): [
            math.floor(float(x) * _KM_Q + 0.5) for x in r.embedding
        ]
        for r in rows
    }
    cent = {
        i: list(pts[v])
        for i, v in enumerate(sorted(pts)[:_KM_K])
    }

    def best(v):
        return min(
            (
                (
                    sum((a - b) * (a - b) for a, b in zip(v, cent[c])),
                    c,
                )
                for c in sorted(cent)
            )
        )

    for _ in range(_KM_ITERS):
        groups = {}
        for vid, v in pts.items():
            _d, c = best(v)
            groups.setdefault(c, []).append(v)
        new = {}
        for c, vs in groups.items():
            n = len(vs)
            new[c] = [
                sum(v[j] for v in vs) // n for j in range(len(vs[0]))
            ]
        for c in cent:
            if c not in new:
                new[c] = cent[c]
        cent = new

    want = {c: [0, 0, sum(cent[c])] for c in cent}
    for vid, v in pts.items():
        d, c = best(v)
        want[c][0] += 1
        want[c][1] += d
    got = {
        r.cid: (r.n_points, r.inertia, r.c_checksum)
        for r in QUERIES["emb_kmeans_lloyd"](spark, sf_dir).collect()
    }
    assert got == {c: tuple(w) for c, w in want.items()}


def test_kmeans_ivf_eval_consistency(spark, sf_dir):
    """The eval's naive column must equal emb_ivf_recall_eval's match
    counts (same chain), the Lloyd chain must use the pytest-pinned
    trainer's centroids, and counts stay in [0, 3]."""
    from env_event_stream_spark.catalog import QUERIES
    from env_event_stream_spark.ann_queries import (
        _kmeans_cent_spark_cached,
        _kmeans_train_python,
        _KM_Q,
    )

    got = QUERIES["emb_kmeans_ivf_eval"](spark, sf_dir).collect()
    assert len(got) == 10
    assert all(0 <= r.n_match_naive <= 3 for r in got)
    assert all(0 <= r.n_match_lloyd <= 3 for r in got)
    base = {
        r.query_id: r.n_match
        for r in QUERIES["emb_ivf_recall_eval"](spark, sf_dir).collect()
    }
    assert {r.query_id: r.n_match_naive for r in got} == base
    cached = _kmeans_cent_spark_cached(sf_dir)
    trained = _kmeans_train_python(sf_dir)
    assert [
        (cid, tuple(c / _KM_Q for c in vec)) for cid, vec in trained
    ] == list(cached)


def test_kmeans_elbow_monotone_and_consistent_with_lloyd(spark, sf_dir):
    """Inertia must fall monotonically in k, nonempty cells <= k,
    and the k=8 row must equal the distributed emb_kmeans_lloyd
    totals (same trainer, same quantization)."""
    from env_event_stream_spark.catalog import QUERIES
    from env_event_stream_spark.ann_queries import _ELBOW_KS

    rows = sorted(
        QUERIES["emb_kmeans_elbow"](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == list(_ELBOW_KS)
    for a, b in zip(rows, rows[1:]):
        assert b.inertia <= a.inertia, (a.k, b.k)
    for r in rows:
        assert 1 <= r.n_nonempty_cells <= r.k
        assert 0 < r.max_cell_ppm <= 1000000
    lloyd = QUERIES["emb_kmeans_lloyd"](spark, sf_dir).collect()
    k8 = next(r for r in rows if r.k == 8)
    assert k8.inertia == sum(r.inertia for r in lloyd)
    assert k8.n_nonempty_cells == sum(
        1 for r in lloyd if r.n_points > 0
    )


def test_knn_k1_agg_matches_window_on_zero_norm_vector(spark, sf_dir):
    """Degenerate-input parity: a zero-norm vector's cosine is NULL
    (try_divide — under ANSI a plain divide would THROW), and NULL
    sorts LAST in both the windowed path (`sim desc` nulls last) and
    the k=1 min(struct) fast path (the is-null flag) — a degenerate
    vector is nobody's nearest neighbor, loudly consistent across
    paths. Also pins the all-null group: querying FROM the zero
    vector returns the smallest neighbor_id with a NULL sim in both
    paths."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    dim = len(e.select("embedding").first().embedding)
    zero = spark.createDataFrame(
        [(999999, [0.0] * dim)], "vec_id bigint, embedding array<float>"
    )
    corpus = e.unionByName(zero)
    q = e.where(F.col("vec_id") < 5).unionByName(zero)
    kw = dict(id_col="vec_id", vec_col="embedding")
    one = {
        r.query_id: (r.neighbor_id, r.sim)
        for r in S.knn_exact(q, corpus, k=1, **kw).collect()
    }
    win = {
        r.query_id: (r.neighbor_id, r.sim)
        for r in S.knn_exact(q, corpus, k=2, **kw).collect()
        if r.rank == 1
    }
    assert one == win
    min_id = corpus.agg(F.min("vec_id")).first()[0]
    for qid, (nid, sim) in one.items():
        if qid == 999999:
            # all-null sims: tie-break alone decides, sim is NULL
            assert nid == min_id and sim is None
        else:
            # the zero-norm vector never wins a real query
            assert nid != 999999 and sim is not None
