"""Property tests for the PQ encoder: the Catalyst array-expression
encode must agree with an independent numpy argmin reference on
random vectors (the oracle ties the two engines together on the
driver's data; this fuzzes the encoder itself over a wider input
space), and the codebook trainer must be a pure function of its
sample (bit-identical re-runs)."""

from __future__ import annotations

import numpy as np
import pytest

from env_event_stream_spark.operators.similarity import (
    _pq_kmeans,
    pq_codes,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260813)


def test_pq_kmeans_is_deterministic(rng):
    X = rng.normal(size=(200, 16)).astype(np.float32).astype(np.float64)
    a = _pq_kmeans(X, m=4, k=8, n_iter=10)
    b = _pq_kmeans(X.copy(), m=4, k=8, n_iter=10)
    assert a == b  # rounded-fixpoint training: bit-identical re-runs


def test_pq_codes_match_numpy_argmin(spark, rng):
    """Spark encode (zip_with objective + array_position first-min)
    vs plain numpy: same codes, including the lowest-code tie-break.
    The numpy side uses the same -2<s,c>+<c,c> objective with the
    same left-to-right <c,c> accumulation."""
    from pyspark.sql import functions as F

    dim, m, k = 16, 4, 8
    d = dim // m
    X = rng.normal(size=(64, dim)).astype(np.float32)
    books = _pq_kmeans(X.astype(np.float64), m=m, k=k, n_iter=5)

    # numpy reference codes (1-based)
    expect = []
    for row in X.astype(np.float64):
        codes = []
        for i, book in enumerate(books):
            sub = row[i * d : (i + 1) * d]
            objs = []
            for c in book:
                cc = 0.0
                for x in c:
                    cc = cc + float(x) * float(x)
                dot = 0.0
                for a, b in zip(sub, c):
                    dot = dot + float(a) * float(b)
                objs.append(-2.0 * dot + cc)
            codes.append(int(np.argmin(objs)) + 1)
        expect.append(codes)

    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id bigint, v array<double>",
    )
    got = {
        r.id: list(r.codes)
        for r in df.select(
            "id", pq_codes(F.col("v"), books).alias("codes")
        ).collect()
    }
    assert got == {i: expect[i] for i in range(len(expect))}


def test_pq_encode_arrow_bit_identical_to_catalyst(spark, rng):
    """The Arrow/numpy encode twin (pq_encode_arrow — the corpus-scale
    hot path) must be BIT-identical to the declarative
    pq_codes/pq_recon_error pair: same codes and the exact same
    unrounded reconstruction error, which requires the same
    sequential accumulation order on both paths."""
    from pyspark.sql import functions as F

    from env_event_stream_spark.operators.similarity import (
        pq_encode_arrow,
        pq_recon_error,
    )

    dim, m, k = 16, 4, 8
    X = rng.normal(size=(96, dim)).astype(np.float32)
    books = _pq_kmeans(X.astype(np.float64), m=m, k=k, n_iter=5)

    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id bigint, v array<double>",
    )
    declarative = {
        r.id: (list(r.codes), r.err)
        for r in df.select(
            "id",
            pq_codes(F.col("v"), books).alias("codes"),
            pq_recon_error(F.col("v"), books).alias("err"),
        ).collect()
    }
    arrow = {
        r.id: (list(r.codes), r.recon_err)
        for r in pq_encode_arrow(
            df, books, vec_col="v", keep=["id"], with_recon=True
        ).collect()
    }
    assert arrow == declarative  # exact float equality, no tolerance


def test_nearest_cells_arrow_bit_identical_to_catalyst(spark, rng):
    """The Arrow cell-assign twin (corpus side of IVF/IVFPQ) must be
    bit-identical to the declarative _nearest_cells: same cells in
    the same per-id order (csim DESC, cell_id ASC ties), same exact
    v/nrm doubles."""
    from env_event_stream_spark.operators.similarity import (
        _centroid_frame,
        _nearest_cells,
        nearest_cells_arrow,
    )

    dim = 16
    X = rng.normal(size=(80, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vid bigint, v array<double>",
    )
    cent = _centroid_frame(
        df, id_col="vid", vec_col="v", n_cells=5, centroids=None
    )

    def canon(rows):
        return sorted(
            (r.nid, r.cell_id, tuple(r.v), r.nrm) for r in rows
        )

    a = canon(
        _nearest_cells(
            df, cent, id_out="nid", id_col="vid", vec_col="v", n_probe=2
        ).collect()
    )
    b = canon(
        nearest_cells_arrow(
            df, cent, id_out="nid", id_col="vid", vec_col="v", n_probe=2
        ).collect()
    )
    assert a == b


def _correlated_sample(rng, n=300, dim=16):
    """Correlated Gaussian (random linear mix + per-dim scales) — the
    structure OPQ exists to exploit; isotropic data would make the
    distortion assertions vacuous."""
    Z = rng.normal(size=(n, dim))
    A = rng.normal(size=(dim, dim)) * (0.3 + rng.random(dim))
    return (Z @ A).astype(np.float32).astype(np.float64)


def test_opq_train_is_deterministic(rng):
    from env_event_stream_spark.operators.similarity import _opq_train

    X = _correlated_sample(rng)
    a = _opq_train(X, 4, 8, pq_iter=5, opq_iter=4)
    b = _opq_train(X.copy(), 4, 8, pq_iter=5, opq_iter=4)
    assert a == b  # same SVD/k-means on same bits: bit-identical model


def test_opq_rotation_is_orthogonal(rng):
    from env_event_stream_spark.operators.similarity import _opq_train

    X = _correlated_sample(rng)
    M, _books = _opq_train(X, 4, 8, pq_iter=5, opq_iter=4)
    Mm = np.array(M)
    # exact orthogonality up to the 9dp rounding of the shipped matrix
    assert np.abs(Mm @ Mm.T - np.eye(Mm.shape[0])).max() < 1e-7


def _mean_distortion(Y, books):
    m = len(books)
    d = len(books[0][0])
    B = np.array(books)
    err = np.zeros(len(Y))
    for i in range(m):
        S = Y[:, i * d : (i + 1) * d]
        d2 = ((S[:, None, :] - B[i][None, :, :]) ** 2).sum(axis=2)
        err += d2.min(axis=1)
    return float(err.mean())


def test_opq_applied_rotation_matches_training_convention(rng):
    """Regression for the rotation-orientation bug: the shipped matrix
    M must satisfy y = M·x == the trainer's internal row-convention
    X @ R, so the codebooks quantize the basis they were trained in.
    Applying M the wrong way round (Mᵀ) leaves distortion at or above
    plain-PQ level; applied correctly it must be strictly below."""
    from env_event_stream_spark.operators.similarity import (
        _opq_train,
        _pq_kmeans,
    )

    X = _correlated_sample(rng)
    M, books = _opq_train(X, 4, 8, pq_iter=5, opq_iter=6)
    Mm = np.array(M)
    pq_books = _pq_kmeans(X, 4, 8, 5)
    d_pq = _mean_distortion(X, pq_books)
    d_opq = _mean_distortion(X @ Mm.T, books)  # y_o = Σj M[o,j]·xj
    d_wrong = _mean_distortion(X @ Mm, books)
    assert d_opq < d_pq  # the OPQ training guarantee
    assert d_opq < d_wrong  # transposed application would be garbage


def test_rotate_arrow_is_exact_sequential_fold(spark, rng):
    """rotate_arrow must equal the pure-Python sequential fold
    Σⱼ M[o,j]·xⱼ bit-for-bit (the order the DuckDB oracle's
    list_dot_product uses) — exact float equality, no tolerance."""
    from env_event_stream_spark.operators.similarity import (
        _opq_train,
        rotate_arrow,
    )

    X = _correlated_sample(rng, n=64)
    M, _books = _opq_train(X, 4, 8, pq_iter=3, opq_iter=2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id bigint, v array<double>",
    )
    got = {
        r.id: list(r.v)
        for r in rotate_arrow(df, M, vec_col="v", keep=["id"]).collect()
    }
    dim = len(M)
    for i, row in enumerate(X):
        expect = []
        for o in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + M[o][j] * float(row[j])
            expect.append(acc)
        assert got[i] == expect


def test_residual_arrow_encode_equals_catalyst_on_subtracted(spark, sf_dir):
    """The residual twist is one subtraction inside the Arrow encode;
    pin it against the independent Catalyst path: assign cells, build
    v - centroid explicitly with zip_with, encode with the
    interpreted pq_codes folds — codes must match the Arrow
    residual_cells encode row for row."""
    import numpy as np
    from pyspark.sql import functions as F

    from env_event_stream_spark.operators import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = S.train_pq_codebooks(
        e, id_col="vec_id", vec_col="embedding", m=8, k=16, n_iter=2
    )
    cents = S.train_ivf_centroids(
        e, id_col="vec_id", vec_col="embedding", n_cells=4, n_iter=2
    )
    cent = S._centroid_frame(
        e, id_col="vec_id", vec_col="embedding", n_cells=4, centroids=cents
    )
    assigned = S.nearest_cells_arrow(
        e, cent, id_out="vid", id_col="vec_id", vec_col="embedding",
        n_probe=1,
    )
    got = {
        r.vid: list(r.codes)
        for r in S.pq_encode_arrow(
            assigned,
            books,
            vec_col="v",
            keep=["vid", "cell_id"],
            residual_cells={
                int(cid): np.array(cv, dtype=np.float64)
                for cid, cv in cents
            },
        ).collect()
    }
    sub = assigned.join(cent.select("cell_id", "cv"), "cell_id").withColumn(
        "vres", F.zip_with("v", "cv", lambda a, b: a - b)
    )
    want = {
        r.vid: list(r.codes)
        for r in sub.select(
            "vid", S.pq_codes(F.col("vres"), books).alias("codes")
        ).collect()
    }
    assert got == want and len(got) > 0
