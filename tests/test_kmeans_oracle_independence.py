"""Bit-for-bit parity between the numpy k-means trainer cores and the
INDEPENDENT pure-Python oracle twins (operators/kmeans_oracle).

VERDICT r14 task 1: the IVF/PQ/residual-PQ lazy oracles used to
verify by replaying the identical numpy cores — honest, but a trainer
bug would replicate into its own oracle. kmeans_oracle is a
from-scratch stdlib-only reimplementation of the same training
contracts; ann_queries' oracle builders now train THERE. These tests
are the agreement pin (the operators/bpe.py learn_merges vs
learn_merges_py precedent):

- real-data parity on every testdata scale the driver uses
  (sf0.001 / sf0.01 / sf0.1 samples, loaded with pyarrow exactly as
  _oracle_sample_matrix does);
- hypothesis fuzz over float matrices AND integer-valued matrices —
  integer inputs force EXACT assignment ties, so the first-max /
  first-min tie-break rules themselves are compared, not just the
  happy path;
- an end-to-end pin that the Spark-side trainer
  (S.train_ivf_centroids sample path, which is what the catalog
  queries call) matches the pure-Python twin on the test sf_dir.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from env_event_stream_spark.operators import similarity as S
from env_event_stream_spark.operators.kmeans_oracle import (
    pq_kmeans_py,
    residual_assign_py,
    spherical_kmeans_py,
)

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1"]


def _sample(sf_dir: str, cap: int = 4096) -> np.ndarray:
    """The _oracle_sample_matrix contract, inlined: cap lowest-vec_id
    embeddings as float64 in vec_id order, pyarrow only."""
    import os

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    emb = tbl["embedding"].to_pylist()
    order = np.argsort(ids, kind="stable")[:cap]
    return np.array([emb[i] for i in order], dtype=np.float64)


def _unit(vec) -> list[float]:
    n = float(sum(float(x) * float(x) for x in vec)) ** 0.5 or 1.0
    return [round(float(x) / n, 9) for x in vec]


def _spherical_np(X: np.ndarray, n_cells: int, n_iter: int):
    """The numpy spherical-k-means loop exactly as
    S.train_ivf_centroids' sample path runs it (shared _spherical_step
    core) — the OLD oracle path, kept here as the comparison arm."""
    U = np.array([_unit(x) for x in X], dtype=np.float64)
    cur = [list(u) for u in U[:n_cells]]
    for _ in range(n_iter):
        nxt = S._spherical_step(U, np.array(cur, dtype=np.float64), _unit)
        if nxt == cur:
            break
        cur = nxt
    return cur


@pytest.mark.parametrize("sf", SCALES)
def test_spherical_parity_on_testdata(sf):
    X = _sample(sf)
    Xl = [list(r) for r in X]
    # the two parameterizations the catalog actually trains with
    assert _spherical_np(X, 10, 10) == spherical_kmeans_py(Xl, 10, 10)
    assert _spherical_np(X, 8, 5) == spherical_kmeans_py(Xl, 8, 5)


@pytest.mark.parametrize("sf", SCALES)
def test_pq_parity_on_testdata(sf):
    X = _sample(sf)
    Xl = [list(r) for r in X]
    assert S._pq_kmeans(X, 8, 16, 10) == pq_kmeans_py(Xl, 8, 16, 10)


@pytest.mark.parametrize("sf", SCALES)
def test_residual_chain_parity_on_testdata(sf):
    X = _sample(sf)
    Xl = [list(r) for r in X]
    cents = list(enumerate(_spherical_np(X, 10, 10)))
    Ra = S.residual_assign(X, cents)
    Rb = residual_assign_py(Xl, cents)
    assert [list(r) for r in Ra] == Rb  # residual rows exact
    assert S._pq_kmeans(Ra, 8, 16, 10) == pq_kmeans_py(Rb, 8, 16, 10)


def test_spark_trainer_matches_pure_python_twin(spark, sf_dir):
    """End-to-end: the model the CATALOG queries train (Spark
    TakeOrdered sample -> numpy loop) equals the pure-Python oracle
    twin's model on the same parquet."""
    from env_event_stream_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    spark_cents = S.train_ivf_centroids(
        e, id_col="vec_id", vec_col="embedding",
        n_cells=10, n_iter=10, sample_cap=4096,
    )
    pure = spherical_kmeans_py([list(r) for r in _sample(sf_dir)], 10, 10)
    assert [vec for _, vec in spark_cents] == pure


# --- fuzz: tie-break and empty-cell rules, not just the happy path --

_float_row = st.lists(
    st.floats(min_value=-4, max_value=4, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=8, max_size=8,
)
# small-integer rows force exact dot/distance ties across rows and
# duplicated centroids — the argmax/argmin tie-break comparison
_int_row = st.lists(st.integers(min_value=-2, max_value=2),
                    min_size=8, max_size=8)


@settings(max_examples=40, deadline=None)
@given(st.lists(_float_row, min_size=4, max_size=24))
def test_spherical_parity_fuzz_float(rows):
    X = np.array(rows, dtype=np.float64)
    assert _spherical_np(X, 3, 6) == spherical_kmeans_py(rows, 3, 6)


@settings(max_examples=40, deadline=None)
@given(st.lists(_int_row, min_size=4, max_size=24))
def test_spherical_parity_fuzz_ties(rows):
    rows = [[float(x) for x in r] for r in rows]
    X = np.array(rows, dtype=np.float64)
    assert _spherical_np(X, 3, 6) == spherical_kmeans_py(rows, 3, 6)


@settings(max_examples=40, deadline=None)
@given(st.lists(_float_row, min_size=4, max_size=24))
def test_pq_parity_fuzz_float(rows):
    X = np.array(rows, dtype=np.float64)
    assert S._pq_kmeans(X, 2, 3, 6) == pq_kmeans_py(rows, 2, 3, 6)


@settings(max_examples=40, deadline=None)
@given(st.lists(_int_row, min_size=4, max_size=24))
def test_pq_parity_fuzz_ties(rows):
    rows = [[float(x) for x in r] for r in rows]
    X = np.array(rows, dtype=np.float64)
    assert S._pq_kmeans(X, 2, 3, 6) == pq_kmeans_py(rows, 2, 3, 6)


@settings(max_examples=40, deadline=None)
@given(st.lists(_int_row, min_size=4, max_size=16))
def test_residual_parity_fuzz_ties(rows):
    rows = [[float(x) for x in r] for r in rows]
    X = np.array(rows, dtype=np.float64)
    cents = list(enumerate(_spherical_np(X, 3, 4)))
    Ra = S.residual_assign(X, cents)
    assert [list(r) for r in Ra] == residual_assign_py(rows, cents)


def test_zero_vector_cell_keeps_previous_centroid():
    """The sums[c].any() empty-cell rule: a cell assigned ONLY the
    zero vector (unit-normalizes to all zeros) must keep its previous
    centroid in both trainers."""
    rows = [[0.0] * 8, [1.0] + [0.0] * 7, [0.0, 1.0] + [0.0] * 6]
    X = np.array(rows, dtype=np.float64)
    assert _spherical_np(X, 2, 4) == spherical_kmeans_py(rows, 2, 4)


# --- r16 regression: blocked-gemm duplicate-centroid ulp divergence -


def _dup_centroid_case(rng, n, d, k, lo, hi):
    """Unit rows with centroid column ``hi`` a bit-identical copy of
    the earlier column ``lo`` — the construction whose blocked-gemm
    scores can differ by 1 ulp between the two identical columns."""
    U = rng.standard_normal((n, d))
    nrm = np.linalg.norm(U, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    U = U / nrm
    C = U[:k].copy()
    C[hi] = C[lo]
    return U, C


def test_duplicate_centroids_never_win_argmax():
    """ADVICE r15 (high): `np.argmax(U @ C.T)` — a single blocked
    gemm — can score two BIT-IDENTICAL centroid columns 1 ulp apart
    when they straddle a BLAS kernel block boundary, so argmax picks
    the LATER duplicate while the pure twin's strict first-max fold
    keeps the earlier one. _cosine_assign fixes this with one gemv per
    centroid (identical op stream for identical centroids), so the
    fixed path must NEVER return the later duplicate ``hi`` (hi's
    column is bit-identical to lo's, and lo comes first). The
    CONTRACT — first-duplicate wins — holds on every BLAS build; the
    tripwire proving the old path actually diverges lives in
    test_gemm_divergence_tripwire (it depends on the build's kernel
    dispatch and skips where unobservable)."""
    cases = [(0, 42, 8, 5, 0, 4), (0, 42, 8, 11, 2, 10),
             (0, 42, 24, 11, 2, 10), (1, 42, 31, 15, 2, 14),
             (2, 42, 12, 5, 2, 4), (2, 42, 16, 11, 0, 10)]
    for seed, n, d, k, lo, hi in cases:
        rng = np.random.default_rng((seed, n, d, k, lo, hi))
        U, C = _dup_centroid_case(rng, n, d, k, lo, hi)
        a = S._cosine_assign(U, C)
        assert not np.any(a == hi), (seed, n, d, k, lo, hi)


def test_gemm_divergence_tripwire():
    """Teeth for the test above: hunt THIS BLAS build for a case where
    the old `np.argmax(U @ C.T)` path picks the later bit-identical
    duplicate, and pin that _cosine_assign does not. Whether any such
    case exists depends on the build's gemm kernel dispatch (the r16
    session-1 VM exhibited it on six hand-picked cases; the session-3
    VM — a different CPU — diverged on none of them, exactly the
    environment-drift triage ADVICE r15 documented), so an unobservable
    divergence is a loud SKIP, not a red tree: the contract test keeps
    asserting the first-max rule regardless."""
    rng = np.random.default_rng(20260818)
    for _ in range(600):
        n = int(rng.integers(16, 64))
        d = int(rng.integers(4, 48))
        k = int(rng.integers(4, 17))
        k = min(k, n)
        lo = int(rng.integers(0, k - 1))
        hi = int(rng.integers(lo + 1, k))
        U, C = _dup_centroid_case(rng, n, d, k, lo, hi)
        if np.any(np.argmax(U @ C.T, axis=1) == hi):
            a = S._cosine_assign(U, C)
            assert not np.any(a == hi), (n, d, k, lo, hi)
            return  # divergence reproduced AND the fix held on it
    pytest.skip(
        "no blocked-gemm duplicate-column ulp divergence observable on "
        "this BLAS build after 600 probes — the old-path tripwire is "
        "vacuous here (contract still asserted by the test above)"
    )


def test_spherical_near_tie_regression():
    """r16 session-4 fuzz catch: with gemv scoring, row 6's dot
    against centroid 1 came out 1 ulp HIGHER than the sequential
    fold's value (-0x1.6ce6932b985e7p-4 vs ...e8p-4), tying it with
    centroid 2 in the numpy engine only — argmax kept cell 1 while
    the twin's strict first-max fold moved to cell 2, and the trained
    centroids diverged. _cosine_assign now accumulates per dimension
    (bit-identical to kmeans_oracle._dot), so near-ties resolve
    identically by construction. This is the exact falsifying
    matrix."""
    rows = [[0, 0, 0, 0, 1, 0, 0, 0],
            [0, 2, -1, 1, 2, 0, 0, 2],
            [0, 0, 0, 1, 1, 2, 2, 2],
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, -2, 1, -2, 0, 0, 0]]
    rows = [[float(x) for x in r] for r in rows]
    X = np.array(rows, dtype=np.float64)
    assert _spherical_np(X, 3, 6) == spherical_kmeans_py(rows, 3, 6)


_int_row16 = st.lists(st.integers(min_value=-2, max_value=2),
                      min_size=16, max_size=16)


@settings(max_examples=40, deadline=None)
@given(st.lists(_int_row16, min_size=4, max_size=20))
def test_pq_parity_fuzz_d8_subspaces(rows):
    """d = 8 subvectors (the CATALOG shape: dim 64 / m 8) — the width
    where numpy's reduce switches to its 8-accumulator unrolled
    association, which the d=4 fuzz above never probes. _pq_kmeans
    now accumulates distances per dimension and sums rows via
    np.add.at (index order), so this must agree bit-for-bit."""
    rows = [[float(x) for x in r] for r in rows]
    X = np.array(rows, dtype=np.float64)
    assert S._pq_kmeans(X, 2, 3, 6) == pq_kmeans_py(rows, 2, 3, 6)


def test_spherical_parity_float_duplicate_seeds():
    """Deterministic float matrices whose first n_cells rows contain
    exact duplicates — the construction the r15 fuzz suite used to
    falsify the gemm path. Both trainers must now agree bit-for-bit."""
    rng = np.random.default_rng(7)
    for n, d, k in [(24, 8, 5), (42, 12, 15), (30, 16, 8)]:
        X = rng.standard_normal((n, d))
        X[1] = X[0]          # duplicate inside the seed window
        X[k - 1] = X[2]      # and another straddling pair
        rows = [list(r) for r in X]
        assert _spherical_np(X, k, 6) == spherical_kmeans_py(rows, k, 6)


def test_non_finite_sample_fails_loud():
    """ADVICE r15 (low): NaN scores rank as argmax in numpy but keep
    index 0 in the pure twin's strict fold — both trainer entries must
    reject non-finite input instead of silently diverging."""
    rows = [[1.0] * 8, [float("nan")] + [0.0] * 7, [0.5] * 8]
    X = np.array(rows, dtype=np.float64)
    with pytest.raises(ValueError, match="finite"):
        spherical_kmeans_py(rows, 2, 3)
    with pytest.raises(ValueError, match="finite"):
        pq_kmeans_py(rows, 2, 2, 3)
    with pytest.raises(ValueError, match="finite"):
        residual_assign_py(rows, [(0, [1.0] * 8)])
    with pytest.raises(ValueError, match="finite"):
        S._cosine_assign(X, X[:2])
