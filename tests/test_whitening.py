"""PCA whitening rung: trainer properties (identity covariance on
the training sample, determinism of re-runs), the engine pipeline vs
a numpy replay, and eval-table invariants."""

from __future__ import annotations

import numpy as np


def _sample(n=300, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic: a few dominant axes, like real sentence embeddings
    scales = np.linspace(3.0, 0.2, dim)
    return rng.randn(n, dim) * scales


def test_whiten_train_identity_covariance():
    from env_event_stream_spark.operators.similarity import _whiten_train

    X = _sample()
    mu, W = _whiten_train(X)
    Wm, mum = np.array(W), np.array(mu)
    Y = (X - mum) @ Wm.T
    C = (Y.T @ Y) / len(Y)
    # identity up to eps regularization + the 9dp literal rounding
    assert np.abs(C - np.eye(X.shape[1])).max() < 1e-3
    assert np.abs(Y.mean(axis=0)).max() < 1e-6


def test_whiten_train_deterministic_and_scale_equivariant():
    from env_event_stream_spark.operators.similarity import _whiten_train

    X = _sample(seed=11)
    a = _whiten_train(X)
    b = _whiten_train(X.copy())
    assert a == b  # bit-identical re-runs — the oracle contract
    # rows of W are ordered by DESCENDING eigenvalue: the first axis
    # must not be scaled UP more than the last (high variance ->
    # small whitening gain)
    Wm = np.array(a[1])
    norms = np.linalg.norm(Wm, axis=1)
    assert norms[0] < norms[-1]


def test_whiten_stats_query_matches_numpy(spark, sf_dir):
    import pyarrow.parquet as pq

    from env_event_stream_spark.ann_queries import (
        _WHITEN_CAP,
        emb_whiten_stats,
    )
    from env_event_stream_spark.operators.similarity import _whiten_train

    rows = {
        r["dim_idx"]: r for r in emb_whiten_stats(spark, sf_dir).collect()
    }
    assert len(rows) == 64
    t = pq.read_table(
        sf_dir.rstrip("/") + "/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t.column("vec_id").to_pylist())
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    X = X[np.argsort(ids, kind="stable")]
    mu, W = _whiten_train(X[:_WHITEN_CAP])
    Y = (X - np.array(mu)) @ np.array(W).T
    # micro-unit quantized moments, exactly as both engines compute
    Q = np.floor(Y * 1e6 + 0.5)
    for d in range(64):
        r = rows[d]
        n = len(Q)
        m = Q[:, d].sum() / n / 1e6
        v = (Q[:, d] ** 2).sum() / n / 1e12 - m * m
        assert abs(r["mean_white"] - np.floor(m * 1e4 + 0.5) / 1e4) < 1e-9
        assert abs(r["var_white"] - np.floor(v * 1e4 + 0.5) / 1e4) < 1e-9
        assert 0.5 < r["var_white"] < 1.5  # whitening actually whitens


def test_whiten_labelknn_eval_invariants(spark, sf_dir):
    from env_event_stream_spark.ann_queries import emb_whiten_labelknn_eval

    rows = emb_whiten_labelknn_eval(spark, sf_dir).collect()
    assert len(rows) == 50
    for r in rows:
        for c in ("hits_raw", "hits_white", "n_common"):
            assert 0 <= r[c] <= 3


def test_whiten_train_degenerate_samples_stay_finite():
    """Rank-deficient and constant samples must not produce NaN/inf:
    zero-variance directions hit the eps floor (gain 1/sqrt(eps), a
    large but FINITE scale on axes where centered data is exactly 0,
    so whitened coords stay 0), and duplicated rows (rank 1) whiten
    without blowup."""
    from env_event_stream_spark.operators.similarity import _whiten_train

    # constant sample: covariance is exactly 0
    Xc = np.full((50, 8), 3.25)
    mu, W = _whiten_train(Xc)
    Wm, mum = np.array(W), np.array(mu)
    assert np.isfinite(Wm).all() and np.isfinite(mum).all()
    Y = (Xc - mum) @ Wm.T
    assert np.abs(Y).max() == 0.0

    # rank-1 sample: one informative direction, 7 null ones
    rng = np.random.RandomState(3)
    base = rng.randn(50, 1) @ rng.randn(1, 8)
    mu, W = _whiten_train(base)
    Wm, mum = np.array(W), np.array(mu)
    assert np.isfinite(Wm).all()
    Y = (base - mum) @ Wm.T
    assert np.isfinite(Y).all()
    # the informative direction still whitens to unit-ish variance
    assert 0.5 < Y[:, 0].var() < 1.5


def test_whiten_ivf_eval_invariants(spark, sf_dir):
    # every probe query scored in both spaces; counts bounded by k=3;
    # the displayed ratios are exactly n/3 at 4dp
    from env_event_stream_spark.ann_queries import emb_whiten_ivf_eval

    rows = emb_whiten_ivf_eval(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_match_raw"] <= 3
        assert 0 <= r["n_match_white"] <= 3
        assert abs(r["recall_raw"] - round(r["n_match_raw"] / 3.0, 4)) < 1e-9
        assert (
            abs(r["recall_white"] - round(r["n_match_white"] / 3.0, 4)) < 1e-9
        )
