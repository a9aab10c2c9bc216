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
