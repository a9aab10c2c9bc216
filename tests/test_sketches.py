"""Distributed Misra-Gries heavy hitters (operators/sketches.py):
the exact-recount tail must produce bit-exact phi-heavy hitters even
when the per-partition sketches genuinely overflow (capacity far
below the vocabulary) — the regime the 16-row local tables never
reach on their own."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from env_event_stream_spark.operators import sketches as SK


def _mk_occurrences(spark, items, n_partitions=7):
    df = spark.createDataFrame([(x,) for x in items], "item string")
    return df.repartition(n_partitions)


def test_heavy_hitters_exact_under_overflow(spark):
    # skewed stream: 3 hot items among 200 rare ones; capacity 10
    # forces every partition's dict to overflow constantly
    items = (
        ["hot_a"] * 300
        + ["hot_b"] * 200
        + ["hot_c"] * 120
        + [f"rare_{i}" for i in range(200) for _ in range(2)]
    )
    occ = _mk_occurrences(spark, items)
    n = len(items)
    phi_inv = 10  # threshold n/10 = 102
    out = SK.heavy_hitters_exact(
        occ, "item", phi_inverse=phi_inv, capacity=12
    ).collect()
    true = Counter(items)
    expected = sorted(
        [(k, v) for k, v in true.items() if v * phi_inv > n],
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r["item"], r["freq"]) for r in out] == expected
    for r in out:
        assert r["ppm"] == r["freq"] * 1000000 // n


def test_heavy_hitters_exact_matches_full_groupby(spark):
    # moderately skewed zipf-ish stream, default capacity
    items = [f"w{i}" for i in range(1, 40) for _ in range(400 // i)]
    occ = _mk_occurrences(spark, items, n_partitions=5)
    out = SK.heavy_hitters_exact(occ, "item", phi_inverse=25).collect()
    exact = (
        occ.groupBy("item")
        .agg(F.count("*").alias("f"))
        .collect()
    )
    n = len(items)
    expected = sorted(
        [(r["item"], r["f"]) for r in exact if r["f"] * 25 > n],
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r["item"], r["freq"]) for r in out] == expected
    assert len(expected) > 0  # the scenario actually has heavy hitters


def test_capacity_below_guarantee_raises(spark):
    occ = _mk_occurrences(spark, ["a", "b"])
    try:
        SK.heavy_hitters_exact(occ, "item", phi_inverse=100, capacity=50)
    except ValueError as e:
        assert "superset" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")


def test_candidates_are_superset_of_heavy_hitters(spark):
    items = ["x"] * 50 + ["y"] * 30 + [f"z{i}" for i in range(60)]
    occ = _mk_occurrences(spark, items, n_partitions=3)
    cand = {
        r["item"]
        for r in SK.misra_gries_candidates(occ, "item", capacity=5).collect()
    }
    n = len(items)
    true = Counter(items)
    for k, f in true.items():
        if f * 6 > n:  # f > n/(capacity+1)
            assert k in cand
