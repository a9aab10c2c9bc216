"""Deterministic probabilistic structures: the properties the oracle
can't state — HLL partials merge with max() to exactly the monolithic
sketch (the 100 TB distribution argument), and the Bloom prefilter
never drops a true member."""

from __future__ import annotations

import hashlib

from env_event_stream_spark.catalog import QUERIES


def _hll_buckets(uids, m=64):
    """Pure-Python replica of the query's sketch: bucket -> max rho."""
    mx: dict[int, int] = {}
    for u in uids:
        h = hashlib.md5(str(u).encode()).hexdigest()
        bucket = int(h[:2], 16) % m
        sub = h[2:17]
        stripped = sub.lstrip("0")
        if not stripped:
            rho = 61
        else:
            d = stripped[0]
            extra = 3 if d == "1" else 2 if d in "23" else 1 if d in "4567" else 0
            rho = 4 * (15 - len(stripped)) + extra + 1
        mx[bucket] = max(mx.get(bucket, 0), rho)
    return mx


def test_hll_partials_merge_to_monolith(spark, sf_dir):
    """Split the users arbitrarily in two, sketch each half, merge
    with per-bucket max — must equal the whole-corpus sketch
    exactly. This is why the estimator distributes: partitions ship
    64 integers, the combiner is max()."""
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "user_id")
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.user_id)
    for et, uids in by_type.items():
        whole = _hll_buckets(uids)
        a = _hll_buckets([u for u in uids if u % 2 == 0])
        b = _hll_buckets([u for u in uids if u % 2 == 1])
        merged: dict[int, int] = dict(a)
        for k, v in b.items():
            merged[k] = max(merged.get(k, 0), v)
        assert merged == whole, et


def test_hll_estimate_within_sketch_error(spark, sf_dir):
    """m=64 gives ~1.04/sqrt(64) = 13% standard error; require every
    per-type estimate within 4 sigma (52%) — loose enough to never
    flake, tight enough to catch a broken rho/bucket calc (which
    yields 2-10x errors, as the ltrim arg-order bug did)."""
    out = QUERIES["evt_hll_distinct_users"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert abs(r.rel_err) <= 0.52, (r.event_type, r.rel_err)
        assert abs(r.hll_est / r.n_exact - 1 - r.rel_err) < 1e-3


def test_bloom_never_false_negative(spark, sf_dir):
    row = QUERIES["join_bloom_prefilter"](spark, sf_dir).collect()[0]
    assert row.n_missed == 0
    assert row.n_bloom_pass >= row.n_members
    assert row.n_false_pos == row.n_bloom_pass - row.n_members
    # 2 hashes over <=2*|build| of 1024 bits: fp rate must stay tiny
    assert row.fp_rate <= 0.05
