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


# ---------------------------------------------------------------------------
# Count-Min sketch: properties beyond the oracle's replay — the
# overestimate guarantee holds for EVERY key (not just the top-20 the
# catalog query reports), and cell partials merge by addition.
# ---------------------------------------------------------------------------


def _cms_cells_py(keys, d=4, w=64):
    cells: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(d):
            h = hashlib.md5(f"r{r}:{k}".encode()).hexdigest()
            c = int(h[:8], 16) % w
            cells[(r, c)] = cells.get((r, c), 0) + 1
    return cells


def test_cms_overestimates_every_key(spark, sf_dir):
    """min-over-rows >= exact count for ALL keys (collisions only
    add), and at least one key must actually collide at w=64 so the
    estimate is doing real work."""
    from env_event_stream_spark.operators.sketches import (
        cms_cells,
        cms_point,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = cms_cells(ev, F.col("user_id"))
    keys = ev.select("user_id").distinct()
    est = {
        r.user_id: r.cms_est
        for r in cms_point(cells, keys, "user_id").collect()
    }
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_cells_merge_additively(spark, sf_dir):
    """Cells built from two halves sum to the whole-corpus cells —
    the mergeability that makes the sketch a streaming aggregation
    and a map-side combine."""
    rows = [
        r.user_id
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .collect()
    ]
    whole = _cms_cells_py(rows)
    a = _cms_cells_py(rows[::2])
    b = _cms_cells_py(rows[1::2])
    merged = dict(a)
    for k, v in b.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_cms_spark_cells_match_python_replica(spark, sf_dir):
    from env_event_stream_spark.operators.sketches import cms_cells
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r.r, r.col): r.cnt
        for r in cms_cells(ev, F.col("user_id")).collect()
    }
    want = _cms_cells_py([r.user_id for r in ev.select("user_id").collect()])
    assert got == want


# ---------------------------------------------------------------------------
# KMV: the merge IS "k smallest of the union", and estimates track
# truth within sketch error.
# ---------------------------------------------------------------------------


def _kmv_py(keys, k=128):
    hs = sorted(
        {int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) for x in keys}
    )
    return hs[:k]


def test_kmv_partials_merge_to_monolith(spark, sf_dir):
    rows = [
        (r.user_id, r.d)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "CAST(CAST(ts AS DATE) AS STRING) AS d")
        .collect()
    ]
    keys = [f"{u}@{d}" for u, d in rows]
    whole = _kmv_py(keys)
    merged = sorted(set(_kmv_py(keys[::2]) + _kmv_py(keys[1::2])))[:128]
    assert merged == whole


def test_kmv_estimates_within_error(spark, sf_dir):
    """KMV with k=128 has ~1/sqrt(k-1) ~ 9% standard error; require
    per-type distinct estimates within 4 sigma (36%) of exact, and
    the Jaccard estimate within 0.35 absolute of exact Jaccard."""
    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.selectExpr(
            "event_type",
            "CAST(user_id AS STRING) || '@' || "
            "CAST(CAST(ts AS DATE) AS STRING) AS key",
        )
        .groupBy("event_type")
        .agg(F.countDistinct("key").alias("n"))
        .collect()
    }
    out = QUERIES["evt_kmv_overlap"](spark, sf_dir).collect()
    assert len(out) == 10
    for row in out:
        for t, est in ((row.t1, row.est_t1), (row.t2, row.est_t2)):
            # sketches smaller than k report exact sizes
            if exact[t] >= 128:
                assert abs(est / exact[t] - 1) < 0.36, (t, est, exact[t])
            else:
                assert est == exact[t]


def test_cms_join_size_every_row_overestimates(spark, sf_dir):
    """Each hash row's inner product >= the exact join size (cross
    terms only add), so the min is still an overestimate — checked
    per row, not just on the min the catalog query reports."""
    from env_event_stream_spark.operators.sketches import cms_cells
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ca = cms_cells(
        ev.where(F.col("event_type") == "purchase"), F.col("user_id")
    ).withColumnRenamed("cnt", "ca")
    cb = cms_cells(
        ev.where(F.col("event_type") == "view"), F.col("user_id")
    ).withColumnRenamed("cnt", "cb")
    dots = {
        r.r: r.dot
        for r in ca.join(cb, ["r", "col"])
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
        .collect()
    }
    a = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("na"))
    )
    b = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count("*").alias("nb"))
    )
    exact = (
        a.join(b, "user_id")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("x"))
        .collect()[0]
        .x
    ) or 0
    assert len(dots) == 4
    assert all(d >= exact for d in dots.values())


def test_assoc_rules_counts_consistent(spark, sf_dir):
    """Pair count can't exceed either singleton basket count, support
    <= both confidences, and lift = conf_a_b / supp_b within
    rounding."""
    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    singles = {
        r.event_type: r.n
        for r in ev.selectExpr(
            "event_type", "user_id", "CAST(ts AS DATE) AS d"
        )
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["evt_assoc_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_ab <= min(singles[r.ta], singles[r.tb])
        assert r.support <= r.conf_a_b + 1e-9
        assert r.support <= r.conf_b_a + 1e-9
        assert r.lift > 0


def test_rolling_wau_register_merge_equals_week_sketch(spark, sf_dir):
    """The rolling claim: max-merging 7 daily sketches must equal
    sketching the raw 7-day window directly — per bucket, per day."""
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS DATE) AS day", "user_id")
        .collect()
    )
    days = sorted({r.day for r in rows})
    daily = {
        d: _hll_buckets([r.user_id for r in rows if r.day == d])
        for d in days
    }
    for d in days:
        week = [x for x in days if (d - x).days <= 6 and x <= d]
        merged: dict[int, int] = {}
        for x in week:
            for b, v in daily[x].items():
                merged[b] = max(merged.get(b, 0), v)
        direct = _hll_buckets(
            [r.user_id for r in rows if r.day in set(week)]
        )
        assert merged == direct, d


def test_source_keywords_scores_shrink_rare_words(spark, sf_dir):
    """Shrinkage sanity: every reported keyword must appear more than
    once in its source (a singleton can't beat the prior), and rows
    are exactly 5 per source."""
    from collections import Counter

    from env_event_stream_spark.catalog import QUERIES

    out = QUERIES["doc_source_keywords"](spark, sf_dir).collect()
    per = Counter(r.source for r in out)
    assert all(v == 5 for v in per.values())
    assert all(r.n_in_source >= 2 for r in out)
