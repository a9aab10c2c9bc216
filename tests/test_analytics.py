"""Event-analytics semantics on crafted edge cases: the strict-
sequence funnel's ordering contract (same-ts ties must not advance a
stage; a purchase before the qualifying click must not count), checked
on BOTH implementations — the batch windowed-min query shape and the
streaming fold state machine — which the sf-data oracle equality
already ties together, but only on data without adversarial ties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from env_event_stream_spark.streaming_queries import fold_funnel, init_funnel


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# (user_id, ts, event_id, event_type) — crafted:
# user 1: click at the SAME ts as first view (strict > ⇒ no stage 2),
#         later click qualifies; purchase BEFORE that click (no stage
#         3), later purchase qualifies.
# user 2: click precedes any view — first-touch would convert, the
#         strict sequence must not (no click AFTER the view).
# user 3: view only.
EVENTS = [
    (1, _ts("2024-01-01 10:00:00"), 1, "view"),
    (1, _ts("2024-01-01 10:00:00"), 2, "click"),
    (1, _ts("2024-01-01 10:30:00"), 3, "purchase"),
    (1, _ts("2024-01-01 11:00:00"), 4, "click"),
    (1, _ts("2024-01-01 12:00:00"), 5, "purchase"),
    (2, _ts("2024-01-02 09:00:00"), 6, "click"),
    (2, _ts("2024-01-02 10:00:00"), 7, "view"),
    (3, _ts("2024-01-03 08:00:00"), 8, "view"),
]

EXPECTED = {
    1: (
        _ts("2024-01-01 10:00:00"),
        _ts("2024-01-01 11:00:00"),
        _ts("2024-01-01 12:00:00"),
    ),
    2: (_ts("2024-01-02 10:00:00"), None, None),
    3: (_ts("2024-01-03 08:00:00"), None, None),
}


def test_fold_funnel_state_machine():
    got = {}
    for uid in (1, 2, 3):
        s = init_funnel()
        for u, ts, eid, et in sorted(EVENTS, key=lambda e: (e[1], e[2])):
            if u == uid:
                s = fold_funnel(s, {"ts": ts, "event_type": et})
        got[uid] = (s["t_view"], s["t_click"], s["t_purchase"])
    assert got == EXPECTED


def test_batch_funnel_windows_match_state_machine(spark):
    df = spark.createDataFrame(
        EVENTS, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id")
    s = (
        df.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    rows = (
        s.groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
        .collect()
    )
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in rows}
    assert got == EXPECTED


def test_lazy_oracles_degrade_gracefully(monkeypatch):
    """A lazy oracle that cannot build (e.g. its training parquet is
    missing) must be OMITTED from oracle_sql() — degrading that query
    to the driver's rows-only check — never raise and take down the
    whole oracle map."""
    import __spark_entry__ as E

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent/dir")
    os_map = E.oracle_sql()
    # static oracles survive; the trained-model lazies drop out
    assert "evt_replay" in os_map
    for lazy in ("emb_knn_ivf_trained", "emb_quantize_pq", "emb_knn_pq_adc",
                 "emb_pq_recall_eval"):
        assert lazy not in os_map, lazy


def test_fold_funnel_matches_declarative_spec_fuzz():
    """Random event sequences: the sequential fold must equal the
    declarative spec (t1 = min view ts; t2 = min click ts > t1;
    t3 = min purchase ts > t2) for every input, including duplicate
    timestamps across types."""
    import random

    rnd = random.Random(20260813)
    types = ["view", "click", "purchase", "signup", "error"]
    for _ in range(300):
        n = rnd.randint(0, 12)
        # coarse ts grid to force plenty of duplicate timestamps
        evs = sorted(
            ((rnd.randint(0, 5), i, rnd.choice(types)) for i in range(n)),
            key=lambda e: (e[0], e[1]),
        )
        s = init_funnel()
        for ts, _eid, et in evs:
            s = fold_funnel(s, {"ts": ts, "event_type": et})

        t1 = min((ts for ts, _, et in evs if et == "view"), default=None)
        t2 = (
            min(
                (ts for ts, _, et in evs if et == "click" and ts > t1),
                default=None,
            )
            if t1 is not None
            else None
        )
        t3 = (
            min(
                (ts for ts, _, et in evs if et == "purchase" and ts > t2),
                default=None,
            )
            if t2 is not None
            else None
        )
        assert (s["t_view"], s["t_click"], s["t_purchase"]) == (t1, t2, t3), evs


def test_pagerank_mass_conserved_and_deterministic(spark, sf_dir):
    """Integer PageRank: total rank mass stays within the integer-
    division rounding loss of one unit (each node's DIV discards
    < odeg micro-units per iteration; the damping DIV < 100 more),
    re-runs are bit-identical, and every rank is positive."""
    from env_event_stream_spark.catalog import QUERIES

    r1 = QUERIES["graph_pagerank_custsupp"](spark, sf_dir).collect()
    r2 = QUERIES["graph_pagerank_custsupp"](spark, sf_dir).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert all(r.rank_units > 0 for r in r1)
    assert [r.pos for r in sorted(r1, key=lambda r: r.pos)] == list(
        range(1, 21)
    )
    # rank follows (damped) degree on this near-regular graph: the
    # top node must be a hub (degree above the median)
    degs = sorted(r.odeg for r in r1)
    top = min(r1, key=lambda r: r.pos)
    assert top.odeg >= degs[len(degs) // 2]


def test_rolling_hist_p95_window_mass_and_bounds(spark, sf_dir):
    """n_7d must equal the true event count of each 7-day window,
    and the estimate must stay inside the type's [vmin, vmax]."""
    import datetime as dt2

    from env_event_stream_spark.catalog import QUERIES

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.to_date("ts").alias("d"), "value"
    )
    rows = ev.collect()
    base = dt2.date(2024, 1, 1)
    per_type: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(
            ((r.d - base).days, r.value)
        )
    out = QUERIES["evt_rolling_p95_hist_by_type"](spark, sf_dir).collect()
    assert out
    for r in out:
        pts = per_type[r.event_type]
        in_win = [v for (dd, v) in pts if r.day_idx - 6 <= dd <= r.day_idx]
        assert r.n_7d == len(in_win), (r.event_type, r.day_idx)
        lo = min(v for _, v in pts)
        hi = max(v for _, v in pts)
        assert lo - 1e-9 <= r.p95_7d_hist <= hi + 1e-9


def test_linear_attribution_conserves_revenue_to_the_cent(spark, sf_dir):
    """Credit conservation: channel revenues must sum to EXACTLY the
    total purchase revenue (integer cents end-to-end — remainder
    cents assigned to earliest touches, never lost)."""
    from decimal import Decimal

    from env_event_stream_spark.catalog import QUERIES

    rows = QUERIES["evt_attribution_linear"](spark, sf_dir).collect()
    got = sum(Decimal(str(r.revenue)).quantize(Decimal("0.01")) for r in rows)
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "purchase")
        .select(F.sum(F.col("value").cast("decimal(12,2)")).alias("t"))
        .collect()[0]
        .t
    )
    assert got == want, (got, want)


def test_growth_curve_monotone_and_consistent(spark, sf_dir):
    from env_event_stream_spark.catalog import QUERIES

    rows = sorted(
        QUERIES["evt_user_growth_curve"](spark, sf_dir).collect(),
        key=lambda r: r.day_idx,
    )
    assert rows
    cum = 0
    for r in rows:
        cum += r.n_new_users
        assert r.cum_users == cum
        assert r.n_active <= r.cum_users  # can't be active before first seen
    total_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1].cum_users == total_users


def test_chi2_identity_matches_naive_formula(spark, sf_dir):
    """The order-independent 24*S2/n - n collapse must equal the
    textbook sum over all 24 cells (zero-count hours included),
    computed in Python where summation order is controlled."""
    from collections import Counter

    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", F.hour("ts").alias("hr"))
        .collect()
    )
    by_type: dict[str, Counter] = {}
    for r in rows:
        by_type.setdefault(r.event_type, Counter())[r.hr] += 1
    out = {
        r.event_type: r
        for r in QUERIES["evt_hourly_seasonality"](spark, sf_dir).collect()
    }
    import math

    for et, cnt in by_type.items():
        n = sum(cnt.values())
        e = n / 24.0
        naive = math.fsum((cnt.get(hh, 0) - e) ** 2 / e for hh in range(24))
        got = out[et].chi2_uniform  # 4dp-rounded by the query
        assert abs(got - math.floor(naive * 10000 + 0.5) / 10000) < 1e-9, (
            et, got, naive,
        )
        assert out[et].n == n


def test_ks_statistic_matches_scipy_style_reference(spark, sf_dir):
    """The integer-exact ECDF-gap max must equal the textbook
    two-sample KS statistic computed directly from sorted samples in
    Python (ties included)."""
    from env_event_stream_spark.catalog import QUERIES
    import datetime as dt

    # Compare INSTANTS: collect epoch micros, not TimestampType —
    # collect() renders TimestampType in the CLIENT's local timezone,
    # which made this reference implementation (and only it, not the
    # engine) fail under the TZ=America/New_York invariance run.
    cutoff = int(
        dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type", "value", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts"
        )
        .collect()
    )
    out = {
        r.event_type: r
        for r in QUERIES["evt_value_drift_ks"](spark, sf_dir).collect()
    }
    import math

    for et in out:
        a = sorted(r.value for r in rows if r.event_type == et and r.ts < cutoff and r.value is not None)
        b = sorted(r.value for r in rows if r.event_type == et and r.ts >= cutoff and r.value is not None)
        pts = sorted(set(a) | set(b))
        import bisect

        d = max(
            abs(
                bisect.bisect_right(a, v) / len(a)
                - bisect.bisect_right(b, v) / len(b)
            )
            for v in pts
        )
        got = out[et].ks_stat
        assert abs(got - math.floor(d * 10000 + 0.5) / 10000) <= 1e-4, (
            et, got, d,
        )
        assert out[et].n_early == len(a) and out[et].n_late == len(b)


def test_acf_matches_integer_reference_and_planted_cycle(spark, sf_dir):
    """acf_milli must equal the exact integer-arithmetic sample ACF
    computed in Python over the zero-filled daily series; and on a
    planted period-7 series the lag-7 coefficient must dominate all
    shorter lags (the diagnostic's whole purpose)."""
    from collections import Counter

    from env_event_stream_spark.forecast_queries import acf_finalize_daily
    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
        )
        .collect()
    )
    series: dict[str, Counter] = {}
    for r in rows:
        series.setdefault(r.event_type, Counter())[r.day] += 1
    got = {
        (r.event_type, r.lag_k): (r.acf_milli, r.n_days)
        for r in QUERIES["evt_acf_daily"](spark, sf_dir).collect()
    }
    for et, cnt in series.items():
        lo, hi = min(cnt), max(cnt)
        xs = [cnt.get(d, 0) for d in range(lo, hi + 1)]
        n, s = len(xs), sum(xs)
        c = [n * x - s for x in xs]
        den = sum(v * v for v in c)
        for k in range(1, 8):
            if k >= n:
                assert (et, k) not in got
                continue
            num = sum(c[i] * c[i + k] for i in range(n - k))
            if den == 0:
                want = None
            elif num >= 0:
                want = (1000 * num) // den
            else:
                want = -((1000 * -num) // den)
            assert got[(et, k)] == (want, n), (et, k, got[(et, k)], want)

    # planted weekly cycle: 42 days of [100,0,0,0,0,0,0] repeating
    planted = spark.createDataFrame(
        [("x", d, 100 if d % 7 == 0 else 1) for d in range(42)],
        "event_type string, day_idx long, cnt long",
    )
    out = {
        r.lag_k: r.acf_milli
        for r in acf_finalize_daily(planted).collect()
    }
    assert out[7] > 800
    assert all(out[k] < out[7] - 500 for k in range(1, 7))


def test_spearman_matches_fraction_reference(spark, sf_dir):
    """rho must equal Pearson-over-average-ranks computed exactly in
    Python (fractions for the sums, one float sqrt at the end)."""
    import math
    from collections import Counter

    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
        )
        .collect()
    )
    series: dict[str, Counter] = {}
    days = []
    for r in rows:
        series.setdefault(r.event_type, Counter())[r.day] += 1
        days.append(r.day)
    lo, hi = min(days), max(days)

    def doubled_ranks(xs):
        byv = Counter(xs)
        cum, dr = 0, {}
        for v in sorted(byv):
            m = byv[v]
            dr[v] = 2 * cum + m + 1
            cum += m
        return [dr[x] for x in xs]

    got = {
        (r.type_a, r.type_b): r.rho
        for r in QUERIES["evt_spearman_daily"](spark, sf_dir).collect()
    }
    types = sorted(series)
    for i, ta in enumerate(types):
        xa = [series[ta].get(d, 0) for d in range(lo, hi + 1)]
        ra = doubled_ranks(xa)
        for tb in types[i + 1:]:
            xb = [series[tb].get(d, 0) for d in range(lo, hi + 1)]
            rb = doubled_ranks(xb)
            n = len(ra)
            sa, sb = sum(ra), sum(rb)
            saa = sum(v * v for v in ra)
            sbb = sum(v * v for v in rb)
            sab = sum(a * b for a, b in zip(ra, rb))
            da, db = n * saa - sa * sa, n * sbb - sb * sb
            if da == 0 or db == 0:
                assert got[(ta, tb)] is None
                continue
            rho = (n * sab - sa * sb) / math.sqrt(float(da) * float(db))
            want = math.floor(rho * 10000 + 0.5) / 10000
            assert abs(got[(ta, tb)] - want) < 1e-12, (ta, tb)


def test_mannwhitney_matches_direct_reference(spark, sf_dir):
    """U (doubled) and the tie-corrected z must equal a direct
    textbook rank-sum computation in Python over the same rows."""
    import math
    from collections import Counter

    from env_event_stream_spark.catalog import QUERIES

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    byv = Counter(r.value for r in rows)
    cum, dr = 0, {}
    for v in sorted(byv):
        m = byv[v]
        dr[v] = 2 * cum + m + 1
        cum += m
    n = len(rows)
    ties = sum(m**3 - m for m in byv.values())
    got = {
        r.event_type: r
        for r in QUERIES["evt_mannwhitney_shift"](spark, sf_dir).collect()
    }
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(r.value)
    for et, vals in groups.items():
        n1 = len(vals)
        r1d = sum(dr[v] for v in vals)
        ud = r1d - n1 * (n1 + 1)
        g = got[et]
        assert g.u_doubled == ud and g.n1 == n1 and g.n2 == n - n1
        if n1 == 0 or n1 == n or n < 2 or ties == n**3 - n:
            assert g.z is None
            continue
        var = n1 * (n - n1) / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
        z = (ud - n1 * (n - n1)) / (2.0 * math.sqrt(var))
        want = math.floor(z * 10000 + 0.5) / 10000
        assert abs(g.z - want) < 1e-12, (et, g.z, want)
        assert g.shifted == (abs(want) > 1.96)


def test_key_skew_matches_counter_reference(spark, sf_dir):
    """The two events edges must match a direct Counter recompute —
    shares, hot-key threshold, and the lexicographic-min top key."""
    from collections import Counter

    from env_event_stream_spark.catalog import QUERIES

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .collect()
    )
    got = {
        r.edge: r for r in QUERIES["dq_key_skew"](spark, sf_dir).collect()
    }
    assert len(got) == 6
    for edge, vals in (
        ("events.user_id", [str(r.user_id) for r in rows]),
        ("events.event_type", [r.event_type for r in rows]),
    ):
        c = Counter(vals)
        n_rows, n_keys = len(vals), len(c)
        top_cnt = max(c.values())
        top_key = min(k for k, v in c.items() if v == top_cnt)
        thr = (100 * n_rows) // n_keys
        hot = {k: v for k, v in c.items() if v > thr}
        g = got[edge]
        assert (g.n_rows, g.n_keys, g.top_cnt, g.top_key) == (
            n_rows, n_keys, top_cnt, top_key,
        )
        assert g.top_share_ppm == (top_cnt * 1000000) // n_rows
        assert g.skew_milli == (top_cnt * 1000 * n_keys) // n_rows
        assert g.hot_keys == len(hot)
        assert g.hot_share_ppm == (sum(hot.values()) * 1000000) // n_rows
    # the grouping-key edge is maximally skew-benign in key count
    assert got["events.event_type"].n_keys < got["events.user_id"].n_keys


def test_compaction_plan_conserves_bytes_and_stays_in_order(spark, sf_dir):
    """Byte/event conservation vs a direct recompute, in-order
    contiguity of each bin's segments, and monotone day spans."""
    from collections import defaultdict

    from env_event_stream_spark.catalog import QUERIES
    from env_event_stream_spark.advanced_queries import (
        _COMPACTION_TARGET,
    )
    from pyspark.sql import functions as F

    seg = defaultdict(lambda: [0, 0])
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
            F.coalesce(F.length("props"), F.lit(0)).alias("plen"),
        )
        .collect()
    ):
        s = seg[(r.day, r.event_type)]
        s[0] += 48 + r.plen
        s[1] += 1
    order = sorted(seg)
    # replay the cumulative binning
    cum, want = 0, defaultdict(lambda: [0, 0, 0, []])
    for key in order:
        b, n = seg[key]
        bin_id = cum // _COMPACTION_TARGET
        w = want[bin_id]
        w[0] += 1
        w[1] += n
        w[2] += b
        w[3].append(key[0])
        cum += b
    out = QUERIES["evt_compaction_plan"](spark, sf_dir).collect()
    assert sum(r.bin_bytes for r in out) == cum
    assert {r.bin_id for r in out} == set(want)
    prev_last = None
    for r in sorted(out, key=lambda r: r.bin_id):
        wb = want[r.bin_id]
        assert (r.n_segments, r.n_events, r.bin_bytes) == (
            wb[0], wb[1], wb[2],
        )
        assert r.first_day == min(wb[3]) and r.last_day == max(wb[3])
        assert r.fill_milli == (r.bin_bytes * 1000) // _COMPACTION_TARGET
        if prev_last is not None:
            assert r.first_day >= prev_last  # time-clustered packing
        prev_last = r.last_day


def test_zorder_pruning_eval_matches_python_replay(spark, sf_dir):
    """Full replay: interleave bits in Python, sort both layouts,
    chunk into 64 files, min/max stats, overlap counts — every cell
    of the eval must match."""
    from env_event_stream_spark.analytics_queries import (
        _ZP_FILES,
        _ZP_PROBES,
    )
    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
        )
        .collect()
    )

    def zkey(u, d):
        u = max(0, min(u, 65535))
        d = max(0, min(d, 65535))
        z = 0
        for x in range(16):
            z |= ((u >> x) & 1) << (2 * x)
            z |= ((d >> x) & 1) << (2 * x + 1)
        return z

    pts = [(r.user_id, r.day, r.event_id) for r in rows]
    n = len(pts)
    rpf = (n + _ZP_FILES - 1) // _ZP_FILES

    def stats(order):
        out = {}
        for i, (u, d, _e) in enumerate(order):
            f = i // rpf
            s = out.setdefault(f, [u, u, d, d])
            s[0] = min(s[0], u)
            s[1] = max(s[1], u)
            s[2] = min(s[2], d)
            s[3] = max(s[3], d)
        return out

    lin = stats(sorted(pts, key=lambda p: (p[0], p[2])))
    zo = stats(
        sorted(pts, key=lambda p: (zkey(p[0], p[1]), p[2]))
    )

    def touched(st, ul, uh, dl, dh):
        c = 0
        for umin, umax, dmin, dmax in st.values():
            if ul is not None and umax < ul:
                continue
            if uh is not None and umin > uh:
                continue
            if dl is not None and dmax < dl:
                continue
            if dh is not None and dmin > dh:
                continue
            c += 1
        return c

    got = {
        r.probe: r
        for r in QUERIES["evt_zorder_pruning_eval"](
            spark, sf_dir
        ).collect()
    }
    assert len(got) == len(_ZP_PROBES)
    for p, ul, uh, dl, dh in _ZP_PROBES:
        b = [None if v == "NULL" else int(v) for v in (ul, uh, dl, dh)]
        g = got[p]
        assert g.files_total == len(lin)
        assert g.files_linear == touched(lin, *b), p
        assert g.files_zorder == touched(zo, *b), p


def test_label_propagation_matches_python_replay(spark, sf_dir):
    """Full independent replay of the synchronous LPA rounds over the
    same co-purchase edge list the engine used."""
    from collections import Counter, defaultdict

    from env_event_stream_spark.advanced_queries import (
        _copurchase_edges,
        _LPA_ITERS,
    )
    from env_event_stream_spark.catalog import QUERIES

    edges = [
        (r.x, r.y) for r in _copurchase_edges(spark, sf_dir).collect()
    ]
    adj = defaultdict(list)
    for x, y in edges:
        adj[x].append(y)
        adj[y].append(x)
    lbl = {v: v for v in adj}
    for _ in range(_LPA_ITERS):
        new = {}
        for v, us in adj.items():
            c = Counter(lbl[u] for u in us)
            new[v] = min(
                c, key=lambda k: (-c[k], k)
            )  # count desc, label asc
        lbl = new
    want = defaultdict(lambda: [0, 0, None])
    for v, c in lbl.items():
        w = want[c]
        w[0] += 1
        w[1] += v
        w[2] = v if w[2] is None else min(w[2], v)
    got = {
        r.community: (r.n_members, r.members_sum, r.min_member)
        for r in QUERIES["graph_label_propagation"](
            spark, sf_dir
        ).collect()
    }
    assert got == {c: tuple(w) for c, w in want.items()}


def test_top_paths_matches_counter_reference(spark, sf_dir):
    """Top-20 path table vs a direct Counter recompute over the same
    (ts, event_id)-ordered initials sequences."""
    from collections import Counter, defaultdict

    from env_event_stream_spark.analytics_queries import (
        _PATH_PREFIX,
        _PATH_TOPK,
    )
    from env_event_stream_spark.catalog import QUERIES

    ini = {"view": "v", "click": "c", "purchase": "p",
           "error": "e", "signup": "s"}
    byday = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id", "CAST(CAST(ts AS DATE) AS STRING) AS day",
            "ts", "event_id", "event_type",
        )
        .collect()
    ):
        byday[(r.user_id, r.day)].append(
            (r.ts, r.event_id, ini.get(r.event_type, "x"))
        )
    cnt, full = Counter(), Counter()
    for evs in byday.values():
        seq = "".join(c for _, _, c in sorted(evs))
        path = seq[:_PATH_PREFIX]
        cnt[path] += 1
        if len(seq) >= _PATH_PREFIX:
            full[path] += 1
    want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:_PATH_TOPK]
    got = [
        (r.path, r.n_user_days, r.n_full_length)
        for r in QUERIES["evt_top_paths"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(
        (p, n, full.get(p, 0)) for p, n in want
    )


def test_link_prediction_matches_python_replay(spark, sf_dir):
    """Top-20 non-edge Jaccard table vs a direct replay over the
    engine's own edge list."""
    from collections import defaultdict

    from env_event_stream_spark.advanced_queries import (
        _copurchase_edges,
        _LP_TOPK,
    )
    from env_event_stream_spark.catalog import QUERIES

    edges = {
        (r.x, r.y) for r in _copurchase_edges(spark, sf_dir).collect()
    }
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    cand = defaultdict(int)
    for z, ns in adj.items():
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                cand[(a, b)] += 1
    rows = [
        (
            (c * 1000000) // (len(adj[x]) + len(adj[y]) - c),
            x, y, c, len(adj[x]), len(adj[y]),
        )
        for (x, y), c in cand.items()
        if (x, y) not in edges
    ]
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [
        (x, y, c, dx, dy, j) for j, x, y, c, dx, dy in rows[:_LP_TOPK]
    ]
    got = [
        (r.x, r.y, r.common_n, r.deg_x, r.deg_y, r.jaccard_ppm)
        for r in QUERIES["graph_link_prediction"](
            spark, sf_dir
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_seq_pair_support_matches_python_replay(spark, sf_dir):
    """Every (a-before-b) day count vs a direct per-user-day replay
    with the exists-precedence semantics."""
    from collections import Counter, defaultdict

    from env_event_stream_spark.catalog import QUERIES

    byday = defaultdict(lambda: defaultdict(list))
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day", "ts",
                    "event_type")
        .collect()
    ):
        byday[(r.user_id, r.day)][r.event_type].append(r.ts)
    n_days = len(byday)
    per_type = Counter()
    pair = Counter()
    for types in byday.values():
        for t in types:
            per_type[t] += 1
        for a, ats in types.items():
            for b, bts in types.items():
                if a != b and min(ats) < max(bts):
                    pair[(a, b)] += 1
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["evt_seq_pair_support"](spark, sf_dir).collect()
    }
    assert set(got) == set(pair)
    for (a, b), c in pair.items():
        g = got[(a, b)]
        assert g.n_days_ab == c
        assert g.n_days_a == per_type[a] and g.n_days_b == per_type[b]
        assert g.support_ppm == (c * 1000000) // n_days
        assert g.lift_milli == (c * n_days * 1000) // (
            per_type[a] * per_type[b]
        )


def test_acf_finalize_fuzz_random_series(spark):
    """Random gapped integer series: acf_finalize_daily must equal
    the exact integer reference for every (type, lag) — beyond the
    fixed sf data (gaps exercise the zero-fill)."""
    import random

    from env_event_stream_spark.forecast_queries import acf_finalize_daily

    rnd = random.Random(20260815)
    rows = []
    series = {}
    for t in range(4):
        et = f"t{t}"
        days = sorted(rnd.sample(range(0, 40), rnd.randint(2, 25)))
        series[et] = {d: rnd.randint(1, 500) for d in days}
        rows.extend((et, d, c) for d, c in series[et].items())
    df = spark.createDataFrame(
        rows, "event_type string, day_idx long, cnt long"
    )
    got = {
        (r.event_type, r.lag_k): r.acf_milli
        for r in acf_finalize_daily(df).collect()
    }
    for et, cnt in series.items():
        lo, hi = min(cnt), max(cnt)
        xs = [cnt.get(d, 0) for d in range(lo, hi + 1)]
        n, s = len(xs), sum(xs)
        c = [n * x - s for x in xs]
        den = sum(v * v for v in c)
        for k in range(1, 8):
            if k >= n:
                assert (et, k) not in got
                continue
            num = sum(c[i] * c[i + k] for i in range(n - k))
            if den == 0:
                want = None
            elif num >= 0:
                want = (1000 * num) // den
            else:
                want = -((1000 * -num) // den)
            assert got[(et, k)] == want, (et, k)


def test_lpa_fuzz_random_graphs(spark, sf_dir):
    """Random small graphs through the same LPA loop the catalog
    query uses (sync rounds, count-desc/label-asc tie-break): the
    Spark loop must equal the python replay on every graph."""
    import random
    from collections import Counter, defaultdict

    from env_event_stream_spark.advanced_queries import _LPA_ITERS
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rnd = random.Random(20260815)
    for trial in range(3):
        n = rnd.randint(5, 14)
        edges = set()
        for _ in range(rnd.randint(n, 3 * n)):
            a, b = rnd.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        e = spark.createDataFrame(sorted(edges), "x long, y long")
        adj_df = e.select(
            F.col("x").alias("v"), F.col("y").alias("u")
        ).unionByName(
            e.select(F.col("y").alias("v"), F.col("x").alias("u"))
        )
        lbl = adj_df.select("v").distinct().withColumn("lbl", F.col("v"))
        wv = Window.partitionBy("v").orderBy(
            F.col("c").desc(), F.col("lbl").asc()
        )
        for _ in range(_LPA_ITERS):
            cnt = (
                adj_df.join(
                    lbl.select(F.col("v").alias("u"), "lbl"), "u"
                )
                .groupBy("v", "lbl")
                .agg(F.count("*").alias("c"))
            )
            lbl = (
                cnt.withColumn("rn", F.row_number().over(wv))
                .where(F.col("rn") == 1)
                .select("v", "lbl")
            )
        got = {r.v: r.lbl for r in lbl.collect()}
        adj = defaultdict(list)
        for x, y in edges:
            adj[x].append(y)
            adj[y].append(x)
        want = {v: v for v in adj}
        for _ in range(_LPA_ITERS):
            new = {}
            for v, us in adj.items():
                c = Counter(want[u] for u in us)
                new[v] = min(c, key=lambda k: (-c[k], k))
            want = new
        assert got == want, (trial, sorted(edges))


def test_markov_stationary_matches_python_power_iteration(spark, sf_dir):
    """Full integer power-iteration replay from the same transition
    counts, including absorbing-type mass carry."""
    from collections import Counter, defaultdict

    from env_event_stream_spark.analytics_queries import (
        _MS_ITERS,
        _MS_UNIT,
    )
    from env_event_stream_spark.catalog import QUERIES

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    byu = defaultdict(list)
    for r in rows:
        byu[r.user_id].append((r.ts, r.event_id, r.event_type))
    c = Counter()
    for evs in byu.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            c[(a, b)] += 1
    types = sorted(
        {a for a, _ in c} | {b for _, b in c}
    )
    rsum = Counter()
    for (a, _), n in c.items():
        rsum[a] += n
    pi = {t: _MS_UNIT // len(types) for t in types}
    prev = pi
    for _ in range(_MS_ITERS):
        prev = pi
        inc = Counter()
        for (a, b), n in c.items():
            inc[b] += (prev[a] * n) // rsum[a]
        pi = {
            t: inc.get(t, 0) + (prev[t] if rsum[t] == 0 else 0)
            for t in types
        }
    mar = Counter()
    for (_, b), n in c.items():
        mar[b] += n
    n_all = sum(c.values())
    got = {
        r.event_type: (
            r.pi_units, r.pi_prev_units, r.delta_units, r.marginal_ppm
        )
        for r in QUERIES["evt_markov_stationary"](spark, sf_dir).collect()
    }
    want = {
        t: (
            pi[t], prev[t], abs(pi[t] - prev[t]),
            (mar[t] * 1000000) // n_all,
        )
        for t in types
        if mar[t] > 0
    }
    assert got == want


def test_slo_burn_rate_matches_python_replay(spark, sf_dir):
    """Replay the hourly grid, both trailing windows, the integer
    burn rates, and the two-window page flag in Python — every cell
    of every hour."""
    from collections import Counter

    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type")
        .select(
            F.expr(
                "CAST((unix_micros(ts) - unix_micros(TIMESTAMP "
                "'2024-01-01 00:00:00')) div 3600000000 AS BIGINT)"
            ).alias("h"),
            "event_type",
        )
        .collect()
    )
    tot, err = Counter(), Counter()
    for r in rows:
        tot[r.h] += 1
        if r.event_type == "error":
            err[r.h] += 1
    lo, hi = min(tot), max(tot)
    got = {
        r.hour_idx: r
        for r in QUERIES["evt_slo_burn_rate"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(lo, hi + 1))
    for hh in range(lo, hi + 1):
        nt, ne = tot.get(hh, 0), err.get(hh, 0)
        t6 = sum(tot.get(x, 0) for x in range(hh - 5, hh + 1))
        e6 = sum(err.get(x, 0) for x in range(hh - 5, hh + 1))
        b1 = (ne * 100000) // max(nt, 1)
        b6 = (e6 * 100000) // max(t6, 1)
        g = got[hh]
        assert (g.n_total, g.n_err) == (nt, ne)
        assert (g.burn_1h_milli, g.burn_6h_milli) == (b1, b6)
        assert g.page == (b1 >= 6000 and b6 >= 6000)


def test_weighted_pagerank_matches_python_replay(spark, sf_dir):
    """Full integer replay of the weighted transfer
    (rank*w) DIV wdeg across all iterations, top-20 compared."""
    from collections import defaultdict

    from env_event_stream_spark.advanced_queries import (
        _PRW_ITERS,
        _PRW_UNIT,
    )
    from env_event_stream_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").alias("w"))
        .collect()
    )
    wmap = defaultdict(dict)
    for r in e0:
        cc, ss = f"c:{r.o_custkey}", f"s:{r.l_suppkey}"
        wmap[cc][ss] = r.w
        wmap[ss][cc] = r.w
    wdeg = {v: sum(us.values()) for v, us in wmap.items()}
    n = len(wmap)
    base = (15 * _PRW_UNIT) // (100 * n)
    rank = {v: _PRW_UNIT // n for v in wmap}
    for _ in range(_PRW_ITERS):
        inc = defaultdict(int)
        for u, us in wmap.items():
            for v, w in us.items():
                inc[v] += (rank[u] * w) // wdeg[u]
        rank = {v: base + (85 * inc[v]) // 100 for v in wmap}
    want = sorted(
        ((v, wdeg[v], rank[v]) for v in wmap),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    want = [(v, d, r, i + 1) for i, (v, d, r) in enumerate(want)]
    got = [
        (g.node, g.wdeg, g.rank_units, g.pos)
        for g in sorted(
            QUERIES["graph_pagerank_weighted"](spark, sf_dir).collect(),
            key=lambda g: g.pos,
        )
    ]
    assert got == want


def test_er_threshold_sensitivity_monotone_and_consistent(spark, sf_dir):
    """Tightening the threshold must shrink pairs/nodes monotonically
    and never grow the largest cluster; the default threshold's row
    must equal er_customer_entities' own cluster stats."""
    from env_event_stream_spark.analytics_queries import (
        _ER_MATCH,
        _ER_THRESHOLDS,
    )
    from env_event_stream_spark.catalog import QUERIES

    rows = sorted(
        QUERIES["er_threshold_sensitivity"](spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == list(_ER_THRESHOLDS)
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs
        assert b.n_nodes <= a.n_nodes
        assert b.max_cluster <= a.max_cluster
    for r in rows:
        if r.n_pairs == 0:
            assert (r.n_nodes, r.n_clusters, r.max_cluster) == (0, 0, 0)
        else:
            assert r.n_clusters >= 1 and r.max_cluster >= 2
            assert r.n_nodes >= r.max_cluster
    base = QUERIES["er_customer_entities"](spark, sf_dir).collect()
    at_match = next(r for r in rows if r.threshold == _ER_MATCH)
    assert at_match.n_clusters == len(base)
    assert at_match.n_nodes == sum(r.n_members for r in base)
    assert at_match.max_cluster == (
        max((r.n_members for r in base), default=0)
    )
