"""Round-7 operators: Holt trend smoothing (truncated dyadic weights
vs the literal recurrence), CUSUM (prefix-sum identity vs the
sequential max(0, .) recurrence), entity resolution (engine clusters
vs an independent pandas + union-find replay), and MMR (the two
deliberately different greedy implementations fuzzed against each
other, plus structural properties of the engine output)."""

from __future__ import annotations

import math
from fractions import Fraction as Fr

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from env_event_stream_spark.analytics_queries import er_customer_entities
from env_event_stream_spark.forecast_queries import (
    _HOLT_W,
    _HW_W,
    evt_cusum_changepoint,
    evt_holt_trend_daily,
)
from env_event_stream_spark.retrieval_queries import (
    _MMR_K,
    _mmr_select,
    _mmr_select_oracle,
    emb_mmr_diversify,
)


# ---------------------------------------------------------------------------
# Holt
# ---------------------------------------------------------------------------


def _holt_recurrence(ys):
    """The literal Holt recurrence (alpha=beta=1/2) from zero initial
    state, in exact rational arithmetic."""
    l = b = Fr(0)
    for y in ys:
        l_new = Fr(1, 2) * y + Fr(1, 2) * (l + b)
        b = Fr(1, 2) * (l_new - l) + Fr(1, 2) * b
        l = l_new
    return l, b


@given(st.lists(st.integers(0, 10_000), min_size=7, max_size=7))
@settings(max_examples=50, deadline=None)
def test_holt_weights_equal_recurrence_on_full_window(ys):
    # truncated weighted sum over exactly 7 observations == the
    # recurrence run from zero state over those 7 observations
    l_ref, b_ref = _holt_recurrence(ys)
    lw = sum(Fr(_HOLT_W[k][0]) * ys[-1 - k] for k in range(7))
    bw = sum(Fr(_HOLT_W[k][1]) * ys[-1 - k] for k in range(7))
    assert (lw, bw) == (l_ref, b_ref)


def test_holt_query_matches_python_recompute(spark, sf_dir):
    got = {
        (r["event_type"], r["day_idx"]): r
        for r in evt_holt_trend_daily(spark, sf_dir).collect()
    }
    from env_event_stream_spark.tables import load_table

    daily = {
        (r["event_type"], r["d"]): r["cnt"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got, "holt emitted no rows at test sf"
    types = {t for t, _ in daily}
    for t in types:
        days = sorted(d for tt, d in daily if tt == t)
        for d in days:
            window = [(t, d - k) in daily for k in range(7)]
            if not all(window):
                assert (t, d) not in got
                continue
            ys = [daily[(t, d - k)] for k in range(7)]
            level = ys[0] * _HOLT_W[0][0]
            trend = ys[0] * _HOLT_W[0][1]
            for k in range(1, 7):
                level = level + ys[k] * _HOLT_W[k][0]
                trend = trend + ys[k] * _HOLT_W[k][1]
            row = got[(t, d)]
            assert row["level_7d"] == math.floor(level * 1e4 + 0.5) / 1e4
            assert row["trend_7d"] == math.floor(trend * 1e4 + 0.5) / 1e4
            assert row["trend_up"] == (trend > 0)


# ---------------------------------------------------------------------------
# Holt-Winters (seasonal)
# ---------------------------------------------------------------------------


def _hw_recurrence(ys):
    """The literal additive Holt-Winters recurrence (alpha = beta =
    gamma = 1/2, m = 7) with the CLASSICAL initialization over the
    window's first week, exact rationals over exactly 14
    observations. Returns (l, b, s_t, s_{t-6})."""
    m = 7
    assert len(ys) == 2 * m
    w1 = Fr(sum(ys[:m]), m)
    b = (Fr(sum(ys[m:]), m) - w1) / m
    l = w1 + 3 * b  # level AT t = 6
    seas: list[Fr] = [
        Fr(1, 2) * (ys[i] - (l + (i - 6) * b))
        + Fr(1, 2) * (ys[i + m] - (l + (i + 1) * b))
        for i in range(m)
    ]
    for t in range(m, 2 * m):
        s_m = seas[t - m]
        l_new = Fr(1, 2) * (ys[t] - s_m) + Fr(1, 2) * (l + b)
        b = Fr(1, 2) * (l_new - l) + Fr(1, 2) * b
        seas.append(Fr(1, 2) * (ys[t] - l_new) + Fr(1, 2) * s_m)
        l = l_new
    return l, b, seas[-1], seas[m]


@given(st.lists(st.integers(0, 10_000), min_size=14, max_size=14))
@settings(max_examples=50, deadline=None)
def test_hw_weights_equal_recurrence_on_full_window(ys):
    # the integer lag weights over their common denominator replay
    # the classically-initialized recurrence EXACTLY — all four
    # channels (level, trend, s_t, s_{t-6})
    ref = _hw_recurrence(ys)
    got = tuple(
        sum(Fr(nums[k], den) * ys[-1 - k] for k in range(14))
        for den, nums in _HW_W
    )
    assert got == ref


def test_hw_constant_and_linear_series_are_exact():
    # the classical init's reason to exist: gain exactly 1 on a
    # constant series, trend exact on a linear ramp (the zero-init
    # truncated impulse response fails both with a +27% bias)
    l, b, s, s6 = _hw_recurrence([500] * 14)
    assert (l, b, s, s6) == (500, 0, 0, 0)
    ys = [100 + 7 * t for t in range(14)]
    l, b, s, s6 = _hw_recurrence(ys)
    assert b == 7 and s == 0 and s6 == 0
    assert l + b == ys[-1] + 7  # one-step forecast continues the ramp


def test_hw_seasonal_forecast_wins_on_planted_weekly_cycle():
    # the honest-negative backtest (evt_hw_backtest: hw loses on the
    # cycle-free synthetic corpus) needs its positive control: on a
    # series WITH a weekly cycle the seasonal forecast must beat both
    # plain Holt and naive persistence
    ys = [1000 + (500 if t % 7 == 3 else 0) + 3 * t for t in range(35)]
    err_hw = err_holt = err_naive = Fr(0)
    for t in range(14, len(ys)):  # forecast y_t from the prior 14 days
        win = ys[t - 14 : t]
        l, b, _, s6 = _hw_recurrence(win)
        lh = sum(Fr(_HOLT_W[k][0]) * win[-1 - k] for k in range(7))
        bh = sum(Fr(_HOLT_W[k][1]) * win[-1 - k] for k in range(7))
        err_hw += abs(l + b + s6 - ys[t])
        err_holt += abs(lh + bh - ys[t])
        err_naive += abs(Fr(win[-1] - ys[t]))
    assert err_hw < err_holt
    assert err_hw < err_naive


def test_hw_residual_anomaly_consistent_with_forecast(spark, sf_dir):
    # the seasonal-adjusted outlier rung must score exactly the
    # (forecast day + 1, actual) pairs the HW grid can forecast, with
    # resid = actual - forecast at 4dp and per-type constant
    # median/MAD columns; the flag must agree with its own displayed
    # columns up to display rounding
    from env_event_stream_spark.forecast_queries import (
        evt_holt_winters_daily,
        evt_hw_residual_anomaly,
    )

    hw = {
        (r["event_type"], r["day_idx"]): r["forecast_next"]
        for r in evt_holt_winters_daily(spark, sf_dir).collect()
    }
    rows = evt_hw_residual_anomaly(spark, sf_dir).collect()
    assert rows, "no scored days at test sf"
    per_type: dict = {}
    for r in rows:
        key = (r["event_type"], r["day_idx"] - 1)
        assert key in hw, "scored a day without a prior-day forecast"
        assert r["forecast"] == hw[key]
        assert (
            abs(r["resid"] - (r["actual"] - r["forecast"])) < 2e-4
        )
        mm = per_type.setdefault(
            r["event_type"], (r["median_resid"], r["mad_resid"])
        )
        assert mm == (r["median_resid"], r["mad_resid"])
        gap = abs(r["resid"] - r["median_resid"])
        thr = 3 * 1.4826 * r["mad_resid"]
        if r["is_anomaly"]:
            assert gap > thr - 2e-3
        else:
            assert gap < thr + 2e-3


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 500), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_cusum_prefix_identity_equals_sequential_recurrence(xs):
    n, total = len(xs), sum(xs)
    devs = [n * x - total for x in xs]
    # sequential reference
    sp = sn = 0
    seq = []
    for d in devs:
        sp = max(0, sp + d)
        sn = max(0, sn - d)
        seq.append((sp, sn))
    # the query's identity
    pref = 0
    rmin = rmax = 0
    for d, (ep, en) in zip(devs, seq):
        pref += d
        rmin = min(rmin, pref)
        rmax = max(rmax, pref)
        assert pref - min(0, rmin) == ep
        assert max(0, rmax) - pref == en


def test_cusum_query_matches_sequential_recompute(spark, sf_dir):
    rows = evt_cusum_changepoint(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["day_idx"])
        n = len(rs)
        total = sum(r["n_events"] for r in rs)
        sp = sn = 0
        for r in rs:
            d = n * r["n_events"] - total
            sp = max(0, sp + d)
            sn = max(0, sn - d)
            assert r["cusum_pos"] == sp and r["cusum_neg"] == sn
            assert r["alarm_pos"] == (sp > 2 * total)
            assert r["alarm_neg"] == (sn > 2 * total)


# ---------------------------------------------------------------------------
# Entity resolution
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_er_clusters_match_union_find_replay(spark, sf_dir):
    got = {
        r["cluster_id"]: (
            r["n_members"],
            r["n_edges"],
            r["max_score"],
            r["mean_score"],
        )
        for r in er_customer_entities(spark, sf_dir).collect()
    }
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    c["band"] = (c.c_acctbal / 500).apply(math.floor)
    edges = []
    blocks = c.groupby(["c_nationkey", "c_mktsegment", "band"])
    for _, g in blocks:
        recs = g.sort_values("c_custkey").to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, b = recs[i], recs[j]
                lev = _lev(a["c_name"], b["c_name"])
                dbal = abs(a["c_acctbal"] - b["c_acctbal"])
                score = (4 if lev <= 1 else 2 if lev <= 2 else -2) + (
                    3 if dbal <= 50 else 1 if dbal <= 250 else -3
                )
                if score >= 5:
                    edges.append((a["c_custkey"], b["c_custkey"], score))
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        parent[find(u)] = find(v)
    members: dict[int, set] = {}
    escore: dict[int, list] = {}
    for u, v, s in edges:
        root = find(u)
        members.setdefault(root, set()).update((u, v))
        escore.setdefault(root, []).append(s)
    expected = {}
    for root, mem in members.items():
        cid = min(mem)
        ss = escore[root]
        expected[cid] = (
            len(mem),
            len(ss),
            max(ss),
            math.floor(sum(ss) / len(ss) * 1e4 + 0.5) / 1e4,
        )
    assert got == expected
    assert expected, "no ER clusters at test sf — scoring degenerated"


# ---------------------------------------------------------------------------
# MMR
# ---------------------------------------------------------------------------


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_mmr_two_implementations_agree(data):
    n = data.draw(st.integers(2, 14))
    ids = sorted(
        data.draw(
            st.lists(
                st.integers(0, 99), min_size=n, max_size=n, unique=True
            )
        )
    )
    # coarse grids force exact-mmr ties, exercising the id tie-break
    rel = {
        i: data.draw(st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
        for i in ids
    }
    sim = {}
    for i in ids:
        for j in ids:
            if i != j:
                s = data.draw(st.sampled_from([0.0, 0.5, 1.0]))
                sim[(i, j)] = s
                sim[(j, i)] = s
    assert _mmr_select(rel, sim) == _mmr_select_oracle(rel, sim)


def test_mmr_engine_output_structure(spark, sf_dir):
    rows = emb_mmr_diversify(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _MMR_K
        ids = [r["vec_id"] for r in rs]
        assert len(set(ids)) == len(ids) and qid not in ids
        # first pick is pure relevance: its mmr = lambda * rel
        first = rs[0]
        assert first["mmr"] == math.floor(0.7 * first["rel"] * 1e6 + 0.5) / 1e6
        assert first["rel"] == max(r["rel"] for r in rs)


# ---------------------------------------------------------------------------
# CEP / calibration / PSI (round-7 second batch)
# ---------------------------------------------------------------------------


def test_cep_matches_python_regex_replay(spark, sf_dir):
    import re

    from env_event_stream_spark.cep_queries import (
        _CEP_PATTERN,
        evt_cep_pattern,
    )
    from env_event_stream_spark.tables import load_table

    got = {
        (r["user_id"], r["day"]): (
            r["n_seq_events"],
            r["n_matches"],
            r["n_matched_events"],
        )
        for r in evt_cep_pattern(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("ts").cast("date").cast("string").alias("day"),
            "ts",
            "event_id",
            "event_type",
        )
        .collect()
    )
    ini = {"view": "v", "click": "c", "purchase": "p", "error": "e",
           "signup": "s"}
    seqs: dict[tuple, list] = {}
    for r in ev:
        seqs.setdefault((r["user_id"], r["day"]), []).append(
            (r["ts"], r["event_id"], ini.get(r["event_type"], "x"))
        )
    expected = {}
    for key, rows in seqs.items():
        seq = "".join(x[2] for x in sorted(rows))
        m = re.findall(_CEP_PATTERN, seq)
        if m:
            expected[key] = (len(seq), len(m), sum(len(x) for x in m))
    assert got == expected
    assert expected, "no CEP matches at test sf"


@given(
    st.lists(
        st.tuples(
            st.sampled_from("vcpesx"),
            st.integers(0, 3_000_000_000),
        ),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([None, 0, 1, 500_000_000, 600_000_000]),
)
@settings(max_examples=300, deadline=None)
def test_cep_timed_two_scanners_agree(evs, within):
    # the engine's pointer-loop automaton vs the oracle's regex-based
    # scanner — two deliberately independent implementations of the
    # windowed-CEP contract, on random sequences incl. pathological
    # windows (0 = only simultaneous events match; None = untimed)
    from env_event_stream_spark.cep_queries import (
        _cep_regex_scan,
        _cep_timed_scan,
    )

    evs = sorted(evs, key=lambda e: e[1])
    seq = "".join(e[0] for e in evs)
    ts = [e[1] for e in evs]
    assert _cep_timed_scan(seq, ts, within) == _cep_regex_scan(
        seq, ts, within
    )
    # ... and in AFTER MATCH SKIP TO NEXT ROW mode (overlapping)
    got_next = _cep_timed_scan(seq, ts, within, skip_to_next=True)
    assert got_next == _cep_regex_scan(seq, ts, within, skip_to_next=True)
    # overlap monotonicity: every skip-past match's anchor also
    # completes under skip-to-next, so the overlapping count dominates
    assert got_next[0] >= _cep_timed_scan(seq, ts, within)[0]


@given(
    st.lists(
        st.tuples(
            st.sampled_from("vcpesx"),
            st.integers(0, 3_000_000_000),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_cep_funnel_fold_equals_batch_automaton(evs):
    # the streaming single-anchor fold replayed event-by-event must
    # reproduce the batch pointer automaton exactly (matches, events
    # consumed, max span) at the production window — the third
    # independent implementation of the windowed-CEP contract
    from env_event_stream_spark.cep_queries import (
        _CEP_WITHIN_US,
        _cep_timed_scan,
    )
    from env_event_stream_spark.streaming_queries import fold_cep_funnel

    evs = sorted(evs, key=lambda e: e[1])
    seq = "".join(e[0] for e in evs)
    ts = [e[1] for e in evs]
    s = [-1, 0, 0, 0, -1, 0]
    for ini, us in zip(seq, ts):
        fold_cep_funnel(s, ini, us)
    nm, nme, msp = _cep_timed_scan(seq, ts, _CEP_WITHIN_US)
    assert s[2] == nm
    assert s[3] == nme
    assert s[4] == (-1 if msp is None else msp)
    assert s[5] == len(seq)


def test_cep_skip_modes_consistent_with_within(spark, sf_dir):
    # m_skip_past must reproduce evt_cep_within's timed n_matches on
    # every common user-day (same pattern, same window, same
    # sequences), and the emitted user-day set must be a superset
    # (an overlapping match exists wherever a non-overlapping one does)
    from env_event_stream_spark.cep_queries import (
        evt_cep_skip_modes,
        evt_cep_within,
    )

    modes = {
        (r["user_id"], r["day"]): r
        for r in evt_cep_skip_modes(spark, sf_dir).collect()
    }
    within = {
        (r["user_id"], r["day"]): r
        for r in evt_cep_within(spark, sf_dir).collect()
    }
    assert modes, "no skip-mode rows at test sf"
    timed_within = {
        k: r for k, r in within.items() if r["n_matches"] >= 1
    }
    assert set(timed_within) <= set(modes)
    for k, r in modes.items():
        assert r["m_skip_next"] >= r["m_skip_past"]
        if k in timed_within:
            assert r["m_skip_past"] == timed_within[k]["n_matches"]
        else:
            assert r["m_skip_past"] == 0


@given(
    st.lists(
        st.tuples(
            st.sampled_from("vcpesx"),
            st.integers(0, 3_000_000_000),
        ),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([None, 0, 1, 500_000_000, 14_400_000_000]),
)
@settings(max_examples=300, deadline=None)
def test_cep_nested_two_scanners_agree(evs, within):
    # the NESTED pattern v[vcs]*p (repetition class admits the
    # anchor): pointer automaton vs regex scanner, both skip modes —
    # the class where overlapping re-anchoring actually happens, so
    # the fuzz covers the code paths the v[cs]*p fuzz cannot reach
    from env_event_stream_spark.cep_queries import (
        _CEP_NESTED_PATTERN,
        _CEP_NESTED_REP,
        _cep_regex_scan,
        _cep_timed_scan,
    )

    evs = sorted(evs, key=lambda e: e[1])
    seq = "".join(e[0] for e in evs)
    ts = [e[1] for e in evs]
    for skip_next in (False, True):
        assert _cep_timed_scan(
            seq, ts, within, skip_to_next=skip_next,
            rep_class=_CEP_NESTED_REP,
        ) == _cep_regex_scan(
            seq, ts, within, skip_to_next=skip_next,
            pattern=_CEP_NESTED_PATTERN,
        )
    got_next = _cep_timed_scan(
        seq, ts, within, skip_to_next=True, rep_class=_CEP_NESTED_REP
    )
    got_past = _cep_timed_scan(
        seq, ts, within, rep_class=_CEP_NESTED_REP
    )
    assert got_next[0] >= got_past[0]


def test_cep_nested_skip_modes_actually_diverge(spark, sf_dir):
    # the informativeness guarantee: overlap_delta must be NONZERO on
    # at least one user-day at the test SF (the whole point of the
    # nested pattern — on v[cs]*p the delta is structurally zero),
    # the delta must equal m_skip_next - m_skip_past everywhere, the
    # timed counts must be dominated by the untimed ones, and the
    # untimed skip-past count must agree with a direct non-
    # overlapping regex count on the engine's own sequences
    import re

    from env_event_stream_spark.cep_queries import (
        _CEP_NESTED_PATTERN,
        _cep_sequences,
        evt_cep_skip_modes_nested,
    )

    rows = evt_cep_skip_modes_nested(spark, sf_dir).collect()
    assert rows, "no nested skip-mode rows at test sf"
    assert any(r["overlap_delta"] > 0 for r in rows), (
        "nested pattern produced zero divergence — the query is "
        "uninformative at this SF"
    )
    for r in rows:
        assert r["overlap_delta"] == r["m_skip_next"] - r["m_skip_past"]
        assert r["overlap_delta"] >= 0
        assert r["m_skip_past_4h"] <= r["m_skip_past"]
        assert r["m_skip_next_4h"] <= r["m_skip_next"]
        assert r["m_skip_next_4h"] >= r["m_skip_past_4h"]
    seqs = {
        (x["user_id"], x["day"]): x["seq"]
        for x in _cep_sequences(spark, sf_dir).collect()
    }
    for r in rows:
        seq = seqs[(r["user_id"], r["day"])]
        assert r["m_skip_past"] == len(
            re.findall(_CEP_NESTED_PATTERN, seq)
        )


def test_cep_error_burst_runs_are_maximal_and_flagged(spark, sf_dir):
    from env_event_stream_spark.cep_queries import (
        _CEP_BURST_ALERT_RUN,
        _CEP_BURST_MIN_RUN,
        _CEP_BURST_WITHIN_MS,
        evt_cep_error_burst,
    )

    rows = evt_cep_error_burst(spark, sf_dir).collect()
    assert rows, "no error runs at test sf"
    for r in rows:
        assert r["run_len"] >= _CEP_BURST_MIN_RUN
        assert r["span_ms"] >= 0
        # is_burst = ANY 3 consecutive errors within the window, so:
        # impossible below the alert run length; for a run of exactly
        # 3 the only window IS the run; a fast long run always flags
        if r["run_len"] < _CEP_BURST_ALERT_RUN:
            assert not r["is_burst"]
        elif r["run_len"] == _CEP_BURST_ALERT_RUN:
            assert r["is_burst"] == (r["span_ms"] <= _CEP_BURST_WITHIN_MS)
        elif r["span_ms"] <= _CEP_BURST_WITHIN_MS:
            assert r["is_burst"]
    # maximality: two runs of the same user-day can't be adjacent
    by_day: dict = {}
    for r in rows:
        by_day.setdefault((r["user_id"], r["day"]), []).append(
            (r["start_pos"], r["run_len"])
        )
    for runs in by_day.values():
        runs.sort()
        for (p1, l1), (p2, _) in zip(runs, runs[1:]):
            assert p1 + l1 < p2  # a non-error event separates them


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["error", "view"]),
            st.integers(0, 900_000_000),  # us within a day, 15-min span
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_burst_fold_matches_islands_replay(evs):
    # the streaming fold (sequential, O(1) state) vs an independent
    # islands replay (split into maximal error runs, sliding
    # 3-window check) — the same two-implementations discipline the
    # sf-data consistency test pins, but on adversarial sequences:
    # simultaneous events, runs at the sequence edges, exact-boundary
    # spans (the within check is <=)
    from env_event_stream_spark.streaming_queries import (
        _BURST_WITHIN_US,
        fold_burst_run,
    )

    evs = sorted(evs, key=lambda e: e[1])
    s = [0, -1, -1, 0, 0, 0]
    for etype, us in evs:
        fold_burst_run(s, etype, us)
    # independent replay: maximal runs, then window checks
    runs: list[list[int]] = []
    cur: list[int] = []
    for etype, us in evs:
        if etype == "error":
            cur.append(us)
        elif cur:
            runs.append(cur)
            cur = []
    if cur:
        runs.append(cur)
    n_runs2 = sum(1 for r in runs if len(r) >= 2)
    max_run = max((len(r) for r in runs), default=0)
    burst = any(
        r[k] - r[k - 2] <= _BURST_WITHIN_US
        for r in runs
        for k in range(2, len(r))
    )
    assert s[3] == n_runs2
    assert s[4] == max_run
    assert bool(s[5]) == burst


def test_cep_error_burst_agrees_with_streaming_twin(spark, sf_dir):
    # the batch islands report and the live detector implement ONE
    # contract (any 3 consecutive errors within 5 min): aggregated
    # per user-day they must agree exactly
    from env_event_stream_spark.cep_queries import evt_cep_error_burst
    from env_event_stream_spark.streaming_queries import (
        evt_stream_error_burst,
    )

    batch: dict = {}
    for r in evt_cep_error_burst(spark, sf_dir).collect():
        k = (r["user_id"], r["day"])
        n, mx, b = batch.get(k, (0, 0, False))
        batch[k] = (n + 1, max(mx, r["run_len"]), b or r["is_burst"])
    live = {
        (r["user_id"], r["day"]): (
            r["n_runs_ge2"],
            r["max_run_len"],
            r["any_burst"],
        )
        for r in evt_stream_error_burst(spark, sf_dir).collect()
    }
    assert batch and batch == live


def test_cep_within_consistent_with_untimed_pattern(spark, sf_dir):
    # the untimed counter inside evt_cep_within must reproduce
    # evt_cep_pattern's n_matches exactly (same pattern, same
    # sequences), and every timed quantity is bounded by its untimed
    # counterpart; spans respect the 10-minute window
    from env_event_stream_spark.cep_queries import (
        _CEP_WITHIN_US,
        evt_cep_pattern,
        evt_cep_within,
    )

    timed = {
        (r["user_id"], r["day"]): r
        for r in evt_cep_within(spark, sf_dir).collect()
    }
    untimed = {
        (r["user_id"], r["day"]): r
        for r in evt_cep_pattern(spark, sf_dir).collect()
    }
    assert set(timed) == set(untimed)
    saw_converted = False
    for key, t in timed.items():
        assert t["n_matches_untimed"] == untimed[key]["n_matches"]
        assert t["n_seq_events"] == untimed[key]["n_seq_events"]
        assert 0 <= t["n_matches"] <= t["n_matches_untimed"]
        if t["n_matches"] == 0:
            assert t["max_span_ms"] is None
        else:
            assert 0 <= t["max_span_ms"] <= _CEP_WITHIN_US // 1000
            saw_converted = True
    assert saw_converted, "no timed matches at test sf"


def test_calibration_deciles_consistent(spark, sf_dir):
    from env_event_stream_spark.llm_queries import (
        doc_classifier_calibration,
    )

    rows = doc_classifier_calibration(spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["decile"])
        assert [r["decile"] for r in rs] == list(
            range(1, len(rs) + 1)
        )
        # ntile balance: counts differ by at most 1
        ns = [r["n_docs"] for r in rs]
        assert max(ns) - min(ns) <= 1
        for r in rs:
            assert 0 <= r["n_pos"] <= r["n_docs"]
            expect = (
                (r["n_pos"] * 20000 + r["n_docs"])
                // (2 * r["n_docs"])
            ) / 10000
            assert r["pos_rate"] == expect
            assert r["min_logit"] <= r["max_logit"]
        # deciles ordered by logit: max of decile k <= min of k+1
        for a, b in zip(rs, rs[1:]):
            assert a["max_logit"] <= b["min_logit"]


def test_psi_matches_python_recompute(spark, sf_dir):
    from env_event_stream_spark.llm_queries import (
        _PSI_EDGES,
        _PSI_NB,
        doc_source_psi,
    )
    from env_event_stream_spark.tables import load_table

    got = {
        r["source"]: (r["n_docs"], r["psi"], r["drifted"])
        for r in doc_source_psi(spark, sf_dir).collect()
    }
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    JAVA_WS = " \t\n\x0b\f\r"
    counts: dict[str, list] = {}
    for r in docs:
        toks = [t for t in r["text"].strip(JAVA_WS).split() if t]
        n = len(toks)
        k = next(
            (i for i, e in enumerate(_PSI_EDGES) if n < e),
            len(_PSI_EDGES),
        )
        counts.setdefault(r["source"], [0] * _PSI_NB)[k] += 1
    tot = [sum(c[k] for c in counts.values()) for k in range(_PSI_NB)]
    tn = sum(tot)
    for src, cs in counts.items():
        n = sum(cs)
        psi = 0.0
        for k in range(_PSI_NB):
            p = (cs[k] + 1.0) / (n + _PSI_NB)
            q = (tot[k] + 1.0) / (tn + _PSI_NB)
            psi = psi + (p - q) * math.log(p / q)
        psi4 = math.floor(psi * 10000 + 0.5) / 10000
        assert got[src] == (n, psi4, psi4 > 0.2), src


def test_mmr_diversity_eval_consistent(spark, sf_dir):
    from env_event_stream_spark.retrieval_queries import (
        emb_mmr_diversity_eval,
    )

    r = emb_mmr_diversity_eval(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_queries"] >= 1
    # MMR can only trade relevance away, never gain it (a true
    # invariant: top-k maximizes mean rel over any same-size subset
    # of the pool). Mean pairwise similarity usually drops too, but
    # the greedy only bounds MAX-sim-to-selected per step — the mean
    # comparison is a data property, not an invariant, so it is NOT
    # asserted here.
    assert row["avg_rel_mmr"] <= row["avg_rel_topk"]
    assert row["redundancy_removed"] == (
        row["avg_pairsim_topk"] - row["avg_pairsim_mmr"]
    )


# ---------------------------------------------------------------------------
# k-core / point-in-time join (round-7 third batch)
# ---------------------------------------------------------------------------


@given(st.data())
@settings(max_examples=15, deadline=None)
def test_kcore_operator_matches_python_peel(spark, data):
    from env_event_stream_spark.operators.graph import k_core

    n_edges = data.draw(st.integers(1, 25))
    raw = {
        tuple(
            sorted(
                data.draw(
                    st.tuples(st.integers(0, 11), st.integers(0, 11))
                )
            )
        )
        for _ in range(n_edges)
    }
    edges = [(x, y) for x, y in raw if x != y]
    if not edges:
        edges = [(0, 1)]
    k = data.draw(st.integers(1, 4))
    df = spark.createDataFrame(edges, "x bigint, y bigint")
    got = {(r["x"], r["y"]) for r in k_core(df, k).collect()}
    e = set(edges)
    while True:
        deg: dict = {}
        for x, y in e:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        bad = {v for v, d in deg.items() if d < k}
        if not bad:
            break
        e = {(x, y) for x, y in e if x not in bad and y not in bad}
    assert got == e


def test_scd2_point_in_time_matches_python_replay(spark, sf_dir):
    from env_event_stream_spark.analytics_queries import (
        join_scd2_point_in_time,
    )
    from env_event_stream_spark.tables import load_table

    got = {
        r["status_at_purchase"]: (
            r["n_purchases"],
            r["n_users"],
            r["total_value"],
        )
        for r in join_scd2_point_in_time(spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    from decimal import Decimal

    # per user: ordered non-purchase runs -> intervals
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    agg: dict = {}
    for uid, rows in by_user.items():
        runs = []  # (valid_from, status)
        prev = None
        for r in rows:
            if r["event_type"] == "purchase":
                continue
            if prev != r["event_type"]:
                runs.append((r["ts"], r["event_type"]))
            prev = r["event_type"]
        for r in rows:
            if r["event_type"] != "purchase":
                continue
            status = "(none)"
            for i, (vf, st_) in enumerate(runs):
                vt = runs[i + 1][0] if i + 1 < len(runs) else None
                if r["ts"] >= vf and (vt is None or r["ts"] < vt):
                    status = st_
                    break
            n, users, total = agg.get(status, (0, set(), Decimal(0)))
            users = set(users)
            users.add(uid)
            agg[status] = (
                n + 1,
                users,
                total + Decimal(repr(r["value"])).quantize(Decimal("0.01")),
            )
    expected = {
        s: (n, len(users), float(total))
        for s, (n, users, total) in agg.items()
    }
    assert got == expected


def test_ab_test_matches_python_replay(spark, sf_dir):
    import hashlib

    from env_event_stream_spark.analytics_queries import (
        evt_ab_test_conversion,
    )
    from env_event_stream_spark.tables import load_table

    row = evt_ab_test_conversion(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    import datetime as dt

    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    cells = {(0, 0): 0, (0, 1): 0, (1, 0): 0, (1, 1): 0}
    for uid, rows in by_user.items():
        arm = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2
        mv = min(
            (r["ts"] for r in rows if r["event_type"] == "view"),
            default=None,
        )
        conv = int(
            mv is not None
            and any(
                r["event_type"] == "purchase"
                and mv <= r["ts"] < mv + dt.timedelta(days=1)
                for r in rows
            )
        )
        cells[(arm, conv)] += 1
    a, b = cells[(0, 1)], cells[(0, 0)]
    cc, d = cells[(1, 1)], cells[(1, 0)]
    assert (
        row["n_control"],
        row["n_treatment"],
        row["conv_control"],
        row["conv_treatment"],
    ) == (a + b, cc + d, a, cc)
    den = (a + b) * (cc + d) * (a + cc) * (b + d)
    if den > 0:
        chi2 = math.floor(
            float(a + b + cc + d)
            * float((a * d - b * cc) ** 2)
            / float(den)
            * 10000
            + 0.5
        ) / 10000
        assert row["chi2"] == chi2
        assert row["significant"] == (chi2 > 3.8415)
    else:
        assert row["chi2"] is None


def test_holt_backtest_matches_python_recompute(spark, sf_dir):
    from decimal import Decimal

    from env_event_stream_spark.forecast_queries import (
        _daily_counts_by_type,
        evt_holt_backtest,
        evt_holt_trend_daily,
    )

    got = {
        r["event_type"]: (
            r["n_scored"],
            r["mae_holt"],
            r["mae_naive"],
            r["holt_wins"],
        )
        for r in evt_holt_backtest(spark, sf_dir).collect()
    }
    daily = {
        (r["event_type"], r["day_idx"]): r["cnt"]
        for r in _daily_counts_by_type(spark, sf_dir).collect()
    }
    holt = evt_holt_trend_daily(spark, sf_dir).collect()
    agg: dict = {}
    for r in holt:
        nxt = daily.get((r["event_type"], r["day_idx"] + 1))
        if nxt is None:
            continue
        eh = abs(
            Decimal(repr(r["forecast_next"])).quantize(Decimal("0.0001"))
            - nxt
        )
        en = Decimal(abs(r["n_events"] - nxt))
        n, sh, sn = agg.get(r["event_type"], (0, Decimal(0), Decimal(0)))
        agg[r["event_type"]] = (n + 1, sh + eh, sn + en)
    expected = {}
    for t, (n, sh, sn) in agg.items():
        mh = math.floor(float(sh) / n * 10000 + 0.5) / 10000
        mn = math.floor(float(sn) / n * 10000 + 0.5) / 10000
        expected[t] = (n, mh, mn, mh < mn)
    assert got == expected


def test_referential_integrity_all_green_on_testdata(spark, sf_dir):
    from env_event_stream_spark.advanced_queries import (
        _RI_CHECKS,
        dq_referential_integrity,
    )

    rows = {r["fk_name"]: r for r in
            dq_referential_integrity(spark, sf_dir).collect()}
    assert set(rows) == {c[0] for c in _RI_CHECKS}
    for name, r in rows.items():
        assert r["n_rows"] > 0, name
        # the generated star is referentially sound — any orphan here
        # means the anti-join is wrong (or the data generator broke)
        assert r["n_orphans"] == 0 and r["n_null_fk"] == 0, name
        assert r["ok"] is True


def test_transition_eval_matches_python_replay(spark, sf_dir):
    from collections import Counter

    from env_event_stream_spark.analytics_queries import (
        evt_transition_eval,
    )
    from env_event_stream_spark.tables import load_table

    got = {
        r["prev"]: (
            r["n_test"],
            r["n_correct"],
            r["accuracy"],
            r["baseline_accuracy"],
        )
        for r in evt_transition_eval(spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["event_type"])
    train, test = [], []
    for types in by_user.values():
        trans = list(zip(types, types[1:]))
        n = len(trans)
        for rn, t in enumerate(trans, start=1):
            (train if rn * 5 <= n * 4 else test).append(t)
    tc = Counter(train)
    pred = {}
    for (p, nx), c in tc.items():
        cur = pred.get(p)
        # argmax by count desc, lexicographic next ASC on ties
        if cur is None or c > cur[1] or (c == cur[1] and nx < cur[0]):
            pred[p] = (nx, c)
    nxc = Counter(nx for _, nx in train)
    majority = sorted(nxc, key=lambda t: (-nxc[t], t))[0]
    agg: dict = {}
    for p, nx in test:
        n, c, b = agg.get(p, (0, 0, 0))
        agg[p] = (
            n + 1,
            c + (nx == pred[p][0]),
            b + (nx == majority),
        )
    expected = {}
    for p, (n, c, b) in agg.items():
        expected[p] = (
            n,
            c,
            ((c * 20000 + n) // (2 * n)) / 10000,
            ((b * 20000 + n) // (2 * n)) / 10000,
        )
    assert got == expected
