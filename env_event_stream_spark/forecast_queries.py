"""Forecasting / daily-grid statistics queries on the events table
(split out of analytics_queries in round 10, VERDICT r9 task 6; every
catalog name is unchanged): EWMA, Holt, Holt-Winters (+ backtests and
residual anomalies), CUSUM changepoints, ACF, and Spearman — the
family that shares ONE zero-filled per-type daily-count grid.

The grid is the operator contract: _daily_counts_by_type collapses
the corpus to |types| x |days| rows in one map-side-combinable agg
(counts merge by +, so the SAME readouts double as the complete-mode
streaming matviews in streaming_queries.py — hw_finalize_daily /
cusum_finalize_daily / acf_finalize_daily / spearman_finalize_daily
are imported there and applied to the live grid). Every recurrence is
derived as INTEGER lag weights over a common denominator (bigint
multiply-adds, one double division at the end), so the cross-engine
value hash survives; window functions run over the calendar grid,
which is corpus-size-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from env_event_stream_spark.analytics_queries import _t
from env_event_stream_spark.queries import query

def _daily_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day_idx, cnt): the per-type daily-volume grid all
    three time-series detectors (EWMA, Holt, CUSUM) run on — one
    map-side-combinable aggregation, day_idx anchored at 2024-01-01."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(F.count("*").alias("cnt"))


@query(
    "evt_ewma_daily_by_type",
    """
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, day_idx, cnt,
             lag(cnt, 1) OVER w AS c1, lag(cnt, 2) OVER w AS c2,
             lag(cnt, 3) OVER w AS c3, lag(cnt, 4) OVER w AS c4,
             lag(cnt, 5) OVER w AS c5, lag(cnt, 6) OVER w AS c6
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_idx))
    SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(cnt AS BIGINT) AS n_events,
           floor((
             (cnt * 1.0 + coalesce(c1, 0) * 0.5 + coalesce(c2, 0) * 0.25
              + coalesce(c3, 0) * 0.125 + coalesce(c4, 0) * 0.0625
              + coalesce(c5, 0) * 0.03125 + coalesce(c6, 0) * 0.015625)
             / (1.0 + CASE WHEN c1 IS NULL THEN 0 ELSE 0.5 END
                + CASE WHEN c2 IS NULL THEN 0 ELSE 0.25 END
                + CASE WHEN c3 IS NULL THEN 0 ELSE 0.125 END
                + CASE WHEN c4 IS NULL THEN 0 ELSE 0.0625 END
                + CASE WHEN c5 IS NULL THEN 0 ELSE 0.03125 END
                + CASE WHEN c6 IS NULL THEN 0 ELSE 0.015625 END)
           ) * 10000 + 0.5) / 10000 AS ewma_7d,
           (cnt * 1.0 + coalesce(c1, 0) * 0.5 + coalesce(c2, 0) * 0.25
              + coalesce(c3, 0) * 0.125 + coalesce(c4, 0) * 0.0625
              + coalesce(c5, 0) * 0.03125 + coalesce(c6, 0) * 0.015625)
             / (1.0 + CASE WHEN c1 IS NULL THEN 0 ELSE 0.5 END
                + CASE WHEN c2 IS NULL THEN 0 ELSE 0.25 END
                + CASE WHEN c3 IS NULL THEN 0 ELSE 0.125 END
                + CASE WHEN c4 IS NULL THEN 0 ELSE 0.0625 END
                + CASE WHEN c5 IS NULL THEN 0 ELSE 0.03125 END
                + CASE WHEN c6 IS NULL THEN 0 ELSE 0.015625 END)
             * 1.25 < cnt AS is_spike
    FROM l
    """,
)
def evt_ewma_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily-volume baseline per event type
    (half-life 1 day over a 7-day horizon) + spike flag (today >
    1.25x the smoothed baseline) — the alerting baseline ops
    dashboards run; complements evt_zscore_outliers' global-std
    z-score with a TREND-aware local baseline.

    Determinism by construction: the weights are powers of two
    (dyadic rationals are EXACT doubles), counts are integers, and
    the weighted sum is a fixed-order 7-term expression over lag()
    columns — so the pre-round double is bit-identical across
    engines with no summation-order exposure at all; the leading
    days renormalize over the lags that exist. Plan: one map-side-
    combinable daily count, then windows over the |types|×|days|
    grid — calendar-sized, corpus-size-invariant."""
    d = _daily_counts_by_type(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day_idx")
    l = d.select(
        "event_type",
        "day_idx",
        "cnt",
        *[F.lag("cnt", k).over(w).alias(f"c{k}") for k in range(1, 7)],
    )
    wts = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625]
    num = F.col("cnt") * F.lit(wts[0])
    den = F.lit(wts[0])
    for k in range(1, 7):
        num = num + F.coalesce(F.col(f"c{k}"), F.lit(0)) * F.lit(wts[k])
        den = den + F.when(F.col(f"c{k}").isNull(), F.lit(0.0)).otherwise(
            F.lit(wts[k])
        )
    ewma = num / den
    return l.select(
        "event_type",
        "day_idx",
        F.col("cnt").cast("bigint").alias("n_events"),
        (F.floor(ewma * 10000 + F.lit(0.5)) / 10000).alias("ewma_7d"),
        (ewma * F.lit(1.25) < F.col("cnt")).alias("is_spike"),
    )


def _holt_weights(horizon: int = 7) -> list[tuple[float, float]]:
    """Exact dyadic lag weights of Holt's recurrence at
    alpha = beta = 1/2, truncated at `horizon` days.

    The recurrence  l_t = a*y_t + (1-a)(l_{t-1} + b_{t-1}),
                    b_t = B(l_t - l_{t-1}) + (1-B) b_{t-1}
    is linear, so the state is a weighted sum of past observations:
    s_t = sum_k A^k c y_{t-k} with A = [[1/2, 1/2], [-1/4, 3/4]],
    c = [1/2, 1/4]. With dyadic a/B every A^k c entry is a dyadic
    rational (denominator 4^k) — an EXACT double — so the truncated
    weighted sum is a fixed-order 7-term expression whose pre-round
    value is bit-identical on any engine (the evt_ewma_daily_by_type
    determinism argument, extended to a 2-state recurrence)."""
    from fractions import Fraction as Fr

    A = [[Fr(1, 2), Fr(1, 2)], [Fr(-1, 4), Fr(3, 4)]]
    v = [Fr(1, 2), Fr(1, 4)]
    out = []
    for _ in range(horizon):
        out.append((float(v[0]), float(v[1])))
        v = [
            A[0][0] * v[0] + A[0][1] * v[1],
            A[1][0] * v[0] + A[1][1] * v[1],
        ]
    return out


_HOLT_W = _holt_weights()


def _holt_oracle_sql() -> str:
    terms_l, terms_b = [], []
    for k, (lw, bw) in enumerate(_HOLT_W):
        y = "cnt" if k == 0 else f"c{k}"
        terms_l.append(f"{y} * CAST({lw!r} AS DOUBLE)")
        terms_b.append(f"{y} * CAST({bw!r} AS DOUBLE)")
    level = " + ".join(terms_l)
    trend = " + ".join(terms_b)
    lags = ", ".join(
        [f"lag(cnt, {k}) OVER w AS c{k}" for k in range(1, len(_HOLT_W))]
        + [f"lag(day_idx, {len(_HOLT_W) - 1}) OVER w AS d6"]
    )
    # calendar contiguity, not row contiguity: day_idx values are
    # strictly increasing integers, so this forces 7 CONSECUTIVE days
    guard = f"d6 = day_idx - {len(_HOLT_W) - 1}"
    return f"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, day_idx, cnt, {lags}
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_idx))
    SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(cnt AS BIGINT) AS n_events,
           floor(({level}) * 10000 + 0.5) / 10000 AS level_7d,
           floor(({trend}) * 10000 + 0.5) / 10000 AS trend_7d,
           floor((({level}) + ({trend})) * 10000 + 0.5) / 10000
             AS forecast_next,
           ({trend}) > 0 AS trend_up
    FROM l WHERE {guard}
    """


@query("evt_holt_trend_daily", _holt_oracle_sql())
def evt_holt_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend smoothing (alpha = beta = 1/2, 7-day
    truncated impulse response) of daily volume per event type, plus
    the one-step forecast l_t + b_t and a trend-direction flag —
    what a capacity dashboard actually wants from a volume series
    (EWMA tells you WHERE the series is; Holt also tells you WHERE
    IT'S GOING).

    Determinism: _holt_weights() derives the lag weights as exact
    dyadic rationals, the weighted sum is a fixed-order 7-term
    expression over integer counts, and rows emit only once the full
    7-day window exists (no cold-start renormalization to diverge
    on). Plan: one map-side-combinable daily count, one window over
    the |types| x |days| calendar grid — corpus-size-invariant, the
    same 100 TB shape as the EWMA."""
    d = _daily_counts_by_type(spark, sf_dir)
    # the contiguity guard is CALENDAR-based, not row-based: lag()
    # alone would splice across a zero-event day (day_idx values are
    # strictly increasing integers, so lag(day_idx,6) == day_idx-6
    # forces the 7 rows to be 7 CONSECUTIVE days).
    # expression text (r16 construction-cost discipline): the lag
    # select and the two left-associative weighted sums reuse the
    # ORACLE's own SQL fragments — single-source with the DuckDB side,
    # identical resolved expressions and float-add order, one parse
    # per column instead of ~6 py4j round trips per term
    over = "OVER (PARTITION BY event_type ORDER BY day_idx)"
    h = len(_HOLT_W)
    l = d.selectExpr(
        "event_type",
        "day_idx",
        "cnt",
        f"lag(day_idx, {h - 1}) {over} AS d6",
        *[f"lag(cnt, {k}) {over} AS c{k}" for k in range(1, h)],
    ).where(F.col("d6") == F.col("day_idx") - (h - 1))
    level = " + ".join(
        f"{'cnt' if k == 0 else f'c{k}'} * CAST({lw!r} AS DOUBLE)"
        for k, (lw, _) in enumerate(_HOLT_W)
    )
    trend = " + ".join(
        f"{'cnt' if k == 0 else f'c{k}'} * CAST({bw!r} AS DOUBLE)"
        for k, (_, bw) in enumerate(_HOLT_W)
    )
    r4t = lambda s: f"floor(({s}) * 10000 + 0.5D) / 10000"  # noqa: E731
    return l.selectExpr(
        "event_type",
        "day_idx",
        "CAST(cnt AS BIGINT) AS n_events",
        f"{r4t(level)} AS level_7d",
        f"{r4t(trend)} AS trend_7d",
        f"{r4t(f'({level}) + ({trend})')} AS forecast_next",
        f"({trend}) > 0 AS trend_up",
    )


def _hw_weights() -> list[tuple[int, list[int]]]:
    """Exact integer lag weights of the ADDITIVE Holt-Winters
    recurrence (alpha = beta = gamma = 1/2, weekly period m = 7) with
    the CLASSICAL initialization, over a 14-day window.

    Init (all linear in y, the classical-decomposition init):
    b_6 = (mean(y_7..y_13) - mean(y_0..y_6)) / 7,
    l_6 = mean(y_0..y_6) + 3 * b_6  (level AT t=6, not at the week-1
    midpoint), and TREND-ADJUSTED seasonal indices averaged over both
    weeks: s_i = ((y_i - (l_6 + (i-6) b_6))
                + (y_{i+7} - (l_6 + (i+1) b_6))) / 2.
    Without the trend adjustment a linear ramp leaks into the
    seasonal slots (s_i = y_i - mean puts -3b..+3b into the weekday
    indices); with it, constant AND linear series reproduce exactly
    (gain 1, trend exact — pytest-pinned). Then the recurrence
        l_t = a(y_t - s_{t-m}) + (1-a)(l_{t-1} + b_{t-1})
        b_t = B(l_t - l_{t-1}) + (1-B) b_{t-1}
        s_t = g(y_t - l_t)   + (1-g) s_{t-m}
    runs for t = 7..13 (each weekday's seasonal updated once). A
    zero-init truncated impulse response (the _holt_weights shape)
    is NOT usable here: the seasonal channel decays only ~(3/4) per
    WEEK, so a 14-lag truncation leaves a +27% constant-series gain
    bias; the classical init is exact on constant and linear series
    by construction (gain 1, trend exact).

    Everything is linear in (y_0..y_13), so each output channel is
    sum_k n_k * y_{t-k} / D with INTEGER n_k and a common denominator
    D | 49 * 2^14 — the weighted sum is computed entirely in bigint
    (order-free, exact on any engine) and pays ONE double division at
    the end (same IEEE op everywhere; the dq_profile_lineitem
    integer-exact mean argument). Returns [(D, [n_0..n_13]), ...] for
    channels (level, trend, s_t, s_next), lag order k = 0 newest.
    s_next is the seasonal slot the one-step forecast needs: the
    weekday of t+1 was last updated at t-6 (i.e. t = 7 in window
    coordinates)."""
    from fractions import Fraction as Fr
    from math import lcm

    m, h = 7, 14
    zero = [Fr(0)] * h

    def unit(i: int) -> list:
        v = list(zero)
        v[i] = Fr(1)
        return v

    def lin(ca, a, cb, b):  # ca*a + cb*b, elementwise
        return [ca * x + cb * y for x, y in zip(a, b)]

    w1 = [Fr(1, m) if i < m else Fr(0) for i in range(h)]
    w2 = [Fr(1, m) if i >= m else Fr(0) for i in range(h)]
    b = [(x - y) / m for x, y in zip(w2, w1)]
    l = lin(1, w1, 3, b)  # level AT t = 6
    seas = [
        lin(
            Fr(1, 2),
            lin(1, unit(i), -1, lin(1, l, i - 6, b)),
            Fr(1, 2),
            lin(1, unit(i + m), -1, lin(1, l, i + 1, b)),
        )
        for i in range(m)
    ]
    for t in range(m, h):
        s_m = seas[t - m]
        lb = lin(1, l, 1, b)
        l_new = lin(Fr(1, 2), lin(1, unit(t), -1, s_m), Fr(1, 2), lb)
        b = lin(Fr(1, 2), lin(1, l_new, -1, l), Fr(1, 2), b)
        seas.append(
            lin(Fr(1, 2), lin(1, unit(t), -1, l_new), Fr(1, 2), s_m)
        )
        l = l_new
    out = []
    for vec in (l, b, seas[-1], seas[m]):
        rev = vec[::-1]  # index by lag k (0 = newest observation)
        d = lcm(*[f.denominator for f in rev])
        nums = [int(f * d) for f in rev]
        assert max(abs(n) for n in nums) * h < 2 ** 24  # bigint headroom
        out.append((d, nums))
    return out


_HW_W = _hw_weights()


_HW_MAX_CNT = 2 ** 38


def _hw_channel_sql(ch: int) -> str:
    """CAST(integer weighted sum AS DOUBLE) / D for channel ch —
    bigint multiply-adds (order-free, exact), one double division."""
    d, nums = _HW_W[ch]
    terms = [
        f"{'cnt' if k == 0 else f'c{k}'} * CAST({n} AS BIGINT)"
        for k, n in enumerate(nums)
        if n != 0  # zero weights dropped IDENTICALLY on both sides
    ]
    return f"CAST({' + '.join(terms)} AS DOUBLE) / {d}"


def _hw_oracle_sql() -> str:
    h = 14
    level, trend, seas, snext = (_hw_channel_sql(c) for c in range(4))
    lags = ", ".join(
        [f"lag(cnt, {k}) OVER w AS c{k}" for k in range(1, h)]
        + [f"lag(day_idx, {h - 1}) OVER w AS dlast"]
    )
    guard = f"dlast = day_idx - {h - 1}"
    return f"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, day_idx, cnt, {lags}
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_idx))
    SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(cnt AS BIGINT) AS n_events,
           floor(({level}) * 10000 + 0.5) / 10000 AS level_hw,
           floor(({trend}) * 10000 + 0.5) / 10000 AS trend_hw,
           floor(({seas}) * 10000 + 0.5) / 10000 AS seasonal_hw,
           floor((({level}) + ({trend}) + ({snext})) * 10000 + 0.5) / 10000
             AS forecast_next,
           ({trend}) > 0 AS trend_up
    FROM l WHERE {guard}
    """  # noqa: E501


@query("evt_holt_winters_daily", _hw_oracle_sql())
def evt_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-WINTERS additive seasonal smoothing (alpha = beta =
    gamma = 1/2, weekly period, classical init over a 14-day window)
    of daily volume per event type — the seasonal rung above
    evt_holt_trend_daily: level + trend PLUS a per-weekday additive
    seasonal index, and a one-step forecast l_t + b_t + s_{t-6} that
    aims at tomorrow's weekday instead of smearing the weekly cycle
    into the trend. Classical initialization because a zero-init
    truncated impulse response (the _holt_weights shape) carries a
    +27% constant-series gain bias at 14 lags — see _hw_weights.

    Determinism: _hw_weights() derives all four output channels as
    INTEGER lag weights over a common denominator, so each output is
    a bigint multiply-add over 14 integer daily counts — exact and
    ORDER-FREE on any engine — finalized by one double division and
    the tie-free 4dp floor (the dq_profile_lineitem integer-exact
    mean argument). Overflow is LOUD, not silent: assert_true bounds
    each daily count at 2^38 on the Spark side (DuckDB's checked
    bigint arithmetic errors on its own). Rows emit only when 14
    CONSECUTIVE calendar days exist (lag(day_idx,13) == day_idx-13 —
    the Holt contiguity guard). Plan: one map-side-combinable daily
    count, one window over the |types| x |days| calendar grid —
    corpus-size-invariant, the same 100 TB shape as EWMA/Holt/CUSUM.
    Reference analog: none (src/broker.ts stops at delivery
    counters); this is the §2.11 time-series extension surface."""
    return hw_finalize_daily(_daily_counts_by_type(spark, sf_dir))


def hw_finalize_daily(d: DataFrame) -> DataFrame:
    """The Holt-Winters readout over a (event_type, day_idx, cnt)
    daily grid — shared source-level by the batch query above and the
    streaming matview twin (evt_stream_hw_forecast), so "streaming
    equals batch" holds by construction once the grids agree."""
    h = 14
    d = d.where(
        F.assert_true(
            F.col("cnt") < F.lit(_HW_MAX_CNT),
            F.lit("evt_holt_winters_daily: daily count > 2^38 — "
                  "bigint weighted sum would overflow"),
        ).isNull()
    )
    # expression text (r16 construction-cost discipline): lags and
    # the four integer-weighted channels reuse the ORACLE's own
    # _hw_channel_sql fragments — single-source with the DuckDB side;
    # the multiply-adds are exact bigint (order-free) and the one
    # double division is by the same exactly-representable
    # denominator, so values are identical to the Column-built form
    over = "OVER (PARTITION BY event_type ORDER BY day_idx)"
    l = d.selectExpr(
        "event_type",
        "day_idx",
        "cnt",
        f"lag(day_idx, {h - 1}) {over} AS dlast",
        *[f"lag(cnt, {k}) {over} AS c{k}" for k in range(1, h)],
    ).where(F.col("dlast") == F.col("day_idx") - (h - 1))

    level, trend, seas, snext = (_hw_channel_sql(c) for c in range(4))
    r4t = lambda s: f"floor(({s}) * 10000 + 0.5D) / 10000"  # noqa: E731
    return l.selectExpr(
        "event_type",
        "day_idx",
        "CAST(cnt AS BIGINT) AS n_events",
        f"{r4t(level)} AS level_hw",
        f"{r4t(trend)} AS trend_hw",
        f"{r4t(seas)} AS seasonal_hw",
        f"{r4t(f'({level}) + ({trend}) + ({snext})')} AS forecast_next",
        f"({trend}) > 0 AS trend_up",
    )


def _hw_backtest_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    hw AS (SELECT event_type, day_idx, n_events, forecast_next
           FROM ({_hw_oracle_sql()}) t),
    ho AS (SELECT event_type, day_idx, forecast_next AS holt_next
           FROM ({_holt_oracle_sql()}) t),
    j AS (
      SELECT hw.event_type,
             abs(hw.forecast_next - d.cnt) AS err_hw,
             abs(ho.holt_next - d.cnt) AS err_holt,
             abs(hw.n_events - d.cnt) AS err_naive
      FROM hw
      JOIN ho ON ho.event_type = hw.event_type
             AND ho.day_idx = hw.day_idx
      JOIN d ON d.event_type = hw.event_type
            AND d.day_idx = hw.day_idx + 1)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           floor(CAST(sum(CAST(err_hw AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS mae_hw,
           floor(CAST(sum(CAST(err_holt AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS mae_holt,
           floor(CAST(sum(CAST(err_naive AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS mae_naive,
           floor(CAST(sum(CAST(err_hw AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000
             < floor(CAST(sum(CAST(err_naive AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS hw_wins,
           floor(CAST(sum(CAST(err_hw AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000
             < floor(CAST(sum(CAST(err_holt AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS hw_beats_holt
    FROM j GROUP BY event_type
    """


@query("evt_hw_backtest", _hw_backtest_oracle)
def evt_hw_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of the Holt-Winters forecast per event
    type, scored against the actual next-day count and compared to
    BOTH baselines it must beat to justify its rung: naive
    persistence (y_d) and the non-seasonal Holt forecast. hw_wins /
    hw_beats_holt report the verdicts honestly (the
    evt_holt_backtest discipline). MEASURED at sf0.01: mixed — hw
    beats persistence on 3/5 types and plain Holt on 2/5 (the
    synthetic series has no PLANTED weekly cycle, so wins come from
    residual weekday structure, not a designed seasonal signal; a
    zero-init truncated variant lost on ALL types, which is why the
    operator uses the classical init).
    tests/test_trend_er_mmr.py proves the machinery wins decisively
    when a weekly cycle exists.

    Determinism: both forecasts are 4dp by construction and y is
    integer, so |err| sums ride DECIMAL(18,4) exactly, finalized by
    one double division + the tie-free 4dp floor. Plan: two
    calendar-sized grids joined to the day-shifted daily counts —
    corpus-invariant."""
    d = _daily_counts_by_type(spark, sf_dir)
    hw = evt_holt_winters_daily(spark, sf_dir).select(
        "event_type", "day_idx", "n_events", "forecast_next"
    )
    ho = evt_holt_trend_daily(spark, sf_dir).select(
        "event_type",
        "day_idx",
        F.col("forecast_next").alias("holt_next"),
    )
    nxt = d.select(
        "event_type",
        (F.col("day_idx") - 1).alias("day_idx"),
        F.col("cnt").alias("next_cnt"),
    )
    j = (
        hw.join(ho, ["event_type", "day_idx"])
        .join(nxt, ["event_type", "day_idx"])
        .select(
            "event_type",
            F.abs(F.col("forecast_next") - F.col("next_cnt")).alias(
                "err_hw"
            ),
            F.abs(F.col("holt_next") - F.col("next_cnt")).alias("err_holt"),
            F.abs(F.col("n_events") - F.col("next_cnt")).alias("err_naive"),
        )
    )

    def mae4(col):
        return F.floor(
            F.sum(col.cast("decimal(18,4)")).cast("double")
            / F.count("*")
            * 10000
            + F.lit(0.5)
        ) / 10000

    out = j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_scored"),
        mae4(F.col("err_hw")).alias("mae_hw"),
        mae4(F.col("err_holt")).alias("mae_holt"),
        mae4(F.col("err_naive")).alias("mae_naive"),
    )
    return out.select(
        "event_type",
        "n_scored",
        "mae_hw",
        "mae_holt",
        "mae_naive",
        (F.col("mae_hw") < F.col("mae_naive")).alias("hw_wins"),
        (F.col("mae_hw") < F.col("mae_holt")).alias("hw_beats_holt"),
    )


def _hw_residual_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    hw AS (SELECT event_type, day_idx, forecast_next
           FROM ({_hw_oracle_sql()}) t),
    j AS (
      SELECT hw.event_type, d.day_idx, d.cnt AS actual,
             hw.forecast_next,
             d.cnt - hw.forecast_next AS resid
      FROM hw JOIN d ON d.event_type = hw.event_type
                    AND d.day_idx = hw.day_idx + 1),
    med AS (SELECT event_type, quantile_cont(resid, 0.5) AS m
            FROM j GROUP BY 1),
    dev AS (SELECT j.*, med.m, abs(j.resid - med.m) AS ad
            FROM j JOIN med USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT d.event_type, CAST(d.day_idx AS BIGINT) AS day_idx,
           CAST(d.actual AS BIGINT) AS actual,
           d.forecast_next AS forecast,
           floor(d.resid * 10000 + 0.5) / 10000 AS resid,
           floor(d.m * 10000 + 0.5) / 10000 AS median_resid,
           floor(mad.mad * 10000 + 0.5) / 10000 AS mad_resid,
           d.ad > 3 * 1.4826 * mad.mad AS is_anomaly
    FROM dev d JOIN mad ON mad.event_type = d.event_type
    """


@query("evt_hw_residual_anomaly", _hw_residual_oracle)
def evt_hw_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALLY-ADJUSTED anomaly detection: median/MAD robust
    outliers over the Holt-Winters one-step forecast RESIDUALS
    (actual next-day count minus forecast_next) — the rung
    evt_mad_outliers cannot be: it sees raw dailies, where a normal
    Monday peak looks like an outlier against the weekly mean; here
    the level + trend + weekday-seasonal structure is subtracted
    FIRST and only what the model cannot explain is scored. Emits the
    full scored grid (one row per type-day with a forecast), so the
    flag's context — residual, per-type robust center and spread — is
    auditable next to each verdict.

    Determinism: forecast_next is 4dp-exact and actual is integer, so
    resid is an exact double on both engines; Spark percentile() ==
    DuckDB quantile_cont bit-for-bit pre-rounding (the
    evt_value_percentiles_by_type pinning), deviations compare
    UNROUNDED values, and the anomaly flag uses the same strict
    inequality + literal spelling as evt_mad_outliers. Only display
    columns round (tie-free 4dp floor). Plan: the HW grid joins the
    day-shifted daily counts (calendar-sized), then two grouped exact
    percentiles with the |types|-row results broadcast back — the
    evt_mad_outliers shape over a corpus-size-INVARIANT frame (the
    daily grid), so the exact-percentile sort is never a scale risk
    here. Reference analog: none (src/broker.ts stops at delivery
    counters); §2.11 time-series extension surface."""
    d = _daily_counts_by_type(spark, sf_dir)
    hw = evt_holt_winters_daily(spark, sf_dir).select(
        "event_type", "day_idx", "forecast_next"
    )
    nxt = d.select(
        "event_type",
        (F.col("day_idx") - 1).alias("day_idx"),
        F.col("cnt").alias("actual"),
    )
    j = hw.join(nxt, ["event_type", "day_idx"]).select(
        "event_type",
        (F.col("day_idx") + 1).alias("day_idx"),
        "actual",
        F.col("forecast_next").alias("forecast"),
        (F.col("actual") - F.col("forecast_next")).alias("resid"),
    )
    med = j.groupBy("event_type").agg(
        F.expr("percentile(resid, 0.5)").alias("m")
    )
    dev = j.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("resid") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.col("day_idx").cast("bigint").alias("day_idx"),
        F.col("actual").cast("bigint").alias("actual"),
        "forecast",
        r4(F.col("resid")).alias("resid"),
        r4(F.col("m")).alias("median_resid"),
        r4(F.col("mad")).alias("mad_resid"),
        (F.col("ad") > F.lit(3 * 1.4826) * F.col("mad")).alias("is_anomaly"),
    )


_CUSUM_ORACLE_SQL = """
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    ref AS (SELECT event_type, count(*) AS n_days, sum(cnt) AS total
            FROM d GROUP BY event_type),
    p AS (
      SELECT d.event_type, d.day_idx, d.cnt, ref.total,
             sum(ref.n_days * d.cnt - ref.total)
               OVER (PARTITION BY d.event_type ORDER BY d.day_idx
                     ROWS UNBOUNDED PRECEDING) AS pref
      FROM d JOIN ref ON ref.event_type = d.event_type),
    s AS (
      SELECT event_type, day_idx, cnt, total,
             pref - least(0, min(pref)
               OVER (PARTITION BY event_type ORDER BY day_idx
                     ROWS UNBOUNDED PRECEDING)) AS cus_pos,
             greatest(0, max(pref)
               OVER (PARTITION BY event_type ORDER BY day_idx
                     ROWS UNBOUNDED PRECEDING)) - pref AS cus_neg
      FROM p)
    SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(cnt AS BIGINT) AS n_events,
           CAST(cus_pos AS BIGINT) AS cusum_pos,
           CAST(cus_neg AS BIGINT) AS cusum_neg,
           cus_pos > 2 * total AS alarm_pos,
           cus_neg > 2 * total AS alarm_neg
    FROM s
    """


@query("evt_cusum_changepoint", _CUSUM_ORACLE_SQL)
def evt_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector over daily volume per type:
    alarm when the cumulative deviation from the series' own mean
    exceeds two mean-days of traffic — the sequential changepoint
    test for SLOW drifts that per-day spike rules can't see.

    INTEGER-EXACT via the prefix-sum identity: the recurrence
    S_t = max(0, S_{t-1} + dev_t) equals P_t - min(0, min_{j<=t} P_j)
    for prefix sums P of dev — so the sequential detector becomes a
    cumulative sum + running min, two stock window functions, no
    recursion. Deviations are scaled integers (n_days*cnt - total:
    mean-centering WITHOUT a division), so every value is exact
    bigint arithmetic — order-independent across engines and
    partitionings, fully value-hash oracled. Plan: one daily-count
    aggregation, a |types|-row reference join, windows over the
    calendar grid — corpus-size-invariant."""
    return cusum_finalize_daily(_daily_counts_by_type(spark, sf_dir))


def cusum_finalize_daily(d: DataFrame) -> DataFrame:
    """The CUSUM readout over a (event_type, day_idx, cnt) daily grid
    — shared source-level by the batch query above and the streaming
    matview twin (evt_stream_cusum), the hw_finalize_daily pattern."""
    ref = d.groupBy("event_type").agg(
        F.count("*").alias("n_days"), F.sum("cnt").alias("total")
    )
    p = d.join(F.broadcast(ref), "event_type")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = F.sum(
        F.col("n_days") * F.col("cnt") - F.col("total")
    ).over(wcum)
    s = p.select(
        "event_type", "day_idx", "cnt", "total", pref.alias("pref")
    )
    cus_pos = F.col("pref") - F.least(
        F.lit(0), F.min("pref").over(wcum)
    )
    cus_neg = F.greatest(F.lit(0), F.max("pref").over(wcum)) - F.col(
        "pref"
    )
    return s.select(
        "event_type",
        "day_idx",
        F.col("cnt").cast("bigint").alias("n_events"),
        cus_pos.cast("bigint").alias("cusum_pos"),
        cus_neg.cast("bigint").alias("cusum_neg"),
        (cus_pos > 2 * F.col("total")).alias("alarm_pos"),
        (cus_neg > 2 * F.col("total")).alias("alarm_neg"),
    )


def _holt_backtest_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    h AS (SELECT event_type, day_idx, n_events, forecast_next
          FROM ({_holt_oracle_sql()}) t),
    j AS (
      SELECT h.event_type,
             abs(h.forecast_next - d.cnt) AS err_holt,
             abs(h.n_events - d.cnt) AS err_naive
      FROM h JOIN d ON d.event_type = h.event_type
                   AND d.day_idx = h.day_idx + 1)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           floor(CAST(sum(CAST(err_holt AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS mae_holt,
           floor(CAST(sum(CAST(err_naive AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS mae_naive,
           floor(CAST(sum(CAST(err_holt AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000
             < floor(CAST(sum(CAST(err_naive AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS holt_wins
    FROM j GROUP BY event_type
    """


@query("evt_holt_backtest", _holt_backtest_oracle())
def evt_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of the Holt forecast per event type:
    forecast_next at day d is scored against the ACTUAL count at
    day d+1 (only where d+1 exists in the grid), MAE compared to the
    naive last-value baseline |y_d - y_{d+1}|. holt_wins reports the
    verdict honestly per type — the emb_residual_recall_eval
    discipline (an eval that is allowed to refuse to justify its
    rung) applied to forecasting.

    Determinism: errors ride DECIMAL(18,4) sums (|forecast - y| has
    at most 4 decimals — forecast is 4dp by construction, y is
    integer), finalized by one double division and the tie-free 4dp
    floor. Plan: the Holt grid joined to itself shifted one day —
    calendar-sized, corpus-invariant."""
    d = _daily_counts_by_type(spark, sf_dir)
    h = evt_holt_trend_daily(spark, sf_dir).select(
        "event_type", "day_idx", "n_events", "forecast_next"
    )
    nxt = d.select(
        "event_type",
        (F.col("day_idx") - 1).alias("day_idx"),
        F.col("cnt").alias("next_cnt"),
    )
    j = h.join(nxt, ["event_type", "day_idx"]).select(
        "event_type",
        F.abs(F.col("forecast_next") - F.col("next_cnt")).alias("err_holt"),
        F.abs(F.col("n_events") - F.col("next_cnt")).alias("err_naive"),
    )

    def mae4(col):
        return F.floor(
            F.sum(col.cast("decimal(18,4)")).cast("double")
            / F.count("*")
            * 10000
            + F.lit(0.5)
        ) / 10000

    out = j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_scored"),
        mae4(F.col("err_holt")).alias("mae_holt"),
        mae4(F.col("err_naive")).alias("mae_naive"),
    )
    return out.select(
        "event_type",
        "n_scored",
        "mae_holt",
        "mae_naive",
        (F.col("mae_holt") < F.col("mae_naive")).alias("holt_wins"),
    )


_ACF_ORACLE_SQL = r"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day_idx) AS dmin, max(day_idx) AS dmax,
                 max(day_idx) - min(day_idx) + 1 AS n, sum(cnt) AS s
          FROM d GROUP BY event_type),
    grid AS (SELECT b.event_type, gs.day_idx, b.n, b.s
             FROM b, LATERAL (
               SELECT unnest(generate_series(b.dmin, b.dmax)) AS day_idx
             ) gs),
    g AS (SELECT grid.event_type, grid.day_idx,
                 grid.n * coalesce(d.cnt, 0) - grid.s AS c
          FROM grid LEFT JOIN d
            ON d.event_type = grid.event_type
           AND d.day_idx = grid.day_idx),
    den AS (SELECT event_type, count(*) AS n_days, sum(c * c) AS den
            FROM g GROUP BY event_type),
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag_k),
    num AS (SELECT a.event_type, l.lag_k, sum(a.c * f.c) AS num
            FROM g a
            CROSS JOIN lags l
            JOIN g f ON f.event_type = a.event_type
                    AND f.day_idx = a.day_idx + l.lag_k
            GROUP BY 1, 2)
    SELECT num.event_type, CAST(num.lag_k AS BIGINT) AS lag_k,
           CAST(den.n_days AS BIGINT) AS n_days,
           CASE WHEN den.den = 0 THEN NULL
                WHEN num.num >= 0
                  THEN CAST((1000 * num.num) // den.den AS BIGINT)
                ELSE -CAST((1000 * (-num.num)) // den.den AS BIGINT)
           END AS acf_milli
    FROM num JOIN den ON den.event_type = num.event_type
    """


@query("evt_acf_daily", _ACF_ORACLE_SQL)
def evt_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily volume per type at lags 1-7 —
    the diagnostic that DECIDES whether the seasonal rung is worth
    running: a weekly cycle shows as acf(7) >> acf(1..6); this
    synthetic stream's flat ACF is exactly why evt_hw_backtest's
    verdict came back MIXED. Series are zero-filled over each type's
    own min..max calendar (ACF needs regular spacing; the raw grid
    omits empty days).

    INTEGER-EXACT: centered values are pre-scaled by n (c_t = n*x_t -
    S: mean-centering WITHOUT division, the CUSUM trick), so every
    lag-k numerator and the variance denominator are order-free
    bigint sums; the readout is one nonneg floor division per (type,
    lag) with the sign extracted first (Spark `div` truncates toward
    zero, DuckDB `//` floors — they agree only on nonneg operands).
    Overflow is LOUD: assert_true bounds the per-type denominator at
    2^52 so 1000*num stays in int64 (|num_k| <= den by
    Cauchy-Schwarz); DuckDB's checked bigint arithmetic errors on its
    own. Plan: one map-side-combinable daily count, a 7-row broadcast
    lag table, equi-joins on (type, day+k) over the calendar grid —
    corpus-size-invariant, the EWMA/Holt/CUSUM 100 TB shape.
    Reference analog: none (src/broker.ts stops at delivery
    counters); §2.11 time-series extension surface."""
    return acf_finalize_daily(_daily_counts_by_type(spark, sf_dir))


def acf_finalize_daily(d: DataFrame) -> DataFrame:
    """The ACF readout over a (event_type, day_idx, cnt) daily grid —
    shared source-level by the batch query above and the streaming
    matview twin (evt_stream_acf), the hw/cusum_finalize_daily
    pattern: once the grids agree, live == batch by construction."""
    b = (
        d.groupBy("event_type")
        .agg(
            F.min("day_idx").alias("dmin"),
            F.max("day_idx").alias("dmax"),
            F.sum("cnt").alias("s"),
        )
        .withColumn("n", F.col("dmax") - F.col("dmin") + 1)
    )
    grid = b.select(
        "event_type",
        "n",
        "s",
        F.explode(F.sequence("dmin", "dmax")).alias("day_idx"),
    )
    g = grid.join(d, ["event_type", "day_idx"], "left").select(
        "event_type",
        "day_idx",
        (
            F.col("n") * F.coalesce(F.col("cnt"), F.lit(0)) - F.col("s")
        ).alias("c"),
    )
    den = (
        g.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.col("c") * F.col("c")).alias("den"),
        )
        .where(
            F.assert_true(
                F.col("den") < F.lit(2**52),
                F.lit(
                    "evt_acf_daily: variance sum >= 2^52 — 1000*num "
                    "would overflow int64; pre-scale daily counts"
                ),
            ).isNull()
        )
    )
    lags = d.sparkSession.range(1, 8).select(F.col("id").alias("lag_k"))
    f2 = g.select(
        F.col("event_type").alias("et2"),
        F.col("day_idx").alias("f_day"),
        F.col("c").alias("fc"),
    )
    num = (
        g.crossJoin(F.broadcast(lags))
        .join(
            f2,
            (F.col("et2") == F.col("event_type"))
            & (F.col("f_day") == F.col("day_idx") + F.col("lag_k")),
        )
        .groupBy("event_type", "lag_k")
        .agg(F.sum(F.col("c") * F.col("fc")).alias("num"))
    )
    return num.join(F.broadcast(den), "event_type").select(
        "event_type",
        F.col("lag_k").cast("bigint").alias("lag_k"),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.expr(
            "CASE WHEN den = 0 THEN NULL "
            "WHEN num >= 0 THEN CAST((1000 * num) div den AS BIGINT) "
            "ELSE -CAST((1000 * -num) div den AS BIGINT) END"
        ).alias("acf_milli"),
    )


_SPEARMAN_ORACLE_SQL = r"""
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    cal AS (SELECT min(day_idx) AS dmin, max(day_idx) AS dmax FROM d),
    et AS (SELECT DISTINCT event_type FROM d),
    grid AS (SELECT et.event_type, gs.day_idx
             FROM et, cal, LATERAL (
               SELECT unnest(generate_series(cal.dmin, cal.dmax))
                 AS day_idx) gs),
    s AS (SELECT grid.event_type, grid.day_idx, coalesce(d.cnt, 0) AS cnt
          FROM grid LEFT JOIN d ON d.event_type = grid.event_type
                                AND d.day_idx = grid.day_idx),
    v AS (SELECT event_type, cnt, count(*) AS m FROM s GROUP BY 1, 2),
    rv AS (SELECT event_type, cnt, m,
                  2 * (sum(m) OVER (PARTITION BY event_type ORDER BY cnt)
                       - m) + m + 1 AS dr
           FROM v),
    r AS (SELECT s.event_type, s.day_idx, rv.dr
          FROM s JOIN rv ON rv.event_type = s.event_type
                        AND rv.cnt = s.cnt),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 count(*) AS n, sum(a.dr) AS sa, sum(b.dr) AS sb,
                 sum(a.dr * a.dr) AS saa, sum(b.dr * b.dr) AS sbb,
                 sum(a.dr * b.dr) AS sab
          FROM r a JOIN r b ON b.day_idx = a.day_idx
                           AND a.event_type < b.event_type
          GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           CASE WHEN (n * saa - sa * sa) = 0 OR (n * sbb - sb * sb) = 0
                THEN NULL
                ELSE floor((CAST(n * sab - sa * sb AS DOUBLE)
                     / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                            * CAST(n * sbb - sb * sb AS DOUBLE)))
                     * 10000 + 0.5) / 10000
           END AS rho
    FROM p
    """


@query("evt_spearman_daily", _SPEARMAN_ORACLE_SQL)
def evt_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between every PAIR of event types'
    daily-volume series on the shared zero-filled calendar — "do
    purchases move with views?", robust to the heavy-tailed daily
    counts a Pearson-on-raw would be dominated by. Ties use average
    ranks, so rho is computed as Pearson over ranks (the 6*sum(d^2)
    shortcut is exact only tie-free).

    DOUBLED integer ranks (2*avg_rank is always integral when ties
    average) keep every sum — sa, saa, sab — an exact order-free
    bigint; rho is ONE fixed-order double expression over six exact
    integers, written with identical text on both engines (sqrt of an
    exact product, one division, the tie-free 4dp floor). Zero
    variance (a constant series) yields NULL, not a crash. Plan:
    the |types| x |days| calendar grid self-joined on day — both
    sides corpus-size-invariant; ranks come from a per-type window
    over DISTINCT daily counts. Reference analog: none; §2.11
    time-series extension surface."""
    return spearman_finalize_daily(_daily_counts_by_type(spark, sf_dir))


def spearman_finalize_daily(d: DataFrame) -> DataFrame:
    """The Spearman readout over a (event_type, day_idx, cnt) daily
    grid — shared source-level by the batch query above and the
    streaming matview twin (evt_stream_spearman)."""
    cal = d.agg(
        F.min("day_idx").alias("dmin"), F.max("day_idx").alias("dmax")
    )
    et = d.select("event_type").distinct()
    grid = et.crossJoin(F.broadcast(cal)).select(
        "event_type",
        F.explode(F.sequence("dmin", "dmax")).alias("day_idx"),
    )
    s = grid.join(d, ["event_type", "day_idx"], "left").select(
        "event_type",
        "day_idx",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
    )
    v = s.groupBy("event_type", "cnt").agg(F.count("*").alias("m"))
    wv = Window.partitionBy("event_type").orderBy("cnt")
    rv = v.select(
        "event_type",
        "cnt",
        (
            F.lit(2) * (F.sum("m").over(wv) - F.col("m"))
            + F.col("m")
            + F.lit(1)
        ).alias("dr"),
    )
    r = s.join(rv, ["event_type", "cnt"]).select(
        "event_type", "day_idx", "dr"
    )
    rb = r.select(
        F.col("event_type").alias("type_b"),
        F.col("day_idx").alias("day_b"),
        F.col("dr").alias("drb"),
    )
    p = (
        r.withColumnRenamed("event_type", "type_a")
        .join(
            rb,
            (F.col("day_idx") == F.col("day_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n"),
            F.sum("dr").alias("sa"),
            F.sum("drb").alias("sb"),
            F.sum(F.col("dr") * F.col("dr")).alias("saa"),
            F.sum(F.col("drb") * F.col("drb")).alias("sbb"),
            F.sum(F.col("dr") * F.col("drb")).alias("sab"),
        )
    )
    return p.select(
        "type_a",
        "type_b",
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(
            "CASE WHEN (n * saa - sa * sa) = 0 OR (n * sbb - sb * sb) = 0 "
            "THEN NULL "
            "ELSE floor((CAST(n * sab - sa * sb AS DOUBLE) "
            "/ sqrt(CAST(n * saa - sa * sa AS DOUBLE) "
            "* CAST(n * sbb - sb * sb AS DOUBLE))) "
            "* 10000 + 0.5) / 10000 END"
        ).alias("rho"),
    )
