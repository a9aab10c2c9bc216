"""Event-analytics queries on the events table — extensions of the
product-analytics family in advanced_queries.py (funnel_conversion /
cohort_retention / transition_matrix), built on the same scan the
reference's getEvents serves (src/types.ts:190-198).

Scale notes (100 TB): every query here shuffles ONCE on user_id —
windows and per-user aggregates share that one partitioning (Catalyst
reuses the exchange), and the final rollups are tiny (steps × 1,
|types| × stats). Nothing collects, nothing crosses users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from env_event_stream_spark.queries import query
from env_event_stream_spark.tables import load_table, small_model_frame


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click (after first view) -> purchase (after
# that click). The classic "how many users made it to step N" query.
# ---------------------------------------------------------------------------


@query(
    "evt_funnel_steps",
    """
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ), s2 AS (
      SELECT user_id, ts, event_type, t1,
             min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM s1
    ), s3 AS (
      SELECT user_id, t1, t2,
             min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM s2
    ), u AS (
      SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM s3 GROUP BY user_id
    )
    SELECT 'view' AS step, CAST(count(t1) AS BIGINT) AS users FROM u
    UNION ALL
    SELECT 'view>click', CAST(count(t2) AS BIGINT) FROM u
    UNION ALL
    SELECT 'view>click>purchase', CAST(count(t3) AS BIGINT) FROM u
    """,
)
def evt_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-SEQUENCE 3-step funnel: step N's earliest qualifying
    event must follow the step-N-1 event actually chosen, via chained
    windowed conditional mins (contrast evt_funnel_conversion in
    advanced_queries.py — the first-touch approximation that only
    compares each type's global first occurrence; a user whose first
    click precedes their first view converts here iff they click
    AGAIN after viewing). The three windows share one user_id
    partitioning: a single shuffle plus a 3-row rollup."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    u = s.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    agg = u.agg(
        F.count("t1").cast("bigint").alias("n1"),
        F.count("t2").cast("bigint").alias("n2"),
        F.count("t3").cast("bigint").alias("n3"),
    )
    return agg.selectExpr(
        "stack(3, 'view', n1, 'view>click', n2, 'view>click>purchase', n3) "
        "AS (step, users)"
    )


# ---------------------------------------------------------------------------
# Inter-arrival gap statistics per event type.
# ---------------------------------------------------------------------------


@query(
    "evt_interarrival_stats",
    """
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(avg(gap_us / 1000000.0), 4) AS avg_gap_s,
           round(min(gap_us) / 1000000.0, 4) AS min_gap_s,
           round(max(gap_us) / 1000000.0, 4) AS max_gap_s
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def evt_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival statistics over each user's timeline
    (gap = seconds since the user's previous event of ANY type,
    attributed to the later event's type). Window + small rollup: one
    shuffle on user_id, |types| output rows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.round(F.avg(F.col("gap_us") / 1_000_000.0), 4).alias("avg_gap_s"),
        F.round(F.min("gap_us") / 1_000_000.0, 4).alias("min_gap_s"),
        F.round(F.max("gap_us") / 1_000_000.0, 4).alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# Rolling daily active users.
# ---------------------------------------------------------------------------


@query(
    "evt_rolling_dau",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1
    )
    SELECT day, dau,
           CAST(sum(dau) OVER (ORDER BY day
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS dau_7d_sum,
           round(avg(dau) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 4) AS dau_7d_avg
    FROM daily
    """,
)
def evt_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users with a 7-day trailing sum/avg. The distinct
    count shuffles once on (day, user); the trailing window then runs
    over the DAILY rollup — |days| rows, so its single-partition sort
    is a driver-sized no-op at any event volume (the heavy input never
    sees a global order)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("dau"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "dau",
        F.sum("dau").over(w).cast("bigint").alias("dau_7d_sum"),
        F.round(F.avg("dau").over(w), 4).alias("dau_7d_avg"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation — recency / frequency / monetary quartile scoring.
# ---------------------------------------------------------------------------


@query(
    "evt_rfm_segments",
    """
    WITH u AS (
      SELECT user_id,
             max(ts) AS last_ts,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(12,2))) AS monetary
      FROM events GROUP BY user_id
    ), s AS (
      SELECT user_id, last_ts, n_events, monetary,
             ntile(4) OVER (ORDER BY last_ts ASC, user_id ASC) AS r_score,
             ntile(4) OVER (ORDER BY n_events ASC, user_id ASC) AS f_score,
             ntile(4) OVER (ORDER BY monetary ASC, user_id ASC) AS m_score
      FROM u
    )
    SELECT user_id, last_ts,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(round(monetary, 4) AS DOUBLE) AS monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM s
    """,
)
def evt_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (last event), frequency
    (event count) and monetary (exact DECIMAL value sum), each scored
    into quartiles (ntile(4), 4 = best), concatenated into the classic
    3-digit segment code. One user_id shuffle builds the per-user
    aggregate; the three ntiles then run over that aggregate — |users|
    rows, 3-4 orders below event count (the ORDER-BY-only window is a
    single global sort task; at billion-user scale swap to broadcast
    percentile cut-points, trading exact quartile boundaries).
    user_id tie-breaks make every ntile deterministic across engines;
    monetary ordering compares exact decimals, so no double-rounding
    flip can reorder the quartile edge."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("monetary"),
    )
    wr = Window.orderBy(F.col("last_ts").asc(), F.col("user_id").asc())
    wf = Window.orderBy(F.col("n_events").asc(), F.col("user_id").asc())
    wm = Window.orderBy(F.col("monetary").asc(), F.col("user_id").asc())
    s = (
        u.withColumn("r_score", F.ntile(4).over(wr))
        .withColumn("f_score", F.ntile(4).over(wf))
        .withColumn("m_score", F.ntile(4).over(wm))
    )
    return s.select(
        "user_id",
        "last_ts",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("monetary", 4).cast("double").alias("monetary"),
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"),
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


@query(
    "evt_power_user_curve",
    """
    WITH a AS (
      SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS n_days
      FROM events GROUP BY user_id
    )
    SELECT CAST(n_days AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM a GROUP BY n_days
    """,
)
def evt_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve (the "L28"-style engagement histogram): how
    many users were active on exactly N distinct days. The shape of
    this curve — smile vs decay — is the standard health read of an
    event stream. Plan: one user_id shuffle for the distinct-day
    count (countDistinct rides the same exchange), then a tiny
    histogram rollup (≤ |days| rows, map-side combined). Pure integer
    output — nothing to round."""
    ev = _t(spark, sf_dir, "events")
    a = ev.groupBy("user_id").agg(
        F.countDistinct(F.to_date("ts")).alias("n_days")
    )
    return a.groupBy("n_days").agg(
        F.count("*").cast("bigint").alias("n_users")
    ).select(
        F.col("n_days").cast("bigint").alias("n_active_days"), "n_users"
    )


@query(
    "evt_attribution_last_touch",
    """
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT coalesce(channel, '(none)') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS revenue
    FROM s
    WHERE event_type = 'purchase'
    GROUP BY coalesce(channel, '(none)')
    """,
)
def evt_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits its full
    value to the user's most recent PRECEDING non-purchase event type
    (the classic marketing-attribution baseline; '(none)' buckets
    purchases with no prior touch). The carry-forward is
    last(..., ignorenulls) over a rows-frame ending 1 PRECEDING —
    same single user_id shuffle as every query in this module; the
    channel rollup is |types| rows. Revenue sums ride DECIMAL(12,2)
    so no double-sum-order flip (the join_revenue_by_region lesson),
    surfaced as a rounded double."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        s.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("(none)")).alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "evt_scd2_status_history",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev
      FROM events
    ),
    runs AS (
      SELECT user_id, ts AS valid_from, event_id, event_type AS status
      FROM o WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, status, valid_from,
           lead(valid_from) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version
    FROM runs
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY valid_from ASC, event_id ASC)
    """,
)
def evt_scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    user's event-type stream into change RUNS and emit versioned
    validity intervals [valid_from, valid_to) — the temporal dimension
    table a warehouse maintains so facts can be joined to
    "the status as of that moment" (the as-of join family serves the
    point-in-time lookup; this operator builds the table). Run starts
    are lag()<>current (dedup-consecutive — NOT sessionize's gap rule);
    valid_to = next run's start, NULL = current row. One user_id
    shuffle; both windows and the row_number ride it. At 100 TB this
    is the standard CDC-compaction shape: O(changes) output rows from
    O(events) input."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    o = ev.withColumn("prev", F.lag("event_type").over(w))
    runs = o.where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.col("event_type").alias("status"),
    )
    # event_id tie-break: two runs CAN share a valid_from (same-ts
    # events of different types, split deterministically by the first
    # window's event_id order) — without it version/valid_to are
    # ambiguous on both engines and the hash gate can flake
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("valid_from").asc(), F.col("event_id").asc()
    )
    return runs.select(
        "user_id",
        "status",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )


@query(
    "evt_zorder_key",
    """
    WITH b AS (
      SELECT event_id, user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events
    ),
    z AS (
      SELECT event_id, user_id, CAST(day_idx AS BIGINT) AS day_idx,
             CAST(list_sum(list_transform(range(0, 16),
                    x -> ((greatest(0, least(user_id, 65535)) >> x) & 1)
                         * (CAST(1 AS BIGINT) << (2 * x))))
                + list_sum(list_transform(range(0, 16),
                    x -> ((greatest(0, least(CAST(day_idx AS BIGINT), 65535)) >> x) & 1)
                         * (CAST(1 AS BIGINT) << (2 * x + 1))))
               AS BIGINT) AS zkey
      FROM b
    )
    SELECT event_id, user_id, day_idx, zkey
    FROM z
    ORDER BY zkey ASC, event_id ASC
    LIMIT 100
    """,
)
def evt_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, day) — the
    write-layout operator for multi-column data skipping
    (operators/layout.py; Delta OPTIMIZE ZORDER's missing Spark
    built-in). Interleaving bits gives BOTH columns partial locality,
    so point/range filters on either prune row groups after a single
    clustered write. Pure integer shift/mask math — the oracle
    replays the key bit-for-bit; first 100 rows of the curve with an
    event_id tie-break. The layout write itself (range-partition +
    sort on this key) is exercised in pytest, where the clustered
    layout measurably concentrates a point filter into fewer files
    than a time-sorted one."""
    from env_event_stream_spark.operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    )
    z = b.withColumn(
        "zkey",
        zorder_key([F.col("user_id"), F.col("day_idx")], bits=16),
    )
    return z.orderBy(F.col("zkey").asc(), F.col("event_id").asc()).limit(100)


@query(
    "evt_value_percentiles_by_type",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           round(max(value), 4) AS p100
    FROM events GROUP BY event_type
    """,
)
def evt_value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type value percentiles (p50/p95/p99/max) — the SLA/
    distribution readout dashboards publish; the exact complement of
    agg_approx_sketches' approx_percentile tier (use approx at
    trillion-row interactive latencies, exact for the daily report).
    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition — verified bit-equal before rounding.
    Plan: percentile is a full-sort-per-group aggregate: one shuffle
    on event_type; with few hot types at 100 TB, pre-aggregate
    per-partition histograms or switch to the sketch tier — the trade
    both queries exist to offer."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.expr("percentile(value, 0.5D)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95D)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99D)"), 4).alias("p99"),
        F.round(F.max("value"), 4).alias("p100"),
    )


@query(
    "evt_rolling_p95_by_type",
    """
    WITH b AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             value
      FROM events
    )
    SELECT event_type, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(count(*) AS BIGINT) AS n_days_rows,
           round(max(p95), 4) AS p95_7d
    FROM (
      SELECT event_type, day_idx, value,
             quantile_cont(value, 0.95)
               OVER (PARTITION BY event_type ORDER BY day_idx
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS p95
      FROM b)
    GROUP BY event_type, day_idx
    """,
)
def evt_rolling_p95_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing p95 of event value per type — the SLA TREND
    line (evt_value_percentiles_by_type gives the point-in-time
    read; this shows drift). Exact windowed percentile over a RANGE
    frame on the day index: Spark `percentile(...) OVER (RANGE 6
    PRECEDING)` ≡ DuckDB windowed `quantile_cont` (linear
    interpolation on the identical frame), verified row-equal before
    rounding. One event_type shuffle carries window + rollup; with
    few hot types at 100 TB the per-type sort is the cost — swap to
    per-day t-digest merge when exactness can yield."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .alias("day_idx"),
        "value",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    return (
        b.withColumn("p95", F.expr("percentile(value, 0.95D)").over(w))
        .groupBy("event_type", F.col("day_idx").cast("bigint").alias("day_idx"))
        .agg(
            F.count("*").cast("bigint").alias("n_days_rows"),
            F.round(F.max("p95"), 4).alias("p95_7d"),
        )
    )


@query(
    "evt_hist_percentiles_by_type",
    """
    WITH mm AS (
      SELECT event_type, min(value) AS vmin, max(value) AS vmax,
             count(*) AS n,
             (max(value) - min(value)) / 128.0 AS w
      FROM events GROUP BY event_type),
    b AS (
      SELECT e.event_type,
             CASE WHEN vmax > vmin THEN
               CAST(least(floor((value - vmin) / w), 127) AS BIGINT)
             ELSE 0 END AS bin
      FROM events e JOIN mm USING (event_type)),
    h AS (SELECT event_type, bin, count(*) AS cnt
          FROM b GROUP BY 1, 2),
    c AS (SELECT event_type, bin, CAST(cnt AS DOUBLE) AS cnt,
                 CAST(sum(cnt) OVER (PARTITION BY event_type
                                     ORDER BY bin) AS DOUBLE) AS cum
          FROM h),
    qs AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS q),
    hit AS (
      SELECT event_type, q, min(bin) AS bin
      FROM c CROSS JOIN qs
      WHERE cum >= q * (SELECT n FROM mm m WHERE m.event_type = c.event_type)
      GROUP BY 1, 2),
    est AS (
      SELECT hit.event_type, hit.q, mm.n,
             CASE WHEN vmax > vmin THEN
               vmin + w * (hit.bin
                           + (hit.q * mm.n - (c.cum - c.cnt)) / c.cnt)
             ELSE vmin END AS hist_est
      FROM hit
      JOIN c ON c.event_type = hit.event_type AND c.bin = hit.bin
      JOIN mm ON mm.event_type = hit.event_type),
    ex AS (
      SELECT event_type,
             CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS q,
             unnest([quantile_cont(value, 0.5),
                     quantile_cont(value, 0.95),
                     quantile_cont(value, 0.99)]) AS exact
      FROM events GROUP BY event_type)
    SELECT est.event_type, est.q, CAST(est.n AS BIGINT) AS n,
           round(est.hist_est, 4) AS hist_est,
           round(ex.exact, 4) AS exact,
           round(est.hist_est - ex.exact, 4) AS err
    FROM est JOIN ex ON ex.event_type = est.event_type AND ex.q = est.q
    """,
)
def evt_hist_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-SKETCH percentile tier: a fixed 128-bin equi-width
    histogram per event_type, with p50/p95/p99 read off the
    cumulative counts by linear interpolation inside the hit bin —
    the t-digest-class answer to evt_value_percentiles_by_type's
    per-type full sort. The histogram is a map-side-combinable
    (type, bin) count: at 100 TB each partition emits ≤128 partial
    rows per type and NO value ever shuffles — this is the tier the
    exact query's docstring promises.

    Two narrow passes: (1) per-type min/max/count (scalar agg,
    broadcast back), (2) row-local binning + (type, bin) count. The
    quantile extraction runs over |types|×128 rows — driver-trivial.
    The EXACT percentile rides along as the accuracy readout (same
    recall-ladder philosophy as emb_*_recall_eval: the sketch ships
    with its measured error, here ≲ bin width = range/128); at
    production scale you'd drop the exact column — it is the cost
    being avoided. Deterministic: binning and interpolation are
    fixed double expressions replayed verbatim by the oracle."""
    ev = _t(spark, sf_dir, "events")
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("*").alias("n"),
        ((F.max("value") - F.min("value")) / F.lit(128.0)).alias("w"),
    )
    b = ev.join(F.broadcast(mm), "event_type").select(
        "event_type",
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor((F.col("value") - F.col("vmin")) / F.col("w")),
                F.lit(127),
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("bin"),
    )
    h = b.groupBy("event_type", "bin").agg(F.count("*").alias("cnt"))
    wc = Window.partitionBy("event_type").orderBy("bin")
    c = h.select(
        "event_type",
        "bin",
        F.col("cnt").cast("double").alias("cnt"),
        F.sum("cnt").over(wc).cast("double").alias("cum"),
    )
    qs = (
        c.sparkSession.range(1)
        .select(F.explode(F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("q"))
    )
    hit = (
        c.join(F.broadcast(mm.select("event_type", "n")), "event_type")
        .crossJoin(F.broadcast(qs))
        .where(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("event_type", "q")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        hit.join(c, ["event_type", "bin"])
        .join(F.broadcast(mm), "event_type")
        .select(
            "event_type",
            "q",
            F.col("n").cast("bigint").alias("n"),
            F.when(
                F.col("vmax") > F.col("vmin"),
                F.col("vmin")
                + F.col("w")
                * (
                    F.col("bin")
                    + (F.col("q") * F.col("n") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt")
                ),
            )
            .otherwise(F.col("vmin"))
            .alias("hist_est"),
        )
    )
    ex = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5D)").alias("e50"),
            F.expr("percentile(value, 0.95D)").alias("e95"),
            F.expr("percentile(value, 0.99D)").alias("e99"),
        )
        .select(
            "event_type",
            F.explode(
                F.array(
                    F.struct(F.lit(0.5).alias("q"), F.col("e50").alias("exact")),
                    F.struct(F.lit(0.95).alias("q"), F.col("e95").alias("exact")),
                    F.struct(F.lit(0.99).alias("q"), F.col("e99").alias("exact")),
                )
            ).alias("s"),
        )
        .select("event_type", F.col("s.q").alias("q"), F.col("s.exact").alias("exact"))
    )
    return est.join(ex, ["event_type", "q"]).select(
        "event_type",
        "q",
        "n",
        F.round("hist_est", 4).alias("hist_est"),
        F.round("exact", 4).alias("exact"),
        F.round(F.col("hist_est") - F.col("exact"), 4).alias("err"),
    )


@query(
    "evt_rolling_p95_hist_by_type",
    """
    WITH mm AS (
      SELECT event_type, min(value) AS vmin, max(value) AS vmax,
             (max(value) - min(value)) / 128.0 AS w
      FROM events GROUP BY event_type),
    d AS (
      SELECT e.event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx,
             CASE WHEN vmax > vmin THEN
               CAST(least(floor((value - vmin) / w), 127) AS BIGINT)
             ELSE 0 END AS bin
      FROM events e JOIN mm USING (event_type)),
    daily AS (SELECT event_type, day_idx, bin, count(*) AS cnt
              FROM d GROUP BY 1, 2, 3),
    days AS (SELECT DISTINCT event_type, day_idx FROM d),
    grid AS (SELECT event_type, day_idx, unnest(range(0, 128)) AS bin
             FROM days),
    base AS (SELECT g.event_type, g.day_idx, g.bin,
                    coalesce(daily.cnt, 0) AS cnt
             FROM grid g LEFT JOIN daily
               USING (event_type, day_idx, bin)),
    win AS (SELECT event_type, day_idx, bin,
                   sum(cnt) OVER (PARTITION BY event_type, bin
                                  ORDER BY day_idx
                                  RANGE BETWEEN 6 PRECEDING
                                        AND CURRENT ROW) AS mcnt
            FROM base),
    c AS (SELECT event_type, day_idx, bin,
                 CAST(mcnt AS DOUBLE) AS cnt,
                 CAST(sum(mcnt) OVER (PARTITION BY event_type, day_idx
                                      ORDER BY bin) AS DOUBLE) AS cum,
                 CAST(sum(mcnt) OVER (PARTITION BY event_type, day_idx)
                      AS DOUBLE) AS n7
          FROM win),
    hit AS (SELECT event_type, day_idx, min(bin) AS bin
            FROM c WHERE cum >= 0.95 * n7 GROUP BY 1, 2),
    est AS (SELECT hit.event_type, hit.day_idx, hit.bin,
                   c.cum, c.cnt, c.n7
            FROM hit JOIN c ON c.event_type = hit.event_type
                           AND c.day_idx = hit.day_idx
                           AND c.bin = hit.bin)
    SELECT est.event_type, CAST(est.day_idx AS BIGINT) AS day_idx,
           CAST(est.n7 AS BIGINT) AS n_7d,
           floor((CASE WHEN vmax > vmin THEN
                   vmin + w * (est.bin + (0.95 * est.n7
                                          - (est.cum - est.cnt)) / est.cnt)
                 ELSE vmin END) * 10000 + 0.5) / 10000 AS p95_7d_hist
    FROM est JOIN mm ON mm.event_type = est.event_type
    """,
)
def evt_rolling_p95_hist_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABILITY payoff of the histogram tier: 7-day trailing
    p95 per type computed by MERGING per-day histograms — the sketch
    twin of evt_rolling_p95_by_type, whose exact form re-sorts every
    window (its docstring names this query as the at-scale swap).
    Because equi-width histograms over a SHARED per-type bin grid
    merge by adding counts, the rolling window is a range-frame SUM
    over (type, bin) daily partials: events are scanned twice (global
    min/max, then daily bin counts) and NO value is ever sorted or
    re-shuffled per window.

    Everything after the daily (type, day, bin) counts runs on the
    fixed |types|×|days|×128 grid — size set by the calendar, not the
    corpus, so the window/cumsum/interpolation stages cost the same
    at 100 TB as at sf0.01. Deterministic double math replayed
    verbatim by the oracle; single-window accuracy is measured by
    evt_hist_percentiles_by_type's err column."""
    ev = _t(spark, sf_dir, "events")
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        ((F.max("value") - F.min("value")) / F.lit(128.0)).alias("w"),
    )
    d = ev.join(F.broadcast(mm), "event_type").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.floor((F.col("value") - F.col("vmin")) / F.col("w")),
                F.lit(127),
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("bin"),
    )
    daily = d.groupBy("event_type", "day_idx", "bin").agg(
        F.count("*").alias("cnt")
    )
    grid = (
        d.select("event_type", "day_idx")
        .distinct()
        .select(
            "event_type",
            "day_idx",
            F.explode(F.sequence(F.lit(0), F.lit(127))).alias("bin"),
        )
        .withColumn("bin", F.col("bin").cast("bigint"))
    )
    base = grid.join(daily, ["event_type", "day_idx", "bin"], "left").select(
        "event_type",
        "day_idx",
        "bin",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
    )
    wroll = (
        Window.partitionBy("event_type", "bin")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    win = base.withColumn("mcnt", F.sum("cnt").over(wroll))
    wcum = Window.partitionBy("event_type", "day_idx").orderBy("bin")
    wtot = Window.partitionBy("event_type", "day_idx")
    c = win.select(
        "event_type",
        "day_idx",
        "bin",
        F.col("mcnt").cast("double").alias("cnt"),
        F.sum("mcnt").over(wcum).cast("double").alias("cum"),
        F.sum("mcnt").over(wtot).cast("double").alias("n7"),
    )
    hit = (
        c.where(F.col("cum") >= F.lit(0.95) * F.col("n7"))
        .groupBy("event_type", "day_idx")
        .agg(F.min("bin").alias("bin"))
    )
    est = hit.join(c, ["event_type", "day_idx", "bin"])
    return est.join(F.broadcast(mm), "event_type").select(
        "event_type",
        "day_idx",
        F.col("n7").cast("bigint").alias("n_7d"),
        # floor(x*1e4+0.5)/1e4, NOT round(): a .00005 tie flips
        # between Spark's shortest-repr and DuckDB's raw-binary
        # rounding, while this is the same IEEE ops on both engines
        (
            F.floor(
                F.when(
                    F.col("vmax") > F.col("vmin"),
                    F.col("vmin")
                    + F.col("w")
                    * (
                        F.col("bin")
                        + (
                            F.lit(0.95) * F.col("n7")
                            - (F.col("cum") - F.col("cnt"))
                        )
                        / F.col("cnt")
                    ),
                ).otherwise(F.col("vmin"))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("p95_7d_hist"),
    )


@query(
    "evt_attribution_linear",
    """
    WITH base AS (
      SELECT user_id, ts, event_id, event_type, value,
             count(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS path_id
      FROM events),
    p AS (SELECT user_id, path_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM base WHERE event_type = 'purchase'),
    t AS (SELECT user_id, path_id, event_type,
                 row_number() OVER (PARTITION BY user_id, path_id
                                    ORDER BY ts ASC, event_id ASC) AS rn,
                 count(*) OVER (PARTITION BY user_id, path_id) AS n_t
          FROM base WHERE event_type <> 'purchase'),
    credited AS (
      SELECT t.event_type AS channel,
             p.cents // t.n_t
               + CASE WHEN t.rn <= p.cents % t.n_t THEN 1 ELSE 0 END AS c
      FROM p JOIN t ON t.user_id = p.user_id AND t.path_id = p.path_id),
    none_b AS (
      SELECT '(none)' AS channel, p.cents AS c
      FROM p LEFT JOIN (SELECT DISTINCT user_id, path_id FROM t) tt
        ON tt.user_id = p.user_id AND tt.path_id = p.path_id
      WHERE tt.user_id IS NULL),
    all_c AS (SELECT * FROM credited UNION ALL SELECT * FROM none_b)
    SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(c) AS DOUBLE) / 100 AS revenue
    FROM all_c GROUP BY channel
    """,
)
def evt_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR (even-split) revenue attribution — the multi-touch
    complement of evt_attribution_last_touch: each purchase's value
    splits equally across every touch on its conversion path (the
    touches since the user's previous purchase; pathless purchases
    bucket to '(none)').

    Money stays INTEGER END-TO-END: purchase value → exact cents via
    DECIMAL, per-touch share = cents DIV n, and the remainder cents
    go one each to the EARLIEST touches (rn <= cents % n) — so
    credit conservation is exact by construction (pytest pins
    sum(channels) == total revenue to the cent) and no float
    summation order exists anywhere. Plan: path_id is a running
    purchase count over the same single user_id window partition the
    module already pays; the credit join is keyed (user, path)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = ev.withColumn(
        "path_id",
        F.count(
            F.when(F.col("event_type") == "purchase", F.lit(1))
        ).over(w),
    )
    p = base.where(F.col("event_type") == "purchase").select(
        "user_id",
        "path_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    wt = Window.partitionBy("user_id", "path_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wn = Window.partitionBy("user_id", "path_id")
    t = base.where(F.col("event_type") != "purchase").select(
        "user_id",
        "path_id",
        "event_type",
        F.row_number().over(wt).alias("rn"),
        F.count("*").over(wn).alias("n_t"),
    )
    credited = p.join(t, ["user_id", "path_id"]).select(
        F.col("event_type").alias("channel"),
        (
            F.expr("cents DIV n_t")
            + F.when(F.col("rn") <= F.col("cents") % F.col("n_t"), 1).otherwise(0)
        ).alias("c"),
    )
    none_b = (
        p.join(
            t.select("user_id", "path_id").distinct(),
            ["user_id", "path_id"],
            "left_anti",
        )
        .select(F.lit("(none)").alias("channel"), F.col("cents").alias("c"))
    )
    return (
        credited.unionByName(none_b)
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_credits"),
            (F.sum("c").cast("double") / 100).alias("revenue"),
        )
    )


@query(
    "evt_user_growth_curve",
    """
    WITH d AS (
      SELECT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events),
    fs AS (SELECT user_id, min(day_idx) AS first_day FROM d GROUP BY user_id),
    newu AS (SELECT first_day AS day_idx, count(*) AS n_new
             FROM fs GROUP BY first_day),
    act AS (SELECT day_idx, count(DISTINCT user_id) AS n_active
            FROM d GROUP BY day_idx)
    SELECT CAST(act.day_idx AS BIGINT) AS day_idx,
           CAST(coalesce(newu.n_new, 0) AS BIGINT) AS n_new_users,
           CAST(sum(coalesce(newu.n_new, 0))
                  OVER (ORDER BY act.day_idx) AS BIGINT) AS cum_users,
           CAST(act.n_active AS BIGINT) AS n_active
    FROM act LEFT JOIN newu ON newu.day_idx = act.day_idx
    """,
)
def evt_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User growth curve: per day, first-time users, the cumulative
    registered-user count, and that day's actives (the DAU/total
    ratio dashboards track). first-seen = min day per user (one
    user_id agg), then everything runs on the |days| grid — the
    cumulative sum is integer, order-defined by the day ordering."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    )
    fs = d.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    newu = fs.groupBy(F.col("first_day").alias("day_idx")).agg(
        F.count("*").alias("n_new")
    )
    act = d.groupBy("day_idx").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    wcum = Window.orderBy("day_idx")
    return (
        act.join(newu, "day_idx", "left")
        .select(
            "day_idx",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
            "n_active",
        )
        .select(
            F.col("day_idx").cast("bigint").alias("day_idx"),
            F.col("n_new").cast("bigint").alias("n_new_users"),
            F.sum("n_new").over(wcum).cast("bigint").alias("cum_users"),
            F.col("n_active").cast("bigint").alias("n_active"),
        )
    )


# ---------------------------------------------------------------------------
# Time-to-convert: latency distribution from first signup to first
# subsequent purchase, by signup cohort week — the funnel family's
# "how long" counterpart to "how many".
# ---------------------------------------------------------------------------


@query(
    "evt_time_to_convert",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.st
      GROUP BY 1),
    lat AS (
      SELECT s.user_id,
             CAST(date_trunc('week', s.st) AS DATE) AS cohort_week,
             (epoch_us(p.pt) - epoch_us(s.st)) / 86400000000.0
               AS lat_days
      FROM s LEFT JOIN p USING (user_id))
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(count(lat_days) AS BIGINT) AS n_converted,
           floor(count(lat_days) * 1.0 / count(*) * 10000 + 0.5)
             / 10000 AS conv_rate,
           floor(quantile_cont(lat_days, 0.5) * 10000 + 0.5) / 10000
             AS p50_days,
           floor(quantile_cont(lat_days, 0.9) * 10000 + 0.5) / 10000
             AS p90_days
    FROM lat GROUP BY cohort_week
    """,
)
def evt_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency by signup cohort week:
    conversion rate plus p50/p90 days-to-convert — the "how long"
    counterpart to the funnel's "how many" (no existing query
    reports latency distributions).

    Determinism: latency is integer micros divided once by 86400e6
    (identical IEEE op both engines; DuckDB's epoch() seconds form
    would round differently), percentiles are the proven
    percentile ≡ quantile_cont pair, week truncation is ISO-Monday
    in both engines. Scale: one user_id shuffle shared by the two
    first-event aggregates and their join; the cohort rollup is
    |weeks| rows."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    lat = s.join(p, "user_id", "left").select(
        F.date_trunc("week", F.col("st")).cast("date").alias("cohort_week"),
        (
            (F.unix_micros(F.col("pt")) - F.unix_micros(F.col("st")))
            / F.lit(86400000000.0)
        ).alias("lat_days"),
    )
    return lat.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("n_signups"),
        F.count("lat_days").cast("bigint").alias("n_converted"),
        (
            F.floor(
                F.count("lat_days") * F.lit(1.0) / F.count("*") * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("conv_rate"),
        (
            F.floor(
                F.expr("percentile(lat_days, 0.5)") * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("p50_days"),
        (
            F.floor(
                F.expr("percentile(lat_days, 0.9)") * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("p90_days"),
    ).select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        "n_signups",
        "n_converted",
        "conv_rate",
        "p50_days",
        "p90_days",
    )


# ---------------------------------------------------------------------------
# Entity resolution on the customer dimension — blocking + Fellegi-
# Sunter-style attribute-weighted agreement scores + transitive
# clusters. Distinct semantics from the document dedup family: match
# evidence is a WEIGHTED VOTE ACROSS TYPED FIELDS (name edit
# distance, balance proximity), not one text-similarity measure.
# ---------------------------------------------------------------------------

_ER_SQL_SCORE = """
        CASE WHEN lev <= 1 THEN 4 WHEN lev <= 2 THEN 2 ELSE -2 END
        + CASE WHEN dbal <= 50 THEN 3 WHEN dbal <= 250 THEN 1
               ELSE -3 END"""
_ER_MATCH = 5  # strong name + near balance, or the converse


def _er_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked, Fellegi-Sunter-scored customer candidate pairs
    (k1, k2, lev, dbal, score) — shared by er_customer_entities
    (match at >= _ER_MATCH) and er_threshold_sensitivity (the knob
    audit over every threshold)."""
    cust = _t(spark, sf_dir, "customer")
    b = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 500).cast("bigint").alias("band"),
        "c_acctbal",
    )
    a, c = b.alias("a"), b.alias("c")
    pr = a.join(
        c,
        (F.col("a.c_nationkey") == F.col("c.c_nationkey"))
        & (F.col("a.c_mktsegment") == F.col("c.c_mktsegment"))
        & (F.col("a.band") == F.col("c.band"))
        & (F.col("a.c_custkey") < F.col("c.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("k1"),
        F.col("c.c_custkey").alias("k2"),
        F.levenshtein(F.col("a.c_name"), F.col("c.c_name")).alias("lev"),
        F.abs(F.col("a.c_acctbal") - F.col("c.c_acctbal")).alias("dbal"),
    )
    name_w = (
        F.when(F.col("lev") <= 1, 4)
        .when(F.col("lev") <= 2, 2)
        .otherwise(-2)
    )
    bal_w = (
        F.when(F.col("dbal") <= 50, 3)
        .when(F.col("dbal") <= 250, 1)
        .otherwise(-3)
    )
    return pr.withColumn("score", name_w + bal_w)


@query(
    "er_customer_entities",
    f"""
    WITH RECURSIVE b AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 500) AS BIGINT) AS band, c_acctbal
      FROM customer),
    pr AS (
      SELECT a.c_custkey AS k1, c.c_custkey AS k2,
             levenshtein(a.c_name, c.c_name) AS lev,
             abs(a.c_acctbal - c.c_acctbal) AS dbal
      FROM b a JOIN b c
        ON a.c_nationkey = c.c_nationkey
       AND a.c_mktsegment = c.c_mktsegment
       AND a.band = c.band AND a.c_custkey < c.c_custkey),
    m AS (
      SELECT k1, k2, ({_ER_SQL_SCORE}) AS score
      FROM pr WHERE ({_ER_SQL_SCORE}) >= {_ER_MATCH}),
    edges AS (SELECT k1 AS u, k2 AS v FROM m
              UNION SELECT k2, k1 FROM m),
    comp(node, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.v, c.label FROM comp c JOIN edges e ON e.u = c.node),
    cm AS (SELECT node, min(label) AS component FROM comp GROUP BY node),
    es AS (
      SELECT cm.component, count(*) AS n_edges,
             sum(m.score) AS score_sum, max(m.score) AS max_score
      FROM m JOIN cm ON cm.node = m.k1 GROUP BY cm.component)
    SELECT CAST(cm.component AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(any_value(es.n_edges) AS BIGINT) AS n_edges,
           CAST(any_value(es.max_score) AS BIGINT) AS max_score,
           floor(CAST(any_value(es.score_sum) AS DOUBLE)
                 / any_value(es.n_edges) * 10000 + 0.5) / 10000
             AS mean_score
    FROM cm JOIN es ON es.component = cm.component
    GROUP BY cm.component
    """,
)
def er_customer_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clusters over customers: candidate pairs
    from standard blocking (nation x market segment x 500-unit
    balance band), scored with integer Fellegi-Sunter agreement
    weights per field (name edit distance: +4 strong / +2 moderate /
    -2 disagree; account balance proximity: +3 / +1 / -3), matched at
    score >= 5, then transitive closure (min-label connected
    components) and a per-cluster rollup.

    INTEGER scores sidestep float-threshold ties entirely — the
    match set is exact on any engine. 100 TB shape: blocking keys
    bound every candidate block by construction (balance BANDS make
    the blow-up cap explicit — a block is one nation x segment x
    band), pair scoring is row-local levenshtein inside the block
    join, and the component propagation (operators/graph.py) is
    match-set-sized, tiny relative to the dimension. The one
    deliberate semantic: candidates must share the band, so a pair
    straddling a band boundary is unmatchable — the documented
    recall/cost trade every blocking scheme makes."""
    from env_event_stream_spark.operators.graph import (
        connected_components,
    )

    m = (
        _er_scored_pairs(spark, sf_dir)
        .where(F.col("score") >= _ER_MATCH)
        # LAZY (r16): connected_components' first-round probe
        # materializes the match set; an eager checkpoint was one
        # extra synchronous job (compute-once still holds via the
        # cache block locks).
        .localCheckpoint(eager=False)
    )
    comp = connected_components(m, "k1", "k2")
    es = (
        m.join(comp, m.k1 == comp.node)
        .groupBy("component")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum("score").alias("score_sum"),
            F.max("score").alias("max_score"),
        )
    )
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .join(es, "component")
        .select(
            F.col("component").cast("bigint").alias("cluster_id"),
            F.col("n_members").cast("bigint"),
            F.col("n_edges").cast("bigint"),
            F.col("max_score").cast("bigint"),
            (
                F.floor(
                    F.col("score_sum").cast("double")
                    / F.col("n_edges")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mean_score"),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time (temporal-table) join: facts enriched against the
# SCD2 dimension AS OF fact time — the lookup the SCD2 build exists
# to serve, exercised end-to-end: purchases joined into the validity
# interval of the user's state at purchase time.
# ---------------------------------------------------------------------------


@query(
    "join_scd2_point_in_time",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev
      FROM events WHERE event_type <> 'purchase'
    ),
    runs AS (
      SELECT user_id, ts AS valid_from, event_id, event_type AS status
      FROM o WHERE prev IS NULL OR prev <> event_type
    ),
    scd AS (
      SELECT user_id, status, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from ASC, event_id ASC)
               AS valid_to
      FROM runs
    ),
    p AS (SELECT user_id, ts AS pts, event_id, value
          FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT coalesce(s.status, '(none)') AS status_at_purchase,
             p.user_id, p.value
      FROM p LEFT JOIN scd s
        ON s.user_id = p.user_id
       AND p.pts >= s.valid_from
       AND (s.valid_to IS NULL OR p.pts < s.valid_to))
    SELECT status_at_purchase,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM j GROUP BY 1
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases enriched with the user's state AS OF purchase time:
    the SCD2 history (built over the non-purchase event stream, the
    evt_scd2_status_history shape) looked up with the point-in-time
    interval join every temporal warehouse serves — fact.ts lands in
    exactly one [valid_from, valid_to) per user by construction, so
    the join is key-equi + interval, never one-to-many. Purchases
    before any state ('(none)') stay visible via the left join
    instead of silently dropping. Rollup: purchases / buyers /
    DECIMAL revenue per state-at-purchase.

    100 TB shape: both sides shuffle once on user_id (the SCD2 build
    already runs on that partitioning, so the interval join reuses
    the exchange); the dimension is O(changes), facts stream past it
    sorted; the rollup is |states|-sized."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    o = ev.where(F.col("event_type") != "purchase").withColumn(
        "prev", F.lag("event_type").over(w)
    )
    runs = o.where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.col("event_type").alias("status"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("valid_from").asc(), F.col("event_id").asc()
    )
    scd = runs.select(
        "user_id",
        "status",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    j = p.join(
        scd,
        (p.user_id == scd.user_id)
        & (F.col("pts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("pts") < F.col("valid_to"))),
        "left",
    ).select(
        F.coalesce(F.col("status"), F.lit("(none)")).alias(
            "status_at_purchase"
        ),
        p.user_id.alias("uid"),
        "value",
    )
    return j.groupBy("status_at_purchase").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.countDistinct("uid").cast("bigint").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_value"),
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: hash-split arms, conversion rates, and the
# 2x2 chi-square test — the experimentation primitive the rest of
# the product-analytics family (funnels, cohorts, attribution)
# ultimately feeds.
# ---------------------------------------------------------------------------


@query(
    "evt_ab_test_conversion",
    """
    WITH w AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS mv
      FROM events),
    u AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS arm,
             max(CASE WHEN event_type = 'purchase' AND mv IS NOT NULL
                       AND us >= mv AND us < mv + 86400000000
                      THEN 1 ELSE 0 END) AS conv
      FROM w GROUP BY user_id),
    c AS (
      SELECT
        sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS a,
        sum(CASE WHEN arm = 0 THEN 1 - conv ELSE 0 END) AS b,
        sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS cc,
        sum(CASE WHEN arm = 1 THEN 1 - conv ELSE 0 END) AS d
      FROM u),
    s AS (
      SELECT *,
        CASE WHEN a + b > 0 AND cc + d > 0 AND a + cc > 0 AND b + d > 0
             THEN floor(CAST(a + b + cc + d AS DOUBLE)
                 * ((CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * cc)
                    * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * cc))
                 / (CAST(a + b AS DOUBLE) * CAST(cc + d AS DOUBLE)
                    * CAST(a + cc AS DOUBLE) * CAST(b + d AS DOUBLE))
                 * 10000 + 0.5) / 10000
        END AS chi2
      FROM c)
    SELECT CAST(a + b AS BIGINT) AS n_control,
           CAST(cc + d AS BIGINT) AS n_treatment,
           CAST(a AS BIGINT) AS conv_control,
           CAST(cc AS BIGINT) AS conv_treatment,
           CASE WHEN a + b > 0 THEN
             CAST((a * 20000 + (a + b)) // (2 * (a + b)) AS DOUBLE) / 10000
           END AS rate_control,
           CASE WHEN cc + d > 0 THEN
             CAST((cc * 20000 + (cc + d)) // (2 * (cc + d)) AS DOUBLE) / 10000
           END AS rate_treatment,
           chi2,
           chi2 > 3.8415 AS significant
    FROM s
    """,
)
def evt_ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout over a deterministic md5 hash split of users into
    two arms (the engine-reproducible assignment discipline every
    sampling op here uses — re-runs, engines and partitionings all
    agree on who is in which arm), conversion = any purchase inside
    [first view, first view + 1 day) — post-EXPOSURE only (~0.4 on
    this data; pre-exposure purchases and "any purchase ever" both
    contaminate the readout): per-arm sizes, conversion rates, the
    2x2 chi-square statistic n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    and significance at alpha = 0.05 (3.8415 = chi2_0.95, 1 dof); a
    degenerate margin yields NULL chi2 on both engines instead of a
    division error, and the statistic is computed in fixed-order
    DOUBLE so no bigint product can wrap at scale.

    Determinism: the four cells are integers off ONE user-grouped
    aggregation; (ad-bc)^2 and the margin product are computed in
    bigint (exact) and the statistic is two fixed-order IEEE ops —
    no summation-order exposure anywhere; rates use the integer
    floor-division. 100 TB shape: one user_id shuffle, then a
    4-scalar reduction; the readout is a single row."""
    ev = _t(spark, sf_dir, "events")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
               16, 10)
        .cast("bigint") % 2
    )
    # conversion = ANY purchase inside [first view, first view + 1
    # day) — purchases BEFORE the first exposure must not count
    # (review-pass catch: "first purchase < mv + 1d" alone classified
    # 73/150 users converted via pre-exposure purchases); the
    # exposure time rides a per-user window min, integer micros
    wuser = Window.partitionBy("user_id")
    mv = F.min(
        F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    ).over(wuser)
    w = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        mv.alias("mv"),
    )
    u = w.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("mv").isNotNull()
                & (F.col("us") >= F.col("mv"))
                & (F.col("us") < F.col("mv") + F.lit(86400000000)),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(arm.alias("arm"), "conv")
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("arm") == 0, 1 - F.col("conv")).otherwise(0)).alias("b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("cc"),
        F.sum(F.when(F.col("arm") == 1, 1 - F.col("conv")).otherwise(0)).alias("d"),
    )
    a, b, cc, d = F.col("a"), F.col("b"), F.col("cc"), F.col("d")
    # chi2 entirely in DOUBLE with one fixed operand order — bigint
    # products (ad-bc)^2 and the margin product wrap past n ~ 1e5
    # users while DuckDB's HUGEINT would not (review-pass catch);
    # identical IEEE sequences on both engines keep the hash exact,
    # and doubles never overflow
    diff = a.cast("double") * d - b.cast("double") * cc
    x2 = diff * diff
    den = (
        (a + b).cast("double")
        * (cc + d).cast("double")
        * (a + cc).cast("double")
        * (b + d).cast("double")
    )
    chi2 = F.when(
        (a + b > 0) & (cc + d > 0) & (a + cc > 0) & (b + d > 0),
        F.floor(
            (a + b + cc + d).cast("double") * x2 / den * 10000
            + F.lit(0.5)
        )
        / 10000,
    )
    return c.select(
        (a + b).cast("bigint").alias("n_control"),
        (cc + d).cast("bigint").alias("n_treatment"),
        a.cast("bigint").alias("conv_control"),
        cc.cast("bigint").alias("conv_treatment"),
        F.when(
            a + b > 0,
            F.expr("CAST((a * 20000 + (a + b)) div (2 * (a + b)) AS DOUBLE)")
            / 10000,
        ).alias("rate_control"),
        F.when(
            cc + d > 0,
            F.expr(
                "CAST((cc * 20000 + (cc + d)) div (2 * (cc + d)) AS DOUBLE)"
            )
            / 10000,
        ).alias("rate_treatment"),
        chi2.alias("chi2"),
        (chi2 > 3.8415).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Next-event prediction eval (the transition matrix's eval twin):
# does the first-order Markov model actually predict the next event
# better than the majority-class baseline, on held-out transitions?
# ---------------------------------------------------------------------------


@query(
    "evt_transition_eval",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER w AS next_type,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_ev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    t AS (SELECT user_id, event_type AS prev, next_type, rn, n_ev
          FROM s WHERE next_type IS NOT NULL),
    train AS (SELECT prev, next_type FROM t WHERE rn * 5 <= (n_ev - 1) * 4),
    test AS (SELECT prev, next_type FROM t WHERE rn * 5 > (n_ev - 1) * 4),
    tc AS (SELECT prev, next_type, count(*) AS c
           FROM train GROUP BY prev, next_type),
    pred AS (
      SELECT prev, next_type AS predicted
      FROM (SELECT prev, next_type,
                   row_number() OVER (PARTITION BY prev
                                      ORDER BY c DESC, next_type ASC) AS r
            FROM tc) x WHERE r = 1),
    base AS (
      SELECT next_type AS majority
      FROM (SELECT next_type, row_number() OVER
                     (ORDER BY count(*) DESC, next_type ASC) AS r
            FROM train GROUP BY next_type) x WHERE r = 1)
    SELECT test.prev,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN test.next_type = pred.predicted
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST((sum(CASE WHEN test.next_type = pred.predicted
                          THEN 1 ELSE 0 END) * 20000 + count(*))
                // (2 * count(*)) AS DOUBLE) / 10000 AS accuracy,
           CAST((sum(CASE WHEN test.next_type = base.majority
                          THEN 1 ELSE 0 END) * 20000 + count(*))
                // (2 * count(*)) AS DOUBLE) / 10000
             AS baseline_accuracy
    FROM test JOIN pred ON pred.prev = test.prev CROSS JOIN base
    GROUP BY test.prev
    """,
)
def evt_transition_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out eval of first-order Markov next-event prediction:
    each user's first ~80% of transitions train the global transition
    counts, the rest are scored — per previous-type: test size,
    correct argmax predictions, accuracy, and the majority-class
    baseline accuracy. The evt_transition_matrix family's honesty
    check (a transition model that can't beat the global majority
    class isn't modeling sequence structure).

    Determinism: the train/test split is positional integer
    arithmetic (rn*5 <= (n_ev-1)*4 — no floats, no sampling), the
    argmax is count-desc with lexicographic tie-break, accuracies
    ride the integer floor-division. One user_id shuffle builds the
    transitions; train counts are |types|^2; everything downstream is
    grid-sized."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    s = ev.select(
        "user_id",
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_ev"),
    ).where(F.col("next_type").isNotNull())
    train = s.where(F.col("rn") * 5 <= (F.col("n_ev") - 1) * 4)
    test = s.where(F.col("rn") * 5 > (F.col("n_ev") - 1) * 4)
    tc = train.groupBy("prev", "next_type").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("prev").orderBy(
        F.col("c").desc(), F.col("next_type").asc()
    )
    pred = (
        tc.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") == 1)
        .select("prev", F.col("next_type").alias("predicted"))
    )
    base = (
        train.groupBy("next_type")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("next_type").asc())
        .limit(1)
        .select(F.col("next_type").alias("majority"))
    )
    j = (
        test.join(F.broadcast(pred), "prev")
        .crossJoin(F.broadcast(base))
    )
    correct = F.sum(
        F.when(F.col("next_type") == F.col("predicted"), 1).otherwise(0)
    )
    base_correct = F.sum(
        F.when(F.col("next_type") == F.col("majority"), 1).otherwise(0)
    )
    return j.groupBy("prev").agg(
        F.count("*").cast("bigint").alias("n_test"),
        correct.cast("bigint").alias("n_correct"),
        (
            F.expr(
                "CAST((sum(CASE WHEN next_type = predicted THEN 1 ELSE 0 END)"
                " * 20000 + count(*)) div (2 * count(*)) AS DOUBLE)"
            )
            / 10000
        ).alias("accuracy"),
        (
            F.expr(
                "CAST((sum(CASE WHEN next_type = majority THEN 1 ELSE 0 END)"
                " * 20000 + count(*)) div (2 * count(*)) AS DOUBLE)"
            )
            / 10000
        ).alias("baseline_accuracy"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U shift test — the nonparametric two-sample test the
# KS rung doesn't cover (the ACF / Spearman siblings live in
# forecast_queries.py with the rest of the daily-grid family).
# ---------------------------------------------------------------------------


_MW_Z_EXPR = (
    "CASE WHEN n1 = 0 OR n = n1 OR n < 2 "
    "OR ties = n * n * n - n THEN NULL "
    "ELSE floor((CAST(r1d - n1 * (n1 + 1) - n1 * (n - n1) AS DOUBLE) "
    "/ (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0 "
    "* (CAST(n + 1 AS DOUBLE) - CAST(ties AS DOUBLE) "
    "/ (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))))) "
    "* 10000 + 0.5) / 10000 END"
)


_MW_ORACLE_SQL = f"""
    WITH ev AS (SELECT event_type, value FROM events
                WHERE value IS NOT NULL),
    v AS (SELECT value, count(*) AS m FROM ev GROUP BY value),
    rv AS (SELECT value, m,
                  2 * (sum(m) OVER (ORDER BY value) - m) + m + 1 AS dr
           FROM v),
    tot AS (SELECT sum(m) AS n, sum(m * m * m - m) AS ties FROM v),
    t AS (SELECT event_type, value, count(*) AS c1
          FROM ev GROUP BY 1, 2),
    agg AS (SELECT t.event_type, sum(t.c1) AS n1,
                   sum(t.c1 * rv.dr) AS r1d
            FROM t JOIN rv ON rv.value = t.value GROUP BY 1),
    z AS (SELECT event_type, n1, n - n1 AS n2,
                 r1d - n1 * (n1 + 1) AS u_doubled,
                 {_MW_Z_EXPR} AS zval
          FROM agg CROSS JOIN tot)
    SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(u_doubled AS BIGINT) AS u_doubled, zval AS z,
           CASE WHEN zval IS NULL THEN NULL
                ELSE abs(zval) > 1.96 END AS shifted
    FROM z
    """


@query("evt_mannwhitney_shift", _MW_ORACLE_SQL)
def evt_mannwhitney_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) shift test: does each event
    type's `value` distribution sit HIGHER or LOWER than the pooled
    rest? The nonparametric two-sample location test the KS rung
    (evt_value_drift_ks: max ECDF gap = shape change) doesn't cover —
    U is powered for median shifts, KS for any-shape divergence;
    together they're the standard drift pair. One-vs-rest per type
    needs only ONE global ranking, because each type's pooled
    comparison set is the whole table.

    DOUBLED average ranks over DISTINCT values (2*avg_rank = 2*
    cum_before + tie_count + 1 is always integral) make the rank sum
    R1 and U exact order-free bigints; the tie-corrected normal
    z-score is ONE fixed-order double expression over exact integers
    (identical text on both engines, tie-free 4dp floor), NULL on
    degenerate margins (empty group, all-one-group, all ties) rather
    than a divide-by-zero. Overflow is LOUD: assert_true bounds n at
    2^31 (r1d <= 2n^2) and tie-group sizes at 2^20 (m^3); DuckDB's
    checked bigint arithmetic errors on its own. Plan: the ranking
    window runs over DISTINCT values (value-domain-sized, not
    row-count-sized — the evt_value_percentiles exact-tier argument);
    everything else is two map-side-combinable aggregations and a
    value-keyed equi-join. At 100 TB the value domain is the bound to
    watch — quantize or block-rank if it approaches row scale.
    Reference analog: none; §2.11 statistics extension surface."""
    # NULL values are excluded EXPLICITLY: the ranking window orders
    # by value, and the engines disagree on NULL placement (Spark
    # NULLS FIRST asc, DuckDB NULLS LAST) — a latent divergence on
    # data with missing measurements (none at the tested SFs).
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = ev.groupBy("value").agg(F.count("*").alias("m")).where(
        F.assert_true(
            F.col("m") < F.lit(2**20),
            F.lit(
                "evt_mannwhitney_shift: tie group > 2^20 — m^3 in the "
                "tie correction would overflow int64"
            ),
        ).isNull()
    )
    wv = Window.orderBy("value")
    rv = v.select(
        "value",
        (
            F.lit(2) * (F.sum("m").over(wv) - F.col("m"))
            + F.col("m")
            + F.lit(1)
        ).alias("dr"),
    )
    tot = v.agg(
        F.sum("m").alias("n"),
        F.sum(
            F.col("m") * F.col("m") * F.col("m") - F.col("m")
        ).alias("ties"),
    ).where(
        F.assert_true(
            F.col("n") < F.lit(2**31),
            F.lit(
                "evt_mannwhitney_shift: n >= 2^31 — doubled rank sums "
                "would overflow int64; block-rank at this scale"
            ),
        ).isNull()
    )
    t = ev.groupBy("event_type", "value").agg(F.count("*").alias("c1"))
    agg = (
        t.join(rv, "value")
        .groupBy("event_type")
        .agg(
            F.sum("c1").alias("n1"),
            F.sum(F.col("c1") * F.col("dr")).alias("r1d"),
        )
    )
    z = agg.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        (F.col("r1d") - F.col("n1") * (F.col("n1") + 1)).alias(
            "u_doubled"
        ),
        F.expr(_MW_Z_EXPR).alias("zval"),
    )
    return z.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("u_doubled").cast("bigint").alias("u_doubled"),
        F.col("zval").alias("z"),
        F.when(
            F.col("zval").isNull(), F.lit(None).cast("boolean")
        )
        .otherwise(F.abs(F.col("zval")) > F.lit(1.96))
        .alias("shifted"),
    )


# ---------------------------------------------------------------------------
# Layout rung 3: the z-order PAYOFF measurement — evt_zorder_key
# computes the curve key; this eval measures what it buys (files
# pruned by min/max stats under each layout), the recall-eval
# discipline applied to data layout.
# ---------------------------------------------------------------------------


_ZP_FILES = 64

_ZP_ZKEY_SQL = """
             CAST(list_sum(list_transform(range(0, 16),
                    x -> ((greatest(0, least(user_id, 65535)) >> x) & 1)
                         * (CAST(1 AS BIGINT) << (2 * x))))
                + list_sum(list_transform(range(0, 16),
                    x -> ((greatest(0, least(CAST(day_idx AS BIGINT),
                                             65535)) >> x) & 1)
                         * (CAST(1 AS BIGINT) << (2 * x + 1))))
               AS BIGINT)"""

# (probe, user_lo, user_hi, day_lo, day_hi) — NULL bound = unbounded
_ZP_PROBES = [
    ("day 10-12", "NULL", "NULL", "10", "12"),
    ("user 100-199", "100", "199", "NULL", "NULL"),
    ("user 100-199 & day 10-12", "100", "199", "10", "12"),
    ("day = 20", "NULL", "NULL", "20", "20"),
]


def _zorder_pruning_oracle() -> str:
    probes = ",\n        ".join(
        f"('{p}', {ul}, {uh}, {dl}, {dh})"
        for p, ul, uh, dl, dh in _ZP_PROBES
    )
    return f"""
    WITH b AS (
      SELECT event_id, user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS day_idx
      FROM events),
    z AS (SELECT event_id, user_id, CAST(day_idx AS BIGINT) AS day_idx,
                 {_ZP_ZKEY_SQL} AS zkey
          FROM b),
    n AS (SELECT count(*) AS n,
                 (count(*) + {_ZP_FILES - 1}) // {_ZP_FILES} AS rpf
          FROM z),
    lin AS (SELECT z.user_id, z.day_idx,
                   (row_number() OVER (ORDER BY z.user_id, z.event_id)
                    - 1) // n.rpf AS f
            FROM z CROSS JOIN n),
    zo AS (SELECT z.user_id, z.day_idx,
                  (row_number() OVER (ORDER BY z.zkey, z.event_id)
                   - 1) // n.rpf AS f
           FROM z CROSS JOIN n),
    stats AS (
      SELECT 'linear' AS layout, f, min(user_id) AS umin,
             max(user_id) AS umax, min(day_idx) AS dmin,
             max(day_idx) AS dmax
      FROM lin GROUP BY f
      UNION ALL
      SELECT 'zorder', f, min(user_id), max(user_id),
             min(day_idx), max(day_idx)
      FROM zo GROUP BY f),
    probes(probe, ulo, uhi, dlo, dhi) AS (VALUES
        {probes}),
    touch AS (
      SELECT p.probe, s.layout, count(*) AS files_touched
      FROM probes p JOIN stats s
        ON (p.ulo IS NULL OR s.umax >= p.ulo)
       AND (p.uhi IS NULL OR s.umin <= p.uhi)
       AND (p.dlo IS NULL OR s.dmax >= p.dlo)
       AND (p.dhi IS NULL OR s.dmin <= p.dhi)
      GROUP BY 1, 2),
    tot AS (SELECT count(DISTINCT f) AS files_total FROM lin)
    SELECT p.probe,
           CAST(max(tot.files_total) AS BIGINT) AS files_total,
           CAST(coalesce(max(CASE WHEN t.layout = 'linear'
                         THEN t.files_touched END), 0) AS BIGINT)
             AS files_linear,
           CAST(coalesce(max(CASE WHEN t.layout = 'zorder'
                         THEN t.files_touched END), 0) AS BIGINT)
             AS files_zorder
    FROM probes p
    CROSS JOIN tot
    LEFT JOIN touch t ON t.probe = p.probe
    GROUP BY p.probe
    """


@query("evt_zorder_pruning_eval", _zorder_pruning_oracle())
def evt_zorder_pruning_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order payoff, MEASURED (the ANN-recall-eval discipline
    applied to layout): split the table into 64 equal "files" two
    ways — sorted linearly by user_id vs sorted by the Morton key —
    compute each file's min/max stats on both dimensions (what
    parquet footers store), and count files a min/max-pruning scan
    must touch for four probe predicates. The expected verdict this
    query exists to show with numbers: linear wins its own sort
    column, reads EVERYTHING on the other column; z-order pays a
    little on each but prunes on BOTH — the justification for
    write_zordered at 100 TB.

    Deterministic by construction: integer Morton key (the
    evt_zorder_key expression, operators/layout.py:zorder_key),
    row_number with event_id tie-break, ceil-division file
    assignment, integer stats and overlap tests — no floats anywhere.
    The two global sorts are the MEASUREMENT shape at test scale;
    production writes use repartitionByRange (distributed range
    sort), and the min/max pruning math is identical — this eval's
    file-count ratios are what the real layout buys. Reference
    analog: none; §2.11 layout extension surface beside
    evt_zorder_key and evt_compaction_plan."""
    from env_event_stream_spark.operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events")
    z = ev.select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).withColumn(
        "zkey", zorder_key([F.col("user_id"), F.col("day_idx")], bits=16)
    )
    n = z.agg(
        F.count("*").alias("n"),
        F.expr(
            f"CAST((count(*) + {_ZP_FILES - 1}) div {_ZP_FILES} "
            "AS BIGINT)"
        ).alias("rpf"),
    )
    zc = z.crossJoin(F.broadcast(n))
    lin = zc.select(
        "user_id",
        "day_idx",
        F.expr(
            "CAST((row_number() OVER (ORDER BY user_id, event_id) - 1) "
            "div rpf AS BIGINT)"
        ).alias("f"),
    )
    zo = zc.select(
        "user_id",
        "day_idx",
        F.expr(
            "CAST((row_number() OVER (ORDER BY zkey, event_id) - 1) "
            "div rpf AS BIGINT)"
        ).alias("f"),
    )
    stats = (
        lin.groupBy("f")
        .agg(
            F.min("user_id").alias("umin"),
            F.max("user_id").alias("umax"),
            F.min("day_idx").alias("dmin"),
            F.max("day_idx").alias("dmax"),
        )
        .select(F.lit("linear").alias("layout"), "*")
        .unionByName(
            zo.groupBy("f")
            .agg(
                F.min("user_id").alias("umin"),
                F.max("user_id").alias("umax"),
                F.min("day_idx").alias("dmin"),
                F.max("day_idx").alias("dmax"),
            )
            .select(F.lit("zorder").alias("layout"), "*")
        )
    )
    probes = small_model_frame(
        spark,
        [
            (
                p,
                None if ul == "NULL" else int(ul),
                None if uh == "NULL" else int(uh),
                None if dl == "NULL" else int(dl),
                None if dh == "NULL" else int(dh),
            )
            for p, ul, uh, dl, dh in _ZP_PROBES
        ],
        "probe string, ulo long, uhi long, dlo long, dhi long",
    )
    touch = (
        F.broadcast(probes)
        .join(
            stats,
            (F.col("ulo").isNull() | (F.col("umax") >= F.col("ulo")))
            & (F.col("uhi").isNull() | (F.col("umin") <= F.col("uhi")))
            & (F.col("dlo").isNull() | (F.col("dmax") >= F.col("dlo")))
            & (F.col("dhi").isNull() | (F.col("dmin") <= F.col("dhi"))),
        )
        .groupBy("probe", "layout")
        .agg(F.count("*").alias("files_touched"))
    )
    tot = lin.agg(
        F.countDistinct("f").alias("files_total")
    )
    return (
        F.broadcast(probes)
        .crossJoin(F.broadcast(tot))
        .join(touch, "probe", "left")
        .groupBy("probe")
        .agg(
            F.max("files_total").cast("bigint").alias("files_total"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("layout") == "linear",
                        F.col("files_touched"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("files_linear"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("layout") == "zorder",
                        F.col("files_touched"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("files_zorder"),
        )
    )


# ---------------------------------------------------------------------------
# Top user journeys: the Sankey/path-analysis rung — which opening
# event sequences dominate? Complements the FIRST-ORDER transition
# matrix (Markov forgets everything past one step) with literal
# multi-step path counts.
# ---------------------------------------------------------------------------


_PATH_PREFIX = 5
_PATH_TOPK = 20


_TOP_PATHS_ORACLE = f"""
    WITH s AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                          WHEN 'signup' THEN 's' ELSE 'x' END,
                        '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY 1, 2),
    p AS (SELECT substr(seq, 1, {_PATH_PREFIX}) AS path,
                 len(seq) >= {_PATH_PREFIX} AS complete
          FROM s)
    SELECT path, CAST(count(*) AS BIGINT) AS n_user_days,
           CAST(sum(CASE WHEN complete THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full_length
    FROM p GROUP BY path
    ORDER BY n_user_days DESC, path ASC
    LIMIT {_PATH_TOPK}
    """


@query("evt_top_paths", _TOP_PATHS_ORACLE)
def evt_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 opening user journeys: each user-day's event sequence
    (ordered by ts, event_id — the CEP family's initials string)
    truncated to its first 5 steps, counted across the corpus — the
    Sankey-diagram feed, and the multi-step complement to
    evt_transition_matrix (a first-order chain can't tell 'vcvcp'
    from 'vvccp'; path counts can). n_full_length separates complete
    5-step journeys from short days that end early.

    Deterministic: the initials mapping and (ts, event_id) ordering
    are the pinned evt_cep_pattern construction (Spark array_sort of
    (ts, event_id, ini) structs == DuckDB string_agg ORDER BY);
    counts are integers and the top-20 ties break on the path string
    via TakeOrderedAndProject. Plan: one user-day shuffle shared with
    the whole CEP/funnel family, then a path-count aggregation over
    user-day rows. Reference analog: none; §2.11 product-analytics
    extension surface."""
    from env_event_stream_spark.cep_queries import _cep_initial
    from env_event_stream_spark.operators.relational import top_k

    ev = _t(spark, sf_dir, "events")
    ini = _cep_initial()
    s = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").cast("string").alias("day"),
            F.struct(
                F.col("ts"), F.col("event_id"), ini.alias("ini")
            ).alias("st"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("st")),
                    lambda x: x["ini"],
                ),
                "",
            ).alias("seq")
        )
    )
    p = s.select(
        F.substring("seq", 1, _PATH_PREFIX).alias("path"),
        (F.length("seq") >= _PATH_PREFIX).alias("complete"),
    )
    agg = p.groupBy("path").agg(
        F.count("*").cast("bigint").alias("n_user_days"),
        F.sum(F.when(F.col("complete"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_full_length"),
    )
    return top_k(
        agg,
        [F.col("n_user_days").desc(), F.col("path").asc()],
        _PATH_TOPK,
    )


# ---------------------------------------------------------------------------
# Sequential-pattern support: "how often does A happen before B in a
# session-day" — the support-counting rung of sequence mining
# (PrefixSpan's first level), between the transition matrix (adjacent
# steps only) and evt_top_paths (literal prefixes only).
# ---------------------------------------------------------------------------


_SEQ_PAIR_ORACLE = """
    WITH s AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM events GROUP BY 1, 2, 3),
    days AS (SELECT count(*) AS n_days FROM
               (SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events)),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_days_ab
      FROM s a JOIN s b
        ON b.user_id = a.user_id AND b.day = a.day
       AND a.event_type <> b.event_type
       AND a.first_ts < b.last_ts
      GROUP BY 1, 2),
    m AS (SELECT event_type, count(*) AS n_days_t FROM s GROUP BY 1)
    SELECT p.type_a, p.type_b,
           CAST(p.n_days_ab AS BIGINT) AS n_days_ab,
           CAST(ma.n_days_t AS BIGINT) AS n_days_a,
           CAST(mb.n_days_t AS BIGINT) AS n_days_b,
           CAST((p.n_days_ab * 1000000) // days.n_days AS BIGINT)
             AS support_ppm,
           CAST((p.n_days_ab * days.n_days * 1000)
                // (ma.n_days_t * mb.n_days_t) AS BIGINT) AS lift_milli
    FROM pair p
    JOIN m ma ON ma.event_type = p.type_a
    JOIN m mb ON mb.event_type = p.type_b
    CROSS JOIN days
    """


@query("evt_seq_pair_support", _SEQ_PAIR_ORACLE)
def evt_seq_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pair support over user-day sessions: for every
    ordered type pair (a, b), the number of user-days where some a
    precedes some b ('a happened before b' = first(a) < last(b)),
    with per-type day counts, support in ppm of all user-days, and
    lift vs independence — sequence mining's level-1 support table,
    sitting between evt_transition_matrix (adjacent steps only, so
    'v...p with noise between' is invisible) and evt_assoc_rules
    (unordered baskets, so direction is invisible).

    The first(a) < last(b) precedence test needs only ONE row per
    (user, day, type) — min/max ts — so the corpus collapses in a
    map-side-combinable aggregation FIRST and the precedence self-join
    runs on session-type rows (|user-days| × |types|, bounded by the
    type alphabet), never on raw events: the same shuffle the whole
    funnel/CEP family shares. All counts and ratios are integer floor
    divisions on nonneg operands; lift_milli's worst-case product is
    n_days_ab * n_days * 1000 ≤ n_days^2 * 1000 (n_days_ab ≤ n_days),
    which stays inside int64 only while n_days < ~9.6e7 — the
    assert_true pins n_days < 9e7 so the stated overflow protection
    actually holds (Spark wraps silently in non-ANSI mode).
    Reference analog: none; §2.11 product-analytics extension."""
    return seq_pair_finalize(
        seq_grid_agg(_t(spark, sf_dir, "events"))
    )


def seq_grid_agg(ev: DataFrame) -> DataFrame:
    """The (user_id, day, event_type) first/last-ts session grid —
    min/max merge across micro-batches, so it doubles as the
    complete-mode streaming state of evt_stream_seq_pairs (a THIRD
    mergeable-state class for the matview family, after + counts and
    max registers)."""
    return ev.groupBy(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
    ).agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))


def seq_pair_finalize(s: DataFrame) -> DataFrame:
    """The precedence-support readout over a session grid — shared
    source-level by the batch query above and the streaming twin."""
    days = (
        s.select("user_id", "day")
        .distinct()
        .agg(F.count("*").alias("n_days"))
        .where(
            F.assert_true(
                F.col("n_days") < F.lit(90_000_000),
                F.lit(
                    "evt_seq_pair_support: n_days >= 9e7 — "
                    "n_days^2 * 1000 could overflow int64"
                ),
            ).isNull()
        )
    )
    b = s.select(
        F.col("user_id").alias("user_id"),
        F.col("day").alias("day"),
        F.col("event_type").alias("type_b"),
        F.col("last_ts").alias("last_ts"),
    )
    pair = (
        s.select(
            "user_id",
            "day",
            F.col("event_type").alias("type_a"),
            "first_ts",
        )
        .join(b, ["user_id", "day"])
        .where(
            (F.col("type_a") != F.col("type_b"))
            & (F.col("first_ts") < F.col("last_ts"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_days_ab"))
    )
    m = s.groupBy("event_type").agg(F.count("*").alias("n_days_t"))
    ma = m.select(
        F.col("event_type").alias("type_a"),
        F.col("n_days_t").alias("n_days_a"),
    )
    mb = m.select(
        F.col("event_type").alias("type_b"),
        F.col("n_days_t").alias("n_days_b"),
    )
    return (
        pair.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(days))
        .select(
            "type_a",
            "type_b",
            F.col("n_days_ab").cast("bigint").alias("n_days_ab"),
            F.col("n_days_a").cast("bigint").alias("n_days_a"),
            F.col("n_days_b").cast("bigint").alias("n_days_b"),
            F.expr(
                "CAST((n_days_ab * 1000000) div n_days AS BIGINT)"
            ).alias("support_ppm"),
            F.expr(
                "CAST((n_days_ab * n_days * 1000) div "
                "(n_days_a * n_days_b) AS BIGINT)"
            ).alias("lift_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution: the long-run event-type mix under
# the observed per-user dynamics — completing the Markov trio
# (evt_transition_matrix: the model; evt_transition_eval: its
# predictive power; THIS: its equilibrium + mixing diagnostic).
# ---------------------------------------------------------------------------


_MS_UNIT = 10**12
_MS_ITERS = 4


def _markov_stationary_oracle() -> str:
    ctes = [
        """seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)""",
        """c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
           FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)""",
        "r AS (SELECT a, sum(n) AS r FROM c GROUP BY a)",
        """st AS (SELECT DISTINCT event_type AS t FROM
             (SELECT a AS event_type FROM c
              UNION ALL SELECT b FROM c))""",
        "nn AS (SELECT count(*) AS n FROM st)",
        f"""p0 AS (SELECT t, CAST({_MS_UNIT} // nn.n AS BIGINT) AS pi
             FROM st CROSS JOIN nn)""",
    ]
    prev = "p0"
    for k in range(1, _MS_ITERS + 1):
        ctes.append(
            f"""p{k} AS (
          SELECT st.t,
                 CAST(coalesce(m.total, 0)
                      + CASE WHEN r2.r IS NULL THEN pp.pi ELSE 0 END
                   AS BIGINT) AS pi
          FROM st
          JOIN {prev} pp ON pp.t = st.t
          LEFT JOIN r r2 ON r2.a = st.t
          LEFT JOIN (
            SELECT c.b AS t, sum(({prev}.pi * c.n) // r.r) AS total
            FROM c
            JOIN {prev} ON {prev}.t = c.a
            JOIN r ON r.a = c.a
            GROUP BY c.b) m ON m.t = st.t)"""
        )
        prev = f"p{k}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT f.t AS event_type, CAST(f.pi AS BIGINT) AS pi_units,
           CAST(pv.pi AS BIGINT) AS pi_prev_units,
           CAST(abs(f.pi - pv.pi) AS BIGINT) AS delta_units,
           CAST((mar.n_next * 1000000) // tot.n_all AS BIGINT)
             AS marginal_ppm
    FROM {prev} f
    JOIN p{_MS_ITERS - 1} pv ON pv.t = f.t
    JOIN (SELECT b, sum(n) AS n_next FROM c GROUP BY b) mar
      ON mar.b = f.t
    CROSS JOIN (SELECT sum(n) AS n_all FROM c) tot
    """
    )


@query("evt_markov_stationary", _markov_stationary_oracle())
def evt_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type chain by
    power iteration (4 rounds from uniform), beside the observed
    marginal — "where does user behavior SETTLE vs where is it
    now", plus the per-type delta between the last two iterates as
    the mixing diagnostic (small deltas = the chain has mixed, the
    stationary read is trustworthy; large = report it, don't trust
    it). Types with no outgoing transitions keep their mass
    (absorbing-safe, no silent leakage).

    INTEGER-EXACT power iteration: mass in 10^12 micro-units,
    per-edge transfer = (pi·n) DIV row_total (the pagerank_int
    discipline — bigint sums are order-free, so 4 iterations of
    linear algebra survive the cross-engine value hash); the matrix
    is the |types|² aggregated transition count frame, so every
    iteration is arithmetic over a tiny broadcastable table — the
    corpus is touched ONCE (the HW-on-grid shape applied to the
    Markov family). Oracle replays every iteration as chained CTEs.
    Reference analog: none; §2.11 time-series/behavioral extension
    surface."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    # r16 (guide §1.2 step 1): the corpus contributes exactly ONE
    # aggregation — the |types|^2 transition-count matrix (~25 rows
    # here; bounded by event-type cardinality squared). The power
    # iteration itself is driver-scale linear algebra, so it runs as
    # exact Python ints over the collected matrix instead of 4
    # checkpoint-barriered Spark rounds of joins over a ~25-row frame
    # (was 54 stages of pure orchestration). Model-sized collect —
    # the kmeans-centroid precedent; every operation below replays
    # the former Spark loop op-for-op in bigint (div on nonneg ==
    # //), so the output is bit-identical (oracle-pinned).
    rows = seq.groupBy("a", "b").agg(F.count("*").alias("n")).collect()
    cnt = {(row.a, row.b): int(row.n) for row in rows}
    r = {}
    n_next: dict = {}
    for (a, b), n in cnt.items():
        r[a] = r.get(a, 0) + n
        n_next[b] = n_next.get(b, 0) + n
    types = sorted({t for ab in cnt for t in ab})
    n_all = sum(cnt.values())
    pi = {t: _MS_UNIT // len(types) for t in types}
    for _ in range(_MS_ITERS):
        prev = pi
        inc: dict = {}
        for (a, b), n in cnt.items():
            inc[b] = inc.get(b, 0) + (prev[a] * n) // r[a]
        pi = {
            t: inc.get(t, 0) + (prev[t] if t not in r else 0)
            for t in types
        }
    out = [
        (
            t,
            pi[t],
            prev[t],
            abs(pi[t] - prev[t]),
            (n_next[t] * 1_000_000) // n_all,
        )
        for t in types
        if t in n_next  # inner join on marginal, as before
    ]
    return small_model_frame(
        spark,
        out,
        "event_type string, pi_units bigint, pi_prev_units bigint, "
        "delta_units bigint, marginal_ppm bigint",
    )


# ---------------------------------------------------------------------------
# SLO burn-rate alerts (Google SRE workbook ch. 5): the error-budget
# detector ops teams actually page on — distinct from the statistical
# anomaly family (z/MAD/CUSUM/HW score VOLUME shifts; this scores
# error-RATE against a contract).
# ---------------------------------------------------------------------------


_SLO_BUDGET_PCT = 1  # SLO: at most 1% of events may be errors
_SLO_BURN_THRESH = 6000  # 6x budget, in milli-units


_SLO_ORACLE_SQL = f"""
    WITH h AS (
      SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            ts) AS BIGINT) AS hour_idx,
             count(*) AS n_total,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS n_err
      FROM events GROUP BY 1),
    b AS (SELECT min(hour_idx) AS hmin, max(hour_idx) AS hmax FROM h),
    grid AS (SELECT gs.hour_idx, coalesce(h.n_total, 0) AS n_total,
                    coalesce(h.n_err, 0) AS n_err
             FROM b, LATERAL (
               SELECT unnest(generate_series(b.hmin, b.hmax))
                 AS hour_idx) gs
             LEFT JOIN h ON h.hour_idx = gs.hour_idx),
    w AS (SELECT hour_idx, n_total, n_err,
                 sum(n_total) OVER win6 AS total_6h,
                 sum(n_err) OVER win6 AS err_6h
          FROM grid
          WINDOW win6 AS (ORDER BY hour_idx
                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT hour_idx, CAST(n_total AS BIGINT) AS n_total,
           CAST(n_err AS BIGINT) AS n_err,
           CAST((n_err * {100_000 // _SLO_BUDGET_PCT})
                // greatest(n_total, 1) AS BIGINT) AS burn_1h_milli,
           CAST((err_6h * {100_000 // _SLO_BUDGET_PCT})
                // greatest(total_6h, 1) AS BIGINT) AS burn_6h_milli,
           (n_err * {100_000 // _SLO_BUDGET_PCT})
             // greatest(n_total, 1) >= {_SLO_BURN_THRESH}
           AND (err_6h * {100_000 // _SLO_BUDGET_PCT})
             // greatest(total_6h, 1) >= {_SLO_BURN_THRESH} AS page
    FROM w
    """


@query("evt_slo_burn_rate", _SLO_ORACLE_SQL)
def evt_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (SRE workbook ch. 5,
    adapted to hourly grain): burn = observed error rate / the 1%
    error budget, computed over a short (1h) and a long (6h)
    trailing window on the zero-filled hour grid; page only when
    BOTH exceed 6x budget — the long window stops one bad minute
    from paging, the short window stops a long-recovered incident
    from still paging. The contract-based ops rung next to the
    statistical family (z/MAD/CUSUM/HW detect volume SHIFTS; this
    detects budget VIOLATIONS at any volume).

    INTEGER-EXACT: burn_milli = (err · 100000) DIV max(total, 1) —
    nonneg floor division, identical engines; zero-traffic hours
    carry burn 0 (greatest-1 guard), never a division error. Plan:
    one map-side-combinable hourly rollup, then windows over the
    calendar-hours grid — corpus-size-invariant, the EWMA/HW shape.
    Reference: the reference's DLQ counts errors after the fact
    (src/deadletter.ts); this is the forward-looking alert tier.
    §2.11 ops extension surface."""
    return slo_finalize_hourly(
        slo_grid_agg(_t(spark, sf_dir, "events"))
    )


def slo_grid_agg(ev: DataFrame) -> DataFrame:
    """The hourly (n_total, n_err) rollup — counts merge by +, so it
    doubles as the complete-mode streaming state of
    evt_stream_slo_burn (the hw-grid pattern for the SLO family).

    hour_idx is integer `div` on the epoch-micros delta (the repo's
    integer-micros discipline, no double path). Spark's `div`
    truncates toward zero, which is EXACTLY DuckDB's
    date_diff('hour', origin, ts) when the origin sits on an hour
    boundary (date_diff counts boundary crossings, i.e. truncation):
    an event 30 min BEFORE the 2024-01-01 origin lands in hour_idx 0
    on both engines — documented, not latent (contrast the floor
    divergence noted in evt_mannwhitney_shift)."""
    return ev.groupBy(
        F.expr(
            "CAST((unix_micros(ts) - unix_micros(TIMESTAMP "
            "'2024-01-01 00:00:00')) div 3600000000 AS BIGINT)"
        ).alias("hour_idx")
    ).agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
    )


def slo_finalize_hourly(h: DataFrame) -> DataFrame:
    """The multiwindow burn readout over an hourly (n_total, n_err)
    grid — shared source-level by the batch query above and the
    streaming matview twin."""
    b = h.agg(
        F.min("hour_idx").alias("hmin"), F.max("hour_idx").alias("hmax")
    )
    grid = (
        b.select(F.explode(F.sequence("hmin", "hmax")).alias("hour_idx"))
        .join(h, "hour_idx", "left")
        .select(
            "hour_idx",
            F.coalesce("n_total", F.lit(0)).alias("n_total"),
            F.coalesce("n_err", F.lit(0)).alias("n_err"),
        )
    )
    win6 = Window.orderBy("hour_idx").rowsBetween(-5, 0)
    w = grid.select(
        "hour_idx",
        "n_total",
        "n_err",
        F.sum("n_total").over(win6).alias("total_6h"),
        F.sum("n_err").over(win6).alias("err_6h"),
    )
    scale = 100_000 // _SLO_BUDGET_PCT
    return w.select(
        "hour_idx",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("n_err").cast("bigint").alias("n_err"),
        F.expr(
            f"CAST((n_err * {scale}) div greatest(n_total, 1) "
            "AS BIGINT)"
        ).alias("burn_1h_milli"),
        F.expr(
            f"CAST((err_6h * {scale}) div greatest(total_6h, 1) "
            "AS BIGINT)"
        ).alias("burn_6h_milli"),
        F.expr(
            f"(n_err * {scale}) div greatest(n_total, 1) "
            f">= {_SLO_BURN_THRESH} "
            f"AND (err_6h * {scale}) div greatest(total_6h, 1) "
            f">= {_SLO_BURN_THRESH}"
        ).alias("page"),
    )


# ---------------------------------------------------------------------------
# ER threshold-sensitivity audit: the precision knob — how the match
# set, cluster count, and largest cluster move as the Fellegi-Sunter
# acceptance score sweeps. The number you read BEFORE committing a
# threshold to a production dedup run.
# ---------------------------------------------------------------------------


_ER_THRESHOLDS = (3, 4, 5, 6, 7)


_ER_SENSITIVITY_ORACLE = f"""
    WITH RECURSIVE b AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 500) AS BIGINT) AS band, c_acctbal
      FROM customer),
    pr AS (
      SELECT a.c_custkey AS k1, c.c_custkey AS k2,
             levenshtein(a.c_name, c.c_name) AS lev,
             abs(a.c_acctbal - c.c_acctbal) AS dbal
      FROM b a JOIN b c
        ON a.c_nationkey = c.c_nationkey
       AND a.c_mktsegment = c.c_mktsegment
       AND a.band = c.band AND a.c_custkey < c.c_custkey),
    m AS (SELECT k1, k2, ({_ER_SQL_SCORE}) AS score FROM pr
          WHERE ({_ER_SQL_SCORE}) >= {min(_ER_THRESHOLDS)}),
    th(t) AS (VALUES {', '.join(f'({t})' for t in _ER_THRESHOLDS)}),
    et AS (SELECT th.t, m.k1 AS u, m.k2 AS v FROM th
           JOIN m ON m.score >= th.t),
    edges AS (SELECT t, u, v FROM et UNION SELECT t, v, u FROM et),
    comp(t, node, label) AS (
      SELECT t, u, u FROM (SELECT DISTINCT t, u FROM edges)
      UNION
      SELECT e.t, e.v, c.label FROM comp c
      JOIN edges e ON e.t = c.t AND e.u = c.node),
    cm AS (SELECT t, node, min(label) AS component FROM comp
           GROUP BY 1, 2),
    cl AS (SELECT t, component, count(*) AS sz FROM cm GROUP BY 1, 2),
    per_t AS (
      SELECT cl.t, count(*) AS n_clusters, sum(sz) AS n_nodes,
             max(sz) AS max_cluster
      FROM cl GROUP BY cl.t),
    pairs AS (SELECT t, count(*) AS n_pairs FROM et GROUP BY t)
    SELECT CAST(th.t AS BIGINT) AS threshold,
           CAST(coalesce(pairs.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(per_t.n_nodes, 0) AS BIGINT) AS n_nodes,
           CAST(coalesce(per_t.n_clusters, 0) AS BIGINT) AS n_clusters,
           CAST(coalesce(per_t.max_cluster, 0) AS BIGINT)
             AS max_cluster
    FROM th
    LEFT JOIN pairs ON pairs.t = th.t
    LEFT JOIN per_t ON per_t.t = th.t
    """


@query("er_threshold_sensitivity", _ER_SENSITIVITY_ORACLE)
def er_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ER acceptance-threshold knob, audited: match-pair count,
    matched-node count, cluster count, and LARGEST cluster size as
    the Fellegi-Sunter score threshold sweeps 3..7 — the table that
    justifies er_customer_entities' score >= 5 before a production
    dedup run commits to it (the failure mode this catches: one
    threshold step flooding everything into a single mega-cluster,
    the classic transitive-closure collapse). Zero-match thresholds
    emit 0 rows of evidence, not missing rows.

    Plan (reshaped r13, the VERDICT r12 task-3 conditional): the
    blocked scored pair table builds ONCE (_er_scored_pairs,
    localCheckpointed) — and the five thresholds' transitive closures
    now run in ONE vectorized min-label loop instead of five
    independent connected_components fixpoints. The nested match sets
    (m_7 ⊆ … ⊆ m_3) share every edge scan: the label frame carries
    one label column per threshold, each iteration is a single
    edge-join whose grouped agg takes five score-gated mins, and the
    loop runs to the max diameter across thresholds instead of paying
    five loops' worth of checkpoint+action latency (measured steady
    5.7 s → 3.7 s at sf0.1, first pass dominated by the shared
    blocking-join checkpoint both shapes pay; at cluster scale it is
    5× fewer edge-list shuffles per iteration). Per-threshold
    propagation stays within its own match set because a min only
    flows along edges with score >= t.
    Per-threshold node/cluster stats then read the converged labels
    once (nodes gated by their max incident score — a node isolated
    at t contributes nothing, exactly as its absence from m_t did).
    All counts integer; the oracle replays every threshold's closure
    in one recursive CTE keyed by t. Eval tier (the recall-eval
    discipline applied to ER)."""
    T = _ER_THRESHOLDS
    pr = (
        _er_scored_pairs(spark, sf_dir)
        .where(F.col("score") >= F.lit(min(T)))
        .localCheckpoint(eager=False)  # lazy — the loop's first
        # probe materializes it (see er_customer_entities)
    )
    # r16: e is a NARROW union over the checkpointed pair table —
    # re-materializing it bought nothing; labels and the per-round
    # frames checkpoint LAZILY so each round's convergence probe is
    # the round's single job (guide §2.4/§2.6 — same fusion as
    # connected_components).
    e = pr.select(
        F.col("k1").alias("u"), F.col("k2").alias("v"), "score"
    ).unionByName(
        pr.select(F.col("k2").alias("u"), F.col("k1").alias("v"), "score")
    )
    # r17: the per-iteration expression trees parse as SINGLE
    # selectExpr/F.expr strings (the r16 single-parse discipline —
    # resolved trees identical, ~25 py4j round trips per iteration
    # instead of ~90; cProfile put 0.6 s of this loop's construction
    # in the Column comprehensions)
    labels = (
        e.select("u")
        .distinct()
        .selectExpr("u AS node", *[f"u AS l{t}" for t in T])
        .localCheckpoint(eager=False)
    )
    _new_sql = {
        t: f"least(l{t}, coalesce(n{t}, l{t}))" for t in T
    }
    _chg_sql = " OR ".join(f"({_new_sql[t]} != l{t})" for t in T)
    for _ in range(10):
        nbmin = (
            e.join(labels, e.v == labels.node)
            .groupBy("u")
            .agg(
                *[
                    F.expr(
                        f"min(CASE WHEN score >= {t} THEN l{t} END)"
                    ).alias(f"n{t}")
                    for t in T
                ]
            )
        )
        updated = (
            labels.join(nbmin, labels.node == nbmin.u, "left")
            .selectExpr(
                "node",
                *[f"{_new_sql[t]} AS l{t}" for t in T],
                f"({_chg_sql}) AS _chg",
            )
            .localCheckpoint(eager=False)
        )
        # full count, not limit(1): with a LAZY checkpoint a limit
        # probe runs incremental partition batches (1, 4, 20, ...)
        # and rescans everything across several jobs on converged
        # rounds; one count() is one job and materializes the
        # checkpoint in the same pass
        changed = updated.where(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "er_threshold_sensitivity: label propagation did not "
            "converge in 10 iterations"
        )

    maxs = e.groupBy("u").agg(F.max("score").alias("ms"))
    stacked = (
        labels.join(maxs, labels.node == maxs.u)
        .select(
            F.explode(
                F.array(
                    *[
                        F.when(
                            F.col("ms") >= t,
                            F.struct(
                                F.lit(t).alias("t"),
                                F.col(f"l{t}").alias("lab"),
                            ),
                        )
                        for t in T
                    ]
                )
            ).alias("s")
        )
        .where(F.col("s").isNotNull())
        .select("s.t", "s.lab")
    )
    cstats = (
        stacked.groupBy("t", "lab")
        .agg(F.count("*").alias("sz"))
        .groupBy("t")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("sz").alias("n_nodes"),
            F.max("sz").alias("max_cluster"),
        )
    )
    pcounts = (
        pr.select(
            F.explode(
                F.array(
                    *[F.when(F.col("score") >= t, F.lit(t)) for t in T]
                )
            ).alias("t")
        )
        .where(F.col("t").isNotNull())
        .groupBy("t")
        .agg(F.count("*").alias("n_pairs"))
    )
    base = small_model_frame(spark, [(t,) for t in T], "t int")
    return (
        base.join(pcounts, "t", "left")
        .join(cstats, "t", "left")
        .select(
            F.col("t").cast("bigint").alias("threshold"),
            F.coalesce(F.col("n_pairs"), F.lit(0))
            .cast("bigint")
            .alias("n_pairs"),
            F.coalesce(F.col("n_nodes"), F.lit(0))
            .cast("bigint")
            .alias("n_nodes"),
            F.coalesce(F.col("n_clusters"), F.lit(0))
            .cast("bigint")
            .alias("n_clusters"),
            F.coalesce(F.col("max_cluster"), F.lit(0))
            .cast("bigint")
            .alias("max_cluster"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted event sampling without replacement (Duffield-Lund-Thorup
# priority sampling, the doc_priority_sample machinery applied to the
# EVENT stream): the live-ingest reservoir a 100 TB event pipeline
# needs — "keep a value-weighted sample of everything that ever
# flowed" — and the batch twin of the 27th streaming matview, whose
# per-bucket top-k heaps are a FOURTH mergeable-state class
# (max-heap union is order-free: top-k of a union = top-k of the
# per-side top-ks).
# ---------------------------------------------------------------------------


_EVT_PRIO_K = 64


_EVT_PRIO_ORACLE = f"""
    WITH h AS (
      SELECT event_id, event_type,
             greatest(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT),
                      1) AS w_cents,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               + 1 AS u
      FROM events),
    p AS (SELECT event_id, event_type, w_cents,
                 (w_cents * 4294967296) // u AS priority
          FROM h)
    SELECT event_id, event_type, w_cents, CAST(priority AS BIGINT) AS priority
    FROM p
    ORDER BY priority DESC, event_id ASC
    LIMIT {_EVT_PRIO_K}
    """


def evt_priority_frame(ev: DataFrame) -> DataFrame:
    """The scored frame shared by the batch query and the streaming
    matview: integer-cent weights (DECIMAL cast — exact, the
    evt_zscore_outliers money discipline; floor 1 so zero-value
    events stay sampleable), md5-derived u, integer priority.
    assert_true keeps the w<<32 product loudly inside int64."""
    w = F.greatest(
        (F.col("value").cast("decimal(12,2)") * 100).cast("bigint"),
        F.lit(1),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        + 1
    )
    return ev.where(
        F.assert_true(
            w < F.lit(2**31),
            F.lit(
                "evt_priority_sample: w_cents >= 2^31 — "
                "w * 2^32 would overflow int64"
            ),
        ).isNull()
    ).select(
        "event_id",
        "event_type",
        w.alias("w_cents"),
        u.alias("u"),
    ).select(
        "event_id",
        "event_type",
        "w_cents",
        F.expr("CAST((w_cents * 4294967296) div u AS BIGINT)").alias(
            "priority"
        ),
    )


@query("evt_priority_sample", _EVT_PRIO_ORACLE)
def evt_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-weighted sample WITHOUT replacement of the event stream
    (64 events, inclusion probability ~ the event's monetary value in
    exact integer cents) — Duffield-Lund-Thorup priority sampling on
    the events table: the sample an ops/analytics team keeps when the
    full stream is too big to retain, biased toward the events that
    carry the money. Same integer discipline as doc_priority_sample
    (priority = (w << 32) DIV md5-u32 — float priorities are a
    cross-engine selection hazard; ties break on event_id), same
    100 TB argument: top-k by priority is DISTRIBUTIVE (per-partition
    heaps union into the global sample, TakeOrderedAndProject —
    no global sort), and the same heap-merge property is what makes
    the streaming twin evt_stream_priority_sample's state mergeable
    and arrival-order-free. Reference analog: none; §2.11 sampling
    extension."""
    from env_event_stream_spark.operators.relational import top_k

    return top_k(
        evt_priority_frame(_t(spark, sf_dir, "events")),
        [F.col("priority").desc(), F.col("event_id").asc()],
        _EVT_PRIO_K,
    )
