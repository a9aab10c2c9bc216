"""Named query catalog — the driver-verifiable surface.

Every entry here has a Spark builder (``(spark, sf_dir) -> DataFrame``)
and, where SQL-expressible, a DuckDB oracle string in ``ORACLES``.
Column names are aliased identically on both sides (the driver hashes
values after sorting columns by name).

Determinism rules applied throughout:
- every LIMIT is preceded by a total order (ts + id tie-break);
- every floating aggregate is ROUNDed (4 decimals) on both sides so
  summation-order ulps can't flip the value hash;
- no wall-clock, no rand().

Sections mirror SURVEY.md §2: events surface (the reference's whole
query language), relational GAP core, event-sourcing folds, LLM
pipeline ops (dedup / similarity / text) live in their own modules and
are re-exported by ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from env_event_stream_spark.operators import event_queries as EQ
from env_event_stream_spark.operators import relational as R
from env_event_stream_spark.tables import load_events, load_table, prepare_session, small_model_frame

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
# str oracle SQL, or a zero-arg callable returning the SQL (lazy — for
# oracles that must inspect the data, e.g. trained-centroid literals);
# resolved in __spark_entry__.oracle_sql().
ORACLES: dict[str, str | Callable[[], str]] = {}


def query(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.1/2.2/2.6 — the reference's event-store query surface
# (scan + topic/ts/type predicates + order + limit; SURVEY.md S1, P1-P4,
#  O1-O3). The synthetic `events` table stands in for a topic partition.
# ---------------------------------------------------------------------------


@query(
    "evt_replay",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
      AND event_type IN ('click', 'purchase')
    ORDER BY ts ASC, event_id ASC
    LIMIT 500
    """,
)
def evt_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EventStore.getEvents: ts-range + type-IN + ORDER ts ASC + LIMIT
    (reference src/persistence.ts:28-69). The ts-range is applied in
    the raw nanos domain (tables.load_events) so it pushes to the scan
    — row-group skipping, not a full-table read."""
    ev = load_events(
        spark, sf_dir,
        from_ts="2024-01-05 00:00:00",
        to_ts="2024-01-20 00:00:00",
    )
    return EQ.get_events(
        ev.select("event_id", "ts", "user_id", "event_type", "value"),
        from_ts="2024-01-05 00:00:00",
        to_ts="2024-01-20 00:00:00",
        event_types=["click", "purchase"],
        limit=500,
        tiebreak_col="event_id",
    )


@query(
    "evt_dlq_newest",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type = 'error'
    ORDER BY ts DESC, event_id DESC
    LIMIT 200
    """,
)
def evt_dlq_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ retrieval shape: type equality + ORDER ts DESC + LIMIT
    (reference src/deadletter.ts:39-72, newest-first)."""
    ev = _t(spark, sf_dir, "events")
    return EQ.get_dlq_events(
        ev.select("event_id", "ts", "user_id", "event_type", "value"),
        event_type="error",
        limit=200,
        tiebreak_col="event_id",
    )


@query(
    "evt_retention_count",
    """
    SELECT count(*) AS n_delete, min(ts) AS oldest, max(ts) AS newest
    FROM events
    WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def evt_retention_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention sweep candidates + delete-count metric
    (reference src/persistence.ts:74-93, src/topic.ts:156-163).
    Raw-domain upper bound pushes to the scan (load_events)."""
    ev = load_events(spark, sf_dir)
    return EQ.retention_candidates(ev, "2024-01-15 00:00:00").agg(
        F.count("*").alias("n_delete"),
        F.min("ts").alias("oldest"),
        F.max("ts").alias("newest"),
    )


@query(
    "evt_type_counts",
    """
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def evt_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receiver-count / replay-count analog as a grouped aggregate
    (reference src/topic.ts:119-143 counts matches imperatively).
    Money sums in exact DECIMAL — order-independent across engines."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "evt_project",
    """
    SELECT event_id, event_type, CAST(ts AS DATE) AS day
    FROM events WHERE user_id = 7
    """,
)
def evt_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate (P9 — absent in reference, trivial GAP).
    Column pruning reaches the scan: only 3 columns read."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("user_id") == 7).select(
        "event_id", "event_type", F.col("ts").cast("date").alias("day")
    )


@query(
    "evt_exists_probe",
    """
    SELECT DISTINCT user_id FROM events e
    WHERE EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
    )
    """,
)
def evt_exists_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-exists probe (reference src/sourcing.ts:227-231) for
    ALL keys in one pass: LEFT SEMI join instead of per-key LIMIT 1."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    purchases = ev.where(F.col("event_type") == "purchase")
    return EQ.exists_probe(purchases, "user_id", users)


# ---------------------------------------------------------------------------
# §2.4/2.5 — event-sourcing fold as SQL (A4) + window functions
# ---------------------------------------------------------------------------


@query(
    "evt_fold_running",
    """
    SELECT event_id, user_id, ts,
           CAST(row_number() OVER wo AS BIGINT) AS version,
           CAST(round(sum(CAST(value AS DECIMAL(12,2))) OVER ws, 4) AS DOUBLE)
             AS balance
    FROM events
    WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
           ws AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def evt_fold_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event-sourcing fold (reference src/sourcing.ts:41-62) when
    the transition is associative: running balance = windowed SUM;
    `version` = row_number (the reference increments it imperatively,
    src/sourcing.ts:47). One shuffle on the aggregate key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")).over(wsum), 4)
        .cast("double")
        .alias("balance"),
    )


@query(
    "evt_rehydrate_latest",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS version,
           CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE) AS balance,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def evt_rehydrate_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk rehydrate: final state of EVERY aggregate in one grouped
    pass (the reference can only fold one id at a time,
    src/sourcing.ts:197-219 — this is the engine's scale win)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("version"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
        .cast("double")
        .alias("balance"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "evt_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + cumulative-sum
    session ids. Streaming twin: session_window(ts, '30 minutes') in
    streaming/windows.py. One shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(wcum).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
        .cast("double")
        .alias("session_value"),
    )


@query(
    "evt_tumbling_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def evt_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch form). The streaming twin
    (F.window + watermark) lives in streaming/windows.py; in batch a
    tumbling window IS a group-by on the truncated timestamp."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
        .cast("double")
        .alias("total_value"),
    )


# ---------------------------------------------------------------------------
# §2.3/2.4 — relational GAP core on the TPC-H-ish star schema
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))), 4) AS DOUBLE)
             AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 * (1 + CAST(l_tax AS DECIMAL(12,2)))), 4) AS DOUBLE)
             AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-group-agg, Catalyst partial+final
    hash aggregation (map-side combine keeps the shuffle tiny)."""
    li = _t(spark, sf_dir, "lineitem")
    # money sums in exact DECIMAL(12,2): double sums depend on
    # partial-agg order and can flip the rounded 4th decimal across
    # engines at scale; quantity sums stay double (integer-valued, so
    # double addition is exact in any order). Averages are spelled
    # sum/count with an exact-decimal numerator for the same reason.
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    dsc = F.col("l_discount").cast("decimal(12,2)")
    tax = F.col("l_tax").cast("decimal(12,2)")
    disc = ext * (1 - dsc)
    cnt = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum(ext), 4).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + tax)), 4).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(ext).cast("double") / cnt, 4).alias("avg_price"),
            F.round(F.sum(dsc).cast("double") / cnt, 4).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


@query(
    "join_revenue_by_region",
    """
    SELECT r.r_name AS region,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 4) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × 3 broadcast dims + 1 shuffle join.
    customer/nation/region are broadcast (no fact shuffle for dims);
    lineitem×orders is the only big equi-join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # pre-aggregate the fact table to one row per order BEFORE the
    # joins: shrinks the join input ~4x and turns count(DISTINCT
    # o_orderkey) into a plain count (orderkey is unique post-agg) —
    # no expand, no distinct shuffle. Same result, verified by oracle.
    # Money math in DECIMAL: double sums depend on partial-agg order
    # and flipped the 4th decimal vs the oracle at sf0.1; exact
    # decimal sums are order-independent on both engines.
    li_per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("_rev")
    )
    dim = R.join(
        R.join(c, n, c.c_nationkey == n.n_nationkey, broadcast_right=True),
        r,
        F.col("n_regionkey") == r.r_regionkey,
        broadcast_right=True,
    ).select("c_custkey", "r_name")
    enriched = R.join(
        li_per_order.join(o, li_per_order.l_orderkey == o.o_orderkey),
        dim,
        F.col("o_custkey") == F.col("c_custkey"),
        broadcast_right=True,
    )
    return enriched.groupBy(F.col("r_name").alias("region")).agg(
        F.count("o_orderkey").cast("bigint").alias("n_orders"),
        F.round(F.sum("_rev"), 4).cast("double").alias("revenue"),
    )


@query(
    "join_semi_anti",
    """
    WITH with_orders AS (
      SELECT DISTINCT c_custkey FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ), without_orders AS (
      SELECT DISTINCT c_custkey FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    )
    SELECT 'with' AS grp, CAST(count(*) AS BIGINT) AS n FROM with_orders
    UNION ALL
    SELECT 'without' AS grp, CAST(count(*) AS BIGINT) AS n FROM without_orders
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) joins + union."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(o, "c_custkey", "left_semi").agg(
        F.count("*").cast("bigint").alias("n")
    ).select(F.lit("with").alias("grp"), "n")
    anti = c.join(o, "c_custkey", "left_anti").agg(
        F.count("*").cast("bigint").alias("n")
    ).select(F.lit("without").alias("grp"), "n")
    return semi.unionByName(anti)


@query(
    "join_range_price_band",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0),
             ('medium', 50000.0, 150000.0),
             ('large', 150000.0, 1000000000.0)
    )
    SELECT b.band AS band, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS total
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join against a small band table — broadcast
    nested-loop is the correct plan for tiny interval dims."""
    o = _t(spark, sf_dir, "orders")
    bands = small_model_frame(
        spark,
        [("small", 0.0, 50_000.0), ("medium", 50_000.0, 150_000.0),
         ("large", 150_000.0, 1_000_000_000.0)],
        "band string, lo double, hi double",
    )
    # half-open interval [lo, hi): broadcast nested-loop over a tiny dim
    joined = o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 4)
        .cast("double")
        .alias("total"),
    )


@query(
    "asof_purchase_prior_view",
    """
    SELECT p.event_id, p.user_id, p.ts,
           v.prior_view_ts, round(v.prior_view_value, 4) AS prior_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT ts AS prior_view_ts, value AS prior_view_value
      FROM events v
      WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
      ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON true
    """,
)
def asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (backward): for each purchase, the latest prior
    'view' of the same user. Implemented as union + last(ignorenulls)
    window (operators/relational.py:asof_join) — O(n log n) per key,
    no correlated subquery, no cross product; survives 100× scale."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    out = R.asof_join(
        purchases,
        views.withColumnRenamed("view_ts", "prior_view_ts").withColumnRenamed(
            "view_value", "prior_view_value"
        ),
        on=["user_id"],
        left_ts="ts",
        right_ts="prior_view_ts",
        right_vals=["prior_view_ts", "prior_view_value"],
    )
    return out.select(
        "event_id", "user_id", "ts", "prior_view_ts",
        F.round("prior_view_value", 4).alias("prior_view_value"),
    )


@query(
    "asof_purchase_next_view",
    """
    SELECT p.event_id, p.user_id, p.ts,
           v.next_view_ts, round(v.next_view_value, 4) AS next_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT ts AS next_view_ts, value AS next_view_value
      FROM events v
      WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts >= p.ts
      ORDER BY v.ts ASC, v.event_id ASC LIMIT 1
    ) v ON true
    """,
)
def asof_purchase_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (forward): for each purchase, the EARLIEST
    subsequent 'view' of the same user. Same union + window
    composition as the backward variant (operators/relational.py:
    asof_join direction='forward' — first(ignorenulls) over the
    following frame); one shuffle on user_id, no cross product."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("next_view_ts"),
        F.col("value").alias("next_view_value"),
    )
    out = R.asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="next_view_ts",
        right_vals=["next_view_ts", "next_view_value"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", "next_view_ts",
        F.round("next_view_value", 4).alias("next_view_value"),
    )


@query(
    "window_top3_orders_per_cust",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number (SURVEY §2.5 GAP)."""
    o = _t(spark, sf_dir, "orders")
    out = R.top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return out.withColumn("rn", F.col("rn").cast("bigint"))


@query(
    "window_lag_lead_gap",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderdate)  OVER w AS prev_date,
           lead(o_orderdate) OVER w AS next_date,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
             AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics (SURVEY §2.5 GAP)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("days_since_prev"),
    )


@query(
    "topk_orders_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort)."""
    o = _t(spark, sf_dir, "orders")
    return R.top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@query(
    "agg_rollup_nation",
    """
    SELECT r_name, n_name,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS total_acctbal,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.4 GAP)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = R.join(
        R.join(c, n, c.c_nationkey == n.n_nationkey, broadcast_right=True),
        r, F.col("n_regionkey") == r.r_regionkey, broadcast_right=True,
    )
    return j.rollup("r_name", "n_name").agg(
        F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 4)
        .cast("double")
        .alias("total_acctbal"),
        F.count("*").cast("bigint").alias("n_customers"),
    )


@query(
    "agg_cube_flags",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims (SURVEY §2.4 GAP)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
    )


@query(
    "agg_distinct_parts",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (expand + two-phase agg in Catalyst).
    At 100 TB prefer approx_count_distinct (HLL, no expand) — exposed
    as agg_approx_distinct with a rows-only check (not SQL-equal)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_supps"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


@query(
    "setops_segments",
    """
    WITH auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
         big AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
    SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT c_custkey FROM auto UNION SELECT c_custkey FROM big)
    UNION ALL
    SELECT 'intersect', CAST(count(*) AS BIGINT)
      FROM (SELECT c_custkey FROM auto INTERSECT SELECT c_custkey FROM big)
    UNION ALL
    SELECT 'except', CAST(count(*) AS BIGINT)
      FROM (SELECT c_custkey FROM auto EXCEPT SELECT c_custkey FROM big)
    """,
)
def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (SURVEY §2.7 GAP)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    auto = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    big = o.where(F.col("o_totalprice") > 100_000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    def cnt(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("n")).select(
            F.lit(op).alias("op"), "n"
        )
    return (
        cnt(auto.union(big).distinct(), "union")
        .unionByName(cnt(auto.intersect(big), "intersect"))
        .unionByName(cnt(auto.exceptAll(big).distinct(), "except"))
    )


@query(
    "pivot_status_by_flag",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 4) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 4) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (conditional aggregation under the hood)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# §2.4 A4 / §2.10 U2 — the event-sourcing fold as a true imperative
# applyInPandas transition (non-associative: balance resets on signup)
# ---------------------------------------------------------------------------


@query(
    "evt_fold_applyinpandas",
    """
    WITH ls AS (
      SELECT user_id, max(ts) AS sts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS version,
           round(coalesce(sum(CASE WHEN (ls.sts IS NULL OR e.ts > ls.sts)
                                   THEN e.value END), 0), 4) AS balance
    FROM events e LEFT JOIN ls ON e.user_id = ls.user_id
    GROUP BY e.user_id
    """,
)
def evt_fold_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate fold (reference src/sourcing.ts:41-67):
    per-key ordered event fold via applyInPandas, with a
    NON-associative transition (signup resets the balance) that a
    plain windowed SUM can't express. The oracle uses the
    sum-since-last-signup identity. One shuffle on the aggregate key;
    Arrow-batched; the reference folds one aggregate at a time."""
    from env_event_stream_spark.sourcing import (
        fold_balance_with_reset,
        init_balance,
        rehydrate_all,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type", "value")
    out = rehydrate_all(
        ev,
        "user_id",
        "ts",
        fold_balance_with_reset,
        init_balance,
        "user_id bigint, version bigint, balance double",
        tiebreak_col="event_id",
    )
    return out.select("user_id", "version", F.round("balance", 4).alias("balance"))


@query(
    "asof_tolerance_join",
    """
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN v.prior_view_ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.prior_view_ts)
                     <= 600000000
                THEN v.prior_view_ts END AS matched_view_ts,
           CASE WHEN v.prior_view_ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.prior_view_ts)
                     <= 600000000
                THEN CAST((epoch_us(p.ts) - epoch_us(v.prior_view_ts))
                          // 1000000 AS BIGINT) END AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT ts AS prior_view_ts
      FROM events v
      WHERE v.user_id = p.user_id AND v.event_type = 'view'
        AND v.ts <= p.ts
      ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON true
    """,
)
def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN with TOLERANCE (pandas merge_asof(tolerance=10min)
    / kdb wj / DuckDB ASOF semantics): each purchase matches its
    nearest prior view of the same user, and the match is INVALIDATED
    — not replaced by an older one — when the gap exceeds 10 minutes.
    The tolerance variant the back/forward pair lacks: "attribute the
    purchase to a view only if the view was recent" is the
    attribution-hygiene form of as-of.

    Composition, not a new operator: the asof_join union+window match
    (one user_id shuffle, no cross product) followed by a row-local
    integer-microsecond gap test — tolerance adds ZERO distributed
    cost. The gap reports in whole seconds via integer DIV (the
    evt_time_to_convert epoch-micros discipline: both engines
    subtract exact integer micros). Reference: getEvents consumers
    join on recency windows (src/types.ts:190); §2.11 relational
    extension surface."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("prior_view_ts")
    )
    out = R.asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="prior_view_ts",
        right_vals=["prior_view_ts"],
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.col("prior_view_ts")
    )
    within = F.col("prior_view_ts").isNotNull() & (
        gap_us <= F.lit(600_000_000)
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("prior_view_ts")).alias("matched_view_ts"),
        F.when(
            within, F.expr(
                "CAST((unix_micros(ts) - unix_micros(prior_view_ts)) "
                "div 1000000 AS BIGINT)"
            )
        ).alias("gap_s"),
    )
