"""TPC-H-shaped relational coverage (SURVEY.md §2.3-2.6 GAP core) plus
the scalar-function library surface (§2.8 GAP — the reference has
almost no scalar functions, src/utils.ts:13-40 is its whole library;
here the engine exposes Spark's built-ins directly and the oracle
proves cross-engine semantics).

Plan notes live on each query: which joins broadcast, where the one
unavoidable shuffle is, and why the shape survives 100× scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from env_event_stream_spark.queries import query
from env_event_stream_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _money(col: str):
    """2-decimal money column as exact DECIMAL(12,2).

    Double SUMs depend on partial-aggregation order and can flip the
    4th decimal vs the oracle at scale (seen at sf0.1 on
    join_revenue_by_region before its DECIMAL migration); decimal sums
    are order-independent and bit-identical on both engines. (12,2)
    holds any TPC-H money value (max ~105k) while keeping 2- and
    3-factor products under the precision-38 cap on both engines.
    """
    return F.col(col).cast("decimal(12,2)")


# Oracle-side spelling of the same cast.
_M = "CAST({} AS DECIMAL(12,2))"


# ---------------------------------------------------------------------------
# TPC-H shapes
# ---------------------------------------------------------------------------


@query(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 4) AS DOUBLE)
             AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where customer and supplier share an ASIA
    nation. Physical shape: region⋈nation pre-filtered on the driver
    side of a broadcast, supplier and customer both shrink via
    broadcast joins BEFORE touching the fact table, so the only
    shuffle is lineitem⋈orders on orderkey. Survives 100× because the
    fact table is filtered by broadcast-hash lookups, never shuffled
    twice."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")

    asia_nations = (
        n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
               n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    # suppliers in ASIA, carrying nation name
    s_asia = s.join(F.broadcast(asia_nations),
                    s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey", F.col("s_nationkey").alias("sup_nk"), "n_name"
    )
    o_win = o.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    # the single big shuffle join: lineitem ⋈ orders on orderkey
    lo = li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount").join(
        o_win, li.l_orderkey == o_win.o_orderkey
    )
    # broadcast the (small) supplier and customer dims onto the fact
    j = lo.join(F.broadcast(s_asia), lo.l_suppkey == s_asia.s_suppkey).join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).where(F.col("c_nationkey") == F.col("sup_nk"))
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))), 4)
        .cast("double")
        .alias("revenue")
    )


@query(
    "tpch_q6_forecast",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_discount AS DECIMAL(12,2))), 4) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg. All four predicates push to the
    parquet scan (row-group stats skip) and the aggregate is a
    map-side partial + single-row final — the minimal-shuffle shape."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(_money("l_extendedprice") * _money("l_discount")), 4)
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )


@query(
    "tpch_q10_returned",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 4) AS DOUBLE)
             AS revenue,
           round(c.c_acctbal, 4) AS acctbal,
           n.n_name AS nation
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue. One
    shuffle (lineitem⋈orders); customer+nation broadcast; the final
    ORDER BY + LIMIT compiles to TakeOrderedAndProject (no full
    sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    o_win = o.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    lr = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    j = (
        lr.join(o_win, lr.l_orderkey == o_win.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))), 4)
        .cast("double")
        .alias("revenue")
    )
    return (
        agg.select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 4) AS totalprice,
           round(t.qty, 4) AS qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 300) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders. The HAVING pre-aggregation runs
    BEFORE any join (map-side combine on orderkey), so the join input
    is already tiny; orders joins on its natural key and customer
    broadcasts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
    )
    j = big.join(o, o.o_orderkey == big.l_orderkey).join(
        F.broadcast(c), c.c_custkey == o.o_custkey
    )
    return (
        j.select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("qty", 4).alias("qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "window_cheapest_supplier_per_part",
    """
    WITH ranked AS (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_price,
             row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY l_extendedprice / l_quantity ASC, l_suppkey ASC,
                        l_orderkey ASC, l_linenumber ASC) AS rn
      FROM lineitem
    )
    SELECT l_partkey, l_suppkey, unit_price
    FROM ranked WHERE rn = 1
    """,
)
def window_cheapest_supplier_per_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q2's correlated-min shape, vectorized: cheapest observed
    unit price per part via one window pass (the correlated subquery
    re-scans per row; this is one shuffle on partkey total)."""
    li = _t(spark, sf_dir, "lineitem")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    w = Window.partitionBy("l_partkey").orderBy(
        unit.asc(), F.col("l_suppkey").asc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc()
    )
    return (
        li.select(
            "l_partkey", "l_suppkey", unit.alias("unit_price"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "unit_price")
    )


# ---------------------------------------------------------------------------
# §2.8 — scalar-function library surface
# ---------------------------------------------------------------------------


@query(
    "func_string_library",
    r"""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substring(c_name, 1, 8) AS name_prefix,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
           CAST(CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS BIGINT)
             AS cust_num_int,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_name, 'Customer', 'C') AS name_short,
           reverse(c_mktsegment) AS seg_rev,
           concat_ws('|', c_mktsegment, c_name) AS joined
    FROM customer
    WHERE contains(c_name, '9')
    """,
)
def func_string_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library (§2.8 GAP): upper/lower/length/substring/
    regexp_extract/lpad/replace/reverse/concat_ws/contains — all
    codegen'd JVM expressions, no Python in the row path."""
    c = _t(spark, sf_dir, "customer")
    num = F.regexp_extract("c_name", r"([0-9]+)", 1)
    return c.where(F.contains(F.col("c_name"), F.lit("9"))).select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        num.alias("cust_num"),
        num.cast("bigint").alias("cust_num_int"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias(
            "name_short"
        ),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
    )


@query(
    "func_datetime_math_library",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 7 DAY AS TIMESTAMP) AS plus_week,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT) AS days_since_epoch_start,
           round(ln(o_totalprice), 4) AS ln_price,
           round(log10(o_totalprice), 4) AS log10_price,
           round(sqrt(o_totalprice), 4) AS sqrt_price,
           round(abs(o_totalprice - 100000), 4) AS abs_dev,
           round(power(o_totalprice / 100000, 2), 4) AS sq_ratio,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kilo,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_kilo_up,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def func_datetime_math_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime + math library (§2.8 GAP). Note dayofweek: Spark is
    1=Sunday, DuckDB 0=Sunday — the oracle adds 1 to line them up."""
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("plus_week"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.round(F.log(F.col("o_totalprice")), 4).alias("ln_price"),
        F.round(F.log10("o_totalprice"), 4).alias("log10_price"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.abs(F.col("o_totalprice") - 100000), 4).alias("abs_dev"),
        F.round(F.pow(F.col("o_totalprice") / 100000, 2), 4).alias("sq_ratio"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_kilo"),
        F.ceil(F.col("o_totalprice") / 1000).cast("bigint").alias("price_kilo_up"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


@query(
    "tpch_q4_priority_late_ship",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated non-equi condition →
    LEFT SEMI join on (orderkey, shipdate > orderdate+60d). The semi
    join stops probing on first match — no row explosion for orders
    with many lines."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o_win = o.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    late = o_win.join(
        li,
        (o_win.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


@query(
    "tpch_q12_priority_by_flag",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_returnflag").join(
        o, F.col("l_orderkey") == o.o_orderkey
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                   ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE),
                 4)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share. part broadcasts onto the
    filtered fact scan; single partial+final aggregate, one row out."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem")
    # exact decimal sums; the single double division afterwards is
    # order-free (IEEE-identical across engines)
    rev = _money("l_extendedprice") * (1 - _money("l_discount"))
    j = li.where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    ).join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0)).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


@query(
    "tpch_q17_small_qty_avg",
    """
    WITH pa AS (SELECT l_partkey, avg(l_quantity) AS avg_qty
                FROM lineitem GROUP BY l_partkey)
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def tpch_q17_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into a pre-aggregate + equi-join. The pre-agg output
    is one row per part — small enough to broadcast back onto the
    fact, so the correlation costs one extra scan, never a per-row
    subquery."""
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    j = li.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(pa), "l_partkey"
    )
    return j.where(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        F.round(F.sum(_money("l_extendedprice")).cast("double") / 7.0, 4).alias(
            "avg_yearly"
        ),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@query(
    "tpch_q19_disjunctive",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 4) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-clause predicate across a join.
    Catalyst extracts the common join key (partkey) so the OR never
    degrades to a nested-loop; part broadcasts."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 40))
    )
    return j.where(cond).agg(
        F.round(F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))), 4)
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@query(
    "tpch_q22_dormant_rich",
    """
    WITH ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       / count(*) AS a
                FROM customer WHERE c_acctbal > 0)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS totacctbal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_dormant_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global average,
    broadcast as a 1-row frame) + NOT EXISTS (LEFT ANTI join) —
    above-average-balance customers with no order since 2001."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2001-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # exact-decimal numerator makes the avg threshold (and thus row
    # membership near the boundary) engine-independent
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_money("c_acctbal")).cast("double") / F.count("*")).alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("a")
    )
    dormant = rich.join(o, "c_custkey", "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("numcust"),
        F.round(F.sum(_money("c_acctbal")), 4).cast("double").alias("totacctbal"),
    )


@query(
    "func_levenshtein_brands",
    """
    SELECT p.p_partkey, p.p_name,
           CAST(levenshtein(p.p_name, 'small ring') AS BIGINT) AS dist
    FROM part p
    WHERE levenshtein(p.p_name, 'small ring') <= 4 AND p.p_partkey % 5 = 0
    """,
)
def func_levenshtein_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance text matching (fuzzy dedup primitive): built-in
    levenshtein, identical semantics in DuckDB."""
    p = _t(spark, sf_dir, "part")
    d = F.levenshtein(F.col("p_name"), F.lit("small ring"))
    return (
        p.where((d <= 4) & (F.col("p_partkey") % 5 == 0))
        .select("p_partkey", "p_name", d.cast("bigint").alias("dist"))
    )


@query(
    "func_explode_token_freq",
    r"""
    WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS tk
               FROM documents),
    e AS (SELECT unnest(tk) AS token FROM t)
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM e GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 25
    """,
)
def func_explode_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating surface (§2.10 GAP — UDTF shape): explode the
    token array, global frequency top-25. generate→partial-agg→final
    is the classic word-count; the explode happens map-side with no
    extra shuffle beyond the aggregation's."""
    from env_event_stream_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(25)
    )


@query(
    "tpch_q7_nation_trade",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS yr,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 4) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_9' AND nc.n_name = 'NATION_10')
        OR (ns.n_name = 'NATION_10' AND nc.n_name = 'NATION_9'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume. The nation table joins TWICE
    under different roles (supplier side / customer side) — alias
    hygiene + two broadcasts; one fact shuffle (lineitem⋈orders)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("yr"),
    ).agg(
        F.round(F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))), 4)
        .cast("double")
        .alias("revenue")
    )


@query(
    "tpch_q13_order_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution. LEFT join with an
    extra join-side predicate (zero-order customers must survive),
    then a double aggregation."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    ).select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")


@query(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_revenue, 4) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — a reused
    'view' (the rev aggregate feeds both the max subquery and the
    join) and a scalar-subquery equality."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            # exact decimal: the max-equality comparison below is then
            # engine-independent (double sums could rank two close
            # suppliers differently across engines)
            F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("mx")
    )
    return (
        F.broadcast(s)
        .join(top, s.s_suppkey == top.supplier_no)
        .select(
            "s_suppkey", "s_name",
            F.round("total_revenue", 4).cast("double").alias("total_revenue"),
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    """
    WITH last_ship AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS my_last
      FROM lineitem GROUP BY l_orderkey, l_suppkey),
    order_last AS (
      SELECT l_orderkey, max(l_shipdate) AS order_last,
             count(DISTINCT l_suppkey) AS n_supps
      FROM lineitem GROUP BY l_orderkey)
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM last_ship ls
    JOIN order_last ol ON ol.l_orderkey = ls.l_orderkey
    JOIN orders o      ON o.o_orderkey = ls.l_orderkey
    JOIN supplier s    ON s.s_suppkey = ls.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND ls.my_last = ol.order_last
      AND ol.n_supps > 1
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept multi-supplier orders
    waiting): the EXISTS/NOT-EXISTS pair over other suppliers' ship
    dates is decorrelated into two grouped aggregates joined back —
    each fact pass is a map-side-combinable agg, no correlated
    re-scan."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    last_ship = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("my_last")
    )
    order_last = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("order_last"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )
    j = (
        last_ship.join(order_last, "l_orderkey")
        .where((F.col("my_last") == F.col("order_last")) & (F.col("n_supps") > 1))
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
    )
    return j.groupBy("s_name").agg(F.count("*").cast("bigint").alias("numwait"))


@query(
    "tpch_q8_market_share",
    """
    WITH base AS (
      SELECT year(o.o_orderdate) AS yr,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT CAST(yr AS BIGINT) AS yr,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY yr
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of revenue into a region, per
    year — conditional-sum ratio over a 6-way join where every dim
    broadcasts and lineitem⋈orders is the one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    asia_nk = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select(F.col("n_nationkey").alias("c_nk"))
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    o_win = o.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr"))
    vol = _money("l_extendedprice") * (1 - _money("l_discount"))
    j = (
        li.join(o_win, li.l_orderkey == o_win.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(asia_nk), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
    )
    return j.groupBy(F.col("yr").cast("bigint").alias("yr")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(0))
            .cast("double")
            / F.sum(vol).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "tpch_q9_profit_proxy",
    """
    SELECT ns.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                     - CAST(0.1 AS DECIMAL(2,1))
                       * CAST(p.p_retailprice AS DECIMAL(12,2))
                       * CAST(l.l_quantity AS DECIMAL(12,0))), 4) AS DOUBLE)
             AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%ring%'
    GROUP BY ns.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and year). The
    synthetic schema lacks partsupp.ps_supplycost; cost is proxied as
    10% of part retail price per unit — same plan shape (LIKE filter
    on the part dim, 5-way join, two-key aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%ring%")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        _money("l_extendedprice") * (1 - _money("l_discount"))
        - F.lit("0.1").cast("decimal(2,1)")
        * _money("p_retailprice")
        * F.col("l_quantity").cast("decimal(12,0)")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    ).agg(F.round(F.sum(profit), 4).cast("double").alias("profit"))


@query(
    "tpch_q16_supplier_cnt",
    """
    WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    excl AS (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%0')
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT sp.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM sp
    JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND sp.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier-part pairs (the observed
    stand-in for partsupp), NOT IN exclusion → LEFT ANTI join, count
    distinct per part attribute group."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 5, 9, 13)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excl = _t(spark, sf_dir, "supplier").where(
        F.col("s_name").like("%0")
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    sp = li.select("l_partkey", "l_suppkey").distinct()
    j = (
        sp.join(F.broadcast(excl), "l_suppkey", "left_anti")
        .join(F.broadcast(p), sp.l_partkey == p.p_partkey)
    )
    return j.groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size")).agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
    )


@query(
    "tpch_q20_excess_suppliers",
    """
    WITH pq AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey),
    bolt AS (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'),
    qual AS (SELECT DISTINCT l_suppkey FROM pq
             JOIN bolt ON bolt.p_partkey = pq.l_partkey
             WHERE pq.q > 30)
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qual)
      AND n.n_name IN ('NATION_9', 'NATION_10')
    """,
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers (in two
    nations) who shipped > 30 units of any 'bolt' part in 1996. Each
    level is a grouped aggregate or semi-join; nothing correlates
    per row."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_9", "NATION_10")
    )
    pq = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    qual = (
        pq.join(F.broadcast(p), pq.l_partkey == p.p_partkey, "left_semi")
        .where(F.col("q") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
    )
