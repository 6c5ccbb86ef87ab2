"""Extended relational surface: correlated EXISTS semi-joins, nation-pair
trade volume, market-share and promo-revenue ratios, OR-of-ANDs predicate
pushdown, full window-function showcase, exact median, and CUBE grouping
sets — rounding out the TPC-H query shapes expressible over the driver's
columns (no partsupp table, so Q2/Q9/Q11/Q16/Q20 shapes are out of scope).

Scale notes: every dimension side stays hinted-broadcast; ratio queries
compute numerator and denominator as exact integer-unit sums in ONE pass
(conditional aggregation — no self-join, no second scan); the median query
is the two-window pattern (row_number + count share one shuffle); CUBE is
planned by Spark as a single Expand + hash agg — 4 grouping sets cost one
shuffle, not four scans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import (
    SQL_REVENUE,
    cents,
    dsum,
    hash_bucket,
    key_offset,
    register,
    revenue_sum,
    t,
)


# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf: str):
    """TPC-H Q4 shape: correlated EXISTS -> left-semi join.  Spark plans
    the semi-join build side from the filtered orders; lineitem is never
    materialized beyond the join keys."""
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
@register(
    "q7_nation_trade_volume",
    f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {SQL_REVENUE} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND sn.n_nationkey < 3 AND cn.n_nationkey < 3
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf: str):
    """TPC-H Q7 shape: cross-nation trade pairs by ship year.  Both nation
    hops broadcast-hinted (fixed 25 rows); supplier/customer scale with
    SF so AQE picks their join strategy; lineitem->orders is the one
    unavoidable shuffle."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    sn = t(spark, sf, "nation").filter(F.col("n_nationkey") < 3).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t(spark, sf, "nation").filter(F.col("n_nationkey") < 3).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(revenue_sum().alias("revenue"))
    )


# ---------------------------------------------------------------------------
_SQL_REV_UNITS = (
    "CAST(ROUND(l_extendedprice*100,0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))"
)


@register(
    "q8_market_share",
    f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_SQL_REV_UNITS} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_SQL_REV_UNITS}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n1.n_regionkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf: str):
    """TPC-H Q8 shape: market share of one supplier nation within a
    customer region, per year.  Numerator and denominator are conditional
    integer-unit sums in the same aggregate — one scan, one shuffle, one
    division at the end (exact, order-independent)."""
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    part = t(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    units = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", units).otherwise(F.lit(0))).cast("double")
                / F.sum(units).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    f"""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV_UNITS} ELSE 0 END) AS DOUBLE)
                 / CAST(SUM({_SQL_REV_UNITS}) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY 1
    """,
)
def q14_promo_revenue(spark: SparkSession, sf: str):
    """TPC-H Q14 shape: promo revenue share per month — conditional agg
    ratio.  part scales with SF: no forced broadcast, AQE decides."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = t(spark, sf, "part").select("p_partkey", "p_type")
    units = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0))).cast("double")
                / F.sum(units).cast("double")
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
@register(
    "q19_brand_quantity_revenue",
    f"""
    SELECT {SQL_REVENUE} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_brand_quantity_revenue(spark: SparkSession, sf: str):
    """TPC-H Q19 shape: disjunction of conjunctive ranges across the join.
    The part-side brand/size predicates and the lineitem quantity bounds
    both survive as pushed filters (Catalyst splits the OR where legal)."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return joined.filter(cond).agg(
        revenue_sum().alias("revenue"), F.count("*").alias("n_items")
    )


# ---------------------------------------------------------------------------
@register(
    "window_rank_showcase",
    """
    SELECT s_suppkey, n_name,
           s_acctbal,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           ROW_NUMBER()  OVER w AS rn,
           NTILE(4)      OVER w AS quartile,
           LAG(s_acctbal)  OVER w AS prev_bal,
           LEAD(s_acctbal) OVER w AS next_bal,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_rank_showcase(spark: SparkSession, sf: str):
    """The ranking/navigation window family over one shuffle on n_name
    (all seven functions share the same window spec)."""
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation").select("n_nationkey", "n_name")
    w = W.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            "s_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
            F.lag("s_acctbal").over(w).alias("prev_bal"),
            F.lead("s_acctbal").over(w).alias("next_bal"),
            F.percent_rank().over(w).cast("double").alias("pct_rank"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "median_price_by_priority",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE) AS median_price,
           MAX(n) AS n_orders
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY o_orderpriority
    """,
)
def median_price_by_priority(spark: SparkSession, sf: str):
    """Exact median without an engine-specific quantile function: the
    two-middle-rows pattern, written identically in both engines so the
    arithmetic (decimal sum / count) hash-matches.  row_number and count
    share one shuffle on the priority key."""
    orders = t(spark, sf, "orders")
    wp = W.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wp.orderBy("o_totalprice", "o_orderkey")).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("o_orderpriority").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) / F.count("*"))
        .cast("double")
        .alias("median_price"),
        F.max("n").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
@register(
    "cube_sales",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_sales(spark: SparkSession, sf: str):
    """CUBE grouping sets: all four (flag × status) rollup combinations in
    one Expand + single hash-agg shuffle.  grouping_id disambiguates real
    NULL keys from subtotal rows."""
    li = t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "n_items",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf: str):
    """TPC-H Q13 shape: orders-per-customer histogram — left outer join
    (customers with zero orders count as 0) + double aggregation.  The
    first agg shrinks to |customers| rows; the second to |distinct counts|
    — the classic two-level reduction."""
    cust = t(spark, sf, "customer").select("c_custkey")
    orders = t(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
_SQL_REV_UNITS_EXT = (
    "CAST(ROUND(l_extendedprice*100,0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))"
)


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_SQL_REV_UNITS_EXT}) AS BIGINT) AS total_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_units AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_units = (SELECT MAX(total_units) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf: str):
    """TPC-H Q15 shape: per-supplier quarterly revenue, keep the max via an
    uncorrelated scalar subquery.  Exact integer units make 'equals max'
    deterministic (double revenue would make the = predicate fragile).
    Spark: the scalar max is a 1-row broadcast join against the same
    pre-aggregated revenue — one lineitem scan total."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    units = cents("l_extendedprice") * (100 - cents("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(units).alias("total_units")
    )
    # the scalar max as a whole-frame window over the ALREADY-AGGREGATED
    # rows — referencing `revenue` from a second .agg() would recompute the
    # subtree and scan lineitem twice (Spark has no automatic CTE reuse);
    # the single-partition exchange here moves |suppliers| rows, not facts
    with_max = revenue.withColumn(
        "mx", F.max("total_units").over(W.partitionBy(F.lit(1)))
    )
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    # the post-filter aggregate is ~1 row — THAT is the broadcast side;
    # supplier scales with SF and must stay distributed.
    return (
        F.broadcast(with_max.filter(F.col("total_units") == F.col("mx")))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_units").cast("double") / F.lit(10_000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
@register(
    "q21_sole_supplier_orders",
    """
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_sole_orders
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY n_sole_orders DESC, s_name
    LIMIT 10
    """,
)
def q21_sole_supplier_orders(spark: SparkSession, sf: str):
    """TPC-H Q21 shape (adapted to available columns): suppliers who were
    the ONLY supplier on finished orders — EXISTS + NOT EXISTS pair.
    Spark plan: the NOT EXISTS decorrelates into a per-order distinct-
    supplier count (one lineitem shuffle) instead of a left-anti self-join
    carrying every line twice."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps")
    )
    sole = per_order.filter(F.col("n_supps") == 1)
    orders = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(sole, "l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("n_sole_orders"))
        .orderBy(F.desc("n_sole_orders"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
@register(
    "moving_90d_customer_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS order_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY CAST(epoch(o_orderdate) // 86400 AS BIGINT)
                  RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
                ) AS DOUBLE) AS rev_90d,
           CAST(FIRST_VALUE(o_orderkey) OVER (
                  PARTITION BY o_custkey
                  ORDER BY CAST(epoch(o_orderdate) // 86400 AS BIGINT), o_orderkey
                ) AS BIGINT) AS first_order
    FROM orders
    """,
)
def moving_90d_customer_revenue(spark: SparkSession, sf: str):
    """RANGE-frame window: per-customer trailing-90-day revenue (value-
    based frame — peers by day distance, not row count — the frame family
    ``customer_running_total``'s ROWS frame can't express) + first_value
    navigation.  Day numbers are integer epoch-days so the frame bounds
    are engine-portable; the decimal sum keeps the frame total exact.  One
    shuffle on o_custkey serves both windows."""
    orders = t(spark, sf, "orders").withColumn(
        "order_day", F.expr("CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)")
    )
    w_range = (
        W.partitionBy("o_custkey").orderBy("order_day").rangeBetween(-90, 0)
    )
    w_first = W.partitionBy("o_custkey").orderBy("order_day", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "order_day",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w_range)
        .cast("double")
        .alias("rev_90d"),
        F.first("o_orderkey").over(w_first).cast("long").alias("first_order"),
    )


# ---------------------------------------------------------------------------
@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS units,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * n > units
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf: str):
    """TPC-H Q22 shape: customers with above-average balance and NO orders
    (anti-join + uncorrelated scalar-average subquery).  The average
    compare is integer-unit cross-multiplied (bal*n > sum) so no division
    enters the predicate; the scalar aggregate is a 1-row broadcast."""
    cust = t(spark, sf, "customer")
    units = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.sum(units).alias("units"), F.count("*").alias("n"))
    )
    orders = t(spark, sf, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(units * F.col("n") > F.col("units"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(units).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
@register(
    "datetime_function_showcase",
    """
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(dayofmonth(o_orderdate) AS INT) AS d,
           CAST(CASE dayofweek(o_orderdate) WHEN 0 THEN 7
                ELSE dayofweek(o_orderdate) END AS INT) AS iso_dow,
           CAST(quarter(o_orderdate) AS INT) AS q,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders WHERE o_orderkey < 1000
    """,
)
def datetime_function_showcase(spark: SparkSession, sf: str):
    """Date/time function family: truncation, field extraction (ISO
    day-of-week normalized — Spark and DuckDB number Sundays differently),
    interval arithmetic, month-end, day difference.  All codegen'd; output
    normalized to strings/ints per the cross-engine discipline."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.weekday("o_orderdate").cast("int").alias("iso_dow0"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias("days_since_epoch_start"),
    ).withColumn("iso_dow", (F.col("iso_dow0") + 1).cast("int")).drop("iso_dow0")


# ---------------------------------------------------------------------------
@register(
    "string_function_showcase",
    """
    SELECT c_custkey,
           lower(c_name) AS lname,
           reverse(c_name) AS rname,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           replace(c_name, '#', '-') AS dashed,
           CAST(strpos(c_name, '#') AS INT) AS hash_pos,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           split_part(c_name, '#', 1) AS name_head,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS seg_dist,
           repeat('ab', 3) AS abab
    FROM customer WHERE c_custkey <= 500
    """,
)
def string_function_showcase(spark: SparkSession, sf: str):
    """String function family: case, reverse, padding, replace, locate,
    trim, split, edit distance, repeat — all JVM-side."""
    c = t(spark, sf, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.reverse("c_name").alias("rname"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_replace("c_name", "#", "-").alias("dashed"),
        F.locate("#", F.col("c_name")).cast("int").alias("hash_pos"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_head"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("int").alias("seg_dist"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
    )


# ---------------------------------------------------------------------------
@register(
    "order_price_percentiles",
    """
    WITH c AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS vc
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, vc,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY vc, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM c
    )
    SELECT o_orderpriority,
           MAX(n) AS n_orders,
           CAST(MAX(CASE WHEN rn = (1*n + 3) // 4  THEN vc END) AS DOUBLE) / 100.0 AS p25,
           CAST(MAX(CASE WHEN rn = (2*n + 3) // 4  THEN vc END) AS DOUBLE) / 100.0 AS p50,
           CAST(MAX(CASE WHEN rn = (3*n + 3) // 4  THEN vc END) AS DOUBLE) / 100.0 AS p75,
           CAST(MAX(CASE WHEN rn = (9*n + 9) // 10 THEN vc END) AS DOUBLE) / 100.0 AS p90
    FROM r
    GROUP BY o_orderpriority
    """,
)
def order_price_percentiles(spark: SparkSession, sf: str):
    """Exact discrete percentiles (p25/p50/p75/p90 of order value per
    priority) with NO floating-point interpolation: the pick is the row
    whose rank equals ceil(q*n), computed in integer arithmetic
    ((q_num*n + q_den-1) div q_den), over integer-cents values with a
    unique-key tie-break — bit-identical across engines by construction.

    Scale: one shuffle on the group key, one in-partition sort (the price
    of EXACT quantiles); at lake scale use approx_percentile sketches for
    the screening pass and this for the audited final numbers."""
    o = t(spark, sf, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        cents("o_totalprice").alias("vc"),
    )
    wr = W.partitionBy("o_orderpriority").orderBy("vc", "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "vc",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def pick(num: int, den: int, out: str):
        rank = F.expr(f"({num} * n + {den - 1}) div {den}")
        return (
            F.max(F.when(F.col("rn") == rank, F.col("vc"))).cast("double") / 100.0
        ).alias(out)

    return r.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        pick(1, 4, "p25"),
        pick(2, 4, "p50"),
        pick(3, 4, "p75"),
        pick(9, 10, "p90"),
    )


# ---------------------------------------------------------------------------
@register(
    "grouping_sets_sales",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus))
    """,
)
def grouping_sets_sales(spark: SparkSession, sf: str):
    """Explicit GROUPING SETS — the irregular member of the grouping-sets
    family (``rollup_sales``/``cube_sales`` cover the hierarchical/full
    lattices): per (priority, status), per priority, and per status in ONE
    pass.  grouping() flags disambiguate a subtotal row from a genuine
    NULL group value — the only portable way to tell them apart.  Spark
    expands the sets into a single expand + hash aggregate: one shuffle
    for all three groupings, never three scans."""
    orders = t(spark, sf, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        ).agg(
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "customers_above_own_avg_orders",
    """
    WITH o AS (
      SELECT o_custkey, o_totalprice,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS pc
      FROM orders
    ), w AS (
      SELECT o_custkey, o_totalprice, pc,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n,
             SUM(pc) OVER (PARTITION BY o_custkey) AS s
      FROM o
    )
    SELECT c_custkey, c_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN 2 * pc * n > 3 * s THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big_orders,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM w JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    HAVING SUM(CASE WHEN 2 * pc * n > 3 * s THEN 1 ELSE 0 END) >= 1
    """,
)
def customers_above_own_avg_orders(spark: SparkSession, sf: str):
    """Correlated AGGREGATE subquery shape — customers owning at least one
    order priced above 1.5x their OWN average order value (the classic
    ``WHERE o.price > 1.5 * (SELECT AVG(...) WHERE same customer)``) —
    decorrelated into one window pass: per-customer count and exact
    integer-cent sum ride a single partitionBy(custkey) window, and the
    per-order comparison is the cross-multiplied integer inequality
    ``2*price_cents*n > 3*sum_cents`` — no division, no float threshold,
    engine-exact.  One shuffle on the customer key shared by the window
    and the final rollup; the customer name join stays broadcast."""
    o = t(spark, sf, "orders").select(
        "o_custkey", "o_totalprice", cents("o_totalprice").alias("pc")
    )
    w = W.partitionBy("o_custkey")
    x = o.withColumn("n", F.count("*").over(w)).withColumn("s", F.sum("pc").over(w))
    big = ((F.lit(2) * F.col("pc") * F.col("n")) > (F.lit(3) * F.col("s"))).cast("int")
    per = (
        x.withColumn("big", big)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("big").cast("long").alias("n_big_orders"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .filter(F.col("n_big_orders") >= 1)
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_name")
    return per.join(F.broadcast(c), per.o_custkey == c.c_custkey).select(
        "c_custkey", "c_name", "n_orders", "n_big_orders", "max_price"
    )


# ---------------------------------------------------------------------------
@register(
    "p95_order_by_priority",
    """
    WITH o AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS pc
      FROM orders
    ), r AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY pc, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM o
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN o_totalprice END)
                AS DOUBLE) AS p95_price,
           CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN o_orderkey END)
                AS BIGINT) AS p95_orderkey
    FROM r
    GROUP BY o_orderpriority
    """,
)
def p95_order_by_priority(spark: SparkSession, sf: str):
    """percentile_disc-style SELECTION per group: the discrete p95 order
    price per priority — the smallest stored value whose cumulative rank
    reaches 0.95 (rank ceil(0.95 n) = (19n+19) div 20, pure integer — no
    interpolation, no float rank) — plus the ORDER that achieves it
    (percentile_disc picks a real row, so the achiever key is exact; ties
    on price break by orderkey in the rank order itself).  Same
    two-window/one-shuffle plan as order_price_percentiles; this is the
    row-selecting member of the percentile family."""
    o = t(spark, sf, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice",
        cents("o_totalprice").alias("pc"),
    )
    wr = W.partitionBy("o_orderpriority").orderBy("pc", "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority", "o_orderkey", "o_totalprice",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    at = F.col("rn") == F.expr("(19 * n + 19) div 20")
    return r.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.max(F.when(at, F.col("o_totalprice"))).cast("double").alias("p95_price"),
        F.max(F.when(at, F.col("o_orderkey"))).cast("long").alias("p95_orderkey"),
    )


# ---------------------------------------------------------------------------
@register(
    "running_distinct_customers_by_nation",
    """
    WITH fm AS (
      SELECT c_nationkey, o_custkey,
             MIN(strftime(o_orderdate, '%Y-%m')) AS first_month
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY c_nationkey, o_custkey
    ), nm AS (
      SELECT n_name, first_month AS month, COUNT(*) AS new_customers
      FROM fm JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name, first_month
    )
    SELECT n_name, month, new_customers,
           CAST(SUM(new_customers) OVER (PARTITION BY n_name ORDER BY month
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_customers
    FROM nm
    """,
)
def running_distinct_customers_by_nation(spark: SparkSession, sf: str):
    """Running COUNT(DISTINCT) workaround — cumulative distinct ordering
    customers per nation by month.  Spark (like most engines) rejects
    COUNT(DISTINCT) OVER a running frame; the standard rewrite is
    first-occurrence reduction: collapse to each customer's FIRST order
    month (one groupBy), count first occurrences per (nation, month), and
    a plain running SUM over months is then exactly the running distinct
    count.  Scale: the distinct state never lives in a window buffer —
    it is the (nation, custkey) groupBy shuffle, and the final window
    partitions by nation over ~months rows."""
    o = t(spark, sf, "orders").select("o_custkey", "o_orderdate")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    fm = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_nationkey", "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.min("month").alias("first_month"))
    )
    nm = (
        fm.join(F.broadcast(n), fm.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("first_month").alias("month"))
        .agg(F.count("*").alias("new_customers"))
    )
    wcum = (
        W.partitionBy("n_name").orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return nm.select(
        "n_name", "month", "new_customers",
        F.sum("new_customers").over(wcum).cast("long").alias("cumulative_customers"),
    )


# ---------------------------------------------------------------------------
@register(
    "orders_quarter_over_quarter",
    """
    WITH q AS (
      SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m') AS quarter,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT quarter, n_orders, revenue,
           LAG(revenue) OVER (ORDER BY quarter) AS prev_revenue,
           revenue / LAG(revenue) OVER (ORDER BY quarter) AS qoq_ratio
    FROM q
    """,
)
def orders_quarter_over_quarter(spark: SparkSession, sf: str):
    """Time-series growth shape: quarterly revenue with the
    quarter-over-quarter ratio via LAG over the AGGREGATED series.  The
    exact-decimal revenue casts to double once and the ratio is a single
    IEEE division — deterministic cross-engine.  The global-ordered
    window runs over ~tens of quarter rows (post-aggregation), so the
    single-partition window is trivially fine here — the scale hazard
    only exists when a global window runs over raw rows
    (cf. sequence_packing_sharded)."""
    o = t(spark, sf, "orders")
    q = o.groupBy(
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM").alias("quarter")
    ).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = W.orderBy("quarter")
    return q.select(
        "quarter", "n_orders", "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") / F.lag("revenue").over(w)).alias("qoq_ratio"),
    )


# ---------------------------------------------------------------------------
@register(
    "setop_multiset_order_priorities",
    """
    WITH hi AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), lo AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ), ex AS (SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM lo),
    ia AS (SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM lo)
    SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n FROM ex GROUP BY 2
    UNION ALL
    SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n FROM ia GROUP BY 2
    """,
)
def setop_multiset_order_priorities(spark: SparkSession, sf: str):
    """DUPLICATE-PRESERVING set operations — the multiset semantics the
    DISTINCT-based setop queries can't express: per customer, urgent/high
    order slots minus low-priority slots (EXCEPT ALL keeps
    max(m - n, 0) copies) and the overlap (INTERSECT ALL keeps
    min(m, n)).  Spark's exceptAll/intersectAll plan these as a
    count-difference aggregation + generator replay — one shuffle per
    operand pair, no distinct collapse.  Output rolled up to
    (op, custkey, n) so the multiset cardinalities are hash-comparable."""
    o = t(spark, sf, "orders")
    hi = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select("o_custkey")
    lo = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    ex = hi.exceptAll(lo).groupBy("o_custkey").agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "o_custkey", "n"
    )
    ia = hi.intersectAll(lo).groupBy("o_custkey").agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "o_custkey", "n"
    )
    return ex.unionByName(ia)


# ---------------------------------------------------------------------------
@register(
    "orders_cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey,
             MIN(strftime(date_trunc('month', o_orderdate), '%Y-%m')) AS cohort
      FROM orders GROUP BY o_custkey
    ), activity AS (
      SELECT DISTINCT o.o_custkey, f.cohort,
             (CAST(substr(strftime(date_trunc('month', o.o_orderdate), '%Y-%m'), 1, 4) AS INT) * 12
              + CAST(substr(strftime(date_trunc('month', o.o_orderdate), '%Y-%m'), 6, 2) AS INT))
             - (CAST(substr(f.cohort, 1, 4) AS INT) * 12
                + CAST(substr(f.cohort, 6, 2) AS INT)) AS months_since
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT cohort, CAST(months_since AS INT) AS months_since,
           COUNT(*) AS active_customers
    FROM activity
    WHERE months_since <= 6
    GROUP BY 1, 2
    """,
)
def orders_cohort_retention(spark: SparkSession, sf: str):
    """COHORT RETENTION — the acquisition-analysis staple: customers
    grouped by first-order month, counted as active per months-since-
    acquisition (0..6).  Month distance is pure integer arithmetic on
    yyyy-mm fields (no date subtraction, whose day-level semantics
    differ between engines).  Scale: two custkey-keyed aggregations +
    one custkey join; the output matrix is cohorts x 7."""
    o = t(spark, sf, "orders").select(
        "o_custkey", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("m")
    )
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    midx = lambda c: (
        F.substring(c, 1, 4).cast("int") * 12 + F.substring(c, 6, 2).cast("int")
    )
    activity = (
        o.join(firsts, "o_custkey")
        .select(
            "o_custkey", "cohort", (midx(F.col("m")) - midx(F.col("cohort"))).alias("months_since")
        )
        .distinct()
    )
    return (
        activity.filter(F.col("months_since") <= 6)
        .groupBy("cohort", F.col("months_since").cast("int").alias("months_since"))
        .agg(F.count("*").alias("active_customers"))
    )


# ---------------------------------------------------------------------------
@register(
    "supplier_pareto_share",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             {SQL_REVENUE} AS revenue
      FROM lineitem GROUP BY l_suppkey
    ), tot AS (SELECT CAST(SUM(CAST(revenue * 10000 AS BIGINT)) AS BIGINT) AS t FROM rev),
    ranked AS (
      SELECT l_suppkey, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, l_suppkey) AS rnk,
             SUM(CAST(revenue * 10000 AS BIGINT))
               OVER (ORDER BY revenue DESC, l_suppkey
                     ROWS UNBOUNDED PRECEDING) AS cum_units
      FROM rev
    )
    SELECT r.l_suppkey, r.revenue, CAST(r.rnk AS INT) AS rnk,
           CAST(r.cum_units AS DOUBLE) / tot.t AS cum_share,
           CAST(CASE WHEN r.cum_units * 5 <= tot.t * 4 THEN 1 ELSE 0 END AS INT)
             AS in_top_80pct
    FROM ranked r CROSS JOIN tot
    """,
)
def supplier_pareto_share(spark: SparkSession, sf: str):
    """PARETO / concentration analysis: suppliers ranked by revenue with
    the cumulative revenue share and an exact 80%-band flag.  Revenue
    uses the integer-unit discipline, so the running total is an exact
    integer sum (order-independent), the share is one division, and the
    80% cut is the cross-multiplied integer compare
    ``5 * cum <= 4 * total`` — no float threshold.  Scale: one
    lineitem aggregation; the ranking window runs over |suppliers|
    post-aggregation rows with the single-row total broadcast."""
    li = t(spark, sf, "lineitem")
    rev = li.groupBy("l_suppkey").agg(revenue_sum().alias("revenue"))
    units = F.round(F.col("revenue") * 10000, 0).cast("long")
    rev = rev.withColumn("_u", units)
    tot = rev.agg(F.sum("_u").cast("long").alias("t"))
    wr = W.orderBy(F.desc("revenue"), "l_suppkey")
    ranked = rev.select(
        "l_suppkey", "revenue",
        F.row_number().over(wr).cast("int").alias("rnk"),
        F.sum("_u").over(wr.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum_units"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "l_suppkey", "revenue", "rnk",
        (F.col("cum_units").cast("double") / F.col("t")).alias("cum_share"),
        (F.col("cum_units") * 5 <= F.col("t") * 4).cast("int").alias("in_top_80pct"),
    )


# ---------------------------------------------------------------------------
@register(
    "orders_open_backlog_daily",
    """
    WITH spans AS (
      SELECT o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS placed,
             strftime(MAX(l.l_shipdate) + INTERVAL 1 DAY, '%Y-%m-%d') AS closed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ), deltas AS (
      SELECT placed AS day, 1 AS d FROM spans
      UNION ALL
      SELECT closed AS day, -1 AS d FROM spans
    ), daily AS (
      SELECT day,
             CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
             CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
             CAST(SUM(d) AS BIGINT) AS net
      FROM deltas GROUP BY day
    )
    SELECT day, n_opened, n_closed,
           CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_orders
    FROM daily
    """,
)
def orders_open_backlog_daily(spark: SparkSession, sf: str):
    """SWEEP-LINE concurrency — the open-order backlog curve: each order
    is an interval [placed, last ship], turned into +1/-1 boundary
    deltas whose running sum is the number of concurrently open orders
    per active day.  The standard O(n log n) replacement for the
    quadratic day x open-interval join.  All integer; day keys are
    yyyy-mm-dd strings (lexicographic = chronological).  Scale: one
    orderkey aggregation + one day rollup; the running window runs over
    |distinct days| post-aggregation rows."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    l = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("placed"),
            F.date_format(F.date_add("last_ship", 1), "yyyy-MM-dd").alias("closed"),
        )
    )
    # row-local explode, not unionAll(self) — one evaluation of the
    # order-span join+agg for both sweep deltas
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("placed").alias("day"), F.lit(1).alias("d")),
                F.struct(F.col("closed").alias("day"), F.lit(-1).alias("d")),
            )
        ).alias("_x")
    ).select("_x.day", "_x.d")
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("n_opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("long").alias("n_closed"),
        F.sum("d").cast("long").alias("net"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day", "n_opened", "n_closed",
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


# ---------------------------------------------------------------------------
@register(
    "lineitem_quantity_decile_revenue",
    f"""
    WITH d AS (
      SELECT l_quantity, l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS units,
             NTILE(10) OVER (ORDER BY l_quantity, l_orderkey, l_linenumber)
               AS decile
      FROM lineitem
    )
    SELECT CAST(decile AS INT) AS decile,
           COUNT(*) AS n_lines,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           CAST(SUM(units) AS BIGINT) / 10000.0 AS revenue
    FROM d GROUP BY decile
    """,
)
def lineitem_quantity_decile_revenue(spark: SparkSession, sf: str):
    """DECILE analysis: line items split into quantity deciles (NTILE
    with the unique (orderkey, linenumber) tie-break so bucket
    boundaries are engine-identical) with exact integer-unit revenue per
    decile — does revenue concentrate in large-quantity lines?  Scale
    caveat (documented like sequence_packing_4k): the NTILE here runs
    over RAW lineitem rows in one global window — the semantic pin; a
    deployment derives the same deciles from pre-computed quantile
    boundaries broadcast against the scan."""
    li = t(spark, sf, "lineitem")
    units = cents("l_extendedprice") * (100 - cents("l_discount"))
    w = W.orderBy("l_quantity", "l_orderkey", "l_linenumber")
    d = li.select(
        "l_quantity",
        units.alias("units"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )
    return d.groupBy("decile").agg(
        F.count("*").alias("n_lines"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        (F.sum("units").cast("long") / F.lit(10000.0)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
@register(
    "mktsegment_share_by_nation",
    """
    WITH cells AS (
      SELECT n.n_name, c.c_mktsegment, COUNT(*) AS n_customers,
             CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS balance_cents
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, c_mktsegment, n_customers, balance_cents,
           CAST(n_customers AS DOUBLE)
             / SUM(n_customers) OVER (PARTITION BY n_name) AS segment_share
    FROM cells
    """,
)
def mktsegment_share_by_nation(spark: SparkSession, sf: str):
    """COMPOSITION matrix: market-segment mix per nation with each
    cell's share of its nation (one division of exact counts) plus the
    exact integer-cent balance.  One broadcast dim join + one groupBy;
    the normalizing window runs over the nations x segments matrix."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(cents("c_acctbal")).cast("long").alias("balance_cents"),
        )
    )
    wn = W.partitionBy("n_name")
    return cells.select(
        "n_name", "c_mktsegment", "n_customers", "balance_cents",
        (F.col("n_customers").cast("double") / F.sum("n_customers").over(wn)).alias(
            "segment_share"
        ),
    )


# ---------------------------------------------------------------------------
@register(
    "supplier_lead_time_stats",
    """
    WITH lt AS (
      SELECT l.l_suppkey,
             CAST(epoch_us(l.l_shipdate) // 86400000000
                  - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT l_suppkey,
           COUNT(*) AS n_lines,
           CAST(SUM(lead_days) AS BIGINT) AS total_lead_days,
           CAST(SUM(lead_days) AS DOUBLE) / COUNT(*) AS avg_lead_days,
           MIN(lead_days) AS min_lead_days,
           MAX(lead_days) AS max_lead_days
    FROM lt GROUP BY l_suppkey
    """,
)
def supplier_lead_time_stats(spark: SparkSession, sf: str):
    """Fulfillment LEAD TIME per supplier: order-to-ship delay in whole
    epoch days (integer floor-division on both timestamps — no date
    subtraction, whose sub-day semantics differ between engines), with
    the exact-integer sum, one-division mean, and min/max.  One
    orderkey-keyed fact-fact join + one supplier rollup; AQE splits hot
    suppliers."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    l = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    day = lambda c: F.expr(
        f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {c}) DIV 86400000000"
    )
    lt = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_suppkey", (day("l_shipdate") - day("o_orderdate")).cast("long").alias("lead_days")
    )
    return lt.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum("lead_days").cast("long").alias("total_lead_days"),
        (F.sum("lead_days").cast("double") / F.count("*")).alias("avg_lead_days"),
        F.min("lead_days").alias("min_lead_days"),
        F.max("lead_days").alias("max_lead_days"),
    )


# ---------------------------------------------------------------------------
@register(
    "null_semantics_groupby",
    """
    WITH x AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'O') AS st,
             NULLIF(o_orderpriority, '3-MEDIUM') AS pri
      FROM orders
    )
    SELECT st, pri,
           COUNT(*) AS n_rows,
           COUNT(st) AS n_nonnull_st,
           CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM pri THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nullsafe_eq,
           COALESCE(st, pri, 'both-null') AS coalesced
    FROM x GROUP BY st, pri
    """,
)
def null_semantics_groupby(spark: SparkSession, sf: str):
    """NULL-SEMANTICS coverage row: NULLIF-derived nullable keys grouped
    (both engines place NULL keys in one group), COUNT(*) vs COUNT(col)
    (the rows-vs-nonnull distinction), null-safe equality (<=> /
    IS NOT DISTINCT FROM — true only when both sides are NULL here), and
    a COALESCE chain.  Pins that the engine's null discipline matches
    ANSI at every aggregation touchpoint."""
    o = t(spark, sf, "orders")
    x = o.select(
        F.nullif("o_orderstatus", F.lit("O")).alias("st"),
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("pri"),
    )
    return x.groupBy("st", "pri").agg(
        F.count("*").alias("n_rows"),
        F.count("st").alias("n_nonnull_st"),
        F.sum(F.col("st").eqNullSafe(F.col("pri")).cast("int"))
        .cast("long")
        .alias("n_nullsafe_eq"),
        F.coalesce(F.first("st"), F.first("pri"), F.lit("both-null")).alias("coalesced"),
    )


# ---------------------------------------------------------------------------
@register(
    "null_ordering_ranks",
    """
    WITH x AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st FROM orders
    )
    SELECT o_orderkey, st, rn FROM (
      SELECT o_orderkey, st,
             ROW_NUMBER() OVER (ORDER BY st ASC NULLS LAST, o_orderkey) AS rn
      FROM x)
    WHERE rn <= 20
    """,
)
def null_ordering_ranks(spark: SparkSession, sf: str):
    """EXPLICIT null ordering: Spark's default ascending sort is NULLS
    FIRST while DuckDB's is NULLS LAST — silent cross-engine rank
    divergence unless the ordering is SPELLED: asc_nulls_last on the
    Spark side, ASC NULLS LAST in the SQL.  The top-20 ranked rows pin
    that the explicit form agrees exactly."""
    o = t(spark, sf, "orders")
    x = o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("O")).alias("st"))
    w = W.orderBy(F.col("st").asc_nulls_last(), "o_orderkey")
    return (
        x.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("o_orderkey", "st", "rn")
    )


# ---------------------------------------------------------------------------
@register(
    "orders_weekly_totals",
    """
    WITH w AS (
      SELECT (epoch_us(o_orderdate) // 86400000000 + 3) // 7 AS week_idx,
             o_totalprice
      FROM orders
    )
    SELECT CAST(week_idx AS BIGINT) AS week_idx,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM w GROUP BY week_idx
    """,
)
def orders_weekly_totals(spark: SparkSession, sf: str):
    """CALENDAR-FREE weekly rollup: week index = (epoch_day + 3) div 7
    (Monday-aligned, since 1970-01-01 was a Thursday) — pure integer
    arithmetic instead of ISO week functions, whose year-boundary and
    week-1 rules differ between engines and locales.  One single-shuffle
    groupBy on the derived integer key."""
    o = t(spark, sf, "orders")
    week = F.expr(
        "(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', o_orderdate)"
        " DIV 86400000000 + 3) DIV 7"
    )
    return o.groupBy(week.cast("long").alias("week_idx")).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
@register(
    "lineitem_corr_qty_discount",
    """
    WITH u AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
      FROM lineitem
    ), s AS (
      SELECT flag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM u GROUP BY flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS r
    FROM s
    """,
)
def lineitem_corr_qty_discount(spark: SparkSession, sf: str):
    """PEARSON CORRELATION under the exact-integer discipline: quantity
    vs discount (percent units) per return flag, from six exact int64
    sums with ONE final float conversion — every intermediate here stays
    below 2^53 at the oracle SFs (x <= 50, y <= 10), so the doubles are
    exact and sqrt/divide are IEEE-correctly-rounded: bit-identical
    cross-engine where the built-in ``corr()`` (running float moments,
    accumulation-order-dependent) could never hash-match.  Zero-variance
    groups yield NULL, not NaN.  Scale: one map-side-combined groupBy on
    the 3-value flag; at sf10+ row counts the n*sxx products approach
    2^53 — swap to decimal sums at deployment if exactness past that is
    required."""
    u = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
    )
    s = u.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        # separate zero tests — the vx*vy product form overflows int64
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(
            cov.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        )
        .alias("r"),
    )


# ---------------------------------------------------------------------------
@register(
    "lineitem_histogram_quantiles",
    """
    WITH stats AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
             COUNT(*) AS n,
             (MAX(l_extendedprice) - MIN(l_extendedprice)) / 128 AS w
      FROM lineitem
    ), bins AS (
      SELECT CASE WHEN s.w = 0 THEN 0
                  ELSE LEAST(127, CAST(FLOOR((l_extendedprice - s.mn) / s.w)
                                       AS BIGINT)) END AS bin,
             COUNT(*) AS cnt
      FROM lineitem CROSS JOIN stats s
      GROUP BY 1
    ), cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM bins
    ), qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    SELECT q,
           CASE WHEN s.w = 0 THEN s.mn
                ELSE s.mn + (t.bin + (q * s.n - (t.cum - t.cnt)) / t.cnt) * s.w
           END AS est
    FROM qs CROSS JOIN stats s
    CROSS JOIN LATERAL (
      SELECT bin, cnt, cum FROM cum
      WHERE cum >= q * s.n ORDER BY bin LIMIT 1
    ) t
    """,
)
def lineitem_histogram_quantiles(spark: SparkSession, sf: str):
    """APPROXIMATE QUANTILES from a fixed 128-bin equal-width histogram —
    the mergeable fixed-state sketch shape (the scale path where exact
    percentile sorts are unaffordable): two scans (min/max/count, then
    bin counts), 128 rows of state regardless of input size, map-side
    partial counts, and the estimate interpolates inside the covering
    bin.  DETERMINISTIC unlike t-digest/approx_percentile: bin indexes
    are floor() of IEEE arithmetic and the interpolation is the same
    expression both engines run, so the oracle hash-matches the
    estimates bit-for-bit (the built-in approx_percentile could never
    gate this way).  Sketch error is bounded by bin width; the exact
    median/box-plot queries are the slow-exact counterparts."""
    li = t(spark, sf, "lineitem")
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count("*").alias("n"),
        ((F.max("l_extendedprice") - F.min("l_extendedprice")) / 128).alias("w"),
    )
    bins = (
        li.crossJoin(F.broadcast(stats))
        .select(
            # w == 0 (all values equal) would divide by zero with
            # engine-divergent NULL/inf semantics — pin bin 0 explicitly
            F.when(F.col("w") == 0, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(127),
                    F.floor((F.col("l_extendedprice") - F.col("mn")) / F.col("w")),
                )
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    cum = bins.withColumn(
        "cum",
        F.sum("cnt").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    # covering bin per quantile: smallest bin with cum >= q*n (the 128-row
    # cum frame broadcasts; the per-q argmin is a tiny struct-min)
    j = qs.crossJoin(F.broadcast(stats)).join(
        F.broadcast(cum), F.col("cum") >= F.col("q") * F.col("n")
    )
    best = j.groupBy("q", "mn", "n", "w").agg(
        F.min(F.struct("bin", "cnt", "cum")).alias("t")
    )
    return best.select(
        "q",
        F.when(F.col("w") == 0, F.col("mn"))
        .otherwise(
            F.col("mn")
            + (
                F.col("t.bin")
                + (F.col("q") * F.col("n") - (F.col("t.cum") - F.col("t.cnt")))
                / F.col("t.cnt")
            )
            * F.col("w")
        )
        .alias("est"),
    )


# ---------------------------------------------------------------------------
@register(
    "customer_fuzzy_match_pairs",
    """
    WITH c AS (SELECT c_custkey, c_nationkey, c_name FROM customer)
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM c a JOIN c b
      ON b.c_nationkey = a.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def customer_fuzzy_match_pairs(spark: SparkSession, sf: str):
    """RECORD LINKAGE / entity resolution: near-identical customer names
    found by BLOCKING + exact edit distance — the fuzzy-match primitive
    every dedup-adjacent pipeline needs for keys that hash differently
    but mean the same entity (typos, OCR noise).  Levenshtein is an
    exact integer metric, identical in both engines ON ASCII input —
    the corpus's envelope.  Pinned caveat
    (tests/test_cross_engine_scalars.py): DuckDB's levenshtein counts
    UTF-8 BYTES while Spark's counts CHARACTERS ('café'->'cafe' is 1 vs
    2), so on a multibyte corpus the ORACLE needs a byte-safe
    respelling; the Spark operator's character semantics are the
    correct linkage metric and would not change.  Scale: the quadratic
    comparison runs only INSIDE nation blocks (the standard blocking
    discipline — never corpus × corpus); at deployment, block on
    cheap canonical keys (sorted name tokens, phonetic codes, LSH over
    character n-grams) sized so |block|² stays bounded, exactly like the
    LSH bucket bound in the minhash family."""
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_name")
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_b"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select("key_a", "key_b", "name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )


# ---------------------------------------------------------------------------
@register(
    "orders_column_profile",
    """
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
)
def orders_column_profile(spark: SparkSession, sf: str):
    """DATA PROFILING: per-column null/distinct/min/max summary — the
    first thing run against any new 100 TB table.  ONE pass over the
    table computes every column's profile simultaneously (one aggregate
    with per-column expression sets — column stats stringified so one
    schema fits all types), where the oracle spells the naive N-scan
    UNION.  The multi-distinct aggregate rewrites to an expand + single
    shuffle; for wide tables at deployment swap COUNT(DISTINCT) for
    approx_count_distinct and keep the one-pass shape."""
    o = t(spark, sf, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    profile = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nonnull").alias("n_nonnull"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(profile).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
@register(
    "customer_entity_clusters",
    """
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_nationkey, c_name FROM customer
    ),
    pairs AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM c a JOIN c b
        ON b.c_nationkey = a.c_nationkey AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ),
    edges AS (
      SELECT key_a AS src, key_b AS dst FROM pairs
      UNION
      SELECT key_b AS src, key_a AS dst FROM pairs
    ),
    reach AS (
      SELECT src AS v, src AS label FROM edges
      UNION
      SELECT e.dst AS v, r.label FROM reach r JOIN edges e ON e.src = r.v
    ),
    comp AS (SELECT v, MIN(label) AS entity_id FROM reach GROUP BY v)
    SELECT v AS c_custkey, entity_id,
           COUNT(*) OVER (PARTITION BY entity_id) AS entity_size
    FROM comp
    """,
)
def customer_entity_clusters(spark: SparkSession, sf: str):
    """ENTITY RESOLUTION end to end: the fuzzy-match pairs
    (``customer_fuzzy_match_pairs`` — blocking + exact Levenshtein)
    collapsed into entity groups by connected components, because "A~B,
    B~C" must yield ONE entity {A,B,C} that no single join can express —
    the same composition the dedup ladder runs for near-dup documents,
    applied to the record-linkage graph.  Entity id = smallest reachable
    custkey (deterministic canonical record); the oracle computes the
    identical fixpoint as a recursive CTE.  Scale inherits both parts:
    blocked quadratic compare + diameter-bounded min-label rounds."""
    from byte_convert_avro_spark.operators.dedup import connected_components

    pairs = customer_fuzzy_match_pairs(spark, sf).select(
        F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b")
    )
    comp = connected_components(pairs)
    w = W.partitionBy("entity_id")
    return comp.select(
        F.col("v").alias("c_custkey"), F.col("component").alias("entity_id")
    ).select(
        "c_custkey", "entity_id", F.count("*").over(w).alias("entity_size")
    )


# ---------------------------------------------------------------------------
@register(
    "user_deletion_audit",
    """
    WITH del AS (
      SELECT c_custkey FROM customer
      WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 20 = 0
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM customer c JOIN del d
                   ON d.c_custkey = c.c_custkey) AS BIGINT) AS n_purged
    UNION ALL
    SELECT 'orders',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o JOIN del d
                   ON d.c_custkey = o.o_custkey) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 JOIN orders o ON o.o_orderkey = l.l_orderkey
                 JOIN del d ON d.c_custkey = o.o_custkey) AS BIGINT)
    """,
)
def user_deletion_audit(spark: SparkSession, sf: str):
    """DELETION PROPAGATION AUDIT (the right-to-be-forgotten primitive):
    given a deletion set (here a deterministic 5% hash sample of
    customers), count exactly which rows each table would purge —
    customers directly, orders through o_custkey, lineitems through the
    order graph.  The apply form is the same plan with the counts
    replaced by anti-join writes.  Scale: the deletion set broadcasts
    (it is small by nature), every check is a broadcast LEFT-SEMI join
    — no table shuffles; the lineitem hop reuses the orders semi-join
    output as its (still-small) broadcast side."""
    cust = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    del_keys = cust.filter(hash_bucket("c_custkey", 20) == 0).select("c_custkey")
    purged_orders = orders.join(
        F.broadcast(del_keys), orders.o_custkey == del_keys.c_custkey, "left_semi"
    )

    def audit(name, full, purged):
        return full.agg(F.count("*").cast("long").alias("n_rows")).crossJoin(
            purged.agg(F.count("*").cast("long").alias("n_purged"))
        ).select(F.lit(name).alias("table_name"), "n_rows", "n_purged")

    purged_li = li.join(
        F.broadcast(purged_orders.select("o_orderkey")),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    return (
        audit("customer", cust, cust.join(F.broadcast(del_keys), "c_custkey", "left_semi"))
        .unionAll(audit("orders", orders, purged_orders))
        .unionAll(audit("lineitem", li, purged_li))
    )


# ---------------------------------------------------------------------------
@register(
    "orders_snapshot_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_e2,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 17 AS b
      FROM orders
    ), v2 AS (
      -- simulated next snapshot: bucket 0 deleted, bucket 1 repriced
      -- +1.00, bucket 2 additionally re-inserted under offset keys
      SELECT k, st, CASE WHEN b = 1 THEN price_e2 + 100 ELSE price_e2 END AS price_e2
      FROM v1 WHERE b <> 0
      UNION ALL
      SELECT k + (SELECT CAST('1' || repeat('0', LENGTH(CAST(MAX(o_orderkey) AS VARCHAR))) AS BIGINT) FROM orders),
             st, price_e2 FROM v1 WHERE b = 2
    ), d AS (
      SELECT COALESCE(a.k, z.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN z.k IS NULL THEN 'removed'
                  WHEN a.st <> z.st OR a.price_e2 <> z.price_e2 THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             COALESCE(ABS(z.price_e2 - a.price_e2), 0) AS price_delta_e2
      FROM v1 a FULL OUTER JOIN v2 z ON z.k = a.k
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price_delta_e2) AS BIGINT) AS total_price_delta_e2
    FROM d GROUP BY change_type
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf: str):
    """SNAPSHOT DIFF — the data-regression primitive run between every
    two versions of a managed table: FULL OUTER join on the key,
    classify each row added / removed / changed / unchanged, and account
    the exact value drift (integer cents).  The second snapshot is
    simulated deterministically (one hash bucket deleted, one repriced,
    one re-inserted under offset keys) so both engines diff identical
    inputs.  Scale: one co-partitioned full-outer join on the uniform
    key + one tiny rollup; the diff never materializes unchanged rows'
    payloads beyond the compared columns."""
    v1 = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_e2"),
        hash_bucket("o_orderkey", 17).alias("b"),
    )
    v2 = (
        v1.filter(F.col("b") != 0)
        .select(
            "k",
            "st",
            F.when(F.col("b") == 1, F.col("price_e2") + 100)
            .otherwise(F.col("price_e2"))
            .alias("price_e2"),
        )
        .unionAll(
            v1.filter(F.col("b") == 2)
            # width-derived offset (base.key_offset): scale-safe re-insert keys
            .crossJoin(F.broadcast(key_offset(v1, "k")))
            .select(
                (F.col("k") + F.col("__off")).alias("k"), "st", "price_e2"
            )
        )
    )
    a = v1.select("k", "st", "price_e2")
    z = v2.select(
        F.col("k").alias("k2"), F.col("st").alias("st2"), F.col("price_e2").alias("p2")
    )
    d = a.join(z, a.k == z.k2, "full_outer").select(
        F.when(F.col("k").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(
            (F.col("st") != F.col("st2")) | (F.col("price_e2") != F.col("p2")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce(F.abs(F.col("p2") - F.col("price_e2")), F.lit(0)).alias(
            "price_delta_e2"
        ),
    )
    return d.groupBy("change_type").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("price_delta_e2").cast("long").alias("total_price_delta_e2"),
    )


# ---------------------------------------------------------------------------
@register(
    "functional_dependency_scan",
    """
    SELECT 'c_nationkey->region' AS candidate,
           CAST((SELECT COUNT(DISTINCT c_nationkey) FROM customer) AS BIGINT)
             AS n_lhs,
           CAST((SELECT COUNT(*) FROM (
               SELECT DISTINCT c.c_nationkey, n.n_regionkey
               FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey))
             AS BIGINT) AS n_pairs
    UNION ALL
    SELECT 'o_orderkey->o_custkey',
           CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM (
               SELECT DISTINCT o_orderkey, o_custkey FROM orders)) AS BIGINT)
    UNION ALL
    SELECT 'o_custkey->o_orderpriority',
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM (
               SELECT DISTINCT o_custkey, o_orderpriority FROM orders)) AS BIGINT)
    """,
)
def functional_dependency_scan(spark: SparkSession, sf: str):
    """FUNCTIONAL-DEPENDENCY DETECTION — schema-inference profiling: a
    candidate ``L -> R`` holds exactly when |distinct(L, R)| equals
    |distinct L|.  Three candidates scanned: a true FD through a join
    (nation determines region), a key-based FD (orderkey determines
    custkey), and a NON-dependency (custkey does not determine
    priority) whose pair count exceeds its LHS count — the gap
    quantifies how far from functional the pair is.  Scale: each
    candidate is one distinct aggregation on uniform keys; at
    deployment, candidates for all column pairs batch through one
    pass with approx sketches, keeping this exact form for
    confirmation."""
    cust = t(spark, sf, "customer")
    nat = t(spark, sf, "nation")
    orders = t(spark, sf, "orders")

    def row(name, lhs_cnt, pair_cnt):
        return lhs_cnt.crossJoin(pair_cnt).select(
            F.lit(name).alias("candidate"), "n_lhs", "n_pairs"
        )

    cn = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    r1 = row(
        "c_nationkey->region",
        cust.agg(F.count_distinct("c_nationkey").cast("long").alias("n_lhs")),
        cn.select("c_nationkey", "n_regionkey")
        .distinct()
        .agg(F.count("*").cast("long").alias("n_pairs")),
    )
    r2 = row(
        "o_orderkey->o_custkey",
        orders.agg(F.count_distinct("o_orderkey").cast("long").alias("n_lhs")),
        orders.select("o_orderkey", "o_custkey")
        .distinct()
        .agg(F.count("*").cast("long").alias("n_pairs")),
    )
    r3 = row(
        "o_custkey->o_orderpriority",
        orders.agg(F.count_distinct("o_custkey").cast("long").alias("n_lhs")),
        orders.select("o_custkey", "o_orderpriority")
        .distinct()
        .agg(F.count("*").cast("long").alias("n_pairs")),
    )
    return r1.unionAll(r2).unionAll(r3)


# ---------------------------------------------------------------------------
@register(
    "dq_rule_violations",
    """
    SELECT 'lineitem.quantity_in_1_50' AS rule,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem.extendedprice_positive',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.discount_in_0_0p1',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.orderkey_references_orders',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders.custkey_references_customer',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    """,
)
def dq_rule_violations(spark: SparkSession, sf: str):
    """DATA-QUALITY RULE ENGINE sample (the expectations/DBT-test shape):
    per-rule checked/violation counts over range constraints and
    REFERENTIAL INTEGRITY (orphan lineitems / orders via anti joins).
    Scale: all range rules for one table fuse into ONE scan (conditional
    sums); each integrity rule is a single anti join on the uniform key
    (broadcast when the parent side is small, shuffle otherwise — the
    planner's call, not hard-coded).  A violation budget gate (fail the
    pipeline when n_violations > 0) is a filter on this output."""
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")

    li_scan = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("int"))
        .cast("long")
        .alias("v_qty"),
        F.sum((F.col("l_extendedprice") <= 0).cast("int")).cast("long").alias("v_px"),
        F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("int"))
        .cast("long")
        .alias("v_disc"),
    )
    orphan_li = li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
    orphan_ord = orders.join(cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "left_anti")

    def rule(name, n_col, v_col):
        return li_scan.select(
            F.lit(name).alias("rule"),
            F.col(n_col).alias("n_checked"),
            F.col(v_col).alias("n_violations"),
        )

    r_ref_li = (
        li.agg(F.count("*").cast("long").alias("n_checked"))
        .crossJoin(orphan_li.agg(F.count("*").cast("long").alias("n_violations")))
        .select(F.lit("lineitem.orderkey_references_orders").alias("rule"), "n_checked", "n_violations")
    )
    r_ref_ord = (
        orders.agg(F.count("*").cast("long").alias("n_checked"))
        .crossJoin(orphan_ord.agg(F.count("*").cast("long").alias("n_violations")))
        .select(F.lit("orders.custkey_references_customer").alias("rule"), "n_checked", "n_violations")
    )
    return (
        rule("lineitem.quantity_in_1_50", "n", "v_qty")
        .unionAll(rule("lineitem.extendedprice_positive", "n", "v_px"))
        .unionAll(rule("lineitem.discount_in_0_0p1", "n", "v_disc"))
        .unionAll(r_ref_li)
        .unionAll(r_ref_ord)
    )


# ---------------------------------------------------------------------------
@register(
    "weighted_median_price_by_flag",
    """
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS px,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ), agg AS (
      SELECT flag, px, SUM(wt) AS wt FROM w GROUP BY flag, px
    ), cum AS (
      SELECT flag, px, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY px
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY flag) AS tw
      FROM agg
    )
    SELECT flag,
           CAST(MIN(px) AS DOUBLE) / 100.0 AS weighted_median_price,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cw >= tw
    GROUP BY flag
    """,
)
def weighted_median_price_by_flag(spark: SparkSession, sf: str):
    """WEIGHTED MEDIAN (lower): the price at which half the QUANTITY
    (not half the rows) sits at or below — the inventory-weighted
    central price a row median misstates when cheap items ship in bulk.
    Pure integer machinery: per-(flag, price) weight pre-aggregation,
    one cumulative-weight window, the crossing-point test ``2·cw >= tw``
    in exact ints, and the discrete LOWER median (no averaging) so both
    engines pick the identical element.  Scale: the pre-aggregation
    collapses the window's input to distinct prices per flag; all keys
    co-partition on the 3-value flag."""
    w = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("px"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    agg = w.groupBy("flag", "px").agg(F.sum("wt").alias("wt"))
    wf = W.partitionBy("flag")
    cum = agg.select(
        "flag",
        "px",
        F.sum("wt").over(wf.orderBy("px").rowsBetween(W.unboundedPreceding, 0)).alias("cw"),
        F.sum("wt").over(wf).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            (F.min("px").cast("double") / 100.0).alias("weighted_median_price"),
            F.max("tw").cast("long").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "revenue_bridge_monthly",
    """
    WITH m AS (
      SELECT o_custkey AS cust,
             (EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate) - 1) AS mon,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev
      FROM orders GROUP BY 1, 2
    ), paired AS (
      SELECT COALESCE(a.mon + 1, b.mon) AS mon,
             COALESCE(a.rev, 0) AS prev_rev,
             COALESCE(b.rev, 0) AS cur_rev
      FROM m a FULL OUTER JOIN m b
        ON b.cust = a.cust AND b.mon = a.mon + 1
    )
    SELECT mon,
           CAST(SUM(CASE WHEN prev_rev = 0 THEN cur_rev ELSE 0 END) AS BIGINT)
             AS new_e2,
           CAST(SUM(CASE WHEN cur_rev = 0 THEN -prev_rev ELSE 0 END) AS BIGINT)
             AS churned_e2,
           CAST(SUM(CASE WHEN prev_rev > 0 AND cur_rev > prev_rev
                         THEN cur_rev - prev_rev ELSE 0 END) AS BIGINT)
             AS expansion_e2,
           CAST(SUM(CASE WHEN cur_rev > 0 AND prev_rev > cur_rev
                         THEN cur_rev - prev_rev ELSE 0 END) AS BIGINT)
             AS contraction_e2,
           CAST(SUM(cur_rev - prev_rev) AS BIGINT) AS net_change_e2
    FROM paired
    GROUP BY mon
    """,
)
def revenue_bridge_monthly(spark: SparkSession, sf: str):
    """REVENUE BRIDGE (waterfall): each month's net revenue change
    decomposed into new + expansion + contraction + churned — the
    finance-review decomposition, with the invariant ``net = new +
    expansion + contraction + churned`` holding by construction (the
    oracle equality certifies all four buckets at once).  Customer-month
    revenue first (the big reduction), then ONE co-keyed full-outer
    self-join shifted by a month; exact integer cents throughout.
    Month = linear year*12+month index (no date truncation semantics to
    disagree on)."""
    o = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("cust"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("mon"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("rev2"),
    )
    m = o.groupBy("cust", "mon").agg(F.sum("rev2").alias("rev"))
    a = m.select("cust", F.col("mon").alias("mon_a"), F.col("rev").alias("prev_rev"))
    b = m.select(
        F.col("cust").alias("cust_b"), F.col("mon").alias("mon_b"), F.col("rev").alias("cur_rev")
    )
    paired = a.join(
        b, (a.cust == b.cust_b) & (b.mon_b == a.mon_a + 1), "full_outer"
    ).select(
        F.coalesce(F.col("mon_a") + 1, F.col("mon_b")).alias("mon"),
        F.coalesce("prev_rev", F.lit(0)).alias("prev_rev"),
        F.coalesce("cur_rev", F.lit(0)).alias("cur_rev"),
    )
    return paired.groupBy("mon").agg(
        F.sum(F.when(F.col("prev_rev") == 0, F.col("cur_rev")).otherwise(0))
        .cast("long")
        .alias("new_e2"),
        F.sum(F.when(F.col("cur_rev") == 0, -F.col("prev_rev")).otherwise(0))
        .cast("long")
        .alias("churned_e2"),
        F.sum(
            F.when(
                (F.col("prev_rev") > 0) & (F.col("cur_rev") > F.col("prev_rev")),
                F.col("cur_rev") - F.col("prev_rev"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("expansion_e2"),
        F.sum(
            F.when(
                (F.col("cur_rev") > 0) & (F.col("prev_rev") > F.col("cur_rev")),
                F.col("cur_rev") - F.col("prev_rev"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("contraction_e2"),
        F.sum(F.col("cur_rev") - F.col("prev_rev")).cast("long").alias("net_change_e2"),
    )


# ---------------------------------------------------------------------------
@register(
    "revenue_share_of_parent",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS rev2
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(rev2 AS BIGINT) AS rev_e2,
           CAST(rev2 AS DOUBLE)
             / SUM(rev2) OVER (PARTITION BY region) AS share_of_region,
           CAST(SUM(rev2) OVER (PARTITION BY region) AS DOUBLE)
             / SUM(rev2) OVER () AS region_share_of_total
    FROM rev
    """,
)
def revenue_share_of_parent(spark: SparkSession, sf: str):
    """HIERARCHICAL SHARE-OF-PARENT: each nation's share of its region
    AND each region's share of the total in one result — the two-level
    drill-down every rollup report renders.  One fact aggregation to the
    (region, nation) grain (25 rows), then two windows over that TINY
    table — the grand-total window touches 25 rows, never the fact
    table.  Exact-cent sums; shares are single divisions."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev2"))
    )
    wr = W.partitionBy("region")
    wall = W.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.col("rev2").cast("long").alias("rev_e2"),
        (F.col("rev2").cast("double") / F.sum("rev2").over(wr)).alias("share_of_region"),
        (
            F.sum("rev2").over(wr).cast("double") / F.sum("rev2").over(wall)
        ).alias("region_share_of_total"),
    )


# ---------------------------------------------------------------------------
@register(
    "order_value_gini",
    """
    WITH x AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
             o_orderkey
      FROM orders
    ), ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, o_orderkey) AS i,
             COUNT(*) OVER () AS n
      FROM x
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(SUM(v) AS BIGINT) AS total_e2,
           CAST(2 * SUM(i * v) - (MAX(n) + 1) * SUM(v) AS DOUBLE)
             / (MAX(n) * SUM(v)) AS gini
    FROM ranked
    """,
)
def order_value_gini(spark: SparkSession, sf: str):
    """GINI COEFFICIENT of order values — the inequality measure next to
    HHI/Pareto in the concentration family, from the exact rank formula
    ``G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`` over values sorted ascending
    (ties broken by key, so both engines rank identically).

    Accumulation width (r13 sf1 audit find): the per-row product
    ``i·v`` fits int64 at any sane SF, but ``Σ i·v`` grows as
    n²·mean(v)/2 — ~2×10^19 at sf1's 1.5M orders, PAST int64.  DuckDB
    was always exact here (``SUM(BIGINT)`` returns hugeint); Spark's
    long sum threw ``ArithmeticException`` at sf1 — the loud ANSI
    overflow, but an engine-divergent failure the gate only caught
    above toy scale.  The rank-weighted sums now accumulate in
    ``decimal(38,0)`` (exact to 10^38 ≈ sf10^10) and convert to double
    once at the end — both engines round the same exact integers to
    the same nearest doubles.  ONE final division.  Scale note: the
    global rank is the one all-to-one window in this query — at 100 TB
    swap it for the range-partitioned two-pass rank (per-partition
    counts -> offset broadcast), same numbers."""
    x = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        "o_orderkey",
    )
    ranked = x.select(
        "v",
        F.row_number().over(W.orderBy("v", "o_orderkey")).alias("i"),
        F.count("*").over(W.partitionBy()).alias("n"),
    )
    s_iv = F.sum((F.col("i") * F.col("v")).cast("decimal(38,0)"))
    s_v = F.sum(F.col("v").cast("decimal(38,0)"))
    return ranked.agg(
        F.max("n").cast("long").alias("n_orders"),
        F.sum("v").cast("long").alias("total_e2"),
        (
            (F.lit(2) * s_iv - (F.max("n") + 1) * s_v).cast("double")
            / (F.max("n") * s_v).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
@register(
    "sla_ship_compliance_by_priority",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CASE WHEN (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                              // 86400000000 <= 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30d,
           CAST(SUM(CASE WHEN (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                              // 86400000000 <= 30
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS sla_attainment
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def sla_ship_compliance_by_priority(spark: SparkSession, sf: str):
    """SLA ATTAINMENT: share of lineitems shipped within 30 days of the
    order, by priority class — the compliance number an ops review
    tracks per tier.  Integer-day latency (µs difference DIV day — the
    same TZ-free discipline as the lead-time stats), exact counts, one
    division.  One co-keyed fact join + a 5-row rollup."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        (
            F.expr(
                "(unix_micros(cast(l_shipdate as timestamp))"
                " - unix_micros(cast(o_orderdate as timestamp))) DIV 86400000000"
            )
            <= 30
        )
        .cast("int")
        .alias("ok"),
    )
    return j.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_lineitems"),
        F.sum("ok").cast("long").alias("n_within_30d"),
        (F.sum("ok").cast("double") / F.count("*")).alias("sla_attainment"),
    )
