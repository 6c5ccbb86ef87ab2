"""Relational analytics over the TPC-H-ish tables — scans, filtered
projections, broadcast + shuffle joins, hash aggregations, windows, rollup,
pivot, set ops, semi/anti joins, top-k, scalar functions.

Scale notes (local[32] tests, 1000-executor design):

- Dimension joins (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast`` — at 100 TB the fact tables shuffle only when keyed aggs
  require it, never for small dims.
- Aggregations are expressed as single ``groupBy().agg()`` so Catalyst
  plans partial (map-side) aggregation before the exchange.
- Filters use raw column predicates (no UDFs) so parquet row-group pruning
  and pushdown stay active (`PushedFilters` in .explain).
- Top-K uses ``orderBy().limit(k)`` which Spark executes as TakeOrdered
  (per-partition heap + driver merge), not a full sort.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import (
    SQL_CHARGE,
    SQL_REVENUE,
    cents,
    charge_sum,
    dsum,
    register,
    revenue_sum,
    t,
)

_DEC = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"


# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_DEC.format(x='l_quantity')} AS sum_qty,
           {_DEC.format(x='l_extendedprice')} AS sum_base_price,
           {SQL_REVENUE} AS sum_disc_price,
           {SQL_CHARGE} AS sum_charge,
           {_DEC.format(x='l_quantity')} / COUNT(*) AS avg_qty,
           {_DEC.format(x='l_extendedprice')} / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf: str):
    """TPC-H Q1 shape: full-scan groupBy with 8 aggregates.  Partial
    aggregation makes the exchange carry 6 rows regardless of input size."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        revenue_sum().alias("sum_disc_price"),
        charge_sum().alias("sum_charge"),
        (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
        (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority,
           {SQL_REVENUE} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf: str):
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    customer scales with SF, so its join is deliberately NOT
    broadcast-hinted: AQE broadcasts it at runtime while the post-filter
    side fits (it does at every test SF) and falls back to a shuffle join
    at cluster scale — a forced hint would pin the broadcast forever and
    OOM the driver at 100 TB (measured 4.5x slower already at local sf1,
    tools/scale_data.py).

    Plan: revenue is pre-aggregated per l_orderkey before the join —
    o_orderdate/o_orderpriority are functionally dependent on the order
    key, so the post-join re-aggregation disappears and the shuffle join
    carries one row per qualifying order instead of one per line."""
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    rev = li.groupBy("l_orderkey").agg(revenue_sum().alias("revenue"))
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {SQL_REVENUE} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf: str):
    """TPC-H Q5 shape: 6-way join.  Only the fixed-size dims
    (nation/region) are broadcast-hinted; customer and supplier scale
    with SF, so their join strategy is left to AQE (broadcast while
    small, shuffle at cluster scale)."""
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf, "nation")
    cust = t(spark, sf, "customer")
    supp = t(spark, sf, "supplier")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue_sum().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    f"""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * CAST(ROUND(l_discount*100,0) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf: str):
    """TPC-H Q6 shape: pure filter+agg — every predicate pushes to parquet."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount")) / F.lit(10_000.0)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           {SQL_REVENUE} AS revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf: str):
    """TPC-H Q10 shape.  Returned-line revenue is pre-aggregated per
    l_orderkey before the join, so the orderkey shuffle carries one row
    per qualifying order; the final customer-key aggregation then re-sums
    the exact integer units (decimal partials re-aggregate losslessly)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "1999-07-01")
    )
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    units = cents("l_extendedprice") * (100 - cents("l_discount"))
    rev = li.groupBy("l_orderkey").agg(F.sum(units).alias("_units"))
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum("_units") / F.lit(10_000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_orders",
    f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           {_DEC.format(x='l_quantity')} AS sum_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf: str):
    """TPC-H Q18 shape: agg -> HAVING on the exact decimal sum -> top-k.

    Plan: pre-aggregate lineitem by l_orderkey and apply the HAVING filter
    BEFORE joining orders/customer — o_orderkey is unique in orders, so
    grouping by it alone is equivalent to the 5-key group, and the join
    then sees only qualifying orders (at 100 TB: the join input shrinks
    by the lines-per-order factor × HAVING selectivity, and the wide
    composite-key shuffle disappears entirely).  customer is NOT
    broadcast-hinted — it scales with SF; forcing the hint measured 4.5x
    slower at local sf1 (driver collect + rebroadcast of 1.5M rows) and
    would OOM outright at cluster scale.  AQE still broadcasts it while
    small."""
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    sq = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_sq"))
        .filter(F.col("_sq") > 150)
    )
    return (
        sq.join(orders, sq.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    f"""
    WITH stats AS (
      SELECT l_partkey AS pk, COUNT(*) AS cnt,
             {_DEC.format(x='l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_DEC.format(x='l_extendedprice')} AS total_extprice,
           COUNT(*) AS n_small
    FROM lineitem JOIN stats ON l_partkey = pk
    WHERE l_quantity * cnt < 0.5 * sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str):
    """TPC-H Q17 shape (correlated avg subquery), decorrelated into
    per-part window aggregates — ONE lineitem scan and one shuffle on
    l_partkey, instead of the classic aggregate-plus-self-join (two scans
    of the fact table; at 100 TB the second scan is the whole cost).  The
    avg comparison is rewritten multiplication-only (q*cnt < 0.5*sum) so
    no engine-specific AVG or division enters the predicate."""
    li = t(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    wp = W.partitionBy("l_partkey")
    stats = li.withColumn("cnt", F.count("*").over(wp)).withColumn(
        "sum_qty", F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(wp).cast("double")
    )
    return (
        stats.filter(F.col("l_quantity") * F.col("cnt") < 0.5 * F.col("sum_qty"))
        .agg(
            dsum("l_extendedprice").alias("total_extprice"),
            F.count("*").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "top_orders_by_value",
    """
    SELECT o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def top_orders_by_value(spark: SparkSession, sf: str):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    no full sort, no shuffle of non-winners."""
    return (
        t(spark, sf, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderstatus",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
@register(
    "brand_top3_parts",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
    WHERE rn <= 3
    """,
)
def brand_top3_parts(spark: SparkSession, sf: str):
    """Top-k per group via window row_number (the scalable per-group top-k:
    one shuffle on the partition key, no global sort)."""
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        t(spark, sf, "part")
        .select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
@register(
    "customer_running_total",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    """,
)
def customer_running_total(spark: SparkSession, sf: str):
    """Cumulative window aggregation; the decimal cast keeps the running sum
    exact so engines can't diverge on accumulation strategy."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
@register(
    "rollup_sales",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_DEC.format(x='l_quantity')} AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_sales(spark: SparkSession, sf: str):
    """Hierarchical subtotals via ROLLUP (grouping-sets family)."""
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
@register(
    "distinct_counts_by_flag",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(DISTINCT l_orderkey) AS n_ord
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_counts_by_flag(spark: SparkSession, sf: str):
    """Multi-column distinct aggregation (Spark expands to partial distinct
    aggregates before the exchange)."""
    return t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_orderkey").alias("n_ord"),
    )


# ---------------------------------------------------------------------------
@register(
    "setop_building_big_spenders",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def setop_building_big_spenders(spark: SparkSession, sf: str):
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.intersect(big)


# ---------------------------------------------------------------------------
@register(
    "setop_machinery_no_big_orders",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setop_machinery_no_big_orders(spark: SparkSession, sf: str):
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    big = (
        t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(big)


# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf: str):
    """Anti join (NOT EXISTS).  At scale: the orders side is reduced to its
    distinct keys before the join, and nation is broadcast."""
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    orders = t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name")
    )


# ---------------------------------------------------------------------------
@register(
    "urgent_customers_by_nation",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def urgent_customers_by_nation(spark: SparkSession, sf: str):
    """Semi join (EXISTS) + agg."""
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    urgent = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(urgent, "c_custkey", "left_semi")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
@register(
    "scalar_function_showcase",
    """
    SELECT p_partkey,
           UPPER(p_name) AS uname,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           p_size % 7 AS size_mod,
           ABS(p_size - 25) AS size_dist,
           SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
           CAST(CAST(p_retailprice * 1.1 AS DECIMAL(18,2)) AS DOUBLE) AS bumped_price
    FROM part
    """,
)
def scalar_function_showcase(spark: SparkSession, sf: str):
    """Scalar function surface: string/math/conditional expressions, all
    JVM-codegen'd (sqrt is IEEE-correctly-rounded, so engines agree;
    transcendentals like ln/exp are deliberately excluded from oracle-checked
    output because libm implementations differ by ulps)."""
    return t(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_retailprice") * 1.1).cast("decimal(18,2)").cast("double").alias("bumped_price"),
    )


# ---------------------------------------------------------------------------
@register(
    "status_matrix_by_priority",
    f"""
    SELECT o_orderpriority,
           {_DEC.format(x="CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END")} AS f_total,
           {_DEC.format(x="CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0 END")} AS o_total,
           {_DEC.format(x="CASE WHEN o_orderstatus='P' THEN o_totalprice ELSE 0 END")} AS p_total,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def status_matrix_by_priority(spark: SparkSession, sf: str):
    """Conditional aggregation (CASE WHEN inside SUM) — the shuffle-free way
    to pivot a low-cardinality dimension into columns."""
    o = t(spark, sf, "orders")

    def cond_sum(status: str, alias: str):
        return dsum(F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(0.0)).alias(alias)

    return o.groupBy("o_orderpriority").agg(
        cond_sum("F", "f_total"),
        cond_sum("O", "o_total"),
        cond_sum("P", "p_total"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
@register(
    "pivot_qty_by_linestatus",
    f"""
    SELECT l_returnflag,
           {_DEC.format(x="CASE WHEN l_linestatus='F' THEN l_quantity END")} AS qty_f,
           {_DEC.format(x="CASE WHEN l_linestatus='O' THEN l_quantity END")} AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_qty_by_linestatus(spark: SparkSession, sf: str):
    """DataFrame pivot (explicit value list so no discovery pass)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


# ---------------------------------------------------------------------------
@register(
    "orders_per_month",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           {_DEC.format(x='o_totalprice')} AS month_total,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def orders_per_month(spark: SparkSession, sf: str):
    """Calendar bucketing on a formatted key (string output so the engines'
    timestamp internals never cross the compare boundary)."""
    o = t(spark, sf, "orders").withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
    return o.groupBy("month").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("month_total"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
@register(
    "active_customers_having",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {_DEC.format(x='o_totalprice')} AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def active_customers_having(spark: SparkSession, sf: str):
    return (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spent"))
        .filter(F.col("n_orders") >= 15)
    )
