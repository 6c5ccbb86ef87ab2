"""Round-7 relational shapes the registry lacked: QUALIFY-style inline
window filters, LATERAL-style per-row top-k, date-interval arithmetic
(fulfillment spans, reorder gaps), and a non-equi interval-overlap
self-join — the shapes a warehouse user reaches for daily that weren't
yet under the oracle gate (round-6 verdict lead #7; the driver's
correctness sample rotated onto the relational family in r06).

Determinism discipline (queries/base.py): exact integer cents for every
money sum, day-integer date_diff for every interval, explicit tie-break
keys under every row_number/LIMIT.

Scale notes per query in the docstrings; shared rules: nation/region are
broadcast (fixed 25/5 rows), per-customer self-joins key the shuffle on
the customer (group sizes bounded by a customer's order count), window
top-k runs over pre-aggregated rows, never raw lineitem.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import cents, register, t


# ---------------------------------------------------------------------------
@register(
    "qualify_top_spender_per_nation",
    """
    WITH spend AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
               AS spend_c
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
    )
    SELECT n_name, c_custkey, c_name,
           CAST(spend_c AS DOUBLE) / 100.0 AS total_spend
    FROM spend JOIN nation ON n_nationkey = c_nationkey
    QUALIFY ROW_NUMBER() OVER (PARTITION BY n_name
                               ORDER BY spend_c DESC, c_custkey) = 1
    """,
)
def qualify_top_spender_per_nation(spark: SparkSession, sf: str):
    """QUALIFY-style inline window filter: each nation's single biggest
    spender (exact cents, ties to the lower custkey).  The oracle spells
    the literal ``QUALIFY`` clause (DuckDB supports it) — the idiom users
    port from Snowflake/BigQuery; Spark expresses the same plan as
    window-then-filter, which Catalyst collapses to one window over the
    aggregated spend table.  Scale: spend aggregates per customer FIRST
    (the big reduction, map-side partials), the window shuffles only
    |customers| rows on nation, and nation is broadcast."""
    spend = (
        t(spark, sf, "customer")
        .join(
            t(spark, sf, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.sum(cents("o_totalprice")).cast("long").alias("spend_c"))
    )
    n = t(spark, sf, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("spend_c"), "c_custkey")
    return (
        spend.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            (F.col("spend_c").cast("double") / 100.0).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "lateral_top3_suppliers_per_region",
    """
    SELECT r_name, s.s_suppkey, s.s_name, s.s_acctbal, s.rnk AS rank
    FROM region, LATERAL (
      SELECT s_suppkey, s_name, s_acctbal,
             ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
      WHERE n_regionkey = r_regionkey
      ORDER BY s_acctbal DESC, s_suppkey
      LIMIT 3
    ) s
    """,
)
def lateral_top3_suppliers_per_region(spark: SparkSession, sf: str):
    """LATERAL-style per-row top-k: for every region row, its 3
    highest-balance suppliers.  The oracle is a literal correlated
    ``LATERAL`` subquery (the idiom users write); the Spark plan is the
    DE-CORRELATED scale form — join the supplier table to its region
    once, rank within region, keep rank <= 3 — which is what a competent
    optimizer rewrites LATERAL into anyway: no per-outer-row re-execution,
    one window over |suppliers| rows, nation/region broadcast."""
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    joined = s.join(
        F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")
    ).join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
    w = W.partitionBy("r_name").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("r_name", "s_suppkey", "s_name", "s_acctbal", "rank")
    )


# ---------------------------------------------------------------------------
@register(
    "order_fulfillment_interval_buckets",
    """
    WITH span AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS price_c,
             date_diff('day', o_orderdate, MAX(l_shipdate)) AS span_days
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderpriority, o_totalprice, o_orderdate
    )
    SELECT CASE WHEN span_days <= 30 THEN '0-30'
                WHEN span_days <= 60 THEN '31-60'
                WHEN span_days <= 90 THEN '61-90'
                ELSE '>90' END AS bucket,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
           CAST(MIN(span_days) AS BIGINT) AS min_days,
           CAST(MAX(span_days) AS BIGINT) AS max_days
    FROM span
    GROUP BY 1, 2
    """,
)
def order_fulfillment_interval_buckets(spark: SparkSession, sf: str):
    """DATE-INTERVAL ARITHMETIC: each order's fulfillment span (order
    date -> last line shipped, in whole days) bucketed into 30-day
    intervals and crossed with priority — the SLA-reporting rollup.
    Integer day math on both engines (datediff / date_diff('day')), so
    the bucket edges are exact.  Scale: one join keyed on the orderkey
    with a map-side MAX partial, then a tiny (bucket, priority)
    aggregation; no window anywhere."""
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem")
    span = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            cents("o_totalprice").alias("price_c"),
            F.datediff("last_ship", "o_orderdate").alias("span_days"),
        )
    )
    bucket = (
        F.when(F.col("span_days") <= 30, "0-30")
        .when(F.col("span_days") <= 60, "31-60")
        .when(F.col("span_days") <= 90, "61-90")
        .otherwise(">90")
    )
    return span.groupBy(bucket.alias("bucket"), "o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("price_c").cast("long").alias("sum_price_c"),
        F.min("span_days").cast("long").alias("min_days"),
        F.max("span_days").cast("long").alias("max_days"),
    )


# ---------------------------------------------------------------------------
@register(
    "customer_reorder_gap_stats",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders
    ), gaps AS (
      SELECT o_custkey, date_diff('day', prev_d, o_orderdate) AS gap
      FROM seq WHERE prev_d IS NOT NULL
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS total_gap_days,
           CAST(MIN(gap) AS BIGINT) AS min_gap,
           CAST(MAX(gap) AS BIGINT) AS max_gap,
           CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_gap_days
    FROM gaps JOIN customer ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def customer_reorder_gap_stats(spark: SparkSession, sf: str):
    """REORDER-GAP intervals: days between each customer's consecutive
    orders (LAG + integer date_diff), rolled up per market segment — the
    repeat-purchase-cadence metric.  The division is the single float,
    computed from exact integers on both engines.  Scale: ONE window
    shuffle keyed on the customer (frames row-bounded at one LAG), the
    segment rollup partial-aggregates map-side; the customer join ships
    only (custkey, gap) ints."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_d"),
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        "o_custkey", F.datediff("o_orderdate", "prev_d").alias("gap")
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        gaps.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("total_gap_days"),
            F.min("gap").cast("long").alias("min_gap"),
            F.max("gap").cast("long").alias("max_gap"),
            (F.sum("gap").cast("double") / F.count("*")).alias("avg_gap_days"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "customer_order_interval_overlaps",
    """
    WITH iv AS (
      SELECT o_orderkey, o_custkey, o_orderdate AS d0, MAX(l_shipdate) AS d1
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2, 3
    )
    SELECT a.o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(MAX(date_diff('day',
                    CASE WHEN a.d0 >= b.d0 THEN a.d0 ELSE b.d0 END,
                    CASE WHEN a.d1 <= b.d1 THEN a.d1 ELSE b.d1 END))
                AS BIGINT) AS max_overlap_days
    FROM iv a JOIN iv b
      ON b.o_custkey = a.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.d0 <= b.d1 AND b.d0 <= a.d1
    GROUP BY 1
    """,
)
def customer_order_interval_overlaps(spark: SparkSession, sf: str):
    """INTERVAL-OVERLAP SELF-JOIN: per customer, how many of their order
    pairs were in flight simultaneously (fulfillment intervals
    [orderdate, last shipdate] intersect) and the longest overlap in
    days — the concurrent-exposure shape behind credit-risk and
    capacity questions.  Non-equi overlap predicates ride as residual
    conditions on an EQUI join keyed on the customer, so the shuffle key
    is uniform and each task's pair work is bounded by that customer's
    order count squared (~10 orders/customer in TPC-H — never a global
    cross join).  Overlap length = min(ends) - max(starts) in integer
    days, exact on both engines."""
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem")
    iv = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("d1"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").alias("d0"),
            "d1",
        )
    )
    a = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("ka"),
        F.col("d0").alias("a0"),
        F.col("d1").alias("a1"),
    )
    b = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("kb"),
        F.col("d0").alias("b0"),
        F.col("d1").alias("b1"),
    )
    pairs = a.join(
        b,
        (a.custkey == b.custkey)
        & (F.col("ka") < F.col("kb"))
        & (F.col("a0") <= F.col("b1"))
        & (F.col("b0") <= F.col("a1")),
    ).drop(b.custkey)
    overlap = F.datediff(
        F.least("a1", "b1"), F.greatest("a0", "b0")
    )
    return pairs.groupBy("custkey").agg(
        F.count("*").cast("long").alias("n_overlapping_pairs"),
        F.max(overlap).cast("long").alias("max_overlap_days"),
    )
