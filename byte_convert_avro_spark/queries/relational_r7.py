"""Round-7 relational shapes the registry lacked: QUALIFY-style inline
window filters, LATERAL-style per-row top-k, date-interval arithmetic
(fulfillment spans, reorder gaps, burst sessionization), a non-equi
interval-overlap self-join, interpolated percentiles (percentile_cont
semantics from exact integer rank math), RANK-with-ties top-k,
relational division, and a dbt-style data-quality expectation suite —
the shapes a warehouse user reaches for daily that weren't yet under
the oracle gate (round-6 verdict lead #7; the driver's correctness
sample rotated onto the relational family in r06).

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


# ---------------------------------------------------------------------------
@register(
    "order_price_percentile_cont",
    """
    WITH c AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS price_c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(ROUND(o_totalprice*100,0) AS BIGINT),
                                         o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ), picks AS (
      SELECT o_orderpriority, n,
             MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN price_c END) AS p50_lo,
             MAX(CASE WHEN rn = (n - 1) // 2 + 1 + (CASE WHEN (n - 1) % 2 = 1 THEN 1 ELSE 0 END)
                      THEN price_c END) AS p50_hi,
             MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN price_c END) AS p90_lo,
             MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 + (CASE WHEN ((n - 1) * 9) % 10 > 0 THEN 1 ELSE 0 END)
                      THEN price_c END) AS p90_hi
      FROM c GROUP BY o_orderpriority, n
    )
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           CAST(p50_lo * 2 + (p50_hi - p50_lo) * ((n - 1) % 2) AS DOUBLE) / 200.0
             AS p50_price,
           CAST(p90_lo * 10 + (p90_hi - p90_lo) * (((n - 1) * 9) % 10) AS DOUBLE) / 1000.0
             AS p90_price
    FROM picks
    """,
)
def order_price_percentile_cont(spark: SparkSession, sf: str):
    """INTERPOLATED percentiles (percentile_cont semantics) computed with
    EXACT integer arithmetic on both engines: p50/p90 of order price per
    priority as ``lo + (hi - lo) * frac`` where the rank positions and the
    fractional part are integer-derived (halves for p50, tenths for p90)
    — so the one float division at the end is bit-identical cross-engine,
    where each engine's native percentile_cont would round differently.
    SCALE LIMIT (known, accepted): both windows partition by
    o_orderpriority (5 distinct values), so each window partition holds
    |orders|/5 rows sorted in ONE task — fine at gate scale, a hotspot
    at 100 TB.  The scale path for low-cardinality-group exact
    percentiles is a two-pass selection (per-group counts broadcast,
    then a chunked partial-sort rank pick in the bounded_ordered_agg
    style); this registry entry deliberately keeps the window form
    because its rank arithmetic is the oracle-matched artifact."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(cents("o_totalprice"), "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    c = o.select(
        "o_orderpriority",
        cents("o_totalprice").alias("price_c"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    n1 = F.col("n") - 1
    p50_lo_rn = F.floor(n1 / 2) + 1
    p50_has_hi = (n1 % 2 == 1).cast("long")
    p90_lo_rn = F.floor(n1 * 9 / 10) + 1
    p90_has_hi = ((n1 * 9) % 10 > 0).cast("long")
    picks = c.groupBy("o_orderpriority", "n").agg(
        F.max(F.when(F.col("rn") == p50_lo_rn, F.col("price_c"))).alias("p50_lo"),
        F.max(
            F.when(F.col("rn") == p50_lo_rn + p50_has_hi, F.col("price_c"))
        ).alias("p50_hi"),
        F.max(F.when(F.col("rn") == p90_lo_rn, F.col("price_c"))).alias("p90_lo"),
        F.max(
            F.when(F.col("rn") == p90_lo_rn + p90_has_hi, F.col("price_c"))
        ).alias("p90_hi"),
    )
    n1p = F.col("n") - 1
    return picks.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_orders"),
        (
            (
                F.col("p50_lo") * 2
                + (F.col("p50_hi") - F.col("p50_lo")) * (n1p % 2)
            ).cast("double")
            / 200.0
        ).alias("p50_price"),
        (
            (
                F.col("p90_lo") * 10
                + (F.col("p90_hi") - F.col("p90_lo")) * ((n1p * 9) % 10)
            ).cast("double")
            / 1000.0
        ).alias("p90_price"),
    )


# ---------------------------------------------------------------------------
@register(
    "brand_top_parts_with_ties",
    """
    SELECT p_brand, p_partkey, p_name, p_retailprice, price_rank
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             RANK() OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC) AS price_rank
      FROM part)
    WHERE price_rank <= 2
    """,
)
def brand_top_parts_with_ties(spark: SparkSession, sf: str):
    """TOP-K WITH TIES — RANK() semantics instead of row_number: every
    part tied at the 2 highest retail prices of its brand is kept, so the
    result is a deterministic SET (no arbitrary tie-break needed — the
    shape row_number cannot express without dropping tied rows).  Scale:
    one window over the part table partitioned by brand; no join."""
    p = t(spark, sf, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        p.withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= 2)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "price_rank")
    )


# ---------------------------------------------------------------------------
@register(
    "orders_burst_sessions",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders
    ), flagged AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CASE WHEN prev_d IS NULL
                       OR date_diff('day', prev_d, o_orderdate) > 30
                  THEN 1 ELSE 0 END AS new_burst
      FROM seq
    ), runs AS (
      SELECT o_custkey, o_orderdate,
             SUM(new_burst) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS UNBOUNDED PRECEDING) AS burst_id
      FROM flagged
    ), bursts AS (
      SELECT o_custkey, burst_id, COUNT(*) AS n_orders,
             date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS span_days
      FROM runs GROUP BY o_custkey, burst_id
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_bursts,
           CAST(MAX(n_orders) AS BIGINT) AS max_burst_orders,
           CAST(MAX(span_days) AS BIGINT) AS max_burst_span_days
    FROM bursts GROUP BY o_custkey
    """,
)
def orders_burst_sessions(spark: SparkSession, sf: str):
    """ORDER-BURST SESSIONIZATION on the relational side: consecutive
    orders of a customer within 30 days chain into one burst
    (gaps-and-islands — the events_sessionization idiom applied to
    transactional data), reported per customer as burst count, biggest
    burst, and longest burst span.  Integer-day gap test, so the burst
    boundaries are exact on both engines.  Scale: both windows and both
    rollups share the o_custkey shuffle key — ONE exchange end to end."""
    o = t(spark, sf, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.lag("o_orderdate").over(wo).alias("prev_d"),
    )
    flagged = seq.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.when(
            F.col("prev_d").isNull()
            | (F.datediff("o_orderdate", "prev_d") > 30),
            1,
        )
        .otherwise(0)
        .alias("new_burst"),
    )
    runs = flagged.withColumn(
        "burst_id",
        F.sum("new_burst").over(wo.rowsBetween(W.unboundedPreceding, 0)),
    )
    bursts = runs.groupBy("o_custkey", "burst_id").agg(
        F.count("*").alias("n_orders"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("span_days"),
    )
    return bursts.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").cast("long").alias("n_bursts"),
        F.max("n_orders").cast("long").alias("max_burst_orders"),
        F.max("span_days").cast("long").alias("max_burst_span_days"),
    )


# ---------------------------------------------------------------------------
@register(
    "suppliers_covering_all_small_sizes",
    """
    WITH small AS (
      SELECT p_partkey, p_size FROM part WHERE p_size <= 5
    ), want AS (
      SELECT COUNT(DISTINCT p_size) AS n_sizes FROM small
    ), supplied AS (
      SELECT DISTINCT l_suppkey, p_size
      FROM lineitem JOIN small ON p_partkey = l_partkey
    ), cover AS (
      SELECT l_suppkey, COUNT(*) AS n_covered
      FROM supplied GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(n_covered AS BIGINT) AS n_sizes_covered
    FROM cover JOIN supplier ON s_suppkey = l_suppkey
    CROSS JOIN want
    WHERE n_covered = n_sizes
    """,
)
def suppliers_covering_all_small_sizes(spark: SparkSession, sf: str):
    """RELATIONAL DIVISION ("for all"): suppliers that have shipped
    small parts (size <= 5) in EVERY size that exists in that range —
    the classic division-as-count-equality rewrite (distinct covered
    sizes == total distinct sizes) instead of the naive
    double-NOT-EXISTS, which plans as nested correlated anti-joins.
    Scale: the small-part dim filters then broadcasts into lineitem, the
    distinct and count both key on the supplier, and the universe size
    is ONE broadcast scalar."""
    p = t(spark, sf, "part")
    small = p.filter(F.col("p_size") <= 5).select("p_partkey", "p_size")
    want = small.agg(F.count_distinct("p_size").alias("n_sizes"))
    l = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    supplied = (
        l.join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_suppkey", "p_size")
        .distinct()
    )
    cover = supplied.groupBy("l_suppkey").agg(F.count("*").alias("n_covered"))
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        cover.crossJoin(F.broadcast(want))
        .filter(F.col("n_covered") == F.col("n_sizes"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("n_covered").cast("long").alias("n_sizes_covered")
        )
    )


# ---------------------------------------------------------------------------
@register(
    "orders_data_quality_expectations",
    """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)
    SELECT 'not_null:o_custkey' AS expectation,
           (SELECT n_rows FROM n) AS n_checked,
           CAST(COUNT(*) AS BIGINT) AS n_failed,
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM orders WHERE o_custkey IS NULL
    UNION ALL
    SELECT 'unique:o_orderkey',
           (SELECT n_rows FROM n),
           CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT),
           CAST(CASE WHEN COALESCE(SUM(cnt - 1), 0) = 0 THEN 1 ELSE 0 END AS INT)
    FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'accepted_values:o_orderstatus',
           (SELECT n_rows FROM n),
           CAST(COUNT(*) AS BIGINT),
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT)
    FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')
    UNION ALL
    SELECT 'relationship:o_custkey->customer',
           (SELECT n_rows FROM n),
           CAST(COUNT(*) AS BIGINT),
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT)
    FROM orders LEFT JOIN customer ON c_custkey = o_custkey
    WHERE c_custkey IS NULL
    UNION ALL
    SELECT 'range:o_totalprice>0',
           (SELECT n_rows FROM n),
           CAST(COUNT(*) AS BIGINT),
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT)
    FROM orders WHERE o_totalprice IS NULL OR o_totalprice <= 0
    """,
)
def orders_data_quality_expectations(spark: SparkSession, sf: str):
    """DATA-QUALITY EXPECTATIONS as a query (the dbt-test / Great-
    Expectations shape): one row per contract — not-null, uniqueness,
    accepted values, referential integrity, range — with checked/failed
    counts and a pass flag, so the WHOLE quality gate is itself under
    the oracle gate.  Scale: each expectation is one scan-side aggregate
    (the uniqueness check keys its shuffle on the tested column; the
    relationship check is a broadcast-able anti-join); the union is
    plan-level, 5 rows out."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer").select("c_custkey")
    n_rows = o.count()

    def row(name, n_failed_df):
        return n_failed_df.select(
            F.lit(name).alias("expectation"),
            F.lit(n_rows).cast("long").alias("n_checked"),
            F.col("nf").cast("long").alias("n_failed"),
            (F.col("nf") == 0).cast("int").alias("passed"),
        )

    nn = o.filter(F.col("o_custkey").isNull()).agg(F.count("*").alias("nf"))
    uq = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("nf"))
    )
    av = o.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count("*").alias("nf")
    )
    rel = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count("*").alias("nf"))
    )
    rng = o.filter(
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
    ).agg(F.count("*").alias("nf"))
    return (
        row("not_null:o_custkey", nn)
        .unionAll(row("unique:o_orderkey", uq))
        .unionAll(row("accepted_values:o_orderstatus", av))
        .unionAll(row("relationship:o_custkey->customer", rel))
        .unionAll(row("range:o_totalprice>0", rng))
    )
