"""TPC-H Q2/Q9/Q11/Q12/Q16/Q20 shapes, adapted to the driver tables.

The driver's TPC-H-ish schema has no ``partsupp`` table and trims several
columns (no l_commitdate/l_receiptdate/l_shipmode, no ps_supplycost), so
the five part/supplier queries re-derive the part-supplier relationship
from distinct ``(l_partkey, l_suppkey)`` pairs in lineitem and use exact
integer price/quantity units as the cost measure — same plan shapes
(aggregate-then-window min/share, scalar-subquery threshold, distinct
counting over an excluded set) on the columns that exist.

Scale notes:

- Fixed-size dims (nation 25 rows, region 5) are ``F.broadcast`` hinted;
  SF-scaling tables (part, supplier, orders) join unhinted so AQE picks
  broadcast only when the filtered side is actually small at runtime.
- Per-part minima / shares are computed as groupBy-then-window over the
  ALREADY-AGGREGATED (part, supplier) rows — the window shuffle carries
  |pairs| rows, never raw lineitem.
- Threshold compares (Q11's "value > 0.1% of total", Q20's ">50% share")
  run in exact integer units, so the predicate is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import cents, register, t

def _units():
    """Exact revenue units for one line: cents(price)*(100-cents(disc)).
    Built lazily — Column construction needs an active SparkContext."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))
_SQL_UNITS = (
    "CAST(ROUND(l_extendedprice*100,0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))"
)


# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    """
    WITH pair_cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS cost_units
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(cost_units AS DOUBLE) / 100.0 AS min_cost
    FROM pair_cost
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
      AND r_name = 'EUROPE'
      AND cost_units = (SELECT MIN(pc.cost_units) FROM pair_cost pc
                        JOIN supplier s2 ON s2.s_suppkey = pc.l_suppkey
                        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
                        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
                        WHERE pc.l_partkey = part.p_partkey
                          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf: str):
    """TPC-H Q2 shape (no partsupp): for STANDARD mid-size parts, the
    EUROPE supplier with the cheapest observed price.  The correlated
    min-cost subquery decorrelates into a per-part window min over the
    pre-aggregated (part, supplier) pairs — one lineitem scan, one pair
    shuffle; the window input is |region-filtered pairs|, not facts."""
    li = t(spark, sf, "lineitem")
    pairs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_units")
    )
    part = t(spark, sf, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    nat = F.broadcast(
        t(spark, sf, "nation")
        .join(
            F.broadcast(t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        t(spark, sf, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_pairs = (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
    )
    best = eu_pairs.withColumn(
        "mn", F.min("cost_units").over(W.partitionBy("p_partkey"))
    ).filter(F.col("cost_units") == F.col("mn"))
    return (
        best.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.col("cost_units").cast("double") / F.lit(100.0)).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
@register(
    "q9_product_type_profit",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM({_SQL_UNITS}) AS BIGINT) / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf: str):
    """TPC-H Q9 shape (profit = exact revenue units; no ps_supplycost to
    subtract): revenue from widget parts by supplier nation and order
    year.  part/orders join unhinted (AQE decides); nation broadcast."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(t(spark, sf, "nation").select("n_nationkey", "n_name"))
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(_units()) / F.lit(10_000.0)).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
@register(
    "q11_important_parts",
    f"""
    WITH per_part AS (
      SELECT l_partkey, CAST(SUM({_SQL_UNITS}) AS BIGINT) AS value_units
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_units AS DOUBLE) / 10000.0 AS part_value
    FROM per_part
    WHERE value_units * 1000 > (SELECT SUM(value_units) FROM per_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf: str):
    """TPC-H Q11 shape (value = revenue from NATION_3 suppliers instead of
    supplycost*availqty): parts worth > 0.1% of the nation's total.  The
    scalar total is a whole-frame window over the already-aggregated
    per-part rows (|parts| rows through one partition, not facts — same
    rationale as q15);  the threshold compares integer units so the
    predicate can't float-drift between engines."""
    li = t(spark, sf, "lineitem")
    nat = F.broadcast(
        t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    )
    supp = (
        t(spark, sf, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_units()).alias("value_units"))
    )
    with_total = per_part.withColumn(
        "total", F.sum("value_units").over(W.partitionBy(F.lit(1)))
    )
    return (
        with_total.filter(F.col("value_units") * 1000 > F.col("total"))
        .select(
            "l_partkey",
            (F.col("value_units").cast("double") / F.lit(10_000.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
@register(
    "q12_ship_delay_priority",
    """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 'LATE'
                WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'SLOW'
                ELSE 'FAST' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
)
def q12_ship_delay_priority(spark: SparkSession, sf: str):
    """TPC-H Q12 shape (no l_shipmode/l_commitdate: buckets by order-to-
    ship delay instead of ship mode): urgent vs other line counts per
    delay bucket.  Both engines compute calendar-day differences on
    midnight timestamps, so the bucket edges agree exactly."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    delay = F.datediff("l_shipdate", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.when(delay > 90, "LATE").when(delay > 30, "SLOW").otherwise("FAST").alias("delay_bucket"),
            high.alias("_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


# ---------------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf: str):
    """TPC-H Q16 shape (part-supplier pairs from lineitem; brand/type
    exclusions kept): distinct suppliers per (brand, type, size).

    Plan order matters at scale: the selective part filter joins
    (broadcastable dim) against lineitem BEFORE the pair-distinct, so the
    distinct exchange carries only pairs whose part survives the filter —
    Catalyst cannot push a join below an aggregate on its own, and
    distinct-then-filter would shuffle every pair in the fact table."""
    part = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    filtered_pairs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
    )
    return (
        filtered_pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
@register(
    "q20_dominant_red_suppliers",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS qty_units
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    share AS (
      SELECT l_suppkey, qty_units,
             SUM(qty_units) OVER (PARTITION BY l_partkey) AS part_total
      FROM shipped
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM share JOIN supplier ON s_suppkey = l_suppkey
    WHERE qty_units * 2 > part_total
    ORDER BY s_suppkey
    """,
)
def q20_dominant_red_suppliers(spark: SparkSession, sf: str):
    """TPC-H Q20 shape (no ps_availqty: 'holds more than half' becomes
    'shipped more than half'): suppliers who shipped >50% of a red part's
    1997 volume.  Share test in integer quantity units over the
    pre-aggregated (part, supplier) rows; date + name filters push to the
    scans before any join."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = t(spark, sf, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_units"))
    )
    share = shipped.withColumn(
        "part_total", F.sum("qty_units").over(W.partitionBy("l_partkey"))
    ).filter(F.col("qty_units") * 2 > F.col("part_total"))
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        share.join(supp, share.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )
