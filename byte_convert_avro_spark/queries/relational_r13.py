"""Round-13 additions: general banded-inequality (theta) joins.

The interval family (``operators/intervals.py``) had equi-bucketed
OVERLAP joins; what it lacked was the documented 100 TB template for the
general BAND predicate ``r.v BETWEEN l.v - d AND l.v + d`` — which Spark
plans as BroadcastNestedLoopJoin (every left row against every right
row, quadratic work no executor count survives).  ``band_join`` rewrites
it as a bucket equi-join: the left value explodes into the <=3 buckets
its band touches, the right value lands in exactly ONE bucket (so no
pair-dedup shuffle — single-witness by construction), the exact band
predicate verifies partition-locally.  Shuffle key = bucket; fan-in per
bucket = value density, the information-theoretic floor.

The oracle spells the band as DuckDB's native inequality join
(``ON pc BETWEEN pc - d AND pc + d``, planned as IEJoin there) — a
deliberately asymmetric pin: Spark runs the bucketed rewrite, DuckDB the
range join, and the gate proves they agree pair-for-pair through the
aggregates.

Two rungs: a same-table self band (part retail price) and a cross-table
band over a column with NEGATIVE values (customer vs supplier account
balance), which exercises the truncation-toward-zero bucketing edge the
operator docstring argues is safe (any monotone bucketing preserves
coverage).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from byte_convert_avro_spark.operators.intervals import band_join
from byte_convert_avro_spark.queries.base import cents, register, t


# ---------------------------------------------------------------------------
@register(
    "part_price_band_pairs",
    """
    WITH pc AS (
      SELECT p_partkey, p_brand,
             CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS pc
      FROM part
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ABS(a.pc - b.pc)) AS BIGINT) AS sum_absdiff_c,
           CAST(MAX(ABS(a.pc - b.pc)) AS BIGINT) AS max_absdiff_c
    FROM pc a JOIN pc b
      ON b.pc BETWEEN a.pc - 25 AND a.pc + 25
     AND a.p_partkey < b.p_partkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def part_price_band_pairs(spark: SparkSession, sf: str):
    """Self band-join: every pair of distinct parts priced within 25
    cents of each other, aggregated per ordered brand pair — near-
    identical pricing across brands, the catalog-dedup shape.

    Spark side: ``band_join`` (operators/intervals.py) — bucket
    equi-join, delta=bucket=25, ~3x replication on one side only, NO
    nested loop and NO pair dedup (single witness per pair); the
    ``a.key < b.key`` half-pair filter and the exact band predicate run
    partition-locally.  Plan-pinned (tests/test_plans.py): no
    BroadcastNestedLoopJoin/CartesianProduct node at any SF.

    Oracle: DuckDB's native BETWEEN inequality join (IEJoin) — the
    asymmetric twin.

    Scale: pair count ~= |part| x (51-cent window x price density) — a
    density property, linear in rows at fixed density; the shuffle is
    the bucket equi-join, AQE-planned.  At 100 TB the same spelling
    holds: replication stays 3x, fan-in per bucket stays the local
    value density, and the brand-pair aggregate is map-side
    combinable."""
    pc = (
        t(spark, sf, "part")
        .select("p_partkey", "p_brand", cents("p_retailprice").alias("pc"))
    )
    a = pc.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_brand").alias("a_brand"),
        F.col("pc").alias("a_pc"),
    )
    b = pc.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_brand").alias("b_brand"),
        F.col("pc").alias("b_pc"),
    )
    pairs = band_join(a, b, "a_pc", "b_pc", delta=25).filter(
        F.col("a_key") < F.col("b_key")
    )
    diff = F.abs(F.col("a_pc") - F.col("b_pc"))
    return (
        pairs.groupBy(
            F.col("a_brand").alias("brand_a"), F.col("b_brand").alias("brand_b")
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(diff).cast("long").alias("sum_absdiff_c"),
            F.max(diff).cast("long").alias("max_absdiff_c"),
        )
        .orderBy("brand_a", "brand_b")
    )


# ---------------------------------------------------------------------------
@register(
    "customer_supplier_balance_band",
    """
    WITH c AS (
      SELECT c_custkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cb
      FROM customer
    ), s AS (
      SELECT s_suppkey, s_nationkey,
             CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS sb
      FROM supplier
    )
    SELECT s.s_nationkey AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(ABS(c.cb - s.sb)) AS BIGINT) AS sum_absdiff_c,
           CAST(MIN(c.cb) AS BIGINT) AS min_cb
    FROM c JOIN s ON c.cb BETWEEN s.sb - 500 AND s.sb + 500
    GROUP BY 1
    ORDER BY 1
    """,
)
def customer_supplier_balance_band(spark: SparkSession, sf: str):
    """Cross-table band-join on a SIGNED column: customers whose account
    balance is within $5.00 of some supplier's, per supplier nation —
    the peer-matching shape (find entities with near-identical numeric
    state across two tables).

    Account balances span [-999.99, 9999.99], so ~9%% of values are
    negative: this entry is the standing proof that ``band_join``'s
    truncation-toward-zero bucketing (Spark ``DIV``) stays correct
    across the sign boundary — coverage needs only a monotone bucket
    function, and the zero-straddling bucket is merely wider, never
    lossy.  Left/interval side = supplier (the SMALL side carries the
    3x explode), right/point side = customer.

    Oracle: native BETWEEN range join.  Scale: same template as
    ``part_price_band_pairs``; COUNT(DISTINCT c_custkey) is the one
    two-phase agg (Spark expands it to a partial-distinct plan
    automatically)."""
    c = t(spark, sf, "customer").select(
        "c_custkey", cents("c_acctbal").alias("cb")
    )
    s = t(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey", cents("s_acctbal").alias("sb")
    )
    pairs = band_join(s, c, "sb", "cb", delta=500)
    diff = F.abs(F.col("cb") - F.col("sb"))
    return (
        pairs.groupBy(F.col("s_nationkey").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.sum(diff).cast("long").alias("sum_absdiff_c"),
            F.min("cb").cast("long").alias("min_cb"),
        )
        .orderBy("nation")
    )
