"""Round-9 relational / sketch additions.

Same contract as every other query module: each entry is registered with
a DuckDB oracle and the cross-engine determinism discipline from
``base.py`` (exact-integer cores, e-notation float literals, explicit
tie-break keys, aliases matching both engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import cents, register, t


# ---------------------------------------------------------------------------
@register(
    "kmv_parts_by_segment_nation",
    """
    WITH li AS (
      SELECT c_mktsegment AS segment, n_name AS nation, l_partkey
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
    ), h AS (
      SELECT DISTINCT segment, nation,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
               AS hv
      FROM li
    ), ranked AS (
      SELECT segment, nation, hv,
             ROW_NUMBER() OVER (PARTITION BY segment, nation ORDER BY hv)
               AS rn
      FROM h
    ), sk AS (
      SELECT segment, nation, COUNT(*) AS k_used, MAX(hv) AS kth
      FROM ranked WHERE rn <= 32 GROUP BY 1, 2
    ), exact AS (
      SELECT segment, nation, COUNT(DISTINCT l_partkey) AS exact_parts
      FROM li GROUP BY 1, 2
    )
    SELECT s.segment, s.nation,
           CAST(s.k_used AS BIGINT) AS k_used,
           CAST(s.kth AS BIGINT) AS kth,
           CASE WHEN s.k_used < 32 THEN CAST(s.k_used AS DOUBLE)
                ELSE CAST(31 AS DOUBLE) * 4294967296.0e0 / s.kth END
             AS distinct_est,
           CAST(e.exact_parts AS BIGINT) AS exact_parts
    FROM sk s
    JOIN exact e ON e.segment = s.segment AND e.nation = s.nation
    """,
)
def kmv_parts_by_segment_nation(spark: SparkSession, sf: str):
    """HIGH-CARDINALITY GROUPED KMV — per (market segment x nation), the
    distinct-part sketch estimate with the exact count alongside: the
    per-segment dashboard shape at a group cardinality (125 groups here,
    unbounded in general) where ``kmv_distinct_users_by_type``'s
    enumerable-group TakeOrdered loop is the WRONG plan.  This runs
    ``operators/sketch.kmv_grouped`` — the chunked min-k merge: one
    uniform-chunked window pass (lag first-occurrence + dense_rank <= k
    — streaming functions, zero aggregate buffers, duplicates never
    collected) and one chunks*k-bounded merge, NO per-group driver jobs
    and NO group-sized arrays regardless of group count or skew.  The
    chunking is invisible in the result, so the oracle spells the direct
    rank filter.  chunks=8 makes sf0.01 exercise real multi-chunk
    merges (per-group distinct ~350 >> k); the estimator line
    (k-1)*2^32/kth engages for every group while k_used<k stays exact
    for any small group.  Scale: lineitem->orders is the one fact
    shuffle; customer and nation broadcast."""
    li = (
        t(spark, sf, "lineitem")
        .join(
            t(spark, sf, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf, "customer").select(
                    "c_custkey", "c_nationkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t(spark, sf, "nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
            "l_partkey",
        )
    )
    from byte_convert_avro_spark.operators.sketch import kmv_grouped

    sk = kmv_grouped(li, ["segment", "nation"], "l_partkey", k=32, chunks=8)
    exact = li.groupBy("segment", "nation").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_parts")
    )
    return sk.join(exact, ["segment", "nation"]).select(
        "segment", "nation", "k_used", "kth", "distinct_est", "exact_parts"
    )
