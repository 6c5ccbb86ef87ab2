"""Graph analytics operators.

Completes the graph trio next to connected components
(``operators/dedup.py connected_components``) and PageRank
(``queries/pipeline_ops.py``): exactly-once triangle counting with the
DEGREE-ORIENTATION scheme that makes the enumeration scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Count triangles in an undirected graph, each exactly once.
    Input is an edge list in any orientation (duplicates and self-loops
    tolerated: edges are canonicalized to ``min < max`` and de-duped).
    -> one row ``(n_nodes, n_edges, n_triangles)``.

    Scale design — DEGREE ORIENTATION (the standard trick that bounds
    enumeration by graph arboricity instead of max degree): orient every
    edge from the endpoint with the smaller ``(degree, id)`` rank to the
    larger, so each node's OUT-degree is at most O(sqrt(2m)) regardless
    of how skewed the raw degree distribution is; a hub with a million
    neighbors contributes no million²-wedge explosion because almost all
    of its edges point INTO it.  A triangle {x, y, z} with rank
    x < y < z is then counted exactly once: as the wedge (x→y, x→z)
    closed by the oriented edge y→z.

    Plan shape: one degree aggregation (node-keyed), the wedge self-join
    on the shared LOW endpoint, and the closing semi-join on the (v, w)
    edge pair — every shuffle keyed on uniform node/edge ids; no stage
    is all-pairs.  Deterministic: rank ties broken by node id."""
    e = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    # orient low-rank -> high-rank; rank = (degree, id) lexicographic
    lo_first = F.struct("da", "a") < F.struct("db", "b")
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    w1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    w2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = w1.join(w2, "u").filter(
        F.struct("dx", "x") < F.struct("dy", "y")
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    counts = e.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        deg.agg(F.count("*").cast("long").alias("n_nodes"))
    )
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")
