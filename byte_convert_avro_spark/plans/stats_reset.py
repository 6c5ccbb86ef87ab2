"""Plan-statistics reset for iterative DataFrame loops.

Spark's ``DataFrame.localCheckpoint`` truncates the LOGICAL plan but
deliberately preserves the origin plan's ``Statistics`` on the resulting
``LogicalRDD`` (``originStats`` — so joins planned on top of a checkpoint
keep size estimates).  In an iterative loop whose per-round frame is built
by JOINING the previous round's checkpointed frame (connected components:
labels join edges AND labels join nbr_min), the size-only estimator
MULTIPLIES child sizes, so the preserved estimate roughly SQUARES every
round.  The estimate is a ``BigInt``: its bit-length doubles per round,
and by round ~20 every plan-stats computation is a multi-hundred-megabit
``BigInteger.multiply`` on one driver thread — measured on the sf0.1
entity-resolution graph: rounds 0-17 at 0.6 s, round 22 at 65 s, doubling
each round, with the driver pegged single-core in
``BigInteger.multiplyToomCook3``.  The work per round is CONSTANT; only
the estimate explodes.

:func:`reset_plan_stats` breaks the feedback loop: rebuild the frame from
its (checkpointed) RDD through the public
``SparkSession.createDataFrame(JavaRDD[Row], schema)``, which wraps a
fresh ``LogicalRDD`` with NO origin statistics — its estimate is the
constant ``spark.sql.defaultSizeInBytes`` fallback.  Applied to the fed-
back frame once per round, estimates stay 63 bits forever (measured:
flat 0.6 s rounds through convergence).  Cost: one extra node-sized
row-conversion pass inside the next round's job — no extra Spark job
(``javaRDD()`` is lazy), which keeps the one-action-per-round contract of
the loops that use it.

Only loops whose round JOINS the fed-back frame against itself-derived
frames MORE THAN ONCE hit the exponential regime (two self-references
square the estimate).  Single-self-reference loops (Bellman-Ford,
neighborhood sketches: union + one join against constant-stats edges)
grow the bit-length LINEARLY per round — harmless at bounded round
budgets — and don't need this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reset_plan_stats(df: DataFrame) -> DataFrame:
    """Rebuild ``df`` on a fresh ``LogicalRDD`` with default (constant)
    plan statistics, detaching whatever inflated estimate its plan
    carries.  The data and schema are unchanged; the returned frame
    reads ``df``'s RDD (checkpointed or not) lazily.

    CLASSIC JVM MODE ONLY: this reaches through private PySpark
    internals (``df._jdf``, ``spark._jsparkSession``, the
    ``DataFrame(jdf, session)`` constructor) and converts
    InternalRow→Row→InternalRow once per round.  Under Spark Connect
    ``_jdf`` does not exist — fail loudly here rather than deep inside
    a py4j stack, so a future Connect migration sees THIS docstring
    (the fix there would be server-side: e.g. a checkpoint that drops
    ``originStats``, or cost-based stats invalidation)."""
    jdf = getattr(df, "_jdf", None)
    if jdf is None:  # Spark Connect / future API: no JVM handle
        raise NotImplementedError(
            "reset_plan_stats requires classic JVM mode (DataFrame._jdf); "
            "not available under Spark Connect — see docstring for the "
            "migration note"
        )
    spark = df.sparkSession
    fresh = spark._jsparkSession.createDataFrame(jdf.javaRDD(), jdf.schema())
    return DataFrame(fresh, spark)
