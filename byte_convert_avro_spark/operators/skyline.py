"""2-D skyline (Pareto-dominance) operator.

The classic OLAP "best tradeoff" query (Börzsönyi et al., ICDE 2001):
keep the rows no other row dominates, where y dominates x iff y is <= x
on the minimized column, >= on the maximized column, and strictly
better on at least one.  SQL spells it NOT EXISTS (a quadratic
self-join Spark plans as BroadcastNestedLoopJoin); the reference has no
such operator (its surface is a per-record SMT — SURVEY.md §2 marks all
relational ops ABSENT), so this is part of the analytics addendum.

Spark-first plan — sort-prune, never a nested loop:

1. In 2-D, dominance is a PREFIX property under the sort
   (min_col ASC): x is dominated iff some row strictly cheaper has
   max_col >= x's (one running-max window, RANGE UNBOUNDED PRECEDING
   .. 1 PRECEDING on the exact integer sort key), or some row at the
   SAME min_col value has a strictly larger max_col (one
   partitionBy(min_col) max).  Two window functions, O(n log n), zero
   joins.
2. The global pass sorts ONE partition, so stage 1 first prunes per
   hash bucket: the skyline of a union is contained in the union of
   per-bucket skylines (dominance within a bucket is dominance
   globally), and a uniform bucket's skyline is ~|skyline|-sized, so
   the global stage sees ~buckets * |skyline| rows — at 100 TB the
   single-partition sort is over thousands of rows, not billions.
   With ``group_keys`` (per-group skylines) every window is already
   partitioned and the bucket stage is pure extra parallelism.

Ties: rows with identical (min_col, max_col) do not dominate each
other — all of them are in the skyline (matching NOT EXISTS).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune(
    df: DataFrame, min_col: str, max_col: str, part: Sequence
) -> DataFrame:
    """Drop rows dominated WITHIN each window partition (exact within
    the partition; a superset of the partition-set's skyline)."""
    w_lt = (
        Window.partitionBy(*part)
        .orderBy(min_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    max_lt = F.max(max_col).over(w_lt)
    max_eq = F.max(max_col).over(Window.partitionBy(*part, min_col))
    keep = (max_lt.isNull() | (max_lt < F.col(max_col))) & (
        max_eq <= F.col(max_col)
    )
    return df.withColumn("_keep", keep).filter("_keep").drop("_keep")


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    group_keys: Sequence[str] = (),
    buckets: int = 32,
) -> DataFrame:
    """Rows of ``df`` not Pareto-dominated on (minimize ``min_col``,
    maximize ``max_col``), optionally per ``group_keys`` group.

    ``min_col`` must be an exact (integer) column — the running-max
    window uses a RANGE frame on it, and floats under RANGE would make
    the strictly-cheaper set engine-dependent at equal-value
    boundaries.  ``buckets`` controls the stage-1 prune fan-out; any
    value yields the same rows (the bucket stage only sheds dominated
    rows early)."""
    if buckets < 1:
        raise ValueError(f"skyline_2d needs buckets >= 1, got {buckets}")
    if min_col == max_col:
        raise ValueError("skyline_2d needs distinct min/max columns")
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    min_type = df.schema[min_col].dataType
    if not isinstance(min_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"skyline_2d needs an integral min_col for the RANGE frame; "
            f"{min_col!r} is {min_type.simpleString()}"
        )
    # Dominance against an unknown coordinate is undefined (SQL's NOT
    # EXISTS would silently keep every NULL row because the comparison
    # predicates are never true) — exclude them explicitly, matching
    # set semantics where a row must have both coordinates to be on or
    # off the frontier.
    df = df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
    local = _prune(
        df.withColumn(
            "_bk", F.pmod(F.xxhash64(min_col, max_col), F.lit(buckets))
        ),
        min_col,
        max_col,
        [*group_keys, "_bk"],
    ).drop("_bk")
    return _prune(local, min_col, max_col, list(group_keys))
