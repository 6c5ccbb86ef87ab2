"""Interval-overlap join — Spark has no native one, and the naive
``l.start <= r.end AND r.start <= l.end`` theta-join plans as a
nested-loop over the full cross product.  The scale-correct form is the
TIME-BUCKET EQUI-JOIN: explode each CLOSED interval ``[start, end]``
into the fixed-width buckets it touches, equi-join on the bucket (the
shuffle key), verify the exact overlap predicate partition-locally, and
de-duplicate pairs that touched in several buckets.

Cost model: replication factor = interval length / bucket width (pick the
bucket near the TYPICAL interval length so most intervals explode into
1-2 rows); join fan-in per bucket = concurrent intervals in that window —
the true temporal density, which no algorithm can beat.  Never |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
    dedupe: bool = True,
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED integer intervals
    ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap.  Column names
    must be disjoint between the two sides.  Returns left's columns then
    right's, one row per overlapping pair (bucket-duplicate matches are
    collapsed with a distinct keyed on all output columns — callers with
    duplicate-identical rows should carry a key column).

    ``bucket`` is the bucketing width in the interval unit (e.g. µs).
    ``dedupe=False`` skips the pair-dedup shuffle — correct ONLY when at
    most one bucket can witness each pair, i.e. one side's intervals
    never span a bucket boundary (e.g. bucket-aligned hour windows)."""
    if bucket < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket}")
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"left/right column names must be disjoint, both have {sorted(overlap_cols)}"
        )
    lb = left.withColumn(
        "_ib",
        F.explode(F.expr(f"sequence({l_start} DIV {bucket}, {l_end} DIV {bucket})")),
    )
    rb = right.withColumn(
        "_ib2",
        F.explode(F.expr(f"sequence({r_start} DIV {bucket}, {r_end} DIV {bucket})")),
    )
    joined = lb.join(
        rb,
        (F.col("_ib") == F.col("_ib2"))
        & (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end)),
    )
    out = joined.drop("_ib", "_ib2")
    return out.distinct() if dedupe else out
