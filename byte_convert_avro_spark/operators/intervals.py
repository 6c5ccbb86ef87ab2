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


def band_join(
    left: DataFrame,
    right: DataFrame,
    l_val: str,
    r_val: str,
    delta: int,
    bucket: int | None = None,
) -> DataFrame:
    """General BANDED-INEQUALITY (theta) join: all (left, right) pairs
    with ``abs(l_val - r_val) <= delta`` on integer value columns — the
    100 TB alternative to the nested-loop plan Spark produces for
    ``r.v BETWEEN l.v - d AND l.v + d``.

    Point-vs-interval special case of the bucket equi-join above: the
    LEFT value becomes the interval ``[v-delta, v+delta]`` and explodes
    into the ``ceil(2*delta/bucket)+1`` buckets it touches (3 at the
    default ``bucket=delta``); the RIGHT value stays a POINT and lands
    in exactly ONE bucket.  Because the right side has a single bucket,
    each qualifying pair is witnessed by exactly one bucket — so unlike
    the interval-interval join there is NO pair-dedup shuffle at all.
    The equi-join on the bucket is the shuffle key (sort-merge/hash,
    AQE-planned — never BroadcastNestedLoop/Cartesian; plan-pinned in
    tests/test_plans.py); the exact band predicate is verified
    partition-locally.

    Cost: ~3x left replication + per-bucket fan-in = values within one
    bucket width of each other — the true value-density, which no
    algorithm beats.  Bucketing uses Spark's ``DIV`` (truncation toward
    zero): any MONOTONE bucketing preserves coverage (trunc((l-d)/b) <=
    trunc(r/b) <= trunc((l+d)/b) whenever l-d <= r <= l+d), and
    single-witness uniqueness is the right side's one bucket — both
    hold for negative values too.  Column names must be disjoint.
    Returns left's columns then right's, one row per qualifying pair."""
    if delta < 0:
        raise ValueError(f"delta must be >= 0, got {delta}")
    b = bucket if bucket is not None else max(delta, 1)
    if b < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket}")
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"left/right column names must be disjoint, both have {sorted(overlap_cols)}"
        )
    lb = left.withColumn(
        "_bb",
        F.explode(
            F.expr(f"sequence(({l_val} - {delta}) DIV {b}, ({l_val} + {delta}) DIV {b})")
        ),
    )
    rb = right.withColumn("_bb2", F.expr(f"{r_val} DIV {b}"))
    joined = lb.join(
        rb,
        (F.col("_bb") == F.col("_bb2"))
        & (F.col(r_val) >= F.col(l_val) - F.lit(delta))
        & (F.col(r_val) <= F.col(l_val) + F.lit(delta)),
    )
    return joined.drop("_bb", "_bb2")
