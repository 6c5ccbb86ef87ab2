"""Slowly-changing-dimension operators: banded attributes + SCD Type-2
history compression from a changelog.

Extracted from the inline ``events_scd2_value_band`` query (round-6
verdict lead #6) so deployments can tune the change-band thresholds and
reuse the gaps-and-islands compression on any changelog — the registry
query keeps the original values as defaults, so its oracle rows are
unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def band_label(
    value: Column | str,
    thresholds: Sequence[float] = (5, 15),
    labels: Sequence[str] = ("low", "mid", "high"),
) -> Column:
    """Piecewise band attribute: ``labels[i]`` when ``value <
    thresholds[i]`` (first match wins), last label otherwise.  Requires
    ``len(labels) == len(thresholds) + 1`` and ascending thresholds —
    validated at plan time.  Pure CASE WHEN chain, stays in codegen."""
    if len(labels) != len(thresholds) + 1:
        raise ValueError(
            f"need len(labels) == len(thresholds) + 1, got "
            f"{len(labels)} labels / {len(thresholds)} thresholds"
        )
    if list(thresholds) != sorted(thresholds):
        raise ValueError(f"thresholds must ascend, got {list(thresholds)}")
    v = F.col(value) if isinstance(value, str) else value
    out: Column | None = None
    for th, lab in zip(thresholds, labels):
        out = (
            F.when(v < F.lit(th), lab)
            if out is None
            else out.when(v < F.lit(th), lab)
        )
    return out.otherwise(labels[-1]) if out is not None else F.lit(labels[-1])


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD TYPE-2 HISTORY RECONSTRUCTION from a changelog: compress each
    key's attribute stream into change runs (consecutive equal values
    collapse), each run a versioned validity interval ``[valid_from,
    valid_to)`` with the open current row flagged.  ->
    ``(key_col, version, attr_col, valid_from, valid_to, n_events,
    is_current)``; ``valid_from``/``valid_to`` carry ``ts_col``'s type.

    Gaps-and-islands via the change-flag prefix sum, then LEAD for the
    interval close.  Scale: every window and the run rollup partition by
    ``key_col`` — ONE shuffle key end to end, frames are row-bounded; no
    self-join reconstruction (the naive SCD2 build joins the changelog to
    itself per attribute flip).  Determinism: ordering is
    ``(ts_col, tiebreak_col)``, so ties never reorder runs.  NULL
    attributes are a real value: consecutive NULLs collapse into one run
    (null-safe equality — plain ``==`` would open a new version per NULL
    row)."""
    wo = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # lag of a constant distinguishes "no previous row" (must open a run
    # even when attr is NULL — eqNullSafe(NULL, NULL) would say equal)
    # from "previous attr is NULL"
    prev_exists = F.lag(F.lit(1)).over(wo).isNotNull()
    flagged = df.withColumn(
        "_chg",
        F.when(
            prev_exists & F.col(attr_col).eqNullSafe(F.lag(attr_col).over(wo)),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    runs = flagged.withColumn(
        "_run", F.sum("_chg").over(wo.rowsBetween(W.unboundedPreceding, 0))
    )
    hist = runs.groupBy(key_col, "_run").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = W.partitionBy(key_col).orderBy("_run")
    nxt = F.lead("valid_from").over(wv)
    return hist.select(
        key_col,
        F.col("_run").cast("long").alias("version"),
        attr_col,
        "valid_from",
        nxt.alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
        nxt.isNull().cast("int").alias("is_current"),
    )
