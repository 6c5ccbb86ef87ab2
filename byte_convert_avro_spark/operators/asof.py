"""Generic as-of join — Spark has no native one; three implementations:

1. :func:`asof_join` — the **native** plan: union both sides with a kind
   tag, one shuffle on the key, ``last(value, ignorenulls)`` over an
   ordered running window.  Whole-stage codegen, no Python; backward
   direction with allow-exact-match semantics.  Use this whenever it fits.
2. :func:`asof_join_tolerance_native` — backward/forward WITH tolerance,
   still fully native: the same union+window plan, with matches farther
   than ``tolerance`` nulled out afterwards (``merge_asof`` tolerance
   semantics) and forward direction via axis negation.
3. :func:`asof_join_nearest_native` — NEAREST direction, still fully
   native: one union, one shuffle, two running windows (backward +
   forward fills), per-row absolute-gap argmin with explicit tie rules.
4. :func:`asof_join_tolerance` — cogrouped ``pd.merge_asof`` per key:
   the cross-check/compat path (pandas tie semantics).  Both sides
   shuffle once on the key; the match is a partition-local linear merge
   (never a range-join explosion).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on the type (maps — at any nesting — can't)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of: for each left row, latest right row with
    ``right.on <= left.on`` within the same ``by`` group.  Right columns
    arrive suffixed ``_asof``.

    The right payload travels as ONE struct column, so the match is always
    an ATOMIC right row: when several right rows share the same
    ``(by, on)``, the one with the greatest ``(right_cols..., on)`` struct
    (field-wise comparison, NULL fields ordered first) wins — and its
    values are taken together, never stitched across tied rows (a per-
    column ``last(ignorenulls)`` fill would pull a NULL field's value from
    an earlier tied row).  The struct is also the tie-break sort key, so
    the choice is deterministic across partitionings/engines.

    Payload types must be orderable; a map-typed payload column raises
    ``TypeError`` at plan time — use :func:`asof_join_tolerance` (the
    cogrouped ``pd.merge_asof`` form) for such payloads."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    elif len(set(right_cols)) != len(right_cols) or on in right_cols or by in right_cols:
        # the payload struct is right_cols + [on]; a duplicate or an
        # explicit on/by entry would create duplicate field names and make
        # the final getField projection ambiguous — fail fast instead
        raise ValueError(
            f"asof_join right_cols must be unique and exclude on={on!r}/"
            f"by={by!r}, got {right_cols}"
        )
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField(on, right.schema[on].dataType)]
    )
    if not _orderable(payload_t):
        bad = [c for c in right_cols if not _orderable(right.schema[c].dataType)]
        raise TypeError(
            f"asof_join payload columns {bad} are not orderable (map-typed); "
            "use asof_join_tolerance (cogrouped merge_asof) instead"
        )
    l_tag = left.select(
        *left.columns, F.lit(1).alias("_kind"),
        F.lit(None).cast(payload_t).alias("_r"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, by)],
        F.col(on), F.col(by), F.lit(0).alias("_kind"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols], F.col(on).alias(on)
        ).alias("_r"),
    ).select(*l_tag.columns)  # align column order
    u = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy(by)
        .orderBy(on, "_kind", "_r")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        *[c for c in left.columns],
        "_kind",
        F.last(F.when(F.col("_kind") == 0, F.col("_r")), ignorenulls=True)
        .over(w)
        .alias("_rf"),
    )
    return filled.filter(F.col("_kind") == 1).select(
        *[c for c in left.columns],
        *[F.col("_rf").getField(c).alias(f"{c}_asof") for c in right_cols + [on]],
    )


def asof_join_tolerance_native(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance: int | None = None,
    direction: str = "backward",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward/forward as-of with ``merge_asof`` tolerance semantics as a
    pure native plan: run :func:`asof_join` (forward = backward on the
    negated axis), then null out matched columns whose gap exceeds
    ``tolerance`` — the left row survives unmatched, exactly like
    ``pd.merge_asof``.  Whole-stage codegen, no Python;
    ``nearest`` has its own native plan — :func:`asof_join_nearest_native`."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    if direction == "backward":
        j = asof_join(left, right, on, by, right_cols)
        gap = F.col(on) - F.col(f"{on}_asof")
    elif direction == "forward":
        j = asof_join(
            left.withColumn(on, -F.col(on)),
            right.withColumn(on, -F.col(on)),
            on,
            by,
            right_cols,
        ).withColumn(on, -F.col(on)).withColumn(f"{on}_asof", -F.col(f"{on}_asof"))
        gap = F.col(f"{on}_asof") - F.col(on)
    else:
        raise ValueError(
            f"direction must be backward|forward (got {direction!r}); "
            "use asof_join_tolerance for nearest"
        )
    if tolerance is None:
        return j
    j = j.withColumn("_within", F.col(f"{on}_asof").isNotNull() & (gap <= tolerance))
    for c in right_cols + [on]:
        j = j.withColumn(f"{c}_asof", F.when(F.col("_within"), F.col(f"{c}_asof")))
    return j.drop("_within")


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """General as-of via cogrouped ``pd.merge_asof``: integer/float ``on``
    axis, optional tolerance, backward/forward/nearest.

    Tie caveat: among right rows sharing the same ``(by, on)``,
    ``merge_asof`` keeps the last one in input order, and cogroup arrival
    order is not deterministic across Spark runs — prefer
    :func:`asof_join` / :func:`asof_join_tolerance_native` (greatest-
    payload-struct rule) when tied right keys are possible."""
    l_cols = left.columns
    r_cols = [c for c in right.columns if c != by]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"{f.name}_asof {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name != by
        ]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0 or on not in lpdf.columns:
            return pd.DataFrame(columns=[c.split(" ")[0] for c in out_schema.split(", ")])
        lpdf = lpdf.sort_values(on).reset_index(drop=True)
        if len(rpdf) == 0 or on not in rpdf.columns:
            out = lpdf.copy()
            for c in r_cols:
                out[f"{c}_asof"] = None
            return out
        rpdf = rpdf.sort_values(on).reset_index(drop=True)
        renamed = rpdf[r_cols].rename(columns={c: f"{c}_asof" for c in r_cols})
        renamed[on] = rpdf[on]
        merged = pd.merge_asof(
            lpdf,
            renamed,
            on=on,
            direction=direction,
            tolerance=tolerance,
            suffixes=("", "_asof"),
        )
        return merged[[c for c in lpdf.columns] + [f"{c}_asof" for c in r_cols]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )


def asof_join_nearest_native(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance: int | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """NEAREST-direction as-of as a pure native plan — closes the gap
    that previously required the cogrouped ``pd.merge_asof`` path.

    ONE union of both tagged sides, ONE shuffle on ``by``, and TWO
    running windows over it: the backward fill (``last`` non-null right
    payload over the ascending (on, kind, payload) order — rights at the
    same ``on`` sort before the left row, so exact matches count, and
    the greatest payload struct wins ties) and the forward fill
    (``first`` non-null payload looking forward under (on, kind DESC,
    payload DESC) — the same exact-match and greatest-struct rules
    mirrored).  Each left row then keeps whichever candidate has the
    smaller absolute gap, equal distances preferring BACKWARD —
    deterministic, oracle-spellable tie rules, and NO join back onto the
    left frame, so NULL-bearing left rows and duplicate left rows pass
    through one-for-one (the join-back form dropped rows on null
    equality and multiplied duplicates — round-8 review finding).
    ``tolerance`` bounds the accepted gap on both sides (merge_asof
    semantics: the left row survives with nulls).

    Scale: same shape as :func:`asof_join` plus one extra sort of the
    same partitioning (two window orders over one exchange); zero
    Python."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    elif len(set(right_cols)) != len(right_cols) or on in right_cols or by in right_cols:
        raise ValueError(
            f"asof_join right_cols must be unique and exclude on={on!r}/"
            f"by={by!r}, got {right_cols}"
        )
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField(on, right.schema[on].dataType)]
    )
    if not _orderable(payload_t):
        bad = [c for c in right_cols if not _orderable(right.schema[c].dataType)]
        raise TypeError(
            f"asof_join payload columns {bad} are not orderable (map-typed); "
            "use asof_join_tolerance (cogrouped merge_asof) instead"
        )
    l_tag = left.select(
        *left.columns, F.lit(1).alias("_kind"),
        F.lit(None).cast(payload_t).alias("_r"),
    )
    r_tag = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (on, by)
        ],
        F.col(on), F.col(by), F.lit(0).alias("_kind"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols], F.col(on).alias(on)
        ).alias("_r"),
    ).select(*l_tag.columns)
    u = l_tag.unionByName(r_tag)
    rp = F.when(F.col("_kind") == 0, F.col("_r"))
    wb = (
        W.partitionBy(by)
        .orderBy(on, "_kind", "_r")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(by)
        .orderBy(F.col(on), F.desc("_kind"), F.desc("_r"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = u.select(
        *left.columns,
        "_kind",
        F.last(rp, ignorenulls=True).over(wb).alias("_rb"),
        F.first(rp, ignorenulls=True).over(wf).alias("_rf"),
    ).filter(F.col("_kind") == 1)
    bgap = F.col(on) - F.col("_rb").getField(on)
    fgap = F.col("_rf").getField(on) - F.col(on)
    b_ok = F.col("_rb").isNotNull() & (
        F.lit(True) if tolerance is None else (bgap <= tolerance)
    )
    f_ok = F.col("_rf").isNotNull() & (
        F.lit(True) if tolerance is None else (fgap <= tolerance)
    )
    use_b = b_ok & (~f_ok | (bgap <= fgap))
    chosen = F.when(use_b, F.col("_rb")).when(f_ok, F.col("_rf"))
    return filled.select(
        *left.columns,
        *[
            chosen.getField(c).alias(f"{c}_asof")
            for c in right_cols + [on]
        ],
    )
