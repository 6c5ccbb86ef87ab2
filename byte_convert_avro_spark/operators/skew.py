"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles skewed JOINS automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.py``).  Skewed
AGGREGATION keys — one user with 10⁹ events, one hot topic — are the
remaining hazard: a plain ``groupBy(key)`` sends every hot-key row to one
reducer.  Partial (map-side) aggregation usually absorbs this, but when
per-key state is large (``collect_list``/``collect_set``/distinct-heavy
aggs) or combiners can't keep up, salting restores balance:

    stage 1: groupBy(key, salt)  — hot key split across N reducers
    stage 2: groupBy(key)        — merge the N partials (N rows per key)

Cost: one extra (tiny) shuffle over per-key×salt partials.  Only
decomposable aggregates qualify (sum/count/min/max — merged by sum/sum/
min/max; avg as sum+count merged at the end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge function for each decomposable partial
_MERGE = {"sum": F.sum, "count": "sum", "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max, avg}.  Results are exactly equal to the
    single-stage ``groupBy(keys).agg(...)`` (decimal-cast your inputs if
    you need order-independent float sums — same discipline as
    ``queries/base.py``).

    The salt is a uniform int derived from a high-entropy hash of the full
    row — DETERMINISTIC on purpose (monotonically_increasing_id/rand would
    NOT do: a nondeterministic shuffle key re-routes recomputed rows on
    partial map-stage retries and can drop/duplicate — see salted_join);
    n_salts bounds the fan-out of stage 2 (N partial rows per key).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))

    partials: list[Column] = []
    merges: list[Column] = []
    for out, (col, fn) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partials.append(F.count(col).alias(p))
            merges.append(F.sum(p).alias(out))
        elif fn == "sum":
            partials.append(F.sum(col).alias(p))
            merges.append(F.sum(p).alias(out))
        elif fn == "min":
            partials.append(F.min(col).alias(p))
            merges.append(F.min(p).alias(out))
        elif fn == "max":
            partials.append(F.max(col).alias(p))
            merges.append(F.max(p).alias(out))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"{p}_s"))
            partials.append(F.count(col).alias(f"{p}_c"))
            merges.append((F.sum(f"{p}_s") / F.sum(f"{p}_c")).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")

    stage1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*merges)


def salted_collect_set(
    df: DataFrame, keys: list[str] | str, col: str, out: str = "values", n_salts: int = 16
) -> DataFrame:
    """Skew-safe ``collect_set``: per-(key, salt) sets built in parallel,
    merged with array_distinct(flatten(...)) — the hot key's set is
    assembled from N bounded pieces instead of one giant reducer-side
    buffer."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    stage1 = salted.groupBy(*keys, "_salt").agg(F.collect_set(col).alias("_part"))
    return stage1.groupBy(*keys).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_part")))).alias(out)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    row_id: str | None = None,
) -> DataFrame:
    """Manual skew-join mitigation: salt the BIG side with a uniform
    ``[0, n_salts)`` value and REPLICATE every small-side row once per
    salt, then equi-join on ``(key, salt)`` — a hot key's rows spread
    across ``n_salts`` reducers instead of melting one task.  Result is
    row-for-row identical to ``big.join(small, key)`` (inner).

    When to use: AQE's skew-join splitting (on by default in
    session.py) handles most cases at runtime by splitting oversized
    partitions — use THIS form when AQE can't see the skew (skew appears
    after a preceding stage's filters), when the join must avoid AQE
    (deterministic stage boundaries), or when one reducer's key is so
    hot that even a split partition's fetch saturates.  Cost: the small
    side shuffles ``n_salts``x its size — keep it dimension-sized, or
    pre-split so only the HOT KEYS take this path and the cold majority
    joins normally.

    The salt MUST be a deterministic function of the row: Spark only
    auto-guards nondeterministic shuffle keys for round-robin
    repartition, so a salt seeded from ``monotonically_increasing_id``
    (or rand) recomputes DIFFERENTLY on a partial map-stage retry (lost
    shuffle blocks, speculative execution) — reducers then see a mix of
    old and recomputed map output routed to different partitions and can
    drop or duplicate rows.  Default salt: ``xxhash64`` of ALL big-side
    columns.  Byte-identical duplicate rows therefore share a salt; when
    the hot key's rows are literal duplicates AND you have a stable
    unique id column (a primary key, a content hash + position — NOT
    something derived at runtime), pass it as ``row_id`` to spread them
    deterministically."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if row_id is not None and row_id not in big.columns:
        raise ValueError(f"row_id column {row_id!r} not in big side {big.columns}")
    salt_src = [F.col(key), F.col(row_id)] if row_id else [F.col(c) for c in big.columns]
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int"),
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [key, "_salt"]).drop("_salt")
