"""Streaming Misra-Gries heavy-hitter summary — the cross-batch twin of
``operators/sketch.misra_gries_summary``.

The batch operator distributes the sketch via the PODS'12 mergeability
theorem (sum matching counts, subtract the (k+1)-th largest, drop
non-positives — any merge tree keeps total error <= N/(k+1)); the SAME
theorem makes it streamable: fold each micro-batch's exact token counts
into the k-bounded state with one reduce per batch.  The sequential
4-batch fold is a different merge TREE than the batch entry's
chunk-union, so its result differs from the batch summary — but it is
deterministic given the batch order (the ordered-shard harness), and
the oracle replays the IDENTICAL fold as a 4-stage unrolled SQL chain,
so every estimate is still a pinned value, and the N/(k+1) guarantee
holds for both trees.

State is k entries FOREVER (two parallel arrays + n_seen) — the live
trending-tokens monitor shape.  NoTimeout: a lifetime accumulator like
the rank-sketch twin.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MG_K = 16

OUT_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("k_used", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("ests", T.ArrayType(T.LongType())),
    ]
)

#: k-bounded summary carried between micro-batches
STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("ests", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def mg_fold_reduce(counts: "dict[str, int]", k: int) -> "dict[str, int]":
    """One Misra-Gries reduce, the EXACT rule of the batch operator and
    the SQL oracle: pivot = the count at row k+1 under ORDER BY
    (count DESC, token), subtract it everywhere, keep positives."""
    if len(counts) <= k:
        return dict(counts)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pivot = ordered[k][1]
    return {t: c - pivot for t, c in counts.items() if c - pivot > 0}


def _fold_batches(
    key: tuple, batches: "Iterator[pd.DataFrame]", state: "GroupState"
) -> "Iterator[pd.DataFrame]":
    summary: Counter = Counter()
    n_seen = 0
    if state.exists:
        tokens, ests, n_seen = state.get
        summary.update(dict(zip(tokens, ests)))
    batch: Counter = Counter()
    for pdf in batches:
        for tok in pdf["token"]:
            batch[str(tok)] += 1
    n_seen += sum(batch.values())
    summary.update(batch)
    summary = Counter(mg_fold_reduce(summary, MG_K))
    ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
    state.update(
        ([t for t, _ in ordered], [c for _, c in ordered], n_seen)
    )
    yield pd.DataFrame(
        {
            "n_seen": [n_seen],
            "k_used": [len(ordered)],
            "tokens": [[t for t, _ in ordered]],
            "ests": [[c for _, c in ordered]],
        }
    )


def streaming_misra_gries(tokens: DataFrame, k: int = MG_K) -> DataFrame:
    """Single-group streaming Misra-Gries over a ``token`` column.  The
    constant grouping key makes the whole stream one fold (the sketch
    is globally k-bounded, so single-group state is the POINT — contrast
    per-type rank sketches); a production deployment shards by a hash
    prefix and MAX-merges the shard summaries with one batch reduce,
    which the PODS'12 theorem licenses."""
    assert k == MG_K, "state schema is fixed at MG_K"
    return (
        tokens.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandasWithState(
            _fold_batches,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
