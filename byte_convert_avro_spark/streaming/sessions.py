"""Streaming sessionization — native plan and custom stateful operator.

Two implementations of the 30-min-gap session semantics pinned by the
batch query ``events_sessionization``:

1. ``sessionize_stream`` — Spark's built-in ``session_window`` (merging
   event-time windows, watermark-bounded state).  The plan to prefer: the
   state merge runs in the JVM state store, fully codegen-adjacent.
2. ``sessionize_stateful`` — ``applyInPandasWithState`` with event-time
   timeout: the template for session semantics the built-in can't express
   (per-session value caps, custom merge logic, emitted partials).  This
   is the Spark analogue of the reference's ``Transformation<R>``
   configure/apply/close lifecycle, upgraded from stateless to stateful
   (SURVEY.md §2 notes the SMT's only state is its schema cache).

Scale notes: both shuffle once on ``user_id``; state is per open session
per user, evicted by watermark/timeout, so memory is bounded by the
number of *concurrently active* users regardless of total stream volume.
Hot users (key skew) are bounded by session merging — a user's state is
one row, not their event history.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from byte_convert_avro_spark.streaming.windows import with_event_time

if TYPE_CHECKING:  # pragma: no cover
    pass

SESSION_GAP_MIN = 30
GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

#: open-session accumulator carried between micro-batches
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Native merging session windows (gap = 30 min), append mode."""
    ev = with_event_time(events)
    return (
        ev.withWatermark("ts_ts", watermark)
        .groupBy(
            F.session_window("ts_ts", f"{SESSION_GAP_MIN} minutes").alias("s"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            (F.col("s.start").cast("long") * 1_000_000).alias("session_start_us"),
            # session_window end = last event + gap; subtract it back so the
            # reported bounds match the batch query (end = last event time).
            (F.col("s.end").cast("long") * 1_000_000 - GAP_US).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


def _make_merge_sessions(value_cap: float | None):
    """Build the per-user session accumulator (runs inside the state store
    round).

    Merge the micro-batch's events (sorted by event time) into the open
    session carried in state; every gap > 30 min closes a session, which is
    emitted.  The trailing session stays open in state with an event-time
    timeout one gap past its last event — when the watermark passes that,
    the timed-out invocation flushes it.

    ``value_cap`` is the custom semantics the built-in ``session_window``
    cannot express: a session also closes as soon as its value total
    reaches the cap (budget/quota sessions); the next event starts a new
    one.
    """

    def _merge_sessions(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, value_sum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                    "session_value": [round(value_sum, 4)],
                }
            )
            return

        ts = []
        vals = []
        for pdf in batches:
            ts.extend(int(v) for v in pdf["ts_us"])
            vals.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts)), key=lambda i: ts[i])

        if state.exists:
            cur = list(state.get)  # [start, end, n, value_sum]
        else:
            cur = None
        closed: list[list] = []
        for i in order:
            t_us, v = ts[i], vals[i]
            if cur is None:
                cur = [t_us, t_us, 1, v]
            elif t_us - cur[1] > GAP_US:
                closed.append(cur)
                cur = [t_us, t_us, 1, v]
            else:
                cur[1] = max(cur[1], t_us)
                cur[2] += 1
                cur[3] += v
            if value_cap is not None and cur[3] >= value_cap:
                closed.append(cur)  # cap reached -> close immediately
                cur = None
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp((cur[1] + GAP_US) // 1000)  # ms
        elif state.exists:
            state.remove()  # cap closed the trailing session
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [round(c[3], 4) for c in closed],
                }
            )

    return _merge_sessions


def sessionize_stateful(
    events: DataFrame, watermark: str = "1 hour", value_cap: float | None = None
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.
    ``value_cap`` closes a session the moment its value total reaches the
    cap — semantics outside the native ``session_window``'s vocabulary."""
    ev = (
        with_event_time(events)
        .withColumn("ts_us", F.expr("ts DIV 1000"))
        .withWatermark("ts_ts", watermark)
        .select("user_id", "ts_us", "ts_ts", "value")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_merge_sessions(value_cap),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

TOTALS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _accumulate_totals(
    key: tuple, batches: "Iterator[pd.DataFrame]", state: "GroupState"
) -> "Iterator[pd.DataFrame]":
    """Running per-user accumulator: merge each micro-batch into the
    state tuple and emit the CUMULATIVE totals after every batch that
    touched the user.  All arithmetic is integer (cents, µs), so emitted
    partials are exact at every step."""
    (user_id,) = key
    n = cents = 0
    first_us = last_us = None
    if state.exists:
        n, cents, first_us, last_us = state.get
    for pdf in batches:
        for ts_us, c in zip(pdf["ts_us"], pdf["value_cents"]):
            # SQL-aggregate NULL semantics (the batch oracle's): COUNT(*)
            # counts the row, SUM/MIN/MAX skip NULLs — a nullable long
            # arrives as NaN in the pandas batch and int(NaN) would abort
            # the whole query otherwise
            n += 1
            if not pd.isna(c):
                cents += int(c)
            if not pd.isna(ts_us):
                t_i = int(ts_us)
                first_us = t_i if first_us is None else min(first_us, t_i)
                last_us = t_i if last_us is None else max(last_us, t_i)
    state.update((n, cents, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_cents": [cents],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful running totals via ``applyInPandasWithState``
    (NoTimeout — the state lives for the stream's lifetime and every
    batch emits the user's cumulative row).  The minimal template for
    custom cross-batch accumulators; the cumulative emission makes the
    LAST row per user equal the batch aggregate, which is what the
    oracle-checked query pins.  No event-time column is added — NoTimeout
    state needs no watermark."""
    ev = events.select(
        "user_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _accumulate_totals,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
