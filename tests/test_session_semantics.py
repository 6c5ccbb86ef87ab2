"""Semantics pin for the dynamic-gap merging-session operator.

The oracle gate proves ``events_session_window_dynamic_gap`` on the
driver corpus; this file proves the MERGE RULE itself on adversarial
inputs the corpus may never contain: a seeded-random batch of 200
mini-cases (including events landing EXACTLY on a session's current
end — the inclusive-merge boundary) compared against an independent Python
reference of the rule

    new session  <=>  ts > max over prior events of (ts + gap(event))

(strictly greater: Spark merges an event landing exactly on the
current session end — measured by this file's boundary cases; the
driver corpus can never catch this because microsecond ties are
measure-zero there)

run per user.  All 200 cases ride ONE Spark job (case id folded into
the grouping key), so coverage is broad without per-example job cost.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

GAPS = {"purchase": 30_000_000, "view": 10_000_000, "other": 20_000_000}


def _reference_sessions(events):
    """events: list of (ts_us, type) for ONE user, any order.
    Returns sorted list of (start, end, n) per session under the
    running-max rule (STRICT inequality — an event at exactly the
    current session end merges; Spark's session merge treats the end
    as inclusive)."""
    out = []
    cur = None
    for ts, typ in sorted(events):
        if cur is None or ts > cur["end_max"]:
            if cur is not None:
                out.append((cur["start"], cur["last"], cur["n"]))
            cur = {"start": ts, "last": ts, "n": 1, "end_max": ts + GAPS[typ]}
        else:
            cur["last"] = max(cur["last"], ts)
            cur["n"] += 1
            cur["end_max"] = max(cur["end_max"], ts + GAPS[typ])
    if cur is not None:
        out.append((cur["start"], cur["last"], cur["n"]))
    return sorted(out)


def test_dynamic_gap_session_window_matches_reference(spark):
    rng = random.Random(20260815)
    types = list(GAPS)
    rows = []
    expected = {}
    for case in range(200):
        n = rng.randint(1, 12)
        evs = []
        ts = rng.randint(0, 5_000_000)
        for _ in range(n):
            typ = rng.choice(types)
            evs.append((ts, typ))
            mode = rng.random()
            if mode < 0.25:
                # EXACT boundary: next event lands precisely on the
                # running session end — Spark MERGES it (the end is
                # inclusive for merging), the case this file exists for
                end_max = max(t + GAPS[y] for t, y in evs)
                ts = end_max
            elif mode < 0.5:
                ts += rng.randint(0, 5_000_000)  # inside most gaps
            else:
                ts += rng.randint(5_000_000, 60_000_000)  # often beyond
        expected[case] = _reference_sessions(evs)
        rows += [(case, t, y) for t, y in evs]

    df = spark.createDataFrame(rows, "case int, ts_us long, event_type string")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("30 seconds"))
        .when(F.col("event_type") == "view", F.lit("10 seconds"))
        .otherwise(F.lit("20 seconds"))
    )
    got_rows = (
        df.withColumn("ts_ts", F.timestamp_micros("ts_us"))
        .groupBy(F.session_window("ts_ts", gap).alias("s"), "case")
        .agg(
            F.min("ts_us").alias("start"),
            F.max("ts_us").alias("last"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    got: dict[int, list] = {}
    for r in got_rows:
        got.setdefault(r.case, []).append((r.start, r.last, r.n))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == expected
