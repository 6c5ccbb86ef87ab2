#!/usr/bin/env python
"""Round-10 scale A/B: native MergingSessions vs gaps-and-islands.

``events_session_window_dynamic_gap`` plans as Spark's MergingSessions
operator with a PARTIAL session aggregate below the exchange; the same
semantics can be spelled as the classic two-window gaps-and-islands
rewrite (running MAX(ts+gap) flag -> prefix-sum session index -> group).
Both are one exchange on user_id — the interesting scale question is
what flows THROUGH it: the native form pre-merges sessions map-side
(exchange carries ~|sessions| rows), the windowed form ships every
event and sorts it twice.

This tool times both forms at the scaled corpora (.scratch/sf1, 1M
events; .scratch/sf10, 10M — build with tools/scale_data.py), asserts
their outputs agree (row count + summed n_events), and prints one JSON
line; redirect to BENCH_r10_session_ab.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def islands_form(spark, sf_dir):
    """Gaps-and-islands twin of events_session_window_dynamic_gap —
    identical semantics (break iff ts STRICTLY exceeds the running
    MAX(ts+gap) — Spark's merge treats the session end as inclusive),
    classic two-window spelling."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from byte_convert_avro_spark.queries.base import dsum, t

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .withColumn("ts_us", F.expr("ts DIV 1000"))
        .withColumn(
            "gap_us",
            F.when(F.col("event_type") == "purchase", F.lit(1_800_000_000))
            .when(F.col("event_type") == "view", F.lit(600_000_000))
            .otherwise(F.lit(1_200_000_000)),
        )
    )
    wseq = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    wprev = wseq.rowsBetween(W.unboundedPreceding, -1)
    flagged = ev.withColumn(
        "new_session",
        F.when(F.max(F.col("ts_us") + F.col("gap_us")).over(wprev).isNull(), 1)
        .when(
            F.col("ts_us") > F.max(F.col("ts_us") + F.col("gap_us")).over(wprev), 1
        )
        .otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(wseq.rowsBetween(W.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        dsum("value").alias("session_value"),
    ).drop("session_idx")


def main() -> int:
    from byte_convert_avro_spark.queries import queries
    from byte_convert_avro_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        os.path.join(REPO, ".scratch", "sf1"),
        os.path.join(REPO, ".scratch", "sf10"),
    ]
    n_runs = int(os.environ.get("SESSION_AB_RUNS", "3"))
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    Q = queries()

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        native = lambda: Q["events_session_window_dynamic_gap"](spark, sf_dir)  # noqa: E731
        islands = lambda: islands_form(spark, sf_dir)  # noqa: E731

        # semantics must agree before the timing means anything
        ncnt = native().count()
        icnt = islands().count()
        nsum = native().groupBy().sum("n_events").collect()[0][0]
        isum = islands().groupBy().sum("n_events").collect()[0][0]
        assert (ncnt, nsum) == (icnt, isum), (
            f"{sf_dir}: native {(ncnt, nsum)} != islands {(icnt, isum)}"
        )

        runs: dict[str, list[float]] = {"native": [], "islands": []}
        mat(native()); mat(islands())  # warm both paths
        for _ in range(n_runs):  # interleaved
            for label, fn in (("native", native), ("islands", islands)):
                t0 = time.perf_counter()
                mat(fn())
                runs[label].append(round(time.perf_counter() - t0, 3))
        out[os.path.basename(sf_dir)] = {
            "sessions": ncnt,
            "events": int(nsum),
            "native_median_s": round(statistics.median(runs["native"]), 3),
            "islands_median_s": round(statistics.median(runs["islands"]), 3),
            "native_runs": runs["native"],
            "islands_runs": runs["islands"],
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(f"{sf_dir}: {out[os.path.basename(sf_dir)]}", file=sys.stderr)

    print(json.dumps({"metric": "session_window_ab", "dirs": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
