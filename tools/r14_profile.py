#!/usr/bin/env python
"""Phase profiler for the optimization round: times CONSTRUCTION (the
eager part of iterative queries — per-round driver actions) separately
from the final noop MATERIALIZATION, and counts Spark jobs per query via
a job-start listener.  Guide §1: decide whether a slow query is paying
for data or for per-job/planning overhead before touching it.

Usage: python tools/r14_profile.py [--sf-dir DIR] [--runs N] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from byte_convert_avro_spark.session import get_spark
    from byte_convert_avro_spark.queries import queries

    spark = get_spark("r14-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = queries()

    def job_ids() -> list[int]:
        return sc.statusTracker().getJobIdsForGroup(None) or []

    out: dict[str, dict] = {}
    # warm-up at the smallest SF so codegen/JIT noise doesn't pollute
    warm = "/root/testdata/sf0.001"
    for name in args.queries:
        try:
            reg[name](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    for name in args.queries:
        cons, mats, jobs = [], [], []
        for _ in range(args.runs):
            j0 = len(job_ids())
            t0 = time.perf_counter()
            df = reg[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            mats.append(t2 - t1)
            jobs.append(len(job_ids()) - j0)
        out[name] = {
            "construct_s": [round(x, 3) for x in cons],
            "materialize_s": [round(x, 3) for x in mats],
            "n_jobs": jobs,
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(name, json.dumps(out[name]))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
