#!/usr/bin/env python
"""The sf1 measurement rung (r14 VERDICT lead #2), as a standing runner.

At sf0.1 the headline bench is overhead-bound — the r14 scaling block
showed 8 cores as fast or faster than 32 for EVERY query, so plan-level
wins are invisible there.  This runner executes the headline bench at
sf1 (10x key-shifted sf0.1 replicas via tools/scale_data.py —
regenerated deterministically if absent) at BOTH 32 and 8 cores and
writes the two artifacts the round comparison anchors on:

    BENCH_r15_sf1_local.json   (cpus=32)
    BENCH_r15_sf1_c8.json      (cpus=8)

bench.py's own sidecar logic also refreshes BENCH_local_full_sf1.json
(the sf1 history file) on the 32-core pass, so future sf1 runs
self-adjudicate against it.

Usage: python tools/run_r15_sf1.py [--dst DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", default=os.path.join(REPO, ".scratch", "sf1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, nargs="*", default=[32, 8])
    args = ap.parse_args()

    if not os.path.isdir(args.dst):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scale_data.py"),
             "--factor", "10", "--src", "/root/testdata/sf0.1",
             "--dst", args.dst],
            check=True,
        )

    for cpus in args.cpus:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=args.dst,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_BENCH_RUNS=str(args.runs),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, check=True, capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        doc = json.loads(line)
        doc["cpus"] = cpus
        name = (
            "BENCH_r15_sf1_local.json" if cpus == 32
            else f"BENCH_r15_sf1_c{cpus}.json"
        )
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(doc, f, indent=1)
        print(f"{name}: total {doc['value']} s, loadavg {doc['loadavg']}")


if __name__ == "__main__":
    main()
