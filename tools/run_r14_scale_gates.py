#!/usr/bin/env python
"""Large-SF gates for the round-14 families, using the registered
sub-quadratic scale-oracle twins where the primary oracle is
brute-force (prefix-filter capped Jaccard, overlap join, FastSS), and
the primary (already linear) oracles everywhere else.

Per-family large-SF posture, disclosed up front:

- capped Jaccard / capped effect / overlap join: scale-oracle twin
  (prefix algorithm in SQL) — gate at sf1 AND sf10.
- FastSS edit-1 join: the corpus above sf0.1 is 10x NAME-replicated
  (tools/scale_data.py shifts keys, not names: 150k rows / 15k names at
  sf1), so the TRUE pair set is output-bound (every replica pair is a
  dist-0 match) — the same class as the uncapped Jaccard rung.  Gate at
  sf1 via the variant-join scale twin; at sf10 record Spark-side wall
  only (disclosed).
- weighted bottom-k: linear primary oracle, but the oracle's unnest
  expansion is sum(quantity) rows (~1.5B at sf10) — gate at sf1,
  Spark-side wall at sf10 (disclosed).
- occurrence-weighted user sample (+ streaming twin), bounded pattern:
  linear primary oracles — gate at sf1 AND sf10.
- PQ trio: unrolled k-means oracle is linear in vectors — gate at sf1
  AND sf10.

Usage: python tools/run_r14_scale_gates.py [--out PARITY_r14_scale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATE_BOTH = [
    "docs_jaccard_prefix_filter_capped",
    "docs_jaccard_capped_effect",
    "docs_overlap_containment_pairs",
    "events_weighted_user_sample",
    "streaming_weighted_user_sample",
    "events_pattern_bounded_views_within_7d",
    "pq_codebooks_m4k4",
    "pq_codes_m4k4",
    "pq_adc_top5_vs_exact",
]
GATE_SF1_ONLY = {
    "customer_name_edit1_fastss": (
        "output-bound at sf10: names are 10x replicated above sf0.1, the "
        "true pair set grows ~100x per 10x data (the uncapped-Jaccard "
        "class); sf10 is Spark-side rows-only"
    ),
    "lineitem_weighted_sample_by_flag": (
        "the ORACLE's unnest expansion is sum(quantity) rows (~1.5B at "
        "sf10); sf10 is Spark-side rows-only"
    ),
}


def run(sf_dir: str, names: list[str], rows_only: list[str]) -> dict:
    rf = os.path.join(REPO, ".scratch", "_r14_scale_result.json")
    if os.path.exists(rf):
        os.unlink(rf)
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "driver_parity.py"),
        "--sf-dir", sf_dir, "--driver-memory", "48g",
        "--no-record", "--progress", "--scale-oracle",
        "--result-file", rf, "--only", *names,
    ]
    if rows_only:
        cmd += ["--rows-only", *rows_only]
    print(f"[{sf_dir}] {len(names)} queries", flush=True)
    subprocess.run(cmd, cwd=REPO)
    if not os.path.exists(rf):
        return {n: {"ok": False, "err": "runner died"} for n in names}
    with open(rf) as fh:
        res = json.load(fh)["results"]
    os.unlink(rf)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r14_scale.json")
    ap.add_argument("--skip-sf10", action="store_true")
    args = ap.parse_args()
    t0 = time.monotonic()
    all_names = GATE_BOTH + sorted(GATE_SF1_ONLY)
    art: dict = {
        "note": (
            "large-SF gates for the r14 families; brute-force-primary "
            "entries gate via their registered scale-oracle twins "
            "(equivalence pinned at sf0.001 by pytest); two sf10 "
            "rows-only lines are disclosed with reasons"
        ),
        "sf1_rows_only_reasons": {},
        "sf10_rows_only_reasons": GATE_SF1_ONLY,
    }
    art["sf1"] = run(".scratch/sf1", all_names, [])
    if not args.skip_sf10:
        art["sf10"] = run(
            ".scratch/sf10", all_names, sorted(GATE_SF1_ONLY)
        )
    art["elapsed_sec"] = round(time.monotonic() - t0, 1)
    failed = sorted(
        f"{sf}:{n}"
        for sf in ("sf1", "sf10")
        for n, v in art.get(sf, {}).items()
        if not v.get("ok")
    )
    art["failed"] = failed
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(art, f, indent=1)
    print(f"WROTE {args.out}; failed={failed}")
    return 0 if not failed else 2


if __name__ == "__main__":
    raise SystemExit(main())
