#!/usr/bin/env python
"""Large-SF gates for the round-14 families.

Posture per family, disclosed up front (learned the hard way — the
first attempt at sf1 ground for >20 min inside the capped-Jaccard
scale twin before being killed):

- **GATED at sf1 AND sf10** (linear primary oracles, or the PQ unroll
  which is linear in vectors): occurrence-weighted user sample + its
  streaming twin, the bounded row-pattern, the PQ trio.
- **GATED at sf1, Spark-side rows-only at sf10**:
  - FastSS edit-1 join (uncapped + capped): names above sf0.1 are 10x
    REPLICATED per 10x data (tools/scale_data.py shifts keys, not
    names), so the true pair set grows ~100x per 10x data — ~2M pairs
    at sf1 (gated, variant-join scale twin), ~200M at sf10 (rows-only).
  - weighted bottom-k: its (linear) oracle's unnest expansion is
    sum(quantity) rows — 150M at sf1 (gated), 1.5B at sf10 (rows-only).
- **RECORDED SKIP at sf >= 1** (never launched): the capped-Jaccard
  pair + effect entries and the overlap join.  The cap bounds OUTPUT
  and downstream fan-out, but the exact qualifying-pair set is
  materialized BEFORE the cap in any exact spelling — Spark and DuckDB
  alike — and on the replicated corpus that intermediate is ~700M rows
  at sf1.  This is the standing disclosure of the exact-similarity
  rung (PARITY_r13_sf1.json records the same skip for the uncapped
  sibling): LSH is the sf >= 1 path; the exact rungs are gated at
  sf0.001/0.01/0.1 where the brute-force referee can actually referee.

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
    "events_weighted_user_sample",
    "streaming_weighted_user_sample",
    "events_pattern_bounded_views_within_7d",
    "pq_codebooks_m4k4",
    "pq_codes_m4k4",
    "pq_adc_top5_vs_exact",
]
GATE_SF1_ONLY = {
    "customer_name_edit1_fastss": (
        "true pair set ~100x per 10x data above sf0.1 (10x-replicated "
        "names): ~2M pairs gated at sf1, ~200M at sf10 -> rows-only"
    ),
    "customer_name_edit1_capped": (
        "same replicated-name pair growth BEFORE the cap; sf10 rows-only"
    ),
    "lineitem_weighted_sample_by_flag": (
        "the oracle's unnest expansion is sum(quantity) rows (~1.5B at "
        "sf10); sf10 rows-only"
    ),
}
SKIP_LARGE = {
    "docs_jaccard_prefix_filter_capped": (
        "exact qualifying-pair intermediate (~700M rows at sf1 on the "
        "replicated corpus) is materialized before the cap in ANY exact "
        "spelling; LSH is the sf>=1 path — gated at sf0.001/0.01/0.1"
    ),
    "docs_jaccard_capped_effect": "same intermediate as the capped entry",
    "docs_overlap_containment_pairs": (
        "same replicated-corpus pair growth (every replica pair shares "
        "all tokens); gated at sf0.001/0.01/0.1"
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
    print(f"[{sf_dir}] {len(names)} queries (rows-only: {rows_only})", flush=True)
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
            "large-SF gates for the r14 families; see module docstring "
            "of tools/run_r14_scale_gates.py for the per-family posture"
        ),
        "sf10_rows_only_reasons": GATE_SF1_ONLY,
        "recorded_skips_sf_ge_1": SKIP_LARGE,
    }
    art["sf1"] = run(".scratch/sf1", all_names, [])
    if not args.skip_sf10:
        art["sf10"] = run(".scratch/sf10", all_names, sorted(GATE_SF1_ONLY))
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
