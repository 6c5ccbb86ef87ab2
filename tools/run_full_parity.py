#!/usr/bin/env python
"""Run the FULL registry through tools/driver_parity.py in alphabetical
chunks (one cold Spark session per chunk — the PARITY_r13_sf1.json run
shape) and merge the chunk results into one artifact.

Why chunked: a single 318-query session holds every cached relation and
streaming scratch dir alive for the whole run; cold chunks bound memory,
give per-chunk fail isolation, and mirror how the sf1 audit ran.

Usage: python tools/run_full_parity.py [--sf-dir DIR] [--chunk 55]
       [--out PARITY_x.json] [--driver-memory 48g] [--exclude name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--chunk", type=int, default=55)
    ap.add_argument("--out", default=None)
    ap.add_argument("--driver-memory", default=None)
    ap.add_argument("--exclude", nargs="*", default=None)
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    from byte_convert_avro_spark.queries import queries

    names = sorted(queries())
    if args.exclude:
        names = [n for n in names if n not in set(args.exclude)]
    chunks = [
        names[i : i + args.chunk] for i in range(0, len(names), args.chunk)
    ]
    merged: dict[str, dict] = {}
    t0 = time.monotonic()
    out = args.out or f"PARITY_full_{int(time.time())}.json"

    def write_artifact(incomplete_reason: str | None = None) -> list[str]:
        failed = sorted(k for k, v in merged.items() if not v.get("ok"))
        art = {
            "sf_dir": args.sf_dir,
            "total": len(merged),
            "failed": len(failed),
            "failed_names": failed,
            "chunked": f"{len(chunks)} cold sessions of <= {args.chunk}",
            "elapsed_sec": round(time.monotonic() - t0, 1),
            "results": merged,
        }
        if incomplete_reason:
            art["incomplete"] = incomplete_reason
        with open(os.path.join(REPO, out), "w") as f:
            json.dump(art, f, indent=1)
        print(
            f"WROTE {out}: {len(merged)} total, {len(failed)} failed"
            + (f" [INCOMPLETE: {incomplete_reason}]" if incomplete_reason else ""),
            flush=True,
        )
        return failed

    for ci, chunk in enumerate(chunks):
        # File-based result handoff — the stdout JSON scrape stays as a
        # fallback only (it is brittle against incidental output).
        rf = os.path.join(REPO, ".scratch", f"_parity_chunk_{ci}.json")
        os.makedirs(os.path.dirname(rf), exist_ok=True)
        if os.path.exists(rf):
            os.unlink(rf)
        cmd = [
            sys.executable,
            os.path.join(REPO, "tools", "driver_parity.py"),
            "--sf-dir",
            args.sf_dir,
            "--progress",
            "--result-file",
            rf,
            "--only",
            *chunk,
        ]
        if args.driver_memory:
            cmd += ["--driver-memory", args.driver_memory]
        if args.no_record:
            cmd += ["--no-record"]
        print(
            f"[chunk {ci + 1}/{len(chunks)}] {len(chunk)} queries "
            f"({chunk[0]} .. {chunk[-1]})",
            flush=True,
        )
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO
        )
        res = None
        if os.path.exists(rf):
            with open(rf) as fh:
                res = json.load(fh)
            os.unlink(rf)
        else:
            m = re.findall(r'\{"sf_dir".*\}', proc.stdout)
            if m:
                res = json.loads(m[-1])
        if res is None:
            print(
                f"[chunk {ci + 1}] NO RESULT JSON (rc={proc.returncode})\n"
                + proc.stdout[-2000:]
                + proc.stderr[-2000:],
                flush=True,
            )
            # Preserve the completed chunks' results in a flagged
            # partial artifact rather than discarding them.
            write_artifact(
                f"chunk {ci + 1}/{len(chunks)} produced no result "
                f"(rc={proc.returncode}); remaining chunks not run"
            )
            return 1
        merged.update(res["results"])
        nfail = sum(1 for v in res["results"].values() if not v.get("ok"))
        print(
            f"[chunk {ci + 1}] done: {len(res['results'])} run, "
            f"{nfail} failed, {time.monotonic() - t0:.0f}s elapsed",
            flush=True,
        )
    failed = write_artifact()
    return 0 if not failed else 2


if __name__ == "__main__":
    raise SystemExit(main())
