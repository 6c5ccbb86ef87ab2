"""Full driver-replica correctness run (ADVICE r2 #6).

``tools/driver_parity.py`` executes EVERY ``__spark_entry__.queries()``
entry at sf0.01 in a *bare* SparkSession (no engine configs from
``session.get_spark``) and applies the driver's compare rules against the
DuckDB oracles.  It must run in its own process: the pytest JVM already
holds a SparkContext with our configs, so an in-process "bare" session
would silently inherit them via ``getOrCreate`` and prove nothing.

This is the insurance ADVICE asked for: registry entries the per-round
driver sample has never hit (streaming, decode round-trips, multimodal)
demonstrably run cold with the driver's calling convention.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parity
def test_all_queries_pass_driver_replica():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_parity.py"),
         "--sf-dir", "/root/testdata/sf0.01"],
        # 411 registry entries at 8 cpus: ~1500-2000s cold (the 1200s
        # budget fit the 321-entry registry; rounds 14a-g grew it 28%
        # without bumping this — the r14 inherited-state fix).
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, f"parity harness failed:\n{proc.stderr[-3000:]}"
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["failed"] == 0, {
        k: v for k, v in report["results"].items() if not v["ok"]
    }
    import __spark_entry__ as entry

    # Track the registry size exactly: a regression that silently drops
    # registry entries must fail the coverage guard (ADVICE r3 #3).
    assert report["total"] == len(entry.queries())
