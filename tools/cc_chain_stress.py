"""Seeded long-chain stress for connected_components' two scale defenses.

The r12 scale audit root-caused two iterative-loop pathologies and fixed
both inside ``operators/dedup.connected_components``:

  pointer jumping   min-label propagation alone needs DIAMETER rounds; the
                    label<-label-of-label jump makes rounds ~O(log D) on
                    id-aligned chains (and degrades gracefully on
                    adversarial id layouts — measured here, not assumed).

  reset_plan_stats  localCheckpoint preserves origin statistics; a round
                    that joins the fed-back frame twice SQUARES the size
                    estimate, so per-round DRIVER cost grows exponentially
                    with round count (plans/stats_reset.py) even though
                    per-round cluster work is constant.

The r12 evidence was one sf0.1 thread dump; this tool turns it into a
reusable measured knee (r12 verdict #3).  It builds a seeded forest of
long chains at the sf1 edge scale (default 35k chains x 48 nodes = 3.3M
undirected edge rows — past the operator's 2M cached-big-graph threshold,
like the sf1 entity graph) and runs the REAL operator — not a replica —
through its A/B ablation knobs:

  aligned_full      consecutive per-chain ids, jump+reset: the log-rounds
                    baseline.
  aligned_nojump    reset on, jump OFF: rounds -> diameter; per-round wall
                    stays flat (reset working), so the jump's value is
                    ROUNDS, not per-round cost.
  permuted_full     ids scrambled by an odd-multiplier bijection (the
                    adversarial layout entity graphs approximate):
                    jump saves little, ~diameter rounds — and with reset
                    on, per-round wall must stay FLAT to the end.
  permuted_noreset  same graph, reset OFF: per-round wall doubles past the
                    knee (estimate bits doubling per round); the variant
                    self-aborts once a round exceeds --abort-round-sec and
                    records where the knee sat.

Per variant: rounds, per-round wall, knee round (first round > 2x the
median of the first 5), total wall, JVM CPU delta (local mode: includes
executor threads — the contrast, not the absolute, is the signal), and a
component-count correctness check (must equal the chain count).

Usage:  python tools/cc_chain_stress.py [--out BENCH_r13_cc_stress_ab.json]
                                        [--chains 35000] [--chain-len 48]
                                        [--abort-round-sec 60]
Deterministic (fixed multiplier bijection, no RNG); no /root/testdata
dependence.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_cpu_sec(spark) -> float:
    """utime+stime of the driver JVM (local mode: the whole engine)."""
    pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/stat") as f:
        fields = f.read().rsplit(") ", 1)[1].split()
    return (int(fields[11]) + int(fields[12])) / os.sysconf("SC_CLK_TCK")


def knee_round(round_sec: list[float]) -> int | None:
    """First 1-based round from which every round stays >2x the median
    of the first 5 (None = flat).  SUSTAINED, not first-spike: a single
    slow round is host-load noise (the first cut of this detector fired
    on a lone 14s GC round in an otherwise-flat 48-round run); the
    squaring regime never comes back down."""
    if len(round_sec) < 6:
        return None
    base = statistics.median(round_sec[:5])
    knee = None
    for i, s in enumerate(round_sec[5:], start=6):
        if s > 2 * base:
            if knee is None:
                knee = i
        else:
            knee = None
    return knee


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_r13_cc_stress_ab.json")
    ap.add_argument("--chains", type=int, default=35_000)
    ap.add_argument("--chain-len", type=int, default=48)
    ap.add_argument("--abort-round-sec", type=float, default=60.0)
    ap.add_argument(
        "--skip", nargs="*", default=[],
        help="variant names to skip (recorded in the artifact)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from byte_convert_avro_spark.operators.dedup import connected_components
    from byte_convert_avro_spark.session import get_spark

    spark = get_spark("cc_chain_stress")
    spark.sparkContext.setLogLevel("ERROR")

    n = args.chains * args.chain_len
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % args.chain_len).alias("pos"),
    )
    # directed chain edges: (i, i+1) within each chain
    aligned = (
        base.filter(F.col("pos") < args.chain_len - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    # odd-multiplier mod-2^32 bijection: scrambles ids so label values
    # stop being monotone along the chain — the adversarial layout
    PERM = 2654435761  # Knuth's 2^32 golden-ratio multiplier (odd)
    MOD = 2**32

    def perm(c):
        return (c * PERM) % F.lit(MOD)

    permuted = aligned.select(
        perm(F.col("doc_a")).alias("doc_a"), perm(F.col("doc_b")).alias("doc_b")
    )

    variants = [
        ("aligned_full", aligned, True, True),
        ("aligned_nojump", aligned, False, True),
        ("permuted_full", permuted, True, True),
        ("permuted_noreset", permuted, True, False),
    ]
    out: dict = {
        "tool": "cc_chain_stress",
        "chains": args.chains,
        "chain_len": args.chain_len,
        "n_nodes": n,
        "n_directed_pairs": args.chains * (args.chain_len - 1),
        "abort_round_sec": args.abort_round_sec,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "variants": {},
    }
    if args.skip:
        out["skipped"] = list(args.skip)

    budget = max(80, 2 * args.chain_len)
    for name, pairs, jump, reset in variants:
        if name in args.skip:
            continue
        inst: dict = {"abort_round_sec": args.abort_round_sec}
        cpu0, t0 = jvm_cpu_sec(spark), time.perf_counter()
        rec: dict = {"pointer_jump": jump, "stats_reset": reset}
        try:
            res = connected_components(
                pairs,
                max_iter=budget,
                _pointer_jump=jump,
                _stats_reset=reset,
                _instrument=inst,
            )
            n_comp = res.select("component").distinct().count()
            rec["n_components"] = n_comp
            rec["components_ok"] = n_comp == args.chains
            rec["converged"] = not inst.get("aborted", False)
        except RuntimeError as ex:  # budget exhausted
            rec["converged"] = False
            rec["err"] = str(ex)[:200]
        rec["wall_sec"] = round(time.perf_counter() - t0, 2)
        rec["jvm_cpu_sec"] = round(jvm_cpu_sec(spark) - cpu0, 2)
        rec["rounds"] = inst.get("rounds")
        rec["round_sec"] = inst.get("round_sec", [])
        rec["knee_round"] = knee_round(rec["round_sec"])
        if inst.get("aborted"):
            rec["aborted_at_round"] = inst.get("rounds")
        out["variants"][name] = rec
        print(
            f"# {name}: rounds={rec.get('rounds')} wall={rec['wall_sec']}s "
            f"cpu={rec['jvm_cpu_sec']}s knee={rec.get('knee_round')} "
            f"converged={rec.get('converged')}",
            file=sys.stderr,
            flush=True,
        )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "variants"}))
    spark.stop()


if __name__ == "__main__":
    main()
