"""Rank-sketch error-vs-k study: the measured accuracy curve behind
``order_value_rank_sketch_vs_exact``'s k=128 choice.

For k in {32, 64, 128, 256, 512}, sketch o_totalprice per order priority
at sf0.1 and record the achieved p50/p90 RANK error (|F̂(est) - q| over
the true distribution — the epsilon a KLL guarantee would quote) plus
wall time.  The sketch is deterministic (content-hashed), so these are
exact numbers for this corpus, not samples of a random process; the
theory line printed alongside is the binomial sd sqrt(q(1-q)/k).

Usage: python tools/rank_sketch_error_study.py [--sf-dir DIR] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH_r11_sketch_error.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from byte_convert_avro_spark.operators.sketch import (
        rank_sketch_grouped,
        rank_sketch_quantile,
    )
    from byte_convert_avro_spark.session import get_spark

    spark = get_spark("sketch-error-study")
    spark.sparkContext.setLogLevel("ERROR")
    o = (
        spark.read.parquet(os.path.join(args.sf_dir, "orders.parquet"))
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("v"),
        )
    )
    o.cache().count()
    out: dict = {"sf_dir": args.sf_dir, "ks": {}}
    for k in (32, 64, 128, 256, 512):
        t0 = time.monotonic()
        est = rank_sketch_grouped(o, ["g"], "v", "id", k=k).select(
            "g",
            rank_sketch_quantile("smp", 1, 2).alias("p50"),
            rank_sketch_quantile("smp", 9, 10).alias("p90"),
        )
        err = (
            o.join(F.broadcast(est), "g")
            .groupBy("g")
            .agg(
                F.abs(
                    F.sum((F.col("v") <= F.col("p50")).cast("int"))
                    / F.count("*")
                    - 0.5
                ).alias("e50"),
                F.abs(
                    F.sum((F.col("v") <= F.col("p90")).cast("int"))
                    / F.count("*")
                    - 0.9
                ).alias("e90"),
            )
            .collect()
        )
        sec = round(time.monotonic() - t0, 2)
        e50 = [round(r.e50, 5) for r in err]
        e90 = [round(r.e90, 5) for r in err]
        out["ks"][k] = {
            "max_p50_rank_err": max(e50),
            "max_p90_rank_err": max(e90),
            "theory_sd_p50": round((0.25 / k) ** 0.5, 5),
            "theory_sd_p90": round((0.09 / k) ** 0.5, 5),
            "sec": sec,
        }
        print(k, "->", json.dumps(out["ks"][k]))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
