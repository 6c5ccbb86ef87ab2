#!/usr/bin/env python
"""Scale the driver's sf0.1 parquet up N× for local large-SF benchmarking.

The driver only ships sf{0.001,0.01,0.1}; at sf0.1 the headline bench is
dominated by fixed per-stage overhead (~0.1-0.3 s/query), which hides real
per-query scaling.  This tool unions N key-shifted replicas of each sf0.1
table so joins keep linear cardinality (every replica's lineitem rows join
only that replica's orders/customer/part/supplier rows — same stride shift
on both sides), approximating sf{0.1×N} well enough to profile plans.

Replica 0 is byte-identical to the source; replicas i>0 shift every join
key by i×STRIDE.  region/nation stay fixed (they are fixed-size in TPC-H
too).  events keeps its ns-epoch-long ts values (written as plain INT64;
``queries.base.t`` reads them identically), with event_id/user_id shifted
so window/session group counts scale instead of group sizes.  documents
text is left as-is — exact-dup groups of size N are a realistic dedup
workload, and the headline set has no all-pairs query.

Bench-only: outputs land in the gitignored .scratch/ dir and are never an
oracle input.

Usage: python tools/scale_data.py [--factor 10] [--src DIR] [--dst DIR]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: join/identity key columns to shift per replica, per table.
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ("region", "nation")

#: larger than any key value at the source SF times any sane factor.
STRIDE = 100_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(REPO, ".scratch", "sf1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from byte_convert_avro_spark.session import get_spark

    spark = get_spark("scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    os.makedirs(args.dst, exist_ok=True)
    for t in COPY:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{args.dst}/{t}.parquet"
        )
    for t, keys in KEYS.items():
        base = spark.read.parquet(f"{args.src}/{t}.parquet")
        reps = []
        for i in range(args.factor):
            r = base
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            reps.append(r)
        out = functools.reduce(lambda a, b: a.unionByName(b), reps)
        # repartition so downstream scans start parallel (the source files
        # are single-row-group; N unioned scans would still be N tasks).
        out.repartition(32).write.mode("overwrite").parquet(f"{args.dst}/{t}.parquet")
        print(f"{t}: x{args.factor} -> {args.dst}/{t}.parquet", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
