#!/usr/bin/env python
"""A/B the ``fold_chunk`` bound of :func:`bounded_ordered_agg` at large
SF (round-7 verdict #4): the 4096-default vs sqrt-of-group-size guidance
in ``functions/__init__.py`` was documented but unmeasured — queries pin
chunk=128 purely so the sf0.01 gate exercises multiple chunks.

Times the three bounded-fold-heavy operators at each chunk setting over
a scratch large-SF embeddings table:

- ``embedding_dim_stats``-shaped (dim,chunk) fold (inline here so chunk
  is a parameter; the registry query pins 128),
- ``kmeans_lloyd`` (3 rounds, per-round (cell,dim) folds),
- ``pca_power_top_component`` (3 rounds, per-dim folds).

Usage: python tools/fold_chunk_ab.py [--sf-dir .scratch/sf10]
       [--chunks 128 1024 4096] [--runs 3]

Prints one JSON line per (operator, chunk) with median seconds, then a
summary — paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scratch", "sf10"))
    ap.add_argument("--chunks", nargs="*", type=int, default=[128, 1024, 4096])
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from byte_convert_avro_spark.functions import bounded_ordered_agg
    from byte_convert_avro_spark.operators import similarity as S
    from byte_convert_avro_spark.session import get_spark

    spark = get_spark("fold-chunk-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    emb = emb.repartition(32, "vec_id")
    n = emb.count()
    print(f"# corpus: {n} vectors from {args.sf_dir}", file=sys.stderr)

    def dim_stats(chunk: int):
        dims = emb.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        return bounded_ordered_agg(dims, ["dim"], "vec_id", "x", chunk=chunk)

    def kmeans(chunk: int):
        return S.kmeans_lloyd(
            emb, "embedding", "vec_id", k=8, n_iter=3, fold_chunk=chunk
        )

    def pca(chunk: int):
        return S.pca_power_top_component(
            emb, "embedding", "vec_id", n_iter=3, fold_chunk=chunk
        )

    ops = {"dim_stats": dim_stats, "kmeans_lloyd_k8": kmeans, "pca_top1": pca}
    results: dict[str, dict[int, float]] = {o: {} for o in ops}
    for r in range(args.runs):  # interleaved rounds, median reported
        for opname, fn in ops.items():
            for chunk in args.chunks:
                t0 = time.perf_counter()
                fn(chunk).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results[opname].setdefault(chunk, []).append(dt)  # type: ignore[attr-defined]
                print(
                    f"# run {r}: {opname} chunk={chunk}: {dt:.2f}s",
                    file=sys.stderr, flush=True,
                )
    out = {
        op: {str(c): round(statistics.median(v), 2) for c, v in by.items()}
        for op, by in results.items()
    }
    print(json.dumps({
        "corpus_vectors": n,
        "sf_dir": args.sf_dir,
        "runs": args.runs,
        "median_sec": out,
        "loadavg": [round(x, 1) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
