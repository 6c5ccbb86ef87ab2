#!/usr/bin/env python
"""Round-10 probe-fanout A/B: incremental dedup's r=2 promotion, measured.

``incremental_dedup_new_batch`` was promoted to rows_per_band=2 on the
argument that r=1 boilerplate band signatures put a corpus-growing
fraction of docs into the hottest buckets, so the broadcast probe join's
INTERMEDIATE (corpus signatures matching any batch signature) grows with
corpus size.  This tool measures that claim on the round-9 organic
corpus (50k docs, 5k mutation families): corpus = family members 0-7
(originals + light mutants), batch = members 8-9 (the 20%-edit mutants —
the hard case), ground truth = exact 3-shingle Jaccard per within-family
pair.

Per configuration (r1 b8 vs r2 b16) it reports:
- probe_rows: the raw (band, sig) join intermediate size — the fan-out
  the docstring claims r=2 bounds;
- sec: wall time of the full classify (signatures both sides + probe +
  labels);
- recall_j05: of batch docs with a true J >= 0.5 corpus match, the
  fraction classified near_dup (or exact_dup);
- false_near: batch docs classified near_dup with NO true corpus match
  at J >= 0.2 (LSH collisions on genuinely unrelated docs — the
  incremental query does no Jaccard verify, so this is its noise rate).

Writes one JSON line; redirect to BENCH_r10_incremental_ab.json.
Requires .scratch/capstone_ab_corpus.parquet + _truth.parquet (built by
tools/capstone_cost_ab.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from byte_convert_avro_spark.operators import dedup as D
    from byte_convert_avro_spark.session import get_spark

    scratch = os.path.join(REPO, ".scratch")
    corpus_pq = os.path.join(scratch, "capstone_ab_corpus.parquet")
    truth_pq = os.path.join(scratch, "capstone_ab_truth.parquet")
    for p in (corpus_pq, truth_pq):
        if not os.path.exists(p):
            print(f"missing {p}: run tools/capstone_cost_ab.py first", file=sys.stderr)
            return 1

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_pq).repartition(64)
    corpus = docs.filter(F.col("doc_id") % 10 <= 7).cache()
    newb = docs.filter(F.col("doc_id") % 10 >= 8).cache()
    n_corpus, n_new = corpus.count(), newb.count()

    con = duckdb.connect()
    # batch docs whose family holds a corpus member at J >= 0.5 / >= 0.2
    truth = {}
    for tag, j in (("j05", 0.5), ("j02", 0.2)):
        rows = con.execute(
            f"""
            SELECT DISTINCT CASE WHEN doc_a % 10 >= 8 THEN doc_a ELSE doc_b END
            FROM '{truth_pq}'
            WHERE j >= {j}
              AND ((doc_a % 10 >= 8) != (doc_b % 10 >= 8))
            """
        ).fetchall()
        truth[tag] = {r[0] for r in rows}

    results = {}
    for name, (nb, r) in {"r1_b8": (8, 1), "r2_b16": (16, 2)}.items():
        t0 = time.monotonic()
        sig_new = D.minhash_signatures(
            newb, "text", "doc_id", n_bands=nb, shingle_n=3, rows_per_band=r
        )
        sig_corpus = D.minhash_signatures(
            corpus, "text", "doc_id", n_bands=nb, shingle_n=3, rows_per_band=r
        ).select(F.col("doc_id").alias("cdoc"), "band", "sig")
        probe = sig_corpus.join(F.broadcast(sig_new), ["band", "sig"])
        probe_rows = probe.count()
        near = {r_.doc_id for r_ in probe.select("doc_id").distinct().collect()}
        sec = round(time.monotonic() - t0, 1)

        hit = truth["j05"] & near
        false_near = near - truth["j02"]
        results[name] = {
            "sec": sec,
            "probe_rows": probe_rows,
            "classified_near": len(near),
            "true_j05": len(truth["j05"]),
            "recall_j05": round(len(hit) / max(len(truth["j05"]), 1), 4),
            "false_near": len(false_near),
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    print(json.dumps({
        "metric": "incremental_probe_ab",
        "n_corpus": n_corpus,
        "n_batch": n_new,
        "variants": results,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
