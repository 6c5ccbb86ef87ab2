#!/usr/bin/env python
"""Organic near-duplication cap-recall study (round-8 verdict #2).

The r8 sf1/sf10 cap stresses used VERBATIM replicas — there, capped
output of 0 pairs is CORRECT (exact-dup rungs catch them), so the caps'
recall against MUTATED duplication (the case LSH exists for) stayed
unmeasured.  This tool builds an sf1-scale corpus with token-level
mutations at 5-20% edit rates, computes exact ground truth, and measures
capped-vs-uncapped recall for minhash-LSH and winnowing.

Corpus: every sf0.1 document becomes a FAMILY of 10 — the original plus
9 mutants; mutant r replaces each token independently (seeded RNG, rate
5/10/15/20% by r) with a token from a 200-word out-of-corpus pool.
50,000 docs total.  Ground truth = all 45 within-family pairs per
family (225k pairs) with their EXACT 3-token-shingle Jaccard, banded at
J >= 0.5 (the LSH design regime), 0.35-0.5, 0.2-0.35.

Variants measured (recall per truth band + candidate counts + seconds):
- lsh_uncapped: lsh_candidates with no caps (correctness baseline)
- lsh_registry_caps: max_docs_per_bucket=4, max_pairs_per_doc=8 (the
  minhash_estimate_vs_exact_capped pins)
- lsh_bucket16: max_docs_per_bucket=16, max_pairs_per_doc=8
- winnow_capped / winnow_uncapped: shared_fingerprint_pairs
  (min_shared=3) with max_docs_per_fp=8 vs effectively-uncapped

Writes one JSON line; redirect to BENCH_r9_organic_recall.json.
Scratch parquet lands under .scratch/ (gitignored).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MUT_POOL = [f"mut{i}" for i in range(200)]
RATES = [0.05, 0.05, 0.10, 0.10, 0.15, 0.15, 0.20, 0.20, 0.20]


def build_corpus(src_parquet: str) -> tuple[list[tuple[int, str]], dict]:
    import duckdb

    base = duckdb.sql(
        f"SELECT doc_id, text FROM '{src_parquet}' ORDER BY doc_id"
    ).fetchall()
    docs: list[tuple[int, str]] = []
    for doc_id, text in base:
        words = text.split(" ")
        docs.append((doc_id * 10, text))
        for r, rate in enumerate(RATES, start=1):
            rng = random.Random(doc_id * 1009 + r)
            docs.append(
                (
                    doc_id * 10 + r,
                    " ".join(
                        rng.choice(MUT_POOL) if rng.random() < rate else w
                        for w in words
                    ),
                )
            )
    return docs, {"n_families": len(base), "n_docs": len(docs)}


def shingles(text: str, n: int = 3) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def ground_truth(docs: list[tuple[int, str]]) -> list[tuple[int, int, float]]:
    """All within-family pairs with exact 3-shingle Jaccard."""
    fam: dict[int, list[tuple[int, set]]] = {}
    for did, text in docs:
        fam.setdefault(did // 10, []).append((did, shingles(text)))
    truth = []
    for members in fam.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, sa = members[i]
                b, sb = members[j]
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter) if inter else 0.0
                truth.append((min(a, b), max(a, b), jac))
    return truth


BANDS = [("J>=0.5", 0.5, 1.01), ("0.35<=J<0.5", 0.35, 0.5), ("0.2<=J<0.35", 0.2, 0.35)]


def main() -> None:
    from pyspark.sql import functions as F

    from byte_convert_avro_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )
    from byte_convert_avro_spark.operators.text import (
        rolling_hashes,
        shared_fingerprint_pairs,
    )
    from byte_convert_avro_spark.session import get_spark

    src = os.environ.get(
        "ORGANIC_SRC", "/root/testdata/sf0.1/documents.parquet"
    )
    t0 = time.perf_counter()
    docs, stats = build_corpus(src)
    truth = ground_truth(docs)
    stats["n_truth_pairs"] = len(truth)
    stats["truth_band_sizes"] = {
        label: sum(1 for _, _, j in truth if lo <= j < hi)
        for label, lo, hi in BANDS
    }
    stats["build_sec"] = round(time.perf_counter() - t0, 1)
    print(f"# corpus: {stats}", file=sys.stderr)

    spark = get_spark("organic-recall")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(32)
    scratch = os.path.join(REPO, ".scratch", "organic_docs.parquet")
    df.write.mode("overwrite").parquet(scratch)
    df = spark.read.parquet(scratch)
    tdf = spark.createDataFrame(
        [(a, b, j) for a, b, j in truth], "doc_a long, doc_b long, jac double"
    )
    scratch_t = os.path.join(REPO, ".scratch", "organic_truth.parquet")
    tdf.write.mode("overwrite").parquet(scratch_t)
    tdf = spark.read.parquet(scratch_t)

    def recall_of(pairs, runtime: float) -> dict:
        hits = (
            tdf.join(pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
            .groupBy()
            .agg(
                *[
                    F.sum(
                        ((F.col("jac") >= lo) & (F.col("jac") < hi)).cast("long")
                    ).alias(label)
                    for label, lo, hi in BANDS
                ]
            )
            .collect()[0]
        )
        out = {"sec": round(runtime, 1), "n_candidates": pairs.count()}
        for label, lo, hi in BANDS:
            denom = stats["truth_band_sizes"][label]
            out[f"recall {label}"] = (
                round(hits[label] / denom, 4) if denom else None
            )
        return out

    results: dict[str, dict] = {}

    sigs = minhash_signatures(df).localCheckpoint()
    # r=2 band signatures (16 bands so recall at J>=0.5 stays high:
    # 1-(1-J^2)^16 = 0.99 at J=0.5) — the principled bucket-shrinker
    sigs_r2 = minhash_signatures(
        df, n_bands=16, rows_per_band=2
    ).localCheckpoint()
    for tag, s, kwargs in [
        ("lsh_uncapped", sigs, {}),
        ("lsh_registry_caps", sigs,
         {"max_docs_per_bucket": 4, "max_pairs_per_doc": 8}),
        ("lsh_bucket16", sigs,
         {"max_docs_per_bucket": 16, "max_pairs_per_doc": 8}),
        ("lsh_bucket16_pairs16", sigs,
         {"max_docs_per_bucket": 16, "max_pairs_per_doc": 16}),
        ("lsh_bucket64_pairs16", sigs,
         {"max_docs_per_bucket": 64, "max_pairs_per_doc": 16}),
        ("lsh_b16r2_uncapped", sigs_r2, {}),
        ("lsh_b16r2_bucket64_pairs16", sigs_r2,
         {"max_docs_per_bucket": 64, "max_pairs_per_doc": 16}),
        ("lsh_b16r2_bucket16_pairs16", sigs_r2,
         {"max_docs_per_bucket": 16, "max_pairs_per_doc": 16}),
    ]:
        t1 = time.perf_counter()
        cand = lsh_candidates(s, **kwargs).localCheckpoint()
        results[tag] = recall_of(cand, time.perf_counter() - t1)
        print(f"# {tag}: {results[tag]}", file=sys.stderr)

    # winnowing fingerprints (window=16 char grams, winnow window 4)
    from pyspark.sql import Window as W

    rh = rolling_hashes(df, "text", "doc_id", window=16)
    wsel = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    wcnt = W.partitionBy("doc_id")
    fps = (
        rh.select(
            "doc_id", "pos",
            F.min("chunk_hash").over(wsel).alias("sel"),
            F.count("*").over(wcnt).alias("m"),
        )
        .filter(F.col("pos") <= F.col("m") - 3)
        .select("doc_id", F.col("sel").alias("fp_hash"))
        .distinct()
        .localCheckpoint()
    )
    for tag, cap in [("winnow_capped", 8), ("winnow_uncapped", 10**9)]:
        t1 = time.perf_counter()
        pairs = shared_fingerprint_pairs(
            fps, "doc_id", "fp_hash", min_shared=3, max_docs_per_fp=cap
        ).localCheckpoint()
        results[tag] = recall_of(pairs, time.perf_counter() - t1)
        print(f"# {tag}: {results[tag]}", file=sys.stderr)

    print(json.dumps({"metric": "organic_cap_recall", "corpus": stats,
                      "variants": results,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
