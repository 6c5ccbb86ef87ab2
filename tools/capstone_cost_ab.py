#!/usr/bin/env python
"""Round-10 capstone cost/quality A/B: what the r=2 promotion costs.

Round 9 measured the RECALL of capped LSH configurations in isolation
(BENCH_r9_organic_recall.json).  Round 10 promoted the measured winner
(b16 r2 + bucket cap 16) into the END-TO-END dedup capstone
(``corpus_after_dedup``) — this tool measures what that promotion does
to the capstone itself, end to end, on the same organic-mutation corpus
(50k docs, 5k families, token-level mutants at 5-20% edit):

For each variant, the FULL capstone pipeline runs: exact dedup ->
signatures -> candidates -> exact Jaccard >= 0.5 verify -> drop doc_b
-> final corpus, timed as one job, and quality is scored against the
exact-Jaccard ground truth: a kept doc is a MISSED DROP if some
smaller-id kept doc in its family has exact J >= 0.5 with it (the
capstone's own drop rule, evaluated on the truth instead of the
candidates).

Variants:
- r1_b8_uncapped    — the pre-round-10 capstone (correctness baseline)
- r1_b8_bucket16    — caps without the banding fix (the recall hazard)
- r2_b16_bucket16   — the promoted configuration (what ships)

Writes one JSON line; redirect to BENCH_r10_capstone_ab.json.
Scratch parquet lands under .scratch/ (gitignored).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.organic_recall_stress import build_corpus  # noqa: E402


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from byte_convert_avro_spark.operators import dedup as D
    from byte_convert_avro_spark.session import get_spark

    src = os.environ.get(
        "CAPSTONE_AB_SRC", "/root/testdata/sf0.1/documents.parquet"
    )
    scratch = os.path.join(REPO, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    corpus_pq = os.path.join(scratch, "capstone_ab_corpus.parquet")
    truth_pq = os.path.join(scratch, "capstone_ab_truth.parquet")

    t0 = time.monotonic()
    docs, meta = build_corpus(src)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    con.execute(f"COPY docs TO '{corpus_pq}' (FORMAT PARQUET)")
    # exact within-family ground truth (same construction the r9 study
    # used): every within-family pair with its exact 3-shingle Jaccard.
    con.execute(
        f"""
        COPY (
          WITH words AS (
            SELECT doc_id, doc_id // 10 AS fam, string_split(text, ' ') AS w
            FROM docs
          ), idx AS (
            SELECT doc_id, fam, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM words WHERE len(w) >= 3
          ), sh AS (
            SELECT DISTINCT doc_id, fam,
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
            FROM idx
          ), sizes AS (
            SELECT doc_id, fam, COUNT(*) AS n FROM sh GROUP BY 1, 2
          ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fam,
                   COUNT(*) AS c
            FROM sh a JOIN sh b
              ON a.fam = b.fam AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3
          )
          SELECT p.doc_a, p.doc_b,
                 CAST(p.c AS DOUBLE) / (za.n + zb.n - p.c) AS j
          FROM pairs p
          JOIN sizes za ON za.doc_id = p.doc_a
          JOIN sizes zb ON zb.doc_id = p.doc_b
        ) TO '{truth_pq}' (FORMAT PARQUET)
        """
    )
    n_truth = con.execute(
        f"SELECT COUNT(*) FROM '{truth_pq}' WHERE j >= 0.5"
    ).fetchone()[0]
    build_sec = round(time.monotonic() - t0, 1)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_pq).repartition(64)
    corpus.cache().count()

    variants = {
        "r1_b8_uncapped": dict(n_bands=8, rows_per_band=1, bucket_cap=None),
        "r1_b8_bucket16": dict(n_bands=8, rows_per_band=1, bucket_cap=16),
        "r2_b16_bucket16": dict(n_bands=16, rows_per_band=2, bucket_cap=16),
    }

    results = {}
    for name, cfg in variants.items():
        t1 = time.monotonic()
        keepers = D.drop_exact_dups(corpus, "text", "doc_id")
        sigs = D.minhash_signatures(
            keepers, "text", "doc_id",
            n_bands=cfg["n_bands"], shingle_n=3,
            rows_per_band=cfg["rows_per_band"],
        )
        pairs = D.lsh_candidates(
            sigs, max_docs_per_bucket=cfg["bucket_cap"]
        ).select("doc_a", "doc_b")
        n_cand = pairs.count()
        verified = D.jaccard_similarity(keepers, pairs, "text", "doc_id", shingle_n=3)
        near_b = (
            verified.filter(F.col("jaccard") >= 0.5)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        clean = keepers.join(near_b, "doc_id", "left_anti")
        kept_ids = [r.doc_id for r in clean.select("doc_id").collect()]
        sec = round(time.monotonic() - t1, 1)

        # quality vs truth: a kept doc is a MISSED DROP if a smaller-id
        # KEPT doc in its family has exact J >= 0.5 with it.
        con.execute("DROP TABLE IF EXISTS kept")
        con.execute("CREATE TABLE kept(doc_id BIGINT)")
        con.executemany("INSERT INTO kept VALUES (?)", [(i,) for i in kept_ids])
        missed = con.execute(
            f"""
            SELECT COUNT(DISTINCT t.doc_b)
            FROM '{truth_pq}' t
            JOIN kept ka ON ka.doc_id = t.doc_a
            JOIN kept kb ON kb.doc_id = t.doc_b
            WHERE t.j >= 0.5
            """
        ).fetchone()[0]
        results[name] = {
            "sec": sec,
            "candidates": n_cand,
            "final_docs": len(kept_ids),
            "missed_drops": missed,
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    print(json.dumps({
        "metric": "capstone_cost_ab",
        "src": src,
        "corpus_docs": len(docs),
        "truth_pairs_j05": n_truth,
        "build_sec": build_sec,
        "variants": results,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
