#!/usr/bin/env python
"""Standing sf10 (100x the driver's largest SF) cross-family parity
sample — r13 verdict #6: one representative query per SURVEY family,
GATED against DuckDB on the same parquet, in a repeatable runner.

The set deliberately spans: TPC-H agg + multi-join, window, percentile
scale path, as-of join, sessionization, structured streaming, wire-
format decode, OCF file format, the dedup ladder (exact / capped LSH /
cluster assignment), a fixed-round graph operator, sketches (KMV, HLL,
count-min), text (TF-IDF), multimodal headers, interval overlaps, skew
salting, ANN, the rank join's grouped form, skyline (via the registered
linear scale-oracle twin — its primary oracle is the deliberately
quadratic NOT EXISTS, infeasible at 2M parts), and both row-pattern
queries (their window-chain oracles are O(n log n) and run at sf10).

Queries whose ORACLE is quadratic/output-bound by design (brute-force
Jaccard, winnowing all-pairs, the unsampled KMV referee) are NOT
sampled here — they carry disclosed skips at sf>=1 already
(PARITY_r13_sf1.json); nothing is silently omitted, the artifact lists
the exclusion rule.

Usage: python tools/run_sf10_sample.py [--sf-dir .scratch/sf10]
       [--out PARITY_r14_sf10_sample.json] [--driver-memory 48g]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: family -> query (one per family; see module docstring)
SAMPLE = {
    "tpch-agg": "q1_pricing_summary",
    "tpch-multijoin": "q5_local_supplier_volume",
    "window": "customer_running_total",
    "percentile-scale-path": "ship_latency_percentiles_scale_path",
    "asof-join": "events_asof_purchase_view",
    "sessionization": "events_sessionization",
    "streaming": "streaming_hourly_tumbling",
    "wire-decode": "avro_roundtrip_customers",
    "ocf-format": "avro_ocf_roundtrip_customers",
    "dedup-exact": "dedup_exact_groups",
    "dedup-lsh-capped": "minhash_r2_capped_candidates",
    "dedup-cluster-cc": "dedup_cluster_assignment",
    "graph-fixed-rounds": "trade_reachability_3hop",
    "sketch-kmv": "kmv_distinct_users_by_type",
    "sketch-hll": "hll_distinct_users_by_type",
    "sketch-countmin": "token_count_min_vs_exact",
    "text-tfidf": "tfidf_top_terms",
    "multimodal-headers": "multimodal_real_png_headers",
    "intervals": "customer_order_interval_overlaps",
    "skew-salting": "skew_salted_join_brand_revenue",
    "ann-knn": "knn_cosine_top5",
    "rank-join-grouped": "rank_join_top3_pairs_per_nation",
    "skyline-global": "part_skyline_price_size",
    "skyline-grouped": "part_skyline_per_brand",
    "row-pattern": "events_pattern_views_to_purchase",
    "row-pattern-alt": "events_pattern_view_alt_action_purchase",
    # round-14b families
    "trend-robust": "events_theil_sen_daily_trend",
    "changepoint": "events_value_changepoint",
    "lm-quality": "doc_bigram_lm_bitscore",
    "temporal-algebra": "order_interval_allen_histogram",
    "sketch-kmv-diff": "kmv_difference_estimate",
    "two-stage-rerank": "pq_rerank_top3_recall",
    "ann-graph-snn": "mutual_knn_pairs",
    # round-14c/14d families
    "stat-ks-two-sample": "events_ks_view_purchase",
    "stat-kendall-taub": "events_kendall_daily_taub",
    "stat-chi2-cells": "orders_priority_status_chi2_cells",
    "concentration-hhi": "nation_customer_order_hhi",
    "drift-psi": "events_value_psi_halves",
    "drift-jsd": "source_token_jsd_vs_corpus",
    "link-analysis-hits": "trade_hits_hub_authority",
    # round-14e families
    "stat-kruskal-wallis": "events_kruskal_wallis_cells",
    "series-crosscorr": "events_daily_crosscorr_view_purchase",
    "graph-assortativity": "trade_degree_assortativity",
    "sketch-misra-gries": "token_misra_gries_vs_exact",
    "feature-hashing": "doc_feature_hashing_load",
    "target-encoding": "customer_target_encoding_smoothed",
    "layout-bucketed-join": "bucketed_colocated_segment_revenue",
    "governance-k-anonymity": "orders_k_anonymity_profile",
    "retrieval-ndcg": "truncated_dim_ndcg_at5",
    "agreement-kappa": "langid_cohens_kappa",
    "feature-scoring-ig": "orders_feature_information_gain",
    "graph-rich-club": "copurchase_rich_club",
    "text-collocations-pmi": "bigram_pmi_collocations",
    "feature-woe-iv": "orders_woe_iv_cells",
    "class-rebalancing": "events_class_weights",
    "negative-sampling": "customer_part_negative_samples",
    "survival-logrank": "users_logrank_view_vs_other_cells",
    "classifier-eval-prf": "langid_precision_recall_f1",
    # round-14f families
    "score-auc-threshold-free": "events_purchase_auc_rank_cells",
    "score-roc-operating-points": "events_purchase_roc_literal_thresholds",
    "score-decile-lift": "events_purchase_decile_lift",
    "retrieval-mrr": "truncated_dim_mrr_at5",
    "paired-classifier-mcnemar": "langid_mcnemar_stopword_vs_conjunction",
    "clustering-quality-silhouette": "kmeans_silhouette_simplified",
    "text-readability": "doc_readability_flesch",
    "feature-scoring-gini": "orders_feature_gini_impurity_cells",
    "stat-ca-trend": "events_purchase_ca_trend_cells",
    "probability-calibration": "orders_target_calibration_bins",
    "streaming-auc-twin": "streaming_purchase_auc_rank_cells",
    "graph-truss-support": "copurchase_edge_support_hist",
    # round-14g families
    "stat-anova-f": "events_value_anova_cells",
    "stat-variance-homogeneity": "events_value_brown_forsythe_cells",
    "privacy-t-closeness": "orders_t_closeness_profile",
    "probability-calibration-ece": "orders_calibration_ece",
    "classifier-eval-mcc": "langid_mcc_cells",
    "sketch-count-sketch": "token_count_sketch_vs_exact",
    "sketch-ams-f2": "token_ams_f2_sketch_vs_exact",
    "streaming-count-sketch": "streaming_count_sketch_tokens",
    "preference-bradley-terry": "brand_bradley_terry_strength",
    "format-orc": "orc_roundtrip_supplier",
    "layout-hilbert": "hilbert_layout_effectiveness",
    "stat-effect-sizes": "events_effect_sizes_view_purchase",
    "uncertainty-conformal": "lineitem_ols_conformal_coverage",
    "text-keywords-textrank": "corpus_textrank_keywords",
    "streaming-anova-twin": "streaming_anova_moment_cells",
    # blocking-quality (customer_blocking_quality_profile) inherits the
    # linkage-fs fastss exclusion: the edit<=1 TRUTH set it counts grows
    # ~100x per 10x data on replicated names (~200M pairs at sf10), so
    # it is gated at sf1 via the variant-join scale oracle instead.
    # linkage-fs (customer_linkage_fs_*) is deliberately NOT sampled at
    # sf10: scale_data replicates names, so the true edit<=1 pair set
    # grows ~100x per 10x data (the fastss disclosure) — ~200M pairs at
    # sf10.  The family is gated at sf1 via its variant-join scale twin
    # (PARITY_r14d_sf1.json) instead.
    # semdedup (semdedup_prune_flags / semdedup_cell_summary) is
    # deliberately NOT sampled at sf10: at the PINNED k=8 the
    # within-cell pair set is quadratic per cell (~5e9 pairs on the
    # 200k replicated vectors), and the production contract is k ~
    # N/target_cell_size — growing k would change the gated training.
    # The family is gated cold at sf0.001/0.01/0.1 and at sf1
    # (PARITY_r14g_sf1.json).
}

#: sf10-only oracle concessions, recorded per-line as mode:
#: 'rows-only-forced' — never a silent skip.
ROWS_ONLY = {
    # recursive-CTE closure exhausts DuckDB temp disk at 500k docs
    # (oracle-gated at sf0.01/0.1/1 instead; Spark CC is the measured side)
    "dedup_cluster_assignment",
    # the brute-force kNN base is quadratic BY DESIGN (disclosed cap):
    # at sf10 the 5% sample is 10k vectors -> 100M interpreted 64-dim
    # list_reduce folds on the DuckDB side; gated at sf0.001/0.01/0.1
    "mutual_knn_pairs",
    # the edge-support ORACLE is the naive ordered triple join —
    # infeasible on the ~30M-edge sf10 co-purchase graph (the Spark
    # side is the arboricity-bounded oriented enumeration and is the
    # measured half); gated at sf0.001/0.01/0.1/1
    "copurchase_edge_support_hist",
}

EXCLUSION_RULE = (
    "queries with deliberately brute-force oracles (all-pairs Jaccard, "
    "winnowing all-pairs, unsampled KMV referee) keep their disclosed "
    "sf>=1 skips from PARITY_r13_sf1.json and are not re-sampled here"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".scratch/sf10")
    ap.add_argument("--out", default="PARITY_r14_sf10_sample.json")
    ap.add_argument("--driver-memory", default="48g")
    ap.add_argument("--duck-memory", default="40GB")
    ap.add_argument("--duck-temp-max", default="60GiB")
    ap.add_argument("--chunk", type=int, default=7)
    args = ap.parse_args()

    names = sorted(SAMPLE.values())
    chunks = [
        names[i : i + args.chunk] for i in range(0, len(names), args.chunk)
    ]
    merged: dict[str, dict] = {}
    t0 = time.monotonic()
    for ci, chunk in enumerate(chunks):
        rf = os.path.join(REPO, ".scratch", f"_sf10_chunk_{ci}.json")
        if os.path.exists(rf):
            os.unlink(rf)
        cmd = [
            sys.executable,
            os.path.join(REPO, "tools", "driver_parity.py"),
            "--sf-dir", args.sf_dir,
            "--driver-memory", args.driver_memory,
            # DuckDB resource envelope (r14 session-5): without an
            # explicit memory_limit the oracle plans against RAM the
            # co-resident Spark JVM already holds and dies in malloc
            # instead of spilling; without a capped temp dir one
            # runaway oracle fills the disk.
            "--duck-memory", args.duck_memory,
            "--duck-temp", os.path.join(REPO, ".scratch", "duck_tmp"),
            "--duck-temp-max", args.duck_temp_max,
            "--no-record", "--progress", "--scale-oracle",
            "--result-file", rf,
            "--only", *chunk,
        ]
        ro = sorted(set(chunk) & ROWS_ONLY)
        if ro:
            cmd += ["--rows-only", *ro]
        print(f"[chunk {ci + 1}/{len(chunks)}] {chunk}", flush=True)
        proc = subprocess.run(cmd, cwd=REPO)
        if os.path.exists(rf):
            with open(rf) as fh:
                merged.update(json.load(fh)["results"])
            os.unlink(rf)
        else:
            for n in chunk:
                merged[n] = {"ok": False, "err": f"chunk died rc={proc.returncode}"}
        done = sum(1 for v in merged.values() if v.get("ok"))
        print(
            f"[chunk {ci + 1}] cumulative {done}/{len(merged)} ok, "
            f"{time.monotonic() - t0:.0f}s",
            flush=True,
        )
    failed = sorted(k for k, v in merged.items() if not v.get("ok"))
    art = {
        "sf_dir": args.sf_dir,
        "driver_memory": args.driver_memory,
        "duck_memory": args.duck_memory,
        "duck_temp_max": args.duck_temp_max,
        "note": (
            "standing sf10 cross-family sample (r14): one gated "
            "representative per SURVEY family; skyline gated via its "
            "registered linear scale-oracle twin (primary NOT EXISTS "
            "oracle is quadratic by design, equivalence pinned by "
            "tests/test_queries_oracle.py::test_scale_oracles_agree_"
            "with_primary)"
        ),
        "families": SAMPLE,
        "exclusions": EXCLUSION_RULE,
        "total": len(merged),
        "failed": len(failed),
        "failed_names": failed,
        "elapsed_sec": round(time.monotonic() - t0, 1),
        "results": merged,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(art, f, indent=1)
    print(f"WROTE {args.out}: {len(merged)} total, {len(failed)} failed")
    return 0 if not failed else 2


if __name__ == "__main__":
    raise SystemExit(main())
