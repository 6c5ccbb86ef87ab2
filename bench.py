#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a FULL materialization via the ``noop`` sink —
``count()`` is not full materialization: Catalyst's column pruning strips
aggregate expressions and whole Window nodes whose outputs a count never
reads (measured 2.6x under-report on the running-total query), so a
count-based bench times a different, cheaper plan than users run.  The
noop write evaluates every output column JVM-side with zero driver
transfer.  Warm-up pass first (JVM + codegen warm).

Each query runs ``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and reports
the MEDIAN — this VM has documented 1.3-3x load drift (BENCH_sf10_local
note; round 4's official single-shot artifact was 5x off a quiet-host
re-run of identical code), so single-shot numbers are not adjudicable.
The host load average is recorded in the JSON for the same reason.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

from byte_convert_avro_spark.session import get_spark
from byte_convert_avro_spark.queries import queries

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_orders",
    "customer_running_total",
    "events_hourly_tumbling",
    "events_sessionization",
    "events_asof_purchase_view",
    "minhash_signatures",
    "knn_cosine_top5",
    "dedup_exact_groups",
    "avro_roundtrip_customers",
    # round-3 families
    "decontamination_ngram_overlap",
    "events_asof_tolerance_30m",
    # round-5: the heavy dedup family — the most expensive multi-join
    # plans in the registry; benched so regressions stay visible
    "jaccard_verified_candidates",
    "dedup_cluster_assignment",
    "corpus_after_dedup",
    "lsh_banded_near_dup",
    # round-6: the new capability families — substring-level dedup,
    # trained-IVF ANN, winnowing pair matching.  The tracked winnowing
    # form is the CAPPED one (round-6 verdict lead #4): the hub-bounded
    # cap²-per-fingerprint join is the 100 TB path, so that's the number
    # to watch; the uncapped winnowing_shared_fingerprints stays in the
    # registry as the correctness baseline (its cost tracks true
    # duplication — output-bound, not a plan property worth benching)
    "corpus_strip_repeated_chunks",
    "ivf_search_top3",
    "winnowing_pairs_capped",
    # round-7: applying-form strip, sampled k-means trainer, OCF file
    # format, degree-oriented triangles
    "corpus_stripped_text",
    "kmeans_minibatch_k8",
    "avro_ocf_roundtrip_customers",
    "copurchase_triangle_count",
]

#: Heavier iterative/graph entries benched on demand
#: (SPARK_GRAFT_BENCH_EXTENDED=1) — kept out of HEADLINE so the
#: round-over-round comparison stays on a stable query set (the r07->r08
#: CC-variance lesson: stable sets + medians + loadavg are what make the
#: artifact adjudicable).
EXTENDED = [
    "pagerank_trade_graph",
    "customer_hierarchy_walk",
    "pca_power_top_component",
    "minhash_estimate_vs_exact_jaccard",
    "ship_latency_percentiles_scale_path",
    # round-9 iterative/sketch additions — first history round
    "copurchase_k_core_peel",
    "trade_reachability_3hop",
    "kmv_parts_by_segment_nation",
    "minhash_r2_capped_candidates",
    # round-10: the batch merging-session-window operator — first history
    "events_session_window_dynamic_gap",
    # round-11: the joinless rolling median (watch the respell), the
    # mergeable rank sketch with its exact referee, the closed-form
    # CUSUM, and the trailing-30d RANGE frame — first history
    "user_rolling_7d_median_value",
    "order_value_rank_sketch_vs_exact",
    "events_cusum_value_drift",
    "customer_trailing_30d_spend",
    # round-12: the r11 heavies promoted per the verdict (their cost is
    # gate-side exact referees / real micro-batch replay — tracked so a
    # regression in them is adjudicable), plus the new LPA and
    # row-pattern families — first history
    "trade_neighborhood_function_kmv",
    "streaming_count_min_user_heavy_hitters",
    "copurchase_communities_lpa",
    "events_pattern_views_to_purchase",
    "part_price_w_pattern",
    "order_value_percentile_cont",
    # round-13: the banded-inequality join family — the bucket rewrite
    # whose whole point is the plan shape, so its wall time is the
    # regression signal for the equi-join staying equi
    "part_price_band_pairs",
    "customer_supplier_balance_band",
    # round-13b: HLL register sketch (one partial-agg shuffle — its wall
    # time pins the no-DISTINCT property), the sort-pruned skyline (wall
    # time pins windows-not-joins), and the prefix-filter exact Jaccard
    # join (wall time is dominated by candidate fan-out — the regression
    # signal for the prefix staying rare-token-only)
    "hll_distinct_users_by_type",
    "hll_weekly_merge_identity",
    "hll_intersection_viewers_purchasers",
    "streaming_hll_distinct_users",
    "hll_rolling_7d_distinct_users",
    "rank_join_top10_pairs_by_balance",
    "hll_weekly_overlap_matrix",
    "events_pattern_view_alt_action_purchase",
    "rank_join_top3_pairs_per_nation",
    "part_skyline_price_size",
    "part_skyline_per_brand",
    "docs_jaccard_prefix_filter_pairs",
    # round-14: the capped rung — its wall time pins the cap window
    # staying pair-set-sized (the 100 TB operating point of the exact
    # similarity join); the overlap join + FastSS pin their candidate
    # joins staying prefix/variant-keyed; the weighted samples pin the
    # expansion collapsing map-side; the bounded pattern rides the
    # one-shuffle pattern chain
    "docs_jaccard_prefix_filter_capped",
    "docs_overlap_containment_pairs",
    "customer_name_edit1_fastss",
    "lineitem_weighted_sample_by_flag",
    "events_weighted_user_sample",
    "streaming_weighted_user_sample",
    "events_pattern_bounded_views_within_7d",
    # round-14b: the SNN family's wall time pins the pair scan staying
    # sample/cell-bounded (broadcast NLJ over ~5% rows, equi mutuality
    # join); the two-stage rerank pins stage 2 touching only the
    # 20-row shortlist; the changepoint pins the joinless two-exchange
    # window chain; the bit-score pins its corpus joins staying
    # hash-keyed; the KMV difference rides the k-row sketch scaffold
    "mutual_knn_pairs",
    "snn_shared_neighbor_edges",
    "jarvis_patrick_clusters",
    "pq_rerank_top3_recall",
    "kmv_difference_estimate",
    "events_value_changepoint",
    "doc_bigram_lm_bitscore",
    # round-14b batch 2: the trend family pins the pair stage staying
    # DAYS-bounded (aggregation-first); the Allen histogram rides the
    # custkey-equi interval pair join
    "events_theil_sen_daily_trend",
    "events_mann_kendall_trend",
    "events_isotonic_daily_value",
    "order_interval_allen_histogram",
    # round-14c: the association-statistics family — KS pins the
    # cumulative stage staying distinct-cents-domain-bounded, Kendall
    # pins the pair stage staying DAYS-bounded, Spearman pins the
    # two rank windows (per-flag sort, no pair object), the chi2 cells
    # / HHI / entropy ride single natural-key exchanges, and the Zipf
    # fit pins the rank stage staying vocab-bounded
    "events_ks_view_purchase",
    "lineitem_spearman_qty_price",
    "events_kendall_daily_taub",
    "orders_priority_status_chi2_cells",
    "nation_customer_order_hhi",
    "events_user_type_entropy_bits",
    "corpus_zipf_loglog_slope",
    # round-14c batch 2: PSI pins the events pass staying one pruned
    # projection + domain-bounded folds; JSD pins the mixture staying
    # vocab x sources (broadcast-built); HITS pins the six round joins
    # staying equi with map-side-combining integer sums
    "events_value_psi_halves",
    "source_token_jsd_vs_corpus",
    "trade_hits_hub_authority",
    # round-14d: Fellegi-Sunter scoring — its wall time pins the
    # candidate stage staying the variant equi-join (the FastSS
    # property) with row-local integer scoring on top; the streaming
    # PSI twin rides the micro-batch replay harness like the other
    # streaming sketch members
    "customer_linkage_fs_weights",
    "streaming_psi_value_halves",
    # round-14c batch 3: both pin the domain-bounded (never row-sorted)
    # two-sample spelling
    "events_mannwhitney_view_purchase",
    "events_value_qq_deciles_halves",
    # round-14d: per-node triangle attribution — wall time pins the
    # corner explode staying output-bounded on the oriented enumeration
    "copurchase_clustering_coefficient",
    # round-14e: KW and the crosscorr pin their single-partition stages
    # staying DOMAIN-bounded (distinct values / days); assortativity
    # rides the HITS edge-list backbone with zero iteration; both MG
    # forms pin the summary staying k-bounded at every level (batch:
    # chunked windows; streaming: the 4-batch stateful fold); the
    # feature encodings pin aggregation-first (vocab / customer
    # domains); the bucketed join's wall time INCLUDES the two
    # bucketed-table writes — the layout amortization trade is the
    # number to watch
    "events_kruskal_wallis_cells",
    "events_daily_crosscorr_view_purchase",
    "trade_degree_assortativity",
    "token_misra_gries_vs_exact",
    "streaming_misra_gries_tokens",
    "doc_feature_hashing_load",
    "customer_target_encoding_smoothed",
    "bucketed_colocated_segment_revenue",
    # round-14e batch 2: k-anonymity pins the QI-class rollup staying
    # domain-bounded; NDCG rides the broadcast all-pairs baseline with
    # literal-constant discounts
    "orders_k_anonymity_profile",
    "truncated_dim_ndcg_at5",
    # round-14e batch 3: kappa rides the langid CTE + |labels|-domain
    # folds; IG pins the domain-median pick + enumerable-level groupBys
    "langid_cohens_kappa",
    "orders_feature_information_gain",
    # round-14e batch 4: rich-club pins the threshold fold staying ONE
    # conditional-sum pass over decorated edges; PMI pins the candidate
    # set staying bigram-vocab-sized
    "copurchase_rich_club",
    "bigram_pmi_collocations",
    # round-14e batch 5: WoE rides the IG median machinery; the class
    # weights are a 1-fold table; negative sampling pins the candidate
    # stage staying broadcast-user-batch x parts (no shuffle before the
    # k-bounded window)
    "orders_woe_iv_cells",
    "events_class_weights",
    "customer_part_negative_samples",
    # round-14e batch 6: log-rank pins the risk sets staying
    # lifespan-domain suffix sums (never per-user-per-day scans)
    "users_logrank_view_vs_other_cells",
    "langid_precision_recall_f1",
    # modularity re-derives the LPA trajectory then adds two equi
    # decorations — its wall time tracks the LPA family's
    "copurchase_lpa_modularity",
    # round-14f: AUC/ROC/lift all pin the score pass staying
    # distinct-cents-DOMAIN-bounded (one groupBy + one domain window /
    # 20 broadcast cutoffs / two <=10-row windows); MRR rides the
    # broadcast all-pairs baseline; McNemar is one row-local string
    # pass + a single-row fold; silhouette pins the scoring staying a
    # zero-shuffle literal-argmin pass (training cost tracks the
    # kmeans family); DB cells add one (cell)-keyed bounded fold + a
    # k-row broadcast pair join; flesch is one row-local regex pass;
    # the gini cells ride the IG median machinery
    "events_purchase_auc_rank_cells",
    "events_purchase_roc_literal_thresholds",
    "events_purchase_decile_lift",
    "truncated_dim_mrr_at5",
    "langid_mcnemar_stopword_vs_conjunction",
    "kmeans_silhouette_simplified",
    "kmeans_davies_bouldin_cells",
    "doc_readability_flesch",
    "orders_feature_gini_impurity_cells",
    # round-14f batch 2: CA trend is a 5-band fold (cheapest shape);
    # the edge-support wall time pins the triangle explode staying
    # output-bounded on the oriented enumeration (the clustering-
    # coefficient property, at edge granularity); blocking quality pins
    # the truth side staying the FastSS variant join with the candidate
    # count never materializing a pair
    "events_purchase_ca_trend_cells",
    "copurchase_edge_support_hist",
    "customer_blocking_quality_profile",
    # the streaming AUC twin rides the micro-batch replay harness like
    # the other streaming sketch members (state = score-domain counts)
    "streaming_purchase_auc_rank_cells",
    # calibration bins ride the IG/encoding median + customer-domain
    # machinery (<=21-row rollup)
    "orders_target_calibration_bins",
    # round-14g: ANOVA/Brown-Forsythe pin the moment pass staying one
    # ~5-key map-side-combined groupBy (BF adds the per-type domain
    # cumulative); t-closeness pins the grid staying |classes| x |sens
    # buckets|; ECE rides the calibration-bins machinery + the chunked
    # conf_b fold; MCC rides the langid CTE; the count-sketch trio pins
    # the signed matrix staying one (i,pos) shuffle (streaming: the
    # 4-batch stateful SUM replay); SemDeDup pins assignment staying
    # row-local with the pair stage cell-bounded; Bradley-Terry pins
    # the duel explode staying <=C(7,2)/order with broadcast-only MM
    # rounds; ORC rides the format-roundtrip harness; Hilbert pins the
    # whole index chain staying row-local integer selects
    "events_value_anova_cells",
    "events_value_brown_forsythe_cells",
    "orders_t_closeness_profile",
    "orders_calibration_ece",
    "langid_mcc_cells",
    "token_count_sketch_vs_exact",
    "token_ams_f2_sketch_vs_exact",
    "streaming_count_sketch_tokens",
    "semdedup_prune_flags",
    "semdedup_cell_summary",
    "brand_bradley_terry_strength",
    "orc_roundtrip_supplier",
    "hilbert_layout_effectiveness",
    # effect sizes ride the MW domain machinery; conformal rides the
    # OLS moment pass + one residual-domain window
    "events_effect_sizes_view_purchase",
    "lineitem_ols_conformal_coverage",
    # TextRank rides the PageRank bounded-rounds discipline on the
    # bigram-vocabulary graph
    "corpus_textrank_keywords",
    # the streaming ANOVA twin rides the micro-batch replay harness
    # (state = |event types| x 3 int64 moment cells)
    "streaming_anova_moment_cells",
]


#: Deliberate scale trades (r14 VERDICT finding #6): a query whose local
#: median moved because a 100 TB-fatal plan shape was removed on purpose
#: must adjudicate as "accepted-trade", not "noise"/"regression-suspect" —
#: otherwise the drift ratchet re-flags the same intentional move every
#: round.  Entries carry the round + rationale; the compact artifact
#: includes this map verbatim whenever one of its queries gets flagged.
ACCEPTED_TRADES = {
    "jaccard_verified_candidates": (
        "r14 removed a corpus-sized shingle-table broadcast (fatal at "
        "scale); r15 re-landed the verify as checkpointed two-join "
        "SHUFFLE_HASH (sf1 A/B in SCALE.md: 43.5 s melt-SMJ -> ~17-27 s, "
        "broadcast 16.3 s) — still ~1.5x the pre-trade local median, "
        "accepted for the 100 TB plan"
    ),
}


def _history_medians() -> tuple[str | None, dict[str, float], dict[str, float]]:
    """(description, per-query medians, decode history) merged from the
    local sidecars and the most recent driver bench artifact
    (``BENCH_r{N}.json`` with the highest N; override with
    $SPARK_GRAFT_BENCH_HISTORY).  The drift-adjudication baseline: twice
    now (CC r7, avro_roundtrip r8) a >2x driver-median line was VM load
    noise proven only by out-of-band artifacts — the bench now carries
    that evidence itself.

    Merge order (r12 verdict #1: the driver's 27-query wrapper output
    must not blind the EXTENDED lines): local full sidecar, then the
    extended sidecar, then the newest driver artifact — so headline
    names get the newest driver medians while extended-only names keep
    the last committed extended run.  Decode history takes the newest
    source that has a decode block (driver artifact preferred)."""
    here = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cur_sf = float(sf) if sf.replace(".", "").isdigit() else sf

    def load_doc(path: str) -> tuple[dict[str, float], dict[str, float]]:
        """(queries, decode) from either bench.py's own output or the
        DRIVER's wrapper format ({n, rc, parsed, tail, sf}: ``parsed``
        is our JSON line if the driver could parse it, ``tail`` the
        last 2000 chars of stdout — the round-10 lesson: the r8-r10
        adjudication blocks were silently empty because the wrapper has
        no top-level "queries" and the old reader never looked inside,
        so no history line ever got flagged)."""
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            return {}, {}
        if doc.get("sf") != cur_sf:  # another SF is not comparable
            return {}, {}
        for d in (doc, doc.get("parsed") or {}):
            if isinstance(d.get("queries"), dict):
                qs = {k: float(v) for k, v in d["queries"].items()}
                dec = {
                    k: float(v)
                    for k, v in (d.get("decode") or {}).items()
                    if isinstance(v, (int, float))
                }
                return qs, dec
        tail = doc.get("tail")
        if isinstance(tail, str):  # best-effort: find blocks in tail
            qs, dec = {}, {}
            m = re.search(r'"queries":\s*(\{[^{}]*\})', tail)
            if m:
                try:
                    qs = {k: float(v) for k, v in json.loads(m.group(1)).items()}
                except ValueError:
                    qs = {}
            m = re.search(r'"decode":\s*(\{[^{}]*\})', tail)
            if m:
                try:
                    dec = {
                        k: float(v)
                        for k, v in json.loads(m.group(1)).items()
                        if isinstance(v, (int, float))
                    }
                except ValueError:
                    dec = {}
            return qs, dec
        return {}, {}

    path = os.environ.get("SPARK_GRAFT_BENCH_HISTORY")
    if path:
        qs, dec = load_doc(path)
        return os.path.basename(path), qs, dec
    cands = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r0*(\d+)\.json", os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    driver = sorted(cands, reverse=True)[:1]
    sources: list[str] = [
        os.path.join(here, "BENCH_local_full.json"),
        os.path.join(here, f"BENCH_local_full_sf{sf}.json"),
        os.path.join(here, "BENCH_local_extended.json"),
        os.path.join(here, f"BENCH_local_extended_sf{sf}.json"),
    ] + [p for _, p in driver]
    merged_q: dict[str, float] = {}
    decode_hist: dict[str, float] = {}
    used: list[str] = []
    for p in sources:
        qs, dec = load_doc(p)
        if qs or dec:
            used.append(os.path.basename(p))
        merged_q.update(qs)
        if dec:
            decode_hist = dec  # later (newer) sources win wholesale
    return ("+".join(used) or None), merged_q, decode_hist


def _decode_best_ever() -> dict[str, dict]:
    """Per-key BEST-EVER decode throughput over the committed DRIVER
    artifact series (``BENCH_r{N}.json`` — the one harness that runs
    identically every round; local sidecars vary runner config and
    would poison the max).  The r13 verdict's ratchet fix: comparing
    each round only to the NEWEST history let −18% (r12) + −27% (r13)
    compound to −40% without ever crossing the per-round 1.5x band, so
    decode lines are now additionally adjudicated against this
    cumulative baseline.  Adjudication rerun bests inside the decode
    blocks count — they are committed measurements of the same code."""
    here = os.path.dirname(os.path.abspath(__file__))
    best: dict[str, dict] = {}
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        if not re.fullmatch(r"BENCH_r0*\d+\.json", os.path.basename(p)):
            continue
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        for d in (doc, doc.get("parsed") or {}):
            dec = d.get("decode")
            if not isinstance(dec, dict):
                continue
            for key in ("single_thread_rec_s", "spark_rec_s"):
                vals = []
                if isinstance(dec.get(key), (int, float)):
                    vals.append(float(dec[key]))
                rb = (dec.get("adjudication") or {}).get(key, {}).get("rerun_best")
                if isinstance(rb, (int, float)):
                    vals.append(float(rb))
                for v in vals:
                    if key not in best or v > best[key]["rec_s"]:
                        best[key] = {"rec_s": v, "source": os.path.basename(p)}
            break
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Controlled re-bench knob (round-7 verdict: the CC bimodality needed
    # a focused >=5-run artifact): comma-separated subset of HEADLINE.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    headline = list(HEADLINE)
    if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED"):
        headline += EXTENDED
    if subset:
        picked = [s.strip() for s in subset.split(",") if s.strip()]
        unknown = [p for p in picked if p not in headline]
        if unknown:
            raise SystemExit(f"unknown bench queries {unknown}; known = {headline}")
        headline = picked
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()

    # Warm-up: run every headline query once at the smallest SF so the
    # timed pass measures steady-state throughput (codegen compiled, JVM
    # JIT'd, parquet footers cached) — the regime a long-running cluster
    # job actually operates in — instead of first-call JIT noise.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in headline:
        try:
            materialize(reg[name](spark, warm_dir))
        except Exception:  # noqa: BLE001 — warm-up must never fail the bench
            pass

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    run_load: dict[str, list[float]] = {}
    # interleave rounds (run 0 of every query, then run 1, ...) so a
    # transient host-load spike degrades one ROUND of many queries
    # instead of every sample of one query
    for i in range(n_runs):
        for name in headline:
            q = reg[name]
            run_load.setdefault(name, []).append(round(os.getloadavg()[0], 2))
            t0 = time.perf_counter()
            materialize(q(spark, sf_dir))
            dt = time.perf_counter() - t0
            runs.setdefault(name, []).append(dt)
            print(f"# run {i}: {name}: {dt:.3f}s", file=sys.stderr)
    for name in headline:
        timings[name] = round(statistics.median(runs[name]), 3)

    # --- self-adjudication (round-8 verdict #5): any line >1.5x over its
    # own history gets an immediate interleaved A/B re-run recorded in
    # the artifact, so a drift verdict never needs out-of-band evidence.
    hist_file, hist, decode_hist = _history_medians()
    flagged = [
        n for n in headline
        if n in hist and hist[n] > 0 and timings[n] > 1.5 * hist[n]
    ]
    adjudication: dict[str, dict] = {}
    if flagged and not os.environ.get("SPARK_GRAFT_BENCH_NO_ADJUDICATE"):
        rerun_n = max(3, n_runs)
        reruns: dict[str, list[float]] = {n: [] for n in flagged}
        rerun_load: dict[str, list[float]] = {n: [] for n in flagged}
        for i in range(rerun_n):  # interleaved, same as the main pass
            for name in flagged:
                rerun_load[name].append(round(os.getloadavg()[0], 2))
                t0 = time.perf_counter()
                materialize(reg[name](spark, sf_dir))
                reruns[name].append(time.perf_counter() - t0)
                print(
                    f"# adjudicate {i}: {name}: {reruns[name][-1]:.3f}s",
                    file=sys.stderr,
                )
        for name in flagged:
            rmed = statistics.median(reruns[name])
            adjudication[name] = {
                "history_median": hist[name],
                "first_median": timings[name],
                "rerun_all": [round(x, 3) for x in reruns[name]],
                "rerun_min": round(min(reruns[name]), 3),
                "rerun_median": round(rmed, 3),
                "rerun_loadavg": rerun_load[name],
                "verdict": (
                    "accepted-trade" if name in ACCEPTED_TRADES
                    else "noise" if min(reruns[name]) <= 1.5 * hist[name]
                    else "regression-suspect"
                ),
            }
            if name in ACCEPTED_TRADES:
                adjudication[name]["trade"] = ACCEPTED_TRADES[name]

    # decode throughput (the reference's core capability) — median-of-3 so
    # the fused-codegen path's regression story is tracked round-over-round
    # in the same artifact (previously only in SCALE.md prose)
    import bench_decode

    decode = {
        "cpu_spin_mops": round(bench_decode.cpu_spin_mops(), 1),
        "single_thread_rec_s": round(bench_decode.bench_single_thread(runs=n_runs)),
        "spark_rec_s": round(bench_decode.bench_spark(spark=spark, runs=n_runs)),
        "unit": "records/sec",
        "runs": n_runs,
    }

    # decode self-adjudication (r12 verdict #5): the query rerun logic
    # never covered the decode block, so r12's -18% single-thread drift
    # went unadjudicated.  A decode line >1.5x SLOWER than history
    # (rec/s < history/1.5) gets the same idle rerun + recorded verdict.
    decode_adj: dict[str, dict] = {}
    decode_best = _decode_best_ever()
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_ADJUDICATE"):
        for key, runner in (
            ("single_thread_rec_s", lambda: bench_decode.bench_single_thread(runs=1)),
            ("spark_rec_s", lambda: bench_decode.bench_spark(spark=spark, runs=1)),
        ):
            h = decode_hist.get(key)
            b = decode_best.get(key, {}).get("rec_s")
            # Fire on EITHER the per-round band (vs newest history) or
            # the cumulative band (vs best-ever) — the latter is the
            # anti-ratchet: slow drift can never stay under both.
            vs_latest = bool(h and decode[key] * 1.5 < h)
            vs_best = bool(b and decode[key] * 1.5 < b)
            if not (vs_latest or vs_best):
                continue
            reruns = [round(runner()) for _ in range(max(3, n_runs))]
            ref = max(v for v in (h, b) if v)
            decode_adj[key] = {
                "history_rec_s": h,
                "best_ever_rec_s": b,
                "best_ever_source": decode_best.get(key, {}).get("source"),
                "first_rec_s": decode[key],
                "rerun_all": reruns,
                "rerun_best": max(reruns),
                "rerun_loadavg": round(os.getloadavg()[0], 2),
                "verdict": (
                    "noise" if max(reruns) * 1.5 >= ref
                    else (
                        "cumulative-drift-suspect"
                        if h and max(reruns) * 1.5 >= h
                        else "regression-suspect"
                    )
                ),
            }
            print(f"# adjudicate decode {key}: {decode_adj[key]}", file=sys.stderr)
    if decode_best:  # the cumulative baseline, visible every round
        decode["best_ever"] = {
            k: v["rec_s"] for k, v in decode_best.items()
        }
    if decode_adj:
        decode["adjudication"] = decode_adj

    total = round(sum(timings.values()), 3)
    # The compact line the driver records (its artifact keeps only the
    # parsed JSON or the LAST 2000 stdout chars — so the adjudicable
    # fields stay small and late in the object) …
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "runs_per_query": n_runs,
        "aggregation": "median",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "history_file": hist_file,
        "materialize": "noop-write (full column evaluation)",
        "decode": decode,
        # compact verdicts only — full rerun samples live in the sidecar
        "adjudication": {
            n: {
                k: a[k]
                for k in (
                    "history_median", "rerun_median", "rerun_min",
                    "verdict", "trade",
                )
                if k in a
            }
            for n, a in adjudication.items()
        },
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # … and the full per-run diagnostics to the committed sidecar (also
    # the history fallback when driver artifacts are unreadable).
    full = dict(compact)
    full.update(
        {
            "adjudication": adjudication,
            "mins": {k: round(min(v), 3) for k, v in runs.items()},
            "all_runs": {
                k: [round(x, 3) for x in v] for k, v in runs.items()
            },
            "run_loadavg": run_load,
        }
    )
    here = os.path.dirname(os.path.abspath(__file__))
    if not subset:  # a subset run must not clobber the full history
        # EXTENDED runs write their own sidecar: the r12 driver run
        # clobbered the 45-query extended history in BENCH_local_full
        # with the 27-query wrapper output (r12 verdict finding #2) —
        # the driver only ever runs plain, so the extended name is safe.
        # Non-default SFs get their own suffix for the same reason: an
        # sf1 scaling run must not overwrite the sf0.1 history either
        # (it did, once, in round 13 — restored from git).
        sidecar = (
            "BENCH_local_extended.json"
            if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED")
            else "BENCH_local_full.json"
        )
        if sf_dir.rstrip("/") != "/root/testdata/sf0.1":
            sidecar = sidecar.replace(".json", f"_sf{sf}.json")
        try:
            with open(os.path.join(here, sidecar), "w") as f:
                json.dump(full, f, indent=1)
        except OSError:
            pass  # read-only checkout: stdout still carries the result
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
