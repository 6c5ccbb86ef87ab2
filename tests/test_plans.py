"""Scale audit: assert the optimizer decisions the 100-TB design relies on
— predicate pushdown to the parquet scan, column pruning, broadcast joins
where hinted, bounded exchange counts, no shuffle in the decode pipeline.
A regression in any of these passes correctness tests but melts at scale;
this file is where it fails instead.

(Assertions are written to hold at ANY scale factor: hinted broadcasts and
pushdown are static planner facts; counts use >= / <= bounds so that
auto-broadcast of tiny test tables can't flake them.)
"""

from __future__ import annotations

import re

from byte_convert_avro_spark.avro import schemaless_encode
from byte_convert_avro_spark.engine import Engine, EngineConfig, KAFKA_RECORD_SCHEMA
from byte_convert_avro_spark.plans import (
    count_exchanges,
    join_strategies,
    plan_facts,
    pushed_filters,
    read_schemas,
)
from byte_convert_avro_spark.plans.inspect import codegen_span_count, explain_str
from byte_convert_avro_spark.queries import queries
from byte_convert_avro_spark.schema_store import LocalSchemaStore
from byte_convert_avro_spark.wire import encode_wire

Q = queries()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    """The most selective scan in the suite: all three range predicates
    must reach the parquet reader, and only the 4 touched columns load."""
    df = Q["q6_forecast_revenue"](spark, sf_dir)
    pf = pushed_filters(df)["lineitem"]
    assert any("l_shipdate" in f and "GreaterThanOrEqual" in f for f in pf)
    assert any("l_discount" in f for f in pf)
    assert any("l_quantity" in f for f in pf)
    cols = read_schemas(df)["lineitem"]
    assert set(cols) == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}
    # global agg: exactly one shuffle (partial -> final)
    assert count_exchanges(df) == 1


def test_q1_single_shuffle_full_codegen(spark, sf_dir):
    """Pricing summary: one groupBy = one exchange; everything codegen'd."""
    df = Q["q1_pricing_summary"](spark, sf_dir)
    assert count_exchanges(df) <= 2  # agg exchange (+ sort for output order)
    assert codegen_span_count(df, execute=True) >= 1
    assert len(read_schemas(df)["lineitem"]) <= 7  # column pruning held


def test_q3_broadcast_dim(spark, sf_dir):
    """Customer (filtered, SF-scaling dim) carries no forced hint, but at
    test SFs the planner must still pick a broadcast from file-size stats
    — proving the un-hinted join degrades to broadcast when small and is
    free to shuffle at cluster scale."""
    df = Q["q3_shipping_priority"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 1
    pf = pushed_filters(df)
    assert any("BUILDING" in f for f in pf.get("customer", []))
    assert any("o_orderdate" in f for f in pf.get("orders", []))


def test_q5_all_dims_broadcast(spark, sf_dir):
    """6-way join: nation/region are hinted (fixed-size); customer and
    supplier auto-broadcast at test SFs from stats — ≥4 broadcast hops
    either way, with only the aggregation shuffles left."""
    df = Q["q5_local_supplier_volume"](spark, sf_dir)
    facts = plan_facts(df)
    assert facts.broadcast_joins >= 4
    assert any("r_name" in f for f in facts.pushed.get("region", []))


def test_knn_broadcasts_query_side(spark, sf_dir):
    """Brute-force ANN: the query vectors ship to every executor; the
    corpus never moves until the top-k agg."""
    df = Q["knn_cosine_top5"](spark, sf_dir)
    joins = join_strategies(df)
    assert any(j.startswith("Broadcast") for j in joins)


def test_decode_pipeline_is_narrow(spark):
    """O4-O17 is a pure projection: ZERO exchanges at any scale — the
    property that makes decode throughput linear in partitions
    (SURVEY.md §3: 'no shuffle anywhere in the faithful pipeline')."""
    schema = '{"type":"record","name":"N","fields":[{"name":"x","type":"int"}]}'
    store = LocalSchemaStore()
    store.register(schema, 1)
    eng = Engine(EngineConfig(avro_topics="t:true"), store=store)
    rows = [
        (None, encode_wire(1, schemaless_encode({"x": 1}, schema)), "t", 0, 0, None, 0)
    ]
    df = eng.transform(spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA))
    assert count_exchanges(df) == 0
    assert join_strategies(df) == []


def test_sessionization_single_shuffle(spark, sf_dir):
    """Gaps-and-islands: both windows + the final agg share ONE shuffle on
    user_id (the plan property that makes it viable on hot keys)."""
    df = Q["events_sessionization"](spark, sf_dir)
    assert count_exchanges(df) == 1


def test_dedup_exact_single_shuffle(spark, sf_dir):
    df = Q["dedup_exact_groups"](spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_topk_plans_as_take_ordered(spark, sf_dir):
    """orderBy().limit(k) must plan as TakeOrderedAndProject (per-partition
    heap + driver merge) — never a global sort."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["top_orders_by_value"](spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_sequence_packing_sharded_no_single_partition_window(spark, sf_dir):
    """The sharded packing form must plan a hash-partitioned window (one
    partition per shard), never the all-to-one Exchange SinglePartition of
    the single-shard semantics pin ``sequence_packing_4k``."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    plan = explain_str(Q["sequence_packing_sharded"](spark, sf_dir), "simple")
    assert "Window" in plan
    assert "SinglePartition" not in plan
    # and the unsharded pin really is the single-partition plan (the
    # contrast that documents why the sharded form exists)
    pin = explain_str(Q["sequence_packing_4k"](spark, sf_dir), "simple")
    assert "SinglePartition" in pin


def test_q15_single_fact_scan(spark, sf_dir):
    """The scalar-max subquery must NOT recompute the revenue aggregation:
    exactly one lineitem scan in the plan."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    plan = explain_str(Q["q15_top_supplier"](spark, sf_dir), "simple")
    assert plan.count("lineitem.parquet") == 1


def test_decontamination_broadcasts_bench_grams(spark, sf_dir):
    """The eval-side gram set is hinted broadcast — the train corpus must
    stream map-side through the join (at 100 TB the train side cannot
    shuffle on gram)."""
    df = Q["decontamination_ngram_overlap"](spark, sf_dir)
    assert join_strategies(df).count("BroadcastHashJoin") >= 1
    # documents scan reads only the touched columns
    cols = read_schemas(df)["documents"]
    assert set(cols) <= {"doc_id", "lang", "text"}


def test_stratified_sample_broadcasts_thresholds(spark, sf_dir):
    """Per-stratum quotas join back via an explicit broadcast; the corpus
    is never shuffled before the final summary agg."""
    df = Q["stratified_sample_balanced"](spark, sf_dir)
    assert join_strategies(df).count("BroadcastHashJoin") >= 1


def test_q2_pair_agg_before_joins(spark, sf_dir):
    """The Q2 shape pre-aggregates lineitem to (part, supplier) pairs and
    windows over THAT — the fact table is scanned once and the window
    input is pair-sized, never raw lineitem."""
    df = Q["q2_min_cost_supplier"](spark, sf_dir)
    # region + nation fixed-size dims hinted broadcast
    assert join_strategies(df).count("BroadcastHashJoin") >= 2
    pf = pushed_filters(df)
    assert any("STANDARD" in f for f in pf.get("part", []))
    assert any("EUROPE" in f for f in pf.get("region", []))


def test_asof_tolerance_is_pure_codegen(spark, sf_dir):
    """The tolerance as-of must stay fully native — no Python stage
    anywhere (the cogrouped merge_asof fallback would show ArrowEvalPython
    / FlatMapCoGroupsInPandas)."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["events_asof_tolerance_30m"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Python" not in plan and "Pandas" not in plan
    # one shuffle on user_id for the window (+ optional AQE reuse)
    assert count_exchanges(df) <= 2


def test_incremental_dedup_broadcasts_new_batch(spark, sf_dir):
    """Both probe joins must broadcast the tiny new-batch side — the
    corpus may never shuffle on content hash or band signature."""
    df = Q["incremental_dedup_new_batch"](spark, sf_dir)
    assert join_strategies(df).count("BroadcastHashJoin") >= 2


def test_gapfill_reads_only_needed_columns(spark, sf_dir):
    """The gap-fill spine query prunes the events scan to the four
    touched columns (props/event_type never load)."""
    df = Q["events_daily_gapfill_locf"](spark, sf_dir)
    cols = read_schemas(df)["events"]
    assert set(cols) <= {"user_id", "event_id", "ts", "value"}


def test_simhash_one_explode_single_vote_aggregation(spark, sf_dir):
    """The parallel-buffer SimHash plans exactly ONE Generate (the token
    split explode) — never the bits-x bit-position explode — and one
    aggregation carrying all vote buffers: exchanges are bounded by
    spread + distinct + the per-doc groupBy."""
    from byte_convert_avro_spark.plans.inspect import explain_str
    import re

    df = Q["simhash_signatures"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert len(re.findall(r"Generate explode", plan)) == 1
    assert count_exchanges(df) <= 3


def test_jaccard_joins_shingle_arrays_not_rows(spark, sf_dir):
    """Jaccard verification joins per-doc shingle ARRAYS onto pairs: the
    overlap count is a partition-local array_intersect, and no join
    condition touches a shingle column (the old row-explode form joined
    on sh = sh, re-shuffling hub docs' shingles once per pair)."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["jaccard_verified_candidates"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "array_intersect" in plan
    for line in plan.splitlines():
        if "Join" in line and "Inner" in line:
            assert "sh#" not in line and "_rb_sh" not in line, line


def test_chunk_dedup_no_pair_join_partial_distinct(spark, sf_dir):
    """Substring-level dedup never pairs documents: the plan contains no
    cartesian/nested-loop join, the shared-chunk detection partial-
    aggregates the distinct-doc count map-side before its one chunk-hash
    shuffle, and total exchanges stay bounded (spread repartitions + the
    chunk-hash shuffle + join requirements)."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["corpus_strip_repeated_chunks"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count(distinct" in plan
    assert count_exchanges(df) <= 6


def test_interval_overlap_query_avoids_nested_loop(spark, sf_dir):
    """The sessions x busy-hours overlap join must plan as the bucketed
    EQUI-join (hash/sort-merge on the bucket key) — never the
    nested-loop/cartesian the naive overlap theta-join degenerates to."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["sessions_busy_hour_overlap"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_value_band_join_is_broadcast_nested_loop(spark, sf_dir):
    """The range-band query's non-equi join has no equi key at all, so
    the RIGHT plan is a BroadcastNestedLoopJoin with the 5-row band dim
    broadcast (map-side range tests, zero fact-side shuffle before the
    rollup) — pin that the broadcast actually happened."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["events_value_band_totals"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_partitioned_cache_joins_shuffle_free_on_cached_side(spark):
    """The mechanism connected_components' big-graph path relies on: a
    relation cached AFTER repartition+sortWithinPartitions on the join
    key advertises that layout through InMemoryTableScan, so a merge
    join re-shuffles and re-sorts ONLY the other side.  (A checkpointed
    RDD advertises neither — that asymmetry is why the operator caches
    big edge lists instead of checkpointing them.)  If a Spark upgrade
    stops preserving cache layout, this fails before the operator gets
    slower silently."""
    from pyspark.sql import functions as F

    from byte_convert_avro_spark.plans.inspect import explain_str

    big = spark.range(100_000).select(
        (F.col("id") % 1000).alias("src"), F.col("id").alias("dst")
    )
    cached = big.repartition(F.col("src")).sortWithinPartitions("src").persist()
    try:
        cached.count()
        labels = spark.range(1000).select(
            F.col("id").alias("src"), F.col("id").alias("label")
        )
        j = cached.hint("merge").join(labels, "src")
        plan = explain_str(j, "simple")
        assert "InMemoryTableScan" in plan
        # the explain text embeds the cache's BUILD plan (its one-time
        # repartition+sort) inside InMemoryRelation, so count live nodes
        # only: exactly one ENSURE_REQUIREMENTS exchange (labels side),
        # and nothing between the join and the InMemoryTableScan but the
        # null-filter — no re-exchange, no re-sort of the cached side.
        assert plan.count("ENSURE_REQUIREMENTS") == 1, plan
        cached_side = plan.split("InMemoryTableScan")[0]
        assert "SortMergeJoin" in cached_side, plan
        above_scan = cached_side.split("SortMergeJoin")[1]
        assert "Exchange" not in above_scan and "Sort" not in above_scan, plan
    finally:
        cached.unpersist()


def test_changelog_compaction_no_window_sort(spark, sf_dir):
    """CDC compaction must plan as ONE hash aggregate (struct-argmax),
    never the per-key window sort the oracle spells: no Window node, a
    single exchange, and partial aggregation map-side."""
    df = Q["events_changelog_compaction"](spark, sf_dir)
    plan = explain_str(df)
    assert "Window" not in plan
    assert count_exchanges(df) == 1


def test_triangle_count_no_wedge_join(spark, sf_dir):
    """Triangle counting must close via row-local array_intersect over
    out-adjacency arrays — the wedge-materializing 3-way self-join
    (sum-outdeg² intermediate rows) is the scale regression this pins
    out.  array_intersect present; join count bounded to the two
    adjacency joins + the orientation degree joins."""
    df = Q["copurchase_triangle_count"](spark, sf_dir)
    plan = explain_str(df)
    assert "array_intersect" in plan
    # wedge form needs >= 5 binary joins (2 deg + wedge pair + closing
    # + final); adjacency form stays at 4 SortMerge/Hash joins before
    # the tiny crossJoins of the scalar counts
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) <= 6


def test_stripped_text_ships_indexes_not_text(spark, sf_dir):
    """corpus_stripped_text: the per-doc rollup must aggregate kept
    chunk INDEXES (ints); the doc text itself must never enter the
    chunk-hash shuffle (only doc_id + hash + idx flow through the
    chunk side)."""
    df = Q["corpus_stripped_text"](spark, sf_dir)
    plan = explain_str(df)
    assert "sort_array" in plan and "collect_list" in plan
    # the aggregate that gathers indexes must not carry the text column
    import re

    m = re.search(r"ObjectHashAggregate.*collect_list", plan)
    agg_lines = [l for l in plan.splitlines() if "collect_list" in l]
    assert agg_lines and all("text" not in l for l in agg_lines)


def test_bloom_probe_is_shuffle_free(spark):
    """The probe side of the Bloom pre-filter must pass through ONLY
    broadcast hash joins — zero shuffle exchanges (the explode +
    groupBy(key) formulation this pins out re-shuffles the entire probe
    relation on the key)."""
    from byte_convert_avro_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(i,) for i in range(50)], "u long")
    probe = spark.createDataFrame([(i,) for i in range(200)], "u long")
    words = bloom_build(members, "u").localCheckpoint()  # freeze the build
    probed = bloom_probe(probe, words, "u")
    assert count_exchanges(probed) == 0
    assert plan_facts(probed).broadcast_joins >= 3


def test_link_prediction_uses_adjacency_intersection(spark, sf_dir):
    """Link-prediction scoring must close via row-local array_intersect
    over sorted neighbor arrays (the triangle-count discipline) — never
    a pairs-of-pairs wedge join."""
    df = Q["copurchase_link_prediction"](spark, sf_dir)
    plan = explain_str(df)
    assert "array_intersect" in plan
    assert "sort_array" in plan


def test_bounded_ordered_agg_two_level_fold_shape(spark, sf_dir):
    """The round-7 scale fix must actually plan as TWO bounded
    aggregation levels: a (dim, chunk)-keyed exchange whose collect_list
    arrays are chunk-bounded, then a (dim)-keyed exchange of chunk sums —
    plus only the spread() repartition.  A regression to the flat
    one-level fold (unbounded per-group arrays) loses the __chunk
    grouping and an exchange."""
    df = Q["embedding_dim_stats"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "__chunk" in plan, "chunked two-level fold disappeared from the plan"
    assert 2 <= count_exchanges(df) <= 3


def test_interval_overlap_self_join_is_equi_keyed(spark, sf_dir):
    """The order-interval overlap self-join must ride its non-equi
    overlap predicates as residuals on a customer-keyed EQUI join (shuffle
    key uniform, per-task work bounded by a customer's order count) —
    never a nested-loop or cartesian plan."""
    df = Q["customer_order_interval_overlaps"](spark, sf_dir)
    joins = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in joins and "CartesianProduct" not in joins
    assert any(j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin") for j in joins)


def test_qualify_and_lateral_stay_on_aggregated_rows(spark, sf_dir):
    """QUALIFY-style and LATERAL-style top-k must window over
    PRE-AGGREGATED / dimension-joined rows with broadcast dims: bounded
    exchanges (spend agg + window / window only), no shuffled dim join."""
    q = Q["qualify_top_spender_per_nation"](spark, sf_dir)
    assert join_strategies(q).count("BroadcastHashJoin") >= 2
    assert count_exchanges(q) <= 2
    lat = Q["lateral_top3_suppliers_per_region"](spark, sf_dir)
    assert join_strategies(lat).count("BroadcastHashJoin") >= 2
    assert count_exchanges(lat) <= 1


def test_bpe_pipeline_bounded_exchanges_after_checkpoint(spark, sf_dir):
    """The BPE train+tokenize pipeline collects each round's 1-row merge
    rule and localCheckpoints the vocab (iterative-job discipline), so
    the FINAL tokenize plan must not replicate the corpus scan per lazy
    branch: bounded exchanges (vocab join + doc rollup + spread), merge
    rules applied as broadcast cross joins."""
    df = Q["corpus_bpe_tokenized"](spark, sf_dir)
    assert count_exchanges(df) <= 4
    joins = join_strategies(df)
    # 3 broadcast 1-row rule applications + the word-keyed vocab join
    assert joins.count("BroadcastNestedLoopJoin") == 3
    assert any(j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin") for j in joins)


def test_asof_nearest_is_pure_codegen(spark, sf_dir):
    """The NATIVE nearest as-of must also stay Python-free — one union
    of both tagged sides with two running windows and an absolute-gap
    argmin on the left rows (NO join back); the cogrouped merge_asof
    nearest it replaces would show FlatMapCoGroupsInPandas."""
    from byte_convert_avro_spark.plans.inspect import explain_str

    df = Q["events_asof_nearest_purchase"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Python" not in plan and "Pandas" not in plan


def test_inverted_index_collect_is_rank_bounded(spark, sf_dir):
    """part_name_inverted_index must never materialize a full posting
    list in an aggregate buffer: a streaming row_number ranks postings
    per token FIRST and only rank <= 64 keys reach the collect_list
    (verdict-r8 hazard — a stop-word token at 100 TB is a df-sized
    reducer array otherwise).  Pin the Window node below the aggregate,
    the conditional collect, and the result contract: heads hold at
    most 64 keys while doc_freq stays the EXACT (possibly larger)
    count."""
    df = Q["part_name_inverted_index"](spark, sf_dir)
    plan = explain_str(df)
    assert "row_number" in plan and "Window" in plan
    assert "collect_list(CASE WHEN" in plan
    rows = df.collect()
    assert rows
    for r in rows:
        head = r.postings_head.split(",")
        assert len(head) <= 64
        assert len(head) == min(r.doc_freq, 64)
        # the head is the SORTED smallest keys
        assert [int(x) for x in head] == sorted(int(x) for x in head)
    # exercise the truncation itself on a corpus where it must engage
    # (sf0.001's max df is 34 — below the head): same plan, fabricated
    # 200-posting token
    from pyspark.sql import functions as F

    big = spark.range(200).select(
        (F.col("id") + 1).cast("long").alias("p_partkey"),
        F.lit("stopword").alias("token"),
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("token").orderBy("p_partkey"))
    out = (
        big.withColumn("rn", rn)
        .groupBy("token")
        .agg(
            F.count("*").cast("long").alias("doc_freq"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= 64, F.col("p_partkey")))
                ),
                ",",
            ).alias("postings_head"),
        )
        .collect()[0]
    )
    assert out.doc_freq == 200
    assert out.postings_head.split(",") == [str(i) for i in range(1, 65)]


def test_rank_duals_share_one_exchange(spark, sf_dir):
    """All three relative-rank windows (asc percent_rank, asc cume_dist,
    desc cume_dist) must share ONE hash partition on c_mktsegment — the
    descending window is a partition-local re-sort, never a second
    exchange."""
    df = Q["customer_balance_rank_duals"](spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = explain_str(df, "formatted")
    assert plan.count("Window") >= 2  # both window specs survived


def test_equi_width_hist_broadcasts_minmax(spark, sf_dir):
    """The global min/max pass must reach the bucketing scan as a
    BROADCAST of the 1-row aggregate (nested-loop on a single-row build
    side is the cheap form), and the 20-key bucket aggregate must
    partial-aggregate map-side: exactly the min/max agg exchange + the
    bucket agg exchange, nothing else."""
    df = Q["order_price_equi_width_hist"](spark, sf_dir)
    assert join_strategies(df) == ["BroadcastNestedLoopJoin"]
    assert count_exchanges(df) == 2
    plan = explain_str(df, "formatted")
    assert "BroadcastExchange" in plan


def test_session_window_dynamic_gap_is_one_exchange_merging_sessions(
    spark, sf_dir
):
    """The dynamic-gap batch sessionizer must plan as Spark's native
    MergingSessions operator over ONE exchange on the user key, with a
    partial session aggregate BELOW the exchange (map-side session
    pre-merge) — a regression to a windowed gaps-and-islands rewrite
    would double the sort passes, and a second exchange would mean the
    session key stopped riding the user partition."""
    df = Q["events_session_window_dynamic_gap"](spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = explain_str(df, "formatted")
    assert "MergingSessions" in plan


def test_rolling_median_is_joinless_and_day_keyed(spark, sf_dir):
    """The trailing-7-day window must be JOINLESS: each event explodes
    to its <= 7 covered anchor days (physical, bounded fan-out) and the
    window + aggregate key on the composite (user_id, day).  A
    regression to the old anchors-join spelling — equi-keyed on user
    alone with the day band as a residual — re-opens the hot-user
    quadratic hazard (|active_days_u| x |events_u| candidate pairs per
    user, un-splittable by AQE within one join key).  Pin both halves:
    zero joins anywhere in the plan, and the window partition spec
    carries the day next to the user."""
    df = Q["user_rolling_7d_median_value"](spark, sf_dir)
    assert join_strategies(df) == [], join_strategies(df)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # the explode IS the 7x fan-out
    # The one window exchange must hash on (user_id, day) — the day
    # riding the partition key is what makes a hot USER splittable
    # across his active days.
    assert re.search(
        r"hashpartitioning\(user_id[^)]*,\s*day", plan
    ), plan[:4000]


def test_subtree_rollup_is_single_pass_no_iteration(spark, sf_dir):
    """The bill-of-materials rollup must stay a ONE-PASS plan: the
    ancestor closure is a row-local explode (no iterative joins), so the
    whole query is bounded exchanges (revenue agg, closure distinct,
    final agg) and exactly one equi join back to the revenue frame."""
    df = Q["customer_subtree_revenue_rollup"](spark, sf_dir)
    strats = join_strategies(df)
    assert len(strats) == 1 and strats[0] in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
    ), strats
    assert count_exchanges(df) <= 4
    plan = explain_str(df, "formatted")
    assert "Generate" in plan  # the divisor explode is the closure


def test_exclude_current_row_windows_share_one_exchange(spark, sf_dir):
    """Both EXCLUDE-emulation windows (partition-wide peer sum and the
    ordered ±3 frame) must ride ONE hash exchange on the segment — the
    subtraction spelling costs zero extra shuffles over the frame sums
    Spark computes anyway.  A second exchange would mean a window
    stopped sharing the segment partitioning."""
    df = Q["customer_peer_balance_excl_self"](spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = explain_str(df, "formatted")
    assert plan.count("Window") >= 2


def test_cube_gid_is_expand_plus_partial_aggregate(spark, sf_dir):
    """The CUBE must plan as Expand (x4 strata, row-local) feeding a
    map-side PARTIAL aggregate below ONE exchange — the single-pass
    multi-stratum shape.  A plan with one exchange per stratum (4 scans)
    or no partial aggregate (all expanded rows shuffled raw) loses the
    property the docstring sells."""
    df = Q["order_status_priority_cube_gid"](spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = explain_str(df, "formatted")
    assert "Expand" in plan
    # partial-then-final: two HashAggregates around the one exchange
    assert plan.count("HashAggregate") >= 2


def test_cusum_shares_one_sort_and_exchange(spark, sf_dir):
    """The CUSUM closed form (prefix sum + running min + final agg) must
    ride ONE hash exchange on event_type with ONE partition-local sort
    shared by both running window functions — the plan property that
    makes the 'sequential' detector a single-pass operator.  A second
    exchange or sort means a window stopped sharing the frame."""
    df = Q["events_cusum_value_drift"](spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = explain_str(df, "formatted")
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1
    assert "Python" not in plan


def test_rank_sketch_operator_is_two_bounded_exchanges(spark):
    """rank_sketch_grouped's scale contract: the chunked bottom-k window
    (one data shuffle on (keys, chunk)) plus the k-bounded merge groupBy
    — exactly two exchanges, zero Python stages, no per-group driver
    loop (plan built before any job runs)."""
    from byte_convert_avro_spark.operators.sketch import rank_sketch_grouped

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, id long, v double")
    out = rank_sketch_grouped(df, ["g"], "v", "id", k=8, chunks=16)
    assert count_exchanges(out) <= 2
    plan = explain_str(out)
    assert "Window" in plan and "row_number" in plan
    # no Python EXECUTION stage (the createDataFrame source mentions
    # "applySchemaToPythonRDD", which is driver-side setup, not a stage)
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_row_pattern_match_is_one_user_shuffle(spark, sf_dir):
    """The MATCH_RECOGNIZE-style VIEW+ CLICK PURCHASE pattern must ride
    ONE window partitioning: every building block (row numbers, the two
    LEADs, the running island-start MAX) shares the (user_id) partition
    and (ts_us, event_id) sort, so the whole pattern match costs exactly
    one shuffle and one sort — a k-step pattern adds LEADs, never joins
    or extra exchanges."""
    for name in (
        "events_pattern_views_to_purchase",
        "events_pattern_view_alt_action_purchase",  # alternation adds a
        # predicate, not an exchange — same one-shuffle contract
        "events_pattern_bounded_views_within_7d",  # {m,n} quantifier +
        # WITHIN are a filter and a LEAST on the same chain (r14)
    ):
        df = Q[name](spark, sf_dir)
        assert join_strategies(df) == [], (name, join_strategies(df))
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        # exactly one exchange, hashed on user_id alone
        assert count_exchanges(df) == 1, (name, plan[:4000])
        assert re.search(r"hashpartitioning\(user_id", plan), (name, plan[:4000])
        # one sort order serves both window specs: no duplicate Sort on
        # the same child (two Sort nodes would mean the specs diverged)
        assert plan.count("Sort [") <= 2, (name, plan[:4000])


def test_reset_plan_stats_bounds_iterative_estimates(spark):
    """plans.reset_plan_stats must hold a self-joining checkpoint loop's
    size estimate CONSTANT: localCheckpoint preserves origin statistics,
    and a round that joins the fed-back frame against two frames derived
    from it SQUARES the estimate — after 8 rounds the raw loop's BigInt
    estimate is thousands of bits wide (and by ~20 rounds plan-stats
    computation alone dominates wall time), while the reset loop stays at
    the constant defaultSizeInBytes fallback.  Data must be identical
    through the reset."""
    import sys

    from pyspark.sql import functions as F

    from byte_convert_avro_spark.plans import reset_plan_stats

    # the raw loop's estimate grows past Python's default int-parse limit
    # (py4j converts the JVM BigInt through its decimal string) — itself
    # evidence of the pathology this test pins
    sys.set_int_max_str_digits(1_000_000)

    def stat_bits(df):
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ).bit_length()

    def one_round(frame, reset):
        derived_a = frame.select(F.col("v"), (F.col("x") + 1).alias("xa"))
        derived_b = frame.select(F.col("v"), (F.col("x") * 2).alias("xb"))
        nxt = (
            frame.join(derived_a, "v").join(derived_b, "v")
            .select("v", F.least("x", "xa", "xb").alias("x"))
            .localCheckpoint(eager=False)
        )
        return reset_plan_stats(nxt) if reset else nxt

    base = spark.range(100).select(
        F.col("id").alias("v"), F.col("id").alias("x")
    )
    raw = reset = base
    for _ in range(8):
        raw = one_round(raw, reset=False)
        reset = one_round(reset, reset=True)
    assert stat_bits(raw) > 500, stat_bits(raw)  # the squaring regime
    assert stat_bits(reset) < 128, stat_bits(reset)  # constant fallback
    # the reset is data-transparent
    assert sorted(r.x for r in reset.collect()) == sorted(
        r.x for r in raw.collect()
    )


def test_band_join_queries_no_nested_loop(spark, sf_dir):
    """The banded-inequality family's scale contract: Spark's native plan
    for ``v BETWEEN x - d AND x + d`` is BroadcastNestedLoopJoin
    (quadratic work); band_join's bucket rewrite must plan as an EQUI
    join on the bucket — no nested loop, no cartesian, at every SF,
    because the bucket column is a join KEY, not a filter."""
    for name in ("part_price_band_pairs", "customer_supplier_balance_band"):
        df = Q[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:3000])
        assert "CartesianProduct" not in plan, (name, plan[:3000])
        strategies = join_strategies(df)
        assert strategies, (name, plan[:3000])
        assert all(
            s in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
            for s in strategies
        ), (name, strategies)
        # exact-band verification stays partition-local: the bucket is
        # the only equi key, the band predicate a post-join condition
        assert re.search(r"_bb#\d+L?\]?,? ?= ?_bb2|_bb", plan), plan[:3000]


def test_skyline_queries_no_nested_loop(spark, sf_dir):
    """The skyline family's scale contract: the SQL spelling (NOT
    EXISTS dominance) is a quadratic anti-join; skyline_2d must plan as
    windows only — zero joins of any kind, no nested loop, no cartesian
    — with the bucket-prune stage visible as a window partitioned by
    the _bk hash bucket before the survivor pass."""
    for name in ("part_skyline_price_size", "part_skyline_per_brand"):
        df = Q[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:3000])
        assert "CartesianProduct" not in plan, (name, plan[:3000])
        assert not join_strategies(df), (name, join_strategies(df))
        assert plan.count("Window") >= 4, (name, plan[:3000])  # 2 per stage
        assert "_bk" in plan, (name, plan[:3000])


def test_hll_register_agg_is_partial(spark, sf_dir):
    """HLL's scale contract: the register build is ONE hash aggregate
    with a map-side partial (HashAggregate appears in partial+final
    pairs around a single exchange on the group keys) — state per key
    is <= 64 rows regardless of cardinality, and no DISTINCT expansion
    node appears anywhere in the register path."""
    df = Q["hll_distinct_users_by_type"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan, plan[:3000]
    # the exact_distinct referee is the only expand/distinct consumer;
    # the register path itself (reg, max(rho)) must not expand rows
    assert plan.count("Expand") <= 1, plan[:3000]


def test_prefix_filter_jaccard_join_keys_are_tokens(spark, sf_dir):
    """Prefix-filter Jaccard's scale contract: every join in the plan
    is an equi join (candidate generation on prefix tokens, verify on
    pair keys) — never a nested loop / cartesian, even though the
    semantic result is an all-pairs similarity predicate."""
    df = Q["docs_jaccard_prefix_filter_pairs"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]
    strategies = join_strategies(df)
    assert strategies, plan[:3000]
    assert all(
        s in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        for s in strategies
    ), strategies


def test_rank_join_truncates_below_the_join(spark, sf_dir):
    """Top-k rank join's scale contract: BOTH join inputs are
    window-rank-truncated BEFORE the join (candidates = |groups| x k^2
    regardless of table size), and the join itself is an equi join."""
    df = Q["rank_join_top10_pairs_by_balance"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 2, plan[:3000]
    strategies = join_strategies(df)
    assert strategies and all(
        s in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        for s in strategies
    ), strategies
    # the rank filter must sit between each window and the join
    assert plan.count("row_number") >= 2, plan[:3000]


def test_r14_similarity_joins_no_nested_loop(spark, sf_dir):
    """Round-14 similarity family scale contract: the FastSS edit-1
    join, the absolute-overlap join, and the capped Jaccard rung all
    express an all-pairs PREDICATE as equi joins only (variant /
    prefix-token / pair keys) — never a nested loop or cartesian; the
    cap adds windows on top of the pair stream, not joins."""
    for name in (
        "customer_name_edit1_fastss",
        "docs_overlap_containment_pairs",
        "docs_jaccard_prefix_filter_capped",
    ):
        df = Q[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:3000])
        assert "CartesianProduct" not in plan, (name, plan[:3000])
        strategies = join_strategies(df)
        assert strategies, (name, plan[:3000])
        assert all(
            s in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
            for s in strategies
        ), (name, strategies)
    # the capped rung's both-endpoint window is present
    plan = explain_str(Q["docs_jaccard_prefix_filter_capped"](spark, sf_dir), "formatted")
    assert "row_number" in plan, plan[:3000]


def test_r14_weighted_sample_one_window_no_join(spark, sf_dir):
    """Weighted bottom-k scale contract: expansion collapses via a
    partial MIN aggregate (HashAggregate pairs), then exactly one
    rank window per stratum — no join anywhere in the plan."""
    df = Q["lineitem_weighted_sample_by_flag"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert not join_strategies(df), join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan, plan[:3000]
    assert "row_number" in plan, plan[:3000]


def test_r14b_changepoint_two_exchanges_pruned(spark, sf_dir):
    """Offline changepoint scale contract: the three null filters reach
    the parquet scan, only (ts, event_type, value) load, and the whole
    detector is the daily-rollup exchange + one event_type window
    exchange — no joins anywhere."""
    df = Q["events_value_changepoint"](spark, sf_dir)
    pf = pushed_filters(df)["events"]
    assert any("IsNotNull(value)" in f for f in pf), pf
    assert any("IsNotNull(event_type)" in f for f in pf), pf
    assert set(read_schemas(df)["events"]) == {"ts", "event_type", "value"}
    assert count_exchanges(df) <= 2
    assert not join_strategies(df)


def test_r14b_bitscore_hash_joins_only(spark, sf_dir):
    """Bigram LM bit-score scale contract: corpus-count joins are equi
    (bigram / first-token keys), the ONLY nested loop is the deliberate
    1-row vocabulary broadcast, and the documents scan prunes to
    (doc_id, text)."""
    df = Q["doc_bigram_lm_bitscore"](spark, sf_dir)
    strats = join_strategies(df)
    assert strats.count("BroadcastNestedLoopJoin") == 1, strats
    assert all(
        s
        in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        for s in strats
    ), strats
    assert set(read_schemas(df)["documents"]) == {"doc_id", "text"}
    assert "CartesianProduct" not in explain_str(df, "formatted")


def test_r14b_mutual_knn_equi_mutuality(spark, sf_dir):
    """Mutual-kNN scale contract: the pair scan is the DELIBERATE
    broadcast nested loop over the bounded 5% sample (the IVF-blocked
    cell scan at deployment), but the mutuality check itself must stay
    an equi join — and the embeddings scan must prune the unused label
    column."""
    df = Q["mutual_knn_pairs"](spark, sf_dir)
    strats = join_strategies(df)
    assert "BroadcastNestedLoopJoin" in strats, strats
    assert any(
        s in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        for s in strats
    ), strats
    assert "CartesianProduct" not in explain_str(df, "formatted")
    assert set(read_schemas(df)["embeddings"]) == {"vec_id", "embedding"}


def test_r14b_trend_family_days_bounded_equi_joins(spark, sf_dir):
    """Trend/shape family scale contract: the quadratic object is the
    DAY-pair join keyed on event_type (equi join, inequality residual)
    — never a cartesian — and the events scan prunes to
    (ts, event_type, value)."""
    for name in (
        "events_theil_sen_daily_trend",
        "events_mann_kendall_trend",
        "events_isotonic_daily_value",
    ):
        df = Q[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, (name, plan[:2000])
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:2000])
        assert set(read_schemas(df)["events"]) == {"ts", "event_type", "value"}, name


def test_r14b_allen_histogram_residual_on_equi(spark, sf_dir):
    """Allen classification rides the same custkey-equi pair join as the
    overlap entry: no nested loop, no cartesian, classification is a
    projection CASE."""
    df = Q["order_interval_allen_histogram"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    strats = join_strategies(df)
    assert strats, plan[:2000]


# ---------------------------------------------------------------------------
# r14c: nonparametric association statistics + concentration indices.


def test_r14c_ks_domain_bounded_no_joins(spark, sf_dir):
    """KS scale contract: the two-type filter and the value null filter
    reach the parquet scan, only (event_type, value) load, and the only
    "join" is the deliberate 1-row totals broadcast — the cumulative
    stage runs on the distinct-cents DOMAIN, never on events."""
    df = Q["events_ks_view_purchase"](spark, sf_dir)
    pf = pushed_filters(df)["events"]
    assert any("event_type" in f and "In" in f for f in pf), pf
    # the In(...[list]) bracket truncates the helper's filter split, so
    # the null-filter pushdown is asserted on the raw plan text instead
    plan = explain_str(df, "formatted")
    assert re.search(r"PushedFilters: \[[^\n]*IsNotNull\(value\)", plan), pf
    assert set(read_schemas(df)["events"]) == {"event_type", "value"}
    strats = join_strategies(df)
    assert strats.count("BroadcastNestedLoopJoin") == 1, strats
    assert "CartesianProduct" not in explain_str(df, "formatted")


def test_r14c_kendall_days_bounded_equi_join(spark, sf_dir):
    """Kendall tau-b scale contract: the quadratic object is the
    DAY-pair self-join keyed on event_type (equi, inequality residual)
    — never a cartesian — and the events scan prunes to the three
    touched columns."""
    df = Q["events_kendall_daily_taub"](spark, sf_dir)
    strats = join_strategies(df)
    assert strats, explain_str(df, "formatted")[:2000]
    assert all(
        s in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        for s in strats
    ), strats
    assert "CartesianProduct" not in explain_str(df, "formatted")
    assert set(read_schemas(df)["events"]) == {"ts", "event_type", "value"}


def test_r14c_chi2_and_spearman_and_entropy_joinless(spark, sf_dir):
    """The chi-squared cells, Spearman, and entropy entries are pure
    aggregate/window pipelines: zero joins, scans pruned to exactly the
    touched columns."""
    cases = {
        "orders_priority_status_chi2_cells": (
            "orders", {"o_orderpriority", "o_orderstatus"}),
        "lineitem_spearman_qty_price": (
            "lineitem", {"l_returnflag", "l_quantity", "l_extendedprice"}),
        "events_user_type_entropy_bits": (
            "events", {"user_id", "event_type"}),
    }
    for name, (tbl, cols) in cases.items():
        df = Q[name](spark, sf_dir)
        assert not join_strategies(df), name
        assert set(read_schemas(df)[tbl]) == cols, name


def test_r14c_hhi_broadcasts_nation(spark, sf_dir):
    """HHI scale contract: nation is hint-broadcast, the orders->customer
    join is equi on the customer key, and both scans prune."""
    df = Q["nation_customer_order_hhi"](spark, sf_dir)
    strats = join_strategies(df)
    assert "BroadcastHashJoin" in strats, strats
    assert "CartesianProduct" not in explain_str(df, "formatted")
    assert set(read_schemas(df)["orders"]) == {"o_custkey"}
    assert set(read_schemas(df)["customer"]) == {"c_custkey", "c_nationkey"}


def test_r14c_zipf_joinless_pruned(spark, sf_dir):
    """Zipf fit scale contract: token counting + vocab-bounded rank +
    one 5-sum fold — zero joins; the documents scan loads only
    (doc_id, text)."""
    df = Q["corpus_zipf_loglog_slope"](spark, sf_dir)
    assert not join_strategies(df)
    assert set(read_schemas(df)["documents"]) == {"doc_id", "text"}


def test_r14c_psi_domain_bounded_broadcasts(spark, sf_dir):
    """PSI scale contract: the events pass is one pruned projection
    (ts, value); bounds and totals are the only nested-loop "joins"
    (1-row broadcasts); the bucket fill is an equi join on the literal
    0..9 frame."""
    df = Q["events_value_psi_halves"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    strats = join_strategies(df)
    # 1-row broadcasts only: bounds (appears twice — the totals branch
    # re-evaluates the counts subtree) + totals
    assert 2 <= strats.count("BroadcastNestedLoopJoin") <= 3, strats
    assert set(read_schemas(df)["events"]) == {"ts", "value"}


def test_r14c_jsd_vocab_bounded_hash_joins(spark, sf_dir):
    """JSD scale contract: the mixture fan-out is vocab x sources built
    from BROADCASTS of the 20-row per-source totals and 1-row corpus
    folds — the token-count joins stay hash-keyed, never cartesian —
    and the documents scan prunes to (doc_id, source, text)."""
    df = Q["source_token_jsd_vs_corpus"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in join_strategies(df)
    assert set(read_schemas(df)["documents"]) == {"doc_id", "source", "text"}


def test_r14c_hits_equi_rounds_pruned(spark, sf_dir):
    """HITS scale contract: all six round joins are equi joins on the
    endpoint keys (no nested loop anywhere — the integer spelling needs
    no fold-order machinery), and both scans prune to the two key
    columns."""
    df = Q["trade_hits_hub_authority"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    strats = join_strategies(df)
    assert len(strats) >= 7, strats  # edge build + 6 round joins
    assert set(read_schemas(df)["orders"]) == {"o_orderkey", "o_custkey"}
    assert set(read_schemas(df)["lineitem"]) == {"l_orderkey", "l_suppkey"}


def test_r14d_fs_linkage_variant_equi_broadcast_us(spark, sf_dir):
    """Fellegi-Sunter scale contract: candidates come from the FastSS
    VARIANT equi-join (never all-pairs — no cartesian), the three
    u-probability folds and N are 1-row broadcasts, and the customer
    scans prune to the four touched columns."""
    df = Q["customer_linkage_fs_weights"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    strats = join_strategies(df)
    # 4 1-row broadcast folds (N + three u's) ride as nested loops
    assert strats.count("BroadcastNestedLoopJoin") == 4, strats
    assert any(
        s in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        for s in strats
    ), strats
    # several customer scans exist (variant table, both pair sides, the
    # u folds) and read_schemas keeps only the last; assert pruning on
    # the raw plan instead: no scan loads the untouched acctbal column
    assert "c_acctbal" not in plan


def test_r14c_mw_and_qq_domain_bounded(spark, sf_dir):
    """Mann-Whitney and the QQ table must live on the distinct-value
    DOMAIN: pruned events scans, and no row-level global sort — the
    only ordered passes are the domain-bounded cumulative windows."""
    mw = Q["events_mannwhitney_view_purchase"](spark, sf_dir)
    assert set(read_schemas(mw)["events"]) == {"event_type", "value"}
    assert not join_strategies(mw)
    qq = Q["events_value_qq_deciles_halves"](spark, sf_dir)
    assert set(read_schemas(qq)["events"]) == {"ts", "value"}
    assert "CartesianProduct" not in explain_str(qq, "formatted")


def test_r14e_crosscorr_daily_rollup_before_lag_join(spark, sf_dir):
    """Lead-lag cross-correlation scale contract: the 7-lag self-join
    is an EQUI-join on the computed day key over the |days|-bounded
    daily rollup (the only nested loop is the 7-row lag literal
    broadcast), and the events scan prunes to (ts, event_type)."""
    df = Q["events_daily_crosscorr_view_purchase"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    strats = join_strategies(df)
    assert strats.count("BroadcastNestedLoopJoin") == 1, strats
    assert any(
        s in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        for s in strats
    ), strats
    assert set(read_schemas(df)["events"]) == {"ts", "event_type"}


def test_r14e_kruskal_domain_bounded_and_assortativity_pruned(
    spark, sf_dir
):
    """Kruskal-Wallis lives on the distinct (type, value) domain (the
    MW discipline): pruned events scan, no row-level join other than
    the 1-row totals broadcast.  Assortativity decorates the distinct
    edge list with two grouped degree tables — equi-joins only, scans
    pruned to the two key columns per table."""
    kw = Q["events_kruskal_wallis_cells"](spark, sf_dir)
    assert set(read_schemas(kw)["events"]) == {"event_type", "value"}
    plan = explain_str(kw, "formatted")
    assert "CartesianProduct" not in plan
    da = Q["trade_degree_assortativity"](spark, sf_dir)
    rs = read_schemas(da)
    assert set(rs["orders"]) == {"o_orderkey", "o_custkey"}
    assert set(rs["lineitem"]) == {"l_orderkey", "l_suppkey"}
    assert "CartesianProduct" not in explain_str(da, "formatted")
    assert all(
        s in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        for s in join_strategies(da)
    ), join_strategies(da)


def test_r14e_misra_gries_chunked_windows(spark, sf_dir):
    """Misra-Gries scale contract: the documents scan prunes to the
    text column, no cartesian product exists (the single-row n/missed
    folds ride as broadcast nested loops by design), and the domain
    window is CHUNK-partitioned — only the final <= chunks*k merge may
    run single-partition."""
    df = Q["token_misra_gries_vs_exact"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert set(read_schemas(df)["documents"]) == {"text"}
    # the level-1 window carries the chunk key in its partition spec
    assert "_ch" in plan


def test_r14e_bucketed_join_zero_exchange(spark, sf_dir):
    """Bucketed co-located join scale contract: both sides carry
    catalog bucketing on the join key, so the SortMergeJoin consumes
    the scans DIRECTLY — the only Exchange in the whole plan is the
    final 5-row segment rollup."""
    df = Q["bucketed_colocated_segment_revenue"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "SortMergeJoin" in plan, plan[:2000]
    # post-join exchanges exist (segment rollup + final sort) — the pin
    # is that NO exchange partitions on the JOIN key: bucketing already
    # satisfies the join's distribution requirement on both sides.
    import re

    assert not re.search(
        r"Exchange hashpartitioning\(o_custkey", plan
    ), plan[:3000]
    assert "CartesianProduct" not in plan


def test_r14e_feature_encoding_aggregation_first(spark, sf_dir):
    """Feature hashing reduces to the vocab domain before the 256-ary
    bucket rollup (documents scan pruned to text); target encoding is
    one grouped pass + a 1-row broadcast prior (orders scan pruned to
    the two touched columns)."""
    fh = Q["doc_feature_hashing_load"](spark, sf_dir)
    assert set(read_schemas(fh)["documents"]) == {"text"}
    assert "CartesianProduct" not in explain_str(fh, "formatted")
    te = Q["customer_target_encoding_smoothed"](spark, sf_dir)
    # two orders scans exist (per-customer groups + the 1-row prior,
    # which reads only o_totalprice) and read_schemas keeps the last;
    # assert pruning on the raw plan: no untouched column is read
    te_plan = explain_str(te, "formatted")
    for col in ("o_orderdate", "o_orderstatus", "o_orderpriority"):
        assert col not in te_plan
    assert "CartesianProduct" not in te_plan


def test_r14e_kappa_ig_domain_bounded(spark, sf_dir):
    """Kappa folds on the |labels| domain (documents scan pruned to the
    langid inputs); information gain never row-sorts — the only global
    window is the distinct-cents domain cumulative for the median pick,
    and the orders scan prunes to the four touched columns."""
    ka = Q["langid_cohens_kappa"](spark, sf_dir)
    assert "CartesianProduct" not in explain_str(ka, "formatted")
    ig = Q["orders_feature_information_gain"](spark, sf_dir)
    plan = explain_str(ig, "formatted")
    assert "CartesianProduct" not in plan
    for col in ("o_custkey", "o_orderkey"):
        assert col not in plan  # untouched columns stay unread


def test_r14e_rich_club_single_fold_and_pmi_vocab_bounded(spark, sf_dir):
    """Rich-club's thresholds ride ONE conditional-sum fold over the
    degree-decorated edge list (equi joins only, no threshold join);
    PMI's joins are keyed on the bigram vocabulary (first/second token
    marginals), documents scan pruned to (doc_id, text) or less."""
    rc = Q["copurchase_rich_club"](spark, sf_dir)
    plan = explain_str(rc, "formatted")
    assert "CartesianProduct" not in plan
    strats = join_strategies(rc)
    # the 1-row na x ea fold rides one broadcast nested loop
    assert strats.count("BroadcastNestedLoopJoin") == 1, strats
    assert all(
        s in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
              "BroadcastNestedLoopJoin")
        for s in strats
    ), strats
    pmi = Q["bigram_pmi_collocations"](spark, sf_dir)
    p2 = explain_str(pmi, "formatted")
    assert "CartesianProduct" not in p2
    assert set(read_schemas(pmi)["documents"]) <= {"doc_id", "text"}


def test_r14f_score_trio_domain_bounded(spark, sf_dir):
    """AUC / ROC / decile-lift scale contract: all three live on the
    distinct-cents score DOMAIN — events scans prune to (event_type,
    value), no cartesian product, no row-scale ntile window (the
    decile assignment is domain arithmetic), and every join is a
    broadcast (literal cutoffs / 1-row totals)."""
    for name in (
        "events_purchase_auc_rank_cells",
        "events_purchase_decile_lift",
        "events_purchase_roc_literal_thresholds",
        "events_purchase_ca_trend_cells",
    ):
        df = Q[name](spark, sf_dir)
        assert set(read_schemas(df)["events"]) == {"event_type", "value"}, name
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        assert "ntile" not in plan.lower(), name


def test_r14f_rowlocal_passes_have_no_joins(spark, sf_dir):
    """McNemar and Flesch are single row-local projections + folds:
    zero join strategies, scans pruned to the consumed columns."""
    mc = Q["langid_mcnemar_stopword_vs_conjunction"](spark, sf_dir)
    assert not join_strategies(mc)
    assert set(read_schemas(mc)["documents"]) == {"text", "lang"}
    fl = Q["doc_readability_flesch"](spark, sf_dir)
    assert not join_strategies(fl)
    assert set(read_schemas(fl)["documents"]) == {"doc_id", "text"}


def test_r14f_silhouette_scoring_joinless(spark, sf_dir):
    """Silhouette's scoring stage is a zero-join literal-argmin pass
    (the kmeans assignment shape): the returned plan contains no join
    at all — training happens in the already-pinned kmeans operator,
    not in the scoring query plan."""
    df = Q["kmeans_silhouette_simplified"](spark, sf_dir)
    assert not join_strategies(df)
    assert "CartesianProduct" not in explain_str(df, "formatted")


def test_r14f_db_cells_pair_join_broadcast(spark, sf_dir):
    """Davies-Bouldin's only non-equi join is the k-row centroid pair
    stage, which must stay a BROADCAST nested loop (k² = 64 rows), with
    the scatter fold and the s_i/s_j decorations as equi joins."""
    df = Q["kmeans_davies_bouldin_cells"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    strats = join_strategies(df)
    assert strats.count("BroadcastNestedLoopJoin") <= 1, strats


def test_r14f_edge_support_and_blocking_equi(spark, sf_dir):
    """Edge support rides the oriented-adjacency equi joins (no
    cartesian anywhere); blocking quality's hit join is equi on the
    pair ids and the candidate count never materializes a pair (no
    self-join of customer against itself in the plan)."""
    es = Q["copurchase_edge_support_hist"](spark, sf_dir)
    plan = explain_str(es, "formatted")
    assert "CartesianProduct" not in plan
    bq = Q["customer_blocking_quality_profile"](spark, sf_dir)
    assert "CartesianProduct" not in explain_str(bq, "formatted")


# ---------------------------------------------------------------------------
# Round-14g plan pins


def test_r14g_variance_tests_domain_bounded(spark, sf_dir):
    """ANOVA / Brown-Forsythe scale contract: the events scan prunes to
    (event_type, value); everything after the first aggregation lives
    on the |event types| (or per-type value DOMAIN) — no cartesian
    product, no row-scale window."""
    from byte_convert_avro_spark.plans.inspect import read_schemas

    for name in (
        "events_value_anova_cells",
        "events_value_brown_forsythe_cells",
    ):
        df = Q[name](spark, sf_dir)
        assert set(read_schemas(df)["events"]) == {"event_type", "value"}, name
        assert "CartesianProduct" not in explain_str(df, "formatted"), name


def test_r14g_privacy_and_calibration_domain_bounded(spark, sf_dir):
    """t-closeness lives on the |classes| x |sens buckets| grid after
    two domain-sized groupBys; ECE on the customer domain then <=21
    bins.  Scans prune to the consumed columns; no cartesian."""
    from byte_convert_avro_spark.plans.inspect import read_schemas

    tc = Q["orders_t_closeness_profile"](spark, sf_dir)
    # several differently-pruned scans of orders exist (the sens-domain
    # scan needs only o_totalprice); read_schemas reports one of them —
    # every scan must stay within the four consumed columns.
    assert set(read_schemas(tc)["orders"]) <= {
        "o_orderpriority",
        "o_orderstatus",
        "o_orderdate",
        "o_totalprice",
    }
    assert "CartesianProduct" not in explain_str(tc, "formatted")
    ece = Q["orders_calibration_ece"](spark, sf_dir)
    assert set(read_schemas(ece)["orders"]) <= {"o_custkey", "o_totalprice"}
    assert "CartesianProduct" not in explain_str(ece, "formatted")


def test_r14g_count_sketch_probe_broadcast(spark, sf_dir):
    """The count-sketch probe stage must be a broadcast join against
    the d*w-cell matrix (never a shuffle of the probe side), and the
    whole plan carries no cartesian product."""
    from byte_convert_avro_spark.plans.inspect import join_strategies

    df = Q["token_count_sketch_vs_exact"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in join_strategies(df)


def test_r14g_semdedup_joins_equi_only(spark, sf_dir):
    """SemDeDup's assignment is row-local (literal centroid trees); the
    pair stage is an EQUI self-join on the cell id with the id ordering
    as a post-filter — no cartesian, no broadcast nested loop, and the
    embeddings scan prunes to (vec_id, embedding)."""
    from byte_convert_avro_spark.plans.inspect import (
        join_strategies,
        read_schemas,
    )

    df = Q["semdedup_prune_flags"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in join_strategies(df)
    assert set(read_schemas(df)["embeddings"]) == {"vec_id", "embedding"}


def test_r14g_bradley_terry_rounds_broadcast(spark, sf_dir):
    """Every MM round re-joins the 25-row strength frame onto the edge
    table as a BROADCAST (two per round + the W_i decoration: >= 6
    broadcast hash joins), and no stage is a cartesian product."""
    from byte_convert_avro_spark.plans.inspect import join_strategies

    df = Q["brand_bradley_terry_strength"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    strats = join_strategies(df)
    assert strats.count("BroadcastHashJoin") >= 6, strats


def test_r14g_hilbert_rowlocal_until_rollup(spark, sf_dir):
    """The Hilbert/Morton index chains are row-local integer selects:
    the only join in the plan is the broadcast of the 1-row min/max
    stats block, and the orders scan prunes to the three consumed
    columns."""
    from byte_convert_avro_spark.plans.inspect import (
        join_strategies,
        read_schemas,
    )

    df = Q["hilbert_layout_effectiveness"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    # the 1-row stats broadcast appears once per union branch (Catalyst
    # does not share the subplan): every join must be that broadcast.
    strats = join_strategies(df)
    assert len(strats) <= 3, strats
    assert all(s.startswith("Broadcast") for s in strats), strats
    # Catalyst prunes o_orderkey entirely (the per-file rollup only
    # consumes cb/db) — the scan must not exceed the three source cols.
    assert {"o_custkey", "o_orderdate"} <= set(read_schemas(df)["orders"]) <= {
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
    }
