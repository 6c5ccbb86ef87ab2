"""Round-12 additions: the LPA community gate, SQL:2003 ordered-set /
hypothetical-set aggregates, and a MATCH_RECOGNIZE-style row-pattern
query.

Three fresh families, each following the established asymmetric-pin
discipline (both engines compute the same pinned values through
*different* spellings, so shared-literal blind spots cannot hide):

- ``copurchase_communities_lpa`` closes the round-11 verdict's one weak
  item: ``operators/graph.label_propagation_rounds`` gets its registry
  query and CTE-unrolled deterministic oracle (smallest-label tie rule),
  joining pagerank/k-core/BFS/Bellman-Ford in the bounded-round graph
  family.
- Hypothetical-set aggregates (``rank(x) WITHIN GROUP``, SQL:2003
  T612): NEITHER engine ships the native syntax (DuckDB 1.0.0 raises
  'Unknown ordered aggregate "rank"' — probed this round; Spark has no
  WITHIN GROUP at all), so the pin is maximally asymmetric: Spark runs
  the genuine INSERT-AND-RANK spelling (union one sentinel row per
  group, window-rank the union, read the sentinel's rank/dense_rank/
  percent_rank/cume_dist), while the oracle spells the SQL:2003 closed
  forms (rank = 1 + count(v < h), dense_rank = 1 + count(distinct
  v < h), percent_rank = count(v < h)/n, cume_dist = (count(v <= h)+1)/
  (n+1)).  Value-identical by the standard's own definition — which is
  exactly what the gate proves.
- ``events_pattern_views_to_purchase`` generalizes the gaps-and-islands
  / funnel family to row-pattern matching: the MATCH_RECOGNIZE pattern
  ``VIEW+ CLICK PURCHASE`` (greedy quantifier, AFTER MATCH SKIP PAST
  LAST ROW) spelled as ONE window pass — both engines run the same
  island/lead chain, one shuffle on the partition key (plan-pinned in
  tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import cents, register, t


# ---------------------------------------------------------------------------
_LPA_ROUND = """
    , v{r} AS (
      SELECT e.b AS n, l.lbl, COUNT(*) AS c
      FROM l{p} l JOIN e ON e.a = l.n
      GROUP BY 1, 2
    ), l{r} AS MATERIALIZED (
      SELECT n, MIN(lbl) AS lbl FROM (
        SELECT n, lbl, c, MAX(c) OVER (PARTITION BY n) AS mc FROM v{r}
      ) WHERE c = mc GROUP BY n
    )"""


@register(
    "copurchase_communities_lpa",
    """
    WITH os AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
    ), dir_e AS MATERIALIZED (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM os a JOIN os b ON b.ok = a.ok AND a.p < b.p
    ), e AS MATERIALIZED (
      SELECT a, b FROM dir_e UNION ALL SELECT b AS a, a AS b FROM dir_e
    ), l0 AS MATERIALIZED (
      SELECT DISTINCT a AS n, a AS lbl FROM e
    )"""
    + _LPA_ROUND.format(r=1, p=0)
    + _LPA_ROUND.format(r=2, p=1)
    + _LPA_ROUND.format(r=3, p=2)
    + """
    SELECT lbl AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(n) AS BIGINT) AS min_member,
           CAST(SUM(n) AS BIGINT) AS sum_members
    FROM l3 GROUP BY lbl
    """,
)
def copurchase_communities_lpa(spark: SparkSession, sf: str):
    """LABEL PROPAGATION COMMUNITIES on the part co-purchase graph
    (parts sharing an order are adjacent — the triangle-count query's
    graph), 3 synchronous sweeps — the gate for
    ``operators/graph.label_propagation_rounds``, closing the round-11
    orphan: LPA joins pagerank/k-core/BFS/Bellman-Ford in the
    bounded-round graph family, finding *densely linked* node classes
    where connected components finds mere reachability.

    Determinism is the whole design: classic LPA breaks ties randomly;
    ours pins ties toward the SMALLEST label (argmax on (count, -label)
    in Spark, ``c = max(c) per node THEN min(lbl)`` in the oracle's
    unrolled CTE chain — one CTE pair per sweep, multiply-referenced
    CTEs MATERIALIZED per the DuckDB re-inline lesson), so both engines
    walk the identical label trajectory and the per-community rollup
    (size, min member, member-id sum — the sum feeds every node's final
    label into the hash while keeping rows community-sized) matches
    bit-for-bit.

    Scale: per sweep ONE shuffle join flowing labels across edges + one
    (node, label) count + a node-sized argmax; label state is node-sized
    and localCheckpointed (O(1) lineage).  The oracle's triple unroll is
    the toy-scale referee; the operator runs any round budget."""
    from byte_convert_avro_spark.operators.graph import label_propagation_rounds

    li = t(spark, sf, "lineitem")
    os_ = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    b = os_.select(F.col("ok"), F.col("p").alias("p2"))
    edges = (
        os_.join(b, "ok")
        .filter(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
    )
    labels = label_propagation_rounds(edges, rounds=3)
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count("*").cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_member"),
        F.sum("node").cast("long").alias("sum_members"),
    )


# ---------------------------------------------------------------------------
def _hypothetical_insert_and_rank(
    rows, group: str, value: str, hyp: int
):
    """The INSERT-AND-RANK spelling of SQL:2003 hypothetical-set
    aggregates: union ONE sentinel row carrying the hypothetical value
    into each group, window-rank the union on the value, and read the
    four rank statistics off the sentinel row.  rank() resolves a
    sentinel tied with real rows to 1 + count(strictly less) — exactly
    the standard's definition — and the union has n+1 rows, so
    percent_rank/cume_dist denominators come out as n and n+1 with no
    adjustment.  One shuffle (the window partition); the sentinel frame
    is group-count-sized."""
    base = rows.select(
        F.col(group).alias("grp"),
        F.col(value).alias("v"),
        F.lit(False).alias("__h"),
    )
    sentinels = (
        base.select("grp")
        .distinct()
        .select(
            "grp",
            F.lit(hyp).cast("long").alias("v"),
            F.lit(True).alias("__h"),
        )
    )
    u = base.unionByName(sentinels)
    # Sentinel-last within a value tie would not change rank/dense_rank
    # (both read the tie group's shared value), but keep the orderBy on
    # the value alone so the window is exactly the standard's ORDER BY.
    w = W.partitionBy("grp").orderBy("v")
    wp = W.partitionBy("grp")
    return (
        u.select(
            "grp",
            "__h",
            F.rank().over(w).alias("hyp_rank"),
            F.dense_rank().over(w).alias("hyp_dense_rank"),
            F.percent_rank().over(w).alias("hyp_percent_rank"),
            F.cume_dist().over(w).alias("hyp_cume_dist"),
            (F.count("*").over(wp) - 1).alias("n_rows"),
        )
        .filter(F.col("__h"))
        .select(
            "grp",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("hyp_rank").cast("long").alias("hyp_rank"),
            F.col("hyp_dense_rank").cast("long").alias("hyp_dense_rank"),
            "hyp_percent_rank",
            "hyp_cume_dist",
        )
    )


_HYP_CLOSED_FORM = """
    SELECT {group_out} AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 + SUM(CASE WHEN v < {h} THEN 1 ELSE 0 END) AS BIGINT)
             AS hyp_rank,
           CAST(1 + COUNT(DISTINCT CASE WHEN v < {h} THEN v END) AS BIGINT)
             AS hyp_dense_rank,
           CAST(SUM(CASE WHEN v < {h} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS hyp_percent_rank,
           CAST(SUM(CASE WHEN v <= {h} THEN 1 ELSE 0 END) + 1 AS DOUBLE)
             / (COUNT(*) + 1) AS hyp_cume_dist
    FROM {src}
    GROUP BY 1
"""


@register(
    "hypothetical_rank_order_value",
    _HYP_CLOSED_FORM.format(
        group_out="o_orderpriority",
        h=15_000_000,
        src="(SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders)",
    ),
)
def hypothetical_rank_order_value(spark: SparkSession, sf: str):
    """HYPOTHETICAL-SET AGGREGATES (SQL:2003 T612): per order priority,
    the rank / dense_rank / percent_rank / cume_dist a hypothetical
    $150,000.00 order would hold among the group's order values — "where
    would this quote land?", the ranking twin of a percentile lookup.

    Neither engine ships ``rank(x) WITHIN GROUP (ORDER BY v)`` (DuckDB
    1.0.0: 'Unknown ordered aggregate' — probed; Spark: no WITHIN GROUP
    clause), so the gate pins the two standard-equivalent spellings
    against each other: Spark INSERTS one sentinel row per group and
    window-ranks the union (rank() resolves the sentinel's tie group to
    1 + count(strictly less) — the standard's rule — and the n+1-row
    union makes percent_rank/cume_dist denominators n and n+1 for
    free); the oracle computes the closed forms (1 + count(v < h),
    1 + count(distinct v < h), count(v < h)/n, (count(v <= h)+1)/(n+1)).
    Both divisions are one exact-int-over-exact-int double op, so even
    the ratios match bitwise.

    Scale: the union adds |groups| rows; one window shuffle on the
    group key.  The closed form is also the 100 TB spelling (a single
    aggregation, no sort) — the insert-and-rank side exists to prove
    the migration-path equivalence a WITHIN GROUP user needs."""
    o = t(spark, sf, "orders").select(
        "o_orderpriority", cents("o_totalprice").alias("v")
    )
    return _hypothetical_insert_and_rank(o, "o_orderpriority", "v", 15_000_000)


@register(
    "hypothetical_rank_lineitem_quantity",
    _HYP_CLOSED_FORM.format(
        group_out="l_returnflag",
        h=25,
        src="(SELECT l_returnflag,"
        " CAST(l_quantity AS BIGINT) AS v FROM lineitem)",
    ),
)
def hypothetical_rank_lineitem_quantity(spark: SparkSession, sf: str):
    """HYPOTHETICAL-SET AGGREGATES, tie-dense regime: per return flag,
    where a hypothetical quantity of 25 would rank among lineitem
    quantities — integers 1..50, so EVERY value ties thousands of times
    and the four statistics genuinely diverge (rank jumps by tie-group
    sizes while dense_rank counts distinct values; cume_dist counts the
    whole tie group the sentinel joins).  This is the companion pin to
    ``hypothetical_rank_order_value``'s near-unique regime: the
    insert-and-rank spelling's tie handling (rank() gives the sentinel
    the tie group's MINIMUM rank; cume_dist counts every row <= h plus
    the sentinel itself) is exactly the SQL:2003 closed form, proven on
    the distribution where ties dominate.  Same asymmetric spelling and
    scale notes as the order-value pin."""
    li = t(spark, sf, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    return _hypothetical_insert_and_rank(li, "l_returnflag", "v", 25)


# ---------------------------------------------------------------------------
@register(
    "events_pattern_views_to_purchase",
    """
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
             CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT) AS val_c
      FROM events WHERE user_id IS NOT NULL
    ), seq AS (
      SELECT user_id, event_id, ts_us, event_type,
             ROW_NUMBER() OVER w AS rn,
             LEAD(event_type, 1) OVER w AS n1,
             LEAD(event_type, 2) OVER w AS n2,
             LEAD(ts_us, 2) OVER w AS p_ts_us,
             LEAD(val_c, 2) OVER w AS p_val_c,
             CASE WHEN event_type = 'view'
                   AND COALESCE(LAG(event_type) OVER w, '') <> 'view'
                  THEN 1 ELSE 0 END AS mstart
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), runs AS (
      SELECT user_id, ts_us, event_type, rn, n1, n2, p_ts_us, p_val_c,
             MAX(CASE WHEN mstart = 1 THEN rn END) OVER wr AS run_start_rn,
             MAX(CASE WHEN mstart = 1 THEN ts_us END) OVER wr AS run_start_us
      FROM seq
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(run_start_us AS BIGINT) AS match_start_us,
           CAST(rn - run_start_rn + 1 AS BIGINT) AS n_views,
           CAST(p_ts_us AS BIGINT) AS purchase_ts_us,
           p_val_c AS purchase_value_c
    FROM runs
    WHERE event_type = 'view' AND n1 = 'click' AND n2 = 'purchase'
    """,
)
def events_pattern_views_to_purchase(spark: SparkSession, sf: str):
    """ROW-PATTERN MATCHING (MATCH_RECOGNIZE-style): per user in
    event-time order, every match of the pattern ``VIEW+ CLICK
    PURCHASE`` — one or more consecutive views, then a click, then a
    purchase, with greedy quantifier and AFTER MATCH SKIP PAST LAST ROW
    semantics.  The generalization of the gaps-and-islands / funnel
    family: islands give the V+ run (maximal by construction, which IS
    the greedy quantifier — the run cannot extend left or right), and
    two LEADs give the C P suffix; matches from distinct view runs
    consume disjoint rows, which IS skip-past-last-row.  Emits one row
    per match: match start, view count, purchase time + value (cents).

    Neither engine ships MATCH_RECOGNIZE (Spark has none; DuckDB 1.0.0
    none), so both run the same window-chain spelling — the pin here is
    the PLAN, not the dialect: everything (row numbers, leads, the
    running island-start MAX) rides one window partition on ``user_id``
    with one sort, so the whole pattern match is ONE shuffle
    (plan-pinned in tests/test_plans.py).  Tie-break (ts_us, event_id)
    pins row order cross-engine.

    Scale: state per user is the sort run — no self-joins, no
    pattern-length blowup (a k-step pattern is k LEADs in the same
    window); the 100 TB shape is exactly this plan with event-time
    bucketing if single users outgrow a partition (they don't: per-user
    volume is physically bounded, see SCALE.md sessions note)."""
    ev = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr("ts DIV 1000").alias("ts_us"),
            "event_type",
            cents(F.coalesce(F.col("value"), F.lit(0.0))).alias("val_c"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    wr = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    is_start = (F.col("event_type") == "view") & (
        F.coalesce(F.lag("event_type").over(w), F.lit("")) != "view"
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type", 1).over(w).alias("n1"),
        F.lead("event_type", 2).over(w).alias("n2"),
        F.lead("ts_us", 2).over(w).alias("p_ts_us"),
        F.lead("val_c", 2).over(w).alias("p_val_c"),
        is_start.alias("mstart"),
    )
    runs = seq.select(
        "user_id",
        "event_type",
        "rn",
        "n1",
        "n2",
        "p_ts_us",
        "p_val_c",
        F.max(F.when(F.col("mstart"), F.col("rn"))).over(wr).alias(
            "run_start_rn"
        ),
        F.max(F.when(F.col("mstart"), F.col("ts_us"))).over(wr).alias(
            "run_start_us"
        ),
    )
    return runs.filter(
        (F.col("event_type") == "view")
        & (F.col("n1") == "click")
        & (F.col("n2") == "purchase")
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("run_start_us").cast("long").alias("match_start_us"),
        (F.col("rn") - F.col("run_start_rn") + 1)
        .cast("long")
        .alias("n_views"),
        F.col("p_ts_us").cast("long").alias("purchase_ts_us"),
        "p_val_c",
    ).withColumnRenamed("p_val_c", "purchase_value_c")


# ---------------------------------------------------------------------------
@register(
    "mode_quantity_by_flag_status",
    """
    WITH q AS (
      SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS v
      FROM lineitem
    ), cnt AS (
      SELECT l_returnflag, l_linestatus, v, COUNT(*) AS c
      FROM q GROUP BY 1, 2, 3
    ), best AS (
      SELECT l_returnflag, l_linestatus, v, c,
             MAX(c) OVER (PARTITION BY l_returnflag, l_linestatus) AS mc
      FROM cnt
    )
    SELECT l_returnflag, l_linestatus,
           CAST(MIN(v) AS BIGINT) AS modal_quantity,
           CAST(MAX(c) AS BIGINT) AS modal_count
    FROM best WHERE c = mc
    GROUP BY 1, 2
    """,
)
def mode_quantity_by_flag_status(spark: SparkSession, sf: str):
    """DETERMINISTIC MODE (ordered-set ``mode() WITHIN GROUP`` family):
    per (returnflag, linestatus), the most frequent lineitem quantity —
    ties broken toward the SMALLEST value, the pin that makes mode
    oracle-checkable at all (both engines' native ``mode()`` leave ties
    engine-defined, so NEITHER side uses it: Spark runs a count + one
    ``max(struct(count, -value))`` argmax — the LPA vote rule applied to
    an aggregate — and the oracle keeps the max-count rows and takes
    MIN(v)).  Quantities are uniform integers 1..50, so real ties occur
    at every scale factor and the tie rule is actually load-bearing.

    Scale: two map-side-combinable aggregations (value counts, then a
    per-group argmax over <= |distinct values| rows) — no sort, no
    window over the raw rows; the intermediate is (groups x 50) rows at
    any data size."""
    q = t(spark, sf, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("v"),
    )
    cnt = q.groupBy("l_returnflag", "l_linestatus", "v").agg(
        F.count("*").alias("c")
    )
    best = F.max(
        F.struct(F.col("c").alias("c"), (-F.col("v")).alias("nv"))
    ).alias("__m")
    return (
        cnt.groupBy("l_returnflag", "l_linestatus")
        .agg(best)
        .select(
            "l_returnflag",
            "l_linestatus",
            (-F.col("__m.nv")).cast("long").alias("modal_quantity"),
            F.col("__m.c").cast("long").alias("modal_count"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "order_value_percentile_cont",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           quantile_cont(v, 0.25) AS p25,
           quantile_cont(v, 0.5)  AS p50,
           quantile_cont(v, 0.9)  AS p90,
           quantile_cont(v, 0.99) AS p99
    FROM (SELECT o_orderpriority,
                 CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
          FROM orders)
    GROUP BY o_orderpriority
    """,
)
def order_value_percentile_cont(spark: SparkSession, sf: str):
    """PERCENTILE_CONT — the INTERPOLATED ordered-set aggregate, closing
    the family next to the exact-rank disc duals
    (order_price_percentiles), the deterministic mode, and this round's
    hypothetical-set pins: per order priority, the 25/50/90/99th
    interpolated percentiles of order value in cents.

    Unlike every other float-adjacent query in the registry this pin is
    SYMMETRIC: Spark's exact ``percentile(v, q)`` and DuckDB's
    ``quantile_cont`` implement the identical SQL convention — position
    ``q*(n-1)`` over the sorted values, linear interpolation
    ``lo + (hi - lo) * frac`` — and with exact-integer cent inputs every
    intermediate double is produced by the same IEEE operation sequence,
    so the results match BITWISE (probed on all four quantiles across
    all five groups before registering; the r11b percentile work had
    assumed interpolation was unpinnable and shipped rank-exact duals
    instead — both rungs now exist, and a PERCENTILE_CONT user migrating
    SQL knows the values carry over exactly).

    Scale: Spark's exact percentile is a sort-based aggregate whose
    per-group state is the value multiset — the toy-scale/interactive
    rung; at 100 TB use the mergeable rank sketch
    (order_value_rank_sketch_vs_exact) whose error curve is measured, or
    percentile_approx.  The contrast is the point: exact-cont for
    dialect parity, sketch for scale."""
    o = t(spark, sf, "orders").select(
        "o_orderpriority", cents("o_totalprice").alias("v")
    )
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr("percentile(v, 0.25D)").alias("p25"),
        F.expr("percentile(v, 0.5D)").alias("p50"),
        F.expr("percentile(v, 0.9D)").alias("p90"),
        F.expr("percentile(v, 0.99D)").alias("p99"),
    )


# ---------------------------------------------------------------------------
@register(
    "part_price_w_pattern",
    """
    WITH s AS (
      SELECT l_partkey AS p,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
             ROW_NUMBER() OVER w AS rn,
             LAG(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) OVER w AS pv
      FROM lineitem
      WINDOW w AS (PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
    ), st AS (
      SELECT p, rn, v, pv,
             CASE WHEN v > pv THEN 'U' WHEN v < pv THEN 'D' ELSE '=' END AS sgn
      FROM s WHERE pv IS NOT NULL
    ), mk AS (
      SELECT p, rn, v, sgn,
             CASE WHEN sgn = LAG(sgn) OVER (PARTITION BY p ORDER BY rn)
                  THEN 0 ELSE 1 END AS chg
      FROM st
    ), isl AS (
      SELECT p, rn, v, sgn,
             SUM(chg) OVER (PARTITION BY p ORDER BY rn
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run_id
      FROM mk
    ), runs AS (
      SELECT p, run_id, MIN(sgn) AS sgn,
             arg_max(v, rn) AS end_v
      FROM isl GROUP BY p, run_id
    ), wm AS (
      SELECT p, sgn,
             LEAD(sgn, 1) OVER w3 AS s1,
             LEAD(sgn, 2) OVER w3 AS s2,
             LEAD(sgn, 3) OVER w3 AS s3,
             end_v AS b1,
             LEAD(end_v, 1) OVER w3 AS peak,
             LEAD(end_v, 2) OVER w3 AS b2
      FROM runs WINDOW w3 AS (PARTITION BY p ORDER BY run_id)
    )
    SELECT p AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_w,
           CAST(SUM(LEAST(peak - b1, peak - b2)) AS BIGINT) AS sum_depth_c,
           CAST(MAX(LEAST(peak - b1, peak - b2)) AS BIGINT) AS max_depth_c
    FROM wm WHERE sgn = 'D' AND s1 = 'U' AND s2 = 'D' AND s3 = 'U'
    GROUP BY p
    """,
)
def part_price_w_pattern(spark: SparkSession, sf: str):
    """ROW-PATTERN MATCHING over NUMERIC DIRECTION RUNS — the W-shaped
    price pattern (``DOWN+ UP+ DOWN+ UP+`` on per-part lineitem prices
    in ship order), the classic MATCH_RECOGNIZE showcase, here with
    AFTER MATCH SKIP TO NEXT ROW semantics (every W reported, overlap
    allowed) — the complement of events_pattern_views_to_purchase's
    maximal-island SKIP PAST LAST ROW.  Where the funnel pattern tests
    row TYPE equality, this one defines its pattern variables by a
    NUMERIC predicate on consecutive rows (strictly falling / strictly
    rising steps; equal prices are '=' runs that correctly break any W).

    Spelling: steps (lag), sign runs (gaps-and-islands over the sign
    sequence), one run-level window of three LEADs — a k-leg pattern is
    k LEADs over the RUNS frame, which is already |runs| << |rows|.
    Per-part rollup (W count, summed and maximal W depth in exact
    cents; depth = the shallower recovery of the two dips, the
    double-bottom trader's number) keeps output part-sized.  All
    arithmetic exact int64; max_by/arg_max on the unique step row
    number pins run endpoints cross-engine.

    Scale: two window partitions on the same key (steps, then runs) +
    one (p, run_id) agg between them — run detection never leaves the
    part's partition, and the runs frame the pattern window scans is
    sign-compressed (bounded by the step count, typically far smaller).
    A hot part is splittable by date-bucketing the same composite-key
    way as the rolling-median respell."""
    li = t(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("p"),
        cents("l_extendedprice").alias("v"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = W.partitionBy("p").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    s = li.select(
        "p",
        "v",
        F.row_number().over(w).alias("rn"),
        F.lag("v").over(w).alias("pv"),
    ).filter(F.col("pv").isNotNull())
    sgn = (
        F.when(F.col("v") > F.col("pv"), "U")
        .when(F.col("v") < F.col("pv"), "D")
        .otherwise("=")
    )
    w2 = W.partitionBy("p").orderBy("rn")
    st = s.select("p", "rn", "v", sgn.alias("sgn"))
    isl = st.select(
        "p",
        "rn",
        "v",
        "sgn",
        F.sum(
            F.when(F.col("sgn") == F.lag("sgn").over(w2), 0).otherwise(1)
        )
        .over(w2.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"),
    )
    runs = isl.groupBy("p", "run_id").agg(
        F.min("sgn").alias("sgn"),
        F.expr("max_by(v, rn)").alias("end_v"),
    )
    w3 = W.partitionBy("p").orderBy("run_id")
    wm = runs.select(
        "p",
        "sgn",
        F.lead("sgn", 1).over(w3).alias("s1"),
        F.lead("sgn", 2).over(w3).alias("s2"),
        F.lead("sgn", 3).over(w3).alias("s3"),
        F.col("end_v").alias("b1"),
        F.lead("end_v", 1).over(w3).alias("peak"),
        F.lead("end_v", 2).over(w3).alias("b2"),
    )
    depth = F.least(F.col("peak") - F.col("b1"), F.col("peak") - F.col("b2"))
    return (
        wm.filter(
            (F.col("sgn") == "D")
            & (F.col("s1") == "U")
            & (F.col("s2") == "D")
            & (F.col("s3") == "U")
        )
        .groupBy(F.col("p").alias("partkey"))
        .agg(
            F.count("*").cast("long").alias("n_w"),
            F.sum(depth).cast("long").alias("sum_depth_c"),
            F.max(depth).cast("long").alias("max_depth_c"),
        )
    )
