"""Round-11 relational additions.

The round-10 verdict's backlog shapes: the mergeable rank/quantile
sketch query (``operators/sketch.rank_sketch_grouped`` — the missing
rung of the percentile escalation path, with exact-vs-estimate error
columns under the oracle gate), the embeddings data-quality
expectations that make the zero-norm crash-loud contract CHECKABLE,
and the fresh driver-sample window shapes — three ASYMMETRIC
cross-engine pins where DuckDB runs a native SQL feature Spark lacks
and the Spark spelling must derive identical values: EXCLUDE CURRENT
ROW (subtraction), DISTINCT window aggregates (size(collect_set)),
and INTERVAL RANGE frames (integer epoch-day rangeBetween) — plus
``grouping_id()`` bit patterns over CUBE.  (The streaming twin of the
rank sketch lives in ``streaming_queries.py``.)

Same contract as every other query module: each entry is registered
with a DuckDB oracle and the cross-engine determinism discipline from
``base.py`` (exact-integer cores, e-notation float literals, explicit
tie-break keys, aliases matching both engines).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import dsum, register, t


# ---------------------------------------------------------------------------
@register(
    "order_value_rank_sketch_vs_exact",
    """
    WITH o AS (
      SELECT o_orderpriority AS priority, o_orderkey AS id,
             o_totalprice AS v
      FROM orders
    ), hk AS (
      SELECT priority, id, v,
             ('0x' || substr(md5(CAST(id AS VARCHAR) || ':rs'), 1, 13))::BIGINT AS hv
      FROM o
    ), smp AS (
      SELECT priority, v,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY hv, CAST(id AS VARCHAR)) AS rn
      FROM hk
    ), kept AS (
      SELECT priority, v FROM smp WHERE rn <= 128
    ), sks AS (
      SELECT priority, v,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY v) AS vr,
             COUNT(*) OVER (PARTITION BY priority) AS ku
      FROM kept
    ), est AS (
      SELECT priority, MAX(ku) AS k_used,
             MAX(CASE WHEN vr = GREATEST(1, (1 * ku + 1) // 2)
                      THEN v END) AS p50_est,
             MAX(CASE WHEN vr = GREATEST(1, (9 * ku + 9) // 10)
                      THEN v END) AS p90_est
      FROM sks GROUP BY priority
    ), ex AS (
      SELECT priority, v,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY v, CAST(id AS VARCHAR)) AS vr,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM o
    ), exq AS (
      SELECT priority, MAX(n) AS n_rows,
             MAX(CASE WHEN vr = GREATEST(1, (1 * n + 1) // 2)
                      THEN v END) AS p50_exact,
             MAX(CASE WHEN vr = GREATEST(1, (9 * n + 9) // 10)
                      THEN v END) AS p90_exact
      FROM ex GROUP BY priority
    ), er AS (
      SELECT o.priority,
             CAST(SUM(CASE WHEN o.v <= e.p50_est THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) AS fle50,
             CAST(SUM(CASE WHEN o.v <= e.p90_est THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) AS fle90
      FROM o JOIN est e ON e.priority = o.priority
      GROUP BY o.priority
    )
    SELECT q.priority, q.n_rows, e.k_used,
           q.p50_exact, e.p50_est,
           ABS(r.fle50 - 0.5e0) AS p50_rank_err,
           q.p90_exact, e.p90_est,
           ABS(r.fle90 - 0.9e0) AS p90_rank_err
    FROM exq q
    JOIN est e ON e.priority = q.priority
    JOIN er r ON r.priority = q.priority
    """,
)
def order_value_rank_sketch_vs_exact(spark: SparkSession, sf: str):
    """MERGEABLE QUANTILE SKETCH vs EXACT, error under the gate — the
    ``minhash_estimate_vs_exact_jaccard`` discipline applied to ranks:
    per order priority, p50/p90 of order value estimated from a k=128
    deterministic bottom-k-by-hash row sample
    (``operators/sketch.rank_sketch_grouped`` — the KMV discipline on
    ranks: content-hashed, chunk-invariant, mergeable; KLL/GK are
    arrival-order-dependent so no cross-engine oracle could gate them)
    next to the exact order statistics, plus the achieved RANK error
    (|F̂(est) - q|, F̂ = the fraction of true rows <= the estimate) —
    the epsilon a KLL user would read off its guarantee, here measured.
    All index arithmetic is integer (``(q_num*n + q_den-1) DIV q_den``)
    and every estimate is an actual sampled value, so both engines agree
    bitwise.  Scale: the sketch is one data shuffle + a k-bounded
    merge at ANY group cardinality; the exact side (two full sorts) is
    the toy-scale referee that exists only to measure the error — at
    100 TB you run the sketch alone, or merge per-partition ``tail``s
    via ``rank_sketch_merge`` (chunk-invariance pinned in
    tests/test_operators_direct.py)."""
    from byte_convert_avro_spark.operators.sketch import (
        rank_sketch_grouped,
        rank_sketch_quantile,
    )

    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("v"),
    )
    sk = rank_sketch_grouped(o, ["priority"], "v", "id", k=128, chunks=16)
    est = sk.select(
        "priority",
        "k_used",
        rank_sketch_quantile("smp", 1, 2).alias("p50_est"),
        rank_sketch_quantile("smp", 9, 10).alias("p90_est"),
    )
    wv = W.partitionBy("priority").orderBy("v", F.col("id").cast("string"))
    wn = W.partitionBy("priority")
    ex = o.select(
        "priority",
        "v",
        F.row_number().over(wv).alias("vr"),
        F.count("*").over(wn).alias("n"),
    )
    exq = ex.groupBy("priority").agg(
        F.max("n").alias("n_rows"),
        F.max(
            F.when(
                F.col("vr")
                == F.greatest(
                    F.lit(1),
                    F.floor((F.col("n") + 1) / 2).cast("long"),
                ),
                F.col("v"),
            )
        ).alias("p50_exact"),
        F.max(
            F.when(
                F.col("vr")
                == F.greatest(
                    F.lit(1),
                    F.floor((F.col("n") * 9 + 9) / 10).cast("long"),
                ),
                F.col("v"),
            )
        ).alias("p90_exact"),
    )
    er = (
        o.join(F.broadcast(est), "priority")
        .groupBy("priority")
        .agg(
            (
                F.sum(
                    F.when(F.col("v") <= F.col("p50_est"), 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("fle50"),
            (
                F.sum(
                    F.when(F.col("v") <= F.col("p90_est"), 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("fle90"),
        )
    )
    return (
        exq.join(F.broadcast(est), "priority")
        .join(F.broadcast(er), "priority")
        .select(
            "priority",
            "n_rows",
            "k_used",
            "p50_exact",
            "p50_est",
            F.abs(F.col("fle50") - F.lit(0.5)).alias("p50_rank_err"),
            "p90_exact",
            "p90_est",
            F.abs(F.col("fle90") - F.lit(0.9)).alias("p90_rank_err"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "embeddings_data_quality_expectations",
    """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM embeddings),
    d AS (SELECT MAX(len(embedding)) AS dim FROM embeddings
          WHERE embedding IS NOT NULL)
    SELECT 'not_null:embedding' AS expectation,
           (SELECT n_rows FROM n) AS n_checked,
           CAST(COUNT(*) AS BIGINT) AS n_failed,
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM embeddings WHERE embedding IS NULL
    UNION ALL
    SELECT 'zero_norm:embedding',
           (SELECT n_rows FROM n),
           CAST(COUNT(*) AS BIGINT),
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT)
    FROM embeddings
    WHERE embedding IS NOT NULL
      AND len(list_filter(embedding, x -> x IS NOT NULL AND x <> 0)) = 0
    UNION ALL
    SELECT 'finite_elements:embedding',
           (SELECT n_rows FROM n),
           CAST(COUNT(*) AS BIGINT),
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT)
    FROM embeddings
    WHERE embedding IS NOT NULL
      AND len(list_filter(embedding,
                          x -> x IS NULL OR isnan(x) OR isinf(x))) > 0
    UNION ALL
    SELECT 'dim_consistency:embedding',
           (SELECT n_rows FROM n),
           CAST(COUNT(*) AS BIGINT),
           CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INT)
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) <> (SELECT dim FROM d)
    UNION ALL
    SELECT 'unique:vec_id',
           (SELECT n_rows FROM n),
           CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT),
           CAST(CASE WHEN COALESCE(SUM(cnt - 1), 0) = 0 THEN 1 ELSE 0 END AS INT)
    FROM (SELECT COUNT(*) AS cnt FROM embeddings
          GROUP BY vec_id HAVING COUNT(*) > 1)
    """,
)
def embeddings_data_quality_expectations(spark: SparkSession, sf: str):
    """EMBEDDINGS CONTRACT, CHECKABLE — the round-10 verdict's ask: the
    cosine family deliberately crashes loud on a zero-norm embedding
    (data-contract decision, NOTES d837d0c), but until now the
    prescribed upstream filter had no oracle-gated gate.  This is it:
    the ``orders_data_quality_expectations`` shape over the embeddings
    table — not-null vectors, ZERO-NORM count (exact, via element
    existence, no float accumulation), finite elements (no NULL / NaN /
    Inf components), dimension consistency against the corpus max, and
    vec_id uniqueness — one row per expectation with checked/failed
    counts and a pass flag.  A pipeline runs this BEFORE any cosine
    query; a failed ``zero_norm`` row is the signal to apply the filter
    the cosine docstrings prescribe.  Scale: each expectation is one
    scan-side aggregate over row-local array predicates (exists /
    filter — no explode, no shuffle except the uniqueness groupBy);
    5 rows out."""
    e = t(spark, sf, "embeddings")
    n_rows = e.count()

    def row(name, nf_df):
        return nf_df.select(
            F.lit(name).alias("expectation"),
            F.lit(n_rows).cast("long").alias("n_checked"),
            F.col("nf").cast("long").alias("n_failed"),
            (F.col("nf") == 0).cast("int").alias("passed"),
        )

    nn = e.filter(F.col("embedding").isNull()).agg(F.count("*").alias("nf"))
    zn = e.filter(
        F.col("embedding").isNotNull()
        & ~F.expr("exists(embedding, x -> x IS NOT NULL AND x <> 0)")
    ).agg(F.count("*").alias("nf"))
    fin = e.filter(
        F.col("embedding").isNotNull()
        & F.expr(
            "exists(embedding, x -> x IS NULL OR isnan(x)"
            " OR abs(cast(x AS DOUBLE)) = cast('Infinity' AS DOUBLE))"
        )
    ).agg(F.count("*").alias("nf"))
    dim = (
        e.filter(F.col("embedding").isNotNull())
        .agg(F.max(F.size("embedding")).alias("dim"))
    )
    dc = (
        e.filter(F.col("embedding").isNotNull())
        .crossJoin(F.broadcast(dim))
        .filter(F.size("embedding") != F.col("dim"))
        .agg(F.count("*").alias("nf"))
    )
    uq = (
        e.groupBy("vec_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("nf"))
    )
    return (
        row("not_null:embedding", nn)
        .unionAll(row("zero_norm:embedding", zn))
        .unionAll(row("finite_elements:embedding", fin))
        .unionAll(row("dim_consistency:embedding", dc))
        .unionAll(row("unique:vec_id", uq))
    )


# ---------------------------------------------------------------------------
@register(
    "customer_peer_balance_excl_self",
    """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
      FROM customer
    )
    SELECT c_custkey, c_mktsegment,
           CAST(cents AS DOUBLE) / 100.0e0 AS acctbal,
           CASE WHEN COUNT(*) OVER wseg > 1
                THEN CAST(SUM(cents) OVER (PARTITION BY c_mktsegment
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING
                          EXCLUDE CURRENT ROW) AS DOUBLE)
                     / (COUNT(*) OVER wseg - 1) / 100.0e0
           END AS peer_avg_balance,
           CAST(SUM(cents) OVER (PARTITION BY c_mktsegment
                                 ORDER BY cents, c_custkey
                                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                                 EXCLUDE CURRENT ROW) AS BIGINT)
             AS near_peers_cents
    FROM c
    WINDOW wseg AS (PARTITION BY c_mktsegment)
    """,
)
def customer_peer_balance_excl_self(spark: SparkSession, sf: str):
    """WINDOW FRAME ``EXCLUDE CURRENT ROW`` emulated cross-engine — a
    genuinely asymmetric pin: DuckDB runs its NATIVE standard-SQL
    ``EXCLUDE CURRENT ROW`` frames while Spark (which has no EXCLUDE
    clause at all) derives identical values by SUBTRACTION —
    ``sum(frame) - current_row`` — exact because the core is integer
    cents (a double subtraction would expose the engines' different
    summation orders).  Two frame shapes: the classic peer average
    (everyone else in my segment: partition-wide sum minus self, n-1
    denominator, NULL for a 1-customer segment — conditionally
    evaluated, never /0), and a symmetric ±3-row neighborhood minus
    self, where EXCLUDE is NOT rewritable as a shifted frame (the hole
    is interior) — the subtraction is the only Spark spelling.  Scale:
    both windows ride ONE hash partition by segment; the subtraction
    form costs nothing extra (same frame sum Spark would compute
    anyway)."""
    c = t(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    wseg = W.partitionBy("c_mktsegment")
    wfull = wseg.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wnear = wseg.orderBy("cents", "c_custkey").rowsBetween(-3, 3)
    n = F.count("*").over(wseg)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("cents").cast("double") / 100.0).alias("acctbal"),
        F.when(
            n > 1,
            (F.sum("cents").over(wfull) - F.col("cents")).cast("double")
            / (n - 1)
            / 100.0,
        ).alias("peer_avg_balance"),
        (F.sum("cents").over(wnear) - F.col("cents"))
        .cast("long")
        .alias("near_peers_cents"),
    )


# ---------------------------------------------------------------------------
@register(
    "customer_running_distinct_priorities",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           COUNT(DISTINCT o_orderpriority)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS distinct_priorities_so_far
    FROM orders
    """,
)
def customer_running_distinct_priorities(spark: SparkSession, sf: str):
    """DISTINCT WINDOW AGGREGATE emulated cross-engine — the second
    asymmetric pin: DuckDB supports ``COUNT(DISTINCT ...)`` directly in
    a window; Spark rejects DISTINCT in window aggregates outright
    (``DISTINCT_WINDOW_FUNCTION_UNSUPPORTED``), so the Spark spelling is
    ``size(collect_set(...))`` over the same running frame — collect_set
    IS the distinct set, and its size in a running frame is the running
    distinct count.  Tie-break (o_orderdate, o_orderkey) makes every
    row's frame deterministic.  Scale: collect_set's state is bounded by
    the DISTINCT cardinality (5 priorities), not the frame length — the
    same reason the running-distinct shape is safe at 100 TB only when
    the distinct domain is small; for unbounded domains the escalation
    path is kmv_grouped."""
    o = t(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("long")
        .alias("distinct_priorities_so_far"),
    )


# ---------------------------------------------------------------------------
@register(
    "order_status_priority_cube_gid",
    """
    SELECT GROUPING(o_orderstatus, o_orderpriority) AS gid,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def order_status_priority_cube_gid(spark: SparkSession, sf: str):
    """``grouping_id()`` BIT PATTERNS over CUBE — pins that both engines
    assign the SAME bit semantics (SQL standard: first listed column is
    the most significant bit; bit=1 means the column is rolled up) so a
    gid-driven consumer (the classic 'route subtotal rows by mask'
    pattern) behaves identically.  The per-column ``GROUPING()`` flags
    ride alongside as the decomposition proof: gid = 2*g_status +
    g_priority on every row, across all four CUBE strata.  Exact
    integer cents.  Scale: CUBE over (3 x 5) low-cardinality dimensions
    is a 4-stratum expand feeding one map-side-partial aggregate —
    the expand multiplies rows x4 BEFORE the shuffle, which is the
    explicit cost of single-pass multi-stratum aggregation (cheaper
    than 4 scans at any scale where the scan dominates)."""
    o = t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .select(
            "gid",
            "g_status",
            "g_priority",
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            "cents",
        )
    )


# ---------------------------------------------------------------------------
@register(
    "customer_trailing_30d_spend",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(cents) OVER w30 AS BIGINT) AS cents_30d,
           CAST(COUNT(*) OVER w30 AS BIGINT) AS n_orders_30d
    FROM o
    WINDOW w30 AS (PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 29 DAY PRECEDING
                         AND CURRENT ROW)
    """,
)
def customer_trailing_30d_spend(spark: SparkSession, sf: str):
    """TIME-RANGE WINDOW FRAME emulated cross-engine — the third
    asymmetric pin of the round: DuckDB runs its native
    ``RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW`` over
    the TIMESTAMP ordering; Spark has no interval RANGE frames, so the
    Spark spelling orders by the integer EPOCH DAY and uses a numeric
    ``rangeBetween(-29, 0)`` — value-equivalent because the order dates
    are midnight-aligned and RANGE peers (same-day orders) land inside
    the frame identically under both spellings.  This is the
    windowed sibling of the rolling-median explode: when every row
    needs the trailing aggregate, the RANGE frame does it in ONE sort
    with zero fan-out (the explode trick is for aggregates per
    DISTINCT day, where emitting per-row would over-count).  Exact
    integer cents.  Scale: one hash exchange on custkey + one
    partition-local sort; frame evaluation is the running two-pointer
    pass, O(rows), state O(1)."""
    o = t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w30 = (
        W.partitionBy("o_custkey")
        .orderBy(day.alias("day"))
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum("cents").over(w30).cast("long").alias("cents_30d"),
        F.count("*").over(w30).cast("long").alias("n_orders_30d"),
    )


# ---------------------------------------------------------------------------
#: CUSUM reference drift k (cents) and alarm threshold h (cents): k sits
#: above the corpus mean event value so the statistic resets often and
#: alarms are a real tail event, not a foregone conclusion.
_CUSUM_K = 26000
_CUSUM_H = 400000


@register(
    "events_cusum_value_drift",
    f"""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS ts_us,
             CAST(ROUND(value * 100, 0) AS BIGINT) - {_CUSUM_K} AS y
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ), w AS (
      SELECT event_type, event_id, ts_us,
             SUM(y) OVER (PARTITION BY event_type
                          ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS p
      FROM e
    ), c AS (
      SELECT event_type, event_id, ts_us,
             p - LEAST(0, MIN(p) OVER (PARTITION BY event_type
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING)) AS s
      FROM w
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN s > {_CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_points,
           CAST(MAX(s) AS BIGINT) AS max_cusum,
           MIN(CASE WHEN s > {_CUSUM_H} THEN ts_us END) AS first_alarm_us
    FROM c
    GROUP BY event_type
    """,
)
def events_cusum_value_drift(spark: SparkSession, sf: str):
    """CUSUM CHANGEPOINT DETECTOR as pure window algebra — the drift
    statistic ``s_i = max(0, s_(i-1) + (x_i - k))`` looks like a
    sequential recurrence (the chunked-fold family's territory), but
    the max-clamp recurrence has an exact CLOSED FORM:
    ``s_i = p_i - min(0, min_(j<=i) p_j)`` with p the prefix sum of
    (x - k) — provable by induction, so the whole detector is ONE
    running sum + ONE running min over the same window frame, no fold,
    no UDF, no iteration.  Integer cents end to end: both engines
    compute identical statistics bit-for-bit.  Per event type the query
    reports how often the upward-drift statistic crossed the alarm
    threshold, the maximum excursion, and the first alarm time — the
    data-quality drift-monitoring shape (is the value distribution of
    'purchase' events drifting up?).  Scale: one hash exchange on
    event_type, one partition-local sort shared by both running
    functions, O(1) frame state; on a hot type this is the same
    per-key-serial profile as sessionization (measured in the skew
    study) — and the detector composes with any finer partition key.
    k={_CUSUM_K} h={_CUSUM_H} (cents) are pinned constants chosen so
    alarms are tail events on the driver corpus, not constants."""
    ev = (
        t(spark, sf, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.expr("ts DIV 1000").alias("ts_us"),
            (
                F.round(F.col("value") * 100, 0).cast("long")
                - F.lit(_CUSUM_K)
            ).alias("y"),
        )
    )
    wrun = (
        W.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = F.sum("y").over(wrun)
    c = ev.select(
        "event_type",
        "ts_us",
        (p - F.least(F.lit(0), F.min(p).over(wrun))).alias("s"),
    )
    return c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum(F.when(F.col("s") > _CUSUM_H, 1).otherwise(0))
        .cast("long")
        .alias("n_alarm_points"),
        F.max("s").cast("long").alias("max_cusum"),
        F.min(F.when(F.col("s") > _CUSUM_H, F.col("ts_us"))).alias(
            "first_alarm_us"
        ),
    )
