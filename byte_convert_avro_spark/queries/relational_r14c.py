"""Round-14 session-4 additions: nonparametric two-sample/association
statistics and concentration/diversity indices, all exact-integer gated.

Families and why they are NEW surface, not respellings:

- **Two-sample Kolmogorov-Smirnov** (``events_ks_view_purchase``): the
  existing two-sample entries compare MOMENTS (``events_value_welch_t_-
  view_purchase``) or RATES (``ab_test_purchase_rates``); KS compares
  whole DISTRIBUTIONS — max ECDF gap over the pooled support — the
  standard drift detector between data slices (train vs eval, old
  source vs new source) that catches shape changes moments miss.  The
  statistic is spelled as the exact integer ``max|cum_a*n_b -
  cum_b*n_a|`` so the argmax and the gap numerator are bit-exact; one
  final guarded division produces D.
- **Spearman rank correlation** (``lineitem_spearman_qty_price``):
  ``lineitem_corr_qty_discount`` is PEARSON (linear, outlier-driven);
  Spearman is the monotone-association twin every EDA pass runs next to
  it.  Average ranks are carried as the exact integer ``2*avg_rank =
  2*rank() + ties - 1`` so Σd² is exact in DECIMAL(38,0) at any scale.
- **Kendall tau-b** (``events_kendall_daily_taub``): the
  concordant/discordant-pair association with tie correction — the
  robustness rung above Spearman (bounded influence per pair) and the
  statistic Mann-Kendall is the time-specialization of
  (``events_mann_kendall_trend`` tests x=time; this tests two measured
  series against each other).  Pairs are DAYS-bounded (the
  aggregation-first discipline of the trend family), never row-bounded.
- **Chi-squared independence cells**
  (``orders_priority_status_chi2_cells``): ``priority_uniformity_chi2``
  tests one margin against UNIFORM; this tests two categorical columns
  against INDEPENDENCE — the contingency-table workhorse — emitted
  per-cell (observed, expected, contribution) so no cross-engine
  float-sum ordering exists anywhere; every contribution is a fixed
  expression tree over exact int64 margins.
- **Concentration / diversity indices**: Gini (``order_value_gini``)
  and Pareto share cover INEQUALITY of a continuous measure; the
  Herfindahl-Hirschman index (``nation_customer_order_hhi``) is the
  COUNT-concentration readout (market-share style: is a nation's order
  volume dominated by few customers?) with the exact integer spelling
  HHI = Σc²/(Σc)², and Shannon entropy
  (``events_user_type_entropy_bits``) is the behavioral-diversity
  readout, made bit-portable via the exact integer floor(log2)
  surprisal the bigram-LM entry established.
- **Zipf log-log fit** (``corpus_zipf_loglog_slope``): the corpus-level
  sanity statistic every LLM-data pipeline reports — natural text has
  rank-frequency slope near -1; templated/synthetic corpora deviate.
  OLS over (floor_log2 rank, floor_log2 freq) keeps every sum integer;
  ``vocab_growth_heaps`` charts vocabulary GROWTH, this fits the
  frequency LAW — complementary corpus-health axes.

Cross-engine float discipline (the welch_t/changepoint rules): every
float is produced by ONE identical expression tree over exact-integer
inputs, with divisions guarded by conditionally-evaluated CASE (DuckDB
returns NULL for double/0.0 while Spark returns IEEE Inf, so an
unguarded degenerate division silently diverges before it ever
crashes).

Reference parity note: the reference (AvroTransform.java, 337-LoC
Kafka-Connect SMT) has none of these operators — all belong to the
analytics/LLM-pipeline addendum SURVEY.md §2 mandates on top of the
decode pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import (
    cents,
    register,
    spread,
    t,
)


def _flog2(c):
    """Exact integer floor(log2 x) for x >= 1: length(bin(x)) - 1 —
    bit-identical on both engines (the doc_bigram_lm_bitscore trick)."""
    return F.length(F.bin(c)) - 1


# ---------------------------------------------------------------------------
@register(
    "events_ks_view_purchase",
    """
    WITH f AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
      FROM events
      WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ), g AS (
      SELECT vc,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS dv,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS dp
      FROM f GROUP BY vc
    ), tot AS (
      SELECT CAST(SUM(dv) AS BIGINT) AS n1, CAST(SUM(dp) AS BIGINT) AS n2
      FROM g
    ), cum AS (
      SELECT vc,
             CAST(SUM(dv) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_v,
             CAST(SUM(dp) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_p
      FROM g
    ), stat AS (
      SELECT vc, n1, n2, ABS(cum_v * n2 - cum_p * n1) AS d_num,
             ROW_NUMBER() OVER (
               ORDER BY ABS(cum_v * n2 - cum_p * n1) DESC, vc) AS rk
      FROM cum CROSS JOIN tot
    )
    SELECT CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
           CAST(vc AS BIGINT) AS d_at_cents, CAST(d_num AS BIGINT) AS d_num,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) END
             AS ks_d
    FROM stat WHERE rk = 1
    """,
)
def events_ks_view_purchase(spark: SparkSession, sf: str):
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV on event value cents, 'view' vs
    'purchase': D = max_x |F_view(x) - F_purchase(x)| over the pooled
    distinct-value support, spelled as the exact integer
    max|cum_v*n2 - cum_p*n1| so the maximizing location ties break
    deterministically (smallest cents value) and the numerator is
    bit-exact; D itself is ONE guarded division of exact int64s.
    Complements the Welch-t entry: t compares means, KS compares the
    whole distribution shape (the drift check between data slices that
    catches variance/modality changes a mean test misses).  Scale: one
    groupBy on value cents (map-side combine collapses rows to the
    distinct-value domain), then ONE ordered cumulative pass whose
    input is DOMAIN-bounded (distinct cents values, not events) — the
    same single-partition treatment as the rank-sketch referee; at
    100 TB the domain stays ~1e5 while events grow 1000x.  Overflow:
    cum*n <= n_view*n_purchase < 2^63 up to ~3e9 events per side."""
    ev = t(spark, sf, "events")
    g = (
        ev.filter(
            F.col("event_type").isin("view", "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(cents("value").alias("vc"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).cast("long").alias("dv"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("dp"),
        )
    )
    tot = g.agg(
        F.sum("dv").cast("long").alias("n1"),
        F.sum("dp").cast("long").alias("n2"),
    )
    wc = W.orderBy("vc").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = g.select(
        "vc",
        F.sum("dv").over(wc).cast("long").alias("cum_v"),
        F.sum("dp").over(wc).cast("long").alias("cum_p"),
    ).crossJoin(F.broadcast(tot))
    stat = cum.withColumn(
        "d_num",
        F.abs(F.col("cum_v") * F.col("n2") - F.col("cum_p") * F.col("n1")),
    )
    pick = stat.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("d_num"), "vc"))
    ).filter(F.col("rk") == 1)
    return pick.select(
        F.col("n1").cast("long").alias("n_view"),
        F.col("n2").cast("long").alias("n_purchase"),
        F.col("vc").cast("long").alias("d_at_cents"),
        F.col("d_num").cast("long").alias("d_num"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.col("d_num").cast("double")
            / (F.col("n1") * F.col("n2")).cast("double"),
        ).alias("ks_d"),
    )


# ---------------------------------------------------------------------------
@register(
    "lineitem_spearman_qty_price",
    """
    WITH b AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qc,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS pc
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        AND l_extendedprice IS NOT NULL
    ), r AS (
      SELECT flag,
             2 * RANK() OVER (PARTITION BY flag ORDER BY qc)
               + COUNT(*) OVER (PARTITION BY flag, qc) - 1 AS rx2,
             2 * RANK() OVER (PARTITION BY flag ORDER BY pc)
               + COUNT(*) OVER (PARTITION BY flag, pc) - 1 AS ry2
      FROM b
    ), g AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST((rx2 - ry2) * (rx2 - ry2) AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sum_d2_x4
      FROM r GROUP BY flag
    )
    SELECT flag AS l_returnflag, n,
           CAST(sum_d2_x4 AS VARCHAR) AS sum_d2_x4,
           CASE WHEN n >= 2 THEN
             1.0 - (6.0 * (CAST(sum_d2_x4 AS DOUBLE) / 4.0))
                     / (CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))
           END AS spearman_rho
    FROM g
    """,
)
def lineitem_spearman_qty_price(spark: SparkSession, sf: str):
    """SPEARMAN RANK CORRELATION between quantity and extended price,
    per return flag — the monotone-association twin of the Pearson
    entry (``lineitem_corr_qty_discount``).  Average ranks (the
    standard tie treatment) are carried as the EXACT integer
    2*avg_rank = 2*rank() + |ties| - 1 (the average of the tied block's
    consecutive ranks, doubled to clear the half), so d = rx2 - ry2 is
    an exact integer and sum_d2_x4 = Σ(2d)² is exact in DECIMAL(38,0)
    at any corpus size (int64 would overflow past ~1e8 rows/group).
    rho = 1 - 6Σd²/(n(n²-1)) — exact Spearman under no ties, the
    classical Σd² statistic under ties — via ONE identical double
    expression tree in both engines.  Scale: two rank windows
    partitioned by flag; per-flag sort is the global-sort shape (range
    partition + local sort at scale); no pair objects anywhere —
    Spearman is O(n log n) where Kendall is O(n²), which is exactly why
    this entry runs on ROWS while the tau entry runs on daily
    aggregates."""
    li = t(spark, sf, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    b = li.select(
        F.col("l_returnflag").alias("flag"),
        cents("l_quantity").alias("qc"),
        cents("l_extendedprice").alias("pc"),
    )
    rx2 = (
        F.lit(2) * F.rank().over(W.partitionBy("flag").orderBy("qc"))
        + F.count("*").over(W.partitionBy("flag", "qc"))
        - 1
    )
    ry2 = (
        F.lit(2) * F.rank().over(W.partitionBy("flag").orderBy("pc"))
        + F.count("*").over(W.partitionBy("flag", "pc"))
        - 1
    )
    r = b.select("flag", rx2.alias("rx2"), ry2.alias("ry2"))
    d = (F.col("rx2") - F.col("ry2")).cast("long")
    g = r.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((d * d).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sum_d2_x4"),
    )
    n_d = F.col("n").cast("double")
    return g.select(
        F.col("flag").alias("l_returnflag"),
        "n",
        # conveyed as a STRING: above 2^53 a DECIMAL column round-trips
        # exactly through Spark's pandas conversion but duckdb's .df()
        # degrades DECIMAL to float64 — the gate would diff the
        # CONVEYANCE, not the engines.  Both engines cast the exact
        # decimal to plain digits instead.
        F.col("sum_d2_x4").cast("string").alias("sum_d2_x4"),
        F.when(
            F.col("n") >= 2,
            F.lit(1.0)
            - (F.lit(6.0) * (F.col("sum_d2_x4").cast("double") / F.lit(4.0)))
            / (n_d * (n_d * n_d - F.lit(1.0))),
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_kendall_daily_taub",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, day
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN b.cnt > a.cnt THEN 1
                  WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sx,
             CASE WHEN b.day_cents > a.day_cents THEN 1
                  WHEN b.day_cents < a.day_cents THEN -1 ELSE 0 END AS sy
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
    ), g AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
             CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nd,
             CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
             CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t2,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM pairs GROUP BY event_type
    ), nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    )
    SELECT g.event_type, nn.n_days, nc, nd, t1 AS ties_x, t2 AS ties_y, n0,
           CASE WHEN n0 - t1 > 0 AND n0 - t2 > 0 THEN
             CAST(nc - nd AS DOUBLE)
               / sqrt(CAST(n0 - t1 AS DOUBLE) * CAST(n0 - t2 AS DOUBLE))
           END AS tau_b
    FROM g JOIN nn ON nn.event_type = g.event_type
    """,
)
def events_kendall_daily_taub(spark: SparkSession, sf: str):
    """KENDALL TAU-B between daily event COUNT and daily total VALUE,
    per event type — concordant/discordant day pairs with the tie-pair
    correction in the denominator: tau_b = (nc-nd)/sqrt((n0-t1)(n0-t2))
    where t1/t2 are pairs tied on x/y.  The pair-based association next
    to Spearman's rank-based one, and the two-series generalization of
    Mann-Kendall (x=time there, x=count here).  All counts are exact
    integers; tau_b is one identical double tree, guarded against the
    all-tied degenerate margin.  Scale: the pair stage is quadratic in
    DAYS per type (the _day_pairs discipline — equi-shuffle on
    event_type, |days|² local work, a few hundred thousand pairs at ANY
    row scale because the daily rollup absorbs the data growth)."""
    ev = (
        t(spark, sf, "events")
        .withColumn("ts_us", F.expr("ts DIV 1000"))
        .filter(
            F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
            & F.col("ts").isNotNull()
        )
    )
    daily = ev.groupBy(
        "event_type", F.expr("ts_us DIV 86400000000").alias("day")
    ).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(cents("value")).cast("long").alias("day_cents"),
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("day_a"),
        F.col("cnt").alias("cnt_a"),
        F.col("day_cents").alias("c_a"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("day_b"),
        F.col("cnt").alias("cnt_b"),
        F.col("day_cents").alias("c_b"),
    )
    sgn = lambda hi, lo: (  # noqa: E731
        F.when(F.col(hi) > F.col(lo), 1)
        .when(F.col(hi) < F.col(lo), -1)
        .otherwise(0)
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("day_b") > F.col("day_a"))
        .select(
            "event_type",
            sgn("cnt_b", "cnt_a").alias("sx"),
            sgn("c_b", "c_a").alias("sy"),
        )
    )
    g = pairs.groupBy("event_type").agg(
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0))
        .cast("long")
        .alias("nd"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0)).cast("long").alias("t1"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0)).cast("long").alias("t2"),
        F.count("*").cast("long").alias("n0"),
    )
    nn = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    j = g.join(nn, "event_type")
    return j.select(
        "event_type",
        "n_days",
        "nc",
        "nd",
        F.col("t1").alias("ties_x"),
        F.col("t2").alias("ties_y"),
        "n0",
        F.when(
            (F.col("n0") - F.col("t1") > 0) & (F.col("n0") - F.col("t2") > 0),
            (F.col("nc") - F.col("nd")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("t1")).cast("double")
                * (F.col("n0") - F.col("t2")).cast("double")
            ),
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
@register(
    "orders_priority_status_chi2_cells",
    """
    WITH cells AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY priority, status
    ), m AS (
      SELECT priority, status, o,
             CAST(SUM(o) OVER (PARTITION BY priority) AS BIGINT) AS r,
             CAST(SUM(o) OVER (PARTITION BY status) AS BIGINT) AS c,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    )
    SELECT priority, status, o AS observed, r AS row_total, c AS col_total,
           n AS grand_n,
           CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
             AS expected,
           (CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE))
             / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
             AS chi2_cell
    FROM m
    """,
)
def orders_priority_status_chi2_cells(spark: SparkSession, sf: str):
    """CHI-SQUARED INDEPENDENCE TEST cells for the orderpriority x
    orderstatus contingency table: per cell the observed count, both
    margins, the expected count r*c/n and the contribution
    (o - rc/n)²/(rc/n), spelled from the exact int64 identity
    (o*n - r*c)²/(r*c*n) so every float is ONE fixed tree over exact
    integers.  ``priority_uniformity_chi2`` tests one margin against
    uniform; this tests two categorical columns against INDEPENDENCE —
    the categorical-association workhorse.  Emitted PER CELL (never a
    float sum across cells) so no accumulation-order drift can exist;
    the consumer sums 15 doubles.  Divisions need no guard: a cell
    exists only if o >= 1, hence r, c, n >= 1.  Scale: one groupBy to
    the |priorities| x |statuses| cell domain (map-side combine), then
    window margins over a DOMAIN-bounded (~15-row) frame — constant
    regardless of row count.  Overflow: o*n and r*c <= n² — exact in
    int64 to n ~ 3e9 orders and exact in the double cast to n ~ 9e7;
    past that the diff stays int64-exact and the cast rounds both
    engines identically (round-to-nearest of the same integer)."""
    cells = (
        t(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").cast("long").alias("o"))
    )
    m = cells.select(
        "priority",
        "status",
        "o",
        F.sum("o").over(W.partitionBy("priority")).cast("long").alias("r"),
        F.sum("o").over(W.partitionBy("status")).cast("long").alias("c"),
        F.sum("o").over(W.partitionBy()).cast("long").alias("n"),
    )
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    r_d, c_d, n_d = (F.col(x).cast("double") for x in ("r", "c", "n"))
    return m.select(
        "priority",
        "status",
        F.col("o").alias("observed"),
        F.col("r").alias("row_total"),
        F.col("c").alias("col_total"),
        F.col("n").alias("grand_n"),
        (r_d * c_d / n_d).alias("expected"),
        ((diff * diff) / (r_d * c_d * n_d)).alias("chi2_cell"),
    )


# ---------------------------------------------------------------------------
@register(
    "nation_customer_order_hhi",
    """
    WITH oc AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS co
      FROM orders GROUP BY o_custkey
    ), j AS (
      SELECT n.n_name, oc.co
      FROM oc
      JOIN customer c ON c.c_custkey = oc.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), g AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(co) AS BIGINT) AS total_orders,
             CAST(SUM(co * co) AS BIGINT) AS hhi_num
      FROM j GROUP BY n_name
    )
    SELECT n_name, n_customers, total_orders, hhi_num,
           CAST(hhi_num AS DOUBLE)
             / (CAST(total_orders AS DOUBLE) * CAST(total_orders AS DOUBLE))
             AS hhi,
           (CAST(total_orders AS DOUBLE) * CAST(total_orders AS DOUBLE))
             / CAST(hhi_num AS DOUBLE) AS effective_customers
    FROM g
    ORDER BY n_name
    """,
)
def nation_customer_order_hhi(spark: SparkSession, sf: str):
    """HERFINDAHL-HIRSCHMAN concentration INDEX of order volume across
    customers, per nation: HHI = Σcᵢ²/(Σcᵢ)² over each nation's
    customer order counts, plus the effective number of customers
    1/HHI (the "how many equal customers would look like this" readout
    — n_customers >> effective_customers flags whale-dominated
    nations).  Completes the inequality family: Gini and Pareto-share
    measure a CONTINUOUS measure's skew; HHI is the market-share form
    on exact integer counts, so the numerator/denominator pair is
    bit-exact and both floats are single identical trees (guards
    unneeded: a nation row exists only via a customer with >= 1
    order, so total_orders, hhi_num >= 1).  Customers with zero orders
    hold zero share and drop out of the sum by definition.  Scale: one
    groupBy on o_custkey (map-side combine), one shuffle join to
    customer on the same key, broadcast nation, then a 25-group agg;
    Σc² <= (Σc)² keeps int64 exact to ~3e9 orders/nation."""
    oc = (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("co"))
    )
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf, "nation").select("n_nationkey", "n_name")
    j = oc.join(
        cust, oc["o_custkey"] == cust["c_custkey"]
    ).join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    g = j.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("co").cast("long").alias("total_orders"),
        F.sum(F.col("co") * F.col("co")).cast("long").alias("hhi_num"),
    )
    tot_d = F.col("total_orders").cast("double")
    num_d = F.col("hhi_num").cast("double")
    return g.select(
        "n_name",
        "n_customers",
        "total_orders",
        "hhi_num",
        (num_d / (tot_d * tot_d)).alias("hhi"),
        ((tot_d * tot_d) / num_d).alias("effective_customers"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
@register(
    "events_user_type_entropy_bits",
    """
    WITH ut AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id, event_type
    ), w AS (
      SELECT user_id, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM ut
    )
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(cnt * ((length(bin(n)) - 1) - (length(bin(cnt)) - 1)))
                AS BIGINT) AS surprisal_bits_num,
           CAST(SUM(cnt * ((length(bin(n)) - 1) - (length(bin(cnt)) - 1)))
                AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS bits_per_event
    FROM w GROUP BY user_id
    """,
)
def events_user_type_entropy_bits(spark: SparkSession, sf: str):
    """SHANNON ENTROPY of each user's event-type distribution in exact
    integer floor-log2 bits: per type the surprisal -log2(cnt/n) is
    approximated by the EXACT integer floor(log2 n) - floor(log2 cnt)
    (within 2 bits, bit-identical cross-engine — the bigram-LM
    discipline applied to behavioral diversity), summed weighted by
    cnt; bits_per_event = that integer over n via one division.  Zero
    bits = single-behavior user (bot-like); high = diverse usage — the
    per-entity diversity readout next to the per-entity concentration
    one (HHI).  Scale: one groupBy to (user, type) with map-side
    combine, one window over user_id partitions (state = one running
    sum over a |types|-bounded frame), final rollup on the same key —
    a single effective hash exchange on user_id end to end."""
    ut = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = ut.select(
        "user_id",
        "cnt",
        F.sum("cnt").over(W.partitionBy("user_id")).cast("long").alias("n"),
    )
    surp = F.col("cnt") * (_flog2(F.col("n")) - _flog2(F.col("cnt")))
    return w.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(surp).cast("long").alias("surprisal_bits_num"),
        (F.sum(surp).cast("double") / F.max("n").cast("double")).alias(
            "bits_per_event"
        ),
    )


# ---------------------------------------------------------------------------
@register(
    "corpus_zipf_loglog_slope",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY tok
    ), ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS rk FROM freq
    ), xy AS (
      SELECT CAST(length(bin(rk)) - 1 AS BIGINT) AS x,
             CAST(length(bin(f)) - 1 AS BIGINT) AS y
      FROM ranked
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM xy
    )
    SELECT n AS vocab_size,
           CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxy
                - CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))
             AS VARCHAR) AS slope_num,
           CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))
             AS VARCHAR) AS slope_den,
           CASE WHEN n >= 2 AND CAST(n AS DECIMAL(38,0)) * sxx
                               - CAST(sx AS DECIMAL(38,0)) * sx <> 0 THEN
             CAST(CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
               / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
           END AS zipf_slope
    FROM g
    """,
)
def corpus_zipf_loglog_slope(spark: SparkSession, sf: str):
    """ZIPF'S-LAW FIT over the corpus rank-frequency table: OLS slope of
    floor_log2(freq) against floor_log2(rank) across the whole
    vocabulary — natural-language corpora sit near slope -1; templated
    or synthetic text deviates, making this the one-number corpus-
    health statistic next to ``vocab_growth_heaps`` (growth law vs
    frequency law).  Both log axes use the exact integer
    floor(log2 x) = length(bin(x)) - 1, so all five OLS sums are exact
    integers; slope numerator/denominator are exact DECIMAL(38,0)
    (int64 n*Σxy overflows past ~1e8 vocab) and the slope is ONE
    guarded division.  Scale: token explode is narrow after
    ``spread``; frequency groupBy has map-side combine; the rank stage
    is a VOCAB-bounded single-partition sort (the inverted-index /
    winnowing treatment — vocabulary grows sublinearly in corpus size
    by the Heaps law this suite measures); the OLS fold is one 5-sum
    agg."""
    d = spread(t(spark, sf, "documents"), "doc_id")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("f"))
    ranked = freq.select(
        "f",
        F.row_number().over(W.orderBy(F.desc("f"), "tok")).alias("rk"),
    )
    xy = ranked.select(
        _flog2(F.col("rk")).cast("long").alias("x"),
        _flog2(F.col("f")).cast("long").alias("y"),
    )
    g = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("n") * F.col("sxy") - dec("sx") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    den = (dec("n") * F.col("sxx") - dec("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    return g.select(
        F.col("n").alias("vocab_size"),
        # string conveyance (the Spearman/HITS rule): duckdb's .df()
        # degrades DECIMAL(38,0) to float64 while Spark conveys exact
        # Decimals — cast BOTH sides to digit strings
        num.cast("string").alias("slope_num"),
        den.cast("string").alias("slope_den"),
        F.when(
            (F.col("n") >= 2) & (den != 0),
            num.cast("double") / den.cast("double"),
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Batch 2 — drift observability (PSI between time halves, per-source JSD
# against the corpus) and exact-integer HITS link analysis.  PSI/JSD use
# the floor-log2 surprisal discipline (bit-portable where libm ln is
# not); HITS exploits that UNNORMALIZED hub/authority iterations from an
# all-ones start stay INTEGER, so — unlike PageRank's ordered float
# folds — plain map-side-combining SUMs are bit-exact by construction.


#: shared with the streaming twin (streaming_psi_value_halves): the
#: streaming path must gate against the IDENTICAL oracle.
EVENTS_PSI_SQL = """
    WITH f AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS vc,
             epoch_us(ts) // 86400000000 AS day
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ), bounds AS (
      SELECT MIN(vc) AS mn, MAX(vc) AS mx,
             (MIN(day) + MAX(day)) // 2 AS mid
      FROM f
    ), lab AS (
      SELECT ((vc - mn) * 10) // (mx - mn + 1) AS bucket,
             CASE WHEN day <= mid THEN 1 ELSE 0 END AS early
      FROM f CROSS JOIN bounds
    ), cnt AS (
      SELECT bucket,
             CAST(SUM(early) AS BIGINT) AS n_early,
             CAST(SUM(1 - early) AS BIGINT) AS n_late
      FROM lab GROUP BY bucket
    ), filled AS (
      SELECT b.bucket,
             COALESCE(n_early, 0) AS n_early, COALESCE(n_late, 0) AS n_late
      FROM (SELECT unnest(generate_series(0, 9)) AS bucket) b
      LEFT JOIN cnt ON cnt.bucket = b.bucket
    ), tot AS (
      SELECT CAST(SUM(n_early) + 10 AS BIGINT) AS na,
             CAST(SUM(n_late) + 10 AS BIGINT) AS nb
      FROM filled
    )
    SELECT bucket, n_early, n_late,
           na AS total_early_smoothed, nb AS total_late_smoothed,
           (n_early + 1) * nb - (n_late + 1) * na AS diff_num,
           (length(bin((n_early + 1) * nb)) - 1)
             - (length(bin((n_late + 1) * na)) - 1) AS ratio_bits,
           CAST((n_early + 1) * nb - (n_late + 1) * na AS DOUBLE)
             * CAST((length(bin((n_early + 1) * nb)) - 1)
                    - (length(bin((n_late + 1) * na)) - 1) AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS psi_bits_cell
    FROM filled CROSS JOIN tot
    """


@register("events_value_psi_halves", EVENTS_PSI_SQL)
def events_value_psi_halves(spark: SparkSession, sf: str):
    """POPULATION STABILITY INDEX between the early and late halves of
    the event timeline, per equal-width value-cents decile — THE
    model-observability drift metric, made bit-portable: the classical
    cell term (p_a - p_b)·ln(p_a/p_b) is respelled over add-1-smoothed
    integer counts as diff_num·ratio_bits/(Na·Nb) where diff_num =
    (n_a+1)Nb - (n_b+1)Na is exact int64 and ratio_bits is the exact
    integer floor-log2 of the same smoothed ratio (the bigram-LM
    discipline; each cell term is within 2 bits-vs-nats scaling of the
    textbook value and every float is one fixed tree).  Emitted PER
    BUCKET (the KS lesson: no cross-engine float-sum ordering), with
    empty deciles materialized from a literal 0..9 frame so smoothing
    is total.  Complements KS: PSI is the BINNED, production-monitoring
    spelling of the same two-sample question, robust to distribution
    tails and streamable from bucket counts.  Scale: two 1-row
    broadcast folds (bounds, totals) + one groupBy on a 10-value
    domain; the events pass is one projection — nothing grows with
    rows.  Overflow: (n+1)·N <= (N+1)·N — int64-exact to ~2e9 events
    per half."""
    ev = t(spark, sf, "events").withColumn("ts_us", F.expr("ts DIV 1000"))
    f = ev.filter(F.col("value").isNotNull() & F.col("ts").isNotNull()).select(
        cents("value").alias("vc"),
        F.expr("ts_us DIV 86400000000").alias("day"),
    )
    bounds = f.agg(
        F.min("vc").alias("mn"),
        F.max("vc").alias("mx"),
        F.expr("(MIN(day) + MAX(day)) DIV 2").alias("mid"),
    )
    lab = f.crossJoin(F.broadcast(bounds)).select(
        F.expr("((vc - mn) * 10) DIV (mx - mn + 1)").alias("bucket"),
        F.when(F.col("day") <= F.col("mid"), 1).otherwise(0).alias("early"),
    )
    cnt = lab.groupBy("bucket").agg(
        F.sum("early").cast("long").alias("n_early"),
        F.sum(F.lit(1) - F.col("early")).cast("long").alias("n_late"),
    )
    return psi_finalize(spark, cnt)


def psi_finalize(spark: SparkSession, cnt) -> DataFrame:
    """Shared PSI tail over (bucket, n_early, n_late) counts: fill the
    0..9 domain, add-1 smooth, emit the per-cell integer parts + the
    one fixed-tree float — used by both the batch entry and the
    streaming twin so the two paths cannot diverge in the arithmetic,
    only in how the counts were accumulated."""
    full = (
        spark.range(0, 10)
        .select(F.col("id").alias("bucket"))
        .join(cnt, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_early", F.lit(0)).alias("n_early"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
    )
    tot = full.agg(
        (F.sum("n_early") + 10).cast("long").alias("na"),
        (F.sum("n_late") + 10).cast("long").alias("nb"),
    )
    j = full.crossJoin(F.broadcast(tot))
    x = (F.col("n_early") + 1) * F.col("nb")
    y = (F.col("n_late") + 1) * F.col("na")
    diff = x - y
    bits = _flog2(x) - _flog2(y)
    return j.select(
        "bucket",
        "n_early",
        "n_late",
        F.col("na").alias("total_early_smoothed"),
        F.col("nb").alias("total_late_smoothed"),
        diff.alias("diff_num"),
        bits.alias("ratio_bits"),
        (
            diff.cast("double")
            * bits.cast("double")
            / (F.col("na").cast("double") * F.col("nb").cast("double"))
        ).alias("psi_bits_cell"),
    )


# ---------------------------------------------------------------------------
@register(
    "source_token_jsd_vs_corpus",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ), cs AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok
    ), ns AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
             CAST(COUNT(*) AS BIGINT) AS vocab_s
      FROM cs GROUP BY source
    ), cg AS (
      SELECT tok, CAST(SUM(c) AS BIGINT) AS cgl FROM cs GROUP BY tok
    ), ng AS (
      SELECT CAST(SUM(cgl) AS BIGINT) AS n_g FROM cg
    ), hs AS (
      SELECT cs.source,
             CAST(SUM(c * ((length(bin(n.n_s)) - 1) - (length(bin(c)) - 1)))
                  AS BIGINT) AS surp_s
      FROM cs JOIN (SELECT source, n_s FROM ns) n ON n.source = cs.source
      GROUP BY cs.source
    ), hg AS (
      SELECT CAST(SUM(cgl * ((length(bin(ng.n_g)) - 1)
                             - (length(bin(cgl)) - 1))) AS BIGINT) AS surp_g
      FROM cg CROSS JOIN ng
    ), mix AS (
      SELECT s.source,
             COALESCE(cs.c, 0) * ng.n_g + cg.cgl * s.n_s AS m_num,
             2 * s.n_s * ng.n_g AS m_tot
      FROM (SELECT source, n_s FROM ns) s
      CROSS JOIN ng
      CROSS JOIN cg
      LEFT JOIN cs ON cs.source = s.source AND cs.tok = cg.tok
    ), hm AS (
      SELECT source, CAST(MAX(m_tot) AS BIGINT) AS m_tot,
             CAST(SUM(m_num * ((length(bin(m_tot)) - 1)
                               - (length(bin(m_num)) - 1))) AS BIGINT)
               AS surp_m
      FROM mix GROUP BY source
    )
    SELECT ns.source, ns.n_s AS n_tok_source, ns.vocab_s,
           ng.n_g AS n_tok_corpus,
           hs.surp_s, hg.surp_g, hm.surp_m,
           CAST(hm.surp_m AS DOUBLE) / CAST(hm.m_tot AS DOUBLE)
             - (CAST(hs.surp_s AS DOUBLE) / CAST(ns.n_s AS DOUBLE)
                + CAST(hg.surp_g AS DOUBLE) / CAST(ng.n_g AS DOUBLE)) / 2.0
             AS jsd_bits
    FROM ns
    JOIN hs ON hs.source = ns.source
    JOIN hm ON hm.source = ns.source
    CROSS JOIN ng CROSS JOIN hg
    """,
)
def source_token_jsd_vs_corpus(spark: SparkSession, sf: str):
    """JENSEN-SHANNON DIVERGENCE of each source's token distribution
    against the whole corpus, in exact floor-log2 bits: JSD(p,g) =
    H(m) - (H(p)+H(g))/2 with the mixture carried as the exact integer
    numerators m_num = c_s·N_g + c_g·N_s over M = 2·N_s·N_g (they sum
    to M exactly, so the mixture is a true distribution), and every
    entropy the integer-surprisal form Σ cnt·(flog2(N)-flog2(cnt))/N.
    The corpus-drift readout of the entropy family: high-JSD sources
    are vocabulary outliers (template farms, wrong-language crawls) —
    the between-slice twin of the per-user entropy.  Scale: token
    counts aggregate map-side on (source, tok); the mixture frame is
    |vocab| x |sources| rows (vocab-bounded x a small enumerable — the
    disclosed fan-out, NOT events-bounded), built from a broadcast of
    the 20-row per-source totals; everything else is 1-row folds.
    Overflow: c·N products need N_s·N_g < 2^62 — shard sources past
    ~1e9 tokens per side."""
    d = spread(t(spark, sf, "documents"), "doc_id")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    cs = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    ns = cs.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_s"),
        F.count("*").cast("long").alias("vocab_s"),
    )
    cg = cs.groupBy("tok").agg(F.sum("c").cast("long").alias("cgl"))
    ng = cg.agg(F.sum("cgl").cast("long").alias("n_g"))
    hs = (
        cs.join(F.broadcast(ns.select("source", "n_s")), "source")
        .groupBy("source")
        .agg(
            F.sum(
                F.col("c") * (_flog2(F.col("n_s")) - _flog2(F.col("c")))
            )
            .cast("long")
            .alias("surp_s")
        )
    )
    hg = cg.crossJoin(F.broadcast(ng)).agg(
        F.sum(F.col("cgl") * (_flog2(F.col("n_g")) - _flog2(F.col("cgl"))))
        .cast("long")
        .alias("surp_g")
    )
    mix = (
        cg.crossJoin(F.broadcast(ng))
        .crossJoin(F.broadcast(ns.select("source", "n_s")))
        .join(cs, ["source", "tok"], "left")
        .select(
            "source",
            (
                F.coalesce(F.col("c"), F.lit(0)) * F.col("n_g")
                + F.col("cgl") * F.col("n_s")
            ).alias("m_num"),
            (F.lit(2) * F.col("n_s") * F.col("n_g")).alias("m_tot"),
        )
    )
    hm = mix.groupBy("source").agg(
        F.max("m_tot").cast("long").alias("m_tot"),
        F.sum(F.col("m_num") * (_flog2(F.col("m_tot")) - _flog2(F.col("m_num"))))
        .cast("long")
        .alias("surp_m"),
    )
    out = (
        ns.join(hs, "source")
        .join(hm, "source")
        .crossJoin(F.broadcast(ng))
        .crossJoin(F.broadcast(hg))
    )
    return out.select(
        "source",
        F.col("n_s").alias("n_tok_source"),
        "vocab_s",
        F.col("n_g").alias("n_tok_corpus"),
        "surp_s",
        "surp_g",
        "surp_m",
        (
            F.col("surp_m").cast("double") / F.col("m_tot").cast("double")
            - (
                F.col("surp_s").cast("double") / F.col("n_s").cast("double")
                + F.col("surp_g").cast("double") / F.col("n_g").cast("double")
            )
            / F.lit(2.0)
        ).alias("jsd_bits"),
    )


# ---------------------------------------------------------------------------
@register(
    "trade_hits_hub_authority",
    """
    WITH e AS MATERIALIZED (
      -- MATERIALIZED is load-bearing at large SF: six round-joins
      -- reference e, and re-deriving the 45M-row (sf10) distinct join
      -- per reference spilled >60 GiB of DuckDB temp; materialized
      -- once it is ~720 MB (r14 session-5 sf10 adjudication)
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    a1 AS (SELECT s, CAST(COUNT(*) AS HUGEINT) AS a FROM e GROUP BY s),
    h1 AS (SELECT c, CAST(SUM(a) AS HUGEINT) AS h
           FROM e JOIN a1 USING (s) GROUP BY c),
    a2 AS (SELECT s, CAST(SUM(h) AS HUGEINT) AS a
           FROM e JOIN h1 USING (c) GROUP BY s),
    h2 AS (SELECT c, CAST(SUM(a) AS HUGEINT) AS h
           FROM e JOIN a2 USING (s) GROUP BY c),
    a3 AS (SELECT s, CAST(SUM(h) AS HUGEINT) AS a
           FROM e JOIN h2 USING (c) GROUP BY s),
    h3 AS (SELECT c, CAST(SUM(a) AS HUGEINT) AS h
           FROM e JOIN a3 USING (s) GROUP BY c),
    u AS (
      SELECT 's' || CAST(s AS VARCHAR) AS v, 'authority' AS role,
             CAST(a AS DECIMAL(38,0)) AS score FROM a3
      UNION ALL
      SELECT 'c' || CAST(c AS VARCHAR) AS v, 'hub' AS role,
             CAST(h AS DECIMAL(38,0)) AS score FROM h3
    )
    SELECT v, role, CAST(score AS VARCHAR) AS score,
           CAST(score AS DOUBLE)
             / CAST(SUM(score) OVER (PARTITION BY role) AS DOUBLE) AS share
    FROM u
    """,
)
def trade_hits_hub_authority(spark: SparkSession, sf: str):
    """HITS (Kleinberg hubs & authorities, 3 fixed rounds) over the
    directed customer -> supplier trade graph — the second link-analysis
    member next to PageRank, and the natural one for a BIPARTITE graph
    (hub customers buy from the important suppliers; authority suppliers
    are bought from by the important customers).  Key spelling insight:
    UNNORMALIZED iterations from the all-ones start stay INTEGER
    (a1 = in-degree, h1 = Σ a1 of successors, ...), so unlike PageRank's
    ordered float folds the per-round sums are plain map-side-combining
    aggregates — order-independent and bit-exact by construction, in
    DECIMAL(38,0) because scores grow like deg^round (int64 dies around
    sf1 by round 3).  Rankings equal the normalized algorithm's (scores
    are proportional); the normalized SHARE within each role is one
    final double division against the exact decimal role total.  Scale:
    the static distinct edge list drives every round; each round is one
    shuffle join (scores onto edges by the opposite endpoint's key) +
    one grouped sum — same exchange pattern as PageRank but with no
    fold-order machinery to pay for.  Three rounds, six joins, plan
    depth fixed."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = e.groupBy("s").agg(F.count("*").cast("decimal(38,0)").alias("a"))
    h = (
        e.join(a, "s")
        .groupBy("c")
        .agg(F.sum("a").cast("decimal(38,0)").alias("h"))
    )
    for _ in range(2):  # rounds 2 and 3
        a = (
            e.join(h, "c")
            .groupBy("s")
            .agg(F.sum("h").cast("decimal(38,0)").alias("a"))
        )
        h = (
            e.join(a, "s")
            .groupBy("c")
            .agg(F.sum("a").cast("decimal(38,0)").alias("h"))
        )
    u = a.select(
        F.concat(F.lit("s"), F.col("s").cast("string")).alias("v"),
        F.lit("authority").alias("role"),
        F.col("a").alias("score"),
    ).unionByName(
        h.select(
            F.concat(F.lit("c"), F.col("c").cast("string")).alias("v"),
            F.lit("hub").alias("role"),
            F.col("h").alias("score"),
        )
    )
    return u.select(
        "v",
        "role",
        # string conveyance: scores pass 2^53 around sf1 and duckdb's
        # .df() degrades DECIMAL to float64 (see the Spearman note)
        F.col("score").cast("string").alias("score"),
        (
            F.col("score").cast("double")
            / F.sum("score")
            .over(W.partitionBy("role"))
            .cast("decimal(38,0)")
            .cast("double")
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Batch 3 — the remaining two-sample tools: Mann-Whitney U (stochastic
# dominance, the rank-sum test next to KS's shape test and Welch's mean
# test) and the QQ decile drift table (the quantile-level view PSI's
# binning summarizes away).  Both reuse the KS insight: every statistic
# here is computable from the DISTINCT-VALUE DOMAIN (counts + one
# ordered cumulative pass), never from row-level ranks — the spelling
# that survives 100 TB.


@register(
    "events_mannwhitney_view_purchase",
    """
    WITH f AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
      FROM events
      WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ), g AS (
      SELECT vc,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t2
      FROM f GROUP BY vc
    ), c AS (
      SELECT vc, t1, t2, t1 + t2 AS t,
             COALESCE(CAST(SUM(t1 + t2) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS w
      FROM g
    ), s AS (
      SELECT CAST(SUM(t1) AS BIGINT) AS n1, CAST(SUM(t2) AS BIGINT) AS n2,
             CAST(SUM(t1 * (2 * w + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
      FROM c
    )
    SELECT n1 AS n_view, n2 AS n_purchase,
           r1_x2 - n1 * (n1 + 1) AS u_view_x2,
           2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u_purchase_x2,
           tie_term,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
                     AND (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                               * CAST(n1 + n2 AS DOUBLE)
                               * (CAST(n1 + n2 AS DOUBLE) - 1.0)
                             - CAST(tie_term AS DOUBLE)))
                         / (12.0 * CAST(n1 + n2 AS DOUBLE)
                            * (CAST(n1 + n2 AS DOUBLE) - 1.0)) > 0
           THEN
             CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
               / (2.0 * sqrt(
                   (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                         * CAST(n1 + n2 AS DOUBLE)
                         * (CAST(n1 + n2 AS DOUBLE) - 1.0)
                       - CAST(tie_term AS DOUBLE)))
                     / (12.0 * CAST(n1 + n2 AS DOUBLE)
                        * (CAST(n1 + n2 AS DOUBLE) - 1.0))))
           END AS mw_z,
           CASE WHEN n1 > 0 AND n2 > 0 THEN
             CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
               / CAST(n1 * n2 AS DOUBLE)
           END AS cliffs_delta
    FROM s
    """,
)
def events_mannwhitney_view_purchase(spark: SparkSession, sf: str):
    """MANN-WHITNEY U (Wilcoxon rank-sum) between 'view' and 'purchase'
    values — the stochastic-dominance member completing the two-sample
    toolkit (Welch = means, KS = shape, MW = does one distribution sit
    above the other), plus CLIFF'S DELTA as the distribution-free effect
    size (delta = 2U/(n1·n2) − 1, one division).  Everything derives
    from the DISTINCT-VALUE domain: with per-value counts (t1, t2) and
    the exclusive running total w, the doubled average rank of a tied
    block is 2w + t + 1, so the doubled rank sum is Σ t1·(2w+t+1) —
    exact int64, no row-level rank anywhere (the KS treatment; U in
    doubled units stays integral under tie-averaged ranks).  The
    normal-approximation z carries the full tie correction via the
    exact integer Σ(t³−t); both floats are single fixed trees over
    exact integers, guarded against the all-tied degenerate variance.
    Scale: one map-side-combined groupBy to the value domain + one
    domain-bounded cumulative pass + a 1-row fold.  Overflow: t1·2w ≤
    2n² — int64 to ~2e9 pooled events; Σ(t³−t) ≤ n·max_t² bounds the
    tie term the same way."""
    ev = t(spark, sf, "events")
    g = (
        ev.filter(
            F.col("event_type").isin("view", "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy(cents("value").alias("vc"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("t1"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("t2"),
        )
    )
    wprev = W.orderBy("vc").rowsBetween(W.unboundedPreceding, -1)
    c = g.select(
        "t1",
        "t2",
        (F.col("t1") + F.col("t2")).alias("t"),
        F.coalesce(
            F.sum(F.col("t1") + F.col("t2")).over(wprev).cast("long"),
            F.lit(0),
        ).alias("w"),
    )
    s = c.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum("t2").cast("long").alias("n2"),
        F.sum(F.col("t1") * (2 * F.col("w") + F.col("t") + 1))
        .cast("long")
        .alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1_x2 = F.col("r1_x2") - n1 * (n1 + 1)
    n_d = (n1 + n2).cast("double")
    var = (
        n1.cast("double")
        * n2.cast("double")
        * ((n_d + F.lit(1.0)) * n_d * (n_d - F.lit(1.0))
           - F.col("tie_term").cast("double"))
    ) / (F.lit(12.0) * n_d * (n_d - F.lit(1.0)))
    return s.select(
        n1.alias("n_view"),
        n2.alias("n_purchase"),
        u1_x2.alias("u_view_x2"),
        (2 * n1 * n2 - u1_x2).alias("u_purchase_x2"),
        "tie_term",
        F.when(
            (n1 > 0) & (n2 > 0) & (n1 + n2 >= 2),
            F.when(
                var > 0,
                (u1_x2 - n1 * n2).cast("double")
                / (F.lit(2.0) * F.sqrt(var)),
            ),
        ).alias("mw_z"),
        F.when(
            (n1 > 0) & (n2 > 0),
            (u1_x2 - n1 * n2).cast("double") / (n1 * n2).cast("double"),
        ).alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_value_qq_deciles_halves",
    """
    WITH f AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS vc,
             epoch_us(ts) // 86400000000 AS day
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ), mid AS (
      SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM f
    ), lab AS (
      SELECT vc, CASE WHEN day <= mid THEN 1 ELSE 0 END AS early
      FROM f CROSS JOIN mid
    ), g AS (
      SELECT early, vc, CAST(COUNT(*) AS BIGINT) AS t
      FROM lab GROUP BY early, vc
    ), c AS (
      SELECT early, vc,
             CAST(SUM(t) OVER (PARTITION BY early ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(t) OVER (PARTITION BY early) AS BIGINT) AS n
      FROM g
    ), q AS (SELECT unnest(generate_series(1, 9)) AS decile
    ), pick AS (
      SELECT q.decile, c.early,
             MIN(c.vc) AS v
      FROM q JOIN c
        ON c.cum >= (q.decile * c.n + 9) // 10
      GROUP BY q.decile, c.early
    )
    SELECT e.decile,
           e.v AS v_early_cents, l.v AS v_late_cents,
           l.v - e.v AS qq_shift_cents
    FROM (SELECT decile, v FROM pick WHERE early = 1) e
    JOIN (SELECT decile, v FROM pick WHERE early = 0) l
      ON l.decile = e.decile
    """,
)
def events_value_qq_deciles_halves(spark: SparkSession, sf: str):
    """QQ DECILE DRIFT TABLE between the early and late timeline halves:
    for each decile 1..9 the percentile_disc value of each half (exact
    integer rank pick k = ceil(q·n/10), smallest value with cum ≥ k)
    and the quantile shift in cents — the quantile-level drift view
    that PSI's fixed binning summarizes away and KS reduces to one max
    (a production drift triage reads all three: KS says IF, PSI says
    WHERE in probability mass, QQ says HOW MUCH in value units).  All
    integer: no interpolation, no floats anywhere.  Scale: per-half
    counts on the value domain (map-side combine), one domain-bounded
    cumulative window per half, and a 9-row decile frame joined by a
    range predicate + MIN — never a row-level sort.  The range join is
    9 × |domain| worst-case (domain-bounded, the banded-join
    treatment)."""
    ev = t(spark, sf, "events").withColumn("ts_us", F.expr("ts DIV 1000"))
    f = ev.filter(F.col("value").isNotNull() & F.col("ts").isNotNull()).select(
        cents("value").alias("vc"),
        F.expr("ts_us DIV 86400000000").alias("day"),
    )
    mid = f.agg(F.expr("(MIN(day) + MAX(day)) DIV 2").alias("mid"))
    lab = f.crossJoin(F.broadcast(mid)).select(
        "vc",
        F.when(F.col("day") <= F.col("mid"), 1).otherwise(0).alias("early"),
    )
    g = lab.groupBy("early", "vc").agg(F.count("*").cast("long").alias("t"))
    wc = W.partitionBy("early").orderBy("vc").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = g.select(
        "early",
        "vc",
        F.sum("t").over(wc).cast("long").alias("cum"),
        F.sum("t").over(W.partitionBy("early")).cast("long").alias("n"),
    )
    q = spark.range(1, 10).select(F.col("id").alias("decile"))
    pick = (
        F.broadcast(q)
        .join(
            c,
            F.col("cum") >= F.expr("(decile * n + 9) DIV 10"),
        )
        .groupBy("decile", "early")
        .agg(F.min("vc").alias("v"))
    )
    e = pick.filter(F.col("early") == 1).select(
        "decile", F.col("v").alias("v_early_cents")
    )
    late = pick.filter(F.col("early") == 0).select(
        "decile", F.col("v").alias("v_late_cents")
    )
    return e.join(late, "decile").select(
        "decile",
        "v_early_cents",
        "v_late_cents",
        (F.col("v_late_cents") - F.col("v_early_cents")).alias(
            "qq_shift_cents"
        ),
    )
