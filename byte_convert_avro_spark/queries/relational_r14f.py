"""Round-14 session-6 additions: the classifier/ranking EVALUATION
completion — the operating-characteristic readouts every model-gated
data pipeline reports before acting on a score.

Families and why they are NEW surface, not respellings:

- **Exact AUC via rank-sum** (``events_purchase_auc_rank_cells``): the
  existing eval ladder has the confusion matrix, kappa, per-class
  P/R/F1 — all THRESHOLDED metrics; AUC is the threshold-FREE ranking
  quality of a score (P(score_pos > score_neg) + ½P(=)), the first
  number a score ships with.  Spelled on the Mann-Whitney doubled-rank
  machinery (r2 = Σ tp·(2w+t+1) over the distinct-score domain), so
  the AUC numerator 2U = r2_pos − n_pos·(n_pos+1) is an EXACT integer
  and AUC itself is one guarded division.
- **Exact ROC at literal thresholds**
  (``events_purchase_roc_literal_thresholds``): the curve behind the
  area — (TPR, FPR, precision, Youden J) at 20 literal cent cutoffs,
  every cell an exact integer from one conditional fold over the score
  DOMAIN (never rows), output bounded at 20 rows at any scale.
- **Decile lift / cumulative gains**
  (``events_purchase_decile_lift``): the campaign-targeting readout —
  rank by score, cut into score-deciles, report per-decile and
  cumulative capture vs the random baseline.  Deciles come from the
  exact DOMAIN-cumulative row positions (the QQ/median order-statistic
  machinery: a distinct score value never straddles deciles, so no
  row-scale NTILE window exists); lift is one division of exact-int
  products.
- **MRR@5** (``truncated_dim_mrr_at5``): retrieval eval has recall@3
  (set overlap) and NDCG@5 (graded order); MRR is the FIRST-HIT
  statistic ("how far down is the first relevant result") every
  search/RAG dashboard shows next to them.  Reciprocal ranks are
  conveyed EXACTLY as ``rr_x60 = 60 div rank`` (60 = lcm(1..5), so
  60/rank is an integer for every rank ≤ 5); the float rr is one
  division by the literal 60.
- **McNemar's paired test**
  (``langid_mcnemar_stopword_vs_conjunction``): kappa measures
  agreement OF one classifier with truth; McNemar decides whether TWO
  classifiers differ — the paired A/B gate for swapping heuristics.
  Classifier A is the shipped article-marker langid; B is a
  conjunction-marker twin (and/und/et/y) built from the same
  occurrence-count primitive; the discordant cells n01/n10 are exact
  ints and both chi² forms are single guarded divisions.

Cross-engine float discipline (the welch_t/KW rules): every float is
ONE fixed expression tree over exact-integer inputs with
conditionally-evaluated guarded divisions; wide integers (the doubled
rank sums, which pass 2^53 near 7e7 pooled rows) convey as digit
strings via the DECIMAL(38,0) rule.

Reference parity note: the reference (AvroTransform.java, 337-LoC
Kafka-Connect SMT) has none of these operators — all belong to the
analytics/LLM-pipeline addendum SURVEY.md §2 mandates on top of the
decode pipeline.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import (
    cents,
    register,
    t,
)

#: Literal ROC cutoffs in cents: predict positive when score >= cutoff.
#: 0 anchors the (FPR=1, TPR=1) corner; the top cutoff clears the data
#: max (49_002) so the (0, 0) corner is on the curve too.
_ROC_CUTS = list(range(0, 50_001, 2_500))

_DEC_STR = "CAST(CAST({x} AS DECIMAL(38,0)) AS VARCHAR)"


def _purchase_score_domain(spark: SparkSession, sf: str):
    """(vc, t, tp) over the distinct score domain: score = value cents,
    positive = purchase events, negative = every other event type."""
    ev = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    return (
        ev.select(
            cents("value").alias("vc"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
        )
        .groupBy("vc")
        .agg(
            F.count("*").cast("long").alias("t"),
            F.sum("pos").cast("long").alias("tp"),
        )
    )


_PURCHASE_DOMAIN_SQL = """
    f AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS vc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ), dom AS (
      SELECT vc, CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(pos) AS BIGINT) AS tp
      FROM f GROUP BY vc
    )"""


# ---------------------------------------------------------------------------
#: Shared by the batch entry and its streaming twin (the PSI pattern).
EVENTS_AUC_SQL = f"""
    WITH {_PURCHASE_DOMAIN_SQL}, gt AS (
      SELECT vc, t, tp,
             COALESCE(CAST(SUM(t) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS w
      FROM dom
    ), agg AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(tp) AS BIGINT) AS n_pos,
             CAST(SUM(tp * (2 * w + t + 1)) AS BIGINT) AS r2_pos
      FROM gt
    )
    SELECT n_pos, n - n_pos AS n_neg,
           {_DEC_STR.format(x="r2_pos")} AS r2_pos,
           {_DEC_STR.format(x="r2_pos - n_pos * (n_pos + 1)")} AS auc_num_x2,
           CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
             CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE))
           END AS auc
    FROM agg
    """


def auc_rank_finalize(dom):
    """(vc, t, tp) score-domain counts -> the one-row exact AUC cells
    (shared finalize of ``events_purchase_auc_rank_cells`` and its
    streaming twin): domain cumulative -> doubled positive rank sum ->
    2U integer -> one guarded division."""
    wprev = W.orderBy("vc").rowsBetween(W.unboundedPreceding, -1)
    gt = dom.select(
        "vc",
        "t",
        "tp",
        F.coalesce(F.sum("t").over(wprev).cast("long"), F.lit(0)).alias("w"),
    )
    agg = gt.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("tp").cast("long").alias("n_pos"),
        F.sum(F.col("tp") * (2 * F.col("w") + F.col("t") + 1))
        .cast("long")
        .alias("r2_pos"),
    )
    num = F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    n_neg = F.col("n") - F.col("n_pos")
    return agg.select(
        "n_pos",
        n_neg.alias("n_neg"),
        F.col("r2_pos").cast("decimal(38,0)").cast("string").alias("r2_pos"),
        num.cast("decimal(38,0)").cast("string").alias("auc_num_x2"),
        F.when(
            (F.col("n_pos") > 0) & (n_neg > 0),
            num.cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * n_neg.cast("double")
            ),
        ).alias("auc"),
    )


@register("events_purchase_auc_rank_cells", EVENTS_AUC_SQL)
def events_purchase_auc_rank_cells(spark: SparkSession, sf: str):
    """EXACT AUC of "value predicts purchase" via the rank-sum identity
    AUC = U/(n_pos·n_neg) with tie-averaged ranks — the threshold-free
    companion of the confusion-matrix/P-R-F1 ladder.  The doubled
    positive rank sum ``r2_pos = Σ tp·(2w+t+1)`` comes from the
    distinct-cents DOMAIN cumulative (the MW machinery — ties
    contribute their exact average rank), so ``2U = r2_pos −
    n_pos·(n_pos+1)`` is an exact integer and AUC is ONE guarded
    division.  r2_pos and 2U convey as digit strings (they pass 2^53
    near 7e7 pooled rows — the round-14c DECIMAL rule).  Scale: one
    map-side-combined groupBy to the value domain + one domain-bounded
    cumulative window + a single-row fold; no row-scale window, no
    shuffle beyond the domain."""
    return auc_rank_finalize(_purchase_score_domain(spark, sf))


# ---------------------------------------------------------------------------
@register(
    "events_purchase_roc_literal_thresholds",
    f"""
    WITH {_PURCHASE_DOMAIN_SQL}, tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n, CAST(SUM(tp) AS BIGINT) AS n_pos
      FROM dom
    ), cuts AS (
      SELECT CAST(unnest([{", ".join(str(c) for c in _ROC_CUTS)}]) AS BIGINT)
        AS cut
    ), cells AS (
      SELECT c.cut,
             CAST(COALESCE(SUM(CASE WHEN d.vc >= c.cut THEN d.tp END), 0)
                  AS BIGINT) AS tp,
             CAST(COALESCE(SUM(CASE WHEN d.vc >= c.cut THEN d.t - d.tp END),
                  0) AS BIGINT) AS fp
      FROM cuts c LEFT JOIN dom d ON TRUE
      GROUP BY c.cut
    )
    SELECT cells.cut, tp, fp,
           tot.n_pos - tp AS fn,
           (tot.n - tot.n_pos) - fp AS tn,
           CASE WHEN tot.n_pos > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tot.n_pos AS DOUBLE) END AS tpr,
           CASE WHEN tot.n - tot.n_pos > 0 THEN
             CAST(fp AS DOUBLE) / CAST(tot.n - tot.n_pos AS DOUBLE)
           END AS fpr,
           CASE WHEN tp + fp > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
           CASE WHEN tot.n_pos > 0 AND tot.n - tot.n_pos > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tot.n_pos AS DOUBLE)
               - CAST(fp AS DOUBLE) / CAST(tot.n - tot.n_pos AS DOUBLE)
           END AS youden_j
    FROM cells CROSS JOIN tot
    ORDER BY cells.cut
    """,
)
def events_purchase_roc_literal_thresholds(spark: SparkSession, sf: str):
    """EXACT ROC OPERATING POINTS at 20 literal cent cutoffs (predict
    purchase when value ≥ cutoff): per cutoff the full confusion cell
    block (tp/fp/fn/tn, exact ints) plus TPR, FPR, precision and
    Youden's J — each a guarded division (J is the difference of the
    two, a fixed two-division tree).  The curve behind
    ``events_purchase_auc_rank_cells``; cutoffs are LITERALS in both
    engines so output is 20 rows at ANY scale.  Scale: the conditional
    folds run over the distinct-cents DOMAIN (bounded by the value
    range, not row count) against 20 broadcast cutoffs — one
    domain-bounded join, one 20-group aggregate, no row-scale
    anything."""
    dom = _purchase_score_domain(spark, sf)
    tot = dom.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("tp").cast("long").alias("n_pos"),
    )
    cuts = spark.createDataFrame(
        [(c,) for c in _ROC_CUTS], schema="cut long"
    )
    # left join FROM the literal cuts (not a crossJoin from dom) so all
    # 20 operating points survive even an empty/filtered-out domain —
    # the hll_intersection empty-side lesson.
    cells = (
        cuts.join(dom, F.lit(True), "left")
        .groupBy("cut")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("vc") >= F.col("cut"), F.col("tp"))),
                F.lit(0),
            )
            .cast("long")
            .alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("vc") >= F.col("cut"),
                        F.col("t") - F.col("tp"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("fp"),
        )
    )
    n_neg = F.col("n") - F.col("n_pos")
    tpr = F.col("tp").cast("double") / F.col("n_pos").cast("double")
    fpr = F.col("fp").cast("double") / n_neg.cast("double")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "cut",
            "tp",
            "fp",
            (F.col("n_pos") - F.col("tp")).alias("fn"),
            (n_neg - F.col("fp")).alias("tn"),
            F.when(F.col("n_pos") > 0, tpr).alias("tpr"),
            F.when(n_neg > 0, fpr).alias("fpr"),
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.col("tp").cast("double")
                / (F.col("tp") + F.col("fp")).cast("double"),
            ).alias("prec"),
            F.when((F.col("n_pos") > 0) & (n_neg > 0), tpr - fpr).alias(
                "youden_j"
            ),
        )
        .orderBy("cut")
    )


# ---------------------------------------------------------------------------
@register(
    "events_purchase_decile_lift",
    f"""
    WITH {_PURCHASE_DOMAIN_SQL}, tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n, CAST(SUM(tp) AS BIGINT) AS n_pos
      FROM dom
    ), gt AS (
      SELECT vc, t, tp,
             COALESCE(CAST(SUM(t) OVER (ORDER BY vc DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS rd
      FROM dom
    ), dd AS (
      SELECT CAST(gt.rd * 10 // tot.n AS BIGINT) + 1 AS decile,
             gt.vc, gt.t, gt.tp
      FROM gt CROSS JOIN tot
    ), dec AS (
      SELECT decile,
             CAST(SUM(t) AS BIGINT) AS n_rows,
             CAST(SUM(tp) AS BIGINT) AS n_pos,
             CAST(MAX(vc) AS BIGINT) AS max_vc,
             CAST(MIN(vc) AS BIGINT) AS min_vc
      FROM dd GROUP BY decile
    ), cum AS (
      SELECT decile, n_rows, n_pos, max_vc, min_vc,
             CAST(SUM(n_rows) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_rows,
             CAST(SUM(n_pos) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_pos
      FROM dec
    )
    SELECT cum.decile, n_rows, cum.n_pos, max_vc, min_vc, cum_rows, cum_pos,
           CASE WHEN tot.n_pos > 0 THEN
             CAST(cum_pos AS DOUBLE) / CAST(tot.n_pos AS DOUBLE)
           END AS cum_capture,
           CASE WHEN cum_rows > 0 AND tot.n_pos > 0 THEN
             CAST(cum_pos * tot.n AS DOUBLE)
               / CAST(cum_rows * tot.n_pos AS DOUBLE)
           END AS cum_lift
    FROM cum CROSS JOIN tot
    ORDER BY cum.decile
    """,
)
def events_purchase_decile_lift(spark: SparkSession, sf: str):
    """DECILE LIFT / CUMULATIVE GAINS of "value predicts purchase" —
    rank events by score descending, cut into ten SCORE-DOMAIN deciles,
    report each decile's size, positives, cumulative capture
    (cum_pos/total_pos) and cumulative lift ((cum_pos·N)/(cum_rows·P),
    exact-int products, one division) — the "top 10% of scores captures
    X% of conversions" targeting table.  Deciles are assigned on the
    DOMAIN: a distinct score value lands wholly in decile ``rd·10 div
    N + 1`` where rd is its exclusive from-the-top row position (exact
    domain cumulative), so tied rows never straddle deciles (sizes may
    be unequal — n_rows discloses it) and NO row-scale NTILE window
    exists.  Scale: domain groupBy + two ≤10-row windows; all
    magnitudes ≤ rd·10 ≈ 10N, inside int64 at any conceivable SF."""
    dom = _purchase_score_domain(spark, sf)
    tot = dom.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("tp").cast("long").alias("n_pos"),
    )
    wdesc = W.orderBy(F.col("vc").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    gt = dom.select(
        "vc",
        "t",
        "tp",
        F.coalesce(F.sum("t").over(wdesc).cast("long"), F.lit(0)).alias(
            "rd"
        ),
    )
    dd = gt.crossJoin(F.broadcast(tot)).select(
        (F.expr("rd * 10 div n") + 1).cast("long").alias("decile"),
        "vc",
        "t",
        "tp",
    )
    dec = dd.groupBy("decile").agg(
        F.sum("t").cast("long").alias("n_rows"),
        F.sum("tp").cast("long").alias("n_pos"),
        F.max("vc").cast("long").alias("max_vc"),
        F.min("vc").cast("long").alias("min_vc"),
    )
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = dec.select(
        "decile",
        "n_rows",
        "n_pos",
        "max_vc",
        "min_vc",
        F.sum("n_rows").over(wcum).cast("long").alias("cum_rows"),
        F.sum("n_pos").over(wcum).cast("long").alias("cum_pos"),
    )
    tot2 = tot.select(
        F.col("n").alias("tot_n"), F.col("n_pos").alias("tot_pos")
    )
    return (
        cum.crossJoin(F.broadcast(tot2))
        .select(
            "decile",
            "n_rows",
            "n_pos",
            "max_vc",
            "min_vc",
            "cum_rows",
            "cum_pos",
            F.when(
                F.col("tot_pos") > 0,
                F.col("cum_pos").cast("double")
                / F.col("tot_pos").cast("double"),
            ).alias("cum_capture"),
            F.when(
                (F.col("cum_rows") > 0) & (F.col("tot_pos") > 0),
                (F.col("cum_pos") * F.col("tot_n")).cast("double")
                / (F.col("cum_rows") * F.col("tot_pos")).cast("double"),
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
def _mrr_sql() -> str:
    from byte_convert_avro_spark.queries.vectors import _DOT_SQL, DIM

    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    n AS (SELECT vec_id, e, e[1:16] AS p,
                 sqrt({_DOT_SQL.format(n=DIM, a="e", b="e")}) AS nrm,
                 sqrt({_DOT_SQL.format(n=16, a="e", b="e")}) AS pnrm
          FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, p AS qp, nrm AS qn, pnrm AS qpn
          FROM n WHERE vec_id < 5),
    c AS (SELECT vec_id, e, p, nrm, pnrm FROM n WHERE vec_id >= 5),
    sims AS (
      SELECT q.qid, c.vec_id,
             ROUND({_DOT_SQL.format(n=DIM, a="c.e", b="q.qe")}
                   / (c.nrm * q.qn), 4) AS sim_full,
             ROUND({_DOT_SQL.format(n=16, a="c.p", b="q.qp")}
                   / (c.pnrm * q.qpn), 4) AS sim_trunc
      FROM c CROSS JOIN q
    ),
    rf AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim_full DESC, vec_id) AS r
           FROM sims),
    rt AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim_trunc DESC, vec_id) AS r
           FROM sims),
    j AS (
      SELECT t.qid, t.r AS pos,
             CASE WHEN f.r <= 5 THEN 1 ELSE 0 END AS rel
      FROM rt t
      LEFT JOIN rf f ON f.qid = t.qid AND f.vec_id = t.vec_id
      WHERE t.r <= 5
    ),
    d AS (
      SELECT qid,
             CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN pos END), 0)
                  AS BIGINT) AS first_rel_pos,
             CAST(SUM(rel) AS BIGINT) AS n_rel_at5
      FROM j GROUP BY qid
    )
    SELECT qid, first_rel_pos, n_rel_at5,
           CAST(CASE WHEN first_rel_pos > 0 THEN 60 // first_rel_pos
                ELSE 0 END AS BIGINT) AS rr_x60,
           CAST(CASE WHEN first_rel_pos > 0 THEN 60 // first_rel_pos
                ELSE 0 END AS DOUBLE) / 60.0 AS rr
    FROM d ORDER BY qid
    """


@register("truncated_dim_mrr_at5", _mrr_sql())
def truncated_dim_mrr_at5(spark: SparkSession, sf: str):
    """MRR@5 of truncated-embedding retrieval — the FIRST-HIT companion
    of ``truncated_dim_recall_at3`` (set overlap) and
    ``truncated_dim_ndcg_at5`` (graded order): per query, the position
    of the first 16-dim-prefix result that the exact full-dim top-5
    also contains, and its reciprocal.  Reciprocal ranks convey EXACTLY
    as ``rr_x60 = 60 div first_rel_pos`` (60 = lcm(1..5) makes the
    division exact for every rank ≤ 5; 0 = no hit), so the global MRR
    is a reader-side integer fold Σrr_x60/(60·|Q|) and the per-query
    float ``rr`` is one division by the literal 60.  Same broadcast
    all-pairs baseline as the sibling entries (the correctness rung —
    the 100 TB path routes through IVF first); rankings tie-break on
    (sim, vec_id) in both engines."""
    from byte_convert_avro_spark.queries.vectors import _DOT, _emb

    e = _emb(spark, sf).select(
        "vec_id",
        "e",
        F.slice("e", 1, 16).alias("p"),
        F.sqrt(F.expr(_DOT.format(a="e", b="e"))).alias("nrm"),
        F.sqrt(
            F.expr(_DOT.format(a="slice(e, 1, 16)", b="slice(e, 1, 16)"))
        ).alias("pnrm"),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("p").alias("qp"),
        F.col("nrm").alias("qn"),
        F.col("pnrm").alias("qpn"),
    )
    c = e.filter(F.col("vec_id") >= 5)
    sims = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(
            F.expr(_DOT.format(a="e", b="qe")) / (F.col("nrm") * F.col("qn")),
            4,
        ).alias("sim_full"),
        F.round(
            F.expr(_DOT.format(a="p", b="qp"))
            / (F.col("pnrm") * F.col("qpn")),
            4,
        ).alias("sim_trunc"),
    )
    wf = W.partitionBy("qid").orderBy(F.col("sim_full").desc(), "vec_id")
    wt = W.partitionBy("qid").orderBy(F.col("sim_trunc").desc(), "vec_id")
    rf = sims.select("qid", "vec_id", F.row_number().over(wf).alias("r"))
    rt = sims.select("qid", "vec_id", F.row_number().over(wt).alias("r"))
    j = (
        rt.filter(F.col("r") <= 5)
        .alias("t")
        .join(
            rf.alias("f"),
            (F.col("f.qid") == F.col("t.qid"))
            & (F.col("f.vec_id") == F.col("t.vec_id")),
            "left",
        )
        .select(
            F.col("t.qid").alias("qid"),
            F.col("t.r").alias("pos"),
            F.when(F.col("f.r") <= 5, 1).otherwise(0).alias("rel"),
        )
    )
    d = j.groupBy("qid").agg(
        F.coalesce(F.min(F.when(F.col("rel") == 1, F.col("pos"))), F.lit(0))
        .cast("long")
        .alias("first_rel_pos"),
        F.sum("rel").cast("long").alias("n_rel_at5"),
    )
    rr60 = F.when(
        F.col("first_rel_pos") > 0,
        F.expr("60 div first_rel_pos"),
    ).otherwise(0)
    return d.select(
        "qid",
        "first_rel_pos",
        "n_rel_at5",
        rr60.cast("long").alias("rr_x60"),
        (rr60.cast("double") / F.lit(60.0)).alias("rr"),
    ).orderBy("qid")


# ---------------------------------------------------------------------------
def _langid_two_classifier_sql() -> str:
    """Both heuristics' scoring as one CTE chain: A = article markers
    (the shipped ``lang_id_heuristic`` spelling, queries/text.py), B =
    conjunction markers over the same occurrence-count primitive."""
    def score(marker: str) -> str:
        return (
            f"(LENGTH(text) - LENGTH(REPLACE(' ' || text || ' ', "
            f"'{marker}', '')) + 2) / {len(marker)}"
        )

    def cascade(p: str) -> str:
        return f"""CASE
        WHEN {p}_en >= {p}_de AND {p}_en >= {p}_fr AND {p}_en >= {p}_es
             AND {p}_en > 0 THEN 'en'
        WHEN {p}_de >= {p}_fr AND {p}_de >= {p}_es AND {p}_de > 0 THEN 'de'
        WHEN {p}_fr >= {p}_es AND {p}_fr > 0 THEN 'fr'
        WHEN {p}_es > 0 THEN 'es'
        ELSE 'unknown' END"""

    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
        {score(" the ")} AS a_en, {score(" der ")} AS a_de,
        {score(" le ")} AS a_fr, {score(" el ")} AS a_es,
        {score(" and ")} AS b_en, {score(" und ")} AS b_de,
        {score(" et ")} AS b_fr, {score(" y ")} AS b_es
      FROM documents
    ), pred AS (
      SELECT doc_id, lang,
             {cascade("a")} AS guess_a,
             {cascade("b")} AS guess_b
      FROM scored
    ), cells AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN guess_a = lang AND guess_b = lang
                 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN guess_a = lang AND guess_b <> lang
                 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN guess_a <> lang AND guess_b = lang
                 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(SUM(CASE WHEN guess_a <> lang AND guess_b <> lang
                 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM pred
    )
    SELECT n_docs, n11, n10, n01, n00,
           CASE WHEN n_docs > 0 THEN
             CAST(n11 + n10 AS DOUBLE) / CAST(n_docs AS DOUBLE)
           END AS acc_a,
           CASE WHEN n_docs > 0 THEN
             CAST(n11 + n01 AS DOUBLE) / CAST(n_docs AS DOUBLE)
           END AS acc_b,
           CASE WHEN n01 + n10 > 0 THEN
             CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
               / CAST(n01 + n10 AS DOUBLE)
           END AS mcnemar_chi2,
           CASE WHEN n01 + n10 > 0 THEN
             CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1) AS DOUBLE)
               / CAST(n01 + n10 AS DOUBLE)
           END AS mcnemar_chi2_cc
    FROM cells
    """


@register(
    "langid_mcnemar_stopword_vs_conjunction",
    _langid_two_classifier_sql(),
)
def langid_mcnemar_stopword_vs_conjunction(spark: SparkSession, sf: str):
    """McNEMAR'S PAIRED TEST between two langid heuristics on the same
    documents — the A/B gate for swapping classifiers, completing the
    eval ladder (confusion matrix → kappa → P/R/F1 measure ONE
    classifier; McNemar compares TWO on paired predictions).
    Classifier A = the shipped article-marker heuristic (the/der/le/el
    — ``lang_id_heuristic``'s exact spelling); B = a conjunction-marker
    twin (and/und/et/y) over the same occurrence-count-by-length-delta
    primitive.  The decision cells n11/n10/n01/n00 (A-correct ×
    B-correct vs the labeled ``lang``) are exact integers; both χ²
    forms ((n10−n01)²/(n01+n10) and the continuity-corrected
    (|n10−n01|−1)²/(n01+n10)) and the two accuracies are single guarded
    divisions.  Scale: one row-local projection (string ops only) + one
    single-row fold — embarrassingly parallel, no shuffle."""
    d = t(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))

    def score(marker: str):
        return (
            F.length("text")
            - F.length(
                F.regexp_replace(padded, marker.replace(" ", "\\ "), "")
            )
            + 2
        ) / len(marker)

    def cascade(p: str):
        c = {s: F.col(f"{p}_{s}") for s in ("en", "de", "fr", "es")}
        return (
            F.when(
                (c["en"] >= c["de"])
                & (c["en"] >= c["fr"])
                & (c["en"] >= c["es"])
                & (c["en"] > 0),
                "en",
            )
            .when(
                (c["de"] >= c["fr"]) & (c["de"] >= c["es"]) & (c["de"] > 0),
                "de",
            )
            .when((c["fr"] >= c["es"]) & (c["fr"] > 0), "fr")
            .when(c["es"] > 0, "es")
            .otherwise("unknown")
        )

    sc = d.select(
        "doc_id",
        "lang",
        score(" the ").alias("a_en"),
        score(" der ").alias("a_de"),
        score(" le ").alias("a_fr"),
        score(" el ").alias("a_es"),
        score(" and ").alias("b_en"),
        score(" und ").alias("b_de"),
        score(" et ").alias("b_fr"),
        score(" y ").alias("b_es"),
    )
    pred = sc.select(
        "lang",
        cascade("a").alias("guess_a"),
        cascade("b").alias("guess_b"),
    )
    a_ok = F.col("guess_a") == F.col("lang")
    b_ok = F.col("guess_b") == F.col("lang")
    cells = pred.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((a_ok & b_ok).cast("int")).cast("long").alias("n11"),
        F.sum((a_ok & ~b_ok).cast("int")).cast("long").alias("n10"),
        F.sum((~a_ok & b_ok).cast("int")).cast("long").alias("n01"),
        F.sum((~a_ok & ~b_ok).cast("int")).cast("long").alias("n00"),
    )
    disc = F.col("n01") + F.col("n10")
    diff = F.col("n10") - F.col("n01")
    return cells.select(
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(
            F.col("n_docs") > 0,
            (F.col("n11") + F.col("n10")).cast("double")
            / F.col("n_docs").cast("double"),
        ).alias("acc_a"),
        F.when(
            F.col("n_docs") > 0,
            (F.col("n11") + F.col("n01")).cast("double")
            / F.col("n_docs").cast("double"),
        ).alias("acc_b"),
        F.when(
            disc > 0, (diff * diff).cast("double") / disc.cast("double")
        ).alias("mcnemar_chi2"),
        F.when(
            disc > 0,
            ((F.abs(diff) - 1) * (F.abs(diff) - 1)).cast("double")
            / disc.cast("double"),
        ).alias("mcnemar_chi2_cc"),
    )


# ---------------------------------------------------------------------------
# Clustering QUALITY eval for the kmeans/IVF family: the trained k=8
# Lloyd's centroids (the exact CTE twin _kmeans_sql_cte proven by
# kmeans_centroids_k8) scored by simplified silhouette (per point) and
# Davies-Bouldin cells (per cluster).


def _kmeans_cent3_prefix() -> str:
    from byte_convert_avro_spark.queries.pipeline_ops import _kmeans_sql_cte

    return _kmeans_sql_cte(8, 3)


_SIL_DIST_SQL = """
    dist AS (
      SELECT v.vec_id, c.cell,
             list_reduce(list_transform(generate_series(1, 64),
                         i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i])),
                         (a, b) -> a + b) AS d2
      FROM v CROSS JOIN cent3 c
    ), rk AS (
      SELECT vec_id, cell, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2, cell) AS rn
      FROM dist
    ), pt AS (
      SELECT vec_id,
             MAX(CASE WHEN rn = 1 THEN cell END) AS cell,
             MAX(CASE WHEN rn = 1 THEN d2 END) AS a2,
             MAX(CASE WHEN rn = 2 THEN d2 END) AS b2
      FROM rk WHERE rn <= 2 GROUP BY vec_id
    )"""


def _lloyd_cents(spark: SparkSession, sf: str):
    """Train the k=8/3-round Lloyd's centroids and return them BOTH as
    the literal list (for row-local distance expressions) and the tiny
    DataFrame (for the pair stage)."""
    from byte_convert_avro_spark.operators import similarity as S
    from byte_convert_avro_spark.queries.base import spread

    emb = spread(t(spark, sf, "embeddings"), "vec_id")
    cents = S.kmeans_lloyd(
        emb, "embedding", "vec_id", k=8, n_iter=3, fold_chunk=128
    )
    crows = cents.orderBy("cell").collect()  # k×dim by construction
    lits = [(int(r.cell), [float(x) for x in r.embedding]) for r in crows]
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return e, cents, lits


def _point_cells(lits):
    """Row-local (cell, a2, b2) via the kmeans literal-argmin pattern:
    d2 to every centroid as one fixed fold per literal vector, own cell
    = first index of the min (ties to the lowest cell id — the lloyd
    assignment rule), b2 = second-smallest by value."""
    from byte_convert_avro_spark.operators.similarity import _d2_sql

    # one parsed expression per output (not k x dim F.lit py4j calls —
    # the r14 kmeans fix); identical zip_with/aggregate fold
    d2s = "array(" + ", ".join(_d2_sql(vec, "e") for _, vec in lits) + ")"
    cells = "array(" + ", ".join(f"{c}L" for c, _ in lits) + ")"
    return (
        F.expr(
            f"element_at({cells}, "
            f"cast(array_position({d2s}, array_min({d2s})) as int))"
        ).alias("cell"),
        F.expr(f"element_at(array_sort({d2s}), 1)").alias("a2"),
        F.expr(f"element_at(array_sort({d2s}), 2)").alias("b2"),
    )


@register(
    "kmeans_silhouette_simplified",
    f"""
    WITH {_kmeans_cent3_prefix()},
    {_SIL_DIST_SQL}
    SELECT vec_id, cell,
           sqrt(a2) AS a, sqrt(b2) AS b,
           CASE WHEN GREATEST(sqrt(a2), sqrt(b2)) > 0 THEN
             (sqrt(b2) - sqrt(a2)) / GREATEST(sqrt(a2), sqrt(b2))
           ELSE 0.0 END AS sil
    FROM pt ORDER BY vec_id
    """,
)
def kmeans_silhouette_simplified(spark: SparkSession, sf: str):
    """SIMPLIFIED SILHOUETTE per vector over the trained k=8 Lloyd's
    centroids — the clustering-quality readout of the ANN family
    (centroids from the SAME bit-gated training as
    ``kmeans_centroids_k8``): a = distance to the assigned (nearest)
    centroid, b = distance to the best OTHER centroid, sil =
    (b−a)/max(a,b) ∈ [0, 1] here (a is the min by construction).  The
    centroid-based form is the linear-cost stand-in for full silhouette
    (whose pairwise a/b is O(n²) — never at 100 TB); every value is a
    fixed IEEE tree per ROW (the lloyd distance fold + correctly-rounded
    sqrt + one guarded division) so no cross-row float exists at all.
    Scale: training is the gated k×dim-state operator; scoring is one
    row-local pass over k literal distance expressions — no join, no
    shuffle, embarrassingly parallel."""
    e, _, lits = _lloyd_cents(spark, sf)
    pc = e.select("vec_id", *_point_cells(lits))
    a = F.sqrt("a2")
    b = F.sqrt("b2")
    mx = F.greatest(a, b)
    return pc.select(
        "vec_id",
        "cell",
        a.alias("a"),
        b.alias("b"),
        F.when(mx > 0, (b - a) / mx).otherwise(F.lit(0.0)).alias("sil"),
    ).orderBy("vec_id")


@register(
    "kmeans_davies_bouldin_cells",
    f"""
    WITH {_kmeans_cent3_prefix()},
    {_SIL_DIST_SQL}, sd AS (
      SELECT cell, vec_id // 128 AS chk,
             list_reduce(list(sqrt(a2) ORDER BY vec_id),
                         (x, y) -> x + y) AS csum,
             COUNT(*) AS cnt
      FROM pt GROUP BY cell, chk
    ), sc AS (
      SELECT cell,
             list_reduce(list(csum ORDER BY chk), (x, y) -> x + y)
               / SUM(cnt) AS s,
             CAST(SUM(cnt) AS BIGINT) AS n
      FROM sd GROUP BY cell
    ), cd AS (
      SELECT a.cell AS ca, b.cell AS cb,
             sqrt(list_reduce(list_transform(generate_series(1, 64),
                  i -> (a.ce[i] - b.ce[i]) * (a.ce[i] - b.ce[i])),
                  (x, y) -> x + y)) AS d
      FROM cent3 a JOIN cent3 b ON a.cell <> b.cell
    ), rr AS (
      SELECT cd.ca AS cell,
             MAX(CASE WHEN cd.d > 0 THEN (sa.s + sb.s) / cd.d END)
               AS db_contrib
      FROM cd
      JOIN sc sa ON sa.cell = cd.ca
      JOIN sc sb ON sb.cell = cd.cb
      GROUP BY cd.ca
    )
    SELECT sc.cell, sc.n, sc.s AS scatter, rr.db_contrib
    FROM sc JOIN rr USING (cell) ORDER BY sc.cell
    """,
)
def kmeans_davies_bouldin_cells(spark: SparkSession, sf: str):
    """DAVIES-BOULDIN cells over the trained k=8 Lloyd's clustering —
    the per-CLUSTER companion of ``kmeans_silhouette_simplified``: each
    cluster's scatter s_i (mean member distance to its centroid, summed
    via the SAME bounded two-level vec_id-ordered chunk fold as the
    centroid update itself — functions.bounded_ordered_agg, chunk 128,
    so the float is bit-identical cross-engine) and its DB contribution
    max_{{j≠i}} (s_i+s_j)/d(c_i,c_j) (MAX over ≤ k−1 doubles is
    order-independent; each ratio is one guarded division; centroid
    distances reuse the lloyd fold).  The DB index itself is the
    reader-side mean of db_contrib over ≤ k rows.  Scale: one
    row-local assignment pass + one (cell)-keyed bounded fold + a k²
    driver-side-free pair join of the k-row centroid table."""
    from byte_convert_avro_spark.functions import bounded_ordered_agg

    e, cents, lits = _lloyd_cents(spark, sf)
    pc = e.select("vec_id", *_point_cells(lits))
    dist = pc.select(
        "cell",
        F.col("vec_id").alias("id"),
        F.sqrt("a2").alias("x"),
    )
    # <= k rows from the expensive subtree (full scoring pass + bounded
    # fold), referenced THREE times below (sa, sb, the final join) —
    # without the lazy checkpoint each reference re-ran the whole
    # assignment + fold pipeline (r15; the r14g tiny-frame checkpoint
    # trade: recompute is corpus-scale, the frame is k rows).
    sc = (
        bounded_ordered_agg(dist, ["cell"], "id", "x", chunk=128)
        .select(
            "cell",
            (F.col("osum") / F.col("ocnt")).alias("s"),
            F.col("ocnt").cast("long").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    # k-row frames: coalesce to one partition and broadcast the probe
    # side so the non-equi pair join is k² rows in a handful of tasks,
    # not a |parts|² nested-loop fan-out.
    c1 = cents.coalesce(1)
    a = c1.select(
        F.col("cell").alias("ca"),
        F.col("embedding").alias("ea"),
    )
    b = c1.select(
        F.col("cell").alias("cb"),
        F.col("embedding").alias("eb"),
    )
    cd = a.join(F.broadcast(b), F.col("ca") != F.col("cb")).select(
        "ca",
        "cb",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("ea"),
                    F.col("eb"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
        ).alias("d"),
    )
    sa = sc.select(F.col("cell").alias("ca"), F.col("s").alias("s_a"))
    sb = sc.select(F.col("cell").alias("cb"), F.col("s").alias("s_b"))
    rr = (
        cd.join(sa, "ca")
        .join(sb, "cb")
        .groupBy(F.col("ca").alias("cell"))
        .agg(
            F.max(
                F.when(
                    F.col("d") > 0,
                    (F.col("s_a") + F.col("s_b")) / F.col("d"),
                )
            ).alias("db_contrib")
        )
    )
    return (
        sc.join(rr, "cell")
        .select("cell", "n", F.col("s").alias("scatter"), "db_contrib")
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
def _ngroups_sql(src: str, pat: str) -> str:
    """Count of maximal ``pat`` runs: mark each run as one '#' then
    subtract the all-removed length (two global regex passes)."""
    return (
        f"(LENGTH(regexp_replace({src}, '{pat}', '#', 'g'))"
        f" - LENGTH(regexp_replace({src}, '{pat}', '', 'g')))"
    )


def _ngroups(src, pat: str):
    return F.length(F.regexp_replace(src, pat, "#")) - F.length(
        F.regexp_replace(src, pat, "")
    )


@register(
    "doc_readability_flesch",
    f"""
    WITH c AS (
      SELECT doc_id,
             CAST({_ngroups_sql("text", "[.!?]+")} AS BIGINT)
               AS n_term_groups,
             CAST(CASE WHEN LENGTH(text) > 0 THEN
               GREATEST(1, {_ngroups_sql("text", "[.!?]+")})
             ELSE 0 END AS BIGINT) AS n_sentences,
             CAST({_ngroups_sql("text", "[^ ]+")} AS BIGINT) AS n_words,
             CAST({_ngroups_sql("lower(text)", "[aeiouy]+")} AS BIGINT)
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_term_groups, n_sentences, n_words, n_syllables,
           CASE WHEN n_sentences > 0 THEN
             CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
           END AS words_per_sentence,
           CASE WHEN n_words > 0 THEN
             CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
           END AS syllables_per_word,
           CASE WHEN n_sentences > 0 AND n_words > 0 THEN
             206.835
               - 1.015 * (CAST(n_words AS DOUBLE)
                          / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE)
                         / CAST(n_words AS DOUBLE))
           END AS flesch
    FROM c ORDER BY doc_id
    """,
)
def doc_readability_flesch(spark: SparkSession, sf: str):
    """FLESCH READING-EASE per document — the classic readability
    member of the text-quality family (next to
    ``doc_quality_scores``/``lang_quality_profile``): 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words) with literal
    coefficients in both engines.  All three counts are EXACT integers
    from maximal-run counting (a run of pattern chars marks as one
    '#'; count = marked length − stripped length — two global regex
    passes per pattern, Java∩RE2-safe classes only); syllables are the
    standard vowel-group approximation ([aeiouy]+ runs of the
    lowercased text), and a non-empty document with no terminator
    counts as ONE sentence (the trailing-fragment convention —
    disclosed via n_term_groups, which stays 0 for such docs).  The
    score is a fixed two-division float tree, guarded on both
    denominators.  Scale: one row-local projection, no shuffle,
    embarrassingly parallel — the shape every quality-scoring pass at
    100 TB wants."""
    d = t(spark, sf, "documents")
    term = _ngroups(F.col("text"), "[.!?]+")
    words = _ngroups(F.col("text"), "[^ ]+")
    syll = _ngroups(F.lower(F.col("text")), "[aeiouy]+")
    c = d.select(
        "doc_id",
        term.cast("long").alias("n_term_groups"),
        F.when(
            F.length("text") > 0, F.greatest(F.lit(1), term)
        )
        .otherwise(0)
        .cast("long")
        .alias("n_sentences"),
        words.cast("long").alias("n_words"),
        syll.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast(
        "double"
    )
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast(
        "double"
    )
    return c.select(
        "doc_id",
        "n_term_groups",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.when(F.col("n_sentences") > 0, wps).alias("words_per_sentence"),
        F.when(F.col("n_words") > 0, spw).alias("syllables_per_word"),
        F.when(
            (F.col("n_sentences") > 0) & (F.col("n_words") > 0),
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
        ).alias("flesch"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
@register(
    "orders_feature_gini_impurity_cells",
    """
    WITH o AS (
      SELECT o_orderpriority AS f_priority, o_orderstatus AS f_status,
             CAST(strftime(o_orderdate, '%m') AS VARCHAR) AS f_month,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS vc
      FROM orders
    ), dom AS (
      SELECT vc, CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(COUNT(*)) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM o GROUP BY vc
    ), med AS (
      SELECT MIN(vc) AS med FROM dom
      CROSS JOIN (SELECT CAST(SUM(t) AS BIGINT) AS n FROM dom)
      WHERE cum * 2 >= n + 1
    ), lab AS (
      SELECT f_priority, f_status, f_month,
             CASE WHEN vc > med THEN 1 ELSE 0 END AS y
      FROM o CROSS JOIN med
    ), u AS (
      SELECT 'priority' AS feature, f_priority AS level, y FROM lab
      UNION ALL
      SELECT 'status' AS feature, f_status AS level, y FROM lab
      UNION ALL
      SELECT 'month' AS feature, f_month AS level, y FROM lab
    ), cells AS (
      SELECT feature, level,
             CAST(COUNT(*) AS BIGINT) AS n_v,
             CAST(SUM(y) AS BIGINT) AS pos_v
      FROM u GROUP BY feature, level
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos FROM lab
    )
    SELECT feature, level, n_v, pos_v, tot.n AS n_total,
           tot.pos AS pos_total,
           1.0 - (CAST(pos_v AS DOUBLE) * CAST(pos_v AS DOUBLE)
                  + (CAST(n_v AS DOUBLE) - CAST(pos_v AS DOUBLE))
                    * (CAST(n_v AS DOUBLE) - CAST(pos_v AS DOUBLE)))
                 / (CAST(n_v AS DOUBLE) * CAST(n_v AS DOUBLE))
             AS gini_child,
           (1.0 - (CAST(pos_v AS DOUBLE) * CAST(pos_v AS DOUBLE)
                   + (CAST(n_v AS DOUBLE) - CAST(pos_v AS DOUBLE))
                     * (CAST(n_v AS DOUBLE) - CAST(pos_v AS DOUBLE)))
                  / (CAST(n_v AS DOUBLE) * CAST(n_v AS DOUBLE)))
             * CAST(n_v AS DOUBLE) / CAST(tot.n AS DOUBLE)
             AS wgini_contrib,
           1.0 - (CAST(tot.pos AS DOUBLE) * CAST(tot.pos AS DOUBLE)
                  + (CAST(tot.n AS DOUBLE) - CAST(tot.pos AS DOUBLE))
                    * (CAST(tot.n AS DOUBLE) - CAST(tot.pos AS DOUBLE)))
                 / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE))
             AS gini_parent
    FROM cells CROSS JOIN tot
    ORDER BY feature, level
    """,
)
def orders_feature_gini_impurity_cells(spark: SparkSession, sf: str):
    """GINI IMPURITY cells per candidate feature level — the CART split
    criterion next to ``orders_feature_information_gain``'s entropy
    (same features, same exact-median binary target, deliberately:
    comparing the two criteria on identical cells is the point).
    Emission follows the cells rule: one row per (feature, level) with
    exact-integer n_v/pos_v and three fixed float trees — the child's
    Gini 1 − (pos² + neg²)/n², its size-weighted contribution (·n_v/N),
    and the parent Gini repeated per row; the Gini REDUCTION per
    feature is the reader-side fold gini_parent − Σ wgini_contrib over
    that feature's ≤12 rows, so no cross-row float sum crosses the
    compare boundary.  All squares are computed in DOUBLE over gated
    exact ints (the assortativity discipline — products would pass
    2^63 long before the ints themselves are inexact).  Scale: one
    domain cumulative for the median + one (feature, level) groupBy
    over enumerable keys."""
    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("f_priority"),
        F.col("o_orderstatus").alias("f_status"),
        F.date_format("o_orderdate", "MM").alias("f_month"),
        cents("o_totalprice").alias("vc"),
    )
    wcum = W.orderBy("vc").rowsBetween(W.unboundedPreceding, 0)
    dom = (
        o.groupBy("vc")
        .agg(F.count("*").cast("long").alias("t"))
        .select("vc", "t", F.sum("t").over(wcum).cast("long").alias("cum"))
    )
    ntot = dom.agg(F.sum("t").cast("long").alias("n"))
    med = (
        dom.crossJoin(F.broadcast(ntot))
        .filter(F.col("cum") * 2 >= F.col("n") + 1)
        .agg(F.min("vc").alias("med"))
    )
    lab = o.crossJoin(F.broadcast(med)).select(
        "f_priority",
        "f_status",
        "f_month",
        F.when(F.col("vc") > F.col("med"), 1).otherwise(0).alias("y"),
    )
    u = (
        lab.select(
            F.lit("priority").alias("feature"),
            F.col("f_priority").alias("level"),
            "y",
        )
        .unionByName(
            lab.select(
                F.lit("status").alias("feature"),
                F.col("f_status").alias("level"),
                "y",
            )
        )
        .unionByName(
            lab.select(
                F.lit("month").alias("feature"),
                F.col("f_month").alias("level"),
                "y",
            )
        )
    )
    cells = u.groupBy("feature", "level").agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum("y").cast("long").alias("pos_v"),
    )
    tot = lab.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("y").cast("long").alias("pos_total"),
    )

    def gini(nc, pc):
        nd, pd = nc.cast("double"), pc.cast("double")
        return F.lit(1.0) - (pd * pd + (nd - pd) * (nd - pd)) / (nd * nd)

    child = gini(F.col("n_v"), F.col("pos_v"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "feature",
            "level",
            "n_v",
            "pos_v",
            "n_total",
            "pos_total",
            child.alias("gini_child"),
            (
                child
                * F.col("n_v").cast("double")
                / F.col("n_total").cast("double")
            ).alias("wgini_contrib"),
            gini(F.col("n_total"), F.col("pos_total")).alias("gini_parent"),
        )
        .orderBy("feature", "level")
    )


# ---------------------------------------------------------------------------
@register(
    "events_purchase_ca_trend_cells",
    """
    WITH f AS (
      SELECT LEAST(CAST(ROUND(value * 100, 0) AS BIGINT) // 10000, 4) + 1
               AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ), g AS (
      SELECT CAST(s AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(pos) AS BIGINT) AS d_g
      FROM f GROUP BY s
    ), tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(d_g) AS BIGINT) AS d,
             CAST(SUM(s * n_g) AS BIGINT) AS s1,
             CAST(SUM(s * s * n_g) AS BIGINT) AS s2,
             CAST(SUM(s * d_g) AS BIGINT) AS t1
      FROM g
    )
    SELECT g.s AS band_score, g.n_g, g.d_g,
           CASE WHEN g.n_g > 0 THEN
             CAST(g.d_g AS DOUBLE) / CAST(g.n_g AS DOUBLE)
           END AS rate,
           tot.n AS n_total, tot.d AS d_total,
           tot.s1 AS sum_sn, tot.s2 AS sum_s2n, tot.t1 AS sum_sd,
           CASE WHEN tot.d > 0 AND tot.n - tot.d > 0
                 AND CAST(tot.n AS DOUBLE) * CAST(tot.s2 AS DOUBLE)
                     - CAST(tot.s1 AS DOUBLE) * CAST(tot.s1 AS DOUBLE) > 0
           THEN
             CAST(tot.n AS DOUBLE)
               * (CAST(tot.n AS DOUBLE) * CAST(tot.t1 AS DOUBLE)
                  - CAST(tot.d AS DOUBLE) * CAST(tot.s1 AS DOUBLE))
               * (CAST(tot.n AS DOUBLE) * CAST(tot.t1 AS DOUBLE)
                  - CAST(tot.d AS DOUBLE) * CAST(tot.s1 AS DOUBLE))
               / (CAST(tot.d AS DOUBLE) * (CAST(tot.n AS DOUBLE)
                  - CAST(tot.d AS DOUBLE))
                  * (CAST(tot.n AS DOUBLE) * CAST(tot.s2 AS DOUBLE)
                     - CAST(tot.s1 AS DOUBLE) * CAST(tot.s1 AS DOUBLE)))
           END AS ca_z2
    FROM g CROSS JOIN tot
    ORDER BY g.s
    """,
)
def events_purchase_ca_trend_cells(spark: SparkSession, sf: str):
    """COCHRAN-ARMITAGE TREND cells — "does purchase share rise
    MONOTONICALLY with the value band?", the ordered-alternative
    companion of ``orders_priority_status_chi2_cells`` (plain χ²
    ignores band order; CA weights each band by a literal score, here
    band index 1..5 from integer cent bands LEAST(vc div 10000, 4)+1).
    One row per band with exact n/d and its rate; the component sums
    (Σsn, Σs²n, Σsd — all ≤ 25N, int64 to ~3.7e17 rows) repeat as
    gated exact integers, and z² = N(N·Σsd − D·Σsn)² /
    (D(N−D)(N·Σs²n − (Σsn)²)) — the Agresti score-test form, no
    continuity correction (documented) — is ONE fixed DOUBLE tree over
    them, triple-guarded (empty class or zero score variance → NULL).
    Scale: one map-side-combined groupBy to 5 bands + a 1-row fold;
    the cheapest possible shape."""
    ev = t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    f = ev.select(
        (
            F.least(F.expr("cast(round(value * 100, 0) as bigint) div 10000"),
                    F.lit(4))
            + 1
        )
        .cast("long")
        .alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
    )
    g = f.groupBy("s").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("pos").cast("long").alias("d_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("d_g").cast("long").alias("d"),
        F.sum(F.col("s") * F.col("n_g")).cast("long").alias("s1"),
        F.sum(F.col("s") * F.col("s") * F.col("n_g"))
        .cast("long")
        .alias("s2"),
        F.sum(F.col("s") * F.col("d_g")).cast("long").alias("t1"),
    )
    nd = F.col("n").cast("double")
    dd = F.col("d").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    t1d = F.col("t1").cast("double")
    num = nd * t1d - dd * s1d
    var = nd * s2d - s1d * s1d
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("band_score"),
            "n_g",
            "d_g",
            F.when(
                F.col("n_g") > 0,
                F.col("d_g").cast("double") / F.col("n_g").cast("double"),
            ).alias("rate"),
            F.col("n").alias("n_total"),
            F.col("d").alias("d_total"),
            F.col("s1").alias("sum_sn"),
            F.col("s2").alias("sum_s2n"),
            F.col("t1").alias("sum_sd"),
            F.when(
                (F.col("d") > 0)
                & (F.col("n") - F.col("d") > 0)
                & (var > 0),
                nd * num * num / (dd * (nd - dd) * var),
            ).alias("ca_z2"),
        )
        .orderBy("band_score")
    )


# ---------------------------------------------------------------------------
@register(
    "copurchase_edge_support_hist",
    """
    WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    edges AS (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM os a JOIN os b ON b.ok = a.ok AND a.p < b.p
    ),
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    sides AS (
      SELECT x AS a, y AS b FROM tris
      UNION ALL SELECT x, z FROM tris
      UNION ALL SELECT y, z FROM tris
    ),
    sup AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
      FROM sides GROUP BY a, b
    ),
    es AS (
      SELECT COALESCE(sup.support, 0) AS support
      FROM edges LEFT JOIN sup USING (a, b)
    )
    SELECT CAST(support AS BIGINT) AS support,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(COUNT(*)) OVER (ORDER BY support DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_edges_at_least
    FROM es GROUP BY support ORDER BY support
    """,
)
def copurchase_edge_support_hist(spark: SparkSession, sf: str):
    """EDGE TRIANGLE-SUPPORT histogram of the co-purchase graph — the
    K-TRUSS profile: an edge with support s survives in every k-truss
    with k ≤ s+2, so ``n_edges_at_least`` (the suffix-cumulative count)
    reads directly as the k-truss SIZE UPPER BOUND curve before any
    peeling — the edge-level companion of the node-level
    ``copurchase_clustering_coefficient`` and the peel-based
    ``copurchase_k_core_peel``.  Support comes from
    ``operators/graph.triangle_support_per_edge``: degree-oriented
    adjacency-array intersection (wedge work bounded by arboricity,
    never max degree), each triangle exploded OUTPUT-bounded to its 3
    canonical edges, zero-support edges kept via one left join.  The
    oracle enumerates the same triangles by the naive ordered triple
    join — same histogram, different algorithm.  All-integer output;
    the suffix cumulative runs over the tiny support domain.  Scale:
    inherits triangle_count's arboricity bound; histogram output is
    support-domain-sized at any SF."""
    from byte_convert_avro_spark.operators.graph import (
        triangle_support_per_edge,
    )

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
    es = triangle_support_per_edge(edges, "src", "dst")
    wsuf = W.orderBy(F.col("support").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        es.groupBy("support")
        .agg(F.count("*").cast("long").alias("n_edges"))
        .select(
            "support",
            "n_edges",
            F.sum("n_edges").over(wsuf).cast("long").alias(
                "n_edges_at_least"
            ),
        )
        .orderBy("support")
    )


# ---------------------------------------------------------------------------
_BLOCKING_TAIL = """
    , cand AS (
      SELECT CAST(COALESCE(SUM(cnt * (cnt - 1) // 2), 0) AS BIGINT)
        AS n_candidates
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
            FROM customer GROUP BY c_nationkey)
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers FROM customer
    ), hits AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_truth_in_block
      FROM truth
      JOIN customer ca ON ca.c_custkey = truth.id_a
      JOIN customer cb ON cb.c_custkey = truth.id_b
      WHERE ca.c_nationkey = cb.c_nationkey
    ), tr AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth
    )
    SELECT tot.n_customers,
           tot.n_customers * (tot.n_customers - 1) // 2 AS n_all_pairs,
           cand.n_candidates, tr.n_truth, hits.n_truth_in_block,
           CASE WHEN tot.n_customers >= 2 THEN
             1.0 - CAST(cand.n_candidates AS DOUBLE)
               / CAST(tot.n_customers * (tot.n_customers - 1) // 2
                      AS DOUBLE)
           END AS reduction_ratio,
           CASE WHEN tr.n_truth > 0 THEN
             CAST(hits.n_truth_in_block AS DOUBLE)
               / CAST(tr.n_truth AS DOUBLE)
           END AS pairs_completeness
    FROM tot CROSS JOIN cand CROSS JOIN tr CROSS JOIN hits
    """


@register(
    "customer_blocking_quality_profile",
    """
    WITH truth AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    )"""
    + _BLOCKING_TAIL,
    scale_oracle="""
    WITH c AS (SELECT c_custkey, c_name FROM customer),
    vars AS (
      SELECT c_custkey, c_name AS variant FROM c
      UNION
      SELECT c_custkey,
             substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS variant
      FROM (
        SELECT c_custkey, c_name,
               unnest(generate_series(1, length(c_name))) AS i
        FROM c
      )
    ), cd AS (
      SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM vars a JOIN vars b USING (variant)
      WHERE a.c_custkey < b.c_custkey
    ), truth AS (
      SELECT id_a, id_b
      FROM cd JOIN c a ON a.c_custkey = id_a JOIN c b ON b.c_custkey = id_b
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    )"""
    + _BLOCKING_TAIL,
)
def customer_blocking_quality_profile(spark: SparkSession, sf: str):
    """BLOCKING-SCHEME QUALITY metrics for record linkage — reduction
    ratio and pairs completeness, the two numbers every blocking
    decision is made on (Christen's linkage-survey framing): evaluate
    the NATION blocking that ``customer_fuzzy_match_pairs`` uses
    against the FastSS edit≤1 TRUTH set
    (``operators/strsim.edit1_pairs`` — linear, zero false negatives,
    itself gated brute-force).  RR = 1 − candidates/allpairs measures
    how much comparison work blocking sheds (candidates counted as
    Σ c·(c−1)/2 over block sizes — never materialized); PC =
    truth∩block/truth measures what it MISSES (cross-nation typo pairs
    escape by construction — the number this entry surfaces).  All
    counts exact int64; RR and PC single guarded divisions.  The
    primary oracle recomputes truth brute-force (quadratic — the
    disclosed sf≥1 referee trade); the scale oracle uses the
    deletion-variant equi-join spelling.  Scale: the truth side is the
    gated FastSS path (O(total chars) variants); the candidate count
    is one groupBy over nations; the hit join touches truth pairs
    only."""
    from byte_convert_avro_spark.operators.strsim import edit1_pairs

    cust = t(spark, sf, "customer")
    truth = edit1_pairs(cust, "c_custkey", "c_name").select("id_a", "id_b")
    tr = truth.agg(F.count("*").cast("long").alias("n_truth"))
    na = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nat_a"),
    )
    nb = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nat_b"),
    )
    hits = (
        truth.join(na, "id_a")
        .join(nb, "id_b")
        .filter(F.col("nat_a") == F.col("nat_b"))
        .agg(F.count("*").cast("long").alias("n_truth_in_block"))
    )
    cand = (
        cust.groupBy("c_nationkey")
        .agg(F.count("*").cast("long").alias("cnt"))
        .agg(
            F.coalesce(
                F.sum(F.expr("cnt * (cnt - 1) div 2")), F.lit(0)
            )
            .cast("long")
            .alias("n_candidates")
        )
    )
    tot = cust.agg(F.count("*").cast("long").alias("n_customers"))
    allp = F.expr("n_customers * (n_customers - 1) div 2")
    return (
        tot.crossJoin(cand)
        .crossJoin(tr)
        .crossJoin(hits)
        .select(
            "n_customers",
            allp.cast("long").alias("n_all_pairs"),
            "n_candidates",
            "n_truth",
            "n_truth_in_block",
            F.when(
                F.col("n_customers") >= 2,
                F.lit(1.0)
                - F.col("n_candidates").cast("double")
                / allp.cast("double"),
            ).alias("reduction_ratio"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_truth_in_block").cast("double")
                / F.col("n_truth").cast("double"),
            ).alias("pairs_completeness"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "orders_target_calibration_bins",
    """
    WITH o AS (
      SELECT o_custkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS vc
      FROM orders
    ), dom AS (
      SELECT vc, CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(COUNT(*)) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM o GROUP BY vc
    ), med AS (
      SELECT MIN(vc) AS med FROM dom
      CROSS JOIN (SELECT CAST(SUM(t) AS BIGINT) AS n FROM dom)
      WHERE cum * 2 >= n + 1
    ), lab AS (
      SELECT o_custkey, CASE WHEN vc > med THEN 1 ELSE 0 END AS y
      FROM o CROSS JOIN med
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS d
      FROM lab
    ), c AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(y) AS BIGINT) AS y_c
      FROM lab GROUP BY o_custkey
    ), enc AS (
      SELECT c.o_custkey, c.n_c, c.y_c,
             (CAST(c.y_c AS DOUBLE)
              + 10.0 * (CAST(g.d AS DOUBLE) / CAST(g.n AS DOUBLE)))
               / (CAST(c.n_c AS DOUBLE) + 10.0) AS p,
             CAST(g.d AS DOUBLE) / CAST(g.n AS DOUBLE) AS prior
      FROM c CROSS JOIN g
    )
    SELECT CAST(FLOOR(p * 20.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_c) AS BIGINT) AS n_orders,
           CAST(SUM(y_c) AS BIGINT) AS n_pos,
           CASE WHEN SUM(n_c) > 0 THEN
             CAST(SUM(y_c) AS DOUBLE) / CAST(SUM(n_c) AS DOUBLE)
           END AS observed_rate,
           MIN(p) AS min_pred, MAX(p) AS max_pred,
           MIN(prior) AS prior
    FROM enc GROUP BY 1 ORDER BY bin
    """,
)
def orders_target_calibration_bins(spark: SparkSession, sf: str):
    """CALIBRATION TABLE of an empirical-Bayes probability scorer —
    the probability-quality dimension the eval ladder still lacked
    (AUC/ROC rank, lift targets, P/R/F1 threshold; calibration asks
    "when the score says 40%, does 40% happen"): per customer the
    smoothed P(order above the exact global median) = (y_c + m·p0) /
    (n_c + m) with m=10 (the ``customer_target_encoding_smoothed``
    shrinkage form on a BINARY target), bucketed into 20 literal
    probability bins; each bin reports exact order/positive counts,
    the observed rate (one guarded division of exact ints — shrinkage
    should pull observed toward the prior in the tails), and
    order-independent MIN/MAX of the bit-identical predictions as the
    bin's support bounds.  The bin id floor(p·20) is computed on
    predictions that are themselves pinned fixed float trees, so both
    engines bucket identically.  Scale: one domain cumulative for the
    median + one customer-domain groupBy + a ≤21-row rollup; nothing
    row-scaled after the first aggregation."""
    o = t(spark, sf, "orders").select(
        "o_custkey", cents("o_totalprice").alias("vc")
    )
    wcum = W.orderBy("vc").rowsBetween(W.unboundedPreceding, 0)
    dom = (
        o.groupBy("vc")
        .agg(F.count("*").cast("long").alias("t"))
        .select("vc", "t", F.sum("t").over(wcum).cast("long").alias("cum"))
    )
    ntot = dom.agg(F.sum("t").cast("long").alias("n"))
    med = (
        dom.crossJoin(F.broadcast(ntot))
        .filter(F.col("cum") * 2 >= F.col("n") + 1)
        .agg(F.min("vc").alias("med"))
    )
    lab = o.crossJoin(F.broadcast(med)).select(
        "o_custkey",
        F.when(F.col("vc") > F.col("med"), 1).otherwise(0).alias("y"),
    )
    g = lab.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("d"),
    )
    c = lab.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_c"),
        F.sum("y").cast("long").alias("y_c"),
    )
    prior = F.col("d").cast("double") / F.col("n").cast("double")
    p = (F.col("y_c").cast("double") + F.lit(10.0) * prior) / (
        F.col("n_c").cast("double") + F.lit(10.0)
    )
    enc = c.crossJoin(F.broadcast(g)).select(
        "n_c", "y_c", p.alias("p"), prior.alias("prior")
    )
    return (
        enc.groupBy(
            F.floor(F.col("p") * F.lit(20.0)).cast("long").alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("n_c").cast("long").alias("n_orders"),
            F.sum("y_c").cast("long").alias("n_pos"),
            F.min("p").alias("min_pred"),
            F.max("p").alias("max_pred"),
            F.min("prior").alias("prior"),
        )
        .select(
            "bin",
            "n_customers",
            "n_orders",
            "n_pos",
            F.when(
                F.col("n_orders") > 0,
                F.col("n_pos").cast("double")
                / F.col("n_orders").cast("double"),
            ).alias("observed_rate"),
            "min_pred",
            "max_pred",
            "prior",
        )
        .orderBy("bin")
    )
