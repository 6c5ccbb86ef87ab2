"""Similarity search over the ``embeddings`` table (``array<float>``,
64-dim): brute-force cosine top-k baseline + IVF-style centroid routing —
the ANN building blocks of an LLM-data pipeline.

Determinism: dot products are sequential left-to-right folds over
double-cast arrays on BOTH engines (Spark ``aggregate``/``zip_with``,
DuckDB ``list_reduce``/``list_transform``) — IEEE doubles folded in the
same order give bit-identical results, sqrt is correctly rounded, and
ranking keys include vec_id so ties can't reorder.

Scale notes: brute-force is the correctness baseline — it broadcasts the
(small) query set against the candidate corpus, embarrassingly parallel,
no shuffle.  The IVF pattern is the 100 TB path: centroid assignment is a
broadcast join (K centroids always fit in memory), so search cost drops
from O(N) to O(N/K) per probe with one scan to build the index.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import register, spread, t

DIM = 64
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
)
# DuckDB equivalent sequential fold (1-based list indexing)
_DOT_SQL = (
    "list_reduce(list_transform(generate_series(1, {n}), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)


def _emb(spark: SparkSession, sf: str):
    # spread: the single-row-group parquet scan is one task; 64-dim array
    # math downstream must run on all cores (queries/base.py spread())
    return spread(
        t(spark, sf, "embeddings").select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
        ),
        "vec_id",
    )


# ---------------------------------------------------------------------------
@register(
    "knn_cosine_top5",
    f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    n AS (SELECT vec_id, label, e,
                 sqrt({_DOT_SQL.format(n=DIM, a='e', b='e')}) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qn FROM n WHERE vec_id < 10),
    c AS (SELECT vec_id, label, e, nrm FROM n WHERE vec_id >= 10),
    sims AS (
      SELECT q.qid, c.vec_id, c.label,
             ROUND({_DOT_SQL.format(n=DIM, a='c.e', b='q.qe')} / (c.nrm * q.qn), 4) AS sim
      FROM c CROSS JOIN q
    )
    SELECT qid, vec_id, label, sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    WHERE rank <= 5
    """,
)
def knn_cosine_top5(spark: SparkSession, sf: str):
    """Brute-force cosine top-5 neighbors for 10 query vectors.  The query
    side is broadcast; similarity is computed fully JVM-side with array
    expressions (no Python), and ranking is a per-query window."""
    e = _emb(spark, sf).withColumn("nrm", F.sqrt(F.expr(_DOT.format(a="e", b="e"))))
    q = (
        e.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn"))
    )
    c = e.filter(F.col("vec_id") >= 10)
    sims = (
        c.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            "label",
            F.round(F.expr(_DOT.format(a="e", b="qe")) / (F.col("nrm") * F.col("qn")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


# ---------------------------------------------------------------------------
from byte_convert_avro_spark.functions import (
    bounded_ordered_agg as _bounded_ordered_agg,
    ordered_fold as _ordered_fold,
)


@register(
    "label_centroids",
    """
    WITH dims AS (
      SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS x,
             unnest(generate_series(1, 64)) AS dim
      FROM embeddings
    ), ch AS (
      SELECT label, dim, vec_id // 128 AS chk,
             list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b) AS csum,
             COUNT(*) AS cnt
      FROM dims GROUP BY label, dim, chk
    )
    SELECT label, dim,
           list_reduce(list(csum ORDER BY chk), (a, b) -> a + b) / SUM(cnt) AS centroid
    FROM ch GROUP BY label, dim
    """,
)
def label_centroids(spark: SparkSession, sf: str):
    """IVF 'train' step: per-label centroids, one row per (label, dim).
    The mean is a BOUNDED two-level vec_id-ordered fold
    (functions.bounded_ordered_agg — per-(label, dim) tasks hold at most
    chunk=128 doubles, not the whole label's membership; both engines
    spell the same chunking so every centroid is still bit-identical).
    posexplode -> agg: the big shuffle carries |corpus|×|dims| rows keyed
    (label, dim, chunk); level 2 moves only chunk sums."""
    e = _emb(spark, sf)
    dims = e.select("vec_id", "label", F.posexplode("e").alias("dim0", "x")).select(
        "vec_id", "label", (F.col("dim0") + 1).alias("dim"), "x"
    )
    agg = _bounded_ordered_agg(dims, ["label", "dim"], "vec_id", "x", chunk=128)
    return agg.select(
        "label", "dim", (F.col("osum") / F.col("ocnt")).alias("centroid")
    )


# ---------------------------------------------------------------------------
@register(
    "ivf_assign_nearest_centroid",
    """
    WITH dims AS (
      SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS x,
             unnest(generate_series(1, 64)) AS dim
      FROM embeddings
    ), cch AS (
      SELECT label AS clabel, dim, vec_id // 128 AS chk,
             list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b) AS csum,
             COUNT(*) AS cnt
      FROM dims GROUP BY label, dim, chk
    ), cent AS (
      SELECT clabel, dim,
             list_reduce(list(csum ORDER BY chk), (a, b) -> a + b) / SUM(cnt) AS c
      FROM cch GROUP BY clabel, dim
    ), dist AS (
      SELECT d.vec_id, d.label, cent.clabel,
             list_reduce(list((d.x - cent.c) * (d.x - cent.c) ORDER BY d.dim),
                         (a, b) -> a + b) AS d2
      FROM dims d JOIN cent ON d.dim = cent.dim
      GROUP BY d.vec_id, d.label, cent.clabel
    )
    SELECT vec_id, label, clabel AS nearest_label, d2 FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
      FROM dist)
    WHERE rn = 1
    """,
)
def ivf_assign_nearest_centroid(spark: SparkSession, sf: str):
    """IVF 'assign' step: route every vector to its nearest label centroid
    (squared L2).  The centroid table (trained via the bounded two-level
    fold, chunk=128 — see label_centroids) is broadcast — at any corpus
    size the join is a map-side lookup; per-(vector,centroid) distances
    fold over <= 64 dims (bounded by construction, flat ordered_fold is
    safe there), argmin via window with (d2, label) tie-break."""
    e = _emb(spark, sf)
    dims = e.select("vec_id", "label", F.posexplode("e").alias("dim0", "x")).select(
        "vec_id", "label", (F.col("dim0") + 1).alias("dim"), "x"
    )
    cent = _bounded_ordered_agg(
        dims.withColumnRenamed("label", "clabel"), ["clabel", "dim"],
        "vec_id", "x", chunk=128,
    ).select("clabel", "dim", (F.col("osum") / F.col("ocnt")).alias("c"))
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .withColumn("sq", (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
        .groupBy("vec_id", "label", "clabel")
        .agg(_ordered_fold("dim", "sq").alias("d2"))
    )
    w = W.partitionBy("vec_id").orderBy("d2", "clabel")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("clabel").alias("nearest_label"), "d2")
    )


# ---------------------------------------------------------------------------
@register(
    "array_hof_showcase",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 100)
    SELECT vec_id,
           LEN(list_filter(e, x -> x > 0)) AS n_positive,
           ROUND(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b), 4) AS sum_sq,
           ROUND(list_reduce(list_transform(generate_series(1, 64), i -> e[i] * (CASE WHEN i % 2 = 1 THEN 1.0 ELSE -1.0 END)),
                             (a, b) -> a + b), 4) AS alt_sum,
           CASE WHEN LEN(list_filter(e, x -> ABS(x) > 2.0)) > 0 THEN 1 ELSE 0 END AS has_outlier,
           ROUND(list_aggregate(list_transform(e, x -> ABS(x)), 'max'), 4) AS max_abs
    FROM v
    """,
)
def array_hof_showcase(spark: SparkSession, sf: str):
    """Higher-order array functions, fully JVM-side: filter / transform /
    aggregate (fold) / exists / zip_with-style alternating sum — the
    vocabulary every embedding-column pipeline leans on.  One narrow
    projection, no shuffle, no Python."""
    e = _emb(spark, sf).filter(F.col("vec_id") < 100)
    alt = F.expr(
        "aggregate(zip_with(e, sequence(1, 64),"
        " (x, i) -> x * (CASE WHEN i % 2 = 1 THEN 1.0 ELSE -1.0 END)),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return e.select(
        "vec_id",
        F.size(F.filter("e", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.transform("e", lambda x: x * x),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sum_sq"),
        F.round(alt, 4).alias("alt_sum"),
        F.when(F.exists("e", lambda x: F.abs(x) > 2.0), 1).otherwise(0).alias("has_outlier"),
        F.round(F.array_max(F.transform("e", lambda x: F.abs(x))), 4).alias("max_abs"),
    )


# ---------------------------------------------------------------------------
@register(
    "truncated_dim_recall_at3",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    n AS (SELECT vec_id, e, e[1:16] AS p,
                 sqrt({_DOT_SQL.format(n=DIM, a='e', b='e')}) AS nrm,
                 sqrt({_DOT_SQL.format(n=16, a='e', b='e')}) AS pnrm
          FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, p AS qp, nrm AS qn, pnrm AS qpn
          FROM n WHERE vec_id < 5),
    c AS (SELECT vec_id, e, p, nrm, pnrm FROM n WHERE vec_id >= 5),
    sims AS (
      SELECT q.qid, c.vec_id,
             ROUND({_DOT_SQL.format(n=DIM, a='c.e', b='q.qe')} / (c.nrm * q.qn), 4)
               AS sim_full,
             ROUND({_DOT_SQL.format(n=16, a='c.p', b='q.qp')} / (c.pnrm * q.qpn), 4)
               AS sim_trunc
      FROM c CROSS JOIN q
    ),
    rf AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim_full DESC, vec_id) AS r
           FROM sims),
    rt AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim_trunc DESC, vec_id) AS r
           FROM sims)
    SELECT f.qid,
           CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(t.vec_id) AS DOUBLE) / 3.0 AS recall_at_3
    FROM rf f
    LEFT JOIN rt t ON t.qid = f.qid AND t.vec_id = f.vec_id AND t.r <= 3
    WHERE f.r <= 3
    GROUP BY f.qid
    """,
)
def truncated_dim_recall_at3(spark: SparkSession, sf: str):
    """MATRYOSHKA-STYLE truncation quality audit: for 5 query vectors,
    how much of the exact 64-dim cosine top-3 survives when ranking by
    the FIRST 16 DIMENSIONS only — the measurement behind
    truncated-embedding retrieval (rank on a cheap prefix, re-rank the
    shortlist with full vectors), the same audit-the-approximation
    discipline as ivf_recall_at_3 and minhash_estimate_vs_exact_jaccard.
    Both rankings use sequential-fold cosines with vec_id tie-breaks;
    recall is exact-int / 3.0.  Scale: the all-pairs form is the
    correctness baseline over the broadcast query set; at 100 TB the
    prefix cosine IS the prefilter (4x fewer multiplies per candidate,
    or an IVF probe on prefix centroids) and this query is the recall
    gauge that says whether 16 dims are enough."""
    e = _emb(spark, sf).select(
        "vec_id",
        "e",
        F.slice("e", 1, 16).alias("p"),
        F.sqrt(F.expr(_DOT.format(a="e", b="e"))).alias("nrm"),
        F.sqrt(F.expr(_DOT.format(a="slice(e, 1, 16)", b="slice(e, 1, 16)"))).alias("pnrm"),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("p").alias("qp"),
        F.col("nrm").alias("qn"), F.col("pnrm").alias("qpn"),
    )
    c = e.filter(F.col("vec_id") >= 5)
    sims = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(
            F.expr(_DOT.format(a="e", b="qe")) / (F.col("nrm") * F.col("qn")), 4
        ).alias("sim_full"),
        F.round(
            F.expr(_DOT.format(a="p", b="qp")) / (F.col("pnrm") * F.col("qpn")), 4
        ).alias("sim_trunc"),
    )
    wf = W.partitionBy("qid").orderBy(F.desc("sim_full"), "vec_id")
    wt = W.partitionBy("qid").orderBy(F.desc("sim_trunc"), "vec_id")
    ranked = sims.select(
        "qid",
        "vec_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    top = ranked.filter(F.col("rf") <= 3)
    return top.groupBy("qid").agg(
        F.sum((F.col("rt") <= 3).cast("int")).cast("long").alias("n_overlap"),
        (F.sum((F.col("rt") <= 3).cast("int")).cast("double") / 3.0).alias(
            "recall_at_3"
        ),
    )


# ---------------------------------------------------------------------------
#: position discount literals 1/log2(i+1) spelled as log2(i+1) divisors —
#: Python-computed ONCE and inlined into both engines (the HLL
#: literal-constant discipline), so no engine log() is ever called.
_NDCG_LOG2 = ["1.0", "1.584962500721156", "2.0",
              "2.321928094887362", "2.584962500721156"]
#: ideal DCG for graded relevance (5,4,3,2,1) at positions 1..5 —
#: sum((6-i)/log2(i+1)), one Python literal
_NDCG_IDCG = "10.271924937667158"


@register(
    "truncated_dim_ndcg_at5",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    n AS (SELECT vec_id, e, e[1:16] AS p,
                 sqrt({_DOT_SQL.format(n=DIM, a='e', b='e')}) AS nrm,
                 sqrt({_DOT_SQL.format(n=16, a='e', b='e')}) AS pnrm
          FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, p AS qp, nrm AS qn, pnrm AS qpn
          FROM n WHERE vec_id < 5),
    c AS (SELECT vec_id, e, p, nrm, pnrm FROM n WHERE vec_id >= 5),
    sims AS (
      SELECT q.qid, c.vec_id,
             ROUND({_DOT_SQL.format(n=DIM, a='c.e', b='q.qe')} / (c.nrm * q.qn), 4)
               AS sim_full,
             ROUND({_DOT_SQL.format(n=16, a='c.p', b='q.qp')} / (c.pnrm * q.qpn), 4)
               AS sim_trunc
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
             CAST(COALESCE(CASE WHEN f.r <= 5 THEN 6 - f.r END, 0)
                  AS BIGINT) AS rel
      FROM rt t
      LEFT JOIN rf f ON f.qid = t.qid AND f.vec_id = t.vec_id
      WHERE t.r <= 5
    ),
    d AS (
      SELECT qid,
             CAST(COALESCE(MAX(CASE WHEN pos = 1 THEN rel END), 0) AS BIGINT) AS r1,
             CAST(COALESCE(MAX(CASE WHEN pos = 2 THEN rel END), 0) AS BIGINT) AS r2,
             CAST(COALESCE(MAX(CASE WHEN pos = 3 THEN rel END), 0) AS BIGINT) AS r3,
             CAST(COALESCE(MAX(CASE WHEN pos = 4 THEN rel END), 0) AS BIGINT) AS r4,
             CAST(COALESCE(MAX(CASE WHEN pos = 5 THEN rel END), 0) AS BIGINT) AS r5,
             CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overlap
      FROM j GROUP BY qid
    )
    SELECT qid, n_overlap, r1, r2, r3, r4, r5,
           CAST(r1 AS DOUBLE) / {_NDCG_LOG2[0]}
             + CAST(r2 AS DOUBLE) / {_NDCG_LOG2[1]}
             + CAST(r3 AS DOUBLE) / {_NDCG_LOG2[2]}
             + CAST(r4 AS DOUBLE) / {_NDCG_LOG2[3]}
             + CAST(r5 AS DOUBLE) / {_NDCG_LOG2[4]} AS dcg_at_5,
           (CAST(r1 AS DOUBLE) / {_NDCG_LOG2[0]}
             + CAST(r2 AS DOUBLE) / {_NDCG_LOG2[1]}
             + CAST(r3 AS DOUBLE) / {_NDCG_LOG2[2]}
             + CAST(r4 AS DOUBLE) / {_NDCG_LOG2[3]}
             + CAST(r5 AS DOUBLE) / {_NDCG_LOG2[4]}) / {_NDCG_IDCG}
             AS ndcg_at_5
    FROM d ORDER BY qid
    """,
)
def truncated_dim_ndcg_at5(spark: SparkSession, sf: str):
    """NDCG@5 of truncated-embedding retrieval — the GRADED companion of
    ``truncated_dim_recall_at3``: recall counts overlap; NDCG also asks
    whether the prefix ranking puts the most-relevant results FIRST
    (relevance = 6 − exact full-dim rank for the exact top-5, 0
    otherwise; discounts 1/log2(pos+1)).  The retrieval-evaluation
    primitive every RAG/search pipeline reports.  Bit-portability: the
    five discount divisors and the ideal DCG are PYTHON-COMPUTED
    LITERALS inlined into both engines (the HLL literal-constant
    discipline), relevance grades are exact integers from the
    rank join, and the 5-term DCG sum is one fixed left-associated
    expression tree — never a float aggregation across rows.  Scale:
    same broadcast-query all-pairs correctness baseline as the recall
    entry; at 100 TB the prefix ranking is the prefilter and this is
    its quality gauge."""
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
            F.coalesce(
                F.when(F.col("f.r") <= 5, 6 - F.col("f.r")), F.lit(0)
            )
            .cast("long")
            .alias("rel"),
        )
    )
    d = j.groupBy("qid").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("pos") == i, F.col("rel"))), F.lit(0)
            )
            .cast("long")
            .alias(f"r{i}")
            for i in range(1, 6)
        ],
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_overlap"),
    )
    dcg = (
        F.col("r1").cast("double") / F.lit(float(_NDCG_LOG2[0]))
        + F.col("r2").cast("double") / F.lit(float(_NDCG_LOG2[1]))
        + F.col("r3").cast("double") / F.lit(float(_NDCG_LOG2[2]))
        + F.col("r4").cast("double") / F.lit(float(_NDCG_LOG2[3]))
        + F.col("r5").cast("double") / F.lit(float(_NDCG_LOG2[4]))
    )
    return d.select(
        "qid",
        "n_overlap",
        "r1",
        "r2",
        "r3",
        "r4",
        "r5",
        dcg.alias("dcg_at_5"),
        (dcg / F.lit(float(_NDCG_IDCG))).alias("ndcg_at_5"),
    ).orderBy("qid")
