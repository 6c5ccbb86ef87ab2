"""Round-14 session-4 batch 3: Fellegi-Sunter probabilistic record
linkage — the SCORING stage that completes the entity-resolution ladder
(blocking: ``customer_name_edit1_fastss`` / scoring: THIS /
clustering: ``customer_entity_clusters``).

The Fellegi-Sunter model (Fellegi & Sunter 1969, the framework behind
every production record linker) scores a candidate pair by summing
per-field log-odds: agreement on field f contributes log(m_f/u_f)
where m = P(agree | match) and u = P(agree | non-match); disagreement
contributes log((1-m)/(1-u)).  Pairs above an upper threshold are
auto-links, below a lower threshold auto-non-links, between them the
clerical-review band.

Bit-portable spelling (the floor-log2 discipline): every probability is
carried as an exact integer RATIONAL — the u-probabilities are
DATA-DRIVEN random-agreement rates u = Σ_v cnt_v² / N² (the exact
probability two uniformly random records agree on the field), the
m-probabilities are documented model constants — and each weight is the
exact integer floor(log2(m_num·u_den)) − floor(log2(m_den·u_num)),
within 2 bits of the real log-odds and bit-identical cross-engine
(libm log never is).  The one non-data u is the name CLOSE level
(edit distance 1): its true u needs pair enumeration, so it is the
documented prior 1/1024; at tiny corpora the data-driven EXACT-level
weight can dip below the close-level prior (flog2(N)-ish vs the
constant 9) — expected and disclosed, not a bug.

Candidates come from the gated FastSS edit-distance-1 join (zero false
negatives vs the brute-force oracle), so the scoring entry inherits the
proven blocking semantics; the oracle spells the same scoring over the
brute-force pair set, and the sf>=1 scale twin swaps in the variant
equi-join spelling exactly as ``customer_name_edit1_fastss`` does.

Reference parity note: the reference (AvroTransform.java, 337-LoC
Kafka-Connect SMT) has none of this — analytics/LLM-pipeline addendum
surface per SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from byte_convert_avro_spark.operators.strsim import edit1_pairs
from byte_convert_avro_spark.queries.base import register, t

# model constants (rationals; documented, not fitted): P(agree | match)
_M = {
    "name_exact": (31, 32),
    "name_close": (1, 2),
    "nation": (15, 16),
    "segment": (7, 8),
}
#: fixed prior for the name close-level u (true value needs pair
#: enumeration); power of 2 so the weight is a clean constant.
_U_NAME_CLOSE = (1, 1024)

#: classification thresholds on the integer bit weight
_T_HI, _T_LO = 14, 5

# The shared SQL scoring chain, parameterized by the candidate CTE
# spelling (brute force for the primary oracle, variant equi-join for
# the scale twin).  Weights:
#   agree:    flog2(m_num * u_den) - flog2(m_den * u_num)
#   disagree: flog2((m_den-m_num) * u_den) - flog2(m_den * (u_den-u_num))
_FS_SCORING_SQL = f"""
    , cust AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
    ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust
    ), u_nat AS (
      SELECT CAST(SUM(k * k) AS BIGINT) AS num
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cust
            GROUP BY c_nationkey)
    ), u_seg AS (
      SELECT CAST(SUM(k * k) AS BIGINT) AS num
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cust
            GROUP BY c_mktsegment)
    ), u_name AS (
      SELECT CAST(SUM(k * k) AS BIGINT) AS num
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cust
            GROUP BY c_name)
    ), scored AS (
      SELECT cand.id_a, cand.id_b, cand.dist,
             CASE WHEN a.c_nationkey = b.c_nationkey THEN 1 ELSE 0 END
               AS nation_agree,
             CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END
               AS segment_agree,
             CASE WHEN cand.dist = 0 THEN
               (length(bin({_M['name_exact'][0]} * nn.n * nn.n)) - 1)
                 - (length(bin({_M['name_exact'][1]} * u_name.num)) - 1)
             ELSE
               (length(bin({_M['name_close'][0]} * {_U_NAME_CLOSE[1]})) - 1)
                 - (length(bin({_M['name_close'][1]} * {_U_NAME_CLOSE[0]})) - 1)
             END AS w_name,
             CASE WHEN a.c_nationkey = b.c_nationkey THEN
               (length(bin({_M['nation'][0]} * nn.n * nn.n)) - 1)
                 - (length(bin({_M['nation'][1]} * u_nat.num)) - 1)
             ELSE
               (length(bin({_M['nation'][1] - _M['nation'][0]} * nn.n * nn.n)) - 1)
                 - (length(bin({_M['nation'][1]} * (nn.n * nn.n - u_nat.num))) - 1)
             END AS w_nation,
             CASE WHEN a.c_mktsegment = b.c_mktsegment THEN
               (length(bin({_M['segment'][0]} * nn.n * nn.n)) - 1)
                 - (length(bin({_M['segment'][1]} * u_seg.num)) - 1)
             ELSE
               (length(bin({_M['segment'][1] - _M['segment'][0]} * nn.n * nn.n)) - 1)
                 - (length(bin({_M['segment'][1]} * (nn.n * nn.n - u_seg.num))) - 1)
             END AS w_segment
      FROM cand
      JOIN cust a ON a.c_custkey = cand.id_a
      JOIN cust b ON b.c_custkey = cand.id_b
      CROSS JOIN nn CROSS JOIN u_nat CROSS JOIN u_seg CROSS JOIN u_name
    )
"""

_FS_SELECT_SQL = f"""
    SELECT id_a, id_b, dist, nation_agree, segment_agree,
           CAST(w_name AS BIGINT) AS w_name,
           CAST(w_nation AS BIGINT) AS w_nation,
           CAST(w_segment AS BIGINT) AS w_segment,
           CAST(w_name + w_nation + w_segment AS BIGINT) AS weight_bits,
           CASE WHEN w_name + w_nation + w_segment >= {_T_HI} THEN 'match'
                WHEN w_name + w_nation + w_segment >= {_T_LO} THEN 'possible'
                ELSE 'non-match' END AS fs_class
    FROM scored
"""

_CAND_BRUTE_SQL = """
    WITH cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    )
"""

# the FastSS variant equi-join spelling (customer_name_edit1_fastss's
# scale twin) so the entry stays GATEABLE at sf >= 1 where the
# brute-force pair set is infeasible
_CAND_VARIANT_SQL = """
    WITH vars AS (
      SELECT c_custkey, c_name AS variant FROM customer
      UNION
      SELECT c_custkey,
             substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS variant
      FROM (
        SELECT c_custkey, c_name,
               unnest(generate_series(1, length(c_name))) AS i
        FROM customer
      )
    ), cpairs AS (
      SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM vars a JOIN vars b USING (variant)
      WHERE a.c_custkey < b.c_custkey
    ), cand AS (
      SELECT id_a, id_b,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM cpairs
      JOIN customer a ON a.c_custkey = id_a
      JOIN customer b ON b.c_custkey = id_b
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    )
"""


def _fs_scored(spark: SparkSession, sf: str):
    """Candidates (FastSS edit<=1) + Fellegi-Sunter field weights ->
    (id_a, id_b, dist, nation_agree, segment_agree, w_name, w_nation,
    w_segment)."""
    cust = t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    cand = edit1_pairs(cust, "c_custkey", "c_name").select(
        "id_a", "id_b", "dist"
    )
    n2 = F.col("n") * F.col("n")
    nn = cust.agg(F.count("*").cast("long").alias("n"))
    usq = lambda key, alias: (  # noqa: E731
        cust.groupBy(key)
        .agg(F.count("*").cast("long").alias("k"))
        .agg(F.sum(F.col("k") * F.col("k")).cast("long").alias(alias))
    )
    flog2 = lambda c: F.length(F.bin(c)) - 1  # noqa: E731
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    j = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(usq("c_nationkey", "un")))
        .crossJoin(F.broadcast(usq("c_mktsegment", "us")))
        .crossJoin(F.broadcast(usq("c_name", "uq")))
    )
    mn_e, md_e = _M["name_exact"]
    mn_c, md_c = _M["name_close"]
    un_c, ud_c = _U_NAME_CLOSE
    mn_n, md_n = _M["nation"]
    mn_s, md_s = _M["segment"]
    w_name = F.when(
        F.col("dist") == 0,
        flog2(F.lit(mn_e) * n2) - flog2(F.lit(md_e) * F.col("uq")),
    ).otherwise(
        F.lit(
            (mn_c * ud_c).bit_length() - 1 - ((md_c * un_c).bit_length() - 1)
        )
    )
    w_nation = F.when(
        F.col("nat_a") == F.col("nat_b"),
        flog2(F.lit(mn_n) * n2) - flog2(F.lit(md_n) * F.col("un")),
    ).otherwise(
        flog2(F.lit(md_n - mn_n) * n2)
        - flog2(F.lit(md_n) * (n2 - F.col("un")))
    )
    w_segment = F.when(
        F.col("seg_a") == F.col("seg_b"),
        flog2(F.lit(mn_s) * n2) - flog2(F.lit(md_s) * F.col("us")),
    ).otherwise(
        flog2(F.lit(md_s - mn_s) * n2)
        - flog2(F.lit(md_s) * (n2 - F.col("us")))
    )
    return j.select(
        "id_a",
        "id_b",
        "dist",
        F.when(F.col("nat_a") == F.col("nat_b"), 1).otherwise(0).alias(
            "nation_agree"
        ),
        F.when(F.col("seg_a") == F.col("seg_b"), 1).otherwise(0).alias(
            "segment_agree"
        ),
        w_name.cast("long").alias("w_name"),
        w_nation.cast("long").alias("w_nation"),
        w_segment.cast("long").alias("w_segment"),
    )


def _fs_final(scored):
    w = F.col("w_name") + F.col("w_nation") + F.col("w_segment")
    return scored.select(
        "id_a",
        "id_b",
        "dist",
        "nation_agree",
        "segment_agree",
        "w_name",
        "w_nation",
        "w_segment",
        w.cast("long").alias("weight_bits"),
        F.when(w >= _T_HI, "match")
        .when(w >= _T_LO, "possible")
        .otherwise("non-match")
        .alias("fs_class"),
    )


# ---------------------------------------------------------------------------
@register(
    "customer_linkage_fs_weights",
    _CAND_BRUTE_SQL + _FS_SCORING_SQL + _FS_SELECT_SQL,
    scale_oracle=_CAND_VARIANT_SQL + _FS_SCORING_SQL + _FS_SELECT_SQL,
)
def customer_linkage_fs_weights(spark: SparkSession, sf: str):
    """FELLEGI-SUNTER probabilistic record linkage over the FastSS
    edit-distance-1 candidate pairs: per pair the agreement vector on
    (name level, nation, segment), the three per-field log-odds weights
    in exact floor-log2 bits (u-probabilities DATA-DRIVEN as Σcnt²/N²
    exact integer rationals; m-probabilities documented rational model
    constants — see module docstring), the total weight, and the
    three-band classification (match / possible / non-match at the
    integer thresholds _T_HI=14 / _T_LO=5).  The scoring stage between blocking
    (``customer_name_edit1_fastss``) and clustering
    (``customer_entity_clusters``) — what upgrades "name similar" to a
    calibrated link decision that also weighs the cheap categorical
    evidence.  Scale: candidates are the variant equi-join (never
    all-pairs); u's are three map-side-combined aggregates broadcast as
    1-row frames; scoring is row-local integer expressions on the
    candidate set.  Overflow: the m·N² products stay int64 to N ~ 7e8
    customers.  The brute-force oracle is the zero-false-negative
    referee (disclosed-skip at sf >= 1; the variant-join scale twin
    gates there instead, exactly as the FastSS entry does)."""
    return _fs_final(_fs_scored(spark, sf)).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
@register(
    "customer_linkage_fs_summary",
    _CAND_BRUTE_SQL
    + _FS_SCORING_SQL
    + f"""
    , final AS ({_FS_SELECT_SQL})
    SELECT fs_class, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(weight_bits) AS BIGINT) AS min_weight,
           CAST(MAX(weight_bits) AS BIGINT) AS max_weight,
           CAST(SUM(dist) AS BIGINT) AS n_close_name,
           CAST(SUM(nation_agree) AS BIGINT) AS n_nation_agree,
           CAST(SUM(segment_agree) AS BIGINT) AS n_segment_agree
    FROM final GROUP BY fs_class
    """,
    scale_oracle=_CAND_VARIANT_SQL
    + _FS_SCORING_SQL
    + f"""
    , final AS ({_FS_SELECT_SQL})
    SELECT fs_class, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(weight_bits) AS BIGINT) AS min_weight,
           CAST(MAX(weight_bits) AS BIGINT) AS max_weight,
           CAST(SUM(dist) AS BIGINT) AS n_close_name,
           CAST(SUM(nation_agree) AS BIGINT) AS n_nation_agree,
           CAST(SUM(segment_agree) AS BIGINT) AS n_segment_agree
    FROM final GROUP BY fs_class
    """,
)
def customer_linkage_fs_summary(spark: SparkSession, sf: str):
    """The linkage QA rollup: per Fellegi-Sunter class the pair count,
    weight range, and agreement-pattern composition — the one-screen
    review a linkage run ships with (how big is the clerical band, do
    auto-links carry categorical disagreements).  Same candidate +
    scoring chain as ``customer_linkage_fs_weights``; one extra
    enumerable-domain groupBy."""
    f = _fs_final(_fs_scored(spark, sf))
    return f.groupBy("fs_class").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("weight_bits").cast("long").alias("min_weight"),
        F.max("weight_bits").cast("long").alias("max_weight"),
        F.sum("dist").cast("long").alias("n_close_name"),
        F.sum("nation_agree").cast("long").alias("n_nation_agree"),
        F.sum("segment_agree").cast("long").alias("n_segment_agree"),
    )


# ---------------------------------------------------------------------------
@register(
    "copurchase_clustering_coefficient",
    """
    WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    edges AS (
      SELECT DISTINCT a.p AS a, b.p AS b
      FROM os a JOIN os b ON b.ok = a.ok AND a.p < b.p
    ),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS n FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY n
    ),
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT x AS n FROM tris
      UNION ALL SELECT y FROM tris
      UNION ALL SELECT z FROM tris
    ),
    tcnt AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS t FROM corners GROUP BY n)
    SELECT deg.n AS part, deg.d AS degree,
           COALESCE(tcnt.t, 0) AS triangles,
           CASE WHEN deg.d >= 2 THEN
             CAST(2 * COALESCE(tcnt.t, 0) AS DOUBLE)
               / (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1.0))
           END AS clustering_coeff
    FROM deg LEFT JOIN tcnt ON tcnt.n = deg.n
    """,
)
def copurchase_clustering_coefficient(spark: SparkSession, sf: str):
    """LOCAL CLUSTERING COEFFICIENT per part on the co-purchase graph:
    c(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — how close each node's
    neighborhood is to a clique, THE community-structure readout next
    to the global triangle count (same graph, same degree-oriented
    enumeration — ``operators/graph.triangle_counts_per_node`` — but
    each triangle credited to all three corners via an OUTPUT-bounded
    explode).  High-coefficient parts sit in tight "bought-together"
    cliques (bundle candidates); degree-heavy low-coefficient parts are
    hubs bridging unrelated baskets.  Exact integer degree/triangle
    columns; the coefficient is one fixed tree, guarded for deg < 2.
    The oracle enumerates the same triangles via the naive ordered
    triple join and attributes corners identically — same numbers,
    different algorithm.  Scale: inherits triangle_count's arboricity
    bound; the corner explode adds 3 rows per triangle, output-bounded
    at any size."""
    from byte_convert_avro_spark.operators.graph import (
        triangle_counts_per_node,
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
    pn = triangle_counts_per_node(edges, "src", "dst")
    d_d = F.col("degree").cast("double")
    return pn.select(
        F.col("n").alias("part"),
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            (F.lit(2) * F.col("triangles")).cast("double")
            / (d_d * (d_d - F.lit(1.0))),
        ).alias("clustering_coeff"),
    )
