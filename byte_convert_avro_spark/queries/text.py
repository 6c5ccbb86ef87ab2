"""Text-analysis + deduplication operators over the ``documents`` table —
the LLM-training-data-pipeline surface: stats, language-ID heuristic,
token frequency, fingerprinting, exact dedup, MinHash-LSH signatures.

Determinism: every hash is ``md5`` (identical hex output in Spark and
DuckDB); shingling/token math is pure string+integer arithmetic.

Scale notes: all operators are explode -> groupBy shapes whose shuffle keys
are (doc_id, band) or token — uniformly distributed by construction.  At
100 TB the MinHash signature computation stays one explode + one partial-agg
shuffle; candidate pairing joins on (band, sig) where bucket sizes are the
LSH-bounded collision groups, so the join never quadratically explodes the
corpus (only within-bucket pairs materialize).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import hash_bucket, spread, register, t

N_BANDS = 8


# ---------------------------------------------------------------------------
@register(
    "doc_stats",
    """
    SELECT doc_id, source, lang,
           LENGTH(text) AS n_chars_calc,
           LEN(string_split(text, ' ')) AS n_words,
           LEN(list_distinct(string_split(text, ' '))) AS n_distinct_words,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / LEN(string_split(text, ' ')) AS avg_word_len
    FROM documents
    """,
)
def doc_stats(spark: SparkSession, sf: str):
    """Per-document stats: length, word count, vocabulary size, avg word
    length — the quality-scoring primitives, via
    ``operators/text.text_stats`` (the registry gate for that operator;
    the query previously inlined the identical expressions)."""
    from byte_convert_avro_spark.operators.text import text_stats

    d = text_stats(t(spark, sf, "documents"), "text")
    return d.select(
        "doc_id",
        "source",
        "lang",
        "n_chars_calc",
        "n_words",
        "n_distinct_words",
        "avg_word_len",
    )


# ---------------------------------------------------------------------------
@register(
    "lang_quality_profile",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def lang_quality_profile(spark: SparkSession, sf: str):
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
@register(
    "token_frequency_top50",
    """
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 50
    """,
)
def token_frequency_top50(spark: SparkSession, sf: str):
    """Corpus token frequency (term + document frequency), top 50.
    Explode -> partial-agg -> top-k; the shuffle carries one row per
    distinct token per partition, not per occurrence."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), "token")
        .limit(50)
    )


# ---------------------------------------------------------------------------
@register(
    "doc_fingerprints",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint,
           md5(text) AS raw_hash
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf: str):
    """Normalized document fingerprint (lowercase + whitespace collapse +
    md5) — the cheap exact-dup / near-identical detector."""
    d = t(spark, sf, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.md5(F.col("text")).alias("raw_hash"),
    )


# ---------------------------------------------------------------------------
@register(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS text_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_groups(spark: SparkSession, sf: str):
    """Exact dedup: hash-groupBy on content hash; keeper = min doc_id.
    (At 100 TB this is the first pass before any near-dup method — the
    shuffle key is the 128-bit hash, perfectly uniform.)"""
    d = t(spark, sf, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# ---------------------------------------------------------------------------
#: the ONE canonical stopword-langid oracle pipeline — the raw prediction
#: query and the confusion matrix both compose it, so the scoring
#: semantics cannot drift between them
_LANGID_CTE = """
    WITH scored AS (
      SELECT doc_id, lang,
        (LENGTH(text) - LENGTH(REPLACE(' ' || text || ' ', ' the ', ''))  + 2) / 5 AS s_en,
        (LENGTH(text) - LENGTH(REPLACE(' ' || text || ' ', ' der ', '')) + 2) / 5 AS s_de,
        (LENGTH(text) - LENGTH(REPLACE(' ' || text || ' ', ' le ', ''))  + 2) / 4 AS s_fr,
        (LENGTH(text) - LENGTH(REPLACE(' ' || text || ' ', ' el ', ''))  + 2) / 4 AS s_es
      FROM documents
    ), pred AS (
      SELECT doc_id, lang,
             CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'unknown' END AS guessed_lang
      FROM scored
    )
"""


@register(
    "lang_id_heuristic",
    f"""
    {_LANGID_CTE}
    SELECT doc_id, lang, guessed_lang FROM pred
    """,
)
def lang_id_heuristic(spark: SparkSession, sf: str):
    """Stopword-count language ID (n-gram-heuristic family).  Occurrence
    counting via length-delta of ``replace`` — pure string ops, engine-
    portable; a real pipeline would swap in fastText/CLD3 behind the same
    column contract."""
    d = t(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))

    def score(marker: str):
        # non-overlapping occurrence count * len(marker), +2 corrects padding
        return (
            F.length("text") - F.length(F.regexp_replace(padded, marker.replace(" ", "\\ "), "")) + 2
        ) / len(marker)

    sc = d.select(
        "doc_id",
        "lang",
        score(" the ").alias("s_en"),
        score(" der ").alias("s_de"),
        score(" le ").alias("s_fr"),
        score(" el ").alias("s_es"),
    )
    return sc.select(
        "doc_id",
        "lang",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") > 0),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")) & (F.col("s_de") > 0), "de")
        .when((F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") > 0), "fr")
        .when(F.col("s_es") > 0, "es")
        .otherwise("unknown")
        .alias("guessed_lang"),
    )


# ---------------------------------------------------------------------------
_MINHASH_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), idx AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
      FROM words WHERE len(w) >= 3
    ), shingles AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM idx
    ), bands AS (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band)
    SELECT doc_id, band, MIN(md5(band::VARCHAR || '|' || sh)) AS sig
    FROM shingles CROSS JOIN bands
    GROUP BY doc_id, band
"""


#: One unrolled round of min-label propagation + pointer jump over an
#: ``edges(src, dst)`` CTE that carries BOTH directions.  The r13 sf1
#: audit lesson: the previous recursive ``reach`` CTE (every (v, label)
#: reachability pair) is the TEXTBOOK spelling but its recursion joins a
#: frontier of s^2 rows per size-s component against that component's
#: edges — on the CLIQUE components an exact-dup corpus produces (10x
#: replicated docs => complete subgraphs) the per-iteration intermediate
#: is s^3 rows, and the sf1 run ballooned past 57 GB of DuckDB memory on
#: a graph whose answer is 50k rows.  The unrolled form is the oracle
#: twin of the operator's own loop: each round one LINEAR |E| neighbor-
#: min pass + one |V| label-of-label jump, O(rounds x (|E|+|V|)) total.
#: 16 rounds guarantee diameter <= 16 even with zero jump benefit
#: (LSH dup-graph components are shallow — cliques chained by near-dup
#: overlaps); a component deeper than the unroll FAILS THE GATE LOUDLY
#: (labels short of the fixpoint differ from Spark's converged ones).
_CC_ROUND = """
    , v{r} AS MATERIALIZED (
      SELECT l.n, LEAST(l.lbl, COALESCE(MIN(nb.lbl), l.lbl)) AS lbl
      FROM l{p} l
      LEFT JOIN edges e ON e.dst = l.n
      LEFT JOIN l{p} nb ON nb.n = e.src
      GROUP BY l.n, l.lbl
    ), l{r} AS MATERIALIZED (
      SELECT v.n, LEAST(v.lbl, COALESCE(p.lbl, v.lbl)) AS lbl
      FROM v{r} v LEFT JOIN v{r} p ON p.n = v.lbl
    )"""

CC_UNROLL_ROUNDS = 16

#: drop-in replacement for the old ``reach``/``comp`` pair: yields
#: ``comp(doc_id, component)`` — component = min reachable id, the same
#: fixpoint the operator converges to.
_CC_COMP_ORACLE = (
    """
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS n, src AS lbl FROM edges
    )"""
    + "".join(_CC_ROUND.format(r=i + 1, p=i) for i in range(CC_UNROLL_ROUNDS))
    + f"""
    , comp AS (
      SELECT n AS doc_id, lbl AS component FROM l{CC_UNROLL_ROUNDS}
    )"""
)


@register("minhash_signatures", _MINHASH_ORACLE)
def minhash_signatures(spark: SparkSession, sf: str):
    """MinHash-LSH signatures: word 3-gram shingles -> per-band min-hash.
    ``md5(band || '|' || shingle)`` plays the role of the band's hash
    permutation — deterministic and identical across engines.

    Delegates to :func:`operators.dedup.minhash_signatures` — shingles
    explode ONCE and all band minima accumulate as parallel agg buffers
    in a single codegen'd hash aggregation (~2-2.5× faster at local sf10
    than the explode×bands form this replaced; A/B in the operator's
    docstring).  The ``spread`` repartition exists because the driver's
    parquet is a single row group (one scan task): the md5-heavy shingle
    work must not inherit that.  On a real lake with many files/row-groups
    it is a no-op cost and can be dropped."""
    from byte_convert_avro_spark.operators import dedup as D

    docs = spread(t(spark, sf, "documents"), "doc_id")
    return D.minhash_signatures(docs, "text", "doc_id", n_bands=N_BANDS, shingle_n=3)


# ---------------------------------------------------------------------------
@register(
    "minhash_dup_candidates",
    f"""
    WITH sigs AS ({_MINHASH_ORACLE})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band) AS n_bands_matched
    FROM sigs a JOIN sigs b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def minhash_dup_candidates(spark: SparkSession, sf: str):
    """LSH candidate pairs: docs sharing any band signature.  Pairing is
    per (band, sig) bucket — the LSH property keeps buckets tiny, so the
    pair blow-up is bounded (this is the whole point vs all-pairs).
    Delegates to :func:`operators.dedup.lsh_candidates` (r14): the
    bucket-array form evaluates the signature pipeline ONCE instead of
    once per self-join side — same pair multiset, same counts."""
    from byte_convert_avro_spark.operators import dedup as D

    sigs = minhash_signatures(spark, sf)
    return D.lsh_candidates(sigs, "doc_id")


# ---------------------------------------------------------------------------
@register(
    "dedup_cluster_assignment",
    f"""
    WITH RECURSIVE sigs AS ({_MINHASH_ORACLE}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    {_CC_COMP_ORACLE}
    SELECT doc_id, component,
           COUNT(*) OVER (PARTITION BY component) AS cluster_size
    FROM comp
    """,
)
def dedup_cluster_assignment(spark: SparkSession, sf: str):
    """Cluster resolution — the step AFTER LSH pairing that no single join
    can express: "A~B, B~C" must collapse to one keeper for {{A,B,C}}.
    Connected components over the candidate-pair graph by iterative
    min-label propagation (operators/dedup.py:connected_components);
    component id = smallest doc_id reachable, the deterministic keeper.
    The DuckDB oracle computes the same fixpoint as a recursive CTE.

    Scale: rounds bounded by component diameter (near-dup clusters are
    shallow); each round is one shuffle join + partial min-agg, lineage
    truncated per round.  NOTE: constructing this query runs the
    propagation loop eagerly (localCheckpoint + converge check are
    actions) — same eager pattern as the streaming queries."""
    from byte_convert_avro_spark.operators.dedup import connected_components

    pairs = minhash_dup_candidates(spark, sf).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    w = W.partitionBy("component")
    return comp.select(
        F.col("v").alias("doc_id"),
        "component",
        F.count("*").over(w).alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
@register(
    "pii_redaction_stats",
    r"""
    WITH scrubbed AS (
      SELECT doc_id,
             regexp_matches(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+') AS has_email,
             regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g') AS t1
      FROM documents
    ), final AS (
      SELECT doc_id, has_email,
             regexp_matches(t1, '\+?[0-9][0-9 -]{7,14}[0-9]') AS has_phone,
             regexp_replace(t1, '\+?[0-9][0-9 -]{7,14}[0-9]', '<PHONE>', 'g') AS clean
      FROM scrubbed
    )
    SELECT CAST(SUM(CASE WHEN has_email THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(CASE WHEN has_phone THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
           CAST(SUM(LENGTH(clean)) AS BIGINT) AS clean_chars,
           COUNT(*) AS n_docs
    FROM final
    """,
)
def pii_redaction_stats(spark: SparkSession, sf: str):
    """PII scrub pass (emails, phone-number-shaped digit runs): detection
    counts + total post-redaction length.  Pure regexp_replace — the
    patterns are deliberately in the RE2/Java-compatible subset so both
    engines see identical matches.  At corpus scale this is a narrow map
    stage; the aggregation is the only (tiny) shuffle."""
    d = t(spark, sf, "documents")
    email = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    phone = r"\+?[0-9][0-9 -]{7,14}[0-9]"
    s = d.select(
        "doc_id",
        (F.regexp_count("text", F.lit(email)) > 0).alias("has_email"),
        F.regexp_replace("text", email, "<EMAIL>").alias("t1"),
    ).select(
        "doc_id",
        "has_email",
        (F.regexp_count("t1", F.lit(phone)) > 0).alias("has_phone"),
        F.regexp_replace("t1", phone, "<PHONE>").alias("clean"),
    )
    return s.agg(
        F.sum(F.when(F.col("has_email"), 1).otherwise(0)).cast("long").alias("docs_with_email"),
        F.sum(F.when(F.col("has_phone"), 1).otherwise(0)).cast("long").alias("docs_with_phone"),
        F.sum(F.length("clean")).cast("long").alias("clean_chars"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
@register(
    "above_median_quality_docs",
    r"""
    WITH base AS (
      SELECT doc_id, lang,
             LEN(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang, n_distinct,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_distinct, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM base
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           MIN(n_distinct) AS min_vocab,
           CAST(SUM(n_distinct) AS BIGINT) AS total_vocab
    FROM ranked
    WHERE rn > (n + 1) // 2
    GROUP BY lang
    """,
)
def above_median_quality_docs(spark: SparkSession, sf: str):
    """Per-group quality filtering: keep documents whose vocabulary size is
    strictly above their language's median rank — the exact, engine-
    portable form of 'top half by quality per group' (rank-based, so no
    quantile-interpolation differences can leak in).  One shuffle on lang
    serves both windows and the final aggregation."""
    d = t(spark, sf, "documents").select(
        "doc_id", "lang", F.size(F.array_distinct(F.split("text", " "))).alias("n_distinct")
    )
    wl = W.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        "n_distinct",
        F.row_number().over(wl.orderBy("n_distinct", "doc_id")).alias("rn"),
        F.count("*").over(wl).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") > F.floor((F.col("n") + 1) / 2))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n_distinct").alias("min_vocab"),
            F.sum("n_distinct").cast("long").alias("total_vocab"),
        )
    )


# ---------------------------------------------------------------------------
#: the ONE canonical winnowing-selection oracle pipeline (ends with
#: ``fps(doc_id, fp_hash)``) — the per-doc fingerprint query and the
#: cross-doc pair matcher both compose it, so the scheme (16-char hashes,
#: 4-hash windows, full windows only) cannot drift between them.  The
#: pure-Python reference in tests/test_functions.py stays an INDEPENDENT
#: implementation on purpose (it is the parity check).
_WINNOW_FPS_CTE = """
    WITH rh AS (
      SELECT doc_id, unnest(generate_series(1, LENGTH(text) - 15)) AS pos,
             md5(substr(text, unnest(generate_series(1, LENGTH(text) - 15)), 16))
               AS chunk_hash
      FROM documents WHERE LENGTH(text) >= 16
    ), win AS (
      SELECT doc_id, pos,
             MIN(chunk_hash) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
             COUNT(*) OVER (PARTITION BY doc_id) AS m
      FROM rh
    ), fps AS (
      SELECT DISTINCT doc_id, sel AS fp_hash
      FROM win WHERE pos <= m - 3
    )
"""


def _winnow_fps(spark: SparkSession, sf: str):
    """Spark twin of ``_WINNOW_FPS_CTE``: distinct (doc_id, fp_hash).

    ROW-LOCAL form (r14): winnowing selection is a per-document
    computation, so it runs entirely inside one projection — the rolling
    md5 array, the 4-hash window minima (``array_min(slice(...))`` ==
    the CTE's ``MIN ... ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING`` over
    full windows), and the per-doc ``array_distinct`` (== the CTE's
    global DISTINCT, since rows are keyed by doc).  The previous form
    exploded one row per character position and shuffled them all for
    two doc_id windows plus a distinct; at 100 TB those exchanges carry
    |corpus chars| rows for a decision every row can make locally.  Full
    4-hash windows need m = len-15 >= 4 positions, hence len >= 19 (docs
    of 16..18 chars produced rows upstream but never survived
    ``pos <= m-3``).  Large docs hold one m-element array per row here —
    bounded by the corpus's doc-length cap (chunk first if a doc can be
    tens of MB)."""
    sels = (
        "transform(sequence(1, size(_rh) - 3), "
        "i -> array_min(slice(_rh, i, 4)))"
    )
    return (
        spread(t(spark, sf, "documents"), "doc_id")
        .filter(F.length("text") >= 19)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, length(text) - 15),"
                " i -> md5(substring(text, i, 16)))"
            ).alias("_rh"),
        )
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.expr(sels))).alias("fp_hash"),
        )
    )


@register(
    "winnowing_fingerprints",
    f"""
    {_WINNOW_FPS_CTE}
    SELECT doc_id,
           COUNT(*) AS n_fingerprints,
           MIN(fp_hash) AS min_fp,
           MAX(fp_hash) AS max_fp
    FROM fps GROUP BY doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf: str):
    """WINNOWING (Schleimer et al., SIGMOD'03) — the selection stage that
    turns the per-position rolling hashes (``rolling_hash_chunks``) into
    a compact document fingerprint set: slide a window of 4 consecutive
    16-char chunk hashes and keep each window's MINIMUM (full windows
    only); the distinct selected hashes are the fingerprints.  Guarantees
    every shared substring of >= 19 chars contributes at least one COMMON
    fingerprint between two documents — the local-dedup primitive between
    exact chunks and MinHash.  Scale: one shuffle on doc_id; the frame is
    4 rows, the distinct + rollup stay doc_id-keyed."""
    return _winnow_fps(spark, sf).groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.min("fp_hash").alias("min_fp"),
        F.max("fp_hash").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS salience
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, salience, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY salience DESC, term) AS rank
      FROM scored)
    WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf: str):
    """TF-IDF-style term salience: each document's top-3 most
    characteristic terms by ``tf x (N / df)``.  The idf factor is the RAW
    rational N/df rather than its logarithm — deliberately: *, / are
    IEEE-correctly-rounded (bit-identical across engines) while libm
    ``ln`` is not, and for a fixed document the ranking by tf*N/df vs
    tf*ln-idf differs only in how aggressively stopwords are discounted —
    the determinism is worth that trade at the oracle boundary (swap in
    ``log`` on a real cluster if classic weighting is wanted).  Scale:
    tf and df are one explode + two uniform-key groupBys; the score join
    shuffles on the term (AQE handles stopword skew); the top-3 window is
    doc_id-keyed."""
    toks = spread(t(spark, sf, "documents"), "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = t(spark, sf, "documents").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias("salience"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("salience"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "salience", "rank")
    )


# ---------------------------------------------------------------------------
@register(
    "winnowing_shared_fingerprints",
    f"""
    {_WINNOW_FPS_CTE.rstrip()}, sizes AS (
      SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared,
           za.n_fp AS n_a, zb.n_fp AS n_b
    FROM fps a
    JOIN fps b ON b.fp_hash = a.fp_hash AND a.doc_id < b.doc_id
    JOIN sizes za ON za.doc_id = a.doc_id
    JOIN sizes zb ON zb.doc_id = b.doc_id
    GROUP BY 1, 2, za.n_fp, zb.n_fp
    HAVING COUNT(*) >= 3
    """,
)
def winnowing_shared_fingerprints(spark: SparkSession, sf: str):
    """Cross-document SUBSTRING matching via winnowing (the plagiarism /
    boilerplate detector): document pairs sharing >= 3 winnowing
    fingerprints, with each side's fingerprint count for context.  This
    composes the selection stage of ``winnowing_fingerprints`` into the
    pair stage — any shared run of >= 19 chars guarantees a shared
    fingerprint, so heavy textual overlap cannot hide, while the pair
    join runs on the fingerprint hash (the shuffle key): pair cost is
    bounded by fingerprint collisions, never |docs|².  Completes the
    substring-dedup story next to the chunk-granular
    ``corpus_strip_repeated_chunks``."""
    fps = _winnow_fps(spark, sf)
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("fp_hash").alias("fp2"))
    pairs = (
        a.join(b, (a.fp_hash == b.fp2) & (a.doc_a < b.doc_b))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    return pairs.join(za, "doc_a").join(zb, "doc_b").select(
        "doc_a", "doc_b", "n_shared", "n_a", "n_b"
    )


# ---------------------------------------------------------------------------
@register(
    "winnowing_pairs_capped",
    f"""
    {_WINNOW_FPS_CTE.rstrip()}, fpok AS (
      SELECT fp_hash FROM fps GROUP BY fp_hash HAVING COUNT(*) <= 8
    ), okfps AS (
      SELECT f.doc_id, f.fp_hash FROM fps f JOIN fpok k ON k.fp_hash = f.fp_hash
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_fp FROM okfps GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared,
           za.n_fp AS n_a, zb.n_fp AS n_b,
           CAST(COUNT(*) AS DOUBLE) / LEAST(za.n_fp, zb.n_fp) AS containment
    FROM okfps a
    JOIN okfps b ON b.fp_hash = a.fp_hash AND a.doc_id < b.doc_id
    JOIN sizes za ON za.doc_id = a.doc_id
    JOIN sizes zb ON zb.doc_id = b.doc_id
    GROUP BY 1, 2, za.n_fp, zb.n_fp
    HAVING COUNT(*) >= 3
    """,
)
def winnowing_pairs_capped(spark: SparkSession, sf: str):
    """The BOUNDED winnowing pair stage (round-7 lead #3): document pairs
    sharing >= 3 winnowing fingerprints, counting only fingerprints
    carried by <= 8 documents — a fingerprint in hundreds of docs is
    near-universal boilerplate contributing D² join rows and zero
    pair-discriminative signal (the 10x-verbatim-replica stress regime),
    so the cap bounds join output at cap² rows per fingerprint BY
    CONSTRUCTION, the same discipline as minhash-LSH's
    ``max_pairs_per_doc``.  Adds the containment score
    ``n_shared / min(n_a, n_b)`` over capped fingerprint sets (exact-int
    division, bit-identical).  Scale: the doc-frequency filter reuses the
    pair join's own shuffle key (operators/text.py
    shared_fingerprint_pairs)."""
    from byte_convert_avro_spark.operators.text import shared_fingerprint_pairs

    return shared_fingerprint_pairs(
        _winnow_fps(spark, sf), "doc_id", "fp_hash",
        min_shared=3, max_docs_per_fp=8,
    )


# ---------------------------------------------------------------------------
@register(
    "langid_confusion_matrix",
    f"""
    {_LANGID_CTE}
    SELECT lang AS actual_lang, guessed_lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY lang) AS share_of_actual
    FROM pred
    GROUP BY lang, guessed_lang
    """,
)
def langid_confusion_matrix(spark: SparkSession, sf: str):
    """Classifier-evaluation primitive over the langid heuristic: the
    (actual, predicted) confusion matrix with each cell's share of its
    actual-language row — the standard quality readout before swapping a
    heuristic for a real model.  Composes lang_id_heuristic (same scoring
    CTE on the oracle side, same plan on the Spark side), then one
    groupBy + one window over the tiny matrix; the share is a single
    division of exact counts, bit-identical cross-engine."""
    pred = lang_id_heuristic(spark, sf)
    cells = pred.groupBy(
        F.col("lang").alias("actual_lang"), "guessed_lang"
    ).agg(F.count("*").alias("n_docs"))
    wtot = W.partitionBy("actual_lang")
    return cells.select(
        "actual_lang",
        "guessed_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(wtot)).alias(
            "share_of_actual"
        ),
    )


# ---------------------------------------------------------------------------
@register(
    "doc_length_histogram",
    """
    SELECT CAST(LENGTH(bin(LENGTH(text))) AS INT) AS log2_bucket,
           COUNT(*) AS n_docs,
           MIN(LENGTH(text)) AS min_chars,
           MAX(LENGTH(text)) AS max_chars,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf: str):
    """Power-of-two LENGTH HISTOGRAM — the corpus-profiling first look:
    docs bucketed by floor(log2(len)) + 1 computed EXACTLY as the
    length of the binary representation (``conv(n, 10, 2)`` /
    ``bin(n)``) — libm ``log2`` is not correctly rounded at powers of
    two and could flip a boundary doc between engines; string length of
    the base-2 form cannot.  One groupBy on a tiny key space."""
    d = t(spark, sf, "documents")
    n = F.length("text")
    bucket = F.length(F.conv(n.cast("string"), 10, 2)).cast("int")
    return d.groupBy(bucket.alias("log2_bucket")).agg(
        F.count("*").alias("n_docs"),
        F.min(n).alias("min_chars"),
        F.max(n).alias("max_chars"),
        F.sum(n).cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
@register(
    "lang_source_concentration",
    """
    WITH cnt AS (
      SELECT lang, source, COUNT(*) AS ns FROM documents GROUP BY 1, 2
    )
    SELECT lang,
           CAST(SUM(ns) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(ns * ns) AS DOUBLE)
             / (CAST(SUM(ns) AS DOUBLE) * SUM(ns)) AS hhi
    FROM cnt GROUP BY lang
    """,
)
def lang_source_concentration(spark: SparkSession, sf: str):
    """SOURCE-MIX CONCENTRATION per language — the Herfindahl-Hirschman
    index (Σ share²) that flags languages dominated by one source (a
    training-mix red flag): computed as exact-integer Σns² over n² with
    ONE division, so no per-share float accumulation exists to diverge
    (the entropy alternative needs libm ln — not correctly rounded —
    which is why HHI is the oracle-exact diversity metric here)."""
    d = t(spark, sf, "documents")
    cnt = d.groupBy("lang", "source").agg(F.count("*").alias("ns"))
    return cnt.groupBy("lang").agg(
        F.sum("ns").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_sources"),
        (
            F.sum(F.col("ns") * F.col("ns")).cast("double")
            / (F.sum("ns").cast("double") * F.sum("ns"))
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
@register(
    "vocab_growth_heaps",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), firsts AS (
      SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
    ), per AS (
      SELECT first_doc AS doc_id, COUNT(*) AS new_tokens FROM firsts GROUP BY 1
    ), words AS (
      SELECT doc_id, LEN(string_split(text, ' ')) AS n_words FROM documents
    )
    SELECT w.doc_id,
           CAST(COALESCE(p.new_tokens, 0) AS BIGINT) AS new_tokens,
           CAST(SUM(COALESCE(p.new_tokens, 0))
                OVER (ORDER BY w.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS vocab_size,
           CAST(SUM(w.n_words)
                OVER (ORDER BY w.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS corpus_tokens
    FROM words w LEFT JOIN per p ON p.doc_id = w.doc_id
    """,
)
def vocab_growth_heaps(spark: SparkSession, sf: str):
    """HEAPS-LAW vocabulary growth: cumulative distinct vocabulary vs
    cumulative corpus tokens as documents arrive in doc_id order — the
    corpus-linguistics curve that decides tokenizer budgets.  The
    distinct state never lives in a window: each token collapses to its
    FIRST document (one token-keyed groupBy), per-doc new-token counts
    roll up, and a plain running sum IS the exact vocabulary size
    (same first-occurrence reduction as
    running_distinct_customers_by_nation).  The global window runs over
    |docs| post-aggregation rows."""
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    per = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("new_tokens"))
    )
    words = d.select("doc_id", F.size(F.split("text", " ")).alias("n_words"))
    j = words.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("new_tokens", F.lit(0)).cast("long").alias("new_tokens"),
        "n_words",
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return j.select(
        "doc_id",
        "new_tokens",
        F.sum("new_tokens").over(w).cast("long").alias("vocab_size"),
        F.sum("n_words").over(w).cast("long").alias("corpus_tokens"),
    )


# ---------------------------------------------------------------------------
@register(
    "bpe_first_merge_candidates",
    """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wf AS (
      SELECT w, COUNT(*) AS freq FROM words WHERE LENGTH(w) >= 2 GROUP BY w
    ), pairs AS (
      SELECT substr(w, i, 2) AS pair, freq
      FROM (SELECT w, freq, unnest(generate_series(1, LENGTH(w) - 1)) AS i
            FROM wf)
    ), counts AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n, rank FROM (
      SELECT pair, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
      FROM counts)
    WHERE rank <= 10
    """,
)
def bpe_first_merge_candidates(spark: SparkSession, sf: str):
    """BPE TOKENIZER TRAINING, step one: the corpus-wide adjacent
    character-pair frequencies whose argmax is byte-pair encoding's
    first merge — computed the way a distributed tokenizer trainer
    must: collapse the corpus to the WORD-FREQUENCY table first (the
    classic BPE optimization — identical words share one count), then
    explode each distinct word's adjacent pairs once, weighted by its
    frequency.  Top-10 merge candidates, ties broken lexically.
    Scale: the heavy explode runs over DISTINCT words (vocabulary-sized,
    sublinear in corpus), pair counts partial-aggregate map-side, and
    the top-10 is a TakeOrdered — no global sort.  Iterating
    merge-apply-recount yields the full BPE vocab; each round is this
    same plan over the rewritten word table."""
    words = (
        spread(t(spark, sf, "documents"), "doc_id")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
    )
    wf = words.groupBy("w").agg(F.count("*").alias("freq"))
    pairs = wf.select(
        F.posexplode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("_i", "pair"),
        "freq",
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
    return (
        counts.withColumn(
            "rank", F.row_number().over(W.orderBy(F.desc("n"), "pair"))
        )
        .filter(F.col("rank") <= 10)
        .select("pair", "n", "rank")
    )


# ---------------------------------------------------------------------------
#: shared BPE merge-fold pieces — ONE expression grammar both engines run.
#: acc encoding during the fold: "out<MK>pend" where out = SEP-joined
#: committed symbols and pend = the last uncommitted symbol (no MK in acc
#: means the whole acc is pend — the fold's initial state).
_BPE_SEP = "\x1f"  # joins symbols inside a word
_BPE_MK = "\x1e"   # separates committed output from the pending symbol


def _bpe_exprs() -> dict[str, str]:
    s, m = _BPE_SEP, _BPE_MK
    pend = f"(CASE WHEN instr(acc, '{m}') = 0 THEN acc ELSE split_part(acc, '{m}', 2) END)"
    out = f"(CASE WHEN instr(acc, '{m}') = 0 THEN '' ELSE split_part(acc, '{m}', 1) END)"
    commit = (
        f"(CASE WHEN instr(acc, '{m}') = 0 THEN acc"
        f" WHEN split_part(acc, '{m}', 2) = '' THEN split_part(acc, '{m}', 1)"
        f" ELSE split_part(acc, '{m}', 1) ||"
        f" (CASE WHEN split_part(acc, '{m}', 1) = '' THEN '' ELSE '{s}' END) ||"
        f" split_part(acc, '{m}', 2) END)"
    )
    step = (
        f"CASE WHEN {pend} = ml AND x = mr THEN"
        f" {out} || (CASE WHEN {out} = '' THEN '' ELSE '{s}' END) || ml || mr || '{m}'"
        f" ELSE {commit} || '{m}' || x END"
    )
    return {"step": step, "commit": commit}


def _bpe_train_parts(n_rounds: int = 3) -> list[str]:
    """Shared training CTE chain for the BPE oracles: word-frequency
    table -> unrolled merge rounds, each round = count adjacent pairs ->
    argmax (``best{r}``) -> exact greedy left-to-right fold applying the
    merge (reduce with the shared expression grammar; DuckDB's reduce
    seeds from the first element, matching the Spark fold's explicit
    init)."""
    s = _BPE_SEP
    e = _bpe_exprs()
    step_sql = e["step"].replace("ml", "b.l").replace("mr", "b.r2")
    commit_sql = e["commit"]
    parts = [
        f"""wf AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE LENGTH(w) >= 2 AND instr(w, '{s}') = 0 AND instr(w, '{_BPE_MK}') = 0
      GROUP BY w)""",
        f"""j0 AS (
      SELECT array_to_string(list_transform(generate_series(1, length(w)),
                             i -> substr(w, i, 1)), '{s}') AS sj, freq
      FROM wf)""",
    ]
    for r in range(n_rounds):
        parts.append(
            f"""p{r} AS (
      SELECT syms[i] AS l, syms[i + 1] AS r2, CAST(SUM(freq) AS BIGINT) AS n
      FROM (SELECT string_split(sj, '{s}') AS syms, freq,
                   unnest(generate_series(1, len(string_split(sj, '{s}')) - 1)) AS i
            FROM j{r})
      GROUP BY 1, 2)"""
        )
        parts.append(
            f"best{r} AS (SELECT l, r2, n FROM p{r} ORDER BY n DESC, l, r2 LIMIT 1)"
        )
        if r + 1 < n_rounds:
            parts.append(
                f"""j{r + 1} AS (
      SELECT CASE WHEN instr(folded, '{_BPE_MK}') = 0 THEN folded ELSE {commit_sql.replace("acc", "folded")} END AS sj, freq
      FROM (SELECT reduce(string_split(sj, '{s}'), (acc, x) -> {step_sql}) AS folded, freq
            FROM j{r} CROSS JOIN best{r} b))"""
            )
    return parts


def _bpe_oracle_sql(n_rounds: int = 3) -> str:
    """DuckDB twin of bpe_train_3_merges: the training chain, reporting
    each round's merge rule and count."""
    parts = _bpe_train_parts(n_rounds)
    selects = " UNION ALL ".join(
        f"SELECT {r + 1} AS round, l AS left_sym, r2 AS right_sym, l || r2 AS merged, n FROM best{r}"
        for r in range(n_rounds)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


def _bpe_tokenize_oracle_sql(n_rounds: int = 3) -> str:
    """DuckDB twin of corpus_bpe_tokenized: train ``n_rounds`` merges,
    then fold every DISTINCT word through them in sequence (wt0..wt{n}),
    and roll token counts up per document through a word join (words the
    vocabulary excludes — shorter than 2 chars — fall back to their
    character count)."""
    s, m = _BPE_SEP, _BPE_MK
    e = _bpe_exprs()
    step_sql = e["step"].replace("ml", "b.l").replace("mr", "b.r2")
    commit_sql = e["commit"].replace("acc", "folded")
    parts = _bpe_train_parts(n_rounds)
    parts.append(
        f"""wt0 AS (
      SELECT w, array_to_string(list_transform(generate_series(1, length(w)),
                                i -> substr(w, i, 1)), '{s}') AS sj
      FROM wf)"""
    )
    for r in range(n_rounds):
        parts.append(
            f"""wt{r + 1} AS (
      SELECT w, CASE WHEN instr(folded, '{m}') = 0 THEN folded ELSE {commit_sql} END AS sj
      FROM (SELECT w, reduce(string_split(sj, '{s}'), (acc, x) -> {step_sql}) AS folded
            FROM wt{r} CROSS JOIN best{r} b))"""
        )
    parts.append(
        f"""vocab AS (
      SELECT w, len(string_split(sj, '{s}')) AS n_tok FROM wt{n_rounds})"""
    )
    parts.append(
        "dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)"
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(LENGTH(d.w)) AS BIGINT) AS n_base_symbols,
           CAST(SUM(COALESCE(v.n_tok, LENGTH(d.w))) AS BIGINT) AS n_tokens
    FROM dw d LEFT JOIN vocab v ON v.w = d.w
    GROUP BY d.doc_id"""
    )


def _bpe_fold_expr(src_col: str = "sj") -> str:
    """The Spark merge-apply fold over a SEP-joined symbol string: seed
    from the first symbol, step through the rest with the shared grammar,
    commit the pending symbol in the finisher."""
    s = _BPE_SEP
    e = _bpe_exprs()
    return (
        f"aggregate(slice(split({src_col}, '{s}'), 2, size(split({src_col}, '{s}')) - 1),"
        f" element_at(split({src_col}, '{s}'), 1),"
        f" (acc, x) -> {e['step']},"
        f" acc -> {e['commit']})"
    )


def _rule_df(spark: SparkSession, rule: tuple[str, str, int]):
    """1-row (ml, mr) merge-rule frame from a collected rule — built via
    createDataFrame rather than string-spliced literals so arbitrary
    symbol text (quotes, backslashes) never needs SQL escaping."""
    return spark.createDataFrame([(rule[0], rule[1])], "ml string, mr string")


def _bpe_train_spark(spark: SparkSession, sf: str, n_rounds: int = 3):
    """Spark BPE trainer shared by the training-report and tokenizer
    queries: word-frequency table -> ``n_rounds`` greedy merge rounds.
    Returns ``(wf, rules)`` where ``wf`` = (w, freq) distinct words
    (localCheckpoint'd) and ``rules`` = one collected ``(l, r2, n)``
    tuple per round, in order.

    Iterative-job discipline (the kmeans/connected-components shape —
    one small driver collect per round): the word-frequency table is
    localCheckpoint'd ONCE so the corpus scan leaves the lineage, and
    each round's single merge rule is collected (3 values) and re-enters
    the plan as a broadcast 1-row frame.  Without this the lazy tree
    replicates the whole upstream per branch — measured 8 full document
    re-scans across the train+tokenize pipeline, and the old "never
    re-scanned after round 0" claim was only true per ACTION, not per
    plan branch.  Each round is one vocabulary-sized pair count
    (map-side partial) + a row-local fold; the per-round checkpoint
    keeps the symbol table vocab-sized."""
    s, m = _BPE_SEP, _BPE_MK
    words = (
        spread(t(spark, sf, "documents"), "doc_id")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(
            (F.length("w") >= 2)
            & (F.instr("w", s) == 0)
            & (F.instr("w", m) == 0)
        )
    )
    wf = words.groupBy("w").agg(F.count("*").alias("freq")).localCheckpoint()
    j = wf.select(
        F.expr(
            f"concat_ws('{s}', transform(sequence(1, length(w)), i -> substring(w, i, 1)))"
        ).alias("sj"),
        "freq",
    )
    rules: list[tuple[str, str, int]] = []
    for r in range(n_rounds):
        # zip_with over slices is TOTAL: a word fully merged to ONE symbol
        # makes sequence(1, 0) descend and element_at(syms, 0) throw under
        # ANSI (latent until a 2-char word equals a learned merge); slices
        # of length size-1 = 0 just yield zero pairs, matching DuckDB's
        # empty generate_series
        pairs = j.select(
            F.explode(
                F.expr(
                    f"zip_with(slice(split(sj, '{s}'), 1, size(split(sj, '{s}')) - 1),"
                    f" slice(split(sj, '{s}'), 2, size(split(sj, '{s}')) - 1),"
                    f" (a, b) -> named_struct('l', a, 'r2', b))"
                )
            ).alias("p"),
            "freq",
        ).select("p.l", "p.r2", "freq")
        counts = pairs.groupBy("l", "r2").agg(F.sum("freq").cast("long").alias("n"))
        row = counts.orderBy(F.desc("n"), "l", "r2").limit(1).collect()[0]
        rules.append((row.l, row.r2, int(row.n)))
        if r + 1 < n_rounds:
            j = (
                j.crossJoin(F.broadcast(_rule_df(spark, rules[-1])))
                .select(F.expr(_bpe_fold_expr("sj")).alias("sj"), "freq")
                .localCheckpoint()
            )
    return wf, rules


@register("bpe_train_3_merges", _bpe_oracle_sql(3))
def bpe_train_3_merges(spark: SparkSession, sf: str):
    """ITERATED BPE TOKENIZER TRAINING — three full merge rounds, each:
    count adjacent symbol pairs over the word-frequency table (weighted
    by word count, the classic vocabulary-sized optimization), pick the
    argmax pair (ties lexical), and APPLY the merge corpus-wide with an
    EXACT greedy left-to-right fold (chains merge correctly: 'aaaa'
    under (a,a) becomes (aa)(aa)) — the fold's accumulator is a
    marker-encoded string so the SAME expression grammar runs as a
    Spark ``aggregate`` and a DuckDB ``reduce``, and every round's merge
    rule + count hash-matches the unrolled oracle.  -> (round, left_sym,
    right_sym, merged, n).  Scale notes in :func:`_bpe_train_spark`."""
    _, rules = _bpe_train_spark(spark, sf, 3)
    return spark.createDataFrame(
        [
            (r + 1, l, r2, l + r2, n)
            for r, (l, r2, n) in enumerate(rules)
        ],
        "round int, left_sym string, right_sym string, merged string, n long",
    )


@register("corpus_bpe_tokenized", _bpe_tokenize_oracle_sql(3))
def corpus_bpe_tokenized(spark: SparkSession, sf: str):
    """APPLY the trained BPE tokenizer (round-6 verdict lead #5): the
    three learned merges tokenize the corpus and every document reports
    its word count, base symbol (character) count, and post-merge token
    count — the tokenize-with-learned-merges step every training
    pipeline actually runs after ``bpe_train_3_merges``, oracle-checked
    token-for-token against a DuckDB unroll of the same merges.

    Scale: the merge folds run once per DISTINCT WORD (vocabulary-sized,
    sublinear in corpus — the same optimization as training), each merge
    a broadcast 1-row rule; the corpus is then a word-keyed join of the
    exploded documents against the (w -> n_tokens) vocabulary and one
    per-doc sum.  Words outside the trained vocabulary (shorter than 2
    chars) fall back to their character count on both engines."""
    wf, rules = _bpe_train_spark(spark, sf, 3)
    s = _BPE_SEP
    wt = wf.select(
        "w",
        F.expr(
            f"concat_ws('{s}', transform(sequence(1, length(w)), i -> substring(w, i, 1)))"
        ).alias("sj"),
    )
    for rule in rules:
        wt = wt.crossJoin(F.broadcast(_rule_df(spark, rule))).select(
            "w", F.expr(_bpe_fold_expr("sj")).alias("sj")
        )
    vocab = wt.select("w", F.size(F.split("sj", s)).alias("n_tok"))
    dw = t(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        dw.join(vocab, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_base_symbols"),
            F.sum(F.coalesce("n_tok", F.length("w"))).cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "source_share_top3_others",
    """
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), ranked AS (
      SELECT source, n, ROW_NUMBER() OVER (ORDER BY n DESC, source) AS rn
      FROM counts
    )
    SELECT CASE WHEN rn <= 3 THEN source ELSE 'OTHERS' END AS bucket,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(n) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS share
    FROM ranked
    GROUP BY 1
    """,
)
def source_share_top3_others(spark: SparkSession, sf: str):
    """TOP-K + OTHERS — the reporting idiom every dashboard needs: the
    three largest sources named, the tail collapsed into one OTHERS
    bucket carrying its combined count, source count, and exact share.
    Scale: one groupBy on the source key, a rank over the TINY
    source-count table (never the rows), one broadcast scalar total."""
    d = t(spark, sf, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    ranked = counts.withColumn(
        "rn", F.row_number().over(W.orderBy(F.desc("n"), "source"))
    )
    total = d.agg(F.count("*").alias("total"))
    return (
        ranked.select(
            F.when(F.col("rn") <= 3, F.col("source")).otherwise("OTHERS").alias("bucket"),
            "n",
        )
        .groupBy("bucket")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_sources"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_docs",
            "n_sources",
            (F.col("n_docs").cast("double") / F.col("total")).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "dedup_aware_sampling_weights",
    f"""
    WITH RECURSIVE sigs AS ({_MINHASH_ORACLE}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    {_CC_COMP_ORACLE},
    sized AS (
      SELECT doc_id, component,
             COUNT(*) OVER (PARTITION BY component) AS cluster_size
      FROM comp
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
           1.0 / COALESCE(s.cluster_size, 1) AS sample_weight
    FROM documents d LEFT JOIN sized s ON s.doc_id = d.doc_id
    """,
)
def dedup_aware_sampling_weights(spark: SparkSession, sf: str):
    """DEDUP-AWARE TRAINING WEIGHTS — the soft alternative to dropping
    near-duplicates: every document keeps weight ``1 / cluster_size``
    (singletons weigh 1), so a 40-copy boilerplate cluster contributes
    ONE document's worth of gradient instead of 40 — the standard
    down-weighting fix for duplication-driven memorization.  Composes
    the full ladder: minhash-LSH candidates -> connected components ->
    per-component size -> broadcast-joined back onto the corpus; the
    weight is an exact unit fraction, bit-identical.  Scale: inherits
    every bound already proven for the pieces (LSH bucket join, CC
    diameter rounds); the final join ships (doc_id, size) ints only."""
    from byte_convert_avro_spark.operators.dedup import connected_components

    pairs = minhash_dup_candidates(spark, sf).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    sized = comp.select(
        F.col("v").alias("doc_id"),
        F.count("*").over(W.partitionBy("component")).alias("cluster_size"),
    )
    docs = t(spark, sf, "documents").select("doc_id")
    return docs.join(sized, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
        (F.lit(1.0) / F.coalesce("cluster_size", F.lit(1))).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
@register(
    "crosslingual_dup_leakage",
    r"""
    WITH corpus AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      -- mislabeled re-crawls: a 10% hash slice re-ingested under a
      -- different language tag and new ids
      SELECT doc_id + 1000000, 'xx', text FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
    ), fp AS (
      SELECT doc_id, lang,
             md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
      FROM corpus
    )
    SELECT fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           MIN(lang) AS min_lang, MAX(lang) AS max_lang
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(DISTINCT lang) >= 2
    """,
)
def crosslingual_dup_leakage(spark: SparkSession, sf: str):
    """CROSS-LANGUAGE DUPLICATE LEAKAGE — the split-contamination a
    per-language dedup pass misses: identical normalized content filed
    under DIFFERENT language labels (mislabeled langid, copied docs),
    which silently leaks across language-partitioned train/eval splits.
    One fingerprint groupBy with a distinct-lang count; empty result =
    clean corpus (and an empty hash-match is still a match both engines
    must agree on)."""
    d = t(spark, sf, "documents").select("doc_id", "lang", "text")
    relabeled = d.filter(hash_bucket("doc_id", 10) == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.lit("xx").alias("lang"), "text"
    )
    corpus = d.unionAll(relabeled)
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    return (
        corpus.select("doc_id", "lang", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
            F.min("lang").alias("min_lang"),
            F.max("lang").alias("max_lang"),
        )
        .filter(F.col("n_langs") >= 2)
    )


# ---------------------------------------------------------------------------
@register(
    "tfidf_cosine_top3",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tf),
    wts AS (
      SELECT t.doc_id, t.term,
             CAST(t.tf AS DOUBLE) * n.nd / d.df AS w
      FROM tf t JOIN df d ON d.term = t.term CROSS JOIN n
    ), norms AS (
      SELECT doc_id,
             sqrt(list_reduce(list(w * w ORDER BY term), (a, b) -> a + b))
               AS nrm
      FROM wts GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS qid, b.doc_id AS did,
             list_reduce(list(a.w * b.w ORDER BY a.term), (x, y) -> x + y)
               AS dot
      FROM wts a
      JOIN wts b ON b.term = a.term AND b.doc_id >= 5
      WHERE a.doc_id < 5
      GROUP BY 1, 2
    ), sims AS (
      SELECT d.qid, d.did,
             ROUND(d.dot / (qa.nrm * qb.nrm), 4) AS sim
      FROM dots d
      JOIN norms qa ON qa.doc_id = d.qid
      JOIN norms qb ON qb.doc_id = d.did
    )
    SELECT qid, did, sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY sim DESC, did) AS rank
      FROM sims)
    WHERE rank <= 3
    """,
)
def tfidf_cosine_top3(spark: SparkSession, sf: str):
    """SPARSE vector-space retrieval — TF-IDF cosine top-3 over the
    inverted term join, the classic-IR counterpart of the dense
    embedding kNN: weights are ``tf * N / df`` (rational idf — *, /
    are IEEE-exact on exact ints, the tfidf_top_terms trade), the dot
    product sums shared-term products through a TERM-ORDERED fold and
    norms likewise (both folds bounded BY CONSTRUCTION at the document
    vocabulary — the ordered_fold memory contract), so every cosine is
    bit-identical cross-engine before the display ROUND.  Scale: the
    pair enumeration is a join on the TERM — bounded by df per term;
    production corpora cap or drop stop-word terms first
    (max_docs_per_bucket discipline; this 16-word synthetic vocabulary
    deliberately runs uncapped so the gate has signal).  Query side
    bounded to 5 docs."""
    from byte_convert_avro_spark.functions import ordered_fold

    docs = spread(t(spark, sf, "documents"), "doc_id")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = tf.select(F.countDistinct("doc_id").alias("nd"))
    wts = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("tf").cast("double") * F.col("nd") / F.col("df")).alias("w"),
        )
    )
    norms = (
        wts.select("doc_id", "term", (F.col("w") * F.col("w")).alias("w2"))
        .groupBy("doc_id")
        .agg(F.sqrt(ordered_fold("term", "w2")).alias("nrm"))
    )
    a = wts.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("qid"), "term", F.col("w").alias("wa")
    )
    b = wts.filter(F.col("doc_id") >= 5).select(
        F.col("doc_id").alias("did"), F.col("term").alias("term2"),
        F.col("w").alias("wb"),
    )
    dots = (
        a.join(b, a.term == b.term2)
        .select("qid", "did", "term", (F.col("wa") * F.col("wb")).alias("p"))
        .groupBy("qid", "did")
        .agg(ordered_fold("term", "p").alias("dot"))
    )
    qa = norms.select(F.col("doc_id").alias("qid"), F.col("nrm").alias("qn"))
    qb = norms.select(F.col("doc_id").alias("did"), F.col("nrm").alias("dn"))
    sims = (
        dots.join(qa, "qid")
        .join(qb, "did")
        .select(
            "qid", "did",
            F.round(F.col("dot") / (F.col("qn") * F.col("dn")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), "did")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "did", "sim", "rank")
    )


# ---------------------------------------------------------------------------
@register(
    "bm25_rational_top3",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM words GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(*) AS nd, SUM(dlen) AS total_len FROM dl
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), qterms AS (
      SELECT DISTINCT doc_id AS qid, term FROM tf WHERE doc_id < 5
    ), scored AS (
      SELECT q.qid, t.doc_id AS did,
             (CAST(s.nd AS DOUBLE) / d.df)
               * (t.tf * (1.2e0 + 1.0e0))
               / (t.tf + 1.2e0 * (1.0e0 - 0.75e0
                  + 0.75e0 * CAST(l.dlen AS DOUBLE) * s.nd / s.total_len))
               AS contrib,
             t.term
      FROM qterms q
      JOIN tf t ON t.term = q.term AND t.doc_id >= 5
      JOIN df d ON d.term = q.term
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    ), sums AS (
      SELECT qid, did,
             list_reduce(list(contrib ORDER BY term), (a, b) -> a + b)
               AS score
      FROM scored GROUP BY 1, 2
    )
    SELECT qid, did, ROUND(score, 4) AS bm25, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY ROUND(score, 4) DESC, did) AS rank
      FROM sums)
    WHERE rank <= 3
    """,
)
def bm25_rational_top3(spark: SparkSession, sf: str):
    """BM25 RANKING (k1=1.2, b=0.75) with the rational-idf trade: the
    tf-saturation core ``tf(k1+1) / (tf + k1(1-b+b·dl·N/Σdl))`` uses
    ONLY exact-int inputs through IEEE *, /, so scores are bit-identical
    cross-engine; the idf keeps ``N/df`` (the tfidf_top_terms trade —
    libm ``ln`` is NOT reproducible across engines, and monotone idf
    variants preserve BM25's RANKING, which is the deliverable).  Terms
    contribute in TERM ORDER through the bounded fold; rank ties break
    on the rounded score then doc id in BOTH engines (scores compare
    post-ROUND so a representation tie cannot reorder).  Scale: the
    scoring join is per-term bounded by df (stop-word cap discipline at
    production vocabularies); query side bounded to 5 docs; dl/N/Σdl
    are one tiny broadcast."""
    from byte_convert_avro_spark.functions import ordered_fold

    docs = spread(t(spark, sf, "documents"), "doc_id")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = words.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    stats = dl.agg(
        F.count("*").alias("nd"), F.sum("dlen").alias("total_len")
    )
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        tf.filter(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("qid"), "term")
        .distinct()
    )
    corpus_tf = tf.filter(F.col("doc_id") >= 5).select(
        F.col("doc_id").alias("did"), F.col("term").alias("cterm"), "tf"
    )
    scored = (
        qterms.join(corpus_tf, qterms.term == corpus_tf.cterm)
        .join(df_counts, "term")
        .join(dl.select(F.col("doc_id").alias("did"), "dlen"), "did")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "did",
            "term",
            (
                (F.col("nd").cast("double") / F.col("df"))
                * (F.col("tf") * (1.2 + 1.0))
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        1.0
                        - 0.75
                        + 0.75
                        * F.col("dlen").cast("double")
                        * F.col("nd")
                        / F.col("total_len")
                    )
                )
            ).alias("contrib"),
        )
    )
    sums = scored.groupBy("qid", "did").agg(
        ordered_fold("term", "contrib").alias("score")
    )
    w = W.partitionBy("qid").orderBy(F.desc(F.round(F.col("score"), 4)), "did")
    return (
        sums.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "qid", "did", F.round(F.col("score"), 4).alias("bm25"), "rank"
        )
    )


# ---------------------------------------------------------------------------
@register(
    "documents_pii_redaction_stats",
    r"""
    WITH seeded AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 3 <> 2
                  THEN text || ' Contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1-415-555-0'
                       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    ), red AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t1
      FROM seeded
    ), red2 AS (
      SELECT doc_id, lang, n_emails,
             len(regexp_extract_all(t1,
                 '\b((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\b'))
               AS n_ipv4,
             regexp_replace(t1,
                 '\b((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\b',
                 '<IP>', 'g') AS t2
      FROM red
    ), red3 AS (
      SELECT doc_id, lang, n_emails, n_ipv4,
             len(regexp_extract_all(t2,
                 '\+?[0-9][0-9()\-\. ]{7,}[0-9]')) AS n_phones,
             regexp_replace(t2, '\+?[0-9][0-9()\-\. ]{7,}[0-9]',
                 '<PHONE>', 'g') AS t3
      FROM red2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_emails + n_ipv4 + n_phones > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_ipv4) AS BIGINT) AS total_ipv4,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(length(t3)) AS BIGINT) AS redacted_chars
    FROM red3 GROUP BY lang
    """,
)
def documents_pii_redaction_stats(spark: SparkSession, sf: str):
    """PII SCRUBBING under the oracle gate, the STRONG form — supersedes
    the early ``pii_redaction_stats`` above, whose email+phone pass is
    vacuous on this corpus (zero digits → zero matches; it stays
    registered as the no-PII-baseline row): detect + redact emails /
    IPv4 / phone heuristics
    (``operators/text.redact_pii``; staged order is part of the
    contract — emails, then dotted quads, then phones on the
    already-redacted text, counts on each stage's input).  The driver
    corpus contains NO digits at all, so the query first INJECTS
    deterministic synthetic PII derived from doc_id into 2/3 of the
    docs — identically in both spellings — making the gate compare the
    two engines' regex ENGINES (Java vs RE2) on thousands of distinct
    strings: per lang, doc/PII counts per class and the total redacted
    text length (a character-exact replacement proof).  Patterns stay
    in the dialect subset both engines share (classes, counted reps,
    word boundaries; no lookaround/backrefs).  Scale: the whole
    detector is row-local narrow projections — zero shuffle before the
    final small groupBy; regex cost is linear in corpus bytes, the
    same profile as quality_score."""
    from byte_convert_avro_spark.operators.text import redact_pii

    d = t(spark, sf, "documents").select("doc_id", "lang", "text")
    seeded = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 != 2,
            F.concat(
                F.col("text"),
                F.lit(" Contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-415-555-0"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit(" ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    red = redact_pii(seeded, "text")
    return red.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones") > 0,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_docs_with_pii"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_ipv4").cast("long").alias("total_ipv4"),
        F.sum("n_phones").cast("long").alias("total_phones"),
        F.sum(F.length("text_redacted")).cast("long").alias("redacted_chars"),
    )


# ---------------------------------------------------------------------------
@register(
    "token_count_min_vs_exact",
    """
    WITH tok AS (
      SELECT t.token FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> ''
    ), exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM tok GROUP BY token
    ), top AS (
      SELECT token, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, token LIMIT 10
    ), ds AS (
      SELECT unnest([0, 1, 2]) AS i
    ), cells AS (
      SELECT d.i,
             ('0x' || substr(md5(tok.token || ':cm' || CAST(d.i AS VARCHAR)),
                             1, 8))::BIGINT % 32 AS pos,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok CROSS JOIN ds d
      GROUP BY 1, 2
    ), est AS (
      SELECT t.token, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
      FROM top t
      CROSS JOIN ds d
      JOIN cells c
        ON c.i = d.i
       AND c.pos = ('0x' || substr(md5(t.token || ':cm'
                                       || CAST(d.i AS VARCHAR)), 1, 8))::BIGINT % 32
      GROUP BY t.token
    )
    SELECT t.token, t.exact_cnt, e.est_cnt,
           e.est_cnt - t.exact_cnt AS overestimate
    FROM top t JOIN est e ON e.token = t.token
    """,
)
def token_count_min_vs_exact(spark: SparkSession, sf: str):
    """COUNT-MIN SKETCH vs EXACT — the heavy-hitter estimation sketch
    under the gate (``operators/sketch.count_min_build/estimate``):
    token frequencies from a deliberately UNDERSIZED 3x32 counter matrix
    (the corpus vocabulary exceeds 32, so collisions are guaranteed and
    the overestimate column is non-trivially positive) next to the
    exact counts for the top-10 tokens.  The md5-salted hash family
    makes the matrix byte-identical cross-engine, so the collision
    pattern itself is pinned — the overestimate is a checked VALUE, not
    a probabilistic bound.  The never-underestimate contract shows as
    overestimate >= 0 on every row.  Scale: build is one explode(3) +
    one (i, pos) groupBy with map-side partials into a 96-row matrix;
    estimation is a broadcast join — the standard design for 'how often
    does each of these million items appear in 100 TB' without a
    per-item shuffle."""
    from byte_convert_avro_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    tok = (
        t(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    exact = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    top = exact.orderBy(F.col("exact_cnt").desc(), "token").limit(10)
    sk = count_min_build(tok, "token", d=3, w=32)
    est = count_min_estimate(sk, top.select("token"), "token", d=3, w=32)
    return top.join(est, "token").select(
        "token",
        "exact_cnt",
        F.col("est").alias("est_cnt"),
        (F.col("est") - F.col("exact_cnt")).alias("overestimate"),
    )
