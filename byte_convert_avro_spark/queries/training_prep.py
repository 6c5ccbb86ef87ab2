"""Training-corpus preparation: benchmark decontamination and
deterministic stratified sampling.

Both queries follow the content-stable-hash discipline of
``dataset_split_assignment``: every decision is a pure function of
``doc_id``, so results are identical across runs, engines, partitionings,
and cluster sizes — the property a reproducible training-data pipeline
needs and ``rand()``/``TABLESAMPLE`` cannot give.

Scale notes:

- Decontamination broadcasts the benchmark gram set (eval suites are MBs
  against a TB-scale corpus): the train side streams map-side through the
  hash join; the only shuffle is the final count-by-document partial agg.
- Stratified sampling computes per-stratum thresholds from a tiny
  aggregate (|langs| rows), broadcasts them back, and filters map-side;
  the quota arithmetic is integer (parts-per-million via ``div``), so the
  sampled set is engine-exact, not float-rounded.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from byte_convert_avro_spark.operators.dedup import cross_corpus_ngram_overlap
from byte_convert_avro_spark.queries.base import hash_bucket, register, spread, t


# ---------------------------------------------------------------------------
@register(
    "decontamination_ngram_overlap",
    """
    WITH assigned AS (
      SELECT doc_id, lang, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) AS bucket
      FROM documents
    ),
    tw AS (SELECT doc_id, lang, string_split(text, ' ') AS w
           FROM assigned WHERE bucket < 80),
    bw AS (SELECT string_split(text, ' ') AS w
           FROM assigned WHERE bucket >= 90),
    tg AS (
      SELECT doc_id, lang, array_to_string(w[i:i+4], ' ') AS sh
      FROM tw, UNNEST(generate_series(1, len(w) - 4)) AS u(i)
      WHERE len(w) >= 5
    ),
    bg AS (
      SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS sh
      FROM bw, UNNEST(generate_series(1, len(w) - 4)) AS u(i)
      WHERE len(w) >= 5
    )
    SELECT tg.doc_id, ANY_VALUE(tg.lang) AS lang,
           COUNT(DISTINCT tg.sh) AS n_shared_grams
    FROM tg JOIN bg USING (sh)
    GROUP BY tg.doc_id
    """,
)
def decontamination_ngram_overlap(spark: SparkSession, sf: str):
    """Benchmark decontamination (the GPT-3/PaLM n-gram overlap check):
    flag train-split documents sharing any 5-gram with a held-out
    test-split document (the stand-in eval benchmark).  Splits reuse the
    ``dataset_split_assignment`` hash buckets, so "benchmark" membership
    is content-stable.  Plan: distinct benchmark grams are broadcast
    (eval sets are tiny at any corpus scale); train grams hash-join
    map-side and only the per-doc count shuffles."""
    d = t(spark, sf, "documents").withColumn("bucket", hash_bucket("doc_id", 100))
    train = spread(d.filter(F.col("bucket") < 80), "doc_id").select("doc_id", "lang", "text")
    bench = d.filter(F.col("bucket") >= 90).select("text")
    hits = cross_corpus_ngram_overlap(
        train, bench, "text", "doc_id", n=5, carry_cols=("lang",)
    )
    return hits.select("doc_id", "lang", "n_shared_grams")


# ---------------------------------------------------------------------------
@register(
    "stratified_sample_balanced",
    """
    WITH counts AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY 1),
    tgt AS (SELECT MIN(n_total) AS target FROM counts),
    thr AS (SELECT lang, n_total, (target * 1000000) // n_total AS ppm
            FROM counts, tgt),
    hashed AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 AS ppm_b
      FROM documents
    )
    SELECT lang, n_total, ppm,
           COUNT(*) AS n_sampled,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM hashed JOIN thr USING (lang)
    WHERE ppm_b < ppm
    GROUP BY 1, 2, 3
    """,
)
def stratified_sample_balanced(spark: SparkSession, sf: str):
    """Deterministic stratified downsampling to a balanced language mix:
    every stratum is sampled toward the size of the SMALLEST stratum by
    keeping docs whose stable hash falls under a per-stratum
    parts-per-million quota (integer ``div`` — engine-exact, no float
    rates).  Plan: stratum counts are a tiny agg (|langs| rows) joined
    back via broadcast; the keep/drop decision is a map-side filter, so
    the corpus is read once and never shuffled before the final summary
    agg."""
    d = t(spark, sf, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_total"))
    target = counts.agg(F.min("n_total").alias("target"))
    thr = counts.crossJoin(F.broadcast(target)).select(
        "lang", "n_total",
        F.expr("(target * CAST(1000000 AS BIGINT)) div n_total").alias("ppm"),
    )
    hashed = d.select("doc_id", "lang", hash_bucket("doc_id", 1_000_000).alias("ppm_b"))
    return (
        hashed.join(F.broadcast(thr), "lang")
        .filter(F.col("ppm_b") < F.col("ppm"))
        .groupBy("lang", "n_total", "ppm")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "repetition_metrics",
    """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    base AS (
      SELECT doc_id, len(w) AS n_words,
             len(list_distinct(w)) AS n_distinct_words, w
      FROM words WHERE len(w) >= 2
    ),
    bigrams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
      FROM base, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
    ),
    counts AS (
      SELECT doc_id, bg, COUNT(*) AS cnt FROM bigrams GROUP BY 1, 2
    ),
    top AS (
      SELECT c.doc_id, MIN(c.bg) AS top_bigram, m.mc AS top_bigram_n
      FROM counts c
      JOIN (SELECT doc_id, MAX(cnt) AS mc FROM counts GROUP BY 1) m
        ON m.doc_id = c.doc_id AND c.cnt = m.mc
      GROUP BY c.doc_id, m.mc
    )
    SELECT b.doc_id, b.n_words, b.n_distinct_words,
           CAST(((b.n_words - b.n_distinct_words) * 10000) // b.n_words AS BIGINT)
             AS dup_word_frac_e4,
           t.top_bigram, t.top_bigram_n,
           CAST((2 * t.top_bigram_n * 10000) // b.n_words AS BIGINT)
             AS top_bigram_word_frac_e4
    FROM base b JOIN top t USING (doc_id)
    """,
)
def repetition_metrics(spark: SparkSession, sf: str):
    """Gopher/C4-style repetition quality filters: per document, the
    duplicate-word fraction and the share of words covered by the most
    frequent bigram (ties broken by lexicographically-smallest bigram so
    engines agree).  Docs dominated by one repeated phrase are the classic
    low-quality-for-training signal these thresholds remove.

    Fractions are emitted as integer parts-per-10^4 (``*_e4`` columns,
    floor of frac*10000) computed in pure integer arithmetic — the same
    cross-engine determinism discipline as the cents columns elsewhere;
    ROUND(double, 4) can disagree between engines on representation-tie
    values.

    Plan: one explode -> count per (doc, bigram) -> per-doc max join; all
    shuffle keys carry the doc_id so distribution is uniform in documents,
    and every agg is partial-first.  No Python anywhere."""
    d = spread(t(spark, sf, "documents"), "doc_id")
    base = (
        d.withColumn("w", F.split("text", " "))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.size("w").alias("n_words"),
            F.size(F.array_distinct("w")).alias("n_distinct_words"),
            "w",
        )
    )
    bigrams = base.select(
        "doc_id",
        # zip_with over slices is TOTAL (the element_at form throws on
        # <2-word docs when the explode's inferred predicates push the
        # transform below the size filter — see doc_bigram_familiarity)
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                " (a, b) -> concat_ws(' ', a, b))"
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("cnt"))
    maxes = counts.groupBy("doc_id").agg(F.max("cnt").alias("mc"))
    top = (
        counts.join(maxes, "doc_id")
        .filter(F.col("cnt") == F.col("mc"))
        .groupBy("doc_id", "mc")
        .agg(F.min("bg").alias("top_bigram"))
        .select("doc_id", "top_bigram", F.col("mc").alias("top_bigram_n"))
    )
    return base.drop("w").join(top, "doc_id").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.expr("(cast(n_words - n_distinct_words as bigint) * 10000) div n_words")
        .alias("dup_word_frac_e4"),
        "top_bigram",
        "top_bigram_n",
        F.expr("(2 * cast(top_bigram_n as bigint) * 10000) div n_words")
        .alias("top_bigram_word_frac_e4"),
    )


# ---------------------------------------------------------------------------
@register(
    "incremental_dedup_new_batch",
    """
    WITH assigned AS (
      SELECT doc_id, text,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) AS bucket
      FROM documents
    ),
    corpus AS (SELECT doc_id, text FROM assigned WHERE bucket < 80),
    newb   AS (SELECT doc_id, text FROM assigned WHERE bucket >= 90),
    exact AS (
      SELECT n.doc_id, MIN(c.doc_id) AS m
      FROM newb n JOIN corpus c ON md5(c.text) = md5(n.text)
      GROUP BY 1
    ),
    cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    nw AS (SELECT doc_id, string_split(text, ' ') AS w FROM newb),
    cidx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
             FROM cw WHERE len(w) >= 3),
    csh  AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM cidx),
    nidx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
             FROM nw WHERE len(w) >= 3),
    nsh  AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM nidx),
    hidx AS (SELECT unnest(generate_series(0, 31)) AS h),
    cmins AS (SELECT doc_id, h, MIN(md5(h::VARCHAR || '|' || sh)) AS mn
              FROM csh CROSS JOIN hidx GROUP BY doc_id, h),
    csig AS (SELECT doc_id, h // 2 AS band,
                    MIN(CASE WHEN h % 2 = 0 THEN mn END)
                      || MIN(CASE WHEN h % 2 = 1 THEN mn END) AS sig
             FROM cmins GROUP BY doc_id, h // 2),
    nmins AS (SELECT doc_id, h, MIN(md5(h::VARCHAR || '|' || sh)) AS mn
              FROM nsh CROSS JOIN hidx GROUP BY doc_id, h),
    nsig AS (SELECT doc_id, h // 2 AS band,
                    MIN(CASE WHEN h % 2 = 0 THEN mn END)
                      || MIN(CASE WHEN h % 2 = 1 THEN mn END) AS sig
             FROM nmins GROUP BY doc_id, h // 2),
    near AS (
      SELECT n.doc_id, MIN(c.doc_id) AS m
      FROM nsig n JOIN csig c ON n.band = c.band AND n.sig = c.sig
      GROUP BY 1
    )
    SELECT nb.doc_id,
           CASE WHEN e.m IS NOT NULL THEN 'exact_dup'
                WHEN r.m IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS status,
           COALESCE(e.m, r.m) AS matched_corpus_doc
    FROM newb nb
    LEFT JOIN exact e ON e.doc_id = nb.doc_id
    LEFT JOIN near  r ON r.doc_id = nb.doc_id
    """,
)
def incremental_dedup_new_batch(spark: SparkSession, sf: str):
    """Incremental-ingestion dedup: classify each NEW document (the
    held-out hash split stands in for today's crawl batch) against the
    EXISTING corpus — exact content-hash dup, MinHash-LSH near-dup, or
    unique; matched_corpus_doc = smallest matching corpus doc.  The
    daily-ingest shape: the corpus is never re-deduped, only probed.

    Plan: the new batch is tiny next to the corpus, so BOTH probe joins
    broadcast the new side (hashes, then band signatures) — the corpus
    streams map-side; on a real lake its hash/signature tables are
    precomputed once and reused every batch.  Signatures use the
    production ``rows_per_band=2`` banding (round-9 organic study,
    SCALE.md): at r=1 a boilerplate band signature is shared by a
    corpus-growing bucket, so the probe join's fan-out grows with the
    corpus; at r=2 buckets stay near true-cluster size, which bounds
    the join intermediate with no cap needed on this probe shape."""
    from byte_convert_avro_spark.operators import dedup as D

    d = t(spark, sf, "documents").withColumn("bucket", hash_bucket("doc_id", 100))
    corpus = d.filter(F.col("bucket") < 80).select("doc_id", "text")
    newb = d.filter(F.col("bucket") >= 90).select("doc_id", "text")

    nh = newb.select("doc_id", F.md5("text").alias("h"))
    ch = corpus.select(F.md5("text").alias("h"), F.col("doc_id").alias("cdoc"))
    exact = (
        ch.join(F.broadcast(nh), "h")
        .groupBy("doc_id")
        .agg(F.min("cdoc").alias("m_exact"))
    )

    sig_new = D.minhash_signatures(
        newb, "text", "doc_id", n_bands=16, shingle_n=3, rows_per_band=2
    )
    sig_corpus = D.minhash_signatures(
        spread(corpus, "doc_id"), "text", "doc_id",
        n_bands=16, shingle_n=3, rows_per_band=2,
    ).select(F.col("doc_id").alias("cdoc"), "band", "sig")
    near = (
        sig_corpus.join(F.broadcast(sig_new), ["band", "sig"])
        .groupBy("doc_id")
        .agg(F.min("cdoc").alias("m_near"))
    )

    return (
        newb.select("doc_id")
        .join(F.broadcast(exact), "doc_id", "left")
        .join(F.broadcast(near), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("m_exact").isNotNull(), "exact_dup")
            .when(F.col("m_near").isNotNull(), "near_dup")
            .otherwise("unique")
            .alias("status"),
            F.coalesce("m_exact", "m_near").alias("matched_corpus_doc"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "training_manifest_final",
    r"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), kept AS (
      SELECT d.doc_id, d.lang, d.text,
             LEN(regexp_extract_all(d.text, '\w+|[^\w\s]')) AS n_tokens
      FROM documents d JOIN keepers k ON k.doc_id = d.doc_id
    ), med AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS med2 FROM (
        SELECT n_tokens,
               ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM kept)
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    ), selected AS (
      SELECT k.doc_id, k.lang, k.n_tokens,
             CASE WHEN ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < 95 THEN 'train' ELSE 'val' END AS split
      FROM kept k CROSS JOIN med m
      WHERE 2 * k.n_tokens >= m.med2
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM selected GROUP BY split, lang
    """,
)
def training_manifest_final(spark: SparkSession, sf: str):
    """THE TRAINING MANIFEST — the pipeline's final artifact, composing
    the ladder end to end in one oracle-gated result: exact-dedup
    keepers -> regex token counts (the BPE-budget proxy) -> keep docs at
    or above the exact median token count (two-middle-rows, integer
    compare) -> deterministic 95/5 hash split -> per-(split, lang)
    document and token totals, i.e. exactly the numbers a training run
    is launched with.  Every stage is an already-proven primitive; this
    query certifies their COMPOSITION.  Scale: hash-keyed dedup, one
    global median over per-doc ints, map-side split tagging, one final
    rollup."""
    d = t(spark, sf, "documents")
    keepers = d.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = (
        d.join(keepers.select("doc_id"), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias(
                "n_tokens"
            ),
        )
    )
    ranked = kept.select(
        "n_tokens",
        F.row_number().over(W.orderBy("n_tokens", "doc_id")).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("n"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .agg(F.sum("n_tokens").cast("long").alias("med2"))
    )
    selected = (
        kept.crossJoin(F.broadcast(med))
        .filter(2 * F.col("n_tokens") >= F.col("med2"))
        .select(
            "lang",
            "n_tokens",
            F.when(hash_bucket("doc_id", 100) < 95, "train")
            .otherwise("val")
            .alias("split"),
        )
    )
    return selected.groupBy("split", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
@register(
    "doc_bigram_familiarity",
    """
    WITH words AS (
      SELECT doc_id, i, w[i] AS a, w[i + 1] AS b
      FROM (SELECT doc_id, string_split(text, ' ') AS w,
                   unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
            FROM documents)
    ), bg AS (
      SELECT doc_id, a || ' ' || b AS bigram FROM words
    ), corpus AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY bigram
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c.n) AS BIGINT) AS familiarity_sum,
           CAST(SUM(c.n) AS DOUBLE) / COUNT(*) AS familiarity_avg
    FROM bg JOIN corpus c ON c.bigram = bg.bigram
    GROUP BY bg.doc_id
    """,
)
def doc_bigram_familiarity(spark: SparkSession, sf: str):
    """LANGUAGE-MODEL-PROXY scoring with EXACT integer arithmetic: each
    document's bigram occurrences scored by their corpus-wide frequency
    (familiarity_sum / n_bigrams) — the quality-filter signal behind
    "is this text formulaic boilerplate or novel prose" that real
    pipelines compute with an n-gram LM; integer corpus counts replace
    log-probs so the score is bit-identical cross-engine (libm log is
    not).  High avg = near-duplicate/templated text, low = rare
    constructions.  Scale: one explode to |corpus bigram occurrences|,
    corpus counts partial-aggregate map-side on the bigram (the same
    shuffle key the scoring join reuses), per-doc rollup on doc_id."""
    d = spread(t(spark, sf, "documents"), "doc_id")
    # TOTAL expression (zip_with over slices), deliberately NOT the
    # sequence/element_at form: a <2-word doc makes sequence(1, 0) the
    # DESCENDING [1, 0] and element_at throws under ANSI — and a mere
    # size(w) >= 2 filter does NOT protect it, because the explode's
    # inferred isnotnull/size predicates get pushed into the same scan
    # Filter and evaluate the transform on unfiltered rows.  slice with
    # length size(w)-1 = 0 is just an empty array: short docs yield zero
    # bigrams on both engines, no row can ever throw.
    words = d.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select(
        "doc_id",
        F.expr(
            "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
            " (a, b) -> concat(a, ' ', b))"
        ).alias("bgs"),
    )
    bg = words.select("doc_id", F.explode("bgs").alias("bigram"))
    corpus = bg.groupBy("bigram").agg(F.count("*").cast("long").alias("n"))
    return (
        bg.join(corpus, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("n").cast("long").alias("familiarity_sum"),
            (F.sum("n").cast("double") / F.count("*")).alias("familiarity_avg"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "leakage_safe_split_by_content",
    """
    WITH assigned AS (
      SELECT doc_id, md5(text) AS ch,
             CASE ('0x' || substr(md5(md5(text) || ':split'), 1, 8))::BIGINT % 10
                  WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END AS split
      FROM documents
    ), leaks AS (
      SELECT ch FROM assigned GROUP BY ch HAVING COUNT(DISTINCT split) > 1
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT ch) AS BIGINT) AS n_unique_contents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM leaks) AS n_leaky_contents
    FROM assigned
    GROUP BY split
    """,
)
def leakage_safe_split_by_content(spark: SparkSession, sf: str):
    """LEAKAGE-SAFE train/val/test split: the split key is the md5 of the
    CONTENT (hash_bucket over content_hash, salt ':split'), not the doc
    id — exact duplicates can therefore never straddle splits, and the
    query PROVES it: n_leaky_contents (contents seen in more than one
    split) is computed and must be 0 by construction, an assertion the
    oracle hash-checks rather than a comment promises.  80/10/10 via
    bucket 10.  Scale: one content-hash shuffle for the leak check, one
    tiny split rollup; assignment itself is map-side arithmetic."""
    from byte_convert_avro_spark.functions import content_hash

    d = t(spark, sf, "documents").select(
        "doc_id", content_hash("text").alias("ch")
    )
    b = hash_bucket(F.concat(F.col("ch"), F.lit(":split")), 10)
    assigned = d.select(
        "doc_id",
        "ch",
        F.when(b == 0, "test").when(b == 1, "val").otherwise("train").alias("split"),
    )
    leaks = (
        assigned.groupBy("ch")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count("*").cast("long").alias("n_leaky_contents"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("ch").cast("long").alias("n_unique_contents"),
        )
        .crossJoin(F.broadcast(leaks))
    )
