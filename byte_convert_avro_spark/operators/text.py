"""Text-analysis operators: stats, quality scoring, language ID,
tokenization, fingerprints.  All native column expressions (no UDFs) —
whole-stage codegen, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram heuristic
STOPWORDS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " la "],
}

#: a BPE-ish token pattern: runs of word chars, or single non-space symbols
TOKEN_PATTERN = r"\w+|[^\w\s]"


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_calc, n_words, n_distinct_words, avg_word_len."""
    d = df.withColumn("_w", F.split(text_col, " "))
    return (
        d.withColumn("n_chars_calc", F.length(text_col))
        .withColumn("n_words", F.size("_w"))
        .withColumn("n_distinct_words", F.size(F.array_distinct("_w")))
        .withColumn(
            "avg_word_len",
            F.length(F.regexp_replace(text_col, " ", "")).cast("double") / F.size("_w"),
        )
        .drop("_w")
    )


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Regex token count (words + punctuation symbols) — the cheap proxy
    for BPE token counts used to budget training data."""
    return df.withColumn(out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)))


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Composite quality score in [0, 1]: length band + stopword presence +
    punctuation ratio + vocabulary diversity.  The standard cheap filters
    before expensive model-based scoring."""
    d = df.withColumn("_w", F.split(text_col, " "))
    n_chars = F.length(text_col)
    n_words = F.size("_w")
    # n_words >= 1 always (split('') = ['']); n_chars CAN be 0 for an
    # empty document — under ANSI that division throws, so the punct
    # term is conditionally evaluated (empty doc contributes 0)
    diversity = F.size(F.array_distinct("_w")).cast("double") / n_words
    punct_ratio = (
        F.length(F.regexp_replace(text_col, r"[\w\s]", "")).cast("double") / n_chars
    )
    has_stop = F.when(
        F.col(text_col).rlike(r"\b(the|and|of|der|und|le|et|el)\b"), 1.0
    ).otherwise(0.0)
    len_band = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(
        F.when(n_chars >= 30, 0.5).otherwise(0.0)
    )
    # NOTE: left unrounded — the expression tree is identical across
    # engines so the doubles agree bit-for-bit, whereas ROUND(x, 4) ties
    # resolve differently per engine.
    punct_term = F.when(
        n_chars > 0, 1.0 - F.least(punct_ratio * 5, F.lit(1.0))
    ).otherwise(F.lit(0.0))
    score = (
        0.3 * len_band + 0.2 * has_stop + 0.3 * F.least(diversity * 2, F.lit(1.0))
        + 0.2 * punct_term
    )
    return d.withColumn(out, score).drop("_w")


def language_id(df: DataFrame, text_col: str = "text", out: str = "guessed_lang") -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic family).  Counts
    non-overlapping marker occurrences via replace-length deltas — pure
    string ops.  Swap in a model-based classifier behind the same column
    contract for production quality."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))

    def score(lang: str) -> Column:
        total: Column | None = None
        for m in STOPWORDS[lang]:
            cnt = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
            total = cnt if total is None else total + cnt
        return total

    scores = {lang: score(lang) for lang in STOPWORDS}
    d = df
    for lang, s in scores.items():
        d = d.withColumn(f"_s_{lang}", s)
    best = F.lit("unknown")
    best_score = F.lit(0.0)
    # fixed priority order for ties: en > de > fr > es
    for lang in ["es", "fr", "de", "en"]:
        cond = (F.col(f"_s_{lang}") > 0) & (F.col(f"_s_{lang}") >= best_score)
        best = F.when(cond, lang).otherwise(best)
        best_score = F.greatest(best_score, F.col(f"_s_{lang}"))
    d = d.withColumn(out, best)
    return d.drop(*[f"_s_{lang}" for lang in STOPWORDS])


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Normalized md5 fingerprint (lowercase, whitespace-collapsed)."""
    norm = F.lower(F.regexp_replace(text_col, r"\s+", " "))
    return df.withColumn(out, F.md5(norm))


def rolling_hashes(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   window: int = 8) -> DataFrame:
    """Per-position rolling fingerprints (character w-shingles, hashed) —
    the winnowing building block for substring-level duplicate detection.
    -> (id_col, pos, chunk_hash)"""
    d = df.filter(F.length(text_col) >= window)
    return d.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - {window - 1}),"
                f" i -> md5(substring({text_col}, i, {window})))"
            )
        ).alias("pos0", "chunk_hash"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "chunk_hash")


def shared_fingerprint_pairs(
    fps: DataFrame, id_col: str = "doc_id", fp_col: str = "fp_hash",
    min_shared: int = 3, max_docs_per_fp: int = 8,
) -> DataFrame:
    """Bounded cross-document fingerprint pairing — the winnowing pair
    stage with the quadratic-output regime structurally capped.  Input is
    a DISTINCT (id_col, fp_col) fingerprint set (e.g. winnowing
    selection); output is document pairs sharing >= ``min_shared``
    fingerprints, counting ONLY fingerprints present in at most
    ``max_docs_per_fp`` documents, plus a containment score
    ``n_shared / min(capped sizes)``.
    -> (doc_a, doc_b, n_shared, n_a, n_b, containment)

    Why the cap is semantic, not just defensive: a fingerprint carried by
    hundreds of documents is near-universal boilerplate — it contributes
    D² pairs to the join (the 10x-verbatim-replica stress regime) while
    carrying no discriminative signal about any one pair.  Dropping
    fingerprints with doc-frequency > cap bounds the join's output at
    ``max_docs_per_fp²`` rows per fingerprint BY CONSTRUCTION, the same
    discipline as minhash-LSH's ``max_pairs_per_doc``; heavily-overlapping
    pairs still surface through their rarer shared fingerprints (a shared
    run of >= t+w-1 chars yields MANY fingerprints, not one).

    Scale: one linear chain — doc-frequency window, per-doc size window,
    one bucket aggregation (buffers bounded at max_docs_per_fp structs by
    construction), row-local pair enumeration, one pair aggregation.  No
    joins, no stage is |docs|², and the fingerprint input is evaluated
    exactly once."""
    if max_docs_per_fp < 2:
        raise ValueError(
            f"max_docs_per_fp must be >= 2 (a 1-doc bucket pairs nothing), "
            f"got {max_docs_per_fp}"
        )
    from pyspark.sql import Window as W

    # LINEAR plan (r14, guide §7.2 duplicated subtrees): the previous
    # form referenced ``fps`` through four join branches (doc-frequency,
    # the capped set, both self-join sides) and Catalyst planned each as
    # its own copy of the upstream subtree — six re-derivations of the
    # winnowing selection in the before-plan, and exchange reuse does
    # not fire across the aliased branches.  This chain evaluates the
    # fingerprint set ONCE: a window count over fp_col applies the
    # doc-frequency cap (same rows as the dfreq join), a window count
    # over id_col attaches each doc's capped fingerprint count (the old
    # ``sizes`` table, now a column), then one aggregation per
    # fingerprint collects the (doc, n_fp) bucket — bounded at
    # max_docs_per_fp rows BY CONSTRUCTION, since the cap filter runs
    # before the collect — and a row-local nested ``transform``
    # enumerates the i<j pairs.  Zero joins; four narrow exchanges.
    capped = fps.select(id_col, fp_col).withColumn(
        "_df", F.count("*").over(W.partitionBy(fp_col))
    ).filter(F.col("_df") <= max_docs_per_fp)
    sized = capped.withColumn(
        "n_fp", F.count("*").over(W.partitionBy(id_col))
    )
    buckets = (
        sized.groupBy(fp_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("d"), F.col("n_fp")))
            ).alias("_ds")
        )
        .filter(F.size("_ds") >= 2)
    )
    pair_rows = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(_ds, (x, i) -> "
                "transform(slice(_ds, i + 2, size(_ds) - i - 1), "
                "y -> named_struct('doc_a', x.d, 'n_a', x.n_fp, "
                "'doc_b', y.d, 'n_b', y.n_fp))))"
            )
        ).alias("_p")
    ).select("_p.doc_a", "_p.doc_b", "_p.n_a", "_p.n_b")
    return (
        pair_rows.groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "doc_a", "doc_b", "n_shared", "n_a", "n_b",
            (
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    )


#: PII patterns, deliberately restricted to the regex-dialect subset Java
#: (Spark) and RE2 (DuckDB) agree on: char classes, counted repetition,
#: \b word boundaries — no backrefs, no lookaround.  Heuristics, not
#: validators (the training-data scrubbing trade: recall over precision).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\b"
PII_PHONE = r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the scrubbing stage of a training-data
    pipeline, as three staged regex passes whose ORDER is part of the
    contract: emails first (their local parts may contain digit runs),
    then IPv4 (dotted quads would otherwise match the phone heuristic),
    then phones on the already-redacted text — each count is taken on
    the stage's INPUT, so nothing is double-counted and the whole
    pipeline is a deterministic pure function of the text that a SQL
    twin spells identically (see ``documents_pii_redaction_stats``).
    Adds: ``n_emails``, ``n_ipv4``, ``n_phones``, ``text_redacted``.
    Scale: row-local narrow projections, zero shuffle, codegen'd
    JVM-side regex — the same per-record profile as the decode
    pipeline."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(t0, F.lit(PII_EMAIL)))
        .withColumn("n_ipv4", F.regexp_count(t1, F.lit(PII_IPV4)))
        .withColumn("n_phones", F.regexp_count(t2, F.lit(PII_PHONE)))
        .withColumn("text_redacted", t3)
    )
