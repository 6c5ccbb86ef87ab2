"""String-similarity joins (edit distance) without all-pairs.

FastSS deletion-neighborhood blocking (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007): two strings are within edit
distance 1 iff they share a member of their 1-deletion neighborhoods
D(s) = {s} ∪ {s minus char i}.  Candidates are therefore an EQUI-JOIN
on deletion variants — never a cartesian product — and the verify step
is Spark's built-in ``levenshtein`` (JVM-side, codegen) on the
candidate set only.

Reference parity note: the reference (AvroTransform.java — a per-record
Kafka SMT) has no string-similarity surface; this is part of the
analytics/LLM-pipeline addendum (entity resolution / typo-tolerant
dedup is a standard training-data cleaning step).

Scale: |D(s)| = len(s) + 1, so the variant table is O(corpus chars) —
linear.  Variant-key fan-out is bounded by how many strings collapse to
the same deletion (the hub analog); ``max_strings_per_variant`` caps
pathological keys the same disclosed way the LSH ladder caps buckets.
One shuffle to the variant join, one distinct, one verify filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """``(id, variant)`` rows: the string itself plus every 1-deletion.

    Spelled with ``posexplode(split(s, '')) -> concat(prefix, suffix)``
    entirely in built-in functions (no UDF): variant i = substr(1..i-1)
    || substr(i+1..).  Distinct because deleting either of two equal
    adjacent chars yields the same variant."""
    n = F.length(str_col)
    i = F.explode(F.sequence(F.lit(1), n)).alias("i")
    dels = (
        df.select(id_col, str_col, i)
        .select(
            id_col,
            F.concat(
                F.expr(f"substring({str_col}, 1, i - 1)"),
                F.expr(f"substring({str_col}, i + 1)"),
            ).alias("variant"),
        )
    )
    idents = df.select(id_col, F.col(str_col).alias("variant"))
    return idents.unionByName(dels).distinct()


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_strings_per_variant: int | None = None,
) -> DataFrame:
    """All unordered pairs with ``levenshtein <= 1`` (including exact
    duplicates = distance 0), via FastSS blocking + built-in verify.

    Output: ``(id_a, id_b, name_a, name_b, dist)`` with id_a < id_b.
    Zero false negatives (the FastSS theorem; pinned against a
    brute-force oracle in the gate).  ``max_strings_per_variant``
    drops variant keys shared by more than that many strings — the
    disclosed hub cap for adversarial corpora (a key shared by k
    strings costs k² candidate rows); None = exact."""
    strs = df.select(id_col, str_col).filter(
        F.col(str_col).isNotNull()
    ).distinct()
    var = deletion_variants(strs, id_col, str_col)
    if max_strings_per_variant is not None:
        if max_strings_per_variant < 2:
            raise ValueError(
                "max_strings_per_variant must be >= 2, got "
                f"{max_strings_per_variant}"
            )
        ok = (
            var.groupBy("variant")
            .agg(F.count("*").alias("_vn"))
            .filter(F.col("_vn") <= max_strings_per_variant)
            .select("variant")
        )
        var = var.join(ok, "variant")
    a = var.select(F.col(id_col).alias("id_a"), "variant")
    b = var.select(F.col(id_col).alias("id_b"), "variant")
    cand = (
        a.join(b, "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    na = strs.select(
        F.col(id_col).alias("id_a"), F.col(str_col).alias("name_a")
    )
    nb = strs.select(
        F.col(id_col).alias("id_b"), F.col(str_col).alias("name_b")
    )
    return (
        cand.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
