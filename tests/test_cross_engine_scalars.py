"""Cross-engine scalar-semantics pins for the shared oracle vocabulary.

Every oracle-gated query leans on a small set of scalar functions both
engines must evaluate IDENTICALLY — ``ROUND`` (the cents() discipline),
``split``/``string_split``, ``regexp_extract_all`` token counting,
``conv``/``::BIGINT`` hex decoding (the reproducible-sampling
primitive), ``levenshtein`` (record linkage).  The gates prove
agreement on corpus values; this file pins the EDGE inputs the corpus
never contains (exact .5 doubles, leading/trailing/double separators,
non-ASCII text, 52-bit hex), so an engine upgrade that shifts a
boundary convention fails HERE with a named function instead of as an
opaque value-hash mismatch in some downstream query.

One pin is a DIVERGENCE, kept loudly visible: DuckDB's ``levenshtein``
counts UTF-8 BYTES while Spark's counts CHARACTERS, so they disagree
on any multibyte input ('café' -> 'cafe' is 1 char edit, 2 byte edits).
``customer_fuzzy_match_pairs`` is unaffected because the driver corpus
names are ASCII — that ASCII envelope is exactly what this pin records.
The Spark side (character semantics) is the correct record-linkage
metric; on a multibyte corpus the ORACLE would need a byte-safe
respelling, not the operator.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_round_half_away_on_doubles_matches(spark):
    vals = [0.5, 1.5, 2.5, -0.5, -1.5, 111.495, 111.505, 2.675]
    got = [
        r.r
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.round("v", 0).alias("r"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 0)").fetchone()[0]
        for v in vals
    ]
    assert got == want
    # the cents() shape: ROUND(v * 100, 0) on payment-like doubles whose
    # *100 is inexact — the load-bearing case for every _cents oracle
    cvals = [1.115, 2.675, 8.835, 0.005, 1000000.005]
    gotc = [
        r.r
        for r in spark.createDataFrame([(v,) for v in cvals], "v double")
        .select(F.round(F.col("v") * 100, 0).alias("r"))
        .collect()
    ]
    wantc = [
        con.execute(f"SELECT ROUND(CAST({v!r} AS DOUBLE) * 100, 0)").fetchone()[0]
        for v in cvals
    ]
    assert gotc == wantc
    con.close()


def test_split_and_regex_token_count_match(spark):
    texts = ["a b", " a", "a ", "a  b", "", " ", "x  "]
    gs = [
        r.n
        for r in spark.createDataFrame([(t,) for t in texts], "t string")
        .select(F.size(F.split("t", " ")).alias("n"))
        .collect()
    ]
    con = duckdb.connect()
    ds = [
        con.execute("SELECT len(string_split(?, ' '))", [t]).fetchone()[0]
        for t in texts
    ]
    assert gs == ds
    toks = ["héllo, wörld!", "a_b-c", "日本語 text", "x''y", "", "!!!"]
    gt = [
        r.n
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select(
            F.size(
                F.expr(r"regexp_extract_all(t, '\\w+|[^\\w\\s]', 0)")
            ).alias("n")
        )
        .collect()
    ]
    dt = [
        con.execute(
            r"SELECT len(regexp_extract_all(?, '\w+|[^\w\s]'))", [t]
        ).fetchone()[0]
        for t in toks
    ]
    assert gt == dt
    con.close()


def test_hex_decode_primitive_matches(spark):
    hexes = ["ffffffff", "00000000", "7fffffff", "80000000", "fffffffffffff"]
    gs = [
        r.c
        for r in spark.createDataFrame([(h,) for h in hexes], "h string")
        .select(F.conv("h", 16, 10).cast("long").alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    ds = [
        con.execute(f"SELECT ('0x' || '{h}')::BIGINT").fetchone()[0]
        for h in hexes
    ]
    assert gs == ds
    con.close()


def test_levenshtein_ascii_matches_and_multibyte_divergence_pinned(spark):
    ascii_pairs = [("", ""), ("", "abc"), ("kitten", "sitting"), ("ab", "ba")]
    gs = [
        r.l
        for r in spark.createDataFrame(ascii_pairs, "a string, b string")
        .select(F.levenshtein("a", "b").alias("l"))
        .collect()
    ]
    con = duckdb.connect()
    ds = [
        con.execute("SELECT levenshtein(?, ?)", p).fetchone()[0]
        for p in ascii_pairs
    ]
    assert gs == ds  # the ASCII envelope customer_fuzzy_match_pairs lives in

    # the pinned DIVERGENCE: char-based (Spark, correct for linkage) vs
    # byte-based (DuckDB) on multibyte input
    (spark_lev,) = (
        spark.createDataFrame([("café", "cafe")], "a string, b string")
        .select(F.levenshtein("a", "b").alias("l"))
        .collect()[0]
    )
    duck_lev = con.execute("SELECT levenshtein('café', 'cafe')").fetchone()[0]
    assert spark_lev == 1  # one character substitution
    assert duck_lev == 2, (
        "DuckDB levenshtein no longer counts UTF-8 bytes (got "
        f"{duck_lev}): the customer_fuzzy_match_pairs oracle's ASCII-only "
        "envelope note and this pin can be revisited"
    )
    con.close()


def test_integer_division_and_modulo_match_on_negatives(spark):
    """Both engines TRUNCATE integer division toward zero and give the
    dividend's sign to %, INCLUDING on negatives (-7 DIV 2 = -3 = -7//2
    in DuckDB — note this is NOT Python's floor //).  Every oracle
    division is non-negative by construction today; this pin keeps the
    convention agreement visible so a negative-operand query added
    later inherits a proven rule instead of a Python intuition."""
    cases = [(-7, 2), (7, 2), (-7, -2), (-1, 16), (-16, 16)]
    gd = [
        r.d
        for r in spark.createDataFrame(cases, "a long, b long")
        .select(F.expr("a DIV b").alias("d"))
        .collect()
    ]
    gm = [
        r.m
        for r in spark.createDataFrame(cases, "a long, b long")
        .select(F.expr("a % b").alias("m"))
        .collect()
    ]
    con = duckdb.connect()
    dd = [con.execute(f"SELECT {a} // {b}").fetchone()[0] for a, b in cases]
    dm = [con.execute(f"SELECT {a} % {b}").fetchone()[0] for a, b in cases]
    con.close()
    assert gd == dd
    assert gm == dm


def test_division_by_zero_is_loud_never_silent(spark):
    """Zero denominators can NEVER silently diverge between the engines:
    Spark runs ANSI mode (the 4.x default — double x/0 THROWS
    DIVIDE_BY_ZERO) while DuckDB returns NULL, so a query whose
    denominator reaches zero fails its gate loudly on one side or the
    other — it cannot hash-match wrong values.  The recorded discipline
    for query authors: where zero is REACHABLE (a variance over a
    constant group, an empty-window rate), guard with CASE/nullif in
    BOTH spellings; a green gate on an unguarded division is proof the
    corpus never reaches zero, not that the division is safe at every
    scale (the data-contract notes on the OLS/Welch-t docstrings)."""
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    df = spark.createDataFrame([(1.0, 0.0)], "a double, b double")
    with pytest.raises(ArithmeticException):
        df.select((F.col("a") / F.col("b")).alias("d")).collect()
    con = duckdb.connect()
    assert (
        con.execute("SELECT CAST(1 AS DOUBLE) / CAST(0 AS DOUBLE)").fetchone()[0]
        is None
    )
    con.close()
