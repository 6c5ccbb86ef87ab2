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


def test_string_ordering_multibyte_matches(spark):
    """EVERY limit/tie-break in the registry leans on ORDER BY over a
    string column somewhere; pin that both engines order non-ASCII
    strings identically (Spark compares UTF-8 bytes; DuckDB's default
    binary collation does the same), so a future non-ASCII corpus can't
    silently reorder a LIMIT result while hashes still match row-wise.
    The probe set mixes ASCII, Latin-1 accents, CJK, and an emoji —
    byte-wise and codepoint-wise orders AGREE for valid UTF-8 (a
    property of the encoding), so agreement here is expected but now
    pinned rather than assumed."""
    vals = ["b", "a", "~", "é", "Z", "α", "日本", "🎛", "é", "É"]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.s for r in sdf.orderBy("s").collect()]
    con = duckdb.connect()
    ref = [
        r[0]
        for r in con.execute(
            "SELECT s FROM (VALUES "
            + ", ".join(f"(?)" for _ in vals)
            + ") t(s) ORDER BY s",
            vals,
        ).fetchall()
    ]
    con.close()
    assert got == ref, (got, ref)


def test_bigint_overflow_is_loud_never_silent(spark):
    """The integer-cents discipline sums 10^2-scaled money into BIGINT;
    pin that OVERFLOW is loud on both engines (ANSI Spark throws
    ARITHMETIC_OVERFLOW, DuckDB throws OutOfRange) — never a silent
    two's-complement wrap that could hash-match a wrong total.  This is
    the same loudness guarantee the division audit pinned for /0: the
    corpus can't overflow (sf0.01 sums ~10^9 cents), but at 100 TB a
    global SUM(cents) crosses 2^63 around 9.2e16 cents = $920T — the
    failure mode must be a crash, not a negative revenue line."""
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    big = 2**62
    df = spark.createDataFrame([(big,), (big,)], "v long")
    with pytest.raises(ArithmeticException):
        df.agg(F.sum(F.col("v") + F.col("v"))).collect()  # 2^63 per row
    con = duckdb.connect()
    try:
        import duckdb as _dd

        raised = False
        try:
            con.execute(
                f"SELECT CAST({big} AS BIGINT) + CAST({big} AS BIGINT)"
            ).fetchone()
        except _dd.Error:
            raised = True
        assert raised, "DuckDB silently wrapped a BIGINT overflow"
    finally:
        con.close()


def test_nan_ordering_and_grouping_semantics_match(spark):
    """NaN is the one double value whose comparison semantics engines
    disagree about most; pin what the registry relies on: both engines
    sort NaN LAST ascending (greater than +Inf) and both treat NaN as
    EQUAL to itself in GROUP BY (one group).  The registry's corpora
    contain no NaN (finite_elements expectation guards embeddings), so
    this pin documents the behavior a NaN-carrying corpus would get
    rather than leaving it to superstition."""
    import math

    nan, inf = float("nan"), float("inf")
    sdf = spark.createDataFrame(
        [(1.0,), (nan,), (inf,), (-1.0,), (nan,)], "v double"
    )
    got = [r.v for r in sdf.orderBy("v").collect()]
    assert got[0] == -1.0 and got[1] == 1.0 and got[2] == inf
    assert math.isnan(got[3]) and math.isnan(got[4])
    assert sdf.groupBy("v").count().filter("isnan(v)").collect()[0]["count"] == 2
    con = duckdb.connect()
    ref = [
        r[0]
        for r in con.execute(
            "SELECT v FROM (VALUES (1.0::DOUBLE), ('NaN'::DOUBLE),"
            " ('Infinity'::DOUBLE), (-1.0::DOUBLE), ('NaN'::DOUBLE)) t(v)"
            " ORDER BY v"
        ).fetchall()
    ]
    assert ref[0] == -1.0 and ref[1] == 1.0 and ref[2] == inf
    assert math.isnan(ref[3]) and math.isnan(ref[4])
    (ng,) = con.execute(
        "SELECT COUNT(*) FROM (SELECT v FROM (VALUES ('NaN'::DOUBLE),"
        " ('NaN'::DOUBLE)) t(v) GROUP BY v)"
    ).fetchone()
    con.close()
    assert ng == 1


def test_pii_regex_engines_agree_on_seeded_fuzz(spark):
    """The PII patterns claim to live in the Java∩RE2 dialect subset;
    claim != proof, so drive 400 seeded adversarial strings (digit runs,
    @-clusters, dotted quads, mixed separators, boundary lengths)
    through BOTH regex engines and require identical counts AND
    identical redacted text.  A dialect divergence (greediness, \\b
    semantics, class parsing) fails here before any corpus can hide
    it."""
    import numpy as np

    from byte_convert_avro_spark.operators.text import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        redact_pii,
    )

    rng = np.random.default_rng(11)

    def seg():
        kind = rng.integers(0, 6)
        if kind == 0:  # digit run, straddling the 9-char phone floor
            return "".join(
                str(d) for d in rng.integers(0, 10, rng.integers(6, 13))
            )
        if kind == 1:  # dotted quad, octets 0..300 (some invalid)
            return ".".join(str(int(o)) for o in rng.integers(0, 301, 4))
        if kind == 2:  # email-ish, sometimes malformed
            tld = ["co", "io", "x", "org"][int(rng.integers(0, 4))]
            return f"u{int(rng.integers(0, 99))}@h{int(rng.integers(0, 9))}.{tld}"
        if kind == 3:  # separator-heavy phone-ish
            return "+%d (%d) %d-%d" % tuple(rng.integers(0, 999, 4))
        if kind == 4:
            return "plain words here"
        return "@.-+() %"  # pattern-metacharacter soup
    rows = []
    for i in range(400):
        s = " ".join(seg() for _ in range(int(rng.integers(1, 5))))
        rows.append((i, s))
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r.i: (r.n_emails, r.n_ipv4, r.n_phones, r.text_redacted)
        for r in redact_pii(df, "t").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE fz (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO fz VALUES (?, ?)", rows)
    ref_rows = con.execute(
        f"""
        WITH a AS (
          SELECT i, len(regexp_extract_all(t, '{PII_EMAIL}')) AS ne,
                 regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
          FROM fz
        ), b AS (
          SELECT i, ne, len(regexp_extract_all(t1, '{PII_IPV4}')) AS ni,
                 regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
          FROM a
        )
        SELECT i, ne, ni, len(regexp_extract_all(t2, '{PII_PHONE}')) AS np,
               regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS t3
        FROM b
        """
    ).fetchall()
    con.close()
    ref = {r[0]: (r[1], r[2], r[3], r[4]) for r in ref_rows}
    mismatches = {i: (got[i], ref[i]) for i in got if got[i] != ref[i]}
    assert not mismatches, f"{len(mismatches)} dialect divergences: " + str(
        list(mismatches.items())[:3]
    )
    # the fuzz must actually exercise every pattern, not just miss
    assert sum(g[0] for g in got.values()) > 10  # emails hit
    assert sum(g[1] for g in got.values()) > 10  # valid quads hit
    assert sum(g[2] for g in got.values()) > 10  # phone-ish runs hit
