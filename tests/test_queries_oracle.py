"""Every registered query vs its DuckDB oracle — the local replica of the
driver's correctness gate (row count + schema-width + order-insensitive
exact value compare), at sf0.001 for speed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from byte_convert_avro_spark.queries import oracle_sql, queries
from byte_convert_avro_spark.session import TABLES

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonical value repr: exact float round-trip text, None-stable."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _table(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon(r[c]) for c in cols) for _, r in df.iterrows()]
    return sorted(rows)


ALL = sorted(queries().keys())
SQLS = oracle_sql()


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, ddb):
    q = queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    if name not in SQLS:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = ddb.execute(SQLS[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"row count: spark={len(sdf)} oracle={len(odf)}"
    s_rows, o_rows = _table(sdf), _table(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"first value mismatches: {mismatches[:3]}"


def test_scale_oracles_agree_with_primary(ddb):
    """Every SCALE_ORACLES spelling (the sub-quadratic twin used for
    large-SF gating) must produce the IDENTICAL table as its
    deliberately-brute-force primary oracle — the equivalence that makes
    the sf10 gate sound."""
    from byte_convert_avro_spark.queries.base import SCALE_ORACLES

    assert SCALE_ORACLES  # the r14 skyline twins at minimum
    for name, scale_sql in SCALE_ORACLES.items():
        assert name in SQLS, f"{name}: scale oracle without a primary"
        a = _table(ddb.execute(SQLS[name]).df())
        b = _table(ddb.execute(scale_sql).df())
        assert a == b, f"{name}: scale oracle diverges from primary"


def test_registry_contract_integrity():
    """Driver-contract invariants: every registered query has an oracle
    (no silent rows-only regressions) and every oracle reads at least one
    of the driver's pre-registered views."""
    qs, sqls = queries(), oracle_sql()
    assert set(qs) == set(sqls), f"rows-only queries crept in: {set(qs) - set(sqls)}"
    for name, sql in sqls.items():
        assert any(t_ in sql for t_ in TABLES), f"{name}: no driver table referenced"


def test_duckdb_list_reduce_aliasing_pin():
    """PIN DuckDB v1.0.0's list_reduce accumulator-aliasing semantics.

    DuckDB v1.0.0 evaluates struct-lambda fields IN PLACE on the
    accumulator: once a field is computed, later field expressions in the
    SAME lambda that read that accumulator field see the NEW value, not
    the pre-step one.  For the 3-element fold below the correct left fold
    gives m21 = 24 (step1: 4*1+2=6; step2: 6*3+6=24) but v1.0.0 returns
    96 (step2 reads a.m11 AFTER it was overwritten with 15: 6*15+6=96).

    Two shipped oracles are shaped by this engine quirk:

    - ``user_value_holt_trend`` (queries/relational_r9.py): its oracle is
      deliberately spelled as WITH RECURSIVE instead of list_reduce
      because its 6-field matrix lambda reads overwritten fields.
    - ``user_value_ewma`` (same module): KEEPS list_reduce and is correct
      under BOTH semantics — its 'o' field reads only a.o, never the
      already-written 's' — so a DuckDB upgrade does not change it.

    If this test fails after a DuckDB upgrade the bug was fixed: the
    Holt oracle may then be simplified back to list_reduce, and the
    "no lambda field reads an earlier-written struct field" discipline
    recorded in NOTES.md can be retired.
    """
    con = duckdb.connect()
    (row,) = con.execute(
        """
        SELECT list_reduce(
          [{'m11': 1.0e0, 'm21': 2.0e0},
           {'m11': 3.0e0, 'm21': 4.0e0},
           {'m11': 5.0e0, 'm21': 6.0e0}],
          (a, b) -> {'m11': b.m11 * a.m11,
                     'm21': b.m21 * a.m11 + a.m21}) AS r
        """
    ).fetchall()
    r = row[0]
    assert r["m11"] == 15.0  # the no-self-read field is always correct
    assert r["m21"] == 96.0, (
        "DuckDB list_reduce no longer aliases the accumulator in place "
        f"(got m21={r['m21']}, correct left fold is 24.0): the "
        "user_value_holt_trend WITH RECURSIVE oracle workaround and this "
        "pin can be revisited"
    )
    con.close()


def test_subtree_rollup_ancestor_closure_covers_wide_keys(spark, tmp_path):
    """The r10 ADVICE finding: the old fixed 7-divisor closure silently
    dropped ancestors above 10^6 for custkeys >= 10^7, and the oracle
    shared the literal so parity could never catch it.  Pin the fix on a
    corpus the driver testdata can't provide — a 9-digit custkey — by
    checking BOTH engines now emit the full prefix chain.
    """
    import duckdb as _dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from byte_convert_avro_spark.queries import oracle_sql, queries

    ck = 123456789  # 9 digits -> 9 ancestors: 1, 12, ..., 123456789
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([ck, ck], pa.int64()),
            "o_totalprice": pa.array([10.0, 5.0], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    sdf = (
        queries()["customer_subtree_revenue_rollup"](spark, str(tmp_path))
        .toPandas()
        .sort_values("node")
    )
    # HAVING >= 2 contributors never fires with one customer, so compare
    # the raw ancestor closure through DuckDB on the same file.
    con = _dd.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    odf = (
        con.execute(oracle_sql()["customer_subtree_revenue_rollup"])
        .df()
        .sort_values("node")
    )
    con.close()
    assert list(sdf["node"]) == list(odf["node"]) == []  # HAVING filters all
    # Drop the HAVING by checking the closure directly in Spark:
    from pyspark.sql import functions as F

    anc = (
        spark.read.parquet(str(tmp_path / "orders.parquet"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(cast(o_custkey AS STRING))),"
                    " i -> cast(substr(cast(o_custkey AS STRING), 1, i)"
                    " AS BIGINT))"
                )
            ).alias("node")
        )
        .distinct()
    )
    nodes = sorted(r.node for r in anc.collect())
    assert nodes == [1, 12, 123, 1234, 12345, 123456, 1234567, 12345678, ck]


def test_ab_test_degenerate_arm_goes_null_quiet(spark, tmp_path):
    """r10 ADVICE guard: a corpus whose users all hash into ONE arm (here:
    a single user) must yield NULL rates/p-value on both engines, not
    DIVIDE_BY_ZERO on ANSI Spark — and never a spuriously 'significant'
    1/41 p-value computed from a NULL observed difference."""
    import duckdb as _dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from byte_convert_avro_spark.queries import oracle_sql, queries

    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([0], pa.timestamp("us")),
            "user_id": pa.array([42], pa.int64()),
            "event_type": pa.array(["purchase"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    row = (
        queries()["ab_test_permutation_pvalue"](spark, str(tmp_path))
        .collect()[0]
    )
    assert row.p_value is None and row.obs_diff is None
    assert (row.rate_a is None) != (row.rate_b is None)  # exactly one arm
    assert row.n_extreme == 0 and row.n_perms == 40
    con = _dd.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    orow = con.execute(oracle_sql()["ab_test_permutation_pvalue"]).fetchone()
    cols = [d[0] for d in con.description]
    con.close()
    o = dict(zip(cols, orow))
    assert o["p_value"] is None and o["obs_diff"] is None
    assert o["n_extreme"] == 0 and o["n_perms"] == 40


def test_key_offset_boundaries(spark):
    """base.key_offset must return the smallest power of 10 with MORE
    digits than max(key) — exactly the boundary where a fixed literal
    starts colliding (the r11 subtree-width class).  9999 -> 10000,
    10000 -> 100000, 1 -> 10, and a 9e8-scale key (the scaled-sf1
    regime) -> 1e9."""
    from byte_convert_avro_spark.queries.base import key_offset

    for mx, want in [(9999, 10_000), (10_000, 100_000), (1, 10),
                     (900_014_999, 1_000_000_000)]:
        df = spark.range(1).selectExpr(f"{mx} AS k")
        got = key_offset(df, "k").collect()[0]["__off"]
        assert got == want, (mx, got, want)
        assert got > mx
