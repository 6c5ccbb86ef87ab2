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
