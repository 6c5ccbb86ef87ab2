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
