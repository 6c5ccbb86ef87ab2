"""Fellegi-Sunter linkage vs an INDEPENDENT Python recompute: brute
DP Levenshtein for the candidate set, dict counters for the data-driven
u-probabilities, int.bit_length() for the floor-log2 weights — the
third engine next to Spark and the DuckDB oracle."""

from __future__ import annotations

from collections import Counter

import duckdb

from byte_convert_avro_spark.queries import queries
from byte_convert_avro_spark.queries.relational_r14d import (
    _M,
    _T_HI,
    _T_LO,
    _U_NAME_CLOSE,
)

Q = queries()


def _lev(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _flog2(x: int) -> int:
    return x.bit_length() - 1


def _fs_python(sf_dir):
    rows = duckdb.sql(
        f"SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM"
        f" read_parquet('{sf_dir}/customer.parquet') ORDER BY c_custkey"
    ).fetchall()
    cust = [(int(k), n, int(nk), seg) for k, n, nk, seg in rows]
    n = len(cust)
    n2 = n * n
    un = sum(v * v for v in Counter(nk for _, _, nk, _ in cust).values())
    us = sum(v * v for v in Counter(sg for _, _, _, sg in cust).values())
    uq = sum(v * v for v in Counter(nm for _, nm, _, _ in cust).values())
    mn_e, md_e = _M["name_exact"]
    mn_c, md_c = _M["name_close"]
    un_c, ud_c = _U_NAME_CLOSE
    mn_n, md_n = _M["nation"]
    mn_s, md_s = _M["segment"]
    out = {}
    for i, (ka, na, nka, sga) in enumerate(cust):
        for kb, nb, nkb, sgb in cust[i + 1 :]:
            # cheap pre-filter: length gap > 1 can't be ed <= 1
            if abs(len(na) - len(nb)) > 1:
                continue
            d = _lev(na, nb)
            if d > 1:
                continue
            w_name = (
                _flog2(mn_e * n2) - _flog2(md_e * uq)
                if d == 0
                else _flog2(mn_c * ud_c) - _flog2(md_c * un_c)
            )
            w_nat = (
                _flog2(mn_n * n2) - _flog2(md_n * un)
                if nka == nkb
                else _flog2((md_n - mn_n) * n2) - _flog2(md_n * (n2 - un))
            )
            w_seg = (
                _flog2(mn_s * n2) - _flog2(md_s * us)
                if sga == sgb
                else _flog2((md_s - mn_s) * n2) - _flog2(md_s * (n2 - us))
            )
            w = w_name + w_nat + w_seg
            cls = (
                "match" if w >= _T_HI
                else "possible" if w >= _T_LO
                else "non-match"
            )
            out[(ka, kb)] = (
                d, int(nka == nkb), int(sga == sgb),
                w_name, w_nat, w_seg, w, cls,
            )
    return out


def test_fs_weights_match_python(spark, sf_dir):
    expected = _fs_python(sf_dir)
    got = {
        (r.id_a, r.id_b): (
            r.dist, r.nation_agree, r.segment_agree,
            r.w_name, r.w_nation, r.w_segment, r.weight_bits, r.fs_class,
        )
        for r in Q["customer_linkage_fs_weights"](spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) > 0  # the candidate set is non-trivial at sf0.001


def test_fs_summary_matches_python(spark, sf_dir):
    pairs = _fs_python(sf_dir).values()
    expected = {}
    for cls in {p[7] for p in pairs}:
        sel = [p for p in pairs if p[7] == cls]
        expected[cls] = (
            len(sel),
            min(p[6] for p in sel),
            max(p[6] for p in sel),
            sum(p[0] for p in sel),
            sum(p[1] for p in sel),
            sum(p[2] for p in sel),
        )
    got = {
        r.fs_class: (
            r.n_pairs, r.min_weight, r.max_weight,
            r.n_close_name, r.n_nation_agree, r.n_segment_agree,
        )
        for r in Q["customer_linkage_fs_summary"](spark, sf_dir).collect()
    }
    assert got == expected


def test_clustering_coefficient_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM"
        f" read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    by_order = {}
    for ok, p in rows:
        by_order.setdefault(int(ok), set()).add(int(p))
    adj = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    expected = {}
    for v, ns in adj.items():
        tri = sum(len(ns & adj[w]) for w in ns) // 2
        d = len(ns)
        coeff = 2.0 * float(tri) / (float(d) * (float(d) - 1.0)) if d >= 2 else None
        expected[v] = (d, tri, coeff)
    got = {
        r.part: (r.degree, r.triangles, r.clustering_coeff)
        for r in Q["copurchase_clustering_coefficient"](spark, sf_dir).collect()
    }
    assert got == expected
