"""Round-14e families vs INDEPENDENT Python recomputes (the third
engine next to Spark and the DuckDB oracle): Kruskal-Wallis cells from
a pure-python tie-averaged rank scan over the value domain, the daily
lead-lag cross-correlation from dict day counters and an explicit lag
loop, and degree assortativity from Counter degrees over the distinct
edge set — so a shared misunderstanding between the two SQL spellings
cannot hide.

Float assertions are EXACT equality: every float in these entries is
one fixed IEEE expression tree over exact integers, and python's
arithmetic follows the same trees (int→float conversion and math.sqrt
are correctly rounded), so any difference is a real semantics bug.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from byte_convert_avro_spark.queries import queries

Q = queries()


def _rows(sf_dir, sql):
    """Raw rows via DuckDB — only the cents/epoch casts are delegated
    (both are gated primitives elsewhere); all statistic logic below is
    pure python."""
    return duckdb.sql(sql.format(d=sf_dir)).fetchall()


def test_kruskal_wallis_cells_match_python_ranks(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE value IS NOT NULL AND event_type IS NOT NULL",
    )
    per_gv: Counter = Counter()
    per_v: Counter = Counter()
    for et, vc in rows:
        per_gv[(et, int(vc))] += 1
        per_v[int(vc)] += 1
    n = sum(per_v.values())
    tie = sum(t * t * t - t for t in per_v.values())
    # exclusive running total per domain value -> doubled avg rank
    w: dict[int, int] = {}
    run = 0
    for vc in sorted(per_v):
        w[vc] = run
        run += per_v[vc]
    r2: Counter = Counter()
    n_g: Counter = Counter()
    for (et, vc), tg in per_gv.items():
        r2[et] += tg * (2 * w[vc] + per_v[vc] + 1)
        n_g[et] += tg
    got = {
        r.event_type: r
        for r in Q["events_kruskal_wallis_cells"](spark, sf_dir).collect()
    }
    assert set(got) == set(n_g)
    for et, row in got.items():
        assert row.n_g == n_g[et]
        assert row.r2_g == str(r2[et])
        assert row.n_total == n
        assert row.tie_term == tie
        assert row.mean_rank == float(r2[et]) / (2.0 * float(n_g[et]))
        assert row.h_contrib == (3.0 * float(r2[et]) * float(r2[et])) / (
            float(n_g[et]) * float(n) * (float(n) + 1.0)
        )
        assert row.tie_correction == 1.0 - float(tie) / (
            float(n) * float(n) * float(n) - float(n)
        )
    # the reader-side fold reproduces scipy-style H on this data shape:
    h_unc = sum(r.h_contrib for r in got.values()) - 3.0 * (n + 1)
    assert math.isfinite(h_unc)


def test_daily_crosscorr_matches_python_lag_loop(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT epoch_us(ts) // 86400000000, event_type"
        " FROM read_parquet('{d}/events.parquet') WHERE ts IS NOT NULL",
    )
    v: Counter = Counter()
    p: Counter = Counter()
    days = set()
    for day, et in rows:
        day = int(day)
        days.add(day)
        if et == "view":
            v[day] += 1
        if et == "purchase":
            p[day] += 1
    got = {
        r.lag: r
        for r in Q["events_daily_crosscorr_view_purchase"](
            spark, sf_dir
        ).collect()
    }
    assert sorted(got) == list(range(-3, 4))
    for lag in range(-3, 4):
        pairs = [
            (v.get(d, 0), p.get(d + lag, 0)) for d in days if d + lag in days
        ]
        nd = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        r = got[lag]
        assert (r.n_days, r.cov_num) == (nd, nd * sxy - sx * sy)
        varx, vary = nd * sxx - sx * sx, nd * syy - sy * sy
        if varx > 0 and vary > 0:
            assert r.crosscorr == float(nd * sxy - sx * sy) / (
                math.sqrt(float(varx)) * math.sqrt(float(vary))
            )
        else:
            assert r.crosscorr is None


def test_degree_assortativity_matches_python_counters(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT DISTINCT o_custkey, l_suppkey"
        " FROM read_parquet('{d}/orders.parquet') o"
        " JOIN read_parquet('{d}/lineitem.parquet') l"
        " ON l.l_orderkey = o.o_orderkey",
    )
    dc: Counter = Counter()
    ds: Counter = Counter()
    for c, s in rows:
        dc[c] += 1
        ds[s] += 1
    m = len(rows)
    sx = sum(dc[c] for c, _ in rows)
    sy = sum(ds[s] for _, s in rows)
    sxy = sum(dc[c] * ds[s] for c, s in rows)
    sxx = sum(dc[c] * dc[c] for c, _ in rows)
    syy = sum(ds[s] * ds[s] for _, s in rows)
    [r] = Q["trade_degree_assortativity"](spark, sf_dir).collect()
    assert (r.m_edges, r.sum_dc, r.sum_ds) == (m, sx, sy)
    assert (r.sum_dcds, r.sum_dc_sq, r.sum_ds_sq) == (sxy, sxx, syy)
    varx = float(m) * float(sxx) - float(sx) * float(sx)
    vary = float(m) * float(syy) - float(sy) * float(sy)
    cov = float(m) * float(sxy) - float(sx) * float(sy)
    if varx > 0 and vary > 0:
        assert r.r_assortativity == cov / (
            math.sqrt(varx) * math.sqrt(vary)
        )
    else:
        assert r.r_assortativity is None


def _mg_reduce_py(counts: dict, k: int) -> dict:
    """The exact reduce rule of operators/sketch.mg_reduce and
    streaming/misra_gries.mg_fold_reduce, re-derived independently."""
    if len(counts) <= k:
        return dict(counts)
    pivot = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[k][1]
    return {t: c - pivot for t, c in counts.items() if c - pivot > 0}


def test_misra_gries_matches_python_two_level(spark, sf_dir):
    import hashlib

    rows = _rows(
        sf_dir,
        "SELECT t.token FROM read_parquet('{d}/documents.parquet'),"
        " LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t"
        " WHERE t.token <> ''",
    )
    k, chunks = 16, 8
    exact: Counter = Counter(tok for (tok,) in rows)
    n = sum(exact.values())
    by_ch: dict[int, dict] = {}
    for tok, c in exact.items():
        ch = int(hashlib.md5(f"{tok}:mg".encode()).hexdigest()[:8], 16) % chunks
        by_ch.setdefault(ch, {})[tok] = c
    merged: dict = {}
    for ch in by_ch:
        merged.update(_mg_reduce_py(by_ch[ch], k))
    summary = _mg_reduce_py(merged, k)
    got = Q["token_misra_gries_vs_exact"](spark, sf_dir).collect()
    top = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.token, r.est_cnt) for r in got] == sorted(
        top, key=lambda kv: kv[0]
    ) or {(r.token, r.est_cnt) for r in got} == set(top)
    for r in got:
        assert r.exact_cnt == exact[r.token]
        assert r.deficit == exact[r.token] - summary[r.token]
        assert 0 <= r.deficit
        assert r.deficit * (k + 1) <= n
        assert r.n_total == n
        assert bool(r.bound_ok) is True
        assert r.missed_heavy == 0
    # the full-summary guarantee, on EVERY vocab token (the heavy-hitter
    # contract the entry's missed_heavy column summarizes):
    for tok, c in exact.items():
        est = summary.get(tok, 0)
        assert est <= c and (c - est) * (k + 1) <= n


def test_misra_gries_streaming_fold_rule():
    from byte_convert_avro_spark.streaming.misra_gries import mg_fold_reduce

    # textbook example: k=2, stream with one dominant item
    counts = {"a": 10, "b": 4, "c": 3, "d": 1}
    red = mg_fold_reduce(counts, 2)
    # pivot = 3rd largest count under (-c, token) = c's 3
    assert red == {"a": 7, "b": 1}
    # <= k entries never reduced
    assert mg_fold_reduce({"x": 5, "y": 1}, 2) == {"x": 5, "y": 1}
    # tie block at the pivot drops entirely
    assert mg_fold_reduce({"a": 5, "b": 5, "c": 5}, 2) == {}
    # guarantee across a random-ish sequential fold
    import random

    rng = random.Random(14)
    stream = [rng.choice("abcdefghij") for _ in range(500)] + ["a"] * 200
    state: dict = {}
    for i in range(0, len(stream), 100):
        batch = Counter(stream[i : i + 100])
        m = Counter(state)
        m.update(batch)
        state = mg_fold_reduce(dict(m), 4)
    exact = Counter(stream)
    for tok, c in exact.items():
        est = state.get(tok, 0)
        assert est <= c and (c - est) * 5 <= len(stream)
    assert "a" in state  # freq("a") > N/(k+1) -> guaranteed present


def test_feature_hashing_matches_python_md5(spark, sf_dir):
    import hashlib

    rows = _rows(
        sf_dir,
        "SELECT t.token FROM read_parquet('{d}/documents.parquet'),"
        " LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t"
        " WHERE t.token <> ''",
    )
    cnt: Counter = Counter(tok for (tok,) in rows)
    buckets: dict[int, list] = {}
    for tok, c in cnt.items():
        b = int(hashlib.md5(f"{tok}:fh".encode()).hexdigest()[:8], 16) % 256
        s = 1 - 2 * (
            int(hashlib.md5(f"{tok}:sg".encode()).hexdigest()[:8], 16) % 2
        )
        buckets.setdefault(b, []).append((c, s))
    prof = {
        b: (
            len(v),
            sum(c for c, _ in v),
            sum(s * c for c, s in v),
        )
        for b, v in buckets.items()
    }
    got = Q["doc_feature_hashing_load"](spark, sf_dir).collect()
    top = sorted(prof.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]
    assert [(r.bucket, r.n_tokens, r.n_occurrences, r.signed_net)
            for r in got] == [(b, *p) for b, p in top]
    for r in got:
        assert r.buckets_used == len(prof)
        assert r.max_tokens_per_bucket == max(p[0] for p in prof.values())
        assert r.vocab_size == len(cnt)


def test_target_encoding_matches_python_shrinkage(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_custkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    n_c: Counter = Counter()
    s_c: Counter = Counter()
    for ck, cents_v in rows:
        n_c[ck] += 1
        s_c[ck] += int(cents_v)
    n, s = len(rows), sum(s_c.values())
    got = Q["customer_target_encoding_smoothed"](spark, sf_dir).collect()
    expect = sorted(n_c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.o_custkey, r.n_orders) for r in got] == expect
    for r in got:
        assert r.sum_cents == s_c[r.o_custkey]
        assert r.n_total == n
        assert r.raw_mean == float(s_c[r.o_custkey]) / float(
            n_c[r.o_custkey]
        ) / 100.0
        assert r.enc_smoothed == (
            float(s_c[r.o_custkey]) + 10.0 * (float(s) / float(n))
        ) / (float(n_c[r.o_custkey]) + 10.0) / 100.0
        # shrinkage direction: the encoding sits between the raw mean
        # and the global prior
        prior = float(s) / float(n) / 100.0
        lo, hi = sorted((r.raw_mean, prior))
        assert lo <= r.enc_smoothed <= hi


def test_k_anonymity_matches_python_classes(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus,"
        " strftime(o_orderdate, '%Y-%m'),"
        " (CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + 1000000)"
        " // 5000000"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    cls: dict = {}
    for p, st, mo, band in rows:
        c = cls.setdefault((p, st, mo), [0, set()])
        c[0] += 1
        c[1].add(int(band))
    ks = [c[0] for c in cls.values()]
    ls = [len(c[1]) for c in cls.values()]
    buckets: Counter = Counter()
    recs: Counter = Counter()
    for k in ks:
        b = ("1" if k == 1 else "2-4" if k < 5 else "5-9" if k < 10
             else "10-99" if k < 100 else "100+")
        buckets[b] += 1
        recs[b] += k
    got = Q["orders_k_anonymity_profile"](spark, sf_dir).collect()
    assert sorted(r.k_bucket for r in got) == sorted(buckets)
    for r in got:
        assert r.n_classes_in_bucket == buckets[r.k_bucket]
        assert r.n_records_in_bucket == recs[r.k_bucket]
        assert r.n_classes == len(cls)
        assert r.min_k == min(ks)
        assert r.min_l == min(ls)
        assert r.records_below_k5 == sum(k for k in ks if k < 5)
        assert r.classes_below_l3 == sum(1 for l in ls if l < 3)


def test_ndcg_matches_python_rank_math(spark, sf_dir):
    got = {r.qid: r for r in Q["truncated_dim_ndcg_at5"](spark, sf_dir).collect()}
    rec = {
        r.qid: r
        for r in Q["truncated_dim_recall_at3"](spark, sf_dir).collect()
    }
    assert set(got) == set(rec) == {0, 1, 2, 3, 4}
    log2 = [1.0, 1.584962500721156, 2.0, 2.321928094887362,
            2.584962500721156]
    idcg = 10.271924937667158
    for qid, r in got.items():
        rels = [r.r1, r.r2, r.r3, r.r4, r.r5]
        # grades are a subset of {0..5} with no positive grade repeated
        pos = [x for x in rels if x > 0]
        assert len(pos) == len(set(pos)) == r.n_overlap
        assert all(0 <= x <= 5 for x in rels)
        dcg = (float(rels[0]) / log2[0] + float(rels[1]) / log2[1]
               + float(rels[2]) / log2[2] + float(rels[3]) / log2[3]
               + float(rels[4]) / log2[4])
        assert r.dcg_at_5 == dcg
        assert r.ndcg_at_5 == dcg / idcg
        assert 0.0 <= r.ndcg_at_5 <= 1.0


def test_cohens_kappa_matches_python_marginals(spark, sf_dir):
    pred = [
        (r.lang, r.guessed_lang)
        for r in Q["lang_id_heuristic"](spark, sf_dir)
        .select("lang", "guessed_lang")
        .collect()
    ]
    n = len(pred)
    agree = sum(1 for a, g in pred if a == g)
    ra: Counter = Counter(a for a, _ in pred)
    ca: Counter = Counter(g for _, g in pred)
    pe_num = sum(ra[l] * ca.get(l, 0) for l in ra)
    [r] = Q["langid_cohens_kappa"](spark, sf_dir).collect()
    assert (r.n_docs, r.agree_docs, r.pe_num) == (n, agree, pe_num)
    assert r.po == float(agree) / float(n)
    assert r.pe == float(pe_num) / (float(n) * float(n))
    assert r.kappa == float(n * agree - pe_num) / float(n * n - pe_num)
    # chance-corrected: kappa <= accuracy, and kappa == 1 iff perfect
    assert r.kappa <= r.po + 1e-15


def test_information_gain_matches_python_floorbits(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus, strftime(o_orderdate, '%m'),"
        " CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    vals = sorted(vc for *_, vc in rows)
    n = len(vals)
    # exact median pick from the domain cumulative: min vc with
    # 2*cum >= n+1 == sorted element at position ceil((n+1)/2)
    med = vals[(n + 2) // 2 - 1]
    lab = [(p, s, m, 1 if vc > med else 0) for p, s, m, vc in rows]
    yc: Counter = Counter(y for *_, y in lab)
    hy_num = sum(c * (flog2(n) - flog2(c)) for c in yc.values())
    got = {
        r.feature: r
        for r in Q["orders_feature_information_gain"](spark, sf_dir).collect()
    }
    for feat, idx in (("priority", 0), ("status", 1), ("month", 2)):
        nvc: Counter = Counter((row[idx], row[3]) for row in lab)
        nv: Counter = Counter(row[idx] for row in lab)
        cond = sum(
            c * (flog2(nv[lv]) - flog2(c)) for (lv, _), c in nvc.items()
        )
        r = got[feat]
        assert r.n_levels == len(nv)
        assert (r.hy_num, r.cond_num) == (hy_num, cond)
        assert r.ig_num == hy_num - cond
        assert r.n_total == n
        assert r.ig_floorbits == float(hy_num - cond) / float(n)


def test_rich_club_matches_python_counters(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT DISTINCT a.p, b.p FROM"
        " (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p"
        "  FROM read_parquet('{d}/lineitem.parquet')) a"
        " JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p"
        "  FROM read_parquet('{d}/lineitem.parquet')) b"
        " ON a.ok = b.ok AND a.p < b.p",
    )
    deg: Counter = Counter()
    for a, b in rows:
        deg[a] += 1
        deg[b] += 1
    got = {r.k: r for r in Q["copurchase_rich_club"](spark, sf_dir).collect()}
    assert sorted(got) == [1, 2, 4, 8, 16]
    for k, r in got.items():
        n_k = sum(1 for d in deg.values() if d > k)
        e_k = sum(1 for a, b in rows if deg[a] > k and deg[b] > k)
        assert (r.n_k, r.e_k) == (n_k, e_k)
        if n_k >= 2:
            assert r.phi == 2.0 * float(e_k) / (float(n_k) * (float(n_k) - 1.0))
            assert 0.0 <= r.phi <= 1.0
        else:
            assert r.phi is None
    # monotone club sizes: raising the bar never grows the club
    ns = [got[k].n_k for k in (1, 2, 4, 8, 16)]
    assert ns == sorted(ns, reverse=True)


def test_pmi_collocations_match_python_counters(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT string_split(text, ' ')"
        " FROM read_parquet('{d}/documents.parquet')",
    )
    cab: Counter = Counter()
    ca: Counter = Counter()
    cb: Counter = Counter()
    n_bg = 0
    for (w,) in rows:
        for a, b in zip(w, w[1:]):
            cab[(a, b)] += 1
            ca[a] += 1
            cb[b] += 1
            n_bg += 1
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    scored = [
        (
            flog2(c * n_bg) - flog2(ca[a] * cb[b]),
            c,
            f"{a} {b}",
            ca[a],
            cb[b],
        )
        for (a, b), c in cab.items()
        if c >= 5
    ]
    top = sorted(scored, key=lambda s: (-s[0], -s[1], s[2]))[:20]
    got = Q["bigram_pmi_collocations"](spark, sf_dir).collect()
    assert [(r.pmi_floorbits, r.c_ab, r.bigram, r.n_a, r.n_b) for r in got] \
        == top
    for r in got:
        assert r.n_bg == n_bg


def test_woe_iv_matches_python_cells(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    vals = sorted(vc for _, vc in rows)
    n = len(vals)
    med = vals[(n + 2) // 2 - 1]
    cells: dict = {}
    for lv, vc in rows:
        c = cells.setdefault(lv, [0, 0])
        c[1 if vc > med else 0] += 1
    tn0 = sum(c[0] for c in cells.values())
    tn1 = sum(c[1] for c in cells.values())
    v = len(cells)
    got = {r.level: r for r in Q["orders_woe_iv_cells"](spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for lv, (n0, n1) in cells.items():
        r = got[lv]
        woe = flog2((n1 + 1) * (tn0 + v)) - flog2((n0 + 1) * (tn1 + v))
        assert (r.n0, r.n1, r.woe_floorbits) == (n0, n1, woe)
        assert (r.total_n0, r.total_n1) == (tn0, tn1)
        assert r.iv_contrib == (
            float(n1 + 1) / float(tn1 + v) - float(n0 + 1) / float(tn0 + v)
        ) * float(woe)


def test_class_weights_match_python_and_rebalance(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT event_type FROM read_parquet('{d}/events.parquet')"
        " WHERE event_type IS NOT NULL",
    )
    cnt: Counter = Counter(et for (et,) in rows)
    n, k = sum(cnt.values()), len(cnt)
    got = {r.event_type: r for r in Q["events_class_weights"](spark, sf_dir).collect()}
    assert set(got) == set(cnt)
    for et, c in cnt.items():
        r = got[et]
        assert (r.n_c, r.n_total, r.n_classes) == (c, n, k)
        assert (r.w_num, r.w_den) == (n, k * c)
        assert r.weight == float(n) / float(k * c)
    # the rebalance identity the table exists for: sum n_c * w_c == N
    assert abs(sum(c * got[et].weight for et, c in cnt.items()) - n) < 1e-6 * n


def test_negative_samples_match_python_bottom_k(spark, sf_dir):
    import hashlib

    orders = _rows(
        sf_dir,
        "SELECT o_custkey, o_orderkey FROM read_parquet('{d}/orders.parquet')",
    )
    li = _rows(
        sf_dir,
        "SELECT l_orderkey, l_partkey FROM read_parquet('{d}/lineitem.parquet')",
    )
    parts = [p for (p,) in _rows(
        sf_dir, "SELECT p_partkey FROM read_parquet('{d}/part.parquet')"
    )]
    cnt: Counter = Counter(c for c, _ in orders)
    top5 = [c for c, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    okey = {}
    for c, ok in orders:
        okey.setdefault(ok, c)
    pos: dict = {c: set() for c in top5}
    for ok, pk in li:
        c = okey.get(ok)
        if c in pos:
            pos[c].add(pk)
    got = Q["customer_part_negative_samples"](spark, sf_dir).collect()
    by_c: dict = {}
    for r in got:
        by_c.setdefault(r.custkey, []).append(r)
    assert set(by_c) == set(top5)
    for c in top5:
        hv = lambda p: int(  # noqa: E731
            hashlib.md5(f"{c}:ns:{p}".encode()).hexdigest()[:13], 16
        )
        cand = sorted(
            ((hv(p), p) for p in parts if p not in pos[c])
        )[:5]
        rows_c = sorted(by_c[c], key=lambda r: r.rnk)
        assert [(r.hv, r.partkey) for r in rows_c] == cand
        for r in rows_c:
            assert r.n_purchased == len(pos[c])
            assert r.partkey not in pos[c]  # never a positive


def test_logrank_cells_match_python_risk_sets(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT user_id, event_type, epoch_us(ts), event_id"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE user_id IS NOT NULL AND ts IS NOT NULL",
    )
    span: dict = {}
    first: dict = {}
    for u, et, ts, eid in rows:
        lo, hi = span.get(u, (ts, ts))
        span[u] = (min(lo, ts), max(hi, ts))
        k = (ts, eid)
        if u not in first or k < first[u][0]:
            first[u] = (k, et)
    lab = [
        ((hi - lo) // 86400000000, 1 if first[u][1] == "view" else 0)
        for u, (lo, hi) in span.items()
    ]
    d1: Counter = Counter()
    d2: Counter = Counter()
    for lt, g in lab:
        (d1 if g else d2)[lt] += 1
    ts_dom = sorted(set(d1) | set(d2))
    got = {
        r.lifespan_d: r
        for r in Q["users_logrank_view_vs_other_cells"](
            spark, sf_dir
        ).collect()
    }
    assert sorted(got) == ts_dom
    for lt in ts_dom:
        n1 = sum(c for t2, c in d1.items() if t2 >= lt)
        n2 = sum(c for t2, c in d2.items() if t2 >= lt)
        r = got[lt]
        assert (r.at_risk_view, r.at_risk_other) == (n1, n2)
        assert (r.died_view, r.died_other) == (d1.get(lt, 0), d2.get(lt, 0))
        dd, nn = d1.get(lt, 0) + d2.get(lt, 0), n1 + n2
        assert r.o_minus_e == float(d1.get(lt, 0)) - float(dd) * float(n1) / float(nn)
        if nn > 1:
            assert r.var_term == (
                float(dd) * float(nn - dd) * float(n1) * float(n2)
            ) / (float(nn) * float(nn) * (float(nn) - 1.0))
    # reader-side fold sanity: z is finite when total variance positive
    tv = sum(r.var_term or 0.0 for r in got.values())
    oe = sum(r.o_minus_e for r in got.values())
    if tv > 0:
        assert math.isfinite(oe / math.sqrt(tv))


def test_precision_recall_f1_match_python_confusion(spark, sf_dir):
    pred = [
        (r.lang, r.guessed_lang)
        for r in Q["lang_id_heuristic"](spark, sf_dir)
        .select("lang", "guessed_lang")
        .collect()
    ]
    ra: Counter = Counter(a for a, _ in pred)
    ca: Counter = Counter(g for _, g in pred)
    tp: Counter = Counter(a for a, g in pred if a == g)
    labels = sorted(set(ra) | set(ca))
    got = {r.label: r for r in Q["langid_precision_recall_f1"](spark, sf_dir).collect()}
    assert sorted(got) == labels
    for lbl in labels:
        r = got[lbl]
        t, g_, a = tp.get(lbl, 0), ca.get(lbl, 0), ra.get(lbl, 0)
        assert (r.tp, r.fp, r.fn) == (t, g_ - t, a - t)
        assert r.precision_ == (float(t) / float(g_) if g_ else None)
        assert r.recall_ == (float(t) / float(a) if a else None)
        assert r.f1 == (float(2 * t) / float(g_ + a) if g_ + a else None)
        if r.f1 is not None and r.precision_ and r.recall_:
            # F1 is the harmonic mean: between min and max of P and R
            assert min(r.precision_, r.recall_) <= r.f1 <= max(
                r.precision_, r.recall_
            )


def test_lpa_modularity_matches_python_sweeps(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT DISTINCT a.p, b.p FROM"
        " (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p"
        "  FROM read_parquet('{d}/lineitem.parquet')) a"
        " JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p"
        "  FROM read_parquet('{d}/lineitem.parquet')) b"
        " ON a.ok = b.ok AND a.p < b.p",
    )
    adj: dict = {}
    for a, b in rows:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(3):  # synchronous sweeps, smallest-label tie rule
        nxt = {}
        for n, nbrs in adj.items():
            cnt: Counter = Counter(lbl[x] for x in nbrs)
            best = max(cnt.values())
            nxt[n] = min(l for l, c in cnt.items() if c == best)
        lbl = nxt
    m = len(rows)
    deg = {n: len(v) for n, v in adj.items()}
    d_c: Counter = Counter()
    n_nodes: Counter = Counter()
    for n in adj:
        d_c[lbl[n]] += deg[n]
        n_nodes[lbl[n]] += 1
    m_c: Counter = Counter()
    for a, b in rows:
        if lbl[a] == lbl[b]:
            m_c[lbl[a]] += 1
    got = {r.community: r for r in Q["copurchase_lpa_modularity"](spark, sf_dir).collect()}
    assert set(got) == set(n_nodes)
    q = 0.0
    for c, r in got.items():
        assert (r.n_nodes, r.m_c, r.d_c, r.m_edges) == (
            n_nodes[c], m_c.get(c, 0), d_c[c], m,
        )
        half = float(d_c[c]) / (2.0 * float(m))
        assert r.q_contrib == float(m_c.get(c, 0)) / float(m) - half * half
        q += r.q_contrib
    assert -0.5 <= q <= 1.0  # modularity's mathematical range
