"""Round-14c families vs INDEPENDENT Python recomputes (the third
engine next to Spark and the DuckDB oracle): KS from a pure-python
pooled-ECDF scan, Spearman from sorted average ranks, Kendall tau-b
from an explicit pair loop, the chi-squared cells from Counter margins,
HHI / entropy from dict counters, and the Zipf fit from a python token
Counter — so a shared misunderstanding between the two SQL spellings
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


def _cents_rows(sf_dir, sql):
    """Raw rows via DuckDB — only the cents/epoch casts are delegated
    (both are gated primitives elsewhere); all statistic logic below is
    pure python."""
    return duckdb.sql(sql.format(d=sf_dir)).fetchall()


def test_ks_matches_python_ecdf_scan(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL",
    )
    cv, cp = Counter(), Counter()
    for et, vc in rows:
        (cv if et == "view" else cp)[int(vc)] += 1
    n1, n2 = sum(cv.values()), sum(cp.values())
    cum_v = cum_p = 0
    best = None  # (d_num, vc)
    for vc in sorted(set(cv) | set(cp)):
        cum_v += cv.get(vc, 0)
        cum_p += cp.get(vc, 0)
        d = abs(cum_v * n2 - cum_p * n1)
        if best is None or d > best[0]:
            best = (d, vc)
    [r] = Q["events_ks_view_purchase"](spark, sf_dir).collect()
    assert (r.n_view, r.n_purchase) == (n1, n2)
    assert (r.d_num, r.d_at_cents) == best
    assert r.ks_d == float(best[0]) / float(n1 * n2)


def _avg_ranks_x2(vals):
    """2*average-rank per value (ties averaged), as exact ints."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r2 = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        # ranks i+1 .. j  ->  2*avg = (i+1) + j
        for k in range(i, j):
            r2[order[k]] = (i + 1) + j
        i = j
    return r2


def test_spearman_matches_python_ranks(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT l_returnflag, CAST(ROUND(l_quantity * 100, 0) AS BIGINT),"
        " CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/lineitem.parquet')"
        " WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL"
        " AND l_extendedprice IS NOT NULL",
    )
    by = {}
    for flag, qc, pc in rows:
        by.setdefault(flag, []).append((int(qc), int(pc)))
    expected = {}
    for flag, pts in by.items():
        rx2 = _avg_ranks_x2([q for q, _ in pts])
        ry2 = _avg_ranks_x2([p for _, p in pts])
        sum_d2_x4 = sum((a - b) * (a - b) for a, b in zip(rx2, ry2))
        n = len(pts)
        rho = (
            1.0
            - (6.0 * (float(sum_d2_x4) / 4.0))
            / (float(n) * (float(n) * float(n) - 1.0))
            if n >= 2
            else None
        )
        expected[flag] = (n, sum_d2_x4, rho)
    got = {
        r.l_returnflag: (r.n, int(r.sum_d2_x4), r.spearman_rho)
        for r in Q["lineitem_spearman_qty_price"](spark, sf_dir).collect()
    }
    assert got == expected


def _daily(sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT event_type, epoch_us(ts) // 86400000000 AS day,"
        " CAST(COUNT(*) AS BIGINT),"
        " CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE event_type IS NOT NULL AND value IS NOT NULL"
        " AND ts IS NOT NULL GROUP BY event_type, day",
    )
    by = {}
    for et, d, cnt, c in rows:
        by.setdefault(et, []).append((int(d), int(cnt), int(c)))
    for s in by.values():
        s.sort()
    return by


def test_kendall_taub_matches_python_pairs(spark, sf_dir):
    expected = {}
    for et, series in _daily(sf_dir).items():
        nc = nd = t1 = t2 = n0 = 0
        for i, (_, xa, ya) in enumerate(series):
            for _, xb, yb in series[i + 1 :]:
                sx = (xb > xa) - (xb < xa)
                sy = (yb > ya) - (yb < ya)
                n0 += 1
                if sx * sy > 0:
                    nc += 1
                elif sx * sy < 0:
                    nd += 1
                if sx == 0:
                    t1 += 1
                if sy == 0:
                    t2 += 1
        tau = (
            float(nc - nd) / math.sqrt(float(n0 - t1) * float(n0 - t2))
            if n0 - t1 > 0 and n0 - t2 > 0
            else None
        )
        expected[et] = (len(series), nc, nd, t1, t2, n0, tau)
    got = {
        r.event_type: (r.n_days, r.nc, r.nd, r.ties_x, r.ties_y, r.n0, r.tau_b)
        for r in Q["events_kendall_daily_taub"](spark, sf_dir).collect()
    }
    assert got == expected


def test_chi2_cells_match_python_margins(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    cells = Counter(rows)
    rtot, ctot = Counter(), Counter()
    for (p, s), o in cells.items():
        rtot[p] += o
        ctot[s] += o
    n = sum(cells.values())
    expected = {}
    for (p, s), o in cells.items():
        r, c = rtot[p], ctot[s]
        diff = float(o * n - r * c)
        expected[(p, s)] = (
            o, r, c, n,
            float(r) * float(c) / float(n),
            (diff * diff) / (float(r) * float(c) * float(n)),
        )
    got = {
        (r.priority, r.status): (
            r.observed, r.row_total, r.col_total, r.grand_n,
            r.expected, r.chi2_cell,
        )
        for r in Q["orders_priority_status_chi2_cells"](spark, sf_dir).collect()
    }
    assert got == expected


def test_hhi_matches_python_counters(spark, sf_dir):
    orders = _cents_rows(
        sf_dir, "SELECT o_custkey FROM read_parquet('{d}/orders.parquet')"
    )
    cust_nat = dict(
        _cents_rows(
            sf_dir,
            "SELECT c_custkey, n_name"
            " FROM read_parquet('{d}/customer.parquet') c"
            " JOIN read_parquet('{d}/nation.parquet') n"
            " ON n.n_nationkey = c.c_nationkey",
        )
    )
    per_cust = Counter(k for (k,) in orders)
    agg = {}
    for ck, co in per_cust.items():
        nat = cust_nat[ck]
        cnt, tot, num = agg.get(nat, (0, 0, 0))
        agg[nat] = (cnt + 1, tot + co, num + co * co)
    expected = {
        nat: (
            cnt, tot, num,
            float(num) / (float(tot) * float(tot)),
            (float(tot) * float(tot)) / float(num),
        )
        for nat, (cnt, tot, num) in agg.items()
    }
    got = {
        r.n_name: (
            r.n_customers, r.total_orders, r.hhi_num, r.hhi,
            r.effective_customers,
        )
        for r in Q["nation_customer_order_hhi"](spark, sf_dir).collect()
    }
    assert got == expected


def test_entropy_bits_match_python_counters(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT user_id, event_type FROM read_parquet('{d}/events.parquet')"
        " WHERE user_id IS NOT NULL AND event_type IS NOT NULL",
    )
    per_user = {}
    for u, et in rows:
        per_user.setdefault(int(u), Counter())[et] += 1
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    expected = {}
    for u, cc in per_user.items():
        n = sum(cc.values())
        surp = sum(c * (flog2(n) - flog2(c)) for c in cc.values())
        expected[u] = (n, len(cc), surp, float(surp) / float(n))
    got = {
        r.user_id: (
            r.n_events, r.n_types, r.surprisal_bits_num, r.bits_per_event
        )
        for r in Q["events_user_type_entropy_bits"](spark, sf_dir).collect()
    }
    assert got == expected


def test_zipf_slope_matches_python_counter(spark, sf_dir):
    rows = _cents_rows(
        sf_dir, "SELECT text FROM read_parquet('{d}/documents.parquet')"
    )
    freq = Counter()
    for (text,) in rows:
        freq.update(text.split(" "))
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [flog2(i + 1) for i in range(len(ranked))]
    ys = [flog2(f) for _, f in ranked]
    n = len(ranked)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    [r] = Q["corpus_zipf_loglog_slope"](spark, sf_dir).collect()
    assert r.vocab_size == n
    assert int(r.slope_num) == num
    assert int(r.slope_den) == den
    assert r.zipf_slope == (
        float(num) / float(den) if n >= 2 and den != 0 else None
    )


def test_psi_matches_python_buckets(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT CAST(ROUND(value * 100, 0) AS BIGINT),"
        " epoch_us(ts) // 86400000000"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE value IS NOT NULL AND ts IS NOT NULL",
    )
    vals = [(int(v), int(d)) for v, d in rows]
    mn = min(v for v, _ in vals)
    mx = max(v for v, _ in vals)
    mid = (min(d for _, d in vals) + max(d for _, d in vals)) // 2
    n_early = [0] * 10
    n_late = [0] * 10
    for v, d in vals:
        b = ((v - mn) * 10) // (mx - mn + 1)
        (n_early if d <= mid else n_late)[b] += 1
    na, nb = sum(n_early) + 10, sum(n_late) + 10
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    expected = {}
    for b in range(10):
        x = (n_early[b] + 1) * nb
        y = (n_late[b] + 1) * na
        diff, bits = x - y, flog2(x) - flog2(y)
        expected[b] = (
            n_early[b], n_late[b], na, nb, diff, bits,
            float(diff) * float(bits) / (float(na) * float(nb)),
        )
    got = {
        r.bucket: (
            r.n_early, r.n_late, r.total_early_smoothed,
            r.total_late_smoothed, r.diff_num, r.ratio_bits,
            r.psi_bits_cell,
        )
        for r in Q["events_value_psi_halves"](spark, sf_dir).collect()
    }
    assert got == expected


def test_jsd_matches_python_counters(spark, sf_dir):
    rows = _cents_rows(
        sf_dir, "SELECT source, text FROM read_parquet('{d}/documents.parquet')"
    )
    per_src = {}
    for src, text in rows:
        per_src.setdefault(src, Counter()).update(text.split(" "))
    cg = Counter()
    for cc in per_src.values():
        cg.update(cc)
    flog2 = lambda x: x.bit_length() - 1  # noqa: E731
    n_g = sum(cg.values())
    surp_g = sum(c * (flog2(n_g) - flog2(c)) for c in cg.values())
    expected = {}
    for src, cc in per_src.items():
        n_s = sum(cc.values())
        surp_s = sum(c * (flog2(n_s) - flog2(c)) for c in cc.values())
        m_tot = 2 * n_s * n_g
        surp_m = 0
        for tok, cgl in cg.items():
            m_num = cc.get(tok, 0) * n_g + cgl * n_s
            surp_m += m_num * (flog2(m_tot) - flog2(m_num))
        jsd = float(surp_m) / float(m_tot) - (
            float(surp_s) / float(n_s) + float(surp_g) / float(n_g)
        ) / 2.0
        expected[src] = (n_s, len(cc), n_g, surp_s, surp_g, surp_m, jsd)
    got = {
        r.source: (
            r.n_tok_source, r.vocab_s, r.n_tok_corpus,
            r.surp_s, r.surp_g, r.surp_m, r.jsd_bits,
        )
        for r in Q["source_token_jsd_vs_corpus"](spark, sf_dir).collect()
    }
    assert got == expected


def test_hits_matches_python_integer_rounds(spark, sf_dir):
    edges = set(
        _cents_rows(
            sf_dir,
            "SELECT DISTINCT o_custkey, l_suppkey"
            " FROM read_parquet('{d}/orders.parquet') o"
            " JOIN read_parquet('{d}/lineitem.parquet') l"
            " ON l_orderkey = o_orderkey",
        )
    )
    succ, pred = {}, {}
    for c, s in edges:
        succ.setdefault(c, []).append(s)
        pred.setdefault(s, []).append(c)
    h = {c: 1 for c in succ}
    a = {}
    for _ in range(3):
        a = {s: sum(h[c] for c in cs) for s, cs in pred.items()}
        h = {c: sum(a[s] for s in ss) for c, ss in succ.items()}
    # query rounds: a1=indeg (h0=1), h1, a2, h2, a3, h3 — the loop above
    # produces exactly (a3, h3)
    ta, th = sum(a.values()), sum(h.values())
    expected = {
        **{f"s{s}": ("authority", v, float(v) / float(ta)) for s, v in a.items()},
        **{f"c{c}": ("hub", v, float(v) / float(th)) for c, v in h.items()},
    }
    got = {
        r.v: (r.role, int(r.score), r.share)
        for r in Q["trade_hits_hub_authority"](spark, sf_dir).collect()
    }
    assert got == expected


def test_mannwhitney_matches_python_ranks(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL",
    )
    views = sorted(int(v) for et, v in rows if et == "view")
    purch = sorted(int(v) for et, v in rows if et == "purchase")
    pooled = sorted(views + purch)
    n1, n2, n = len(views), len(purch), len(views) + len(purch)
    # doubled tie-averaged pooled ranks via value -> 2*avg_rank
    from collections import Counter as C
    cnt = C(pooled)
    r2 = {}
    cum = 0
    tie_term = 0
    for v in sorted(cnt):
        t = cnt[v]
        r2[v] = 2 * cum + t + 1
        tie_term += t * t * t - t
        cum += t
    r1_x2 = sum(r2[v] for v in views)
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    n_d = float(n)
    var = (
        float(n1) * float(n2)
        * ((n_d + 1.0) * n_d * (n_d - 1.0) - float(tie_term))
    ) / (12.0 * n_d * (n_d - 1.0))
    z = float(u1_x2 - n1 * n2) / (2.0 * math.sqrt(var))
    delta = float(u1_x2 - n1 * n2) / float(n1 * n2)
    [r] = Q["events_mannwhitney_view_purchase"](spark, sf_dir).collect()
    assert (r.n_view, r.n_purchase) == (n1, n2)
    assert (r.u_view_x2, r.u_purchase_x2) == (u1_x2, 2 * n1 * n2 - u1_x2)
    assert r.tie_term == tie_term
    assert r.mw_z == z
    assert r.cliffs_delta == delta


def test_qq_deciles_match_python_picks(spark, sf_dir):
    rows = _cents_rows(
        sf_dir,
        "SELECT CAST(ROUND(value * 100, 0) AS BIGINT),"
        " epoch_us(ts) // 86400000000"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE value IS NOT NULL AND ts IS NOT NULL",
    )
    vals = [(int(v), int(d)) for v, d in rows]
    mid = (min(d for _, d in vals) + max(d for _, d in vals)) // 2
    early = sorted(v for v, d in vals if d <= mid)
    late = sorted(v for v, d in vals if d > mid)

    def pick(arr, q):
        k = (q * len(arr) + 9) // 10
        return arr[k - 1]

    expected = {
        q: (pick(early, q), pick(late, q), pick(late, q) - pick(early, q))
        for q in range(1, 10)
    }
    got = {
        r.decile: (r.v_early_cents, r.v_late_cents, r.qq_shift_cents)
        for r in Q["events_value_qq_deciles_halves"](spark, sf_dir).collect()
    }
    assert got == expected
