"""Round-14g families vs INDEPENDENT Python recomputes (the third
engine next to Spark and the DuckDB oracle): ANOVA / Brown-Forsythe
moments from raw row loops, t-closeness EMD from explicit prefix-CDF
gaps, MCC from Counter marginals, and ECE by replaying the exact
two-level chunk fold — so a shared misunderstanding between the two
SQL spellings cannot hide.

Float assertions are EXACT equality wherever the entry pins a fixed
IEEE tree (single guarded divisions over exact ints, ordered folds
replayed in the same order); tolerance appears only where the python
recompute deliberately uses a DIFFERENT summation tree (Fraction-exact
cross-checks of the sums of squares).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

from byte_convert_avro_spark.queries import queries

Q = queries()


def _rows(sf_dir, sql):
    return duckdb.sql(sql.format(d=sf_dir)).fetchall()


def _event_cents(sf_dir):
    return _rows(
        sf_dir,
        "SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE value IS NOT NULL AND event_type IS NOT NULL",
    )


def _anova_f_tree(groups):
    """The pinned F tree: groups = {key: (n, s, q)} exact ints;
    replays the event_type-ordered fold and guarded divisions."""
    sb = 0.0
    for k in sorted(groups):
        n_g, s_g, _ = groups[k]
        sb += float(s_g) * float(s_g) / float(n_g)
    n = sum(g[0] for g in groups.values())
    s = sum(g[1] for g in groups.values())
    q = sum(g[2] for g in groups.values())
    k = len(groups)
    ssb = sb - float(s) * float(s) / float(n)
    ssw = float(q) - sb
    f = None
    if k > 1 and n > k and ssw > 0:
        f = (ssb / float(k - 1)) / (ssw / float(n - k))
    return n, k, ssb, ssw, f


def test_anova_cells_match_python_moments(spark, sf_dir):
    rows = _event_cents(sf_dir)
    groups: dict = defaultdict(lambda: [0, 0, 0])
    for et, vc in rows:
        g = groups[et]
        g[0] += 1
        g[1] += vc
        g[2] += vc * vc
    groups = {k: tuple(v) for k, v in groups.items()}
    got = {r.event_type: r for r in Q["events_value_anova_cells"](spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for et, (n_g, s_g, q_g) in groups.items():
        r = got[et]
        assert (r.n_g, r.s_g, r.q_g_str) == (n_g, s_g, str(q_g))
    n, k, ssb, ssw, f = _anova_f_tree(groups)
    any_row = next(iter(got.values()))
    assert (any_row.n, any_row.k) == (n, k)
    assert any_row.ssb == ssb and any_row.ssw == ssw and any_row.f_stat == f
    # Fraction-exact cross-check with a DIFFERENT (exact) tree: the
    # variance decomposition must satisfy SSB + SSW == Q - S²/N exactly
    # in rationals; the float tree should sit within float error of it.
    exact_sb = sum(Fraction(v[1] * v[1], v[0]) for v in groups.values())
    ntot = sum(v[0] for v in groups.values())
    stot = sum(v[1] for v in groups.values())
    qtot = sum(v[2] for v in groups.values())
    exact_ssb = exact_sb - Fraction(stot * stot, ntot)
    exact_ssw = Fraction(qtot) - exact_sb
    assert abs(ssb - float(exact_ssb)) <= 1e-9 * max(1.0, abs(float(exact_ssb)))
    assert abs(ssw - float(exact_ssw)) <= 1e-9 * max(1.0, abs(float(exact_ssw)))


def test_brown_forsythe_medians_and_f(spark, sf_dir):
    rows = _event_cents(sf_dir)
    per: dict = defaultdict(list)
    for et, vc in rows:
        per[et].append(vc)
    meds = {}
    for et, vals in per.items():
        vals.sort()
        n = len(vals)
        # min vc with 2*cum >= n+1 == element at ceil((n+1)/2) 1-based
        meds[et] = vals[(n + 2) // 2 - 1]
    groups = {}
    for et, vals in per.items():
        zs = [abs(v - meds[et]) for v in vals]
        groups[et] = (len(zs), sum(zs), sum(z * z for z in zs))
    got = {
        r.event_type: r
        for r in Q["events_value_brown_forsythe_cells"](spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for et, (n_g, s_g, q_g) in groups.items():
        r = got[et]
        assert (r.n_g, r.med_g, r.s_g, r.q_g_str) == (n_g, meds[et], s_g, str(q_g))
    n, k, ssb, ssw, f = _anova_f_tree(groups)
    any_row = next(iter(got.values()))
    assert any_row.f_stat == f and any_row.ssb == ssb and any_row.ssw == ssw
    # the spread ordering the statistic claims must match the raw MADs:
    # largest |z| mean group should sit above the smallest by > 0
    means = {et: groups[et][1] / groups[et][0] for et in groups}
    assert max(means.values()) >= min(means.values())


def test_t_closeness_explicit_prefix_gaps(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus, strftime(o_orderdate, '%Y-%m'),"
        " (CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + 1000000) // 5000000"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    sdom = sorted({s for *_, s in rows})
    m = len(sdom)
    n = len(rows)
    gcum: Counter = Counter(s for *_, s in rows)
    by_cls: dict = defaultdict(Counter)
    for p, st, mo, s in rows:
        by_cls[(p, st, mo)][s] += 1
    got = {
        (r.qi1, r.qi2, r.qi3): r
        for r in Q["orders_t_closeness_profile"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_cls)
    for cls, cnt in by_cls.items():
        n_c = sum(cnt.values())
        cum_c = cum_n = d = 0
        for s in sdom:
            cum_c += cnt.get(s, 0)
            cum_n += gcum[s]
            d += abs(n * cum_c - n_c * cum_n)
        r = got[cls]
        assert (r.n_c, r.d_scaled_str) == (n_c, str(d))
        assert r.t_closeness == float(d) / (float(n_c) * float(n) * float(m - 1))
        assert 0.0 <= r.t_closeness <= 1.0
    # the global class (all rows) would have t == 0; every real class's
    # distribution differs, but a class equal to global must score 0:
    # verified structurally — d terms vanish when cnt == gcum scaled.


def test_mcc_matches_python_marginals(spark, sf_dir):
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
    labels = set(ra) | set(ca)
    pe_num = sum(ra.get(l, 0) * ca.get(l, 0) for l in labels)
    sum_r_sq = sum(ra.get(l, 0) ** 2 for l in labels)
    sum_c_sq = sum(ca.get(l, 0) ** 2 for l in labels)
    [r] = Q["langid_mcc_cells"](spark, sf_dir).collect()
    assert (r.n_docs, r.agree_docs, r.pe_num) == (n, agree, pe_num)
    assert (r.sum_r_sq, r.sum_c_sq) == (sum_r_sq, sum_c_sq)
    import math

    dr, dc = n * n - sum_r_sq, n * n - sum_c_sq
    assert r.mcc == float(n * agree - pe_num) / (
        math.sqrt(float(dr)) * math.sqrt(float(dc))
    )
    # MCC and kappa share a numerator: same sign, and |MCC| >= |kappa|
    # (geometric-mean denominator <= arithmetic-style kappa denominator
    # by AM-GM when both factors are positive).
    [kp] = Q["langid_cohens_kappa"](spark, sf_dir).collect()
    assert (r.mcc > 0) == (kp.kappa > 0)
    assert abs(r.mcc) >= abs(kp.kappa) - 1e-15


def test_ece_replays_two_level_fold(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_custkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    vals = sorted(vc for _, vc in rows)
    n = len(vals)
    med = vals[(n + 2) // 2 - 1]
    d = sum(1 for _, vc in rows if vc > med)
    per: dict = defaultdict(lambda: [0, 0])
    for ck, vc in rows:
        per[ck][0] += 1
        per[ck][1] += 1 if vc > med else 0
    prior = float(d) / float(n)
    bins: dict = defaultdict(dict)  # bin -> {custkey: (n_c, y_c, wp)}
    for ck, (n_c, y_c) in per.items():
        p = (float(y_c) + 10.0 * prior) / (float(n_c) + 10.0)
        b = int(p * 20.0)
        bins[b][ck] = (n_c, y_c, float(n_c) * p)
    gaps = {}
    for b, members in bins.items():
        chunks: dict = defaultdict(list)
        for ck in members:
            chunks[ck // 4096].append(ck)
        csums = []
        for chk in sorted(chunks):
            s = 0.0
            for ck in sorted(chunks[chk]):
                s += members[ck][2]
            csums.append((chk, s))
        wpsum = 0.0
        for _, s in csums:
            wpsum += s
        n_orders = sum(v[0] for v in members.values())
        n_pos = sum(v[1] for v in members.values())
        gaps[b] = (
            n_orders,
            abs(float(n_pos) / float(n_orders) - wpsum / float(n_orders)),
        )
    wsum = 0.0
    for b in sorted(gaps):
        wsum += float(gaps[b][0]) * gaps[b][1]
    n_total = sum(g[0] for g in gaps.values())
    ece = wsum / float(n_total)
    mce = max(g[1] for g in gaps.values())
    [r] = Q["orders_calibration_ece"](spark, sf_dir).collect()
    assert (r.n_bins, r.n_total) == (len(gaps), n_total)
    assert r.ece == ece
    assert r.mce == mce
    # consistency with the bins entry: same orders total
    tot_bins = sum(
        b.n_orders
        for b in Q["orders_target_calibration_bins"](spark, sf_dir).collect()
    )
    assert tot_bins == n_total


# ---------------------------------------------------------------------------
# Count-sketch family: python recompute of the md5 hash family + the
# linearity (mergeability) contract the streaming twin relies on.

import hashlib


def _cs_pos_py(tok, i, w):
    return int(hashlib.md5(f"{tok}:cs{i}".encode()).hexdigest()[:8], 16) % w


def _cs_sign_py(tok, i):
    return 1 - 2 * (
        int(hashlib.md5(f"{tok}:css{i}".encode()).hexdigest()[:8], 16) % 2
    )


def _tokens(sf_dir):
    toks = []
    for (text,) in _rows(
        sf_dir, "SELECT text FROM read_parquet('{d}/documents.parquet')"
    ):
        toks.extend(w for w in text.split(" ") if w != "")
    return toks


def test_count_sketch_matches_python_median(spark, sf_dir):
    toks = _tokens(sf_dir)
    cnt = Counter(toks)
    cells: Counter = Counter()
    for tok, c in cnt.items():
        for i in range(3):
            cells[(i, _cs_pos_py(tok, i, 32))] += _cs_sign_py(tok, i) * c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = {
        r.token: r
        for r in Q["token_count_sketch_vs_exact"](spark, sf_dir).collect()
    }
    assert set(got) == {tok for tok, _ in top}
    for tok, exact in top:
        reads = sorted(
            _cs_sign_py(tok, i) * cells[(i, _cs_pos_py(tok, i, 32))]
            for i in range(3)
        )
        r = got[tok]
        assert (r.exact_cnt, r.est_cnt, r.err) == (
            exact,
            reads[1],
            reads[1] - exact,
        )


def test_count_sketch_linearity_part_vs_whole(spark, sf_dir):
    from byte_convert_avro_spark.operators.sketch import count_sketch_build
    from byte_convert_avro_spark.queries.base import t as tbl

    from pyspark.sql import functions as F

    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter("token <> ''")
    whole = {
        (r.i, r.pos): r.c
        for r in count_sketch_build(tok, "token", d=3, w=32).collect()
    }
    half_a = count_sketch_build(
        tok.filter("doc_id % 2 = 0"), "token", d=3, w=32
    ).collect()
    half_b = count_sketch_build(
        tok.filter("doc_id % 2 = 1"), "token", d=3, w=32
    ).collect()
    merged: Counter = Counter()
    for r in list(half_a) + list(half_b):
        merged[(r.i, r.pos)] += r.c
    merged = {k: v for k, v in merged.items() if v != 0}
    whole_nz = {k: v for k, v in whole.items() if v != 0}
    assert merged == whole_nz


def test_ams_f2_matches_python(spark, sf_dir):
    toks = _tokens(sf_dir)
    cnt = Counter(toks)
    exact_f2 = sum(c * c for c in cnt.values())
    cells: Counter = Counter()
    for tok, c in cnt.items():
        for i in range(5):
            cells[(i, _cs_pos_py(tok, i, 64))] += _cs_sign_py(tok, i) * c
    per_row = sorted(
        sum(v * v for (i, _), v in cells.items() if i == row)
        for row in range(5)
    )
    [r] = Q["token_ams_f2_sketch_vs_exact"](spark, sf_dir).collect()
    assert r.n_tokens == len(toks)
    assert r.exact_f2_str == str(exact_f2)
    assert r.est_f2_str == str(per_row[2])
    assert r.rel_err == (float(per_row[2]) - float(exact_f2)) / float(exact_f2)


# ---------------------------------------------------------------------------
# SemDeDup: python recompute of assignment + within-cell cosine pruning
# over the (already bit-gated) Spark-trained centroids.


def test_semdedup_flags_match_python_cosines(spark, sf_dir):
    import math

    from byte_convert_avro_spark.operators import similarity as S
    from byte_convert_avro_spark.queries.base import spread, t as tbl

    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    cents = S.kmeans_lloyd(
        emb, "embedding", "vec_id", k=8, n_iter=3, fold_chunk=128
    )
    cl = [
        (int(r.cell), [float(x) for x in r.embedding])
        for r in cents.orderBy("cell").collect()
    ]
    pts = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def d2(e, c):
        acc = 0.0
        for x, y in zip(e, c):
            acc = acc + (x - y) * (x - y)
        return acc

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    cell_of, nrm = {}, {}
    for vid, e in pts.items():
        d2s = [d2(e, vec) for _, vec in cl]
        cell_of[vid] = cl[d2s.index(min(d2s))][0]
        nrm[vid] = math.sqrt(fold_dot(e, e))
    members: dict = defaultdict(list)
    for vid in sorted(pts):
        members[cell_of[vid]].append(vid)
    n_prior: Counter = Counter()
    for cell, vids in members.items():
        for j, vb in enumerate(vids):
            for va in vids[:j]:
                cos = fold_dot(pts[va], pts[vb]) / (nrm[va] * nrm[vb])
                if cos >= 0.4:
                    n_prior[vb] += 1
    got = {r.vec_id: r for r in Q["semdedup_prune_flags"](spark, sf_dir).collect()}
    assert set(got) == set(pts)
    for vid, r in got.items():
        assert r.cell == cell_of[vid]
        assert r.n_prior_dups == n_prior.get(vid, 0)
        assert r.dropped == (1 if vid in n_prior else 0)
    # summary consistency + the headline claim: something is pruned at
    # this corpus's tau, and the first (lowest-id) member of every cell
    # always survives.
    summ = {r.cell: r for r in Q["semdedup_cell_summary"](spark, sf_dir).collect()}
    for cell, vids in members.items():
        s = summ[cell]
        dropped = sum(1 for v in vids if v in n_prior)
        assert (s.n_members, s.n_dropped, s.n_kept) == (
            len(vids),
            dropped,
            len(vids) - dropped,
        )
        assert got[min(vids)].dropped == 0
    assert sum(s.n_dropped for s in summ.values()) == len(n_prior)


# ---------------------------------------------------------------------------
# Bradley-Terry: full python recompute of duels + the 3 unrolled MM
# rounds with the same j-ordered folds and guarded divisions.


def test_bradley_terry_matches_python_mm(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT l_orderkey, p_brand,"
        " CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
        " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
        " FROM read_parquet('{d}/lineitem.parquet') li"
        " JOIN read_parquet('{d}/part.parquet') pt ON p_partkey = l_partkey",
    )
    per_order: dict = defaultdict(list)
    for ok, b, rev in rows:
        per_order[ok].append((b, rev))
    n_und: Counter = Counter()
    w_und: Counter = Counter()
    for items in per_order.values():
        for x, (bi, ri) in enumerate(items):
            for bj, rj in items:
                if bi < bj and ri != rj:
                    n_und[(bi, bj)] += 1
                    w_und[(bi, bj)] += 1 if ri > rj else 0
    edges: dict = defaultdict(dict)  # i -> {j: (n, w)}
    for (i, j), n in n_und.items():
        w = w_und[(i, j)]
        edges[i][j] = (n, w)
        edges[j][i] = (n, n - w)
    w_tot = {i: sum(v[1] for v in js.values()) for i, js in edges.items()}
    n_tot = {i: sum(v[0] for v in js.values()) for i, js in edges.items()}
    p = {i: 1.0 for i in edges}
    for _ in range(3):
        nxt = {}
        for i in edges:
            den = 0.0
            for j in sorted(edges[i]):
                n, _ = edges[i][j]
                den = den + float(n) / (p[i] + p[j])
            nxt[i] = float(w_tot[i]) / den if den > 0 else 0.0
        p = nxt
    got = {
        r.brand: r
        for r in Q["brand_bradley_terry_strength"](spark, sf_dir).collect()
    }
    assert set(got) == set(edges)
    for i, r in got.items():
        assert (r.w_tot, r.n_tot) == (w_tot[i], n_tot[i])
        assert r.strength == p[i]
    # ranking sanity: ranks are the (strength desc, brand) order, and
    # the top-ranked brand out-wins the bottom-ranked one per duel.
    order = sorted(got.values(), key=lambda r: r.rnk)
    assert [r.rnk for r in order] == list(range(1, len(order) + 1))
    top, bot = order[0], order[-1]
    assert top.strength > bot.strength
    assert top.w_tot * bot.n_tot > bot.w_tot * top.n_tot


# ---------------------------------------------------------------------------
# Hilbert layout: the unrolled step expressions replayed in python must
# form a TRUE Hilbert curve (bijection + unit-step adjacency over the
# full 256x256 grid) — the intrinsic property no cross-engine compare
# can certify — and the measured box volumes must show the locality win.


def _hilbert_py(x, y):
    d = 0
    for step in range(8):
        s = 1 << (7 - step)
        q = 0 if (x < s and y < s) else (1 if x < s else (2 if y >= s else 3))
        d += s * s * q
        if y >= s:
            x, y = x % s, y % s
        elif x >= s:
            x, y = s - 1 - (y % s), s - 1 - (x % s)
        else:
            x, y = y % s, x % s
    return d


def test_hilbert_curve_bijection_and_adjacency():
    seen = {}
    for x in range(256):
        for y in range(256):
            seen[_hilbert_py(x, y)] = (x, y)
    assert len(seen) == 65536
    assert min(seen) == 0 and max(seen) == 65535
    for d in range(65535):
        x1, y1 = seen[d]
        x2, y2 = seen[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_layout_beats_morton_on_box_volume(spark, sf_dir):
    rows = {
        r.layout: r
        for r in Q["hilbert_layout_effectiveness"](spark, sf_dir).collect()
    }
    assert set(rows) == {"hilbert", "zorder", "linear"}
    # 384-point segments are not quadrant-aligned, so Morton's diagonal
    # jumps must cost strictly more box volume than Hilbert's walk;
    # both multi-dim layouts must crush the linear layout's cb span.
    assert rows["hilbert"].avg_volume < rows["zorder"].avg_volume
    assert rows["hilbert"].avg_cb_span < rows["linear"].avg_cb_span / 4
    assert rows["zorder"].avg_cb_span < rows["linear"].avg_cb_span / 4
    assert rows["linear"].avg_db_span == 1.0


def test_orc_roundtrip_identity(spark, sf_dir):
    from byte_convert_avro_spark.queries.base import t as tbl

    src = (
        tbl(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .collect()
    )
    got = Q["orc_roundtrip_supplier"](spark, sf_dir).collect()
    key = lambda r: r.s_suppkey  # noqa: E731
    assert sorted(got, key=key) == sorted(src, key=key)


# ---------------------------------------------------------------------------
# Effect sizes + conformal: python recomputes with brute-force pair
# counting and an explicit residual sort.


def test_effect_sizes_match_bruteforce_pairs(spark, sf_dir):
    import math

    rows = _rows(
        sf_dir,
        "SELECT CAST(ROUND(value * 100, 0) AS BIGINT), event_type"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')",
    )
    pos = [vc for vc, et in rows if et == "purchase"]
    neg = [vc for vc, et in rows if et == "view"]
    negc = Counter(neg)
    wins = ties = 0
    for p in pos:
        for nv, c in negc.items():
            if p > nv:
                wins += c
            elif p == nv:
                ties += c
    losses = len(pos) * len(neg) - wins - ties
    [r] = Q["events_effect_sizes_view_purchase"](spark, sf_dir).collect()
    assert (r.n1, r.n2) == (len(pos), len(neg))
    assert (r.wins_str, r.losses_str, r.ties_str) == (
        str(wins),
        str(losses),
        str(ties),
    )
    assert r.cliffs_delta == (float(wins) - float(losses)) / (
        float(len(pos)) * float(len(neg))
    )
    # replay the pinned Cohen's d tree
    n1, n2 = len(pos), len(neg)
    s1, s2 = sum(pos), sum(neg)
    q1 = sum(v * v for v in pos)
    q2 = sum(v * v for v in neg)
    ss1 = float(q1) - float(s1) * float(s1) / float(n1)
    ss2 = float(q2) - float(s2) * float(s2) / float(n2)
    d = (float(s1) / n1 - float(s2) / n2) / math.sqrt(
        (ss1 + ss2) / float(n1 + n2 - 2)
    )
    assert r.cohens_d == d
    assert r.hedges_g == d * (1.0 - 3.0 / (4.0 * float(n1 + n2) - 9.0))
    # |delta| <= 1 and the MW identity: delta == 2*AUC - 1
    assert -1.0 <= r.cliffs_delta <= 1.0


def test_conformal_coverage_matches_explicit_sort(spark, sf_dir):
    import math

    rows = _rows(
        sf_dir,
        "SELECT l_orderkey % 2, CAST(l_quantity AS BIGINT),"
        " CAST(ROUND(l_extendedprice, 0) AS BIGINT)"
        " FROM read_parquet('{d}/lineitem.parquet')",
    )
    cal = [(x, y) for h, x, y in rows if h == 1]
    tst = [(x, y) for h, x, y in rows if h == 0]
    n = len(cal)
    sx = sum(x for x, _ in cal)
    sy = sum(y for _, y in cal)
    sxx = sum(x * x for x, _ in cal)
    sxy = sum(x * y for x, y in cal)
    den = float(n) * float(sxx) - float(sx) * float(sx)
    slope = (float(n) * float(sxy) - float(sx) * float(sy)) / den
    icept = (float(sy) - slope * float(sx)) / float(n)
    resid = sorted(abs(float(y) - (slope * float(x) + icept)) for x, y in cal)
    k = math.ceil(0.9 * (n + 1))
    q_hat = resid[k - 1]
    covered = sum(
        1
        for x, y in tst
        if abs(float(y) - (slope * float(x) + icept)) <= q_hat
    )
    [r] = Q["lineitem_ols_conformal_coverage"](spark, sf_dir).collect()
    assert (r.n_cal, r.k, r.n_test, r.covered) == (n, k, len(tst), covered)
    assert r.q_hat == q_hat
    assert r.coverage == float(covered) / float(len(tst))
    # the conformal guarantee: coverage concentrates at >= 90% under
    # exchangeability; on this arbitrary-parity split allow sampling
    # slack but catch a broken quantile (e.g. k off by more than ties).
    assert r.coverage >= 0.85


# ---------------------------------------------------------------------------
# TextRank: full python recompute — graph build + 3 weighted PageRank
# rounds with the same neighbor-ordered folds.


def test_textrank_matches_python_rounds(spark, sf_dir):
    texts = [
        t
        for (t,) in _rows(
            sf_dir, "SELECT text FROM read_parquet('{d}/documents.parquet')"
        )
    ]
    edges: Counter = Counter()
    for txt in texts:
        w = txt.split(" ")
        for a, b in zip(w, w[1:]):
            if a != b and a != "" and b != "":
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    adj: dict = defaultdict(dict)  # v -> {u: w_uv}
    strength: Counter = Counter()
    deg: Counter = Counter()
    for (u, v), w in edges.items():
        adj[v][u] = w
        strength[u] += w
        deg[u] += 1
    tr = {u: 1.0 for u in strength}
    for _ in range(3):
        nxt = {}
        for v in adj:
            acc = 0.0
            for u in sorted(adj[v]):
                acc = acc + (float(adj[v][u]) / float(strength[u])) * tr[u]
            nxt[v] = 0.15 + 0.85 * acc
        tr = nxt
    top = sorted(tr.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = Q["corpus_textrank_keywords"](spark, sf_dir).collect()
    assert len(got) == min(15, len(top))
    for rnk, (r, (tok, score)) in enumerate(zip(got, top), start=1):
        assert r.rnk == rnk
        assert r.token == tok
        assert r.tr == score
        assert (r.deg, r.strength) == (deg[tok], strength[tok])


def test_streaming_anova_equals_batch(spark, sf_dir):
    """Linearity: the drained streaming moments must reproduce the
    batch ANOVA rows bit-for-bit (same finalize tree)."""
    batch = Q["events_value_anova_cells"](spark, sf_dir).collect()
    stream = Q["streaming_anova_moment_cells"](spark, sf_dir).collect()
    assert stream == batch
