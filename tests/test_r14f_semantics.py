"""Round-14f families vs INDEPENDENT Python recomputes (the third
engine next to Spark and the DuckDB oracle): AUC from a brute-force
pairwise P(pos > neg) + ½P(=) count, ROC cells from literal-threshold
counting loops, decile lift from an explicit descending sort, MRR from
a numpy cosine re-rank, and McNemar from a pure-python re-run of both
marker heuristics — so a shared misunderstanding between the two SQL
spellings cannot hide.

Float assertions are EXACT equality: every float in these entries is
one fixed IEEE expression tree over exact integers (single guarded
divisions), and python's arithmetic follows the same trees.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from byte_convert_avro_spark.queries import queries

Q = queries()


def _rows(sf_dir, sql):
    return duckdb.sql(sql.format(d=sf_dir)).fetchall()


def _score_label_rows(sf_dir):
    return _rows(
        sf_dir,
        "SELECT CAST(ROUND(value * 100, 0) AS BIGINT),"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        " FROM read_parquet('{d}/events.parquet')"
        " WHERE value IS NOT NULL AND event_type IS NOT NULL",
    )


def test_auc_matches_bruteforce_pair_count(spark, sf_dir):
    rows = _score_label_rows(sf_dir)
    pos = sorted(vc for vc, y in rows if y == 1)
    neg = sorted(vc for vc, y in rows if y == 0)
    # brute-force 2U = 2·#(pos > neg) + #(pos = neg) via counters
    negc = Counter(neg)
    wins = ties = 0
    for p in pos:
        for nv, cnt in negc.items():
            if p > nv:
                wins += cnt
            elif p == nv:
                ties += cnt
    num2 = 2 * wins + ties
    row = Q["events_purchase_auc_rank_cells"](spark, sf_dir).collect()[0]
    assert row.n_pos == len(pos)
    assert row.n_neg == len(neg)
    assert row.auc_num_x2 == str(num2)
    assert row.auc == float(num2) / (
        2.0 * float(len(pos)) * float(len(neg))
    )
    # rank-sum identity cross-check on the conveyed doubled rank sum
    assert int(row.r2_pos) == num2 + len(pos) * (len(pos) + 1)


def test_roc_cells_match_threshold_loops(spark, sf_dir):
    rows = _score_label_rows(sf_dir)
    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    got = {
        r.cut: r
        for r in Q["events_purchase_roc_literal_thresholds"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(range(0, 50_001, 2_500))
    for cut, r in got.items():
        tp = sum(1 for vc, y in rows if y == 1 and vc >= cut)
        fp = sum(1 for vc, y in rows if y == 0 and vc >= cut)
        assert (r.tp, r.fp) == (tp, fp)
        assert (r.fn, r.tn) == (n_pos - tp, n_neg - fp)
        assert r.tpr == (float(tp) / float(n_pos) if n_pos else None)
        assert r.fpr == (float(fp) / float(n_neg) if n_neg else None)
        assert r.prec == (
            float(tp) / float(tp + fp) if tp + fp else None
        )
        if n_pos and n_neg:
            assert r.youden_j == float(tp) / float(n_pos) - float(
                fp
            ) / float(n_neg)
    # anchors: cut 0 predicts everything positive; top cut clears max
    assert got[0].tp == n_pos and got[0].fp == n_neg
    assert got[50_000].tp == 0 and got[50_000].fp == 0


def test_decile_lift_matches_descending_sort(spark, sf_dir):
    rows = _score_label_rows(sf_dir)
    n = len(rows)
    n_pos_tot = sum(y for _, y in rows)
    # domain-cumulative decile: all rows of one distinct value share it
    dom = Counter(vc for vc, _ in rows)
    rd = 0
    decile_of: dict[int, int] = {}
    for vc in sorted(dom, reverse=True):
        decile_of[vc] = rd * 10 // n + 1
        rd += dom[vc]
    per = {}
    for vc, y in rows:
        d = decile_of[vc]
        t, p = per.get(d, (0, 0))
        per[d] = (t + 1, p + y)
    got = Q["events_purchase_decile_lift"](spark, sf_dir).collect()
    assert [r.decile for r in got] == sorted(per)
    cum_rows = cum_pos = 0
    for r in got:
        t, p = per[r.decile]
        cum_rows += t
        cum_pos += p
        assert (r.n_rows, r.n_pos) == (t, p)
        assert (r.cum_rows, r.cum_pos) == (cum_rows, cum_pos)
        assert r.cum_capture == float(cum_pos) / float(n_pos_tot)
        assert r.cum_lift == float(cum_pos * n) / float(
            cum_rows * n_pos_tot
        )
    assert cum_rows == n and cum_pos == n_pos_tot


def test_mrr_matches_numpy_rerank(spark, sf_dir):
    import numpy as np

    rows = _rows(
        sf_dir,
        "SELECT vec_id, embedding FROM read_parquet('{d}/embeddings.parquet')"
        " ORDER BY vec_id",
    )
    ids = np.array([r[0] for r in rows])
    E = np.array([r[1] for r in rows], dtype=np.float64)
    qm = ids < 5
    sims_full = (E[~qm] @ E[qm].T) / (
        np.linalg.norm(E[~qm], axis=1)[:, None]
        * np.linalg.norm(E[qm], axis=1)[None, :]
    )
    Ep = E[:, :16]
    sims_tr = (Ep[~qm] @ Ep[qm].T) / (
        np.linalg.norm(Ep[~qm], axis=1)[:, None]
        * np.linalg.norm(Ep[qm], axis=1)[None, :]
    )
    cids = ids[~qm]
    got = {r.qid: r for r in Q["truncated_dim_mrr_at5"](spark, sf_dir).collect()}
    for qi, qid in enumerate(ids[qm]):
        # engines round sims to 4 decimals then tie-break on vec_id; the
        # numpy sims differ in the last ulp, so replicate the rounding
        sf_ = np.round(sims_full[:, qi], 4)
        st_ = np.round(sims_tr[:, qi], 4)
        full_top5 = set(
            cids[np.lexsort((cids, -sf_))][:5].tolist()
        )
        trunc_order = cids[np.lexsort((cids, -st_))][:5]
        first = 0
        n_rel = 0
        for pos, vid in enumerate(trunc_order, start=1):
            if vid in full_top5:
                n_rel += 1
                if first == 0:
                    first = pos
        r = got[int(qid)]
        assert r.first_rel_pos == first
        assert r.n_rel_at5 == n_rel
        assert r.rr_x60 == (60 // first if first else 0)
        assert r.rr == float(60 // first if first else 0) / 60.0


def _pyscore(text: str, marker: str) -> float:
    padded = f" {text} "
    removed = padded.replace(marker, "")
    return (len(text) - len(removed) + 2) / len(marker)


def _pycascade(s: dict[str, float]) -> str:
    if s["en"] >= s["de"] and s["en"] >= s["fr"] and s["en"] >= s["es"] \
            and s["en"] > 0:
        return "en"
    if s["de"] >= s["fr"] and s["de"] >= s["es"] and s["de"] > 0:
        return "de"
    if s["fr"] >= s["es"] and s["fr"] > 0:
        return "fr"
    if s["es"] > 0:
        return "es"
    return "unknown"


def test_mcnemar_matches_python_heuristics(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT text, lang FROM read_parquet('{d}/documents.parquet')",
    )
    n11 = n10 = n01 = n00 = 0
    for text, lang in rows:
        ga = _pycascade(
            {
                "en": _pyscore(text, " the "),
                "de": _pyscore(text, " der "),
                "fr": _pyscore(text, " le "),
                "es": _pyscore(text, " el "),
            }
        )
        gb = _pycascade(
            {
                "en": _pyscore(text, " and "),
                "de": _pyscore(text, " und "),
                "fr": _pyscore(text, " et "),
                "es": _pyscore(text, " y "),
            }
        )
        a_ok, b_ok = ga == lang, gb == lang
        if a_ok and b_ok:
            n11 += 1
        elif a_ok:
            n10 += 1
        elif b_ok:
            n01 += 1
        else:
            n00 += 1
    r = Q["langid_mcnemar_stopword_vs_conjunction"](
        spark, sf_dir
    ).collect()[0]
    assert (r.n11, r.n10, r.n01, r.n00) == (n11, n10, n01, n00)
    assert r.n_docs == len(rows)
    assert r.acc_a == float(n11 + n10) / float(len(rows))
    assert r.acc_b == float(n11 + n01) / float(len(rows))
    disc = n01 + n10
    if disc:
        d = n10 - n01
        assert r.mcnemar_chi2 == float(d * d) / float(disc)
        assert r.mcnemar_chi2_cc == float(
            (abs(d) - 1) * (abs(d) - 1)
        ) / float(disc)
    else:
        assert r.mcnemar_chi2 is None and r.mcnemar_chi2_cc is None


def _py_d2(e, c):
    acc = 0.0
    for x, y in zip(e, c):
        acc = acc + (x - y) * (x - y)
    return acc


def test_silhouette_and_db_match_python_folds(spark, sf_dir):
    """Third-engine check of the scoring stage: take the (already
    bit-gated) Spark-trained centroids, then recompute assignment,
    silhouette, chunked scatter folds and DB contributions in pure
    python with the same left-to-right IEEE folds."""
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
    sil_exp = {}
    members: dict[int, list[tuple[int, float]]] = {}
    for vid in sorted(pts):
        d2s = [_py_d2(pts[vid], vec) for _, vec in cl]
        mn = min(d2s)
        own = cl[d2s.index(mn)][0]
        srt = sorted(d2s)
        a, b = math.sqrt(srt[0]), math.sqrt(srt[1])
        mx = max(a, b)
        sil_exp[vid] = (own, a, b, (b - a) / mx if mx > 0 else 0.0)
        members.setdefault(own, []).append((vid, a))
    got = Q["kmeans_silhouette_simplified"](spark, sf_dir).collect()
    assert len(got) == len(sil_exp)
    for r in got:
        own, a, b, s = sil_exp[r.vec_id]
        assert (r.cell, r.a, r.b, r.sil) == (own, a, b, s)
    # DB cells: two-level chunked scatter fold (chunk 128, vec_id order)
    scatter = {}
    for cell, mem in members.items():
        chunks: dict[int, float] = {}
        for vid, d in sorted(mem):
            chunks[vid // 128] = chunks.get(vid // 128, 0.0) + d
        osum = 0.0
        for chk in sorted(chunks):
            osum = osum + chunks[chk]
        scatter[cell] = (osum / len(mem), len(mem))
    cdist = {
        (ca, cb): math.sqrt(_py_d2(va, vb))
        for ca, va in cl
        for cb, vb in cl
        if ca != cb
    }
    gotdb = {r.cell: r for r in Q["kmeans_davies_bouldin_cells"](spark, sf_dir).collect()}
    assert set(gotdb) == set(scatter)
    for cell, (s, n) in scatter.items():
        r = gotdb[cell]
        assert (r.n, r.scatter) == (n, s)
        exp = max(
            (s + scatter[cb][0]) / cdist[(cell, cb)]
            for cb in scatter
            if cb != cell and cdist[(cell, cb)] > 0
        )
        assert r.db_contrib == exp


def test_flesch_matches_python_regex(spark, sf_dir):
    import re

    rows = _rows(
        sf_dir,
        "SELECT doc_id, text FROM read_parquet('{d}/documents.parquet')",
    )
    got = {r.doc_id: r for r in Q["doc_readability_flesch"](spark, sf_dir).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        term = len(re.findall(r"[.!?]+", text))
        words = len(re.findall(r"[^ ]+", text))
        syll = len(re.findall(r"[aeiouy]+", text.lower()))
        sents = max(1, term) if len(text) > 0 else 0
        r = got[doc_id]
        assert (r.n_term_groups, r.n_sentences, r.n_words, r.n_syllables) \
            == (term, sents, words, syll)
        if sents > 0 and words > 0:
            wps = float(words) / float(sents)
            spw = float(syll) / float(words)
            assert r.words_per_sentence == wps
            assert r.syllables_per_word == spw
            assert r.flesch == 206.835 - 1.015 * wps - 84.6 * spw
        else:
            assert r.flesch is None


def test_gini_cells_match_python_counters(spark, sf_dir):
    rows = _rows(
        sf_dir,
        "SELECT o_orderpriority, o_orderstatus,"
        " strftime(o_orderdate, '%m'),"
        " CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    vcs = sorted(vc for _, _, _, vc in rows)
    n = len(vcs)
    # exact median: order statistic at ceil((N+1)/2) via domain cumulative
    dom = Counter(vcs)
    cum = 0
    med = None
    for vc in sorted(dom):
        cum += dom[vc]
        if cum * 2 >= n + 1:
            med = vc
            break
    cells: dict[tuple[str, str], list[int]] = {}
    tot = [0, 0]
    for pri, st, mo, vc in rows:
        y = 1 if vc > med else 0
        tot[0] += 1
        tot[1] += y
        for feat, lev in (("priority", pri), ("status", st), ("month", mo)):
            c = cells.setdefault((feat, lev), [0, 0])
            c[0] += 1
            c[1] += y
    got = {
        (r.feature, r.level): r
        for r in Q["orders_feature_gini_impurity_cells"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(cells)

    def gini(nc, pc):
        nd, pd_ = float(nc), float(pc)
        return 1.0 - (pd_ * pd_ + (nd - pd_) * (nd - pd_)) / (nd * nd)

    for key, (nv, pv) in cells.items():
        r = got[key]
        assert (r.n_v, r.pos_v) == (nv, pv)
        assert (r.n_total, r.pos_total) == tuple(tot)
        assert r.gini_child == gini(nv, pv)
        assert r.wgini_contrib == gini(nv, pv) * float(nv) / float(tot[0])
        assert r.gini_parent == gini(*tot)
    # split criterion sanity: every weighted child sum <= parent (purity
    # never decreases), reader-side fold per feature
    for feat in ("priority", "status", "month"):
        wsum = sum(
            r.wgini_contrib for (f, _), r in got.items() if f == feat
        )
        assert wsum <= gini(*tot) + 1e-12


def test_ca_trend_matches_python_score_test(spark, sf_dir):
    rows = _score_label_rows(sf_dir)
    g: dict[int, list[int]] = {}
    for vc, y in rows:
        s = min(vc // 10000, 4) + 1
        c = g.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += y
    n = sum(c[0] for c in g.values())
    d = sum(c[1] for c in g.values())
    s1 = sum(s * c[0] for s, c in g.items())
    s2 = sum(s * s * c[0] for s, c in g.items())
    t1 = sum(s * c[1] for s, c in g.items())
    got = {r.band_score: r for r in Q["events_purchase_ca_trend_cells"](spark, sf_dir).collect()}
    assert set(got) == set(g)
    num = float(n) * float(t1) - float(d) * float(s1)
    var = float(n) * float(s2) - float(s1) * float(s1)
    for s, (ng, dg) in g.items():
        r = got[s]
        assert (r.n_g, r.d_g) == (ng, dg)
        assert (r.n_total, r.d_total) == (n, d)
        assert (r.sum_sn, r.sum_s2n, r.sum_sd) == (s1, s2, t1)
        assert r.rate == float(dg) / float(ng)
        if d > 0 and n - d > 0 and var > 0:
            assert r.ca_z2 == float(n) * num * num / (
                float(d) * (float(n) - float(d)) * var
            )


def test_edge_support_hist_matches_python_enumeration(spark, sf_dir):
    from itertools import combinations

    rows = _rows(
        sf_dir,
        "SELECT DISTINCT l_orderkey, l_partkey"
        " FROM read_parquet('{d}/lineitem.parquet')",
    )
    orders: dict[int, set[int]] = {}
    for ok, p in rows:
        orders.setdefault(ok, set()).add(p)
    edges: set[tuple[int, int]] = set()
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    support = dict.fromkeys(edges, 0)
    for a, b in edges:
        for w in adj[a] & adj[b]:
            support[(a, b)] += 1
    hist = Counter(support.values())
    got = {r.support: r for r in Q["copurchase_edge_support_hist"](spark, sf_dir).collect()}
    assert {s: r.n_edges for s, r in got.items()} == dict(hist)
    # suffix cumulative: n_edges_at_least(s) counts every edge with
    # support >= s — the k-truss size upper-bound curve
    for s, r in got.items():
        assert r.n_edges_at_least == sum(
            c for s2, c in hist.items() if s2 >= s
        )
    assert got[min(hist)].n_edges_at_least if min(hist) == 0 else True
    assert sum(hist.values()) == len(edges)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_blocking_quality_matches_python_bruteforce(spark, sf_dir):
    from itertools import combinations

    rows = _rows(
        sf_dir,
        "SELECT c_custkey, c_name, c_nationkey"
        " FROM read_parquet('{d}/customer.parquet')",
    )
    n = len(rows)
    nat = {k: nk for k, _, nk in rows}
    truth = [
        (a[0], b[0])
        for a, b in combinations(sorted(rows), 2)
        if _lev(a[1], b[1]) <= 1
    ]
    hits = sum(1 for a, b in truth if nat[a] == nat[b])
    blocks = Counter(nk for _, _, nk in rows)
    cands = sum(c * (c - 1) // 2 for c in blocks.values())
    allp = n * (n - 1) // 2
    r = Q["customer_blocking_quality_profile"](spark, sf_dir).collect()[0]
    assert (r.n_customers, r.n_all_pairs) == (n, allp)
    assert (r.n_candidates, r.n_truth, r.n_truth_in_block) == (
        cands,
        len(truth),
        hits,
    )
    assert r.reduction_ratio == 1.0 - float(cands) / float(allp)
    assert r.pairs_completeness == float(hits) / float(len(truth))


def test_streaming_auc_twin_matches_batch(spark, sf_dir):
    """The streaming twin's drained score-domain must reproduce the
    batch AUC row exactly (same finalize, mergeable domain counts)."""
    batch = Q["events_purchase_auc_rank_cells"](spark, sf_dir).collect()
    tw = Q["streaming_purchase_auc_rank_cells"](spark, sf_dir).collect()
    assert [r.asDict() for r in batch] == [r.asDict() for r in tw]


def test_calibration_bins_match_python_shrinkage(spark, sf_dir):
    import math

    rows = _rows(
        sf_dir,
        "SELECT o_custkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " FROM read_parquet('{d}/orders.parquet')",
    )
    dom = Counter(vc for _, vc in rows)
    n = len(rows)
    cum = 0
    med = None
    for vc in sorted(dom):
        cum += dom[vc]
        if cum * 2 >= n + 1:
            med = vc
            break
    d = sum(1 for _, vc in rows if vc > med)
    per: dict[int, list[int]] = {}
    for ck, vc in rows:
        c = per.setdefault(ck, [0, 0])
        c[0] += 1
        c[1] += 1 if vc > med else 0
    prior = float(d) / float(n)
    bins: dict[int, list] = {}
    for nc, yc in per.values():
        p = (float(yc) + 10.0 * prior) / (float(nc) + 10.0)
        b = math.floor(p * 20.0)
        e = bins.setdefault(b, [0, 0, 0, p, p])
        e[0] += 1
        e[1] += nc
        e[2] += yc
        e[3] = min(e[3], p)
        e[4] = max(e[4], p)
    got = {r.bin: r for r in Q["orders_target_calibration_bins"](spark, sf_dir).collect()}
    assert set(got) == set(bins)
    for b, (ncus, nord, npos, mn, mx) in bins.items():
        r = got[b]
        assert (r.n_customers, r.n_orders, r.n_pos) == (ncus, nord, npos)
        assert r.observed_rate == float(npos) / float(nord)
        assert (r.min_pred, r.max_pred) == (mn, mx)
        assert r.prior == prior
