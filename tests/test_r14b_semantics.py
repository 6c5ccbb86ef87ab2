"""Round-14b families vs INDEPENDENT Python recomputes (the third
engine next to Spark and the DuckDB oracle): mutual-kNN / SNN /
Jarvis-Patrick from numpy cosine math, the changepoint argmax from a
pure-python prefix-sum scan, the bigram bit-score from dict counters,
and the KMV difference from hashlib sketches — so a shared
misunderstanding between the two SQL spellings cannot hide."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from byte_convert_avro_spark.queries import queries

Q = queries()


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def emb_sample(sf_dir):
    """(vec_id, vector) for the 5% md5 sample the SNN family uses."""
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    return [
        (int(vid), [float(x) for x in vec])
        for vid, vec in rows
        if _md5_32(str(int(vid))) % 100 < 5
    ]


def _knn_lists(emb_sample, k):
    """Directed top-k cosine lists, python floats (same fold order as the
    engines: per-dimension products summed left to right)."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm = {vid: math.sqrt(dot(v, v)) for vid, v in emb_sample}
    out = {}
    for qid, qv in emb_sample:
        sims = [
            (dot(v, qv) / (nrm[vid] * nrm[qid]), vid)
            for vid, v in emb_sample
            if vid != qid
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        out[qid] = sims[:k]
    return out


def _snn_edges_py(emb_sample, k=5, min_shared=2):
    knn = _knn_lists(emb_sample, k)
    lists = {q: {vid for _, vid in ns} for q, ns in knn.items()}
    edges = {}
    for a in lists:
        for b in lists[a]:
            if a < b and a in lists[b]:
                shared = len(
                    (lists[a] & lists[b]) - {a, b}
                )
                if shared >= min_shared:
                    edges[(a, b)] = shared
    return edges


def test_mutual_knn_pairs_matches_python(spark, sf_dir, emb_sample):
    knn = _knn_lists(emb_sample, 3)
    ranks = {
        (q, vid): r + 1
        for q, ns in knn.items()
        for r, (_, vid) in enumerate(ns)
    }
    expected = {
        (q, vid): (ranks[(q, vid)], ranks[(vid, q)])
        for (q, vid) in ranks
        if q < vid and (vid, q) in ranks
    }
    got = {
        (r.id_a, r.id_b): (r.rank_ab, r.rank_ba)
        for r in Q["mutual_knn_pairs"](spark, sf_dir).collect()
    }
    assert got == expected
    # the globally closest pair guarantees non-emptiness at every SF
    assert got


def test_snn_edges_match_python(spark, sf_dir, emb_sample):
    expected = _snn_edges_py(emb_sample)
    got = {
        (r.id_a, r.id_b): r.shared_cnt
        for r in Q["snn_shared_neighbor_edges"](spark, sf_dir).collect()
    }
    assert got == expected


def test_jarvis_patrick_clusters_match_python(spark, sf_dir, emb_sample):
    edges = _snn_edges_py(emb_sample)
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {v: find(v) for v in parent}
    # canonical id = min member, which union-by-min preserves
    sizes = {}
    for v, c in comp.items():
        sizes[c] = sizes.get(c, 0) + 1
    expected = {v: (c, sizes[c]) for v, c in comp.items()}
    got = {
        r.vec_id: (r.cluster_id, r.cluster_size)
        for r in Q["jarvis_patrick_clusters"](spark, sf_dir).collect()
    }
    assert got == expected


def test_changepoint_matches_python_scan(spark, sf_dir):
    """Daily cents come from DuckDB (the rounding primitive is gated
    elsewhere); the NEW logic — the |S_t*n - t*S_n| argmax with
    earliest-day ties — is recomputed in pure python."""
    daily = duckdb.sql(
        f"""
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
        FROM read_parquet('{sf_dir}/events.parquet')
        WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
        GROUP BY event_type, day ORDER BY event_type, day
        """
    ).fetchall()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, day, c in daily:
        by_type.setdefault(et, []).append((int(day), int(c)))
    expected = {}
    for et, series in by_type.items():
        n = len(series)
        s_n = sum(c for _, c in series)
        best = None
        s_t = 0
        for t_idx, (day, c) in enumerate(series, start=1):
            s_t += c
            stat = abs(s_t * n - t_idx * s_n)
            key = (-stat, day)
            if best is None or key < best[0]:
                left = s_t / t_idx
                right = (s_n - s_t) / (n - t_idx) if n > t_idx else None
                best = (key, (n, day, t_idx, stat, left, right))
        expected[et] = best[1]
    got = {
        r.event_type: (
            r.n_days,
            r.change_day,
            r.left_days,
            r.stat_num,
            r.left_mean_cents,
            r.right_mean_cents,
        )
        for r in Q["events_value_changepoint"](spark, sf_dir).collect()
    }
    assert got == expected


def test_bitscore_matches_python_counters(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    cbg: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    vocab = set()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in docs:
        w = text.split(" ")
        vocab.update(w)
        bgs = list(zip(w, w[1:]))
        per_doc[int(doc_id)] = bgs
        for a, b in bgs:
            cbg[(a, b)] = cbg.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = len(vocab)
    expected = {}
    for doc_id, bgs in per_doc.items():
        if not bgs:
            continue
        bits = [
            (ctx[a] + v).bit_length() - 1 - ((cbg[(a, b)] + 1).bit_length() - 1)
            for a, b in bgs
        ]
        expected[doc_id] = (len(bits), sum(bits), sum(bits) / len(bits))
    got = {
        r.doc_id: (r.n_bigrams, r.bit_sum, r.bits_per_bigram)
        for r in Q["doc_bigram_lm_bitscore"](spark, sf_dir).collect()
    }
    assert got == expected


def test_kmv_difference_matches_python_sketches(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        " WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')"
    ).fetchall()
    ha = {_md5_32(str(int(u))) for et, u in rows if et == "view"}
    hb = {_md5_32(str(int(u))) for et, u in rows if et == "purchase"}
    ska, skb = set(sorted(ha)[:32]), set(sorted(hb)[:32])
    u = sorted(ska | skb)[:32]
    n_a_only = sum(1 for h in u if h in ska and h not in skb)
    n_b_only = sum(1 for h in u if h in skb and h not in ska)
    k_used, kth = len(u), max(u)
    union_est = float(k_used) if k_used < 32 else 31.0 * 4294967296.0 / kth
    r = Q["kmv_difference_estimate"](spark, sf_dir).collect()[0]
    assert (r.n_a_only, r.n_b_only, r.k_used, r.kth_union) == (
        n_a_only,
        n_b_only,
        k_used,
        kth,
    )
    assert r.exact_a_minus_b == len(ha - hb)
    assert r.exact_b_minus_a == len(hb - ha)
    assert r.diff_ab_est == union_est * (n_a_only / k_used)
    assert r.diff_ba_est == union_est * (n_b_only / k_used)
    assert r.symm_diff_est == union_est * ((n_a_only + n_b_only) / k_used)


def test_pq_rerank_recall_flags_match_python(spark, sf_dir):
    """The rerank d2 values and the exact-top-3 membership flags vs a
    python recompute of exact squared-L2 (same left-to-right fold) from
    the raw parquet vectors; rank must follow d2 ascending."""
    vecs = {
        int(vid): [float(x) for x in v]
        for vid, v in duckdb.sql(
            f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    }
    qid = min(vecs)
    qv = vecs[qid]

    def d2(v):
        acc = 0.0
        for x, y in zip(v, qv):
            acc += (x - y) * (x - y)
        return acc

    exact_top3 = [
        vid for _, vid in sorted((d2(v), vid) for vid, v in vecs.items())[:3]
    ]
    out = Q["pq_rerank_top3_recall"](spark, sf_dir).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert all(r.d2 == d2(vecs[r.vec_id]) for r in out)
    assert [r.in_exact_top3 for r in out] == [
        1 if r.vec_id in exact_top3 else 0 for r in out
    ]
    # d2 ascending with (d2, vec_id) ties
    keys = [(r.d2, r.vec_id) for r in out]
    assert keys == sorted(keys)
    # the query vector itself is its own exact nearest neighbor — the
    # rerank must never lose it out of a 20-deep shortlist
    assert out[0].vec_id == qid and out[0].in_exact_top3 == 1


# ---------------------------------------------------------------------------
# Batch 2: trend/shape statistics + Allen algebra vs Python recomputes.


def _daily_cents_py(sf_dir):
    """Per-type day series from DuckDB (the cents rollup primitive is
    gated elsewhere); returns {event_type: [(day, cents), ...] sorted}."""
    rows = duckdb.sql(
        f"""
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{sf_dir}/events.parquet')
        WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
        GROUP BY event_type, day ORDER BY event_type, day
        """
    ).fetchall()
    by = {}
    for et, d, c in rows:
        by.setdefault(et, []).append((int(d), int(c)))
    return by


def test_theil_sen_matches_python(spark, sf_dir):
    by = _daily_cents_py(sf_dir)
    expected = {}
    for et, series in by.items():
        pairs = [
            ((cb - ca) / (db - da), da, db)
            for i, (da, ca) in enumerate(series)
            for db, cb in series[i + 1 :]
        ]
        pairs.sort()
        n = len(pairs)
        slope, da, db = pairs[(n + 1) // 2 - 1]
        expected[et] = (len(series), n, slope, da, db)
    got = {
        r.event_type: (
            r.n_days,
            r.n_pairs,
            r.ts_slope_cents_per_day,
            r.med_day_a,
            r.med_day_b,
        )
        for r in Q["events_theil_sen_daily_trend"](spark, sf_dir).collect()
    }
    assert got == expected


def test_mann_kendall_matches_python(spark, sf_dir):
    by = _daily_cents_py(sf_dir)
    expected = {}
    for et, series in by.items():
        vals = [c for _, c in series]
        n = len(vals)
        s = sum(
            (1 if b > a else -1 if b < a else 0)
            for i, a in enumerate(vals)
            for b in vals[i + 1 :]
        )
        tie_counts = {}
        for v in vals:
            tie_counts[v] = tie_counts.get(v, 0) + 1
        tie_term = sum(
            t_ * (t_ - 1) * (2 * t_ + 5) for t_ in tie_counts.values() if t_ > 1
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        denom = math.sqrt(var18 / 18.0)
        z = (s - 1) / denom if s > 0 else (s + 1) / denom if s < 0 else 0.0
        expected[et] = (n, s, var18, z)
    got = {
        r.event_type: (r.n_days, r.s_stat, r.var18, r.z_stat)
        for r in Q["events_mann_kendall_trend"](spark, sf_dir).collect()
    }
    assert got == expected


def test_isotonic_matches_python_pava(spark, sf_dir):
    """Classic sequential pool-adjacent-violators in exact Fractions vs
    the engine's min-max-formula spelling — equality proves the closed
    form, not just the SQL twin."""
    from fractions import Fraction

    by = _daily_cents_py(sf_dir)
    expected = {}
    for et, series in by.items():
        blocks = []  # (sum, count)
        for _, c in series:
            blocks.append((c, 1))
            while len(blocks) > 1:
                s2, n2 = blocks[-1]
                s1, n1 = blocks[-2]
                if Fraction(s1, n1) >= Fraction(s2, n2):
                    blocks[-2:] = [(s1 + s2, n1 + n2)]
                else:
                    break
        fitted = []
        for s_, n_ in blocks:
            fitted.extend([float(Fraction(s_, n_))] * n_)
        for (day, c), f in zip(series, fitted):
            expected[(et, day)] = (c, f)
    got = {
        (r.event_type, r.day): (r.day_cents, r.iso_cents)
        for r in Q["events_isotonic_daily_value"](spark, sf_dir).collect()
    }
    assert got == expected


def test_allen_histogram_matches_python(spark, sf_dir):
    iv = duckdb.sql(
        f"""
        SELECT o_custkey, o_orderkey, o_orderdate, MAX(l_shipdate)
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
        """
    ).fetchall()
    by_cust = {}
    for ck, ok, d0, d1 in iv:
        by_cust.setdefault(ck, []).append((ok, d0, d1))

    def classify(a0, a1, b0, b1):
        if a1 < b0:
            return "precedes"
        if b1 < a0:
            return "preceded_by"
        if a1 == b0 and a0 < b0 and b1 > b0:
            return "meets"
        if b1 == a0 and b0 < a0 and a1 > a0:
            return "met_by"
        if a0 == b0 and a1 == b1:
            return "equals"
        if a0 == b0:
            return "starts" if a1 < b1 else "started_by"
        if a1 == b1:
            return "finishes" if a0 > b0 else "finished_by"
        if a0 > b0 and a1 < b1:
            return "during"
        if a0 < b0 and a1 > b1:
            return "contains"
        return "overlaps" if a0 < b0 else "overlapped_by"

    expected = {}
    for ivs in by_cust.values():
        for i, (ka, a0, a1) in enumerate(ivs):
            for kb, b0, b1 in ivs:
                if ka < kb:
                    r = classify(a0, a1, b0, b1)
                    expected[r] = expected.get(r, 0) + 1
    got = {
        r.relation: r.n_pairs
        for r in Q["order_interval_allen_histogram"](spark, sf_dir).collect()
    }
    assert got == expected
