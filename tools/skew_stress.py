"""Seeded skew stress — the data shapes the uniform testdata can't provide.

The driver corpus is benign (~1.03 events/session, no hot users, no
boilerplate signature), so every "AQE handles skew" claim in the
docstrings is untested exactly where it matters: window-heavy plans,
where AQE does NOT split a skewed partition key.  This tool generates
three adversarial shapes with a fixed seed and measures the operators
the round-10 verdict called out:

  rolling_median   one hot user with D active days x E events/day.
                   A/B: the old anchors-join spelling (equi-keyed on
                   user alone, day band as residual -> enumerates
                   D x (D*E) candidate pairs inside ONE join key) vs
                   the round-11 explode spelling (physical <=7x fan-out,
                   keyed on (user_id, day) -> hot user splits across D
                   keys).  Results are asserted identical.

  sessions         the same total row count as one uniform corpus vs
                   one user owning every event.  session_window
                   partitions by user: the hot corpus serializes into
                   a single sort task — measured, with the salting
                   guidance recorded in SCALE.md (you cannot salt a
                   session window without splitting sessions; the
                   honest mitigations are a coarse time-bucket pre-split
                   with boundary merge, or accepting that one human's
                   event rate is physically bounded).

  hot_band         one boilerplate (band, sig) bucket shared by B docs
                   emits B(B-1)/2 candidate pairs before any downstream
                   cap can see them.  A/B: uncapped lsh_candidates vs
                   max_docs_per_bucket=16 (the production operating
                   point) on pair count and wall time.

Usage:  python tools/skew_stress.py [--out BENCH_r11_skew_ab.json]
Deterministic (numpy PCG64 seed 11); no dependence on /root/testdata.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

DAY_US = 86_400_000_000
SEED = 11


def _write_events(out_dir: str, ids, ts_us, users, etypes, values) -> str:
    """events.parquet in the driver's shape (ts TIMESTAMP[us])."""
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(etypes, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * len(ids), pa.string()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))
    return out_dir


def gen_hot_user_corpus(
    out_dir: str,
    hot_days: int = 2500,
    hot_per_day: int = 100,
    bg_users: int = 2000,
    bg_per_user: int = 50,
    seed: int = SEED,
) -> str:
    """Background uniform traffic + ONE bot user active every day."""
    rng = np.random.default_rng(seed)
    n_hot = hot_days * hot_per_day
    hot_day = np.repeat(np.arange(hot_days, dtype=np.int64), hot_per_day)
    hot_ts = hot_day * DAY_US + rng.integers(0, DAY_US, n_hot)
    n_bg = bg_users * bg_per_user
    bg_users_col = 1 + np.repeat(
        np.arange(bg_users, dtype=np.int64), bg_per_user
    )
    bg_ts = rng.integers(0, hot_days * DAY_US, n_bg)
    ts = np.concatenate([hot_ts, bg_ts])
    users = np.concatenate(
        [np.zeros(n_hot, dtype=np.int64), bg_users_col]
    )
    n = n_hot + n_bg
    etypes = np.array(["view", "click", "purchase"])[
        rng.integers(0, 3, n)
    ]
    values = np.round(rng.uniform(0.5, 500.0, n), 4)
    return _write_events(
        out_dir, np.arange(n, dtype=np.int64), ts, users, etypes, values
    )


def gen_uniform_corpus(
    out_dir: str, users: int, per_user: int, days: int, seed: int = SEED
) -> str:
    rng = np.random.default_rng(seed + 1)
    n = users * per_user
    ucol = 1 + np.repeat(np.arange(users, dtype=np.int64), per_user)
    ts = rng.integers(0, days * DAY_US, n)
    etypes = np.array(["view", "click", "purchase"])[rng.integers(0, 3, n)]
    values = np.round(rng.uniform(0.5, 500.0, n), 4)
    return _write_events(
        out_dir, np.arange(n, dtype=np.int64), ts, ucol, etypes, values
    )


def gen_one_user_corpus(out_dir: str, n: int, horizon_us: int, seed: int = SEED):
    rng = np.random.default_rng(seed + 2)
    ts = np.sort(rng.integers(0, horizon_us, n))
    etypes = np.array(["view", "click", "purchase"])[rng.integers(0, 3, n)]
    values = np.round(rng.uniform(0.5, 500.0, n), 4)
    return _write_events(
        out_dir,
        np.arange(n, dtype=np.int64),
        ts,
        np.zeros(n, dtype=np.int64),
        etypes,
        values,
    )


# -- the OLD rolling-median spelling, kept here as the A/B control -------
def rolling_median_join_spelling(spark: SparkSession, sf: str) -> DataFrame:
    """Pre-round-11 spelling: anchors equi-join on user alone, day band
    as a residual.  This is the hazard under test — do not re-register."""
    from byte_convert_avro_spark.queries.base import t

    ev = (
        t(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
            F.expr("(ts DIV 1000) DIV 86400000000").alias("day"),
        )
    )
    anchors = ev.select(
        F.col("user_id").alias("a_user"), F.col("day").alias("a_day")
    ).distinct()
    e2 = ev.select(
        F.col("user_id").alias("e_user"),
        F.col("day").alias("e_day"),
        "vc",
        "event_id",
    )
    win = anchors.join(
        e2,
        (F.col("a_user") == F.col("e_user"))
        & (F.col("e_day").between(F.col("a_day") - 6, F.col("a_day"))),
    ).select(
        F.col("a_user").alias("user_id"),
        F.col("a_day").alias("day"),
        "vc",
        "event_id",
    )
    wr = W.partitionBy("user_id", "day").orderBy("vc", "event_id")
    wn = W.partitionBy("user_id", "day")
    ranked = win.select(
        "user_id",
        "day",
        "vc",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    mid = ranked.filter(F.expr("rn = (n + 1) DIV 2 OR rn = (n + 2) DIV 2"))
    return mid.groupBy(
        "user_id", F.col("day").cast("long").alias("day")
    ).agg(
        F.max("n").alias("n_events_7d"),
        (
            (F.sum(F.col("vc").cast("decimal(18,4)")) / F.count("*")).cast(
                "double"
            )
            / 100.0
        ).alias("median_value"),
    )


def _timed_count(df: DataFrame) -> tuple[int, float]:
    t0 = time.monotonic()
    n = df.count()
    return n, round(time.monotonic() - t0, 2)


def _result_hash(df: DataFrame) -> str:
    cols = sorted(df.columns)
    row = (
        df.select(
            F.md5(
                F.concat_ws(
                    "\x1f", *[F.col(c).cast("string") for c in cols]
                )
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()
    )
    return str(row[0][0])


def scenario_rolling_median(spark, tmp) -> dict:
    from byte_convert_avro_spark.queries import queries

    corpus = gen_hot_user_corpus(os.path.join(tmp, "hot"))
    new_df = queries()["user_rolling_7d_median_value"](spark, corpus)
    old_df = rolling_median_join_spelling(spark, corpus)
    # warm the session (parquet footer reads, codegen) off the clock
    new_df.limit(1).count()
    old_df.limit(1).count()
    n_new, s_new = _timed_count(new_df)
    n_old, s_old = _timed_count(old_df)
    h_new, h_old = _result_hash(new_df), _result_hash(old_df)
    assert n_new == n_old and h_new == h_old, (n_new, n_old, h_new, h_old)
    return {
        "corpus": "hot user: 2500 days x 100/day + 2000 bg users x 50",
        "rows_out": n_new,
        "results_identical": True,
        "old_join_spelling_sec": s_old,
        "new_explode_spelling_sec": s_new,
        "speedup": round(s_old / max(s_new, 1e-9), 2),
    }


def scenario_sessions(spark, tmp) -> dict:
    from byte_convert_avro_spark.queries import queries

    q = queries()["events_session_window_dynamic_gap"]
    n = int(os.environ.get("SKEW_SESSIONS_N", "2000000"))
    # Uniform: 20k users x 100 events over 60 days (mean per-user gap
    # ~14h -> almost every event is its own session).  One-user: the
    # SAME n spread at a mean gap of 1h (> the 30-min max session gap,
    # so ~60% of events open sessions) — session counts are comparable,
    # isolating the cost that matters: the hot corpus sorts and
    # session-merges ALL n rows in ONE task (partitioned by user_id),
    # while the uniform corpus fans across every core.
    uni = gen_uniform_corpus(os.path.join(tmp, "uni"), n // 100, 100, 60)
    # horizon capped at ~250 years: the engine's ns-epoch longs overflow
    # at +292y, so beyond ~2.2M events the one-user mean gap compresses
    # below 1h (fewer session breaks — noted in the artifact; the cost
    # under test, the single-task sort, is row-count-bound either way)
    horizon = min(n * 3_600_000_000, 250 * 31_557_600 * 1_000_000)
    hot = gen_one_user_corpus(os.path.join(tmp, "one"), n, horizon)
    q(spark, uni).limit(1).count()  # warm
    n_uni, s_uni = _timed_count(q(spark, uni))
    n_hot, s_hot = _timed_count(q(spark, hot))
    return {
        "corpus": f"{n} events: {n // 100} users x 100  vs  ONE user at 1h mean gap",
        "uniform_sessions": n_uni,
        "uniform_sec": s_uni,
        "one_user_sessions": n_hot,
        "one_user_sec": s_hot,
        "slowdown_hot_vs_uniform": round(s_hot / max(s_uni, 1e-9), 2),
        "note": "session_window is per-user-serial by construction; "
        "see SCALE.md round-11 salting guidance",
    }


def scenario_hot_band(spark, tmp) -> dict:
    from byte_convert_avro_spark.operators import dedup as D

    rng = np.random.default_rng(SEED + 3)
    hot_docs = 5000
    rows = [(int(i), 0, "BOILERPLATE") for i in range(hot_docs)]
    # background: 20k docs across 16 bands, ~8 docs per bucket
    for i in range(20_000):
        rows.append(
            (
                int(10_000 + i),
                int(rng.integers(0, 16)),
                f"sig{int(rng.integers(0, 2500))}",
            )
        )
    sigs = spark.createDataFrame(
        rows, "doc_id long, band int, sig string"
    ).repartition(32)
    n_unc, s_unc = _timed_count(D.lsh_candidates(sigs))
    n_cap, s_cap = _timed_count(
        D.lsh_candidates(sigs, max_docs_per_bucket=16)
    )
    return {
        "corpus": f"{hot_docs} docs in ONE (band,sig) bucket + 20000 bg",
        "uncapped_pairs": n_unc,
        "uncapped_sec": s_unc,
        "capped16_pairs": n_cap,
        "capped16_sec": s_cap,
        "pair_blowup_removed": round(n_unc / max(n_cap, 1), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_r11_skew_ab.json")
    ap.add_argument(
        "--only", choices=["rolling_median", "sessions", "hot_band"]
    )
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    tmp = tempfile.mkdtemp(prefix="skew_stress_")
    out: dict = {"seed": SEED, "scenarios": {}}
    if args.only and os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            out["scenarios"].update(prev.get("scenarios", {}))
        except (OSError, ValueError):
            pass
    try:
        scens = {
            "rolling_median": scenario_rolling_median,
            "sessions": scenario_sessions,
            "hot_band": scenario_hot_band,
        }
        for name, fn in scens.items():
            if args.only and name != args.only:
                continue
            out["scenarios"][name] = fn(spark, tmp)
            print(name, "->", json.dumps(out["scenarios"][name]))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
