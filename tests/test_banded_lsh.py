"""Direct evidence for the banded sign-LSH scale path
(`operators/similarity.sign_lsh_banded_candidates`): the candidate set is
a superset of the single-band bucketing's, and recall against the exact
all-pairs near-dup truth is MEASURED — on the driver corpus at its
calibrated threshold (0.4 — the corpus has no >=0.95 pairs; its max
cosine is ~0.479), and on a deterministic synthetic near-dup corpus in
the >=0.95 regime the operator is designed for.

This is the designated 100 TB near-dup path; these tests are what let a
dedup user pick it with a measured recall number instead of a claim.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from byte_convert_avro_spark.operators.dedup import embedding_near_dup
from byte_convert_avro_spark.operators.similarity import (
    sign_lsh_banded_candidates,
    sign_lsh_buckets,
)
from byte_convert_avro_spark.queries.base import t


def _pair_set(df, a="id_a", b="id_b") -> set[tuple]:
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def _single_band_pairs(emb) -> set[tuple]:
    """Candidate pairs of the single-band bucketing (first-8-dim signs) —
    the same prefilter `lsh_bucketed_near_dup` uses."""
    single = sign_lsh_buckets(emb, vec_col="e", n_bits=8)
    return _pair_set(
        single.alias("a")
        .join(
            single.alias("b"),
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")),
    )


def _banded_pairs(emb) -> set[tuple]:
    return _pair_set(
        sign_lsh_banded_candidates(
            emb, vec_col="e", id_col="vec_id", n_bands=4, bits_per_band=8
        )
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


@pytest.fixture(scope="module")
def synth(spark):
    """Deterministic near-dup corpus: 50 base vectors × (1 original + 2
    perturbed copies, cosine >= ~0.95) + 100 unrelated fillers.  Fixed
    seed — the measured recalls below are stable numbers, not flaky."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(50):
        base = rng.normal(size=64)
        rows.append((vid, [float(x) for x in base]))
        vid += 1
        for _ in range(2):
            pert = base + 0.12 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in pert]))
            vid += 1
    for _ in range(100):
        rows.append((vid, [float(x) for x in rng.normal(size=64)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id int, e array<double>")


def test_banded_candidates_superset_of_single_band(spark, emb):
    """Band 0 of the banded key IS the single-band bucket key, so every
    single-band candidate pair must appear in the banded candidate set."""
    single_pairs = _single_band_pairs(emb)
    banded_pairs = _banded_pairs(emb)
    assert single_pairs, "sanity: single-band bucketing must produce candidates"
    assert single_pairs <= banded_pairs
    # the extra bands must actually add candidates on this corpus,
    # otherwise the recall upgrade is vacuous here
    assert len(banded_pairs) > len(single_pairs)


def test_banded_recall_on_driver_corpus(spark, emb):
    """Recall vs the exact all-pairs truth at the registered queries'
    calibrated threshold (0.4): banded strictly above single-band.
    Measured values on this corpus: single ~1/66, banded ~13/66 —
    pinned loosely so data regeneration can shift them without breaking."""
    truth = _pair_set(
        embedding_near_dup(emb, vec_col="e", id_col="vec_id", threshold=0.4)
    )
    assert truth, "sanity: the 0.4 threshold is calibrated to this corpus"
    recall_single = len(truth & _single_band_pairs(emb)) / len(truth)
    recall_banded = len(truth & _banded_pairs(emb)) / len(truth)
    print(
        f"driver corpus recall @cos>=0.4: single {recall_single:.3f}, "
        f"banded {recall_banded:.3f} (truth {len(truth)} pairs)"
    )
    assert recall_banded > recall_single


def test_banded_recall_095_on_synthetic_near_dups(spark, synth):
    """The >=0.95 regime the operator is built for: banded recall strictly
    above single-band and >= 0.9.  With seed 7 the measured numbers are
    single 0.687, banded 0.987 over 150 true pairs."""
    truth = _pair_set(
        embedding_near_dup(synth, vec_col="e", id_col="vec_id", threshold=0.95)
    )
    assert len(truth) >= 100, "sanity: the synthetic corpus embeds true near-dups"
    recall_single = len(truth & _single_band_pairs(synth)) / len(truth)
    recall_banded = len(truth & _banded_pairs(synth)) / len(truth)
    print(
        f"synthetic recall @cos>=0.95: single {recall_single:.3f}, "
        f"banded {recall_banded:.3f} (truth {len(truth)} pairs)"
    )
    assert recall_banded > recall_single
    assert recall_banded >= 0.9


def test_banded_n_bands_matched_bounds(spark, emb):
    """n_bands_matched counts matching bands: within [1, n_bands]."""
    cands = sign_lsh_banded_candidates(
        emb, vec_col="e", id_col="vec_id", n_bands=4, bits_per_band=8
    )
    stats = cands.agg(
        F.min("n_bands_matched").alias("lo"), F.max("n_bands_matched").alias("hi")
    ).collect()[0]
    assert stats.lo >= 1 and stats.hi <= 4


def test_banded_on_synthetic_known_truth(spark):
    """Hand-built 3-vector case: u/v differ only in dim 9's sign (band 1),
    so bands 0,2,3 still match — candidate survives with n_bands_matched=3.
    w flips one sign in EVERY band — no candidate row at all."""
    dim = 32
    base = [1.0] * dim
    v = list(base)
    v[8] = -1.0  # dim 9 -> band 1 (dims 9-16)
    w = list(base)
    for i in (1, 9, 17, 25):  # one flip per 8-dim band, none shared with v
        w[i] = -1.0
    df = spark.createDataFrame(
        [(1, base), (2, v), (3, w)], "vec_id int, e array<double>"
    )
    got = {
        (r.id_a, r.id_b): r.n_bands_matched
        for r in sign_lsh_banded_candidates(
            df, vec_col="e", id_col="vec_id", n_bands=4, bits_per_band=8
        ).collect()
    }
    assert got == {(1, 2): 3}
