"""Column-function library: value checks + the no-Python guarantee."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from byte_convert_avro_spark import functions as BF
from byte_convert_avro_spark.plans.inspect import explain_str


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 4.0, 4.0]), ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        BF.dot("a", "b").alias("d"),
        BF.l2_norm("a").alias("na"),
        BF.cosine_similarity("a", "b").alias("cos"),
        BF.l2_distance("a", "b").alias("dist"),
    ).collect()
    assert rows[0].d == 18.0
    assert rows[0].na == 3.0
    assert math.isclose(rows[0].cos, 1.0)
    assert rows[1].cos == 0.0
    assert math.isclose(rows[0].dist, 3.0)
    assert math.isclose(rows[1].dist, math.sqrt(2))


def test_text_functions(spark):
    df = spark.createDataFrame([("Hello, world! Yes",)], "t string")
    r = df.select(
        BF.n_tokens("t").alias("tok"),
        BF.n_words("t").alias("w"),
        BF.punct_ratio("t").alias("p"),
        BF.uppercase_ratio("t").alias("u"),
        BF.content_hash("t").alias("h"),
    ).collect()[0]
    assert r.tok == 5  # Hello , world ! Yes
    assert r.w == 3
    assert math.isclose(r.p, 2 / 17)
    assert math.isclose(r.u, 2 / 17)
    assert len(r.h) == 32


def test_time_functions_exact_at_epoch_ns_scale(spark):
    """2026-era ns timestamps: float division would drift; div must not."""
    ns = 1_786_593_368_807_968_123
    df = spark.createDataFrame([(ns,)], "ts long")
    r = df.select(
        BF.epoch_us("ts").alias("us"),
        BF.time_bucket(BF.epoch_us("ts"), 3_600_000_000).alias("bucket"),
    ).collect()[0]
    assert r.us == ns // 1000
    assert r.bucket == (ns // 1000) // 3_600_000_000


def test_all_functions_are_jvm_side(spark):
    """No BatchEvalPython / ArrowEvalPython anywhere — the library's
    codegen guarantee."""
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0], "txt", 12345678901234)],
        "a array<double>, b array<double>, t string, ts long",
    )
    out = df.select(
        BF.cosine_similarity("a", "b"),
        BF.n_tokens("t"),
        BF.punct_ratio("t"),
        BF.content_hash("t"),
        BF.epoch_us("ts"),
    )
    plan = explain_str(out, "simple")
    assert "Python" not in plan  # no BatchEvalPython/ArrowEvalPython stage


def test_wire_reexports(spark):
    payload = bytes([0, 0, 0, 0, 42]) + b"body"
    df = spark.createDataFrame([(payload,), (b"\x01bad",)], "v binary")
    rows = df.select(
        BF.is_valid_wire(F.col("v")).alias("ok"),
        BF.schema_id(F.col("v")).alias("sid"),
    ).collect()
    assert rows[0].ok and rows[0].sid == 42
    assert not rows[1].ok
