"""Pin the session configuration the cross-engine determinism and scale
posture rely on — a config regression here breaks oracle agreement or
the AQE-dependent plans silently."""

from __future__ import annotations


def test_session_scale_and_determinism_configs(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert int(conf.get("spark.sql.shuffle.partitions")) >= 8
