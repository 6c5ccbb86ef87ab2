"""SparkSession + table-loading helpers shared by tests, bench, and the
driver entry point.

Scale notes (the configs that matter at 100 TB, even though tests run
local[32]): AQE on for runtime re-planning and skew-join splitting;
shuffle partitions sized to cores locally (a real cluster would set
``spark.sql.shuffle.partitions`` ~2-3× total cores or rely on AQE
coalescing); session timezone pinned UTC so timestamp semantics agree with
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def get_spark(app_name: str = "byte_convert_avro_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 32)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[32] = driver JVM IS the executor: 32 concurrent tasks
        # share this heap.  8g OOM'd pagerank's edge materialization at
        # local sf10 (12M edges x 32 tasks); 24g clears every local
        # stress with headroom on the 128 GiB box — heap is reserved
        # lazily, so small runs cost nothing extra.  On a real cluster
        # executor memory is the knob instead.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read the driver's parquet tables and register temp views."""
    out: dict[str, DataFrame] = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(t)
            out[t] = df
    return out
