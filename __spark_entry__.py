"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-ish Q3: broadcast join +
agg + top-k) at sf0.001.  ``queries()``/``oracle_sql()`` expose the full
registry from ``byte_convert_avro_spark.queries`` — every operator from
SURVEY.md §2's driver-contract surface plus the LLM-pipeline extensions
(dedup, MinHash-LSH, similarity search, text analysis, sessionization,
as-of join, and the wire-format Avro decode pipeline itself as an
oracle-checked round-trip).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from byte_convert_avro_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.queries()["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; callables take (spark, sf_dir)."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (same aliases both sides)."""
    return _q.oracle_sql()
