"""Named analytics queries + DuckDB oracle SQL (the driver's correctness
contract, ``__spark_entry__.queries()`` / ``oracle_sql()``).

Each query is a (spark, sf_dir) -> DataFrame callable registered together
with equivalent ANSI SQL that DuckDB runs on the same parquet tables.
Cross-engine determinism discipline (see ``base.py``): decimal-cast sums
(order-independent exact aggregation), integer-µs event-time arithmetic,
``strftime`` for any timestamp output, explicit tie-break keys under every
LIMIT/row_number, and aliases matching between both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from byte_convert_avro_spark.queries.base import ORACLES, REGISTRY

# Importing the modules populates the registry.
from byte_convert_avro_spark.queries import relational  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_ext  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_gaps  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r7  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r8  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r9  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r10  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r11  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r11b  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r12  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r13  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r13b  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14b  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14c  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14d  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14e  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14f  # noqa: E402,F401
from byte_convert_avro_spark.queries import relational_r14g  # noqa: E402,F401
from byte_convert_avro_spark.queries import events  # noqa: E402,F401
from byte_convert_avro_spark.queries import text  # noqa: E402,F401
from byte_convert_avro_spark.queries import training_prep  # noqa: E402,F401
from byte_convert_avro_spark.queries import vectors  # noqa: E402,F401
from byte_convert_avro_spark.queries import avro_pipeline  # noqa: E402,F401
from byte_convert_avro_spark.queries import pipeline_ops  # noqa: E402,F401
from byte_convert_avro_spark.queries import streaming_queries  # noqa: E402,F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if v is not None}
