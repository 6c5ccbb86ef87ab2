"""Event-time windowed aggregations with watermarks.

Streaming twins of ``queries/events.py``'s tumbling/sliding aggs: same
grouping keys and output column names, with ``withWatermark`` bounding
state so the operator runs forever on an unbounded stream.

Scale notes: a watermarked streaming agg keeps only open windows in the
state store — state size is O(open windows × group keys), independent of
stream length.  The shuffle key is (window, event_type); at 100 TB/day the
same plan holds, sized by ``spark.sql.shuffle.partitions`` and RocksDB
state store.  Late events beyond the watermark are dropped — the exact
discipline Spark documents for append-mode windowed aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from byte_convert_avro_spark.queries.base import dsum


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Driver events carry epoch-ns longs; streaming windows need a real
    TimestampType event-time column (µs precision, session TZ = UTC)."""
    return events.withColumn("ts_ts", F.timestamp_micros(F.expr(f"{ts_col} DIV 1000")))


def hourly_tumbling_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h count/sum per event_type (streaming form of
    ``events_hourly_tumbling``)."""
    ev = with_event_time(events)
    return (
        ev.withWatermark("ts_ts", watermark)
        .groupBy(F.window("ts_ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            # countDistinct is unsupported in streaming aggs; the streaming
            # twin reports approx_count_distinct (documented deviation).
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def sliding_window_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding 1h/15min window (streaming form of ``events_sliding_window``)."""
    ev = with_event_time(events)
    return (
        ev.withWatermark("ts_ts", watermark)
        .groupBy(F.window("ts_ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
