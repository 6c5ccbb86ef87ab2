"""Streaming deduplication — exact-once record identity over an unbounded
stream.

``dropDuplicates`` on a key column with a watermark is Spark's built-in
streaming dedup: state holds one entry per key seen within the watermark
horizon, so memory is bounded by (arrival rate × watermark), not stream
length.  This is the streaming twin of the batch exact-dedup stage
(``operators/dedup.py``) — the first pass of the dedup ladder applied at
ingest time, before anything lands in the lake.

Scale notes: state is keyed by the dedup key (uniform if the key is a
content hash); RocksDB state store holds it off-heap on a real cluster.
Keys older than the watermark are evicted — a duplicate arriving later
than the watermark horizon is NOT caught (that's the documented horizon
trade-off; the batch exact-dedup pass downstream remains the backstop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from byte_convert_avro_spark.streaming.windows import with_event_time


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate records by key within the watermark horizon."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ev = with_event_time(events).withWatermark("ts_ts", watermark)
    return ev.dropDuplicatesWithinWatermark(keys)
