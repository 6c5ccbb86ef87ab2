"""Sources & sinks.

The reference's only I/O is the Kafka source/sink pair provided by the
Connect runtime (O1/O18, README.md:16-26) — config, not code.  On Spark the
equivalents are one-liners (``spark.read[Stream].format("kafka")``), so this
package adds what a standing deployment actually needs around them:

- ``kafka_records`` / ``kafka_record_stream`` — the Kafka-shaped record
  sources (broker-backed where available, parquet-fixture-backed in this
  container), one schema everywhere (``engine.KAFKA_RECORD_SCHEMA``).
- ``write_partitioned`` / ``write_bucketed`` — scale-aware parquet sinks:
  date/topic partition layout for pruning, bucketing for shuffle-free
  co-located joins on a standing key.
"""

from byte_convert_avro_spark.sources.records import (
    kafka_record_stream,
    kafka_records,
    kafka_records_from_jsonl,
    kafka_records_from_parquet,
    write_records_jsonl,
)
from byte_convert_avro_spark.sources.sinks import write_bucketed, write_partitioned

__all__ = [
    "kafka_records",
    "kafka_record_stream",
    "kafka_records_from_jsonl",
    "kafka_records_from_parquet",
    "write_records_jsonl",
    "write_partitioned",
    "write_bucketed",
]
