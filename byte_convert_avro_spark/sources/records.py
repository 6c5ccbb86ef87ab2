"""Kafka-shaped record sources (O1).

One ConnectRecord ≙ one row of ``KAFKA_RECORD_SCHEMA`` (SURVEY.md §1.1) —
the same columns Spark's Kafka source produces, so pipelines written
against fixtures run unchanged against a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from byte_convert_avro_spark.engine import KAFKA_RECORD_SCHEMA


def kafka_records(
    spark: SparkSession, bootstrap: str, topics: list[str] | str, **options: str
) -> DataFrame:
    """Batch Kafka source (needs the spark-sql-kafka package on a cluster;
    this container has no broker — use :func:`kafka_records_from_parquet`)."""
    subscribe = topics if isinstance(topics, str) else ",".join(topics)
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", subscribe)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_record_stream(
    spark: SparkSession, bootstrap: str, topics: list[str] | str, **options: str
) -> DataFrame:
    """Streaming Kafka source.  At scale: one task per topic-partition;
    decode stays narrow, so throughput is linear in partitions."""
    subscribe = topics if isinstance(topics, str) else ",".join(topics)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", subscribe)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_records_from_parquet(
    spark: SparkSession, path: str, streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Fixture-backed record source: parquet files in Kafka record shape.
    The broker-less test/dev path — identical schema, identical plans."""
    if streaming:
        reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(path)
    return spark.read.schema(KAFKA_RECORD_SCHEMA).parquet(path)
