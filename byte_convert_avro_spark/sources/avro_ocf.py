"""Distributed Avro Object Container File source + sink.

The file-format counterpart of the wire-format decode engine (SURVEY.md
§1): the reference SMT consumes Confluent-framed Avro off Kafka, but the
same records rest on disk as OCF — a complete replacement needs to read
and write that container too.  Framing lives in
:mod:`byte_convert_avro_spark.avro.ocf` (pure Python, spec-exact); this
module is the Spark plumbing.

Scale model:

- **write**: one OCF file per Spark partition (the classic
  ``part-NNNNN`` layout), rows streamed through bounded ~``block_rows``
  blocks — peak executor memory is one block, not one file.  The write
  runs inside ``mapPartitionsWithIndex`` (per-partition imperative file
  IO is the one legitimate RDD use), so 1000 executors write 1000 files
  concurrently with zero driver involvement beyond the final path list.
- **read**: Spark's ``binaryFile`` source lists and distributes files
  (one task per file — matching the write granularity), and each task
  decodes its file block-by-block via :func:`iter_ocf_blocks`.  Within a
  huge single file, blocks after the header are self-contained between
  sync markers, so a future splitter can fan blocks out further; at the
  file-per-partition layout this writer produces, per-file parallelism
  already saturates the cluster.

Schema mapping covers the analytics subset both engines share (primitive
types, nullable-as-union, arrays, nested records, string-keyed maps);
anything else raises at plan time rather than writing undecodable files.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from byte_convert_avro_spark.avro.ocf import (
    decode_ocf_header,
    encode_ocf,
    iter_ocf_blocks,
)

_SPARK_TO_AVRO: dict[type, str] = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "bytes",
}

_AVRO_TO_SPARK: dict[str, T.DataType] = {
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def avro_schema_of(dt: T.DataType, name: str = "row", nullable: bool = False) -> Any:
    """Spark type -> Avro schema fragment (nullable -> ``[null, T]``)."""
    if type(dt) in _SPARK_TO_AVRO:
        base: Any = _SPARK_TO_AVRO[type(dt)]
    elif isinstance(dt, T.StructType):
        base = {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": avro_schema_of(f.dataType, f"{name}_{f.name}", f.nullable),
                }
                for f in dt.fields
            ],
        }
    elif isinstance(dt, T.ArrayType):
        base = {
            "type": "array",
            "items": avro_schema_of(dt.elementType, f"{name}_item", dt.containsNull),
        }
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError(f"Avro maps require string keys, got {dt.keyType}")
        base = {
            "type": "map",
            "values": avro_schema_of(dt.valueType, f"{name}_value", dt.valueContainsNull),
        }
    else:
        raise TypeError(f"no Avro mapping for Spark type {dt}")
    return ["null", base] if nullable else base


def spark_type_of(avro: Any) -> tuple[T.DataType, bool]:
    """Avro schema fragment -> (Spark type, nullable)."""
    if isinstance(avro, str):
        if avro == "null":
            return T.NullType(), True
        if avro in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[avro], False
        raise TypeError(f"no Spark mapping for Avro type {avro!r}")
    if isinstance(avro, list):
        branches = [b for b in avro if b != "null"]
        if len(branches) != 1:
            raise TypeError(f"only [null, T] unions map to Spark, got {avro}")
        dt, _ = spark_type_of(branches[0])
        return dt, True
    kind = avro["type"]
    if kind == "record":
        return (
            T.StructType(
                [
                    T.StructField(f["name"], *spark_type_of(f["type"]))
                    for f in avro["fields"]
                ]
            ),
            False,
        )
    if kind == "array":
        dt, n = spark_type_of(avro["items"])
        return T.ArrayType(dt, containsNull=n), False
    if kind == "map":
        dt, n = spark_type_of(avro["values"])
        return T.MapType(T.StringType(), dt, valueContainsNull=n), False
    if kind in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[kind], False
    raise TypeError(f"no Spark mapping for Avro type {avro!r}")


def _row_to_plain(v: Any) -> Any:
    """Spark Row / numpy scalars -> plain python for the Avro writer."""
    if hasattr(v, "asDict"):
        return {k: _row_to_plain(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _row_to_plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_row_to_plain(x) for x in v]
    if isinstance(v, bytearray):
        return bytes(v)
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        return v.item()  # numpy scalar
    return v


def write_avro_ocf(
    df: DataFrame, directory: str, codec: str = "deflate", block_rows: int = 1000,
) -> list[str]:
    """Write ``df`` as ``directory/part-NNNNN.avro`` (one OCF file per
    partition; empty partitions write nothing).  Returns the written file
    paths.  The schema is derived from ``df.schema`` — unsupported types
    raise HERE, at plan time, not per-row in executors."""
    schema = avro_schema_of(df.schema, name="row")
    schema_json = json.dumps(schema)
    os.makedirs(directory, exist_ok=True)
    cols = df.columns

    def write_part(idx: int, rows: Iterator[Any]) -> Iterator[str]:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        import itertools

        path = os.path.join(directory, f"part-{idx:05d}.avro")
        plain = (
            {c: _row_to_plain(r[c]) for c in cols}
            for r in itertools.chain([first], it)
        )
        blob = encode_ocf(plain, schema_json, codec=codec, block_rows=block_rows)
        with open(path, "wb") as fh:
            fh.write(blob)
        yield path

    return sorted(df.rdd.mapPartitionsWithIndex(write_part).collect())


def read_avro_ocf(
    spark: SparkSession, path: str, spark_schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read OCF files distributed (one task per file via ``binaryFile``).
    If ``spark_schema`` is omitted it is inferred from the FIRST file's
    embedded writer schema — a driver-side peek at one file, not a scan."""
    files = spark.read.format("binaryFile").load(path)
    if spark_schema is None:
        head = files.select("content").head()
        if head is None:
            raise ValueError(f"no OCF files under {path!r}")
        schema_json, _, _, _ = decode_ocf_header(head["content"])
        avro = json.loads(schema_json)
        dt, _ = spark_type_of(avro)
        if not isinstance(dt, T.StructType):
            raise TypeError(f"top-level OCF schema must be a record, got {dt}")
        spark_schema = dt
    elif isinstance(spark_schema, str):
        spark_schema = T.StructType.fromDDL(spark_schema)

    field_names = [f.name for f in spark_schema.fields]

    def decode_files(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                for block in iter_ocf_blocks(bytes(blob)):
                    yield pd.DataFrame(
                        [[row.get(c) for c in field_names] for row in block],
                        columns=field_names,
                    )

    return files.select("content").mapInPandas(decode_files, schema=spark_schema)
