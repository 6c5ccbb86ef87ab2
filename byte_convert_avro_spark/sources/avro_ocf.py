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
  concurrently with zero driver involvement beyond the final path list —
  PROVIDED the target directory is a shared filesystem (see
  :func:`write_avro_ocf`'s distribution contract; executors write with
  plain ``open()``, so on a multi-node cluster without a shared mount the
  files would land on executor-local disks).
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
    iter_encode_ocf,
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
    """Spark type -> Avro schema fragment (nullable -> ``[null, T]``).
    Logical types per the Avro spec: DecimalType -> bytes/decimal,
    DateType -> int/date, TimestampType -> long/timestamp-micros."""
    if isinstance(dt, T.DecimalType):
        base: Any = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    elif isinstance(dt, T.DateType):
        base = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, T.TimestampType):
        base = {"type": "long", "logicalType": "timestamp-micros"}
    elif type(dt) in _SPARK_TO_AVRO:
        base = _SPARK_TO_AVRO[type(dt)]
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
    lt = avro.get("logicalType")
    if lt == "decimal" and kind in ("bytes", "fixed"):
        return T.DecimalType(avro.get("precision", 38), avro.get("scale", 0)), False
    if lt == "date" and kind == "int":
        return T.DateType(), False
    if lt in ("timestamp-micros", "timestamp-millis") and kind == "long":
        return T.TimestampType(), False
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


# -- logical-type value conversion (Avro spec representations) --------------
_EPOCH_DATE = __import__("datetime").date(1970, 1, 1)
_EPOCH_DT = __import__("datetime").datetime(1970, 1, 1)


def _dec_to_bytes(d: Any, scale: int) -> bytes:
    """decimal.Decimal -> minimal two's-complement big-endian unscaled int
    (the Avro ``decimal`` wire form)."""
    import decimal as _d

    unscaled = int(_d.Decimal(d).scaleb(scale).to_integral_value())
    n = max(1, (unscaled.bit_length() + 8) // 8)
    return unscaled.to_bytes(n, "big", signed=True)


def _bytes_to_dec(b: bytes, scale: int) -> Any:
    import decimal as _d

    return _d.Decimal(int.from_bytes(b, "big", signed=True)).scaleb(-scale)


def _spark_encoder(dt: T.DataType):
    """Per-type python-value encoder for the write path: Spark-collected
    values -> Avro base representations.  Timestamps are treated as
    UTC-naive (the engine pins the session TZ to UTC — session.py);
    datetime arithmetic is integer-exact, no float seconds."""
    import datetime as _dt

    if isinstance(dt, T.DecimalType):
        scale = dt.scale
        return lambda v: None if v is None else _dec_to_bytes(v, scale)
    if isinstance(dt, T.DateType):
        return lambda v: None if v is None else (v - _EPOCH_DATE).days
    if isinstance(dt, T.TimestampType):
        def enc_ts(v):
            if v is None:
                return None
            td = v.replace(tzinfo=None) - _EPOCH_DT
            return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
        return enc_ts
    if isinstance(dt, T.StructType):
        encs = {f.name: _spark_encoder(f.dataType) for f in dt.fields}
        return lambda v: None if v is None else {
            k: encs[k](x) for k, x in _row_to_plain(v).items()
        }
    if isinstance(dt, T.ArrayType):
        inner = _spark_encoder(dt.elementType)
        return lambda v: None if v is None else [inner(x) for x in v]
    if isinstance(dt, T.MapType):
        inner = _spark_encoder(dt.valueType)
        return lambda v: None if v is None else {k: inner(x) for k, x in v.items()}
    return _row_to_plain


def _avro_decoder(avro: Any):
    """Per-fragment value decoder for the read path: Avro base
    representations -> python values matching the Spark schema.  Returns
    None when the subtree needs no conversion (identity fast path)."""
    import datetime as _dt

    if isinstance(avro, str):
        return None
    if isinstance(avro, list):
        branches = [b for b in avro if b != "null"]
        inner = _avro_decoder(branches[0]) if len(branches) == 1 else None
        if inner is None:
            return None
        return lambda v: None if v is None else inner(v)
    kind = avro["type"]
    lt = avro.get("logicalType")
    if lt == "decimal" and kind in ("bytes", "fixed"):
        scale = avro.get("scale", 0)
        return lambda v: None if v is None else _bytes_to_dec(v, scale)
    if lt == "date" and kind == "int":
        return lambda v: None if v is None else _EPOCH_DATE + _dt.timedelta(days=v)
    if lt == "timestamp-micros" and kind == "long":
        return lambda v: None if v is None else _EPOCH_DT + _dt.timedelta(microseconds=v)
    if lt == "timestamp-millis" and kind == "long":
        return lambda v: None if v is None else _EPOCH_DT + _dt.timedelta(milliseconds=v)
    if kind == "record":
        decs = {f["name"]: _avro_decoder(f["type"]) for f in avro["fields"]}
        if all(d is None for d in decs.values()):
            return None
        return lambda v: None if v is None else {
            k: (decs[k](x) if decs[k] else x) for k, x in v.items()
        }
    if kind == "array":
        inner = _avro_decoder(avro["items"])
        if inner is None:
            return None
        return lambda v: None if v is None else [inner(x) for x in v]
    if kind == "map":
        inner = _avro_decoder(avro["values"])
        if inner is None:
            return None
        return lambda v: None if v is None else {k: inner(x) for k, x in v.items()}
    return None


def write_avro_ocf(
    df: DataFrame, directory: str, codec: str = "deflate", block_rows: int = 1000,
) -> list[str]:
    """Write ``df`` as ``directory/part-NNNNN.avro`` (one OCF file per
    partition; empty partitions write nothing).  Returns the written file
    paths.  The schema is derived from ``df.schema`` — unsupported types
    raise HERE, at plan time, not per-row in executors.

    Distribution contract: executors write with plain ``open()``, so
    ``directory`` must be a SHARED filesystem (NFS/FUSE-mounted object
    store) for the collected paths to be readable from the driver on a
    multi-node cluster — on local mode any path works.  For native object
    stores, swap the ``open()`` in ``write_part`` for the store's client;
    the encode stream (avro/ocf.iter_encode_ocf) is already chunked for
    multipart puts.  Each executor makedirs its own target so the write
    doesn't depend on the driver's mkdir having raced ahead on a shared
    mount."""
    schema = avro_schema_of(df.schema, name="row")
    schema_json = json.dumps(schema)
    os.makedirs(directory, exist_ok=True)
    cols = df.columns
    encs = {f.name: _spark_encoder(f.dataType) for f in df.schema.fields}

    def write_part(idx: int, rows: Iterator[Any]) -> Iterator[str]:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        import itertools

        os.makedirs(directory, exist_ok=True)  # per-executor, see docstring
        path = os.path.join(directory, f"part-{idx:05d}.avro")
        plain = (
            {c: encs[c](r[c]) for c in cols}
            for r in itertools.chain([first], it)
        )
        # stream chunk-by-chunk: peak memory is one ~block_rows block,
        # never the whole partition's file (avro/ocf.iter_encode_ocf)
        with open(path, "wb") as fh:
            for chunk in iter_encode_ocf(
                plain, schema_json, codec=codec, block_rows=block_rows
            ):
                fh.write(chunk)
        yield path

    return sorted(df.rdd.mapPartitionsWithIndex(write_part).collect())


#: binaryFile's fixed schema — needed explicitly for the STREAMING reader
#: (file-source streams require a declared schema)
_BINARYFILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("modificationTime", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def read_avro_ocf(
    spark: SparkSession,
    path: str,
    spark_schema: T.StructType | str | None = None,
    reader_schema: str | dict | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Read OCF files distributed (one task per file via ``binaryFile``).
    If ``spark_schema`` is omitted it is inferred from the FIRST file's
    embedded writer schema — a driver-side peek at one file, not a scan.

    ``reader_schema`` enables SCHEMA EVOLUTION (the 100 TB-lake read
    path): every file is decoded through spec schema resolution against
    its own embedded writer schema — added fields filled from defaults,
    dropped fields skipped, renames matched via reader aliases, numerics
    promoted — so files written over years under different schemas land
    in ONE DataFrame shape (avro/resolve.py).  The Spark schema then
    derives from the reader schema.

    ``streaming=True`` returns a STREAMING DataFrame (file-source over
    ``binaryFile``): each newly-arrived OCF file becomes one task's
    micro-batch work — pair with ``reader_schema`` so late-arriving
    old-generation files still land in the current shape.  Schema
    inference from a first file is unavailable in streaming (no file
    need exist yet); pass ``spark_schema`` or ``reader_schema``."""
    if streaming:
        files = (
            spark.readStream.format("binaryFile")
            .schema(_BINARYFILE_SCHEMA)
            .load(path)
        )
        if spark_schema is None and reader_schema is None:
            raise ValueError(
                "streaming OCF read needs spark_schema or reader_schema "
                "(no file is guaranteed to exist for inference)"
            )
    else:
        files = spark.read.format("binaryFile").load(path)
    if spark_schema is None:
        if reader_schema is not None:
            avro = (
                json.loads(reader_schema)
                if isinstance(reader_schema, str)
                else reader_schema
            )
        else:
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

    # with a reader schema, resolution normalizes EVERY file to it, so
    # the logical converters are invariant — build them once, not per file
    fixed_decs = None
    if reader_schema is not None:
        rs_obj = (
            json.loads(reader_schema) if isinstance(reader_schema, str) else reader_schema
        )
        fdecs = {f["name"]: _avro_decoder(f["type"]) for f in rs_obj.get("fields", [])}
        fixed_decs = [fdecs.get(c) for c in field_names]

    def decode_files(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                data = bytes(blob)
                if fixed_decs is not None:
                    decs = fixed_decs
                else:
                    # converters come from each FILE's embedded writer
                    # schema (so e.g. a timestamp-millis file still reads
                    # correctly into a TimestampType column)
                    sj, _, _, _ = decode_ocf_header(data)
                    fdecs = {
                        f["name"]: _avro_decoder(f["type"])
                        for f in json.loads(sj).get("fields", [])
                    }
                    decs = [fdecs.get(c) for c in field_names]
                for block in iter_ocf_blocks(data, reader_schema=reader_schema):
                    yield pd.DataFrame(
                        [
                            [
                                (d(row.get(c)) if d else row.get(c))
                                for c, d in zip(field_names, decs)
                            ]
                            for row in block
                        ],
                        columns=field_names,
                    )

    return files.select("content").mapInPandas(decode_files, schema=spark_schema)
