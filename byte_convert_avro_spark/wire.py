"""Confluent wire-format column expressions — native, codegen'd Catalyst
expressions (no Python in this module's hot path).

Wire layout (reference AvroTransform.java:57-60,181-185; fixture encoder
TransformTest.java:114-131):

    byte 0      0x00 magic
    bytes 1-4   schema id, int32 big-endian
    bytes 5..   Avro binary body (schemaless)

Operators covered: O8 (length validation), O9 (magic byte), O10 (schema-id
extraction), O12 (prefix strip).  All are pure column expressions so Catalyst
folds them into whole-stage codegen and pushes eligible predicates to the
source.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAGIC_BYTE = 0
WIRE_PREFIX_LEN = 5  # 1 magic + 4 id (test constant AVRO_CONTENT_OFFSET = 1+4, TransformTest.java:60)


def has_min_length(col: Column) -> Column:
    """O8: payload must exceed 5 bytes (AvroTransform.java:139,174)."""
    return F.length(col) > WIRE_PREFIX_LEN


def has_magic_byte(col: Column) -> Column:
    """O9: first byte must be 0x00 (AvroTransform.java:57,181,275-277)."""
    return F.substring(col, 1, 1) == F.lit(bytes([MAGIC_BYTE]))


def is_valid_wire(col: Column) -> Column:
    """Combined wire-format gate: non-null, length, magic."""
    return col.isNotNull() & has_min_length(col) & has_magic_byte(col)


def schema_id(col: Column) -> Column:
    """O10: bytes 2-5 as big-endian int32 (AvroTransform.java:182,257).

    ``conv(hex(...), 16, 10)`` stays JVM-side and yields the unsigned
    value; the explicit two's-complement fold makes high-bit ids wrap to
    Java's signed int (a bare long->int cast would throw under ANSI mode
    instead of wrapping).
    """
    unsigned = F.conv(F.hex(F.substring(col, 2, 4)), 16, 10).cast("long")
    signed = F.when(unsigned >= 2**31, unsigned - 2**32).otherwise(unsigned)
    return signed.cast("int").alias("schema_id")


def body(col: Column) -> Column:
    """O12: strip the 5-byte prefix (AvroTransform.java:184-185)."""
    return F.substring(col, F.lit(WIRE_PREFIX_LEN + 1), F.length(col) - WIRE_PREFIX_LEN)


def encode_wire(schema_id_: int, avro_body: bytes) -> bytes:
    """Driver/test-side fixture builder (mirror of encodeAvroObject,
    TransformTest.java:114-131): magic + 4-byte BE id + body."""
    return bytes([MAGIC_BYTE]) + schema_id_.to_bytes(4, "big", signed=True) + avro_body
