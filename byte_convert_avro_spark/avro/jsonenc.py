"""Avro-JSON encoding — public Avro spec, "JSON Encoding".

The reference re-encodes decoded datums with Avro's ``JsonEncoder``
(AvroTransform.java:246, ``pretty=false``); behavioral pins:

- unions (non-null) wrap as ``{"branch_label": value}`` where the label is
  the primitive name or the named type's fullname;
- ``bytes``/``fixed`` values are JSON strings in ISO-8859-1 (latin-1);
- record fields appear in schema order;
- compact output (no spaces).

The golden envelope (TransformTest.java:508) pins this byte-for-byte for the
``FullName`` record.
"""

from __future__ import annotations

import json
import math
from typing import Any

from byte_convert_avro_spark.avro.binary import _UnionValue
from byte_convert_avro_spark.avro.schema import AvroSchema


def to_avro_json(value: Any, schema: AvroSchema | None = None) -> Any:
    """Decoded datum -> JSON-ready Python object under Avro-JSON rules."""
    if isinstance(value, _UnionValue):
        return {value.label: to_avro_json(value.value, value.schema)}
    if value is None or isinstance(value, (bool, int, str)):
        return value
    if isinstance(value, float):
        # Avro JsonEncoder emits numbers; NaN/Inf become strings in Jackson's
        # non-strict mode — emit the Java literals for parity.
        if math.isnan(value):
            return "NaN"
        if math.isinf(value):
            return "Infinity" if value > 0 else "-Infinity"
        return value
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).decode("latin-1")
    if isinstance(value, dict):
        return {k: to_avro_json(v) for k, v in value.items()}
    if isinstance(value, list):
        return [to_avro_json(v) for v in value]
    raise TypeError(f"cannot Avro-JSON encode {type(value)}")


def avro_json_dumps(value: Any, schema: AvroSchema | None = None) -> str:
    """Compact Avro-JSON text (non-pretty, like JsonEncoder with pretty=false)."""
    return json.dumps(to_avro_json(value, schema), separators=(",", ":"), ensure_ascii=False)


# ---------------------------------------------------------------------------
# Compiled per-schema JSON writer: fuses the to_avro_json tree walk and
# json.dumps into one schema-driven pass (same output bytes).  The decode
# UDF holds one compiled writer per schema id, next to the compiled binary
# reader — the Avro-JSON rules above remain the specification; the golden
# envelope and the writer-vs-dumps property test pin equality.

from json.encoder import encode_basestring as _esc


def _write_float(v: float) -> str:
    if v != v:
        return '"NaN"'
    if v == math.inf:
        return '"Infinity"'
    if v == -math.inf:
        return '"-Infinity"'
    return repr(v)  # identical to json.dumps float formatting


_PRIMITIVE_WRITERS = {
    "null": lambda v: "null",
    "boolean": lambda v: "true" if v else "false",
    "int": str,
    "long": str,
    "float": _write_float,
    "double": _write_float,
    "string": _esc,
    "bytes": lambda v: _esc(bytes(v).decode("latin-1")),
}


def compile_json_writer(schema: AvroSchema, memo: dict | None = None):
    """-> fn(decoded_value) -> compact Avro-JSON text (ensure_ascii=False
    parity: only control chars, quotes and backslashes escaped)."""
    if memo is None:
        memo = {}
    s = schema
    k = s.kind
    if k == "primitive":
        return _PRIMITIVE_WRITERS[s.name]
    if k in ("bytes", "fixed"):
        return lambda v: _esc(bytes(v).decode("latin-1"))
    if k == "enum":
        return _esc
    if k == "record":
        field_parts: list[tuple[str, Any]] = []

        def write_record(v: dict) -> str:
            return "{" + ",".join(
                pre + wr(v[name]) for name, pre, wr in field_parts
            ) + "}"

        memo[id(s)] = write_record
        for f in s.fields or []:
            field_parts.append(
                (f.name, _esc(f.name) + ":", _compile_jw(f.type, memo))
            )
        return write_record
    if k == "array":
        item = _compile_jw(s.items, memo)
        return lambda v: "[" + ",".join(item(x) for x in v) + "]"
    if k == "map":
        val = _compile_jw(s.values, memo)
        return lambda v: "{" + ",".join(
            _esc(key) + ":" + val(x) for key, x in v.items()
        ) + "}"
    if k == "union":
        by_label = {b.union_label: _compile_jw(b, memo) for b in s.fields or []}

        def write_union(v: Any) -> str:
            if v is None:
                return "null"
            return "{" + _esc(v.label) + ":" + by_label[v.label](v.value) + "}"

        return write_union
    raise ValueError(f"cannot compile JSON writer for kind {k!r}")


def _compile_jw(schema: AvroSchema, memo: dict):
    # recursive records resolve via the memo entry compile_json_writer
    # seeds BEFORE compiling its fields
    hit = memo.get(id(schema))
    if hit is not None:
        return hit
    return compile_json_writer(schema, memo)
