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
