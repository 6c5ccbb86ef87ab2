"""Unit tests for the pure-Python Avro codec (no Spark needed).

Mirrors the reference's test schemas (TransformTest.java:61-73) and the
golden envelope pin (TransformTest.java:508) — see FIXTURES.md.
"""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from byte_convert_avro_spark.avro import (
    avro_json_dumps,
    parse_schema,
    schemaless_decode,
    schemaless_encode,
)

FULLNAME_SCHEMA = (
    '{"type":"record","name":"FullName",'
    '"namespace":"com.ing.eventbus.connect.schema.converters",'
    '"fields":[{"name":"first","type":"string"},{"name":"last","type":"string"}]}'
)


def test_canonical_str_roundtrips_golden_schema():
    assert parse_schema(FULLNAME_SCHEMA).canonical_str() == FULLNAME_SCHEMA


@pytest.mark.parametrize(
    "schema,value",
    [
        ('"int"', 42),
        ('"int"', -1),
        ('"long"', 2**62),
        ('"string"', "héllo wörld"),
        ('"boolean"', True),
        ('"boolean"', False),
        ('"double"', 3.14159),
        ('"float"', 1.5),
        ('"bytes"', b"\x00\x01\xff"),
        ('"null"', None),
    ],
)
def test_primitive_roundtrip(schema, value):
    assert schemaless_decode(schemaless_encode(value, schema), schema) == value


def test_record_roundtrip_preserves_field_order():
    v = {"first": "fname", "last": "lname"}
    out = schemaless_decode(schemaless_encode(v, FULLNAME_SCHEMA), FULLNAME_SCHEMA)
    assert list(out) == ["first", "last"]
    assert out == v


COMPLEX = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "a", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
        {"name": "u", "type": ["null", "string", "int"]},
        {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["X", "Y"]}},
        {"name": "f", "type": {"type": "fixed", "name": "Fx", "size": 3}},
        {"name": "nested", "type": ["null", "R"], "default": None},
    ],
}


def test_complex_roundtrip_with_recursion():
    v = {
        "a": [1, -2, 3],
        "m": {"k": 1.5},
        "u": None,
        "e": "Y",
        "f": b"abc",
        "nested": {"a": [], "m": {}, "u": None, "e": "X", "f": b"xyz", "nested": None},
    }
    enc = schemaless_encode(v, COMPLEX)
    dec = schemaless_decode(enc, COMPLEX)
    assert dec["a"] == [1, -2, 3]
    # non-null union values decode to a branch-labelled wrapper (Avro-JSON
    # needs the branch name for {"branch": value} wrapping)
    nested = dec["nested"].value
    assert dec["nested"].label == "R"
    assert nested["f"] == b"xyz"
    assert nested["nested"] is None


def test_union_json_wrapping():
    """Avro-JSON wraps non-null union values as {"branch": value}."""
    schema = '["null","string","int"]'
    assert avro_json_dumps(schemaless_decode(schemaless_encode("x", schema), schema)) == '{"string":"x"}'
    assert avro_json_dumps(schemaless_decode(schemaless_encode(7, schema), schema)) == '{"int":7}'
    assert avro_json_dumps(schemaless_decode(schemaless_encode(None, schema), schema)) == "null"


def test_bytes_json_latin1():
    schema = '"bytes"'
    out = avro_json_dumps(schemaless_decode(schemaless_encode(b"\x00\xff", schema), schema))
    assert json.loads(out) == "\x00\xff"


def test_nan_infinity_json():
    schema = '"double"'
    assert avro_json_dumps(schemaless_decode(schemaless_encode(math.nan, schema), schema)) == '"NaN"'
    assert avro_json_dumps(schemaless_decode(schemaless_encode(math.inf, schema), schema)) == '"Infinity"'


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_long_roundtrip(v):
    assert schemaless_decode(schemaless_encode(v, '"long"'), '"long"') == v


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_string_roundtrip(v):
    assert schemaless_decode(schemaless_encode(v, '"string"'), '"string"') == v


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=50))
def test_int_array_roundtrip(v):
    s = '{"type":"array","items":"int"}'
    assert schemaless_decode(schemaless_encode(v, s), s) == v


def test_aliased_schema_parses():
    """Aliased variant (TransformTest.java:69-73)."""
    s = parse_schema(
        json.dumps(
            {
                "type": "record",
                "name": "FullName",
                "namespace": "com.ing.eventbus.connect.schema.converters",
                "fields": [
                    {"name": "first", "type": "string"},
                    {"name": "surname", "type": "string", "aliases": ["last"]},
                ],
            }
        )
    )
    assert s.fields[1].aliases == ["last"]
    assert '"aliases":["last"]' in s.canonical_str()
