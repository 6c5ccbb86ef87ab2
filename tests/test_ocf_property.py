"""Property-based tests (hypothesis) for OCF framing and schema
resolution: random rows through a nested schema must survive the full
container roundtrip byte-for-value, at every block size; and the
resolving reader must equal plain-decode + a pure-python transform on
arbitrary writer rows — an INDEPENDENT model of the spec rules.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from byte_convert_avro_spark.avro.binary import schemaless_encode
from byte_convert_avro_spark.avro.ocf import decode_ocf, encode_ocf, iter_ocf_blocks
from byte_convert_avro_spark.avro.resolve import compile_resolving_reader

NESTED_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "meta",
            "type": {
                "type": "record",
                "name": "Meta",
                "fields": [
                    {"name": "flag", "type": "boolean"},
                    {"name": "blob", "type": "bytes"},
                ],
            },
        },
    ],
}

_text = st.text(max_size=12)
_row = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": _text,
        "score": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        "tags": st.lists(_text, max_size=4),
        "props": st.dictionaries(_text, st.integers(-(2**31), 2**31), max_size=3),
        "meta": st.fixed_dictionaries(
            {"flag": st.booleans(), "blob": st.binary(max_size=16)}
        ),
    }
)


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_row, max_size=25), block_rows=st.integers(1, 7), codec=st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip_property(rows, block_rows, codec):
    blob = encode_ocf(rows, NESTED_SCHEMA, codec=codec, block_rows=block_rows)
    schema_json, back = decode_ocf(blob)
    assert back == rows
    # block framing: sizes partition the rows in order
    sizes = [len(b) for b in iter_ocf_blocks(blob)]
    assert sum(sizes) == len(rows)
    assert all(s == block_rows for s in sizes[:-1])


V1 = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "dropped", "type": "string"},
        {"name": "kept", "type": ["null", "float"]},
    ],
}
V2 = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "kept", "type": ["null", "double"]},
        {"name": "added", "type": "string", "default": "d"},
    ],
}


def _model_resolve(row: dict) -> dict:
    """Pure-python model of V1 -> V2 resolution (independent of
    resolve.py's closure tree)."""
    return {
        "id": row["id"],
        "kept": None if row["kept"] is None else float(row["kept"]),
        "added": "d",
    }


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(-(2**31), 2**31 - 1),
                "dropped": st.text(max_size=8),
                "kept": st.one_of(st.none(), st.floats(allow_nan=False, width=32)),
            }
        ),
        max_size=10,
    )
)
def test_resolution_matches_model(rows):
    rd = compile_resolving_reader(V1, V2)
    for row in rows:
        payload = schemaless_encode(row, V1)
        v, pos = rd(memoryview(payload), 0)
        assert pos == len(payload)
        got = {
            k: (x.value if hasattr(x, "value") else x) for k, x in v.items()
        }
        assert got == _model_resolve(row)
