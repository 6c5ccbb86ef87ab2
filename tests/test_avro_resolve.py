"""Avro schema resolution (reader vs writer evolution) — pinned against
the public spec rules (avro.apache.org/docs/current/specification/
#schema-resolution): promotions, reader aliases, defaults,
skip-and-discard, enum fallback, union re-matching — and the Spark-level
payoff: a directory of MIXED-generation OCF files read as one DataFrame
under the current reader schema.
"""

from __future__ import annotations

import pytest

from byte_convert_avro_spark.avro.binary import schemaless_encode
from byte_convert_avro_spark.avro.resolve import (
    SchemaResolutionError,
    compile_resolving_reader,
)

V1 = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "old", "type": "string"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "float"]},
    ],
}
V2 = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "full_name", "type": "string", "aliases": ["name"]},
        {"name": "score", "type": ["null", "double"]},
        {"name": "added", "type": "string", "default": "zz"},
    ],
}


def _decode(rd, payload):
    v, pos = rd(memoryview(payload), 0)
    assert pos == len(payload)

    def plain(x):
        if hasattr(x, "value"):
            return plain(x.value)
        if isinstance(x, dict):
            return {k: plain(y) for k, y in x.items()}
        return x

    return plain(v)


def test_record_evolution_full_matrix():
    """One resolution covering: int->long promotion, rename via reader
    alias, dropped-field skip, union float->double, reader default."""
    rd = compile_resolving_reader(V1, V2)
    row = {"id": 7, "old": "x", "name": "alice", "score": 1.5}
    assert _decode(rd, schemaless_encode(row, V1)) == {
        "id": 7,
        "full_name": "alice",
        "score": 1.5,
        "added": "zz",
    }
    row2 = {"id": 8, "old": "y", "name": "bob", "score": None}
    assert _decode(rd, schemaless_encode(row2, V1))["score"] is None


@pytest.mark.parametrize(
    "w,r,val,want",
    [
        ("int", "long", 5, 5),
        ("int", "double", 7, 7.0),
        ("long", "float", 9, 9.0),
        ("float", "double", 1.5, 1.5),
        ("string", "bytes", "hi", b"hi"),
        ("bytes", "string", b"hi", "hi"),
    ],
)
def test_primitive_promotions(w, r, val, want):
    rd = compile_resolving_reader(w, r)
    got = _decode(rd, schemaless_encode(val, w))
    assert got == want and type(got) is type(want)


def test_illegal_promotion_raises():
    with pytest.raises(SchemaResolutionError, match="promote"):
        compile_resolving_reader("double", "int")
    with pytest.raises(SchemaResolutionError, match="no default"):
        compile_resolving_reader(
            V1, {"type": "record", "name": "R", "fields": [{"name": "nope", "type": "int"}]}
        )


def test_enum_symbol_fallback_and_error():
    we = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
    re_def = {"type": "enum", "name": "E", "symbols": ["A", "B"], "default": "A"}
    rd = compile_resolving_reader(we, re_def)
    assert _decode(rd, schemaless_encode("C", we)) == "A"
    assert _decode(rd, schemaless_encode("B", we)) == "B"

    re_nodef = {"type": "enum", "name": "E", "symbols": ["A", "B"]}
    rd2 = compile_resolving_reader(we, re_nodef)
    with pytest.raises(SchemaResolutionError, match="absent"):
        _decode(rd2, schemaless_encode("C", we))


def test_union_rematch_and_scalar_paths():
    # writer union -> reader union with different branch order/width
    rd = compile_resolving_reader(["null", "int"], ["null", "long", "string"])
    assert _decode(rd, schemaless_encode(5, ["null", "int"])) == 5
    assert _decode(rd, schemaless_encode(None, ["null", "int"])) is None
    # writer scalar -> reader union
    rd2 = compile_resolving_reader("int", ["null", "long"])
    assert _decode(rd2, schemaless_encode(3, "int")) == 3
    # writer union -> reader scalar: ok branch decodes, bad branch raises
    rd3 = compile_resolving_reader(["null", "int"], "long")
    assert _decode(rd3, schemaless_encode(4, ["null", "int"])) == 4
    with pytest.raises(SchemaResolutionError, match="branch"):
        _decode(rd3, schemaless_encode(None, ["null", "int"]))


def test_nested_array_of_records_evolves():
    w = {
        "type": "array",
        "items": {
            "type": "record",
            "name": "P",
            "fields": [{"name": "a", "type": "int"}, {"name": "b", "type": "string"}],
        },
    }
    r = {
        "type": "array",
        "items": {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "c", "type": "int", "default": -1},
            ],
        },
    }
    rd = compile_resolving_reader(w, r)
    got = _decode(rd, schemaless_encode([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}], w))
    assert got == [{"a": 1, "c": -1}, {"a": 2, "c": -1}]


# ---------------------------------------------------------------------------
# the Spark payoff: mixed-generation files, one reader schema
# ---------------------------------------------------------------------------
def test_spark_reads_mixed_generations_under_reader_schema(spark, tmp_path):
    import json

    from byte_convert_avro_spark.avro.ocf import encode_ocf
    from byte_convert_avro_spark.sources.avro_ocf import read_avro_ocf

    d = tmp_path / "lake"
    d.mkdir()
    # generation 1: v1 schema
    v1_rows = [{"id": i, "old": "x", "name": f"u{i}", "score": None} for i in range(5)]
    (d / "gen1.avro").write_bytes(encode_ocf(v1_rows, V1, codec="deflate"))
    # generation 2: v2 schema (the current one)
    v2_rows = [
        {"id": 100 + i, "full_name": f"v{i}", "score": float(i), "added": "n"}
        for i in range(3)
    ]
    (d / "gen2.avro").write_bytes(encode_ocf(v2_rows, V2, codec="deflate"))

    df = read_avro_ocf(spark, str(d) + "/*.avro", reader_schema=json.dumps(V2))
    assert df.schema.simpleString() == (
        "struct<id:bigint,full_name:string,score:double,added:string>"
    )
    rows = {r.id: (r.full_name, r.score, r.added) for r in df.collect()}
    assert len(rows) == 8
    assert rows[0] == ("u0", None, "zz")       # v1 file: renamed + default
    assert rows[102] == ("v2", 2.0, "n")       # v2 file: native


def test_failed_branch_probe_does_not_poison_memo():
    """A union branch probe that REJECTS a (writer, reader) record pair
    must not leave a partial resolver in the memo: resolving the same
    pair again (e.g. for a direct field) must still RAISE, not silently
    mis-decode with incomplete steps."""
    inner_w = {"type": "record", "name": "Inner", "fields": [{"name": "a", "type": "int"}]}
    # incompatible: reader field 'zz' missing from writer, no default
    inner_r = {"type": "record", "name": "Inner", "fields": [{"name": "zz", "type": "int"}]}
    w = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "x", "type": [inner_w, "int"]},
            {"name": "y", "type": "Inner"},
        ],
    }
    r = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "x", "type": [inner_r, "int"]},
            {"name": "y", "type": "Inner"},
        ],
    }
    # field x's union probe tries (Inner_w -> Inner_r) and rejects it;
    # field y then needs the SAME pair directly -> whole compile raises
    with pytest.raises(SchemaResolutionError):
        compile_resolving_reader(w, r)


def test_nested_default_values_convert_recursively():
    """bytes/float leaves inside a record-typed reader default must
    convert (latin-1 / float), matching rows decoded from newer files."""
    w = {"type": "record", "name": "R", "fields": [{"name": "id", "type": "int"}]}
    r = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "int"},
            {
                "name": "meta",
                "type": {
                    "type": "record",
                    "name": "M",
                    "fields": [
                        {"name": "sig", "type": "bytes"},
                        {"name": "w", "type": "float"},
                    ],
                },
                "default": {"sig": "\u00ff\u0001", "w": 1},
            },
            {
                "name": "tags",
                "type": {"type": "array", "items": "bytes"},
                "default": ["\u0000"],
            },
        ],
    }
    rd = compile_resolving_reader(w, r)
    got = _decode(rd, schemaless_encode({"id": 1}, w))
    assert got["meta"] == {"sig": b"\xff\x01", "w": 1.0}
    assert isinstance(got["meta"]["w"], float)
    assert got["tags"] == [b"\x00"]


def test_failed_record_evicts_sub_records_memoized_during_attempt():
    """ADVICE round-6 regression: when record A's resolution fails AFTER
    a mutually-recursive sub-record B was memoized (probed through a
    union), B's memo entry holds a late-bound reference to A's evicted
    key.  The entry must be evicted too: a later writer-B/reader-B match
    in the same compile must recompile cleanly and decode, not return a
    reader that dies at decode time with a raw KeyError."""
    # writer: union [A, B]; A and B mutually recursive via B.a: [null, A]
    w = [
        {
            "type": "record",
            "name": "A",
            "fields": [
                {
                    "name": "b",
                    "type": {
                        "type": "record",
                        "name": "B",
                        "fields": [{"name": "a", "type": ["null", "A"]}],
                    },
                },
                {"name": "x", "type": "int"},
            ],
        },
        "B",
    ]
    # reader: A drops x WITHOUT default -> A's resolution fails after B
    # was memoized; branch B itself is fine
    r = [
        {
            "type": "record",
            "name": "A",
            "fields": [
                {
                    "name": "b",
                    "type": {
                        "type": "record",
                        "name": "B",
                        "fields": [{"name": "a", "type": ["null", "A"]}],
                    },
                },
                {"name": "x2", "type": "int"},
            ],
        },
        "B",
    ]
    rd = compile_resolving_reader(w, r)
    # encode writer-union branch 1 (B) with a = null
    payload = schemaless_encode({"a": None}, {
        "type": "record",
        "name": "B",
        "fields": [{"name": "a", "type": ["null", {
            "type": "record",
            "name": "A",
            "fields": [
                {"name": "b", "type": "B"},
                {"name": "x", "type": "int"},
            ],
        }]}],
    })
    from byte_convert_avro_spark.avro.binary import _write_long

    prefix = bytearray()
    _write_long(prefix, 1)  # union index 1 = branch B
    buf = bytes(prefix) + payload
    v = _decode(rd, buf)
    assert v == {"a": None}


def test_names_match_requires_fullname_or_alias():
    """Spec matching: same short name in DIFFERENT namespaces must NOT
    resolve; an unqualified reader alias qualifies against the reader's
    namespace and matches the writer's fullname."""
    w = {
        "type": "record", "name": "Point", "namespace": "a",
        "fields": [{"name": "x", "type": "int"}],
    }
    r_other_ns = {
        "type": "record", "name": "Point", "namespace": "b",
        "fields": [{"name": "x", "type": "int"}],
    }
    with pytest.raises(SchemaResolutionError, match="names do not match"):
        compile_resolving_reader(w, r_other_ns)
    # unqualified alias 'Point' in reader namespace 'a' -> matches a.Point
    r_aliased = {
        "type": "record", "name": "Pt", "namespace": "a",
        "aliases": ["Point"],
        "fields": [{"name": "x", "type": "int"}],
    }
    rd = compile_resolving_reader(w, r_aliased)
    assert _decode(rd, schemaless_encode({"x": 7}, w)) == {"x": 7}
