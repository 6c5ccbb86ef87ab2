"""Plan-time selection of the native ``from_avro`` decode path (native.py).

The container has no spark-avro jar, so the selection must resolve to the
UDF path here; the probe is mocked to exercise the native branch's gates,
and the end-to-end byte-parity test is skipif-gated on real availability
(it runs on any cluster with the jar on the classpath).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from byte_convert_avro_spark import native
from byte_convert_avro_spark.avro import schemaless_encode
from byte_convert_avro_spark.native import (
    decode_records_auto,
    json_parity_safe,
    native_avro_available,
)
from byte_convert_avro_spark.schema_store import LocalSchemaStore
from byte_convert_avro_spark.wire import encode_wire

SAFE_SCHEMA = (
    '{"type":"record","name":"Ev","fields":['
    '{"name":"id","type":"long"},{"name":"who","type":"string"},'
    '{"name":"ok","type":"boolean"},'
    '{"name":"tags","type":{"type":"array","items":"string"}}]}'
)
UNSAFE_SCHEMA = (
    '{"type":"record","name":"M","fields":[{"name":"x","type":"double"}]}'
)

REC = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
    ]
)


# -- parity-subset gate (pure) ---------------------------------------------


@pytest.mark.parametrize(
    "schema,ok",
    [
        (SAFE_SCHEMA, True),
        ('{"type":"record","name":"N","fields":[{"name":"a","type":"int"}]}', True),
        # nested record of safe primitives + enum
        (
            '{"type":"record","name":"O","fields":[{"name":"in","type":'
            '{"type":"record","name":"I","fields":[{"name":"e","type":'
            '{"type":"enum","name":"E","symbols":["A","B"]}}]}}]}',
            True,
        ),
        (UNSAFE_SCHEMA, False),  # double: repr vs Jackson formatting
        ('{"type":"record","name":"B","fields":[{"name":"b","type":"bytes"}]}', False),
        ('{"type":"record","name":"U","fields":[{"name":"u","type":["null","string"]}]}', False),
        ('{"type":"record","name":"Mp","fields":[{"name":"m","type":{"type":"map","values":"long"}}]}', False),
        ('"int"', False),  # non-record top level
        # recursive record: no static struct type
        ('{"type":"record","name":"R","fields":[{"name":"n","type":["null","R"]}]}', False),
    ],
)
def test_json_parity_safe(schema, ok):
    assert json_parity_safe(schema) is ok


# -- selection logic --------------------------------------------------------


def _store():
    s = LocalSchemaStore()
    s.register(SAFE_SCHEMA, 1)
    s.register(UNSAFE_SCHEMA, 2)
    return s


def _has_python_stage(df) -> bool:
    from byte_convert_avro_spark.plans.inspect import explain_str

    plan = explain_str(df, "simple")
    return "EvalPython" in plan or "pythonUDF" in plan


def _df(spark):
    payload = encode_wire(1, schemaless_encode({"id": 1, "who": "a", "ok": True, "tags": []}, SAFE_SCHEMA))
    return spark.createDataFrame([("t", None, payload)], REC)


def test_no_jar_selects_udf_path(spark):
    df = decode_records_auto(_df(spark), _store(), {"t": False}, {"t": 1}, _available=False)
    assert _has_python_stage(df)
    assert df.columns == ["topic", "key", "value", "_error"]


def test_unsafe_schema_falls_back_to_udf(spark):
    df = decode_records_auto(
        _df(spark), _store(), {"t": False}, {"t": 2}, _available=True
    )
    assert _has_python_stage(df)


def test_key_decode_falls_back_to_udf(spark):
    df = decode_records_auto(
        _df(spark), _store(), {"t": True}, {"t": 1}, _available=True
    )
    assert _has_python_stage(df)


def test_multi_schema_topic_falls_back_to_udf(spark):
    """A topic missing from single_schema_ids means 'not single-schema'."""
    df = decode_records_auto(
        _df(spark), _store(), {"t": False, "u": False}, {"t": 1}, _available=True
    )
    assert _has_python_stage(df)


def test_native_plan_is_pure_codegen(spark, monkeypatch):
    """The native branch's plan has ZERO Python stages.  The jar is absent
    here, so the from_avro leaf is stubbed with a JVM-side placeholder —
    everything around it (wire gates, envelope struct, error routing) is
    the real plan under test."""
    monkeypatch.setattr(
        native,
        "native_value_envelope",
        lambda value, text, sid, mode: F.lit('{"stub":1}'),
    )
    df = decode_records_auto(
        _df(spark), _store(), {"t": False}, {"t": 1}, _available=True
    )
    assert not _has_python_stage(df)
    assert df.columns == ["topic", "key", "value", "_error"]
    [row] = df.collect()
    assert bytes(row.value) == b'{"stub":1}' and row._error is None


def test_native_plan_wire_gate_sets_error(spark, monkeypatch):
    """Invalid wire / wrong schema id degrades to _error + passthrough
    (PERMISSIVE), never silent corruption — the per-row insurance behind
    the caller's single-schema assertion."""
    monkeypatch.setattr(
        native,
        "native_value_envelope",
        lambda value, text, sid, mode: F.lit('{"stub":1}'),
    )
    bad_id = encode_wire(99, b"\x02")  # well-formed wire, unexpected id
    not_wire = b"\x01234567"  # bad magic
    df0 = _df(spark).sparkSession.createDataFrame(
        [("t", None, bad_id), ("t", None, not_wire), ("t", None, None)], REC
    )
    out = decode_records_auto(df0, _store(), {"t": False}, {"t": 1}, _available=True)
    rows = out.collect()
    assert all(r._error is not None for r in rows[:2])
    assert bytes(rows[0].value) == bad_id and bytes(rows[1].value) == not_wire
    assert rows[2].value is None and rows[2]._error is None  # tombstone


@pytest.mark.skipif(
    "not config.getoption('--run-native-avro', default=False)",
    reason="needs the spark-avro jar on the classpath",
)
def test_native_envelope_byte_parity_with_udf_path(spark):
    """On a cluster with spark-avro: the native envelope must be
    byte-identical to the UDF path for parity-subset schemas."""
    if not native_avro_available(spark):
        pytest.skip("spark-avro jar not present")
    store = _store()
    df = _df(spark)
    a = decode_records_auto(df, store, {"t": False}, {"t": 1}, _available=True).collect()
    b = decode_records_auto(df, store, {"t": False}, _available=False).collect()
    assert bytes(a[0].value) == bytes(b[0].value)


def test_probe_consulted_when_available_not_forced(spark, monkeypatch):
    """decode_records_auto with _available=None must consult the classpath
    probe — both directions: probe True + qualifying topics selects the
    native branch (envelope stubbed; no jar here), probe False selects
    the UDF path."""
    monkeypatch.setattr(
        native, "native_value_envelope", lambda *a, **k: F.lit('{"stub":1}')
    )
    monkeypatch.setattr(native, "native_avro_available", lambda s: True)
    df = decode_records_auto(_df(spark), _store(), {"t": False}, {"t": 1})
    assert not _has_python_stage(df)
    monkeypatch.setattr(native, "native_avro_available", lambda s: False)
    df = decode_records_auto(_df(spark), _store(), {"t": False}, {"t": 1})
    assert _has_python_stage(df)


def _lit_of(value, schema):
    """Literal Column tree for a decoded datum — the simulated from_avro
    output: same struct shape Spark's reader would produce."""
    if schema.kind == "record":
        return F.struct(
            *[_lit_of(value[f.name], f.type).alias(f.name) for f in schema.fields]
        )
    if schema.kind == "array":
        return F.array(*[_lit_of(x, schema.items) for x in value])
    if schema.kind == "primitive" and schema.name == "long":
        return F.lit(value).cast("long")
    return F.lit(value)  # int/boolean/string/enum symbol


def test_simulated_from_avro_envelope_byte_parity_with_udf_path(spark, monkeypatch):
    """The tightened jar simulation (round-6 verdict lead #2): stub ONLY
    the from_avro LEAF with a literal struct of the pure-Python-decoded
    datum, run the REAL native_value_envelope plan around it JVM-side
    (inner to_json, outer envelope struct, null routing), and require the
    produced envelope bytes to equal the UDF path's envelope byte-for-
    byte.  This pins everything the native cut adds except from_avro's
    own decode — the one piece only a jar-present cluster can prove
    (test_native_envelope_byte_parity_with_udf_path)."""
    import pyspark.sql.avro.functions as avro_fns

    from byte_convert_avro_spark.avro import parse_schema, schemaless_decode

    record = {"id": 7, "who": "zoë", "ok": True, "tags": ["x", "y"]}
    payload = encode_wire(1, schemaless_encode(record, SAFE_SCHEMA))
    parsed = parse_schema(SAFE_SCHEMA)

    def fake_from_avro(col, schema_text, options=None):
        assert parse_schema(schema_text).canonical_str() == parsed.canonical_str()
        body = payload[5:]
        return _lit_of(schemaless_decode(body, parsed), parsed)

    monkeypatch.setattr(avro_fns, "from_avro", fake_from_avro)
    df = spark.createDataFrame([("t", None, payload)], REC)
    nat = decode_records_auto(df, _store(), {"t": False}, {"t": 1}, _available=True)
    assert not _has_python_stage(nat)
    udf = decode_records_auto(df, _store(), {"t": False}, _available=False)
    [nrow] = nat.collect()
    [urow] = udf.collect()
    assert urow._error is None and nrow._error is None
    assert bytes(nrow.value) == bytes(urow.value)
