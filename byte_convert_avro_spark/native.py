"""Native ``from_avro`` fast path — plan-time selection (SURVEY.md §1.2/§4).

``decoder.decode_records`` (the Arrow-batched UDF) handles every schema and
any topic mix; it is the only non-codegen stage in the pipeline.  When ALL
of the following hold, the same decode can instead stay entirely inside
whole-stage codegen — zero Python in the hot path:

1. the ``spark-avro`` module is on the classpath (:func:`native_avro_available`
   probes by constructing a ``from_avro`` column — absent, Spark raises
   ``AnalysisException [AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE]`` at plan
   time, which is exactly when we want to know);
2. every enabled topic is **single-schema** (caller supplies topic -> writer
   schema id; the wire prefix is still validated per row, so a stray second
   schema id degrades to an ``_error``/raise, never silent corruption);
3. no topic asks for key decode (the key envelope splices a field into the
   decoded object — schema-shape surgery the struct expression could do but
   that this first native cut does not attempt);
4. each writer schema is in the **JSON-parity subset**
   (:func:`json_parity_safe`) — where Spark's ``to_json`` output is
   byte-identical to the reference's Avro-JSON encoder (jsonenc.py):
   records (nested ok), arrays, enums, and the primitives
   int/long/boolean/string.  Excluded, and why:

   - unions: Avro-JSON tags branches ``{"branch": value}``; ``to_json`` has
     no such concept;
   - bytes/fixed: Avro-JSON escapes latin-1 text, ``to_json`` emits base64;
   - float/double: ``"NaN"``/``"Infinity"`` literals + Python ``repr``
     shortest-round-trip formatting vs Jackson's — not byte-stable;
   - maps: JSON object key order is decode-encounter order in jsonenc.py;
     Spark's MapData makes no such promise through ``to_json``.

The physical plan of the native path (all Catalyst expressions):

    gate  = is_valid_wire(value) AND schema_id(value) == expected   (O8-O10)
    datum = from_avro(body(value), schema)                          (O12-O13)
    env   = to_json(struct(originSchema, to_json(datum), id))       (O14,O16)

This container has no spark-avro jar, so here :func:`decode_records_auto`
always selects the UDF path; the selection logic and plan builder are unit
tested with the probe mocked, and the byte-parity end-to-end test is
skipif-gated on real availability (it runs on any cluster with the jar).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from byte_convert_avro_spark import wire
from byte_convert_avro_spark.avro.schema import AvroSchema, parse_schema
from byte_convert_avro_spark.decoder import PERMISSIVE, decode_records
from byte_convert_avro_spark.schema_store import SchemaStore

_PARITY_PRIMITIVES = {"int", "long", "boolean", "string"}

#: memo: SparkSession id -> probe result (the probe costs one no-op plan)
_AVAILABLE_MEMO: dict[int, bool] = {}


def native_avro_available(spark: SparkSession) -> bool:
    """True iff ``from_avro`` is usable in this session (spark-avro jar on
    the classpath).  Probes by building a throwaway plan; memoized."""
    key = id(spark)
    hit = _AVAILABLE_MEMO.get(key)
    if hit is not None:
        return hit
    try:
        from pyspark.sql.avro.functions import from_avro

        col = from_avro(F.lit(b""), '"int"')
        spark.range(1).select(col)  # forces analysis; raises without the jar
        ok = True
    except Exception:  # noqa: BLE001 — any failure means "use the UDF path"
        ok = False
    _AVAILABLE_MEMO[key] = ok
    return ok


def json_parity_safe(schema: AvroSchema | str | dict) -> bool:
    """True when ``to_json(from_avro(...))`` is byte-identical to the
    Avro-JSON encoder for every value of ``schema`` (see module docstring
    for the exclusion rationale)."""
    if not isinstance(schema, AvroSchema):
        schema = parse_schema(schema)

    def safe(s: AvroSchema, visiting: frozenset) -> bool:
        if s.kind == "primitive":
            return s.name in _PARITY_PRIMITIVES
        if s.kind == "enum":
            return True
        if s.kind == "record":
            if id(s) in visiting:  # recursive: no static struct type exists
                return False
            v = visiting | {id(s)}
            return all(safe(f.type, v) for f in s.fields or [])
        if s.kind == "array":
            return safe(s.items, visiting)
        return False  # union / map / bytes / fixed / float / double

    return schema.kind == "record" and safe(schema, frozenset())


def native_value_envelope(
    value: Column, schema_text: str, schema_id: int, mode: str = PERMISSIVE
) -> Column:
    """O12-O16 as one codegen'd expression: the value envelope string for a
    wire-format payload of a known single writer schema.  Returns NULL when
    the Avro body fails to decode (PERMISSIVE from_avro) so the caller can
    route the error column; FAILFAST lets from_avro raise."""
    from pyspark.sql.avro.functions import from_avro

    canonical = parse_schema(schema_text).canonical_str()
    datum = from_avro(wire.body(value), schema_text, {"mode": mode})
    msg = F.to_json(datum)
    env = F.to_json(
        F.struct(
            F.lit(canonical).alias("originSchema"),
            msg.alias("originMessage"),
            F.lit(schema_id).alias("originSchemaId"),
        )
    )
    # a null originMessage (decode failure under PERMISSIVE) must not emit
    # a truncated envelope — surface NULL and let the caller keep the
    # original bytes + set _error (the UDF path's forwarding semantics)
    return F.when(msg.isNull(), F.lit(None)).otherwise(env)


def _native_plan(
    df: DataFrame,
    topics: dict[str, bool],
    schema_ids: dict[str, int],
    schema_texts: dict[str, str],
    mode: str,
    include_headers: bool,
    key_col: str,
    value_col: str,
    topic_col: str,
) -> DataFrame:
    """The all-native decode projection (only called when selection says
    every enabled topic qualifies).  Same output contract as
    ``decoder.decode_records``: key/value replaced, ``_error`` in
    PERMISSIVE, headers dropped unless requested."""
    value = F.col(value_col)
    topic = F.col(topic_col)

    new_value: Column = value
    err: Column = F.lit(None).cast("string")
    for t, sid in schema_ids.items():
        if t not in topics:
            continue
        gate = wire.is_valid_wire(value) & (wire.schema_id(value) == F.lit(sid))
        env = native_value_envelope(value, schema_texts[t], sid, mode)
        on_topic = topic == F.lit(t)
        decodable = on_topic & value.isNotNull()
        if mode == PERMISSIVE:
            ok = decodable & gate & env.isNotNull()
            new_value = F.when(ok, env.cast("binary")).otherwise(new_value)
            err = F.when(
                decodable & ~gate,
                F.lit("value: invalid wire format or unexpected schema id"),
            ).when(
                decodable & gate & env.isNull(), F.lit("value: avro decode failed")
            ).otherwise(err)
        else:  # FAILFAST: wire violations raise; from_avro raises on body
            new_value = F.when(
                decodable & ~gate,
                F.raise_error(
                    F.concat(
                        F.lit("invalid wire format or unexpected schema id on topic "),
                        topic,
                    )
                ).cast("binary"),
            ).when(decodable, env.cast("binary")).otherwise(new_value)

    out_cols: list[Column] = []
    for c in df.columns:
        if c == value_col:
            out_cols.append(new_value.alias(value_col))
        elif c == "headers" and not include_headers:
            continue
        else:
            out_cols.append(F.col(c))
    if mode == PERMISSIVE:
        out_cols.append(err.alias("_error"))
    return df.select(*out_cols)


def decode_records_auto(
    df: DataFrame,
    store: SchemaStore,
    topics: dict[str, bool],
    single_schema_ids: dict[str, int] | None = None,
    mode: str = PERMISSIVE,
    include_headers: bool = True,
    key_col: str = "key",
    value_col: str = "value",
    topic_col: str = "topic",
    _available: bool | None = None,
) -> DataFrame:
    """Plan-time decode-path selection.

    ``single_schema_ids`` maps topic -> its one writer schema id (the
    caller's assertion; still gated per row).  When the native conditions
    hold (module docstring) the returned plan is pure Catalyst; otherwise
    this is exactly ``decoder.decode_records`` — the UDF path is untouched.
    ``_available`` overrides the classpath probe (tests)."""
    kw = dict(
        mode=mode,
        include_headers=include_headers,
        key_col=key_col,
        value_col=value_col,
        topic_col=topic_col,
    )
    avail = (
        _available
        if _available is not None
        else native_avro_available(df.sparkSession)
    )
    eligible = (
        avail
        and single_schema_ids is not None
        and set(topics) <= set(single_schema_ids)
        and not any(topics.values())  # no key decode in the native cut
    )
    if eligible:
        texts = {t: store.get_schema_text(i) for t, i in single_schema_ids.items() if t in topics}
        if all(json_parity_safe(x) for x in texts.values()):
            return _native_plan(df, topics, single_schema_ids, texts, **kw)
    return decode_records(df, store, topics, **kw)
