"""Schema-id resolution (reference O11: ``getSchema``,
AvroTransform.java:254-279 — LRU-cached Confluent Schema Registry client).

Two implementations behind one protocol:

- :class:`LocalSchemaStore` — dict-backed id->schema map, serializable, used
  in tests and batch jobs (plays the role of the reference's
  ``SchemaRegistryMock``, SchemaRegistryMock.java:155-177 get-by-id).
- :class:`HttpSchemaRegistry` — Confluent REST ``GET /schemas/ids/{id}``
  (public Confluent Schema Registry API), lazily constructed **per executor**
  with an LRU cache of ``capacity`` entries, mirroring the reference's
  ``SynchronizedCache(new LRUCache(capacity))`` (AvroTransform.java:108-109,
  default capacity 100 at :49).  The reference shares one synchronized cache
  across Connect task threads; Spark Python workers are processes, so a
  per-process cache is the equivalent (SURVEY.md §3 thread-boundary note).

A store must be **picklable** (it ships inside the decode UDF closure); the
HTTP client and cache are built lazily on first use on each executor.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from typing import Any, Protocol

from byte_convert_avro_spark.avro.schema import AvroSchema, parse_schema


class SchemaLookupError(KeyError):
    """Registry/resolution failure — the Spark-side analogue of the
    reference's ``ConnectException`` on REST failure (AvroTransform.java:270-273)."""


class SchemaStore(Protocol):
    def get_schema_text(self, schema_id: int) -> str: ...


class LocalSchemaStore:
    """In-memory id -> schema-JSON-text store.

    ``register`` returns the id, like the registry's register endpoint
    (SchemaRegistryMock.java:238-259).  Schema text is stored verbatim; the
    canonical string used in envelopes comes from parsing (see decoder).
    """

    def __init__(self, schemas: dict[int, str] | None = None) -> None:
        self._schemas: dict[int, str] = dict(schemas or {})
        self._next_id = (max(self._schemas) + 1) if self._schemas else 1

    def register(self, schema_text: str | dict, schema_id: int | None = None) -> int:
        if not isinstance(schema_text, str):
            schema_text = json.dumps(schema_text)
        if schema_id is None:
            schema_id = self._next_id
        self._schemas[schema_id] = schema_text
        self._next_id = max(self._next_id, schema_id + 1)
        return schema_id

    def get_schema_text(self, schema_id: int) -> str:
        try:
            return self._schemas[schema_id]
        except KeyError:
            raise SchemaLookupError(f"schema id {schema_id} not found in local store")

    def ids(self) -> list[int]:
        return sorted(self._schemas)


class HttpSchemaRegistry:
    """Confluent Schema Registry REST client with per-process LRU cache.

    Capacity default 100 matches the reference (AvroTransform.java:49).
    Multiple base URLs are tried in order (the reference passes a URL *list*,
    AvroTransform.java:97,109).
    """

    def __init__(self, urls: list[str] | str, capacity: int = 100,
                 auth: tuple[str, str] | None = None, timeout: float = 10.0) -> None:
        self.urls = [urls] if isinstance(urls, str) else list(urls)
        if not self.urls:
            raise ValueError("at least one registry URL is required")
        self.capacity = capacity
        self.auth = auth
        self.timeout = timeout
        self._cache: OrderedDict[int, str] | None = None  # built lazily per process

    def __getstate__(self) -> dict[str, Any]:
        d = self.__dict__.copy()
        d["_cache"] = None  # never ship a warm cache across processes
        return d

    def get_schema_text(self, schema_id: int) -> str:
        if self._cache is None:
            self._cache = OrderedDict()
        cache = self._cache
        if schema_id in cache:
            cache.move_to_end(schema_id)
            return cache[schema_id]
        text = self._fetch(schema_id)
        cache[schema_id] = text
        if len(cache) > self.capacity:
            cache.popitem(last=False)
        return text

    def _fetch(self, schema_id: int) -> str:
        import base64
        import urllib.error
        import urllib.request

        last_err: Exception | None = None
        for base in self.urls:
            url = f"{base.rstrip('/')}/schemas/ids/{schema_id}"
            req = urllib.request.Request(url, headers={"Accept": "application/vnd.schemaregistry.v1+json"})
            if self.auth:
                tok = base64.b64encode(f"{self.auth[0]}:{self.auth[1]}".encode()).decode()
                req.add_header("Authorization", f"Basic {tok}")
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                    return payload["schema"]
            except Exception as e:  # noqa: BLE001 — fall through to next URL
                last_err = e
        raise SchemaLookupError(
            f"failed to fetch schema id {schema_id} from {self.urls}: {last_err}"
        )


class CachedParser:
    """Per-process memo of parsed schemas + compiled readers keyed by id.

    This is the hot-path structure inside the decode UDF: one dict lookup per
    record once a schema id has been seen (the reference pays the same — a
    synchronized LRU get, AvroTransform.java:259-264).
    """

    def __init__(self, store: SchemaStore) -> None:
        self.store = store
        self._by_id: dict[int, tuple[AvroSchema, Any, str, str, Any]] = {}

    def get(self, schema_id: int):
        """-> (parsed schema, compiled binary reader, canonical schema
        string, JSON-escaped schema string, compiled Avro-JSON writer,
        fused value decoder, fused key decoder).
        The escaped schema is cached because the value envelope embeds it
        in every record; the compiled writer replaces a per-record
        tree-walk + json.dumps with one schema-driven pass.

        The key decoder is the same fused function, but disabled (None)
        when the writer schema itself has a top-level ``originSchema``
        field: the key envelope OVERWRITES that field (reference:
        ObjectNode.put replaces in place), which the fused append-only
        splice cannot express — that schema class takes the general path."""
        hit = self._by_id.get(schema_id)
        if hit is not None:
            return hit
        from json.encoder import encode_basestring

        from byte_convert_avro_spark.avro.binary import compile_reader
        from byte_convert_avro_spark.avro.fused import compile_fused
        from byte_convert_avro_spark.avro.jsonenc import compile_json_writer

        text = self.store.get_schema_text(schema_id)
        parsed = parse_schema(text)
        canonical = parsed.canonical_str()
        fused = compile_fused(parsed)
        key_collision = parsed.kind == "record" and any(
            f.name == "originSchema" for f in parsed.fields or []
        )
        entry = (
            parsed,
            compile_reader(parsed),
            canonical,
            encode_basestring(canonical),
            compile_json_writer(parsed),
            # fused decode->JSON codegen for flat records; None -> general path
            fused,
            None if key_collision else fused,
        )
        self._by_id[schema_id] = entry
        return entry
