"""HttpSchemaRegistry against a live mock registry — the analogue of the
reference's WireMock-based SchemaRegistryMock (SchemaRegistryMock.java:
get-by-id :103,155-177; basic-auth tags :121-144; registry-failure test
TransformTest.java:201-221).  A stdlib HTTP server plays the registry:
Confluent ``GET /schemas/ids/{id}`` returns ``{"schema": "..."}``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from byte_convert_avro_spark.avro import schemaless_encode
from byte_convert_avro_spark.engine import Engine, EngineConfig
from byte_convert_avro_spark.schema_store import HttpSchemaRegistry, SchemaLookupError
from byte_convert_avro_spark.wire import encode_wire

NAME_SCHEMA = (
    '{"type":"record","name":"FullName",'
    '"fields":[{"name":"first","type":"string"},{"name":"last","type":"string"}]}'
)
INT_SCHEMA = '"int"'


class _Registry(BaseHTTPRequestHandler):
    schemas = {1: NAME_SCHEMA, 7: INT_SCHEMA}
    #: subject -> list of schema ids, index = version-1 (mock registry
    #: shape: listVersions/getSubjectVersion, SchemaRegistryMock.java:261-297)
    subjects: dict[str, list[int]] = {"names-value": [1], "ints-value": [7]}
    compat = "BACKWARD"
    hits: list[str] = []
    require_auth: str | None = None  # expected Authorization header value

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self):
        self._json({"error_code": 40403, "message": "Schema not found"}, 404)

    def do_GET(self):  # noqa: N802
        _Registry.hits.append(self.path)
        if _Registry.require_auth and self.headers.get("Authorization") != _Registry.require_auth:
            self.send_response(401)
            self.end_headers()
            return
        parts = [p for p in self.path.split("/") if p]
        if self.path.startswith("/schemas/ids/"):
            sid = int(self.path.rsplit("/", 1)[-1])
            if sid in self.schemas:
                return self._json({"schema": self.schemas[sid]})
        elif parts == ["subjects"]:
            return self._json(sorted(self.subjects))
        elif len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
            ids = self.subjects.get(parts[1])
            if ids:
                return self._json(list(range(1, len(ids) + 1)))
        elif len(parts) == 4 and parts[0] == "subjects" and parts[2] == "versions":
            ids = self.subjects.get(parts[1])
            if ids:
                v = len(ids) if parts[3] == "latest" else int(parts[3])
                if 1 <= v <= len(ids):
                    sid = ids[v - 1]
                    return self._json(
                        {"subject": parts[1], "version": v, "id": sid,
                         "schema": self.schemas[sid]}
                    )
        elif parts and parts[0] == "config":
            return self._json({"compatibilityLevel": self.compat})
        self._not_found()

    def do_POST(self):  # noqa: N802
        _Registry.hits.append("POST " + self.path)
        parts = [p for p in self.path.split("/") if p]
        if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
            ln = int(self.headers.get("Content-Length", 0))
            schema = json.loads(self.rfile.read(ln))["schema"]
            sid = max(self.schemas) + 1
            _Registry.schemas[sid] = schema
            _Registry.subjects.setdefault(parts[1], []).append(sid)
            return self._json({"id": sid})
        self._not_found()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def registry_url():
    server = HTTPServer(("127.0.0.1", 0), _Registry)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    _Registry.hits = []
    _Registry.require_auth = None
    _Registry.schemas = {1: NAME_SCHEMA, 7: INT_SCHEMA}
    _Registry.subjects = {"names-value": [1], "ints-value": [7]}
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_fetch_and_lru_cache(registry_url):
    """One HTTP call per distinct id, then cache hits (AvroTransform.java:
    259-268: '<= 1 HTTP call per distinct schema id')."""
    reg = HttpSchemaRegistry(registry_url)
    for _ in range(5):
        assert json.loads(reg.get_schema_text(1))["name"] == "FullName"
    assert reg.get_schema_text(7) == '"int"'
    assert _Registry.hits.count("/schemas/ids/1") == 1
    assert _Registry.hits.count("/schemas/ids/7") == 1


def test_cache_eviction_at_capacity(registry_url):
    """LRU capacity honored (reference default 100; here 1 so the second id
    evicts the first and a re-read re-fetches)."""
    reg = HttpSchemaRegistry(registry_url, capacity=1)
    reg.get_schema_text(1)
    reg.get_schema_text(7)  # evicts 1
    reg.get_schema_text(1)  # re-fetch
    assert _Registry.hits.count("/schemas/ids/1") == 2


def test_unknown_id_raises(registry_url):
    """Registry 404 -> SchemaLookupError (reference: ConnectException on
    RestClientException, AvroTransform.java:269-273; test :201-221)."""
    reg = HttpSchemaRegistry(registry_url)
    with pytest.raises(SchemaLookupError):
        reg.get_schema_text(999)


def test_url_failover(registry_url):
    """First URL dead -> second serves (the reference accepts a URL list)."""
    reg = HttpSchemaRegistry(["http://127.0.0.1:9", registry_url], timeout=2.0)
    assert reg.get_schema_text(7) == '"int"'


def test_basic_auth_sent(registry_url):
    """Credentials travel as a Basic Authorization header
    (SchemaRegistryMock.java:121-144, Constants.java:13-15)."""
    _Registry.require_auth = "Basic dXNlcjpzZWNyZXQ="  # user:secret
    with pytest.raises(SchemaLookupError):
        HttpSchemaRegistry(registry_url).get_schema_text(1)
    reg = HttpSchemaRegistry(registry_url, auth=("user", "secret"))
    assert json.loads(reg.get_schema_text(1))["name"] == "FullName"


def test_subject_version_lookup_and_shared_lru(registry_url):
    """GET /subjects/{s}/versions/{v} (GetVersionHandler semantics,
    SchemaRegistryMock.java:277-297) — and the fetched schema lands in the
    same LRU the decode hot path reads, so the follow-up get-by-id is free."""
    reg = HttpSchemaRegistry(registry_url)
    sv = reg.get_subject_version("names-value", 1)
    assert (sv.subject, sv.version, sv.schema_id) == ("names-value", 1, 1)
    assert json.loads(sv.schema)["name"] == "FullName"
    assert reg.get_schema_text(1) == sv.schema
    assert "/schemas/ids/1" not in _Registry.hits  # LRU hit, no second fetch


def test_subject_latest_version(registry_url):
    reg = HttpSchemaRegistry(registry_url)
    new_id = reg.register_schema("names-value", INT_SCHEMA)
    sv = reg.get_subject_version("names-value")  # latest
    assert sv.version == 2 and sv.schema_id == new_id and sv.schema == INT_SCHEMA
    assert reg.list_versions("names-value") == [1, 2]


def test_subjects_and_config(registry_url):
    reg = HttpSchemaRegistry(registry_url)
    assert reg.subjects() == ["ints-value", "names-value"]
    assert reg.get_compatibility() == "BACKWARD"
    assert reg.get_compatibility("names-value") == "BACKWARD"


def test_unknown_subject_raises(registry_url):
    reg = HttpSchemaRegistry(registry_url)
    with pytest.raises(SchemaLookupError):
        reg.get_subject_version("nope", 1)
    with pytest.raises(SchemaLookupError):
        reg.list_versions("nope")


def test_local_store_subject_surface():
    """LocalSchemaStore mirrors the mock registry's subject model
    (register -> monotonic versions; latest; list)."""
    from byte_convert_avro_spark.schema_store import LocalSchemaStore

    s = LocalSchemaStore()
    a = s.register(NAME_SCHEMA, subject="t-value")
    b = s.register(INT_SCHEMA, subject="t-value")
    assert s.subjects() == ["t-value"]
    assert s.list_versions("t-value") == [1, 2]
    assert s.get_subject_version("t-value", 1).schema_id == a
    latest = s.get_subject_version("t-value")
    assert latest.version == 2 and latest.schema_id == b
    with pytest.raises(SchemaLookupError):
        s.get_subject_version("t-value", 3)
    with pytest.raises(SchemaLookupError):
        s.get_subject_version("missing")


def test_end_to_end_decode_via_http_registry(spark, registry_url):
    """The full Spark pipeline resolving schemas over HTTP from executor
    processes (the client pickles cold — __getstate__ drops the cache)."""
    from pyspark.sql import types as T

    eng = Engine(
        EngineConfig(avro_topics="t:true", schema_registry_urls=[registry_url])
    )
    payload = encode_wire(1, schemaless_encode({"first": "a", "last": "b"}, NAME_SCHEMA))
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([("t", None, payload)], schema)
    [row] = eng.transform(df).collect()
    env = json.loads(bytes(row.value))
    assert env["originSchemaId"] == 1
    assert json.loads(env["originMessage"]) == {"first": "a", "last": "b"}
    assert row._error is None
