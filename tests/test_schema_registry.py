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
    hits: list[str] = []
    require_auth: str | None = None  # expected Authorization header value

    def do_GET(self):  # noqa: N802
        _Registry.hits.append(self.path)
        if _Registry.require_auth and self.headers.get("Authorization") != _Registry.require_auth:
            self.send_response(401)
            self.end_headers()
            return
        if self.path.startswith("/schemas/ids/"):
            sid = int(self.path.rsplit("/", 1)[-1])
            if sid in self.schemas:
                body = json.dumps({"schema": self.schemas[sid]}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
                self.end_headers()
                self.wfile.write(body)
                return
        self.send_response(404)
        self.end_headers()
        self.wfile.write(b'{"error_code":40403,"message":"Schema not found"}')

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def registry_url():
    server = HTTPServer(("127.0.0.1", 0), _Registry)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    _Registry.hits = []
    _Registry.require_auth = None
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
