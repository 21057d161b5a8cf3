"""Opt-in HTTP(S) remote schema fetch: redirect following + memoization —
the engine-side equivalent of the reference's DefaultSchemaClient +
MemoizingSchemaClient (SchemaClient.kt:63-140), tested against a local
http.server the way the reference uses embedded Jetty
(TestSuiteTest.kt:144-152)."""

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_skema_spark.plans.compile import Compiler
from json_skema_spark.plans.model import SchemaError, _FETCH_MEMO


@pytest.fixture()
def server():
    routes = {}
    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            item = routes.get(self.path)
            if item is None:
                self.send_response(404)
                self.end_headers()
                return
            if isinstance(item, tuple) and item[0] == "redirect":
                self.send_response(302)
                self.send_header("Location", item[1])
                self.end_headers()
                return
            body = json.dumps(item).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base, routes, hits
    finally:
        srv.shutdown()
        srv.server_close()
        _FETCH_MEMO.clear()


def _compile_passed(spark, schema, value):
    comp = Compiler(schema, fetch_remote=True)
    c = comp.compile_value(F.col("v"), T.IntegerType())
    df = spark.createDataFrame([(value,)], "v int")
    return df.select(c.passed.alias("p")).first().p


def test_remote_ref_fetch_and_validate(spark, server):
    base, routes, hits = server
    routes["/pos.json"] = {"minimum": 0}
    schema = {"$ref": f"{base}/pos.json"}
    assert _compile_passed(spark, schema, 5) is True
    assert _compile_passed(spark, schema, -1) is False


def test_redirect_followed(spark, server):
    base, routes, hits = server
    routes["/moved.json"] = ("redirect", f"{base}/target.json")
    routes["/target.json"] = {"maximum": 10}
    schema = {"$ref": f"{base}/moved.json"}
    assert _compile_passed(spark, schema, 20) is False
    assert "/target.json" in hits


def test_fetch_memoized_across_compiles(spark, server):
    base, routes, hits = server
    routes["/memo.json"] = {"minimum": 0}
    schema = {"$ref": f"{base}/memo.json"}
    _compile_passed(spark, schema, 1)
    n_first = hits.count("/memo.json")
    _compile_passed(spark, schema, 2)
    assert hits.count("/memo.json") == n_first  # served from _FETCH_MEMO


def test_fetch_disabled_by_default(spark, server):
    base, routes, hits = server
    routes["/x.json"] = {"minimum": 0}
    comp = Compiler({"$ref": f"{base}/x.json"})  # no fetch_remote
    # a pointered CompileError (inside the aggregate-collection contract),
    # not a raw SchemaError escaping it (review r05c)
    from json_skema_spark.plans.compile import CompileError
    with pytest.raises(CompileError, match="not registered") as ei:
        comp.compile_value(F.col("v"), T.IntegerType())
    assert "#/$ref" in str(ei.value)
    assert hits == []


def test_nested_remote_chain(spark, server):
    """$ref chain across two remote docs, second resolved relative to the
    first's URI (SchemaLoader resolution against the entered scope)."""
    base, routes, hits = server
    routes["/a.json"] = {"$ref": "b.json"}
    routes["/b.json"] = {"minimum": 3}
    schema = {"$ref": f"{base}/a.json"}
    assert _compile_passed(spark, schema, 2) is False
    assert _compile_passed(spark, schema, 4) is True


def test_memo_does_not_bypass_policy(server):
    """A URI fetched under a lax policy must still be policy-checked for a
    stricter caller — the memo only skips network I/O."""
    from json_skema_spark.plans.model import SchemaError, fetch_schema_document

    base, routes, _hits = server
    routes["/memo_policy.json"] = {"type": "integer"}
    uri = f"{base}/memo_policy.json"
    fetch_schema_document(uri)  # memoize under the default policy
    with pytest.raises(SchemaError, match="allowlist"):
        fetch_schema_document(uri, host_allowlist={"allowed.example"})
    with pytest.raises(SchemaError, match="http"):
        fetch_schema_document(uri, allow_http=False)
