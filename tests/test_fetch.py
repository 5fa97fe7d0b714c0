"""HTTP schema fetcher + install verb (localhost server — no external
network). Reference semantics: command_install.cc (vendored fetch +
lock, --frozen verification), resolver.h (HTTP fallback resolution)."""

from __future__ import annotations

import http.server
import json
import socketserver
import threading

import pytest

from jsonschema_ray.cli import main
from jsonschema_ray.sources.fetch import SchemaStore, fetch_schema

DOCS = {
    "/name.json": {"type": "string", "minLength": 1},
    "/person.json": {
        "type": "object",
        "required": ["name"],
        # relative remote ref — must resolve against the REMOTE base
        "properties": {"name": {"$ref": "name.json"}},
    },
    "/weird.yaml": "type: integer\nminimum: 3\n",
}


@pytest.fixture(scope="module")
def server():
    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            doc = DOCS.get(self.path)
            if doc is None:
                self.send_response(404)
                self.end_headers()
                return
            body = (doc if isinstance(doc, str) else json.dumps(doc)).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_schema_json_and_yaml(server):
    assert fetch_schema(f"{server}/name.json") == DOCS["/name.json"]
    # YAML fallback mirrors the reference's JSON-then-YAML file probing
    assert fetch_schema(f"{server}/weird.yaml") == {"type": "integer",
                                                    "minimum": 3}
    with pytest.raises(ValueError):
        fetch_schema("ftp://example.invalid/x.json")


def test_install_lock_and_offline_resolve(server, tmp_path):
    store_dir = str(tmp_path / "store")
    uri = f"{server}/name.json"
    assert main(["install", uri, "--to", store_dir]) == 0
    # offline resolution from the lock — no server round-trip
    fresh = SchemaStore(store_dir)
    assert fresh.resolve(uri) == DOCS["/name.json"]
    assert fresh.uris() == [uri]
    # idempotent re-install (FetchMode::Missing) and --frozen verify
    assert main(["install", uri, "--to", store_dir]) == 0
    assert main(["install", "--frozen", "--to", store_dir]) == 0
    # tamper → frozen verification fails
    p = tmp_path / "store" / fresh._lock[uri]["path"]
    p.write_text("{}")
    assert main(["install", "--frozen", "--to", store_dir]) == 1


def test_bundle_remote_refs_http_and_store(server, tmp_path):
    root = tmp_path / "root.json"
    root.write_text(json.dumps({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$ref": f"{server}/person.json",
    }))
    out = tmp_path / "bundled.json"
    # live HTTP: transitive relative ref name.json resolves remotely
    assert main(["bundle", str(root), "--http", "-o", str(out)]) == 0
    bundled = json.loads(out.read_text())
    # reference shape: $ref untouched, resources embedded by their URI
    assert bundled["$ref"] == f"{server}/person.json"
    assert set(bundled["$defs"]) == {f"{server}/person.json",
                                     f"{server}/name.json"}
    person = bundled["$defs"][f"{server}/person.json"]
    assert person["$id"] == f"{server}/person.json"
    assert person["properties"]["name"]["$ref"] == "name.json"
    assert bundled["$defs"][f"{server}/name.json"]["minLength"] == 1

    # the bundled schema actually validates
    from jsonschema_ray.spec.jschema import compile_schema

    cs = compile_schema(bundled)
    assert cs.is_valid({"name": "ada"})
    assert not cs.is_valid({"name": ""})
    assert not cs.is_valid({})

    # offline path: install both docs, bundle with --store, no --http
    store_dir = str(tmp_path / "store")
    assert main(["install", f"{server}/person.json", f"{server}/name.json",
                 "--to", store_dir]) == 0
    out2 = tmp_path / "bundled2.json"
    assert main(["bundle", str(root), "--store", store_dir,
                 "-o", str(out2)]) == 0
    assert json.loads(out2.read_text()) == bundled

    # neither store nor --http → unresolved remote ref is an error
    # (reference exit 4, schema-input family)
    assert main(["bundle", str(root), "-o", str(tmp_path / "x.json")]) == 4
