"""Replay of the reference's live-network CI suite — offline.

``/root/reference/test/ci/*.sh`` exercises ``--http`` resolution:
fetching remote ``$ref`` targets, ``--header`` forwarding, install
dependency fetching, and the failure surfaces (non-200, non-schema,
unparseable body). Reference behavior: ``src/resolver.h`` (http_fetch
with headers + retries, content-type YAML dispatch, CustomResolver
remote fallback) and ``src/command_install.cc:39-50``
(dependency_fetch, remote unconditionally enabled for install).

Two tiers here:

1. **Byte-exact**: the CI scripts that spin up their OWN localhost
   node server are executed VERBATIM through the CLI shim (same
   mechanism as tests/test_reference_corpus.py). Ratcheted at
   CI_MIN_MATCHES.
2. **Semantic**: the scripts that hit live registries
   (schemas.sourcemeta.com) cannot run offline; their resolution
   semantics are replayed against a pytest-local HTTP server with the
   same schema/instance fixtures, asserting the same exit codes and
   error shapes.

Fixture source: reference public repo — PUBLIC CONTENT, executed for
expected-output comparison only.
"""

from __future__ import annotations

import http.server
import json
import os
import socketserver
import subprocess
import sys
import threading

import pytest

CI = "/root/reference/test/ci"

# scripts that self-host on localhost via `node` (available offline);
# pass_validate_json_ref_yaml_http.sh needs `npx http-server` (network
# download) and fail_validate_http_missing_curl.sh manipulates PATH
# around a curl-binary dependency the Python engine does not have —
# both replayed semantically below instead.
BYTE_EXACT = [
    "pass_validate_http_header_auth.sh",
    "pass_install_http_header_auth.sh",
    "pass_install_http_header_multiple.sh",
]

CI_MIN_MATCHES = 3


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = tmp_path_factory.mktemp("ci_shim")
    p = d / "jsr"
    p.write_text("#!/bin/sh\n"
                 f'PYTHONPATH="{repo}" exec "{sys.executable}" '
                 '-m jsonschema_ray "$@"\n')
    p.chmod(0o755)
    return str(p)


def test_reference_ci_localhost_scripts_end_to_end(shim, tmp_path):
    """Tier 1: the self-hosting CI scripts run VERBATIM (node localhost
    servers, --header auth, install lock/hash assertions) — exit 0
    means every diff in the script matched byte-exact."""
    results = {}
    for name in BYTE_EXACT:
        r = subprocess.run(["bash", f"{CI}/{name}", shim],
                           cwd=str(tmp_path), capture_output=True,
                           text=True, timeout=180)
        results[name] = (r.returncode, (r.stdout + r.stderr)[-300:])
    passed = sum(1 for rc, _ in results.values() if rc == 0)
    assert passed >= CI_MIN_MATCHES, results


# ---------------------------------------------------------------------------
# Tier 2: semantic replays against a pytest-local server
# ---------------------------------------------------------------------------

DOCS: dict[str, tuple[int, str, str]] = {
    # path -> (status, content_type, body)
    "/draft4-meta.json": (200, "application/json", json.dumps({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "__BASE__/draft4-meta.json",
        "type": "object",
    })),
    "/schema.yaml": (200, "text/yaml",
                     "$schema: https://json-schema.org/draft/2020-12/"
                     "schema\ntype: string\n"),
    "/non-schema.json": (200, "application/json", "[1, 2, 3]"),
    "/bad-body.json": (200, "application/json", "\n<html></html>"),
    "/missing.json": (404, "text/plain", "not found"),
    "/dep.json": (200, "application/json", json.dumps({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "__BASE__/dep.json",
        "type": "string",
    })),
}


@pytest.fixture(scope="module")
def server():
    state = {"base": ""}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            entry = DOCS.get(self.path.partition("?")[0])
            if entry is None:
                self.send_response(404)
                self.end_headers()
                return
            status, ctype, body = entry
            body = body.replace("__BASE__", state["base"]).encode()
            self.send_response(status)
            self.send_header("content-type", ctype)
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    state["base"] = f"http://127.0.0.1:{srv.server_address[1]}"
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield state["base"]
    srv.shutdown()


def _cli(args, cwd):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    return subprocess.run([sys.executable, "-m", "jsonschema_ray", *args],
                          cwd=str(cwd), env=env, capture_output=True,
                          text=True, timeout=120)


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(obj if isinstance(obj, str) else json.dumps(obj, indent=2))
    return str(p)


def test_ci_validate_http_pass(server, tmp_path):
    """pass_validate_http.sh semantics: a remote $ref inside allOf is
    fetched and the instance validates (exit 0, silent stderr)."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Test",
        "allOf": [{"$ref": f"{server}/draft4-meta.json"}],
    })
    instance = _write(tmp_path, "instance.json", {"type": "string"})
    r = _cli(["validate", schema, instance, "--http"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert r.stderr == ""


def test_ci_validate_yaml_ref_http(server, tmp_path):
    """pass_validate_json_ref_yaml_http.sh semantics: a remote YAML
    $ref (content-type text/yaml) resolves; instance passes."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$ref": f"{server}/schema.yaml",
    })
    instance = _write(tmp_path, "instance.json", "\"foo\"")
    r = _cli(["validate", schema, "--http", instance], tmp_path)
    assert r.returncode == 0, r.stderr
    # and a failing instance still fails (the ref actually binds)
    bad = _write(tmp_path, "bad.json", "7")
    r2 = _cli(["validate", schema, "--http", bad], tmp_path)
    assert r2.returncode == 2, r2.stderr


def test_ci_validate_http_non_200(server, tmp_path):
    """fail_validate_http_non_200.sh semantics: an unfetchable remote
    ref is an input error (exit 6) naming the uri."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "allOf": [{"$ref": f"{server}/missing.json"}],
    })
    instance = _write(tmp_path, "instance.json", {"type": "string"})
    r = _cli(["validate", schema, instance, "--http"], tmp_path)
    assert r.returncode == 6, (r.returncode, r.stderr)
    assert "error: Failed to fetch schema" in r.stderr
    assert f"at uri {server}/missing.json" in r.stderr


def test_ci_validate_http_unparseable_body(server, tmp_path):
    """fail_bundle_http_non_200.sh's observed failure shape: a fetched
    body that is not JSON surfaces the reference's parse error (exit 6,
    line/column of the body)."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "allOf": [{"$ref": f"{server}/bad-body.json"}],
    })
    instance = _write(tmp_path, "instance.json", {})
    r = _cli(["validate", schema, instance, "--http"], tmp_path)
    assert r.returncode == 6, (r.returncode, r.stderr)
    assert "error: Failed to parse the JSON document" in r.stderr
    assert "at line 2" in r.stderr
    assert "at column 1" in r.stderr


def test_ci_validate_http_non_schema(server, tmp_path):
    """fail_validate_http_non_schema.sh semantics: a fetched document
    that is not a schema (array) is a schema-input error (exit 4)
    anchored at the referencing keyword."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "allOf": [{"$ref": f"{server}/non-schema.json"}],
    })
    instance = _write(tmp_path, "instance.json", {"type": "string"})
    r = _cli(["validate", schema, instance, "--http"], tmp_path)
    assert r.returncode == 4, (r.returncode, r.stderr)
    assert "error: The JSON document is not a valid JSON Schema" in r.stderr
    assert f"at identifier {server}/non-schema.json" in r.stderr
    assert 'at location "/allOf/0/$ref"' in r.stderr


def test_ci_bundle_http_pass(server, tmp_path):
    """pass_bundle_http.sh semantics: bundle embeds the fetched remote
    schema under $defs keyed by its identifier."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$ref": f"{server}/dep.json",
    })
    r = _cli(["bundle", schema, "--http"], tmp_path)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert f"{server}/dep.json" in out.get("$defs", {}), r.stdout


def test_ci_install_http_pass(server, tmp_path):
    """pass_install_http.sh semantics: bare `install` fetches the
    declared dependency over HTTP (no --http flag needed — the
    reference's dependency_fetch is remote unconditionally), writes
    the vendored bundled schema and the sha256 lock."""
    proj = tmp_path / "project"
    proj.mkdir()
    (proj / "jsonschema.json").write_text(json.dumps({
        "dependencies": {f"{server}/dep.json": "./vendor/dep.json"}}))
    r = _cli(["install"], proj)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"Fetching       : {server}/dep.json" in r.stdout
    assert "Installed      : " in r.stdout
    vendored = json.loads((proj / "vendor/dep.json").read_text())
    assert vendored["$id"] == f"{server}/dep.json"
    lock = json.loads((proj / "jsonschema.lock.json").read_text())
    assert lock["dependencies"][f"{server}/dep.json"]["hashAlgorithm"] \
        == "sha256"


def test_ci_install_add_http(server, tmp_path):
    """pass_install_add_http.sh semantics: `install <uri> <path>`
    bootstraps the config, fetches, and records the dependency."""
    proj = tmp_path / "addproj"
    proj.mkdir()
    r = _cli(["install", f"{server}/dep.json", "./vendor/d.json"], proj)
    assert r.returncode == 0, r.stdout + r.stderr
    cfg = json.loads((proj / "jsonschema.json").read_text())
    assert cfg["dependencies"][f"{server}/dep.json"] == "./vendor/d.json"
    assert (proj / "vendor/d.json").exists()


def test_ci_install_http_fetch_failure(server, tmp_path):
    """pass_install_http_header_auth.sh's no-auth leg semantics: a
    failed fetch reports `Failed to fetch schema` + uri, exit 6."""
    proj = tmp_path / "failproj"
    proj.mkdir()
    (proj / "jsonschema.json").write_text(json.dumps({
        "dependencies": {f"{server}/missing.json": "./vendor/x.json"}}))
    r = _cli(["install"], proj)
    assert r.returncode == 6, r.stdout + r.stderr
    assert "error: Failed to fetch schema" in r.stdout
    assert f"at uri {server}/missing.json" in r.stdout


def test_ci_validate_http_headers_forwarded(tmp_path):
    """--header values reach the wire on validate fetches (the
    byte-exact tier already proves install; this pins validate with a
    Python server so the assertion is header-value-exact)."""
    seen = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            seen["tenant"] = self.headers.get("X-Tenant")
            body = json.dumps({"type": "string"}).encode()
            self.send_response(200)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        schema = _write(tmp_path, "schema.json", {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$ref": f"{base}/s.json",
        })
        instance = _write(tmp_path, "instance.json", "\"x\"")
        r = _cli(["validate", schema, instance, "--http",
                  "--header", "Authorization: Bearer tok",
                  "--header", "X-Tenant: acme"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert seen == {"auth": "Bearer tok", "tenant": "acme"}
    finally:
        srv.shutdown()


def test_ci_bundle_http_non_200(server, tmp_path):
    """fail_bundle_http_non_200.sh semantics: exit 6 naming the uri."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "allOf": [{"$ref": f"{server}/missing.json"}],
    })
    r = _cli(["bundle", schema, "--http"], tmp_path)
    assert r.returncode == 6, (r.returncode, r.stderr)
    assert "error: Failed to fetch schema" in r.stderr


def test_ci_bundle_http_unparseable_body(server, tmp_path):
    """A fetched body that is not JSON fails bundling with the parse
    error (exit 6, line 2 column 1 — the shape the reference CI pins)."""
    schema = _write(tmp_path, "schema.json", {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "allOf": [{"$ref": f"{server}/bad-body.json"}],
    })
    r = _cli(["bundle", schema, "--http"], tmp_path)
    assert r.returncode == 6, (r.returncode, r.stderr)
    assert "error: Failed to parse the JSON document" in r.stderr
    assert "at line 2" in r.stderr
