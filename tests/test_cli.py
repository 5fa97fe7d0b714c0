"""CLI verbs: exit-code contract + behavior (driver-side verbs run in
subprocesses; the Ray-backed ``test`` verb runs in-process via main())."""

import json
import subprocess
import sys

REPO = "/root/repo"


def run_cli(*args, timeout=60):
    return subprocess.run([sys.executable, "-m", "jsonschema_ray", *args],
                          capture_output=True, text=True, cwd=REPO,
                          timeout=timeout)


def test_compile_and_fmt_roundtrip(tmp_path):
    out = tmp_path / "plan.json"
    r = run_cli("compile", "default", "-o", str(out))
    assert r.returncode == 0
    assert "plan_hash" in r.stderr
    # compiled output is already canonical
    r2 = run_cli("fmt", "--plan", str(out), "--check")
    assert r2.returncode == 0
    # perturb formatting → --check fails, fmt rewrites, check passes
    raw = json.loads(out.read_text())
    out.write_text(json.dumps(raw))  # non-canonical (no indent)
    assert run_cli("fmt", "--plan", str(out), "--check").returncode == 2
    assert run_cli("fmt", "--plan", str(out)).returncode == 0
    assert run_cli("fmt", "--plan", str(out), "--check").returncode == 0


def test_lint_and_metaschema_on_good_plan():
    r = run_cli("lint", "rules/default_plan.json")
    assert r.returncode == 0
    assert json.loads(r.stdout)["health"] == 100.0
    r = run_cli("metaschema", "--plan", "rules/default_plan.json")
    assert r.returncode == 0


def test_lint_catches_bad_plan(tmp_path):
    bad = {"version": 1, "rules": [
        {"rule_id": "a", "kind": "predicate", "scope": "span",
         "check": {"op": "nope", "field": "x"}, "message": "m"},
        {"rule_id": "a", "kind": "predicate", "scope": "span",
         "check": {"op": "regex", "field": "x", "pattern": "a["},
         "message": "m"},
    ]}
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    r = run_cli("lint", str(p))
    assert r.returncode == 2
    assert "unknown op" in r.stderr
    assert "duplicate rule_id" in r.stderr
    assert "bad regex" in r.stderr
    r = run_cli("metaschema", "--plan", str(p))
    assert r.returncode == 2


def test_lint_catches_unsatisfiable_and_enum_issues(tmp_path):
    plan = {"version": 1, "rules": [
        {"rule_id": "impossible", "kind": "predicate", "scope": "span",
         "check": {"op": "between", "field": "x", "min": 10, "max": 2},
         "message": "m"},
        {"rule_id": "dup_enum", "kind": "predicate", "scope": "span",
         "check": {"op": "is_in", "field": "k", "values": ["a", "b", "a"]},
         "message": "m"},
        {"rule_id": "empty_enum", "kind": "predicate", "scope": "span",
         "check": {"op": "is_in", "field": "k", "values": []},
         "message": "m"},
    ]}
    p = tmp_path / "p.json"
    p.write_text(json.dumps(plan))
    r = run_cli("lint", str(p))
    assert r.returncode == 2  # unsatisfiable bounds are errors
    assert "unsatisfiable bounds" in r.stderr
    assert "duplicate values in is_in" in r.stderr
    assert "empty is_in" in r.stderr


def test_lint_fix_removes_unreachable(tmp_path):
    plan = {"version": 1, "rules": [
        {"rule_id": "ok", "kind": "predicate", "scope": "span",
         "check": {"op": "not_null", "field": "x"}, "message": ""},
        {"rule_id": "dead", "kind": "predicate", "scope": "span",
         "when": {"op": "const", "value": False},
         "check": {"op": "not_null", "field": "x"}, "message": "m"},
    ]}
    p = tmp_path / "p.json"
    p.write_text(json.dumps(plan))
    assert run_cli("lint", str(p), "--fix").returncode == 0
    fixed = json.loads(p.read_text())
    ids = [r["rule_id"] for r in fixed["rules"]]
    assert ids == ["ok"]
    assert fixed["rules"][0]["message"]  # empty message filled


def test_inspect_reports_strategies():
    r = run_cli("inspect", "--plan", "rules/default_plan.json")
    assert r.returncode == 0
    d = json.loads(r.stdout)
    by_id = {x["rule_id"]: x for x in d["rules"]}
    assert "groupby" in by_id["doc_id_unique"]["strategy"]
    assert "anti-join" in by_id["media_ref_exists"]["strategy"]
    assert by_id["kind_enum"]["fields"] == ["kind"]


def test_missing_file_is_usage_error():
    # reference semantics: a missing input is exit 6 (other input)
    assert run_cli("lint", "/nonexistent/x.json").returncode == 6


def test_suite_runner(ray_session):
    """The `test` verb through main() against the bundled example suite
    (reuses the session Ray, mirroring the reference's test verb §3.2)."""
    from jsonschema_ray.cli import main

    assert main(["test", "rules/suite_example.json"]) == 0


def test_empty_suite_exit_code(tmp_path, ray_session):
    from jsonschema_ray.cli import main

    p = tmp_path / "empty.json"
    p.write_text(json.dumps({"tests": []}))
    assert main(["test", str(p)]) == 6


def test_lint_fix_keeps_failure_exit_on_unfixable_errors(tmp_path):
    """ADVICE r1: --fix must not report success while error-severity
    findings (unknown op) remain unfixed."""
    bad = {"version": 1, "rules": [
        {"rule_id": "broken", "kind": "predicate", "scope": "span",
         "check": {"op": "nope", "field": "x"}, "message": "m"},
        {"rule_id": "unreachable", "kind": "predicate", "scope": "span",
         "when": {"op": "const", "value": False},
         "check": {"op": "not_null", "field": "x"}, "message": "m"},
    ]}
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    r = run_cli("lint", str(p), "--fix")
    assert r.returncode == 2  # 'broken' is still in the plan, unfixed
    fixed = json.loads(p.read_text())
    ids = [x["rule_id"] for x in fixed["rules"]]
    assert "unreachable" not in ids and "broken" in ids
    # a plan whose only findings ARE fixable exits 0 after --fix
    ok = {"version": 1, "rules": [
        {"rule_id": "no_msg", "kind": "predicate", "scope": "span",
         "check": {"op": "not_null", "field": "x"}, "message": ""}]}
    p2 = tmp_path / "ok.json"
    p2.write_text(json.dumps(ok))
    assert run_cli("lint", str(p2), "--fix").returncode == 0


def test_validate_fast_respects_rule_filters(tmp_path, ray_session):
    """ADVICE r1: --fast must honor --only/--exclude like the
    exhaustive path does (in-process: the fast path uses the session
    Ray)."""
    import numpy as np
    import pyarrow.parquet as pq

    from jsonschema_ray.cli import main
    from jsonschema_ray.sources.synth import GenConfig, gen_docs_batch

    p = tmp_path / "docs.parquet"
    pq.write_table(gen_docs_batch(
        np.arange(800, dtype=np.uint64), GenConfig(n_docs=800, seed=5)),
        str(p))
    # default plan: synth data injects violations → fail
    assert main(["validate", str(p), "--fast"]) == 2
    # excluding every firing rule → pass
    firing = ("kind_enum,text_requires_text,media_requires_ref,"
              "media_ref_format,offset_monotonic,offset_nonnegative,"
              "doc_id_unique,media_ref_exists")
    assert main(["validate", str(p), "--fast", "--exclude", firing]) == 0
    # --only a single firing rule → still fail
    assert main(["validate", str(p), "--fast", "--only", "kind_enum"]) == 2


def test_bundle_inlines_file_refs(tmp_path):
    """bundle: file $refs → self-contained $defs; the bundled schema
    validates identically to the multi-file original."""
    import json as _json
    import subprocess
    import sys

    dialect = "https://json-schema.org/draft/2020-12/schema"
    (tmp_path / "node.yaml").write_text(
        f"$schema: '{dialect}'\n"
        "type: object\nrequired: [v]\nproperties:\n  v: {type: integer}\n"
        "  next: {$ref: 'node.yaml'}\n")  # self-recursive file ref
    (tmp_path / "root.json").write_text(_json.dumps({
        "$schema": dialect,
        "type": "object",
        "properties": {"head": {"$ref": "node.yaml"},
                       "tag": {"$ref": "tag.json#/$defs/t"}}}))
    (tmp_path / "tag.json").write_text(_json.dumps(
        {"$schema": dialect,
         "$defs": {"t": {"type": "string", "minLength": 2}}}))

    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "bundle",
         str(tmp_path / "root.json")],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode == 0, p.stderr
    bundled = _json.loads(p.stdout)
    # reference shape (bundle.cc): resources embedded under $defs keyed
    # by canonical URI, refs untouched, identifiers made explicit
    assert set(bundled["$defs"]) == {f"file://{tmp_path}/node.yaml",
                                     f"file://{tmp_path}/tag.json"}
    assert bundled["$id"] == f"file://{tmp_path}/root.json"
    assert bundled["properties"]["head"]["$ref"] == "node.yaml"
    assert bundled["properties"]["tag"]["$ref"] == "tag.json#/$defs/t"
    node = bundled["$defs"][f"file://{tmp_path}/node.yaml"]
    assert node["$id"] == f"file://{tmp_path}/node.yaml"
    assert node["properties"]["next"]["$ref"] == "node.yaml"

    from jsonschema_ray.spec.jschema import compile_schema
    cs = compile_schema(bundled)
    assert cs.is_valid({"head": {"v": 1, "next": {"v": 2}}, "tag": "ab"})
    assert not cs.is_valid({"head": {"v": 1, "next": {"v": "x"}}})
    assert not cs.is_valid({"tag": "a"})


def test_bundle_rejects_network_refs(tmp_path):
    import json as _json
    import subprocess
    import sys

    (tmp_path / "net.json").write_text(_json.dumps(
        {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "$ref": "https://example.com/schema.json"}))
    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "bundle",
         str(tmp_path / "net.json")],
        capture_output=True, text=True, cwd="/root/repo")
    # reference exit-4 schema-input-error family with its exact text
    assert p.returncode == 4
    assert "Could not resolve the reference to an external schema" \
        in p.stderr


def test_validate_trace_outputs_annotation_rows(ray_session, tmp_path):
    """--trace N prints pass AND fail outcome rows per (doc, rule)."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from jsonschema_ray.sources.synth import GenConfig, docs_table

    pq.write_table(docs_table(GenConfig(n_docs=40)),
                   str(tmp_path / "docs.parquet"))
    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "validate",
         str(tmp_path / "docs.parquet"), "--trace", "5",
         "--num-cpus", "2", "--limit", "0"],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode in (0, 2)
    trace_lines = [ln for ln in p.stderr.splitlines()
                   if "\t" in ln and ln.split("\t")[-1] in ("pass", "fail")]
    assert len(trace_lines) > 10
    outcomes = {ln.split("\t")[-1] for ln in trace_lines}
    assert "pass" in outcomes  # annotations, not just violations
    rules = {ln.split("\t")[1] for ln in trace_lines}
    assert "kind_enum" in rules and "offset_monotonic" in rules


def test_validate_single_instance_mode(tmp_path):
    """The reference's flagship UX (test/validate/fail_2020_12.sh):
    validate one JSON instance against a schema, exit 2 with per-error
    instance locations; no Ray session involved."""
    import json as _json
    import subprocess
    import sys

    (tmp_path / "schema.json").write_text(_json.dumps({
        "type": "object",
        "properties": {"foo": {"type": "string"}}}))
    (tmp_path / "bad.json").write_text('{"foo": 1}')
    (tmp_path / "good.json").write_text('{"foo": "x"}')

    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "validate",
         "--schema", str(tmp_path / "schema.json"),
         "--instance", str(tmp_path / "bad.json")],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode == 2
    assert 'instance location "/foo"' in p.stderr
    assert 'keyword "type"' in p.stderr

    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "validate",
         "--schema", str(tmp_path / "schema.json"),
         "--instance", str(tmp_path / "good.json")],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode == 0
    assert "ok:" in p.stderr


def test_validate_benchmark_loop(tmp_path):
    """--benchmark prints the reference's per-instance latency line
    'PATH: PASS|FAIL avg +- stdev us (overhead)' and keeps the exit-2
    verdict contract (test/validate/fail_benchmark.sh,
    command_validate.cc:83-133)."""
    import json as _json
    import re
    import subprocess
    import sys

    (tmp_path / "schema.json").write_text(_json.dumps({
        "type": "object",
        "properties": {"foo": {"type": "string"}}}))
    (tmp_path / "bad.json").write_text('{"foo": 1}')

    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "validate",
         "--schema", str(tmp_path / "schema.json"),
         "--instance", str(tmp_path / "bad.json"),
         "--benchmark", "--loop", "50"],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode == 2
    assert re.search(
        r"bad\.json: FAIL \d+\.\d+ \+- \d+\.\d+ us \(\d+\.\d+\)",
        p.stdout), p.stdout


def test_encode_decode_roundtrip(ray_session, tmp_path):
    """encode (JSONL→parquet, ratio printed) then decode back — the
    JSON BinPack analog pair (src/command_encode.cc:73-90)."""
    import json as _json
    import subprocess
    import sys

    rows = [{"doc_id": f"d{i}", "n": i} for i in range(200)]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(_json.dumps(r) for r in rows))

    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "encode", str(src),
         "-o", str(tmp_path / "enc"), "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode == 0, p.stderr
    stats = _json.loads(p.stdout.strip().splitlines()[-1])
    assert stats["original_bytes"] > 0 and stats["encoded_bytes"] > 0

    p = subprocess.run(
        [sys.executable, "-m", "jsonschema_ray", "decode",
         str(tmp_path / "enc"), "-o", "-", "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode == 0, p.stderr
    back = sorted((_json.loads(ln) for ln in p.stdout.splitlines()
                   if ln.strip()), key=lambda r: r["n"])
    assert back == rows


def test_validate_fail_fast_early_exit(tmp_path, ray_session):
    """--fail-fast: exit 2 with a capped head of violations instead of
    the exhaustive report; clean input exits 0."""
    import numpy as np
    import pyarrow.parquet as pq

    from jsonschema_ray.cli import main
    from jsonschema_ray.sources.synth import GenConfig, gen_docs_batch

    bad = tmp_path / "bad.parquet"
    pq.write_table(gen_docs_batch(
        np.arange(500, dtype=np.uint64), GenConfig(n_docs=500, seed=9)),
        str(bad))
    assert main(["validate", str(bad), "--fail-fast",
                 "--exclude", "media_ref_exists"]) == 2
    good = tmp_path / "good.parquet"
    pq.write_table(gen_docs_batch(
        np.arange(200, dtype=np.uint64),
        GenConfig(n_docs=200, seed=9, clean=True)), str(good))
    assert main(["validate", str(good), "--fail-fast",
                 "--exclude", "media_ref_exists"]) == 0


def test_scan_inputs_filters(tmp_path):
    """Directory scanner: extension + ignore semantics of the
    reference's traversal (src/input.h)."""
    from jsonschema_ray.state.manifest import scan_inputs

    (tmp_path / "sub" / "skip").mkdir(parents=True)
    (tmp_path / "a.json").write_text("{}")
    (tmp_path / "b.yaml").write_text("x: 1")
    (tmp_path / "c.txt").write_text("t")
    (tmp_path / "noext").write_text("n")
    (tmp_path / "empty.json").write_text("")      # empty → skipped
    (tmp_path / "sub" / "d.json").write_text("{}")
    (tmp_path / "sub" / "skip" / "e.json").write_text("{}")

    got = scan_inputs([str(tmp_path)], ignore=[str(tmp_path / "sub" / "skip")])
    rel = [p.split(str(tmp_path) + "/")[-1] for p in got]
    assert rel == ["a.json", "b.yaml", "sub/d.json"]
    got2 = scan_inputs([str(tmp_path)], extensions=["txt", ""])
    rel2 = [p.split(str(tmp_path) + "/")[-1] for p in got2]
    assert rel2 == ["c.txt", "noext"]
    # explicit file bypasses the extension filter, honors ignore
    assert scan_inputs([str(tmp_path / "c.txt")]) == [str(tmp_path / "c.txt")]
    assert scan_inputs([str(tmp_path / "c.txt")],
                       ignore=[str(tmp_path)]) == []


def test_validate_checked_reports_parse_positions(tmp_path):
    """validate --checked: malformed JSONL prints path:line:col and
    exits 1 before any validation runs (reference parse-error UX)."""
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"doc_id": 1}\n{"doc_id": oops}\n{"doc_id": 3}\n')
    r = run_cli("validate", str(bad), "--checked", "--num-cpus", "2",
                timeout=180)
    assert r.returncode == 1
    assert f"{bad}:2:" in r.stderr and "Expecting value" in r.stderr


def test_version_verb_parity():
    """version / --version / -v (reference src/main.cc:280-283)."""
    for flag in ("version", "--version", "-v"):
        r = run_cli(flag)
        assert r.returncode == 0 and r.stdout.strip(), flag


def test_fmt_schema_keyword_ordering(tmp_path):
    """fmt --schema reorders schema keywords per the reference rank
    table (core → metadata → refs → logic → type-family → $defs),
    recursively; property-name maps keep their order."""
    p = tmp_path / "s.json"
    p.write_text(json.dumps({
        "properties": {"z": {"minLength": 1, "type": "string"},
                       "a": {"type": "integer"}},
        "x-custom": 1,
        "required": ["a"],
        "title": "T",
        "$id": "https://example.com/s",
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "$defs": {"d": {"enum": [1], "const": 1}},
    }))
    assert run_cli("fmt", str(p), "--schema", "--check").returncode == 2
    assert run_cli("fmt", str(p), "--schema").returncode == 0
    out = json.loads(p.read_text())
    assert list(out) == ["$schema", "$id", "title", "x-custom", "type",
                         "required", "properties", "$defs"]
    assert list(out["properties"]) == ["z", "a"]  # data keys untouched
    assert list(out["properties"]["z"]) == ["type", "minLength"]
    assert list(out["$defs"]["d"]) == ["const", "enum"]
    assert run_cli("fmt", str(p), "--schema", "--check").returncode == 0
    # --keep-ordering: prettify without reordering
    q = tmp_path / "k.json"
    q.write_text('{"type": "string", "$schema": "x"}\n')
    run_cli("fmt", str(q), "--schema", "--keep-ordering")
    assert list(json.loads(q.read_text())) == ["type", "$schema"]


def test_lint_schema_fix_canonicalizes(tmp_path):
    """The reference lint driver: findings exit 2 with positions on
    stdout; --fix applies the blaze rule registry to a fixpoint with
    progress dots on stderr."""
    p = tmp_path / "s.json"
    p.write_text(json.dumps({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "Test",
        "description": "Test schema",
        "examples": [{}],
        "type": "object",
        "properties": {"a": {"enum": [1, 1]},
                       "b": {"not": {"not": {"type": "string"}}}},
        "allOf": [{"allOf": [{"minProperties": 0}]}, True],
    }))
    r = run_cli("lint", str(p))
    assert r.returncode == 2
    assert "(duplicate_enum_values)" in r.stdout
    assert "(double_negation_elimination)" in r.stdout
    r = run_cli("lint", str(p), "--fix")
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(p.read_text())
    assert out["properties"]["a"] == {"const": 1}
    assert out["properties"]["b"] == {"type": "string"}
    assert "allOf" not in out
    # idempotent: a second --fix applies nothing further
    r = run_cli("lint", str(p), "--fix")
    assert r.returncode == 0 and "." not in r.stderr
    # --exclude silences a named rule
    p2 = tmp_path / "s2.json"
    p2.write_text(json.dumps({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "description": "Test schema",
        "examples": [{}],
        "type": "object",
    }))
    r = run_cli("lint", str(p2))
    assert "(top_level_title)" in r.stdout
    r = run_cli("lint", str(p2), "-x", "top_level_title")
    assert "(top_level_title)" not in r.stdout


def test_upgrade_schema_verb(tmp_path):
    p = tmp_path / "old.json"
    p.write_text(json.dumps({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": "https://x.example/old",
        "definitions": {"d": {"type": "integer"}},
        "properties": {"a": {"$ref": "#/definitions/d"}},
        "items": [{"type": "string"}], "additionalItems": False,
        "dependencies": {"a": ["b"], "c": {"type": "object"}},
    }))
    r = run_cli("upgrade", "--schema", str(p), "-o",
                str(tmp_path / "new.json"))
    assert r.returncode == 0, r.stderr
    out = json.loads((tmp_path / "new.json").read_text())
    assert out["$schema"].endswith("2020-12/schema")
    assert out["$id"] == "https://x.example/old"
    assert out["prefixItems"] == [{"type": "string"}]
    assert out["items"] is False
    assert out["dependentRequired"] == {"a": ["b"]}
    assert out["dependentSchemas"] == {"c": {"type": "object"}}
    assert out["properties"]["a"]["$ref"] == "#/$defs/d"


def test_jsonschema_json_config_discovery(tmp_path):
    """jsonschema.json ancestor discovery: defaultDialect stamps
    $schema, resolve mappings make absolute-URI $refs work."""
    proj = tmp_path / "proj"
    (proj / "schemas").mkdir(parents=True)
    (proj / "jsonschema.json").write_text(json.dumps({
        "title": "proj",
        "defaultDialect": "https://json-schema.org/draft/2020-12/schema",
        "resolve": {"https://example.com/user": "./schemas/user.json"},
    }))
    (proj / "schemas" / "user.json").write_text(json.dumps({
        "type": "object", "properties": {"name": {"type": "string"}},
        "required": ["name"]}))
    (proj / "main.json").write_text(json.dumps({
        "$ref": "https://example.com/user"}))
    good = proj / "ok.json"
    good.write_text('{"name": "x"}')
    bad = proj / "bad.json"
    bad.write_text('{"name": 7}')
    r = run_cli("validate", "--schema", str(proj / "main.json"),
                "--instance", str(good))
    assert r.returncode == 0, r.stderr
    r = run_cli("validate", "--schema", str(proj / "main.json"),
                "--instance", str(bad))
    assert r.returncode == 2, r.stderr
    # discovery from a NESTED directory walks up to the project root
    nested = proj / "schemas" / "nested.json"
    nested.write_text(json.dumps({"$ref": "https://example.com/user"}))
    r = run_cli("validate", "--schema", str(nested),
                "--instance", str(good))
    assert r.returncode == 0, r.stderr


def test_config_extension_ignore_defaults(tmp_path):
    """validate picks up extension/ignore from jsonschema.json when the
    flags are absent (configuration.markdown traversal defaults)."""
    proj = tmp_path / "p"
    (proj / "data").mkdir(parents=True)
    (proj / "drafts").mkdir()
    (proj / "jsonschema.json").write_text(json.dumps({
        "extension": ["jsonl"], "ignore": ["./drafts"]}))
    (proj / "data" / "good.jsonl").write_text('{"doc_id": 1}\n')
    (proj / "data" / "skip.txt").write_text("not json\n")
    (proj / "drafts" / "bad.jsonl").write_text('{"doc_id": "broken"\n')
    plan = proj / "plan.json"
    plan.write_text(json.dumps({"mode": "exhaustive", "rules": [
        {"rule_id": "nonneg", "scope": "doc",
         "check": {"field": "doc_id", "op": "ge", "value": 0}}]}))
    # --checked would die on drafts/bad.jsonl if ignore weren't applied
    r = run_cli("validate", str(proj / "data"), "--checked",
                "--plan", str(plan), "--num-cpus", "2", timeout=240)
    assert r.returncode == 0, r.stderr
    assert "bad.jsonl" not in r.stderr
    assert json.loads(r.stdout)["violations"] == 0


def test_format_assertion_modes(tmp_path):
    """format is annotation by default; x-format-assertion: true or
    -F makes it assert (reference docs/validate.markdown:53-61,
    test/validate/fail_2020_12_x_format_assertion.sh)."""
    inst = tmp_path / "i.json"
    inst.write_text('{"email": "not-an-email"}')
    plain = tmp_path / "s1.json"
    plain.write_text(json.dumps({
        "type": "object",
        "properties": {"email": {"type": "string", "format": "email"}}}))
    opted = tmp_path / "s2.json"
    opted.write_text(json.dumps({
        "type": "object",
        "properties": {"email": {"type": "string", "format": "email",
                                 "x-format-assertion": True}}}))
    assert run_cli("validate", "--schema", str(plain),
                   "--instance", str(inst)).returncode == 0
    assert run_cli("validate", "--schema", str(plain), "-F",
                   "--instance", str(inst)).returncode == 2
    assert run_cli("validate", "--schema", str(opted),
                   "--instance", str(inst)).returncode == 2


def test_jsonl_instance_entry_semantics(tmp_path):
    """Instance-mode JSONL: per-entry validation, stop at the first
    failing entry with `(entry #N)` unless --continue
    (reference fail_jsonl_one.sh / fail_jsonl_all_continue.sh)."""
    schema = tmp_path / "s.json"
    schema.write_text(json.dumps({"type": "object"}))
    data = tmp_path / "i.jsonl"
    data.write_text('{ "foo": 1 }\n[ { "foo": 2 } ]\n"nope"\n{ "x": 3 }\n')
    r = run_cli("validate", "--schema", str(schema), "--instance",
                str(data))
    assert r.returncode == 2
    assert "(entry #2)" in r.stderr and "(entry #3)" not in r.stderr
    r = run_cli("validate", "--schema", str(schema), "--instance",
                str(data), "--continue")
    assert r.returncode == 2
    assert "(entry #2)" in r.stderr and "(entry #3)" in r.stderr
    ok = tmp_path / "ok.jsonl"
    ok.write_text('{ "a": 1 }\n{ "b": 2 }\n')
    r = run_cli("validate", "--schema", str(schema), "--instance", str(ok))
    assert r.returncode == 0 and "(2 entries)" in r.stderr


def test_schema_error_diagnostics_exit_one(tmp_path):
    """Bad schema/instance inputs exit 1 with a one-line `error:`
    diagnostic, never a traceback (fail_invalid_regex.sh,
    fail_invalid_ref.sh, fail_instance_invalid_json.sh)."""
    inst = tmp_path / "i.json"
    inst.write_text("{}")
    for content, needle in (
            ('{"pattern": "a["}', "invalid regular expression"),
            ('{"$ref": "#/nope"}', "Could not resolve schema reference"),
    ):
        s = tmp_path / "s.json"
        s.write_text(content)
        r = run_cli("validate", "--schema", str(s), "--instance",
                    str(inst))
        assert r.returncode == 1 and needle in r.stderr, r.stderr
        assert "Traceback" not in r.stderr
    bad = tmp_path / "bad.json"
    bad.write_text("{ nope")
    s = tmp_path / "s.json"
    s.write_text('{"type": "object"}')
    r = run_cli("validate", "--schema", str(s), "--instance", str(bad))
    assert r.returncode == 1 and "invalid JSON" in r.stderr


def test_validate_resolve_preimport(tmp_path):
    """-r/--resolve pre-imports external schemas (reference resolver):
    by declared $id and by path relative to the schema file."""
    (tmp_path / "schema.json").write_text(json.dumps({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "properties": {"a": {"$ref": "https://example.com/other"},
                       "b": {"$ref": "./sub/leaf.json"}}}))
    (tmp_path / "other.json").write_text(json.dumps({
        "$id": "https://example.com/other", "type": "integer"}))
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "leaf.json").write_text(json.dumps({"type": "string"}))
    good = tmp_path / "good.json"
    good.write_text('{"a": 1, "b": "x"}')
    bad = tmp_path / "bad.json"
    bad.write_text('{"a": "no", "b": 2}')
    base = ["validate", "--schema", str(tmp_path / "schema.json"),
            "-r", str(tmp_path / "other.json"),
            "-r", str(sub / "leaf.json")]
    assert run_cli(*base, "--instance", str(good)).returncode == 0
    r = run_cli(*base, "--instance", str(bad))
    assert r.returncode == 2
    # without the pre-import the external ref must be a clean error
    r2 = run_cli("validate", "--schema", str(tmp_path / "schema.json"),
                 "--instance", str(good))
    assert r2.returncode == 1


def test_curate_verb_resumable(tmp_path, ray_session):
    import glob
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.cli import main

    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"the cat and dog have fun with food {i}"
                          for i in range(20)])}), p)
    out = str(tmp_path / "out")
    assert main(["curate", p, "--op", "gopher", "--out", out,
                 "--shard-size", "1"]) == 0
    man = json.load(open(glob.glob(out + "/shard=*/manifest.json")[0]))
    assert man["docs"] == 20 and "curate/gopher" in man["plan_hash"]
    # resume: skipped, nothing recomputed
    assert main(["curate", p, "--op", "gopher", "--out", out,
                 "--shard-size", "1"]) == 0
    files = glob.glob(out + "/shard=*/*.parquet")
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert "passes" in t.column_names and t.num_rows == 20
    # a second op writes to its own dir with its own fingerprint
    out2 = str(tmp_path / "out2")
    assert main(["curate", p, "--op", "normalize", "--out", out2]) == 0
    t2 = pa.concat_tables([pq.read_table(f) for f in
                           glob.glob(out2 + "/shard=*/*.parquet")])
    assert "norm_text" in t2.column_names and t2.num_rows == 20
