"""TypeScript type emitter (codegen --target typescript)."""
import json
import subprocess
import sys

from jsonschema_ray.spec.codegen_ts import schema_to_typescript


def test_primitives_and_literals():
    assert "export type Schema = string;" in \
        schema_to_typescript({"type": "string"})
    assert "number" in schema_to_typescript({"type": "integer"})
    assert schema_to_typescript({"const": "x"}).strip() == \
        'export type Schema = "x";'
    assert '"a" | "b" | 3' in \
        schema_to_typescript({"enum": ["a", "b", 3]})
    assert "never" in schema_to_typescript(False)
    assert "unknown" in schema_to_typescript(True)


def test_object_array_shapes():
    ts = schema_to_typescript({
        "type": "object",
        "properties": {"a": {"type": "string"},
                       "b": {"type": "array",
                             "items": {"type": "integer"}},
                       "weird-key": {"type": "null"}},
        "required": ["a"],
    })
    assert "a: string;" in ts
    assert "b?: number[];" in ts
    assert '"weird-key"?: null;' in ts
    # tuples
    ts2 = schema_to_typescript({"prefixItems": [{"type": "string"},
                                                {"type": "number"}],
                                "items": False})
    assert "[string, number]" in ts2
    ts3 = schema_to_typescript({"prefixItems": [{"type": "string"}],
                                "items": {"type": "boolean"}})
    assert "[string, ...boolean[]]" in ts3


def test_combinators_and_refs():
    ts = schema_to_typescript({
        "$defs": {"point": {"type": "object",
                            "properties": {"x": {"type": "number"}},
                            "required": ["x"]}},
        "anyOf": [{"$ref": "#/$defs/point"}, {"type": "null"}],
    }, name="Shape")
    assert "export type Point = { x: number; };" in ts
    assert "export type Shape = (Point | null);" in ts
    # allOf intersection
    ts2 = schema_to_typescript({"allOf": [
        {"type": "object", "properties": {"a": {"type": "string"}},
         "required": ["a"]},
        {"type": "object", "properties": {"b": {"type": "number"}},
         "required": ["b"]}]})
    assert "&" in ts2 and "a: string;" in ts2 and "b: number;" in ts2


def test_cli_codegen_typescript(tmp_path):
    p = tmp_path / "s.json"
    p.write_text(json.dumps({"type": "object",
                             "properties": {"id": {"type": "integer"}},
                             "required": ["id"]}))
    r = subprocess.run([sys.executable, "-m", "jsonschema_ray", "codegen",
                        "--schema", "--target", "typescript",
                        "--name", "Doc", str(p)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "export type Doc = { id: number; };" in r.stdout
