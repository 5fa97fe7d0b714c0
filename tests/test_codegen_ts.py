"""TypeScript type emitter (codegen --target typescript) — the
reference's named-declaration style (codegen_typescript.cc): every
subschema becomes one export, dependencies first."""
import json
import subprocess
import sys

from jsonschema_ray.spec.codegen_ts import schema_to_typescript


def test_primitives_and_literals():
    assert schema_to_typescript({"type": "string"}) \
        == "export type Schema = string;\n"
    assert schema_to_typescript({"type": "integer"}) \
        == "export type Schema = number;\n"
    assert schema_to_typescript({"const": "x"}) \
        == 'export type Schema = "x";\n'
    assert schema_to_typescript({"enum": ["a", "b", 3]}) \
        == 'export type Schema = "a" | "b" | 3;\n'
    assert schema_to_typescript(False) == "export type Schema = never;\n"
    assert schema_to_typescript(True) == "export type Schema = unknown;\n"
    # canonicalizer special cases
    assert schema_to_typescript({"enum": [None]}) \
        == "export type Schema = null;\n"
    assert schema_to_typescript({"enum": [True, False]}) \
        == "export type Schema = boolean;\n"


def test_object_array_shapes():
    ts = schema_to_typescript({
        "type": "object",
        "properties": {"a": {"type": "string"},
                       "b": {"type": "array",
                             "items": {"type": "integer"}},
                       "weird-key": {"type": "null"}},
        "required": ["a"],
    })
    # one named declaration per property subschema, reverse-pointer order
    assert 'export type SchemaA = string;' in ts
    assert 'export type SchemaB = SchemaBItems[];' in ts
    assert 'export type SchemaBItems = number;' in ts
    assert 'export type SchemaWeirdKey = null;' in ts
    assert '"a": SchemaA;' in ts
    assert '"b"?: SchemaB;' in ts
    assert '"weird-key"?: SchemaWeirdKey;' in ts
    assert "[key: string]: unknown | undefined;" in ts
    # dependencies (deeper pointers) come before the root interface
    assert ts.index("SchemaBItems =") < ts.index("export interface Schema ")
    # tuples
    ts2 = schema_to_typescript({"prefixItems": [{"type": "string"},
                                                {"type": "number"}]})
    assert "export type Schema = [Schema_0, Schema_1];" in ts2
    # a false items still spreads (as never[]), per the reference
    ts2b = schema_to_typescript({"prefixItems": [{"type": "string"}],
                                 "items": False})
    assert "export type Schema = [Schema_0, ...SchemaItems[]];" in ts2b
    assert "export type SchemaItems = never;" in ts2b
    ts3 = schema_to_typescript({"prefixItems": [{"type": "string"}],
                                "items": {"type": "boolean"}})
    assert "export type Schema = [Schema_0, ...SchemaItems[]];" in ts3


def test_combinators_and_refs():
    ts = schema_to_typescript({
        "$defs": {"point": {"type": "object",
                            "properties": {"x": {"type": "number"}},
                            "required": ["x"],
                            "additionalProperties": False}},
        "anyOf": [{"$ref": "#/$defs/point"}, {"type": "null"}],
    }, name="Shape")
    assert "export interface ShapePoint {" in ts
    assert '"x": ShapePointX;' in ts
    assert "export type Shape_0 = ShapePoint;" in ts   # the $ref branch
    assert "export type Shape_1 = null;" in ts
    assert "export type Shape =\n  Shape_0 |\n  Shape_1;" in ts
    # allOf intersection
    ts2 = schema_to_typescript({"allOf": [
        {"type": "object", "properties": {"a": {"type": "string"}},
         "required": ["a"]},
        {"type": "object", "properties": {"b": {"type": "number"}},
         "required": ["b"]}]})
    assert "export type Schema =\n  Schema_0 &\n  Schema_1;" in ts2


def test_record_and_index_signatures():
    # closed empty object → Record via typed additionalProperties
    ts = schema_to_typescript({"type": "object",
                               "additionalProperties": {"type": "string"}})
    assert ts.startswith("export type SchemaAdditionalProperties = string;")
    assert "export type Schema = Record<string, "\
        "SchemaAdditionalProperties>;" in ts
    ts2 = schema_to_typescript({"type": "object"})
    assert "export type Schema = Record<string, unknown>;" in ts2


def test_cli_codegen_typescript(tmp_path):
    p = tmp_path / "s.json"
    p.write_text(json.dumps(
        {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "type": "object",
         "properties": {"id": {"type": "integer"}},
         "required": ["id"],
         "additionalProperties": False}))
    r = subprocess.run([sys.executable, "-m", "jsonschema_ray", "codegen",
                        "--schema", "--target", "typescript",
                        "--name", "Doc", str(p)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "export type DocId = number;" in r.stdout
    assert 'export interface Doc {\n  "id": DocId;\n}' in r.stdout
