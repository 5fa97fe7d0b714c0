"""Template-emitter checks beyond the reference corpus: the broader
keyword set must compile to templates the PUBLIC blaze JavaScript port
(vendor/blaze/ports/javascript) evaluates with correct semantics, and
unsupported evaluation keywords must reject loudly instead of emitting
a wrongly-permissive template."""

import json
import shutil
import subprocess

import pytest

from jsonschema_ray.spec.compile_template import (TemplateError,
                                                  compile_template)

RICH_SCHEMA = {
    "$id": "https://example.com/rich",
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["name", "tags"],
    "properties": {
        "name": {"type": "string", "minLength": 2, "maxLength": 10,
                 "pattern": "^[A-Z]"},
        "age": {"type": "integer", "minimum": 0, "maximum": 150},
        "kind": {"enum": ["a", "b", 3]},
        "ratio": {"type": "number", "exclusiveMinimum": 0,
                  "multipleOf": 0.5},
        "tags": {"type": "array", "minItems": 1, "maxItems": 3,
                 "uniqueItems": True, "items": {"type": "string"}},
        "meta": {"type": "object", "minProperties": 1,
                 "propertyNames": {"pattern": "^[a-z]+$"}},
        "choice": {"anyOf": [{"type": "string"}, {"type": "integer"}]},
        "exact": {"oneOf": [{"type": "string"}, {"const": 5}]},
        "neg": {"not": {"type": "string"}},
        "cond": {"if": {"type": "integer"}, "then": {"minimum": 10},
                 "else": {"type": "string"}},
    },
}

CASES = [
    ({"name": "Bob", "tags": ["x"]}, True),
    ({"name": "Bob"}, False),                      # missing required
    ({"name": "b", "tags": ["x"]}, False),         # minLength+pattern
    ({"name": "Bobbbbbbbbbb", "tags": ["x"]}, False),
    ({"name": "Bob", "tags": []}, False),          # minItems
    ({"name": "Bob", "tags": ["x", "x"]}, False),  # uniqueItems
    ({"name": "Bob", "tags": [1]}, False),         # items type
    ({"name": "Bob", "tags": ["x"], "age": 30}, True),
    ({"name": "Bob", "tags": ["x"], "age": -1}, False),
    ({"name": "Bob", "tags": ["x"], "kind": 3}, True),
    ({"name": "Bob", "tags": ["x"], "kind": "z"}, False),
    ({"name": "Bob", "tags": ["x"], "ratio": 1.5}, True),
    ({"name": "Bob", "tags": ["x"], "ratio": 0}, False),
    ({"name": "Bob", "tags": ["x"], "ratio": 0.3}, False),
    ({"name": "Bob", "tags": ["x"], "meta": {"ok": 1}}, True),
    ({"name": "Bob", "tags": ["x"], "meta": {}}, False),
    ({"name": "Bob", "tags": ["x"], "meta": {"BAD": 1}}, False),
    ({"name": "Bob", "tags": ["x"], "choice": []}, False),
    ({"name": "Bob", "tags": ["x"], "exact": 5}, True),
    ({"name": "Bob", "tags": ["x"], "exact": 6}, False),
    ({"name": "Bob", "tags": ["x"], "neg": 4}, True),
    ({"name": "Bob", "tags": ["x"], "neg": "s"}, False),
    ({"name": "Bob", "tags": ["x"], "cond": 15}, True),
    ({"name": "Bob", "tags": ["x"], "cond": 5}, False),
    ({"name": "Bob", "tags": ["x"], "cond": "s"}, True),
]

BLAZE_JS = "/root/reference/vendor/blaze/ports/javascript/index.mjs"


@pytest.mark.skipif(shutil.which("node") is None, reason="node missing")
def test_rich_template_executes_through_blaze_js_port(tmp_path):
    template = compile_template(RICH_SCHEMA,
                                default_id="file:///x/schema.json")
    (tmp_path / "template.json").write_text(json.dumps(template))
    script = tmp_path / "check.mjs"
    checks = "".join(
        f"assert.equal(ev.validate({json.dumps(inst)}), "
        f"{str(want).lower()}, {json.dumps(json.dumps(inst))});\n"
        for inst, want in CASES)
    script.write_text(
        'import { strict as assert } from "node:assert";\n'
        'import { readFileSync } from "node:fs";\n'
        f'import {{ Blaze }} from "{BLAZE_JS}";\n'
        'const template = JSON.parse(readFileSync('
        f'"{tmp_path}/template.json", "utf-8"));\n'
        'const ev = new Blaze(template);\n'
        + checks + 'console.log("OK");\n')
    r = subprocess.run(["node", str(script)], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_unsupported_keywords_reject_loudly():
    with pytest.raises(TemplateError):
        compile_template(
            {"$schema": "https://json-schema.org/draft/2020-12/schema",
             "$dynamicRef": "#meta"},
            default_id="file:///x/s.json")
