"""Differential check: the compile verb's emitted blaze template must
agree with the engine's own evaluator (`jschema.compile_schema`) on
random schema/instance pairs, executed through the PUBLIC blaze
JavaScript port under node (one batched node invocation)."""

import json
import random
import shutil
import subprocess

import pytest

from jsonschema_ray.spec.compile_template import (TemplateError,
                                                  compile_template)
from jsonschema_ray.spec.jschema import compile_schema

BLAZE_JS = "/root/reference/vendor/blaze/ports/javascript/index.mjs"

_TYPES = ["null", "boolean", "string", "integer", "number", "array",
          "object"]
_PATTERNS = ["a", "^b", "c$", "[ax]", "^[A-Z]"]


def _scalar(rng):
    return rng.choice([
        None, True, False, rng.randint(-50, 50),
        round(rng.uniform(-4, 4), 2),
        rng.choice(["", "a", "bc", "Axy", "ca", "0é"])])


def _value(rng, depth=2):
    r = rng.random()
    if depth == 0 or r < 0.55:
        return _scalar(rng)
    if r < 0.8:
        return [_value(rng, depth - 1) for _ in range(rng.randint(0, 3))]
    return {rng.choice("abxy"): _value(rng, depth - 1)
            for _ in range(rng.randint(0, 3))}


def _leaf_schema(rng):
    pick = rng.randint(0, 11)
    if pick == 0:
        return {"type": rng.choice(_TYPES)}
    if pick == 1:
        return {"const": _scalar(rng)}
    if pick == 2:
        return {"enum": [_scalar(rng)
                         for _ in range(rng.randint(1, 4))]}
    if pick == 3:
        return {"minimum": rng.randint(-20, 20)}
    if pick == 4:
        return {"maximum": rng.randint(-20, 20)}
    if pick == 5:
        return {"minLength": rng.randint(0, 4)}
    if pick == 6:
        return {"maxLength": rng.randint(0, 5)}
    if pick == 7:
        return {"minItems": rng.randint(0, 3)}
    if pick == 8:
        return {"maxProperties": rng.randint(0, 3)}
    if pick == 9:
        return {"pattern": rng.choice(_PATTERNS)}
    if pick == 10:
        return {"uniqueItems": True}
    return {"multipleOf": rng.choice([1, 2, 0.5])}


def _schema(rng, depth=2):
    if depth == 0 or rng.random() < 0.4:
        return _leaf_schema(rng)
    pick = rng.randint(0, 6)
    if pick == 0:
        return {"allOf": [_schema(rng, depth - 1)
                          for _ in range(rng.randint(1, 3))]}
    if pick == 1:
        return {"anyOf": [_schema(rng, depth - 1)
                          for _ in range(rng.randint(1, 3))]}
    if pick == 2:
        return {"not": _schema(rng, depth - 1)}
    if pick == 3:
        return {"items": _schema(rng, depth - 1)}
    if pick == 4:
        props = {name: _schema(rng, depth - 1)
                 for name in rng.sample("abxy", rng.randint(1, 2))}
        out = {"properties": props}
        if rng.random() < 0.5:
            out["required"] = sorted(rng.sample(list(props),
                                                rng.randint(0, len(props))))
        if rng.random() < 0.3:
            out["type"] = "object"
        return out
    if pick == 5:
        return {"if": _schema(rng, depth - 1),
                "then": _schema(rng, depth - 1),
                "else": _schema(rng, depth - 1)}
    if pick == 6 and rng.random() < 0.5:
        deps = {}
        for name in rng.sample("abxy", rng.randint(1, 2)):
            deps[name] = (sorted(rng.sample("abxy", rng.randint(1, 2)))
                          if rng.random() < 0.6
                          else _schema(rng, depth - 1))
        out = {"dependentRequired" if all(
            isinstance(d, list) for d in deps.values())
            else "dependentSchemas": deps}
        if "dependentSchemas" in out and any(
                isinstance(d, list) for d in deps.values()):
            out = {"dependentSchemas": {
                k: d for k, d in deps.items()
                if not isinstance(d, list)}}
        return out
    return {"oneOf": [_schema(rng, depth - 1)
                      for _ in range(rng.randint(1, 3))]}


@pytest.mark.skipif(shutil.which("node") is None, reason="node missing")
def test_template_matches_engine_verdicts(tmp_path):
    rng = random.Random(20260819)
    cases = []
    while len(cases) < 400:
        schema = dict(_schema(rng))
        schema["$schema"] = "https://json-schema.org/draft/2020-12/schema"
        try:
            checker = compile_schema(schema)
            template = compile_template(
                schema, default_id="file:///x/schema.json")
        except (TemplateError, ValueError):
            continue
        instance = _value(rng)
        try:
            want = bool(checker.is_valid(instance))
        except Exception:   # noqa: BLE001 — engine rejects: skip
            continue
        cases.append((template, instance, want))

    payload = [{"template": t, "instance": i, "want": w}
               for t, i, w in cases]
    (tmp_path / "cases.json").write_text(json.dumps(payload))
    script = tmp_path / "diff.mjs"
    script.write_text(f"""
import {{ readFileSync }} from "node:fs";
import {{ Blaze }} from "{BLAZE_JS}";
const cases = JSON.parse(readFileSync("{tmp_path}/cases.json", "utf-8"));
const bad = [];
for (let k = 0; k < cases.length; k++) {{
  const c = cases[k];
  let got;
  try {{
    got = new Blaze(c.template).validate(c.instance);
  }} catch (e) {{
    bad.push([k, "throw: " + e.message]);
    continue;
  }}
  if (got !== c.want) bad.push([k, "got " + got + " want " + c.want]);
}}
console.log(JSON.stringify(bad));
""")
    r = subprocess.run(["node", str(script)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    bad = json.loads(r.stdout.strip().splitlines()[-1])
    detail = [(k, msg, payload[k]["instance"]) for k, msg in bad[:5]]
    assert not bad, f"{len(bad)}/{len(cases)} divergences; first: {detail}"


def _uschema(rng, depth=2):
    """Schema generator biased toward unevaluatedProperties/Items
    interplay with branch applicators (the evaluation-tracking paths
    of the template emitter)."""
    def leaf():
        p = rng.randint(0, 4)
        if p == 0:
            return {"type": rng.choice(_TYPES)}
        if p == 1:
            return {"const": _scalar(rng)}
        if p == 2:
            return {"minimum": rng.randint(-5, 5)}
        if p == 3:
            return True
        return {"minLength": rng.randint(0, 3)}

    s = {}
    if rng.random() < 0.6:
        s["properties"] = {k: leaf()
                           for k in rng.sample("abxy", rng.randint(1, 2))}
    if rng.random() < 0.3:
        s["patternProperties"] = {rng.choice(["^a", "x"]): leaf()}
    if rng.random() < 0.25:
        s["additionalProperties"] = rng.choice([True, False, leaf()])
    if rng.random() < 0.4:
        s["prefixItems"] = [leaf() for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.35:
        s["items"] = rng.choice([True, False, leaf()])
    if rng.random() < 0.25:
        s["contains"] = leaf()
    if depth > 0 and rng.random() < 0.6:
        comb = rng.choice(["allOf", "anyOf", "oneOf", "if"])
        if comb == "if":
            s["if"] = _uschema(rng, depth - 1)
            s["then"] = _uschema(rng, depth - 1)
            if rng.random() < 0.5:
                s["else"] = _uschema(rng, depth - 1)
        else:
            s[comb] = [_uschema(rng, depth - 1)
                       for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.7:
        s["unevaluatedProperties"] = rng.choice([False, leaf()])
    if rng.random() < 0.5:
        s["unevaluatedItems"] = rng.choice([False, leaf()])
    if rng.random() < 0.15:
        s["not"] = _uschema(rng, depth - 1) if depth else leaf()
    return s or {"unevaluatedProperties": False}


# Canonical scope cases from the official-suite semantics the engine
# pins: cousin invisibility, nested override, if/then visibility.
_UNEVAL_FIXED = [
    ({"allOf": [{"properties": {"foo": True}}],
      "unevaluatedProperties": False}, {"foo": 1}, True),
    ({"allOf": [{"properties": {"foo": True}},
                {"unevaluatedProperties": False}]}, {"foo": 1}, False),
    ({"allOf": [{"unevaluatedProperties": True},
                {"unevaluatedProperties": False}]}, {"b": 1}, False),
    ({"if": {"properties": {"foo": {"const": 1}}},
      "then": {"properties": {"bar": True}},
      "unevaluatedProperties": False}, {"foo": 1, "bar": 2}, True),
    ({"if": {"properties": {"foo": {"const": 1}}},
      "then": {"properties": {"bar": True}},
      "unevaluatedProperties": False}, {"foo": 2, "bar": 2}, False),
    ({"prefixItems": [True], "unevaluatedItems": False}, [1, 2], False),
    ({"prefixItems": [True], "unevaluatedItems": False}, [1], True),
    ({"allOf": [{"prefixItems": [True, True]}],
      "unevaluatedItems": False}, [1, 2], True),
    ({"contains": {"type": "string"}, "unevaluatedItems": False},
     ["a", "b"], True),
    ({"contains": {"type": "string"}, "unevaluatedItems": False},
     ["a", 1], False),
    ({"anyOf": [{"properties": {"a": {"type": "integer"}}},
                {"properties": {"b": True}, "required": ["b"]}],
      "unevaluatedProperties": False}, {"a": 1}, True),
    ({"anyOf": [{"properties": {"a": {"type": "string"}},
                 "required": ["a"]},
                {"properties": {"b": True}}],
      "unevaluatedProperties": False}, {"a": 1}, False),
]


@pytest.mark.skipif(shutil.which("node") is None, reason="node missing")
def test_unevaluated_templates_match_engine(tmp_path):
    rng = random.Random(20260820)
    cases = []
    for schema, inst, want in _UNEVAL_FIXED:
        s = dict(schema)
        s["$schema"] = "https://json-schema.org/draft/2020-12/schema"
        checker = compile_schema(s)
        assert bool(checker.is_valid(inst)) is want, (s, inst)
        for fast in (False, True):
            tmpl = compile_template(s, default_id="file:///x/s.json",
                                    fast=fast)
            cases.append((tmpl, inst, want))
    while len(cases) < 300:
        schema = _uschema(rng)
        schema["$schema"] = \
            "https://json-schema.org/draft/2020-12/schema"
        fast = rng.random() < 0.4
        try:
            checker = compile_schema(schema)
            template = compile_template(
                schema, default_id="file:///x/schema.json", fast=fast)
        except (TemplateError, ValueError):
            continue
        instance = _value(rng, 3)
        try:
            want = bool(checker.is_valid(instance))
        except Exception:   # noqa: BLE001 — engine rejects: skip
            continue
        cases.append((template, instance, want))

    payload = [{"template": t, "instance": i, "want": w}
               for t, i, w in cases]
    (tmp_path / "ucases.json").write_text(json.dumps(payload))
    script = tmp_path / "udiff.mjs"
    script.write_text(f"""
import {{ readFileSync }} from "node:fs";
import {{ Blaze }} from "{BLAZE_JS}";
const cases = JSON.parse(readFileSync("{tmp_path}/ucases.json", "utf-8"));
const bad = [];
for (let k = 0; k < cases.length; k++) {{
  const c = cases[k];
  let got;
  try {{
    got = new Blaze(c.template).validate(c.instance);
  }} catch (e) {{
    bad.push([k, "throw: " + e.message]);
    continue;
  }}
  if (got !== c.want) bad.push([k, "got " + got + " want " + c.want]);
}}
console.log(JSON.stringify(bad));
""")
    r = subprocess.run(["node", str(script)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    bad = json.loads(r.stdout.strip().splitlines()[-1])
    detail = [(k, msg, payload[k]["instance"]) for k, msg in bad[:5]]
    assert not bad, f"{len(bad)}/{len(cases)} divergences; first: {detail}"


# $dynamicRef / $recursiveRef templates: bookended anchors jump to the
# outermost dynamic-scope declaration; non-bookended refs stay static.
_TREE = {"$schema": "https://json-schema.org/draft/2020-12/schema",
         "$id": "https://ex.example/tree", "$dynamicAnchor": "node",
         "type": "object",
         "properties": {"data": True,
                        "children": {"type": "array",
                                     "items": {"$dynamicRef": "#node"}}}}
_DYN_CASES = [
    ({"$schema": "https://json-schema.org/draft/2020-12/schema",
      "$id": "https://ex.example/root", "$dynamicAnchor": "node",
      "type": "object",
      "properties": {"data": True,
                     "children": {"type": "array",
                                  "items": {"$dynamicRef": "#node"}}}},
     None,
     [({"children": [{"children": []}]}, True),
      ({"children": [5]}, False),
      ({"children": [{"children": [{"data": 1}]}]}, True)]),
    ({"$schema": "https://json-schema.org/draft/2019-09/schema",
      "$recursiveAnchor": True, "type": "object",
      "properties": {"child": {"$recursiveRef": "#"}}},
     None,
     [({"child": {"child": {}}}, True), ({"child": 3}, False),
      ({}, True)]),
    # the spec's strict-tree: the outer resource re-declares the node
    # anchor, so every recursive jump lands on the strict variant
    ({"$schema": "https://json-schema.org/draft/2020-12/schema",
      "$id": "https://ex.example/strict-tree",
      "$dynamicAnchor": "node",
      "$ref": "https://ex.example/tree",
      "unevaluatedProperties": False},
     {"https://ex.example/tree": _TREE},
     [({"children": [{"daat": 1}]}, False),
      ({"children": [{"data": 1}]}, True),
      ({"children": [{"children": [{"daat": 1}]}]}, False)]),
    # non-bookended: $dynamicRef to a plain $anchor behaves statically
    ({"$schema": "https://json-schema.org/draft/2020-12/schema",
      "$id": "https://ex.example/nb",
      "$defs": {"x": {"$anchor": "thing", "type": "integer"}},
      "properties": {"v": {"$dynamicRef": "#thing"}}},
     None, [({"v": 3}, True), ({"v": "s"}, False)]),
    # $recursiveRef without the bookend: static jump to the root
    ({"$schema": "https://json-schema.org/draft/2019-09/schema",
      "type": "object",
      "properties": {"child": {"$recursiveRef": "#"}}},
     None, [({"child": {}}, True), ({"child": 3}, False)]),
    # dynamic anchor declared at a non-root pointer
    ({"$schema": "https://json-schema.org/draft/2020-12/schema",
      "$defs": {"x": {"$dynamicAnchor": "leaf", "type": "string"}},
      "properties": {"v": {"$dynamicRef": "#leaf"}}},
     None, [({"v": "ok"}, True), ({"v": 7}, False)]),
]


@pytest.mark.skipif(shutil.which("node") is None, reason="node missing")
def test_dynamic_ref_templates_match_engine(tmp_path):
    payload = []
    for schema, resources, pairs in _DYN_CASES:
        checker = compile_schema(schema, resources=resources)
        for inst, want in pairs:
            assert bool(checker.is_valid(inst)) is want, (schema, inst)
            for fast in (False, True):
                tmpl = compile_template(
                    schema, default_id="file:///x/s.json",
                    resources=resources, fast=fast)
                payload.append({"template": tmpl, "instance": inst,
                                "want": want})
    (tmp_path / "dcases.json").write_text(json.dumps(payload))
    script = tmp_path / "ddiff.mjs"
    script.write_text(f"""
import {{ readFileSync }} from "node:fs";
import {{ Blaze }} from "{BLAZE_JS}";
const cases = JSON.parse(readFileSync("{tmp_path}/dcases.json", "utf-8"));
const bad = [];
for (let k = 0; k < cases.length; k++) {{
  const c = cases[k];
  let got;
  try {{
    got = new Blaze(c.template).validate(c.instance);
  }} catch (e) {{
    bad.push([k, "throw: " + e.message]);
    continue;
  }}
  if (got !== c.want) bad.push([k, "got " + got + " want " + c.want]);
}}
console.log(JSON.stringify(bad));
""")
    r = subprocess.run(["node", str(script)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    bad = json.loads(r.stdout.strip().splitlines()[-1])
    assert not bad, f"{len(bad)}/{len(payload)} divergences: {bad[:5]}"
