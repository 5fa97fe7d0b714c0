"""JSON Schema front-end tests (spec/jschema.py).

Fixture style mirrors the reference's validate test corpus
(``/root/reference/test/validate/pass_2020_12*.sh`` / ``fail_2020_12.sh``:
a schema, an instance, an expected verdict) — cases are hand-written
here, per keyword family, so the evaluator has an oracle independent of
the engine code. The columnar path (``schema_to_plan``) is then
differential-tested against the per-row evaluator on structured rows.
"""

import json

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.spec.compile import CompiledRowChecker
from jsonschema_ray.spec.jschema import compile_schema, schema_to_plan
from jsonschema_ray.spec.plan import CheckPlan, Rule

# ---------------------------------------------------------------------------
# keyword-family fixtures: (schema, valid instances, invalid instances)
# ---------------------------------------------------------------------------

CASES = [
    # type
    ({"type": "integer"}, [1, -3, 2.0], [1.5, "1", True, None, [], {}]),
    ({"type": ["string", "null"]}, ["a", None], [1, False]),
    ({"type": "number"}, [1, 1.5], [True, "1"]),
    ({"type": "boolean"}, [True, False], [0, 1, "true"]),
    # enum / const (JSON equality: 1 == 1.0, true != 1)
    ({"enum": [1, "a", [2]]}, [1, 1.0, "a", [2]], [True, "b", [2, 3]]),
    ({"const": {"a": 1}}, [{"a": 1}, {"a": 1.0}], [{"a": 2}, {"a": 1, "b": 2}]),
    ({"const": True}, [True], [1, 1.0]),
    # numeric
    ({"minimum": 2, "maximum": 4}, [2, 4, 3.5, "x"], [1.9, 5]),
    ({"exclusiveMinimum": 2}, [2.1, "x"], [2, 1]),
    ({"exclusiveMaximum": 2}, [1.9], [2, 3]),
    ({"multipleOf": 0.5}, [1, 1.5, 0], [1.3]),
    # string
    ({"minLength": 2, "maxLength": 3}, ["ab", "abc", 5], ["a", "abcd"]),
    ({"pattern": "b+c"}, ["abcd", "bc", 7], ["b", "ac"]),
    ({"format": "ipv4", "x-format-assertion": True},
     ["1.2.3.4", 9], ["1.2.3.256", "a.b.c.d"]),
    # format WITHOUT the assertion opt-in is an annotation: all pass
    ({"format": "ipv4"}, ["1.2.3.4", "not-an-ip", 9], []),
    # object
    ({"required": ["a"]}, [{"a": 1}, {"a": None}, 3], [{}, {"b": 1}]),
    ({"properties": {"a": {"type": "integer"}}}, [{"a": 1}, {}, {"b": "x"}],
     [{"a": "s"}]),
    ({"patternProperties": {"^x_": {"type": "integer"}}},
     [{"x_a": 1, "other": "s"}], [{"x_a": "s"}]),
    ({"properties": {"a": True}, "additionalProperties": False},
     [{"a": 99}, {}], [{"b": 1}, {"a": 1, "b": 2}]),
    ({"properties": {"a": True}, "additionalProperties": {"type": "integer"}},
     [{"a": "s", "b": 3}], [{"b": "s"}]),
    ({"propertyNames": {"maxLength": 2}}, [{"ab": 1}], [{"abc": 1}]),
    ({"minProperties": 1, "maxProperties": 2}, [{"a": 1}, {"a": 1, "b": 2}],
     [{}, {"a": 1, "b": 2, "c": 3}]),
    ({"dependentRequired": {"a": ["b"]}}, [{"a": 1, "b": 2}, {"c": 3}],
     [{"a": 1}]),
    ({"dependentSchemas": {"a": {"required": ["b"]}}},
     [{"a": 1, "b": 2}, {"c": 3}], [{"a": 1}]),
    # array
    ({"items": {"type": "integer"}}, [[1, 2], []], [[1, "s"]]),
    ({"prefixItems": [{"type": "string"}], "items": {"type": "integer"}},
     [["a", 1, 2], ["a"], []], [[1], ["a", "b"]]),
    ({"minItems": 1, "maxItems": 2}, [[1], [1, 2]], [[], [1, 2, 3]]),
    ({"uniqueItems": True}, [[1, "1", [2]], []], [[1, 1.0], [[2], [2]]]),
    ({"contains": {"type": "string"}, "minContains": 2, "maxContains": 3},
     [["a", "b", 1], ["a", "b", "c"]], [["a", 1], ["a", "b", "c", "d"]]),
    # applicators
    ({"allOf": [{"minimum": 2}, {"maximum": 4}]}, [3], [1, 5]),
    ({"anyOf": [{"type": "string"}, {"minimum": 5}]}, ["s", 6], [2]),
    ({"oneOf": [{"type": "integer"}, {"type": "number", "minimum": 5}]},
     [3, 5.5], [6, "s"]),
    ({"not": {"type": "string"}}, [1, []], ["s"]),
    ({"if": {"type": "string"}, "then": {"minLength": 2}, "else": {"minimum": 0}},
     ["ab", 3], ["a", -1]),
    # boolean schemas
    (True, [1, None, {}], []),
    (False, [], [1, None, {}]),
    # $ref / $defs
    ({"$defs": {"pos": {"minimum": 0}}, "$ref": "#/$defs/pos"}, [1, 0], [-1]),
    ({"$defs": {"pos": {"$anchor": "pos", "minimum": 0}}, "$ref": "#pos"},
     [1], [-1]),
    # unevaluated*
    ({"allOf": [{"properties": {"a": True}}], "unevaluatedProperties": False},
     [{"a": 1}], [{"b": 1}]),
    ({"prefixItems": [True], "unevaluatedItems": False}, [["a"], []],
     [["a", "b"]]),
    ({"if": {"properties": {"t": {"const": 1}}, "required": ["t"]},
      "then": {"properties": {"x": True}}, "unevaluatedProperties": {"type": "integer"}},
     [{"t": 1, "x": "anything"}, {"x": 5}], [{"x": "s"}]),
    # draft-07 compat: array items + additionalItems
    ({"items": [{"type": "string"}], "additionalItems": {"type": "integer"}},
     [["a", 1]], [["a", "b"]]),
]


@pytest.mark.parametrize("schema,valid,invalid", CASES,
                         ids=[json.dumps(c[0])[:40] for c in CASES])
def test_keyword_families(schema, valid, invalid):
    cs = compile_schema(schema)
    for v in valid:
        assert cs.is_valid(v), f"{v!r} should satisfy {schema!r}: {cs.validate(v)}"
    for v in invalid:
        assert not cs.is_valid(v), f"{v!r} should violate {schema!r}"


def test_dynamic_ref_strict_tree():
    """The 2020-12 spec's flagship $dynamicRef case (tree/strict-tree,
    mirrored from the official suite's dynamicRef.json semantics): the
    extending resource's $dynamicAnchor overrides the base resource's
    node schema for RECURSIVE references, so an extra property deep in
    the tree is caught by strict-tree's unevaluatedProperties: false."""
    schema = {
        "$id": "https://example.com/strict-tree",
        "$dynamicAnchor": "node",
        "$ref": "tree",
        "unevaluatedProperties": False,
        "$defs": {
            "tree": {
                "$id": "https://example.com/tree",
                "$dynamicAnchor": "node",
                "type": "object",
                "properties": {
                    "data": True,
                    "children": {"type": "array",
                                 "items": {"$dynamicRef": "#node"}},
                },
            },
        },
    }
    cs = compile_schema(schema)
    assert cs.is_valid({"data": 1, "children": [{"data": 2}]})
    # extra property at depth 1: only caught if the DYNAMIC scope
    # (strict-tree) wins over the lexical target (tree)
    assert not cs.is_valid({"children": [{"daat": 1}]})
    assert not cs.is_valid({"data": 1, "children": [{"data": 2,
                                                     "extra": 3}]})
    # the base tree alone (lexical compile root) stays permissive
    cs_tree = compile_schema(schema["$defs"]["tree"])
    assert cs_tree.is_valid({"children": [{"daat": 1}]})


def test_dynamic_ref_without_bookend_is_lexical():
    """A $dynamicRef whose target has only $anchor (no $dynamicAnchor)
    must behave as a plain $ref even if an outer resource declares a
    $dynamicAnchor of the same name (official suite semantics)."""
    schema = {
        "$id": "https://example.com/outer",
        "$dynamicAnchor": "thing",  # outer: permissive
        "$ref": "inner",
        "$defs": {
            "inner": {
                "$id": "https://example.com/inner",
                "properties": {"x": {"$dynamicRef": "#thing"}},
                "$defs": {
                    "t": {"$anchor": "thing", "type": "integer"},  # no bookend
                },
            },
        },
    }
    cs = compile_schema(schema)
    assert cs.is_valid({"x": 3})
    assert not cs.is_valid({"x": "s"})  # lexical integer wins


def test_recursive_ref_dynamic_2019_09():
    """$recursiveRef '#' + $recursiveAnchor true: the OUTERMOST
    resource with the anchor wins (2019-09 dynamic recursion)."""
    schema = {
        "$id": "https://example.com/strict",
        "$recursiveAnchor": True,
        "$ref": "base",
        "unevaluatedProperties": False,
        "$defs": {
            "base": {
                "$id": "https://example.com/base",
                "$recursiveAnchor": True,
                "properties": {
                    "child": {"$recursiveRef": "#"},
                    "data": True,
                },
            },
        },
    }
    cs = compile_schema(schema)
    assert cs.is_valid({"data": 1, "child": {"data": 2}})
    assert not cs.is_valid({"child": {"oops": 2}})


def test_embedded_id_pointer_fragments():
    """JSON-pointer fragments resolve against the RESOURCE root, not
    the document root, once an embedded $id starts a new resource."""
    schema = {
        "$id": "https://example.com/root",
        "$ref": "sub#/$defs/positive",
        "$defs": {
            "sub": {
                "$id": "https://example.com/sub",
                "$defs": {"positive": {"minimum": 0}},
            },
        },
    }
    cs = compile_schema(schema)
    assert cs.is_valid(1) and not cs.is_valid(-1)


def test_recursive_tree_schema():
    """ControlJump analog: self-referential schema over arbitrarily deep
    instances (SURVEY.md §7.4 hard case)."""
    cs = compile_schema({
        "$defs": {"node": {
            "type": "object", "required": ["v"],
            "properties": {"v": {"type": "integer"},
                           "kids": {"type": "array",
                                    "items": {"$ref": "#/$defs/node"}}},
            "additionalProperties": False}},
        "$ref": "#/$defs/node"})
    deep = {"v": 0}
    cur = deep
    for i in range(1, 200):
        cur["kids"] = [{"v": i}]
        cur = cur["kids"][0]
    assert cs.is_valid(deep)
    cur["kids"] = [{"v": "not-int"}]
    errs = cs.validate(deep)
    assert errs and errs[0][1] == "type"
    assert errs[0][0].count("/kids/0") == 200


def test_recursion_error_degrades_gracefully():
    cs = compile_schema({"$ref": "#"})  # degenerate self-loop
    assert cs.validate(1)[0][1] == "maxDepth"


def test_error_paths_and_keywords():
    cs = compile_schema({"properties": {"a": {"items": {"minimum": 0}}}})
    errs = cs.validate({"a": [1, -2]})
    assert errs == [("/a/1", "minimum", "violates minimum 0")]


# ---------------------------------------------------------------------------
# columnar schema_to_plan vs per-row evaluator (differential)
# ---------------------------------------------------------------------------

ROW_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {"type": "string", "pattern": "^doc-"},
        "lang": {"enum": ["en", "fr", "de"]},
        "score": {"type": "number", "minimum": 0, "maximum": 1},
        "spans": {
            "type": "array", "minItems": 1, "maxItems": 3,
            "items": {"type": "object", "required": ["kind", "offset"],
                      "properties": {
                          "kind": {"enum": ["text", "image"]},
                          "offset": {"type": "integer", "minimum": 0},
                          "media_ref": {"format": "media-ref",
                                        "x-format-assertion": True}}},
            "contains": {"properties": {"kind": {"const": "text"}},
                         "minContains": 1},
        },
    },
}

SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                    ("media_ref", pa.string()), ("offset", pa.int32())])


def _mk_rows(seed: int, n: int = 200):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        spans = []
        for j in range(rng.integers(0, 5)):
            spans.append({
                "kind": rng.choice(["text", "image", "video", None]),
                "text": rng.choice(["hello", None]),
                "media_ref": rng.choice(
                    ["media://0011223344556677", "bogus", None]),
                "offset": int(rng.integers(-2, 10))
                if rng.random() > 0.1 else None,
            })
        rows.append({
            "doc_id": rng.choice([f"doc-{i}", f"x-{i}"]),
            "lang": rng.choice(["en", "fr", "zz", None]),
            "score": float(rng.choice([0.5, -0.1, 1.5])),
            "spans": spans,
        })
    return rows


def _columnar_fail_set(rows):
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "lang": pa.array([r["lang"] for r in rows]),
        "score": pa.array([r["score"] for r in rows]),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_T)),
    })
    plan = schema_to_plan(ROW_SCHEMA)
    ck = CompiledRowChecker(plan)
    v = ck.violations(t)
    return set(v.column("doc_id").to_pylist())


def _perrow_fail_set(rows):
    """Independent verdict: validate each ROW as a plain JSON object with
    the full dynamic evaluator. Null members are dropped first (a null
    column slot means 'absent' in the columnar encoding). The columnar
    plan checks presence-guarded keywords only, so compare doc-level
    fail SETS, which both paths define identically."""
    cs = compile_schema(ROW_SCHEMA)
    failed = set()
    for r in rows:
        obj = {k: v for k, v in r.items() if v is not None}
        obj["spans"] = [
            {k: (int(v) if k == "offset" else v)
             for k, v in s.items() if v is not None}
            for s in r["spans"]]
        if not cs.is_valid(obj):
            failed.add(r["doc_id"])
    return failed


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_columnar_matches_perrow_evaluator(seed):
    rows = _mk_rows(seed)
    assert _columnar_fail_set(rows) == _perrow_fail_set(rows)


# ---------------------------------------------------------------------------
# json_schema rule kind through the distributed pipeline
# ---------------------------------------------------------------------------

PAYLOAD_SCHEMA = {
    "type": "object", "required": ["meta"],
    "properties": {
        "meta": {"type": "object", "required": ["k"],
                 "properties": {"k": {"type": "integer", "maximum": 50},
                                "tag": {"type": "string"}},
                 "additionalProperties": False},
        "vals": {"type": "array", "items": {"type": "number"}, "maxItems": 3},
    },
}


def _payload_docs(n=300, seed=5):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        k = int(rng.integers(0, 80))
        extra = ', "zz": 1' if rng.random() < 0.1 else ""
        vals = json.dumps(rng.integers(0, 9, rng.integers(0, 5)).tolist())
        props = f'{{"meta": {{"k": {k}{extra}}}, "vals": {vals}}}'
        if rng.random() < 0.05:
            props = "not json"
        docs.append({"doc_id": f"d{i}", "spans": [], "props": props})
    return docs


def test_json_schema_rule_distributed(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.validate import validate
    from jsonschema_ray.sources.readers import DatasetSource
    from tests.oracle import oracle_violations

    docs = _payload_docs()
    plan = CheckPlan(rules=[Rule(
        "props_schema", kind="json_schema", scope="doc",
        params={"field": "props", "schema": PAYLOAD_SCHEMA},
        message="props violates payload schema")])
    t = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs]),
        "spans": pa.array([d["spans"] for d in docs], type=pa.list_(SPAN_T)),
        "props": pa.array([d["props"] for d in docs]),
    })
    res = validate(DatasetSource(rd.from_arrow(t).repartition(7)), plan)
    got = set(zip(res.table().column("doc_id").to_pylist(),
                  res.table().column("rule_id").to_pylist(),
                  res.table().column("span_index").to_pylist()))
    expected = oracle_violations(docs, plan)
    assert got == expected
    assert len(expected) > 30  # fixture really injects violations


def test_schema_to_plan_content_schema_roundtrip():
    """contentSchema on a string column → json_schema rule; the whole
    plan survives to_json/from_json (shipped to actors as data)."""
    plan = schema_to_plan({
        "type": "object",
        "properties": {"props": {
            "type": "string", "contentMediaType": "application/json",
            "contentSchema": PAYLOAD_SCHEMA}}})
    kinds = {r.kind for r in plan.rules}
    assert kinds == {"json_schema"}
    plan2 = CheckPlan.loads(plan.dumps())
    ck = CompiledRowChecker(plan2)
    batch = pa.table({
        "doc_id": ["a", "b"],
        "spans": pa.array([[], []], type=pa.list_(SPAN_T)),
        "props": ['{"meta": {"k": 1}}', '{"meta": {"k": 99}}'],
    })
    out = ck.violations(batch)
    assert out.column("doc_id").to_pylist() == ["b"]


def test_draft4_boolean_exclusive_bounds():
    cs = compile_schema({"minimum": 2, "exclusiveMinimum": True,
                         "maximum": 5, "exclusiveMaximum": True})
    assert cs.is_valid(3) and cs.is_valid(4.9)
    assert not cs.is_valid(2) and not cs.is_valid(5)
    # columnar path agrees
    plan = schema_to_plan({"type": "object", "properties": {
        "n": {"minimum": 2, "exclusiveMinimum": True}}})
    ck = CompiledRowChecker(plan)
    batch = pa.table({"doc_id": ["a", "b"], "n": [2, 3]})
    assert ck.violations(batch).column("doc_id").to_pylist() == ["a"]


def test_2019_09_recursive_ref():
    cs = compile_schema({
        "$recursiveAnchor": True,
        "type": "object",
        "properties": {"v": {"type": "integer"},
                       "next": {"$recursiveRef": "#"}}})
    assert cs.is_valid({"v": 1, "next": {"v": 2}})
    assert not cs.is_valid({"v": 1, "next": {"v": "x"}})


def test_entrypoint_subschema():
    cs = compile_schema({"$defs": {
        "node": {"type": "object", "required": ["v"],
                 "properties": {"v": {"type": "integer"},
                                "next": {"$ref": "#/$defs/node"}}}}},
        entrypoint="#/$defs/node")
    assert cs.is_valid({"v": 1, "next": {"v": 2}})
    assert not cs.is_valid({"next": {"v": 2}})  # missing v at root


def test_metaschema_self_hosting():
    from jsonschema_ray.spec.jschema import METASCHEMA, check_metaschema

    assert check_metaschema(METASCHEMA) == []  # fixed point
    assert check_metaschema({"type": "object", "allOf": [True, False]}) == []
    errs = check_metaschema({"properties": {"a": {"minLength": -1}}})
    assert errs and errs[0][1] == "minimum"
    errs = check_metaschema({"patternProperties": {"[": {}}})
    assert errs


def test_lint_schema_static_analysis():
    from jsonschema_ray.spec.jschema import lint_schema

    f = lint_schema({
        "type": "object",
        "properties": {
            "a": {"minimun": 3},                      # typo
            "b": {"minimum": 5, "maximum": 2},        # unsatisfiable
            "c": {"enum": []},
            "d": {"allOf": [False, {"type": "string"}]},
            "e": {"not": {"not": {"type": "integer"}}},
        }})
    msgs = {(sev, ptr) for sev, ptr, _ in f}
    assert ("warning", "/properties/a/minimun") in msgs
    assert ("error", "/properties/b") in msgs
    assert ("error", "/properties/c/enum") in msgs
    assert ("warning", "/properties/d/allOf/0") in msgs
    assert ("warning", "/properties/e/not") in msgs
    assert lint_schema({"type": "string", "minLength": 1}) == []
