"""Static unevaluated* analysis + lowering (spec/unevaluated.py) —
the analog of Blaze's compile-time pass
(vendor/blaze/src/compiler/unevaluated.cc): dependency classification,
dead-keyword removal, and verdict equivalence of the lowered schema
against the annotation-tracking evaluator."""

import pytest

from jsonschema_ray.spec.jschema import compile_schema
from jsonschema_ray.spec.unevaluated import analyze, lower_static


def _entry(schema, keyword="unevaluatedProperties", pointer=""):
    for e in analyze(schema):
        if e.keyword == keyword and e.pointer == pointer:
            return e
    raise AssertionError(f"no {keyword} entry at {pointer!r}")


# ---------------------------------------------------------------------------
# analysis classification
# ---------------------------------------------------------------------------

def test_allof_properties_is_static():
    e = _entry({
        "allOf": [{"properties": {"a": {"type": "string"}}}],
        "properties": {"b": {"type": "integer"}},
        "unevaluatedProperties": False,
    })
    assert e.is_static
    assert "/allOf/0/properties" in e.static_deps
    assert "/properties" in e.static_deps
    assert not e.dynamic_deps


def test_anyof_dep_is_dynamic():
    e = _entry({
        "anyOf": [{"properties": {"a": True}}, {"properties": {"b": True}}],
        "unevaluatedProperties": False,
    })
    assert not e.is_static
    assert {"/anyOf/0/properties", "/anyOf/1/properties"} <= e.dynamic_deps


def test_if_then_else_deps_are_dynamic():
    e = _entry({
        "if": {"properties": {"kind": {"const": "x"}}},
        "then": {"properties": {"x": True}},
        "else": {"properties": {"y": True}},
        "unevaluatedProperties": False,
    })
    assert not e.is_static
    assert "/then/properties" in e.dynamic_deps


def test_static_ref_chain_is_static():
    e = _entry({
        "$defs": {"base": {"properties": {"a": {"type": "string"}}}},
        "allOf": [{"$ref": "#/$defs/base"}],
        "unevaluatedProperties": False,
    })
    assert e.is_static
    assert "/$defs/base/properties" in e.static_deps


def test_dynamic_ref_marks_unresolved():
    e = _entry({
        "$defs": {"leaf": {"$dynamicAnchor": "node", "properties": {}}},
        "allOf": [{"$dynamicRef": "#node"}],
        "unevaluatedProperties": False,
    })
    assert e.unresolved and not e.is_static


def test_ref_cycle_terminates():
    s = {
        "$defs": {"loop": {"allOf": [{"$ref": "#/$defs/loop"}],
                           "properties": {"a": True}}},
        "allOf": [{"$ref": "#/$defs/loop"}],
        "unevaluatedProperties": False,
    }
    e = _entry(s)   # must not hang
    assert e.is_static
    assert "/$defs/loop/properties" in e.static_deps


def test_items_contains_dep_recorded_but_not_lowered():
    s = {
        "contains": {"type": "string"},
        "unevaluatedItems": False,
    }
    e = _entry(s, keyword="unevaluatedItems")
    assert e.is_static and "/contains" in e.static_deps
    lowered, n = lower_static(s)
    assert n == 0 and "unevaluatedItems" in lowered


# ---------------------------------------------------------------------------
# lowering: shape + verdict equivalence
# ---------------------------------------------------------------------------

CASES = [
    # (schema, instances)
    ({"allOf": [{"properties": {"a": {"type": "string"}}}],
      "properties": {"b": {"type": "integer"}},
      "unevaluatedProperties": False},
     [{"a": "x", "b": 1}, {"a": "x", "c": 1}, {"a": 1, "b": 1},
      {"b": 2}, {}]),
    ({"allOf": [{"patternProperties": {"^x_": {"type": "number"}}}],
      "unevaluatedProperties": {"type": "string"}},
     [{"x_a": 1.5}, {"x_a": 1.5, "other": "ok"},
      {"x_a": 1.5, "other": 3}, {"other": "ok"}]),
    ({"allOf": [{"prefixItems": [{"type": "string"}]}],
      "prefixItems": [True, {"type": "integer"}],
      "unevaluatedItems": False},
     [["a", 1], ["a", 1, 2], ["a"], [], [1, "b"]]),
    ({"allOf": [{"items": {"type": "integer"}}],
      "unevaluatedItems": False},       # dead: items evaluates the tail
     [[1, 2], ["a"], []]),
    ({"additionalProperties": {"type": "integer"},
      "unevaluatedProperties": False},  # dead: additionalProperties
     [{"a": 1}, {"a": "x"}, {}]),
]


@pytest.mark.parametrize("schema,instances", CASES)
def test_lowered_verdicts_match_tracked(schema, instances):
    lowered, n = lower_static(schema)
    assert n >= 1
    tracked = compile_schema(schema)
    fast = compile_schema(lowered)
    for inst in instances:
        assert fast.is_valid(inst) == tracked.is_valid(inst), inst


def test_lowering_removes_keyword_and_preserves_input():
    s = {"allOf": [{"properties": {"a": True}}],
         "unevaluatedProperties": False}
    lowered, n = lower_static(s)
    assert n == 1
    assert "unevaluatedProperties" in s            # input untouched
    assert "unevaluatedProperties" not in lowered
    branch = lowered["allOf"][-1]
    assert branch["additionalProperties"] is False
    assert branch["properties"] == {"a": True}


def test_dynamic_occurrence_left_alone():
    s = {"anyOf": [{"properties": {"a": True}}],
         "unevaluatedProperties": False}
    lowered, n = lower_static(s)
    assert n == 0 and "unevaluatedProperties" in lowered


def test_compile_schema_flag_end_to_end():
    s = {"allOf": [{"properties": {"a": {"type": "string"}}}],
         "unevaluatedProperties": False}
    v = compile_schema(s, static_unevaluated=True)
    assert v.is_valid({"a": "x"})
    assert not v.is_valid({"a": "x", "z": 1})


def test_differential_fuzz_lowered_vs_tracked():
    """Randomized objects/arrays through every static CASE schema:
    lowered and tracked verdicts must agree everywhere."""
    import random

    rng = random.Random(5)

    def rand_value(depth=0):
        r = rng.random()
        if r < 0.25:
            return rng.choice(["a", "x", "", "x_v"])
        if r < 0.45:
            return rng.randint(-3, 3)
        if r < 0.6:
            return rng.random() * 4
        if r < 0.8 and depth < 2:
            return {rng.choice(["a", "b", "x_a", "other", "z"]):
                    rand_value(depth + 1)
                    for _ in range(rng.randint(0, 3))}
        if depth < 2:
            return [rand_value(depth + 1) for _ in range(rng.randint(0, 3))]
        return None

    for schema, _ in CASES:
        lowered, _n = lower_static(schema)
        tracked, fast = compile_schema(schema), compile_schema(lowered)
        for _ in range(120):
            inst = rand_value()
            assert fast.is_valid(inst) == tracked.is_valid(inst), \
                (schema, inst)
