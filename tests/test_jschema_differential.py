"""DIFFERENTIAL fuzz: the engine's 2020-12 evaluator vs the canonical
``jsonschema`` package (Draft202012Validator), which ships in this
environment. Any verdict mismatch on a generated (schema, instance)
pair fails the test.

Exclusion: ``multipleOf`` with non-integer operands — the reference
engine falls back to EXACT DECIMAL divisibility
(``vendor/core/src/core/json/json_value.cc:801-838``: IEEE fast path,
then ``Decimal::strict_from``), so 0.3 is a multiple of 0.1 there;
python-jsonschema uses raw IEEE division and says it is not. The
engine's tolerance check follows the reference. Covered separately in
``test_multiple_of_decimal_semantics``.
"""
import warnings

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_ray.spec.jschema import compile_schema
from tests.test_jschema_fuzz import _json, _scalar

warnings.filterwarnings("ignore", module="jsonschema")
import jsonschema as _js  # noqa: E402  (canonical implementation)


def _canonical_valid(schema, instance) -> bool:
    return _js.Draft202012Validator(schema).is_valid(instance)


_names = st.text(alphabet="abx_", min_size=1, max_size=3)

_leaf = st.one_of(
    st.booleans(),
    st.builds(lambda t: {"type": t},
              st.sampled_from(["null", "boolean", "string", "integer",
                               "number", "array", "object"])),
    st.builds(lambda ts: {"type": ts},
              st.lists(st.sampled_from(["null", "string", "integer",
                                        "array", "object"]),
                       min_size=1, max_size=3, unique=True)),
    st.builds(lambda v: {"const": v}, _scalar),
    st.builds(lambda vs: {"enum": vs},
              st.lists(_scalar, min_size=1, max_size=4)),
    st.builds(lambda lo: {"minimum": lo}, st.integers(-20, 20)),
    st.builds(lambda hi: {"maximum": hi}, st.integers(-20, 20)),
    st.builds(lambda lo: {"exclusiveMinimum": lo}, st.integers(-20, 20)),
    st.builds(lambda hi: {"exclusiveMaximum": hi}, st.integers(-20, 20)),
    st.builds(lambda n: {"minLength": n}, st.integers(0, 6)),
    st.builds(lambda n: {"maxLength": n}, st.integers(0, 6)),
    st.builds(lambda n: {"minItems": n}, st.integers(0, 3)),
    st.builds(lambda n: {"maxItems": n}, st.integers(0, 3)),
    st.builds(lambda n: {"minProperties": n}, st.integers(0, 3)),
    st.builds(lambda n: {"maxProperties": n}, st.integers(0, 3)),
    st.builds(lambda p: {"pattern": p},
              st.sampled_from(["a", "^b", "c$", "[ax]", "a.b"])),
    st.just({"uniqueItems": True}),
    st.builds(lambda r: {"required": r},
              st.lists(_names, max_size=3, unique=True)),
)


def _schemas(depth: int):
    if depth == 0:
        return _leaf
    sub = _schemas(depth - 1)
    return st.one_of(
        _leaf,
        st.builds(lambda xs: {"allOf": xs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"anyOf": xs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"oneOf": xs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda x: {"not": x}, sub),
        st.builds(lambda x: {"items": x}, sub),
        st.builds(lambda xs, x: {"prefixItems": xs, "items": x},
                  st.lists(sub, min_size=1, max_size=3), sub),
        st.builds(lambda ps, r: {"properties": ps, "required": r},
                  st.dictionaries(_names, sub, max_size=3),
                  st.sampled_from([[], ["a"]])),
        st.builds(lambda pp: {"patternProperties": pp},
                  st.dictionaries(st.sampled_from(["^a", "b", "[xy]"]),
                                  sub, min_size=1, max_size=2)),
        st.builds(lambda x: {"additionalProperties": x}, sub),
        st.builds(lambda x: {"propertyNames": x}, sub),
        st.builds(lambda d: {"dependentSchemas": d},
                  st.dictionaries(_names, sub, min_size=1, max_size=2)),
        st.builds(lambda d: {"dependentRequired": d},
                  st.dictionaries(_names,
                                  st.lists(_names, max_size=2,
                                           unique=True),
                                  min_size=1, max_size=2)),
        st.builds(lambda c, t, e: {"if": c, "then": t, "else": e},
                  sub, sub, sub),
        st.builds(lambda x, lo, hi: {"contains": x, "minContains": lo,
                                     "maxContains": hi},
                  sub, st.integers(0, 2), st.integers(0, 3)),
        st.builds(lambda ps, u: {"properties": ps,
                                 "unevaluatedProperties": u},
                  st.dictionaries(_names, sub, max_size=2), sub),
        st.builds(lambda xs, u: {"prefixItems": xs,
                                 "unevaluatedItems": u},
                  st.lists(sub, min_size=1, max_size=2), sub),
        st.builds(lambda x, a: {"allOf": [a], "properties": {"a": x},
                                "unevaluatedProperties": False},
                  sub, sub),
    )


# $defs/$ref only at TOP level: '#/$defs/s' resolves against the schema
# RESOURCE root, so planting it in a nested subschema is an
# unresolvable-reference error by spec (both implementations reject it)
DIFF_SCHEMAS = st.one_of(
    _schemas(2),
    st.builds(lambda x: {"$defs": {"s": x}, "$ref": "#/$defs/s"},
              _schemas(1)),
    st.builds(lambda x, y: {"$defs": {"s": x},
                            "allOf": [{"$ref": "#/$defs/s"}, y]},
              _schemas(1), _schemas(1)),
)


@settings(max_examples=600, deadline=None)
@given(s=DIFF_SCHEMAS, v=_json)
def test_differential_vs_canonical(s, v):
    assert compile_schema(s).is_valid(v) == _canonical_valid(s, v), \
        (s, v)


@settings(max_examples=150, deadline=None)
@given(s=DIFF_SCHEMAS, v=_json)
def test_differential_error_presence(s, v):
    """validate() returns a non-empty error list exactly when the
    canonical validator reports errors."""
    errs = compile_schema(s).validate(v)
    assert bool(errs) == (not _canonical_valid(s, v))


def test_multiple_of_decimal_semantics():
    """Engine follows the REFERENCE's decimal fallback
    (json_value.cc:824-833), not python-jsonschema's raw IEEE: 0.3 is
    divisible by 0.1 in decimal, and the IEEE fast path still accepts
    exact binary multiples."""
    assert compile_schema({"multipleOf": 0.1}).is_valid(0.3)
    assert compile_schema({"multipleOf": 0.5}).is_valid(2.5)
    assert compile_schema({"multipleOf": 3}).is_valid(9)
    assert not compile_schema({"multipleOf": 3}).is_valid(10)
    assert not compile_schema({"multipleOf": 0.1}).is_valid(0.349)
