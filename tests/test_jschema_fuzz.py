"""Metamorphic property fuzz for the JSON Schema evaluator.

(Direct differential fuzzing against the canonical ``jsonschema``
package lives in ``test_jschema_differential.py``; the metamorphic laws
below additionally pin properties no second implementation can —
they hold for ANY schema S and instance v, hypothesis generates both):

  - allOf-wrap:   [[S]] ≡ allOf:[S]
  - anyOf-widen:  valid(S) ⇒ valid(anyOf:[S, X]) for any X
  - not-inverts:  valid(not:S) == ¬valid(S)
  - ref-inline:   S ≡ {$defs:{s:S}, $ref:#/$defs/s}   (S ref-free)
  - if-trivial:   {if:S, then:true, else:true} accepts everything
  - det:          validate is deterministic across compiles
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_ray.spec.jschema import compile_schema

# ---- instance generator: arbitrary JSON ----

_scalar = st.one_of(st.none(), st.booleans(), st.integers(-50, 50),
                    st.floats(allow_nan=False, allow_infinity=False,
                              min_value=-100, max_value=100),
                    st.text(alphabet="abcé 0123456789", max_size=8))
_json = st.recursive(
    _scalar,
    lambda c: st.one_of(st.lists(c, max_size=4),
                        st.dictionaries(st.text(alphabet="abcxy_", min_size=1,
                                                max_size=4), c, max_size=4)),
    max_leaves=12)

# ---- schema generator: ref-free keyword trees ----

_leaf_schema = st.one_of(
    st.booleans(),
    st.builds(lambda t: {"type": t},
              st.sampled_from(["null", "boolean", "string", "integer",
                               "number", "array", "object"])),
    st.builds(lambda v: {"const": v}, _scalar),
    st.builds(lambda vs: {"enum": vs}, st.lists(_scalar, min_size=1, max_size=4)),
    st.builds(lambda lo: {"minimum": lo}, st.integers(-20, 20)),
    st.builds(lambda hi: {"maxLength": hi}, st.integers(0, 6)),
    st.builds(lambda n: {"minItems": n}, st.integers(0, 3)),
    st.builds(lambda n: {"maxProperties": n}, st.integers(0, 3)),
    st.builds(lambda p: {"pattern": p}, st.sampled_from(["a", "^b", "c$", "[ax]"])),
    st.just({"uniqueItems": True}),
)


def _schemas(depth: int):
    if depth == 0:
        return _leaf_schema
    sub = _schemas(depth - 1)
    return st.one_of(
        _leaf_schema,
        st.builds(lambda xs: {"allOf": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"anyOf": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda x: {"not": x}, sub),
        st.builds(lambda x: {"items": x}, sub),
        st.builds(lambda x, r: {"properties": {"a": x}, "required": list(r)},
                  sub, st.sampled_from([(), ("a",)])),
        st.builds(lambda x: {"additionalProperties": x}, sub),
        st.builds(lambda c, t, e: {"if": c, "then": t, "else": e},
                  sub, sub, sub),
        st.builds(lambda x: {"contains": x, "minContains": 1}, sub),
    )


SCHEMAS = _schemas(2)


@settings(max_examples=250, deadline=None)
@given(s=SCHEMAS, v=_json)
def test_metamorphic_laws(s, v):
    base = compile_schema(s).is_valid(v)

    assert compile_schema({"allOf": [s]}).is_valid(v) == base
    assert compile_schema({"not": s}).is_valid(v) == (not base)
    if base:
        assert compile_schema({"anyOf": [s, False]}).is_valid(v)
        assert compile_schema({"anyOf": [{"not": {}}, s]}).is_valid(v)
    if isinstance(s, dict):
        assert compile_schema(
            {"$defs": {"s": s}, "$ref": "#/$defs/s"}).is_valid(v) == base
    assert compile_schema({"if": s, "then": True, "else": True}).is_valid(v)
    # determinism across independent compiles
    assert compile_schema(s).validate(v) == compile_schema(s).validate(v)


@settings(max_examples=100, deadline=None)
@given(s=SCHEMAS, v=_json)
def test_oneOf_consistency(s, v):
    """oneOf:[S, not S] is a tautology partition: exactly one matches."""
    assert compile_schema({"oneOf": [s, {"not": s}]}).is_valid(v)
    assert not compile_schema({"oneOf": [s, s]}).is_valid(v) or True
    # oneOf:[S,S] matches 0 or 2 branches — never valid
    assert not compile_schema({"oneOf": [s, s]}).is_valid(v)


@settings(max_examples=100, deadline=None)
@given(v=_json)
def test_boolean_schemas(v):
    assert compile_schema(True).is_valid(v)
    assert not compile_schema(False).is_valid(v)
    assert compile_schema({}).is_valid(v)


# ---------------------------------------------------------------------------
# fuzzed columnar differential: schema_to_plan ≡ per-row evaluator
# ---------------------------------------------------------------------------

import pyarrow as pa  # noqa: E402

from jsonschema_ray.spec.compile import CompiledRowChecker  # noqa: E402
from jsonschema_ray.spec.jschema import schema_to_plan  # noqa: E402

# per-column keyword pools matched to the column's static Arrow type —
# the documented columnar contract (schema authors target actual types)
_STR_KW = st.one_of(
    st.builds(lambda n: {"minLength": n}, st.integers(0, 6)),
    st.builds(lambda n: {"maxLength": n}, st.integers(0, 6)),
    st.builds(lambda p: {"pattern": p}, st.sampled_from(["a", "^b", "[ac]+$"])),
    st.builds(lambda vs: {"enum": vs},
              st.lists(st.sampled_from(["a", "ab", "ba", "c"]),
                       min_size=1, max_size=3)),
    st.just({"type": "string"}),
    st.builds(lambda v: {"const": v}, st.sampled_from(["a", "ab"])),
)
_NUM_KW = st.one_of(
    st.builds(lambda n: {"minimum": n}, st.integers(-10, 10)),
    st.builds(lambda n: {"maximum": n}, st.integers(-10, 10)),
    st.builds(lambda n: {"exclusiveMinimum": n}, st.integers(-10, 10)),
    st.builds(lambda n: {"multipleOf": n}, st.sampled_from([2, 3, 5])),
    st.just({"type": "integer"}),
    st.builds(lambda vs: {"enum": vs},
              st.lists(st.integers(-5, 5), min_size=1, max_size=3)),
)


def _merge(kws):
    out = {}
    for k in kws:
        out.update(k)
    return out


_COL_SCHEMA = st.builds(
    lambda skw, ikw, req: {
        "type": "object",
        "required": list(req),
        "properties": {"s": _merge(skw), "i": _merge(ikw)},
    },
    st.lists(_STR_KW, min_size=1, max_size=3),
    st.lists(_NUM_KW, min_size=1, max_size=3),
    st.sampled_from([(), ("s",), ("i",), ("s", "i")]),
)


@settings(max_examples=120, deadline=None)
@given(
    schema=_COL_SCHEMA,
    s=st.lists(st.one_of(st.none(),
                         st.sampled_from(["a", "ab", "ba", "c", "bx", ""])),
               min_size=1, max_size=8),
    i=st.lists(st.one_of(st.none(), st.integers(-12, 12)),
               min_size=1, max_size=8),
)
def test_fuzzed_columnar_matches_evaluator(schema, s, i):
    n = max(len(s), len(i))
    pad = lambda xs: (xs * ((n // len(xs)) + 1))[:n]
    s, i = pad(s), pad(i)
    t = pa.table({
        "doc_id": pa.array([f"d{j}" for j in range(n)]),
        "s": pa.array(s, type=pa.string()),
        "i": pa.array(i, type=pa.int64()),
    })
    ck = CompiledRowChecker(schema_to_plan(schema))
    columnar_fail = set(ck.violations(t).column("doc_id").to_pylist())

    cs = compile_schema(schema)
    perrow_fail = set()
    for j in range(n):
        obj = {}
        if s[j] is not None:
            obj["s"] = s[j]
        if i[j] is not None:
            obj["i"] = i[j]
        if not cs.is_valid(obj):
            perrow_fail.add(f"d{j}")
    assert columnar_fail == perrow_fail, (schema, s, i)
