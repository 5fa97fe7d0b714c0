"""Alterschema canonicalization: per-rule unit tests + the global
semantics-preservation property (canonicalized schema accepts exactly
the same instances, judged by BOTH the engine evaluator and the
canonical ``jsonschema`` package)."""
import warnings

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from jsonschema_ray.spec.alterschema import RULES, canonicalize, lint_fixable
from jsonschema_ray.spec.jschema import compile_schema
from tests.test_jschema_differential import _schemas
from tests.test_jschema_fuzz import _json

# ref-free schemas only: wrappers nest them under properties/definitions,
# where a top-level '#/$defs/s' pointer would no longer resolve
REF_FREE = _schemas(2)

warnings.filterwarnings("ignore", module="jsonschema")
import jsonschema as _js  # noqa: E402


def _canon(s, v):
    return _js.Draft202012Validator(s).is_valid(v)


def test_rule_units():
    cases = [
        ({"enum": [3]}, {"const": 3}),
        ({"const": 2, "enum": [1, 2]}, {"const": 2}),
        ({"enum": [1, 1, 2]}, {"enum": [1, 2]}),
        ({"required": ["a", "a", "b"]}, {"required": ["a", "b"]}),
        ({"allOf": [{"type": "string"}, {"type": "string"}]},
         {"allOf": [{"type": "string"}]}),
        ({"allOf": [{"allOf": [{"type": "string"}]}, {"minLength": 1}]},
         {"allOf": [{"type": "string"}, {"minLength": 1}]}),
        ({"allOf": [True, {"type": "string"}]},
         {"allOf": [{"type": "string"}]}),
        ({"anyOf": [False, {"type": "string"}]},
         {"anyOf": [{"type": "string"}]}),
        ({"not": {"not": {"type": "string"}}},
         {"allOf": [{"type": "string"}]}),
        ({"definitions": {"a": {"type": "integer"}}},
         {"$defs": {"a": {"type": "integer"}}}),
        ({"then": {"type": "string"}}, {}),
        ({"if": {"type": "string"}, "then": True},
         {"if": {"type": "string"}}),
        ({"exclusiveMaximum": 3, "maximum": 5}, {"exclusiveMaximum": 3}),
        ({"exclusiveMinimum": 3, "minimum": 2}, {"exclusiveMinimum": 3}),
        # bounds → enum [4] → const 4 → const_with_type drops the type
        ({"type": "integer", "minimum": 4, "maximum": 4},
         {"const": 4}),
        ({"title": "  x ", "description": "y  "},
         {"title": "x", "description": "y"}),
    ]
    for before, after in cases:
        got, applied = canonicalize(before)
        assert got == after, (before, got, after)
        assert applied, before


def test_rules_guarded():
    # dangling-$ref guard on definitions rename
    s = {"definitions": {"a": {"type": "integer"}},
         "$ref": "#/definitions/a"}
    got, _ = canonicalize(s)
    assert "definitions" in got and "$defs" not in got
    # double negation NOT eliminated when inner produces annotations
    s2 = {"not": {"not": {"properties": {"a": True}}}}
    assert canonicalize(s2)[0] == s2
    # ... nor next to sibling unevaluatedProperties
    s3 = {"not": {"not": {"type": "object"}},
          "unevaluatedProperties": False}
    assert canonicalize(s3)[0] == s3


def test_fixpoint_and_nested_application():
    s = {"properties": {"p": {"enum": [1, 1]}},   # dedupe THEN to-const
         "allOf": [{"allOf": [{"allOf": [{"minimum": 0}]}]}]}
    got, applied = canonicalize(s)
    assert got["properties"]["p"] == {"const": 1}
    assert got["allOf"] == [{"minimum": 0}]
    names = [n for n, _ in applied]
    assert "duplicate_enum_values" in names and "enum_to_const" in names
    assert names.count("flatten_nested_allof") >= 2


def test_lint_fixable_reports_pointers():
    finds = lint_fixable({"properties": {"p": {"enum": [2]}}})
    assert ("warning", "/properties/p", "fixable: enum_to_const") in finds


_WRAPPERS = st.sampled_from([
    lambda s: {"not": {"not": s}},
    lambda s: {"allOf": [s, s]},
    lambda s: {"allOf": [{"allOf": [s]}, True]},
    lambda s: {"anyOf": [False, s]},
    lambda s: {"then": s},
    lambda s: {"if": s, "then": True, "else": s},
    lambda s: {"definitions": {"d": s}, "properties": {"a": s}},
    lambda s: dict(s, title=" pad ") if isinstance(s, dict) else s,
])


@settings(max_examples=400, deadline=None)
@given(s=REF_FREE, w=_WRAPPERS, v=_json)
def test_canonicalize_preserves_semantics(s, w, v):
    schema = w(s)
    fixed, _ = canonicalize(schema)
    assert compile_schema(fixed).is_valid(v) == \
        compile_schema(schema).is_valid(v)
    assert _canon(fixed, v) == _canon(schema, v)


# ---- dialect upgrade ----

_D4_SCHEMAS = st.one_of(
    st.builds(lambda lo, ex: {"minimum": lo, "exclusiveMinimum": ex},
              st.integers(-10, 10), st.booleans()),
    st.builds(lambda hi, ex: {"maximum": hi, "exclusiveMaximum": ex},
              st.integers(-10, 10), st.booleans()),
    st.builds(lambda d: {"dependencies": d},
              st.dictionaries(st.sampled_from(["a", "b"]),
                              st.one_of(st.lists(st.sampled_from(["x", "y"]),
                                                 max_size=2, unique=True),
                                        st.builds(lambda t: {"type": t},
                                                  st.sampled_from(
                                                      ["string",
                                                       "integer"]))),
                              min_size=1, max_size=2)),
    st.builds(lambda xs, extra: {"items": xs, "additionalItems": extra},
              st.lists(st.builds(lambda t: {"type": t},
                                 st.sampled_from(["integer", "string"])),
                       min_size=1, max_size=3),
              st.one_of(st.booleans(),
                        st.builds(lambda t: {"type": t},
                                  st.sampled_from(["integer", "string"])))),
    st.builds(lambda s: {"definitions": {"d": s},
                         "properties": {"a": {"$ref": "#/definitions/d"}}},
              st.builds(lambda t: {"type": t},
                        st.sampled_from(["integer", "string"]))),
)


@settings(max_examples=300, deadline=None)
@given(s=_D4_SCHEMAS, v=_json)
def test_upgrade_schema_cross_validator(s, v):
    """Draft-4 semantics of the ORIGINAL == 2020-12 semantics of the
    UPGRADED document, judged by the canonical implementation's two
    dialect validators (draft-4 is where boolean exclusive bounds and
    array-form items live)."""
    from jsonschema_ray.spec.alterschema import upgrade_schema

    # draft-4 `type: integer` rejects integral floats (1.0) while
    # 2020-12 accepts them — a dialect-semantics delta the upgrade
    # cannot (and the reference does not) compensate for; keep such
    # instances out of the comparison
    def _no_integral_float(x):
        if isinstance(x, bool):
            return True
        if isinstance(x, float):
            return not x.is_integer()
        if isinstance(x, list):
            return all(_no_integral_float(e) for e in x)
        if isinstance(x, dict):
            return all(_no_integral_float(e) for e in x.values())
        return True
    assume(_no_integral_float(v))

    up = upgrade_schema(s)
    assert up["$schema"].endswith("2020-12/schema")
    before = _js.Draft4Validator(s).is_valid(v)
    after = _js.Draft202012Validator(up).is_valid(v)
    assert before == after, (s, up, v)


def test_upgrade_schema_draft4_bool_bounds():
    from jsonschema_ray.spec.alterschema import upgrade_schema

    up = upgrade_schema({"id": "https://x.example/s",
                         "minimum": 3, "exclusiveMinimum": True,
                         "maximum": 9, "exclusiveMaximum": False})
    assert up["$id"] == "https://x.example/s" and "id" not in up
    assert up["exclusiveMinimum"] == 3 and "minimum" not in up
    assert up["maximum"] == 9 and "exclusiveMaximum" not in up
    # ref pointers follow the definitions rename
    up2 = upgrade_schema({"definitions": {"d": {"type": "integer"}},
                          "$ref": "#/definitions/d"})
    assert up2["$ref"] == "#/$defs/d" and "$defs" in up2
