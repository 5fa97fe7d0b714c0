"""Compiled Arrow kernels vs the pure-Python reference evaluator.

The reference trusts its evaluator via ~1,050 golden scenario tests
(SURVEY.md §5); here every predicate op is cross-checked against the
independent slow-path implementation on a table that exercises nulls,
type edges and unicode.
"""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.spec.predicates import compile_predicate, evaluate_predicate_python

TABLE = pa.table({
    "s": pa.array(["abc", None, "", "média", "media://0123456789abcdef",
                   "a" * 300, "xyz", "ab"]),
    "i": pa.array([0, 1, -5, None, 2_147_483_647, 10, 7, 12], type=pa.int64()),
    "f": pa.array([1.0, 2.5, None, -0.0, 1e18, 3.0001, 7.0, float("nan")]),
    "k": pa.array(["text", "image", "video", None, "audio", "table", "text", "text"]),
})

SPECS = [
    {"op": "const", "value": True},
    {"op": "const", "value": False},
    {"op": "is_null", "field": "s"},
    {"op": "not_null", "field": "i"},
    {"op": "eq", "field": "k", "value": "text"},
    {"op": "ne", "field": "k", "value": "text"},
    {"op": "gt", "field": "i", "value": 5},
    {"op": "ge", "field": "i", "value": 0},
    {"op": "lt", "field": "f", "value": 2.0},
    {"op": "le", "field": "i", "value": 10},
    {"op": "between", "field": "i", "min": 0, "max": 10},
    {"op": "between", "field": "i", "min": 0},
    {"op": "is_in", "field": "k", "values": ["text", "image", "audio", "table"]},
    {"op": "regex", "field": "s", "pattern": "media://[0-9a-f]{16}"},
    {"op": "starts_with", "field": "s", "value": "med"},
    {"op": "ends_with", "field": "s", "value": "c"},
    {"op": "contains", "field": "s", "value": "dia"},
    {"op": "utf8_len", "field": "s", "min": 1, "max": 5},
    {"op": "utf8_len", "field": "s", "max": 280},
    {"op": "format", "field": "s", "format": "media-ref"},
    {"op": "divisible", "field": "i", "by": 3},
    {"op": "divisible", "field": "f", "by": 0.5},
    {"op": "type", "field": "i", "type": "integer"},
    {"op": "type", "field": "f", "type": "integer"},          # loose: zero-fraction reals
    {"op": "type", "field": "f", "type": "integer", "strict": True},
    {"op": "type", "field": "f", "type": "number"},
    {"op": "type", "field": "s", "type": "string"},
    {"op": "type", "field": "s", "type": "integer"},
    {"op": "not", "arg": {"op": "eq", "field": "k", "value": "text"}},
    {"op": "and", "args": [{"op": "not_null", "field": "s"},
                           {"op": "utf8_len", "field": "s", "min": 2}]},
    {"op": "or", "args": [{"op": "is_null", "field": "s"},
                          {"op": "eq", "field": "k", "value": "text"}]},
    {"op": "one_of", "args": [{"op": "eq", "field": "k", "value": "text"},
                              {"op": "gt", "field": "i", "value": 5},
                              {"op": "is_null", "field": "f"}]},
    {"op": "if", "cond": {"op": "eq", "field": "k", "value": "text"},
     "then": {"op": "not_null", "field": "s"},
     "else": {"op": "not_null", "field": "i"}},
]


@pytest.mark.parametrize("spec", SPECS, ids=[str(i) for i in range(len(SPECS))])
def test_kernel_matches_python(spec):
    kernel = compile_predicate(spec)
    got = kernel(TABLE)
    rows = TABLE.to_pylist()
    want = np.array([evaluate_predicate_python(spec, r) for r in rows])
    # NaN float semantics: engine treats NaN as failing comparisons, like
    # python (NaN > x is False); both paths agree by construction.
    assert got.tolist() == want.tolist(), f"{spec}: {got.tolist()} != {want.tolist()}"


def test_format_kernels_spot():
    from jsonschema_ray.functions.formats import check_format

    arr = pa.array([
        "123e4567-e89b-12d3-a456-426614174000",     # uuid ok
        "not-a-uuid", None,
    ])
    assert check_format(arr, "uuid").tolist() == [True, False, False]

    arr = pa.array(["192.168.0.1", "256.1.1.1", "1.2.3", None])
    assert check_format(arr, "ipv4").tolist() == [True, False, False, False]

    arr = pa.array(["2024-02-29", "2023-02-29", "2024-02-30", "2024-04-31"])
    # calendar-aware incl. the Gregorian leap rule (encoded in the regex;
    # full stdlib parity in tests/test_formats_parity.py)
    assert check_format(arr, "date").tolist() == [True, False, False, False]

    arr = pa.array(["2024-01-01T10:00:00Z", "2024-01-01 10:00:00+05:30", "nope"])
    # RFC 3339 separator is 'T'/'t' only — space rejected
    assert check_format(arr, "date-time").tolist() == [True, False, False]

    arr = pa.array(["::1", "2001:db8::ff00:42:8329", "1:2:3:4:5:6:7:8:9", "::ffff:1.2.3.4"])
    assert check_format(arr, "ipv6").tolist() == [True, True, False, True]

    arr = pa.array(["a[", "a(b)*", "valid.*regex"])
    assert check_format(arr, "regex").tolist() == [False, True, True]


def test_plan_roundtrip_and_hash():
    from jsonschema_ray.spec.plan import CheckPlan, default_plan

    p = default_plan()
    s = p.dumps()
    p2 = CheckPlan.loads(s)
    assert p2.dumps() == s
    assert p2.plan_hash() == p.plan_hash()
    assert p.filtered(exclude=["kind_enum"]).plan_hash() != p.plan_hash()
    assert len(p.filtered(only=["kind_enum"]).rules) == 1


def test_type_null_parity_kernel_vs_python():
    """ADVICE r1: type:'null' must agree across the compiled kernel,
    the pure-Python evaluator, and codegen: null values VALIDATE."""
    import pyarrow as pa

    from jsonschema_ray.spec.predicates import (compile_predicate,
                                                evaluate_predicate_python)

    spec = {"op": "type", "field": "x", "type": "null"}
    t = pa.table({"x": pa.array([None, "a"], type=pa.string())})
    kern = compile_predicate(spec)(t)
    assert kern.tolist() == [True, False]
    assert evaluate_predicate_python(spec, {"x": None}) is True
    assert evaluate_predicate_python(spec, {"x": "a"}) is False


def test_is_in_numeric_integer_columns_stay_exact():
    """ADVICE r2: the numeric is_in kernel must not promote integer
    columns to double — values outside ±2^53 crashed pc.equal with
    ArrowInvalid even when the enum values were small, and exactness
    was lost. Integer columns use pc.is_in over an int value-set."""
    big = 2 ** 60
    t = pa.table({"x": pa.array([5, big, 7, None], type=pa.int64())})
    k = compile_predicate({"op": "is_in", "field": "x", "values": [5, 7]})
    assert k(t).tolist() == [True, False, True, False]
    # a >2^53 enum member matches exactly (float rounding must not leak in)
    k2 = compile_predicate(
        {"op": "is_in", "field": "x", "values": [big, 2.5]})
    assert k2(t).tolist() == [False, True, False, False]
    assert evaluate_predicate_python(
        {"op": "is_in", "field": "x", "values": [big, 2.5]}, {"x": big})
    # neighbouring huge value must NOT match (double would collapse them)
    k3 = compile_predicate(
        {"op": "is_in", "field": "x", "values": [big + 1]})
    assert k3(t).tolist() == [False, False, False, False]


def test_is_in_numeric_boolean_and_string_columns():
    """Boolean (and other non-numeric) columns short-circuit to
    all-false against a numeric enum — pc.equal(bool, double) has no
    kernel and previously raised ArrowNotImplementedError."""
    tb = pa.table({"x": pa.array([True, False, None])})
    k = compile_predicate({"op": "is_in", "field": "x", "values": [1, 0]})
    assert k(tb).tolist() == [False, False, False]
    assert evaluate_predicate_python(
        {"op": "is_in", "field": "x", "values": [1, 0]}, {"x": True}) is False
    ts = pa.table({"x": pa.array(["5"])})
    k2 = compile_predicate({"op": "is_in", "field": "x", "values": [5]})
    assert k2(ts).tolist() == [False]


def test_is_in_numeric_float_columns_numeric_equality():
    """Float columns keep numeric (not bitwise) equality: -0.0 matches
    enum 0, int enum members match zero-fraction reals, and integer
    enum members not representable as double never false-positive."""
    tf = pa.table({"x": pa.array([-0.0, 1.5, 2.0, None], type=pa.float64())})
    k = compile_predicate({"op": "is_in", "field": "x", "values": [0, 1.5]})
    assert k(tf).tolist() == [True, True, False, False]
    tg = pa.table({"x": pa.array([float(2 ** 60)], type=pa.float64())})
    assert compile_predicate(
        {"op": "is_in", "field": "x", "values": [2 ** 60 + 1]})(tg).tolist() == [False]
    assert compile_predicate(
        {"op": "is_in", "field": "x", "values": [2 ** 60]})(tg).tolist() == [True]
