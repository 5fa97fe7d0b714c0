"""Property-based fuzz: compiled Arrow kernels ≡ the Python evaluator.

Random predicate specs over random tables (ints, floats with
NaN/inf, strings with nulls/unicode) — the two independent
implementations must agree on every row.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from jsonschema_ray.spec.predicates import compile_predicate, evaluate_predicate_python

_STRINGS = st.one_of(
    st.none(),
    st.text(alphabet="abcdef-:/é π0123456789", max_size=12),
    st.just("media://0123456789abcdef"),
)
_INTS = st.one_of(st.none(), st.integers(-1000, 1000))
_FLOATS = st.one_of(st.none(),
                    st.floats(allow_nan=False, allow_infinity=False,
                              min_value=-1e6, max_value=1e6),
                    st.just(float("inf")), st.just(float("-inf")),
                    st.just(float("nan")))


def _leaf(field: str, typ: str) -> st.SearchStrategy:
    common = [
        st.just({"op": "is_null", "field": field}),
        st.just({"op": "not_null", "field": field}),
    ]
    if typ == "s":
        return st.one_of(*common, *[
            st.builds(lambda v: {"op": "eq", "field": field, "value": v},
                      st.text(alphabet="abcé", max_size=4)),
            st.builds(lambda vs: {"op": "is_in", "field": field, "values": vs},
                      st.lists(st.text(alphabet="abc", max_size=3), max_size=4)),
            st.builds(lambda lo, hi: {"op": "utf8_len", "field": field,
                                      "min": lo, "max": hi},
                      st.integers(0, 5), st.integers(5, 20)),
            st.just({"op": "starts_with", "field": field, "value": "a"}),
            st.just({"op": "contains", "field": field, "value": "b"}),
            st.just({"op": "format", "field": field, "format": "media-ref"}),
            st.just({"op": "regex", "field": field, "pattern": "[a-c]+"}),
        ])
    return st.one_of(*common, *[
        st.builds(lambda op, v: {"op": op, "field": field, "value": v},
                  st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"]),
                  st.integers(-100, 100)),
        st.builds(lambda lo, hi: {"op": "between", "field": field,
                                  "min": lo, "max": hi},
                  st.integers(-50, 0), st.integers(0, 50)),
        st.builds(lambda vs: {"op": "is_in", "field": field, "values": vs},
                  st.lists(st.integers(-10, 10), min_size=1, max_size=5)),
        st.just({"op": "divisible", "field": field, "by": 3}),
        st.just({"op": "type", "field": field, "type": "integer"}),
        st.just({"op": "type", "field": field, "type": "number"}),
    ])


def _pred(depth: int) -> st.SearchStrategy:
    leaf = st.one_of(_leaf("s", "s"), _leaf("i", "i"), _leaf("f", "f"),
                     st.builds(lambda v: {"op": "const", "value": v},
                               st.booleans()))
    if depth == 0:
        return leaf
    sub = _pred(depth - 1)
    return st.one_of(
        leaf,
        st.builds(lambda a: {"op": "not", "arg": a}, sub),
        st.builds(lambda xs: {"op": "and", "args": xs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"op": "or", "args": xs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"op": "one_of", "args": xs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda c, t, e: {"op": "if", "cond": c, "then": t, "else": e},
                  sub, sub, sub),
    )


@settings(max_examples=150, deadline=None)
@given(
    spec=_pred(2),
    s=st.lists(_STRINGS, min_size=1, max_size=8),
    i=st.lists(_INTS, min_size=1, max_size=8),
    f=st.lists(_FLOATS, min_size=1, max_size=8),
)
def test_kernel_equals_python_on_random_inputs(spec, s, i, f):
    n = max(len(s), len(i), len(f))
    pad = lambda xs: (xs * ((n // len(xs)) + 1))[:n]
    table = pa.table({
        "s": pa.array(pad(s), type=pa.string()),
        "i": pa.array(pad(i), type=pa.int64()),
        "f": pa.array(pad(f), type=pa.float64()),
    })
    got = compile_predicate(spec)(table).tolist()
    want = [evaluate_predicate_python(spec, row) for row in table.to_pylist()]
    # float NaN nuance: arrow stores NaN as a valid float; to_pylist
    # yields nan which compares like python nan — both paths treat
    # comparisons with nan as False, so results must agree exactly
    assert got == want, (spec, table.to_pylist(), got, want)
