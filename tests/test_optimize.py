"""Postprocess optimizer: every rewrite must be verdict-preserving.

Property-fuzzed: random predicate specs (reusing the kernel-fuzz
strategies) simplified by the optimizer must evaluate identically to
the original on random rows — via BOTH the Python evaluator and the
compiled Arrow kernel."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_ray.spec.optimize import optimize_plan, simplify_predicate
from jsonschema_ray.spec.plan import CheckPlan, Rule, default_plan
from jsonschema_ray.spec.predicates import (
    compile_predicate, evaluate_predicate_python)
from tests.test_predicates_fuzz import _FLOATS, _INTS, _STRINGS, _pred


def test_constant_folding_and_flattening():
    t = {"op": "const", "value": True}
    f = {"op": "const", "value": False}
    x = {"op": "not_null", "field": "a"}
    assert simplify_predicate({"op": "and", "args": [t, x]}) == x
    assert simplify_predicate({"op": "and", "args": [f, x]}) == f
    assert simplify_predicate({"op": "or", "args": [t, x]}) == t
    assert simplify_predicate({"op": "or", "args": [f, x]}) == x
    nested = {"op": "and", "args": [x, {"op": "and", "args": [x, x]}]}
    assert simplify_predicate(nested) == {"op": "and", "args": [x, x, x]}
    assert simplify_predicate({"op": "not", "arg": {"op": "not", "arg": x}}) == x
    assert simplify_predicate(
        {"op": "if", "cond": t, "then": x, "else": f}) == x


def test_bound_fusion():
    got = simplify_predicate({"op": "and", "args": [
        {"op": "ge", "field": "n", "value": 2},
        {"op": "le", "field": "n", "value": 9},
        {"op": "not_null", "field": "s"}]})
    assert got == {"op": "and", "args": [
        {"op": "not_null", "field": "s"},
        {"op": "between", "field": "n", "min": 2, "max": 9}]}
    assert simplify_predicate(
        {"op": "is_in", "field": "s", "values": ["x"]}) \
        == {"op": "eq", "field": "s", "value": "x"}


def test_dead_rule_elimination():
    plan = CheckPlan(rules=[
        Rule("live", scope="doc", check={"op": "not_null", "field": "a"}),
        Rule("unreachable", scope="doc",
             when={"op": "const", "value": False},
             check={"op": "not_null", "field": "a"}),
        Rule("never_fires", scope="doc", check={"op": "const", "value": True}),
        Rule("disabled", scope="doc", enabled=False,
             check={"op": "not_null", "field": "a"}),
        Rule("guard_folds", scope="doc",
             when={"op": "and", "args": [{"op": "const", "value": True}]},
             check={"op": "not_null", "field": "b"}),
    ])
    opt = optimize_plan(plan)
    assert [r.rule_id for r in opt.rules] == ["live", "guard_folds"]
    assert opt.rules[1].when is None


def test_default_plan_unchanged_semantics():
    """Optimizing the built-in plan must keep every rule (nothing in it
    is dead) and preserve the rule-id set."""
    plan = default_plan()
    opt = optimize_plan(plan)
    assert {r.rule_id for r in opt.rules} == {r.rule_id for r in plan.rules}


@settings(max_examples=150, deadline=None)
@given(
    spec=_pred(2),
    s=st.lists(_STRINGS, min_size=1, max_size=6),
    i=st.lists(_INTS, min_size=1, max_size=6),
    f=st.lists(_FLOATS, min_size=1, max_size=6),
)
def test_simplify_is_verdict_preserving(spec, s, i, f):
    simp = simplify_predicate(spec)
    n = max(len(s), len(i), len(f))
    pad = lambda xs: (xs * ((n // len(xs)) + 1))[:n]
    table = pa.table({
        "s": pa.array(pad(s), type=pa.string()),
        "i": pa.array(pad(i), type=pa.int64()),
        "f": pa.array(pad(f), type=pa.float64()),
    })
    rows = table.to_pylist()
    want = [evaluate_predicate_python(spec, r) for r in rows]
    got_py = [evaluate_predicate_python(simp, r) for r in rows]
    assert got_py == want, (spec, simp)
    got_kernel = compile_predicate(simp)(table).tolist()
    assert got_kernel == want, (spec, simp)
