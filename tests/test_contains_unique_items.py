"""`contains` (LoopContains) and `unique_items` (AssertionUnique) rules."""

import pyarrow as pa

from jsonschema_ray.pipelines.validate import validate
from jsonschema_ray.sources.readers import DatasetSource
from jsonschema_ray.sources.synth import SPAN_SCHEMA
from jsonschema_ray.spec.plan import CheckPlan, Rule
from tests.oracle import oracle_violations


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_SCHEMA)),
    })


def _span(kind="text", text="x", ref=None, off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


CONTAINS_PLAN = CheckPlan(rules=[
    Rule("needs_text_span", kind="contains", scope="doc",
         params={"predicate": {"op": "eq", "field": "kind", "value": "text"},
                 "min": 1},
         message="doc must contain at least one text span"),
    Rule("max_two_images", kind="contains", scope="doc",
         params={"predicate": {"op": "eq", "field": "kind", "value": "image"},
                 "min": 0, "max": 2},
         message="doc must contain at most two image spans"),
    Rule("no_dup_refs", kind="unique_items", scope="span",
         params={"field": "media_ref"},
         message="media_ref must be unique within a doc"),
])


def _table():
    img = lambda r, o: _span(kind="image", text=None, ref=r, off=o)
    return _docs([
        ("ok", [_span(off=0), img("media://aaaaaaaaaaaaaaaa", 5)]),
        ("no_text", [img("media://bbbbbbbbbbbbbbbb", 0)]),
        ("too_many_images", [_span(off=0)] + [
            img(f"media://{i:016x}", 10 + i) for i in range(3)]),
        ("dup_refs", [_span(off=0),
                      img("media://cccccccccccccccc", 5),
                      img("media://cccccccccccccccc", 9),
                      img("media://dddddddddddddddd", 12),
                      img("media://cccccccccccccccc", 20)]),
        ("empty", []),
    ])


def test_contains_and_unique_items(ray_session):
    import ray.data as rd

    table = _table()
    res = validate(DatasetSource(rd.from_arrow(table)), CONTAINS_PLAN)
    t = res.table()
    got = set(zip(t.column("doc_id").to_pylist(),
                  t.column("rule_id").to_pylist(),
                  t.column("span_index").to_pylist()))
    assert got == {
        ("no_text", "needs_text_span", -1),
        ("too_many_images", "max_two_images", -1),
        ("dup_refs", "no_dup_refs", 2),       # second 'cccc...'
        ("dup_refs", "no_dup_refs", 4),       # third  'cccc...'
        ("dup_refs", "max_two_images", -1),   # four image spans
        ("empty", "needs_text_span", -1),
    }


def test_matches_oracle(ray_session):
    import ray.data as rd

    table = _table()
    res = validate(DatasetSource(rd.from_arrow(table)), CONTAINS_PLAN)
    t = res.table()
    got = set(zip(t.column("doc_id").to_pylist(),
                  t.column("rule_id").to_pylist(),
                  t.column("span_index").to_pylist()))
    assert got == oracle_violations(table.to_pylist(), CONTAINS_PLAN)


def test_warning_severity_does_not_fail_verdict(ray_session):
    import ray.data as rd

    plan = CheckPlan(rules=[
        Rule("soft_text_len", scope="span", severity="warning",
             when={"op": "eq", "field": "kind", "value": "text"},
             check={"op": "utf8_len", "field": "text", "max": 3},
             message="text longer than advised"),
    ])
    table = _docs([("a", [_span(text="this is long", off=0)])])
    res = validate(DatasetSource(rd.from_arrow(table)), plan)
    assert res.violation_count() == 1      # warning is still reported
    assert res.overall_pass()              # …but doesn't fail the run
    assert res.exit_code() == 0

    plan2 = CheckPlan(rules=plan.rules + [
        Rule("hard_kind", scope="span",
             check={"op": "is_in", "field": "kind", "values": ["image"]},
             message="must be image")])
    res2 = validate(DatasetSource(rd.from_arrow(table)), plan2)
    assert res2.exit_code() == 2           # error rule still fails


def test_fast_mask_counts_contains(ray_session):
    from jsonschema_ray.spec.compile import CompiledRowChecker

    checker = CompiledRowChecker(CONTAINS_PLAN.to_json())
    fail = checker.fail_mask(_table())
    assert fail.tolist() == [False, True, True, True, True]


def test_positional_span_rule(ray_session):
    """prefixItems analog: the first span of every doc must be text."""
    import ray.data as rd

    plan = CheckPlan(rules=[
        Rule("first_span_text", scope="span",
             when={"op": "eq", "field": "_span_index", "value": 0},
             check={"op": "eq", "field": "kind", "value": "text"},
             message="first span must be a text span")])
    table = _docs([
        ("good", [_span(off=0),
                  _span(kind="image", text=None,
                        ref="media://0123456789abcdef", off=5)]),
        ("bad", [_span(kind="image", text=None,
                       ref="media://0123456789abcdef", off=0),
                 _span(off=5)]),
    ])
    res = validate(DatasetSource(rd.from_arrow(table)), plan)
    t = res.table()
    got = set(zip(t.column("doc_id").to_pylist(),
                  t.column("rule_id").to_pylist(),
                  t.column("span_index").to_pylist()))
    assert got == {("bad", "first_span_text", 0)}
    assert got == oracle_violations(table.to_pylist(), plan)
