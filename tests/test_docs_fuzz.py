"""Whole-document fuzz: the compiled row checker ≡ the oracle on
random interleaved docs (random kinds/nulls/offsets/span counts),
including the monotonic, contains and unique_items kinds."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from jsonschema_ray.sources.synth import SPAN_SCHEMA
from jsonschema_ray.spec.compile import CompiledRowChecker
from jsonschema_ray.spec.plan import CheckPlan, Rule, default_plan
from tests.oracle import oracle_violations

_span = st.fixed_dictionaries({
    "kind": st.one_of(st.none(), st.sampled_from(
        ["text", "image", "audio", "table", "video", "weird"])),
    "text": st.one_of(st.none(), st.text(alphabet="abé ", max_size=6)),
    "media_ref": st.one_of(
        st.none(), st.just("media://0123456789abcdef"),
        st.just("media://ffffffffffffffff"), st.just("http://x"),
        st.just("")),
    "offset": st.one_of(st.none(), st.integers(-5, 60)),
})

_doc = st.fixed_dictionaries({
    "doc_id": st.text(alphabet="dk09", min_size=1, max_size=6),
    "spans": st.one_of(st.none(), st.lists(_span, max_size=6)),
})

CATALOG = {"media://0123456789abcdef"}

FULL_PLAN = CheckPlan(rules=default_plan().rules + [
    Rule("has_text_span", kind="contains", scope="doc",
         params={"predicate": {"op": "eq", "field": "kind", "value": "text"},
                 "min": 1}, message="m"),
    Rule("uniq_refs", kind="unique_items", scope="span",
         params={"field": "media_ref"}, message="m"),
])


def _table(docs):
    return pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], type=pa.string()),
        "spans": pa.array([d["spans"] for d in docs],
                          type=pa.list_(SPAN_SCHEMA)),
    })


@settings(max_examples=120, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_checker_matches_oracle_on_random_docs(docs):
    # unique-rule semantics are dataset-scope and handled by the
    # pipeline, not the row checker → compare on row-local rules only
    plan = CheckPlan(rules=[r for r in FULL_PLAN.rules if r.kind != "unique"])
    checker = CompiledRowChecker(plan.to_json(), catalog_keys=sorted(CATALOG))
    t = _table(docs)
    v = checker.violations(t)
    got = set(zip(v.column("doc_id").to_pylist(),
                  v.column("rule_id").to_pylist(),
                  v.column("span_index").to_pylist()))
    # duplicate doc_ids across fuzz docs: keys collapse identically in
    # both paths (sets), so equality still holds
    want = oracle_violations(docs, plan, CATALOG)
    assert got == want, (docs, sorted(got - want), sorted(want - got))
