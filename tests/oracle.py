"""Independent pure-Python validation oracle.

Re-evaluates a CheckPlan row-by-row the way the reference's sequential
evaluator does (one doc at a time, ``/root/reference/src/command_validate.cc:374-415``)
— deliberately NOT sharing the Arrow kernel code under test. Predicate
rules go through ``evaluate_predicate_python`` (the slow reference
implementation in spec/predicates.py); monotonic / unique / ref
semantics are re-implemented here in plain Python.

Returns the violation key set ``{(doc_id, rule_id, span_index)}`` —
the exactness contract of BASELINE.json.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, Iterable

from jsonschema_ray.spec.plan import CheckPlan
from jsonschema_ray.spec.predicates import evaluate_predicate_python

Key = tuple[str, str, int]


def oracle_violations(
    docs: Iterable[dict[str, Any]],
    plan: CheckPlan,
    catalog: set[str] | None = None,
) -> set[Key]:
    docs = list(docs)
    out: set[Key] = set()

    pred_span = [(r.rule_id, r.when, r.check) for r in plan.rules
                 if r.kind == "predicate" and r.scope == "span" and r.enabled]
    pred_doc = [(r.rule_id, r.when, r.check) for r in plan.rules
                if r.kind == "predicate" and r.scope == "doc" and r.enabled]
    mono = [(r.rule_id, r.params.get("field", "offset"), r.params.get("strict", True))
            for r in plan.rules if r.kind == "monotonic" and r.enabled]
    uniq = [(r.rule_id, r.params["key"]) for r in plan.rules
            if r.kind == "unique" and r.enabled]
    refs = [(r.rule_id, r.params["field"], r.when) for r in plan.rules
            if r.kind == "ref" and r.enabled] if catalog is not None else []
    contains = [(r.rule_id, r.params["predicate"], r.params.get("min", 1),
                 r.params.get("max")) for r in plan.rules
                if r.kind == "contains" and r.enabled]
    uniq_items = [(r.rule_id, r.params["field"]) for r in plan.rules
                  if r.kind == "unique_items" and r.enabled]
    # json_schema rules reuse the compiled evaluator (spec/jschema.py) —
    # that evaluator is itself oracled against hand-written fixtures in
    # test_jschema.py; HERE the independence claim covers the columnar
    # kernels and pipeline plumbing, not the schema evaluator.
    from jsonschema_ray.spec.jschema import compile_schema as _cs
    jschema = [(r.rule_id, r.params["field"], _cs(r.params["schema"]), r.when)
               for r in plan.rules if r.kind == "json_schema" and r.enabled]

    for doc in docs:
        doc_id = doc["doc_id"]
        spans = doc.get("spans") or []
        doc_row = dict(doc)
        doc_row["n_spans"] = len(spans)
        for rule_id, when, check in pred_doc:
            if when is not None and not evaluate_predicate_python(when, doc_row):
                continue
            if not evaluate_predicate_python(check, doc_row):
                out.add((doc_id, rule_id, -1))
        for rule_id, field, cs, when in jschema:
            if when is not None and not evaluate_predicate_python(when, doc_row):
                continue
            v = doc.get(field)
            if v is None:
                continue
            if isinstance(v, (str, bytes)):
                import json as _json
                try:
                    v = _json.loads(v)
                except ValueError:
                    out.add((doc_id, rule_id, -1))
                    continue
            if not cs.is_valid(v):
                out.add((doc_id, rule_id, -1))
        for i, span in enumerate(spans):
            span = dict(span, _span_index=i)
            for rule_id, when, check in pred_span:
                if when is not None and not evaluate_predicate_python(when, span):
                    continue
                if not evaluate_predicate_python(check, span):
                    out.add((doc_id, rule_id, i))
            for rule_id, field, when in refs:
                v = span.get(field)
                if when is not None and not evaluate_predicate_python(when, span):
                    continue
                if when is None and v is None:
                    continue
                if v not in catalog:
                    out.add((doc_id, rule_id, i))
        for rule_id, pred, lo, hi in contains:
            n_match = sum(1 for i, s in enumerate(spans)
                          if evaluate_predicate_python(
                              pred, dict(s, _span_index=i)))
            if n_match < lo or (hi is not None and n_match > hi):
                out.add((doc_id, rule_id, -1))
        for rule_id, field in uniq_items:
            seen_vals: set = set()
            for i, span in enumerate(spans):
                v = span.get(field)
                if v is None:
                    continue
                if v in seen_vals:
                    out.add((doc_id, rule_id, i))
                seen_vals.add(v)
        for rule_id, field, strict in mono:
            for i in range(1, len(spans)):
                cur, prev = spans[i].get(field), spans[i - 1].get(field)
                bad = cur is None or prev is None or (
                    cur <= prev if strict else cur < prev)
                if bad:
                    out.add((doc_id, rule_id, i))

    for rule_id, key in uniq:
        counts = Counter(d[key] for d in docs if d.get(key) is not None)
        for k, n in counts.items():
            if n > 1:
                out.add((k, rule_id, -1))
    return out


def failing_docs_row_local(docs, plan, catalog=None) -> set[str]:
    """Doc ids with ≥1 row-local (non-unique) violation — the fast-mode
    ``failed_docs`` expectation."""
    plan_no_unique = CheckPlan(
        rules=[r for r in plan.rules if r.kind != "unique"], mode=plan.mode)
    keys = oracle_violations(docs, plan_no_unique, catalog)
    return {doc_id for doc_id, _, _ in keys}
