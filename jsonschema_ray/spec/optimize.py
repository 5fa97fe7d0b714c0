"""CheckPlan postprocess optimizer — the analog of Blaze's compiler
postprocess pass (``/root/reference/vendor/blaze/src/compiler/compile.cc``
fusion/inlining: e.g. ``AssertionTypeStrict``+bounds fuse into
``AssertionTypeIntegerBounded``; constant instructions fold away).

Semantics-preserving rewrites over predicate specs:

- constant folding: ``and``/``or`` absorb ``const`` operands; an
  ``if`` with a constant condition inlines its branch
- flattening: nested ``and(and(..))`` / ``or(or(..))`` collapse
- double negation: ``not(not(x))`` → ``x``
- fusion: ``ge``+``le`` on one field → one ``between`` kernel (the
  *Bounded instruction family); single-value ``is_in`` → ``eq``
- dead-rule elimination: disabled rules and ``when: const false``
  (unreachable) are dropped; a ``check: const true`` rule can never
  fire and is dropped

Every rewrite is verdict-preserving, property-tested against the
unoptimized plan in ``tests/test_optimize.py``.
"""

from __future__ import annotations

from typing import Any

from jsonschema_ray.spec.plan import CheckPlan, Rule


def simplify_predicate(spec: dict[str, Any]) -> dict[str, Any]:
    """Recursively simplify one predicate spec (pure; returns new dict)."""
    op = spec.get("op")

    if op in ("and", "or"):
        args = [simplify_predicate(s) for s in spec["args"]]
        # flatten same-op nesting
        flat: list[dict] = []
        for a in args:
            if a.get("op") == op:
                flat.extend(a["args"])
            else:
                flat.append(a)
        # constant absorption
        absorb, identity = (False, True) if op == "and" else (True, False)
        kept: list[dict] = []
        for a in flat:
            if a.get("op") == "const":
                if bool(a["value"]) == absorb:
                    return {"op": "const", "value": absorb}
                continue  # identity operand drops out
            kept.append(a)
        if not kept:
            return {"op": "const", "value": identity}
        if op == "and":
            kept = _fuse_bounds(kept)
        if len(kept) == 1:
            return kept[0]
        return {"op": op, "args": kept}

    if op == "not":
        inner = simplify_predicate(spec["arg"])
        if inner.get("op") == "not":
            return inner["arg"]
        if inner.get("op") == "const":
            return {"op": "const", "value": not inner["value"]}
        return {"op": "not", "arg": inner}

    if op == "one_of":
        return {"op": "one_of",
                "args": [simplify_predicate(s) for s in spec["args"]]}

    if op == "if":
        cond = simplify_predicate(spec["cond"])
        out = {"op": "if", "cond": cond}
        for k in ("then", "else"):
            if k in spec:
                out[k] = simplify_predicate(spec[k])
        if cond.get("op") == "const":
            branch = out.get("then") if cond["value"] else out.get("else")
            return branch if branch is not None \
                else {"op": "const", "value": True}
        return out

    if op == "is_in" and len(spec.get("values", [])) == 1:
        return {"op": "eq", "field": spec["field"], "value": spec["values"][0]}

    return dict(spec)


def _fuse_bounds(args: list[dict]) -> list[dict]:
    """Inside an ``and``: fuse ``ge``+``le`` (or existing min/max-less
    ``between``) on the same field into ONE ``between`` kernel — the
    *Bounded fusion (one Arrow pass instead of two + a combine)."""
    lo: dict[str, Any] = {}
    hi: dict[str, Any] = {}
    rest: list[dict] = []
    order: list[str] = []
    for a in args:
        f = a.get("field")
        if a.get("op") == "ge" and f is not None and f not in lo:
            lo[f] = a["value"]
            order.append(f) if f not in order else None
        elif a.get("op") == "le" and f is not None and f not in hi:
            hi[f] = a["value"]
            order.append(f) if f not in order else None
        else:
            rest.append(a)
    for f in order:
        if f in lo and f in hi:
            rest.append({"op": "between", "field": f,
                         "min": lo[f], "max": hi[f]})
        elif f in lo:
            rest.append({"op": "ge", "field": f, "value": lo[f]})
        else:
            rest.append({"op": "le", "field": f, "value": hi[f]})
    return rest


def optimize_plan(plan: CheckPlan) -> CheckPlan:
    """Apply the postprocess pass to every rule. Dead rules drop;
    live rules get simplified/fused ``when``/``check`` specs."""
    rules: list[Rule] = []
    for r in plan.rules:
        if not r.enabled:
            continue
        when = simplify_predicate(r.when) if r.when else None
        if when is not None and when.get("op") == "const":
            if not when["value"]:
                continue  # unreachable rule
            when = None  # always-on guard folds away
        check = simplify_predicate(r.check) if r.check else None
        if r.kind == "predicate" and check is not None \
                and check.get("op") == "const" and check["value"]:
            continue  # can never fire
        params = dict(r.params)
        if r.kind == "contains" and "predicate" in params:
            params["predicate"] = simplify_predicate(params["predicate"])
        rules.append(Rule(r.rule_id, kind=r.kind, scope=r.scope, when=when,
                          check=check, params=params, message=r.message,
                          severity=r.severity, enabled=True))
    return CheckPlan(rules=rules, mode=plan.mode, version=plan.version)
