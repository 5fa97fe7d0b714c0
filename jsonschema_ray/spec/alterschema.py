"""Alterschema-style canonicalization transforms for schema DOCUMENTS.

The reference's ``lint --fix`` applies a registry of rewrite rules to a
fixpoint (``vendor/blaze/src/alterschema``: ``linter/`` +  ``common/``,
driven by ``transformer.cc``). This module implements the most common
of those rules as pure functions over the schema tree; each entry cites
its reference header. ``canonicalize`` applies all rules to a fixpoint;
``lint_fixable`` reports which rules WOULD fire (for ``lint`` without
``--fix``).

Every transform is semantics-preserving: ``tests/test_alterschema.py``
property-checks that the canonicalized schema accepts exactly the same
instances as the original (differential against the evaluator).
"""

from __future__ import annotations

import json
from typing import Any, Callable

# version-agnostic subschema shape sets for the transform walk (the
# dialect-gated table lives in spec/jschema._SUBSCHEMA_KW; transforms
# run on already-dialect-checked documents so the union is safe here)
_SUBSCHEMA = {"items", "additionalItems", "unevaluatedItems", "contains",
              "not", "if", "then", "else", "propertyNames",
              "additionalProperties", "unevaluatedProperties",
              "contentSchema"}
_SUBSCHEMA_LIST = {"allOf", "anyOf", "oneOf", "prefixItems"}
_SUBSCHEMA_MAP = {"properties", "patternProperties", "dependentSchemas",
                  "$defs", "definitions"}

# each rule: name -> fn(node_dict) -> (changed: bool, new_node)
# rules see a SCHEMA OBJECT (dict) and return a replacement


def _enum_to_const(n: dict):
    # linter/enum_to_const.h: single-element enum → const
    if "const" not in n and isinstance(n.get("enum"), list) \
            and len(n["enum"]) == 1:
        m = dict(n)
        m["const"] = m.pop("enum")[0]
        return True, m
    return False, n


def _const_in_enum(n: dict):
    # common/const_in_enum.h: const present and member of enum → drop enum
    if "const" in n and isinstance(n.get("enum"), list) \
            and any(_jeq(n["const"], e) for e in n["enum"]):
        m = dict(n)
        del m["enum"]
        return True, m
    return False, n


def _duplicate_enum_values(n: dict):
    # common/duplicate_enum_values.h
    e = n.get("enum")
    if isinstance(e, list):
        seen, out = set(), []
        for v in e:
            k = json.dumps(v, sort_keys=True)
            if k not in seen:
                seen.add(k)
                out.append(v)
        if len(out) != len(e):
            m = dict(n)
            m["enum"] = out
            return True, m
    return False, n


def _duplicate_required_values(n: dict):
    # common/duplicate_required_values.h
    r = n.get("required")
    if isinstance(r, list) and len(set(r)) != len(r) \
            and all(isinstance(x, str) for x in r):
        m = dict(n)
        m["required"] = list(dict.fromkeys(r))
        return True, m
    return False, n


def _duplicate_applicator_branches(n: dict):
    # common/duplicate_allof_branches.h / duplicate_anyof_branches.h
    for app in ("allOf", "anyOf"):
        b = n.get(app)
        if isinstance(b, list):
            seen, out = set(), []
            for v in b:
                k = json.dumps(v, sort_keys=True)
                if k not in seen:
                    seen.add(k)
                    out.append(v)
            if len(out) != len(b):
                m = dict(n)
                m[app] = out
                return True, m
    return False, n


def _flatten_nested_allof(n: dict):
    # common/flatten_nested_allof.h
    b = n.get("allOf")
    if isinstance(b, list) and any(isinstance(x, dict)
                                   and set(x) == {"allOf"}
                                   and isinstance(x["allOf"], list)
                                   for x in b):
        out = []
        for x in b:
            if isinstance(x, dict) and set(x) == {"allOf"} \
                    and isinstance(x["allOf"], list):
                out.extend(x["allOf"])
            else:
                out.append(x)
        m = dict(n)
        m["allOf"] = out
        return True, m
    return False, n


def _drop_empty_applicator_schemas(n: dict):
    # common/drop_allof_empty_schemas.h / anyof_true_simplify is separate
    b = n.get("allOf")
    if isinstance(b, list) and len(b) > 1 and \
            any(x is True or x == {} for x in b):
        m = dict(n)
        m["allOf"] = [x for x in b if not (x is True or x == {})] \
            or [True]
        return True, m
    return False, n


def _allof_single_true(n: dict):
    # degenerate allOf:[true] with siblings → drop the allOf entirely
    if n.get("allOf") == [True] and len(n) > 1:
        m = dict(n)
        del m["allOf"]
        return True, m
    return False, n


def _anyof_remove_false_schemas(n: dict):
    # common/anyof_remove_false_schemas.h (keep at least one branch)
    b = n.get("anyOf")
    if isinstance(b, list) and len(b) > 1 and \
            any(x is False for x in b):
        kept = [x for x in b if x is not False]
        if kept:
            m = dict(n)
            m["anyOf"] = kept
            return True, m
    return False, n


_NON_ANNOTATING = {
    "type", "const", "enum", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "format", "required", "minItems", "maxItems", "uniqueItems",
    "minProperties", "maxProperties", "dependentRequired",
    "title", "description", "$comment", "examples", "default",
}


def _double_negation_elimination(n: dict):
    # common/double_negation_elimination.h: not: {not: S} → allOf:[S].
    # Stricter guard than the reference (which only excludes SIBLING
    # unevaluated*): `not` discards S's annotations but allOf exposes
    # them to ANCESTOR unevaluated* too, so only rewrite when S cannot
    # produce annotations at all (boolean, or assertion-only object).
    inner = n.get("not")
    if isinstance(inner, dict) and set(inner) == {"not"} \
            and "unevaluatedProperties" not in n \
            and "unevaluatedItems" not in n:
        s = inner["not"]
        if isinstance(s, bool) or (isinstance(s, dict)
                                   and set(s) <= _NON_ANNOTATING):
            m = dict(n)
            del m["not"]
            m["allOf"] = list(m.get("allOf", [])) + [s]
            return True, m
    return False, n


def _definitions_to_defs(n: dict):
    # linter/definitions_to_defs.h (2019-09+: $defs is the keyword).
    # Guarded: never fire while any textual '#/definitions' pointer
    # exists under this node — renaming would dangle those $refs.
    if "definitions" in n and "$defs" not in n \
            and "/definitions" not in json.dumps(n):
        m = dict(n)
        m["$defs"] = m.pop("definitions")
        return True, m
    return False, n


def _else_without_if(n: dict):
    # common/else_without_if.h (+ then): conditionals without if are dead
    if "if" not in n and ("then" in n or "else" in n):
        m = {k: v for k, v in n.items() if k not in ("then", "else")}
        return True, m
    return False, n


def _then_else_empty(n: dict):
    # linter/then_empty.h / else_empty.h: then/else: true are no-ops
    if "if" in n and (n.get("then") is True or n.get("else") is True):
        m = {k: v for k, v in n.items()
             if not (k in ("then", "else") and v is True)}
        return True, m
    return False, n


def _exclusive_and_inclusive_bounds(n: dict):
    # common/exclusive_maximum_number_and_maximum.h (+ minimum variant):
    # keep the strictly tighter of the two
    changed, m = False, n
    if isinstance(n.get("exclusiveMaximum"), (int, float)) \
            and not isinstance(n.get("exclusiveMaximum"), bool) \
            and isinstance(n.get("maximum"), (int, float)) \
            and not isinstance(n.get("maximum"), bool):
        m = dict(m)
        if m["exclusiveMaximum"] <= m["maximum"]:
            del m["maximum"]
        else:
            del m["exclusiveMaximum"]
        changed = True
    if isinstance(m.get("exclusiveMinimum"), (int, float)) \
            and not isinstance(m.get("exclusiveMinimum"), bool) \
            and isinstance(m.get("minimum"), (int, float)) \
            and not isinstance(m.get("minimum"), bool):
        m = dict(m)
        if m["exclusiveMinimum"] >= m["minimum"]:
            del m["minimum"]
        else:
            del m["exclusiveMinimum"]
        changed = True
    return changed, m


def _equal_numeric_bounds_to_enum(n: dict):
    # common/equal_numeric_bounds_to_enum.h: min == max → enum [value]
    lo, hi = n.get("minimum"), n.get("maximum")
    if isinstance(lo, (int, float)) and not isinstance(lo, bool) \
            and isinstance(hi, (int, float)) and not isinstance(hi, bool) \
            and lo == hi and "const" not in n and "enum" not in n \
            and n.get("type") in ("number", "integer"):
        m = {k: v for k, v in n.items() if k not in ("minimum", "maximum")}
        m["enum"] = [lo]
        return True, m
    return False, n


def _title_description_trim(n: dict):
    # linter/title_trim.h / description_trim.h
    changed, m = False, n
    for k in ("title", "description"):
        v = m.get(k)
        if isinstance(v, str) and v != v.strip():
            m = dict(m)
            m[k] = v.strip()
            changed = True
    return changed, m


def _jeq(a, b) -> bool:
    """JSON equality (bool is not a number)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


def _type_matches(v: Any, t: str, *, int_matches_integral: bool) -> bool:
    if t == "string":
        return isinstance(v, str)
    if t == "boolean":
        return isinstance(v, bool)
    if t == "null":
        return v is None
    if t == "integer":
        if isinstance(v, bool):
            return False
        return isinstance(v, int) or (
            int_matches_integral and isinstance(v, float)
            and v == int(v))
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "array":
        return isinstance(v, list)
    if t == "object":
        return isinstance(v, dict)
    return False


def _enum_with_type(n: dict, ver: int = 2020):
    # common/enum_with_type.h: `type` alongside `enum` is an
    # anti-pattern; droppable ONLY when every enum member already
    # conforms to the declared type (exactly the reference condition,
    # so the rewrite is semantics-preserving; draft-6/7 let `integer`
    # admit integral reals)
    t = n.get("type")
    e = n.get("enum")
    if t is None or not isinstance(e, list) or not e:
        return False, n
    types = [t] if isinstance(t, str) else t
    if not isinstance(types, list) or \
            not all(isinstance(x, str) for x in types):
        return False, n
    imi = ver in (6, 7)
    if all(any(_type_matches(v, tt, int_matches_integral=imi)
               for tt in types) for v in e):
        m = dict(n)
        del m["type"]
        return True, m
    return False, n


def _const_with_type(n: dict, ver: int = 2020):
    # common/const_with_type.h: same reasoning for `const`
    t = n.get("type")
    if t is None or "const" not in n:
        return False, n
    types = [t] if isinstance(t, str) else t
    if not isinstance(types, list) or \
            not all(isinstance(x, str) for x in types):
        return False, n
    imi = ver in (6, 7)
    if any(_type_matches(n["const"], tt, int_matches_integral=imi)
           for tt in types):
        m = dict(n)
        del m["type"]
        return True, m
    return False, n


def _content_media_type_without_encoding(n: dict):
    # common/content_media_type_without_encoding.h: contentMediaType is
    # meaningless without contentEncoding
    if "contentMediaType" in n and "contentEncoding" not in n:
        m = dict(n)
        del m["contentMediaType"]
        return True, m
    return False, n


def _duplicate_examples(n: dict):
    # linter/duplicate_examples.h
    e = n.get("examples")
    if isinstance(e, list):
        seen, out = set(), []
        for v in e:
            k = json.dumps(v, sort_keys=True)
            if k not in seen:
                seen.add(k)
                out.append(v)
        if len(out) != len(e):
            m = dict(n)
            m["examples"] = out
            return True, m
    return False, n


# The reference's "keyword present with its no-op default" family
# (linter/properties_default.h, pattern_properties_default.h,
# dependent_required_default.h, multiple_of_default.h,
# items_schema_default.h, property_names_default.h,
# content_schema_default.h, unevaluated_properties_default.h,
# unevaluated_items_default.h, …): each keyword set to the value the
# spec already assumes is droppable.  (rule name, keyword,
# no-op values, min dialect version)
_DEFAULTS_FAMILY: list[tuple[str, str, tuple, int]] = [
    ("properties_default", "properties", ({},), 0),
    ("pattern_properties_default", "patternProperties", ({},), 0),
    ("dependencies_default", "dependencies", ({},), 0),
    ("dependent_required_default", "dependentRequired", ({},), 2019),
    ("multiple_of_default", "multipleOf", (1, 1.0), 0),
    ("min_items_default", "minItems", (0,), 0),
    ("min_length_default", "minLength", (0,), 0),
    ("min_properties_default", "minProperties", (0,), 0),
    ("unique_items_default", "uniqueItems", (False,), 0),
    ("items_schema_default", "items", (True, {}), 0),
    ("property_names_default", "propertyNames", (True, {}), 6),
    ("property_names_type_default", "propertyNames",
     ({"type": "string"},), 6),
    ("content_schema_default", "contentSchema", (True, {}), 2019),
    ("unevaluated_properties_default", "unevaluatedProperties",
     (True,), 2019),
    ("unevaluated_items_default", "unevaluatedItems", (True,), 2019),
]


def _make_default_rule(keyword: str, noop_values: tuple):
    def rule(n: dict):
        if keyword in n and any(
                _jeq(n[keyword], v) for v in noop_values):
            m = dict(n)
            del m[keyword]
            return True, m
        return False, n
    return rule


#: rule name -> (fn, min dialect version: 0 = all, 6/7 = draft-6/7+,
#: 2019/2020 = modern only).  Gating matters BOTH ways: draft-4 has no
#: `const`, so enum_to_const would change semantics there
#: (pass_lint_json.sh: single-member enum is CLEAN under draft-4).
def _self_validates(sch: dict, value: Any) -> bool | None:
    """Validate a sample value against its OWN subschema in isolation;
    None when the node doesn't compile standalone (refs out of scope)."""
    try:
        from jsonschema_ray.spec.jschema import compile_schema

        probe = {k: v for k, v in sch.items()
                 if k not in ("default", "examples", "$schema", "$id", "id")}
        return compile_schema(probe).is_valid(value)
    except Exception:  # noqa: BLE001 — non-standalone node: skip
        return None


def _valid_default(sch: dict) -> tuple[bool, dict]:
    """Remove a `default` that does not validate against its own
    subschema (reference linter valid_default autofix,
    test/lint/pass_lint_default_fix.sh)."""
    if "default" not in sch:
        return False, sch
    ok = _self_validates(sch, sch["default"])
    if ok is False:
        out = dict(sch)
        del out["default"]
        return True, out
    return False, sch


def _valid_examples(sch: dict) -> tuple[bool, dict]:
    """Remove `examples` entries that do not validate against their
    own subschema (reference linter valid_examples autofix)."""
    ex = sch.get("examples")
    if not isinstance(ex, list) or not ex:
        return False, sch
    keep = [v for v in ex if _self_validates(sch, v) is not False]
    if len(keep) == len(ex):
        return False, sch
    out = dict(sch)
    if keep:
        out["examples"] = keep
    else:
        del out["examples"]
    return True, out


RULES: dict[str, Callable[[dict], tuple[bool, dict]]] = {
    "enum_to_const": _enum_to_const,
    "const_in_enum": _const_in_enum,
    "duplicate_enum_values": _duplicate_enum_values,
    "duplicate_required_values": _duplicate_required_values,
    "duplicate_applicator_branches": _duplicate_applicator_branches,
    "flatten_nested_allof": _flatten_nested_allof,
    "drop_allof_empty_schemas": _drop_empty_applicator_schemas,
    "allof_single_true": _allof_single_true,
    "anyof_remove_false_schemas": _anyof_remove_false_schemas,
    "double_negation_elimination": _double_negation_elimination,
    "definitions_to_defs": _definitions_to_defs,
    "else_without_if": _else_without_if,
    "then_else_empty": _then_else_empty,
    "exclusive_and_inclusive_bounds": _exclusive_and_inclusive_bounds,
    "equal_numeric_bounds_to_enum": _equal_numeric_bounds_to_enum,
    "title_description_trim": _title_description_trim,
    "enum_with_type": _enum_with_type,
    "const_with_type": _const_with_type,
    "content_media_type_without_encoding":
        _content_media_type_without_encoding,
    "duplicate_examples": _duplicate_examples,
    "valid_default": _valid_default,
    "valid_examples": _valid_examples,
}
for _name, _kw, _vals, _mv in _DEFAULTS_FAMILY:
    RULES[_name] = _make_default_rule(_kw, _vals)

#: minimum dialect version per rule; absent = applies everywhere.
RULE_MIN_VER: dict[str, int] = {
    "enum_to_const": 6,              # draft-4 has no `const`
    "const_in_enum": 6,
    "const_with_type": 6,
    "definitions_to_defs": 2019,     # `$defs` is 2019-09+
    "else_without_if": 7,
    "then_else_empty": 7,
    "exclusive_and_inclusive_bounds": 6,   # draft-4 exclusive* is bool
    "content_media_type_without_encoding": 7,
    "duplicate_examples": 6,
}
RULE_MIN_VER.update({name: mv for name, _, _, mv in _DEFAULTS_FAMILY})

#: rules that take the dialect version as a second argument
_VER_AWARE = {"enum_with_type", "const_with_type"}


def dialect_version(schema: Any) -> int:
    """0 = unknown/none (treated as latest), else 3/4/6/7/2019/2020."""
    ds = schema.get("$schema") if isinstance(schema, dict) else None
    if not isinstance(ds, str):
        return 2020
    for tag, v in (("2020-12", 2020), ("2019-09", 2019), ("draft-07", 7),
                   ("draft-06", 6), ("draft-04", 4), ("draft-03", 3)):
        if tag in ds:
            return v
    return 2020


def _walk(node: Any, fn: Callable[[dict, str], dict], ptr: str = "") -> Any:
    """Bottom-up rewrite over schema positions only (data-keyed maps
    like ``properties`` keep keys; their values are schemas)."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        esc = k.replace("~", "~0").replace("/", "~1")
        if k in _SUBSCHEMA and isinstance(v, (dict, bool)):
            out[k] = _walk(v, fn, f"{ptr}/{esc}")
        elif k in _SUBSCHEMA_LIST and isinstance(v, list):
            out[k] = [_walk(x, fn, f"{ptr}/{esc}/{i}")
                      for i, x in enumerate(v)]
        elif (k in _SUBSCHEMA_MAP or k == "dependentSchemas") \
                and isinstance(v, dict):
            out[k] = {kk: _walk(vv, fn,
                                f"{ptr}/{esc}/"
                                f"{kk.replace('~', '~0').replace('/', '~1')}")
                      for kk, vv in v.items()}
        elif k == "items" and isinstance(v, list):  # draft-07 array form
            out[k] = [_walk(x, fn, f"{ptr}/{esc}/{i}")
                      for i, x in enumerate(v)]
        else:
            out[k] = v
    return fn(out, ptr)


def canonicalize(schema: Any, max_passes: int = 32,
                 disabled: frozenset | set = frozenset(),
                 only: frozenset | set | None = None,
                 ) -> tuple[Any, list[tuple[str, str]]]:
    """Apply all transforms to a FIXPOINT (the reference transformer
    loops until no rule fires). Returns (new_schema, [(rule, pointer)]
    in application order). Rules are gated by the document's declared
    dialect (RULE_MIN_VER): e.g. ``enum_to_const`` never fires under
    draft-4, where `const` does not exist.  ``x-lint-exclude`` scopes
    are honored at APPLICATION time (not post-filtered), so excluding
    a rule also prevents chained rules from firing on its intermediate
    output (``test/lint/pass_lint_exclude_array.sh``); ``disabled`` /
    ``only`` are the --exclude / --only flags."""
    applied: list[tuple[str, str]] = []
    ver = dialect_version(schema)
    scopes = lint_exclusions(schema)

    def _excluded(name: str, ptr: str) -> bool:
        if name in disabled:
            return True
        if only is not None and name not in only:
            return True
        return any((ptr == scope or ptr.startswith(scope + "/")
                    or scope == "") and name in names
                   for scope, names in scopes)

    def apply_rules(node: dict, ptr: str) -> dict:
        for name, rule in RULES.items():
            if RULE_MIN_VER.get(name, 0) > ver:
                continue
            if _excluded(name, ptr):
                continue
            if name in _VER_AWARE:
                changed, node2 = rule(node, ver)
            else:
                changed, node2 = rule(node)
            if changed:
                applied.append((name, ptr or "/"))
                node = node2
        return node

    cur = schema
    for _ in range(max_passes):
        before = len(applied)
        cur = _walk(cur, apply_rules)
        if len(applied) == before:
            break
    return cur, applied


def lint_fixable(schema: Any, disabled: frozenset | set = frozenset(),
                 only: frozenset | set | None = None,
                 ) -> list[tuple[str, str, str]]:
    """(severity, pointer, message) findings for every transform that
    WOULD fire — the report side of ``lint --fix``."""
    _, applied = canonicalize(schema, disabled=disabled, only=only)
    return [("warning", ptr, f"fixable: {name}") for name, ptr in applied]


# ---------------------------------------------------------------------------
# dialect upgrade (the `upgrade` verb on schema documents)
# ---------------------------------------------------------------------------

_DIALECT_2020_12 = "https://json-schema.org/draft/2020-12/schema"


_TARGET_VER = {"draft4": 4, "draft6": 6, "draft7": 7,
               "2019-09": 2019, "2020-12": 2020}
_TARGET_URI = {4: "http://json-schema.org/draft-04/schema#",
               6: "http://json-schema.org/draft-06/schema#",
               7: "http://json-schema.org/draft-07/schema#",
               2019: "https://json-schema.org/draft/2019-09/schema",
               2020: "https://json-schema.org/draft/2020-12/schema"}


def _upgrade_node(n: dict, from3: bool = False, to: int = 2020) -> dict:
    """Mechanical keyword migrations to 2020-12 at one schema object
    (upgrade_draft_4_to_draft_6.h:77-120 id/exclusive-bounds,
    draft-7→2019-09 definitions/dependencies, 2019-09→2020-12 items
    array form; draft-3 divisibleBy/disallow/extends/required-bool when
    ``from3``). ``$recursiveRef``/``$recursiveAnchor`` are left alone —
    the evaluator understands them natively, and the reference's rename
    requires anchor-name generation + global ref rewrites."""
    m = dict(n)
    if to >= 6 and isinstance(m.get("id"), str) and "$id" not in m:
        m["$id"] = m.pop("id")
    if from3 and to >= 4:
        if "divisibleBy" in m and "multipleOf" not in m:
            m["multipleOf"] = m.pop("divisibleBy")
        dis = m.pop("disallow", None)
        if isinstance(dis, str):
            m.setdefault("not", {"type": dis})
        elif isinstance(dis, list) and dis:
            simple = [t for t in dis if isinstance(t, str)]
            if len(simple) == len(dis):
                m.setdefault("not", {"type": simple[0]} if len(simple) == 1
                             else {"anyOf": [{"type": t} for t in simple]})
        ext = m.pop("extends", None)
        if isinstance(ext, dict):
            m["allOf"] = list(m.get("allOf", [])) + [ext]
        elif isinstance(ext, list):
            m["allOf"] = list(m.get("allOf", [])) + ext
        # per-property boolean `required` → parent-level required list
        props = m.get("properties")
        if isinstance(props, dict):
            req = [k for k, v in props.items()
                   if isinstance(v, dict) and v.get("required") is True]
            if req or any(isinstance(v, dict)
                          and isinstance(v.get("required"), bool)
                          for v in props.values()):
                m["properties"] = {
                    k: ({kk: vv for kk, vv in v.items() if kk != "required"}
                        if isinstance(v, dict)
                        and isinstance(v.get("required"), bool) else v)
                    for k, v in props.items()}
                if req:
                    m["required"] = list(dict.fromkeys(
                        list(m.get("required", []) or []) + req)) \
                        if isinstance(m.get("required"), list) else req
    # embedded resources carry their own dialect: upgrade it with the
    # document (test/upgrade/pass_embedded_resources.sh)
    if isinstance(m.get("$schema"), str):
        m["$schema"] = _TARGET_URI[to]
    if to >= 6:
        # draft-04 boolean exclusive bounds → numeric form
        if isinstance(m.get("exclusiveMinimum"), bool):
            if m.pop("exclusiveMinimum") and "minimum" in m:
                m["exclusiveMinimum"] = m.pop("minimum")
        if isinstance(m.get("exclusiveMaximum"), bool):
            if m.pop("exclusiveMaximum") and "maximum" in m:
                m["exclusiveMaximum"] = m.pop("maximum")
    if to >= 2019:
        if "definitions" in m and "$defs" not in m:
            m["$defs"] = m.pop("definitions")
        # dependencies → dependentRequired / dependentSchemas
        dep = m.pop("dependencies", None)
        if isinstance(dep, dict):
            dreq = {k: v for k, v in dep.items() if isinstance(v, list)}
            dsch = {k: v for k, v in dep.items()
                    if not isinstance(v, list)}
            if dreq:
                m.setdefault("dependentRequired", {}).update(dreq)
            if dsch:
                m.setdefault("dependentSchemas", {}).update(dsch)
        elif dep is not None:
            m["dependencies"] = dep  # malformed: keep as-is
    if to >= 2020:
        # array-form items → prefixItems (+ additionalItems → items)
        if isinstance(m.get("items"), list):
            m["prefixItems"] = m.pop("items")
            if "additionalItems" in m:
                m["items"] = m.pop("additionalItems")
        elif "additionalItems" in m:
            del m["additionalItems"]  # ignored without array-form items
    return m


_VOCAB_2019_TO_2020 = {
    "https://json-schema.org/draft/2019-09/vocab/core":
        "https://json-schema.org/draft/2020-12/vocab/core",
    "https://json-schema.org/draft/2019-09/vocab/applicator":
        "https://json-schema.org/draft/2020-12/vocab/applicator",
    "https://json-schema.org/draft/2019-09/vocab/validation":
        "https://json-schema.org/draft/2020-12/vocab/validation",
    "https://json-schema.org/draft/2019-09/vocab/meta-data":
        "https://json-schema.org/draft/2020-12/vocab/meta-data",
    "https://json-schema.org/draft/2019-09/vocab/format":
        "https://json-schema.org/draft/2020-12/vocab/format-annotation",
    "https://json-schema.org/draft/2019-09/vocab/content":
        "https://json-schema.org/draft/2020-12/vocab/content",
}
_VOCAB_2019_STD = {
    "https://json-schema.org/draft/2019-09/vocab/core": True,
    "https://json-schema.org/draft/2019-09/vocab/applicator": True,
    "https://json-schema.org/draft/2019-09/vocab/validation": True,
    "https://json-schema.org/draft/2019-09/vocab/meta-data": True,
    "https://json-schema.org/draft/2019-09/vocab/format": False,
    "https://json-schema.org/draft/2019-09/vocab/content": True,
}

_VOCAB_2020_STD = {
    "https://json-schema.org/draft/2020-12/vocab/core": True,
    "https://json-schema.org/draft/2020-12/vocab/applicator": True,
    "https://json-schema.org/draft/2020-12/vocab/unevaluated": True,
    "https://json-schema.org/draft/2020-12/vocab/validation": True,
    "https://json-schema.org/draft/2020-12/vocab/meta-data": True,
    "https://json-schema.org/draft/2020-12/vocab/format-annotation": False,
    "https://json-schema.org/draft/2020-12/vocab/content": True,
}


def upgrade_schema(schema: Any, *, meta: bool = False,
                   strict: bool = False, to: str = "2020-12") -> Any:
    """Upgrade a schema document to the 2020-12 dialect: mechanical
    keyword migrations applied recursively (draft-3 divisibleBy /
    disallow / extends / boolean-required included), embedded-resource
    ``$schema``s rewritten, ``#/definitions/`` JSON Pointers rewritten
    to ``#/$defs/``, and the root ``$schema`` stamped.

    A document that declares ``$vocabulary`` always gets its vocabulary
    URIs migrated (2019-09 names → 2020-12; ``format`` →
    ``format-annotation`` keeping its boolean; ``unevaluated: true``
    added). ``meta=True`` (the reference's ``upgrade --meta``)
    additionally INJECTS the standard 2020-12 vocabulary set (with
    ``format-annotation: false``) into pre-2019 metaschemas that have
    none — on documents already carrying ``$vocabulary`` the flag is a
    no-op (``pass_2019_09_metaschema_to_2020_12_meta_noop.sh`` asserts
    meta and plain outputs are identical).

    ``strict=True`` applies the reference's input gating: the document
    must declare a known ``$schema`` dialect (exit-4 family), and
    draft-1/2 sources are unsupported (exit 3)."""
    if strict:
        ds = schema.get("$schema") if isinstance(schema, dict) else None
        if not isinstance(ds, str) or "://" not in ds:
            raise ValueError(
                "cannot determine the dialect: no $schema declared")
        known = ("2020-12", "2019-09", "draft-07", "draft-06",
                 "draft-04", "draft-03")
        if not any(tag in ds for tag in known):
            # custom metaschema / draft-1/2: reference exits 3/4
            raise ValueError(f"unsupported source dialect: {ds!r}")

        def _chk(node):   # nested custom dialects can't be migrated
            if isinstance(node, dict):
                nds = node.get("$schema")
                if isinstance(nds, str) and \
                        not any(tag in nds for tag in known):
                    raise ValueError(
                        f"unsupported embedded dialect: {nds!r}")
                for v in node.values():
                    _chk(v)
            elif isinstance(node, list):
                for v in node:
                    _chk(v)
        _chk(schema)
    to_ver = _TARGET_VER[to]
    if isinstance(schema, dict) and isinstance(schema.get("$schema"), str):
        # never downgrade: a source newer than the target is untouched
        # (pass_noop_draft4_target.sh, pass_noop_target_older.sh)
        ds0 = schema["$schema"]
        src_ver = (2020 if "2020-12" in ds0 else
                   2019 if "2019-09" in ds0 else
                   7 if "draft-07" in ds0 else
                   6 if "draft-06" in ds0 else
                   4 if "draft-04" in ds0 else 3)
        if src_ver >= to_ver:
            import copy as _c

            return _c.deepcopy(schema)
    had_vocab = isinstance(schema, dict) and \
        isinstance(schema.get("$vocabulary"), dict)
    from3 = isinstance(schema, dict) \
        and isinstance(schema.get("$schema"), str) \
        and "draft-03" in schema["$schema"]
    upgraded = _walk(schema,
                     lambda node, ptr: _upgrade_node(node, from3, to_ver))

    def fix_refs(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("$ref", "$recursiveRef", "$dynamicRef") \
                        and isinstance(v, str) \
                        and v.startswith("#/definitions/"):
                    out[k] = "#/$defs/" + v[len("#/definitions/"):]
                else:
                    out[k] = fix_refs(v)
            return out
        if isinstance(node, list):
            return [fix_refs(x) for x in node]
        return node

    if to_ver >= 2019:
        upgraded = fix_refs(upgraded)
    if isinstance(upgraded, dict):
        upgraded = {"$schema": _TARGET_URI[to_ver],
                    **{k: v for k, v in upgraded.items() if k != "$schema"}}
        if to_ver >= 2019 and (had_vocab or meta):
            if had_vocab and to_ver >= 2020:
                migrated = {}
                for uri, req in schema["$vocabulary"].items():
                    migrated[_VOCAB_2019_TO_2020.get(uri, uri)] = req
                migrated.setdefault(
                    "https://json-schema.org/draft/2020-12/vocab/"
                    "unevaluated", True)
                # standard 2020-12 ordering (unevaluated sits after
                # applicator); unknown vocabularies keep their place
                # at the end
                vocab = {u: migrated.pop(u) for u in _VOCAB_2020_STD
                         if u in migrated}
                vocab.update(migrated)
            elif had_vocab:
                vocab = dict(schema["$vocabulary"])
            else:
                vocab = dict(_VOCAB_2020_STD) if to_ver >= 2020 \
                    else dict(_VOCAB_2019_STD)
            rest = {k: v for k, v in upgraded.items()
                    if k not in ("$schema", "$id", "$vocabulary")}
            head = {"$schema": upgraded["$schema"]}
            if "$id" in upgraded:
                head["$id"] = upgraded["$id"]
            upgraded = {**head, "$vocabulary": vocab, **rest}
    return upgraded


# ---------------------------------------------------------------------------
# x-lint-exclude scopes (docs/lint.markdown:57-99): a subschema may
# disable named rules for itself and everything below it.
# ---------------------------------------------------------------------------

def lint_exclusions(schema: Any) -> list[tuple[str, frozenset]]:
    """Collect (pointer-prefix, excluded-rule-names) scopes from every
    ``x-lint-exclude`` keyword (string or array of strings)."""
    out: list[tuple[str, frozenset]] = []

    def walk(node: Any, ptr: str) -> None:
        if isinstance(node, dict):
            x = node.get("x-lint-exclude")
            if isinstance(x, str):
                out.append((ptr, frozenset([x])))
            elif isinstance(x, list) and all(isinstance(s, str) for s in x):
                out.append((ptr, frozenset(x)))
            for k, v in node.items():
                esc = k.replace("~", "~0").replace("/", "~1")
                walk(v, f"{ptr}/{esc}")
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{ptr}/{i}")

    walk(schema, "")
    return out


_RULE_TAG = __import__("re").compile(r"\(([a-z0-9_]+)\)\s*$")


def finding_rule_name(msg: str) -> str | None:
    """Rule name of a lint finding: trailing ``(rule_name)`` tag or the
    ``fixable: <name>`` form emitted by lint_fixable."""
    if msg.startswith("fixable: "):
        return msg[9:].strip()
    m = _RULE_TAG.search(msg)
    return m.group(1) if m else None


def filter_excluded(findings: list[tuple[str, str, str]],
                    exclusions: list[tuple[str, frozenset]],
                    global_exclude: frozenset | set = frozenset(),
                    only: frozenset | set | None = None,
                    ) -> list[tuple[str, str, str]]:
    """Drop findings disabled by scope (``x-lint-exclude``), the
    ``--exclude`` flag, or not selected by ``--only``."""
    kept = []
    for sev, ptr, msg in findings:
        rule = finding_rule_name(msg)
        if rule is not None:
            if rule in global_exclude:
                continue
            if only is not None and rule not in only:
                continue
            if any((ptr == scope or ptr.startswith(scope + "/") or
                    scope == "")
                   and rule in names for scope, names in exclusions):
                continue
        elif only is not None:
            continue
        kept.append((sev, ptr, msg))
    return kept
