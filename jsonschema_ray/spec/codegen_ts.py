"""TypeScript TYPE emitter for JSON Schema documents.

The reference's ``codegen --target typescript`` emits ``export type``
declarations from a schema (``src/command_codegen.cc:19-43`` accepts
only that target; emitter ``vendor/blaze/src/codegen/
codegen_typescript.cc``). This is the structural-typing subset: the
shape keywords become TS types, assertion-only keywords (bounds,
patterns, formats) have no TS counterpart and are dropped.

Mapping:
  string/number/integer/boolean/null → string/number/boolean/null
  const / enum                       → literal union
  object properties (+required)     → { a: T; b?: U }
  additionalProperties: S            → & { [key: string]: T }
  array items                        → T[]
  prefixItems (+items)               → [A, B, ...rest[]]
  anyOf / oneOf                      → A | B ;  allOf → A & B
  $defs + $ref '#/$defs/x'           → named exported types
  anything unconstrained             → unknown
"""

from __future__ import annotations

import json
import re
from typing import Any

_PRIM = {"string": "string", "number": "number", "integer": "number",
         "boolean": "boolean", "null": "null"}

_IDENT = re.compile(r"[^0-9A-Za-z_$]")


def _mangle(prefix: str, name: str) -> str:
    base = _IDENT.sub("_", name) or "T"
    if base[0].isdigit():
        base = "_" + base
    return prefix + base[0].upper() + base[1:]


def _literal(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    if isinstance(v, str):
        return json.dumps(v)
    return "unknown"  # object/array literals have no TS literal type


def _prop_key(name: str) -> str:
    return name if re.fullmatch(r"[A-Za-z_$][0-9A-Za-z_$]*", name) \
        else json.dumps(name)


def _ts(schema: Any, refs: dict[str, str]) -> str:
    if schema is True or schema == {}:
        return "unknown"
    if schema is False:
        return "never"
    if not isinstance(schema, dict):
        return "unknown"

    ref = schema.get("$ref")
    if isinstance(ref, str) and ref in refs:
        return refs[ref]

    if "const" in schema:
        return _literal(schema["const"])
    if isinstance(schema.get("enum"), list) and schema["enum"]:
        return " | ".join(dict.fromkeys(_literal(v)
                                        for v in schema["enum"]))

    for comb, op in (("anyOf", " | "), ("oneOf", " | "), ("allOf", " & ")):
        subs = schema.get(comb)
        if isinstance(subs, list) and subs:
            parts = [_ts(s, refs) for s in subs]
            if op == " & ":
                parts = [p for p in parts if p != "unknown"] or ["unknown"]
            return "(" + op.join(dict.fromkeys(parts)) + ")" \
                if len(set(parts)) > 1 else parts[0]

    t = schema.get("type")
    if isinstance(t, list):
        return " | ".join(dict.fromkeys(
            _ts({**schema, "type": x}, refs) for x in t))

    if t == "object" or (t is None and ("properties" in schema
                                        or "additionalProperties" in schema)):
        props = schema.get("properties", {})
        req = set(schema.get("required", []))
        members = [f"{_prop_key(k)}{'' if k in req else '?'}: "
                   f"{_ts(v, refs)};" for k, v in props.items()]
        body = "{ " + " ".join(members) + " }" if members \
            else "Record<string, unknown>"
        ap = schema.get("additionalProperties")
        if isinstance(ap, (dict, bool)) and ap is not False and members:
            extra = "unknown" if ap is True else _ts(ap, refs)
            body = f"{body} & {{ [key: string]: unknown | {extra} }}" \
                if extra != "unknown" else body
        return body

    if t == "array" or (t is None and ("items" in schema
                                       or "prefixItems" in schema)):
        pre = schema.get("prefixItems")
        if isinstance(pre, list) and pre:
            parts = [_ts(s, refs) for s in pre]
            rest = schema.get("items")
            tail = [] if rest is False \
                else [f"...{_ts(rest, refs) if rest is not None else 'unknown'}[]"]
            return "[" + ", ".join(parts + tail) + "]"
        items = schema.get("items")
        inner = _ts(items, refs) if items is not None else "unknown"
        if " " in inner or "|" in inner:
            inner = f"({inner})"
        return f"{inner}[]"

    if t in _PRIM:
        return _PRIM[t]
    return "unknown"


def schema_to_typescript(schema: Any, name: str = "Schema",
                         prefix: str = "") -> str:
    """Emit ``export type`` declarations: one for the root (``name``)
    plus one per ``$defs`` entry, with ``$ref`` pointers resolved to
    the generated type names."""
    refs: dict[str, str] = {}
    defs = schema.get("$defs", {}) if isinstance(schema, dict) else {}
    for dname in defs:
        refs[f"#/$defs/{dname}"] = _mangle(prefix, dname)
    out = []
    for dname, sub in defs.items():
        out.append(f"export type {_mangle(prefix, dname)} = "
                   f"{_ts(sub, refs)};")
    out.append(f"export type {_mangle(prefix, name)} = "
               f"{_ts(schema, refs)};")
    return "\n".join(out) + "\n"
