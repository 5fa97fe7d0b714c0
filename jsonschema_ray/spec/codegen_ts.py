"""TypeScript TYPE emitter for JSON Schema documents.

Reimplements the reference's ``codegen --target typescript`` pipeline
(``src/command_codegen.cc`` → ``vendor/blaze/src/codegen/``):

1. bundle external references (References mode — metaschemas skipped)
2. canonicalize the shapes the IR dispatch relies on (multi-``type``
   → ``anyOf``, ``const`` → ``enum``, bare/annotation-only objects →
   ``true``, ``type:"boolean"/"null"`` → scalar IR directly)
3. frame the document; every resource/subschema location becomes one
   exported declaration — EXCEPT validation-only positions (under
   ``propertyNames``/``contains``, ``codegen.cc:14-49``)
4. name each declaration by its frame symbol: the last pointer token
   per parent hop, URIs reduced to path segments (file URIs to the
   filename stem), Pascal-cased with digit/``_``/``$`` handling
   (``codegen_symbol.cc``/``codegen_mangle.cc``), prefixed (default
   ``Schema``), de-collided by prepending ``_``
5. emit per-IR-kind TypeScript (``codegen_typescript.cc``): scalars,
   enumerations, interfaces with quoted members + index signatures,
   Records, arrays, tuples, unions, intersections, if/then/else
   approximations — declarations sorted by DESCENDING document
   pointer (dependencies before dependents), blank line between
6. reject non-structural keywords per shape (whitelists in
   ``codegen_default_compiler.h``) and unsupported constructs
   (``not``) — the reference's exit-1 contract
"""

from __future__ import annotations

import json
from typing import Any
from urllib.parse import urlsplit

from jsonschema_ray.spec.jschema import (_SUBSCHEMA_KW, _DocIndex,
                                         _dialect_ver, _is_legacy_dialect)


class CodegenError(ValueError):
    """Codegen rejection with reference error context: a message in the
    reference's wording plus the offending keyword and document
    pointer (command_codegen.cc Codegen*Error catch blocks)."""

    def __init__(self, message: str, *, keyword: str | None = None,
                 location: tuple | None = None):
        super().__init__(message)
        self.keyword = keyword
        self.location = location

    def pointer(self) -> str | None:
        if self.location is None:
            return None
        return "".join("/" + str(t).replace("~", "~0").replace("/", "~1")
                       for t in self.location)


_COMMON = {"$schema", "$id", "$anchor", "$dynamicAnchor", "$defs",
           "$vocabulary", "title", "description", "default", "deprecated",
           "readOnly", "writeOnly", "examples"}
_WHITELIST = {
    "string": _COMMON | {"type", "minLength", "maxLength", "pattern",
                         "format", "contentEncoding", "contentMediaType",
                         "contentSchema"},
    "numeric": _COMMON | {"type", "minimum", "maximum", "exclusiveMinimum",
                          "exclusiveMaximum", "multipleOf"},
    "object": _COMMON | {"type", "properties", "required",
                         "additionalProperties", "minProperties",
                         "maxProperties", "propertyNames",
                         "patternProperties"},
    "array": _COMMON | {"type", "items", "minItems", "maxItems",
                        "uniqueItems", "contains", "minContains",
                        "maxContains", "additionalItems", "prefixItems"},
    "enum": _COMMON | {"enum"},
    "anyOf": _COMMON | {"anyOf", "unevaluatedProperties",
                        "unevaluatedItems"},
    "oneOf": _COMMON | {"oneOf", "unevaluatedProperties",
                        "unevaluatedItems"},
    "allOf": _COMMON | {"allOf", "unevaluatedProperties",
                        "unevaluatedItems"},
    "$ref": _COMMON | {"$ref"},
    "$dynamicRef": _COMMON | {"$dynamicRef"},
    "if": _COMMON | {"if", "then", "else", "unevaluatedProperties",
                     "unevaluatedItems"},
}

_ANNOTATION_ONLY = _COMMON - {"$defs"}


def _check_whitelist(sub: dict, shape: str,
                     ptr: tuple = None) -> None:
    allowed = _WHITELIST[shape]
    for k in sub:
        if k not in allowed:
            raise CodegenError("Unsupported keyword in subschema",
                               keyword=k, location=ptr)


def _canonicalize(sch: Any) -> Any:
    """The canonicalizer guarantees the IR dispatch relies on
    (codegen.cc:69-74 runs the full blaze canonicalizer; this covers
    the shape-normalizing rules the type structure depends on)."""
    if isinstance(sch, bool):
        return sch
    if not isinstance(sch, dict):
        raise CodegenError("subschema is not a schema")
    out = dict(sch)
    if "const" in out:
        out["enum"] = [out.pop("const")]
    # canonicalizer type inference: applicators imply their type
    if not any(k in out for k in ("type", "enum", "anyOf", "oneOf",
                                  "allOf", "$ref", "$dynamicRef", "if",
                                  "not")):
        if any(k in out for k in ("properties", "required",
                                  "additionalProperties",
                                  "patternProperties", "propertyNames")):
            out["type"] = "object"
        elif any(k in out for k in ("items", "prefixItems",
                                    "additionalItems")):
            out["type"] = "array"
    t = out.get("type")
    if isinstance(t, list):
        if len(t) == 1:
            out["type"] = t[0]
        else:
            keep = {k: v for k, v in out.items() if k in _COMMON}
            branch_extra = {k: v for k, v in out.items()
                            if k not in _COMMON and k != "type"}
            keep["anyOf"] = [
                _canonicalize(dict(branch_extra, type=tt)) for tt in t]
            out = keep
    # recurse into structural positions
    for k in ("properties", "patternProperties", "$defs", "definitions",
              "dependentSchemas"):
        if isinstance(out.get(k), dict):
            out[k] = {n: _canonicalize(s) for n, s in out[k].items()}
    for k in ("anyOf", "oneOf", "allOf", "prefixItems"):
        if isinstance(out.get(k), list):
            out[k] = [_canonicalize(s) for s in out[k]]
    for k in ("items", "additionalItems", "additionalProperties",
              "propertyNames", "contains", "if", "then", "else",
              "unevaluatedProperties", "unevaluatedItems"):
        if k in out and isinstance(out[k], (dict, bool)):
            out[k] = _canonicalize(out[k])
    if isinstance(out.get("items"), list):
        out["items"] = [_canonicalize(s) for s in out["items"]]
    return out


def _strip_ext(name: str) -> str:
    while "." in name:
        name = name.rsplit(".", 1)[0]
    return name


def _token_segments(token: str) -> list[str]:
    """codegen_symbol.cc push_token_segments: URIs contribute their
    path segments (file URIs only the extension-less filename)."""
    if "://" in token:
        try:
            parts = urlsplit(token)
        except ValueError:
            return [token]
        segs = [s for s in parts.path.split("/") if s]
        if segs:
            segs[-1] = _strip_ext(segs[-1])
            if parts.scheme == "file":
                return [segs[-1]]
            return segs
    return [token]


def _symbol_to_identifier(prefix: str, symbol: list[str]) -> str:
    out = prefix
    for segment in symbol:
        if not segment:
            continue
        at_word_start = True
        at_segment_start = True
        for ch in segment:
            if ch.isascii() and ch.isalpha():
                out += ch.upper() if at_word_start else ch
                at_word_start = at_segment_start = False
            elif ch.isdigit():
                if at_segment_start:
                    out += "_"
                out += ch
                at_word_start = at_segment_start = False
            elif ch in ("_", "$"):
                out += ch
                at_word_start = at_segment_start = False
            else:
                at_word_start = True
    if not out:
        return "_"
    if out[0].isdigit():
        out = "_" + out
    return out


def _escape_ts(s: str) -> str:
    out = []
    esc = {"\\": "\\\\", '"': '\\"', "\b": "\\b", "\f": "\\f",
           "\n": "\\n", "\r": "\\r", "\t": "\\t"}
    for ch in s:
        if ch in esc:
            out.append(esc[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def _prettify_value(v: Any) -> str:
    if v is None or isinstance(v, (bool, int, float, str)):
        return json.dumps(v, ensure_ascii=False)
    return json.dumps(v, indent=2, ensure_ascii=False)


class _Emitter:
    """IR construction + TypeScript emission over the framed doc."""

    def __init__(self, doc: Any, prefix: str):
        self.doc = doc
        self.prefix = prefix
        self.cache: dict[str, tuple] = {}
        # (ptr-tuple) -> (parent-ptr-tuple|None)
        self.parents: dict[tuple, tuple | None] = {}
        self.entries: list[tuple] = []   # (ptr, node)

    # -- frame ---------------------------------------------------------
    def frame(self) -> None:
        legacy = _is_legacy_dialect(self.doc) if isinstance(
            self.doc, dict) else False
        ver = _dialect_ver(self.doc) if isinstance(self.doc, dict) else 2020

        def walk(node: Any, ptr: tuple, parent: tuple | None,
                 ver: int, skip: bool) -> None:
            if isinstance(node, dict) \
                    and isinstance(node.get("$schema"), str):
                ver = _dialect_ver(node)
            self.parents[ptr] = parent
            if not skip:
                self.entries.append((ptr, node))
            if not isinstance(node, dict):
                return
            for k, v in node.items():
                spec = _SUBSCHEMA_KW.get(k)
                if not spec or not (spec[1] <= ver <= spec[2]):
                    continue
                shape = spec[0]
                if shape == "items":
                    shape = "list" if isinstance(v, list) and ver < 2020 \
                        else "schema"
                child_skip = skip or k in ("propertyNames", "contains")
                if shape == "schema" and isinstance(v, (dict, bool)):
                    walk(v, ptr + (k,), ptr, ver, child_skip)
                elif shape == "list" and isinstance(v, list):
                    for i, x in enumerate(v):
                        if isinstance(x, (dict, bool)):
                            walk(x, ptr + (k, i), ptr, ver, child_skip)
                elif shape == "map" and isinstance(v, dict):
                    for nm, sub in v.items():
                        if isinstance(sub, (dict, bool)):
                            walk(sub, ptr + (k, nm), ptr, ver, child_skip)

        walk(self.doc, (), None, ver, False)

    # -- naming --------------------------------------------------------
    def symbol(self, ptr: tuple) -> list[str]:
        result: list[str] = []
        cur = ptr
        while True:
            parent = self.parents.get(cur)
            if parent is None:
                break
            last = cur[-1]
            if isinstance(last, int):
                result.append(str(last))
            else:
                result.extend(reversed(_token_segments(last)))
            cur = parent
        result.reverse()
        return result

    def mangle(self, ptr: tuple) -> str:
        name = _symbol_to_identifier(self.prefix, self.symbol(ptr))
        while True:
            hit = self.cache.get(name)
            if hit is None:
                self.cache[name] = ptr
                return name
            if hit == ptr:
                return name
            name = "_" + name

    # -- emission ------------------------------------------------------
    def emit(self) -> str:
        # dependencies before dependents: descending pointer order
        def key(ptr: tuple):
            return tuple((0, t) if isinstance(t, str) else (1, str(t))
                         for t in ptr)

        decls = [self.entity(ptr, node)
                 for ptr, node in sorted(
                     self.entries, key=lambda e: key(e[0]), reverse=True)]
        return "\n".join(decls)

    def entity(self, ptr: tuple, sub: Any) -> str:
        name = self.mangle(ptr)
        if sub is True or (isinstance(sub, dict) and not (
                set(sub) - _ANNOTATION_ONLY)):
            return f"export type {name} = unknown;\n"
        if sub is False:
            return f"export type {name} = never;\n"
        if not isinstance(sub, dict):
            raise CodegenError("unsupported schema", location=ptr)
        t = sub.get("type")
        if "type" in sub and not isinstance(t, str):
            raise CodegenError("Expected a string value",
                               keyword="type", location=ptr)
        if isinstance(t, str):
            if t == "string":
                _check_whitelist(sub, "string", ptr)
                return f"export type {name} = string;\n"
            if t in ("integer", "number"):
                _check_whitelist(sub, "numeric", ptr)
                return f"export type {name} = number;\n"
            if t == "boolean":
                return f"export type {name} = boolean;\n"
            if t == "null":
                return f"export type {name} = null;\n"
            if t == "object":
                _check_whitelist(sub, "object", ptr)
                return self.object_entity(name, ptr, sub)
            if t == "array":
                _check_whitelist(sub, "array", ptr)
                return self.array_entity(name, ptr, sub)
            raise CodegenError(f"unsupported type value: {t!r}",
                               keyword="type", location=ptr)
        if "enum" in sub:
            _check_whitelist(sub, "enum", ptr)
            vals = sub["enum"]
            if len(vals) == 1 and vals[0] is None:
                return f"export type {name} = null;\n"
            if len(vals) == 2 and all(isinstance(v, bool) for v in vals) \
                    and vals[0] != vals[1]:
                return f"export type {name} = boolean;\n"
            lits = " | ".join(_prettify_value(v) for v in vals)
            return f"export type {name} = {lits};\n"
        for kw in ("anyOf", "oneOf"):
            if kw in sub:
                _check_whitelist(sub, kw, ptr)
                branches = [self.mangle(ptr + (kw, i))
                            for i in range(len(sub[kw]))]
                body = " |\n".join(f"  {b}" for b in branches)
                return f"export type {name} =\n{body};\n"
        if "allOf" in sub:
            _check_whitelist(sub, "allOf", ptr)
            if len(sub["allOf"]) == 1:
                return (f"export type {name} = "
                        f"{self.mangle(ptr + ('allOf', 0))};\n")
            branches = [self.mangle(ptr + ("allOf", i))
                        for i in range(len(sub["allOf"]))]
            body = " &\n".join(f"  {b}" for b in branches)
            return f"export type {name} =\n{body};\n"
        if "$dynamicRef" in sub or "$ref" in sub:
            kw = "$dynamicRef" if "$dynamicRef" in sub else "$ref"
            _check_whitelist(sub, kw, ptr)
            tgt = self.ref_target_ptr(ptr, sub[kw])
            return f"export type {name} = {self.mangle(tgt)};\n"
        if "if" in sub:
            _check_whitelist(sub, "if", ptr)
            if "then" not in sub or "else" not in sub:
                raise CodegenError("if requires then and else for codegen")
            return (
                "// (if & then) | else approximation: the else branch is "
                "wider than what\n"
                "// JSON Schema allows, as TypeScript cannot express type "
                "negation\n"
                f"export type {name} =\n"
                f"  ({self.mangle(ptr + ('if',))} & "
                f"{self.mangle(ptr + ('then',))}) | "
                f"{self.mangle(ptr + ('else',))};\n")
        if "not" in sub:
            raise CodegenError("Unsupported keyword in subschema",
                               keyword="not", location=ptr)
        raise CodegenError("unsupported schema", location=ptr)

    def ref_target_ptr(self, from_ptr: tuple, ref: str) -> tuple:
        from jsonschema_ray.spec.jschema import resolve_ref_target

        legacy = _is_legacy_dialect(self.doc) if isinstance(
            self.doc, dict) else False
        idx = _DocIndex(self.doc, legacy_id=legacy, ver=0)
        sptr = "".join(
            "/" + (str(t).replace("~", "~0").replace("/", "~1")
                   if isinstance(t, str) else str(t)) for t in from_ptr)
        tgt = resolve_ref_target(idx, ref, sptr)
        out: list = []
        for tok in tgt.lstrip("/").split("/") if tgt else []:
            tok = tok.replace("~1", "/").replace("~0", "~")
            node = self.doc
            for t in out:
                node = node[t]
            if isinstance(node, list):
                out.append(int(tok))
            else:
                out.append(tok)
        return tuple(out)

    def object_entity(self, name: str, ptr: tuple, sub: dict) -> str:
        props = sub.get("properties")
        props = props if isinstance(props, dict) else {}
        required = set(sub.get("required") or [])
        pattern = sub.get("patternProperties")
        pattern = pattern if isinstance(pattern, dict) else {}
        additional = sub.get("additionalProperties", True)

        if not props and not pattern:
            if isinstance(additional, bool):
                if additional:
                    return (f"export type {name} = "
                            "Record<string, unknown>;\n")
            else:
                tname = self.mangle(ptr + ("additionalProperties",))
                return (f"export type {name} = "
                        f"Record<string, {tname}>;\n")

        out = [f"export interface {name} {{\n"]
        member_names = []
        for pname in props:
            tname = self.mangle(ptr + ("properties", pname))
            member_names.append(tname)
            opt = "" if pname in required else "?"
            out.append(f'  "{_escape_ts(pname)}"{opt}: {tname};\n')
        pattern_names = []
        prefixes = [(rx, rx[1:-len('.*')] if False else None)
                    for rx in pattern]
        # literal-prefix pattern properties get template index keys
        pat_info = []
        for rx in pattern:
            tname = self.mangle(ptr + ("patternProperties", rx))
            pattern_names.append(tname)
            prefix = _regex_prefix(rx)
            pat_info.append((rx, tname, prefix))
        for rx, tname, prefix in pat_info:
            if prefix is None:
                continue
            line = f"  [key: `{prefix}${{string}}`]: {tname}"
            for rx2, tname2, prefix2 in pat_info:
                if rx2 is rx or prefix2 is None:
                    continue
                if prefix.startswith(prefix2):
                    line += f" & {tname2}"
            out.append(line + ";\n")
        has_non_prefix_pattern = any(p is None for _, _, p in pat_info)
        allows_any = isinstance(additional, bool) and additional
        has_typed = not isinstance(additional, bool)
        if allows_any:
            out.append("  [key: string]: unknown | undefined;\n")
        elif has_typed or has_non_prefix_pattern:
            out.append("  [key: string]:\n")
            out.append("    // As a notable limitation, TypeScript "
                       "requires index signatures\n")
            out.append("    // to also include the types of all of its "
                       "properties, so we must\n")
            out.append("    // match a superset of what JSON Schema "
                       "allows\n")
            for tname in member_names:
                out.append(f"    {tname} |\n")
            for tname in pattern_names:
                out.append(f"    {tname} |\n")
            if has_typed:
                tname = self.mangle(ptr + ("additionalProperties",))
                out.append(f"    {tname} |\n")
            out.append("    undefined;\n")
        out.append("}\n")
        return "".join(out)

    def array_entity(self, name: str, ptr: tuple, sub: dict) -> str:
        ver = 2020
        cur: Any = self.doc
        eff = ver
        # effective dialect: nearest $schema above ptr
        node = self.doc
        if isinstance(node, dict) and isinstance(node.get("$schema"), str):
            eff = _dialect_ver(node)
        for t in ptr:
            node = node[t]
            if isinstance(node, dict) \
                    and isinstance(node.get("$schema"), str):
                eff = _dialect_ver(node)
        del cur
        items = sub.get("items")
        if eff >= 2020 and isinstance(sub.get("prefixItems"), list):
            parts = [self.mangle(ptr + ("prefixItems", i))
                     for i in range(len(sub["prefixItems"]))]
            if "items" in sub:
                parts.append(f"...{self.mangle(ptr + ('items',))}[]")
            return f"export type {name} = [{', '.join(parts)}];\n"
        if eff < 2020 and isinstance(items, list):
            parts = [self.mangle(ptr + ("items", i))
                     for i in range(len(items))]
            if "additionalItems" in sub:
                parts.append(
                    f"...{self.mangle(ptr + ('additionalItems',))}[]")
            return f"export type {name} = [{', '.join(parts)}];\n"
        if items is not None and isinstance(items, (dict, bool)):
            return (f"export type {name} = "
                    f"{self.mangle(ptr + ('items',))}[];\n")
        return f"export type {name} = unknown[];\n"


def _regex_prefix(rx: str) -> str | None:
    """Literal-prefix regexes (``^x-`` style) → template-string index
    keys (sourcemeta::core::to_regex RegexTypePrefix)."""
    if not rx.startswith("^"):
        return None
    body = rx[1:]
    if body.endswith(".*"):
        body = body[:-2]
    if any(c in body for c in ".*+?()[]{}|\\$"):
        return None
    return body or None


def schema_to_typescript(schema: Any, name: str = "Schema", *,
                         resolver: Any = None,
                         default_dialect: str | None = None,
                         default_id: str = "") -> str:
    """Emit TypeScript type declarations for a schema document —
    byte-compatible with the reference's typescript target."""
    if resolver is not None:
        from jsonschema_ray.spec.bundle import bundle_schema

        schema = bundle_schema(schema, resolver,
                               default_dialect=default_dialect,
                               default_id=default_id,
                               mode="references")
    doc = _canonicalize(schema)
    em = _Emitter(doc, name)
    em.frame()
    return em.emit()
