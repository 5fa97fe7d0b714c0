"""Static analysis of ``unevaluatedProperties`` / ``unevaluatedItems``
— the analog of Blaze's compile-time unevaluated pass
(``/root/reference/vendor/blaze/src/compiler/unevaluated.cc:194-267``).

For every subschema that defines an ``unevaluated*`` keyword, classify
the adjacent evaluating keyword sites it depends on:

- **static** dependencies: sites reachable unconditionally — the same
  schema object, ``allOf`` elements, and statically-resolved ``$ref``
  chains (``find_adjacent_dependencies`` with ``is_static=true`` in the
  reference). Their contribution to the evaluated-name set is known at
  compile time.
- **dynamic** dependencies: sites reachable only conditionally —
  ``anyOf`` / ``oneOf`` branches, ``if``/``then``/``else``,
  ``dependentSchemas`` members, and anything reached through them
  (``is_static=false`` paths in the reference). Their contribution
  depends on the instance.
- **unresolved**: a ``$dynamicRef`` / ``$recursiveRef`` in reach makes
  the dependency set unknowable statically (reference line 83-85).

An occurrence with no dynamic dependencies and nothing unresolved is
STATIC, and ``lower_static()`` rewrites it out of the schema:

- ``unevaluatedProperties: S`` over statically-known names N and
  patterns P becomes an ``allOf`` branch
  ``{properties: {n: true…}, patternProperties: {p: true…},
  additionalProperties: S}`` — behaviorally ``additionalProperties``
  (AssertionPropertyType* family) instead of annotation bookkeeping.
- ``unevaluatedItems: S`` past a statically-known prefix length m
  becomes ``{prefixItems: [true]*m, items: S}``.
- an occurrence whose static dependencies include
  ``additionalProperties`` / ``items`` / another ``unevaluated*`` is
  DEAD (those evaluate everything that remains) and is removed.
- a ``contains`` dependency is never lowered — which indexes it
  evaluates is data-dependent even though the keyword site is static.

The rewrite is VERDICT-preserving, not error-row-preserving: when a
static sibling fails, annotation semantics would re-flag its
properties as unevaluated, but the conjunction has already failed —
the same trade the reference makes when it compiles a statically-
analyzable ``unevaluated*`` to plain loop instructions. It is
therefore opt-in at compile time (``compile_schema(...,
static_unevaluated=True)``) and surfaced read-only via ``inspect
--schema``.
"""

from __future__ import annotations

import copy
import json
from dataclasses import dataclass, field
from typing import Any

from jsonschema_ray.spec.jschema import _DocIndex, resolve_ref_target

# Adjacent evaluating keywords per unevaluated* family — the keyword
# sets passed to find_adjacent_dependencies (unevaluated.cc:232-259).
PROPS_DEPS = frozenset({"properties", "patternProperties",
                        "additionalProperties", "unevaluatedProperties"})
ITEMS_DEPS = frozenset({"prefixItems", "items", "contains",
                        "unevaluatedItems"})

# In-place applicators, by how their subschemas contribute annotations
# (the SchemaKeywordType switch, unevaluated.cc:91-154).
_STATIC_LIST = ("allOf",)                 # ApplicatorElementsInPlace
_DYNAMIC_LIST = ("anyOf", "oneOf")        # ApplicatorElementsInPlaceSome
_DYNAMIC_VALUE = ("if", "then", "else")   # ApplicatorValueInPlaceMaybe
_DYNAMIC_MEMBERS = ("dependentSchemas",)  # ApplicatorMembersInPlaceSome
_DYNAMIC_REFS = ("$dynamicRef", "$recursiveRef")


@dataclass
class UnevalEntry:
    """Dependency classification of one ``unevaluated*`` occurrence
    (the analog of ``SchemaUnevaluatedEntry``)."""

    pointer: str          # document pointer of the defining subschema
    keyword: str          # which unevaluated* keyword
    static_deps: set[str] = field(default_factory=set)
    dynamic_deps: set[str] = field(default_factory=set)
    unresolved: bool = False

    @property
    def is_static(self) -> bool:
        return not self.unresolved and not self.dynamic_deps

    def to_json(self) -> dict:
        return {"pointer": self.pointer, "keyword": self.keyword,
                "static_dependencies": sorted(self.static_deps),
                "dynamic_dependencies": sorted(self.dynamic_deps),
                "unresolved": self.unresolved, "static": self.is_static}


def _resolve_pointer(root: Any, pointer: str) -> Any:
    node = root
    for tok in pointer.split("/")[1:] if pointer else []:
        tok = tok.replace("~1", "/").replace("~0", "~")
        node = node[int(tok)] if isinstance(node, list) else node[tok]
    return node


def _find_deps(schema: Any, idx: _DocIndex, current: str, keywords: frozenset,
               root_ptr: str, ptr: str, is_static: bool, out: UnevalEntry,
               visited: set[tuple[str, bool]]) -> None:
    """Port of ``find_adjacent_dependencies`` (unevaluated.cc:16-161)
    over plain dict schemas. ``visited`` breaks ``$ref`` cycles (a
    revisit contributes nothing new at the same staticness)."""
    if (ptr, is_static) in visited:
        return
    visited.add((ptr, is_static))
    sub = _resolve_pointer(schema, ptr)
    if not isinstance(sub, dict):
        return

    for key, value in sub.items():
        if key == current and ptr == root_ptr:
            continue
        if key in keywords:
            out.static_deps.add(f"{ptr}/{key}") if is_static \
                else out.dynamic_deps.add(f"{ptr}/{key}")
            continue
        if key == "$ref" and isinstance(value, str):
            try:
                target = resolve_ref_target(idx, value, ptr)
            except ValueError:
                out.unresolved = True  # external/unresolvable
                continue
            # Recurse into a dedicated entry so a dynamic contribution
            # through this reference is also recorded AT the reference
            # (unevaluated.cc:62-78) — applicators above it can tell
            # they cannot short-circuit through it.
            nested = UnevalEntry(pointer=target, keyword=current)
            _find_deps(schema, idx, current, keywords, root_ptr, target,
                       is_static, nested, visited)
            if not is_static and nested.dynamic_deps:
                out.dynamic_deps.add(f"{ptr}/{key}")
            out.unresolved = out.unresolved or nested.unresolved
            out.static_deps |= nested.static_deps
            out.dynamic_deps |= nested.dynamic_deps
            continue
        if key in _DYNAMIC_REFS:
            out.unresolved = True
            continue
        if key in _STATIC_LIST and isinstance(value, list):
            for i in range(len(value)):
                _find_deps(schema, idx, current, keywords, root_ptr,
                           f"{ptr}/{key}/{i}", is_static, out, visited)
        elif key in _DYNAMIC_LIST and isinstance(value, list):
            for i in range(len(value)):
                _find_deps(schema, idx, current, keywords, root_ptr,
                           f"{ptr}/{key}/{i}", False, out, visited)
        elif key in _DYNAMIC_VALUE and isinstance(value, (dict, bool)):
            if isinstance(value, dict):
                _find_deps(schema, idx, current, keywords, root_ptr,
                           f"{ptr}/{key}", False, out, visited)
        elif key in _DYNAMIC_MEMBERS and isinstance(value, dict):
            for name in value:
                esc = name.replace("~", "~0").replace("/", "~1")
                _find_deps(schema, idx, current, keywords, root_ptr,
                           f"{ptr}/{key}/{esc}", False, out, visited)
        # anything else does not contribute (child applicators like
        # properties/items apply to CHILD instance locations)


def _walk_subschemas(node: Any, ptr: str, out: list[tuple[str, dict]]) -> None:
    if isinstance(node, dict):
        out.append((ptr, node))
        for k, v in node.items():
            if k in ("enum", "const"):
                continue
            esc = k.replace("~", "~0").replace("/", "~1")
            _walk_subschemas(v, f"{ptr}/{esc}", out)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            _walk_subschemas(v, f"{ptr}/{i}", out)


def analyze(schema: Any) -> list[UnevalEntry]:
    """Classify every ``unevaluated*`` occurrence in the document
    (the analog of ``blaze::unevaluated()``, unevaluated.cc:194-267)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, (dict, bool)):
        raise ValueError("analyze() needs a schema document")
    idx = _DocIndex(schema)
    nodes: list[tuple[str, dict]] = []
    _walk_subschemas(schema, "", nodes)
    entries: list[UnevalEntry] = []
    for ptr, sub in nodes:
        for kw, deps in (("unevaluatedProperties", PROPS_DEPS),
                         ("unevaluatedItems", ITEMS_DEPS)):
            if kw not in sub:
                continue
            e = UnevalEntry(pointer=ptr, keyword=kw)
            _find_deps(schema, idx, kw, deps, ptr, ptr, True, e, set())
            entries.append(e)
    return entries


def lower_static(schema: Any) -> tuple[Any, int]:
    """Rewrite every STATIC ``unevaluated*`` occurrence into its
    ``additional*`` equivalent (or remove it when dead). Returns
    ``(new_schema, n_rewritten)``; the input is never mutated."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict):
        return schema, 0
    entries = [e for e in analyze(schema) if e.is_static]
    if not entries:
        return schema, 0
    schema = copy.deepcopy(schema)
    n = 0
    for e in entries:
        sub = _resolve_pointer(schema, e.pointer)
        if e.keyword not in sub:   # already removed by a prior rewrite
            continue
        dep_kws = {d.rsplit("/", 1)[1] for d in e.static_deps}
        if e.keyword == "unevaluatedProperties":
            if dep_kws & {"additionalProperties", "unevaluatedProperties"}:
                del sub["unevaluatedProperties"]   # dead: all evaluated
                n += 1
                continue
            names: set[str] = set()
            patterns: set[str] = set()
            for d in e.static_deps:
                site = _resolve_pointer(schema, d)
                if d.endswith("/properties") and isinstance(site, dict):
                    names |= set(site)
                elif d.endswith("/patternProperties") and isinstance(site, dict):
                    patterns |= set(site)
            branch: dict = {"additionalProperties":
                            sub.pop("unevaluatedProperties")}
            if names:
                branch["properties"] = {k: True for k in sorted(names)}
            if patterns:
                branch["patternProperties"] = {p: True
                                               for p in sorted(patterns)}
            sub.setdefault("allOf", []).append(branch)
            n += 1
        else:
            if "contains" in dep_kws:
                continue  # evaluated indexes are data-dependent
            if dep_kws & {"items", "unevaluatedItems"}:
                del sub["unevaluatedItems"]        # dead: tail evaluated
                n += 1
                continue
            m = 0
            for d in e.static_deps:
                if d.endswith("/prefixItems"):
                    site = _resolve_pointer(schema, d)
                    if isinstance(site, list):
                        m = max(m, len(site))
            branch = {"items": sub.pop("unevaluatedItems")}
            if m:
                branch["prefixItems"] = [True] * m
            sub.setdefault("allOf", []).append(branch)
            n += 1
    return schema, n
