"""Schema frame + vocabulary model for the reference-parity lint engine.

Mirrors the PUBLIC blaze machinery the ``lint`` verb is built on:

- ``SchemaFrame`` (``vendor/blaze/src/frame/frame.cc``): the ordered
  location map (a ``std::map`` keyed by ``(reference type, URI)`` — so
  iteration is URI-lexicographic, Static before Dynamic), reference
  edges, ``has_references_through/to``, ``traverse``, ``standalone``.
- ``Vocabularies`` (``vendor/blaze/src/foundation/vocabularies.cc``):
  per-location active-vocabulary sets resolved from the dialect URI
  (official era sets, pre-vocabulary dialects as a single "vocabulary",
  custom 2019-09+/2020-12 metaschemas via their ``$vocabulary``).
- the keyword walker (``known_walker.cc``): keyword → (strategy,
  applicable instance types), extracted verbatim into
  ``schemas/lint_walker.json`` by ``tools/gen_walker_table.py``.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Any, Callable
from urllib.parse import urljoin

# ---------------------------------------------------------------------------
# Walker table
# ---------------------------------------------------------------------------

_WALKER_PATH = os.path.join(os.path.dirname(__file__), "..",
                            "schemas", "lint_walker.json")
with open(os.path.abspath(_WALKER_PATH)) as _f:
    WALKER_TABLE: dict[str, list] = json.load(_f)


class WalkerResult:
    __slots__ = ("type", "instances")

    def __init__(self, type_: str, instances: frozenset[str]):
        self.type = type_
        self.instances = instances


_UNKNOWN = WalkerResult("Unknown", frozenset())


def walker(keyword: str, vocabularies: "Vocabularies") -> WalkerResult:
    for vocab, strategy, types in WALKER_TABLE.get(keyword, ()):
        if vocabularies.contains(vocab):
            return WalkerResult(strategy, frozenset(types))
    return _UNKNOWN


# Strategies that introduce subschemas, by shape
_SHAPE_SCHEMA = {
    "ApplicatorValueTraverseSomeProperty",
    "ApplicatorValueTraverseAnyPropertyKey",
    "ApplicatorValueTraverseAnyItem",
    "ApplicatorValueTraverseSomeItem",
    "ApplicatorValueTraverseParent",
    "ApplicatorValueInPlaceMaybe",
    "ApplicatorValueInPlaceOther",
    "ApplicatorValueInPlaceNegate",
}
_SHAPE_LIST = {
    "ApplicatorElementsTraverseItem",
    "ApplicatorElementsInPlace",
    "ApplicatorElementsInPlaceSome",
    "ApplicatorElementsInPlaceSomeNegate",
}
_SHAPE_MAP = {
    "ApplicatorMembersTraversePropertyStatic",
    "ApplicatorMembersTraversePropertyRegex",
    "ApplicatorMembersInPlaceSome",
    "LocationMembers",
}
_SHAPE_VALUE_OR_LIST = {
    "ApplicatorValueOrElementsTraverseAnyItemOrItem",
    "ApplicatorValueOrElementsInPlace",
}

IN_PLACE_APPLICATORS = {
    "ApplicatorValueOrElementsInPlace",
    "ApplicatorMembersInPlaceSome",
    "ApplicatorElementsInPlace",
    "ApplicatorElementsInPlaceSome",
    "ApplicatorElementsInPlaceSomeNegate",
    "ApplicatorValueInPlaceMaybe",
    "ApplicatorValueInPlaceOther",
    "ApplicatorValueInPlaceNegate",
}


# ---------------------------------------------------------------------------
# Vocabularies
# ---------------------------------------------------------------------------

_2020_SET = ("JSON_Schema_2020_12_Core", "JSON_Schema_2020_12_Applicator",
             "JSON_Schema_2020_12_Unevaluated",
             "JSON_Schema_2020_12_Validation",
             "JSON_Schema_2020_12_Meta_Data",
             "JSON_Schema_2020_12_Format_Annotation",
             "JSON_Schema_2020_12_Content")
_2019_SET = ("JSON_Schema_2019_09_Core", "JSON_Schema_2019_09_Applicator",
             "JSON_Schema_2019_09_Validation",
             "JSON_Schema_2019_09_Meta_Data",
             "JSON_Schema_2019_09_Format",   # optional in the official meta
             "JSON_Schema_2019_09_Content")

VOCAB_URI_TO_KNOWN = {
    "https://json-schema.org/draft/2020-12/vocab/core":
        "JSON_Schema_2020_12_Core",
    "https://json-schema.org/draft/2020-12/vocab/applicator":
        "JSON_Schema_2020_12_Applicator",
    "https://json-schema.org/draft/2020-12/vocab/unevaluated":
        "JSON_Schema_2020_12_Unevaluated",
    "https://json-schema.org/draft/2020-12/vocab/validation":
        "JSON_Schema_2020_12_Validation",
    "https://json-schema.org/draft/2020-12/vocab/meta-data":
        "JSON_Schema_2020_12_Meta_Data",
    "https://json-schema.org/draft/2020-12/vocab/format-annotation":
        "JSON_Schema_2020_12_Format_Annotation",
    "https://json-schema.org/draft/2020-12/vocab/format-assertion":
        "JSON_Schema_2020_12_Format_Assertion",
    "https://json-schema.org/draft/2020-12/vocab/content":
        "JSON_Schema_2020_12_Content",
    "https://json-schema.org/draft/2019-09/vocab/core":
        "JSON_Schema_2019_09_Core",
    "https://json-schema.org/draft/2019-09/vocab/applicator":
        "JSON_Schema_2019_09_Applicator",
    "https://json-schema.org/draft/2019-09/vocab/validation":
        "JSON_Schema_2019_09_Validation",
    "https://json-schema.org/draft/2019-09/vocab/meta-data":
        "JSON_Schema_2019_09_Meta_Data",
    "https://json-schema.org/draft/2019-09/vocab/format":
        "JSON_Schema_2019_09_Format",
    "https://json-schema.org/draft/2019-09/vocab/content":
        "JSON_Schema_2019_09_Content",
    "https://json-schema.org/draft/2019-09/vocab/hyper-schema":
        "JSON_Schema_2019_09_Hyper_Schema",
    "https://spec.openapis.org/oas/3.1/vocab/base": "OpenAPI_3_1_Base",
    "https://spec.openapis.org/oas/3.2/vocab/base": "OpenAPI_3_2_Base",
}

DIALECT_TO_KNOWN = {
    "http://json-schema.org/draft-07/schema#": "JSON_Schema_Draft_7",
    "http://json-schema.org/draft-07/hyper-schema#":
        "JSON_Schema_Draft_7_Hyper",
    "http://json-schema.org/draft-06/schema#": "JSON_Schema_Draft_6",
    "http://json-schema.org/draft-06/hyper-schema#":
        "JSON_Schema_Draft_6_Hyper",
    "http://json-schema.org/draft-04/schema#": "JSON_Schema_Draft_4",
    "http://json-schema.org/draft-04/hyper-schema#":
        "JSON_Schema_Draft_4_Hyper",
    "http://json-schema.org/draft-03/schema#": "JSON_Schema_Draft_3",
    "http://json-schema.org/draft-03/hyper-schema#":
        "JSON_Schema_Draft_3_Hyper",
    "http://json-schema.org/draft-02/schema#": "JSON_Schema_Draft_2",
    "http://json-schema.org/draft-02/hyper-schema#":
        "JSON_Schema_Draft_2_Hyper",
    "http://json-schema.org/draft-01/schema#": "JSON_Schema_Draft_1",
    "http://json-schema.org/draft-01/hyper-schema#":
        "JSON_Schema_Draft_1_Hyper",
    "http://json-schema.org/draft-00/schema#": "JSON_Schema_Draft_0",
    "http://json-schema.org/draft-00/hyper-schema#":
        "JSON_Schema_Draft_0_Hyper",
}

OFFICIAL_2020 = "https://json-schema.org/draft/2020-12/schema"
OFFICIAL_2019 = "https://json-schema.org/draft/2019-09/schema"
OFFICIAL_2020_HYPER = "https://json-schema.org/draft/2020-12/hyper-schema"
OFFICIAL_2019_HYPER = "https://json-schema.org/draft/2019-09/hyper-schema"


class Vocabularies:
    """Active vocabulary set for one schema location."""

    __slots__ = ("known", "unknown")

    def __init__(self, known: frozenset[str] = frozenset(),
                 unknown: frozenset[str] = frozenset()):
        self.known = known
        self.unknown = unknown   # unrecognised vocabulary URIs

    def contains(self, name: str) -> bool:
        return name in self.known

    def contains_any(self, names) -> bool:
        return any(n in self.known for n in names)

    def has_unknown(self) -> bool:
        return bool(self.unknown)


def _norm_dialect(dialect: str) -> str:
    """Scheme/fragment-tolerant official dialect matching (blaze
    ``to_base_dialect`` accepts the http/https misspellings)."""
    d = dialect
    if d.startswith("http://json-schema.org/draft/"):
        d = "https://" + d[7:]
    elif d.startswith("https://json-schema.org/draft-0"):
        d = "http://" + d[8:]
    if d.startswith("https://json-schema.org/draft/"):
        d = d.rstrip("#")
    elif d.startswith("http://json-schema.org/draft-0") \
            and not d.endswith("#"):
        d = d + "#"
    return d


def vocabularies_for_dialect(
        dialect: str, resolver: Callable[[str], Any | None],
        _depth: int = 0) -> Vocabularies:
    """The blaze ``vocabularies()`` resolution chain
    (``foundation.cc``): official modern dialects → the era's standard
    set; pre-vocabulary official dialects → themselves as the single
    vocabulary; anything else → resolve the metaschema and read its
    ``$vocabulary`` (chasing ``$schema`` when absent)."""
    nd = _norm_dialect(dialect)
    if nd in (OFFICIAL_2020, OFFICIAL_2020_HYPER):
        return Vocabularies(frozenset(_2020_SET))
    if nd in (OFFICIAL_2019, OFFICIAL_2019_HYPER):
        return Vocabularies(frozenset(_2019_SET))
    known = DIALECT_TO_KNOWN.get(nd)
    if known is not None:
        return Vocabularies(frozenset({known}))
    if dialect.startswith("https://spec.openapis.org/oas/3."):
        oas = "OpenAPI_3_2_Base" if "/3.2/" in dialect \
            else "OpenAPI_3_1_Base"
        return Vocabularies(frozenset((*_2020_SET, oas)))
    if _depth > 10:
        return Vocabularies()
    meta = resolver(dialect) if resolver is not None else None
    if isinstance(meta, dict):
        vocab = meta.get("$vocabulary")
        if isinstance(vocab, dict) and vocab:
            ks, us = set(), set()
            for uri in vocab:
                k = VOCAB_URI_TO_KNOWN.get(uri)
                if k is not None:
                    ks.add(k)
                else:
                    us.add(uri)
            return Vocabularies(frozenset(ks), frozenset(us))
        parent = meta.get("$schema")
        if isinstance(parent, str) and parent != dialect:
            return vocabularies_for_dialect(parent, resolver, _depth + 1)
    return Vocabularies()


BASE_DIALECT_OF_KNOWN = {
    # era token used by rules gated on location.base_dialect
    OFFICIAL_2020: "JSON_Schema_2020_12",
    OFFICIAL_2020_HYPER: "JSON_Schema_2020_12_Hyper",
    OFFICIAL_2019: "JSON_Schema_2019_09",
    OFFICIAL_2019_HYPER: "JSON_Schema_2019_09_Hyper",
}


def base_dialect_name(dialect: str,
                      resolver: Callable[[str], Any | None],
                      _depth: int = 0) -> str | None:
    nd = _norm_dialect(dialect)
    d = BASE_DIALECT_OF_KNOWN.get(nd)
    if d is not None:
        return d
    k = DIALECT_TO_KNOWN.get(nd)
    if k is not None:
        return k
    if dialect.startswith("https://spec.openapis.org/oas/3."):
        return "JSON_Schema_2020_12"
    if _depth > 10:
        return None
    meta = resolver(dialect) if resolver is not None else None
    if isinstance(meta, dict):
        parent = meta.get("$schema")
        if isinstance(parent, str) and parent != dialect:
            return base_dialect_name(parent, resolver, _depth + 1)
        if isinstance(parent, str) and parent == dialect:
            # self-describing custom metaschema: treat as 2020-12-like
            return None
    return None


# ---------------------------------------------------------------------------
# JSON pointers as tuples
# ---------------------------------------------------------------------------

def esc(tok: str) -> str:
    return tok.replace("~", "~0").replace("/", "~1")


def unesc(tok: str) -> str:
    return tok.replace("~1", "/").replace("~0", "~")


def ptr_str(tokens: tuple) -> str:
    return "".join(f"/{esc(str(t))}" for t in tokens)


def ptr_tokens(pointer: str) -> tuple:
    if not pointer:
        return ()
    out = []
    for raw in pointer.split("/")[1:]:
        t = unesc(raw)
        out.append(int(t) if t.isdigit() else t)
    return tuple(out)


def get_at(doc: Any, tokens: tuple) -> Any:
    cur = doc
    for t in tokens:
        if isinstance(cur, dict):
            cur = cur[str(t)]
        else:
            cur = cur[int(t)]
    return cur


def try_get_at(doc: Any, tokens: tuple) -> Any | None:
    try:
        return get_at(doc, tokens)
    except (KeyError, IndexError, TypeError):
        return None


def set_at(doc: Any, tokens: tuple, value: Any) -> None:
    parent = get_at(doc, tokens[:-1])
    key = tokens[-1]
    if isinstance(parent, dict):
        parent[str(key)] = value
    else:
        parent[int(key)] = value


def starts_with(pointer: tuple, prefix: tuple) -> bool:
    return pointer[:len(prefix)] == prefix


# ---------------------------------------------------------------------------
# Frame
# ---------------------------------------------------------------------------

class Location:
    __slots__ = ("uri", "kind", "reftype", "pointer", "base", "parent",
                 "dialect", "base_dialect", "relative_pointer", "orphan")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw.get(k))


class Reference:
    __slots__ = ("reftype", "origin", "original", "destination", "base",
                 "fragment")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw.get(k))


def _dialect_era(dialect: str, resolver) -> int:
    """Numeric era (2020/2019/7/6/4/3/2/1/0) for walking decisions."""
    bd = base_dialect_name(dialect, resolver)
    if bd is None:
        return 2020
    if "2020_12" in bd:
        return 2020
    if "2019_09" in bd:
        return 2019
    for n in (7, 6, 4, 3, 2, 1, 0):
        if f"Draft_{n}" in bd:
            return n
    return 2020


class LintFrame:
    """Ordered frame over one schema document (blaze Mode::References).

    ``locations`` iterates in the C++ ``std::map`` order: key =
    (reference type [Static<Dynamic], URI string)."""

    def __init__(self, schema: Any, *,
                 resolver: Callable[[str], Any | None] | None = None,
                 default_dialect: str | None = None,
                 default_id: str = ""):
        self.schema = schema
        self.resolver = resolver or (lambda uri: None)
        self.default_dialect = default_dialect
        self.default_id = default_id
        self._locs: dict[tuple[int, str], Location] = {}
        self._refs: dict[tuple[int, tuple], Reference] = {}
        self._analyse()

    # -- construction -----------------------------------------------------

    def _declared_id(self, node: dict, era: int, legacy: bool) -> str | None:
        key = "id" if legacy else "$id"
        v = node.get(key)
        if not isinstance(v, str) or not v:
            return None
        if era in (6, 7) or legacy:
            # fragment-only ids are anchors, not resources
            if v.startswith("#"):
                return None
        return v

    def _analyse(self) -> None:
        schema = self.schema
        self._locs.clear()
        self._refs.clear()
        if isinstance(schema, bool):
            root_dialect = self.default_dialect or OFFICIAL_2020
            self._add_loc(0, self.default_id, Location(
                uri=self.default_id, kind="resource", reftype=0,
                pointer=(), base=self.default_id, parent=None,
                dialect=root_dialect,
                base_dialect=base_dialect_name(root_dialect, self.resolver),
                relative_pointer=(), orphan=False))
            self.root_uri = self.default_id
            self._finish()
            return
        if not isinstance(schema, dict):
            raise ValueError("not a schema")

        root_dialect = schema.get("$schema") \
            if isinstance(schema.get("$schema"), str) \
            else self.default_dialect
        if root_dialect is None:
            root_dialect = OFFICIAL_2020
        root_era = _dialect_era(root_dialect, self.resolver)
        legacy = root_era <= 4

        declared = self._declared_id(schema, root_era, legacy)
        if declared is not None:
            root_uri = declared
        else:
            root_uri = self.default_id
        self.root_uri = root_uri

        self._emit(schema, (), root_uri, (), root_dialect, root_era,
                   None, False)
        self._finish()

    def _finish(self) -> None:
        self.locations: list[Location] = [
            v for _k, v in sorted(self._locs.items(),
                                  key=lambda kv: (kv[0][0], kv[0][1]))]
        self.references: list[Reference] = [
            v for _k, v in sorted(
                self._refs.items(), key=lambda kv: (kv[0][0], kv[0][1]))]
        self._by_pointer: dict[tuple, Location] = {}
        for loc in self.locations:
            if loc.kind in ("resource", "subschema"):
                self._by_pointer.setdefault(loc.pointer, loc)
        # standalone: every non-$schema reference resolves in-frame
        uris = {(k[0], k[1]) for k in self._locs}

        def resolves(r: Reference) -> bool:
            if r.origin and r.origin[-1] == "$schema":
                return True
            return (0, r.destination) in uris or (1, r.destination) in uris
        self._standalone = all(resolves(r) for r in self.references)

    def _add_loc(self, reftype: int, uri: str, loc: Location) -> None:
        self._locs.setdefault((reftype, uri), loc)

    def _emit(self, node: Any, ptr: tuple, base: str, res_ptr: tuple,
              dialect: str, era: int, parent: tuple | None,
              orphan: bool) -> None:
        if isinstance(node, dict) and isinstance(node.get("$schema"), str) \
                and (ptr == () or self._declared_id(
                    node, era, era <= 4) is not None):
            new_dialect = node["$schema"]
            new_era = _dialect_era(new_dialect, self.resolver)
            # a draft<=7 `$ref` overrides every sibling: the embedded
            # `$id`/`$schema` are ignored and the node stays in the
            # parent resource (ignored_metaschema's parenthetical)
            if not (ptr != () and new_era <= 7 and "$ref" in node):
                dialect, era = new_dialect, new_era
        legacy = era <= 4

        # resource re-basing on declared ids below the root
        if ptr != () and isinstance(node, dict):
            did = self._declared_id(node, era, legacy)
            if did is not None:
                base = urljoin(base or "", did)
                res_ptr = ptr

        uri = base if ptr == res_ptr else \
            f"{base}#{ptr_str(ptr[len(res_ptr):])}"
        kind = "resource" if ptr == res_ptr else "subschema"
        bd = base_dialect_name(dialect, self.resolver)
        loc = Location(uri=uri, kind=kind, reftype=0, pointer=ptr,
                       base=base, parent=parent, dialect=dialect,
                       base_dialect=bd,
                       relative_pointer=ptr[len(res_ptr):], orphan=orphan)
        self._add_loc(0, uri, loc)
        if ptr == res_ptr and ptr != ():
            # embedded resources are also addressable under the root
            alt_uri = f"{self.root_uri}#{ptr_str(ptr)}"
            self._add_loc(0, alt_uri, Location(
                uri=alt_uri, kind="subschema", reftype=0, pointer=ptr,
                base=base, parent=parent, dialect=dialect, base_dialect=bd,
                relative_pointer=ptr[len(res_ptr):], orphan=orphan))

        if not isinstance(node, dict):
            return

        vocab = vocabularies_for_dialect(dialect, self.resolver)

        # anchors
        for key, dyn in (("$anchor", 0), ("$dynamicAnchor", 1)):
            a = node.get(key)
            if isinstance(a, str) and walker(key, vocab).type != "Unknown":
                auri = f"{base}#{a}"
                aloc = Location(uri=auri, kind="anchor", reftype=dyn,
                                pointer=ptr, base=base, parent=parent,
                                dialect=dialect, base_dialect=bd,
                                relative_pointer=ptr[len(res_ptr):],
                                orphan=orphan)
                self._add_loc(dyn, auri, aloc)
                if key == "$dynamicAnchor":
                    # a dynamic anchor is also a static anchor
                    self._add_loc(0, auri, Location(
                        uri=auri, kind="anchor", reftype=0, pointer=ptr,
                        base=base, parent=parent, dialect=dialect,
                        base_dialect=bd,
                        relative_pointer=ptr[len(res_ptr):], orphan=orphan))
        if era in (6, 7) or legacy:
            nid = node.get("id") if legacy else node.get("$id")
            if isinstance(nid, str) and nid.startswith("#") and len(nid) > 1:
                auri = f"{base}{nid}"
                self._add_loc(0, auri, Location(
                    uri=auri, kind="anchor", reftype=0, pointer=ptr,
                    base=base, parent=parent, dialect=dialect,
                    base_dialect=bd,
                    relative_pointer=ptr[len(res_ptr):], orphan=orphan))
        if era == 2019:
            ra = node.get("$recursiveAnchor")
            if ra is True:
                self._add_loc(1, base, Location(
                    uri=base, kind="anchor", reftype=1, pointer=ptr,
                    base=base, parent=parent, dialect=dialect,
                    base_dialect=bd,
                    relative_pointer=ptr[len(res_ptr):], orphan=orphan))

        # references
        for key in ("$ref", "$recursiveRef", "$dynamicRef"):
            v = node.get(key)
            if not isinstance(v, str):
                continue
            if walker(key, vocab).type not in ("Reference",):
                if key != "$ref" or not legacy:
                    continue
            dyn = 1 if key in ("$dynamicRef", "$recursiveRef") else 0
            dest = urljoin(base or "", v) if v else (base or "")
            dbase, _, dfrag = dest.partition("#")
            self._refs[(dyn, ptr + (key,))] = Reference(
                reftype=dyn, origin=ptr + (key,), original=v,
                destination=dest, base=dbase,
                fragment=dfrag if "#" in dest else None)
        sref = node.get("$schema")
        if isinstance(sref, str) and ptr == res_ptr:
            dest = urljoin(base or "", sref)
            dbase, _, dfrag = dest.partition("#")
            self._refs[(0, ptr + ("$schema",))] = Reference(
                reftype=0, origin=ptr + ("$schema",), original=sref,
                destination=dest, base=dbase,
                fragment=dfrag if "#" in dest else None)

        # subschema traversal via the walker
        for k, v in node.items():
            meta = walker(k, vocab)
            shape = None
            t = meta.type
            if t in _SHAPE_SCHEMA:
                shape = "schema"
            elif t in _SHAPE_LIST:
                shape = "list"
            elif t in _SHAPE_MAP:
                shape = "map"
            elif t in _SHAPE_VALUE_OR_LIST:
                shape = "list" if isinstance(v, list) else "schema"
            if shape is None:
                continue
            sub_orphan = orphan or t == "LocationMembers"
            child = ptr + (k,)
            if shape == "schema" and isinstance(v, (dict, bool)):
                self._emit(v, child, base, res_ptr, dialect, era, ptr,
                           orphan)
            elif shape == "list" and isinstance(v, list):
                for i, x in enumerate(v):
                    if isinstance(x, (dict, bool)):
                        self._emit(x, child + (i,), base, res_ptr, dialect,
                                   era, ptr, sub_orphan
                                   if t == "LocationMembers" else orphan)
            elif shape == "map" and isinstance(v, dict):
                for name, sub in v.items():
                    if isinstance(sub, (dict, bool)):
                        self._emit(sub, child + (name,), base, res_ptr,
                                   dialect, era, ptr, sub_orphan)

    # -- queries ----------------------------------------------------------

    def standalone(self) -> bool:
        return self._standalone

    def root(self) -> str:
        return self.root_uri

    def traverse(self, uri: str, kind: str | None = None) -> Location | None:
        loc = self._locs.get((0, uri)) or self._locs.get((1, uri))
        if loc is not None and kind is not None and loc.kind != kind:
            return None
        return loc

    def traverse_pointer(self, pointer: tuple) -> Location | None:
        return self._by_pointer.get(pointer)

    def uri_of_pointer(self, pointer: tuple) -> str | None:
        loc = self._by_pointer.get(pointer)
        return loc.uri if loc is not None else None

    def reference(self, reftype: int, pointer: tuple) -> Reference | None:
        return self._refs.get((reftype, pointer))

    def vocabularies(self, location: Location) -> Vocabularies:
        return vocabularies_for_dialect(location.dialect, self.resolver)

    def has_references_through(self, pointer: tuple,
                               tail: str | None = None) -> bool:
        """frame.cc:1523/1554 — any reference whose destination's
        pointer passes through ``pointer`` (+ ``tail``)."""
        prefix = pointer if tail is None else pointer + (tail,)
        for ref in self.references:
            if ref.origin and ref.origin[-1] == "$schema":
                continue
            if ref.reftype == 0:
                match = self._locs.get((0, ref.destination))
                if match is not None and starts_with(match.pointer, prefix):
                    return True
            else:
                for (rt, uri), loc in self._locs.items():
                    if rt == 1 and loc.kind == "anchor" \
                            and starts_with(loc.pointer, prefix):
                        frag = uri.partition("#")[2] if "#" in uri else ""
                        if ref.fragment is None or frag == ref.fragment:
                            return True
        return False

    def has_references_to(self, pointer: tuple) -> bool:
        for ref in self.references:
            if ref.origin and ref.origin[-1] == "$schema":
                continue
            match = self._locs.get((ref.reftype, ref.destination)) \
                or self._locs.get((0, ref.destination))
            if match is not None and match.pointer == pointer:
                return True
        return False

    def is_reachable(self, target: Location) -> bool:
        """Whether ``target`` is on the evaluation path from the root:
        not under an orphan container, or referenced by a reachable
        reference (transitively)."""
        if not target.orphan:
            return True
        # BFS over references from reachable origins
        seen: set[tuple] = set()
        frontier = [loc for loc in self.locations
                    if loc.kind in ("resource", "subschema")
                    and not loc.orphan]
        reach_ptrs = {loc.pointer for loc in frontier}
        changed = True
        while changed:
            changed = False
            for ref in self.references:
                if ref.origin and ref.origin[-1] == "$schema":
                    continue
                origin_sub = ref.origin[:-1]
                if origin_sub not in reach_ptrs or ref.origin in seen:
                    continue
                dest = self._locs.get((ref.reftype, ref.destination)) \
                    or self._locs.get((0, ref.destination)) \
                    or self._locs.get((1, ref.destination))
                if dest is None:
                    continue
                seen.add(ref.origin)
                # everything under the destination becomes reachable
                for loc in self.locations:
                    if loc.kind in ("resource", "subschema") \
                            and starts_with(loc.pointer, dest.pointer) \
                            and loc.pointer not in reach_ptrs:
                        reach_ptrs.add(loc.pointer)
                        changed = True
        return target.pointer in reach_ptrs
