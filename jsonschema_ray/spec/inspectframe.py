"""Frame-location enumeration — the reference ``inspect`` verb's model.

Produces the same location taxonomy the reference prints
(``src/command_inspect.cc`` over blaze SchemaFrame, Mode::Locations):

- ``(RESOURCE)`` — a schema resource root (declared ``$id``/legacy
  ``id`` or the externally-supplied identity), URI without fragment
- ``(SUBSCHEMA)`` — a schema position that is not a resource root,
  URI = enclosing resource base + ``#`` + resource-relative pointer
- ``(POINTER)``  — any other enumerated location (keyword members of
  schema objects, container keywords like ``$defs``/``properties``)
- ``(ANCHOR)``   — ``$anchor``/``$dynamicAnchor`` names (Static and/or
  Dynamic), URI = base + ``#`` + name
- ``(REFERENCE)`` — one entry per ``$ref``/``$dynamicRef`` with the
  canonicalized destination

Used by ``inspect --schema`` and the inspect corpus replay (set
comparison of header lines — positions/orphan flags are print-layout
concerns, the LOCATION SET is the semantic content).
"""

from __future__ import annotations

from typing import Any
from urllib.parse import urljoin

from jsonschema_ray.spec.jschema import (_SUBSCHEMA_KW, _DocIndex,
                                         _dialect_ver, _is_legacy_dialect)


def _esc(tok: str) -> str:
    return tok.replace("~", "~0").replace("/", "~1")


def frame_entries(schema: Any, *, default_dialect: str | None = None,
                  default_id: str = "") -> list[str]:
    """Sorted ``(KIND) URI: x`` / ``(REFERENCE) ORIGIN: p -> dest``
    header strings for every frame location of the document."""
    if isinstance(schema, bool):
        base = default_id
        return [f"(RESOURCE) URI: {base}" if base
                else "(RESOURCE) URI: "]
    if not isinstance(schema, dict):
        raise ValueError("the input document is not a schema")

    legacy = _is_legacy_dialect(schema) or (
        default_dialect is not None
        and _dialect_ver({"$schema": default_dialect}) <= 4)
    root_ver = _dialect_ver(schema) if "$schema" in schema else (
        _dialect_ver({"$schema": default_dialect}) if default_dialect
        else 2020)

    idx = _DocIndex(schema, legacy_id=legacy, ver=0)
    if default_id and idx.resource_roots[""] == "":
        idx.resources[default_id] = ""
        idx.resource_roots[""] = default_id
        del idx.resources[""]

    def uri_of(ptr: str) -> str:
        base = idx.enclosing(ptr)
        res_ptr = idx.resources.get(base, "")
        rel = ptr[len(res_ptr):]
        return f"{base}#{rel}" if rel else base

    locs: list[str] = []
    refs: list[str] = []

    def emit_schema(node: Any, ptr: str, ver: int) -> None:
        if isinstance(node, dict) and isinstance(node.get("$schema"), str):
            ver = _dialect_ver(node)
        if ptr in idx.resource_roots:
            locs.append(f"(RESOURCE) URI: {idx.resource_roots[ptr]}")
        else:
            locs.append(f"(SUBSCHEMA) URI: {uri_of(ptr)}")
        if not isinstance(node, dict):
            return
        base = idx.enclosing(ptr)
        for key in ("$anchor", "$dynamicAnchor"):
            a = node.get(key)
            if isinstance(a, str):
                locs.append(f"(ANCHOR) URI: {base}#{a}")
        if legacy or ver in (6, 7):
            nid = node.get("$id") if not legacy else node.get("id")
            if isinstance(nid, str) and nid.startswith("#") and len(nid) > 1:
                locs.append(f"(ANCHOR) URI: {base}{nid}")
        for k, v in node.items():
            child = f"{ptr}/{_esc(k)}"
            if k in ("$ref", "$dynamicRef", "$schema") \
                    and isinstance(v, str):
                # $schema is a reference too in the reference's frame
                # (metaschema dependency edge)
                dest = urljoin(base or "", v)
                refs.append(f"(REFERENCE) ORIGIN: {child} -> {dest}")
            spec = _SUBSCHEMA_KW.get(k)
            if spec and spec[1] <= ver <= spec[2]:
                shape = spec[0]
                if shape == "items":
                    shape = "list" if isinstance(v, list) and ver < 2020 \
                        else "schema"
                if shape == "schema" and isinstance(v, (dict, bool)):
                    emit_schema(v, child, ver)
                    continue
                if shape == "list" and isinstance(v, list):
                    locs.append(f"(POINTER) URI: {uri_of(child)}")
                    for i, x in enumerate(v):
                        if isinstance(x, (dict, bool)):
                            emit_schema(x, f"{child}/{i}", ver)
                        else:
                            locs.append(
                                f"(POINTER) URI: {uri_of(f'{child}/{i}')}")
                    continue
                if shape == "map" and isinstance(v, dict):
                    locs.append(f"(POINTER) URI: {uri_of(child)}")
                    for name, sub in v.items():
                        sp = f"{child}/{_esc(name)}"
                        if isinstance(sub, (dict, bool)):
                            emit_schema(sub, sp, ver)
                        else:
                            locs.append(f"(POINTER) URI: {uri_of(sp)}")
                    continue
            locs.append(f"(POINTER) URI: {uri_of(child)}")

    emit_schema(schema, "", root_ver)
    return sorted(set(locs)) + sorted(set(refs))


# ---------------------------------------------------------------------------
# Full frame dump — the verbatim `inspect` output model
# ---------------------------------------------------------------------------

_BASE_DIALECT = {
    2020: "https://json-schema.org/draft/2020-12/schema",
    2019: "https://json-schema.org/draft/2019-09/schema",
    7: "http://json-schema.org/draft-07/schema#",
    6: "http://json-schema.org/draft-06/schema#",
    4: "http://json-schema.org/draft-04/schema#",
    3: "http://json-schema.org/draft-03/schema#",
}


def frame_dump(schema: Any, spans: dict | None = None, *,
               default_dialect: str | None = None,
               default_id: str = "",
               dialect_ver: int | None = None
               ) -> tuple[list[dict], list[dict]]:
    """Structured frame locations + references with every attribute the
    reference's ``inspect`` prints (``src/command_inspect.cc`` over
    blaze SchemaFrame Mode::Locations): URI, kind, static/dynamic type,
    root/base resources, absolute + resource-relative pointers, source
    span, declared dialect + canonical base dialect, parent subschema,
    orphan flag ($defs/definitions containers are not on the evaluation
    path). ``spans``: pointer → (sl, sc, el, ec) from
    spec.positions."""
    spans = spans or {}

    def span_of(ptr: str):
        return spans.get(ptr, (1, 1, 1, 1))

    if isinstance(schema, bool):
        d = default_dialect or "https://json-schema.org/draft/2020-12/schema"
        ver = dialect_ver if dialect_ver is not None \
            else _dialect_ver({"$schema": d})
        return ([{
            "uri": default_id, "kind": "resource", "type": "static",
            "root": default_id, "pointer": "", "base": default_id,
            "relativePointer": "", "dialect": d,
            "baseDialect": _BASE_DIALECT.get(ver, d),
            "parent": None, "propertyName": False, "orphan": False,
            "position": span_of(""),
        }], [])
    if not isinstance(schema, dict):
        raise ValueError("the input document is not a schema")

    legacy = _is_legacy_dialect(schema) or (
        default_dialect is not None
        and _dialect_ver({"$schema": default_dialect}) <= 4)
    root_dialect = schema.get("$schema") if \
        isinstance(schema.get("$schema"), str) else default_dialect
    if dialect_ver is not None and "$schema" not in schema:
        root_ver = dialect_ver
    else:
        root_ver = _dialect_ver({"$schema": root_dialect}) \
            if root_dialect else 2020

    idx = _DocIndex(schema, legacy_id=legacy, ver=0)
    if default_id and idx.resource_roots[""] == "":
        idx.resources[default_id] = ""
        idx.resource_roots[""] = default_id
        del idx.resources[""]

    def uri_of(ptr: str) -> str:
        base = idx.enclosing(ptr)
        res_ptr = idx.resources.get(base, "")
        rel = ptr[len(res_ptr):]
        return f"{base}#{rel}" if rel else base

    def rel_of(ptr: str) -> str:
        base = idx.enclosing(ptr)
        return ptr[len(idx.resources.get(base, "")):]

    root_uri = idx.resource_roots[""]
    locs: list[dict] = []
    refs: list[dict] = []

    def add_loc(ptr: str, kind: str, *, dialect: str, ver: int,
                parent: str | None, orphan: bool,
                typ: str = "static") -> None:
        locs.append({
            "uri": uri_of(ptr) if kind != "resource"
            else idx.enclosing(ptr), "kind": kind, "type": typ,
            "root": root_uri, "pointer": ptr,
            "base": idx.enclosing(ptr), "relativePointer": rel_of(ptr),
            "dialect": dialect,
            "baseDialect": _BASE_DIALECT.get(ver, dialect),
            "parent": parent, "propertyName": False, "orphan": orphan,
            "position": span_of(ptr),
        })

    def emit_schema(node: Any, ptr: str, ver: int, dialect: str,
                    parent: str | None, orphan: bool) -> None:
        if isinstance(node, dict) and isinstance(node.get("$schema"), str):
            dialect = node["$schema"]
            ver = _dialect_ver(node)
        kind = "resource" if ptr in idx.resource_roots else "subschema"
        add_loc(ptr, kind, dialect=dialect, ver=ver, parent=parent,
                orphan=orphan)
        if not isinstance(node, dict):
            return
        base = idx.enclosing(ptr)
        for key in ("$anchor", "$dynamicAnchor"):
            a = node.get(key)
            if isinstance(a, str):
                locs.append({
                    "uri": f"{base}#{a}", "kind": "anchor",
                    "type": "dynamic" if key == "$dynamicAnchor"
                    else "static", "root": root_uri, "pointer": ptr,
                    "base": base, "relativePointer": rel_of(ptr),
                    "dialect": dialect,
                    "baseDialect": _BASE_DIALECT.get(ver, dialect),
                    "parent": parent, "propertyName": False,
                    "orphan": orphan, "position": span_of(ptr),
                })
        for k, v in node.items():
            child = f"{ptr}/{_esc(k)}"
            if k in ("$ref", "$dynamicRef", "$recursiveRef", "$schema") \
                    and isinstance(v, str) and (
                        k != "$schema" or ptr in idx.resource_roots):
                dest = urljoin(base or "", v)
                dbase, _, dfrag = dest.partition("#")
                refs.append({
                    "type": "dynamic" if k == "$dynamicRef" else "static",
                    "origin": child, "position": span_of(child),
                    "destination": dest, "base": dbase or None,
                    "fragment": dfrag if "#" in dest else None,
                })
            if k == "$vocabulary" and isinstance(v, dict):
                # vocabulary members are framed locations too
                # (inspect pass_bundled_metaschema.sh)
                add_loc(child, "pointer", dialect=dialect, ver=ver,
                        parent=ptr, orphan=orphan)
                for name in v:
                    add_loc(f"{child}/{_esc(name)}", "pointer",
                            dialect=dialect, ver=ver, parent=ptr,
                            orphan=orphan)
                continue
            spec = _SUBSCHEMA_KW.get(k)
            if spec and spec[1] <= ver <= spec[2]:
                shape = spec[0]
                if shape == "items":
                    shape = "list" if isinstance(v, list) and ver < 2020 \
                        else "schema"
                sub_orphan = orphan or k in ("$defs", "definitions")
                if shape == "schema" and isinstance(v, (dict, bool)):
                    emit_schema(v, child, ver, dialect, ptr, orphan)
                    continue
                if shape == "list" and isinstance(v, list):
                    add_loc(child, "pointer", dialect=dialect, ver=ver,
                            parent=ptr, orphan=orphan)
                    for i, x in enumerate(v):
                        if isinstance(x, (dict, bool)):
                            emit_schema(x, f"{child}/{i}", ver, dialect,
                                        ptr, sub_orphan)
                        else:
                            add_loc(f"{child}/{i}", "pointer",
                                    dialect=dialect, ver=ver, parent=ptr,
                                    orphan=sub_orphan)
                    continue
                if shape == "map" and isinstance(v, dict):
                    add_loc(child, "pointer", dialect=dialect, ver=ver,
                            parent=ptr, orphan=orphan)
                    for name, sub in v.items():
                        sp = f"{child}/{_esc(name)}"
                        if isinstance(sub, (dict, bool)):
                            emit_schema(sub, sp, ver, dialect, ptr,
                                        sub_orphan)
                        else:
                            add_loc(sp, "pointer", dialect=dialect,
                                    ver=ver, parent=ptr,
                                    orphan=sub_orphan)
                    continue
            add_loc(child, "pointer", dialect=dialect, ver=ver,
                    parent=ptr, orphan=orphan)

    emit_schema(schema, "", root_ver,
                root_dialect or "https://json-schema.org/draft/2020-12/"
                "schema", None, False)
    # locations inside EMBEDDED resources are additionally addressable
    # under the root resource's URI with their full document pointer
    # (inspect pass_bundled_metaschema.sh dual entries)
    extra = []
    for e in locs:
        if e["kind"] == "anchor" or not e["pointer"]:
            continue
        if e["base"] != root_uri:
            alt = dict(e)
            alt["uri"] = f"{root_uri}#{e['pointer']}"
            if e["kind"] == "resource":
                alt["kind"] = "subschema"
            extra.append(alt)
    locs.extend(extra)
    locs.sort(key=lambda e: e["uri"])
    refs.sort(key=lambda e: e["origin"])
    return locs, refs


def render_frame_text(locs: list[dict], refs: list[dict]) -> str:
    """The reference's text dump (command_inspect.cc print layout);
    attribute lines with empty values carry no trailing space."""
    def tidy(block: str) -> str:
        return "\n".join(ln.rstrip() for ln in block.split("\n"))

    blocks = []
    for e in locs:
        kind = {"resource": "RESOURCE", "subschema": "SUBSCHEMA",
                "pointer": "POINTER", "anchor": "ANCHOR"}[e["kind"]]
        sl, sc = e["position"][0], e["position"][1]
        parent = "<NONE>" if e["parent"] is None else e["parent"]
        blocks.append(
            f"({kind}) URI: {e['uri']}\n"
            f"    Type              : "
            f"{e['type'].capitalize()}\n"
            f"    Root              : {e['root']}\n"
            f"    Pointer           : {e['pointer']}\n"
            f"    File Position     : {sl}:{sc}\n"
            f"    Base              : {e['base']}\n"
            f"    Relative Pointer  : {e['relativePointer']}\n"
            f"    Dialect           : {e['dialect']}\n"
            f"    Base Dialect      : {e['baseDialect']}\n"
            f"    Parent            : {parent}\n"
            f"    Property Name     : "
            f"{'yes' if e['propertyName'] else 'no'}\n"
            f"    Orphan            : {'yes' if e['orphan'] else 'no'}\n")
        blocks[-1] = tidy(blocks[-1])
    for r in refs:
        sl, sc = r["position"][0], r["position"][1]
        base = r["base"] if r["base"] else "<NONE>"
        frag = r["fragment"] if r["fragment"] is not None else "<NONE>"
        blocks.append(
            f"(REFERENCE) ORIGIN: {r['origin']}\n"
            f"    Type              : "
            f"{r['type'].capitalize()}\n"
            f"    File Position     : {sl}:{sc}\n"
            f"    Destination       : {r['destination']}\n"
            f"    - (w/o fragment)  : {base}\n"
            f"    - (fragment)      : {frag}\n")
        blocks[-1] = tidy(blocks[-1])
    return "\n".join(blocks)


def render_frame_json(locs: list[dict], refs: list[dict]) -> dict:
    """The reference's ``inspect --json`` document shape."""
    static, dynamic = {}, {}
    for e in locs:
        tgt = dynamic if e["type"] == "dynamic" else static
        tgt[e["uri"]] = {
            "parent": e["parent"], "type": e["kind"],
            "root": e["root"], "base": e["base"],
            "pointer": e["pointer"], "position": list(e["position"]),
            "relativePointer": e["relativePointer"],
            "dialect": e["dialect"], "baseDialect": e["baseDialect"],
            "propertyName": e["propertyName"], "orphan": e["orphan"],
        }
    out: dict = {"locations": {"static": static, "dynamic": dynamic}}
    out["references"] = [
        {"type": r["type"], "origin": r["origin"],
         "position": list(r["position"]),
         "destination": r["destination"], "base": r["base"],
         "fragment": r["fragment"]} for r in refs]
    return out
