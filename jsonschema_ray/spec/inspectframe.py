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
