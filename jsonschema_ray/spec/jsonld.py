"""JSON Schema → JSON-LD promotion (the ``rdf`` verb).

The reference's ``jsonschema rdf`` (``/root/reference/src/command_rdf.cc:
100-220``, semantics in ``/root/reference/docs/rdf.markdown``) evaluates
an instance against a 2019-09/2020-12 schema annotated with
``x-jsonld-*`` keywords and, if valid, prints the instance promoted to
expanded-form JSON-LD.  This is a from-scratch re-implementation of the
documented annotation vocabulary subset:

    x-jsonld-id, x-jsonld-type, x-jsonld-datatype, x-jsonld-language,
    x-jsonld-container (@list/@set), x-jsonld-self (URI template with
    verbatim property variables, or the `mailto`/`acct` schemes),
    x-jsonld-value, x-jsonld-constants, x-jsonld-json, x-jsonld-reverse

Unsupported keywords (``x-jsonld-graph``, ``@language``/``@index``
containers, ``x-jsonld-direction``, ``x-jsonld-override``) raise
:class:`ResolutionError` naming the schema location, mirroring the
reference's resolution-error contract (every error cites the offending
annotation).  The guarantee is the same syntactic one the reference
makes: if promotion succeeds, the output is well-formed expanded
JSON-LD.

Dataset-scale path: :class:`PromoteBatch` is an actor-pool
``map_batches`` stage that compiles the schema ONCE per actor and
promotes a JSON payload column row-batch at a time — the reference is
single-instance; at 10^12 docs promotion is a per-record transform like
any other.
"""

from __future__ import annotations

import json
import re
import urllib.parse
from typing import Any

_DIALECTS = ("https://json-schema.org/draft/2020-12/schema",
             "https://json-schema.org/draft/2019-09/schema")

_KEYWORDS = {"x-jsonld-id", "x-jsonld-type", "x-jsonld-reverse",
             "x-jsonld-datatype", "x-jsonld-language", "x-jsonld-json",
             "x-jsonld-container", "x-jsonld-self", "x-jsonld-value",
             "x-jsonld-constants", "x-jsonld-graph", "x-jsonld-direction",
             "x-jsonld-override"}


class ResolutionError(ValueError):
    """Annotation resolution failure; cites the schema location."""

    def __init__(self, message: str, schema_location: str):
        super().__init__(f"{message}\n    at schema location "
                         f"\"{schema_location}\"")
        self.schema_location = schema_location


def _resolve_pointer(root: Any, pointer: str) -> Any:
    node = root
    if pointer in ("", "#"):
        return node
    for part in pointer.lstrip("#").lstrip("/").split("/"):
        part = part.replace("~1", "/").replace("~0", "~")
        node = node[int(part)] if isinstance(node, list) else node[part]
    return node


def _effective(root: Any, sch: Any, ptr: str, depth: int = 0) -> dict:
    """Merge the subschema with its ``$ref`` target and ``allOf``
    members so annotations reachable through references participate
    (inline keys win over referenced ones)."""
    if not isinstance(sch, dict) or depth > 16:
        return {}
    out: dict = {}
    if isinstance(sch.get("$ref"), str) and sch["$ref"].startswith("#"):
        out.update(_effective(root, _resolve_pointer(root, sch["$ref"]),
                              sch["$ref"], depth + 1))
    for member in sch.get("allOf", []) or []:
        out.update(_effective(root, member, ptr + "/allOf", depth + 1))
    out.update(sch)
    return out


def _self_id(template: str, value: Any, siblings: dict, ptr: str) -> str:
    """Mint an ``@id`` from ``x-jsonld-self``: an RFC 6570 URI template
    (variables matched VERBATIM against property names; ``this`` is the
    scalar value itself) or a scheme identity name (mailto / acct)."""
    if template == "mailto":
        if not isinstance(value, str) or "@" not in value:
            raise ResolutionError(
                f"value {value!r} is not a mailbox for the mailto scheme",
                ptr)
        local, _, domain = value.rpartition("@")
        return "mailto:" + urllib.parse.quote(local, safe="") + "@" + \
            domain.lower()
    if template == "acct":
        if not isinstance(value, str) or "@" not in value:
            raise ResolutionError(
                f"value {value!r} is not a user@host account for acct", ptr)
        local, _, domain = value.rpartition("@")
        return "acct:" + urllib.parse.quote(local, safe="") + "@" + \
            domain.lower()

    def sub(m: re.Match) -> str:
        expr = m.group(1)
        reserved = expr.startswith("+")
        name = expr.lstrip("+")
        if name == "this":
            v = value
        elif name in siblings:
            v = siblings[name]
        else:
            raise ResolutionError(
                f"x-jsonld-self variable {{{expr}}} matches no instance "
                "property", ptr)
        s = v if isinstance(v, str) else json.dumps(v)
        return s if reserved else urllib.parse.quote(s, safe="")

    return re.sub(r"\{([^}]+)\}", sub, template)


def _expand_constants(constants: Any, ptr: str) -> dict:
    """``x-jsonld-constants`` is an expanded-form node-object fragment:
    scalar values are wrapped as literals, expanded structures pass
    through."""
    if not isinstance(constants, dict):
        raise ResolutionError("x-jsonld-constants must be an object", ptr)
    out = {}
    for k, v in constants.items():
        if isinstance(v, list):
            out[k] = v
        elif isinstance(v, dict):
            out[k] = [v]
        else:
            out[k] = [{"@value": v}]
    return out


def _scalar_literal(sch: dict, v: Any, ptr: str) -> dict:
    if sch.get("x-jsonld-json"):
        return {"@value": v, "@type": "@json"}
    dt = sch.get("x-jsonld-datatype")
    lang = sch.get("x-jsonld-language")
    if dt is not None and lang is not None:
        raise ResolutionError(
            "x-jsonld-datatype and x-jsonld-language are mutually "
            "exclusive", ptr)
    if dt is not None:
        return {"@value": v, "@type": dt}
    if lang is not None:
        if not isinstance(v, str):
            raise ResolutionError(
                "x-jsonld-language applies to string values only", ptr)
        out = {"@value": v, "@language": lang}
        return out
    return {"@value": v}


def _expand(root: Any, sch: Any, value: Any, ptr: str,
            siblings: dict | None = None) -> Any:
    """Expand one instance value under its (effective) subschema into an
    expanded-form JSON-LD entity."""
    eff = _effective(root, sch, ptr)
    for unsupported in ("x-jsonld-graph", "x-jsonld-direction",
                        "x-jsonld-override"):
        if unsupported in eff:
            raise ResolutionError(
                f"{unsupported} is not supported by this engine", ptr)

    if eff.get("x-jsonld-json"):
        # opaque @json literal regardless of value shape
        return {"@value": value, "@type": "@json"}

    if isinstance(value, dict):
        node: dict = {}
        t = eff.get("x-jsonld-type")
        if t is not None:
            node["@type"] = t if isinstance(t, list) else [t]
        self_t = eff.get("x-jsonld-self")
        if self_t is not None:
            node["@id"] = _self_id(self_t, value, value, ptr)
        props = eff.get("properties", {}) or {}
        for name in sorted(value):
            sub = _effective(root, props.get(name, {}),
                             f"{ptr}/properties/{name}")
            pid = sub.get("x-jsonld-id")
            rev = sub.get("x-jsonld-reverse")
            if pid is None and rev is None:
                continue  # unannotated properties drop, like expansion
            entity = _expand(root, sub, value[name],
                             f"{ptr}/properties/{name}", value)
            entities = entity if isinstance(entity, list) else [entity]
            if rev is not None:
                node.setdefault("@reverse", {}).setdefault(
                    rev, []).extend(entities)
            else:
                node.setdefault(pid, []).extend(entities)
        consts = eff.get("x-jsonld-constants")
        if consts is not None:
            for k, v in _expand_constants(consts, ptr).items():
                node.setdefault(k, v)
        return node

    if isinstance(value, list):
        container = eff.get("x-jsonld-container")
        if container not in (None, "@list", "@set"):
            raise ResolutionError(
                f"x-jsonld-container {container!r} is not supported "
                "(@list and @set only)", ptr)
        items_sch = eff.get("items", {}) or {}
        items = [_expand(root, items_sch, v, f"{ptr}/items")
                 for v in value]
        flat: list = []
        for it in items:
            flat.extend(it if isinstance(it, list) else [it])
        if container == "@list":
            return [{"@list": flat}]
        return flat

    # scalar
    self_t = eff.get("x-jsonld-self")
    if self_t is not None:
        return {"@id": _self_id(self_t, value, siblings or {}, ptr)}
    value_iri = eff.get("x-jsonld-value")
    if value_iri is not None:
        node = {}
        t = eff.get("x-jsonld-type")
        if t is not None:
            node["@type"] = t if isinstance(t, list) else [t]
        node[value_iri] = [_scalar_literal(
            {k: v for k, v in eff.items()
             if k not in ("x-jsonld-value", "x-jsonld-type")}, value, ptr)]
        consts = eff.get("x-jsonld-constants")
        if consts is not None:
            for k, v in _expand_constants(consts, ptr).items():
                node.setdefault(k, v)
        return node
    return _scalar_literal(eff, value, ptr)


def promote(schema: Any, instance: Any, *,
            validate: bool = True) -> list[Any]:
    """Promote a (valid) instance to expanded-form JSON-LD.

    Returns the expanded document (a list of node objects, per the
    JSON-LD expanded form).  Raises :class:`ResolutionError` on
    annotation errors and ``ValueError`` on dialect/validation
    failures (the caller maps those to exit codes).
    """
    dialect = schema.get("$schema") if isinstance(schema, dict) else None
    if dialect is not None and dialect not in _DIALECTS:
        raise ValueError(
            "rdf requires a 2019-09 or 2020-12 base dialect (annotation "
            f"collection); got {dialect!r} — run `upgrade` first")
    if validate:
        from jsonschema_ray.spec.jschema import compile_schema

        errs = compile_schema(schema).validate(instance)
        if errs:
            raise ValueError("instance does not match the schema: " +
                             "; ".join(e[2] for e in errs[:5]))
    expanded = _expand(schema, schema, instance, "#")
    if isinstance(expanded, list):
        return expanded
    return [expanded]


class PromoteBatch:
    """Actor-pool stage: promote a JSON payload column to expanded
    JSON-LD strings (schema compiled once per actor)."""

    def __init__(self, schema: Any, column: str = "props",
                 out_column: str = "jsonld", validate: bool = True):
        from jsonschema_ray.spec.jschema import compile_schema

        self.schema = schema
        self.column = column
        self.out_column = out_column
        self.checker = compile_schema(schema) if validate else None

    def __call__(self, batch):
        import pyarrow as pa

        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out, ok = [], []
        for raw in col.to_pylist():
            try:
                inst = json.loads(raw) if isinstance(raw, str) else raw
                if self.checker is not None and \
                        not self.checker.is_valid(inst):
                    out.append(None)
                    ok.append(False)
                    continue
                out.append(json.dumps(
                    promote(self.schema, inst, validate=False),
                    sort_keys=True))
                ok.append(True)
            except (ValueError, KeyError, TypeError):
                out.append(None)
                ok.append(False)
        return batch.append_column(
            self.out_column, pa.array(out, type=pa.string())
        ).append_column("jsonld_ok", pa.array(ok, type=pa.bool_()))
