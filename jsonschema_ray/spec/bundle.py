"""Reference-shape schema bundling.

Re-implements the reference's ``bundle`` verb semantics
(``/root/reference/src/command_bundle.cc:56-83`` driving
``vendor/blaze/src/bundle/bundle.cc:248-509``): every reference whose
base URI resolves OUTSIDE the document is fetched from a resolver
registry and embedded — with its ``$id``/``$schema`` made explicit —
under the dialect's definitions container (``$defs`` for 2019-09+,
``definitions`` for draft 4-7), keyed by its canonical URI. ``$ref``
strings stay untouched (embedded ``$id`` resources self-register at
compile time) unless the resolved identifier differs from the declared
one, in which case the ref is rewritten to the declared identifier.
Non-official metaschema references (``$schema``) are bundled too
(BundleMode::NonOfficialMetaschemas); anything under json-schema.org
is assumed understood out of the box.

Driver-side by design: schema documents are KB-scale; the output of
``bundle`` is what gets broadcast to Ray workers for distributed
validation.
"""

from __future__ import annotations

from typing import Any, Callable
from urllib.parse import urljoin

from jsonschema_ray.spec.jschema import (_DocIndex, _dialect_ver,
                                         _is_legacy_dialect,
                                         _resolve_pointer,
                                         resolve_ref_target)

Resolver = Callable[[str], Any]


def is_official_schema(uri: str) -> bool:
    """Official dialect/vocabulary URIs are never bundled
    (``foundation.h:46``; generated list in known_resolver.in.cc —
    everything under json-schema.org)."""
    u = uri.rstrip("#")
    return u.startswith(("https://json-schema.org/",
                         "http://json-schema.org/"))


def _id_keyword(doc: Any) -> str:
    return "id" if _is_legacy_dialect(doc) else "$id"


def _identify(doc: Any) -> str:
    if not isinstance(doc, dict):
        return ""
    nid = doc.get("$id")
    if not isinstance(nid, str):
        nid = doc.get("id") if _is_legacy_dialect(doc) else None
    return nid if isinstance(nid, str) else ""


def _collect_external_refs(doc: Any, default_id: str,
                           legacy: bool) -> list[tuple[str, str, str, str]]:
    """(ptr, ref-string, base-uri, fragment) for every reference whose
    base URI is not a resource of ``doc`` — document order by pointer
    (frame iteration order), ``$schema`` refs included."""
    idx = _DocIndex(doc, legacy_id=legacy, ver=0)
    if default_id and idx.resource_roots[""] == "":
        # frame with the external identity so relative refs resolve
        idx.resources.setdefault(default_id, "")
        idx.resource_roots[""] = default_id
    out = []

    def walk(node: Any, ptr: str, at_resource_root: bool) -> None:
        if isinstance(node, dict):
            ref = node.get("$ref")
            items = []
            if isinstance(ref, str):
                items.append(("$ref", ref))
            ds = node.get("$schema")
            if at_resource_root and isinstance(ds, str) \
                    and not is_official_schema(ds):
                items.append(("$schema", ds))
            for kw, target in sorted(items):
                base = idx.enclosing(ptr)
                dest = urljoin(base or "", target)
                base_part, _, frag = dest.partition("#")
                if base_part and base_part not in idx.resources:
                    out.append((f"{ptr}/{kw}", target, base_part, frag))
                elif base_part or frag:
                    # internal: must actually resolve (bundle.cc:292-302)
                    resolve_ref_target(idx, target, ptr)
                    if frag.startswith("/"):
                        _resolve_pointer(
                            doc, idx.resources.get(base_part or base, "")
                            + frag)
            for k, v in node.items():
                if k in ("enum", "const"):
                    continue
                child_root = isinstance(v, dict) and (
                    isinstance(v.get("$id"), str)
                    or (legacy and isinstance(v.get("id"), str)))
                walk(v, f"{ptr}/{k.replace('~', '~0').replace('/', '~1')}",
                     child_root)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{ptr}/{i}", False)

    walk(doc, "", True)
    return out


def _rewrite_ref(doc: Any, ptr: str, value: str) -> None:
    toks = ptr.lstrip("/").split("/")
    node = doc
    for tok in toks[:-1]:
        tok = tok.replace("~1", "/").replace("~0", "~")
        node = node[int(tok)] if isinstance(node, list) else node[tok]
    node[toks[-1].replace("~1", "/").replace("~0", "~")] = value


def _elevate_embedded(remote: dict, container: dict, bundled: dict) -> None:
    """Hoist a bundled schema's own ``$defs``/``definitions`` entries
    that are themselves identified resources (key == absolute ``$id``)
    into the ROOT container, deduplicating repeats
    (``bundle.cc:152-246``, pass_resolve_deduplicate_embedded.sh)."""
    for kw in ("$defs", "definitions"):
        defs = remote.get(kw)
        if not isinstance(defs, dict):
            continue
        for key in list(defs):
            val = defs[key]
            ident = _identify(val)
            if not ident or ident != key or "://" not in ident:
                continue
            if ident in bundled:
                prev = container.get(ident)
                if prev is not None and prev != val:
                    raise ValueError(
                        "conflicting embedded resources with the same "
                        f"identifier: {ident!r}")
                del defs[key]
            else:
                bundled[ident] = ident
                del defs[key]
                k = ident
                while k in container:
                    k += "/x"
                container[k] = val
        if not defs:
            remote.pop(kw, None)


def bundle_schema(schema: Any, resolver: Resolver, *,
                  default_dialect: str | None = None,
                  default_id: str = "",
                  mode: str = "metaschemas") -> Any:
    """Return a self-contained copy of ``schema`` with every external
    dependency embedded (``blaze::bundle``, mode
    NonOfficialMetaschemas). ``resolver(uri)`` returns the schema for
    an external URI or None. Raises ValueError on unresolvable refs,
    non-schema remotes, or undecidable dialects (reference exit 4/6
    family)."""
    import copy as _copy

    schema = _copy.deepcopy(schema)
    if not isinstance(schema, (dict, bool)):
        raise ValueError("the input document is not a schema")
    if isinstance(schema, bool):
        return schema

    legacy = _is_legacy_dialect(schema)
    ds = schema.get("$schema")
    if not isinstance(ds, str) and default_dialect:
        ds = default_dialect
    if not isinstance(ds, str):
        from jsonschema_ray.spec.clierrors import \
            SchemaUnknownBaseDialectError

        raise SchemaUnknownBaseDialectError()
    root_ds = schema.get("$schema")
    if isinstance(root_ds, str) and "://" not in root_ds:
        from jsonschema_ray.spec.clierrors import SchemaKeywordError

        raise SchemaKeywordError("The dialect is not a valid URI",
                                 value=root_ds, keyword="$schema")
    ver = _dialect_ver({"$schema": ds})
    legacy = legacy or ver <= 4

    # frame strictness first (an invalid declared $id must reject, not
    # be overwritten — fail_invalid_id_type.sh). When the document
    # carries NO identifier at all, frame under the external default so
    # anchor-collision identifiers report the effective base URI
    # (fail_anchor_collision.sh expects file://...#name)
    probe = schema
    if default_id and isinstance(schema, dict) \
            and "$id" not in schema and "id" not in schema:
        probe = dict(schema)
        probe["id" if legacy else "$id"] = default_id
    _DocIndex(probe, legacy_id=legacy, ver=ver)

    # implicit identity: give the root its external identifier so
    # relative refs stay resolvable from the bundle (bundle.cc:457-465)
    if default_id and not _identify(schema):
        if "$ref" in schema and ver <= 7:
            if len(schema) == 1:
                # draft<=7 reference object: hoist into allOf/extends
                # so the identifier can coexist (bundle.cc:487-504)
                schema = {"extends" if ver <= 3 else "allOf": [dict(schema)]}
            else:
                raise ValueError(
                    "cannot bundle a Draft 7 or older schema with a "
                    "top-level $ref (it overrides sibling keywords)")
        schema[_id_keyword(schema) if not legacy else "id"] = default_id

    container_kw = "$defs" if ver >= 2019 else "definitions"

    bundled: dict[str, str] = {}
    idx0 = _DocIndex(schema, legacy_id=legacy, ver=0)
    for uri in idx0.resources:
        if uri:
            bundled[uri] = uri

    if isinstance(root_ds, str) and "://" in root_ds \
            and not is_official_schema(root_ds) \
            and root_ds.rstrip("#") not in bundled:
        # an unresolvable metaschema rejects before any ref work
        # (fail_unknown_metaschema.sh: the walker needs the dialect) —
        # unless the document embeds it itself (pass_bundled_metaschema)
        if resolver(root_ds) is None:
            from jsonschema_ray.spec.clierrors import SchemaResolutionError

            raise SchemaResolutionError(root_ds)

    def embed_all(doc: Any, doc_default_id: str) -> None:
        refs = _collect_external_refs(doc, doc_default_id, legacy)
        deferred = []
        for ptr, target, base_uri, frag in refs:
            if is_official_schema(base_uri):
                continue
            if mode == "references" and ptr.endswith("/$schema"):
                # References mode skips metaschema dependencies
                # (BundleMode::References, bundle.cc:19-31)
                continue
            mapped = bundled.get(base_uri)
            if mapped is not None:
                if mapped != base_uri:
                    _rewrite_ref(doc, ptr,
                                 mapped + (f"#{frag}" if frag else ""))
                continue
            remote = resolver(base_uri)
            if remote is None:
                if ptr.endswith("/$schema"):
                    from jsonschema_ray.spec.clierrors import \
                        SchemaResolutionError

                    raise SchemaResolutionError(base_uri)
                from jsonschema_ray.spec.clierrors import ExternalRefError

                raise ExternalRefError(base_uri)
            if not isinstance(remote, (dict, bool)):
                raise ValueError(
                    f"the resolved document is not a schema: {base_uri!r}")
            remote = _copy.deepcopy(remote)
            effective_id = _identify(remote) or base_uri
            if isinstance(remote, dict):
                if "$schema" not in remote:
                    remote["$schema"] = ds
                # reidentify with the effective id (bundle.cc:371-383)
                if "$ref" in remote and _dialect_ver(remote) <= 7 \
                        and _identify(remote) != effective_id:
                    raise ValueError(
                        "cannot bundle a Draft 7 or older reference "
                        f"object: {base_uri!r}")
                remote[_id_keyword(remote)] = effective_id
            if frag:
                # the fragment must exist in the remote
                ridx = _DocIndex(remote, legacy_id=legacy, ver=0)
                if frag.startswith("/"):
                    _resolve_pointer(remote, frag)
                elif (effective_id.split("#", 1)[0], frag) \
                        not in ridx.anchors \
                        and frag not in ridx.any_anchor:
                    raise ValueError(
                        f"could not resolve schema reference: "
                        f"{base_uri}#{frag}")
            if effective_id != base_uri:
                _rewrite_ref(doc, ptr,
                             effective_id + (f"#{frag}" if frag else ""))
            bundled[base_uri] = effective_id
            bundled[effective_id] = effective_id
            deferred.append((remote, effective_id))
        for remote, effective_id in deferred:
            embed_all(remote, effective_id)
            container = schema.setdefault(container_kw, {})
            if isinstance(remote, dict):
                _elevate_embedded(remote, container, bundled)
            key = effective_id
            while key in container:
                key += "/x"
            container[key] = remote

    embed_all(schema, default_id or _identify(schema))
    return schema


def strip_identifiers(schema: Any) -> Any:
    """The reference's ``for_editor`` mode (``bundle --without-id``,
    ``vendor/blaze/src/editor/editor.cc``): every reference is resolved
    against the bundled document's frame and rewritten as a plain local
    JSON pointer, then identifier/anchor keywords are dropped — walker-
    gated, so only true schema positions are touched (a property NAMED
    ``$id`` survives)."""
    import copy as _c

    from jsonschema_ray.spec.jschema import (compile_schema,
                                             subschema_positions)

    if not isinstance(schema, dict):
        return schema
    cs = compile_schema(schema)
    doc = _c.deepcopy(schema)
    legacy = _is_legacy_dialect(doc)
    for ptr, node in subschema_positions(doc):
        if not isinstance(node, dict):
            continue
        for kw in ("$ref", "$dynamicRef", "$recursiveRef"):
            v = node.get(kw)
            if not isinstance(v, str):
                continue
            try:
                tgt = cs._ref_target(v, ptr)
            except Exception:   # noqa: BLE001 — unresolvable: keep as-is
                continue
            node["$ref"] = "#" + tgt
            if kw != "$ref":
                del node[kw]
        for kw in ("$id", "$anchor", "$dynamicAnchor", "$recursiveAnchor"):
            node.pop(kw, None)
        if legacy:
            node.pop("id", None)
    return doc
