"""From-scratch JSON Schema (draft 2020-12 subset) evaluator + front-end.

The reference engine's entire input format is a JSON Schema document
(dialects draft4…2020-12; keyword→handler table in
``/root/reference/vendor/blaze/src/compiler/default_compiler.cc:57-640``,
dialect selection ``/root/reference/README.markdown:51-61``). This module
is the Ray-side analog, split in two layers:

1. ``compile_schema(schema)`` — a from-scratch recursive evaluator
   compiled to Python closures ONCE (per driver / per validator actor),
   covering the dynamic keyword families the columnar kernels cannot
   express: object-member iteration (``properties`` /
   ``patternProperties`` / ``additionalProperties`` / ``propertyNames``
   — the ``LoopProperties*`` / ``LoopKeys`` instruction family,
   ``evaluator_instruction.h:86-104``), array iteration (``prefixItems``
   / ``items`` / ``contains`` — ``LoopItems*``), in-place applicators
   (``allOf``/``anyOf``/``oneOf``/``not``/``if-then-else``/
   ``dependentSchemas``), recursion via ``$ref`` into ``$defs``
   (``ControlLabel``/``ControlJump``, ``evaluator_dispatch.h:1523`` —
   here recursion is a late-bound closure, bounded only by data depth),
   embedded ``$id`` resources with true dynamic-scope ``$dynamicRef`` /
   ``$dynamicAnchor`` and 2019-09 ``$recursiveRef`` (the
   ``ControlDynamicAnchorJump`` analog: an eval-time resource stack,
   outermost bookended anchor wins — strict-tree semantics), and
   ``unevaluatedProperties`` / ``unevaluatedItems`` via annotation
   tracking (``evaluator.h:217-258``). This is the batched per-row
   kernel: inside ``map_batches`` an actor parses a JSON payload column
   and runs the compiled closure per document — the ONLY per-row Python
   in the engine, used exactly where dynamic JSON makes vectorization
   impossible (parsing dominates; the closure interprets nothing).

2. ``schema_to_plan(schema)`` — maps the columnar-expressible subset
   onto vectorized CheckPlan predicate rules (``spec/predicates.py``)
   for STRUCTURED rows: top-level ``properties`` become column rules,
   an array-of-struct property (the interleaved ``spans`` column)
   becomes span-scope rules (``prefixItems`` → ``_span_index`` guards,
   ``minItems``/``maxItems`` → ``n_spans`` bounds, ``contains`` →
   contains rules), and a string property declaring
   ``contentMediaType: application/json`` + ``contentSchema`` becomes a
   ``json_schema`` rule evaluated by layer 1.

Semantics follow the published 2020-12 spec: assertions apply only to
instances of their type (``minLength`` on a number is valid);
``properties`` apply only to present members; ``type: "integer"``
matches floats with zero fraction; format is an ANNOTATION by default,
asserting only where ``x-format-assertion: true`` is a sibling or the
``--format-assertion`` flag forces it (reference
``docs/validate.markdown:53-61``). Draft-07 compat: array-form
``items`` is treated as ``prefixItems`` and ``additionalItems`` as
2020-12 ``items``; ``definitions`` as ``$defs``.
"""

from __future__ import annotations

import json
import re
from fractions import Fraction
from typing import Any, Callable

Err = tuple[str, str, str]  # (instance_path, keyword, message)

_ALL = True  # annotation marker: every member/item evaluated


class _Ann:
    """Annotation state for unevaluated* tracking (2020-12 §11)."""

    __slots__ = ("props", "items", "contains")

    def __init__(self):
        self.props: set[str] | bool = set()
        self.items: int | bool = 0        # prefix length evaluated, or ALL
        self.contains: set[int] = set()

    def merge(self, other: "_Ann") -> None:
        if other.props is _ALL:
            self.props = _ALL
        elif self.props is not _ALL:
            self.props |= other.props
        if other.items is _ALL:
            self.items = _ALL
        elif self.items is not _ALL:
            self.items = max(self.items, other.items)
        self.contains |= other.contains


_Fn = Callable[[Any, str], tuple[list[Err], _Ann]]


def _jeq(a: Any, b: Any) -> bool:
    """JSON equality: 1 == 1.0 but true != 1; deep for containers."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_jeq(v, b[k]) for k, v in a.items())
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_jeq(x, y) for x, y in zip(a, b))
    return type(a) is type(b) and a == b


def _ckey(v: Any) -> Any:
    """Hashable canonical key under JSON equality (for uniqueItems)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float)):
        return ("n", Fraction(v))  # exact for both int and float
    if isinstance(v, list):
        return ("a", tuple(_ckey(x) for x in v))
    if isinstance(v, dict):
        return ("o", tuple(sorted((k, _ckey(x)) for k, x in v.items())))
    return ("s" if isinstance(v, str) else "z", v)


def _type_ok(v: Any, t: str) -> bool:
    if t == "null":
        return v is None
    if t == "boolean":
        return isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t == "integer":
        return (isinstance(v, int) and not isinstance(v, bool)) or \
            (isinstance(v, float) and v.is_integer())
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "array":
        return isinstance(v, list)
    if t == "object":
        return isinstance(v, dict)
    return False


def _resolve_pointer(root: Any, pointer: str) -> Any:
    node = root
    if pointer:
        for tok in pointer.lstrip("/").split("/"):
            tok = tok.replace("~1", "/").replace("~0", "~")
            if isinstance(node, list):
                node = node[int(tok)]
            elif isinstance(node, dict) and tok in node:
                node = node[tok]
            else:
                raise KeyError(f"unresolvable $ref pointer: {pointer!r}")
    return node


class _DocIndex:
    """Resource/anchor index of one schema document (2020-12 §8.2):
    embedded ``$id`` subschemas are separate schema RESOURCES with
    their own base URI (resolved against the enclosing base), their own
    anchor namespace, and JSON-pointer fragments relative to their own
    root. Mirrors the reference's frame/registry
    (``vendor/core/src/core/jsonschema``); built once per compile."""

    __slots__ = ("resources", "resource_roots", "anchors", "dyn_anchors",
                 "rec_roots", "any_anchor", "_res_ptrs")

    #: 2019-09+ anchor name production (§8.2.2)
    _ANCHOR_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9._-]*$")

    def __init__(self, schema: Any, legacy_id: bool = False,
                 ver: int = 2020):
        """``ver`` is the most permissive dialect version in play
        (root + pre-imported resources): modern-only strictness
        ($id fragments are illegal 2019-09+, but draft-6/7 spell
        anchors as ``$id: "#name"``) gates on it."""
        from urllib.parse import urljoin

        self.resources: dict[str, str] = {}      # uri -> document ptr
        self.resource_roots: dict[str, str] = {}  # ptr -> uri
        self.anchors: dict[tuple[str, str], str] = {}
        self.dyn_anchors: dict[tuple[str, str], str] = {}
        self.rec_roots: set[str] = set()          # $recursiveAnchor: true
        self.any_anchor: dict[str, str] = {}      # legacy fallback

        def ident_of(node: dict) -> Any:
            """Resource identifier: ``$id``; legacy drafts (3/4) used
            ``id`` (reference resolver accepts both per dialect)."""
            nid = node.get("$id")
            if nid is None and legacy_id:
                nid = node.get("id")
            return nid

        root_base = ""
        if isinstance(schema, dict):
            rid = ident_of(schema)
            if isinstance(rid, str):
                if any(c.isspace() for c in rid):
                    from jsonschema_ray.spec.clierrors import \
                        SchemaKeywordError

                    raise SchemaKeywordError(
                        "The identifier is not a valid URI",
                        value=rid, keyword="$id")
                if ver >= 2019 and "#" in rid and rid.split("#", 1)[1]:
                    raise ValueError(
                        f"$id must not contain a fragment: {rid!r}")
                root_base = rid.split("#", 1)[0]
            elif rid is not None and not isinstance(rid, (dict, list)):
                from jsonschema_ray.spec.clierrors import SchemaKeywordError

                raise SchemaKeywordError(
                    "The schema identifier is invalid",
                    value=json.dumps(rid) if not isinstance(rid, str)
                    else rid, keyword="$id")
        self.resources[root_base] = ""
        self.resource_roots[""] = root_base

        def walk(node: Any, ptr: str, base: str) -> None:
            if isinstance(node, dict):
                nid = ident_of(node)
                if ptr and isinstance(nid, str):
                    if any(c.isspace() for c in nid):
                        raise ValueError(
                            f"invalid $id (not a URI) at {ptr!r}: {nid!r}")
                    if ver >= 2019 and "#" in nid \
                            and nid.split("#", 1)[1] != "":
                        # 2019-09 §8.2.1: $id must not contain a
                        # non-empty fragment (draft-6/7 anchors spelled
                        # as $id:"#name" are gated out by ver)
                        raise ValueError(
                            f"$id must not contain a fragment at "
                            f"{ptr!r}: {nid!r}")
                    uri = urljoin(base or "", nid.split("#", 1)[0])
                    prev_r = self.resources.get(uri)
                    if prev_r is not None and prev_r != ptr:
                        raise ValueError(
                            f"duplicate schema resource id {uri!r} at "
                            f"{prev_r!r} and {ptr!r}")
                    self.resources.setdefault(uri, ptr)
                    self.resource_roots.setdefault(ptr, uri)
                    base = uri
                elif ptr and nid is not None \
                        and not isinstance(nid, (dict, list)):
                    # dict/list values are properties-map entries named
                    # "$id", not the keyword; scalars are plain invalid
                    raise ValueError(
                        f"invalid $id (must be a string) at {ptr!r}: {nid!r}")
                ds_ = node.get("$schema")
                if ds_ is not None and not isinstance(ds_, (str, dict,
                                                            list)):
                    raise ValueError(
                        f"invalid $schema (must be a string) at {ptr!r}: "
                        f"{ds_!r}")
                rr = node.get("$recursiveRef")
                if isinstance(rr, str) and rr != "#":
                    # 2019-09 §8.2.4.2: the only legal value is "#"
                    # (reference rejects at frame time, exit 4)
                    from jsonschema_ray.spec.clierrors import (
                        EXIT_SCHEMA_INPUT, CLIError as _CE)

                    _err = _CE("Invalid recursive reference",
                               identifier=(base if "://" in (base or "")
                                           else None),
                               location=f"{ptr}/$recursiveRef")
                    _err.exit_code = EXIT_SCHEMA_INPUT
                    raise _err
                if rr is not None and not isinstance(rr, (str, dict, list)):
                    raise ValueError(
                        f"invalid $recursiveRef type at {ptr!r}: {rr!r}")
                ra = node.get("$recursiveAnchor")
                if ra is not None and not isinstance(ra, (bool, dict, list)):
                    raise ValueError(
                        f"invalid $recursiveAnchor (must be boolean) at "
                        f"{ptr!r}: {ra!r}")
                for key in ("$anchor", "$dynamicAnchor"):
                    a = node.get(key)
                    if isinstance(a, str):
                        if not _DocIndex._ANCHOR_RE.match(a):
                            raise ValueError(
                                f"invalid {key} name at {ptr!r}: {a!r}")
                        prev = self.anchors.get((base, a))
                        if prev is not None and prev != ptr:
                            # same anchor declared twice in ONE resource
                            # (fail_anchor_collision.sh semantics)
                            from jsonschema_ray.spec.clierrors import \
                                SchemaAnchorCollisionError

                            raise SchemaAnchorCollisionError(
                                f"{base}#{a}", location=ptr,
                                otherLocation=prev)
                        self.anchors.setdefault((base, a), ptr)
                        self.any_anchor.setdefault(a, ptr)
                        if key == "$dynamicAnchor":
                            self.dyn_anchors.setdefault((base, a), ptr)
                if node.get("$recursiveAnchor") is True:
                    self.rec_roots.add(base)
                for k, v in node.items():
                    if k in ("enum", "const"):  # instance data, not schema
                        continue
                    walk(v, f"{ptr}/{k.replace('~', '~0').replace('/', '~1')}",
                         base)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    walk(v, f"{ptr}/{i}", base)

        walk(schema, "", root_base)
        self._res_ptrs = sorted(self.resource_roots, key=len, reverse=True)

    def enclosing(self, ptr: str) -> str:
        """Base URI of the innermost resource containing ``ptr``."""
        for rp in self._res_ptrs:
            if ptr == rp or ptr.startswith(rp + "/") or rp == "":
                return self.resource_roots[rp]
        return self.resource_roots[""]

    def enclosing_chain(self, ptr: str) -> list[str]:
        """URIs of every resource enclosing ``ptr``, outermost first."""
        out = [self.resource_roots[rp] for rp in self._res_ptrs
               if ptr == rp or ptr.startswith(rp + "/") or rp == ""]
        return out[::-1]


def resolve_ref_target(idx: _DocIndex, ref: str, from_ptr: str = "") -> str:
    """Resolve a ``$ref`` URI-reference to a DOCUMENT pointer:
    against the referrer's base URI (innermost enclosing ``$id``
    resource), with pointer fragments relative to the target
    RESOURCE root and plain fragments looked up in that resource's
    anchor namespace (2020-12 §8.2; reference frame registry)."""
    uri_part, _, frag = ref.partition("#")
    base = idx.enclosing(from_ptr)
    if uri_part:
        from urllib.parse import urljoin

        target = urljoin(base or "", uri_part)
        if target not in idx.resources:
            raise ValueError(
                f"external $ref not supported (no network): {ref!r}")
        res_uri, res_ptr = target, idx.resources[target]
    else:
        res_uri, res_ptr = base, idx.resources.get(base, "")
    if frag == "":
        return res_ptr
    if frag.startswith("/"):
        return res_ptr + frag
    ptr = idx.anchors.get((res_uri, frag))
    if ptr is None:  # legacy fallback: anchor from any resource
        ptr = idx.any_anchor.get(frag)
    if ptr is None:
        from jsonschema_ray.spec.clierrors import EXIT_SCHEMA_INPUT
        from jsonschema_ray.spec.clierrors import CLIError as _CE

        _err = _CE("Could not resolve schema reference",
                   identifier=ref,
                   location=f"{from_ptr}/$ref")
        _err.exit_code = EXIT_SCHEMA_INPUT
        raise _err
    return ptr


# Keyword → (shape, min_ver, max_ver): which keyword VALUES are schema
# positions per dialect, mirroring the reference's per-vocabulary walker
# (vendor/blaze/src/foundation/known_walker.cc — e.g. handle_dollar_defs
# is 2019-09+/2020-12-only, handle_definitions spans every draft).
# Shapes: "schema" value is a subschema; "list" array of subschemas;
# "map" object whose member values are subschemas; "items" schema-or-
# array-of-schemas (array form removed in 2020-12).
_SUBSCHEMA_KW: dict[str, tuple[str, int, int]] = {
    "properties": ("map", 3, 9999),
    "patternProperties": ("map", 3, 9999),
    "definitions": ("map", 3, 9999),
    "$defs": ("map", 2019, 9999),
    "dependentSchemas": ("map", 2019, 9999),
    "dependencies": ("map", 3, 7),
    "additionalProperties": ("schema", 3, 9999),
    "additionalItems": ("schema", 3, 2019),
    "not": ("schema", 4, 9999),
    "propertyNames": ("schema", 6, 9999),
    "contains": ("schema", 6, 9999),
    "if": ("schema", 7, 9999),
    "then": ("schema", 7, 9999),
    "else": ("schema", 7, 9999),
    "unevaluatedProperties": ("schema", 2019, 9999),
    "unevaluatedItems": ("schema", 2019, 9999),
    "contentSchema": ("schema", 2019, 9999),
    "items": ("items", 3, 9999),
    "prefixItems": ("list", 2020, 9999),
    "allOf": ("list", 4, 9999),
    "anyOf": ("list", 4, 9999),
    "oneOf": ("list", 4, 9999),
    "extends": ("items", 3, 3),
    "disallow": ("list", 3, 3),
}


def check_pointer_frames(doc_root: Any, res_ptr: str, frag: str,
                         default_ver: int, base_uri: str = "",
                         from_ptr: str = "") -> None:
    """Dialect-aware ``$ref``-target framing: a JSON-pointer fragment
    must traverse only schema positions under the target resource's
    dialect, else the ref target "is not considered to be a valid
    subschema" (reference CompilerReferenceTargetNotSchemaError,
    vendor/blaze/src/compiler/compile.cc:428-449 — e.g. ``#/$defs/x``
    is invalid under draft-7, refs through unknown keywords are
    invalid everywhere)."""
    node = _resolve_pointer(doc_root, res_ptr)
    ver = default_ver
    if isinstance(node, dict) and isinstance(node.get("$schema"), str):
        ver = _dialect_ver(node)
    toks = [t.replace("~1", "/").replace("~0", "~")
            for t in frag.lstrip("/").split("/")]
    i = 0
    while i < len(toks):
        if not isinstance(node, dict):
            raise ValueError(
                f"$ref pointer {frag!r} traverses a non-schema position "
                f"at {toks[i]!r}")
        kw = toks[i]
        if kw not in node:
            from jsonschema_ray.spec.clierrors import (
                EXIT_SCHEMA_INPUT, CLIError as _CE)

            ident = (f"{base_uri}#{frag}" if "://" in base_uri
                     else f"#{frag}")
            _err = _CE("Could not resolve schema reference",
                       identifier=ident,
                       location=f"{from_ptr}/$ref")
            _err.exit_code = EXIT_SCHEMA_INPUT
            raise _err
        spec = _SUBSCHEMA_KW.get(kw)
        if spec is None or not (spec[1] <= ver <= spec[2]):
            from jsonschema_ray.spec.clierrors import SchemaReferenceError

            loc = "".join(
                "/" + t.replace("~", "~0").replace("/", "~1")
                for t in toks[:i + 1])
            ident = (f"{base_uri}#{frag}" if "://" in base_uri
                     else f"#{frag}")
            err = SchemaReferenceError(ident, loc)
            if kw == "$defs" and ver <= 7:
                err.hint = ("Maybe you meant to use `definitions` "
                            "instead of `$defs` in this dialect?")
            elif kw == "definitions" and ver >= 2019:
                err.hint = ("Maybe you meant to use `$defs` instead of "
                            "`definitions` in this dialect?")
            raise err
        shape = spec[0]
        val = node.get(kw)
        if shape == "items":
            shape = "list" if isinstance(val, list) and ver < 2020 \
                else "schema"
        if shape == "schema":
            node = val
            i += 1
        else:           # "list" / "map": one more token selects the member
            if i + 1 >= len(toks):
                raise ValueError(
                    f"$ref pointer {frag!r} stops at the {kw!r} container, "
                    f"not a subschema")
            sel = toks[i + 1]
            if isinstance(val, list):
                node = val[int(sel)] if sel.isdigit() \
                    and int(sel) < len(val) else None
            elif isinstance(val, dict):
                node = val.get(sel)
            else:
                node = None
            i += 2
        if node is None:
            raise KeyError(f"unresolvable $ref pointer: {frag!r}")
        # crossing into an embedded resource re-frames the dialect
        if isinstance(node, dict) and isinstance(node.get("$schema"), str):
            ver = _dialect_ver(node)
    if not isinstance(node, (dict, bool)):
        raise ValueError(
            f"$ref pointer {frag!r} resolves to a non-schema value")


def _is_legacy_dialect(schema: Any) -> bool:
    """draft-03/04 declared resources with ``id`` rather than ``$id``."""
    if not isinstance(schema, dict):
        return False
    ds = schema.get("$schema")
    return isinstance(ds, str) and ("draft-04" in ds or "draft-03" in ds)


def _dialect_ver(schema: Any) -> int:
    """3/4/6/7/2019/2020 from ``$schema`` (2020 when undeclared)."""
    ds = schema.get("$schema") if isinstance(schema, dict) else None
    if not isinstance(ds, str):
        return 2020
    for tag, v in (("2020-12", 2020), ("2019-09", 2019), ("draft-07", 7),
                   ("draft-06", 6), ("draft-04", 4), ("draft-03", 3)):
        if tag in ds:
            return v
    return 2020


def _check_dialect(schema: dict, resources: dict,
                   idx: "_DocIndex | None" = None,
                   root: Any = None) -> None:
    """``$schema`` sanity (reference exit-4 semantics,
    ``fail_schema_unknown_dialect.sh`` / ``fail_invalid_schema_uri.sh`` /
    ``fail_resolve_missing_core_vocabulary.sh``): must be an absolute
    URI; either a known standard dialect, or a custom metaschema found
    in ``resources`` / embedded in the compiled document (``idx``)
    that declares the core vocabulary."""
    ds = schema.get("$schema")
    if ds is None:
        return
    if not isinstance(ds, str) or "://" not in ds:
        if isinstance(ds, str) and ds and not any(
                c.isspace() for c in ds):
            # a well-formed RELATIVE reference is a different spec
            # violation than a malformed URI (reference
            # SchemaRelativeMetaschemaResolutionError)
            from jsonschema_ray.spec.clierrors import \
                SchemaRelativeMetaschemaError

            raise SchemaRelativeMetaschemaError(ds)
        from jsonschema_ray.spec.clierrors import SchemaKeywordError

        raise SchemaKeywordError(
            "The dialect is not a valid URI",
            value=ds if isinstance(ds, str) else json.dumps(ds),
            keyword="$schema")
    norm = ds.rstrip("#").rstrip("/")
    if norm in CompiledSchema.KNOWN_DIALECTS:
        return
    if norm.startswith("https://spec.openapis.org/oas/"):
        return   # OpenAPI 3.1+ dialects (2020-12 + OAS vocabulary)
    meta = resources.get(ds) or resources.get(norm)
    if meta is None:
        for doc in resources.values():
            if isinstance(doc, dict):
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str) and did.rstrip("#") == norm:
                    meta = doc
                    break
    if meta is None and idx is not None and root is not None:
        ptr = idx.resources.get(norm)
        if ptr is not None:
            meta = _resolve_pointer(root, ptr)
    if meta is None:
        from jsonschema_ray.spec.clierrors import SchemaResolutionError

        raise SchemaResolutionError(ds)
    vocab = meta.get("$vocabulary") if isinstance(meta, dict) else None
    if isinstance(vocab, dict):
        core = [u for u in vocab
                if u.rstrip("#").endswith("/vocab/core")]
        if not core:
            from jsonschema_ray.spec.clierrors import (
                EXIT_SCHEMA_INPUT, CLIError as _CE)

            _e = _CE("The core vocabulary must always be present")
            _e.exit_code = EXIT_SCHEMA_INPUT
            # which document's dialect chain broke — the CLI maps this
            # back to the right --resolve file for the filePath field
            _e._offending_id = schema.get("$id") or schema.get("id")
            raise _e


class CompiledSchema:
    """A schema compiled to closures. Build once (driver or actor
    ``__init__``); ``validate``/``is_valid`` are the per-row hot path.

    NOT thread-safe: dynamic-scope resolution (``$dynamicRef`` /
    ``$recursiveRef``) keeps a per-evaluation resource stack on the
    instance — matches the engine's usage (one instance at a time per
    validator actor / per driver call)."""

    #: dialect URIs this engine compiles (sans trailing "#")
    KNOWN_DIALECTS = frozenset({
        "https://json-schema.org/draft/2020-12/schema",
        "http://json-schema.org/draft/2020-12/schema",
        "https://json-schema.org/draft/2019-09/schema",
        "http://json-schema.org/draft/2019-09/schema",
        "http://json-schema.org/draft-07/schema",
        "https://json-schema.org/draft-07/schema",
        "http://json-schema.org/draft-06/schema",
        "https://json-schema.org/draft-06/schema",
        "http://json-schema.org/draft-04/schema",
        "https://json-schema.org/draft-04/schema",
        "http://json-schema.org/draft-03/schema",
        "https://json-schema.org/draft-03/schema",
    })

    def __init__(self, schema: Any, *, assert_formats: bool | None = None,
                 entrypoint: str = "", resources: dict | None = None):
        """``entrypoint``: JSON pointer into the document to compile as
        the validation root (the reference's ``--entrypoint``/IdentifyA
        flow, ``test/validate/fail_entrypoint_*.sh``) — ``$ref``s still
        resolve against the WHOLE document.

        ``assert_formats`` mirrors the reference's format handling
        (``docs/validate.markdown:53-61``): ``None`` (default) treats
        ``format`` as annotation EXCEPT where a sibling
        ``x-format-assertion: true`` opts that location in; ``True``
        forces every format to assert (the ``--format-assertion``/-F
        flag); ``False`` never asserts.

        ``resources``: external schema registry (the reference's
        ``--resolve`` pre-import, ``src/resolver.h``): {uri-or-path:
        schema doc}. Each resource is mounted under ``$defs`` so its
        declared ``$id``/legacy ``id`` registers as a resource base,
        and the supplied key itself resolves verbatim (path-style
        ``$ref`` without identifiers, ``pass_no_identifier_ref.sh``)."""
        ext_keys: dict[str, str] = {}
        legacy = _is_legacy_dialect(schema)
        ver = self._root_ver = _dialect_ver(schema)
        # Draft ≤7: a top-level `$ref` makes the document a "reference
        # object" whose siblings (identifiers, $schema, definitions) are
        # all ignored — the reference refuses to identify/bundle such a
        # root (SchemaReferenceObjectResourceError,
        # vendor/blaze/src/foundation/foundation.cc:229, exit 4)
        if isinstance(schema, dict) and "$ref" in schema and ver <= 7 \
                and isinstance(schema.get("$schema"), str):
            from jsonschema_ray.spec.clierrors import (
                EXIT_SCHEMA_INPUT, CLIError as _CE)

            _ident = schema.get("$id") or schema.get("id")
            _err = _CE(
                "A schema with a top-level `$ref` in JSON Schema Draft "
                "7 and older dialects ignores every sibling keywords "
                "(like identifiers and meta-schema declarations) and "
                "therefore many operations, like bundling, are not "
                "possible without undefined behavior",
                identifier=_ident if isinstance(_ident, str) else None)
            _err.exit_code = EXIT_SCHEMA_INPUT
            raise _err
        for _doc in (resources or {}).values():
            ver = min(ver, _dialect_ver(_doc))
        if resources and isinstance(schema, dict):
            mounted = dict(schema)
            defs = dict(mounted.get("$defs") or {})
            seen: list[tuple[int, str]] = []   # (id(doc), mount ptr)

            # $ids already DECLARED inside the document (e.g. a bundled
            # schema re-checked with the same --resolve imports) must
            # not be mounted again — they'd collide as duplicate
            # resources (pass_resolve_metaschema.sh fmt --check flow)
            declared_ids: set[str] = set()

            def _scan_ids(node) -> None:
                if isinstance(node, dict):
                    for idk in ("$id", "id"):
                        vid = node.get(idk)
                        if isinstance(vid, str):
                            declared_ids.add(vid.rstrip("#"))
                    for v in node.values():
                        _scan_ids(v)
                elif isinstance(node, list):
                    for v in node:
                        _scan_ids(v)

            _scan_ids(schema)
            for i, (key, doc) in enumerate(resources.items()):
                if isinstance(doc, dict):
                    did = doc.get("$id") or doc.get("id")
                    if isinstance(did, str) \
                            and did.rstrip("#") in declared_ids \
                            and not (doc is schema or doc == schema):
                        ext_keys[key] = ""
                        continue
                if doc is schema or doc == schema:
                    # the root itself pre-imported (test/bundle flows
                    # resolve the entry schema by its own URI): no
                    # mount — it would duplicate the root resource $id
                    ext_keys[key] = ""
                    continue
                dup = next((p for oid, p in seen if oid == id(doc)), None)
                if dup is not None:    # same doc under an alias key:
                    ext_keys[key] = dup  # one mount, several names
                    continue
                name = f"__external_{i}"
                defs[name] = doc
                ext_keys[key] = f"/$defs/{name}"
                seen.append((id(doc), f"/$defs/{name}"))
                legacy = legacy or _is_legacy_dialect(doc)
            mounted["$defs"] = defs
            schema = mounted
        self.schema = schema
        if assert_formats is None and isinstance(schema, dict) \
                and isinstance(schema.get("$schema"), str):
            # a custom metaschema declaring the format-assertion
            # vocabulary opts the whole schema into asserting formats
            # (2020-12 §7.2; reference pass_format_assertion.sh)
            ds0 = schema["$schema"].rstrip("#")
            meta = None
            for key, doc in (resources or {}).items():
                if not isinstance(doc, dict):
                    continue
                did = doc.get("$id") or doc.get("id")
                if key.rstrip("#") == ds0 or (isinstance(did, str)
                                              and did.rstrip("#") == ds0):
                    meta = doc
                    break
            vocab = (meta or {}).get("$vocabulary")
            if isinstance(vocab, dict) and any(
                    u.rstrip("#").endswith("/vocab/format-assertion")
                    and on for u, on in vocab.items()):
                assert_formats = True
        self._assert_formats = assert_formats
        self._cache: dict[str, _Fn] = {}
        self._idx = _DocIndex(schema, legacy_id=legacy, ver=ver)
        for key, ptr in ext_keys.items():
            self._idx.resources.setdefault(key, ptr)
        if isinstance(schema, dict):
            _check_dialect(schema, resources or {}, self._idx, schema)
            # the reference validates every pre-imported schema's own
            # dialect chain eagerly (fail_resolve_unknown_dialect.sh,
            # fail_resolve_missing_core_vocabulary.sh)
            for doc in (resources or {}).values():
                if isinstance(doc, dict):
                    _check_dialect(doc, resources or {}, self._idx, schema)
        if entrypoint and not (entrypoint.startswith("#")
                               or entrypoint.startswith("/")):
            # URI-form entrypoint (pass_entrypoint_uri.sh): resolve it
            # like a $ref against the document's resource registry
            root_ptr = resolve_ref_target(self._idx, entrypoint)
        else:
            root_ptr = entrypoint.lstrip("#") if entrypoint else ""
        # dynamic scope: resources enclosing the compile root, outermost
        # first, EXCLUDING the root node itself when it is a resource
        # root (its own boundary wrapper pushes it at eval time)
        chain = self._idx.enclosing_chain(root_ptr)
        if root_ptr in self._idx.resource_roots and chain:
            chain = chain[:-1]
        self._dstack0: list[str] = chain
        self._dstack: list[str] = list(chain)
        if entrypoint:
            self._fn = self._compile(_resolve_pointer(schema, root_ptr),
                                     root_ptr)
        else:
            self._fn = self._compile(schema, "")

    # -- public ---------------------------------------------------------
    def validate(self, value: Any, path: str = "") -> list[Err]:
        self._dstack = list(self._dstack0)  # fresh dynamic scope per doc
        try:
            return self._fn(value, path)[0]
        except RecursionError:
            # each instance nesting level costs ~8 evaluator frames; the
            # default 1000-frame limit caps documents at depth ~120.
            # Raise the limit LAZILY — only when a deep document actually
            # appears (keeps library import/compile side-effect-free) —
            # and retry once; past ~depth-5000 report a maxDepth
            # violation rather than crash the worker.
            import sys

            if sys.getrecursionlimit() < 40_000:
                sys.setrecursionlimit(40_000)
                try:
                    self._dstack = list(self._dstack0)
                    return self._fn(value, path)[0]
                except RecursionError:
                    pass
            return [(path, "maxDepth",
                     "instance nesting exceeds evaluator depth")]

    def is_valid(self, value: Any) -> bool:
        return not self.validate(value)

    # -- compilation ----------------------------------------------------
    def _ref_target(self, ref: str, from_ptr: str = "") -> str:
        ptr = resolve_ref_target(self._idx, ref, from_ptr)
        frag = ref.partition("#")[2]
        if frag.startswith("/"):
            # resolve_ref_target returns resource_ptr + frag; strip the
            # fragment back off to find the resource root to walk from
            res_ptr = ptr[:len(ptr) - len(frag)]
            uri_part = ref.partition("#")[0]
            base = self._idx.enclosing(from_ptr)
            if uri_part:
                from urllib.parse import urljoin

                base = urljoin(base or "", uri_part)
            check_pointer_frames(self.schema, res_ptr, frag,
                                 self._root_ver, base_uri=base or "",
                                 from_ptr=from_ptr)
        return ptr

    def _fn_for_ptr(self, ptr: str) -> _Fn:
        """Late-bound compile by canonical pointer — a self-referential
        schema compiles to a closure that calls back into itself; data
        depth, not schema shape, bounds the recursion (the analog of the
        reference's ControlJump label machine, evaluator_dispatch.h:1523)."""
        if ptr in self._cache:
            return self._cache[ptr]
        slot: dict[str, _Fn] = {}

        def thunk(v: Any, path: str):
            return slot["fn"](v, path)

        self._cache[ptr] = thunk
        slot["fn"] = self._compile(_resolve_pointer(self.schema, ptr), ptr,
                                   _no_cache=True)
        return thunk

    def _compile_ref(self, ref: str, from_ptr: str = "") -> _Fn:
        try:
            return self._fn_for_ptr(self._ref_target(ref, from_ptr))
        except ValueError:
            # a $ref to an OFFICIAL dialect URI resolves to the built-in
            # self-hosted metaschema (the reference ships the official
            # metaschemas in its resolver; pass_resolver_official_schema)
            base = ref.partition("#")[0].rstrip("/")
            if base.startswith(("https://json-schema.org/",
                                "http://json-schema.org/")):
                meta = _official_metaschema_validator()
                return lambda v, path: meta(v, path)
            raise

    def _compile(self, sch: Any, ptr: str, _no_cache: bool = False) -> _Fn:
        if not _no_cache and ptr in self._cache:
            return self._cache[ptr]

        if sch is True or sch == {}:
            fn = lambda v, path: ([], _Ann())  # noqa: E731
        elif sch is False:
            fn = lambda v, path: (  # noqa: E731
                [(path, "false", "schema is false: nothing is valid")], _Ann())
        elif isinstance(sch, dict):
            fn = self._compile_object_schema(sch, ptr)
        else:
            raise ValueError(f"schema must be a dict or bool, got {type(sch)}")
        if ptr in self._idx.resource_roots:
            # resource boundary: entering this subschema pushes its URI
            # onto the dynamic scope (outermost-first search target for
            # $dynamicRef/$recursiveRef — ControlDynamicAnchorJump analog)
            uri, inner = self._idx.resource_roots[ptr], fn

            def fn(v: Any, path: str, _inner=inner, _uri=uri):
                self._dstack.append(_uri)
                try:
                    return _inner(v, path)
                finally:
                    self._dstack.pop()
        if not _no_cache:
            self._cache[ptr] = fn
        return fn

    def _compile_object_schema(self, sch: dict, ptr: str) -> _Fn:
        checks: list[Callable[[Any, str, list[Err], _Ann], None]] = []
        sub = lambda key: self._compile(sch[key], f"{ptr}/{key}")  # noqa: E731

        # ---- $ref (2020-12: composes with sibling keywords) ----
        if "$ref" in sch:
            reffn = self._compile_ref(sch["$ref"], ptr)
            def c_ref(v, path, errs, ann, reffn=reffn):
                e, a = reffn(v, path)
                errs.extend(e)
                if not e:
                    ann.merge(a)
            checks.append(c_ref)
        if "$dynamicRef" in sch:
            # 2020-12 dynamic scope: when the lexical target BOOKENDS
            # (declares $dynamicAnchor of the same name), re-resolve at
            # eval time to the OUTERMOST resource in the dynamic scope
            # declaring that anchor; otherwise behave as plain $ref
            ref = sch["$dynamicRef"]
            lex_ptr = self._ref_target(ref, ptr)
            lexfn = self._fn_for_ptr(lex_ptr)
            frag = ref.partition("#")[2]
            name = frag if frag and not frag.startswith("/") else None
            lex_node = _resolve_pointer(self.schema, lex_ptr)
            bookended = (name is not None and isinstance(lex_node, dict)
                         and lex_node.get("$dynamicAnchor") == name)
            if bookended:
                def c_dref(v, path, errs, ann, name=name, lexfn=lexfn):
                    fn = lexfn
                    for uri in self._dstack:  # outermost-first
                        tp = self._idx.dyn_anchors.get((uri, name))
                        if tp is not None:
                            fn = self._fn_for_ptr(tp)
                            break
                    e, a = fn(v, path)
                    errs.extend(e)
                    if not e:
                        ann.merge(a)
            else:
                def c_dref(v, path, errs, ann, lexfn=lexfn):
                    e, a = lexfn(v, path)
                    errs.extend(e)
                    if not e:
                        ann.merge(a)
            checks.append(c_dref)
        if "$recursiveRef" in sch:  # 2019-09 (value is always "#")
            res_uri = self._idx.enclosing(ptr)
            lexfn = self._fn_for_ptr(self._idx.resources.get(res_uri, ""))
            if res_uri in self._idx.rec_roots:
                def c_rref(v, path, errs, ann, lexfn=lexfn):
                    fn = lexfn
                    for uri in self._dstack:  # outermost-first
                        if uri in self._idx.rec_roots:
                            fn = self._fn_for_ptr(self._idx.resources[uri])
                            break
                    e, a = fn(v, path)
                    errs.extend(e)
                    if not e:
                        ann.merge(a)
            else:
                def c_rref(v, path, errs, ann, lexfn=lexfn):
                    e, a = lexfn(v, path)
                    errs.extend(e)
                    if not e:
                        ann.merge(a)
            checks.append(c_rref)

        # ---- type / enum / const ----
        if "type" in sch:
            ts = sch["type"] if isinstance(sch["type"], list) else [sch["type"]]
            def c_type(v, path, errs, ann, ts=tuple(ts)):
                if not any(_type_ok(v, t) for t in ts):
                    errs.append((path, "type",
                                 f"expected {'/'.join(ts)}"))
            checks.append(c_type)
        if "enum" in sch:
            vals = sch["enum"]
            def c_enum(v, path, errs, ann, vals=vals):
                if not any(_jeq(v, x) for x in vals):
                    errs.append((path, "enum", "value not in enum"))
            checks.append(c_enum)
        if "const" in sch:
            cv = sch["const"]
            def c_const(v, path, errs, ann, cv=cv):
                if not _jeq(v, cv):
                    errs.append((path, "const", "value != const"))
            checks.append(c_const)

        # ---- numeric ----
        # draft-04 compat: boolean exclusiveMinimum/Maximum flip the
        # minimum/maximum comparison instead of carrying their own bound
        _min_op = "gt" if sch.get("exclusiveMinimum") is True else "ge"
        _max_op = "lt" if sch.get("exclusiveMaximum") is True else "le"
        for kw, op in (("minimum", _min_op), ("maximum", _max_op),
                       ("exclusiveMinimum", "gt"), ("exclusiveMaximum", "lt")):
            if kw in sch and isinstance(sch[kw], (int, float)) \
                    and not isinstance(sch[kw], bool):
                bound = sch[kw]
                def c_num(v, path, errs, ann, kw=kw, op=op, bound=bound):
                    if isinstance(v, (int, float)) and not isinstance(v, bool):
                        ok = {"ge": v >= bound, "le": v <= bound,
                              "gt": v > bound, "lt": v < bound}[op]
                        if not ok:
                            errs.append((path, kw, f"violates {kw} {bound}"))
                checks.append(c_num)
        if "multipleOf" in sch:
            by = sch["multipleOf"]
            def c_mult(v, path, errs, ann, by=by):
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    try:
                        q = v / by
                    except ZeroDivisionError:
                        errs.append((path, "multipleOf", "multipleOf 0"))
                        return
                    import math
                    if not math.isfinite(q) or not math.isclose(
                            q, round(q), rel_tol=0.0, abs_tol=1e-9):
                        errs.append((path, "multipleOf",
                                     f"not a multiple of {by}"))
            checks.append(c_mult)

        # ---- string ----
        if "minLength" in sch or "maxLength" in sch:
            lo, hi = sch.get("minLength"), sch.get("maxLength")
            def c_len(v, path, errs, ann, lo=lo, hi=hi):
                if isinstance(v, str):
                    n = len(v)
                    if lo is not None and n < lo:
                        errs.append((path, "minLength", f"length {n} < {lo}"))
                    if hi is not None and n > hi:
                        errs.append((path, "maxLength", f"length {n} > {hi}"))
            checks.append(c_len)
        if "pattern" in sch:
            from jsonschema_ray.spec.ecmaregex import ecma_compile
            # SEARCH semantics per spec; ECMA/PCRE2-faithful compile
            # (DOTALL, DOLLAR_ENDONLY, \p classes — spec/ecmaregex.py)
            rx = ecma_compile(sch["pattern"])
            def c_pat(v, path, errs, ann, rx=rx):
                if isinstance(v, str) and rx.search(v) is None:
                    errs.append((path, "pattern",
                                 f"does not match {rx.pattern!r}"))
            checks.append(c_pat)
        if "format" in sch and (
                self._assert_formats is True
                or (self._assert_formats is None
                    and sch.get("x-format-assertion") is True)):
            from jsonschema_ray.functions.formats import (
                PYTHON_FORMATS, REGEX_FORMATS, check_format_value)
            fmt = sch["format"]
            if fmt == "regex" or fmt in REGEX_FORMATS or fmt in PYTHON_FORMATS:
                def c_fmt(v, path, errs, ann, fmt=fmt):
                    if isinstance(v, str) and not check_format_value(v, fmt):
                        errs.append((path, "format", f"not a valid {fmt}"))
                checks.append(c_fmt)
            # unknown format → annotation only (spec-conformant)

        # ---- object ----
        if "required" in sch:
            req = sch["required"]
            def c_req(v, path, errs, ann, req=tuple(req)):
                if isinstance(v, dict):
                    for k in req:
                        if k not in v:
                            errs.append((path, "required",
                                         f"missing property {k!r}"))
            checks.append(c_req)
        if "dependentRequired" in sch:
            deps = {k: tuple(v) for k, v in sch["dependentRequired"].items()}
            def c_depreq(v, path, errs, ann, deps=deps):
                if isinstance(v, dict):
                    for k, need in deps.items():
                        if k in v:
                            for n in need:
                                if n not in v:
                                    errs.append(
                                        (path, "dependentRequired",
                                         f"{k!r} requires {n!r}"))
            checks.append(c_depreq)
        if "minProperties" in sch or "maxProperties" in sch:
            lo, hi = sch.get("minProperties"), sch.get("maxProperties")
            def c_nprops(v, path, errs, ann, lo=lo, hi=hi):
                if isinstance(v, dict):
                    n = len(v)
                    if lo is not None and n < lo:
                        errs.append((path, "minProperties", f"{n} < {lo}"))
                    if hi is not None and n > hi:
                        errs.append((path, "maxProperties", f"{n} > {hi}"))
            checks.append(c_nprops)

        props = {k: self._compile(s, f"{ptr}/properties/{k}")
                 for k, s in sch.get("properties", {}).items()}
        from jsonschema_ray.spec.ecmaregex import ecma_compile
        pprops = [(ecma_compile(p), self._compile(s, f"{ptr}/patternProperties/{p}"))
                  for p, s in sch.get("patternProperties", {}).items()]
        addl = self._compile(sch["additionalProperties"],
                             f"{ptr}/additionalProperties") \
            if "additionalProperties" in sch else None
        pnames = self._compile(sch["propertyNames"], f"{ptr}/propertyNames") \
            if "propertyNames" in sch else None
        if props or pprops or addl is not None or pnames is not None:
            # the LoopProperties*/LoopKeys analog: one fused member loop
            def c_members(v, path, errs, ann, props=props, pprops=pprops,
                          addl=addl, pnames=pnames):
                if not isinstance(v, dict):
                    return
                for k, mv in v.items():
                    mpath = f"{path}/{k}"
                    hit = False
                    pfn = props.get(k)
                    if pfn is not None:
                        hit = True
                        errs.extend(pfn(mv, mpath)[0])
                    for rx, fn in pprops:
                        if rx.search(k):
                            hit = True
                            errs.extend(fn(mv, mpath)[0])
                    if hit:
                        if ann.props is not _ALL:
                            ann.props.add(k)
                    elif addl is not None:
                        errs.extend(addl(mv, mpath)[0])
                        if ann.props is not _ALL:
                            ann.props.add(k)
                    if pnames is not None:
                        e = pnames(k, mpath)[0]
                        if e:
                            errs.append((mpath, "propertyNames",
                                         f"property name {k!r} invalid"))
            checks.append(c_members)

        if "dependentSchemas" in sch:
            dsch = {k: self._compile(s, f"{ptr}/dependentSchemas/{k}")
                    for k, s in sch["dependentSchemas"].items()}
            def c_dsch(v, path, errs, ann, dsch=dsch):
                if isinstance(v, dict):
                    for k, fn in dsch.items():
                        if k in v:
                            e, a = fn(v, path)
                            errs.extend(e)
                            if not e:
                                ann.merge(a)
            checks.append(c_dsch)

        # ---- array ----
        prefix_key = "prefixItems" if "prefixItems" in sch else (
            "items" if isinstance(sch.get("items"), list) else None)  # draft-07
        prefix = [self._compile(s, f"{ptr}/{prefix_key}/{i}")
                  for i, s in enumerate(sch[prefix_key])] if prefix_key else []
        rest_key = "items" if ("items" in sch
                               and not isinstance(sch["items"], list)) else (
            "additionalItems" if "additionalItems" in sch and prefix_key
            else None)
        rest = self._compile(sch[rest_key], f"{ptr}/{rest_key}") \
            if rest_key else None
        if prefix or rest is not None:
            def c_items(v, path, errs, ann, prefix=prefix, rest=rest):
                if not isinstance(v, list):
                    return
                np_ = min(len(prefix), len(v))
                for i in range(np_):
                    errs.extend(prefix[i](v[i], f"{path}/{i}")[0])
                if ann.items is not _ALL:
                    ann.items = max(ann.items, np_)
                if rest is not None:
                    for i in range(len(prefix), len(v)):
                        errs.extend(rest(v[i], f"{path}/{i}")[0])
                    ann.items = _ALL
            checks.append(c_items)
        if "contains" in sch:
            cfn = sub("contains")
            lo = sch.get("minContains", 1)
            hi = sch.get("maxContains")
            def c_contains(v, path, errs, ann, cfn=cfn, lo=lo, hi=hi):
                if not isinstance(v, list):
                    return
                hits = [i for i, x in enumerate(v)
                        if not cfn(x, f"{path}/{i}")[0]]
                ann.contains |= set(hits)
                if len(hits) < lo:
                    errs.append((path, "contains",
                                 f"{len(hits)} matching items < minContains {lo}"))
                if hi is not None and len(hits) > hi:
                    errs.append((path, "maxContains",
                                 f"{len(hits)} matching items > maxContains {hi}"))
            checks.append(c_contains)
        if "minItems" in sch or "maxItems" in sch:
            lo, hi = sch.get("minItems"), sch.get("maxItems")
            def c_nitems(v, path, errs, ann, lo=lo, hi=hi):
                if isinstance(v, list):
                    n = len(v)
                    if lo is not None and n < lo:
                        errs.append((path, "minItems", f"{n} < {lo}"))
                    if hi is not None and n > hi:
                        errs.append((path, "maxItems", f"{n} > {hi}"))
            checks.append(c_nitems)
        if sch.get("uniqueItems"):
            def c_uniq(v, path, errs, ann):
                if isinstance(v, list):
                    seen = set()
                    for i, x in enumerate(v):
                        k = _ckey(x)
                        if k in seen:
                            errs.append((f"{path}/{i}", "uniqueItems",
                                         "duplicate item"))
                        seen.add(k)
            checks.append(c_uniq)

        # ---- in-place applicators ----
        if "allOf" in sch:
            fns = [self._compile(s, f"{ptr}/allOf/{i}")
                   for i, s in enumerate(sch["allOf"])]
            def c_all(v, path, errs, ann, fns=fns):
                for fn in fns:
                    e, a = fn(v, path)
                    errs.extend(e)
                    if not e:
                        ann.merge(a)
            checks.append(c_all)
        if "anyOf" in sch:
            fns = [self._compile(s, f"{ptr}/anyOf/{i}")
                   for i, s in enumerate(sch["anyOf"])]
            def c_any(v, path, errs, ann, fns=fns):
                ok = False
                for fn in fns:  # no short-circuit: annotations from ALL valid branches
                    e, a = fn(v, path)
                    if not e:
                        ok = True
                        ann.merge(a)
                if not ok:
                    errs.append((path, "anyOf", "no anyOf branch matched"))
            checks.append(c_any)
        if "oneOf" in sch:
            fns = [self._compile(s, f"{ptr}/oneOf/{i}")
                   for i, s in enumerate(sch["oneOf"])]
            def c_one(v, path, errs, ann, fns=fns):
                n = 0
                for fn in fns:
                    e, a = fn(v, path)
                    if not e:
                        n += 1
                        ann.merge(a)
                if n != 1:
                    errs.append((path, "oneOf",
                                 f"{n} oneOf branches matched (need exactly 1)"))
            checks.append(c_one)
        if "not" in sch:
            nfn = sub("not")
            def c_not(v, path, errs, ann, nfn=nfn):
                if not nfn(v, path)[0]:
                    errs.append((path, "not", "matches forbidden schema"))
            checks.append(c_not)
        if "if" in sch:
            ifn = sub("if")
            tfn = sub("then") if "then" in sch else None
            efn = sub("else") if "else" in sch else None
            def c_if(v, path, errs, ann, ifn=ifn, tfn=tfn, efn=efn):
                e, a = ifn(v, path)
                if not e:
                    ann.merge(a)
                    if tfn is not None:
                        e2, a2 = tfn(v, path)
                        errs.extend(e2)
                        if not e2:
                            ann.merge(a2)
                elif efn is not None:
                    e2, a2 = efn(v, path)
                    errs.extend(e2)
                    if not e2:
                        ann.merge(a2)
            checks.append(c_if)

        # ---- unevaluated* (after all other keywords; sees merged anns) ----
        ufn = self._compile(sch["unevaluatedProperties"],
                            f"{ptr}/unevaluatedProperties") \
            if "unevaluatedProperties" in sch else None
        uifn = self._compile(sch["unevaluatedItems"],
                             f"{ptr}/unevaluatedItems") \
            if "unevaluatedItems" in sch else None

        def fn(v: Any, path: str) -> tuple[list[Err], _Ann]:
            errs: list[Err] = []
            ann = _Ann()
            for c in checks:
                c(v, path, errs, ann)
            if ufn is not None and isinstance(v, dict):
                for k, mv in v.items():
                    if ann.props is _ALL or k in ann.props:
                        continue
                    e = ufn(mv, f"{path}/{k}")[0]
                    if e:
                        errs.append((f"{path}/{k}", "unevaluatedProperties",
                                     f"unevaluated property {k!r} invalid"))
                    ann.props = ann.props | {k} if ann.props is not _ALL else _ALL
            if uifn is not None and isinstance(v, list) and ann.items is not _ALL:
                for i in range(ann.items, len(v)):
                    if i in ann.contains:
                        continue
                    e = uifn(v[i], f"{path}/{i}")[0]
                    if e:
                        errs.append((f"{path}/{i}", "unevaluatedItems",
                                     f"unevaluated item {i} invalid"))
                ann.items = _ALL
            return errs, ann

        return fn


_OFFICIAL_META_FN: list = []


def _official_metaschema_validator() -> "_Fn":
    """Compiled self-hosted metaschema, shared (official dialect URIs
    referenced via $ref resolve to it)."""
    if not _OFFICIAL_META_FN:
        _OFFICIAL_META_FN.append(CompiledSchema(METASCHEMA)._fn)
    return _OFFICIAL_META_FN[0]


def compile_schema(schema: Any, *, assert_formats: bool | None = None,
                   entrypoint: str = "", resources: dict | None = None,
                   static_unevaluated: bool = False) -> CompiledSchema:
    """Compile a JSON Schema document once; returns the reusable validator.

    ``static_unevaluated=True`` first runs the compile-time analysis of
    ``spec/unevaluated.py`` (the Blaze ``unevaluated.cc`` pass) and
    rewrites every statically-analyzable ``unevaluated*`` occurrence to
    its ``additional*`` equivalent — verdict-identical, skips the
    annotation bookkeeping on the hot path. Opt-in because error ROWS
    on already-failing instances can differ (see that module's doc)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if static_unevaluated and isinstance(schema, dict):
        from jsonschema_ray.spec.unevaluated import lower_static

        schema, _ = lower_static(schema)
    return CompiledSchema(schema, assert_formats=assert_formats,
                          entrypoint=entrypoint, resources=resources)


# ---------------------------------------------------------------------------
# Self-hosted metaschema: a hand-written 2020-12-subset schema that
# DESCRIBES schemas — the analog of ``jsonschema metaschema`` validating
# a schema against its dialect metaschema (``src/command_metaschema.cc``).
# Validated BY this module's own evaluator (recursive via $dynamicRef-
# style $ref into #/$defs/schema).
# ---------------------------------------------------------------------------

_SCHEMA_OR_BOOL = {"$ref": "#/$defs/schema"}

METASCHEMA: dict = {
    "$defs": {
        "schema": {
            "if": {"type": "object"},
            "then": {
                "properties": {
                    "type": {"anyOf": [
                        {"enum": ["null", "boolean", "string", "integer",
                                  "number", "array", "object"]},
                        {"type": "array", "items": {
                            "enum": ["null", "boolean", "string", "integer",
                                     "number", "array", "object"]}}]},
                    "enum": {"type": "array"},
                    "multipleOf": {"type": "number", "exclusiveMinimum": 0},
                    "minimum": {"type": "number"},
                    "maximum": {"type": "number"},
                    "exclusiveMinimum": {"type": ["number", "boolean"]},
                    "exclusiveMaximum": {"type": ["number", "boolean"]},
                    "minLength": {"type": "integer", "minimum": 0},
                    "maxLength": {"type": "integer", "minimum": 0},
                    "pattern": {"type": "string", "format": "regex",
                                "x-format-assertion": True},
                    "format": {"type": "string"},
                    "required": {"type": "array", "items": {"type": "string"},
                                 "uniqueItems": True},
                    "dependentRequired": {
                        "type": "object",
                        "additionalProperties": {
                            "type": "array", "items": {"type": "string"}}},
                    "minProperties": {"type": "integer", "minimum": 0},
                    "maxProperties": {"type": "integer", "minimum": 0},
                    "properties": {"type": "object",
                                   "additionalProperties": _SCHEMA_OR_BOOL},
                    "patternProperties": {
                        "type": "object",
                        "propertyNames": {"format": "regex",
                                          "x-format-assertion": True},
                        "additionalProperties": _SCHEMA_OR_BOOL},
                    "additionalProperties": _SCHEMA_OR_BOOL,
                    "propertyNames": _SCHEMA_OR_BOOL,
                    "dependentSchemas": {
                        "type": "object",
                        "additionalProperties": _SCHEMA_OR_BOOL},
                    "items": {"anyOf": [
                        {"$ref": "#/$defs/schema"},
                        {"type": "array", "items": _SCHEMA_OR_BOOL}]},
                    "prefixItems": {"type": "array",
                                    "items": _SCHEMA_OR_BOOL},
                    "additionalItems": _SCHEMA_OR_BOOL,
                    "contains": _SCHEMA_OR_BOOL,
                    "minContains": {"type": "integer", "minimum": 0},
                    "maxContains": {"type": "integer", "minimum": 0},
                    "minItems": {"type": "integer", "minimum": 0},
                    "maxItems": {"type": "integer", "minimum": 0},
                    "uniqueItems": {"type": "boolean"},
                    "allOf": {"type": "array", "minItems": 1,
                              "items": _SCHEMA_OR_BOOL},
                    "anyOf": {"type": "array", "minItems": 1,
                              "items": _SCHEMA_OR_BOOL},
                    "oneOf": {"type": "array", "minItems": 1,
                              "items": _SCHEMA_OR_BOOL},
                    "not": _SCHEMA_OR_BOOL,
                    "if": _SCHEMA_OR_BOOL,
                    "then": _SCHEMA_OR_BOOL,
                    "else": _SCHEMA_OR_BOOL,
                    "unevaluatedProperties": _SCHEMA_OR_BOOL,
                    "unevaluatedItems": _SCHEMA_OR_BOOL,
                    "$ref": {"type": "string"},
                    "$dynamicRef": {"type": "string"},
                    "$recursiveRef": {"type": "string"},
                    "$anchor": {"type": "string",
                                "pattern": "^[A-Za-z][A-Za-z0-9_:.-]*$"},
                    "$defs": {"type": "object",
                              "additionalProperties": _SCHEMA_OR_BOOL},
                    "definitions": {"type": "object",
                                    "additionalProperties": _SCHEMA_OR_BOOL},
                    "$schema": {"type": "string"},
                    "$id": {"type": "string"},
                    "title": {"type": "string"},
                    "description": {"type": "string"},
                    "contentMediaType": {"type": "string"},
                    "contentSchema": _SCHEMA_OR_BOOL,
                },
            },
            "else": {"type": "boolean"},
        },
    },
    "$ref": "#/$defs/schema",
}


_KNOWN_KEYWORDS = set(METASCHEMA["$defs"]["schema"]["then"]["properties"]) | {
    "$comment", "default", "examples", "deprecated", "readOnly", "writeOnly",
    "$vocabulary", "$dynamicAnchor", "$recursiveAnchor", "contentEncoding",
    "x-format-assertion", "x-lint-exclude",
    "id",   # draft-04/03 resource identifier
    "const", "dependencies",
}

# official dialect URIs by scheme era (lint rules
# modern_official_dialect_with_http / draft_official_dialect_with_https,
# vendor/blaze/src/alterschema/common)
_MODERN_DIALECT_HTTP = ("http://json-schema.org/draft/2019-09/schema",
                        "http://json-schema.org/draft/2020-12/schema")
_DRAFT_DIALECT_HTTPS = tuple(
    f"https://json-schema.org/draft-0{d}/schema" for d in (3, 4, 6, 7))

_BOUND_PAIRS = [("minimum", "maximum"), ("minLength", "maxLength"),
                ("minItems", "maxItems"), ("minProperties", "maxProperties"),
                ("minContains", "maxContains")]


def lint_schema(schema: Any,
                top_level: bool = False) -> list[tuple[str, str, str]]:
    """Static analysis of a schema document — the alterschema-style
    lint surface (``vendor/blaze/src/alterschema``) applied to schemas:
    (severity, json_pointer, message) findings for unknown keywords
    (typo detection), unsatisfiable bounds, empty enums, constant-false
    applicator members, double-negation, invalid ``default``/
    ``examples`` values, and ignored non-resource metaschemas — on top
    of full metaschema validation.

    ``top_level=True`` (the CLI ``lint`` verb) adds the reference's
    document-level style rules: top_level_title / top_level_description
    and the official-dialect scheme rules
    (modern_official_dialect_with_http /
    draft_official_dialect_with_https) — off by default so embedded /
    programmatic schemas aren't nagged about titles."""
    findings: list[tuple[str, str, str]] = []
    for p, kw, msg in check_metaschema(schema):
        findings.append(("error", p, f"{kw}: {msg}"))

    # unknown-keyword typo detection only makes sense when we know the
    # dialect's full keyword set; custom / OpenAPI dialects bring their
    # own vocabularies (test/lint/pass_openapi_3_1.sh: `externalDocs`)
    _ds0 = schema.get("$schema") if isinstance(schema, dict) else None
    known_vocab = not isinstance(_ds0, str) or \
        _ds0.rstrip("#") in CompiledSchema.KNOWN_DIALECTS

    if top_level and isinstance(schema, dict):
        ds = schema.get("$schema")
        if isinstance(ds, str):
            norm = ds.rstrip("#")
            if norm in _MODERN_DIALECT_HTTP:
                findings.append((
                    "warning", "/$schema",
                    "use the https:// form of the official dialect URI "
                    "(modern_official_dialect_with_http)"))
            if norm in _DRAFT_DIALECT_HTTPS:
                findings.append((
                    "warning", "/$schema",
                    "classic drafts are published under http:// "
                    "(draft_official_dialect_with_https)"))
        # vocabulary gating approximation: the reference's style rules
        # require the meta-data vocabulary; custom metaschemas that
        # don't declare it (pass_bundled_metaschema.sh) are exempt
        std = not isinstance(ds, str) or \
            ds.rstrip("#") in CompiledSchema.KNOWN_DIALECTS
        if std:
            for kw_, rule in (("title", "top_level_title"),
                              ("description", "top_level_description")):
                v = schema.get(kw_)
                if not (isinstance(v, str) and v.strip()):
                    findings.append((
                        "warning", f"/{kw_}",
                        f"set a concise non-empty {kw_} at the top level "
                        f"({rule})"))

    def walk(node: Any, ptr: str, in_schema_pos: bool):
        if isinstance(node, bool):
            return
        if isinstance(node, dict) and in_schema_pos:
            if known_vocab:
                for k in node:
                    if k not in _KNOWN_KEYWORDS:
                        findings.append(
                            ("warning", f"{ptr}/{k}",
                             f"unknown keyword {k!r} (typo?) — ignored by "
                             "evaluation"))
            for lo, hi in _BOUND_PAIRS:
                if lo in node and hi in node and \
                        isinstance(node[lo], (int, float)) and \
                        isinstance(node[hi], (int, float)) and \
                        node[lo] > node[hi]:
                    findings.append(("error", ptr,
                                     f"unsatisfiable: {lo} {node[lo]} > "
                                     f"{hi} {node[hi]}"))
            if node.get("enum") == []:
                findings.append(("error", f"{ptr}/enum",
                                 "empty enum matches nothing"))
            for app in ("allOf",):
                for i, sub in enumerate(node.get(app, [])):
                    if sub is False:
                        findings.append(
                            ("warning", f"{ptr}/{app}/{i}",
                             "constant-false branch makes the whole "
                             "schema unsatisfiable"))
            if isinstance(node.get("not"), dict) and \
                    "not" in node["not"] and len(node["not"]) == 1:
                findings.append(("warning", f"{ptr}/not",
                                 "double negation — inline the inner schema"))
            if ptr and "$schema" in node and "$id" not in node \
                    and "id" not in node:
                findings.append((
                    "warning", f"{ptr}/$schema",
                    "$schema on a subschema that is not a resource root "
                    "is ignored (ignored_metaschema)"))
            # valid_default / valid_examples (linter/valid_default.h):
            # declared sample values must conform to their own schema
            if "$ref" not in node:
                for dkw, rule in (("default", "valid_default"),
                                  ("examples", "valid_examples")):
                    if dkw not in node:
                        continue
                    vals = node[dkw] if dkw == "examples" else [node[dkw]]
                    if not isinstance(vals, list):
                        continue
                    try:
                        sub = CompiledSchema(schema, entrypoint=ptr)
                    except Exception:   # broken subtree reported elsewhere
                        continue
                    for i, v in enumerate(vals):
                        if not sub.is_valid(v):
                            loc = f"{ptr}/{dkw}" if dkw == "default" \
                                else f"{ptr}/{dkw}/{i}"
                            findings.append((
                                "warning", loc,
                                f"value does not validate against its "
                                f"own schema ({rule})"))
            # recurse into schema-valued positions
            for k, v in node.items():
                esc = k.replace("~", "~0").replace("/", "~1")
                if k in ("properties", "patternProperties",
                         "dependentSchemas", "$defs", "definitions"):
                    if isinstance(v, dict):
                        for kk, vv in v.items():
                            kesc = kk.replace("~", "~0").replace("/", "~1")
                            walk(vv, f"{ptr}/{esc}/{kesc}", True)
                elif k in ("allOf", "anyOf", "oneOf", "prefixItems") or \
                        (k == "items" and isinstance(v, list)):
                    for i, vv in enumerate(v if isinstance(v, list) else []):
                        walk(vv, f"{ptr}/{esc}/{i}", True)
                elif k in ("items", "additionalProperties", "propertyNames",
                           "contains", "not", "if", "then", "else",
                           "unevaluatedProperties", "unevaluatedItems",
                           "additionalItems", "contentSchema"):
                    walk(v, f"{ptr}/{esc}", True)

    walk(schema, "", True)
    return findings


def subschema_positions(schema: Any) -> list[tuple[str, Any]]:
    """(pointer, node) for every schema position of the document,
    walker-gated per dialect (the frame locations custom lint rules
    apply to)."""
    out: list[tuple[str, Any]] = []
    ver0 = _dialect_ver(schema) if isinstance(schema, dict) else 2020

    def walk(node: Any, ptr: str, ver: int) -> None:
        if isinstance(node, dict) and isinstance(node.get("$schema"), str):
            ver = _dialect_ver(node)
        out.append((ptr, node))
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
            esc = k.replace("~", "~0").replace("/", "~1")
            if shape == "schema" and isinstance(v, (dict, bool)):
                walk(v, f"{ptr}/{esc}", ver)
            elif shape == "list" and isinstance(v, list):
                for i, x in enumerate(v):
                    if isinstance(x, (dict, bool)):
                        walk(x, f"{ptr}/{esc}/{i}", ver)
            elif shape == "map" and isinstance(v, dict):
                for nm, sub in v.items():
                    if isinstance(sub, (dict, bool)):
                        nesc = nm.replace("~", "~0").replace("/", "~1")
                        walk(sub, f"{ptr}/{esc}/{nesc}", ver)

    walk(schema, "", ver0)
    return out


def custom_rule_findings(schema: Any, rules: list[dict], *,
                         top_level_only: bool = False,
                         assert_formats: bool | None = None,
                         resources: dict | None = None) -> list[Err]:
    """Custom lint rules as data (the reference ``lint --rule`` /
    ``--top-level-rule``, ``src/command_lint.cc``): each rule is a
    JSON Schema whose ``title`` names the rule and whose
    ``description`` is the finding message; every subschema position
    of the linted document (or only the root, for top-level rules)
    that FAILS the rule schema is a finding."""
    findings: list[Err] = []
    positions = [("", schema)] if top_level_only \
        else subschema_positions(schema)
    for rule in rules:
        name = rule.get("title") if isinstance(rule, dict) else None
        if not isinstance(name, str) or not name:
            raise ValueError(
                "a custom lint rule must declare a string title")
        msg = rule.get("description") or name
        cs = compile_schema(rule, assert_formats=assert_formats,
                            resources=resources)
        for ptr, node in positions:
            if not cs.is_valid(node):
                findings.append((ptr, name, msg))
    return findings


def check_metaschema(schema: Any) -> list[Err]:
    """Validate a schema DOCUMENT against the embedded metaschema using
    this module's own evaluator (self-hosting: the metaschema exercises
    recursion, propertyNames, format:regex and if/then/else)."""
    return compile_schema(METASCHEMA).validate(schema)


# ---------------------------------------------------------------------------
# Layer 2: JSON Schema → CheckPlan (the vectorized columnar front-end)
# ---------------------------------------------------------------------------

_SCALAR_FORMATS_OK = None  # populated lazily from functions.formats
# set (with try/finally) by schema_to_plan(assert_formats=True) — the
# columnar analog of the --format-assertion flag
_FORCE_FORMAT_ASSERTION = False


def _scalar_spec(sub: Any) -> dict | None:
    """Compile the columnar-expressible keywords of a (sub)schema into ONE
    composed predicate spec (``spec/predicates.py`` dialect) applied to a
    field. Returns None when nothing is expressible. Columnar caveat
    (documented in the module docstring): Arrow columns are statically
    typed, so type-applicability guards (`minLength` ignored on numbers)
    resolve at schema-authoring time, not per value."""
    from jsonschema_ray.functions.formats import REGEX_FORMATS

    if sub is True or sub == {}:
        return None
    if sub is False:
        return {"op": "const", "value": False}
    parts: list[dict] = []

    if "type" in sub:
        ts = sub["type"] if isinstance(sub["type"], list) else [sub["type"]]
        tps = [{"op": "type", "type": t, "field": None} for t in ts]
        parts.append(tps[0] if len(tps) == 1 else {"op": "or", "args": tps})
    if "enum" in sub:
        vals = sub["enum"]
        if vals and all(isinstance(v, str) for v in vals) or \
                all(isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in vals):
            parts.append({"op": "is_in", "field": None, "values": vals})
        else:
            parts.append({"op": "or", "args": [
                {"op": "eq", "field": None, "value": v} for v in vals]}
                if vals else {"op": "const", "value": False})
    if "const" in sub:
        parts.append({"op": "eq", "field": None, "value": sub["const"]})
    if "pattern" in sub:
        parts.append({"op": "regex_search", "field": None,
                      "pattern": sub["pattern"]})
    if "minLength" in sub or "maxLength" in sub:
        p: dict = {"op": "utf8_len", "field": None}
        if "minLength" in sub:
            p["min"] = sub["minLength"]
        if "maxLength" in sub:
            p["max"] = sub["maxLength"]
        parts.append(p)
    if "minimum" in sub or "maximum" in sub:
        # draft-04 boolean exclusive* flips the comparison
        if "minimum" in sub:
            parts.append({"op": "gt" if sub.get("exclusiveMinimum") is True
                          else "ge", "field": None, "value": sub["minimum"]})
        if "maximum" in sub:
            parts.append({"op": "lt" if sub.get("exclusiveMaximum") is True
                          else "le", "field": None, "value": sub["maximum"]})
    if "exclusiveMinimum" in sub and not isinstance(sub["exclusiveMinimum"], bool):
        parts.append({"op": "gt", "field": None, "value": sub["exclusiveMinimum"]})
    if "exclusiveMaximum" in sub and not isinstance(sub["exclusiveMaximum"], bool):
        parts.append({"op": "lt", "field": None, "value": sub["exclusiveMaximum"]})
    if "multipleOf" in sub:
        parts.append({"op": "divisible", "field": None, "by": sub["multipleOf"]})
    if "format" in sub and (_FORCE_FORMAT_ASSERTION
                            or sub.get("x-format-assertion") is True):
        # same gating as the dynamic evaluator: format is an annotation
        # unless opted in per-location or forced (--format-assertion)
        from jsonschema_ray.functions.formats import PYTHON_FORMATS
        if sub["format"] in REGEX_FORMATS or sub["format"] in PYTHON_FORMATS:
            parts.append({"op": "format", "field": None,
                          "format": sub["format"]})

    for kw, op in (("allOf", "and"), ("anyOf", "or"), ("oneOf", "one_of")):
        if kw in sub:
            args = [_scalar_spec(s) or {"op": "const", "value": True}
                    for s in sub[kw]]
            parts.append({"op": op, "args": args})
    if "not" in sub:
        parts.append({"op": "not",
                      "arg": _scalar_spec(sub["not"]) or
                      {"op": "const", "value": True}})
    if "if" in sub:
        p = {"op": "if",
             "cond": _scalar_spec(sub["if"]) or {"op": "const", "value": True}}
        if "then" in sub:
            p["then"] = _scalar_spec(sub["then"]) or {"op": "const", "value": True}
        if "else" in sub:
            p["else"] = _scalar_spec(sub["else"]) or {"op": "const", "value": True}
        parts.append(p)

    if not parts:
        return None
    return parts[0] if len(parts) == 1 else {"op": "and", "args": parts}


def _bind_field(spec: dict, field: str) -> dict:
    """Fill the deferred ``field: None`` slots of a composed spec."""
    out = dict(spec)
    if out.get("field", "") is None:
        out["field"] = field
    for k in ("args",):
        if k in out:
            out[k] = [_bind_field(s, field) for s in out[k]]
    for k in ("arg", "cond", "then", "else"):
        if k in out:
            out[k] = _bind_field(out[k], field)
    return out


def _object_span_pred(sub: Any) -> dict:
    """An items-level OBJECT schema over span-struct fields → one span
    predicate: ``properties.f`` applies only when f is present (null ⇒
    absent), ``required`` asserts presence."""
    parts: list[dict] = []
    for f in sub.get("required", []):
        parts.append({"op": "not_null", "field": f})
    for f, fsub in sub.get("properties", {}).items():
        s = _scalar_spec(fsub)
        if s is not None:
            parts.append({"op": "or", "args": [
                {"op": "is_null", "field": f}, _bind_field(s, f)]})
    if not parts:
        return {"op": "const", "value": True}
    return parts[0] if len(parts) == 1 else {"op": "and", "args": parts}


def schema_to_plan(schema: Any, *, mode: str = "exhaustive",
                   spans_col: str = "spans",
                   assert_formats: bool = False) -> "CheckPlan":
    """``_schema_to_plan_inner`` with the format-assertion force flag
    scoped around it (``assert_formats=True`` = the --format-assertion
    flag; otherwise only ``x-format-assertion: true`` locations
    assert)."""
    global _FORCE_FORMAT_ASSERTION
    prev = _FORCE_FORMAT_ASSERTION
    _FORCE_FORMAT_ASSERTION = bool(assert_formats)
    try:
        return _schema_to_plan_inner(schema, mode=mode, spans_col=spans_col)
    finally:
        _FORCE_FORMAT_ASSERTION = prev


def _schema_to_plan_inner(schema: Any, *, mode: str = "exhaustive",
                          spans_col: str = "spans") -> "CheckPlan":
    """Compile a JSON Schema describing the ROW shape of a structured
    dataset into a vectorized CheckPlan (the ``jsonschema validate
    schema.json`` front door, re-expressed columnar).

    Mapping (keyword table mirroring
    ``vendor/blaze/src/compiler/default_compiler.cc:57-640``):

    - top-level ``required`` → doc-scope ``not_null`` rules
    - scalar-column subschemas → one composed predicate rule per column
      (guarded ``when not_null`` — a missing member is valid JSON Schema)
    - the array-of-struct ``spans`` column: ``items`` object schema →
      span-scope rules; ``prefixItems`` → ``_span_index``-guarded rules
      (AssertionArrayPrefix analog); ``minItems``/``maxItems`` →
      ``n_spans`` bounds; ``contains``(+min/max) → contains rules;
      ``items.required`` → span presence rules
    - a string column with ``contentMediaType: application/json`` +
      ``contentSchema`` → a ``json_schema`` rule (the dynamic evaluator,
      layer 1 above) — LoopProperties/recursion land here
    """
    from jsonschema_ray.spec.plan import CheckPlan, Rule

    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict):
        raise ValueError("columnar schema_to_plan needs an object schema")

    rules: list[Rule] = []

    for c in schema.get("required", []):
        rules.append(Rule(f"{c}.required", scope="doc",
                          check={"op": "not_null", "field": c},
                          message=f"missing required column {c!r}"))

    for c, sub in schema.get("properties", {}).items():
        if sub is True:
            continue
        if sub is False:
            rules.append(Rule(f"{c}.forbidden", scope="doc",
                              check={"op": "is_null", "field": c},
                              message=f"column {c!r} must be absent"))
            continue

        if isinstance(sub.get("contentSchema"), (dict, bool)) and \
                sub.get("contentMediaType", "application/json") == "application/json":
            rules.append(Rule(
                f"{c}.contentSchema", kind="json_schema", scope="doc",
                params={"field": c, "schema": sub["contentSchema"]},
                message=f"JSON payload in {c!r} violates contentSchema"))
            continue

        is_array = sub.get("type") == "array" or "items" in sub \
            or "prefixItems" in sub
        if c == spans_col and is_array:
            if "minItems" in sub or "maxItems" in sub:
                p = {"op": "between", "field": "n_spans"}
                if "minItems" in sub:
                    p["min"] = sub["minItems"]
                if "maxItems" in sub:
                    p["max"] = sub["maxItems"]
                rules.append(Rule(f"{c}.nitems", scope="doc", check=p,
                                  message=f"{c} length out of bounds"))
            items = sub.get("items")
            if isinstance(items, dict):
                for f in items.get("required", []):
                    rules.append(Rule(
                        f"{c}.items.{f}.required", scope="span",
                        check={"op": "not_null", "field": f},
                        message=f"span missing required field {f!r}"))
                for f, fsub in items.get("properties", {}).items():
                    s = _scalar_spec(fsub)
                    if s is not None:
                        rules.append(Rule(
                            f"{c}.items.{f}", scope="span",
                            when={"op": "not_null", "field": f},
                            check=_bind_field(s, f),
                            message=f"span field {f!r} violates items schema"))
            for i, psub in enumerate(sub.get("prefixItems", [])):
                if not isinstance(psub, dict):
                    continue
                rules.append(Rule(
                    f"{c}.prefix.{i}", scope="span",
                    when={"op": "eq", "field": "_span_index", "value": i},
                    check=_object_span_pred(psub),
                    message=f"span {i} violates prefixItems[{i}]"))
            if "contains" in sub and isinstance(sub["contains"], dict):
                rules.append(Rule(
                    f"{c}.contains", kind="contains", scope="doc",
                    params={"predicate": _object_span_pred(sub["contains"]),
                            "min": sub.get("minContains", 1),
                            "max": sub.get("maxContains")},
                    message=f"{c} contains-count out of bounds"))
            continue

        s = _scalar_spec(sub)
        if s is not None:
            rules.append(Rule(f"{c}.schema", scope="doc",
                              when={"op": "not_null", "field": c},
                              check=_bind_field(s, c),
                              message=f"column {c!r} violates schema"))

    return CheckPlan(rules=rules, mode=mode)
