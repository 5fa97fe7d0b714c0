"""JSON Schema → JSON-LD promotion (the ``rdf`` verb).

The reference's ``jsonschema rdf`` (``/root/reference/src/command_rdf.cc``,
semantics in ``/root/reference/docs/rdf.markdown``) evaluates an
instance against a 2019-09/2020-12 schema annotated with ``x-jsonld-*``
keywords and, if valid, prints the instance promoted to expanded-form
JSON-LD. This implements the full documented annotation vocabulary:

    x-jsonld-id, x-jsonld-type, x-jsonld-reverse, x-jsonld-datatype,
    x-jsonld-language (canonical BCP 47), x-jsonld-direction,
    x-jsonld-json, x-jsonld-graph, x-jsonld-container
    (@list/@set/@language/@index), x-jsonld-self (URI template or
    mailto/acct scheme identity), x-jsonld-override, x-jsonld-value,
    x-jsonld-constants

Annotation COMPOSITION follows JSON Schema evaluation: values flow
from every applied subschema — ``$ref`` targets (including external
resources), ``allOf`` members, the ``anyOf``/``oneOf`` branches that
VALIDATE the value, and the taken ``then``/``else`` branch. Single-
value keywords reject conflicting assignments unless the outer object
declares ``x-jsonld-override: true``; ``x-jsonld-type`` values union
(sorted); referenced schemas on pre-2019 dialects validate as usual but
their annotations are ignored (docs/rdf.markdown notes). Nodes reached
through UNPREDICATED properties are hoisted to the top level of the
expanded document; an annotation-free document expands to ``[]``.

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

_OLD_DIALECTS = ("draft-07", "draft-06", "draft-04", "draft-03")

_SINGLE = ("x-jsonld-id", "x-jsonld-reverse", "x-jsonld-datatype",
           "x-jsonld-language", "x-jsonld-direction", "x-jsonld-json",
           "x-jsonld-graph", "x-jsonld-container", "x-jsonld-self",
           "x-jsonld-value")

_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S+$")


class ResolutionError(ValueError):
    """Annotation resolution failure; cites the schema location.
    Conflict errors additionally carry the facet name, both schema
    locations, and the instance location (blaze JSONLDError model,
    printed by the reference's test verb print_rdf_failure)."""

    def __init__(self, message: str, schema_location: str, *,
                 facet: str | None = None,
                 other_location: str | None = None,
                 instance_location: str | None = None,
                 inert_override_location: str | None = None):
        super().__init__(f"{message}\n    at schema location "
                         f"\"{schema_location}\"")
        self.message = message
        self.schema_location = schema_location
        self.facet = facet
        self.other_location = other_location
        self.instance_location = instance_location
        self.inert_override_location = inert_override_location


def _canonical_bcp47(tag: Any) -> bool:
    """Canonical BCP 47 only (docs/rdf.markdown: `en-US` yes, `en-us`
    no): language lowercase, script Titlecase, region uppercase."""
    if not isinstance(tag, str) or not tag:
        return False
    parts = tag.split("-")
    if not (2 <= len(parts[0]) <= 8 and parts[0].isascii()
            and parts[0].isalpha() and parts[0].islower()):
        return False
    for sub in parts[1:]:
        if not sub or len(sub) > 8 or not sub.isascii() \
                or not sub.isalnum():
            return False
        if sub.isalpha():
            if len(sub) == 4:           # script: Titlecase
                if sub != sub[0].upper() + sub[1:].lower():
                    return False
            elif len(sub) == 2:         # region: UPPERCASE
                if not sub.isupper():
                    return False
            elif not sub.islower():     # variants/extensions: lowercase
                return False
    return True


def _self_id(template: str, value: Any, siblings: dict, ptr: str,
             iptr: str = "") -> str:
    """Mint an ``@id`` from ``x-jsonld-self``: an RFC 6570 URI template
    (variables matched VERBATIM against property names; ``this`` is the
    scalar value itself) or a scheme identity name (mailto / acct)."""
    if template == "mailto":
        if not isinstance(value, str) or "@" not in value:
            raise ResolutionError(
                "A JSON-LD self identity value is outside the domain of "
                "its scheme", f"{ptr}/x-jsonld-self", facet="self",
                instance_location=iptr)
        local, _, domain = value.rpartition("@")
        return "mailto:" + urllib.parse.quote(local, safe="") + "@" + \
            domain.lower()
    if template == "acct":
        if not isinstance(value, str) or "@" not in value:
            raise ResolutionError(
                "A JSON-LD self identity value is outside the domain of "
                "its scheme", f"{ptr}/x-jsonld-self", facet="self",
                instance_location=iptr)
        local, _, domain = value.rpartition("@")
        return "acct:" + urllib.parse.quote(local, safe="") + "@" + \
            domain.lower()

    def sub(m: re.Match) -> str:
        expr = m.group(1)
        reserved = expr.startswith("+")
        name = expr.lstrip("+")
        if name == "this":
            v = value
        elif isinstance(siblings, dict) and name in siblings:
            v = siblings[name]
        else:
            raise ResolutionError(
                "A JSON-LD self identity template variable must bind to "
                "an instance value", f"{ptr}/x-jsonld-self", facet="self",
                instance_location=iptr)
        s = v if isinstance(v, str) else json.dumps(v)
        return s if reserved else urllib.parse.quote(s, safe="")

    return re.sub(r"\{([^}]+)\}", sub, template)


class _Expander:
    """Document-pointer-driven expansion over a compiled schema: the
    compiled document carries mounted external resources, and per-
    pointer validators decide which anyOf/oneOf/if branches apply."""

    def __init__(self, cs):
        self.cs = cs
        self.doc = cs.schema
        self.hoisted: list = []

    # -- document access -----------------------------------------------
    def node(self, ptr: str) -> Any:
        from jsonschema_ray.spec.jschema import _resolve_pointer

        return _resolve_pointer(self.doc, ptr)

    def validates(self, ptr: str, value: Any) -> bool:
        try:
            return not self.cs._fn_for_ptr(ptr)(value, "")[0]
        except Exception:  # noqa: BLE001 — non-compilable branch ≠ match
            return False

    def _ver(self, ptr: str) -> int:
        """Effective dialect version at ptr (nearest $schema above)."""
        from jsonschema_ray.spec.jschema import _dialect_ver

        node = self.doc
        ver = _dialect_ver(node) if isinstance(node, dict) else 2020
        if ptr:
            for tok in ptr.lstrip("/").split("/"):
                tok = tok.replace("~1", "/").replace("~0", "~")
                node = node[int(tok)] if isinstance(node, list) \
                    else node.get(tok)
                if isinstance(node, dict) \
                        and isinstance(node.get("$schema"), str):
                    ver = _dialect_ver(node)
        return ver

    # -- annotation gathering -------------------------------------------
    def sources(self, ptr: str, value: Any, seen: frozenset = frozenset()
                ) -> list[str]:
        """Every schema-node pointer applied IN PLACE at this instance
        location: the node itself, $ref targets, allOf members,
        validating anyOf/oneOf branches, the taken then/else branch."""
        if ptr in seen:
            return []
        seen = seen | {ptr}
        node = self.node(ptr)
        if not isinstance(node, dict):
            return [ptr] if isinstance(node, bool) else []
        out = [ptr]
        ref = node.get("$ref")
        if isinstance(ref, str):
            try:
                tgt = self.cs._ref_target(ref, ptr)
            except Exception as e:  # noqa: BLE001
                raise ResolutionError(str(e), ptr) from None
            out.extend(self.sources(tgt, value, seen))
        for kw in ("allOf",):
            if isinstance(node.get(kw), list):
                for i in range(len(node[kw])):
                    out.extend(self.sources(f"{ptr}/{kw}/{i}", value, seen))
        for kw in ("anyOf", "oneOf"):
            if isinstance(node.get(kw), list):
                for i in range(len(node[kw])):
                    bp = f"{ptr}/{kw}/{i}"
                    if self.validates(bp, value):
                        out.extend(self.sources(bp, value, seen))
        if "if" in node and isinstance(node["if"], (dict, bool)):
            branch = "then" if self.validates(f"{ptr}/if", value) else "else"
            if branch in node:
                out.extend(self.sources(f"{ptr}/{branch}", value, seen))
        return out

    def gather(self, ptr: str, value: Any) -> tuple[dict, list[str]]:
        """Merged x-jsonld-* annotations + contributing source ptrs."""
        srcs = self.sources(ptr, value)
        own = self.node(ptr) if srcs else None
        own = own if isinstance(own, dict) else {}
        if "x-jsonld-override" in own \
                and not isinstance(own["x-jsonld-override"], bool):
            raise ResolutionError(
                "The value of x-jsonld-override must be a boolean",
                f"{ptr}/x-jsonld-override", facet="override",
                instance_location="".join(getattr(self, "_ipath", [])))
        override = own.get("x-jsonld-override") is True
        ann: dict[str, Any] = {}
        ann_src: dict[str, str] = {}
        types: list = []
        constants: dict = {}

        def take(node: dict, nptr: str, is_own: bool) -> None:
            if self._ver(nptr) <= 7:
                return      # pre-2019 dialects don't emit annotations
            t = node.get("x-jsonld-type")
            if t is not None:
                for tv in (t if isinstance(t, list) else [t]):
                    if tv not in types:
                        types.append(tv)
            c = node.get("x-jsonld-constants")
            if c is not None:
                if not isinstance(c, dict):
                    raise ResolutionError(
                        "x-jsonld-constants must be an object", nptr)
                for k, v in c.items():
                    if v is None and not (is_own and override):
                        raise ResolutionError(
                            "A JSON-LD constants entry can only be null "
                            "inside an overriding schema object",
                            f"{nptr}/x-jsonld-constants",
                            facet="constants",
                            instance_location="".join(
                                getattr(self, "_ipath", [])))
                    if k in constants and constants[k] != v:
                        if not (override and not is_own):
                            raise ResolutionError(
                                "Conflicting JSON-LD constants", nptr)
                    else:
                        constants.setdefault(k, v)
            for kw in _SINGLE:
                if kw not in node:
                    continue
                v = node[kw]
                if kw in ann and ann[kw] != v:
                    if override and not is_own:
                        pass        # the overriding outer value wins
                    else:
                        short = kw.replace("x-jsonld-", "")
                        label = {"id": "predicate", "value":
                                 "value predicate",
                                 "json": "JSON literal flag",
                                 "graph": "graph flag",
                                 "self": "self identity"}.get(short,
                                                              short)
                        facet = {"id": "predicate",
                                 "value": "value"}.get(short, short)
                        inert = None
                        for sp2 in srcs:
                            n2 = self.node(sp2)
                            if sp2 != ptr and isinstance(n2, dict) \
                                    and n2.get("x-jsonld-override") \
                                    is True:
                                inert = f"{sp2}/x-jsonld-override"
                                break
                        raise ResolutionError(
                            f"A JSON-LD {label} cannot be assigned more "
                            "than one value", f"{ann_src.get(kw, nptr)}/{kw}",
                            facet=facet,
                            other_location=f"{nptr}/{kw}",
                            inert_override_location=inert,
                            instance_location="".join(
                                getattr(self, "_ipath", [])))
                else:
                    if kw not in ann:
                        ann_src[kw] = nptr
                    ann.setdefault(kw, v)

        # the outer (own) node wins under override: process it FIRST so
        # later conflicting values from beneath are only rejected when
        # not overridden
        ordered = srcs if not override else srcs
        for i, sp in enumerate(ordered):
            node = self.node(sp)
            if isinstance(node, dict):
                take(node, sp, is_own=(sp == ptr))
        if types:
            ann["x-jsonld-type"] = sorted(set(types))
        if constants:
            ann["x-jsonld-constants"] = constants

        # keyword value grammar (the syntactic guarantee)
        def _gerr(message: str, kw: str, facet: str):
            return ResolutionError(
                message, f"{ann_src.get(kw, ptr)}/{kw}", facet=facet,
                instance_location="".join(getattr(self, "_ipath", [])))

        pid = ann.get("x-jsonld-id")
        if pid is not None and (not isinstance(pid, str)
                                or not _IRI.match(pid)):
            raise _gerr("The value of x-jsonld-id must be an absolute "
                        "IRI", "x-jsonld-id", "predicate")
        rev = ann.get("x-jsonld-reverse")
        if rev is not None and (not isinstance(rev, str)
                                or not _IRI.match(rev)):
            raise _gerr("The value of x-jsonld-reverse must be an "
                        "absolute IRI", "x-jsonld-reverse", "reverse")
        dt = ann.get("x-jsonld-datatype")
        if dt is not None:
            if not isinstance(dt, str) or not _IRI.match(dt):
                raise _gerr("The value of x-jsonld-datatype must be an "
                            "absolute IRI", "x-jsonld-datatype",
                            "datatype")
            if dt == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString":
                raise _gerr("Use x-jsonld-language for language-tagged "
                            "literals", "x-jsonld-datatype", "datatype")
        lang = ann.get("x-jsonld-language")
        if lang is not None and not _canonical_bcp47(lang):
            raise _gerr("The value of x-jsonld-language must be a "
                        "canonical BCP 47 language tag",
                        "x-jsonld-language", "language")
        dirn = ann.get("x-jsonld-direction")
        if dirn is not None and dirn not in ("ltr", "rtl"):
            raise _gerr("The value of x-jsonld-direction must be ltr or "
                        "rtl", "x-jsonld-direction", "direction")
        cont = ann.get("x-jsonld-container")
        if cont is not None and cont not in ("@list", "@set", "@language",
                                             "@index"):
            raise _gerr("The value of x-jsonld-container must be @list, "
                        "@set, @language, or @index",
                        "x-jsonld-container", "container")
        if dt is not None and lang is not None:
            raise _gerr("x-jsonld-datatype and x-jsonld-language are "
                        "mutually exclusive", "x-jsonld-datatype",
                        "datatype")
        return ann, srcs

    # -- expansion -------------------------------------------------------
    def literal(self, ann: dict, v: Any, ptr: str) -> dict:
        if ann.get("x-jsonld-json"):
            return {"@value": v, "@type": "@json"}
        out = {"@value": v}
        dt = ann.get("x-jsonld-datatype")
        lang = ann.get("x-jsonld-language")
        if dt is not None:
            out["@type"] = dt
        elif lang is not None:
            if not isinstance(v, str):
                raise ResolutionError(
                    "x-jsonld-language applies to string values only", ptr)
            out["@language"] = lang
        if ann.get("x-jsonld-direction") is not None:
            out["@direction"] = ann["x-jsonld-direction"]
        return out

    def constants_of(self, ann: dict, ptr: str) -> dict:
        out = {}
        for k, v in (ann.get("x-jsonld-constants") or {}).items():
            if v is None:
                continue        # overriding null removes the constant
            if isinstance(v, list):
                out[k] = v
            elif isinstance(v, dict):
                out[k] = [v]
            else:
                out[k] = [{"@value": v}]
        return out

    def expand(self, ptr: str, value: Any,
               siblings: dict | None = None) -> list:
        """Expanded entities for one instance value (possibly several
        for container semantics; may be empty when nothing is
        annotated — such nodes drop from the output)."""
        ann, srcs = self.gather(ptr, value)

        if ann.get("x-jsonld-json"):
            return [{"@value": value, "@type": "@json"}]

        cont = ann.get("x-jsonld-container")
        if cont == "@language" and isinstance(value, dict):
            out = []
            for k, v in value.items():
                if not _canonical_bcp47(k):
                    raise ResolutionError(
                        "@language container keys must be canonical "
                        "BCP 47 language tags", ptr)
                out.append({"@value": v, "@language": k})
            return out
        if cont == "@index" and isinstance(value, dict):
            return [{"@value": v, "@index": k} for k, v in value.items()]

        if isinstance(value, dict):
            if "x-jsonld-value" in ann:
                raise ResolutionError(
                    "A JSON-LD value predicate can only be assigned to a "
                    "scalar value", f"{ptr}/x-jsonld-value", facet="value",
                    instance_location="".join(
                        getattr(self, "_ipath", [])))
            node: dict = {}
            if "x-jsonld-self" in ann:
                node["@id"] = _self_id(
                    ann["x-jsonld-self"], value, value, ptr,
                    "".join(getattr(self, "_ipath", [])))
            if "x-jsonld-type" in ann:
                node["@type"] = ann["x-jsonld-type"]
            edges: dict = {}
            reverse: dict = {}
            # annotation-collection order: schema property declarations
            # REVERSED, per declaring source (pass_expanded.sh expected
            # output vs its schema order)
            ordered: list[str] = []
            for sp in srcs:
                snode = self.node(sp)
                if not isinstance(snode, dict) \
                        or not isinstance(snode.get("properties"), dict):
                    continue
                for name in reversed(list(snode["properties"])):
                    if name in value and name not in ordered:
                        ordered.append(name)
            for name in ordered:
                pptrs = [f"{sp}/properties/"
                         f"{name.replace('~', '~0').replace('/', '~1')}"
                         for sp in srcs
                         if isinstance(self.node(sp), dict)
                         and isinstance(self.node(sp).get("properties"),
                                        dict)
                         and name in self.node(sp)["properties"]]
                if not pptrs:
                    continue
                if not hasattr(self, "_ipath"):
                    self._ipath = []
                self._ipath.append(
                    "/" + name.replace("~", "~0").replace("/", "~1"))
                try:
                    pann, _ = self.gather(pptrs[0], value[name])
                finally:
                    self._ipath.pop()
                # merge annotations across declaring sources
                for extra in pptrs[1:]:
                    ea, _ = self.gather(extra, value[name])
                    for k, v in ea.items():
                        if k == "x-jsonld-type":
                            merged = sorted(set(
                                (pann.get(k) or []) + v))
                            pann[k] = merged
                        elif k in pann and pann[k] != v:
                            raise ResolutionError(
                                "A JSON-LD annotation cannot be assigned "
                                "more than one value", extra)
                        else:
                            pann.setdefault(k, v)
                pid = pann.get("x-jsonld-id")
                rev = pann.get("x-jsonld-reverse")
                if not hasattr(self, "_ipath"):
                    self._ipath = []
                self._ipath.append(
                    "/" + name.replace("~", "~0").replace("/", "~1"))
                try:
                    entities = self.expand(pptrs[0], value[name], value)
                finally:
                    self._ipath.pop()
                if pid is None and rev is None:
                    # unpredicated: hoist full nodes to the top level
                    for e in entities:
                        if isinstance(e, dict) and e \
                                and "@value" not in e:
                            self.hoisted.append(e)
                    continue
                if not entities:
                    continue
                if rev is not None:
                    reverse.setdefault(rev, []).extend(entities)
                if pid is not None:
                    edges.setdefault(pid, []).extend(entities)
            for k, v in self.constants_of(ann, ptr).items():
                edges.setdefault(k, v)
            body = edges
            if reverse:
                body["@reverse"] = reverse
            if ann.get("x-jsonld-graph") is True:
                if body:
                    node["@graph"] = [body]
            else:
                node.update(body)
            return [node] if node else []

        if isinstance(value, list):
            item_entities: list = []
            for i, v in enumerate(value):
                iptrs = []
                for sp in srcs:
                    snode = self.node(sp)
                    if not isinstance(snode, dict):
                        continue
                    if isinstance(snode.get("prefixItems"), list) \
                            and i < len(snode["prefixItems"]):
                        iptrs.append(f"{sp}/prefixItems/{i}")
                    elif isinstance(snode.get("items"), (dict, bool)):
                        iptrs.append(f"{sp}/items")
                    elif isinstance(snode.get("items"), list):
                        if i < len(snode["items"]):
                            iptrs.append(f"{sp}/items/{i}")
                        elif isinstance(snode.get("additionalItems"),
                                        (dict, bool)):
                            iptrs.append(f"{sp}/additionalItems")
                if iptrs:
                    if not hasattr(self, "_ipath"):
                        self._ipath = []
                    self._ipath.append(f"/{i}")
                    try:
                        item_entities.extend(self.expand(iptrs[0], v))
                    finally:
                        self._ipath.pop()
                else:
                    item_entities.append({"@value": v})
            if cont == "@list":
                return [{"@list": item_entities}]
            if cont in ("@language", "@index"):
                raise ResolutionError(
                    f"container {cont} applies to object values", ptr)
            return item_entities

        # scalar
        if "x-jsonld-self" in ann:
            node = {"@id": _self_id(
                ann["x-jsonld-self"], value, siblings or {}, ptr,
                "".join(getattr(self, "_ipath", [])))}
            if "x-jsonld-type" in ann:
                node["@type"] = ann["x-jsonld-type"]
            return [node]
        if "x-jsonld-value" in ann:
            node = {}
            if "x-jsonld-type" in ann:
                node["@type"] = ann["x-jsonld-type"]
            lit_ann = {k: v for k, v in ann.items()
                       if k not in ("x-jsonld-value", "x-jsonld-type")}
            node[ann["x-jsonld-value"]] = [self.literal(lit_ann, value,
                                                        ptr)]
            for k, v in self.constants_of(ann, ptr).items():
                node.setdefault(k, v)
            return [node]
        if "x-jsonld-type" in ann:
            raise ResolutionError(
                "A JSON-LD type can only be assigned to an object value",
                f"{ptr}/x-jsonld-type", facet="type",
                instance_location="".join(getattr(self, "_ipath", [])))
        return [self.literal(ann, value, ptr)]


def promote(schema: Any, instance: Any, *,
            validate: bool = True, resources: dict | None = None,
            assert_formats: bool | None = None) -> list[Any]:
    """Promote a (valid) instance to expanded-form JSON-LD.

    Returns the expanded document (a list of node objects, per the
    JSON-LD expanded form).  Raises :class:`ResolutionError` on
    annotation errors and ``ValueError`` on dialect/validation
    failures (the caller maps those to exit codes).
    """
    from jsonschema_ray.spec.jschema import compile_schema

    dialect = schema.get("$schema") if isinstance(schema, dict) else None
    if isinstance(dialect, str) and any(t in dialect
                                        for t in _OLD_DIALECTS):
        raise ValueError(
            "rdf requires a 2019-09 or 2020-12 base dialect (annotation "
            f"collection); got {dialect!r} — run `upgrade` first")
    cs = compile_schema(schema, resources=resources,
                        assert_formats=assert_formats)
    if validate:
        errs = cs.validate(instance)
        if errs:
            raise ValueError("instance does not match the schema: " +
                             "; ".join(e[2] for e in errs[:5]))
    ex = _Expander(cs)
    entities = ex.expand("", instance)
    out = [e for e in entities
           if isinstance(e, dict) and e and "@value" not in e]
    return out + ex.hoisted


def flatten(expanded: list) -> list:
    """JSON-LD flattening: label every node object (blank nodes
    ``_:b0``, ``_:b1``, … in depth-first encounter order), hoist nested
    node objects to the top level and replace them with ``@id``
    references (docs/rdf.markdown --flatten)."""
    out: list = []
    counter = [0]

    def label(node: dict) -> str:
        if "@id" not in node:
            node["@id"] = f"_:b{counter[0]}"
            counter[0] += 1
        return node["@id"]

    def walk(node: dict) -> dict:
        nid = label(node)
        flat = {"@id": nid}
        for k, v in node.items():
            if k == "@id":
                continue
            if k == "@type":
                flat["@type"] = v
                continue
            if k == "@graph":
                flat["@graph"] = [walk(g) for g in v]
                continue
            vals = []
            for item in (v if isinstance(v, list) else [v]):
                if isinstance(item, dict) and "@value" not in item \
                        and "@list" not in item:
                    ref = walk(item)
                    vals.append({"@id": ref["@id"]})
                else:
                    vals.append(item)
            flat[k] = vals
        out.append(flat)
        return flat

    roots = []
    for node in expanded:
        walk(node)
    # depth-first walk appends children after parents in encounter
    # order; keep insertion order (parents first)
    del roots
    return out


def compact(expanded: list, context_doc: Any) -> dict:
    """JSON-LD compaction against a context document (either a raw
    term map or wrapped in ``@context``): term substitution, ``@vocab``
    shortening, type/@id/@list value collapsing; the supplied context
    is appended verbatim as the trailing ``@context`` member."""
    raw_ctx = context_doc.get("@context", context_doc) \
        if isinstance(context_doc, dict) else None
    if not isinstance(raw_ctx, dict):
        raise ResolutionError("Invalid context document", "")
    vocab = raw_ctx.get("@vocab") if isinstance(raw_ctx.get("@vocab"),
                                                str) else None
    terms: dict[str, dict] = {}
    for name, df in raw_ctx.items():
        if name.startswith("@"):
            continue
        if isinstance(df, str):
            terms[name] = {"@id": df}
        elif isinstance(df, dict) and isinstance(df.get("@id"), str):
            terms[name] = dict(df)
        else:
            raise ResolutionError("Invalid term definition", f"/{name}")
    # expand prefixed @type values in term definitions (xsd:date)
    for df in terms.values():
        t = df.get("@type")
        if isinstance(t, str) and ":" in t and not _IRI.match(t):
            pfx, _, suffix = t.partition(":")
            if pfx in terms:
                df["@type"] = terms[pfx]["@id"] + suffix

    iri_to_term = {}
    for name, df in terms.items():
        iri_to_term.setdefault(df["@id"], name)

    def compact_iri(iri: str) -> str:
        if iri in iri_to_term:
            return iri_to_term[iri]
        if vocab and iri.startswith(vocab):
            return iri[len(vocab):]
        return iri

    def term_def(iri: str) -> dict:
        return terms.get(iri_to_term.get(iri, ""), {})

    def compact_value(v: Any, df: dict) -> Any:
        if isinstance(v, dict) and "@list" in v:
            return [compact_value(x, df) for x in v["@list"]]
        if isinstance(v, dict) and "@value" in v:
            extra = {k for k in v if k != "@value"}
            if not extra and "@type" not in df and "@language" not in df:
                return v["@value"]
            if v.get("@type") == df.get("@type") and extra == {"@type"}:
                return v["@value"]
            if v.get("@language") == df.get("@language") \
                    and extra == {"@language"}:
                return v["@value"]
            return {k: (compact_iri(x) if k == "@type"
                        and isinstance(x, str) else x)
                    for k, x in v.items()}
        if isinstance(v, dict) and set(v) == {"@id"}:
            if df.get("@type") == "@id":
                return compact_iri(v["@id"])
            return {"@id": compact_iri(v["@id"])}
        if isinstance(v, dict):
            return compact_node(v)
        return v

    def compact_node(node: dict) -> dict:
        out: dict = {}
        for k, v in node.items():
            if k == "@id":
                out["@id"] = compact_iri(v)
            elif k == "@type":
                tv = [compact_iri(t) for t in
                      (v if isinstance(v, list) else [v])]
                out["@type"] = tv[0] if len(tv) == 1 else tv
            elif k == "@graph":
                out["@graph"] = [compact_node(g) for g in v]
            else:
                df = term_def(k)
                vals = [compact_value(x, df)
                        for x in (v if isinstance(v, list) else [v])]
                if len(vals) == 1 and not isinstance(vals[0], list):
                    vals = vals[0]
                elif len(vals) == 1 and isinstance(vals[0], list):
                    vals = vals[0]      # collapsed @list
                out[compact_iri(k)] = vals
        return out

    if len(expanded) == 1:
        result = compact_node(expanded[0])
    elif not expanded:
        result = {}
    else:
        result = {"@graph": [compact_node(n) for n in expanded]}
    result["@context"] = raw_ctx
    return result


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
