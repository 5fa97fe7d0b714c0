"""Explaining evaluator — reference-parity validation error output.

Re-implements the blaze evaluator's human-readable failure reporting
(``vendor/blaze/src/evaluator/evaluator_describe.cc`` messages +
``output_simple.cc`` buffering/ordering): evaluating an instance
against a schema yields, on failure, the exact ordered list of
``(message, instance location, evaluate path)`` entries the reference
prints for its ``metaschema``/``validate`` verbs. Branch keywords
(anyOf/oneOf/not/if) buffer their subtree's failures and surface them
only when the branch keyword itself fails; everything else reports in
evaluation (post-) order.

Driver-side by design: this explains SINGLE documents (schemas under
``metaschema``, single instances under ``validate``); bulk datasets
flow through the vectorized CheckPlan engine instead.
"""

from __future__ import annotations

import json
import os
import re

from jsonschema_ray.spec.ecmaregex import ecma_compile as _ecma
from dataclasses import dataclass
from typing import Any
from urllib.parse import urljoin

_HERE = os.path.dirname(os.path.abspath(__file__))
_OFFICIAL_DIR = os.path.join(_HERE, "..", "schemas", "official")


def _load_official() -> dict[str, Any]:
    docs: dict[str, Any] = {}
    for root, _dirs, names in os.walk(_OFFICIAL_DIR):
        for n in sorted(names):
            if not n.endswith(".json"):
                continue
            with open(os.path.join(root, n)) as f:
                doc = json.load(f)
            did = doc.get("$id") or doc.get("id")
            if not isinstance(did, str):
                continue
            base = did.rstrip("#")
            docs[base] = doc
            docs[base + "#"] = doc
            # both schemes resolve (the reference's resolver registers
            # http:// and https:// aliases for official schemas)
            if base.startswith("http://"):
                alt = "https://" + base[len("http://"):]
            else:
                alt = "http://" + base[len("https://"):]
            docs[alt] = doc
            docs[alt + "#"] = doc
    return docs


_OFFICIAL: dict[str, Any] | None = None


def official_registry() -> dict[str, Any]:
    global _OFFICIAL
    if _OFFICIAL is None:
        _OFFICIAL = _load_official()
    return _OFFICIAL


def _type_name(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _stringify(v: Any) -> str:
    """Reference JSON value rendering inside messages (stringify)."""
    from jsonschema_ray.spec.format import prettify_json

    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
    return prettify_json(v) if isinstance(v, float) else \
        json.dumps(v, ensure_ascii=False)


def _escape(s: str) -> str:
    return '"' + s.replace('"', '\\"') + '"'


def _esc_ptr(tok: str) -> str:
    return tok.replace("~", "~0").replace("/", "~1")


@dataclass
class Entry:
    message: str
    instance_location: str
    evaluate_path: str
    schema_location: str = ""     # absoluteKeywordLocation


class ExplainError(ValueError):
    pass


def _enum_message(target: Any, values: list) -> str:
    tn = _type_name(target)
    if len(values) == 1:
        return (f"The {tn} value was expected to equal the constant "
                f"{_stringify(values[0])}")
    rendered = [_stringify(v) for v in sorted(
        values, key=lambda x: (str(type(x)), str(x)))]
    # the reference sorts enum choices by their serialized form
    rendered = sorted(_stringify(v) for v in values)
    head = ", ".join(rendered[:-1])
    sep = ", and " if len(rendered) > 2 else " and "
    return (f"The {_type_name(target)} value {_stringify(target)} was "
            f"expected to equal one of the following values: "
            f"{head}{sep}{rendered[-1]}")


class Explainer:
    """Evaluate ``instance`` against a schema document with full
    reference resolution over ``resources`` (official metaschemas are
    always available), collecting reference-parity failure entries."""

    def __init__(self, resources: dict[str, Any] | None = None,
                 assert_formats: bool = False):
        self.resources = dict(official_registry())
        if resources:
            self.resources.update(resources)
        self.assert_formats = assert_formats

    # -- resolution ---------------------------------------------------
    def _resolve(self, uri: str) -> Any:
        base = uri.rstrip("#")
        doc = self.resources.get(uri) or self.resources.get(base)
        if doc is None:
            raise ExplainError(f"unresolvable schema: {uri!r}")
        return doc

    def validate(self, schema: Any, instance: Any,
                 base_uri: str = "",
                 trace: bool = False,
                 default_dialect: str | None = None,
                 lex_prefix: str = "",
                 fast: bool = False
                 ) -> tuple[bool, list[Entry]]:
        self._default_dialect = default_dialect
        self._lex_prefix = lex_prefix
        self._fast = fast
        self._trace = [] if trace else None
        self._annos: list[tuple[str, str, Any]] = []   # (ep, iptr, value)
        # pre-2019 dialects have no annotation machinery (the blaze
        # compiler only emits annotation instructions for vocabulary-
        # aware dialects) — fail_directory_json.sh: draft-04 validity
        # reports carry no annotations
        ds = schema.get("$schema") if isinstance(schema, dict) else None
        if not isinstance(ds, str):
            ds = default_dialect
        era = ds
        for _hop in range(3):
            if not isinstance(era, str) or "2019-09" in era \
                    or "2020-12" in era or "draft-0" in era:
                break
            meta = self.resources.get(era.rstrip("#"))
            if not isinstance(meta, dict):
                break
            vocab = meta.get("$vocabulary")
            if isinstance(vocab, dict) and any(
                    u.rstrip("#").endswith("/format-assertion")
                    for u in vocab):
                # declaring the format-assertion vocabulary (required
                # OR optional) turns format into an assertion
                self.assert_formats = True
            era = meta.get("$schema")
        self._annotations_enabled = bool(
            isinstance(era, str) and ("2019-09" in era
                                      or "2020-12" in era))
        self._ver = _dialect_ver_of(era if isinstance(era, str) else ds)
        out: list[Entry] = []
        scopes: list[tuple[str, Any]] = []   # (base uri, resource doc)
        self._root_base = base_uri
        # (evaluate-path prefix, target uri, target lexical pointer):
        # maps evaluate paths through $ref jumps onto lexical schema
        # locations (absoluteKeywordLocation)
        self._ref_frames: list[tuple[str, str, str]] = []
        ok = self._eval(schema, base_uri, instance, "", "", out, scopes)
        for e in out:
            if not e.schema_location:
                e.schema_location = self._abs_for(e.evaluate_path)
        return ok, out

    def annotations(self) -> list[dict]:
        """Grouped successful-evaluation annotations, reference order
        (group_annotations: by instance location then evaluate path;
        values in emission order)."""
        groups: dict[tuple[str, str], list] = {}
        for ep, iptr, value in self._annos:
            groups.setdefault((iptr, ep), []).append(value)
        out = []
        for (iptr, ep) in sorted(groups):
            out.append({"keywordLocation": ep,
                        "absoluteKeywordLocation": self._abs_for(ep),
                        "instanceLocation": iptr,
                        "annotation": groups[(iptr, ep)]})
        return out

    def _annotate(self, ep: str, iptr: str, value: Any) -> None:
        if getattr(self, "_fast", False):
            return   # FastValidation collects no annotations
        if getattr(self, "_annotations_enabled", True):
            self._annos.append((ep, iptr, value))
            self._trace_event("annotation", ep, iptr, "AnnotationEmit",
                              value)

    def _abs_for(self, ep: str) -> str:
        best = ("", self._root_base,
                getattr(self, "_lex_prefix", ""))
        for prefix, uri, tptr in self._ref_frames:
            if ep.startswith(prefix + "/") and len(prefix) >= len(best[0]):
                best = (prefix, uri, tptr)
        prefix, uri, tptr = best
        return f"{uri.rstrip('#')}#{tptr}{ep[len(prefix):]}"

    # -- the evaluator ------------------------------------------------
    def _subresource(self, sch: dict, base: str) -> str:
        rid = sch.get("$id") or (
            sch.get("id") if "$schema" in sch
            and "draft-0" in str(sch.get("$schema")) else None)
        if isinstance(rid, str) and "://" in urljoin(base or "", rid):
            return urljoin(base or "", rid).rstrip("#")
        return base

    def _eval(self, sch: Any, base: str, inst: Any, iptr: str,
              epath: str, out: list[Entry], scopes: list) -> bool:
        if sch is True or sch == {}:
            return True
        if sch is False:
            if epath:   # a top-level false schema reports no entries
                out.append(Entry(
                    "No instance is expected to succeed against the "
                    "false schema", iptr, epath))
            return False
        if not isinstance(sch, dict):
            raise ExplainError("subschema is not a schema")

        new_base = self._subresource(sch, base)
        pushed = False
        if new_base != base or not scopes:
            scopes.append((new_base, sch))
            pushed = True
        try:
            return self._eval_keywords(sch, new_base, inst, iptr, epath,
                                       out, scopes)
        finally:
            if pushed:
                scopes.pop()

    def _eval_keywords(self, sch: dict, base: str, inst: Any, iptr: str,
                       epath: str, out: list[Entry],
                       scopes: list) -> bool:
        prev_ver = getattr(self, "_ver", 2020)
        prev_fmt = self.assert_formats
        ds = sch.get("$schema")
        if isinstance(ds, str):
            self._ver = _dialect_ver_of(ds)
        if isinstance(sch.get("x-format-assertion"), bool):
            # per-subtree format-assertion opt-in/out
            # (docs/validate.markdown:53-61)
            self.assert_formats = sch["x-format-assertion"]
        try:
            return self._eval_keywords_inner(sch, base, inst, iptr,
                                             epath, out, scopes)
        finally:
            self._ver = prev_ver
            self.assert_formats = prev_fmt

    def _eval_keywords_inner(self, sch: dict, base: str, inst: Any,
                             iptr: str, epath: str, out: list[Entry],
                             scopes: list) -> bool:
        ok = True
        tn = _type_name(inst)

        def fail(msg: str, ep: str, ip: str = iptr):
            out.append(Entry(msg, ip, ep))

        # $ref family evaluates first (draft<=7: $ref ignores siblings)
        ref_only = getattr(self, "_ver", 2020) <= 7 \
            and isinstance(sch.get("$ref"), str)
        for kw in ("$ref", "$recursiveRef", "$dynamicRef"):
            v = sch.get(kw)
            if not isinstance(v, str):
                continue
            ep = f"{epath}/{_esc_ptr(kw)}"
            sub: list[Entry] = []
            if kw == "$ref":
                target, tbase, tptr = self._ref_target(v, base, scopes)
                self._ref_frames.append((ep, tbase, tptr))
                good = self._eval(target, tbase, inst, iptr, ep, sub,
                                  scopes)
                if not good:
                    out.extend(sub)
                    fail(f"The {tn} value was expected to validate "
                         f"against the referenced schema", ep)
                    return False
                if ref_only:
                    return ok
            else:
                anchor = v.lstrip("#")
                target, tbase, tptr = self._dynamic_target(anchor, scopes,
                                                           base, v)
                self._ref_frames.append((ep, tbase, tptr))
                good = self._eval(target, tbase, inst, iptr, ep, sub,
                                  scopes)
                if not good:
                    out.extend(sub)
                    if kw == "$dynamicRef":
                        fail(f"The {tn} value was expected to validate "
                             f"against the first subschema in scope that "
                             f"declared the dynamic anchor "
                             f"{_escape(anchor)}", ep)
                    else:
                        fail(f"The {tn} value was expected to validate "
                             f"against the first subschema in scope that "
                             f"declared a recursive anchor", ep)
                    return False

        # annotation instructions sit between references and
        # assertions in the template, alphabetical
        # (pass_no_identifier_ref_without_resolve.sh /
        # pass_verbose.sh emission orders)
        for akw in ("default", "deprecated", "description", "examples",
                    "readOnly", "title", "writeOnly"):
            if akw in sch:
                self._annotate(f"{epath}/{akw}", iptr, sch[akw])
        if isinstance(sch.get("format"), str) and isinstance(inst, str) \
                and not self.assert_formats:
            self._annotate(f"{epath}/format", iptr, sch["format"])
        # unknown keywords annotate with their raw value under
        # vocabulary-aware dialects (blaze unknown-keyword handler;
        # pass_trace_unknown_keyword.sh)
        if getattr(self, "_annotations_enabled", False):
            for ukw in sorted(sch):
                if ukw in _KNOWN_KEYWORDS or getattr(
                        self, "_kw_" + re.sub(r"[^A-Za-z]", "_", ukw),
                        None) is not None:
                    continue
                self._annotate(f"{epath}/{_esc_ptr(ukw)}", iptr,
                               sch[ukw])
        # the fast-props fusion context applies one level deep only
        _fast_prop_level = getattr(self, "_in_fast_props", False)
        self._in_fast_props = False
        for kw in sorted(sch):
            v = sch[kw]
            ep = f"{epath}/{_esc_ptr(kw)}"
            handler = getattr(self, "_kw_" + re.sub(r"[^A-Za-z]", "_",
                                                    kw), None)
            if handler is None:
                continue
            if not self._applies(kw, v, sch, inst):
                continue
            name = _instr_name(kw, v, sch)
            if (kw == "type" and _fast_prop_level
                    and len(sch) == 1
                    and name == "AssertionTypeStrict"):
                # fast-mode fusion: a one-keyword {"type": T} property
                # subschema becomes a member-scoped type assertion
                # (postprocess.h AssertionPropertyTypeStrict)
                name = "AssertionPropertyTypeStrict"
            # FastValidation drops the LogicalWhenType wrapper around
            # unrolled properties: per-property fused instructions are
            # stepped directly (compile_simple_properties fast path +
            # postprocess AssertionPropertyTypeStrict rewrite;
            # pass_trace_fast.sh)
            fast_unrolled = (getattr(self, "_fast", False)
                             and kw == "properties"
                             and name == "LogicalWhenType")
            if not fast_unrolled:
                self._trace_event("push", ep, iptr, name)
            amark = len(self._annos)
            good = handler(v, sch, base, inst, iptr, ep, out, scopes)
            if not good:
                del self._annos[amark:]
            if not fast_unrolled:
                self._trace_event("pass" if good else "fail", ep, iptr,
                                  name)
            if not good:
                ok = False
                break   # instruction sequences stop at the first
                # failure (fail_trace.sh: /type never runs after
                # /properties fails)
        return ok

    def _applies(self, kw: str, v, sch: dict, inst) -> bool:
        """Does this keyword compile to an instruction AT ALL for this
        instance shape? (the trace only shows applicable
        instructions — a `properties` over a non-object compiles to a
        type-guarded loop that still traces, but pure annotations
        never do)"""
        return True

    def _trace_event(self, kind: str, ep: str, iptr: str,
                     name: str, value: Any = None) -> None:
        if getattr(self, "_trace", None) is None:
            return
        self._trace.append((kind, ep, iptr, name,
                            self._abs_for(ep), value))

    # -- reference targets --------------------------------------------
    def _ref_target(self, ref: str, base: str,
                    scopes: list) -> tuple[Any, str, str]:
        dest = urljoin(base or "", ref) if base or "://" in ref else ref
        dbase, _, frag = dest.partition("#")
        if dbase:
            doc = self._resolve(dbase)
        else:
            doc = scopes[-1][1] if scopes else None
            dbase = base
        if frag.startswith("/"):
            node = doc
            for tok in frag[1:].split("/"):
                tok = tok.replace("~1", "/").replace("~0", "~")
                node = node[int(tok)] if isinstance(node, list) \
                    else node[tok]
            return node, dbase, frag
        if frag:   # plain-name anchor within doc
            found = _find_anchor_ptr(doc, frag, "")
            if found is None:
                raise ExplainError(f"unresolvable anchor {frag!r}")
            return found[0], dbase, found[1]
        return doc, dbase, ""

    def _dynamic_target(self, anchor: str, scopes: list, base: str,
                        raw: str) -> tuple[Any, str, str]:
        # outermost dynamic scope wins ($dynamicRef semantics)
        for sbase, sdoc in scopes:
            node = _find_dynamic_anchor(sdoc, anchor)
            if node is not None:
                return node, sbase, ""
        # lexical fallback
        return self._ref_target(raw, base, scopes)

    # -- assertions ----------------------------------------------------
    def _kw_type(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        types = v if isinstance(v, list) else [v]
        tn = _type_name(inst)

        def match(t):
            return (t == tn or (t == "number" and tn == "integer")
                    or (t == "integer"
                        and getattr(self, "_ver", 2020) >= 6
                        and isinstance(inst, float)
                        and not isinstance(inst, bool)
                        and inst.is_integer()))

        if any(isinstance(t, str) and match(t) for t in types):
            return True
        if isinstance(v, str):
            out.append(Entry(
                f"The value was expected to be of type {v} but it was "
                f"of type {tn}", iptr, ep))
        else:
            names = [str(t) for t in types]
            if len(names) == 1:
                listing = names[0]
            else:
                listing = ", ".join(names[:-1]) + (
                    ", or " if len(names) > 2 else " or ") + names[-1]
            shown = tn
            if "integer" in names and "number" not in names \
                    and isinstance(inst, float):
                shown = "number"
            out.append(Entry(
                f"The value was expected to be of type {listing} but it "
                f"was of type {shown}", iptr, ep))
        return False

    def _kw_enum(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        if any(_json_equal(inst, x) for x in v):
            return True
        if not v:
            out.append(Entry(
                f"The {_type_name(inst)} value was not expected to "
                f"validate against the empty enumeration", iptr, ep))
            return False
        out.append(Entry(_enum_message(inst, v), iptr, ep))
        return False

    def _kw_const(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        if _json_equal(inst, v):
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value was expected to equal the "
            f"constant {_stringify(v)}", iptr, ep))
        return False

    def _kw_anyOf(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        subs: list[Entry] = []
        good = False
        for i, branch in enumerate(v):
            b: list[Entry] = []
            amark = len(self._annos)
            if self._eval(branch, base, inst, iptr, f"{ep}/{i}", b,
                          scopes):
                good = True
            else:
                del self._annos[amark:]
                subs.extend(b)
        if good:
            return True
        out.extend(subs)
        n = len(v)
        tail = (f"at least one of the {n} given subschemas" if n > 1
                else "the given subschema")
        out.append(Entry(
            f"The {_type_name(inst)} value was expected to validate "
            f"against {tail}", iptr, ep))
        return False

    def _kw_oneOf(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        subs: list[Entry] = []
        matches = 0
        for i, branch in enumerate(v):
            b: list[Entry] = []
            amark = len(self._annos)
            if self._eval(branch, base, inst, iptr, f"{ep}/{i}", b,
                          scopes):
                matches += 1
            else:
                del self._annos[amark:]
                subs.extend(b)
        if matches == 1:
            return True
        if matches == 0:
            out.extend(subs)
        n = len(v)
        tail = (f"one and only one of the {n} given subschemas" if n > 1
                else "the given subschema")
        out.append(Entry(
            f"The {_type_name(inst)} value was expected to validate "
            f"against {tail}", iptr, ep))
        return False

    def _kw_allOf(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        ok = True
        for i, branch in enumerate(v):
            if not self._eval(branch, base, inst, iptr, f"{ep}/{i}", out,
                              scopes):
                ok = False
        if ok:
            return True
        n = len(v)
        tail = (f"the {n} given subschemas" if n > 1
                else "the given subschema")
        out.append(Entry(
            f"The {_type_name(inst)} value was expected to validate "
            f"against {tail}", iptr, ep))
        return False

    def _kw_not(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        b: list[Entry] = []
        amark = len(self._annos)
        if not self._eval(v, base, inst, iptr, ep, b, scopes):
            del self._annos[amark:]
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value was expected to not validate "
            f"against the given subschema, but it did", iptr, ep))
        return False

    def _kw_if(self, v, sch, base, inst, iptr, ep, out, scopes) -> bool:
        b: list[Entry] = []
        amark = len(self._annos)
        cond = self._eval(v, base, inst, iptr, ep, b, scopes)
        if not cond:
            del self._annos[amark:]
        branch = sch.get("then") if cond else sch.get("else")
        if branch is None:
            return True
        kw = "then" if cond else "else"
        sub: list[Entry] = []
        if self._eval(branch, base, inst, iptr,
                      ep.rsplit("/", 1)[0] + "/" + kw, sub, scopes):
            return True
        out.extend(sub)
        out.append(Entry(
            f"The {_type_name(inst)} value was expected to validate "
            f"against the given conditional", iptr,
            ep.rsplit("/", 1)[0] + "/" + kw))
        return False

    def _kw_properties(self, v, sch, base, inst, iptr, ep, out,
                       scopes) -> bool:
        if not isinstance(inst, dict):
            return True
        ok = True
        fused0 = all(isinstance(p, dict) and set(p) <= {"type"}
                     and isinstance(p.get("type"), str)
                     for p in v.values())
        # flattened simple-type properties evaluate as individual
        # instructions in template (alphabetical) order; the hashed
        # loop iterates instance members (pass_directory_verbose.sh
        # vs metaschema pass_json.sh)
        names = sorted(n for n in v if n in inst) if fused0 \
            else [n for n in inst if n in v]
        in_fast = getattr(self, "_fast", False) \
            and not _properties_as_loop(sch)
        for name in names:
            sub = v.get(name)
            if sub is None:
                continue
            prev_fp = getattr(self, "_in_fast_props", False)
            self._in_fast_props = in_fast
            try:
                good = self._eval(sub, base, inst[name],
                                  f"{iptr}/{_esc_ptr(name)}",
                                  f"{ep}/{_esc_ptr(name)}", out, scopes)
            finally:
                self._in_fast_props = prev_fp
            if not good:
                ok = False
                break   # the loop stops at the first failing member
            self._annotate(ep, iptr, name)
        if ok:
            return True
        n = len(v)
        fused = all(isinstance(p, dict)
                    and {k for k in p
                         if not k.startswith("x-jsonld-")} <= {"type"}
                    and isinstance(p.get("type"), str)
                    for p in v.values())
        if n == 1:
            tail = "the single defined property subschema"
        elif fused:
            # simple per-property type checks are flattened by the
            # optimizer; the wrapper cannot count them
            # (describe.cc LogicalWhenType-properties)
            tail = "the defined properties subschemas"
        else:
            tail = f"the {n} defined properties subschemas"
        out.append(Entry(
            f"The object value was expected to validate against {tail}",
            iptr, ep))
        return False

    def _kw_patternProperties(self, v, sch, base, inst, iptr, ep, out,
                              scopes) -> bool:
        if not isinstance(inst, dict):
            return True
        ok = True
        for pattern, sub in v.items():
            rx = _ecma(pattern)
            for name, val in inst.items():
                if rx.search(name) is None:
                    continue
                if not self._eval(sub, base, val,
                                  f"{iptr}/{_esc_ptr(name)}",
                                  f"{ep}/{_esc_ptr(pattern)}", out,
                                  scopes):
                    ok = False
        if ok:
            return True
        out.append(Entry(
            "The object value was expected to validate against the "
            "defined pattern properties subschemas", iptr, ep))
        return False

    def _kw_additionalProperties(self, v, sch, base, inst, iptr, ep, out,
                                 scopes) -> bool:
        if not isinstance(inst, dict):
            return True
        props = sch.get("properties") or {}
        pats = [_ecma(p) for p in (sch.get("patternProperties")
                                   or {})]
        ok = True
        for name, val in inst.items():
            if name in props or any(p.search(name) for p in pats):
                continue
            if v is False:
                out.append(Entry(
                    f"The object value was not expected to define the "
                    f"property {_escape(name)}",
                    f"{iptr}/{_esc_ptr(name)}",
                    f"{ep}/{_esc_ptr(name)}"))
                ok = False
                continue
            if not self._eval(v, base, val, f"{iptr}/{_esc_ptr(name)}",
                              ep, out, scopes):
                ok = False
            else:
                self._annotate(ep, iptr, name)
        if ok:
            return True
        if v is not False:
            out.append(Entry(
                "The object value was expected to validate against the "
                "additional properties subschema", iptr, ep))
        return False

    def _kw_propertyNames(self, v, sch, base, inst, iptr, ep, out,
                          scopes) -> bool:
        if not isinstance(inst, dict):
            return True
        ok = True
        for name in inst:
            # blaze pushes the property name onto the instance location
            # while evaluating propertyNames (evaluator_dispatch LoopKeys)
            if not self._eval(v, base, name, f"{iptr}/{_esc_ptr(name)}",
                              ep, out, scopes):
                ok = False
        return ok

    def _kw_required(self, v, sch, base, inst, iptr, ep, out,
                     scopes) -> bool:
        if not isinstance(inst, dict) or not isinstance(v, list):
            return True
        missing = [name for name in v if name not in inst]
        if not missing:
            return True
        if len(missing) == 1:
            out.append(Entry(
                f"The object value was expected to define the property "
                f"{_escape(missing[0])}", iptr, ep))
        else:
            names = sorted(missing)
            listing = ", ".join(_escape(n) for n in names[:-1]) + (
                ", and " if len(names) > 2 else " and ") + \
                _escape(names[-1])
            out.append(Entry(
                f"The object value was expected to define properties "
                f"{listing}", iptr, ep))
        return False

    def _kw_items(self, v, sch, base, inst, iptr, ep, out,
                  scopes) -> bool:
        if not isinstance(inst, list):
            return True
        ok = True
        if isinstance(v, list):   # draft<=2019 tuple form
            for i, sub in enumerate(v):
                if i >= len(inst):
                    break
                if not self._eval(sub, base, inst[i], f"{iptr}/{i}",
                                  f"{ep}/{i}", out, scopes):
                    ok = False
            return ok
        start = len(sch["prefixItems"]) if isinstance(
            sch.get("prefixItems"), list) else 0
        for i in range(start, len(inst)):
            if not self._eval(v, base, inst[i], f"{iptr}/{i}", ep, out,
                              scopes):
                ok = False
        if ok:
            if len(inst) > start:
                self._annotate(ep, iptr, True)
            return True
        out.append(Entry(
            "Every item in the array value was expected to validate "
            "against the given subschema", iptr, ep))
        return False

    def _kw_prefixItems(self, v, sch, base, inst, iptr, ep, out,
                        scopes) -> bool:
        if not isinstance(inst, list):
            return True
        ok = True
        for i, sub in enumerate(v):
            if i >= len(inst):
                break
            if not self._eval(sub, base, inst[i], f"{iptr}/{i}",
                              f"{ep}/{i}", out, scopes):
                ok = False
        return ok

    def _kw_minItems(self, v, sch, base, inst, iptr, ep, out,
                     scopes) -> bool:
        if not isinstance(inst, list) or len(inst) >= v:
            return True
        out.append(Entry(
            f"The array value was expected to contain at least {v} "
            f"item{'s' if v != 1 else ''} but it contained "
            f"{len(inst)} item{'s' if len(inst) != 1 else ''}",
            iptr, ep))
        return False

    def _kw_maxItems(self, v, sch, base, inst, iptr, ep, out,
                     scopes) -> bool:
        if not isinstance(inst, list) or len(inst) <= v:
            return True
        out.append(Entry(
            f"The array value was expected to contain at most {v} "
            f"item{'s' if v != 1 else ''} but it contained "
            f"{len(inst)} item{'s' if len(inst) != 1 else ''}",
            iptr, ep))
        return False

    def _kw_uniqueItems(self, v, sch, base, inst, iptr, ep, out,
                        scopes) -> bool:
        if v is not True or not isinstance(inst, list):
            return True
        seen = []
        for x in inst:
            if any(_json_equal(x, y) for y in seen):
                out.append(Entry(
                    "The array value was expected to not contain "
                    "duplicate items", iptr, ep))
                return False
            seen.append(x)
        return True

    def _kw_minimum(self, v, sch, base, inst, iptr, ep, out,
                    scopes) -> bool:
        if not isinstance(inst, (int, float)) or isinstance(inst, bool):
            return True
        if sch.get("exclusiveMinimum") is True:
            if inst > v:
                return True
            out.append(Entry(
                f"The {_type_name(inst)} value {_stringify(inst)} was "
                f"expected to be greater than the "
                f"{_type_name(v)} {_stringify(v)}", iptr, ep))
            return False
        if inst >= v:
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value {_stringify(inst)} was "
            f"expected to be greater than or equal to the "
            f"{_type_name(v)} {_stringify(v)}", iptr, ep))
        return False

    def _kw_maximum(self, v, sch, base, inst, iptr, ep, out,
                    scopes) -> bool:
        if not isinstance(inst, (int, float)) or isinstance(inst, bool):
            return True
        if sch.get("exclusiveMaximum") is True:
            if inst < v:
                return True
            out.append(Entry(
                f"The {_type_name(inst)} value {_stringify(inst)} was "
                f"expected to be less than the "
                f"{_type_name(v)} {_stringify(v)}", iptr, ep))
            return False
        if inst <= v:
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value {_stringify(inst)} was "
            f"expected to be less than or equal to the "
            f"{_type_name(v)} {_stringify(v)}", iptr, ep))
        return False

    def _kw_exclusiveMinimum(self, v, sch, base, inst, iptr, ep, out,
                             scopes) -> bool:
        if isinstance(v, bool) or not isinstance(inst, (int, float)) \
                or isinstance(inst, bool):
            return True
        if inst > v:
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value {_stringify(inst)} was "
            f"expected to be greater than the "
            f"{_type_name(v)} {_stringify(v)}", iptr, ep))
        return False

    def _kw_exclusiveMaximum(self, v, sch, base, inst, iptr, ep, out,
                             scopes) -> bool:
        if isinstance(v, bool) or not isinstance(inst, (int, float)) \
                or isinstance(inst, bool):
            return True
        if inst < v:
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value {_stringify(inst)} was "
            f"expected to be less than the "
            f"{_type_name(v)} {_stringify(v)}", iptr, ep))
        return False

    def _kw_multipleOf(self, v, sch, base, inst, iptr, ep, out,
                       scopes) -> bool:
        if not isinstance(inst, (int, float)) or isinstance(inst, bool):
            return True
        from fractions import Fraction

        if v and Fraction(str(inst)) % Fraction(str(v)) == 0:
            return True
        out.append(Entry(
            f"The {_type_name(inst)} value {_stringify(inst)} was "
            f"expected to be divisible by {_stringify(v)}", iptr, ep))
        return False

    def _kw_minLength(self, v, sch, base, inst, iptr, ep, out,
                      scopes) -> bool:
        if not isinstance(inst, str) or len(inst) >= v:
            return True
        out.append(Entry(
            f"The value was expected to consist of a string of at least "
            f"{v} character{'s' if v != 1 else ''} but it consisted of "
            f"{len(inst)} character{'s' if len(inst) != 1 else ''}",
            iptr, ep))
        return False

    def _kw_maxLength(self, v, sch, base, inst, iptr, ep, out,
                      scopes) -> bool:
        if not isinstance(inst, str) or len(inst) <= v:
            return True
        out.append(Entry(
            f"The value was expected to consist of a string of at most "
            f"{v} character{'s' if v != 1 else ''} but it consisted of "
            f"{len(inst)} character{'s' if len(inst) != 1 else ''}",
            iptr, ep))
        return False

    def _kw_pattern(self, v, sch, base, inst, iptr, ep, out,
                    scopes) -> bool:
        if not isinstance(inst, str):
            return True
        if _ecma(v).search(inst) is not None:
            return True
        # under propertyNames the failing value IS a property name
        # (blaze evaluator_describe.cc:414 "The property name ...")
        if "/propertyNames" in ep and iptr:
            out.append(Entry(
                f"The property name {_escape(inst)} was expected to "
                f"match the regular expression {_escape(v)}", iptr, ep))
            return False
        out.append(Entry(
            f"The string value {_escape(inst)} was expected to match "
            f"the regular expression {_escape(v)}", iptr, ep))
        return False

    def _kw_contains(self, v, sch, base, inst, iptr, ep, out,
                     scopes) -> bool:
        if not isinstance(inst, list):
            return True
        for i, x in enumerate(inst):
            b: list[Entry] = []
            if self._eval(v, base, x, f"{iptr}/{i}", ep, b, scopes):
                return True
        out.append(Entry(
            "The array value was expected to contain at least 1 "
            "matching item", iptr, ep))
        return False

    def _kw_dependencies(self, v, sch, base, inst, iptr, ep, out,
                         scopes) -> bool:
        if not isinstance(inst, dict) or not isinstance(v, dict):
            return True
        ok = True
        for name, dep in v.items():
            if name not in inst:
                continue
            if isinstance(dep, list):
                missing = [d for d in dep if d not in inst]
                if missing:
                    listing = ", ".join(
                        _escape(m) for m in sorted(missing))
                    out.append(Entry(
                        f"The object value defines the property "
                        f"{_escape(name)} so it was also expected to "
                        f"define the propert"
                        f"{'ies ' if len(missing) > 1 else 'y '}"
                        f"{listing}", iptr,
                        f"{ep}/{_esc_ptr(name)}"))
                    ok = False
            else:
                if not self._eval(dep, base, inst, iptr,
                                  f"{ep}/{_esc_ptr(name)}", out,
                                  scopes):
                    ok = False
        return ok

    def _kw_dependentRequired(self, v, sch, base, inst, iptr, ep, out,
                              scopes) -> bool:
        return self._kw_dependencies(
            {k: d for k, d in v.items() if isinstance(d, list)},
            sch, base, inst, iptr, ep, out, scopes)

    def _kw_dependentSchemas(self, v, sch, base, inst, iptr, ep, out,
                             scopes) -> bool:
        return self._kw_dependencies(
            {k: d for k, d in v.items() if not isinstance(d, list)},
            sch, base, inst, iptr, ep, out, scopes)

    _FORMAT_NAMES = {
        "uri": "URI", "uri-reference": "URI reference",
        "uri-template": "URI template", "iri": "IRI",
        "iri-reference": "IRI reference", "email": "email address",
        "idn-email": "internationalized email address",
        "ipv4": "IPv4 address", "ipv6": "IPv6 address",
        "hostname": "hostname",
        "idn-hostname": "internationalized hostname",
        "date-time": "RFC 3339 date-time", "date": "RFC 3339 full-date",
        "time": "RFC 3339 full-time", "duration": "RFC 3339 duration",
        "json-pointer": "JSON Pointer",
        "relative-json-pointer": "relative JSON Pointer",
        "uuid": "UUID", "regex": "regular expression",
    }

    def _kw_format(self, v, sch, base, inst, iptr, ep, out,
                   scopes) -> bool:
        if not self.assert_formats or not isinstance(inst, str):
            return True
        from jsonschema_ray.functions.formats import REGEX_FORMATS

        good = None
        try:
            import re as _re

            rx = REGEX_FORMATS.get(v)
            if rx is not None:
                good = _re.fullmatch(rx, inst) is not None
        except Exception:   # noqa: BLE001 — unknown format: annotation
            good = None
        if good is None or good:
            return good is None or good
        name = self._FORMAT_NAMES.get(v, v)
        out.append(Entry(
            f"The string value {_escape(inst)} was expected to "
            f"represent a valid {name}", iptr, ep))
        return False


def _dialect_ver_of(ds) -> int:
    if not isinstance(ds, str):
        return 2020
    for tag, v in (("2020-12", 2020), ("2019-09", 2019),
                   ("draft-07", 7), ("draft-06", 6), ("draft-04", 4),
                   ("draft-03", 3)):
        if tag in ds:
            return v
    return 2020


def _json_equal(a: Any, b: Any) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b or (isinstance(a, bool) and isinstance(b, bool)
                          and a == b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if type(a) is not type(b):
        return False
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(
            _json_equal(a[k], b[k]) for k in a)
    if isinstance(a, list):
        return len(a) == len(b) and all(
            _json_equal(x, y) for x, y in zip(a, b))
    return a == b


def _find_anchor_ptr(doc: Any, name: str, ptr: str):
    if isinstance(doc, dict):
        if doc.get("$anchor") == name or doc.get("$dynamicAnchor") == name:
            return doc, ptr
        nid = doc.get("$id") or doc.get("id")
        if isinstance(nid, str) and nid == f"#{name}":
            return doc, ptr
        for k, v in doc.items():
            found = _find_anchor_ptr(v, name, f"{ptr}/{_esc_ptr(k)}")
            if found is not None:
                return found
    elif isinstance(doc, list):
        for i, v in enumerate(doc):
            found = _find_anchor_ptr(v, name, f"{ptr}/{i}")
            if found is not None:
                return found
    return None


def _find_anchor(doc: Any, name: str) -> Any:
    if isinstance(doc, dict):
        if doc.get("$anchor") == name or doc.get("$dynamicAnchor") == name:
            return doc
        nid = doc.get("$id") or doc.get("id")
        if isinstance(nid, str) and nid == f"#{name}":
            return doc
        for v in doc.values():
            found = _find_anchor(v, name)
            if found is not None:
                return found
    elif isinstance(doc, list):
        for v in doc:
            found = _find_anchor(v, name)
            if found is not None:
                return found
    return None


def _find_dynamic_anchor(doc: Any, name: str) -> Any:
    if isinstance(doc, dict):
        if doc.get("$dynamicAnchor") == name \
                or doc.get("$recursiveAnchor") is True and name == "":
            return doc
    return None


# keywords that are known to the evaluator but compile to NO annotation
# instruction: structural/core keywords, subschema containers, branch
# keywords consumed by their parent handler, and annotation keywords the
# fixed emission list already covers (everything else is "unknown" and
# annotates with its raw value under 2019-09+ dialects)
_KNOWN_KEYWORDS = {
    "$schema", "$id", "id", "$ref", "$defs", "definitions", "$anchor",
    "$dynamicAnchor", "$dynamicRef", "$recursiveRef", "$recursiveAnchor",
    "$vocabulary", "$comment", "then", "else", "additionalItems",
    "minContains", "maxContains", "minProperties", "maxProperties",
    "unevaluatedProperties", "unevaluatedItems", "contentMediaType",
    "contentEncoding", "contentSchema", "extends", "disallow",
    "divisibleBy", "default", "deprecated", "description", "examples",
    "readOnly", "writeOnly", "title", "format",
}

_INSTR_NAMES = {
    "properties": "LoopPropertiesMatch",
    "dependencies": "AssertionPropertyDependencies",
    "dependentRequired": "AssertionPropertyDependencies",
    "enum": "AssertionEqualsAny",
    "const": "AssertionEqual",
    "$ref": "ControlJump",
    "anyOf": "LogicalOr",
    "allOf": "LogicalAnd",
    "oneOf": "LogicalXor",
    "not": "LogicalNot",
    "if": "LogicalCondition",
    "pattern": "AssertionRegex",
    "required": "AssertionDefinesAll",
    "uniqueItems": "AssertionUnique",
    "items": "LoopItems",
    "prefixItems": "AssertionArrayPrefix",
    "contains": "LoopContains",
    "multipleOf": "AssertionDivisible",
    "propertyNames": "LoopKeys",
    "additionalProperties": "LoopPropertiesExcept",
    "patternProperties": "LoopPropertiesRegex",
    "format": "AssertionStringType",
    "minimum": "AssertionGreaterEqual",
    "maximum": "AssertionLessEqual",
    "exclusiveMinimum": "AssertionGreater",
    "exclusiveMaximum": "AssertionLess",
    "minLength": "AssertionStringSizeGreater",
    "maxLength": "AssertionStringSizeLess",
    "minItems": "AssertionArraySizeGreater",
    "maxItems": "AssertionArraySizeLess",
    "minProperties": "AssertionObjectSizeGreater",
    "maxProperties": "AssertionObjectSizeLess",
    "$dynamicRef": "ControlDynamicAnchorJump",
    "$recursiveRef": "ControlDynamicAnchorJump",
}


def _properties_as_loop(sch: dict) -> bool:
    """blaze's unroll-vs-loop strategy for ``properties``
    (default_compiler_draft3.h properties_as_loop, sans the
    disjunctor refinements): hash-loop when the object is closed with
    optional members, or when the property set is large and mostly
    optional; otherwise unroll into per-property instructions under a
    LogicalWhenType wrapper."""
    props = sch.get("properties")
    if not isinstance(props, dict):
        return False
    size = len(props)
    req = {r for r in (sch.get("required") or [])
           if isinstance(r, str) and r in props}
    ap = sch.get("additionalProperties")
    if ap is False and len(req) < size:
        return True
    return len(req) <= (size // 4) and size > 5


def _instr_name(kw: str, v, sch: dict) -> str:
    if kw == "type":
        if isinstance(v, list):
            return "AssertionTypeStrictAny"
        if v == "number":
            # number admits both Integer and Real → the any variant
            return "AssertionTypeStrictAny"
        return "AssertionTypeStrict"
    if kw == "properties":
        return ("LoopPropertiesMatch" if _properties_as_loop(sch)
                else "LogicalWhenType")
    return _INSTR_NAMES.get(kw, kw)


def explain_against_metaschema(schema_doc: Any, dialect: str,
                               resources: dict | None = None,
                               assert_formats: bool = False,
                               trace: bool = False
                               ) -> tuple[bool, list[Entry]]:
    """Validate a schema DOCUMENT against its dialect's metaschema,
    reference-parity output (the ``metaschema`` verb's engine)."""
    ex = Explainer(resources, assert_formats=assert_formats)
    meta = ex._resolve(dialect)
    base = (meta.get("$id") or meta.get("id") or dialect).rstrip("#")
    ok, entries = ex.validate(meta, schema_doc, base, trace=trace)
    if trace:
        return ok, entries, ex._trace
    return ok, entries
