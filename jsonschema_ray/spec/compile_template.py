"""blaze Template emission for the ``compile`` verb.

Re-expresses the PUBLIC blaze compiler's serialized template format
(``vendor/blaze/src/compiler/compile_json.cc`` over the
``InstructionIndex`` / ``Value`` variant encodings in
``evaluator_instruction.h`` / ``evaluator_value.h``): a static walk of
the schema emitting ``[opcode, relative-schema-location,
relative-instance-location, absolute-keyword-location,
schema-resource, [value-variant...], children?]`` rows, one target per
statically referenced destination, with the exhaustive/fast mode
differences (annotations + wrapper elision + property-type fusions)
the reference's compile corpus pins.
"""

from __future__ import annotations

import os
from typing import Any
from urllib.parse import urljoin

JSON_VERSION = 5

# InstructionIndex (evaluator_instruction.h, numeric order)
OP = {name: i for i, name in enumerate([
    "AssertionFail", "AssertionDefines", "AssertionDefinesStrict",
    "AssertionDefinesAll", "AssertionDefinesAllStrict",
    "AssertionDefinesExactly", "AssertionDefinesExactlyStrict",
    "AssertionDefinesExactlyStrictHash3",
    "AssertionPropertyDependencies", "AssertionType", "AssertionTypeAny",
    "AssertionTypeStrict", "AssertionTypeStrictAny",
    "AssertionNotTypeStrictAny", "AssertionTypeStringBounded",
    "AssertionTypeStringUpper", "AssertionTypeArrayBounded",
    "AssertionTypeArrayUpper", "AssertionTypeObjectBounded",
    "AssertionTypeObjectUpper", "AssertionRegex",
    "AssertionStringSizeLess", "AssertionStringSizeGreater",
    "AssertionArraySizeLess", "AssertionArraySizeGreater",
    "AssertionObjectSizeLess", "AssertionObjectSizeGreater",
    "AssertionEqual", "AssertionEqualsAny",
    "AssertionEqualsAnyStringHash", "AssertionGreaterEqual",
    "AssertionLessEqual", "AssertionGreater", "AssertionLess",
    "AssertionUnique", "AssertionDivisible",
    "AssertionTypeIntegerBounded", "AssertionTypeIntegerBoundedStrict",
    "AssertionTypeIntegerLowerBound",
    "AssertionTypeIntegerLowerBoundStrict", "AssertionStringType",
    "AssertionPropertyType", "AssertionPropertyTypeEvaluate",
    "AssertionPropertyTypeStrict", "AssertionPropertyTypeStrictEvaluate",
    "AssertionPropertyTypeStrictAny",
    "AssertionPropertyTypeStrictAnyEvaluate", "AssertionArrayPrefix",
    "AssertionArrayPrefixEvaluate", "AssertionObjectPropertiesSimple",
    "AnnotationEmit", "AnnotationToParent", "AnnotationBasenameToParent",
    "Evaluate", "LogicalNot", "LogicalNotEvaluate", "LogicalOr",
    "LogicalAnd", "LogicalXor", "LogicalCondition", "LogicalWhenType",
    "LogicalWhenDefines", "LogicalWhenArraySizeGreater",
    "LoopPropertiesUnevaluated", "LoopPropertiesUnevaluatedExcept",
    "LoopPropertiesMatch", "LoopPropertiesMatchClosed", "LoopProperties",
    "LoopPropertiesEvaluate", "LoopPropertiesRegex",
    "LoopPropertiesRegexClosed", "LoopPropertiesStartsWith",
    "LoopPropertiesExcept", "LoopPropertiesType",
    "LoopPropertiesTypeEvaluate", "LoopPropertiesExactlyTypeStrict",
    "LoopPropertiesExactlyTypeStrictHash", "LoopPropertiesTypeStrict",
    "LoopPropertiesTypeStrictEvaluate", "LoopPropertiesTypeStrictAny",
    "LoopPropertiesTypeStrictAnyEvaluate", "LoopKeys", "LoopItems",
    "LoopItemsFrom", "LoopItemsUnevaluated", "LoopItemsType",
    "LoopItemsTypeStrict", "LoopItemsTypeStrictAny",
    "LoopItemsPropertiesExactlyTypeStrictHash",
    "LoopItemsPropertiesExactlyTypeStrictHash3",
    "LoopItemsIntegerBounded", "LoopItemsIntegerBoundedSized",
    "LoopContains", "ControlGroup", "ControlGroupWhenDefines",
    "ControlGroupWhenDefinesDirect", "ControlGroupWhenType",
    "ControlEvaluate", "ControlDynamicAnchorJump", "ControlJump"])}

# Value variant indices (evaluator_value.h `using Value = std::variant<...>`)
V_NONE = 0
V_JSON = 1
V_SET = 2
V_STRING = 3
V_PROPERTY = 4
V_STRINGS = 5
V_STRING_SET = 6
V_TYPES = 7
V_TYPE = 8
V_REGEX = 9
V_UNSIGNED = 10
V_RANGE = 11
V_BOOLEAN = 12
V_STRING_TYPE = 14
V_PROP_FILTER = 16
V_POINTER = 18

# JSON::Type enum order (core json value)
JSON_TYPE = {"null": 0, "boolean": 1, "integer": 2, "real": 3,
             "string": 4, "array": 5, "object": 6}

STRING_TYPE = {name: i for i, name in enumerate([
    "uri", "uri-reference", "uri-template", "iri", "iri-reference",
    "email", "idn-email", "ipv4", "ipv6", "hostname", "idn-hostname",
    "date-time", "date", "time", "partial-time", "duration",
    "json-pointer", "relative-json-pointer", "uuid", "regex", "color"])}

_ANNOTATION_KEYWORDS = ("default", "deprecated", "description",
                        "examples", "readOnly", "title", "writeOnly")


def _esc(tok: str) -> str:
    return tok.replace("~", "~0").replace("/", "~1")


class TemplateError(ValueError):
    pass


# Keywords with evaluation semantics the emitter does not implement:
# compiling them silently would produce a wrongly-permissive template,
# so reject loudly instead (the dataset engine's validate path covers
# them; this list shrinks as handlers land).
_UNSUPPORTED_REJECT = frozenset()


def _blaze_hash(resource: int, fragment: str) -> int:
    """The 53-bit FNV-1a label hash the blaze wire format keys dynamic
    anchors with (ports/javascript blazeHash): hash the anchor name,
    add the schema-resource id, mask to 53 bits."""
    mask = (1 << 53) - 1
    r = 14695981039346656037 & mask
    for ch in fragment:
        r ^= ord(ch)
        r = (r * 1099511628211) & mask
    return (resource + r) & mask

_RE_META = set("\\^$.|?*+()[]{}")


def _exact_regex(name: str) -> str:
    """Anchored regex matching exactly ``name`` (ECMA + RE2 safe)."""
    return "^" + "".join(
        "\\" + ch if ch in _RE_META else ch for ch in name) + "$"


def _doc_defines(doc, keyword: str) -> bool:
    """Does any object anywhere in the document define ``keyword``?
    (Deliberately blunt, mirroring blaze's document-wide
    ``unevaluatedItems`` tracking switch — compile.cc:485; a false
    positive only costs extra evaluation marks, never correctness.)"""
    if isinstance(doc, dict):
        if keyword in doc:
            return True
        return any(_doc_defines(v, keyword) for v in doc.values())
    if isinstance(doc, list):
        return any(_doc_defines(v, keyword) for v in doc)
    return False


class _Emitter:
    def __init__(self, root: Any, *, resources: dict | None,
                 default_dialect: str | None, default_id: str,
                 fast: bool, assert_formats: bool | None):
        self.root = root
        self.resources = resources or {}
        self.default_dialect = default_dialect
        self.default_id = default_id
        self.fast = fast
        self.assert_formats = assert_formats
        # frame: resource bases
        from jsonschema_ray.spec.jschema import _DocIndex, _dialect_ver, \
            _is_legacy_dialect

        from jsonschema_ray.spec.lintframe import _norm_dialect

        _dialect = root.get("$schema") if isinstance(root, dict) \
            and isinstance(root.get("$schema"), str) else default_dialect
        self.ver = _dialect_ver(
            {"$schema": _norm_dialect(_dialect)}) \
            if isinstance(_dialect, str) else 2020
        legacy = isinstance(root, dict) and (
            _is_legacy_dialect(root) or (
                "$schema" not in root and self.ver <= 4))
        self.idx = _DocIndex(root, legacy_id=legacy, ver=0) \
            if isinstance(root, dict) else None
        # resource URI table: the default id is ALWAYS a resource, plus
        # every declared $id (sorted unique — compile.cc step 1)
        uris: set[str] = set()
        if default_id:
            uris.add(default_id)
        # external resource docs with their own ids
        self.external: dict[str, Any] = {}
        for key, doc in (self.resources or {}).items():
            if isinstance(doc, dict):
                did = doc.get("$id") or doc.get("id")
                if isinstance(did, str):
                    self.external[did.rstrip("#")] = doc
                if "://" in key:
                    self.external.setdefault(key.rstrip("#"), doc)
        if self.idx is not None:
            for uri, ptr in self.idx.resources.items():
                if uri:
                    uris.add(uri)
        self.root_base = (self.idx.resource_roots.get("")
                          if self.idx is not None else "") or default_id
        self._declared: set[str] = set(uris)
        self.targets: list[tuple[str, str, Any, str]] = []
        # (uri, base, doc-node, pointer) — index 0 reserved for main
        self._target_index: dict[str, int] = {}
        self._pending: list[tuple[str, str, Any, str]] = []
        self._resource_uris = uris
        self._dynamic = [False]   # shared; set when a dynamic jump emits
        # (uri, anchor-name) pairs contributed by referenced external
        # documents (root-level declarations only), shared across
        # sub-emitters so build() can label them
        self._sub_anchors: list[tuple[str, str]] = []
        # Evaluation-tracking switches: when the document (or any
        # reachable external resource) defines `unevaluated*` under a
        # vocabulary-aware dialect, every in-place applicator that
        # "evaluates" members/items emits runtime marks
        # (ControlEvaluate / *Evaluate instruction variants) so the
        # LoopProperties/ItemsUnevaluated consumers can skip them —
        # the blaze track model (compile.cc:483-494, unevaluated.cc).
        scan_docs = [root] + [d for d in self.external.values()]
        self.marks_props = self.ver >= 2019 and any(
            _doc_defines(d, "unevaluatedProperties") for d in scan_docs)
        self.marks_items = self.ver >= 2019 and any(
            _doc_defines(d, "unevaluatedItems") for d in scan_docs)

    # -- helpers ----------------------------------------------------------

    def resource_id(self, base: str) -> int:
        table = sorted(self._resource_uris)
        try:
            return 1 + table.index(base)
        except ValueError:
            return 0

    def node_at(self, ptr: str):
        from jsonschema_ray.spec.jschema import _resolve_pointer

        return _resolve_pointer(self.root, ptr)

    def base_of(self, ptr: str) -> str:
        if self.idx is None:
            return self.root_base
        return self.idx.enclosing(ptr) or self.root_base

    def abs_loc(self, ptr: str) -> str:
        from urllib.parse import quote

        base = self.base_of(ptr)
        res_ptr = self.idx.resources.get(base, "") \
            if self.idx is not None else ""
        rel = ptr[len(res_ptr):]
        rel = quote(rel, safe="/$~!&'()*+,;=:@-._")
        return f"{base}#{rel}"

    # -- target registration ---------------------------------------------

    def target_for(self, dest_uri: str) -> int:
        if dest_uri in self._target_index:
            return self._target_index[dest_uri]
        index = 1 + len(self._target_index)
        self._target_index[dest_uri] = index
        self._pending.append(dest_uri)
        return index

    # -- instruction helpers ----------------------------------------------

    def instr(self, op_name: str, rel: list, ptr: str, value: list,
              children: list | None = None,
              abs_override: str | None = None,
              resource_override: int | None = None) -> list:
        row = [OP[op_name], rel, [],
               abs_override if abs_override is not None
               else self.abs_loc(ptr),
               resource_override if resource_override is not None
               else self.resource_id(self.base_of(ptr)), value]
        if children:
            row.append(children)
        return row

    # -- the walk ---------------------------------------------------------

    def emit_subschema(self, sch: Any, ptr: str) -> list:
        """Instruction list for one subschema position."""
        out: list = []
        if sch is True or (isinstance(sch, dict) and not sch):
            return out
        if sch is False:
            out.append(self.instr("AssertionFail", [], ptr, [V_NONE]))
            return out
        if not isinstance(sch, dict):
            return out

        # 1. $ref family
        ref = sch.get("$ref")
        if isinstance(ref, str):
            dest = urljoin(self.base_of(ptr) or "", ref)
            index = self.target_for(dest)
            out.append(self.instr("ControlJump", ["$ref"],
                                  f"{ptr}/$ref",
                                  [V_UNSIGNED, index]))
            if self.ver <= 7:
                return out

        # 2. annotations (exhaustive only; the compiler emits
        # annotation instructions for vocabulary-aware dialects only),
        # alphabetical
        if not self.fast and self.ver >= 2019:
            for akw in _ANNOTATION_KEYWORDS:
                if akw in sch:
                    out.append(self.instr(
                        "AnnotationEmit", [akw], f"{ptr}/{akw}",
                        [V_JSON, sch[akw]]))

        # 3. assertion/applicator keywords, alphabetical
        for kw in sorted(sch):
            handler = getattr(self, "_kw_" + kw.replace("$", "_d_")
                              .replace("-", "_"), None)
            if handler is None:
                if kw in _UNSUPPORTED_REJECT:
                    raise TemplateError(
                        f"the compile template emitter does not support "
                        f"the `{kw}` keyword yet")
                continue
            handler(sch[kw], sch, ptr, out)
        return out

    # -- keyword handlers -------------------------------------------------

    def _kw_type(self, v, sch, ptr, out):
        if isinstance(v, str):
            if v == "number":
                mask = (1 << JSON_TYPE["integer"]) | (1 << JSON_TYPE["real"])
                out.append(self.instr(
                    "AssertionTypeStrictAny", ["type"], f"{ptr}/type",
                    [V_TYPES, mask]))
            elif v == "integer":
                out.append(self.instr(
                    "AssertionType", ["type"], f"{ptr}/type",
                    [V_TYPE, JSON_TYPE["integer"]]))
            elif v in JSON_TYPE:
                out.append(self.instr(
                    "AssertionTypeStrict", ["type"], f"{ptr}/type",
                    [V_TYPE, JSON_TYPE[v]]))
        elif isinstance(v, list):
            mask = 0
            for t in v:
                if t == "number":
                    mask |= (1 << JSON_TYPE["integer"]) \
                        | (1 << JSON_TYPE["real"])
                elif isinstance(t, str) and t in JSON_TYPE:
                    mask |= 1 << JSON_TYPE[t]
            out.append(self.instr(
                "AssertionTypeStrictAny", ["type"], f"{ptr}/type",
                [V_TYPES, mask]))

    def _kw_format(self, v, sch, ptr, out):
        if not isinstance(v, str):
            return
        asserting = bool(self.assert_formats)
        if asserting and v in STRING_TYPE:
            out.append(self.instr(
                "AssertionStringType", ["format"], f"{ptr}/format",
                [V_STRING_TYPE, STRING_TYPE[v]]))
        if not self.fast and self.ver >= 2019:
            out.append(self.instr(
                "ControlGroupWhenType", [], f"{ptr}/format",
                [V_TYPE, JSON_TYPE["string"]],
                [self.instr("AnnotationEmit", ["format"],
                            f"{ptr}/format", [V_JSON, v])]))

    def _kw_minLength(self, v, sch, ptr, out):
        # blaze skips the instruction entirely when the bound is <= 0
        # (default_compiler_draft3.h compiler_draft3_validation_minlength)
        if not isinstance(v, int) or isinstance(v, bool) or v <= 0:
            return
        out.append(self.instr(
            "AssertionStringSizeGreater", ["minLength"],
            f"{ptr}/minLength", [V_UNSIGNED, v - 1]))

    def _kw_maxLength(self, v, sch, ptr, out):
        if not isinstance(v, int) or isinstance(v, bool):
            return
        out.append(self.instr(
            "AssertionStringSizeLess", ["maxLength"],
            f"{ptr}/maxLength", [V_UNSIGNED, v + 1]))

    def _mark_value(self, ptr: str) -> list:
        """ControlEvaluate marking the current loop value as evaluated
        (evaluator-side (parent, key) attribution comes from the
        enclosing LoopProperties*/Except/Regex iteration state)."""
        return self.instr("ControlEvaluate", [], ptr, [V_POINTER, []])

    def _kw_additionalProperties(self, v, sch, ptr, out):
        sub_ptr = f"{ptr}/additionalProperties"
        if "properties" in sch or "patternProperties" in sch:
            names = sorted(sch["properties"]) \
                if isinstance(sch.get("properties"), dict) else []
            regexes = sorted(sch["patternProperties"]) \
                if isinstance(sch.get("patternProperties"), dict) else []
            children = self.emit_subschema(v, sub_ptr)
            if not self.fast and self.ver >= 2019:
                children = children + [self.instr(
                    "AnnotationBasenameToParent", [], sub_ptr, [V_NONE])]
            if self.marks_props:
                children = children + [self._mark_value(sub_ptr)]
            out.append(self.instr(
                "LoopPropertiesExcept", ["additionalProperties"],
                sub_ptr, [V_PROP_FILTER, [names, [], regexes]],
                children))
            return
        children = self.emit_subschema(v, sub_ptr)
        if self.fast and not self.marks_props:
            # postprocess fusion: a single {"type": T} child collapses
            # into LoopPropertiesTypeStrict with merged locations
            if isinstance(v, dict) and set(v) == {"type"} \
                    and isinstance(v.get("type"), str) \
                    and v["type"] in JSON_TYPE and v["type"] not in (
                        "number", "integer"):
                out.append(self.instr(
                    "LoopPropertiesTypeStrict",
                    ["additionalProperties", "type"],
                    f"{sub_ptr}/type",
                    [V_TYPE, JSON_TYPE[v["type"]]]))
                return
            out.append(self.instr(
                "LoopProperties", ["additionalProperties"], sub_ptr,
                [V_NONE], children))
            return
        if not self.fast and self.ver >= 2019:
            children = children + [self.instr(
                "AnnotationBasenameToParent", [], sub_ptr, [V_NONE])]
        if self.marks_props:
            children = children + [self._mark_value(sub_ptr)]
        out.append(self.instr(
            "LoopProperties", ["additionalProperties"], sub_ptr,
            [V_NONE], children))

    def _kw_properties(self, v, sch, ptr, out):
        if not isinstance(v, dict):
            return
        if self.marks_props:
            # Evaluation-tracked form: an anchored-regex loop per
            # property so the iteration provides the (parent, key)
            # attribution that primitive-value marks need in the
            # evaluator, with a trailing ControlEvaluate recording the
            # value (the loop analog of blaze's tracked properties —
            # default_compiler_draft3.h:572-576)
            for name in sorted(v):
                sub_ptr = f"{ptr}/properties/{_esc(name)}"
                substeps = self.emit_subschema(v[name], sub_ptr)
                if not self.fast and self.ver >= 2019:
                    substeps.append([
                        OP["AnnotationEmit"], [], [],
                        self.abs_loc(f"{ptr}/properties"),
                        self.resource_id(self.base_of(sub_ptr)),
                        [V_JSON, name]])
                substeps.append(self._mark_value(sub_ptr))
                out.append(self.instr(
                    "LoopPropertiesRegex", ["properties", name],
                    sub_ptr, [V_REGEX, _exact_regex(name)], substeps))
            return
        required = {r for r in (sch.get("required") or [])
                    if isinstance(r, str)}
        assume_object = sch.get("type") == "object"
        for name in sorted(v):
            sub_ptr = f"{ptr}/properties/{_esc(name)}"
            substeps = self.emit_subschema(v[name], sub_ptr)
            for step in substeps:
                step[2] = [name] + step[2]
            if not self.fast and self.ver >= 2019:
                substeps.append([
                    OP["AnnotationEmit"], [], [],
                    self.abs_loc(f"{ptr}/properties"),
                    self.resource_id(self.base_of(sub_ptr)),
                    [V_JSON, name]])
            if not substeps:
                continue
            if assume_object and name in required:
                out.extend(substeps)
            else:
                out.append(self.instr(
                    "ControlGroupWhenDefinesDirect",
                    ["properties", name], sub_ptr,
                    [V_PROPERTY, [name, 0]], substeps))

    def _kw_required(self, v, sch, ptr, out):
        if not isinstance(v, list) or not all(
                isinstance(x, str) for x in v):
            return
        if not v:
            return
        if len(v) == 1:
            out.append(self.instr(
                "AssertionDefines", ["required"], f"{ptr}/required",
                [V_PROPERTY, [v[0], 0]]))
        else:
            names = sorted(set(v))
            out.append(self.instr(
                "AssertionDefinesAll", ["required"], f"{ptr}/required",
                [V_STRING_SET, names]))

    def _kw_patternProperties(self, v, sch, ptr, out):
        if not isinstance(v, dict):
            return
        for pattern in sorted(v):
            sub_ptr = f"{ptr}/patternProperties/{_esc(pattern)}"
            children = self.emit_subschema(v[pattern], sub_ptr)
            if not self.fast and self.ver >= 2019:
                children = children + [self.instr(
                    "AnnotationBasenameToParent", [], sub_ptr, [V_NONE])]
            if self.marks_props:
                children = children + [self._mark_value(sub_ptr)]
            out.append(self.instr(
                "LoopPropertiesRegex",
                ["patternProperties", pattern], sub_ptr,
                [V_REGEX, pattern], children))

    # -- value assertions -------------------------------------------------

    def _kw_enum(self, v, sch, ptr, out):
        if not isinstance(v, list):
            return
        out.append(self.instr("AssertionEqualsAny", ["enum"],
                              f"{ptr}/enum", [V_SET, v]))

    def _kw_const(self, v, sch, ptr, out):
        out.append(self.instr("AssertionEqual", ["const"],
                              f"{ptr}/const", [V_JSON, v]))

    def _kw_pattern(self, v, sch, ptr, out):
        if isinstance(v, str):
            out.append(self.instr("AssertionRegex", ["pattern"],
                                  f"{ptr}/pattern", [V_REGEX, v]))

    def _num(self, v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    def _kw_minimum(self, v, sch, ptr, out):
        if self._num(v):
            # draft-4 boolean exclusiveMinimum flips the bound strict
            op = "AssertionGreater" \
                if sch.get("exclusiveMinimum") is True \
                else "AssertionGreaterEqual"
            out.append(self.instr(op, ["minimum"],
                                  f"{ptr}/minimum", [V_JSON, v]))

    def _kw_maximum(self, v, sch, ptr, out):
        if self._num(v):
            op = "AssertionLess" \
                if sch.get("exclusiveMaximum") is True \
                else "AssertionLessEqual"
            out.append(self.instr(op, ["maximum"],
                                  f"{ptr}/maximum", [V_JSON, v]))

    def _kw_exclusiveMinimum(self, v, sch, ptr, out):
        if self._num(v):
            out.append(self.instr(
                "AssertionGreater", ["exclusiveMinimum"],
                f"{ptr}/exclusiveMinimum", [V_JSON, v]))

    def _kw_exclusiveMaximum(self, v, sch, ptr, out):
        if self._num(v):
            out.append(self.instr(
                "AssertionLess", ["exclusiveMaximum"],
                f"{ptr}/exclusiveMaximum", [V_JSON, v]))

    def _kw_multipleOf(self, v, sch, ptr, out):
        if self._num(v):
            out.append(self.instr("AssertionDivisible", ["multipleOf"],
                                  f"{ptr}/multipleOf", [V_JSON, v]))

    def _kw_minItems(self, v, sch, ptr, out):
        if isinstance(v, int) and not isinstance(v, bool) and v > 0:
            out.append(self.instr(
                "AssertionArraySizeGreater", ["minItems"],
                f"{ptr}/minItems", [V_UNSIGNED, v - 1]))

    def _kw_maxItems(self, v, sch, ptr, out):
        if isinstance(v, int) and not isinstance(v, bool):
            out.append(self.instr(
                "AssertionArraySizeLess", ["maxItems"],
                f"{ptr}/maxItems", [V_UNSIGNED, v + 1]))

    def _kw_minProperties(self, v, sch, ptr, out):
        if isinstance(v, int) and not isinstance(v, bool) and v > 0:
            out.append(self.instr(
                "AssertionObjectSizeGreater", ["minProperties"],
                f"{ptr}/minProperties", [V_UNSIGNED, v - 1]))

    def _kw_maxProperties(self, v, sch, ptr, out):
        if isinstance(v, int) and not isinstance(v, bool):
            out.append(self.instr(
                "AssertionObjectSizeLess", ["maxProperties"],
                f"{ptr}/maxProperties", [V_UNSIGNED, v + 1]))

    def _kw_uniqueItems(self, v, sch, ptr, out):
        if v is True:
            out.append(self.instr("AssertionUnique", ["uniqueItems"],
                                  f"{ptr}/uniqueItems", [V_NONE]))

    def _kw_dependentRequired(self, v, sch, ptr, out):
        if not isinstance(v, dict):
            return
        clauses = []
        for name in sorted(v):
            deps = v[name]
            if isinstance(deps, list) \
                    and all(isinstance(d, str) for d in deps):
                clauses.append([name, sorted(deps)])
        if clauses:
            out.append(self.instr(
                "AssertionPropertyDependencies", ["dependentRequired"],
                f"{ptr}/dependentRequired", [15, clauses]))

    # -- applicators ------------------------------------------------------

    def _emit_array_prefix(self, v, ptr, keyword, out):
        """Positional prefixes as the blaze AssertionArrayPrefix shape
        (one ControlGroup of subschemas 0..k per possible array length,
        plus the full tail): the Evaluate variant marks every checked
        prefix item (default_compiler_draft3.h:1389-1478)."""
        per_index = []
        for i, sub in enumerate(v):
            substeps = self.emit_subschema(sub, f"{ptr}/{keyword}/{i}")
            for step in substeps:
                step[2] = [i] + step[2]
            per_index.append(substeps)
        groups = []
        for cursor in range(len(v)):
            acc = [step for i in range(cursor + 1)
                   for step in per_index[i]]
            groups.append(self.instr("ControlGroup", [],
                                     f"{ptr}/{keyword}", [V_NONE], acc)
                          if acc else
                          self.instr("ControlGroup", [],
                                     f"{ptr}/{keyword}", [V_NONE]))
        tail = [step for steps in per_index for step in steps]
        groups.append(self.instr("ControlGroup", [], f"{ptr}/{keyword}",
                                 [V_NONE], tail)
                      if tail else
                      self.instr("ControlGroup", [], f"{ptr}/{keyword}",
                                 [V_NONE]))
        out.append(self.instr(
            "AssertionArrayPrefixEvaluate", [keyword],
            f"{ptr}/{keyword}", [V_NONE], groups))

    def _kw_items(self, v, sch, ptr, out):
        if isinstance(v, list):
            if self.marks_items:
                self._emit_array_prefix(v, ptr, "items", out)
                return
            # pre-2020 array form: positional prefixes, each gated on
            # the array actually reaching that index
            for i, sub in enumerate(v):
                substeps = self.emit_subschema(sub, f"{ptr}/items/{i}")
                for step in substeps:
                    step[2] = [i] + step[2]
                if substeps:
                    out.append(self.instr(
                        "LogicalWhenArraySizeGreater", ["items", str(i)],
                        f"{ptr}/items/{i}", [V_UNSIGNED, i], substeps))
            return
        if not isinstance(v, (dict, bool)):
            return
        start = 0
        if self.ver >= 2020 and isinstance(sch.get("prefixItems"), list):
            start = len(sch["prefixItems"])
        children = self.emit_subschema(v, f"{ptr}/items")
        if self.marks_items:
            if start == 0:
                # per-item mark inside the loop: sound because loop
                # coverage is total and subschema verdicts are pure
                # value functions (equal primitives share verdicts)
                children = children + [self._mark_value(f"{ptr}/items")]
                if children:
                    out.append(self.instr(
                        "LoopItems", ["items"], f"{ptr}/items",
                        [V_NONE], children))
                return
            if children:
                out.append(self.instr(
                    "LoopItemsFrom", ["items"], f"{ptr}/items",
                    [V_UNSIGNED, start], children))
            # whole-array mark once the tail loop has passed
            out.append(self.instr(
                "LogicalWhenArraySizeGreater", ["items"],
                f"{ptr}/items", [V_UNSIGNED, start],
                [self._mark_value(f"{ptr}/items")]))
            return
        op = "LoopItems" if start == 0 else "LoopItemsFrom"
        out.append(self.instr(op, ["items"], f"{ptr}/items",
                              [V_UNSIGNED, start] if start else [V_NONE],
                              children))

    def _kw_prefixItems(self, v, sch, ptr, out):
        if not isinstance(v, list):
            return
        if self.marks_items:
            self._emit_array_prefix(v, ptr, "prefixItems", out)
            return
        for i, sub in enumerate(v):
            substeps = self.emit_subschema(sub, f"{ptr}/prefixItems/{i}")
            for step in substeps:
                step[2] = [i] + step[2]
            if substeps:
                out.append(self.instr(
                    "LogicalWhenArraySizeGreater",
                    ["prefixItems", str(i)],
                    f"{ptr}/prefixItems/{i}", [V_UNSIGNED, i],
                    substeps))

    def _kw_contains(self, v, sch, ptr, out):
        if not isinstance(v, (dict, bool)):
            return
        lo = sch.get("minContains", 1)
        hi = sch.get("maxContains")
        if not isinstance(lo, int) or isinstance(lo, bool):
            lo = 1
        if not (isinstance(hi, int) and not isinstance(hi, bool)):
            hi = None
        children = self.emit_subschema(v, f"{ptr}/contains")
        if self.marks_items:
            # mark each matching item; the range must then be checked
            # exhaustively so every match (not just the first) records
            children = children + [self._mark_value(f"{ptr}/contains")]
        out.append(self.instr(
            "LoopContains", ["contains"], f"{ptr}/contains",
            [V_RANGE, [lo, hi, (not self.fast) or self.marks_items]],
            children))

    def _idx_base(self, base: str) -> str:
        """Doc-index key for a resource base: a root without a declared
        $id registers under the empty URI while the emitter addresses
        it by the default id."""
        if self.idx is not None and base not in self.idx.resources \
                and base == self.root_base:
            return ""
        return base

    def _kw_contentSchema(self, v, sch, ptr, out):
        """2019-09+ `contentSchema` is non-asserting: an annotation of
        the schema value, only when `contentMediaType` is present and
        the instance is a string (compiler_2019_09_content_
        contentschema — no validation instructions at all)."""
        if self.ver < 2019 or self.fast:
            return
        if "contentMediaType" not in sch:
            return
        out.append(self.instr(
            "ControlGroupWhenType", [], f"{ptr}/contentSchema",
            [V_TYPE, JSON_TYPE["string"]],
            [self.instr("AnnotationEmit", ["contentSchema"],
                        f"{ptr}/contentSchema", [V_JSON, v])]))

    def _kw__d_dynamicRef(self, v, sch, ptr, out):
        """2020-12 `$dynamicRef`: anchor-fragment refs that are
        BOOKENDED (the static target declares a matching
        `$dynamicAnchor`) jump through the runtime resource stack to
        the outermost declaring resource (ControlDynamicAnchorJump —
        compiler_2020_12_core_dynamicref); everything else is a plain
        static reference. The jump carries the static base's resource
        id so the stack always holds the bookend fallback."""
        if self.ver < 2020 or not isinstance(v, str):
            return
        base = self.base_of(ptr)
        target = urljoin(base or "", v)
        tbase, _, frag = target.partition("#")
        sub_ptr = f"{ptr}/$dynamicRef"
        if frag and not frag.startswith("/"):
            from urllib.parse import unquote
            name = unquote(frag)
            static_base = tbase or base
            bookended = self.idx is not None and \
                (self._idx_base(static_base), name) in \
                self.idx.dyn_anchors
            if bookended:
                self._dynamic[0] = True
                override = self.resource_id(static_base)                     if tbase and tbase != base else None
                out.append(self.instr(
                    "ControlDynamicAnchorJump", ["$dynamicRef"],
                    sub_ptr, [V_STRING, name],
                    resource_override=override))
                return
        index = self.target_for(target)
        out.append(self.instr("ControlJump", ["$dynamicRef"], sub_ptr,
                              [V_UNSIGNED, index]))

    def _kw__d_recursiveRef(self, v, sch, ptr, out):
        """2019-09 `$recursiveRef: "#"`: dynamic only when the current
        resource root sets `$recursiveAnchor: true` (the bookend);
        otherwise a static jump to the resource root
        (compiler_2019_09_core_recursiveref). The dynamic form is the
        empty-named anchor jump."""
        if self.ver != 2019 or v != "#":
            return
        base = self.base_of(ptr)
        sub_ptr = f"{ptr}/$recursiveRef"
        if self.idx is not None \
                and self._idx_base(base) in self.idx.rec_roots:
            self._dynamic[0] = True
            out.append(self.instr(
                "ControlDynamicAnchorJump", ["$recursiveRef"], sub_ptr,
                [V_STRING, ""]))
            return
        index = self.target_for(base)
        out.append(self.instr("ControlJump", ["$recursiveRef"], sub_ptr,
                              [V_UNSIGNED, index]))

    def _kw_unevaluatedProperties(self, v, sch, ptr, out):
        """2019-09+: properties not evaluated by any in-scope
        applicator, consumed through the runtime mark set the tracked
        applicators emit (compiler_2019_09_applicator_
        unevaluatedproperties; evaluation model evaluator.h:217-258).
        No static sibling filter: sibling properties/patternProperties/
        additionalProperties mark at runtime, which subsumes it."""
        if self.ver < 2019:
            return
        if isinstance(sch.get("type"), str) and sch["type"] != "object":
            return
        sub_ptr = f"{ptr}/unevaluatedProperties"
        children = self.emit_subschema(v, sub_ptr)
        if not self.fast:
            children = children + [self.instr(
                "AnnotationBasenameToParent", [], sub_ptr, [V_NONE])]
        if children:
            out.append(self.instr(
                "LoopPropertiesUnevaluated", ["unevaluatedProperties"],
                sub_ptr, [V_NONE], children))
        else:
            # object-guarded marker: records the object as evaluated
            # for enclosing scopes without touching non-objects
            out.append(self.instr(
                "LoopPropertiesEvaluate", ["unevaluatedProperties"],
                sub_ptr, [V_NONE]))

    def _kw_unevaluatedItems(self, v, sch, ptr, out):
        """2019-09+: items not evaluated by prefixItems/items/contains
        (2020-12) or items/additionalItems (2019-09), via the same
        runtime mark set (compiler_2019_09_applicator_
        unevaluateditems)."""
        if self.ver < 2019:
            return
        if isinstance(sch.get("type"), str) and sch["type"] != "array":
            return
        sub_ptr = f"{ptr}/unevaluatedItems"
        children = self.emit_subschema(v, sub_ptr)
        if not self.fast:
            children = children + [self.instr(
                "AnnotationToParent", [], sub_ptr, [V_JSON, True])]
        out.append(self.instr(
            "LoopItemsUnevaluated", ["unevaluatedItems"], sub_ptr,
            [V_NONE], children))

    def _kw_propertyNames(self, v, sch, ptr, out):
        if not isinstance(v, (dict, bool)):
            return
        children = self.emit_subschema(v, f"{ptr}/propertyNames")
        out.append(self.instr("LoopKeys", ["propertyNames"],
                              f"{ptr}/propertyNames", [V_NONE], children))

    def _prefix_steps(self, steps, tokens):
        """Prepend schema-location tokens to top-level instructions of
        an inlined branch. Evaluation-path prefixes are what scope
        runtime marks: a consumer's isEvaluated check compares paths up
        to its parent schema, so cousin branches must differ in a
        token (the blaze evaluator's evaluate-path model,
        evaluator.h:217-258 / ports/javascript isEvaluated)."""
        for step in steps:
            step[1] = tokens + step[1]
            # A LogicalCondition pops its own relative location before
            # running then/else, so its consequence subtrees must carry
            # the prefix themselves to keep their scope tokens
            if step[0] == OP["LogicalCondition"] and len(step) > 6:
                then_start = step[5][1][0]
                self._prefix_steps(step[6][then_start:], tokens)
        return steps

    def _branch_children(self, v, ptr_prefix):
        groups = []
        for i, sub in enumerate(v):
            steps = self.emit_subschema(sub, f"{ptr_prefix}/{i}")
            if self.marks_props or self.marks_items:
                self._prefix_steps(steps, [str(i)])
            groups.append([OP["ControlGroup"], [str(i)], [],
                          self.abs_loc(f"{ptr_prefix}/{i}"),
                          self.resource_id(
                              self.base_of(f"{ptr_prefix}/{i}")),
                          [V_NONE], steps] if steps else
                          [OP["ControlGroup"], [str(i)], [],
                          self.abs_loc(f"{ptr_prefix}/{i}"),
                          self.resource_id(
                              self.base_of(f"{ptr_prefix}/{i}")),
                          [V_NONE]])
        return groups

    def _kw_allOf(self, v, sch, ptr, out):
        if not isinstance(v, list):
            return
        for i, sub in enumerate(v):
            steps = self.emit_subschema(sub, f"{ptr}/allOf/{i}")
            if self.marks_props or self.marks_items:
                self._prefix_steps(steps, ["allOf", str(i)])
            out.extend(steps)

    def _kw_anyOf(self, v, sch, ptr, out):
        if not isinstance(v, list):
            return
        exhaustive = (not self.fast) or self.marks_props \
            or self.marks_items
        out.append(self.instr(
            "LogicalOr", ["anyOf"], f"{ptr}/anyOf",
            [V_BOOLEAN, exhaustive],
            self._branch_children(v, f"{ptr}/anyOf")))

    def _kw_oneOf(self, v, sch, ptr, out):
        if not isinstance(v, list):
            return
        exhaustive = (not self.fast) or self.marks_props \
            or self.marks_items
        out.append(self.instr(
            "LogicalXor", ["oneOf"], f"{ptr}/oneOf",
            [V_BOOLEAN, exhaustive],
            self._branch_children(v, f"{ptr}/oneOf")))

    def _kw_not(self, v, sch, ptr, out):
        if not isinstance(v, (dict, bool)):
            return
        children = self.emit_subschema(v, f"{ptr}/not")
        op = "LogicalNotEvaluate" \
            if (self.marks_props or self.marks_items) else "LogicalNot"
        out.append(self.instr(op, ["not"], f"{ptr}/not",
                              [V_NONE], children))

    def _kw_if(self, v, sch, ptr, out):
        if not isinstance(v, (dict, bool)):
            return
        if_steps = self.emit_subschema(v, f"{ptr}/if")
        then_steps = []
        else_steps = []
        if isinstance(sch.get("then"), (dict, bool)):
            then_steps = self.emit_subschema(sch["then"], f"{ptr}/then")
            if self.marks_props or self.marks_items:
                self._prefix_steps(then_steps, ["then"])
        if isinstance(sch.get("else"), (dict, bool)):
            else_steps = self.emit_subschema(sch["else"], f"{ptr}/else")
            if self.marks_props or self.marks_items:
                self._prefix_steps(else_steps, ["else"])
        if not then_steps and not else_steps:
            return
        children = if_steps + then_steps + else_steps
        then_start = len(if_steps)
        else_start = (len(if_steps) + len(then_steps)) if else_steps \
            else 0
        out.append(self.instr(
            "LogicalCondition", ["if"], f"{ptr}/if",
            [17, [then_start, else_start]], children))

    def _kw_additionalItems(self, v, sch, ptr, out):
        # draft<=2019: applies after a positional `items` array only
        items = sch.get("items")
        if not isinstance(items, list) or not isinstance(v, (dict, bool)):
            return
        children = self.emit_subschema(v, f"{ptr}/additionalItems")
        if children or not self.marks_items:
            out.append(self.instr(
                "LoopItemsFrom", ["additionalItems"],
                f"{ptr}/additionalItems", [V_UNSIGNED, len(items)],
                children))
        if self.marks_items:
            out.append(self.instr(
                "LogicalWhenArraySizeGreater", ["additionalItems"],
                f"{ptr}/additionalItems", [V_UNSIGNED, len(items)],
                [self._mark_value(f"{ptr}/additionalItems")]))

    def _kw_dependentSchemas(self, v, sch, ptr, out):
        if not isinstance(v, dict):
            return
        for name in sorted(v):
            sub = v[name]
            if not isinstance(sub, (dict, bool)):
                continue
            children = self.emit_subschema(
                sub, f"{ptr}/dependentSchemas/{_esc(name)}")
            if not children and sub is not False:
                continue
            if sub is False and not children:
                children = [self.instr(
                    "AssertionFail", [],
                    f"{ptr}/dependentSchemas/{_esc(name)}", [V_NONE])]
            out.append(self.instr(
                "LogicalWhenDefines", ["dependentSchemas", name],
                f"{ptr}/dependentSchemas/{_esc(name)}",
                [V_PROPERTY, [name, 0]], children))

    def _kw_dependencies(self, v, sch, ptr, out):
        # draft<=7: mixed dependentRequired + dependentSchemas forms
        if not isinstance(v, dict):
            return
        req_clauses = []
        for name in sorted(v):
            dep = v[name]
            if isinstance(dep, str):
                dep = [dep]
            if isinstance(dep, list) \
                    and all(isinstance(d, str) for d in dep):
                req_clauses.append([name, sorted(dep)])
            elif isinstance(dep, (dict, bool)):
                children = self.emit_subschema(
                    dep, f"{ptr}/dependencies/{_esc(name)}")
                if dep is False and not children:
                    children = [self.instr(
                        "AssertionFail", [],
                        f"{ptr}/dependencies/{_esc(name)}", [V_NONE])]
                if children:
                    out.append(self.instr(
                        "LogicalWhenDefines", ["dependencies", name],
                        f"{ptr}/dependencies/{_esc(name)}",
                        [V_PROPERTY, [name, 0]], children))
        if req_clauses:
            out.append(self.instr(
                "AssertionPropertyDependencies", ["dependencies"],
                f"{ptr}/dependencies", [15, req_clauses]))

    # -- template assembly ------------------------------------------------

    def _discover_resources(self, doc, base, seen) -> None:
        """Transitively collect referenced external resource ids into
        the resource-URI table (the bundled-view frame registers every
        brought-in resource — compile.cc step 1)."""
        if isinstance(doc, list):
            for v in doc:
                self._discover_resources(v, base, seen)
            return
        if not isinstance(doc, dict):
            return
        did = doc.get("$id") or doc.get("id")
        if isinstance(did, str) and "://" in urljoin(base or "", did):
            base = urljoin(base or "", did)
            self._resource_uris.add(base.rstrip("#"))
        ref = doc.get("$ref")
        if isinstance(ref, str):
            dest = urljoin(base or "", ref).partition("#")[0]
            if dest and dest not in seen:
                seen.add(dest)
                target = self.resources.get(dest)                     or self.external.get(dest)
                while isinstance(target, str):   # config remap chain
                    target = self.resources.get(target)                         or self.external.get(target)
                if isinstance(target, dict):
                    self._discover_resources(target, dest, seen)
        for v in doc.values():
            self._discover_resources(v, base, seen)

    def build(self, entry_ptr: str = "") -> list:
        self._discover_resources(self.root, self.root_base
                                 if self.idx is None else "", set())
        main_node = self.node_at(entry_ptr) if entry_ptr else self.root
        targets = [self.emit_subschema(main_node, entry_ptr)]
        done: set[str] = set()

        def drain():
            while self._pending:
                dest = self._pending.pop(0)
                if dest in done:
                    continue
                done.add(dest)
                targets.append(self._emit_destination(dest))

        drain()
        labels: list[list] = []
        if self._dynamic[0] and self.idx is not None:
            # one label target per declared dynamic anchor (all names,
            # all resources — collectAnchorNames narrows at load time),
            # keyed by the blaze 53-bit (resource, name) hash
            for (abase, name), aptr in sorted(
                    self.idx.dyn_anchors.items()):
                res_ptr = self.idx.resources.get(abase, "")
                uri = abase or self.root_base
                dest = f"{uri}#{aptr[len(res_ptr):]}" \
                    if aptr != res_ptr else uri
                labels.append([_blaze_hash(self.resource_id(uri), name),
                               self.target_for(dest)])
            for abase in sorted(self.idx.rec_roots):
                uri = abase or self.root_base
                labels.append([_blaze_hash(self.resource_id(uri), ""),
                               self.target_for(uri)])
            drain()
            seen_sub: set[tuple[str, str]] = set()
            while True:
                # draining a label target can reach new external docs
                # that contribute further anchors — iterate to fixpoint
                fresh = [p for p in self._sub_anchors
                         if p not in seen_sub]
                if not fresh:
                    break
                for uri, name in fresh:
                    seen_sub.add((uri, name))
                    labels.append([_blaze_hash(self.resource_id(uri),
                                               name),
                                   self.target_for(uri)])
                drain()
        track = (not self.fast) or self.marks_props or self.marks_items
        return [JSON_VERSION, self._dynamic[0], track, targets, labels]

    def _emit_destination(self, dest: str) -> list:
        base, _, frag = dest.partition("#")
        # in-document resource or pointer
        if self.idx is not None:
            res_ptr = self.idx.resources.get(dest)
            if res_ptr is None:
                res_ptr = self.idx.resources.get(base)
            if res_ptr is None:
                res_ptr = self.idx.resources.get(self._idx_base(base))
            if res_ptr is not None:
                if frag.startswith("/"):
                    tptr = res_ptr + frag
                elif frag:
                    from urllib.parse import unquote
                    name = unquote(frag)
                    ikey = self._idx_base(base)
                    tptr = self.idx.anchors.get((ikey, name))
                    if tptr is None:
                        tptr = self.idx.dyn_anchors.get((ikey, name))
                    if tptr is None:
                        raise TemplateError(
                            f"unresolvable anchor: {dest}")
                else:
                    tptr = res_ptr
                node = self.node_at(tptr)
                return self.emit_subschema(node, tptr)
        # config resolve remap
        remapped = self.resources.get(dest) or self.resources.get(base)
        if remapped is not None and isinstance(remapped, str):
            return self._emit_destination(remapped)
        doc = self.external.get(dest) or self.external.get(base)
        if doc is None and remapped is not None \
                and isinstance(remapped, dict):
            doc = remapped
        if doc is None:
            raise TemplateError(f"unresolvable reference: {dest}")
        sub = _Emitter(doc, resources=self.resources,
                       default_dialect=self.default_dialect,
                       default_id="", fast=self.fast,
                       assert_formats=self.assert_formats)
        sub._resource_uris = self._resource_uris
        sub._target_index = self._target_index
        sub._pending = self._pending
        sub.marks_props = sub.marks_props or self.marks_props
        sub.marks_items = sub.marks_items or self.marks_items
        sub._dynamic = self._dynamic
        sub._sub_anchors = self._sub_anchors
        if sub.idx is not None:
            for (abase, name), aptr in sub.idx.dyn_anchors.items():
                if aptr == sub.idx.resources.get(abase, ""):
                    self._sub_anchors.append(
                        (abase or sub.root_base, name))
            for abase in sub.idx.rec_roots:
                self._sub_anchors.append((abase or sub.root_base, ""))
        return sub.emit_subschema(doc, "")


def compile_template(schema: Any, *, resources: dict | None = None,
                     default_dialect: str | None = None,
                     default_id: str = "", fast: bool = False,
                     assert_formats: bool | None = None,
                     entry_ptr: str = "") -> list:
    em = _Emitter(schema, resources=resources,
                  default_dialect=default_dialect,
                  default_id=default_id, fast=fast,
                  assert_formats=assert_formats)
    return em.build(entry_ptr)
