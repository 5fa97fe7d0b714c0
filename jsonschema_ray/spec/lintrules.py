"""The reference lint rule registry — all 103 blaze alterschema rules.

Ports the PUBLIC rule headers under
``vendor/blaze/src/alterschema/{common,linter}/*.h`` (name, message,
vocabulary gates, condition → locations, fix transform) plus the
transformer loop (``transformer.cc``: ``check`` over frame-ordered
subschemas, ``apply`` fixpoint with reframe / processed-twice /
broken-reference handling, health score).

Registration order mirrors ``alterschema.cc:312-421``
(AlterSchemaMode::Linter).
"""

from __future__ import annotations

import copy
import re
from typing import Any, Callable

from jsonschema_ray.spec.lintframe import (IN_PLACE_APPLICATORS, LintFrame,
                                           Location, Vocabularies, get_at,
                                           ptr_str, ptr_tokens, set_at,
                                           starts_with, try_get_at, unesc,
                                           walker)

# Known-vocabulary shorthands
V2020_CORE = "JSON_Schema_2020_12_Core"
V2020_APP = "JSON_Schema_2020_12_Applicator"
V2020_VAL = "JSON_Schema_2020_12_Validation"
V2020_META = "JSON_Schema_2020_12_Meta_Data"
V2020_UNEVAL = "JSON_Schema_2020_12_Unevaluated"
V2020_CONTENT = "JSON_Schema_2020_12_Content"
V2020_FMT_A = "JSON_Schema_2020_12_Format_Annotation"
V2020_FMT_S = "JSON_Schema_2020_12_Format_Assertion"
V2019_CORE = "JSON_Schema_2019_09_Core"
V2019_APP = "JSON_Schema_2019_09_Applicator"
V2019_VAL = "JSON_Schema_2019_09_Validation"
V2019_META = "JSON_Schema_2019_09_Meta_Data"
V2019_FMT = "JSON_Schema_2019_09_Format"
V2019_CONTENT = "JSON_Schema_2019_09_Content"
D7 = "JSON_Schema_Draft_7"
D7H = "JSON_Schema_Draft_7_Hyper"
D6 = "JSON_Schema_Draft_6"
D6H = "JSON_Schema_Draft_6_Hyper"
D4 = "JSON_Schema_Draft_4"
D4H = "JSON_Schema_Draft_4_Hyper"
D3 = "JSON_Schema_Draft_3"
D3H = "JSON_Schema_Draft_3_Hyper"
D2 = "JSON_Schema_Draft_2"
D2H = "JSON_Schema_Draft_2_Hyper"
D1 = "JSON_Schema_Draft_1"
D1H = "JSON_Schema_Draft_1_Hyper"
D0 = "JSON_Schema_Draft_0"
D0H = "JSON_Schema_Draft_0_Hyper"


# ---------------------------------------------------------------------------
# JSON helpers (blaze core JSON semantics)
# ---------------------------------------------------------------------------

def jtype(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "real"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def is_integral(v: Any) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return True
    return isinstance(v, float) and v.is_integer()


def jeq(a: Any, b: Any) -> bool:
    """blaze JSON equality: bool is its own type; int/real compare
    numerically; containers recurse."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(jeq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(jeq(a[k], b[k]) for k in a)
    return a == b


def jcontains(arr: list, v: Any) -> bool:
    return any(jeq(x, v) for x in arr)


def junique(arr: list) -> bool:
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if jeq(arr[i], arr[j]):
                return False
    return True


def is_schema(v: Any) -> bool:
    return isinstance(v, (dict, bool))


def is_empty_schema(v: Any) -> bool:
    return (v is True) or (isinstance(v, dict) and not v)


def parse_type_one(t: str, out: set) -> None:
    if t == "null":
        out.add("null")
    elif t == "boolean":
        out.add("boolean")
    elif t == "object":
        out.add("object")
    elif t == "array":
        out.add("array")
    elif t == "number":
        out.update(("integer", "real"))
    elif t == "integer":
        out.add("integer")
    elif t == "string":
        out.add("string")


def parse_schema_type(t: Any) -> frozenset[str]:
    out: set = set()
    if isinstance(t, str):
        parse_type_one(t, out)
    elif isinstance(t, list):
        for item in t:
            if isinstance(item, str):
                parse_type_one(item, out)
    return frozenset(out)


_DRAFT0_TO_3 = (D0, D0H, D1, D1H, D2, D2H, D3, D3H)


def is_known_type_form(t: Any, vocab: Vocabularies) -> bool:
    """alterschema.cc IS_KNOWN_TYPE_FORM."""
    if not vocab.contains_any(_DRAFT0_TO_3):
        return True
    if isinstance(t, str):
        return t != "any"
    if not isinstance(t, list):
        return False
    return all(isinstance(e, str) and e != "any" for e in t)


def dialect_of(schema: Any) -> str:
    if isinstance(schema, dict) and isinstance(schema.get("$schema"), str):
        return schema["$schema"]
    return ""


ECMA_UNSUPPORTED = re.compile(
    r"\(\?<[=!]|\\[AZzGb](?![a-zA-Z])|\(\?[aiLmsux]*[-:#]|\\[pP]\{|\(\?P[<=]"
)


def is_regex_ecma(pattern: str) -> bool:
    """core is_regex_ecma approximation: the strict ECMA-262 subset —
    reject constructs ECMA does not define (possessive quantifiers,
    inline flags, \\A/\\Z anchors, POSIX classes)."""
    if re.search(r"[*+?}]\+", pattern) or "[[:" in pattern:
        return False
    if re.search(r"\(\?[aiLmsux]+[):]", pattern):
        return False
    if re.search(r"\\[AZzG]", pattern):
        return False
    try:
        re.compile(pattern)
    except re.error:
        return False
    return True


class Result:
    __slots__ = ("applies", "locations", "description")

    def __init__(self, applies: bool, locations: list | None = None,
                 description: str | None = None):
        self.applies = applies
        self.locations = locations or []
        self.description = description


def _res(value) -> Result:
    if isinstance(value, Result):
        return value
    if value is True:
        return Result(True)
    if value is False or value is None:
        return Result(False)
    return Result(True, list(value))


class Ctx:
    """Condition context: the current subschema + frame surroundings."""

    __slots__ = ("schema", "root", "vocab", "frame", "location",
                 "resolver", "is_metaschema", "explain")

    def __init__(self, schema, root, vocab, frame, location, resolver,
                 is_metaschema, explain=None):
        self.schema = schema
        self.root = root
        self.vocab = vocab
        self.frame = frame
        self.location = location
        self.resolver = resolver
        self.is_metaschema = is_metaschema
        self.explain = explain   # callable for valid_default/examples


class Rule:
    name = ""
    message = ""
    mutates = True
    reframe = True

    def condition(self, ctx: Ctx):
        raise NotImplementedError

    def check(self, ctx: Ctx, exclude_keyword: str = "") -> Result:
        result = _res(self.condition(ctx))
        if result.applies and exclude_keyword \
                and isinstance(ctx.schema, dict):
            ex = ctx.schema.get(exclude_keyword)
            if (isinstance(ex, str) and ex == self.name) or \
                    (isinstance(ex, list) and self.name in ex):
                return Result(False)
        return result

    def transform(self, schema, result: Result) -> None:
        raise SchemaAbortError(
            "This rule cannot be automatically transformed")

    def rereference(self, reference: str, origin: tuple, target: tuple,
                    current: tuple) -> tuple:
        raise BrokenReferenceError(reference, origin)


class SchemaAbortError(Exception):
    pass


class BrokenReferenceError(Exception):
    def __init__(self, reference: str, origin: tuple):
        super().__init__(
            "Could not autofix the schema without breaking its internal "
            "references")
        self.reference = reference
        self.origin = origin


class ProcessedTwiceError(Exception):
    def __init__(self, rule_name: str, pointer: tuple):
        super().__init__("The transform rule was processed twice")
        self.rule_name = rule_name
        self.pointer = pointer


def rebase(target: tuple, old_prefix: tuple, new_prefix: tuple) -> tuple:
    if starts_with(target, old_prefix):
        return new_prefix + target[len(old_prefix):]
    return target


# ---------------------------------------------------------------------------
# Rules — common/
# ---------------------------------------------------------------------------

_MODERN_APP = (V2020_APP, V2019_APP)


class DefinitionsToDefs(Rule):
    name = "definitions_to_defs"
    message = ("`definitions` was superseded by `$defs` in 2019-09 and "
               "later versions")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_CORE, V2019_CORE))
                and isinstance(s, dict) and "definitions" in s
                and "$defs" not in s):
            return False
        return [("definitions",)]

    def transform(self, schema, result):
        ordered = {("$defs" if k == "definitions" else k): v
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)

    def rereference(self, reference, origin, target, current):
        return rebase(target, current + ("definitions",),
                      current + ("$defs",))


class ContentMediaTypeWithoutEncoding(Rule):
    name = "content_media_type_without_encoding"
    message = ("The `contentMediaType` keyword is meaningless without the "
               "presence of the `contentEncoding` keyword")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_CONTENT, V2019_CONTENT, D7))
                and isinstance(s, dict) and "contentMediaType" in s
                and "contentEncoding" not in s):
            return False
        return [("contentMediaType",)]

    def transform(self, schema, result):
        schema.pop("contentMediaType", None)


class ContentSchemaWithoutMediaType(Rule):
    name = "content_schema_without_media_type"
    message = ("The `contentSchema` keyword is meaningless without the "
               "presence of the `contentMediaType` keyword")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_CONTENT, V2019_CONTENT))
                and isinstance(s, dict) and "contentSchema" in s
                and "contentMediaType" not in s):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer,
                                            "contentSchema"):
            return False
        return [("contentSchema",)]

    def transform(self, schema, result):
        schema.pop("contentSchema", None)


_DRAFT_HTTPS = frozenset(
    f"https://json-schema.org/draft-0{n}/{kind}{frag}"
    for n in (0, 1, 2, 3, 4, 6, 7)
    for kind in ("schema", "hyper-schema") for frag in ("", "#"))

_DRAFT_BASE_DIALECTS = frozenset((
    D7, D7H, D6, D6H, D4, D4H, D3, D3H, D2H, D1H, D0H))


class DraftOfficialDialectWithHttps(Rule):
    name = "draft_official_dialect_with_https"
    message = ("The official dialect URI of Draft 7 and older must use "
               "\"http://\" instead of \"https://\"")

    def condition(self, ctx):
        s = ctx.schema
        if ctx.location.base_dialect not in _DRAFT_BASE_DIALECTS:
            return False
        if not isinstance(s, dict):
            return False
        d = s.get("$schema")
        if not isinstance(d, str) or d not in _DRAFT_HTTPS:
            return False
        return [("$schema",)]

    def transform(self, schema, result):
        schema["$schema"] = "http://" + schema["$schema"][8:]


_DRAFT_NO_FRAGMENT = frozenset(
    f"http://json-schema.org/draft-0{n}/{kind}"
    for n in (0, 1, 2, 3, 4, 6, 7) for kind in ("schema", "hyper-schema"))


class DraftOfficialDialectWithoutEmptyFragment(Rule):
    name = "draft_official_dialect_without_empty_fragment"
    message = ("The official dialect URI of Draft 7 and older versions "
               "must contain the empty fragment")

    def condition(self, ctx):
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        d = s.get("$schema")
        if not isinstance(d, str) or d not in _DRAFT_NO_FRAGMENT:
            return False
        return [("$schema",)]

    def transform(self, schema, result):
        schema["$schema"] = schema["$schema"] + "#"


_ALL_VAL_VOCABS = (V2020_VAL, V2019_VAL, D7, D6, D4, D3, D2, D2H, D1, D1H,
                   D0, D0H)


class NonApplicableTypeSpecificKeywords(Rule):
    name = "non_applicable_type_specific_keywords"
    message = ("Avoid keywords that don't apply to the type or types that "
               "the current subschema expects")

    def condition(self, ctx):
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        tv = s.get("type")
        current: set = set()
        if ctx.vocab.contains_any(_ALL_VAL_VOCABS) and tv is not None \
                and is_known_type_form(tv, ctx.vocab):
            current = set(parse_schema_type(tv))
        if ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4, D3,
                                   D2, D1)):
            ev = s.get("enum")
            if isinstance(ev, list):
                for entry in ev:
                    current.add(jtype(entry))
        if ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6)) \
                and "const" in s:
            current.add(jtype(s["const"]))
        if not current:
            return False
        positions = []
        for kw in s:
            meta = walker(kw, ctx.vocab)
            if not meta.instances:
                continue
            if kw == "required" and ctx.vocab.contains_any((D3, D3H)):
                continue
            if kw == "maxDecimal" and ctx.vocab.contains_any(
                    (D0, D0H, D1, D1H)):
                continue
            if kw == "optional" and ctx.vocab.contains_any(
                    (D0, D0H, D1, D1H, D2, D2H)):
                continue
            if not (meta.instances & current):
                if ctx.frame.has_references_through(
                        ctx.location.pointer, kw):
                    continue
                positions.append((kw,))
        if not positions:
            return False
        return positions

    def transform(self, schema, result):
        for loc in result.locations:
            schema.pop(loc[0], None)


def _extract_disallow_type_names(entry: Any) -> set[str] | None:
    """disallow_narrows_type.h extract_type_names (None = bail set)."""
    out: set = set()
    if isinstance(entry, str):
        if entry != "any":
            out.add(entry)
        return out
    if not isinstance(entry, dict) or len(entry) != 1:
        return out
    et = entry.get("type")
    if et is None:
        return out
    if isinstance(et, str):
        if et != "any":
            out.add(et)
        return out
    if not isinstance(et, list):
        return out
    for t in et:
        if not isinstance(t, str) or t == "any":
            return set()
    return set(et)


class NonApplicableDisallowTypes(Rule):
    name = "non_applicable_disallow_types"
    message = ("`disallow` entries whose type cannot overlap with the "
               "parent `type` can never match and can be dropped")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D3, D3H)) and isinstance(s, dict)):
            return False
        disallow = s.get("disallow")
        if not (isinstance(disallow, list) and disallow):
            return False
        ptv = s.get("type")
        if ptv is None or not is_known_type_form(ptv, ctx.vocab):
            return False
        parent = parse_schema_type(ptv)
        if not parent:
            return False
        locations = []
        for i, entry in enumerate(disallow):
            etypes: set = set()
            if isinstance(entry, str) and entry != "any":
                etypes = set(parse_schema_type(entry))
            elif isinstance(entry, dict):
                et = entry.get("type")
                if et is not None and is_known_type_form(et, ctx.vocab):
                    etypes = set(parse_schema_type(et))
            if etypes and not (parent & etypes):
                locations.append(("disallow", i))
        if not locations:
            return False
        if ctx.frame.has_references_through(
                ctx.location.pointer + ("disallow",)):
            return False
        return locations

    def transform(self, schema, result):
        dead = {loc[1] for loc in result.locations}
        new = [e for i, e in enumerate(schema["disallow"])
               if i not in dead]
        if new:
            schema["disallow"] = new
        else:
            del schema["disallow"]


class DisallowNarrowsType(Rule):
    name = "disallow_narrows_type"
    message = ("When `disallow` excludes types that are also in the parent "
               "`type`, those types can be removed from `type` and the "
               "corresponding `disallow` entries dropped")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D3, D3H)) and isinstance(s, dict)):
            return False
        disallow = s.get("disallow")
        if not (isinstance(disallow, list) and disallow):
            return False
        pt = s.get("type")
        if not (isinstance(pt, list) and len(pt) > 1):
            return False
        parent_names: set = set()
        for entry in pt:
            if not (isinstance(entry, str) and entry != "any"):
                return False
            parent_names.add(entry)
        locations, narrowed = [], set()
        for i, entry in enumerate(disallow):
            names = _extract_disallow_type_names(entry)
            if not names:
                continue
            if all(n in parent_names for n in names):
                locations.append(("disallow", i))
                narrowed |= names
        if not locations:
            return False
        if not (len(narrowed) < len(parent_names)):
            return False
        if ctx.frame.has_references_through(
                ctx.location.pointer + ("disallow",)):
            return False
        return locations

    def transform(self, schema, result):
        narrowed: set = set()
        dead = []
        disallow = schema["disallow"]
        for loc in result.locations:
            dead.append(loc[1])
            narrowed |= _extract_disallow_type_names(disallow[loc[1]]) \
                or set()
        schema["type"] = [t for t in schema["type"]
                          if not (isinstance(t, str) and t in narrowed)]
        new = [e for i, e in enumerate(disallow) if i not in dead]
        if new:
            schema["disallow"] = new
        else:
            del schema["disallow"]


class AnyOfRemoveFalseSchemas(Rule):
    name = "anyof_remove_false_schemas"
    message = ("The boolean schema `false` is guaranteed to never match "
               "in `anyOf`, as it is sufficient for any other branch to "
               "match")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6))
                and isinstance(s, dict)
                and isinstance(s.get("anyOf"), list)
                and jcontains(s["anyOf"], False)):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "anyOf"):
            return False
        locations, has_non_false = [], False
        for i, entry in enumerate(s["anyOf"]):
            if entry is False:
                locations.append(("anyOf", i))
            else:
                has_non_false = True
        if not has_non_false:
            return False
        return locations

    def transform(self, schema, result):
        dead = {loc[1] for loc in result.locations}
        schema["anyOf"] = [e for i, e in enumerate(schema["anyOf"])
                           if i not in dead]


class AnyOfTrueSimplify(Rule):
    name = "anyof_true_simplify"
    message = "An `anyOf` with a `true` or `{}` branch always succeeds"

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D4))
                and isinstance(s, dict)
                and isinstance(s.get("anyOf"), list)):
            return False
        if ctx.vocab.contains_any(_MODERN_APP):
            cursor = ctx.location
            while cursor is not None:
                cur = try_get_at(ctx.root, cursor.pointer)
                if isinstance(cur, dict) and (
                        "unevaluatedItems" in cur
                        or "unevaluatedProperties" in cur):
                    return False
                if cursor.parent is None:
                    break
                cursor = ctx.frame.traverse_pointer(cursor.parent)
        for i, entry in enumerate(s["anyOf"]):
            if entry is True or (isinstance(entry, dict) and not entry):
                if ctx.frame.has_references_through(
                        ctx.location.pointer, "anyOf"):
                    return False
                return [("anyOf", i)]
        return False

    def transform(self, schema, result):
        schema.pop("anyOf", None)


class _DedupBranchesRule(Rule):
    keyword = ""

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D4))
                and isinstance(s, dict)):
            return False
        branches = s.get(self.keyword)
        if not (isinstance(branches, list) and not junique(branches)):
            return False
        return [(self.keyword,)]

    def transform(self, schema, result):
        self._index_mapping = {}
        seen: list = []
        out = []
        for i, v in enumerate(schema[self.keyword]):
            hit = next((j for j, sv in enumerate(seen) if jeq(sv, v)), None)
            if hit is None:
                self._index_mapping[i] = len(seen)
                seen.append(v)
                out.append(v)
            else:
                self._index_mapping[i] = hit
        schema[self.keyword] = out

    def rereference(self, reference, origin, target, current):
        prefix = current + (self.keyword,)
        if not starts_with(target, prefix) or len(target) <= len(prefix):
            return target
        old_index = target[len(prefix)]
        new_index = self._index_mapping.get(old_index, old_index)
        return rebase(target, prefix + (old_index,), prefix + (new_index,))


class DuplicateAllOfBranches(_DedupBranchesRule):
    name = "duplicate_allof_branches"
    message = ("Setting duplicate subschemas in `allOf` is redundant, as "
               "it produces unnecessary additional validation that is "
               "guaranteed to not affect the validation result")
    keyword = "allOf"


class DuplicateAnyOfBranches(_DedupBranchesRule):
    name = "duplicate_anyof_branches"
    message = ("Setting duplicate subschemas in `anyOf` is redundant, as "
               "it produces unnecessary additional validation that is "
               "guaranteed to not affect the validation result")
    keyword = "anyOf"


class _FlattenNestedRule(Rule):
    keyword = ""
    vocabs: tuple = ()

    def condition(self, ctx):
        s = ctx.schema
        kw = self.keyword
        if not (ctx.vocab.contains_any(self.vocabs)
                and isinstance(s, dict)
                and isinstance(s.get(kw), list)):
            return False
        self._flatten_indices = [
            i for i, b in enumerate(s[kw])
            if isinstance(b, dict) and len(b) == 1
            and isinstance(b.get(kw), list)]
        if not self._flatten_indices:
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, kw):
            return False
        return [(kw,)]

    def _collect(self, node, out, outer_index):
        kw = self.keyword
        for j, child in enumerate(node[kw]):
            if isinstance(child, dict) and len(child) == 1 \
                    and isinstance(child.get(kw), list):
                self._collect(child, out, outer_index)
            else:
                self._index_mapping.append((outer_index, j, len(out)))
                out.append(child)

    def transform(self, schema, result):
        kw = self.keyword
        self._index_mapping: list = []
        out: list = []
        cursor = 0
        for i, v in enumerate(schema[kw]):
            if cursor < len(self._flatten_indices) \
                    and self._flatten_indices[cursor] == i:
                self._collect(v, out, i)
                cursor += 1
            else:
                self._index_mapping.append((i, None, len(out)))
                out.append(v)
        schema[kw] = out

    def rereference(self, reference, origin, target, current):
        kw = self.keyword
        prefix = current + (kw,)
        if not starts_with(target, prefix) or len(target) <= len(prefix):
            return target
        old_index = target[len(prefix)]
        if not isinstance(old_index, int):
            return target
        for outer, inner, mapped in self._index_mapping:
            if outer == old_index and inner is not None:
                old_prefix = prefix + (old_index, kw, inner)
                if starts_with(target, old_prefix):
                    return rebase(target, old_prefix, prefix + (mapped,))
            elif outer == old_index:
                return rebase(target, prefix + (old_index,),
                              prefix + (mapped,))
        return target


class FlattenNestedAllOf(_FlattenNestedRule):
    name = "flatten_nested_allof"
    message = ("An `allOf` branch that only contains another `allOf` can "
               "be flattened into the parent `allOf`")
    keyword = "allOf"
    vocabs = (*_MODERN_APP, D7, D6, D4)


class FlattenNestedExtends(_FlattenNestedRule):
    name = "flatten_nested_extends"
    message = ("An `extends` branch that only contains another `extends` "
               "can be flattened into the parent `extends`")
    keyword = "extends"
    vocabs = (D3, D3H)


class FlattenNestedAnyOf(_FlattenNestedRule):
    name = "flatten_nested_anyof"
    message = ("An `anyOf` branch that only contains another `anyOf` can "
               "be flattened into the parent `anyOf`")
    keyword = "anyOf"
    vocabs = (*_MODERN_APP, D7, D6, D4)


class UnsatisfiableInPlaceApplicatorType(Rule):
    name = "unsatisfiable_in_place_applicator_type"
    message = ("An in-place applicator branch that defines a `type` with "
               "no overlap with the parent `type` can never be satisfied")

    def condition(self, ctx):
        s = ctx.schema
        if not (isinstance(s, dict) and "type" in s):
            return False
        if not ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4,
                                       D3, D3H, D2, D1, D0)):
            return False
        if not is_known_type_form(s["type"], ctx.vocab):
            return False
        parent = parse_schema_type(s["type"])
        if not parent:
            return False
        locations = []
        for kw, v in s.items():
            t = walker(kw, ctx.vocab).type
            if t in ("ApplicatorElementsInPlace",
                     "ApplicatorElementsInPlaceSome"):
                if not isinstance(v, list):
                    continue
                for i, branch in enumerate(v):
                    if not isinstance(branch, dict):
                        continue
                    bt = branch.get("type")
                    if bt is None or not is_known_type_form(bt, ctx.vocab):
                        continue
                    btypes = parse_schema_type(bt)
                    if btypes and not (parent & btypes):
                        locations.append((kw, i))
            elif t in ("ApplicatorValueInPlaceMaybe",
                       "ApplicatorValueInPlaceNegate"):
                if not isinstance(v, dict):
                    continue
                bt = v.get("type")
                if bt is None or not is_known_type_form(bt, ctx.vocab):
                    continue
                btypes = parse_schema_type(bt)
                if btypes and not (parent & btypes):
                    locations.append((kw,))
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        for loc in result.locations:
            if len(loc) == 2:
                schema[loc[0]][loc[1]] = False
            else:
                schema[loc[0]] = False


class _XOfFalseSimplify(Rule):
    keyword = ""
    single_only = True
    vocabs = (*_MODERN_APP, D7, D6)

    def condition(self, ctx):
        s = ctx.schema
        kw = self.keyword
        if not (ctx.vocab.contains_any(self.vocabs)
                and isinstance(s, dict) and "not" not in s):
            return False
        branches = s.get(kw)
        if not isinstance(branches, list):
            return False
        if self.single_only and len(branches) != 1:
            return False
        for i, entry in enumerate(branches):
            if entry is False:
                if ctx.frame.has_references_through(
                        ctx.location.pointer, kw):
                    return False
                return [(kw, i)]
            if self.single_only:
                return False
        return False

    def transform(self, schema, result):
        kw = self.keyword
        ordered = {("not" if k == kw else k): (True if k == kw else v)
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)


class AllOfFalseSimplify(_XOfFalseSimplify):
    name = "allof_false_simplify"
    message = ("When `allOf` contains a `false` branch, the schema is "
               "unsatisfiable")
    keyword = "allOf"
    single_only = False


class AnyOfFalseSimplify(_XOfFalseSimplify):
    name = "anyof_false_simplify"
    message = "An `anyOf` of a single `false` branch is unsatisfiable"
    keyword = "anyOf"


class OneOfFalseSimplify(_XOfFalseSimplify):
    name = "oneof_false_simplify"
    message = "A `oneOf` of a single `false` branch is unsatisfiable"
    keyword = "oneOf"


class DoubleNegationElimination(Rule):
    name = "double_negation_elimination"
    message = ("A `not` whose value is a schema containing only another "
               "`not` is equivalent to the inner value")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D4))
                and isinstance(s, dict)):
            return False
        outer = s.get("not")
        if not (isinstance(outer, dict) and len(outer) == 1):
            return False
        if "not" not in outer:
            return False
        inner = outer["not"]
        if inner is False:
            return False
        if ctx.vocab.contains_any((V2020_UNEVAL, V2019_APP)) and (
                "unevaluatedProperties" in s or "unevaluatedItems" in s):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "not"):
            return False
        return [("not",)]

    def transform(self, schema, result):
        inner = schema["not"]["not"]
        del schema["not"]
        while isinstance(inner, dict) and len(inner) == 1 \
                and isinstance(inner.get("not"), dict) \
                and len(inner["not"]) == 1 and "not" in inner["not"] \
                and inner["not"]["not"] is not False:
            inner = inner["not"]["not"]
        if isinstance(inner, dict):
            for k, v in inner.items():
                schema.setdefault(k, v)

    def rereference(self, reference, origin, target, current):
        old_prefix = current + ("not", "not")
        while starts_with(target, old_prefix + ("not", "not")):
            old_prefix = old_prefix + ("not", "not")
        if not starts_with(target, old_prefix):
            return target
        return rebase(target, old_prefix, current)


class OneOfToAnyOfDisjointTypes(Rule):
    name = "oneof_to_anyof_disjoint_types"
    message = ("A `oneOf` where all branches have disjoint types can be "
               "safely converted to `anyOf`")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D4))
                and isinstance(s, dict)):
            return False
        oneof = s.get("oneOf")
        if not (isinstance(oneof, list) and len(oneof) > 1):
            return False
        has_val = ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6,
                                          D4, D2, D1))
        has_const = ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
        type_sets = []
        for branch in oneof:
            if not isinstance(branch, dict):
                return False
            tv = branch.get("type")
            cv = branch.get("const") if has_const else None
            has_cv = has_const and "const" in branch
            ev = branch.get("enum") if has_val else None
            has_enum = isinstance(ev, list)
            if tv is not None:
                bt = parse_schema_type(tv)
                if not bt:
                    return False
                type_sets.append(bt)
            elif has_cv and not has_enum:
                type_sets.append(frozenset({jtype(cv)}))
            elif has_enum and not has_cv:
                type_sets.append(frozenset(jtype(x) for x in ev))
            else:
                return False
        for i in range(len(type_sets)):
            for j in range(i + 1, len(type_sets)):
                if type_sets[i] & type_sets[j]:
                    return False
        return [("oneOf",)]

    def transform(self, schema, result):
        ordered = {("anyOf" if k == "oneOf" else k): v
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)

    def rereference(self, reference, origin, target, current):
        return rebase(target, current + ("oneOf",), current + ("anyOf",))


_REMOVABLE_KEYWORD_TYPES = frozenset({
    "Assertion", "Reference", "LocationMembers",
    "ApplicatorMembersTraversePropertyStatic",
    "ApplicatorMembersTraversePropertyRegex",
    "ApplicatorValueTraverseSomeProperty",
    "ApplicatorValueTraverseAnyPropertyKey",
    "ApplicatorValueTraverseAnyItem",
    "ApplicatorValueTraverseSomeItem",
    "ApplicatorValueTraverseParent",
    "ApplicatorElementsTraverseItem",
    "ApplicatorValueOrElementsTraverseAnyItemOrItem",
    "ApplicatorValueOrElementsInPlace",
    "ApplicatorMembersInPlaceSome",
    "ApplicatorElementsInPlace",
    "ApplicatorElementsInPlaceSome",
    "ApplicatorElementsInPlaceSomeNegate",
    "ApplicatorValueInPlaceMaybe",
    "ApplicatorValueInPlaceOther",
    "ApplicatorValueInPlaceNegate",
})


class UnsatisfiableDropValidation(Rule):
    name = "unsatisfiable_drop_validation"
    message = ("Do not place assertions or applicators next to an "
               "unsatisfiable negation")

    @staticmethod
    def _is_disallow_tautology(value) -> bool:
        if isinstance(value, str):
            return value == "any"
        if is_empty_schema(value):
            return True
        if isinstance(value, list):
            return any(
                (e == "any" if isinstance(e, str) else is_empty_schema(e))
                for e in value)
        return False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D3, D3H))
                and isinstance(s, dict)):
            return False
        is_d3 = ctx.vocab.contains_any((D3, D3H))
        trigger = ""
        if is_d3:
            dv = s.get("disallow")
            if dv is not None and self._is_disallow_tautology(dv):
                trigger = "disallow"
        else:
            nv = s.get("not")
            if nv is not None and is_empty_schema(nv):
                trigger = "not"
        if not trigger:
            return False
        positions = []
        for kw in s:
            if kw == trigger:
                continue
            if walker(kw, ctx.vocab).type not in _REMOVABLE_KEYWORD_TYPES:
                continue
            if ctx.frame.has_references_through(ctx.location.pointer, kw):
                continue
            positions.append((kw,))
        if not positions:
            return False
        return positions

    def transform(self, schema, result):
        for loc in result.locations:
            schema.pop(loc[0], None)


class ElseWithoutIf(Rule):
    name = "else_without_if"
    message = ("The `else` keyword is meaningless without the presence of "
               "the `if` keyword")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7))
                and isinstance(s, dict) and "else" in s and "if" not in s):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "else"):
            return False
        return [("else",)]

    def transform(self, schema, result):
        schema.pop("else", None)


class IfWithoutThenElse(Rule):
    name = "if_without_then_else"
    message = ("The `if` keyword is meaningless without the presence of "
               "the `then` or `else` keywords")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7))
                and isinstance(s, dict) and "if" in s
                and "then" not in s and "else" not in s):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "if"):
            return False
        return [("if",)]

    def transform(self, schema, result):
        schema.pop("if", None)


class IgnoredMetaschema(Rule):
    name = "ignored_metaschema"
    message = ("A `$schema` declaration without a sibling identifier (or "
               "with a sibling `$ref` in Draft 7 and older dialects), is "
               "ignored")

    def condition(self, ctx):
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        if not isinstance(s.get("$schema"), str):
            return False
        d = dialect_of(s)
        if not d:
            return False
        if d == ctx.location.dialect:
            return False
        return [("$schema",)]

    def transform(self, schema, result):
        schema.pop("$schema", None)


class MaxContainsWithoutContains(Rule):
    name = "max_contains_without_contains"
    message = ("The `maxContains` keyword is meaningless without the "
               "presence of the `contains` keyword")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL))
                and isinstance(s, dict) and "maxContains" in s
                and "contains" not in s):
            return False
        return [("maxContains",)]

    def transform(self, schema, result):
        schema.pop("maxContains", None)


class MinContainsWithoutContains(Rule):
    name = "min_contains_without_contains"
    message = ("The `minContains` keyword is meaningless without the "
               "presence of the `contains` keyword")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL))
                and isinstance(s, dict) and "minContains" in s
                and "contains" not in s):
            return False
        return [("minContains",)]

    def transform(self, schema, result):
        schema.pop("minContains", None)


class NotFalse(Rule):
    name = "not_false"
    message = ("Setting the `not` keyword to `false` imposes no "
               "constraints. Negating `false` yields the always-true "
               "schema")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D4))
                and isinstance(s, dict) and s.get("not") is False):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "not"):
            return False
        return [("not",)]

    def transform(self, schema, result):
        schema.pop("not", None)


class _ThenElseEmpty(Rule):
    keyword = ""

    def condition(self, ctx):
        s = ctx.schema
        kw = self.keyword
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7))
                and isinstance(s, dict)):
            return False
        v = s.get(kw)
        if not (kw in s and is_schema(v) and is_empty_schema(v)):
            return False
        iv = s.get("if")
        if not (isinstance(v, dict) or "if" not in s or iv is not True):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, kw):
            return False
        return [(kw,)]

    def transform(self, schema, result):
        schema.pop(self.keyword, None)


class ThenEmpty(_ThenElseEmpty):
    name = "then_empty"
    message = ("Setting the `then` keyword to the empty schema does not "
               "add any further constraint")
    keyword = "then"


class ElseEmpty(_ThenElseEmpty):
    name = "else_empty"
    message = ("Setting the `else` keyword to the empty schema does not "
               "add any further constraint")
    keyword = "else"


class ThenWithoutIf(Rule):
    name = "then_without_if"
    message = ("The `then` keyword is meaningless without the presence of "
               "the `if` keyword")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((*_MODERN_APP, D7))
                and isinstance(s, dict) and "then" in s and "if" not in s):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "then"):
            return False
        return [("then",)]

    def transform(self, schema, result):
        schema.pop("then", None)


class DependenciesPropertyTautology(Rule):
    name = "dependencies_property_tautology"
    message = ("Defining requirements for a property using `dependencies` "
               "that is already marked as required is an unnecessarily "
               "complex use of `dependencies`")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D7, D6, D4, D3, D3H))
                and isinstance(s, dict)):
            return False
        deps = s.get("dependencies")
        if not isinstance(deps, dict):
            return False
        if ctx.vocab.contains_any((D3, D3H)):
            props = s.get("properties")
            if not isinstance(props, dict):
                return False
            hit = False
            for name, sub in props.items():
                if not isinstance(sub, dict):
                    continue
                if sub.get("required") is not True:
                    continue
                dep = deps.get(name)
                if isinstance(dep, (list, str)):
                    hit = True
                    break
            if not hit:
                return False
            return [("dependencies",), ("properties",)]
        required = s.get("required")
        if not isinstance(required, list):
            return False
        hit = any(isinstance(e, str) and isinstance(deps.get(e),
                                                    (list, str))
                  for e in required)
        if not hit:
            return False
        return [("dependencies",), ("required",)]

    def transform(self, schema, result):
        d3_path = any(len(loc) == 1 and loc[0] == "properties"
                      for loc in result.locations)
        if d3_path:
            while True:
                match = False
                snapshot = [name for name, sub in
                            schema["properties"].items()
                            if isinstance(sub, dict)
                            and sub.get("required") is True]
                for name in snapshot:
                    if name not in schema["dependencies"]:
                        continue
                    dep = schema["dependencies"][name]
                    new_required = []
                    if isinstance(dep, str):
                        new_required = [dep]
                    elif isinstance(dep, list):
                        new_required = [x for x in dep
                                        if isinstance(x, str)]
                    else:
                        continue
                    for dn in new_required:
                        props = schema["properties"]
                        if dn not in props:
                            props[dn] = {"required": True}
                            match = True
                        elif isinstance(props[dn], dict):
                            if props[dn].get("required") is not True:
                                props[dn]["required"] = True
                                match = True
                    del schema["dependencies"][name]
                if not match:
                    break
            return
        requirements = list(schema["required"])
        while True:
            match = False
            for e in list(requirements):
                if not isinstance(e, str) \
                        or e not in schema["dependencies"]:
                    continue
                dep = schema["dependencies"][e]
                if isinstance(dep, list):
                    for x in dep:
                        if isinstance(x, str):
                            match = True
                            requirements.append(x)
                    del schema["dependencies"][e]
                elif isinstance(dep, str):
                    match = True
                    requirements.append(dep)
                    del schema["dependencies"][e]
            if not match:
                break
        schema["required"] = requirements


class DependentRequiredTautology(Rule):
    name = "dependent_required_tautology"
    message = ("Defining requirements for a property using "
               "`dependentRequired` that is already marked as required is "
               "an unnecessarily complex use of `dependentRequired`")
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL))
                and isinstance(s, dict)):
            return False
        dr = s.get("dependentRequired")
        if not isinstance(dr, dict):
            return False
        required = s.get("required")
        if not isinstance(required, list):
            return False
        if not any(isinstance(e, str) and e in dr for e in required):
            return False
        return [("dependentRequired",), ("required",)]

    def transform(self, schema, result):
        requirements = list(schema["required"])
        while True:
            match = False
            for e in list(requirements):
                if not isinstance(e, str) \
                        or e not in schema["dependentRequired"]:
                    continue
                dep = schema["dependentRequired"][e]
                if isinstance(dep, list):
                    for x in dep:
                        if isinstance(x, str):
                            match = True
                            requirements.append(x)
                    del schema["dependentRequired"][e]
            if not match:
                break
        schema["required"] = requirements


class EqualNumericBoundsToEnum(Rule):
    name = "equal_numeric_bounds_to_enum"
    message = ("Setting `minimum` and `maximum` to the same number only "
               "leaves one possible value")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D4, D3, D3H, D2, D1, D0))
                and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, str) and t in ("integer", "number")):
            return False
        mn, mx = s.get("minimum"), s.get("maximum")
        if not (isinstance(mn, (int, float))
                and not isinstance(mn, bool)):
            return False
        if not (isinstance(mx, (int, float))
                and not isinstance(mx, bool) and mn == mx):
            return False
        if s.get("exclusiveMinimum") is True:
            return False
        if s.get("exclusiveMaximum") is True:
            return False
        if s.get("minimumCanEqual") is False:
            return False
        if s.get("maximumCanEqual") is False:
            return False
        return [("minimum",), ("maximum",)]

    def transform(self, schema, result):
        schema["enum"] = [schema["minimum"]]
        schema.pop("type", None)
        schema.pop("minimum", None)
        schema.pop("maximum", None)


class _RealForInteger(Rule):
    keyword = ""
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4,
                                        D3, D3H, D2, D1))
                and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, str) and t == "integer"):
            return False
        v = s.get(self.keyword)
        if not (isinstance(v, (int, float)) and not isinstance(v, bool)
                and not is_integral(v)):
            return False
        return [(self.keyword,)]


class MaximumRealForInteger(_RealForInteger):
    name = "maximum_real_for_integer"
    message = ("If an instance is guaranteed to be an integer, setting a "
               "real number upper bound is the same as a floor of that "
               "upper bound")
    keyword = "maximum"

    def transform(self, schema, result):
        import math
        schema["maximum"] = int(math.floor(schema["maximum"]))


class MinimumRealForInteger(_RealForInteger):
    name = "minimum_real_for_integer"
    message = ("If an instance is guaranteed to be an integer, setting a "
               "real number lower bound is the same as a ceil of that "
               "lower bound")
    keyword = "minimum"

    def transform(self, schema, result):
        import math
        schema["minimum"] = int(math.ceil(schema["minimum"]))


class SingleTypeArray(Rule):
    name = "single_type_array"
    message = ("Setting `type` to an array of a single type is the same "
               "as directly declaring such type")
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4,
                                        D3, D3H, D2, D1, D0))
                and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, list) and len(t) == 1
                and isinstance(t[0], str)):
            return False
        return [("type",)]

    def transform(self, schema, result):
        schema["type"] = schema["type"][0]


class EnumWithType(Rule):
    name = "enum_with_type"
    message = ("Setting `type` alongside `enum` is considered an "
               "anti-pattern, as the enumeration choices already imply "
               "their respective types")

    def condition(self, ctx):
        s = ctx.schema
        if not ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4,
                                       D3, D3H, D2, D1)):
            return False
        if not isinstance(s, dict):
            return False
        t = s.get("type")
        if t is None:
            return False
        ev = s.get("enum")
        if not isinstance(ev, list):
            return False
        if ctx.vocab.contains_any((D3, D3H)):
            if isinstance(t, str) and t == "any":
                return [("enum",), ("type",)]
            if isinstance(t, list):
                has_tautology = has_unknown_sub = False
                for entry in t:
                    if isinstance(entry, str) and entry == "any":
                        has_tautology = True
                        break
                    if isinstance(entry, dict):
                        if not entry:
                            has_tautology = True
                            break
                        has_unknown_sub = True
                if has_tautology:
                    return [("enum",), ("type",)]
                if has_unknown_sub:
                    return False
        current = parse_schema_type(t)
        if not current:
            return False
        int_matches = ctx.vocab.contains_any((D6, D7)) \
            and "integer" in current
        for item in ev:
            if jtype(item) in current:
                continue
            if int_matches and is_integral(item):
                continue
            return False
        return [("enum",), ("type",)]

    def transform(self, schema, result):
        schema.pop("type", None)


class NonApplicableEnumValidationKeywords(Rule):
    name = "non_applicable_enum_validation_keywords"
    message = ("Setting validation keywords that do not apply to any item "
               "in `enum` is considered an anti-pattern")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4,
                                        D3, D2, D2H, D1, D1H))
                and isinstance(s, dict) and "type" not in s):
            return False
        ev = s.get("enum")
        if not isinstance(ev, list):
            return False
        enum_types = {jtype(v) for v in ev}
        if not enum_types:
            return False
        is_d3 = ctx.vocab.contains_any((D3, D3H))
        positions = []
        for kw, v in s.items():
            meta = walker(kw, ctx.vocab)
            if not meta.instances:
                continue
            if is_d3 and kw == "required" and isinstance(v, bool):
                continue
            if not (meta.instances & enum_types):
                positions.append((kw,))
        if not positions:
            return False
        return positions

    def transform(self, schema, result):
        for loc in result.locations:
            schema.pop(loc[0], None)


class DuplicateEnumValues(Rule):
    name = "duplicate_enum_values"
    message = ("Setting duplicate values in `enum` is considered an "
               "anti-pattern")
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4,
                                        D3, D3H, D2, D1))
                and isinstance(s, dict)):
            return False
        ev = s.get("enum")
        if not (isinstance(ev, list) and not junique(ev)):
            return False
        return [("enum",)]

    def transform(self, schema, result):
        out: list = []
        for v in schema["enum"]:
            if not jcontains(out, v):
                out.append(v)
        schema["enum"] = out


def _jsort_key(v: Any):
    order = {"null": 0, "boolean": 1, "integer": 2, "real": 2,
             "string": 3, "array": 4, "object": 5}
    t = jtype(v)
    if t in ("integer", "real"):
        return (order[t], float(v))
    if t == "boolean":
        return (order[t], int(v))
    if t == "string":
        return (order[t], v)
    import json as _json
    return (order[t], _json.dumps(v, sort_keys=True))


class DuplicateRequiredValues(Rule):
    name = "duplicate_required_values"
    message = ("Setting duplicate values in `required` is considered an "
               "anti-pattern")
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4))
                and isinstance(s, dict)):
            return False
        rv = s.get("required")
        if not (isinstance(rv, list) and not junique(rv)):
            return False
        return [("required",)]

    def transform(self, schema, result):
        arr = sorted(schema["required"], key=_jsort_key)
        out: list = []
        for v in arr:
            if not (out and jeq(out[-1], v)):
                out.append(v)
        schema["required"] = out


class ConstWithType(Rule):
    name = "const_with_type"
    message = ("Setting `type` alongside `const` is considered an "
               "anti-pattern, as the constant already implies its "
               "respective type")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
                and isinstance(s, dict)):
            return False
        if "type" not in s or "const" not in s:
            return False
        current = parse_schema_type(s["type"])
        if not current:
            return False
        if jtype(s["const"]) not in current:
            return False
        return [("const",), ("type",)]

    def transform(self, schema, result):
        schema.pop("type", None)


class ConstInEnum(Rule):
    name = "const_in_enum"
    message = ("If the `const` and `enum` keyword overlap, then `enum` is "
               "redundant and can be removed")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
                and isinstance(s, dict) and "const" in s):
            return False
        ev = s.get("enum")
        if not (isinstance(ev, list) and jcontains(ev, s["const"])):
            return False
        return [("const",), ("enum",)]

    def transform(self, schema, result):
        schema.pop("enum", None)


class NonApplicableAdditionalItems(Rule):
    name = "non_applicable_additional_items"
    message = ("The `additionalItems` keyword is ignored when the `items` "
               "keyword is either not present or set to a schema")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2019_APP, D7, D6, D4, D3, D3H))
                and isinstance(s, dict) and "additionalItems" in s):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer,
                                            "additionalItems"):
            return False
        items = s.get("items")
        if "items" in s and is_schema(items):
            return [("additionalItems",), ("items",)]
        if "items" not in s:
            return [("additionalItems",)]
        return False

    def transform(self, schema, result):
        schema.pop("additionalItems", None)


_MODERN_EMPTY_FRAG = frozenset((
    "https://json-schema.org/draft/2019-09/schema#",
    "https://json-schema.org/draft/2019-09/hyper-schema#",
    "https://json-schema.org/draft/2020-12/schema#",
    "https://json-schema.org/draft/2020-12/hyper-schema#"))


class ModernOfficialDialectWithEmptyFragment(Rule):
    name = "modern_official_dialect_with_empty_fragment"
    message = ("The official dialect URI of 2019-09 and newer versions "
               "must not contain the empty fragment")

    def condition(self, ctx):
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        d = s.get("$schema")
        if not (isinstance(d, str) and d in _MODERN_EMPTY_FRAG):
            return False
        return [("$schema",)]

    def transform(self, schema, result):
        schema["$schema"] = schema["$schema"][:-1]


_MODERN_HTTP = frozenset(
    f"http://json-schema.org/draft/{y}/{kind}{frag}"
    for y in ("2020-12", "2019-09")
    for kind in ("schema", "hyper-schema") for frag in ("", "#"))

_MODERN_BASE_DIALECTS = frozenset((
    "JSON_Schema_2020_12", "JSON_Schema_2020_12_Hyper",
    "JSON_Schema_2019_09", "JSON_Schema_2019_09_Hyper"))


class ModernOfficialDialectWithHttp(Rule):
    name = "modern_official_dialect_with_http"
    message = ("The official dialect URI of 2019-09 and later must use "
               "\"https://\" instead of \"http://\"")

    def condition(self, ctx):
        if ctx.location.base_dialect not in _MODERN_BASE_DIALECTS:
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        d = s.get("$schema")
        if not (isinstance(d, str) and d in _MODERN_HTTP):
            return False
        return [("$schema",)]

    def transform(self, schema, result):
        schema["$schema"] = "https://" + schema["$schema"][7:]


class _ExclusiveNumberAnd(Rule):
    bound = ""   # "maximum" | "minimum"

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
                and isinstance(s, dict)):
            return False
        b = s.get(self.bound)
        if not (isinstance(b, (int, float)) and not isinstance(b, bool)):
            return False
        kw = "exclusiveMaximum" if self.bound == "maximum" \
            else "exclusiveMinimum"
        e = s.get(kw)
        if not (isinstance(e, (int, float)) and not isinstance(e, bool)):
            return False
        return [(kw,), (self.bound,)]

    def transform(self, schema, result):
        if self.bound == "maximum":
            if schema["maximum"] < schema["exclusiveMaximum"]:
                del schema["exclusiveMaximum"]
            else:
                del schema["maximum"]
        else:
            if schema["exclusiveMinimum"] < schema["minimum"]:
                del schema["exclusiveMinimum"]
            else:
                del schema["minimum"]


class ExclusiveMaximumNumberAndMaximum(_ExclusiveNumberAnd):
    name = "exclusive_maximum_number_and_maximum"
    message = ("Setting both `exclusiveMaximum` and `maximum` at the same "
               "time is considered an anti-pattern. You should choose one")
    bound = "maximum"


class ExclusiveMinimumNumberAndMinimum(_ExclusiveNumberAnd):
    name = "exclusive_minimum_number_and_minimum"
    message = ("Setting both `exclusiveMinimum` and `minimum` at the same "
               "time is considered an anti-pattern. You should choose one")
    bound = "minimum"


class ExclusiveBoundsFalseDrop(Rule):
    name = "exclusive_bounds_false_drop"
    message = ("Setting `exclusiveMinimum` or `exclusiveMaximum` to "
               "`false` adds no constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D3, D3H, D4))
                and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, str) and t in ("integer", "number")):
            return False
        locations = []
        if s.get("exclusiveMinimum") is False:
            locations.append(("exclusiveMinimum",))
        if s.get("exclusiveMaximum") is False:
            locations.append(("exclusiveMaximum",))
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        for loc in result.locations:
            schema.pop(loc[0], None)


class DraftRefSiblings(Rule):
    name = "draft_ref_siblings"
    message = ("In Draft 7 and older dialects, keywords sibling to `$ref` "
               "are never evaluated")

    def condition(self, ctx):
        s = ctx.schema
        if not ctx.vocab.contains_any((D7, D6, D4, D3, D3H, D2, D1, D0)):
            return False
        if not (isinstance(s, dict) and "$ref" in s):
            return False
        locations = []
        for kw in s:
            t = walker(kw, ctx.vocab).type
            if t in ("Reference", "Comment") or kw == "$schema":
                continue
            locations.append((kw,))
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        for loc in result.locations:
            schema.pop(loc[0], None)


class DynamicRefToStaticRef(Rule):
    name = "dynamic_ref_to_static_ref"
    message = ("A dynamic reference whose destination is unambiguous can "
               "be expressed as a static reference")

    def condition(self, ctx):
        s = ctx.schema
        if not (isinstance(s, dict) and "$ref" not in s):
            return False
        if ctx.vocab.contains(V2020_CORE) and "$dynamicRef" in s:
            rp = ctx.location.pointer + ("$dynamicRef",)
            ref = ctx.frame.reference(0, rp) or ctx.frame.reference(1, rp)
            if ref is None:
                return False
            dest = ctx.frame.traverse(ref.destination)
            if dest is None:
                return False
            if dest.kind == "anchor":
                sub = try_get_at(ctx.root, dest.pointer)
                if isinstance(sub, dict):
                    da = sub.get("$dynamicAnchor")
                    if isinstance(da, str):
                        frag = ref.destination.partition("#")[2] \
                            if "#" in ref.destination else ref.destination
                        if frag == da:
                            return False
            self._keyword = "$dynamicRef"
            return [("$dynamicRef",)]
        if ctx.vocab.contains(V2019_CORE) and "$recursiveRef" in s:
            rp = ctx.location.pointer + ("$recursiveRef",)
            ref = ctx.frame.reference(0, rp) or ctx.frame.reference(1, rp)
            if ref is None:
                return False
            dest = ctx.frame.traverse(ref.destination)
            if dest is None:
                return False
            sub = try_get_at(ctx.root, dest.pointer)
            if isinstance(sub, dict) \
                    and sub.get("$recursiveAnchor") is True:
                return False
            self._keyword = "$recursiveRef"
            return [("$recursiveRef",)]
        return False

    def transform(self, schema, result):
        kw = self._keyword
        ordered = {("$ref" if k == kw else k): v for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)


class UnknownKeywordsPrefix(Rule):
    name = "unknown_keywords_prefix"
    message = ("Future versions of JSON Schema will refuse to evaluate "
               "unknown keywords or custom keywords from optional "
               "vocabularies that don't have an x- prefix")

    def condition(self, ctx):
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        locations = []
        for kw in s:
            if kw.startswith("x-"):
                continue
            if walker(kw, ctx.vocab).type == "Unknown" \
                    and not ctx.vocab.has_unknown():
                locations.append((kw,))
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        self._renames = {}
        for loc in result.locations:
            kw = loc[0]
            prefixed = "x-" + kw
            while prefixed in schema:
                prefixed = "x-" + prefixed
            self._renames[kw] = prefixed
        ordered = {self._renames.get(k, k): v for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)

    def rereference(self, reference, origin, target, current):
        for old, new in self._renames.items():
            result = rebase(target, current + (old,), current + (new,))
            if result != target:
                return result
        return target


class UnknownLocalRef(Rule):
    name = "unknown_local_ref"
    message = ("Local references that point to unknown locations are "
               "invalid and will result in evaluation failures")

    def condition(self, ctx):
        if not ctx.vocab.contains_any((V2020_CORE, V2019_CORE, D7, D6, D4,
                                       D3, D3H)):
            return False
        s = ctx.schema
        if not (isinstance(s, dict) and isinstance(s.get("$ref"), str)):
            return False
        ref = ctx.frame.reference(0, ctx.location.pointer + ("$ref",))
        if ref is None:
            return False
        if ref.fragment is None:
            return False
        if ctx.frame.traverse(ref.destination) is not None:
            return False
        if ref.base:
            if ctx.frame.traverse(ref.base) is None:
                return False
        return [("$ref",)]

    def transform(self, schema, result):
        schema.pop("$ref", None)


class RequiredPropertiesInProperties(Rule):
    name = "required_properties_in_properties"
    message = ("Every property listed in the `required` keyword must be "
               "explicitly defined using the `properties` keyword")

    @staticmethod
    def _defined_in_properties(schema: dict, prop: str) -> bool:
        props = schema.get("properties")
        return isinstance(props, dict) and prop in props

    def condition(self, ctx):
        ok = (ctx.vocab.contains(V2020_VAL)
              and ctx.vocab.contains(V2020_APP)) or \
             (ctx.vocab.contains(V2019_VAL)
              and ctx.vocab.contains(V2019_APP)) or \
            ctx.vocab.contains_any((D7, D6, D4))
        s = ctx.schema
        if not (ok and isinstance(s, dict)):
            return False
        required = s.get("required")
        if not (isinstance(required, list) and required):
            return False
        ap = s.get("additionalProperties")
        if not ("additionalProperties" not in s or ap is True):
            return False
        locations = []
        for index, prop in enumerate(required):
            if not isinstance(prop, str):
                continue
            if self._defined_in_properties(s, prop):
                continue
            # WALK_UP_IN_PLACE_APPLICATORS: ancestors reached through
            # in-place applicators may define the property
            found = False
            cursor = ctx.location
            while cursor is not None and cursor.parent is not None:
                parent_loc = ctx.frame.traverse_pointer(cursor.parent)
                if parent_loc is None:
                    break
                # only walk through in-place applicator edges
                edge = cursor.pointer[len(parent_loc.pointer):]
                if edge:
                    kw = edge[0]
                    t = walker(kw, ctx.frame.vocabularies(parent_loc)).type
                    if t not in IN_PLACE_APPLICATORS:
                        break
                ancestor = try_get_at(ctx.root, parent_loc.pointer)
                if isinstance(ancestor, dict) \
                        and self._defined_in_properties(ancestor, prop):
                    found = True
                    break
                cursor = parent_loc
            if not found:
                locations.append(("required", index))
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        if not isinstance(schema.get("properties"), dict):
            schema["properties"] = {}
        for loc in result.locations:
            prop = schema["required"][loc[1]]
            schema["properties"][prop] = True


class OrphanDefinitions(Rule):
    name = "orphan_definitions"
    message = ("Schema definitions in `$defs` or `definitions` that are "
               "never internally referenced can be removed")

    def condition(self, ctx):
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        modern = ctx.vocab.contains(V2020_CORE) \
            or ctx.vocab.contains(V2019_CORE)
        draft = ctx.vocab.contains_any((D7, D6, D4))
        has_defs = modern and "$defs" in s
        has_definitions = (modern or draft) and "definitions" in s
        if not (has_defs or has_definitions):
            return False
        orphans: list = []
        for container, has in (("$defs", has_defs),
                               ("definitions", has_definitions)):
            if not has or not isinstance(s.get(container), dict):
                continue
            for name in s[container]:
                entry_ptr = ctx.location.pointer + (container, name)
                loc = ctx.frame.traverse_pointer(entry_ptr)
                if loc is None:
                    continue
                if ctx.frame.is_reachable(loc):
                    continue
                # a reachable reference THROUGH the subtree keeps it
                keeps = False
                for ref in ctx.frame.references:
                    dest = ctx.frame.traverse(ref.destination)
                    if dest is None \
                            or not starts_with(dest.pointer, entry_ptr):
                        continue
                    src = ctx.frame.traverse_pointer(ref.origin[:-1])
                    if src is None or ctx.frame.is_reachable(src):
                        keeps = True
                        break
                if keeps:
                    continue
                if not ctx.frame.standalone():
                    # keep subtrees holding dynamic anchors
                    dyn = any(
                        loc2.kind == "anchor" and loc2.reftype == 1
                        and starts_with(loc2.pointer, entry_ptr)
                        for loc2 in ctx.frame.locations)
                    if dyn:
                        continue
                orphans.append((container, name))
        if not orphans:
            return False
        return orphans

    def transform(self, schema, result):
        for loc in result.locations:
            container, name = loc
            if isinstance(schema.get(container), dict):
                schema[container].pop(name, None)
        for container in ("$defs", "definitions"):
            if isinstance(schema.get(container), dict) \
                    and not schema[container]:
                del schema[container]


# ---------------------------------------------------------------------------
# Rules — linter/
# ---------------------------------------------------------------------------

_META_VOCABS = (V2020_META, V2019_META, D7, D6, D4, D3, D3H, D2, D1)


class EqualNumericBoundsToConst(Rule):
    name = "equal_numeric_bounds_to_const"
    message = ("Setting `minimum` and `maximum` to the same number only "
               "leaves one possible value")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
                and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, str) and t in ("integer", "number")):
            return False
        mn, mx = s.get("minimum"), s.get("maximum")
        if not (isinstance(mn, (int, float)) and not isinstance(mn, bool)):
            return False
        if not (isinstance(mx, (int, float)) and not isinstance(mx, bool)
                and mn == mx):
            return False
        emn = s.get("exclusiveMinimum")
        if isinstance(emn, (int, float)) and not isinstance(emn, bool) \
                and emn >= mn:
            return False
        emx = s.get("exclusiveMaximum")
        if isinstance(emx, (int, float)) and not isinstance(emx, bool) \
                and emx <= mx:
            return False
        return [("minimum",), ("maximum",)]

    def transform(self, schema, result):
        ordered = {("const" if k == "minimum" else k): v
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)
        schema.pop("type", None)
        schema.pop("maximum", None)


class ConstNotInEnum(Rule):
    name = "const_not_in_enum"
    message = ("Do not set the `const` and `enum` keyword at the same "
               "time, mainly when their values diverge")
    mutates = False
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
                and isinstance(s, dict) and "const" in s):
            return False
        ev = s.get("enum")
        if not (isinstance(ev, list) and not jcontains(ev, s["const"])):
            return False
        return [("const",), ("enum",)]


class ContentSchemaDefault(Rule):
    name = "content_schema_default"
    message = ("Setting the `contentSchema` keyword to the true schema "
               "does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_CONTENT, V2019_CONTENT))
                and isinstance(s, dict) and "contentSchema" in s
                and is_empty_schema(s["contentSchema"])):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer,
                                            "contentSchema"):
            return False
        return [("contentSchema",)]

    def transform(self, schema, result):
        schema.pop("contentSchema", None)


class DependenciesDefault(Rule):
    name = "dependencies_default"
    message = ("Setting the `dependencies` keyword to an empty object "
               "does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D7, D6, D4, D3, D3H))
                and isinstance(s, dict)
                and isinstance(s.get("dependencies"), dict)
                and not s["dependencies"]):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer,
                                            "dependencies"):
            return False
        return [("dependencies",)]

    def transform(self, schema, result):
        schema.pop("dependencies", None)


class DependentRequiredDefault(Rule):
    name = "dependent_required_default"
    message = ("Setting the `dependentRequired` keyword to an empty "
               "object does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL))
                and isinstance(s, dict)):
            return False
        dr = s.get("dependentRequired")
        if not (isinstance(dr, dict) and not dr):
            return False
        return [("dependentRequired",)]

    def transform(self, schema, result):
        schema.pop("dependentRequired", None)


class ItemsArrayDefault(Rule):
    name = "items_array_default"
    message = ("Setting the `items` keyword to the empty array does not "
               "add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2019_APP, D7, D6, D4, D3, D3H,
                                        D2, D2H, D1, D1H))
                and isinstance(s, dict)):
            return False
        items = s.get("items")
        if not (isinstance(items, list) and not items):
            return False
        return [("items",)]

    def transform(self, schema, result):
        schema.pop("items", None)


class ItemsSchemaDefault(Rule):
    name = "items_schema_default"
    message = ("Setting the `items` keyword to the true schema does not "
               "add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_APP, V2019_APP, D7, D6, D4,
                                        D3, D3H, D2, D2H, D1, D1H))
                and isinstance(s, dict) and "items" in s
                and is_empty_schema(s["items"])):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, "items"):
            return False
        return [("items",)]

    def transform(self, schema, result):
        schema.pop("items", None)


class DisallowDefault(Rule):
    name = "disallow_default"
    message = ("Setting the `disallow` keyword to the empty array does "
               "not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D3, D3H)) and isinstance(s, dict)):
            return False
        d = s.get("disallow")
        if not (isinstance(d, list) and not d):
            return False
        return [("disallow",)]

    def transform(self, schema, result):
        schema.pop("disallow", None)


class DivisibleByDefault(Rule):
    name = "divisible_by_default"
    message = "Setting `divisibleBy` to 1 does not add any further constraint"

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((D3, D3H)) and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, str) and t == "integer"):
            return False
        db = s.get("divisibleBy")
        if not (isinstance(db, (int, float)) and not isinstance(db, bool)
                and db == 1):
            return False
        return [("divisibleBy",)]

    def transform(self, schema, result):
        schema.pop("divisibleBy", None)


class MultipleOfDefault(Rule):
    name = "multiple_of_default"
    message = "Setting `multipleOf` to 1 does not add any further constraint"

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4))
                and isinstance(s, dict)):
            return False
        t = s.get("type")
        if not (isinstance(t, str) and t == "integer"):
            return False
        mo = s.get("multipleOf")
        if not (isinstance(mo, (int, float)) and not isinstance(mo, bool)
                and mo == 1):
            return False
        return [("multipleOf",)]

    def transform(self, schema, result):
        schema.pop("multipleOf", None)


class PatternPropertiesDefault(Rule):
    name = "pattern_properties_default"
    message = ("Setting the `patternProperties` keyword to the empty "
               "object does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_APP, V2019_APP, D7, D6, D4,
                                        D3, D3H))
                and isinstance(s, dict)):
            return False
        pp = s.get("patternProperties")
        if not (isinstance(pp, dict) and not pp):
            return False
        return [("patternProperties",)]

    def transform(self, schema, result):
        schema.pop("patternProperties", None)


_REGEX_VOCABS = (V2020_VAL, V2019_VAL, D7, D7H, D6, D6H, D4, D4H, D3, D3H,
                 D2, D2H, D1, D1H, D0, D0H)


class PatternNonEcmaRegex(Rule):
    name = "pattern_non_ecma_regex"
    message = ("For interoperability reasons, only set this keyword to a "
               "regular expression that strictly adheres to the ECMA-262 "
               "dialect")
    mutates = False
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any(_REGEX_VOCABS)
                and isinstance(s, dict)):
            return False
        p = s.get("pattern")
        if not isinstance(p, str):
            return False
        if is_regex_ecma(p):
            return False
        return [("pattern",)]


class PatternPropertiesNonEcmaRegex(Rule):
    name = "pattern_properties_non_ecma_regex"
    message = ("For interoperability reasons, only set the keys of this "
               "keyword to regular expressions that strictly adhere to "
               "the ECMA-262 dialect")
    mutates = False
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any(
                (V2020_APP, V2019_APP, D7, D7H, D6, D6H, D4, D4H, D3, D3H))
                and isinstance(s, dict)):
            return False
        pp = s.get("patternProperties")
        if not (isinstance(pp, dict) and pp):
            return False
        offenders = [("patternProperties", k) for k in pp
                     if not is_regex_ecma(k)]
        if not offenders:
            return False
        return offenders


class PropertiesDefault(Rule):
    name = "properties_default"
    message = ("Setting the `properties` keyword to the empty object "
               "does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_APP, V2019_APP, D7, D6, D4,
                                        D3, D3H, D2, D2H, D1, D1H))
                and isinstance(s, dict)):
            return False
        p = s.get("properties")
        if not (isinstance(p, dict) and not p):
            return False
        return [("properties",)]

    def transform(self, schema, result):
        schema.pop("properties", None)


class PropertyNamesDefault(Rule):
    name = "property_names_default"
    message = ("Setting the `propertyNames` keyword to the empty object "
               "does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_APP, V2019_APP, D7, D6))
                and isinstance(s, dict)):
            return False
        pn = s.get("propertyNames")
        if not (isinstance(pn, dict) and not pn):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer,
                                            "propertyNames"):
            return False
        return [("propertyNames",)]

    def transform(self, schema, result):
        schema.pop("propertyNames", None)


class PropertyNamesTypeDefault(Rule):
    name = "property_names_type_default"
    message = ("Setting the `type` keyword to `string` inside "
               "`propertyNames` does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_APP, V2019_APP, D7, D6))
                and isinstance(s, dict)):
            return False
        pn = s.get("propertyNames")
        if not isinstance(pn, dict):
            return False
        t = pn.get("type")
        ok = (isinstance(t, str) and t == "string") or \
            (isinstance(t, list)
             and all(isinstance(i, str) and i == "string" for i in t))
        if t is None or not ok:
            return False
        return [("propertyNames", "type")]

    def transform(self, schema, result):
        schema["propertyNames"].pop("type", None)


class _UnevaluatedDefault(Rule):
    keyword = ""

    def condition(self, ctx):
        s = ctx.schema
        kw = self.keyword
        if not (ctx.vocab.contains_any((V2020_UNEVAL, V2019_APP))
                and isinstance(s, dict) and kw in s
                and is_empty_schema(s[kw])):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer, kw):
            return False
        return [(kw,)]

    def transform(self, schema, result):
        schema.pop(self.keyword, None)


class UnevaluatedItemsDefault(_UnevaluatedDefault):
    name = "unevaluated_items_default"
    message = ("Setting the `unevaluatedItems` keyword to the true schema "
               "does not add any further constraint")
    keyword = "unevaluatedItems"


class UnevaluatedPropertiesDefault(_UnevaluatedDefault):
    name = "unevaluated_properties_default"
    message = ("Setting the `unevaluatedProperties` keyword to the true "
               "schema does not add any further constraint")
    keyword = "unevaluatedProperties"


class UnsatisfiableMaxContains(Rule):
    name = "unsatisfiable_max_contains"
    message = ("Setting the `maxContains` keyword to a number greater "
               "than or equal to the array upper bound does not add any "
               "further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL))
                and isinstance(s, dict)):
            return False
        mc = s.get("maxContains")
        if not (isinstance(mc, int) and not isinstance(mc, bool)):
            return False
        mi = s.get("maxItems")
        if not (isinstance(mi, int) and not isinstance(mi, bool)
                and mc >= mi):
            return False
        return [("maxContains",), ("maxItems",)]

    def transform(self, schema, result):
        schema.pop("maxContains", None)


class IncoherentMinMaxContains(Rule):
    name = "incoherent_min_max_contains"
    message = ("`minContains` greater than `maxContains` makes the schema "
               "unsatisfiable")
    mutates = False
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL))
                and isinstance(s, dict) and "contains" in s):
            return False
        mn = s.get("minContains")
        if not (isinstance(mn, int) and not isinstance(mn, bool)):
            return False
        mx = s.get("maxContains")
        if not (isinstance(mx, int) and not isinstance(mx, bool)
                and mn > mx):
            return False
        return [("minContains",), ("maxContains",)]


class UnsatisfiableMinProperties(Rule):
    name = "unsatisfiable_min_properties"
    message = ("Setting `minProperties` to a number less than `required` "
               "does not add any further constraint")

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4))
                and isinstance(s, dict)):
            return False
        mp = s.get("minProperties")
        if not (isinstance(mp, int) and not isinstance(mp, bool)):
            return False
        req = s.get("required")
        if not (isinstance(req, list) and junique(req)
                and len(req) >= mp):
            return False
        return [("minProperties",), ("required",)]

    def transform(self, schema, result):
        schema.pop("minProperties", None)


class EnumToConst(Rule):
    name = "enum_to_const"
    message = "An `enum` of a single value can be expressed as `const`"

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6))
                and isinstance(s, dict) and "const" not in s):
            return False
        ev = s.get("enum")
        if not (isinstance(ev, list) and len(ev) == 1):
            return False
        return [("enum",)]

    def transform(self, schema, result):
        value = schema["enum"][0]
        ordered = {("const" if k == "enum" else k):
                   (value if k == "enum" else v)
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)


class ForbidEmptyEnum(Rule):
    name = "forbid_empty_enum"
    message = "An empty `enum` validates nothing and is unsatisfiable"

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_VAL, V2019_VAL, D7, D6, D4))
                and isinstance(s, dict) and "not" not in s):
            return False
        ev = s.get("enum")
        if not (isinstance(ev, list) and not ev):
            return False
        if ctx.frame.has_references_through(ctx.location.pointer):
            return False
        return [("enum",)]

    def transform(self, schema, result):
        ordered = {("not" if k == "enum" else k):
                   ({} if k == "enum" else v)
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)


class TopLevelTitle(Rule):
    name = "top_level_title"
    message = ("Set a concise non-empty title at the top level of the "
               "schema to explain what the definition is about")
    mutates = False
    reframe = False

    def condition(self, ctx):
        if ctx.location.pointer != ():
            return False
        if not ctx.vocab.contains_any(_META_VOCABS):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        t = s.get("title")
        if isinstance(t, str) and not t:
            return [("title",)]
        return "title" not in s


class TopLevelDescription(Rule):
    name = "top_level_description"
    message = ("Set a non-empty description at the top level of the "
               "schema to explain what the definition is about in detail")
    mutates = False
    reframe = False

    def condition(self, ctx):
        if ctx.location.pointer != ():
            return False
        if not ctx.vocab.contains_any(_META_VOCABS):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        d = s.get("description")
        if isinstance(d, str) and not d:
            return [("description",)]
        return "description" not in s


class TopLevelExamples(Rule):
    name = "top_level_examples"
    message = ("Set a non-empty examples array at the top level of the "
               "schema to illustrate the expected data")
    mutates = False
    reframe = False

    def condition(self, ctx):
        if ctx.location.pointer != ():
            return False
        if not ctx.vocab.contains_any((V2020_META, V2019_META, D7, D6)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        e = s.get("examples")
        if isinstance(e, list) and not e:
            return [("examples",)]
        return "examples" not in s


class TitleDescriptionEqual(Rule):
    name = "title_description_equal"
    message = ("The title and description metadata keywords should not be "
               "set to the same value")

    def condition(self, ctx):
        if not ctx.vocab.contains_any(_META_VOCABS):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        if not ("title" in s and "description" in s):
            return False
        if not (isinstance(s["title"], str)
                and isinstance(s["description"], str)):
            return False
        if s["title"] != s["description"]:
            return False
        return [("title",), ("description",)]

    def transform(self, schema, result):
        schema.pop("description", None)


class _TrailingPeriod(Rule):
    keyword = ""
    reframe = False

    def condition(self, ctx):
        if not ctx.vocab.contains_any(_META_VOCABS):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        v = s.get(self.keyword)
        if not isinstance(v, str):
            return False
        if not (v and v.endswith(".")):
            return False
        return [(self.keyword,)]

    def transform(self, schema, result):
        v = schema[self.keyword]
        schema[self.keyword] = v.rstrip(".")


class TitleTrailingPeriod(_TrailingPeriod):
    name = "title_trailing_period"
    message = ("Titles should not end with a period to give user "
               "interfaces flexibility in presenting the text")
    keyword = "title"


class DescriptionTrailingPeriod(_TrailingPeriod):
    name = "description_trailing_period"
    message = ("Descriptions should not end with a period to give user "
               "interfaces flexibility in presenting the text")
    keyword = "description"


class _TrimRule(Rule):
    keyword = ""
    vocabs = _META_VOCABS
    reframe = False

    def condition(self, ctx):
        if not ctx.vocab.contains_any(self.vocabs):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        v = s.get(self.keyword)
        if not isinstance(v, str):
            return False
        if v == v.strip():
            return False
        return [(self.keyword,)]

    def transform(self, schema, result):
        schema[self.keyword] = schema[self.keyword].strip()


class TitleTrim(_TrimRule):
    name = "title_trim"
    message = "Titles should not contain leading or trailing whitespace"
    keyword = "title"


class DescriptionTrim(_TrimRule):
    name = "description_trim"
    message = ("Descriptions should not contain leading or trailing "
               "whitespace")
    keyword = "description"


class CommentTrim(_TrimRule):
    name = "comment_trim"
    message = "Comments should not contain leading or trailing whitespace"
    keyword = "$comment"
    vocabs = (V2020_CORE, V2019_CORE, D7)


class ConflictingReadOnlyWriteOnly(Rule):
    name = "conflicting_readonly_writeonly"
    message = ("The `readOnly` and `writeOnly` keywords are mutually "
               "exclusive")
    mutates = False
    reframe = False

    def condition(self, ctx):
        if not ctx.vocab.contains_any((V2020_META, V2019_META, D7)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        ro, wo = s.get("readOnly"), s.get("writeOnly")
        if not (ro is True and wo is True):
            return False
        return [("readOnly",), ("writeOnly",)]


class DuplicateExamples(Rule):
    name = "duplicate_examples"
    message = "Setting duplicate values in `examples` is redundant"
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_META, V2019_META, D7, D6))
                and isinstance(s, dict)):
            return False
        e = s.get("examples")
        if not (isinstance(e, list) and not junique(e)):
            return False
        return [("examples",)]

    def transform(self, schema, result):
        out: list = []
        for v in schema["examples"]:
            if not jcontains(out, v):
                out.append(v)
        schema["examples"] = out


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class SimplePropertiesIdentifiers(Rule):
    name = "simple_properties_identifiers"
    message = ("Set `properties` to identifier names that can be easily "
               "mapped to programming languages (matching "
               "[A-Za-z_][A-Za-z0-9_]*)")
    mutates = False
    reframe = False

    def condition(self, ctx):
        if not ctx.vocab.contains_any((V2020_APP, V2019_APP, D7, D6, D4,
                                       D3, D3H, D2, D2H, D1, D1H)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        props = s.get("properties")
        if not (isinstance(props, dict) and props):
            return False
        if ctx.vocab.contains_any((V2020_CORE, V2019_CORE)):
            base_loc = ctx.frame.traverse(ctx.location.base)
            if base_loc is not None:
                resource = try_get_at(ctx.root, base_loc.pointer)
                if isinstance(resource, dict) \
                        and "$vocabulary" in resource:
                    return False
        else:
            if ctx.location.base == ctx.location.dialect \
                    or ctx.location.base + "#" == ctx.location.dialect:
                return False
        offenders = [("properties", k) for k in props
                     if not _IDENT_RE.fullmatch(k)]
        if not offenders:
            return False
        return offenders


_ANCHOR_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_.-]*$")


class PortableAnchorNames(Rule):
    name = "portable_anchor_names"
    message = ("Keep anchors within the safe allowed character set across "
               "JSON Schema dialects (`^[A-Za-z][A-Za-z0-9_.-]*$`)")
    mutates = False
    reframe = False

    def condition(self, ctx):
        if not ctx.vocab.contains_any((V2020_CORE, V2019_CORE, D7, D6, D4)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        offenders = []

        def check_anchor(kw):
            v = s.get(kw)
            if isinstance(v, str) and v and not _ANCHOR_RE.fullmatch(v):
                offenders.append((kw,))

        if ctx.vocab.contains_any((V2020_CORE, V2019_CORE)):
            check_anchor("$anchor")
        if ctx.vocab.contains(V2020_CORE):
            check_anchor("$dynamicAnchor")
        if ctx.vocab.contains_any((D7, D6, D4)):
            idkw = "id" if ctx.vocab.contains(D4) else "$id"
            v = s.get(idkw)
            if isinstance(v, str) and "#" in v:
                frag = v.partition("#")[2]
                if frag and not _ANCHOR_RE.fullmatch(frag):
                    offenders.append((idkw,))
        if not offenders:
            return False
        return offenders


_KNOWN_META_PREFIXES = (
    "http://json-schema.org/", "https://json-schema.org/")


class InvalidExternalRef(Rule):
    name = "invalid_external_ref"
    message = "External references must point to schemas that can be resolved"
    mutates = False
    reframe = False

    def condition(self, ctx):
        if ctx.frame.standalone():
            return False
        if not ctx.vocab.contains_any((V2020_CORE, V2019_CORE, D7, D6, D4,
                                       D3, D3H)):
            return False
        s = ctx.schema
        if not (isinstance(s, dict) and isinstance(s.get("$ref"), str)):
            return False
        ref = ctx.frame.reference(0, ctx.location.pointer + ("$ref",))
        if ref is None:
            return False
        if ctx.frame.traverse(ref.destination) is not None:
            return False
        if not ref.base:
            return False
        if any(ref.base.startswith(p) for p in _KNOWN_META_PREFIXES):
            return False
        if ctx.frame.traverse(ref.base) is not None:
            return False
        remote = ctx.resolver(ref.base) if ctx.resolver else None
        if remote is None:
            return [("$ref",)]
        if ref.fragment is not None:
            try:
                rframe = LintFrame(remote, resolver=ctx.resolver,
                                   default_dialect=ctx.location.dialect,
                                   default_id=ref.base)
            except Exception:   # noqa: BLE001
                return [("$ref",)]
            if rframe.traverse(ref.destination) is None:
                return [("$ref",)]
            return False
        return False


_FORMATS_BY_ERA = {
    "d3": frozenset(("date-time", "date", "time", "utc-millisec", "regex",
                     "color", "style", "phone", "uri", "email",
                     "ip-address", "ipv6", "host-name")),
    "d4": frozenset(("date-time", "email", "hostname", "ipv4", "ipv6",
                     "uri")),
    "d6": frozenset(("date-time", "email", "hostname", "ipv4", "ipv6",
                     "uri", "uri-reference", "uri-template",
                     "json-pointer")),
    "d7": frozenset(("date-time", "date", "time", "email", "idn-email",
                     "hostname", "idn-hostname", "ipv4", "ipv6", "uri",
                     "uri-reference", "iri", "iri-reference",
                     "uri-template", "json-pointer",
                     "relative-json-pointer", "regex")),
    "2019": frozenset(("date-time", "date", "time", "duration", "email",
                       "idn-email", "hostname", "idn-hostname", "ipv4",
                       "ipv6", "uri", "uri-reference", "iri",
                       "iri-reference", "uuid", "uri-template",
                       "json-pointer", "relative-json-pointer", "regex")),
}
_FORMATS_BY_ERA["2020"] = _FORMATS_BY_ERA["2019"]


class UnknownFormatPrefix(Rule):
    name = "unknown_format_prefix"
    message = ("For interoperability purposes, the JSON Schema "
               "specification advises against the use of `format` values "
               "that are not explicitly defined by the specification")

    def condition(self, ctx):
        s = ctx.schema
        if not (isinstance(s, dict) and "format" in s):
            return False
        fv = s["format"]
        if not isinstance(fv, str):
            return False
        v = ctx.vocab
        if v.contains_any((D3, D3H)):
            rec = _FORMATS_BY_ERA["d3"]
        elif v.contains_any((D4, D4H)):
            rec = _FORMATS_BY_ERA["d4"]
        elif v.contains_any((D6, D6H)):
            rec = _FORMATS_BY_ERA["d6"]
        elif v.contains_any((D7, D7H)):
            rec = _FORMATS_BY_ERA["d7"]
        elif v.contains(V2019_FMT):
            rec = _FORMATS_BY_ERA["2019"]
        elif v.contains(V2020_FMT_A) or v.contains(V2020_FMT_S):
            rec = _FORMATS_BY_ERA["2020"]
        else:
            return False
        if fv in rec:
            return False
        return [("format",)]

    def transform(self, schema, result):
        prefixed = "x-format"
        while prefixed in schema:
            prefixed = "x-" + prefixed
        ordered = {(prefixed if k == "format" else k): v
                   for k, v in schema.items()}
        schema.clear()
        schema.update(ordered)


class _ValidInstanceRule(Rule):
    """valid_default / valid_examples — needs an explaining evaluator."""

    def _explain(self, ctx, instance):
        if ctx.explain is None:
            return None
        return ctx.explain(ctx, instance)


class ValidDefault(_ValidInstanceRule):
    name = "valid_default"
    message = "Only set a `default` value that validates against the schema"

    def condition(self, ctx):
        v = ctx.vocab
        s = ctx.schema
        if not (v.contains_any((V2020_META, V2019_META, D7, D6, D4, D3,
                                D3H))
                and isinstance(s, dict) and "default" in s):
            return False
        if v.contains_any((D7, D6, D4, D3, D3H)) and "$ref" in s:
            return False
        entries = self._explain(ctx, s["default"])
        if not entries:
            return False
        msg = []
        for e in entries:
            msg.append(f"{e[0]}\n  at instance location \"{e[1]}\"\n"
                       f"  at evaluate path \"{e[2]}\"\n")
        return Result(True, [("default",)], "".join(msg))

    def transform(self, schema, result):
        schema.pop("default", None)


class ValidExamples(_ValidInstanceRule):
    name = "valid_examples"
    message = ("Only include instances in the `examples` array that "
               "validate against the schema")

    def condition(self, ctx):
        v = ctx.vocab
        s = ctx.schema
        if not (v.contains_any((V2020_META, V2019_META, D7, D6))
                and isinstance(s, dict)):
            return False
        ex = s.get("examples")
        if not (isinstance(ex, list) and ex):
            return False
        if v.contains_any((D7, D6, D4)) and "$ref" in s:
            return False
        for cursor, example in enumerate(ex):
            entries = self._explain(ctx, example)
            if entries:
                msg = [f"Invalid example instance at index {cursor}\n"]
                for e in entries:
                    msg.append(
                        f"  {e[0]}\n    at instance location \"{e[1]}\"\n"
                        f"    at evaluate path \"{e[2]}\"\n")
                return Result(True, [("examples", cursor)], "".join(msg))
        return False

    def transform(self, schema, result):
        schema.pop("examples", None)


# ---------------------------------------------------------------------------
# Rules — wrapper tail
# ---------------------------------------------------------------------------

class UnnecessaryAllOfRefWrapperModern(Rule):
    name = "unnecessary_allof_ref_wrapper_modern"
    message = ("Wrapping `$ref` in `allOf` was only necessary in JSON "
               "Schema Draft 7 and older")

    def condition(self, ctx):
        if not ctx.vocab.contains_any(_MODERN_APP):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        all_of = s.get("allOf")
        if not isinstance(all_of, list):
            return False
        if len(all_of) > 1 and all(
                isinstance(e, dict) and "$ref" in e for e in all_of):
            return False
        locations = []
        for i, entry in enumerate(all_of):
            if isinstance(entry, dict) and "$ref" in entry \
                    and "$id" not in entry and "$ref" not in s:
                locations.append(("allOf", i, "$ref"))
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        for loc in result.locations:
            i, kw = loc[1], loc[2]
            if kw not in schema:
                # insert before allOf, preserving order
                value = schema["allOf"][i][kw]
                ordered = {}
                for k, v in schema.items():
                    if k == "allOf":
                        ordered[kw] = value
                    ordered[k] = v
                schema.clear()
                schema.update(ordered)
                del schema["allOf"][i][kw]
        schema["allOf"] = [e for e in schema["allOf"]
                           if not is_empty_schema(e)]
        if not schema["allOf"]:
            del schema["allOf"]


class UnnecessaryAllOfRefWrapperDraft(Rule):
    name = "unnecessary_allof_ref_wrapper_draft"
    message = ("Wrapping `$ref` in `allOf` is only necessary if there are "
               "other sibling keywords")

    def condition(self, ctx):
        if not ctx.vocab.contains_any((D7, D6, D4)):
            return False
        s = ctx.schema
        if not (isinstance(s, dict) and len(s) == 1):
            return False
        all_of = s.get("allOf")
        if not (isinstance(all_of, list) and len(all_of) == 1):
            return False
        entry = all_of[0]
        if not (isinstance(entry, dict) and len(entry) == 1
                and "$ref" in entry):
            return False
        return [("allOf", 0, "$ref")]

    def transform(self, schema, result):
        value = schema["allOf"][0]["$ref"]
        del schema["allOf"]
        schema["$ref"] = value


class UnnecessaryExtendsRefWrapper(Rule):
    name = "unnecessary_extends_ref_wrapper"
    message = ("Wrapping `$ref` in `extends` is only necessary if there "
               "are other sibling keywords")

    def condition(self, ctx):
        if not ctx.vocab.contains_any((D3, D3H)):
            return False
        s = ctx.schema
        if not (isinstance(s, dict) and len(s) == 1):
            return False
        extends = s.get("extends")
        if extends is None:
            return False
        if isinstance(extends, dict):
            if not (len(extends) == 1 and "$ref" in extends):
                return False
            return [("extends", "$ref")]
        if isinstance(extends, list):
            if len(extends) != 1:
                return False
            branch = extends[0]
            if not (isinstance(branch, dict) and len(branch) == 1
                    and "$ref" in branch):
                return False
            return [("extends", 0, "$ref")]
        return False

    def transform(self, schema, result):
        loc = result.locations[0]
        if len(loc) == 3:
            value = schema["extends"][0]["$ref"]
        else:
            value = schema["extends"]["$ref"]
        del schema["extends"]
        schema["$ref"] = value


class UnnecessaryAllOfWrapper(Rule):
    name = "unnecessary_allof_wrapper"
    message = ("Keywords inside `allOf` that do not conflict with the "
               "parent schema can be elevated")

    def condition(self, ctx):
        v = ctx.vocab
        if not v.contains_any((*_MODERN_APP, D7, D6, D4)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        all_of = s.get("allOf")
        if not (isinstance(all_of, list) and all_of):
            return False
        freq: dict = {}
        for entry in all_of:
            if not isinstance(entry, dict):
                continue
            for kw in entry:
                t = walker(kw, v).type
                if t in ("Annotation", "Comment"):
                    continue
                freq[kw] = freq.get(kw, 0) + 1
        blocked: set = set()
        uneval_ok = v.contains_any((V2020_UNEVAL, V2019_APP))
        for kw in s:
            if uneval_ok and kw in ("unevaluatedProperties",
                                    "unevaluatedItems"):
                continue
            # dependencies come from the full walker; approximate with
            # the known draft<=7 keyword dependencies
            for dep in _keyword_dependencies(kw, v):
                blocked.add(dep)
        ptv = s.get("type")
        parent_types = parse_schema_type(ptv) \
            if ptv is not None and v.contains_any(
                (V2020_VAL, V2019_VAL, D7, D6, D4)) else frozenset()
        locations: list = []
        elevated: set = set()
        for index in range(len(all_of), 0, -1):
            entry = all_of[index - 1]
            if not isinstance(entry, dict) or not entry or "$ref" in entry:
                continue
            ep = ctx.location.pointer + ("allOf", index - 1)
            if ctx.frame.has_references_to(ep):
                continue
            if not self._is_anonymous(entry, v):
                continue
            if uneval_ok and ("unevaluatedProperties" in entry
                              or "unevaluatedItems" in entry):
                continue

            def try_elevate(kw, val) -> bool:
                deps = _keyword_dependencies(kw, v)
                if kw in elevated or (kw in s and not jeq(s[kw], val)):
                    return False
                if kw in blocked:
                    return False
                if freq.get(kw, 0) > 1:
                    return False
                meta = walker(kw, v)
                if meta.instances and parent_types \
                        and not (meta.instances & parent_types):
                    return False
                if any(dep not in entry and (dep in s or dep in elevated)
                       for dep in deps):
                    return False
                locations.append(("allOf", index - 1, kw))
                elevated.add(kw)
                if not (uneval_ok and kw in ("unevaluatedProperties",
                                             "unevaluatedItems")):
                    for dep in deps:
                        if dep not in entry:
                            blocked.add(dep)
                return True

            entry_has_non_annotation = False
            non_annotation_elevated = False
            for kw, val in entry.items():
                t = walker(kw, v).type
                if t in ("Annotation", "Comment"):
                    continue
                entry_has_non_annotation = True
                if try_elevate(kw, val):
                    non_annotation_elevated = True
            if not entry_has_non_annotation or non_annotation_elevated:
                for kw, val in entry.items():
                    t = walker(kw, v).type
                    if t not in ("Annotation", "Comment"):
                        continue
                    try_elevate(kw, val)
        if not locations:
            return False
        return locations

    @staticmethod
    def _is_anonymous(entry: dict, v: Vocabularies) -> bool:
        if v.contains_any((V2020_CORE, V2019_CORE)):
            if "$id" in entry or "$anchor" in entry:
                return False
            if v.contains(V2020_CORE) and "$dynamicAnchor" in entry:
                return False
            if v.contains(V2019_CORE) \
                    and entry.get("$recursiveAnchor") is True:
                return False
            return True
        if v.contains_any((D7, D6)):
            return "$id" not in entry
        if v.contains(D4):
            return "id" not in entry
        return False

    def transform(self, schema, result):
        for loc in result.locations:
            i, kw = loc[1], loc[2]
            if kw not in schema:
                value = schema["allOf"][i][kw]
                ordered = {}
                for k, v in schema.items():
                    if k == "allOf" and kw not in ordered:
                        ordered[kw] = value
                    ordered[k] = v
                schema.clear()
                schema.update(ordered)
            schema["allOf"][i].pop(kw, None)

    def rereference(self, reference, origin, target, current):
        prefix = current + ("allOf",)
        if not starts_with(target, prefix) or len(target) < len(prefix) + 2:
            return target
        rel = target[len(prefix):]
        kw = rel[1]
        old_prefix = prefix + (rel[0], kw)
        return rebase(target, old_prefix, current + (kw,))


class UnnecessaryExtendsWrapper(Rule):
    name = "unnecessary_extends_wrapper"
    message = ("Keywords inside `extends` that do not conflict with the "
               "parent schema can be elevated")

    def condition(self, ctx):
        v = ctx.vocab
        if not v.contains_any((D3, D3H)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        extends = s.get("extends")
        if not (isinstance(extends, list) and extends):
            return False
        blocked: set = set()
        for kw in s:
            for dep in _keyword_dependencies(kw, v):
                blocked.add(dep)
        ptv = s.get("type")
        parent_types = parse_schema_type(ptv) \
            if ptv is not None and is_known_type_form(ptv, v) \
            else frozenset()
        locations: list = []
        elevated: set = set()
        for index in range(len(extends), 0, -1):
            entry = extends[index - 1]
            if not isinstance(entry, dict) or not entry or "$ref" in entry:
                continue
            ep = ctx.location.pointer + ("extends", index - 1)
            if ctx.frame.has_references_to(ep):
                continue
            if "id" in entry:
                continue
            for kw, val in entry.items():
                deps = _keyword_dependencies(kw, v)
                if kw in elevated or (kw in s and not jeq(s[kw], val)):
                    continue
                if kw in blocked:
                    continue
                meta = walker(kw, v)
                if meta.instances and parent_types \
                        and not (meta.instances & parent_types):
                    continue
                if any(dep not in entry and (dep in s or dep in elevated)
                       for dep in deps):
                    continue
                locations.append(("extends", index - 1, kw))
                elevated.add(kw)
                for dep in deps:
                    if dep not in entry:
                        blocked.add(dep)
        if not locations:
            return False
        return locations

    def transform(self, schema, result):
        for loc in result.locations:
            i, kw = loc[1], loc[2]
            if kw not in schema:
                value = schema["extends"][i][kw]
                ordered = {}
                for k, v in schema.items():
                    if k == "extends" and kw not in ordered:
                        ordered[kw] = value
                    ordered[k] = v
                schema.clear()
                schema.update(ordered)
            schema["extends"][i].pop(kw, None)

    def rereference(self, reference, origin, target, current):
        prefix = current + ("extends",)
        if not starts_with(target, prefix) or len(target) < len(prefix) + 2:
            return target
        rel = target[len(prefix):]
        kw = rel[1]
        old_prefix = prefix + (rel[0], kw)
        return rebase(target, old_prefix, current + (kw,))


class DropAllOfEmptySchemas(Rule):
    name = "drop_allof_empty_schemas"
    message = "Empty schemas in `allOf` are redundant and can be removed"

    def condition(self, ctx):
        if not ctx.vocab.contains_any((*_MODERN_APP, D7, D6, D4)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        all_of = s.get("allOf")
        if not (isinstance(all_of, list) and all_of):
            return False
        if not any(is_empty_schema(e) for e in all_of):
            return False
        return [("allOf",)]

    def transform(self, schema, result):
        new = [e for e in schema["allOf"] if not is_empty_schema(e)]
        if new:
            schema["allOf"] = new
        else:
            del schema["allOf"]


class DropExtendsEmptySchemas(Rule):
    name = "drop_extends_empty_schemas"
    message = "Empty schemas in `extends` are redundant and can be removed"

    def condition(self, ctx):
        if not ctx.vocab.contains_any((D3, D3H)):
            return False
        s = ctx.schema
        if not isinstance(s, dict):
            return False
        extends = s.get("extends")
        if "extends" not in s:
            return False
        if ctx.frame.has_references_through(
                ctx.location.pointer + ("extends",)):
            return False
        if is_empty_schema(extends):
            return [("extends",)]
        if isinstance(extends, list) and extends:
            locations = [("extends", i) for i, e in enumerate(extends)
                         if is_empty_schema(e)]
            if not locations:
                return False
            return locations
        return False

    def transform(self, schema, result):
        if len(result.locations) == 1 and len(result.locations[0]) == 1:
            del schema["extends"]
            return
        new = [e for e in schema["extends"] if not is_empty_schema(e)]
        if new:
            schema["extends"] = new
        else:
            del schema["extends"]


class EmptyObjectAsTrue(Rule):
    name = "empty_object_as_true"
    message = ("The empty schema `{}` accepts all values and is "
               "equivalent to the boolean schema `true`")
    reframe = False

    def condition(self, ctx):
        s = ctx.schema
        if not (ctx.vocab.contains_any((V2020_CORE, V2019_CORE, D7, D6,
                                        D4))
                and isinstance(s, dict) and not s):
            return False
        return True

    def transform(self, schema, result):
        # caller detects the boolean replacement via TO_BOOL marker
        raise _ReplaceWithBool(True)


class _ReplaceWithBool(Exception):
    def __init__(self, value: bool):
        self.value = value


# dependency table used by the wrapper rules (walker WITH_DEPENDENCIES):
# draft<=7 keywords depend on $ref absence etc.; the cases exercised by
# the corpus are properties->required ordering and additionalItems->items
_KW_DEPS = {
    "additionalItems": ("items",),
    "exclusiveMaximum4": ("maximum",),
    "exclusiveMinimum4": ("minimum",),
}


def _keyword_dependencies(kw: str, vocab: Vocabularies) -> tuple:
    if kw == "additionalItems":
        return ("items",)
    if kw in ("exclusiveMaximum", "exclusiveMinimum") \
            and vocab.contains_any((D4, D4H, D3, D3H)):
        return ("maximum",) if kw == "exclusiveMaximum" else ("minimum",)
    if kw == "if":
        return ()
    if kw in ("then", "else"):
        return ("if",)
    if kw in ("maxContains", "minContains"):
        return ("contains",)
    return ()


# ---------------------------------------------------------------------------
# Registry (alterschema.cc AlterSchemaMode::Linter order)
# ---------------------------------------------------------------------------

def build_registry() -> list[Rule]:
    return [
        DefinitionsToDefs(),
        ContentMediaTypeWithoutEncoding(),
        ContentSchemaWithoutMediaType(),
        DraftOfficialDialectWithHttps(),
        DraftOfficialDialectWithoutEmptyFragment(),
        NonApplicableTypeSpecificKeywords(),
        NonApplicableDisallowTypes(),
        DisallowNarrowsType(),
        AnyOfRemoveFalseSchemas(),
        AnyOfTrueSimplify(),
        DuplicateAllOfBranches(),
        DuplicateAnyOfBranches(),
        FlattenNestedAllOf(),
        FlattenNestedExtends(),
        FlattenNestedAnyOf(),
        UnsatisfiableInPlaceApplicatorType(),
        AllOfFalseSimplify(),
        AnyOfFalseSimplify(),
        OneOfFalseSimplify(),
        DoubleNegationElimination(),
        OneOfToAnyOfDisjointTypes(),
        UnsatisfiableDropValidation(),
        ElseWithoutIf(),
        IfWithoutThenElse(),
        IgnoredMetaschema(),
        MaxContainsWithoutContains(),
        MinContainsWithoutContains(),
        NotFalse(),
        ThenEmpty(),
        ElseEmpty(),
        ThenWithoutIf(),
        DependenciesPropertyTautology(),
        DependentRequiredTautology(),
        EqualNumericBoundsToEnum(),
        MaximumRealForInteger(),
        MinimumRealForInteger(),
        SingleTypeArray(),
        EnumWithType(),
        NonApplicableEnumValidationKeywords(),
        DuplicateEnumValues(),
        DuplicateRequiredValues(),
        ConstWithType(),
        ConstInEnum(),
        NonApplicableAdditionalItems(),
        ModernOfficialDialectWithEmptyFragment(),
        ModernOfficialDialectWithHttp(),
        ExclusiveMaximumNumberAndMaximum(),
        ExclusiveMinimumNumberAndMinimum(),
        ExclusiveBoundsFalseDrop(),
        DraftRefSiblings(),
        DynamicRefToStaticRef(),
        UnknownKeywordsPrefix(),
        UnknownLocalRef(),
        RequiredPropertiesInProperties(),
        OrphanDefinitions(),
        EqualNumericBoundsToConst(),
        ConstNotInEnum(),
        ContentSchemaDefault(),
        DependenciesDefault(),
        DependentRequiredDefault(),
        ItemsArrayDefault(),
        ItemsSchemaDefault(),
        DisallowDefault(),
        DivisibleByDefault(),
        MultipleOfDefault(),
        PatternPropertiesDefault(),
        PatternNonEcmaRegex(),
        PatternPropertiesNonEcmaRegex(),
        PropertiesDefault(),
        PropertyNamesDefault(),
        PropertyNamesTypeDefault(),
        UnevaluatedItemsDefault(),
        UnevaluatedPropertiesDefault(),
        UnsatisfiableMaxContains(),
        IncoherentMinMaxContains(),
        UnsatisfiableMinProperties(),
        EnumToConst(),
        ForbidEmptyEnum(),
        TopLevelTitle(),
        TopLevelDescription(),
        TopLevelExamples(),
        TitleDescriptionEqual(),
        TitleTrailingPeriod(),
        DescriptionTrailingPeriod(),
        TitleTrim(),
        DescriptionTrim(),
        CommentTrim(),
        ConflictingReadOnlyWriteOnly(),
        DuplicateExamples(),
        SimplePropertiesIdentifiers(),
        PortableAnchorNames(),
        InvalidExternalRef(),
        UnknownFormatPrefix(),
        ValidDefault(),
        ValidExamples(),
        UnnecessaryAllOfRefWrapperModern(),
        UnnecessaryAllOfRefWrapperDraft(),
        UnnecessaryExtendsRefWrapper(),
        UnnecessaryAllOfWrapper(),
        UnnecessaryExtendsWrapper(),
        DropAllOfEmptySchemas(),
        DropExtendsEmptySchemas(),
        EmptyObjectAsTrue(),
    ]


# ---------------------------------------------------------------------------
# Transformer engine (transformer.cc)
# ---------------------------------------------------------------------------

def _health(subschemas: int, failed: int) -> int:
    if subschemas == 0:
        return 100
    return 100 - (failed * 100 // subschemas)


EXCLUDE_KEYWORD = "x-lint-exclude"


def check_rules(schema, frame: LintFrame, rules, callback,
                exclude_keyword=EXCLUDE_KEYWORD, non_mutating_only=False,
                is_metaschema=False, resolver=None, explain=None):
    visited: set = set()
    result = True
    count = failures = 0
    for loc in frame.locations:
        if loc.kind not in ("resource", "subschema"):
            continue
        if loc.pointer in visited:
            continue
        visited.add(loc.pointer)
        count += 1
        current = get_at(schema, loc.pointer)
        vocab = frame.vocabularies(loc)
        ctx = Ctx(current, schema, vocab, frame, loc, resolver,
                  is_metaschema, explain)
        failed = False
        for rule in rules:
            if non_mutating_only and rule.mutates:
                continue
            outcome = rule.check(ctx, exclude_keyword)
            if outcome.applies:
                failed = True
                callback(loc.pointer, rule.name, rule.message, outcome,
                         rule.mutates)
        if failed:
            failures += 1
            result = False
    return result, _health(count, failures)


def check(schema, rules, callback, *, resolver=None, default_dialect="",
          default_id="", exclude_keyword=EXCLUDE_KEYWORD,
          is_metaschema=False, explain=None):
    frame = LintFrame(schema, resolver=resolver,
                      default_dialect=default_dialect or None,
                      default_id=default_id)
    return check_rules(schema, frame, rules, callback, exclude_keyword,
                       False, is_metaschema, resolver, explain)


def apply(schema_holder: list, rules, callback, *, resolver=None,
          default_dialect="", default_id="",
          exclude_keyword=EXCLUDE_KEYWORD, is_metaschema=False,
          explain=None):
    """transformer.cc apply(): fixpoint of mutating rules, then a final
    non-mutating check. ``schema_holder`` is a one-element list so the
    whole document can be replaced by a boolean."""
    processed: set = set()
    max_iterations = 10000
    iterations = 0
    while True:
        iterations += 1
        if iterations > max_iterations:
            raise SchemaAbortError("lint fixpoint did not converge")
        schema = schema_holder[0]
        if isinstance(schema, bool):
            break
        frame = LintFrame(schema, resolver=resolver,
                          default_dialect=default_dialect or None,
                          default_id=default_id)
        applied = False
        visited: set = set()
        restart = False
        for loc in frame.locations:
            if loc.kind not in ("resource", "subschema"):
                continue
            if loc.pointer in visited:
                continue
            visited.add(loc.pointer)
            current = get_at(schema, loc.pointer)
            vocab = frame.vocabularies(loc)
            for rule in rules:
                if not rule.mutates:
                    continue
                ctx = Ctx(current, schema, vocab, frame, loc, resolver,
                          is_metaschema, explain)
                outcome = rule.check(ctx, exclude_keyword)
                if not outcome.applies:
                    continue

                # snapshot potentially-broken references
                saved = []
                for ref in frame.references:
                    if ref.origin and ref.origin[-1] == "$schema":
                        continue
                    if ref.fragment is None \
                            or not ref.fragment.startswith("/"):
                        continue
                    dest = frame.traverse(ref.destination)
                    if dest is not None:
                        saved.append((ref, dest.pointer,
                                      len(dest.pointer)
                                      - len(dest.relative_pointer)))
                        continue
                    # destinations through unknown keywords are framed
                    # as plain pointers by blaze — fall back to a
                    # syntactic document lookup
                    if ref.base == frame.root_uri:
                        toks = ptr_tokens(ref.fragment)
                        if try_get_at(schema, toks) is not None:
                            saved.append((ref, toks, 0))

                try:
                    rule.transform(current, outcome)
                    replaced = None
                except _ReplaceWithBool as rb:
                    replaced = rb.value
                    if loc.pointer == ():
                        schema_holder[0] = replaced
                    else:
                        set_at(schema, loc.pointer, replaced)
                    current = replaced
                callback(loc.pointer, rule.name, rule.message, outcome,
                         True)
                applied = True

                mark = (loc.pointer, rule.name,
                        _stable_dump(current))
                if isinstance(current, bool) and not rule.reframe:
                    if mark in processed:
                        raise ProcessedTwiceError(rule.name, loc.pointer)
                    processed.add(mark)
                    restart = True
                    break

                # fix broken references
                references_fixed = False
                for ref, target_ptr, rel_off in saved:
                    if try_get_at(schema, target_ptr) is not None:
                        continue
                    effective_origin = ref.origin
                    if try_get_at(schema,
                                  ref.origin[:-1]) is None:
                        try:
                            new_origin = rule.rereference(
                                ref.destination, ref.origin,
                                ref.origin, loc.pointer)
                        except Exception:   # noqa: BLE001
                            continue
                        effective_origin = new_origin
                        if try_get_at(schema,
                                      effective_origin[:-1]) is None:
                            continue
                    new_rel = rule.rereference(
                        ref.destination, ref.origin, target_ptr,
                        loc.pointer)
                    new_fragment = new_rel
                    original = ref.original
                    base_part = original.partition("#")[0]
                    set_at(schema, effective_origin,
                           base_part + "#" + ptr_str(new_fragment))
                    references_fixed = True

                if not rule.reframe and not references_fixed:
                    new_loc = frame.traverse_pointer(loc.pointer)
                    vocab2 = frame.vocabularies(new_loc or loc)
                    ctx2 = Ctx(current, schema, vocab2, frame,
                               new_loc or loc, resolver, is_metaschema,
                               explain)
                    if rule.check(ctx2, exclude_keyword).applies:
                        raise SchemaAbortError(
                            f"Rule condition holds after application: "
                            f"{rule.name}")
                if mark in processed:
                    raise ProcessedTwiceError(rule.name, loc.pointer)
                processed.add(mark)
                if references_fixed or rule.reframe:
                    restart = True
                    break
            if restart:
                break
        if not applied:
            break
    schema = schema_holder[0]
    if isinstance(schema, bool):
        return True, 100
    frame = LintFrame(schema, resolver=resolver,
                      default_dialect=default_dialect or None,
                      default_id=default_id)
    return check_rules(schema, frame, rules, callback, exclude_keyword,
                       True, is_metaschema, resolver, explain)


def _stable_dump(v) -> str:
    import json as _json
    try:
        return _json.dumps(v, sort_keys=True)
    except (TypeError, ValueError):
        return repr(v)
