"""Canonical JSON Schema DOCUMENT formatting — keyword reordering.

Mirrors the reference's ``fmt`` verb for schema files: schema objects
get their members reordered by a fixed keyword ranking (core keywords
first, then metadata, references, type-generic, numeric, string, array,
object keywords, reusable utilities last; unknown keywords after
everything, alphabetically; ``x-`` prefixed keywords ranked as
metadata). Rank table and tie-break copied semantically from
``/root/reference/vendor/blaze/src/format/format.cc:14-136``.

Only SCHEMA objects are reordered: maps whose keys are user data
(``properties``, ``patternProperties``, ``dependentSchemas``,
``$defs``/``definitions`` — the keys are property names / schema names)
keep their key order, while their VALUES are formatted as schemas.
"""

from __future__ import annotations

_RANK: dict[str, int] = {
    # core keywords first
    "$schema": 0, "$id": 1, "id": 2, "$vocabulary": 3, "$anchor": 4,
    "$dynamicAnchor": 5, "$recursiveAnchor": 6,
    # schema metadata
    "title": 7, "description": 8, "$comment": 10, "examples": 11,
    "deprecated": 12, "readOnly": 13, "writeOnly": 14, "default": 15,
    "x-": 16,  # placeholder rank for x- prefixed unknown keywords
    # references
    "$ref": 17, "$dynamicRef": 18, "$recursiveRef": 19,
    # any type
    "type": 20, "disallow": 21, "extends": 22, "const": 23, "enum": 24,
    "optional": 25, "requires": 26, "allOf": 27, "anyOf": 28,
    "oneOf": 29, "not": 30, "if": 31, "then": 32, "else": 33,
    # numbers
    "exclusiveMaximum": 34, "maximum": 35, "maximumCanEqual": 36,
    "exclusiveMinimum": 37, "minimum": 38, "minimumCanEqual": 39,
    "multipleOf": 40, "divisibleBy": 41, "maxDecimal": 42,
    # strings
    "pattern": 43, "format": 44, "maxLength": 45, "minLength": 46,
    "contentEncoding": 47, "contentMediaType": 48, "contentSchema": 49,
    # arrays
    "maxItems": 50, "minItems": 51, "uniqueItems": 52, "maxContains": 53,
    "minContains": 54, "contains": 55, "prefixItems": 56, "items": 57,
    "additionalItems": 58, "unevaluatedItems": 59,
    # objects
    "required": 60, "maxProperties": 61, "minProperties": 62,
    "propertyNames": 63, "properties": 64, "patternProperties": 65,
    "additionalProperties": 66, "unevaluatedProperties": 67,
    "dependentRequired": 68, "dependencies": 69, "dependentSchemas": 70,
    # reusable utilities last
    "$defs": 71, "definitions": 72,
}

_DEFAULT = 1 << 62


def _rank(keyword: str) -> int:
    if keyword.startswith("x-"):
        return _RANK["x-"]
    return _RANK.get(keyword, _DEFAULT)


def _key(keyword: str) -> tuple[int, str]:
    return (_rank(keyword), keyword)


def format_schema(schema, ver: int | None = None):
    """Return the schema with every SUBSCHEMA POSITION's members
    reordered by the canonical keyword ranking (pure, no mutation).

    Recursion is dialect-aware, mirroring the reference's frame-based
    reorder (``vendor/blaze/src/format/format.cc:140-169``: only
    frame-identified subschema locations are reordered) — e.g. a
    draft-7 document's ``$defs`` values or any unknown keyword's
    contents keep their user ordering, and a test document (no known
    applicators at the root) gets a root-only reorder."""
    if isinstance(schema, bool) or not isinstance(schema, dict):
        return schema
    from jsonschema_ray.spec.jschema import _SUBSCHEMA_KW, _dialect_ver

    if ver is None or isinstance(schema.get("$schema"), str):
        ver = _dialect_ver(schema)
    out = {}
    for k in sorted(schema, key=_key):
        v = schema[k]
        spec = _SUBSCHEMA_KW.get(k)
        if not spec or not (spec[1] <= ver <= spec[2]):
            out[k] = v
            continue
        shape = spec[0]
        if shape == "items":
            shape = "list" if isinstance(v, list) and ver < 2020 \
                else "schema"
        if shape == "schema":
            out[k] = format_schema(v, ver)
        elif shape == "list" and isinstance(v, list):
            out[k] = [format_schema(x, ver) for x in v]
        elif shape == "map" and isinstance(v, dict):
            out[k] = {name: format_schema(sub, ver)
                      for name, sub in v.items()}
        else:
            out[k] = v
    return out


def looks_like_test_document(doc) -> bool:
    """Reference test-file detection (``src/utils.h:105-110``): an
    object without ``$schema`` with a string ``target`` and an array
    ``tests`` is a schema TEST document (formatted root-only under the
    2020-12 walker, no dialect requirement)."""
    return (isinstance(doc, dict) and "$schema" not in doc
            and isinstance(doc.get("target"), str)
            and isinstance(doc.get("tests"), list))


_LINE_WIDTH = 80


def prettify_json(doc, indent_by: int = 2) -> str:
    """The reference's JSON prettifier, byte-exact
    (``vendor/core/src/core/json/stringify.h:446-545``): objects always
    multiline; arrays inline as ``[ a, b ]`` when every element is a
    scalar AND the one-line form fits the 80-column budget (current
    indentation + the ``"key": `` prefix length counted in)."""
    import json

    def scalar(v) -> str:
        if isinstance(v, int) and not isinstance(v, bool) \
            and not (-2**63 <= v < 2**63):
            # out-of-int64 integers are Decimals in the reference,
            # printed in full-digit scientific form
            # (to_scientific_string: 9.223372036854776000e+18)
            d = str(abs(v))
            sign = "-" if v < 0 else ""
            mant = d[0] + "." + d[1:] if len(d) > 1 else d[0] + ".0"
            return f"{sign}{mant}e+{len(d) - 1}"
        if isinstance(v, float) and not isinstance(v, bool):
            # reference real rendering (stringify.h:74-107): signed
            # zero, integral reals as fixed + ".0", others shortest
            # round-trip with NO exponent zero padding (1e-5, not 1e-05)
            if v == 0.0:
                return "-0.0" if str(v)[0] == "-" else "0.0"
            if v.is_integer():
                if not (-2**63 <= v < 2**63):
                    # out-of-int64 integral reals print like Decimals:
                    # full-width scientific, fraction padded to the
                    # exponent's digit count (pass_bigint.sh round-trip)
                    r = repr(v)
                    mant, _, exp = r.partition("e")
                    e = int(exp or 0)
                    whole, _, fracpart = mant.partition(".")
                    fracpart = (fracpart or "").ljust(e, "0")
                    sign = "-" if whole.startswith("-") else ""
                    return (f"{sign}{whole.lstrip('-')}.{fracpart}"
                            f"e+{e}")
                return f"{int(v)}.0"
            out = repr(v)
            if "e" in out:
                mant, _, exp = out.partition("e")
                sign = exp[0] if exp[0] in "+-" else ""
                out = mant + "e" + sign + exp.lstrip("+-").lstrip("0")
            return out
        return json.dumps(v, ensure_ascii=False)

    def pretty(v, indentation: int, property_size: int = 0) -> str:
        if isinstance(v, dict):
            if not v:
                return "{}"
            parts = ["{"]
            items = list(v.items())
            pad = " " * ((indentation + 1) * indent_by)
            for i, (k, val) in enumerate(items):
                keyenc = json.dumps(k, ensure_ascii=False) + ": "
                rendered = pretty(val, indentation + 1, len(keyenc))
                tail = "," if i < len(items) - 1 else (
                    "\n" + " " * (indentation * indent_by))
                parts.append("\n" + pad + keyenc + rendered + tail)
            parts.append("}")
            return "".join(parts)
        if isinstance(v, list):
            effective = indentation * indent_by + property_size
            if effective < _LINE_WIDTH:
                inplace = "["
                fits = True
                for i, el in enumerate(v):
                    if isinstance(el, (dict, list)):
                        fits = False
                        break
                    inplace += " " + scalar(el)
                    inplace += " " if i == len(v) - 1 else ","
                    if len(inplace) + effective >= _LINE_WIDTH:
                        fits = False
                        break
                if fits:
                    return inplace + "]"
            if not v:
                return "[]"
            pad = " " * ((indentation + 1) * indent_by)
            parts = ["["]
            for i, el in enumerate(v):
                rendered = pretty(el, indentation + 1)
                tail = "," if i < len(v) - 1 else (
                    "\n" + " " * (indentation * indent_by))
                parts.append("\n" + pad + rendered + tail)
            parts.append("]")
            return "".join(parts)
        return scalar(v)

    return pretty(doc, 0)


def prettify_schema(schema, indent: int = 2,
                    default_dialect: str | None = None) -> str:
    """Canonical text form: ranked keyword order + reference prettify
    + trailing newline (the reference's fmt/bundle output)."""
    ver = None
    if default_dialect and isinstance(schema, dict) \
            and "$schema" not in schema:
        from jsonschema_ray.spec.jschema import _dialect_ver

        ver = _dialect_ver({"$schema": default_dialect})
    return prettify_json(format_schema(schema, ver), indent) + "\n"
