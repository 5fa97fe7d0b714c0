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

# keywords whose value is a single subschema
_SUBSCHEMA = {"items", "additionalItems", "unevaluatedItems", "contains",
              "not", "if", "then", "else", "propertyNames",
              "additionalProperties", "unevaluatedProperties",
              "contentSchema"}
# keywords whose value is a list of subschemas
_SUBSCHEMA_LIST = {"allOf", "anyOf", "oneOf", "prefixItems"}
# keywords whose value is a map of name -> subschema (keys are data)
_SUBSCHEMA_MAP = {"properties", "patternProperties", "dependentSchemas",
                  "$defs", "definitions"}


def _rank(keyword: str) -> int:
    if keyword.startswith("x-"):
        return _RANK["x-"]
    return _RANK.get(keyword, _DEFAULT)


def _key(keyword: str) -> tuple[int, str]:
    return (_rank(keyword), keyword)


def format_schema(schema):
    """Return the schema with every schema object's members reordered
    by the canonical keyword ranking (recursively; pure, no mutation)."""
    if isinstance(schema, bool) or not isinstance(schema, dict):
        return schema
    out = {}
    for k in sorted(schema, key=_key):
        v = schema[k]
        if k in _SUBSCHEMA:
            out[k] = format_schema(v)
        elif k in _SUBSCHEMA_LIST and isinstance(v, list):
            out[k] = [format_schema(x) for x in v]
        elif k in _SUBSCHEMA_MAP and isinstance(v, dict):
            out[k] = {name: format_schema(sub) for name, sub in v.items()}
        elif k == "dependencies" and isinstance(v, dict):
            # schema-or-stringlist per member (draft-07 and earlier)
            out[k] = {name: format_schema(sub) if isinstance(sub, (dict, bool))
                      else sub for name, sub in v.items()}
        else:
            out[k] = v
    return out


def prettify_schema(schema, indent: int = 2) -> str:
    """Canonical text form: ranked keyword order + ``indent``-space
    indentation + trailing newline (the reference's prettify output)."""
    import json

    return json.dumps(format_schema(schema), indent=indent,
                      ensure_ascii=False) + "\n"
