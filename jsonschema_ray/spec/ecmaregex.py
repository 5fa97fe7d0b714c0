"""ECMA-262/PCRE2-faithful regex compilation over Python ``re``.

The reference compiles JSON Schema patterns with PCRE2 under
``PCRE2_UTF | PCRE2_UCP | PCRE2_DOTALL | PCRE2_DOLLAR_ENDONLY |
PCRE2_ALLOW_EMPTY_CLASS`` (``vendor/core/src/core/regex/regex.cc:
38-47,160-168``). Python ``re`` differs in three observable corners:

- ``.`` does not match newlines by default → compile with ``DOTALL``;
- ``$`` also matches before a trailing newline → translate bare ``$``
  to ``\\Z`` (absolute end, the DOLLAR_ENDONLY semantics);
- ``\\p{...}``/``\\P{...}`` unicode property classes and the empty
  classes ``[]`` / ``[^]`` are not supported → translate: properties
  expand to explicit codepoint-range classes built from
  ``unicodedata`` general categories (aliases follow the reference's
  permissive.h map), ``[]`` never matches, ``[^]`` matches anything.

``\\d``/``\\w``/``\\s`` are already unicode-aware in Python ``re``
(matching PCRE2_UCP). Constructs Python genuinely cannot express —
variable-length or mixed-length lookbehind alternatives — raise
:class:`UnsupportedRegexError` (a documented error, never a silent
semantic shift). Differential corpus: ``tests/test_ecmaregex.py``.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

__all__ = ["ecma_compile", "translate_ecma", "UnsupportedRegexError"]

_MAX_CP = 0x110000

#: name aliases accepted by the reference's permissive translator
#: (vendor/core/src/core/regex/permissive.h unicode_property_map) that
#: map onto general categories or the explicit sets below
_ALIASES = {
    "digit": "Nd", "Decimal_Number": "Nd",
    "space": "White_Space",
    "Letter": "L", "Uppercase_Letter": "Lu", "Lowercase_Letter": "Ll",
    "Titlecase_Letter": "Lt", "Modifier_Letter": "Lm",
    "Other_Letter": "Lo",
    "Mark": "M", "Nonspacing_Mark": "Mn", "Spacing_Mark": "Mc",
    "Enclosing_Mark": "Me",
    "Number": "N", "Letter_Number": "Nl", "Other_Number": "No",
    "Punctuation": "P", "Connector_Punctuation": "Pc",
    "Dash_Punctuation": "Pd", "Open_Punctuation": "Ps",
    "Close_Punctuation": "Pe", "Initial_Punctuation": "Pi",
    "Final_Punctuation": "Pf", "Other_Punctuation": "Po",
    "Symbol": "S", "Math_Symbol": "Sm", "Currency_Symbol": "Sc",
    "Modifier_Symbol": "Sk", "Other_Symbol": "So",
    "Separator": "Z", "Space_Separator": "Zs",
    "Line_Separator": "Zl", "Paragraph_Separator": "Zp",
    "Other": "C", "Control": "Cc", "Format": "Cf",
    "Surrogate": "Cs", "Private_Use": "Co", "Unassigned": "Cn",
}

#: Unicode White_Space property (PropList.txt) — fixed codepoint set
_WHITE_SPACE = [(0x09, 0x0D), (0x20, 0x20), (0x85, 0x85), (0xA0, 0xA0),
                (0x1680, 0x1680), (0x2000, 0x200A), (0x2028, 0x2029),
                (0x202F, 0x202F), (0x205F, 0x205F), (0x3000, 0x3000)]
_HEX_DIGIT = [(0x30, 0x39), (0x41, 0x46), (0x61, 0x66),
              (0xFF10, 0xFF19), (0xFF21, 0xFF26), (0xFF41, 0xFF46)]


class UnsupportedRegexError(ValueError):
    """The pattern is valid for the reference's PCRE2 engine but not
    expressible in Python ``re`` (e.g. mixed-length lookbehind
    alternatives). Raised instead of silently changing semantics."""

    def __init__(self, pattern: str, reason: str):
        super().__init__(
            f"pattern not supported by the Python regex engine: "
            f"{reason} in {pattern!r}")
        self.pattern = pattern
        self.reason = reason


@lru_cache(maxsize=64)
def _category_ranges(name: str) -> tuple:
    """Codepoint ranges of a unicode general category (one- or
    two-letter) or named property set, as ((lo, hi), ...)."""
    name = _ALIASES.get(name, name)
    if name == "White_Space":
        return tuple(_WHITE_SPACE)
    if name == "Hex_Digit":
        return tuple(_HEX_DIGIT)
    if name == "ASCII":
        return ((0x00, 0x7F),)
    if name == "Any":
        return ((0, _MAX_CP - 1),)
    if name == "Alphabetic":
        # derived-property approximation: Letters + Letter_Number
        base = set()
        for sub in ("L", "Nl"):
            base.update(_category_ranges(sub))
        return tuple(sorted(base))
    if not (1 <= len(name) <= 2 and name[0] in "LMNPSZC"):
        raise UnsupportedRegexError(name, "unknown unicode property")
    cat = unicodedata.category
    ranges = []
    lo = None
    prev = -2
    for cp in range(_MAX_CP):
        c = cat(chr(cp))
        hit = c == name if len(name) == 2 else c.startswith(name)
        if hit:
            if lo is None:
                lo = cp
            elif cp != prev + 1:
                ranges.append((lo, prev))
                lo = cp
            prev = cp
    if lo is not None:
        ranges.append((lo, prev))
    if not ranges:
        raise UnsupportedRegexError(name, "unknown unicode property")
    return tuple(ranges)


def _complement(ranges) -> list:
    out = []
    cur = 0
    for lo, hi in ranges:
        if lo > cur:
            out.append((cur, lo - 1))
        cur = hi + 1
    if cur < _MAX_CP:
        out.append((cur, _MAX_CP - 1))
    return out


def _cp(c: int) -> str:
    if c < 0x10000:
        return f"\\u{c:04x}"
    return f"\\U{c:08x}"


def _class_body(ranges) -> str:
    return "".join(_cp(lo) if lo == hi else f"{_cp(lo)}-{_cp(hi)}"
                   for lo, hi in ranges)


def _parse_prop(pattern: str, i: int):
    """Parse ``\\p{Name}`` / ``\\pL`` starting at the 'p'/'P'.
    Returns (name, negated, next_index)."""
    neg = pattern[i] == "P"
    i += 1
    if i < len(pattern) and pattern[i] == "{":
        j = pattern.find("}", i)
        if j < 0:
            raise re.error("missing }, unterminated \\p", pattern, i)
        name = pattern[i + 1: j]
        if name.startswith("^"):        # \p{^L} == \P{L}
            neg = not neg
            name = name[1:]
        return name, neg, j + 1
    if i < len(pattern):
        return pattern[i], neg, i + 1
    raise re.error("truncated \\p escape", pattern, i)


_FLAG_GROUP = re.compile(r"\(\?([a-zA-Z]*)(?:-([a-zA-Z]+))?([):])")


def translate_ecma(pattern: str) -> str:
    """Rewrite an ECMA/PCRE2 pattern into Python ``re`` syntax with
    identical semantics under DOLLAR_ENDONLY + property classes.

    Inline multiline flags: PCRE2_MULTILINE overrides DOLLAR_ENDONLY
    (pcre2api: DOLLAR_ENDONLY "is ignored if PCRE2_MULTILINE is set"),
    so a bare ``$`` in multiline scope must stay ``$`` (line-end
    semantics), not become ``\\Z``. We track multiline scope through
    ``(?m)`` / ``(?m:...)`` / ``(?-m:...)`` groups. A global ``(?m)``
    mid-pattern (valid in PCRE2, rejected by Python ≥3.11) raises
    :class:`UnsupportedRegexError` rather than silently shifting
    semantics."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    ml_stack = [False]          # multiline flag per open-group scope
    while i < n:
        c = pattern[i]
        if not in_class and c == "(":
            m = _FLAG_GROUP.match(pattern, i)
            if m:
                pos, neg, term = m.group(1), m.group(2) or "", m.group(3)
                scope_ml = ml_stack[-1]
                if "m" in pos:
                    scope_ml = True
                elif "m" in neg:
                    scope_ml = False
                if term == ":":
                    ml_stack.append(scope_ml)
                elif scope_ml != ml_stack[-1]:
                    # global inline flag change: PCRE2 applies it to the
                    # rest of the enclosing group; Python only accepts it
                    # at position 0 of the whole pattern.
                    if i == 0:
                        ml_stack[-1] = scope_ml
                    else:
                        raise UnsupportedRegexError(
                            pattern, "mid-pattern global (?m) flag")
                out.append(m.group(0))
                i = m.end()
                continue
            ml_stack.append(ml_stack[-1])
            out.append(c)
            i += 1
            continue
        if not in_class and c == ")":
            if len(ml_stack) > 1:
                ml_stack.pop()
            out.append(c)
            i += 1
            continue
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in "pP":
                name, neg, j = _parse_prop(pattern, i + 1)
                ranges = _category_ranges(name)
                if in_class:
                    if neg:
                        ranges = _complement(ranges)
                    out.append(_class_body(ranges))
                else:
                    out.append(("[^" if neg else "[")
                               + _class_body(ranges) + "]")
                i = j
                continue
            out.append(pattern[i: i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            if pattern.startswith("[^]", i):
                out.append(r"[\s\S]")           # PCRE2_ALLOW_EMPTY_CLASS
                i += 3
                continue
            if pattern.startswith("[]", i):
                out.append(r"(?:(?!\s)\s)")     # matches nothing, quantifiable
                i += 2
                continue
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == "$":
            # PCRE2_DOLLAR_ENDONLY — unless multiline is active here,
            # which overrides it (see docstring).
            out.append("$" if ml_stack[-1] else r"\Z")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


@lru_cache(maxsize=4096)
def ecma_compile(pattern: str, flags: int = 0):
    """Compile a JSON Schema pattern with the reference's semantics.

    Raises ``re.error`` for patterns the reference would also reject
    (genuinely invalid), :class:`UnsupportedRegexError` for valid-but-
    inexpressible constructs (mixed-length lookbehind alternatives)."""
    translated = translate_ecma(pattern)
    try:
        return re.compile(translated, flags | re.DOTALL)
    except re.error as exc:
        if "look-behind requires fixed-width pattern" in str(exc):
            raise UnsupportedRegexError(
                pattern, "variable-width lookbehind") from exc
        raise
