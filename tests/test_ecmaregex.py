"""Regex fidelity corners: the ECMA/PCRE2-faithful compile layer.

The reference's pattern engine is PCRE2 under UTF|UCP|DOTALL|
DOLLAR_ENDONLY|ALLOW_EMPTY_CLASS (vendor/core/src/core/regex/
regex.cc); Python ``re`` diverges on dot-newline, trailing-newline
``$``, ``\\p`` property classes and empty classes. This suite pins
the translation layer two ways:

1. a hand-derived expectation table for each divergence corner;
2. a node-executed ECMA differential — the same (pattern, input)
   corpus evaluated by JavaScript ``RegExp`` (flags ``s`` [+``u`` for
   property escapes], which matches the reference's DOTALL +
   end-anchored ``$`` semantics) must agree with ``ecma_compile``.
"""

from __future__ import annotations

import json
import re
import shutil
import subprocess

import pytest

from jsonschema_ray.spec.ecmaregex import (UnsupportedRegexError,
                                           ecma_compile, translate_ecma)

# (pattern, input, expected-search-match under the reference's opts)
CORPUS = [
    # DOTALL: `.` matches newlines (regex.cc comment: popular adoption)
    ("^a.b$", "a\nb", True),
    ("a.c", "a\nc", True),
    ("^.+$", "line1\nline2", True),
    # DOLLAR_ENDONLY: `$` is absolute end — no trailing-newline match
    ("^abc$", "abc\n", False),
    ("^abc$", "abc", True),
    ("c$", "abc\n", False),
    ("c$", "abc", True),
    ("a$|b$", "cb\n", False),
    ("a$|b$", "cb", True),
    # `$` inside a character class is literal
    ("[$]", "a$b", True),
    ("[$]", "ab", False),
    # UCP: \d and \w are unicode-aware
    (r"^\d$", "٣", True),            # ARABIC-INDIC DIGIT THREE
    (r"^\w$", "é", True),
    # unicode property classes (permissive.h translation)
    (r"^\p{L}+$", "Grüße", True),
    (r"^\p{L}+$", "Gr33t", False),
    (r"^\p{Lu}$", "A", True),
    (r"^\p{Lu}$", "a", False),
    (r"^\P{N}$", "x", True),
    (r"^\P{N}$", "7", False),
    (r"^\p{digit}$", "4", True),     # alias → Nd
    (r"^[\p{L}0-9]+$", "ab12", True),
    (r"^[\p{L}0-9]+$", "ab 12", False),
    (r"^[^\p{L}]$", "7", True),
    (r"^[^\p{L}]$", "x", False),
    # empty classes (PCRE2_ALLOW_EMPTY_CLASS)
    ("^a[]b$", "ab", False),         # [] matches nothing at all
    ("^a[]*b$", "ab", True),         # ...but quantified-zero is fine
    ("^a[^]b$", "a\nb", True),       # [^] matches anything
    # numbered backreference, lookahead, fixed lookbehind
    (r"^(ab)\1$", "abab", True),
    (r"^(ab)\1$", "abc", False),
    (r"^(?=a)a$", "a", True),
    (r"(?<=fo)o", "foo", True),
    (r"(?<=fo)o", "fxo", False),
    # anchors: ^ is start-of-input only (no multiline)
    ("^b", "a\nb", False),
]


@pytest.mark.parametrize("pattern,text,want", CORPUS)
def test_reference_semantics_table(pattern, text, want):
    got = ecma_compile(pattern).search(text) is not None
    assert got is want, (pattern, text, translate_ecma(pattern))


def test_unsupported_constructs_are_documented_errors():
    # PCRE2 accepts alternation of different FIXED lookbehind lengths;
    # Python cannot — must raise the documented error, never silently
    # change semantics
    with pytest.raises(UnsupportedRegexError):
        ecma_compile(r"(?<=a|bc)x")
    # genuinely invalid everywhere (PCRE2 also rejects unbounded
    # lookbehind) — Unsupported (a ValueError) or re.error acceptable,
    # but never a silent pass
    with pytest.raises(ValueError):
        ecma_compile(r"(?<=a*)b")
    with pytest.raises(re.error):
        ecma_compile("a[")
    with pytest.raises(re.error):
        ecma_compile("*a")


def test_dollar_translation_details():
    assert translate_ecma("a$") == r"a\Z"
    assert translate_ecma(r"a\$") == r"a\$"          # escaped stays
    assert translate_ecma("[$]") == "[$]"            # class stays
    assert translate_ecma("a$|b$") == r"a\Z|b\Z"


@pytest.mark.skipif(shutil.which("node") is None, reason="node absent")
def test_node_ecma_differential():
    """Every corpus row double-checked against JavaScript RegExp with
    the flags that mirror the reference's PCRE2 options ('s' for
    DOTALL; '+u' for property escapes). JS `$` without 'm' is already
    end-of-input-only, matching DOLLAR_ENDONLY."""
    rows = []
    for pattern, text, want in CORPUS:
        if "[]" in pattern or "[^]" in pattern:
            # JS-with-u rejects unescaped lone brackets differently;
            # the empty-class rows are PCRE2-specific — skip in JS
            continue
        if r"\d" in pattern or r"\w" in pattern:
            # PCRE2_UCP makes \d/\w unicode; strict ECMA keeps them
            # ASCII — these rows pin the REFERENCE's (UCP) behavior,
            # which JS cannot oracle
            continue
        flags = "s" + ("u" if r"\p" in pattern or r"\P" in pattern
                       else "")
        rows.append({"p": pattern, "s": text, "f": flags, "want": want})
    js = r"""
const lines = require('fs').readFileSync(0, 'utf8').trim().split('\n');
for (const line of lines) {
  const {p, s, f} = JSON.parse(line);
  let got;
  try { got = new RegExp(p, f).test(s); } catch (e) { got = 'ERR:' + e.message; }
  console.log(JSON.stringify(got));
}
"""
    inp = "\n".join(json.dumps(r) for r in rows)
    out = subprocess.run(["node", "-e", js], input=inp, text=True,
                         capture_output=True, timeout=60)
    assert out.returncode == 0, out.stderr
    results = [json.loads(x) for x in out.stdout.strip().split("\n")]
    for row, js_got in zip(rows, results):
        assert js_got == row["want"], ("JS disagrees with table",
                                       row, js_got)
        py_got = ecma_compile(row["p"]).search(row["s"]) is not None
        assert py_got == js_got, ("python disagrees with ECMA", row)


def test_evaluator_uses_reference_regex_semantics(ray_session):
    """End-to-end: the JSON Schema evaluator applies DOLLAR_ENDONLY +
    DOTALL + property classes for `pattern` and `patternProperties`."""
    from jsonschema_ray.spec.jschema import compile_schema

    sch = compile_schema({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {
            "name": {"type": "string", "pattern": "^\\p{L}+$"},
            "line": {"type": "string", "pattern": "^a.b$"},
            "tag": {"type": "string", "pattern": "^x$"},
        },
    })
    assert sch.is_valid({"name": "Grüße"})
    assert not sch.is_valid({"name": "a1"})
    assert sch.is_valid({"line": "a\nb"})        # DOTALL
    assert not sch.is_valid({"tag": "x\n"})      # DOLLAR_ENDONLY
    assert sch.is_valid({"tag": "x"})
