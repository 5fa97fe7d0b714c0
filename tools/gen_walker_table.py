"""Generate the keyword-walker metadata table for the lint engine.

Parses the reference's public blaze walker
(``vendor/blaze/src/foundation/known_walker.cc``) — a regular grid of
``CHECK_VOCABULARY*`` / ``RETURN*`` macro calls — into a JSON table:

    {keyword: [[vocabulary, strategy, [instance types...]], ...]}

Lookup semantics mirror ``schema_walker``: the first entry whose
vocabulary is active wins; no match -> Unknown. Instance types use the
blaze ``JSON::Type`` names lowercased (integer/real split).

Run:  python tools/gen_walker_table.py  (rewrites
jsonschema_ray/schemas/lint_walker.json)
"""
from __future__ import annotations

import json
import os
import re

SRC = "/root/reference/vendor/blaze/src/foundation/known_walker.cc"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "jsonschema_ray", "schemas", "lint_walker.json")

TYPE_RE = re.compile(r"JSON::Type::(\w+)")


def parse_types(blob: str) -> list[str]:
    return [t.lower() for t in TYPE_RE.findall(blob)]


def main() -> None:
    text = open(SRC).read()

    # handler function bodies
    handlers: dict[str, str] = {}
    for m in re.finditer(
            r"auto (handle_\w+)\(const Vocabularies &\w*\)\s*"
            r"->\s*const SchemaWalkerResult &\s*\{", text):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(text):
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        handlers[m.group(1)] = text[start:i]

    # keyword -> handler dispatch
    dispatch: dict[str, str] = {}
    for m in re.finditer(r'\{"([^"]+)",\s*(handle_\w+)\}', text):
        dispatch[m.group(1)] = m.group(2)

    def entries_of(body: str) -> list[list]:
        out: list[list] = []
        # 1) macro calls (vocab first arg, strategy after the types blob)
        pat = re.compile(
            r"CHECK_VOCABULARY(?:_WITH(?:_ORDER)?_DEPENDENCIES)?\(\s*"
            r"Known::(\w+),\s*(\{\}|sourcemeta::core::make_set\(\{[^}]*\}\)"
            r"|\{[^}]*\})\s*,\s*(\w+)", re.S)
        pat_ret = re.compile(
            r"RETURN(?:_WITH(?:_ORDER)?_DEPENDENCIES)?\(\s*"
            r"Known::(\w+),\s*(\{\}|sourcemeta::core::make_set\(\{[^}]*\}\)"
            r"|\{[^}]*\})\s*,\s*(\w+)", re.S)
        pat_res = re.compile(
            r"SchemaWalkerResult result\{\s*SchemaKeywordType::(\w+),\s*"
            r"Known::(\w+),.*?(sourcemeta::core::make_set\(\{[^}]*\}\)"
            r"|\{\})\s*\}\s*;", re.S)
        found = []
        for m in pat.finditer(body):
            found.append((m.start(), m.group(1), m.group(3),
                          parse_types(m.group(2))))
        for m in pat_ret.finditer(body):
            found.append((m.start(), m.group(1), m.group(3),
                          parse_types(m.group(2))))
        for m in pat_res.finditer(body):
            found.append((m.start(), m.group(2), m.group(1),
                          parse_types(m.group(3))))
        for _, vocab, strategy, types in sorted(found):
            entry = [vocab, strategy, types]
            if entry not in out:
                out.append(entry)
        return out

    table = {kw: entries_of(handlers[h])
             for kw, h in sorted(dispatch.items()) if h in handlers}
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
        f.write("\n")
    n = sum(len(v) for v in table.values())
    print(f"{len(table)} keywords, {n} entries -> {OUT}")


if __name__ == "__main__":
    main()
