"""JSON Pointer → source-span position tracking over raw JSON text.

The reference's ``PointerPositionTracker`` (``src/input.h:146-160``)
records where every schema location starts AND ends, powering error
positions (``at line L / at column C``) and the ``inspect`` dump's
``File Position`` / ``position: [sl, sc, el, ec]`` fields. An object
member's span starts at its KEY token and ends at the last character of
its value; an array element's at its first value token; all 1-based.
This is a tiny recursive-descent scanner — schema documents are
KB-scale, so clarity beats speed here (bulk data never flows through
this module).
"""

from __future__ import annotations

import re

_WS = " \t\n\r"
_STR = re.compile(r'"(?:[^"\\]|\\.)*"')
_LIT = re.compile(r"[^\s,\]\}]+")

Span = tuple[int, int, int, int]


class _Scanner:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.positions: dict[str, Span] = {}

    def lc(self, idx: int) -> tuple[int, int]:
        line = self.text.count("\n", 0, idx) + 1
        col = idx - (self.text.rfind("\n", 0, idx) + 1) + 1
        return line, col

    def skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos] in _WS:
            self.pos += 1

    def scan_string(self) -> str:
        m = _STR.match(self.text, self.pos)
        if not m:
            raise ValueError(f"bad string at offset {self.pos}")
        self.pos = m.end()
        import json

        return json.loads(m.group(0))

    def scan_value(self, pointer: str,
                   start_at: tuple[int, int] | None = None) -> None:
        self.skip_ws()
        start = start_at or self.lc(self.pos)
        c = self.text[self.pos]
        if c == "{":
            self.pos += 1
            self.skip_ws()
            if self.text[self.pos] == "}":
                self.pos += 1
            else:
                while True:
                    self.skip_ws()
                    key_at = self.lc(self.pos)
                    key = self.scan_string()
                    child = pointer + "/" + (
                        key.replace("~", "~0").replace("/", "~1"))
                    self.skip_ws()
                    self.pos += 1          # ':'
                    self.scan_value(child, start_at=key_at)
                    self.skip_ws()
                    if self.text[self.pos] == ",":
                        self.pos += 1
                        continue
                    self.pos += 1          # '}'
                    break
        elif c == "[":
            self.pos += 1
            self.skip_ws()
            if self.text[self.pos] == "]":
                self.pos += 1
            else:
                idx = 0
                while True:
                    self.scan_value(f"{pointer}/{idx}")
                    idx += 1
                    self.skip_ws()
                    if self.text[self.pos] == ",":
                        self.pos += 1
                        continue
                    self.pos += 1          # ']'
                    break
        elif c == '"':
            self.scan_string()
        else:
            m = _LIT.match(self.text, self.pos)
            self.pos = m.end()
        end = self.lc(self.pos - 1)
        self.positions[pointer] = (*start, *end)


def pointer_positions(text: str) -> dict[str, Span]:
    """Map every JSON Pointer in ``text`` to its 1-based
    (start_line, start_col, end_line, end_col) span: key token start →
    value last character."""
    s = _Scanner(text)
    s.scan_value("")
    return s.positions


def yaml_pointer_positions(text: str) -> dict[str, Span]:
    """The same span map for a YAML document, via the composer's node
    marks (PyYAML start_mark/end_mark; end_mark is exclusive)."""
    import yaml

    node = yaml.compose(text)
    out: dict[str, Span] = {}
    if node is None:
        return out

    def mark_lc(mark, *, end: bool = False):
        if end:
            # the reference's yaml tracker reports the raw end mark
            # (line+1, column) — validate fail_stdin_yaml_input.sh
            return mark.line + 1, mark.column
        return mark.line + 1, mark.column + 1

    def walk(n, pointer: str, start=None) -> None:
        s = start or mark_lc(n.start_mark)
        e = mark_lc(n.end_mark, end=True)
        out[pointer] = (*s, *e)
        import yaml as _y

        if isinstance(n, _y.MappingNode):
            for k, v in n.value:
                key = str(k.value)
                child = pointer + "/" + (
                    key.replace("~", "~0").replace("/", "~1"))
                walk(v, child, start=mark_lc(k.start_mark))
        elif isinstance(n, _y.SequenceNode):
            for i, v in enumerate(n.value):
                walk(v, f"{pointer}/{i}")

    walk(node, "")
    return out


def yaml_node_positions(node) -> dict[str, Span]:
    """Span map for one already-composed YAML node (multi-document
    instances: marks are file-relative)."""
    import yaml as _y

    out: dict[str, Span] = {}
    if node is None:
        return out

    def mark_lc(mark, *, end: bool = False):
        if end:
            return mark.line + 1, mark.column
        return mark.line + 1, mark.column + 1

    def walk(n, pointer: str, start=None) -> None:
        s = start or mark_lc(n.start_mark)
        e = mark_lc(n.end_mark, end=True)
        out[pointer] = (*s, *e)
        if isinstance(n, _y.MappingNode):
            for k, v in n.value:
                key = str(k.value)
                child = pointer + "/" + (
                    key.replace("~", "~0").replace("/", "~1"))
                walk(v, child, start=mark_lc(k.start_mark))
        elif isinstance(n, _y.SequenceNode):
            for i, v in enumerate(n.value):
                walk(v, f"{pointer}/{i}")

    walk(node, "")
    return out
