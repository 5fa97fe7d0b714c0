"""JSON Pointer → (line, column) position tracking over raw JSON text.

The reference's ``PointerPositionTracker`` (``src/input.h:146-160``)
records where every schema location starts so errors print ``at line L
/ at column C``; an object member's position is its KEY token, an array
element's its first value token, both 1-based. This is a tiny
recursive-descent scanner — schema documents are KB-scale, so clarity
beats speed here (bulk data never flows through this module).
"""

from __future__ import annotations

import re

_WS = " \t\n\r"
_STR = re.compile(r'"(?:[^"\\]|\\.)*"')
_LIT = re.compile(r"[^\s,\]\}]+")


class _Scanner:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.positions: dict[str, tuple[int, int]] = {}

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

    def scan_value(self, pointer: str) -> None:
        self.skip_ws()
        self.positions.setdefault(pointer, self.lc(self.pos))
        c = self.text[self.pos]
        if c == "{":
            self.pos += 1
            self.skip_ws()
            if self.text[self.pos] == "}":
                self.pos += 1
                return
            while True:
                self.skip_ws()
                key_at = self.lc(self.pos)
                key = self.scan_string()
                child = pointer + "/" + (
                    key.replace("~", "~0").replace("/", "~1"))
                self.positions[child] = key_at
                self.skip_ws()
                self.pos += 1          # ':'
                self.scan_value(child)
                # a member VALUE's own start overrides nothing: the
                # member position stays the key token
                self.positions[child] = key_at
                self.skip_ws()
                if self.text[self.pos] == ",":
                    self.pos += 1
                    continue
                self.pos += 1          # '}'
                return
        elif c == "[":
            self.pos += 1
            self.skip_ws()
            if self.text[self.pos] == "]":
                self.pos += 1
                return
            idx = 0
            while True:
                self.scan_value(f"{pointer}/{idx}")
                idx += 1
                self.skip_ws()
                if self.text[self.pos] == ",":
                    self.pos += 1
                    continue
                self.pos += 1          # ']'
                return
        elif c == '"':
            self.scan_string()
        else:
            m = _LIT.match(self.text, self.pos)
            self.pos = m.end()


def pointer_positions(text: str) -> dict[str, tuple[int, int]]:
    """Map every JSON Pointer in ``text`` to the 1-based (line, column)
    of its key token (object members) or first value token."""
    s = _Scanner(text)
    s.scan_value("")
    return s.positions
