"""Compact binary JSON codec — the single-document ``encode`` path.

The reference's ``encode``/``decode`` verbs serialize one JSON document
to JSON BinPack (``src/command_encode.cc``). At dataset scale this
engine's analog is columnar parquet (CLI ``encode`` on JSONL inputs);
for SINGLE documents this module supplies the binary codec itself: a
deterministic, self-describing tag+varint format with the same
round-trip guarantee (decode(encode(x)) == x, key order preserved).

Format: 1 tag byte, then varint lengths/sizes as needed.
  0 null · 1 true · 2 false · 3 int (zigzag varint) · 4 float
  (8-byte big-endian IEEE 754) · 5 string (varint byte-length + UTF-8)
  · 6 array (varint count + items) · 7 object (varint count +
  (string, value) pairs)
"""

from __future__ import annotations

import struct
from typing import Any

MAGIC = b"JBJ1"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, out = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if -(1 << 63) <= n < (1 << 63) \
        else (n << 1) ^ (n >> (n.bit_length() + 1))


def encode_value(v: Any, out: bytearray) -> None:
    if v is None:
        out.append(0)
    elif v is True:
        out.append(1)
    elif v is False:
        out.append(2)
    elif isinstance(v, int):
        out.append(3)
        # zigzag so small negatives stay small (arbitrary precision)
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        out.extend(_varint(z))
    elif isinstance(v, float):
        out.append(4)
        out.extend(struct.pack(">d", v))
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        out.append(5)
        out.extend(_varint(len(raw)))
        out.extend(raw)
    elif isinstance(v, list):
        out.append(6)
        out.extend(_varint(len(v)))
        for item in v:
            encode_value(item, out)
    elif isinstance(v, dict):
        out.append(7)
        out.extend(_varint(len(v)))
        for k, item in v.items():
            raw = str(k).encode("utf-8")
            out.extend(_varint(len(raw)))
            out.extend(raw)
            encode_value(item, out)
    else:
        raise ValueError(f"not a JSON value: {type(v).__name__}")


def decode_value(buf: bytes, pos: int = 0) -> tuple[Any, int]:
    tag = buf[pos]
    pos += 1
    if tag == 0:
        return None, pos
    if tag == 1:
        return True, pos
    if tag == 2:
        return False, pos
    if tag == 3:
        z, pos = _read_varint(buf, pos)
        return (z >> 1) ^ -(z & 1), pos
    if tag == 4:
        return struct.unpack(">d", buf[pos:pos + 8])[0], pos + 8
    if tag == 5:
        n, pos = _read_varint(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if tag == 6:
        n, pos = _read_varint(buf, pos)
        out = []
        for _ in range(n):
            item, pos = decode_value(buf, pos)
            out.append(item)
        return out, pos
    if tag == 7:
        n, pos = _read_varint(buf, pos)
        obj = {}
        for _ in range(n):
            klen, pos = _read_varint(buf, pos)
            k = buf[pos:pos + klen].decode("utf-8")
            pos += klen
            obj[k], pos = decode_value(buf, pos)
        return obj, pos
    raise ValueError(f"corrupt binary JSON (tag {tag})")


def encode_document(doc: Any) -> bytes:
    out = bytearray(MAGIC)
    encode_value(doc, out)
    return bytes(out)


def decode_document(data: bytes) -> Any:
    if data[:4] != MAGIC:
        raise ValueError("not a binary JSON document (bad magic)")
    value, pos = decode_value(data, 4)
    if pos != len(data):
        raise ValueError("trailing bytes after binary JSON document")
    return value
