"""JSON BinPack v1 schema-less codec (``ANY_PACKED_TYPE_TAG_BYTE_PREFIX``).

Byte-exact with the reference's ``encode``/``decode`` verbs
(``/root/reference/src/command_encode.cc`` /
``command_decode.cc`` → ``vendor/jsonbinpack/src/runtime/``:
``encoder_any.cc``, ``decoder_any.cc``, ``encoder_string.cc``,
``cache.cc``, tag constants in ``runtime_encoding.h:406-437``). The
wire format is the published JSON BinPack specification; this module
is an independent Python implementation of it.

Layout recap — every value starts with one tag byte, low 3 bits the
TYPE, high 5 bits a subtype/immediate:

=====================  ===========================================
TYPE_SHARED_STRING 0   back-reference to an earlier string
TYPE_STRING        1   UTF-8 string, immediate length+1 (< 31 B)
TYPE_LONG_STRING   2   UTF-8 string, immediate length-31 (31–61 B)
TYPE_OBJECT        3   immediate size+1, else varint(size-31)
TYPE_ARRAY         4   immediate size+1, else varint(size-31)
TYPE_POS_INT_BYTE  5   0..255; < 31 inline as subtype+1
TYPE_NEG_INT_BYTE  6   -1..-256; |v|-1 < 31 inline
TYPE_OTHER         7   subtype: null/bool/bignum/real/huge string
=====================  ===========================================

Object keys use ``PREFIX_VARINT_LENGTH_STRING_SHARED``
(varint(len+1)+bytes, or 0x00 + varint back-offset). Strings ≥ 3
bytes are recorded in a bounded dedup cache so repeats encode as
relative offsets — repeated JSONL keys cost 3 bytes a line.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

_TYPE_SIZE = 3
T_SHARED_STR, T_STRING, T_LONG_STRING, T_OBJECT = 0, 1, 2, 3
T_ARRAY, T_POS_BYTE, T_NEG_BYTE, T_OTHER = 4, 5, 6, 7
S_FALSE, S_TRUE, S_NULL, S_POS_INT, S_NEG_INT, S_NUMBER, S_REAL_BYTE = \
    0, 1, 2, 3, 4, 5, 6
# huge-string subtypes: length floor 2^e, e in 7..10
_EXP_LO, _EXP_HI = 7, 10
_U5 = 31                      # uint_max<5>
_MIN_CACHED = 3               # cache.cc MINIMUM_STRING_LENGTH
_MAX_CACHE_BYTES = 20971520   # cache.cc MAXIMUM_BYTE_SIZE
_STANDALONE, _PREFIX = 0, 1   # Cache::Type


class _Cache:
    """Offset cache for shared strings (cache.cc): insert-or-bump,
    oldest-offset eviction under a global byte budget."""

    def __init__(self) -> None:
        self.data: dict[tuple[str, int], int] = {}
        self.byte_size = 0

    def record(self, value: str, offset: int, kind: int) -> None:
        n = len(value.encode("utf-8"))
        if n < _MIN_CACHED or n >= _MAX_CACHE_BYTES:
            return
        while self.data and self.byte_size + n >= _MAX_CACHE_BYTES:
            oldest = min(self.data, key=self.data.__getitem__)
            self.byte_size -= len(oldest[0].encode("utf-8"))
            del self.data[oldest]
        key = (value, kind)
        prev = self.data.get(key)
        if prev is None:
            self.data[key] = offset
            self.byte_size += n
        elif offset > prev:           # bump for locality
            self.data[key] = offset

    def find(self, value: str, kind: int) -> int | None:
        return self.data.get((value, kind))


def _correct_ieee754(value: float) -> float:
    """Snap values within 1e-9 of an integer (numeric_util.h:320)."""
    base = math.floor(value)
    if (base + 1) - value <= 1e-9:
        return float(base + 1)
    if value - base <= 1e-9:
        return float(base)
    return value


def _real_digits(value: float) -> tuple[int, int]:
    """(integral digits, decimal point shifts) per numeric_util.h:339."""
    shifts = 0
    frac, integral = math.modf(value)
    while frac != 0.0:
        value *= 10
        shifts += 1
        frac, integral = math.modf(_correct_ieee754(value))
    return int(math.floor(integral)), shifts


class Encoder:
    """Streaming schema-less encoder; one instance per output file so
    the shared-string cache spans all JSONL entries (the reference
    keeps one ``Encoder`` across the whole stream)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.cache = _Cache()

    # -- primitives -------------------------------------------------
    @property
    def position(self) -> int:
        return len(self.buf)

    def put_byte(self, b: int) -> None:
        self.buf.append(b & 0xFF)

    def put_varint(self, v: int) -> None:
        v &= (1 << 64) - 1          # mirror C++ uint64 wrapping
        while v > 0x7F:
            self.buf.append((v & 0x7F) | 0x80)
            v >>= 7
        self.buf.append(v)

    def put_varint_zigzag(self, v: int) -> None:
        self.put_varint(v * 2 if v >= 0 else -v * 2 - 1)

    # -- value encodings ---------------------------------------------
    def _put_real(self, value: float) -> None:
        integral, shifts = _real_digits(value)
        self.put_varint_zigzag(integral)
        self.put_varint(shifts)

    def _put_key(self, value: str) -> None:
        """PREFIX_VARINT_LENGTH_STRING_SHARED (encoder_string.cc:123)."""
        shared = self.cache.find(value, _PREFIX)
        if shared is not None:
            new_offset = self.position
            self.put_byte(0)
            self.put_varint(self.position - shared)
            self.cache.record(value, new_offset, _PREFIX)
        else:
            raw = value.encode("utf-8")
            self.cache.record(value, self.position, _PREFIX)
            self.put_varint(len(raw) + 1)
            self.cache.record(value, self.position, _STANDALONE)
            self.buf += raw

    def _put_string(self, value: str) -> None:
        raw = value.encode("utf-8")
        size = len(raw)
        shared = self.cache.find(value, _STANDALONE)
        if size < _U5:
            t = T_SHARED_STR if shared is not None else T_STRING
            self.put_byte(t | ((size + 1) << _TYPE_SIZE))
            if shared is not None:
                self.put_varint(self.position - shared)
            else:
                self.cache.record(value, self.position, _STANDALONE)
                self.buf += raw
        elif _U5 <= size < _U5 * 2 and shared is None:
            self.put_byte(T_LONG_STRING | ((size - _U5) << _TYPE_SIZE))
            self.buf += raw
        elif size >= (1 << _EXP_LO) and shared is None:
            exp = _EXP_LO
            while exp < _EXP_HI and (1 << (exp + 1)) <= size:
                exp += 1
            self.put_byte(T_OTHER | (exp << _TYPE_SIZE))
            self.put_varint(size - (1 << exp))
            self.buf += raw
        else:
            # FLOOR_VARINT_PREFIX_UTF8_STRING_SHARED, minimum = 62;
            # a fresh string is announced by an impossible-length
            # TYPE_STRING marker, a shared one starts 0x00
            if shared is None:
                self.put_byte(T_STRING)
            else:
                self.put_byte(0)
            self.put_varint(size - _U5 * 2 + 1)
            if shared is not None:
                self.put_varint(self.position - shared)
            else:
                self.cache.record(value, self.position, _STANDALONE)
                self.buf += raw

    def write(self, doc: Any) -> None:
        """ANY_PACKED_TYPE_TAG_BYTE_PREFIX (encoder_any.cc:73)."""
        if doc is None:
            self.put_byte(T_OTHER | (S_NULL << _TYPE_SIZE))
        elif isinstance(doc, bool):
            sub = S_TRUE if doc else S_FALSE
            self.put_byte(T_OTHER | (sub << _TYPE_SIZE))
        elif isinstance(doc, float):
            if doc.is_integer() and 0 <= doc <= 255:
                self.put_byte(T_OTHER | (S_REAL_BYTE << _TYPE_SIZE))
                self.put_byte(int(doc))
            else:
                self.put_byte(T_OTHER | (S_NUMBER << _TYPE_SIZE))
                self._put_real(doc)
        elif isinstance(doc, int):
            absolute = doc if doc >= 0 else -doc - 1
            if absolute <= 255:
                t = T_POS_BYTE if doc >= 0 else T_NEG_BYTE
                if absolute < _U5:
                    self.put_byte(t | ((absolute + 1) << _TYPE_SIZE))
                else:
                    self.put_byte(t)
                    self.put_byte(absolute)
            else:
                sub = S_POS_INT if doc >= 0 else S_NEG_INT
                self.put_byte(T_OTHER | (sub << _TYPE_SIZE))
                self.put_varint(absolute)
        elif isinstance(doc, str):
            self._put_string(doc)
        elif isinstance(doc, (list, tuple)):
            n = len(doc)
            if n >= _U5:
                self.put_byte(T_ARRAY)
                self.put_varint(n - _U5)
            else:
                self.put_byte(T_ARRAY | ((n + 1) << _TYPE_SIZE))
            for item in doc:
                self.write(item)
        elif isinstance(doc, dict):
            n = len(doc)
            if n >= _U5:
                self.put_byte(T_OBJECT)
                self.put_varint(n - _U5)
            else:
                self.put_byte(T_OBJECT | ((n + 1) << _TYPE_SIZE))
            for key, val in doc.items():
                self._put_key(str(key))
                self.write(val)
        else:
            raise TypeError(f"not JSON-encodable: {type(doc).__name__}")


class Decoder:
    """Schema-less decoder; shared strings resolve by seeking back to
    the referenced bytes (decoder_any.cc:49)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def has_more(self) -> bool:
        return self.pos < len(self.data)

    def get_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def get_varint(self) -> int:
        result, shift = 0, 0
        while True:
            b = self.get_byte()
            result += (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return result

    def get_string(self, nbytes: int) -> str:
        raw = self.data[self.pos:self.pos + nbytes]
        if len(raw) != nbytes:
            raise ValueError("truncated binpack string")
        self.pos += nbytes
        return raw.decode("utf-8")

    def _at(self, target: int, fn, *args) -> Any:
        saved, self.pos = self.pos, target
        try:
            return fn(*args)
        finally:
            self.pos = saved

    def _get_key(self) -> str:
        prefix = self.get_varint()
        if prefix == 0:
            position = self.pos
            offset = self.get_varint()
            return self._at(position - offset, self._get_key)
        return self.get_string(prefix - 1)

    def _get_floor_string(self) -> str:
        prefix = self.get_varint()
        if prefix == 0:                        # shared
            # mod-2^64: a shared 31..61-byte string (cached via an
            # object key) encodes length-62+1 as a WRAPPED uint64
            # varint; the +61 wraps it back (C++ unsigned arithmetic)
            length = (self.get_varint() + _U5 * 2 - 1) & ((1 << 64) - 1)
            position = self.pos
            offset = self.get_varint()
            return self._at(position - offset, self.get_string, length)
        return self.get_string(prefix + _U5 * 2 - 1)

    def read(self) -> Any:
        tag = self.get_byte()
        t, sub = tag & 0x07, tag >> _TYPE_SIZE
        if t == T_OTHER:
            if sub == S_NULL:
                return None
            if sub == S_FALSE:
                return False
            if sub == S_TRUE:
                return True
            if sub == S_NUMBER:
                raw = self.get_varint()
                integral = raw // 2 if raw % 2 == 0 else -(raw + 1) // 2
                point = self.get_varint()
                return integral / (10 ** point)
            if sub == S_REAL_BYTE:
                return float(self.get_byte())
            if sub == S_POS_INT:
                return self.get_varint()
            if sub == S_NEG_INT:
                return -self.get_varint() - 1
            if _EXP_LO <= sub <= _EXP_HI:
                return self.get_string(self.get_varint() + (1 << sub))
            raise ValueError(f"bad OTHER subtype {sub}")
        if t == T_POS_BYTE:
            return sub - 1 if sub > 0 else self.get_byte()
        if t == T_NEG_BYTE:
            return -sub if sub > 0 else -self.get_byte() - 1
        if t == T_SHARED_STR:
            # sub==0: length-62+1 may be a wrapped uint64 varint for a
            # shared 31..61-byte string (cached via an object key);
            # the +61 wraps it back, mirroring C++ unsigned arithmetic
            length = ((self.get_varint() - 1 + _U5 * 2) & ((1 << 64) - 1)) \
                if sub == 0 else sub - 1
            position = self.pos
            offset = self.get_varint()
            return self._at(position - offset, self.get_string, length)
        if t == T_STRING:
            if sub == 0:
                return self._get_floor_string()
            return self.get_string(sub - 1)
        if t == T_LONG_STRING:
            return self.get_string(sub + _U5)
        if t == T_ARRAY:
            n = (self.get_varint() + _U5) if sub == 0 else sub - 1
            return [self.read() for _ in range(n)]
        if t == T_OBJECT:
            n = (self.get_varint() + _U5) if sub == 0 else sub - 1
            out = {}
            for _ in range(n):
                key = self._get_key()
                out[key] = self.read()
            return out
        raise ValueError(f"bad type tag {t}")


def encode_document(doc: Any) -> bytes:
    enc = Encoder()
    enc.write(doc)
    return bytes(enc.buf)


def encode_stream(docs: Iterable[Any]) -> Iterator[tuple[int, bytes]]:
    """Encode a JSONL entry sequence into one shared-cache stream;
    yields (entry index, bytes appended for that entry)."""
    enc = Encoder()
    for i, doc in enumerate(docs):
        before = enc.position
        enc.write(doc)
        yield i, bytes(enc.buf[before:])


def decode_document(data: bytes) -> Any:
    return Decoder(data).read()


def decode_stream(data: bytes) -> Iterator[Any]:
    dec = Decoder(data)
    while dec.has_more():
        yield dec.read()
