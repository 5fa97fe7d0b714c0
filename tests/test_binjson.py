"""JSON BinPack v1 schema-less codec: byte-exactness pins + fuzzed
round-trips (sources/binjson.py; wire format per
/root/reference/vendor/jsonbinpack/src/runtime)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_ray.sources.binjson import (Encoder, decode_document,
                                            decode_stream, encode_document)


def test_reference_pinned_bytes():
    # pinned from the reference's own fixtures
    # (test/encode/pass_schema_less*.sh)
    assert encode_document({"version": 2.0}) == bytes.fromhex(
        "130876657273696f6e3702")
    enc = Encoder()
    for i in range(1, 6):
        enc.write({"count": i})
    assert bytes(enc.buf) == bytes.fromhex(
        "1306636f756e74151300091d130005251300052d13000535")


def test_shared_strings_across_stream_entries():
    # only <31 B and 62..127 B strings enter the dedup cache
    # (encoder_any.cc string branches); repeats of those back-reference
    docs = [{"name": "alpha", "blob": "z" * 70},
            {"name": "alpha", "blob": "z" * 70},
            {"name": "alpha"}]
    enc = Encoder()
    for d in docs:
        enc.write(d)
    assert list(decode_stream(bytes(enc.buf))) == docs
    # "alpha"/"name"/"blob"/the 70-byte blob are each emitted once
    assert len(enc.buf) < (4 + 5 + 4 + 70) + 3 * 12


def test_mid_length_string_shared_via_key_wraps_uint64():
    # a 31..61-byte string first seen as an OBJECT KEY lands in the
    # standalone cache; re-encoding it as a VALUE takes the FLOOR
    # shared path whose length-62+1 varint wraps below zero — the
    # decoder must wrap it back (mod-2^64, as C++ unsigned math does)
    k = "k" * 40
    doc = {k: k}
    assert decode_document(encode_document(doc)) == doc


# DOUBLE_VARINT_TUPLE is decimal-digit based (numeric_util.h:339) and
# deliberately lossy for floats whose decimal expansion exceeds double
# precision (the reference's real_digits loop has the same property) —
# fuzz with decimal-friendly reals, which round-trip exactly
_reals = st.builds(lambda m, e: m / 10 ** e or 0.0,
                   st.integers(-10**6, 10**6), st.integers(0, 4))

_json = st.recursive(
    st.none() | st.booleans()
    | st.integers(-2**62, 2**62)
    | _reals
    | st.text(max_size=70),
    lambda inner: st.lists(inner, max_size=5)
    | st.dictionaries(st.text(max_size=40), inner, max_size=5),
    max_leaves=20)


@settings(max_examples=300, deadline=None)
@given(doc=_json)
def test_roundtrip_fuzz(doc):
    rt = decode_document(encode_document(doc))
    assert rt == doc
    # type fidelity too: ints stay ints, reals stay reals
    assert json.dumps(rt, sort_keys=True) == json.dumps(doc, sort_keys=True)


def test_string_length_regimes_roundtrip():
    for n in (0, 1, 2, 3, 30, 31, 32, 61, 62, 63, 127, 128, 129,
              255, 256, 511, 512, 1023, 1024, 1025, 5000):
        s = "a" * n
        assert decode_document(encode_document(s)) == s
        # shared repeat of every regime inside one document
        doc = [s, s]
        assert decode_document(encode_document(doc)) == doc


def test_numbers_roundtrip():
    for v in (0, 1, -1, 30, 31, 255, 256, -255, -256, -257,
              2**40, -2**40, 2.0, 255.0, 256.0, -2.0, 3.14, -3.14,
              0.001, 1234.5678):
        rt = decode_document(encode_document(v))
        assert rt == v and type(rt) is type(v)
