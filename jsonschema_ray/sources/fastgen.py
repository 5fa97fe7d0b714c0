"""Allocation-light vectorized string assembly for the synth generator.

``np.char.*`` builds Python-object intermediates per element — measured
~6× throughput collapse under 16-way parallelism (memory-allocator
contention). These helpers assemble fixed-width ASCII byte matrices
with pure numpy writes and reinterpret them as ``S<w>`` arrays, which
Arrow ingests zero-copy-ish as binary → utf8.
"""

from __future__ import annotations

import binascii

import numpy as np
import pyarrow as pa


def hex16(h: np.ndarray) -> np.ndarray:
    """uint64 array → (n,16) uint8 ASCII lowercase-hex matrix."""
    if len(h) == 0:
        return np.empty((0, 16), dtype=np.uint8)
    raw = np.ascontiguousarray(h.astype(">u8")).tobytes()
    return np.frombuffer(binascii.hexlify(raw), dtype=np.uint8).reshape(-1, 16)


def decimal_fixed(v: np.ndarray, width: int) -> np.ndarray:
    """int array → (n,width) uint8 ASCII zero-padded decimal matrix."""
    out = np.empty((len(v), width), dtype=np.uint8)
    x = v.astype(np.int64)
    for k in range(width - 1, -1, -1):
        out[:, k] = (x % 10) + ord("0")
        x //= 10
    return out


def const_cols(n: int, s: bytes) -> np.ndarray:
    return np.broadcast_to(
        np.frombuffer(s, dtype=np.uint8), (n, len(s)))


def to_string_array(mat: np.ndarray) -> pa.Array:
    """(n,w) uint8 ASCII matrix → Arrow string array (no Python objects)."""
    n, w = mat.shape
    buf = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * w).tobytes())
    bin_arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, buf])
    return bin_arr.cast(pa.string())


def masked_string(mat: np.ndarray, valid: np.ndarray) -> pa.Array:
    """Fixed-width matrix + validity mask → nullable Arrow string."""
    import pyarrow.compute as pc

    arr = to_string_array(mat)
    if valid.all():
        return arr
    return pc.if_else(pa.array(valid), arr, pa.scalar(None, type=pa.string()))
