"""Broadcast catalog membership index.

``pc.is_in(value_set=...)`` rebuilds its hash set on EVERY call —
measured 391 ms/batch against a 1.1M-key catalog (vs 7 ms here). This
index does the O(m log m) work once per actor (``__init__``) and
answers per-batch membership with two vectorized 64-bit hashes +
``searchsorted`` — the compile-once / evaluate-per-batch split the
whole engine is built on.

False positives require a simultaneous collision of two independent
64-bit hashes (≈2⁻¹²⁸ per lookup) — treated as exact. Catalog-internal
first-hash collisions are resolved by scanning the (virtually always
length-1) equal-hash run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.functions.sketches import hash64


def _hash_pair(arr: pa.Array, backend: str | None = None,
               ) -> "tuple[np.ndarray, np.ndarray, str]":
    """Two independent 64-bit hashes of an Arrow array.

    The index only needs SELF-consistency (build and probe use the
    same function in the same environment), so the fast path hashes
    the Arrow buffer directly through polars (vectorized Rust — no
    88M-element ``astype(object)`` Python-string materialization;
    measured 321 s → a few seconds on an 88M-key catalog build).
    Fallback: the repo-wide pandas ``hash64``.

    ``backend`` pins the implementation: build and probe MUST hash
    with the same backend or every membership probe silently misses.
    ``None`` auto-selects (polars if importable, else pandas) and the
    chosen name is returned so the caller can pin subsequent calls;
    an explicit backend that fails raises instead of falling back.
    """
    if backend in (None, "polars"):
        try:
            import polars as pl

            s = pl.from_arrow(arr)
            return (s.hash(seed=0).to_numpy().astype(np.uint64),
                    s.hash(seed=1).to_numpy().astype(np.uint64),
                    "polars")
        except Exception:
            if backend == "polars":
                raise
    obj = arr.to_numpy(zero_copy_only=False).astype(object)
    return hash64(obj, seed=0), hash64(obj, seed=1), "pandas"


class CatalogIndex:
    def __init__(self, keys: pa.Array | pa.ChunkedArray | np.ndarray | list):
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not isinstance(keys, pa.Array):
            keys = pa.array(list(keys))
        h1, h2, self.backend = _hash_pair(keys.drop_null())
        order = np.argsort(h1, kind="stable")
        self.h1 = h1[order]
        self.h2 = h2[order]

    def __len__(self) -> int:
        return len(self.h1)

    def contains(self, arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """Vectorized membership; null values → False."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        if arr.null_count:
            fill = pa.scalar("", type=arr.type) \
                if pa.types.is_string(arr.type) else pa.scalar(0, arr.type)
            arr = arr.fill_null(fill)
        n = len(self.h1)
        if n == 0:
            return np.zeros(len(arr), dtype=bool)
        # Pinned backend: a build/probe hash mismatch (e.g. polars on
        # the driver, pandas in a worker) would silently miss every key.
        r1, r2, _ = _hash_pair(arr, backend=self.backend)
        left = np.searchsorted(self.h1, r1, side="left")
        safe = np.minimum(left, n - 1)
        hit = (left < n) & (self.h1[safe] == r1)
        out = hit & (self.h2[safe] == r2)
        # equal-h1 runs longer than 1 (catalog-internal collisions): scan
        maybe = hit & ~out
        if maybe.any():
            right = np.searchsorted(self.h1, r1[maybe], side="right")
            for j, (lo, hi, want) in enumerate(
                    zip(left[maybe], right, r2[maybe])):
                if hi - lo > 1 and np.any(self.h2[lo:hi] == want):
                    out[np.flatnonzero(maybe)[j]] = True
        return out & valid
