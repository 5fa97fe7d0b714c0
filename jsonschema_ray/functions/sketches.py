"""Mergeable sketches for dataset-scope checks: HyperLogLog + t-digest.

The reference's aggregations are per-run scalars (SURVEY.md §2.5); the
north rule adds column-profile checks at 10^12-doc scale: distinct
counts via HLL and distribution drift via t-digest quantiles. Both
sketches are mergeable, so the pipeline computes one partial per block
inside ``map_batches`` and tree-reduces the partials — no shuffle of
the data itself ever happens (SURVEY.md §7.3).

Pure numpy, vectorized: per-batch cost is O(batch) with no Python loop
over rows. Serialization is plain ``bytes`` so partials travel as an
Arrow binary column.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0)."""
    v = v.astype(np.uint64).copy()
    out = np.zeros(len(v), dtype=np.int64)
    hi = v >> _U64(32)
    m = hi > 0
    out[m] += 32
    v[m] = hi[m]
    nz = v > 0
    # below 2**32 float64 log2 is exact enough for floor(log2)+1
    out[nz] += np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    return out


def hash64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of an array (strings or numerics).

    Uses pandas' vectorized hashing (stable across processes — unlike
    Python's ``hash`` under PYTHONHASHSEED randomization).
    """
    import pandas as pd

    arr = np.asarray(values, dtype=object) if values.dtype == object else values
    key = f"jsr{seed & 0xFFFFFFFF:013d}"  # exactly 16 bytes, seed-dependent
    # categorize=False: identical hashes, 11× faster on unique-heavy
    # arrays (categorize factorizes through a hash table first)
    return pd.util.hash_array(arr, hash_key=key,
                              categorize=False).astype(np.uint64)


def md5_hash64(values: np.ndarray) -> np.ndarray:
    """64-bit MD5-based hash (bytes 8..16 of the digest, little-endian)
    — bit-identical to DuckDB's ``md5_number_lower``, so operators built
    on it (simhash) are SQL-oracle-verifiable cross-engine.

    MD5 itself is per-string Python, so the cost is bounded by the
    UNIQUE value count: the batch is dictionary-encoded first and the
    digest computed once per distinct token (natural-language batches
    are vocabulary-bounded), then scattered back vectorized."""
    import hashlib

    if len(values) == 0:
        return np.empty(0, np.uint64)
    uniq, inv = np.unique(values.astype(object), return_inverse=True)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(str(t).encode()).digest()[8:],
                        "little") for t in uniq),
        dtype=np.uint64, count=len(uniq))
    return hu[inv]


def md5_hash64_upper(values: np.ndarray) -> np.ndarray:
    """First 8 digest bytes, little-endian — bit-identical to DuckDB's
    ``md5_number_upper``; the independent partner hash to
    :func:`md5_hash64` for Kirsch–Mitzenmacher double hashing."""
    import hashlib

    if len(values) == 0:
        return np.empty(0, np.uint64)
    uniq, inv = np.unique(values.astype(object), return_inverse=True)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8],
                        "little") for t in uniq),
        dtype=np.uint64, count=len(uniq))
    return hu[inv]


class HyperLogLog:
    """Dense HLL, p=12 (4096 registers, ~1.6% relative error)."""

    P = 12
    M = 1 << P

    def __init__(self, registers: np.ndarray | None = None):
        self.registers = (
            registers if registers is not None else np.zeros(self.M, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        h = h.astype(np.uint64)
        idx = (h >> _U64(64 - self.P)).astype(np.int64)
        w = h & ((_U64(1) << _U64(64 - self.P)) - _U64(1))
        rho = (64 - self.P) - _bit_length(w) + 1  # leading-zero count + 1
        np.maximum.at(self.registers, idx, rho.astype(np.uint8))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.M)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @staticmethod
    def deserialize(b: bytes) -> "HyperLogLog":
        return HyperLogLog(np.frombuffer(b, dtype=np.uint8).copy())


class TDigest:
    """Merging t-digest (Dunning's arcsine scale), vectorized compression.

    Centroid assignment uses the k1 scale function
    ``k(q) = δ·(asin(2q−1)/π + ½)`` applied to cumulative-weight
    midpoints; all per-batch work is sort + ``reduceat`` — no Python
    loop over values.
    """

    def __init__(self, delta: int = 100,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        if len(means) == 0:
            self.means, self.weights = means, weights
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0
        q = cum / total
        k = self.delta * (np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) / np.pi + 0.5)
        cluster = np.floor(k).astype(np.int64)
        # group-by cluster id via reduceat
        boundaries = np.flatnonzero(np.diff(cluster)) + 1
        starts = np.concatenate(([0], boundaries))
        w = np.add.reduceat(weights, starts)
        wm = np.add.reduceat(weights * means, starts)
        self.means, self.weights = wm / w, w

    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[np.isfinite(values)]
        if len(values) == 0:
            return
        self._compress(
            np.concatenate([self.means, values]),
            np.concatenate([self.weights, np.ones(len(values))]),
        )

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        out._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return out

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        if len(self.means) == 0:
            return np.full(np.shape(q) or (1,), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        probe = np.atleast_1d(np.asarray(q, dtype=np.float64)) * self.weights.sum()
        return np.interp(probe, cum, self.means)

    def serialize(self) -> bytes:
        head = struct.pack("<ii", self.delta, len(self.means))
        return head + self.means.tobytes() + self.weights.tobytes()

    @staticmethod
    def deserialize(b: bytes) -> "TDigest":
        delta, n = struct.unpack_from("<ii", b)
        off = 8
        means = np.frombuffer(b, dtype=np.float64, count=n, offset=off).copy()
        weights = np.frombuffer(b, dtype=np.float64, count=n, offset=off + 8 * n).copy()
        return TDigest(delta, means, weights)


def quantile_drift(base: TDigest, cur: TDigest,
                   probs: np.ndarray | None = None) -> float:
    """Normalized max quantile displacement between two digests.

    ``max_p |Q_base(p) − Q_cur(p)| / range(base)`` over a fixed probe
    grid — a KS-flavoured distance on the quantile function, compared
    against the drift rule's tolerance.
    """
    if probs is None:
        probs = np.linspace(0.01, 0.99, 25)
    qb, qc = base.quantile(probs), cur.quantile(probs)
    scale = float(qb.max() - qb.min()) or 1.0
    return float(np.max(np.abs(qb - qc)) / scale)


class MisraGries:
    """Misra-Gries / SpaceSaving-style heavy-hitters summary with at
    most ``capacity`` counters. Guarantee: for a stream of N items,
    every reported count is an UNDER-estimate by at most N/(capacity+1),
    and any item with true frequency > N/(capacity+1) is present.

    Mergeable (Agarwal et al., PODS'12): sum counters pairwise, then
    subtract the (capacity+1)-th largest count from all and drop
    non-positives — the merged summary keeps the additive error bound
    err_a + err_b. When ``capacity`` >= the true distinct count the
    summary is EXACT regardless of stream order or block layout (the
    property the SQL oracle relies on)."""

    def __init__(self, capacity: int = 256,
                 counters: dict | None = None, shed: int = 0):
        self.capacity = int(capacity)
        self.counters: dict = counters if counters is not None else {}
        self.shed = int(shed)  # cumulative decrement = max undercount

    def add_counts(self, items, counts) -> None:
        """Bulk update from pre-aggregated (item, count) pairs — the
        vectorized path: batches pre-count via ``value_counts`` so this
        touches each DISTINCT item once, not each occurrence."""
        c = self.counters
        for it, n in zip(items, counts):
            c[it] = c.get(it, 0) + int(n)
        self._trim()

    def _trim(self) -> None:
        c = self.counters
        over = len(c) - self.capacity
        if over <= 0:
            return
        # subtract the (capacity+1)-th largest count, drop non-positives
        vals = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        cut = int(np.partition(vals, over - 1)[over - 1])
        self.counters = {k: v - cut for k, v in c.items() if v > cut}
        self.shed += cut

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(min(self.capacity, other.capacity),
                         dict(self.counters),
                         self.shed + other.shed)
        c = out.counters
        for k, v in other.counters.items():
            c[k] = c.get(k, 0) + v
        out._trim()
        return out

    def topk(self, k: int) -> list[tuple]:
        """(item, lower-bound count) sorted by count desc, item asc."""
        return sorted(self.counters.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]

    def serialize(self) -> bytes:
        import json as _json

        return _json.dumps({"capacity": self.capacity, "shed": self.shed,
                            "counters": list(self.counters.items())}) \
            .encode()

    @staticmethod
    def deserialize(b: bytes) -> "MisraGries":
        import json as _json

        d = _json.loads(b.decode())
        return MisraGries(d["capacity"], dict(map(tuple, d["counters"])),
                          d["shed"])


class BloomFilter:
    """Mergeable Bloom filter for the catalog-membership SCALE path:
    when the referential catalog outgrows the broadcast
    ``CatalogIndex`` (functions/catalog.py), build per-block partial
    filters inside ``map_batches`` (no shuffle — OR-merge is
    associative/commutative like the HLL), ``ray.put`` the merged
    bits once, and probe inside the validation pass. Membership has
    NO false negatives: a ref that IS in the catalog always probes
    true, so every row the probe flags as missing is a CERTAIN
    violation (zero false accusations); conversely ≈``fpp`` of the
    true violations collide into "probably present" and slip the
    pre-filter — the documented trade for dropping the exact path's
    memory/shuffle cost. k hash probes are derived from two
    independent 64-bit hashes (Kirsch–Mitzenmacher double hashing) —
    fully vectorized."""

    def __init__(self, n_bits: int, k: int, hash_mode: str = "fast"):
        if n_bits <= 0 or k <= 0:
            raise ValueError("n_bits and k must be positive")
        if hash_mode not in ("fast", "md5"):
            raise ValueError("hash_mode must be 'fast' or 'md5'")
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.hash_mode = hash_mode
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def for_capacity(cls, n_items: int, fpp: float = 0.01,
                     hash_mode: str = "fast") -> "BloomFilter":
        """Standard sizing: m = -n·ln(p)/ln(2)², k = m/n·ln(2)."""
        n_items = max(1, int(n_items))
        m = int(np.ceil(-n_items * np.log(fpp) / (np.log(2) ** 2)))
        k = max(1, int(round(m / n_items * np.log(2))))
        return cls(m, k, hash_mode)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        if self.hash_mode == "md5":
            # DuckDB-replicable pair: (md5_number_lower, md5_number_upper)
            h1 = md5_hash64(values)
            h2 = md5_hash64_upper(values) | np.uint64(1)
        else:
            h1 = hash64(values, seed=0)
            h2 = hash64(values, seed=1) | np.uint64(1)  # odd → full cycle
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.n_bits))         # (k, n)

    def add(self, values: np.ndarray) -> "BloomFilter":
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return self

    def contains(self, values: np.ndarray) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if other.n_bits != self.n_bits or other.k != self.k:
            raise ValueError("bloom shape mismatch")
        self.bits |= other.bits
        return self

    def serialize(self) -> bytes:
        mode = 1 if self.hash_mode == "md5" else 0
        head = np.array([self.n_bits, self.k, mode],
                        dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes) -> "BloomFilter":
        n_bits, k, mode = np.frombuffer(raw, np.int64, 3)
        bf = cls(int(n_bits), int(k), "md5" if mode == 1 else "fast")
        bf.bits = np.frombuffer(raw, np.uint64, offset=24).copy()
        return bf
