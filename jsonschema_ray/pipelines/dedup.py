"""Deduplication operators: exact, MinHash-LSH, SimHash.

Core training-data-pipeline ops at 100 TB scale. Shapes:

- **exact**: content-hash per batch (vectorized 64-bit) → shuffle only
  the thin ``(hash, key)`` pairs → groups with >1 member are dup
  candidates → texts of candidates (a tiny fraction) are fetched via a
  broadcast semi-join and compared exactly, so a 64-bit collision can
  never cause a false dedup. The full text column is NEVER shuffled.
- **MinHash-LSH**: per-batch vectorized shingling + minhash signatures
  (np.minimum.at over flattened shingle arrays — no per-row Python) →
  explode to (band, band_hash, key) rows → groupby bands → candidate
  pairs → exact Jaccard verification on the candidates only.
- **SimHash**: 64-bit weighted-bit fingerprint per doc; near-dup
  candidates bucketed by 16-bit chunks (Hamming ≤ 3 ⇒ at least one of
  4 chunks equal).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.functions.sketches import hash64
from jsonschema_ray.sources.readers import as_source

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(source: Any, key_col: str, text_col: str = "text"):
    """Exact duplicate groups: → Dataset (hash, n_copies, keep_id).

    ``keep_id`` is the minimum key (deterministic survivor). Collisions
    are resolved by exact text comparison on the candidate subset.
    """
    from ray.data.aggregate import Count, Min

    src = as_source(source)

    def add_hash(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        col = col.fill_null("")  # null text dedups as empty
        h = hash64(col.to_numpy(zero_copy_only=False).astype(object))
        # int64 view (not uint64): Ray shuffles uint64 keys as pickled
        # python-object extension arrays — int64 stays a native column
        return pa.table({
            "text_hash": pa.array(h.view(np.int64)),
            key_col: t.column(key_col),
        })

    pairs = src.dataset(columns=[key_col, text_col]).map_batches(
        add_hash, batch_format="pyarrow")
    from jsonschema_ray.stages.hashagg import hash_group_agg

    groups = hash_group_agg(pairs, "text_hash",
                            {"n_copies": (key_col, "size"),
                             "keep_id": (key_col, "min")})
    return groups.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_copies"), 1)),
        batch_format="pyarrow")


def exact_dedup_summary(source: Any, key_col: str, text_col: str = "text"
                        ) -> dict[str, int]:
    """{n_rows, n_unique, n_dup_groups} — collision-checked exactly via
    a second text comparison on candidate groups.

    Scale shape: the driver only ever holds scalars and the dup-group
    HASH array (8 bytes per dup group, broadcast once via ``ray.put``).
    Group stats are dataset aggregates; the collision audit (per-hash
    distinct-text count) is a distributed groupby over candidate rows
    — no candidate text ever reaches the driver."""
    import pandas as pd
    import ray

    src = as_source(source)
    groups = exact_dup_groups(source, key_col, text_col).materialize()
    n_rows = src.dataset(columns=[key_col]).count()
    n_groups = groups.count()
    n_dup_rows = int(groups.sum("n_copies") or 0) if n_groups else 0

    extra_unique = 0
    if n_groups:
        # thin pull: one uint64 per dup group, broadcast once
        hash_arr = np.sort(np.concatenate([
            b.column("text_hash").to_numpy(zero_copy_only=False)
            for b in groups.select_columns(["text_hash"])
            .iter_batches(batch_format="pyarrow")]))
        href = ray.put(hash_arr)

        def pick(t: pa.Table) -> pa.Table:
            hs = ray.get(href)  # zero-copy view from local object store
            col = t.column(text_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h = hash64(col.to_numpy(zero_copy_only=False).astype(object)) \
                .view(np.int64)
            idx = np.searchsorted(hs, h)
            idx[idx == len(hs)] = 0
            hit = hs[idx] == h
            return pa.table({"text_hash": pa.array(h[hit]),
                             text_col: col.filter(pa.array(hit))})

        def distinct_texts(g: pd.DataFrame) -> pd.DataFrame:
            # one vectorized nunique over ALL hash groups of the bucket
            extra = (g.groupby("text_hash", sort=False)[text_col]
                      .nunique() - 1).sum()
            return pd.DataFrame({"extra": [int(extra)]})

        from jsonschema_ray.stages.hashagg import _bucket_of

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(__hb=_bucket_of(df, ["text_hash"], 64))

        audit = src.dataset(columns=[key_col, text_col]) \
            .map_batches(pick, batch_format="pyarrow") \
            .map_batches(tag, batch_format="pandas") \
            .groupby("__hb").map_groups(distinct_texts,
                                        batch_format="pandas")
        extra_unique = int(audit.sum("extra") or 0)

    n_unique = n_rows - n_dup_rows + n_groups + extra_unique
    return {"n_rows": n_rows, "n_unique": n_unique,
            "n_dup_groups": int(n_groups)}


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _tokenize_flat(texts: np.ndarray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch via Arrow kernels (no per-row Python
    split): returns (counts_per_doc, flat_token_object_array)."""
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(texts, from_pandas=True)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):  # all-null block infers type null
        arr = arr.cast(pa.string())
    toks = pc.utf8_split_whitespace(arr.fill_null(""))
    counts = pc.list_value_length(toks).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    # empty strings produce [''] singleton lists; drop those tokens
    if len(flat):
        keep = pc.not_equal(flat, "")
        if not pc.all(keep).as_py():
            keep_np = keep.to_numpy(zero_copy_only=False)
            doc_of = np.repeat(np.arange(len(counts)), counts)
            counts = np.bincount(doc_of[keep_np], minlength=len(counts))
            flat = flat.filter(keep)
    return counts, flat.to_numpy(zero_copy_only=False)


def _shingle_hashes(texts: np.ndarray, k: int,
                    token_hash=hash64, return_pos: bool = False):
    """Word k-shingle hashes for a batch: returns (doc_idx, shingle_hash)
    flattened over all docs. Tokenization is Arrow ``utf8_split_whitespace``
    (vectorized); shingle hash is a rolling combine of token hashes over
    the flat token stream. ``token_hash``: 64-bit token hash — default
    fast pandas hash; ``sketches.md5_hash64`` for the DuckDB-reproducible
    (oracle-checkable) variant."""
    counts, flat_tokens = _tokenize_flat(texts)
    th = token_hash(flat_tokens) if len(flat_tokens) else np.empty(0, np.uint64)
    doc_of_tok = np.repeat(np.arange(len(texts)), counts)
    acc, valid = _rolling_shingles(doc_of_tok, th, k)
    if acc is None:
        if return_pos:
            return (np.empty(0, np.int64), np.empty(0, np.uint64),
                    np.empty(0, np.int64))
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    if return_pos:
        return doc_of_tok[valid], acc[valid], np.flatnonzero(valid)
    return doc_of_tok[valid], acc[valid]


def _rolling_shingles(doc_of_tok: np.ndarray, th: np.ndarray, k: int):
    """Rolling k-gram FNV combine over the flat token-hash stream:
    returns full-length (acc, valid) — acc[i] is the k-gram hash
    starting at flat position i, valid[i] iff all k tokens fall in the
    same doc. (None, None) on an empty stream."""
    n = len(th)
    if n == 0:
        return None, None
    with np.errstate(over="ignore"):
        acc = th.copy()
        valid = np.ones(n, dtype=bool)
        for j in range(1, k):
            shifted = np.empty(n, np.uint64)
            shifted[: n - j] = th[j:]
            shifted[n - j:] = 0
            same = np.empty(n, dtype=bool)
            same[: n - j] = doc_of_tok[j:] == doc_of_tok[: n - j]
            same[n - j:] = False
            acc = acc * np.uint64(1099511628211) + shifted  # FNV-ish combine
            valid &= same
    return acc, valid


def minhash_signatures(texts: np.ndarray, num_perm: int = 64,
                       shingle_k: int = 3, seed: int = 1,
                       token_hash=hash64) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix, vectorized:
    permutations applied to the flat shingle-hash stream, per-doc min
    via ``np.minimum.at``. Docs with no shingles get all-max sentinel."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    doc_idx, sh = _shingle_hashes(texts, shingle_k, token_hash=token_hash)
    sig = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            v = (a[i] * sh + b[i]) % _MERSENNE
            np.minimum.at(sig[:, i], doc_idx, v)
    return sig


def minhash_band_rows(source: Any, key_col: str, text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, seed: int = 1,
                      token_hash=hash64):
    """Explode each doc into ``bands`` (band, band_hash, key) rows."""
    src = as_source(source)
    rows_per_band = num_perm // bands

    def to_bands(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, num_perm=num_perm, seed=seed,
                                 token_hash=token_hash)
        # shingle-less docs share the all-max sentinel signature; banding
        # them would fuse every short/empty doc into ONE bucket and the
        # pair expansion would go quadratic on short-doc corpora — they
        # cannot be near-dups by shingle Jaccard, so drop them here
        has_sig = sig[:, 0] != np.iinfo(np.uint64).max
        if not has_sig.all():
            sig = sig[has_sig]
        n = int(has_sig.sum())
        if n == 0:
            return pa.table({
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                key_col: t.column(key_col).slice(0, 0),
            })
        band_sig = sig.reshape(n, bands, rows_per_band)
        with np.errstate(over="ignore"):
            bh = band_sig[:, :, 0].copy()
            for j in range(1, rows_per_band):
                bh = bh * np.uint64(1099511628211) ^ band_sig[:, :, j]
        keys = t.column(key_col).to_numpy(zero_copy_only=False)[has_sig]
        return pa.table({
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)
                             .reshape(bands, n).T.reshape(-1)),
            # int64 view: native Arrow column through the band shuffle
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            key_col: pa.array(np.repeat(keys, bands)),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        to_bands, batch_format="pyarrow")


def minhash_candidate_pairs(source: Any, key_col: str, text_col: str = "text",
                            num_perm: int = 64, bands: int = 16, seed: int = 1,
                            max_bucket: int = 256, token_hash=hash64):
    """LSH candidate pairs dataset (key_a < key_b), deduped.

    Pair expansion is vectorized (triangular-index inversion over
    sorted contiguous buckets), and a band
    bucket larger than ``max_bucket`` is truncated to its smallest
    ``max_bucket`` keys (deterministic) with the overflow counted in
    the ``n_dropped`` column of the emitted frame — an oversized bucket
    means the band hash has degenerated (skewed corpus) and quadratic
    expansion there would dominate the whole job; truncation keeps the
    densest duplicates and bounds work per bucket. No silent caps:
    consumers can sum ``n_dropped``."""
    import pandas as pd

    band_rows = minhash_band_rows(source, key_col, text_col, num_perm,
                                  bands, seed, token_hash=token_hash)

    # (band, band_hash) groups are MANY and tiny (bands × |buckets| —
    # ~80k at sf0.1); routing them each through map_groups is the
    # known catastrophic one-pandas-frame-per-group pattern (measured
    # 13.6 s at sf0.1). Hash the group id into ~2×cpu partition
    # buckets instead and expand every group of a bucket inside ONE
    # frame, fully vectorized — frame/scheduling overhead is paid per
    # BUCKET and no Python loop runs per group.
    import ray as _ray

    _cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    nb = max(2, min(128, _cpus * 2))

    def add_pb(t: "pa.Table") -> "pa.Table":
        band = t.column("band").to_numpy().astype(np.uint64)
        bh = t.column("band_hash").to_numpy().view(np.uint64)
        pb = ((band * np.uint64(1_000_003) + bh) % np.uint64(nb)) \
            .astype(np.int64)
        return t.append_column("pb", pa.array(pb))

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized all-pairs expansion: ONE sort makes every
        # (band, band_hash) group contiguous with keys ascending inside
        # it, then the within-group pair index p ∈ [0, s(s-1)/2) is
        # inverted arithmetically to (i, j) — no Python loop over the
        # ~quarter-million tiny buckets a partition holds (the per-group
        # pandas loop measured 632 s CPU at 1M docs; this is ~20×).
        if len(g) == 0:
            empty = g[key_col].to_numpy()
            return pd.DataFrame({"key_a": empty, "key_b": empty,
                                 "n_dropped": np.array([], dtype=np.int64)})
        g = g.sort_values(["band", "band_hash", key_col],
                          kind="mergesort", ignore_index=True)
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(g)])
        s = np.minimum(sizes, max_bucket)   # smallest keys survive a cap
        dropped = sizes - s
        c = s * (s - 1) // 2
        total = int(c.sum())
        keys_np = g[key_col].to_numpy()
        if total == 0:
            empty = keys_np[:0]
            return pd.DataFrame({"key_a": empty, "key_b": empty,
                                 "n_dropped": np.array([], dtype=np.int64)})
        off = np.cumsum(c) - c              # first-pair offset per group
        grp = np.repeat(np.arange(len(s)), c)
        p = np.arange(total, dtype=np.int64) - np.repeat(off, c)
        # j = largest row with j(j-1)/2 <= p; float64 sqrt is exact at
        # these magnitudes (s <= max_bucket) and the two integer
        # corrections remove any rounding slack
        j = ((1.0 + np.sqrt(1.0 + 8.0 * p.astype(np.float64))) // 2) \
            .astype(np.int64)
        j[j * (j - 1) // 2 > p] -= 1
        j[(j + 1) * j // 2 <= p] += 1
        i = p - j * (j - 1) // 2
        base = starts[grp]
        nd = np.zeros(total, dtype=np.int64)
        trunc = (dropped > 0) & (c > 0)
        nd[off[trunc]] = dropped[trunc]
        return pd.DataFrame({"key_a": keys_np[base + i],
                             "key_b": keys_np[base + j],
                             "n_dropped": nd})

    pairs = band_rows.map_batches(add_pb, batch_format="pyarrow") \
        .groupby("pb").map_groups(pairs_of_bucket, batch_format="pandas")

    # Dedupe pairs found in multiple bands; n_dropped survives as a sum.
    # NOT Ray's multi-key groupby().aggregate(): its two-column
    # Aggregate burned 5327 s (map) + 4834 s (reduce) of CPU on 3.9M
    # pair rows at 1M docs — vs ~3 s for the single-int-key sort
    # shuffle right above. Instead hash the pair identity into the same
    # nb buckets (one cheap single-key shuffle) and dedupe each bucket
    # with one vectorized pandas groupby.
    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ha = pd.util.hash_array(df["key_a"].to_numpy(), categorize=False)
        hb = pd.util.hash_array(df["key_b"].to_numpy(), categorize=False)
        with np.errstate(over="ignore"):
            h = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        return df.assign(pp=(h % np.uint64(nb)).astype(np.int64))

    def dedupe_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["key_a", "key_b"], sort=False, as_index=False)
                  .agg(n_bands=("n_dropped", "size"),
                       n_dropped=("n_dropped", "sum")))

    return pairs.map_batches(add_pair_bucket, batch_format="pandas") \
        .groupby("pp").map_groups(dedupe_bucket, batch_format="pandas")


def verify_jaccard(texts_by_key: dict[Any, str], pairs: list[tuple],
                   shingle_k: int = 3, threshold: float = 0.7) -> list[dict]:
    """Exact Jaccard on candidate pairs (runs inside ``map_batches``
    workers over pair partitions; candidates are a tiny fraction by
    construction — LSH prefilters). Shingle sets are memoized per key
    so a key in many pairs tokenizes once."""
    cache: dict = {}

    def shingles(key) -> set:
        s = cache.get(key)
        if s is None:
            toks = texts_by_key[key].split()
            s = cache[key] = {tuple(toks[i:i + shingle_k])
                              for i in range(max(0, len(toks) - shingle_k + 1))}
        return s

    out = []
    for a, b in pairs:
        sa, sb = shingles(a), shingles(b)
        if not sa and not sb:
            j, i = 1.0, 0
        else:
            i = len(sa & sb)
            j = i / max(1, len(sa | sb))
        if j >= threshold:
            out.append({"key_a": a, "key_b": b, "n_common": i,
                        "jaccard": round(j, 4)})
    return out


def _doc_shingle_blobs(texts: np.ndarray, shingle_k: int,
                       token_hash=hash64) -> pa.Array:
    """Per-doc sorted-UNIQUE shingle-hash arrays for a batch, encoded as
    one Arrow ``binary`` column (little-endian int64 payload, 8 bytes
    per distinct shingle). This is what the verify tier ships through
    its joins instead of raw text: the Jaccard a consumer computes from
    two blobs equals the exact distinct-shingle Jaccard (same
    convention as ``ngram_jaccard_pairs`` — 64-bit shingle hashing,
    collision probability ~(u²/2)/2⁶⁴ per pair union u, negligible and
    shared with the driver-green exact n-gram path)."""
    d, h = _shingle_hashes(texts, shingle_k, token_hash=token_hash)
    n = len(texts)
    if len(h) == 0:
        offs = np.zeros(n + 1, dtype=np.int32)
        return pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(b"")])
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    first = np.empty(len(h), dtype=bool)
    first[0] = True
    first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    d, h = d[first], h[first]
    sizes = np.bincount(d, minlength=n).astype(np.int64)
    # int32 offsets: a batch's flat payload is bounded by the block size
    # (~128 MB target) — far under the 2 GiB binary-offset ceiling
    offs = (np.concatenate([[0], np.cumsum(sizes)]) * 8).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(h, dtype="<u8").tobytes())])


def _decode_blobs(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 stream, per-row element counts) from a binary
    column of int64-LE blobs — pure buffer arithmetic, no per-row
    Python. Handles both ``binary`` (int32 offsets) and
    ``large_binary`` (int64): Ray's join may narrow the type."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    owidth = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], owidth)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    if offs[-1] == offs[0]:
        return np.empty(0, np.uint64), np.diff(offs) // 8
    data = np.frombuffer(bufs[2], np.uint8)
    flat = data[offs[0]:offs[-1]].copy().view(np.dtype("<u8"))
    return flat, np.diff(offs) // 8


def _blob_jaccard(flat_a: np.ndarray, sz_a: np.ndarray,
                  flat_b: np.ndarray, sz_b: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exact Jaccard over n pairs of sorted-unique hash
    arrays: one lexsort of the tagged concatenated stream, adjacent
    (pair, value) duplicates = intersection hits (each side is unique,
    so a value can appear at most twice per pair). Returns
    (n_common int64, jaccard float64); both-empty pairs get j=1.0
    (same contract as the per-pair kernel it replaces)."""
    n = len(sz_a)
    pair_of = np.concatenate([np.repeat(np.arange(n), sz_a),
                              np.repeat(np.arange(n), sz_b)])
    vals = np.concatenate([flat_a, flat_b])
    order = np.lexsort((vals, pair_of))
    p, v = pair_of[order], vals[order]
    eq = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[1:][eq], minlength=n).astype(np.int64)
    union = sz_a + sz_b - inter
    j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    return inter, j


def minhash_verified_pairs(source: Any, key_col: str, text_col: str = "text",
                           threshold: float = 0.7, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           seed: int = 1,
                           broadcast_max_pairs: int | None = None) -> pa.Table:
    """End-to-end near-dup detection: MinHash-LSH candidates → exact
    n-gram-Jaccard verification.

    Scale shape: below ``VERIFY_BROADCAST_MAX_PAIRS`` candidates, the
    texts are broadcast once via ``ray.put`` and verification runs
    distributed over pair partitions; above it (high-duplication
    corpora where candidates are O(corpus)), texts are attached with
    two distributed ``Dataset.join``s (pairs ⋈ texts on key_a, then
    key_b) and the same Jaccard kernel runs per joined batch — the
    driver never holds candidate ids or texts on that path."""
    pairs = minhash_candidate_pairs(
        source, key_col, text_col, num_perm, bands, seed).materialize()
    return _verify_candidate_pairs(source, key_col, text_col, pairs,
                                   shingle_k, threshold,
                                   broadcast_max_pairs=broadcast_max_pairs)


#: Above this many candidate pairs the verifier stops broadcasting
#: candidate texts through the driver and fetches them with two
#: distributed joins instead. High-duplication corpora (crawl dumps
#: routinely exceed 30% near-dup) make the candidate set O(corpus),
#: so the broadcast path must stay a small-set optimization only.
VERIFY_BROADCAST_MAX_PAIRS = 50_000


def _verify_candidate_pairs(source: Any, key_col: str, text_col: str,
                            pairs, shingle_k: int, threshold: float,
                            with_counts: bool = False,
                            broadcast_max_pairs: int | None = None) -> pa.Table:
    """Exact-Jaccard verification of a (key_a, key_b) candidate Dataset.
    Shared by the MinHash-LSH and PPJoin-prefix paths.

    Two execution shapes, chosen by candidate volume:

    Both shapes ship per-doc sorted int64 shingle-hash arrays (computed
    once per doc, vectorized) instead of raw text, and verify with one
    vectorized sorted-stream intersection per batch — no per-pair
    Python set kernel (that kernel was the measured dedup bottleneck:
    ~33 s of 57 s at 4M docs).

    - **small** (≤ ``broadcast_max_pairs`` pairs): candidate ids are
      pulled thin, the matching docs' hash arrays computed in a
      vectorized semi-join pass and broadcast once with ``ray.put``;
      verification runs distributed over pair partitions against the
      shared dict.
    - **large**: two distributed ``Dataset.join``s attach the hash-blob
      columns to each pair (pairs ⋈ blobs on ``key_a``, then on
      ``key_b``). The driver never holds candidate ids or texts — only
      the final verified pairs.
    """
    import ray

    if broadcast_max_pairs is None:
        broadcast_max_pairs = VERIFY_BROADCAST_MAX_PAIRS
    cols = ["key_a", "key_b"] + (["n_common"] if with_counts else [])
    empty = pa.table({**{c: pa.array([], type=pa.int64()) for c in cols},
                      "jaccard": pa.array([], type=pa.float64())})
    n_pairs = pairs.count()
    if n_pairs == 0:
        return empty

    src = as_source(source)

    if n_pairs > broadcast_max_pairs:
        out = _verify_pairs_joined(src, key_col, text_col, pairs, n_pairs,
                                   shingle_k, threshold, cols, empty)
    else:
        # thin driver pull: ids only (≤ 2·n_pairs, bounded by the gate)
        cand_ids: set = set()
        for b in pairs.select_columns(["key_a", "key_b"]).iter_batches(
                batch_format="pyarrow"):
            cand_ids.update(b.column("key_a").to_pylist())
            cand_ids.update(b.column("key_b").to_pylist())
        id_set = pa.array(sorted(cand_ids))

        def pick_blobs(t: pa.Table) -> pa.Table:
            col = t.column(key_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = t.filter(pc.is_in(col, value_set=id_set))
            texts = t.column(text_col).to_numpy(zero_copy_only=False)
            return pa.table({
                key_col: t.column(key_col),
                "__sh": _doc_shingle_blobs(texts, shingle_k)})

        cand_rows = src.dataset(columns=[key_col, text_col]).map_batches(
            pick_blobs, batch_format="pyarrow").to_pandas()
        le_u8 = np.dtype("<u8")
        arrays_ref = ray.put({
            k: np.frombuffer(b, dtype=le_u8)
            for k, b in zip(cand_rows[key_col], cand_rows["__sh"])})

        def verify_batch(t: pa.Table) -> pa.Table:
            arrays = ray.get(arrays_ref)  # zero-copy from local store
            ka, kb = t.column("key_a"), t.column("key_b")
            arrs_a = [arrays[k] for k in ka.to_pylist()]
            arrs_b = [arrays[k] for k in kb.to_pylist()]
            sz_a = np.fromiter(map(len, arrs_a), np.int64, len(arrs_a))
            sz_b = np.fromiter(map(len, arrs_b), np.int64, len(arrs_b))
            flat_a = np.concatenate(arrs_a) if arrs_a \
                else np.empty(0, np.uint64)
            flat_b = np.concatenate(arrs_b) if arrs_b \
                else np.empty(0, np.uint64)
            inter, j = _blob_jaccard(flat_a, sz_a, flat_b, sz_b)
            keep = j >= threshold
            if not keep.any():
                return empty
            km = pa.array(keep)
            return pa.table({
                "key_a": ka.filter(km), "key_b": kb.filter(km),
                "n_common": pa.array(inter[keep]),
                "jaccard": pa.array(np.round(j[keep], 4)),
            }).select(cols + ["jaccard"]).cast(empty.schema)

        out = pairs.map_batches(verify_batch, batch_format="pyarrow")
    # verified pairs are the final (small) result — stream to driver
    batches = list(out.iter_batches(batch_format="pyarrow"))
    if not batches:
        return empty
    return pa.concat_tables(batches).combine_chunks()


def _verify_pairs_joined(src, key_col: str, text_col: str, pairs,
                         n_pairs: int, shingle_k: int, threshold: float,
                         cols: list, empty: pa.Table):
    """Distributed hash-array fetch for candidate verification: each
    doc's sorted-unique int64 shingle hashes are computed ONCE in a
    vectorized pass and encoded as a binary blob; pairs ⋈ blobs on
    key_a, then on key_b, then one vectorized sorted-stream
    intersection per joined batch (``_blob_jaccard``). Used above
    ``VERIFY_BROADCAST_MAX_PAIRS`` so the driver never materializes
    O(corpus) candidate ids/texts.

    Raw text never crosses the verify joins (round-4 measured the
    per-pair Python set kernel + double text-ship as the dedup
    bottleneck, ~33 s of 57 s at 4M docs; the round-4 bucketed rewrite
    proved the exchange mechanism was not the lever — wire content +
    kernel are)."""
    # Partition count: each hash-join partition carries a fixed
    # scheduling/build cost that dominated the old pair-count formula
    # (measured at 4M docs / 1.2M pairs: 8 parts 32.9 s, 16 → 36.7 s,
    # 32 → 43.3 s, 50 [old formula] → 45.9 s). Size by whichever bound
    # bites: keep ~cpus/4 partitions for parallelism, and add
    # partitions only when a partition would otherwise hold > ~500k
    # pair rows or > ~1M corpus texts (join builds materialize a
    # partition; this bounds worker memory at cluster scale).
    import ray as _ray

    from jsonschema_ray.sources.readers import ParquetSource

    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    # corpus-size bound: metadata-only for parquet sources; for
    # in-memory/other sources count() would trigger a full extra
    # execution, so fall back to the pair/cpu bounds alone (ADVICE r4)
    n_texts = src.dataset(columns=[key_col]).count() \
        if isinstance(src, ParquetSource) else 0
    n_part = max(2, min(512, max(cpus // 4, n_pairs // 500_000,
                                 n_texts // 1_000_000)))
    thin = pairs.select_columns(["key_a", "key_b"])

    def to_blobs(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: t.column(key_col),
            "__sh": _doc_shingle_blobs(texts, shingle_k)})

    # materialized ONCE: both joins consume it, and without this each
    # join re-executes the read+shingle lineage (measured +9 s of the
    # verify wall at 1M docs). Peak footprint is unchanged — the hash
    # join shuffles/holds the full blob table per partition anyway, and
    # blob bytes ≈ text bytes (8 B per distinct shingle), spillable.
    blobs = src.dataset(columns=[key_col, text_col]).map_batches(
        to_blobs, batch_format="pyarrow").materialize()

    def tidy(alias: str):
        # Ray's hash join coalesces the right key into the left key
        # column; drop it defensively if it survived, and alias the
        # fetched blob column out of the way of the second join.
        def f(t: pa.Table) -> pa.Table:
            if key_col in t.column_names and key_col not in (
                    "key_a", "key_b"):
                t = t.drop_columns([key_col])
            return t.rename_columns(
                [alias if c == "__sh" else c for c in t.column_names])
        return f

    j1 = thin.join(blobs, join_type="inner", num_partitions=n_part,
                   on=("key_a",), right_on=(key_col,),
                   left_suffix="", right_suffix="_r1") \
        .map_batches(tidy("__sh_a"), batch_format="pyarrow")
    j2 = j1.join(blobs, join_type="inner", num_partitions=n_part,
                 on=("key_b",), right_on=(key_col,),
                 left_suffix="", right_suffix="_r2") \
        .map_batches(tidy("__sh_b"), batch_format="pyarrow")

    def verify_joined(t: pa.Table) -> pa.Table:
        flat_a, sz_a = _decode_blobs(t.column("__sh_a"))
        flat_b, sz_b = _decode_blobs(t.column("__sh_b"))
        inter, j = _blob_jaccard(flat_a, sz_a, flat_b, sz_b)
        keep = j >= threshold
        if not keep.any():
            return empty
        km = pa.array(keep)
        return pa.table({
            "key_a": t.column("key_a").filter(km),
            "key_b": t.column("key_b").filter(km),
            "n_common": pa.array(inter[keep]),
            "jaccard": pa.array(np.round(j[keep], 4)),
        }).select(cols + ["jaccard"]).cast(empty.schema)

    return j2.map_batches(verify_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental (cross-corpus) near-dup: persisted MinHash-LSH index
# ---------------------------------------------------------------------------

def minhash_index_write(source: Any, key_col: str, index_dir: str, *,
                        text_col: str = "text", num_perm: int = 64,
                        bands: int = 16, seed: int = 1,
                        shingle_k: int = 3, n_buckets: int = 64,
                        token_hash=hash64) -> dict:
    """Persist the LSH state of a corpus for INCREMENTAL near-dup —
    the continuous-ingestion shape: each NEW shard is later checked
    against the accumulated index (:func:`minhash_query_index`)
    without re-reading, re-shingling or re-signing the old corpus.

    Layout (hash-bucket-partitioned parquet, append-friendly — a later
    ingest of more corpus just writes additional files into the same
    bucket dirs):

    - ``index_dir/bands``  — (band, band_hash, key) rows, partitioned
      by ``bucket = band_hash mod n_buckets``;
    - ``index_dir/blobs``  — (key, __sh) per-doc sorted int64
      shingle-hash blobs (the verify tier's wire format, computed once
      here), partitioned by ``bucket = hash(key) mod n_buckets``;
    - ``index_dir/manifest.json`` pins (num_perm, bands, seed,
      shingle_k, n_buckets) so a query can only run with matching
      parameters.

    Streaming end to end: both tables go straight from ``map_batches``
    to ``write_parquet`` — nothing materializes on the driver."""
    import json
    import os

    src = as_source(source)
    band_rows = minhash_band_rows(src, key_col, text_col, num_perm,
                                  bands, seed, token_hash=token_hash)

    def add_bucket(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy().view(np.uint64)
        return t.append_column(
            "bucket", pa.array((bh % np.uint64(n_buckets))
                               .astype(np.int32)))

    band_rows.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(os.path.join(index_dir, "bands"),
                       partition_cols=["bucket"])

    def to_blobs(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kv = keys.to_numpy(zero_copy_only=False)
        kb = (hash64(kv.astype(object) if kv.dtype == object else kv)
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            key_col: keys,
            "__sh": _doc_shingle_blobs(texts, shingle_k,
                                       token_hash=token_hash),
            "bucket": pa.array(kb)})

    src.dataset(columns=[key_col, text_col]) \
        .map_batches(to_blobs, batch_format="pyarrow") \
        .write_parquet(os.path.join(index_dir, "blobs"),
                       partition_cols=["bucket"])

    manifest = {"key_col": key_col, "num_perm": num_perm,
                "bands": bands, "seed": seed, "shingle_k": shingle_k,
                "n_buckets": n_buckets}
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def minhash_query_index(new_source: Any, key_col: str, index_dir: str, *,
                        text_col: str = "text", threshold: float = 0.7,
                        token_hash=hash64):
    """Check a NEW shard against a persisted MinHash index
    (:func:`minhash_index_write`): → Dataset
    ``(key_new, key_idx, jaccard)`` of verified cross-corpus near-dup
    pairs with ``jaccard ≥ threshold``.

    Shape: the new shard's band rows join the index's band table on
    (band, band_hash) — the index side streams from its parquet
    buckets; the OLD CORPUS TEXT IS NEVER TOUCHED, because
    verification runs on the index's stored shingle blobs joined to
    blobs computed in-stream for the new side, through the same
    vectorized ``_blob_jaccard`` kernel as the in-corpus verify tier.
    Candidate dedupe is one hashed single-key shuffle
    (``hash_group_agg``)."""
    import json
    import os

    from jsonschema_ray.raycompat import read_parquet_clean
    from jsonschema_ray.stages.hashagg import hash_group_agg

    with open(os.path.join(index_dir, "manifest.json")) as fh:
        m = json.load(fh)
    src = as_source(new_source)
    new_bands = minhash_band_rows(src, key_col, text_col,
                                  m["num_perm"], m["bands"], m["seed"],
                                  token_hash=token_hash) \
        .map_batches(lambda t: t.rename_columns(
            ["band", "band_hash", "__key_new"]), batch_format="pyarrow")

    idx_bands = read_parquet_clean(
        os.path.join(index_dir, "bands"),
        columns=["band", "band_hash", m["key_col"]])

    cand = new_bands.join(idx_bands, join_type="inner",
                          num_partitions=max(2, m["n_buckets"] // 8),
                          on=("band", "band_hash"),
                          left_suffix="", right_suffix="_r")

    def thin(t: pa.Table) -> pa.Table:
        return pa.table({"key_new": t.column("__key_new"),
                         "key_idx": t.column(m["key_col"])})

    pairs = hash_group_agg(
        cand.map_batches(thin, batch_format="pyarrow"),
        ["key_new", "key_idx"], {"n_bands": ("key_new", "size")})

    empty = pa.table({"key_new": pa.array([], pa.int64()),
                      "key_idx": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})

    idx_blobs = read_parquet_clean(
        os.path.join(index_dir, "blobs"),
        columns=[m["key_col"], "__sh"])

    def new_blobs_batch(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "__bkey": t.column(key_col),
            "__sh_n": _doc_shingle_blobs(texts, m["shingle_k"],
                                         token_hash=token_hash)})

    new_blobs = src.dataset(columns=[key_col, text_col]) \
        .map_batches(new_blobs_batch, batch_format="pyarrow")

    # repo hash_join, NOT Dataset.join: the candidate stream is sparse
    # relative to any partition count at small corpora, and Ray's
    # native join crashes on zero-block partitions (joins.py:419 note)
    from jsonschema_ray.pipelines.joins import hash_join

    j1 = hash_join(pairs, idx_blobs, on="key_idx",
                   right_on=m["key_col"])
    j2 = hash_join(j1, new_blobs, on="key_new", right_on="__bkey")

    def verify(t: pa.Table) -> pa.Table:
        flat_i, sz_i = _decode_blobs(t.column("__sh"))
        flat_n, sz_n = _decode_blobs(t.column("__sh_n"))
        inter, j = _blob_jaccard(flat_n, sz_n, flat_i, sz_i)
        keep = j >= threshold
        if not keep.any():
            return empty
        km = pa.array(keep)
        return pa.table({
            "key_new": t.column("key_new").filter(km),
            "key_idx": t.column("key_idx").filter(km),
            "jaccard": pa.array(np.round(j[keep], 4)),
        }).cast(empty.schema)

    return j2.map_batches(verify, batch_format="pyarrow")


def dup_clusters(pairs, keys=None) -> dict:
    """Connected components over verified duplicate pairs → {key: root}
    with root = min key of the component (the canonical survivor).

    Driver-side union-find: the pair set is the output of LSH + exact
    verification, which is small by construction (near-dup pairs, not
    the corpus). For a pathological corpus where pairs themselves are
    huge, switch to iterated min-label propagation with groupby (one
    round per component diameter) — documented trade-off, not needed
    while pairs ≪ corpus.
    """
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra <= rb else (rb, ra)
        parent[hi] = lo

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    out = {k: find(k) for k in parent}
    if keys is not None:
        for k in keys:
            out.setdefault(k, k)
    return out


#: Above this many verified duplicate pairs, ``dup_clusters_table``
#: switches from driver union-find to the distributed alternating
#: large-star/small-star algorithm.
CLUSTERS_DRIVER_MAX_PAIRS = 500_000


def dup_clusters_table(pairs, *, driver_max_pairs: int | None = None,
                       max_rounds: int = 64) -> pa.Table:
    """Connected components over a verified duplicate-pair Dataset →
    Arrow table (key, root), root = min key of the component.

    Small pair sets (≤ ``driver_max_pairs``) use the exact driver
    union-find (`dup_clusters`). Larger sets run the alternating
    large-star / small-star algorithm (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond"): O(log n) rounds of groupby
    shuffles, converging to star graphs rooted at each component's
    minimum key — the driver only ever holds per-round (count, hash)
    scalars and the final labels. Both paths produce identical labels.
    """
    import ray.data as rd

    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)
    if driver_max_pairs is None:
        driver_max_pairs = CLUSTERS_DRIVER_MAX_PAIRS
    n_pairs = pairs.count()
    empty = pa.table({"key": pa.array([], pa.int64()),
                      "root": pa.array([], pa.int64())})
    if n_pairs == 0:
        return empty
    if n_pairs <= driver_max_pairs:
        edges = []
        for b in pairs.select_columns(["key_a", "key_b"]).iter_batches(
                batch_format="pyarrow"):
            edges.extend(zip(b.column("key_a").to_pylist(),
                             b.column("key_b").to_pylist()))
        clusters = dup_clusters(edges)
        keys = sorted(clusters)
        return pa.table({"key": pa.array(keys, pa.int64()),
                         "root": pa.array([int(clusters[k]) for k in keys],
                                          pa.int64())})
    return _dup_clusters_star(pairs, n_pairs, max_rounds)


def _dup_clusters_star(pairs, n_pairs: int, max_rounds: int) -> pa.Table:
    """Alternating large-star/small-star label propagation (distributed
    path of ``dup_clusters_table``).

    Two hash-partitioned shuffles per round, with all per-bucket work
    vectorized pandas (``groupby().min()`` + index lookups) — never
    per-CENTER Python (100k single-edge groups through ``map_groups``
    is a scale-killer) and never Ray's Join operator (unstable under
    iterated use). Partitioning is by hash(center): the one skew case
    is the final star of a giant duplicate component, whose root
    bucket holds that component's (child, root) rows — 16 bytes/row;
    acceptable up to ~10^8-row components, beyond which salting the
    star center would be needed."""
    import os

    import pandas as pd

    n_buckets = max(8, min(256, n_pairs // 100_000 + 8))

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("key_a").to_numpy(zero_copy_only=False)
        b = t.column("key_b").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(hi[keep].astype(np.int64)),
                         "b": pa.array(lo[keep].astype(np.int64))})

    # edges as (a, b) with a > b: parent pointers toward smaller keys
    edges = pairs.select_columns(["key_a", "key_b"]).map_batches(
        canon, batch_format="pyarrow").materialize()

    def _pb(x: np.ndarray) -> np.ndarray:
        return ((x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(n_buckets)

    def sym_pb(t: pa.Table) -> pa.Table:
        # symmetrize and partition by the large-star CENTER u
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        u = np.concatenate([a, b]).astype(np.int64)
        v = np.concatenate([b, a]).astype(np.int64)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "pb": pa.array(_pb(u).astype(np.int32))})

    def ls_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all edges of every center in this bucket are present; emit
        # (v, min(Γ(u) ∪ {u})) for each strictly-larger neighbor v
        g = g[["u", "v"]].drop_duplicates()
        mins = g.groupby("u")["v"].min()
        m = pd.Series(np.minimum(mins.to_numpy(), mins.index.to_numpy()),
                      index=mins.index)
        sel = g[g["v"].to_numpy() > g["u"].to_numpy()]
        return pd.DataFrame({
            "a": sel["v"].to_numpy(np.int64),
            "b": m.loc[sel["u"]].to_numpy(np.int64)}).drop_duplicates()

    def edge_pb(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        return t.append_column("pb", pa.array(_pb(a).astype(np.int32)))

    def ss_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # edges directed (a > b); per center a: m = min(Γ⁻(a)); emit
        # (child, m) for children != m plus the center's own (a, m)
        g = g[["a", "b"]].drop_duplicates()
        mins = g.groupby("a")["b"].min()
        mm = mins.loc[g["a"]].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        keep = b != mm
        return pd.DataFrame({
            "a": np.concatenate([b[keep],
                                 mins.index.to_numpy(np.int64)]),
            "b": np.concatenate([mm[keep],
                                 mins.to_numpy(np.int64)])})

    def edge_stats(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = a * np.uint64(0x9E3779B97F4A7C15) ^ (b + np.uint64(0x517CC1B7))
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "h": pa.array([int(h.sum(dtype=np.uint64))
                                        % (1 << 63)], pa.int64())})

    debug = bool(os.environ.get("CC_DEBUG"))
    prev = None
    for rnd in range(max_rounds):
        ls = edges.map_batches(sym_pb, batch_format="pyarrow") \
            .groupby("pb").map_groups(ls_bucket, batch_format="pandas")
        edges = ls.map_batches(edge_pb, batch_format="pyarrow") \
            .groupby("pb").map_groups(ss_bucket, batch_format="pandas") \
            .materialize()
        n_e, h_e = 0, 0
        for st in edges.map_batches(edge_stats, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            n_e += int(pc.sum(st.column("n")).as_py() or 0)
            h_e = (h_e + int(pc.sum(st.column("h")).as_py() or 0)) % (1 << 63)
        if debug:
            import time as _t
            print(f"[cc] round={rnd} edges={n_e} hash={h_e} "
                  f"t={_t.time():.1f}", flush=True)
        if prev == (n_e, h_e):
            break
        prev = (n_e, h_e)
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds")

    # converged star edges are (child, root); add the roots' self rows
    rows = [b for b in edges.iter_batches(batch_format="pyarrow")]
    if not rows:
        return pa.table({"key": pa.array([], pa.int64()),
                         "root": pa.array([], pa.int64())})
    t = pa.concat_tables(rows).combine_chunks()
    child = t.column("a").to_numpy(zero_copy_only=False)
    root = t.column("b").to_numpy(zero_copy_only=False)
    roots = np.setdiff1d(np.unique(root), child)
    keys = np.concatenate([child, roots])
    vals = np.concatenate([root, roots])
    order = np.argsort(keys)
    return pa.table({"key": pa.array(keys[order].astype(np.int64)),
                     "root": pa.array(vals[order].astype(np.int64))})


def dedup_survivors(source: Any, clusters: dict, key_col: str):
    """Filter a dataset down to cluster survivors (key == its root) —
    the 'per-group first' step of near-dup dedup, applied distributed
    with the (small) cluster map broadcast. Membership goes through a
    prebuilt CatalogIndex: ``pc.is_in`` rebuilds its hash set on every
    batch (round-1 measurement: 391 ms/batch vs 7 ms at 1.1M keys)."""
    from jsonschema_ray.functions.catalog import CatalogIndex

    losers = sorted(k for k, r in clusters.items() if k != r)
    src = as_source(source)
    if not losers:
        return src.dataset()
    idx = CatalogIndex(pa.array(losers))

    def keep(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return t.filter(pa.array(~idx.contains(col)))

    return src.dataset().map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(texts: np.ndarray, token_hash=hash64) -> np.ndarray:
    """64-bit simhash per text: sign of summed ±1 token-hash bits.
    Tokenization via Arrow ``utf8_split_whitespace`` (no per-row split).
    ``token_hash``: the 64-bit token hash — default is the fast pandas
    hash; pass ``sketches.md5_hash64`` for a DuckDB-reproducible
    fingerprint (oracle-checkable, vocab-memoized)."""
    counts, flat = _tokenize_flat(texts)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(len(texts), dtype=np.uint64)
    th = token_hash(flat)
    doc_idx = np.repeat(np.arange(len(texts)), counts)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1) \
        .astype(np.int32) * 2 - 1  # (tokens, 64) in {-1,+1}
    acc = np.zeros((len(texts), 64), dtype=np.int64)
    np.add.at(acc, doc_idx, bits)
    out = (acc > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64)


def simhash_dataset(source: Any, key_col: str, text_col: str = "text",
                    token_hash=hash64):
    """→ Dataset (key, simhash, chunk0..chunk3) — the four 16-bit chunks
    are the LSH buckets for Hamming-≤3 candidate search."""
    src = as_source(source)

    def add(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        s = simhash_batch(texts, token_hash=token_hash)
        cols = {key_col: t.column(key_col), "simhash": pa.array(s)}
        for c in range(4):
            cols[f"chunk{c}"] = pa.array(
                ((s >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32))
        return pa.table(cols)

    return src.dataset(columns=[key_col, text_col]).map_batches(
        add, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity self-join (no LSH prefilter)
# ---------------------------------------------------------------------------

def shingle_set_rows(source: Any, key_col: str, text_col: str = "text",
                     shingle_k: int = 3, n_buckets: int | None = None,
                     token_hash=hash64):
    """→ Dataset of per-doc DISTINCT word-k-shingle rows
    ``(key, shingle, n, bucket)`` where ``n`` is the doc's distinct
    shingle-set size (carried on every row so the pair join never needs
    a separate size lookup) and ``bucket = shingle mod n_buckets``.

    Because the bucket is a pure function of the shingle, every
    occurrence of a shingle lands in ONE bucket — so per-bucket document
    frequency equals global document frequency, and per-bucket joins see
    the complete posting list of each of their shingles.
    """
    import ray

    src = as_source(source)
    if n_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(16, 4 * cpus)
    nb = np.uint64(n_buckets)

    def to_rows(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        doc_idx, sh = _shingle_hashes(texts, shingle_k,
                                      token_hash=token_hash)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(sh) == 0:
            return pa.table({
                "key": keys.slice(0, 0), "shingle": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int32())})
        # per-doc distinct: lexsort by (doc, shingle), drop adjacent dups
        order = np.lexsort((sh, doc_idx))
        d, s = doc_idx[order], sh[order]
        first = np.empty(len(s), dtype=bool)
        first[0] = True
        first[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        d, s = d[first], s[first]
        n_of_doc = np.bincount(d, minlength=len(texts)).astype(np.int64)
        return pa.table({
            "key": keys.take(pa.array(d)),
            "shingle": pa.array(s.view(np.int64)),
            "n": pa.array(n_of_doc[d]),
            "bucket": pa.array((s % nb).astype(np.int32)),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        to_rows, batch_format="pyarrow")


def _pair_partition(df, n_parts: int) -> np.ndarray:
    """int32 partition id = 64-bit row hash of (key_a, key_b) mod
    ``n_parts`` — a pure function of the pair, so every partial of a
    pair lands in ONE partition and a per-partition pandas groupby is a
    complete global aggregate for its pairs."""
    import pandas as pd

    h = pd.util.hash_pandas_object(df[["key_a", "key_b"]],
                                   index=False).to_numpy()
    return (h % np.uint64(n_parts)).astype(np.int32)


def ngram_jaccard_pairs(source: Any, key_col: str, text_col: str = "text",
                        shingle_k: int = 3, threshold: float = 0.5,
                        n_buckets: int | None = None,
                        max_df: int | None = None, token_hash=hash64):
    """EXACT all-pairs n-gram Jaccard similarity self-join — the
    no-false-negative counterpart of ``minhash_verified_pairs`` (the
    reference ships only per-document predicates; this is the
    training-data near-dup mode over a corpus). → Dataset
    ``(key_a, key_b, n_common, jaccard)`` with ``jaccard >= threshold``.

    Distributed shape (inverted shingle index, NEVER a global
    cross-join):

    1. per-batch vectorized shingling → thin ``(key, shingle, n)`` rows
       (the text column never leaves stage 1);
    2. hash-bucket by shingle → per-bucket VECTORIZED pandas self-merge
       on the shingle column emits partial co-occurrence counts
       ``(key_a, key_b, n_a, n_b, i)`` — one Python call per bucket,
       not per shingle group;
    3. pair partials carry a PAIR-HASH partition column, so the global
       sum is one int32-keyed shuffle + a vectorized per-partition
       pandas groupby — NOT a multi-column ``aggregate(Sum)``, which
       sort-shuffles every key column and measured 280 s vs 4 s on a
       1.3M-partial / 1.1M-group corpus (sf0.1 documents);
    4. ``jaccard = i / (n_a + n_b - i)`` filter, streamed out.

    Work is sum over shingles of df² — exact-by-construction but
    quadratic in document frequency. ``max_df`` bounds it for degenerate
    corpora: shingles appearing in more than ``max_df`` docs are dropped
    from pairing (exactly computable per bucket, because a shingle's
    full posting list lives in one bucket). That loses only pairs whose
    ENTIRE overlap is ultra-common shingles; leave ``None`` for strict
    exactness. The real scale upgrade is prefix filtering (PPJoin):
    order each doc's shingles by global df and index only the first
    ``n - ceil(t*n) + 1`` — same bucket layout, fewer rows.
    """
    import pandas as pd
    import ray

    rows = shingle_set_rows(source, key_col, text_col, shingle_k,
                            n_buckets, token_hash=token_hash)
    if n_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(16, 4 * cpus)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        kd = g["key"].dtype  # typed empties: no object-dtype blocks
        empty_pairs = pd.DataFrame({
            "key_a": pd.Series([], dtype=kd),
            "key_b": pd.Series([], dtype=kd),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
            "i": pd.Series([], dtype=np.int64),
            "pb": pd.Series([], dtype=np.int32)})
        g = g[["key", "shingle", "n"]]
        if max_df is not None:
            df_of = g["shingle"].map(g["shingle"].value_counts())
            g = g[df_of <= max_df]
        if len(g) < 2:
            return empty_pairs
        m = g.merge(g, on="shingle", suffixes=("_a", "_b"))
        m = m[m["key_a"] < m["key_b"]]
        if not len(m):
            return empty_pairs
        part = m.groupby(["key_a", "key_b", "n_a", "n_b"], sort=False) \
            .size().reset_index(name="i")
        part["i"] = part["i"].astype(np.int64)
        part["pb"] = _pair_partition(part, n_buckets)
        return part

    partials = rows.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas")

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["key_a", "key_b", "n_a", "n_b"], sort=False)["i"] \
            .sum().reset_index(name="n_common")
        out["n_common"] = out["n_common"].astype(np.int64)
        return out

    agg = partials.groupby("pb").map_groups(sum_pairs,
                                            batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
            "n_common": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())})
        if t.num_rows == 0 or t.num_columns == 0:  # empty-group blocks
            return empty
        i = t.column("n_common").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        nb_ = t.column("n_b").to_numpy(zero_copy_only=False)
        j = i / (na + nb_ - i)
        keep = j >= threshold
        if not keep.any():
            return empty
        # np.round == Python round (half-to-even); matches the oracle in
        # practice (same convention as verify_jaccard, driver-green)
        return pa.table({
            "key_a": t.column("key_a").filter(pa.array(keep)),
            "key_b": t.column("key_b").filter(pa.array(keep)),
            "n_common": pa.array(i[keep].astype(np.int64)),
            "jaccard": pa.array(np.round(j[keep], 4)),
        })

    # NOTE: Ray drops zero-row blocks, so a corpus with NO qualifying
    # pairs collapses to a schemaless empty dataset — use
    # ``ngram_jaccard_table`` when a stable schema matters.
    return agg.map_batches(finish, batch_format="pyarrow")


def ngram_jaccard_table(source: Any, key_col: str, **kw) -> pa.Table:
    """``ngram_jaccard_pairs`` materialized to an Arrow table with the
    canonical (int64, int64, int64, float64) schema even when empty."""
    ds = ngram_jaccard_pairs(source, key_col, **kw)
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    empty = pa.table({"key_a": pa.array([], pa.int64()),
                      "key_b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if not batches:
        return empty
    return pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in batches]).combine_chunks()


def ngram_prefix_candidates(source: Any, key_col: str,
                            text_col: str = "text", shingle_k: int = 3,
                            threshold: float = 0.5,
                            n_buckets: int | None = None,
                            token_hash=hash64):
    """PPJoin-style prefix-filtered candidate pairs — the SCALE path of
    the exact n-gram Jaccard join, with NO false negatives.

    Prefix-filter theorem: order every doc's shingle set by a global
    canonical order (ascending document frequency, then shingle value);
    if J(A, B) >= t then |A∩B| >= ceil(t·max(|A|,|B|)), and the two
    PREFIXES — the first ``n - ceil(t·n) + 1`` shingles of each doc —
    must share at least one shingle. Only prefix shingles are indexed,
    so the pair-expansion work drops from Σ df² over ALL shingles to Σ
    df'² over prefix postings (rare shingles first ⇒ tiny df').

    Three thin shuffles, all on (key, shingle, n) rows, never text:
      1. bucket by shingle → attach EXACT global df (a shingle's whole
         posting list lives in one bucket, so per-bucket df is global);
      2. bucket by doc → vectorized per-doc prefix selection;
      3. bucket prefix rows by shingle → vectorized pair expansion,
         then a distinct-pair groupby.

    Measured (sf0.1 documents, 5k docs, 32 cpus): 35 s vs the plain
    inverted index's 11 s — the three extra thin shuffles only pay off
    when Σ df² explodes (common-shingle-heavy corpora; see
    ``test_prefix_filter_prunes_candidates`` for a corpus where the
    candidate set shrinks 4×+). Prefer ``ngram_jaccard_pairs`` until
    profiling shows pair expansion dominating.
    """
    import pandas as pd
    import ray

    rows = shingle_set_rows(source, key_col, text_col, shingle_k,
                            n_buckets, token_hash=token_hash)
    if n_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(16, 4 * cpus)

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            df=g.groupby("shingle")["shingle"].transform("size")
            .astype(np.int64),
            kbucket=(g["key"].to_numpy().astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15) % np.uint64(n_buckets))
            .astype(np.int32))
        return g[["key", "shingle", "n", "df", "kbucket"]]

    with_df = rows.groupby("bucket").map_groups(
        attach_df, batch_format="pandas")

    def prefix_of_docs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-doc prefix: sort by (key, df, shingle), keep
        # the first n - ceil(t*n) + 1 rows of each key
        g = g.sort_values(["key", "df", "shingle"], kind="mergesort")
        n = g["n"].to_numpy()
        # epsilon-DOWN before ceil: float error in t*n may round a true
        # integer product up (0.3*10 → 3.0000000000000004 → ceil 4),
        # shortening the prefix and losing pairs; erring low only makes
        # the prefix longer (more candidates, still exact)
        p = n - np.ceil(threshold * n - 1e-9).astype(np.int64) + 1
        rank = g.groupby("key").cumcount().to_numpy()
        out = g.loc[rank < p, ["key", "shingle", "n"]]
        return out.assign(bucket=(out["shingle"].to_numpy()
                                  .astype(np.uint64)
                                  % np.uint64(n_buckets)).astype(np.int32))

    prefixes = with_df.groupby("kbucket").map_groups(
        prefix_of_docs, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        kd = g["key"].dtype
        m = g[["key", "shingle"]].merge(g[["key", "shingle"]],
                                        on="shingle",
                                        suffixes=("_a", "_b"))
        m = m[m["key_a"] < m["key_b"]][["key_a", "key_b"]]
        if not len(m):
            return pd.DataFrame({"key_a": pd.Series([], dtype=kd),
                                 "key_b": pd.Series([], dtype=kd),
                                 "pb": pd.Series([], dtype=np.int32)})
        m = m.drop_duplicates()
        return m.assign(pb=_pair_partition(m, n_buckets))

    cand = prefixes.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas")

    # global distinct via one int32-keyed shuffle (pair-hash partition),
    # NOT a two-column aggregate — see ngram_jaccard_pairs step 3
    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g[["key_a", "key_b"]].drop_duplicates()

    return cand.groupby("pb").map_groups(distinct_pairs,
                                         batch_format="pandas")


def ngram_jaccard_prefix_pairs(source: Any, key_col: str,
                               text_col: str = "text", shingle_k: int = 3,
                               threshold: float = 0.5,
                               n_buckets: int | None = None,
                               token_hash=hash64,
                               broadcast_max_pairs: int | None = None
                               ) -> pa.Table:
    """Exact n-gram Jaccard join via PPJoin prefix filtering: candidate
    pairs from ``ngram_prefix_candidates`` (no false negatives), exact
    verification via the shared broadcast-texts verifier. Returns the
    SAME result set as ``ngram_jaccard_pairs`` — (key_a, key_b,
    n_common, jaccard) — at a fraction of the pair-expansion work on
    corpora with common shingles."""
    cand = ngram_prefix_candidates(source, key_col, text_col, shingle_k,
                                   threshold, n_buckets,
                                   token_hash=token_hash).materialize()
    return _verify_candidate_pairs(source, key_col, text_col, cand,
                                   shingle_k, threshold, with_counts=True,
                                   broadcast_max_pairs=broadcast_max_pairs)


def boilerplate_ngram_stats(source: Any, key_col: str = "doc_id",
                            text_col: str = "text", shingle_k: int = 3,
                            min_docs: int = 10,
                            max_ngrams: int = 1_000_000,
                            token_hash=hash64):
    """Cross-document boilerplate scrub signal (the MassiveText/Gopher
    repeated-passage heuristic): word ``shingle_k``-grams appearing in
    ≥ ``min_docs`` DISTINCT documents form the boilerplate set; each
    document reports its total k-gram instances and how many hit it
    (the filtering signal upstream quality gates consume).

    Scale shape: pass 1 collapses per-batch distinct (shingle, doc)
    pairs to (shingle_hash, n_docs) partials, merges them with a
    DISTRIBUTED ``groupby.sum``, thresholds, and caps the broadcast
    set at ``max_ngrams`` by (doc-count desc, hash asc) via a
    distributed sort+limit — the driver never holds more than the cap.
    Pass 2 streams the corpus once against the broadcast sorted-hash
    array (searchsorted per batch; no shuffle, no join).

    → Dataset (key, n_grams, n_boiler) for EVERY document. With
    ``token_hash=md5_hash64`` the whole operator re-derives bit-exact
    in DuckDB (same FNV rolling chain as MinHash/decontaminate)."""
    import ray
    import ray.data as rd

    src = as_source(source)

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        if not len(h):
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        z = np.empty(len(d), dtype=[("h", np.uint64), ("d", np.int64)])
        z["h"], z["d"] = h, d
        uz = np.unique(z)                       # distinct (shingle, doc)
        hh, nn = np.unique(uz["h"], return_counts=True)
        # int64 BIT-CAST: Ray's shuffle cannot round-trip uint64 values
        # above 2^63 (they fall back to Python objects and crash Arrow
        # re-inference); the view is order-consistent on both sides
        return pa.table({"h": pa.array(hh.view(np.int64)),
                         "n": pa.array(nn.astype(np.int64))})

    parts = src.dataset(columns=[text_col]).map_batches(
        partial, batch_format="pyarrow")
    from jsonschema_ray.stages.hashagg import hash_group_agg

    counts = hash_group_agg(parts, "h", {"sum(n)": ("n", "sum")})

    def threshold(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("sum(n)"), min_docs)
        return t.filter(keep)

    boiler_ds = counts.map_batches(threshold,
                                   batch_format="pyarrow").materialize()
    if boiler_ds.count() > max_ngrams:
        boiler_ds = boiler_ds.sort(["sum(n)", "h"],
                                   descending=[True, False]) \
            .limit(max_ngrams)
    hs: list = []
    for b in boiler_ds.iter_batches(batch_format="pyarrow"):
        hs.append(b.column("h").to_numpy(zero_copy_only=False))
    boiler = np.sort(np.concatenate(hs)) if hs \
        else np.empty(0, np.int64)
    boiler_ref = ray.put(boiler)

    def flag(t: pa.Table) -> pa.Table:
        bs = ray.get(boiler_ref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        total = np.bincount(d, minlength=t.num_rows) if len(d) \
            else np.zeros(t.num_rows, np.int64)
        if len(h) and len(bs):
            h64 = h.view(np.int64)              # same bit-cast as pass 1
            idx = np.searchsorted(bs, h64)
            hit = (idx < len(bs)) \
                & (bs[np.minimum(idx, len(bs) - 1)] == h64)
            nb = np.bincount(d[hit], minlength=t.num_rows)
        else:
            nb = np.zeros(t.num_rows, np.int64)
        return pa.table({
            key_col: t.column(key_col),
            "n_grams": pa.array(total.astype(np.int64)),
            "n_boiler": pa.array(nb.astype(np.int64)),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        flag, batch_format="pyarrow")


def decontaminate(source: Any, benchmark_texts, key_col: str = "doc_id",
                  text_col: str = "text", shingle_k: int = 5,
                  token_hash=hash64):
    """Benchmark decontamination: flag corpus documents sharing any
    word-``shingle_k``-gram with a benchmark/test set — the standard
    train/test-overlap scrub in large-scale pipeline curation (exact
    n-gram variant; the shingle hash chain is the same FNV rolling
    combine as MinHash, so with ``token_hash=md5_hash64`` the whole
    operator re-derives bit-exactly in DuckDB).

    The benchmark is SMALL by definition (a test set): its distinct
    shingle hashes are computed driver-side and broadcast ONCE via
    ``ray.put`` (sorted array → ``searchsorted`` per batch); the corpus
    streams through ``map_batches`` — no shuffle, no pairwise join.

    → Dataset (key, n_contaminated) for flagged documents only, where
    ``n_contaminated`` counts the doc's shingle INSTANCES that hit the
    benchmark set."""
    import ray

    texts = np.asarray(benchmark_texts, dtype=object)
    _, bh = _shingle_hashes(texts, shingle_k, token_hash=token_hash)
    bench = np.unique(bh)
    bench_ref = ray.put(bench)

    src = as_source(source)

    def flag(t: pa.Table) -> pa.Table:
        bs = ray.get(bench_ref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not len(h) or not len(bs):
            return pa.table({key_col: keys.slice(0, 0),
                             "n_contaminated": pa.array([], pa.int64())})
        idx = np.searchsorted(bs, h)
        hit = (idx < len(bs)) & (bs[np.minimum(idx, len(bs) - 1)] == h)
        n = np.bincount(d[hit], minlength=t.num_rows)
        sel = np.flatnonzero(n > 0)
        return pa.table({
            key_col: keys.take(pa.array(sel)),
            "n_contaminated": pa.array(n[sel].astype(np.int64)),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        flag, batch_format="pyarrow")


# Bloom bit-position hash constants: public splitmix64/xxhash64 mixing
# primes (same family as the count-min row hashes) — fixed, SQL-replicable
_BLOOM_A = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
            0x165667B19E3779F9, 0x27D4EB2F165667C5)
_BLOOM_B = (1, 3, 5, 7)


def bloom_decontaminate(source: Any, benchmark_source: Any,
                        key_col: str = "doc_id", text_col: str = "text",
                        shingle_k: int = 5, n_bits: int = 1 << 16,
                        depth: int = 4, token_hash=hash64):
    """Benchmark decontamination through a BLOOM FILTER — the
    fixed-memory variant of :func:`decontaminate` for when the
    benchmark itself is large (full held-out-suite scrubs): instead of
    broadcasting the exact benchmark shingle-hash set (O(benchmark)),
    both sides agree on a ``n_bits`` filter, so the broadcast is a
    constant 2^16 bits regardless of benchmark size.

    Build side is DISTRIBUTED: the benchmark streams through
    ``map_batches`` emitting each block's distinct bit positions
    (≤ ``n_bits`` rows/block); one distributed distinct bounds the
    driver pull at ``n_bits`` int32s no matter how big the benchmark.
    Scan side: broadcast bit array via ``ray.put``, corpus streams
    once, a shingle instance is flagged iff all ``depth`` positions
    are set. Counts INCLUDE Bloom false positives — deterministically,
    so with ``token_hash=md5_hash64`` the whole operator (FNV shingle
    chain + multiply-shift bit positions) re-derives bit-exactly in
    DuckDB.

    → Dataset (key, n_flagged) for documents with ≥1 flagged shingle
    instance."""
    import ray

    if depth > len(_BLOOM_A):
        raise ValueError(f"depth <= {len(_BLOOM_A)} supported")
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    a = np.array(_BLOOM_A[:depth], np.uint64)
    b = np.array(_BLOOM_B[:depth], np.uint64)
    shift = np.uint64(64 - (n_bits.bit_length() - 1))

    def positions(h: np.ndarray) -> np.ndarray:
        """(len(h), depth) int64 bit positions (multiply-shift)."""
        with np.errstate(over="ignore"):
            return np.stack(
                [((h * a[i] + b[i]) >> shift).astype(np.int64)
                 for i in range(depth)], axis=1)

    def bench_partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        pos = np.unique(positions(h)) if len(h) \
            else np.empty(0, np.int64)
        return pa.table({"pos": pa.array(pos, pa.int32())})

    bench_ds = as_source(benchmark_source).dataset(columns=[text_col]) \
        .map_batches(bench_partial, batch_format="pyarrow")
    bits = np.zeros(n_bits, dtype=bool)
    set_pos = bench_ds.unique("pos")           # ≤ n_bits rows by design
    if set_pos:
        bits[np.asarray(set_pos, dtype=np.int64)] = True
    bits_ref = ray.put(bits)

    def flag(t: pa.Table) -> pa.Table:
        bv = ray.get(bits_ref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not len(h):
            return pa.table({key_col: keys.slice(0, 0),
                             "n_flagged": pa.array([], pa.int64())})
        hit = bv[positions(h)].all(axis=1)
        n = np.bincount(d[hit], minlength=t.num_rows)
        sel = np.flatnonzero(n > 0)
        return pa.table({
            key_col: keys.take(pa.array(sel)),
            "n_flagged": pa.array(n[sel].astype(np.int64)),
        })

    return as_source(source).dataset(columns=[key_col, text_col]) \
        .map_batches(flag, batch_format="pyarrow")


def repeated_substrings(source: Any, key_col: str = "doc_id",
                        text_col: str = "text", shingle_k: int = 3,
                        min_docs: int = 2, max_ngrams: int = 1_000_000,
                        token_hash=hash64):
    """Cross-document repeated-PASSAGE spans (the ExactSubstr dedup
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", bounded to word ``shingle_k``-gram resolution):
    for every document, the maximal token spans all of whose k-grams
    also occur in ≥ ``min_docs`` distinct documents — the spans an
    ExactSubstr pass would cut.

    Scale shape = :func:`boilerplate_ngram_stats`' two passes (distinct
    (shingle, doc) partials → distributed ``groupby.sum`` → threshold →
    capped broadcast of the repeated-hash set), plus a vectorized
    gaps-and-islands merge of hit positions into maximal spans inside
    pass 2 — still zero shuffle of the text, one row per emitted span.

    → (key, start_tok, end_tok, n_shingles): token-index span
    [start_tok, end_tok) with ``end_tok = last_shingle + shingle_k``.
    With ``token_hash=md5_hash64`` bit-exact in SQL (FNV chain +
    window-function islands)."""
    import ray

    src = as_source(source)
    rep_ref = ray.put(_repeated_shingle_set(
        src, text_col, shingle_k, min_docs, max_ngrams, token_hash))

    def spans(t: pa.Table) -> pa.Table:
        bs = ray.get(rep_ref)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kv = keys.to_numpy(zero_copy_only=False)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        empty = pa.table({key_col: keys.slice(0, 0),
                          "start_tok": pa.array([], pa.int64()),
                          "end_tok": pa.array([], pa.int64()),
                          "n_shingles": pa.array([], pa.int64())})
        if not len(h) or not len(bs):
            return empty
        # within-doc shingle position: valid shingles are consecutive
        # token starts, so rank-within-doc over the flat stream IS the
        # 0-based token index of the shingle start
        idx = np.arange(len(d))
        first = np.r_[True, d[1:] != d[:-1]]
        runlen = np.diff(np.r_[idx[first], len(d)])
        r = idx - np.repeat(idx[first], runlen)
        h64 = h.view(np.int64)
        pos = np.searchsorted(bs, h64)
        hit = (pos < len(bs)) & (bs[np.minimum(pos, len(bs) - 1)] == h64)
        if not hit.any():
            return empty
        hd, hr = d[hit], r[hit]
        new = np.r_[True, (hd[1:] != hd[:-1]) | (hr[1:] != hr[:-1] + 1)]
        gid = np.cumsum(new) - 1
        starts = hr[new]
        ends = hr[np.r_[new[1:], True]] + shingle_k
        nsh = np.bincount(gid)
        docs = hd[new]
        return pa.table({
            key_col: keys.take(pa.array(docs)),
            "start_tok": pa.array(starts.astype(np.int64)),
            "end_tok": pa.array(ends.astype(np.int64)),
            "n_shingles": pa.array(nsh.astype(np.int64))})

    return src.dataset(columns=[key_col, text_col]).map_batches(
        spans, batch_format="pyarrow")


def _repeated_shingle_set(src, text_col: str, shingle_k: int,
                          min_docs: int, max_ngrams: int,
                          token_hash) -> np.ndarray:
    """Pass 1 shared by :func:`repeated_substrings` and
    :func:`repeated_substring_scrub`: distinct (shingle, doc) partials
    per batch → distributed ``groupby.sum`` of doc counts → threshold
    at ``min_docs`` distinct docs → capped broadcast set. Returns the
    SORTED int64 bit-cast hash array (the driver never holds more than
    ``max_ngrams`` hashes)."""

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d, h = _shingle_hashes(col.to_numpy(zero_copy_only=False),
                               shingle_k, token_hash=token_hash)
        if not len(h):
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        z = np.empty(len(d), dtype=[("h", np.uint64), ("d", np.int64)])
        z["h"], z["d"] = h, d
        uz = np.unique(z)
        hh, nn = np.unique(uz["h"], return_counts=True)
        # int64 bit-cast: Ray's shuffle cannot round-trip uint64 > 2^63
        return pa.table({"h": pa.array(hh.view(np.int64)),
                         "n": pa.array(nn.astype(np.int64))})

    from jsonschema_ray.stages.hashagg import hash_group_agg

    counts = hash_group_agg(
        src.dataset(columns=[text_col]).map_batches(
            partial, batch_format="pyarrow"), "h", {"sum(n)": ("n", "sum")})
    rep_ds = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("sum(n)"), min_docs)),
        batch_format="pyarrow").materialize()
    if rep_ds.count() > max_ngrams:
        rep_ds = rep_ds.sort(["sum(n)", "h"],
                             descending=[True, False]).limit(max_ngrams)
    hs = [b.column("h").to_numpy(zero_copy_only=False)
          for b in rep_ds.iter_batches(batch_format="pyarrow")]
    return np.sort(np.concatenate(hs)) if hs else np.empty(0, np.int64)


def repeated_substring_scrub(source: Any, key_col: str = "doc_id",
                             text_col: str = "text", shingle_k: int = 3,
                             min_docs: int = 2,
                             max_ngrams: int = 1_000_000,
                             token_hash=hash64):
    """The REMOVAL half of ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    bounded to word ``shingle_k``-gram resolution): every token
    covered by a k-gram that occurs in ≥ ``min_docs`` distinct
    documents is cut, and the document re-renders from the surviving
    tokens — :func:`repeated_substrings` reports the spans, this
    operator applies them.

    Scale shape: pass 1 = :func:`_repeated_shingle_set` (thin
    (hash, count) partials, one small groupby, capped broadcast set —
    the text never shuffles); pass 2 streams the corpus once,
    coverage is a delta-array cumsum over the flat token stream
    (hit at flat position p covers p..p+k-1; all within one doc by
    shingle validity), and the scrubbed text rebuilds with one
    ``ListArray`` + ``binary_join`` per block. Zero shuffle, block
    local, per-batch vectorized.

    → one row per input document:
    (key, n_tokens, n_removed, text_scrubbed) where ``text_scrubbed``
    is the single-space join of surviving tokens ('' when everything
    was cut or the doc had no tokens — note the output is whitespace-
    NORMALIZED even for untouched docs, matching the SQL oracle's
    ``string_agg`` semantics). With ``token_hash=md5_hash64``
    bit-exact in DuckDB."""
    import ray

    src = as_source(source)
    rep_ref = ray.put(_repeated_shingle_set(
        src, text_col, shingle_k, min_docs, max_ngrams, token_hash))

    def scrub(t: pa.Table) -> pa.Table:
        bs = ray.get(rep_ref)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts, flat = _tokenize_flat(col)
        n_docs, n_tok = len(counts), len(flat)
        doc_of_tok = np.repeat(np.arange(n_docs), counts)
        th = token_hash(flat) if n_tok else np.empty(0, np.uint64)
        covered = np.zeros(n_tok, dtype=bool)
        if n_tok and len(bs):
            acc, valid = _rolling_shingles(doc_of_tok, th, shingle_k)
            h64 = acc[valid].view(np.int64)
            fpos = np.flatnonzero(valid)
            pos = np.searchsorted(bs, h64)
            hit = (pos < len(bs)) & (bs[np.minimum(pos, len(bs) - 1)] == h64)
            if hit.any():
                # delta/cumsum coverage: +1 at each hit start, -1 past
                # its end; >0 after cumsum = token is inside some hit
                delta = np.zeros(n_tok + 1, dtype=np.int64)
                starts = fpos[hit]
                np.add.at(delta, starts, 1)
                np.add.at(delta, np.minimum(starts + shingle_k, n_tok), -1)
                covered = np.cumsum(delta[:-1]) > 0
        kept = ~covered
        kept_counts = (np.bincount(doc_of_tok[kept], minlength=n_docs)
                       if n_tok else np.zeros(n_docs, np.int64))
        offsets = np.concatenate(
            [[0], np.cumsum(kept_counts)]).astype(np.int64)
        flat_pa = flat if isinstance(flat, pa.Array) \
            else pa.array(flat, pa.string())
        kept_flat = flat_pa.filter(pa.array(kept)) if n_tok \
            else pa.array([], pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_flat)
        rendered = pc.binary_join(lists, " ")
        return pa.table({
            key_col: keys,
            "n_tokens": pa.array(counts.astype(np.int64)),
            "n_removed": pa.array(
                (counts - kept_counts).astype(np.int64)),
            "text_scrubbed": rendered})

    return src.dataset(columns=[key_col, text_col]).map_batches(
        scrub, batch_format="pyarrow")


def passage_dedup(source, key_col: str = "doc_id", text_col: str = "text",
                  passage_tokens: int = 10, num_buckets: int | None = None):
    """Exact passage-level dedup (RefinedWeb/CCNet-style boilerplate
    stripping): split every document into disjoint ``passage_tokens``-
    token passages, keep each distinct passage ONLY at its globally
    first occurrence (ordered by (doc_id, passage_idx)), and rebuild
    each document from its surviving passages.

    → Dataset ``(doc_id, n_kept, clean_text)`` — documents whose every
    passage was seen earlier elsewhere disappear entirely (their text
    is fully boilerplate), matching the SQL ``rn = 1`` semantics.

    Scale shape: pass 1 reuses the vectorized ``chunk_documents``
    kernel; the first-occurrence choice is a ``groupby(passage)`` with
    block-level (passage → min order-key) combiners, so the ONE
    all-to-all shuffle carries each block's distinct passages once —
    grouping is by the passage TEXT itself (exact; the hash64+
    collision-audit trick of ``exact_dedup_summary`` is the drop-in
    when passages are long). Reassembly buckets survivors by
    ``doc_id % B`` and merges each bucket vectorized in pandas (the
    ``_dup_clusters_star`` pattern — never one group per document).
    Order keys pack (doc_id, passage_idx) into one int64 as
    ``doc_id * 2^20 + idx`` (valid for doc_id < 2^43 ≈ 8·10^12 and
    < 2^20 passages/doc — both documented bounds, asserted)."""
    import pandas as pd
    import ray

    from jsonschema_ray.pipelines.textops import chunk_documents
    from ray.data.aggregate import Min

    MAXC = 1 << 20
    chunks = chunk_documents(source, key_col, text_col,
                             chunk_tokens=passage_tokens)

    def pack(t: pa.Table) -> pa.Table:
        doc = t.column(key_col).to_numpy()
        idx = t.column("chunk_idx").to_numpy()
        if len(doc) and (doc.max() >= (1 << 43) or idx.max() >= MAXC):
            raise ValueError("passage_dedup order-key bounds exceeded")
        okey = doc * MAXC + idx
        base = pa.table({"passage": t.column("chunk"),
                         "okey": pa.array(okey.astype(np.int64))})
        # block-level combiner: one row per distinct passage per block
        return base.group_by("passage").aggregate([("okey", "min")]) \
            .rename_columns(["passage", "okey"])

    from jsonschema_ray.stages.hashagg import hash_group_agg

    survivors = hash_group_agg(
        chunks.map_batches(pack, batch_format="pyarrow"),
        "passage", {"okey": ("okey", "min")})

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = num_buckets or max(2, min(64, cpus))

    def bucket(t: pa.Table) -> pa.Table:
        okey = t.column("okey").to_numpy()
        doc = okey // MAXC
        return pa.table({
            "pb": pa.array((doc % nb).astype(np.int64)),
            "doc_id": pa.array(doc.astype(np.int64)),
            "pidx": pa.array((okey % MAXC).astype(np.int64)),
            "passage": t.column("passage")})

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pidx"], kind="stable")
        out = g.groupby("doc_id", as_index=False).agg(
            n_kept=("pidx", "size"), clean_text=("passage", " ".join))
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out[["doc_id", "n_kept", "clean_text"]]

    return survivors.map_batches(bucket, batch_format="pyarrow") \
        .groupby("pb").map_groups(reassemble, batch_format="pandas")
