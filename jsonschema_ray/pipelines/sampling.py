"""Deterministic sampling / dataset splitting for training pipelines.

Both operators key on a HASH of a stable id column, so they are
reproducible across runs, cluster sizes, and block layouts — unlike
``Dataset.random_sample`` (per-block RNG) or reservoir sampling
(order-dependent). With ``hash_fn="md5"`` the assignment is bit-exactly
re-derivable in DuckDB (``md5_number_lower``), which is how the driver
oracle checks it.

The reference engine has no corpus-level sampling (it validates one
document at a time); these are the training-data operators the brief
adds on top (sampling row of SURVEY.md §2.6 covers the driver-sample
k-means used by IVF).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pyarrow as pa

from jsonschema_ray.functions.sketches import hash64, md5_hash64
from jsonschema_ray.raycompat import NULL_GROUP_KEY
from jsonschema_ray.sources.readers import as_source

from pandas import isnull as _isnull


def _bucket_of(keys: pa.Array, n_buckets: int, hash_fn: str) -> np.ndarray:
    vals = keys.to_numpy(zero_copy_only=False)
    hf = md5_hash64 if hash_fn == "md5" else hash64
    h = hf(vals.astype(object) if vals.dtype == object else vals)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def hash_split(source: Any, key_col: str,
               splits: Sequence[tuple[str, int]] = (
                   ("train", 80), ("val", 10), ("test", 10)),
               n_buckets: int = 100, hash_fn: str = "md5",
               columns: Sequence[str] | None = None):
    """Deterministic train/val/test assignment: bucket = hash(key) mod
    ``n_buckets``; consecutive bucket ranges map to the named splits
    (weights must sum to ``n_buckets``). → Dataset with ``bucket`` and
    ``split`` columns appended. Stable under re-runs, resharding, and
    cluster growth — the property a 100 TB corpus split must have, so
    a re-ingested document never migrates between train and test."""
    if sum(w for _, w in splits) != n_buckets:
        raise ValueError("split weights must sum to n_buckets")
    names, weights = zip(*splits)
    bounds = np.cumsum([0] + list(weights))
    src = as_source(source)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _bucket_of(keys, n_buckets, hash_fn)
        lab = np.array(names, dtype=object)[
            np.searchsorted(bounds, b, side="right") - 1]
        return t.append_column("bucket", pa.array(b)) \
            .append_column("split", pa.array(lab, pa.string()))

    cols = list(columns) if columns else [key_col]
    return src.dataset(columns=cols).map_batches(
        assign, batch_format="pyarrow")


def hash_sample(source: Any, key_col: str, rate: float,
                n_buckets: int = 1_000_000, hash_fn: str = "md5",
                columns: Sequence[str] | None = None):
    """Deterministic Bernoulli-by-hash sample: keep a row iff
    hash(key) mod ``n_buckets`` < rate * n_buckets. Unlike
    ``Dataset.random_sample`` the choice is a pure function of the key:
    re-runs, retries, and different block layouts sample the SAME rows,
    and a join of two hash-samples of related tables stays consistent
    when they share the key."""
    cut = int(rate * n_buckets)
    src = as_source(source)

    def pick(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _bucket_of(keys, n_buckets, hash_fn)
        return t.filter(pa.array(b < cut))

    cols = list(columns) if columns else None
    return src.dataset(columns=cols).map_batches(
        pick, batch_format="pyarrow")


def stratified_hash_sample(source: Any, key_col: str, strata_col: str,
                           rates: dict, default_rate: float = 0.0,
                           n_buckets: int = 1_000_000,
                           hash_fn: str = "md5",
                           columns: Sequence[str] | None = None):
    """Per-stratum deterministic sampling: keep a row iff
    hash(key) mod n_buckets < rate[stratum] * n_buckets — the
    language-/source-balancing resample of a training corpus, without
    a shuffle (pure per-batch filter) and reproducible by construction.
    Unknown strata fall back to ``default_rate``."""
    cuts = {k: int(v * n_buckets) for k, v in rates.items()}
    dflt = int(default_rate * n_buckets)
    src = as_source(source)

    def pick(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _bucket_of(keys, n_buckets, hash_fn)
        strata = t.column(strata_col).to_numpy(zero_copy_only=False) \
            .astype(object)
        strata[_isnull(strata)] = NULL_GROUP_KEY  # null stratum → default
        # rate lookup bounded by DISTINCT strata (languages/sources),
        # scattered back vectorized — never a per-row dict probe
        uniq, inv = np.unique(strata, return_inverse=True)
        cut = np.array([cuts.get(u, dflt) for u in uniq],
                       dtype=np.int64)[inv]
        return t.filter(pa.array(b < cut))

    cols = sorted({key_col, strata_col} | set(columns or []))
    return src.dataset(columns=cols).map_batches(
        pick, batch_format="pyarrow")


def weighted_hash_sample(source: Any, key_col: str, weight_col: str,
                         rate_per_unit: float, hash_fn: str = "md5",
                         columns: Sequence[str] | None = None):
    """Weight-proportional deterministic Bernoulli sample: keep a row
    iff ``hash(key) // weight < C`` with ``C = floor(rate_per_unit ·
    2^64)`` — pure uint64 arithmetic, so for positive integer weights
    the inclusion probability is EXACTLY ``min(1, weight · C / 2^64)``
    ≈ ``weight · rate_per_unit`` (longer documents proportionally more
    likely, the standard token-budget corpus subsample), while staying
    a pure function of the key: reproducible across re-runs, block
    layouts, and cluster sizes, with zero shuffle (per-batch filter).

    Rows with ``weight <= 0`` or null are never kept.  With the
    default ``hash_fn="md5"`` the decision is bit-exactly re-derivable
    in DuckDB (``md5_number_lower(key) // CAST(w AS UBIGINT) < C``) —
    no floating-point ``u^(1/w)`` key whose libm rounding could
    diverge cross-engine."""
    if not (0.0 < rate_per_unit <= 1.0):
        raise ValueError("rate_per_unit must be in (0, 1]")
    cut = np.uint64(int(rate_per_unit * (1 << 64)))
    src = as_source(source)

    def pick(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = keys.to_numpy(zero_copy_only=False)
        hf = md5_hash64 if hash_fn == "md5" else hash64
        h = hf(vals.astype(object) if vals.dtype == object else vals)
        warr = t.column(weight_col)
        if isinstance(warr, pa.ChunkedArray):
            warr = warr.combine_chunks()
        w = warr.to_numpy(zero_copy_only=False)
        ok = np.ones(len(w), dtype=bool)
        if warr.null_count:
            ok &= warr.is_valid().to_numpy(zero_copy_only=False)
            w = np.where(ok, w, 1)
        ok &= w > 0
        wq = np.where(ok, w, 1).astype(np.uint64)
        keep = ok & ((h // wq) < cut)
        return t.filter(pa.array(keep))

    cols = sorted({key_col, weight_col} | set(columns or []))
    return src.dataset(columns=cols).map_batches(
        pick, batch_format="pyarrow")


def rebalance_sources(source: Any, key_col: str, strata_col: str,
                      n_buckets: int = 1_000_000, hash_fn: str = "md5",
                      columns: Sequence[str] | None = None):
    """Source-mix rebalancing: downsample every stratum (source,
    language, domain …) to the size of the SMALLEST one, producing a
    uniform mix — the two-pass feedback loop of corpus curation:

    1. per-stratum counts via distributed ``groupby(strata).count()``
       (strata are low-cardinality by definition — the driver holds one
       row per source, never per document);
    2. derive a deterministic rate ``ppm_s = floor(1e6·min_count/c_s)``
       per stratum and keep a row iff ``hash(key) mod 1e6 < ppm_s`` —
       a pure per-batch filter, zero shuffle of the data itself,
       reproducible across re-runs and cluster sizes.

    With ``hash_fn="md5"`` the decision is bit-exactly re-derivable in
    DuckDB (``md5_number_lower``). → rows of the kept sample with a
    ``rate_ppm`` column appended.
    """
    src = as_source(source)

    def fill_strata(t: pa.Table) -> pa.Table:
        col = t.column(strata_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # see raycompat.NULL_GROUP_KEY: a null group key crashes Ray's
        # sort shuffle; nulls form their own stratum under the sentinel
        return t.set_column(t.schema.get_field_index(strata_col),
                            strata_col, col.fill_null(NULL_GROUP_KEY))

    cnt_rows = src.dataset(columns=[strata_col]) \
        .map_batches(fill_strata, batch_format="pyarrow") \
        .groupby(strata_col).count().take_all()
    counts = {r[strata_col]: int(r["count()"]) for r in cnt_rows}
    if not counts:
        raise ValueError("empty input: no strata to rebalance")
    m = min(counts.values())
    cuts = {s: int(np.floor(n_buckets * (m / c)))
            for s, c in counts.items()}

    def pick(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = _bucket_of(keys, n_buckets, hash_fn)
        strata = t.column(strata_col).to_numpy(zero_copy_only=False) \
            .astype(object)
        strata[_isnull(strata)] = NULL_GROUP_KEY  # matches the count pass
        uniq, inv = np.unique(strata, return_inverse=True)
        cut = np.array([cuts.get(u, 0) for u in uniq], dtype=np.int64)[inv]
        keep = b < cut
        return t.filter(pa.array(keep)).append_column(
            "rate_ppm", pa.array(cut[keep], pa.int64()))

    cols = sorted({key_col, strata_col} | set(columns or []))
    return src.dataset(columns=cols).map_batches(
        pick, batch_format="pyarrow")


def temperature_mix(source: Any, key_col: str, strata_col: str, *,
                    alpha: float = 0.5, scale: float = 8.0,
                    hash_fn: str = "md5",
                    columns: Sequence[str] | None = None):
    """Temperature-flattened source mixing — the T5/LLaMA α-sampling
    curriculum in its UNNORMALIZED per-stratum form: keep-rate
    ``r_s = min(1, scale · n_s^(α−1))`` per stratum (source, language,
    domain …). α < 1 flattens the mix — big sources downsample
    ∝ n^(α−1) while small ones are kept whole — and because every
    rate is a pure per-stratum expression there is NO normalizing sum
    whose cross-engine float association order could flip a row. With
    the default ``α = 0.5`` the only transcendental is ``sqrt``, which
    IEEE-754 requires correctly rounded, so numpy and DuckDB compute
    the IDENTICAL double and the keep rule
    ``(md5(key) >> 32) < floor(r_s · 2^32)`` is bit-exact cross-engine
    (general α uses ``pow`` — documented last-ulp caveat).

    Scale shape: pass 1 is a thin per-stratum count (strata are
    low-cardinality by definition; the driver holds one row per
    stratum), pass 2 a zero-shuffle deterministic per-batch filter —
    reproducible across re-runs, block layouts and cluster sizes.
    Null strata form their own stratum under the sentinel. → kept rows
    with the stratum's ``rate_q32`` cut appended."""
    import math

    src = as_source(source)

    def fill_strata(t: pa.Table) -> pa.Table:
        col = t.column(strata_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return t.set_column(t.schema.get_field_index(strata_col),
                            strata_col, col.fill_null(NULL_GROUP_KEY))

    cnt_rows = src.dataset(columns=[strata_col]) \
        .map_batches(fill_strata, batch_format="pyarrow") \
        .groupby(strata_col).count().take_all()
    counts = {r[strata_col]: int(r["count()"]) for r in cnt_rows}
    if not counts:
        raise ValueError("empty input: no strata to mix")

    def rate(c: int) -> float:
        if alpha == 0.5:            # sqrt path: correctly rounded IEEE
            return min(1.0, scale / math.sqrt(float(c)))
        return min(1.0, scale * float(c) ** (alpha - 1.0))

    cuts = {s: int(np.floor(rate(c) * 4294967296.0))
            for s, c in counts.items()}

    def pick(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = keys.to_numpy(zero_copy_only=False)
        hf = md5_hash64 if hash_fn == "md5" else hash64
        hi = (hf(vals.astype(object) if vals.dtype == object else vals)
              >> np.uint64(32)).astype(np.int64)
        strata = t.column(strata_col).to_numpy(zero_copy_only=False) \
            .astype(object)
        strata[_isnull(strata)] = NULL_GROUP_KEY  # matches the count pass
        uniq, inv = np.unique(strata, return_inverse=True)
        cut = np.array([cuts.get(u, 0) for u in uniq], dtype=np.int64)[inv]
        keep = hi < cut
        return t.filter(pa.array(keep)).append_column(
            "rate_q32", pa.array(cut[keep], pa.int64()))

    cols = sorted({key_col, strata_col} | set(columns or []))
    return src.dataset(columns=cols).map_batches(
        pick, batch_format="pyarrow")
