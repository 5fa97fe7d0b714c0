"""High-cardinality grouped aggregation without Ray's per-group reduce.

Ray 2.49's ``groupby().aggregate()`` spends on the order of a
millisecond of Python per GROUP in its map/reduce suboperators
(measured this round: 26 s per 19k-row pair block — 5,327 s map +
4,834 s reduce CPU over 3.9M rows; a 100k-group/100k-row microbench
takes 189 s where a pandas groupby takes 20 ms). That cost is
invisible for dozens of groups (event_type × hour) and catastrophic
for data-proportional cardinalities: tokens, words, users, candidate
pairs. At 100 TB those are the common case.

``hash_group_agg`` keeps the exchange shape a real cluster wants —
ONE single-int64-key sort shuffle, over hashed group identities folded
into ~2×CPU partition buckets — and then aggregates each bucket with
one vectorized pandas ``groupby``. Group identity never crosses the
wire as a composite key; only the bucket id is a shuffle key, so skewed
group sizes spread by hash and the per-bucket kernel is pure C.

Semantics match ``groupby(keys).aggregate(...)`` except output row
order (bucket order, not key order — every consumer here either sorts
explicitly or feeds an order-insensitive gate). Group keys must be
non-null (the same contract Ray's sort shuffle enforces by crashing);
rows with null keys would be dropped by pandas — callers sentinel them
first, as everywhere else in this repo.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

__all__ = ["hash_group_agg", "bucketed_map_groups"]

_MIX = np.uint64(0x9E3779B97F4A7C15)

#: out_col -> (src_col, how). ``how`` ∈ {"sum", "min", "max", "mean",
#: "size"}; "size" counts group rows and ignores ``src_col`` (pass any
#: existing column). Order-dependent hows ("first"/"last") are NOT
#: supported: row order inside a bucket frame is shuffle arrival order,
#: so they would be nondeterministic across runs (ADVICE r4).
AggSpec = dict

_ORDER_DEPENDENT_HOWS = {"first", "last"}


def _bucket_of(df: pd.DataFrame, keys: list[str], nb: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = h * _MIX ^ pd.util.hash_array(
                np.asarray(df[k].to_numpy()), categorize=False)
    return (h % np.uint64(nb)).astype(np.int64)


def hash_group_agg(ds: Any, keys: str | list[str], aggs: AggSpec,
                   num_buckets: int | None = None):
    """``ds.groupby(keys).aggregate(...)`` for high-cardinality keys.

    ``aggs`` maps each output column to ``(source_col, how)``. Partial
    pre-aggregation is the caller's job (same as with Ray's aggregate):
    emit combinable partials from ``map_batches`` first so the shuffle
    carries group cardinality, not row cardinality.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if num_buckets is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_buckets = max(2, min(128, cpus * 2))
    nb = int(num_buckets)

    bad = {how for _, how in aggs.values()} & _ORDER_DEPENDENT_HOWS
    if bad:
        raise ValueError(
            f"hash_group_agg: {sorted(bad)} are order-dependent and "
            "nondeterministic after a hashed shuffle — sort inside an "
            "explicit order column instead")
    named = {out: pd.NamedAgg(column=src, aggfunc=how)
             for out, (src, how) in aggs.items()}

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        # loud null-key contract (ADVICE r4): the in-bucket pandas
        # groupby would silently DROP null-key rows (dropna default) —
        # callers sentinel nulls first, and misuse must fail, not lose
        # data.
        for k in key_list:
            if df[k].isna().any():
                raise ValueError(
                    f"hash_group_agg: null values in group key {k!r} — "
                    "sentinel or drop them before aggregating")
        return df.assign(__hb=_bucket_of(df, key_list, nb))

    def agg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(key_list, sort=False, as_index=False)
                 .agg(**named))
        return out

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("__hb").map_groups(agg_bucket, batch_format="pandas")


def bucketed_map_groups(ds: Any, keys: str | list[str], fn,
                        num_buckets: int | None = None):
    """``ds.groupby(keys).map_groups(fn)`` without per-group Ray
    scheduling: one shuffle on a hashed bucket id, then a worker-side
    loop calling ``fn`` once per group inside each bucket frame — the
    per-group cost drops from Ray's ~ms (frame dispatch through the
    sort operator) to a pandas slice. For when the per-group kernel is
    genuinely per-group (pair expansion with custom filters, per-group
    audits); if the kernel is a standard reduction, use
    ``hash_group_agg`` instead, which vectorizes the groups away
    entirely."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if num_buckets is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_buckets = max(2, min(128, cpus * 2))
    nb = int(num_buckets)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__hb=_bucket_of(df, key_list, nb))

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__hb")
        outs = [fn(grp) for _, grp in df.groupby(key_list, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("__hb").map_groups(run_bucket, batch_format="pandas")
