"""Streaming scale check for the dedup family (round-4 verdict #5).

Generates a duplication-heavy corpus (20% exact duplicates with a
cross-shard source 10,007 docs back, 10% near-duplicates with one
mutated token) as partitioned parquet — text is a PURE function of the
global doc index (hash-mixed token picks), so any shard can
materialize the text of any referenced doc without coordination — and
runs the full near-dup pipeline end-to-end at two sizes:

    minhash_verified_pairs (LSH banding → exact-Jaccard verify; above
    50k candidates the verify tier is two distributed joins)
    → dup_clusters_table (above 500k pairs: large-star/small-star)
    → survivor count

No input materialization: the corpus streams from parquet through the
banding stage; the driver holds only pair/cluster aggregates. The
run reports wall time per stage, pairs/clusters found, docs/s, and
the min observed free object-store memory (boundedness signal).

Usage:
    python tools/dedup_scale.py gen N [out_dir]
    python tools/dedup_scale.py run DIR [threshold]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB = np.array([f"tok{i:03d}" for i in range(997)], dtype=object)
SHARD = 100_000
DUP_BACK, NEAR_BACK = 10_007, 10_003


def _base_tokens(idx: np.ndarray) -> pa.ListArray:
    """Token list per global doc index — deterministic hash mixing,
    fully vectorized (no RNG state, no Python loop over docs)."""
    lens = 20 + (idx % np.int64(16))
    tot = int(lens.sum())
    doc_of = np.repeat(np.arange(len(idx)), lens)
    tpos = np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
    g = idx[doc_of]
    # full splitmix-style hash of (doc, position): affine/arithmetic
    # token sequences are NOT usable here — sequences sharing a step
    # are cyclic shifts of each other and fabricate mass accidental
    # near-duplicates (observed: 198k pairs where 60k were planted)
    x = (g.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + tpos.astype(np.uint64) + np.uint64(1))
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    mixed = (x % np.uint64(len(VOCAB))).astype(np.int64)
    flat = pa.array(VOCAB[mixed], pa.string())
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), flat)


def _texts_for(idx: np.ndarray) -> pa.Array:
    """Resolve the dup/near-dup rules, then join tokens per doc with
    one Arrow kernel."""
    src = idx.copy()
    exact = (idx % 10 == 7) & (idx >= DUP_BACK)
    near = (idx % 10 == 3) & (idx >= NEAR_BACK)
    src[exact] = idx[exact] - DUP_BACK
    src[near] = idx[near] - NEAR_BACK
    toks = _base_tokens(src)
    texts = pc.binary_join(toks, " ")
    if near.any():
        # mutate the first token of near-dup docs (high-but-<1 jaccard)
        t = texts.to_numpy(zero_copy_only=False).astype(object)
        t[near] = np.array(["MUT " + s.split(" ", 1)[1] for s in t[near]],
                           dtype=object)
        texts = pa.array(t, pa.string())
    return texts


def gen(n_docs: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for s0 in range(0, n_docs, SHARD):
        dst = f"{out_dir}/shard-{s0 // SHARD:05d}.parquet"
        if os.path.exists(dst):
            continue
        idx = np.arange(s0, min(s0 + SHARD, n_docs), dtype=np.int64)
        pq.write_table(pa.table({
            "doc_id": pa.array(idx),
            "text": _texts_for(idx)}), dst)
    print(f"generated {n_docs} docs at {out_dir}")
    return out_dir


class _StoreWatch(threading.Thread):
    """Samples free object-store memory — a shrinking-to-zero reading
    means the pipeline materialized instead of streaming."""

    def __init__(self):
        super().__init__(daemon=True)
        self.min_free = None
        self._stop = threading.Event()

    def run(self):
        import ray

        while not self._stop.is_set():
            free = ray.available_resources().get("object_store_memory")
            if free is not None:
                self.min_free = free if self.min_free is None \
                    else min(self.min_free, free)
            self._stop.wait(0.5)

    def stop(self):
        self._stop.set()


def run(corpus_dir: str, threshold: float = 0.7) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from jsonschema_ray.pipelines.dedup import (
        dup_clusters_table, minhash_verified_pairs)
    from jsonschema_ray.sources.readers import ParquetSource

    n_docs = pq.ParquetDataset(corpus_dir).read(columns=["doc_id"]).num_rows
    watch = _StoreWatch()
    watch.start()
    t0 = time.perf_counter()
    pairs = minhash_verified_pairs(ParquetSource(corpus_dir), "doc_id",
                                   threshold=threshold)
    t_pairs = time.perf_counter() - t0
    n_pairs = pairs.num_rows if isinstance(pairs, pa.Table) \
        else pairs.count()
    t1 = time.perf_counter()
    clusters = dup_clusters_table(pairs)
    n_keys = clusters.num_rows
    n_roots = len(np.unique(clusters.column("root").to_numpy()))
    t_clusters = time.perf_counter() - t1
    watch.stop()
    out = {"corpus": corpus_dir, "docs": int(n_docs),
           "pairs": int(n_pairs), "clustered_keys": int(n_keys),
           "clusters": int(n_roots),
           "t_pairs_s": round(t_pairs, 1),
           "t_clusters_s": round(t_clusters, 1),
           "docs_per_s": int(n_docs / (t_pairs + t_clusters)),
           "min_free_object_store_gb":
               round((watch.min_free or 0) / 2**30, 1)}
    print(json.dumps(out))
    return out


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "gen":
        n = int(sys.argv[2])
        out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/dedup_scale_{n}"
        gen(n, out)
        return 0
    if len(sys.argv) >= 3 and sys.argv[1] == "run":
        run(sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.7)
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
