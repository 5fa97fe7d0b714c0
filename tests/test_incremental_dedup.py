"""Incremental cross-corpus near-dup: persisted MinHash index + new
shard query — the continuous-ingestion shape. Planted exactness: new
docs that duplicate indexed docs (exactly or with one mutated token)
must pair with their index twin and nothing else; the old corpus text
is never read on the query path (the index stores shingle blobs)."""

import numpy as np
import pyarrow as pa
import pytest


def _texts(n, seed=0):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(211)], dtype=object)
    return [" ".join(rng.choice(vocab, size=24 + int(rng.integers(0, 8))))
            for _ in range(n)]


@pytest.fixture()
def corpus_dirs(tmp_path, ray_session):
    import ray

    from jsonschema_ray.pipelines.dedup import minhash_index_write
    from jsonschema_ray.sources.readers import DatasetSource

    base = _texts(100, seed=7)
    idx_t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                      "text": pa.array(base, pa.string())})
    # new shard: 0..9 fresh, 10..14 EXACT dups of index docs 3,12,21,30,39,
    # 15..17 near-dups (one mutated token) of 5,14,23
    fresh = _texts(10, seed=99)
    exact_src = [3, 12, 21, 30, 39]
    near_src = [5, 14, 23]
    near = []
    for s in near_src:
        toks = base[s].split()
        toks[0] = "MUTANT"
        near.append(" ".join(toks))
    new_texts = fresh + [base[s] for s in exact_src] + near
    new_t = pa.table({
        "doc_id": pa.array(np.arange(1000, 1000 + len(new_texts),
                                     dtype=np.int64)),
        "text": pa.array(new_texts, pa.string())})
    index_dir = str(tmp_path / "mh_index")
    man = minhash_index_write(
        DatasetSource(ray.data.from_arrow(idx_t).repartition(4)),
        "doc_id", index_dir, n_buckets=8)
    assert man["bands"] == 16
    return index_dir, new_t, exact_src, near_src


def test_query_index_planted_pairs(corpus_dirs, ray_session):
    import ray

    from jsonschema_ray.pipelines.dedup import minhash_query_index
    from jsonschema_ray.sources.readers import DatasetSource

    index_dir, new_t, exact_src, near_src = corpus_dirs
    out = minhash_query_index(
        DatasetSource(ray.data.from_arrow(new_t).repartition(3)),
        "doc_id", index_dir, threshold=0.5).to_pandas()
    got = set(zip(out["key_new"], out["key_idx"]))
    want = {(1010 + i, s) for i, s in enumerate(exact_src)} | \
           {(1015 + i, s) for i, s in enumerate(near_src)}
    assert got == want
    exact_j = out[out["key_new"] < 1015]["jaccard"]
    assert (exact_j == 1.0).all()            # exact dups verify at 1.0
    near_j = out[out["key_new"] >= 1015]["jaccard"]
    assert ((near_j >= 0.5) & (near_j < 1.0)).all()


def test_query_matches_in_corpus_verify(corpus_dirs, ray_session):
    """Cross-check: querying the index must find exactly the
    cross-half pairs the ALL-IN-ONE in-corpus pipeline finds on the
    concatenated corpus (restricted to new×index pairs)."""
    import pyarrow.parquet as pq
    import ray

    from jsonschema_ray.pipelines.dedup import minhash_verified_pairs
    from jsonschema_ray.sources.readers import DatasetSource

    index_dir, new_t, _, _ = corpus_dirs
    idx_t = pq.ParquetDataset(index_dir + "/blobs").read()  # keys only
    # rebuild the concatenated corpus from the fixture inputs
    base = _texts(100, seed=7)
    both = pa.table({
        "doc_id": pa.array(
            np.concatenate([np.arange(100, dtype=np.int64),
                            new_t.column("doc_id").to_numpy()])),
        "text": pa.array(base + new_t.column("text").to_pylist(),
                         pa.string())})
    allp = minhash_verified_pairs(
        DatasetSource(ray.data.from_arrow(both).repartition(4)),
        "doc_id", threshold=0.5)
    cross = {(b, a) for a, b in zip(allp.column("key_a").to_pylist(),
                                    allp.column("key_b").to_pylist())
             if a < 1000 <= b}

    from jsonschema_ray.pipelines.dedup import minhash_query_index
    out = minhash_query_index(
        DatasetSource(ray.data.from_arrow(new_t).repartition(3)),
        "doc_id", index_dir, threshold=0.5).to_pandas()
    got = set(zip(out["key_new"], out["key_idx"]))
    assert got == cross
