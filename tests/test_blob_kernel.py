"""Unit pins for the verify tier's buffer-level blob kernel
(_doc_shingle_blobs / _decode_blobs / _blob_jaccard): Arrow offset
handling (slices, large_binary), empty docs, and exactness of the
vectorized intersection against Python sets."""

import numpy as np
import pyarrow as pa

from jsonschema_ray.pipelines.dedup import (_blob_jaccard, _decode_blobs,
                                            _doc_shingle_blobs,
                                            _shingle_hashes)


def _sets(texts, k=3):
    out = []
    for t in texts:
        toks = t.split()
        out.append({tuple(toks[i:i + k])
                    for i in range(max(0, len(toks) - k + 1))})
    return out


def test_blobs_encode_sorted_unique_per_doc():
    texts = np.array(["a b c a b c a b c", "x y z w", "", "q q q q q"],
                     dtype=object)
    blobs = _doc_shingle_blobs(texts, 3)
    flat, sizes = _decode_blobs(blobs)
    # sizes equal the distinct-shingle counts of the Python reference
    ref = _sets(list(texts))
    assert sizes.tolist() == [len(s) for s in ref]
    # per-doc runs are sorted strictly ascending (unique)
    off = np.concatenate([[0], np.cumsum(sizes)])
    for i in range(len(texts)):
        run = flat[off[i]:off[i + 1]]
        assert np.all(np.diff(run.astype(np.uint64).view(np.int64)) != 0)
        assert np.all(run[:-1] < run[1:])


def test_decode_handles_slices_and_large_binary():
    texts = np.array([f"t{i} u{i} v{i} w{i}" for i in range(10)],
                     dtype=object)
    blobs = _doc_shingle_blobs(texts, 3)
    full_flat, full_sizes = _decode_blobs(blobs)
    # sliced view: offsets are absolute into the shared values buffer
    sl = blobs.slice(3, 4)
    flat, sizes = _decode_blobs(sl)
    off = np.concatenate([[0], np.cumsum(full_sizes)])
    want = full_flat[off[3]:off[7]]
    assert sizes.tolist() == full_sizes[3:7].tolist()
    assert np.array_equal(flat, want)
    # large_binary round-trip (Ray's join may re-type the column)
    lb = blobs.cast(pa.large_binary())
    flat2, sizes2 = _decode_blobs(lb)
    assert np.array_equal(flat2, full_flat)
    assert sizes2.tolist() == full_sizes.tolist()


def test_blob_jaccard_matches_python_sets():
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(40)], dtype=object)
    texts = np.array([" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
                      for _ in range(30)], dtype=object)
    blobs = _doc_shingle_blobs(texts, 3)
    flat, sizes = _decode_blobs(blobs)
    off = np.concatenate([[0], np.cumsum(sizes)])
    arrs = [flat[off[i]:off[i + 1]] for i in range(len(texts))]
    ia = np.repeat(np.arange(15), 2)          # pairs (0,15),(0,16),(1,17)...
    ib = 15 + (np.arange(30) % 15)
    flat_a = np.concatenate([arrs[i] for i in ia])
    sz_a = np.array([len(arrs[i]) for i in ia], np.int64)
    flat_b = np.concatenate([arrs[i] for i in ib])
    sz_b = np.array([len(arrs[i]) for i in ib], np.int64)
    inter, j = _blob_jaccard(flat_a, sz_a, flat_b, sz_b)
    ref = _sets(list(texts))
    for n, (x, y) in enumerate(zip(ia, ib)):
        i_ref = len(ref[x] & ref[y])
        u_ref = len(ref[x] | ref[y])
        assert inter[n] == i_ref, (x, y)
        if u_ref:
            assert abs(j[n] - i_ref / u_ref) < 1e-12
        else:
            assert j[n] == 1.0


def test_blob_jaccard_both_empty_is_one():
    inter, j = _blob_jaccard(np.empty(0, np.uint64),
                             np.zeros(2, np.int64),
                             np.empty(0, np.uint64),
                             np.zeros(2, np.int64))
    assert inter.tolist() == [0, 0]
    assert j.tolist() == [1.0, 1.0]
