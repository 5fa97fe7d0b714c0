"""Differential fuzz for the dedup/similarity family: adversarial and
random corpora (nulls, empty/whitespace text, unicode boundaries,
sub-shingle docs, planted exact/near duplicates) against brute-force
oracles.

Oracle strength per pipeline:
- PPJoin prefix-filtered n-gram Jaccard is EXACT → output must equal
  the brute-force pair set at every threshold.
- MinHash-LSH + exact verify: banding may MISS pairs (probabilistic),
  so the contract is (a) zero false positives after verification,
  (b) every identical-shingle-set pair IS found (identical signatures
  → identical band hashes → guaranteed candidates), (c) the broadcast
  and distributed-join verify tiers agree.
- SimHash chunk-LSH: hamming ≤ 3 ⇒ pigeonhole guarantees one equal
  16-bit chunk of 4 → chunk-bucket pairing must equal brute-force
  hamming pairs.
- Connected components: driver union-find vs forced large-star/
  small-star path vs an independent test-side union-find.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsonschema_ray.pipelines.dedup import (
    _shingle_hashes, dup_clusters_table, minhash_verified_pairs,
    ngram_jaccard_prefix_pairs, simhash_dataset)

K = 3          # shingle size used throughout


def _brute_pairs(docs: pd.DataFrame, threshold: float):
    """Exact pairwise shingle-set Jaccard over the same shingle
    definition the engine contracts (word K-grams)."""
    texts = docs["text"].to_numpy(dtype=object)
    di, sh = _shingle_hashes(texts, K)
    sets = {i: set() for i in range(len(texts))}
    for d, h in zip(di, sh):
        sets[int(d)].add(int(h))
    keys = docs["doc_id"].to_numpy()
    out = set()
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                out.add((min(int(keys[i]), int(keys[j])),
                         max(int(keys[i]), int(keys[j]))))
    return out, sets


def _adversarial_corpus() -> pd.DataFrame:
    rows = [
        (1, None),                                   # null text
        (2, ""),                                     # empty
        (3, " \t\n  "),                              # whitespace-only
        (4, "solo"),                                 # below shingle size
        (5, "two tokens"),                           # below shingle size
        (6, "exactly three tokens"),                 # one shingle
        (7, "exactly three tokens"),                 # its exact dup
        (8, "the quick brown fox jumps over the lazy dog again and again"),
        (9, "the quick brown fox jumps over the lazy dog again and again"),
        (10, "the quick brown fox jumps over the lazy cat again and again"),
        (11, "日本語 テキスト 処理 は 難しい です ね 本当に"),
        (12, "日本語 テキスト 処理 は 難しい です ね 本当に"),
        (13, "emoji 🎉 and 🎊 tokens \U0010FFFF mixed in here somewhere"),
        (14, "a  b   c\t d \n e f g h"),             # multi-space runs
        (15, "a b c d e f g h"),                     # tokenizes equal to 14
        (16, "rep rep rep rep rep rep rep rep rep"),  # one repeated token
        (17, "zero​width and combining é chars in tokens here"),
    ]
    return pd.DataFrame({"doc_id": [r[0] for r in rows],
                         "text": [r[1] for r in rows]})


def _random_corpus(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(["alpha", "beta", "gamma", "δέλτα", "ε", "zeta",
                      "ήta", "θ", "ι", "κ", "λάμδα", "μ", "ν", "ξ",
                      "ο", "π", "🎈", "ς", "τ", "υ"], dtype=object)
    texts = []
    for _ in range(40):
        n = int(rng.integers(0, 25))
        texts.append(" ".join(rng.choice(vocab, n)))
    # plant duplicates and near-duplicates
    for i in (5, 11, 17):
        if len(texts[i].split()) >= K:
            texts[(i + 13) % 40] = texts[i]
    if len(texts[8].split()) > K + 2:
        toks = texts[8].split()
        toks[2] = "MUT"
        texts[22] = " ".join(toks)
    return pd.DataFrame({"doc_id": np.arange(1, 41),
                         "text": pd.array(texts, dtype=object)})


CORPORA = [_adversarial_corpus()] + [_random_corpus(s) for s in (1, 2, 3)]


def _ds(df):
    import ray

    tab = pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                    "text": pa.array(df["text"], pa.string())})
    return ray.data.from_arrow(tab)


@pytest.mark.parametrize("ci", range(len(CORPORA)))
@pytest.mark.parametrize("threshold", [0.3, 0.7])
def test_ppjoin_exact_vs_brute_force(ray_session, ci, threshold):
    docs = CORPORA[ci]
    want, _ = _brute_pairs(docs, threshold)
    got_tab = ngram_jaccard_prefix_pairs(_ds(docs), "doc_id",
                                         shingle_k=K, threshold=threshold)
    got = set(zip(got_tab.column("key_a").to_pylist(),
                  got_tab.column("key_b").to_pylist()))
    assert got == want, (ci, threshold)
    # exactness of the reported jaccard values
    for ka, kb, j in zip(got_tab.column("key_a").to_pylist(),
                         got_tab.column("key_b").to_pylist(),
                         got_tab.column("jaccard").to_pylist()):
        _, sets = _brute_pairs(docs, 0.0)
        ia = docs.index[docs["doc_id"] == ka][0]
        ib = docs.index[docs["doc_id"] == kb][0]
        sa, sb = sets[ia], sets[ib]
        # pipeline reports jaccard rounded to 4 decimals
        assert abs(j - len(sa & sb) / len(sa | sb)) < 5e-5 + 1e-12


@pytest.mark.parametrize("ci", range(len(CORPORA)))
def test_minhash_verified_contract(ray_session, ci):
    threshold = 0.6
    docs = CORPORA[ci]
    want, sets = _brute_pairs(docs, threshold)
    got_tab = minhash_verified_pairs(_ds(docs), "doc_id",
                                     shingle_k=K, threshold=threshold)
    got = set(zip(got_tab.column("key_a").to_pylist(),
                  got_tab.column("key_b").to_pylist()))
    # (a) no false positives — verified pairs are brute-force pairs
    assert got <= want, (ci, got - want)
    # (b) identical nonempty shingle sets are always found
    keys = docs["doc_id"].to_numpy()
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if sets[i] and sets[i] == sets[j]:
                p = (min(int(keys[i]), int(keys[j])),
                     max(int(keys[i]), int(keys[j])))
                assert p in got, (ci, p)
    # (c) the distributed-join verify tier agrees with broadcast
    joined = minhash_verified_pairs(_ds(docs), "doc_id", shingle_k=K,
                                    threshold=threshold,
                                    broadcast_max_pairs=0)
    got2 = set(zip(joined.column("key_a").to_pylist(),
                   joined.column("key_b").to_pylist()))
    assert got2 == got, ci


@pytest.mark.parametrize("ci", range(len(CORPORA)))
def test_simhash_chunk_lsh_vs_brute_force(ray_session, ci):
    docs = CORPORA[ci]
    out = simhash_dataset(_ds(docs), "doc_id").to_pandas()
    sig = dict(zip(out["doc_id"], out["simhash"].astype(np.uint64)))
    # identical texts → identical simhash
    by_text = docs.dropna(subset=["text"]).groupby("text")["doc_id"] \
        .apply(list)
    for ids in by_text:
        assert len({int(sig[i]) for i in ids}) == 1
    # chunk-bucket pairing == brute-force hamming ≤ 3 pairs
    ids = out["doc_id"].to_numpy()
    s = out["simhash"].to_numpy().astype(np.uint64)
    brute = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(s[i]) ^ int(s[j])).count("1") <= 3:
                brute.add((min(int(ids[i]), int(ids[j])),
                           max(int(ids[i]), int(ids[j]))))
    lsh = set()
    for c in range(4):
        buckets: dict = {}
        for i in range(len(ids)):
            buckets.setdefault(int(out[f"chunk{c}"][i]), []).append(i)
        for grp in buckets.values():
            for x in range(len(grp)):
                for y in range(x + 1, len(grp)):
                    i, j = grp[x], grp[y]
                    if bin(int(s[i]) ^ int(s[j])).count("1") <= 3:
                        lsh.add((min(int(ids[i]), int(ids[j])),
                                 max(int(ids[i]), int(ids[j]))))
    assert lsh == brute, ci


def _uf_oracle(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {k: find(k) for k in list(parent)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_paths_agree(ray_session, seed):
    import ray

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 60, 90
    a = rng.integers(1, n_nodes + 1, n_edges).astype(np.int64)
    b = rng.integers(1, n_nodes + 1, n_edges).astype(np.int64)
    # plant self-loops, duplicate and reversed edges
    a[0], b[0] = 7, 7
    a[1], b[1] = 3, 9
    a[2], b[2] = 9, 3
    a[3], b[3] = 3, 9
    pairs = pa.table({"key_a": pa.array(a), "key_b": pa.array(b)})

    drv = dup_clusters_table(ray.data.from_arrow(pairs),
                             driver_max_pairs=10**6).to_pandas()
    star = dup_clusters_table(ray.data.from_arrow(pairs),
                              driver_max_pairs=0).to_pandas()
    want = _uf_oracle(list(zip(a.tolist(), b.tolist())))

    got_drv = dict(zip(drv["key"], drv["root"]))
    got_star = dict(zip(star["key"], star["root"]))
    assert got_drv == {int(k): int(v) for k, v in want.items()}
    assert got_star == got_drv


def _brute_scrub(texts, k=K, min_docs=2):
    """Independent quadratic reference for repeated_substring_scrub:
    per-doc token lists, k-gram STRING tuples (no hashing), distinct-doc
    counts, coverage, survivor join."""
    toks = [(t or "").split() for t in texts]
    from collections import defaultdict
    docs_of = defaultdict(set)
    for d, ts in enumerate(toks):
        for i in range(len(ts) - k + 1):
            docs_of[tuple(ts[i:i + k])].add(d)
    rep = {g for g, ds in docs_of.items() if len(ds) >= min_docs}
    out = []
    for d, ts in enumerate(toks):
        covered = [False] * len(ts)
        for i in range(len(ts) - k + 1):
            if tuple(ts[i:i + k]) in rep:
                for j in range(i, i + k):
                    covered[j] = True
        kept = [t for t, c in zip(ts, covered) if not c]
        out.append((len(ts), sum(covered), " ".join(kept)))
    return out


@pytest.mark.parametrize("seed", [5, 23])
def test_substring_scrub_matches_brute_force(ray_session, seed):
    import ray.data as rd

    from jsonschema_ray.pipelines.dedup import repeated_substring_scrub

    rng = np.random.default_rng(seed)
    vocab = np.array(["a", "bb", "ccc", "Δδ", "𝕏", "z-z"])
    n = 80
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 12)))
             for _ in range(n)]
    # plant a shared passage in several docs, plus null/empty/short
    passage = "ONE TWO THREE FOUR FIVE"
    for i in (3, 17, 40):
        texts[i] = texts[i] + " " + passage
    texts[50] = passage                      # passage-only doc → ''
    texts[0], texts[1], texts[2] = None, "", "  \t "
    texts[4] = "xy zz"                       # sub-shingle, untouched
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})

    got = repeated_substring_scrub(
        rd.from_arrow(tbl).repartition(5), shingle_k=K,
        min_docs=2).to_pandas().sort_values("doc_id")
    want = _brute_scrub(texts)
    assert got["n_tokens"].tolist() == [w[0] for w in want]
    assert got["n_removed"].tolist() == [w[1] for w in want]
    assert got["text_scrubbed"].tolist() == [w[2] for w in want]
    # the planted passage-only doc must scrub to empty
    assert got.loc[got.doc_id == 50, "text_scrubbed"].item() == ""
