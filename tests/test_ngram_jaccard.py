"""Exact n-gram Jaccard similarity self-join (dedup.ngram_jaccard_pairs).

Oracle: brute-force Python set Jaccard over word-3-shingles — the same
definition the DuckDB driver oracle states in SQL.
"""
import numpy as np
import pyarrow as pa


def _shingles(text: str, k: int = 3) -> set:
    toks = text.split()
    return {tuple(toks[i:i + k]) for i in range(max(0, len(toks) - k + 1))}


def _brute(texts: list[str], threshold: float, k: int = 3) -> list[tuple]:
    out = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = _shingles(texts[a], k), _shingles(texts[b], k)
            if not sa or not sb:
                continue
            i = len(sa & sb)
            j = i / len(sa | sb)
            if j >= threshold:
                out.append((a, b, i, round(j, 4)))
    return out


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",      # near-dup of 0
    "a completely different sentence about ray data",
    "a completely different sentence about ray data engines",  # ~dup of 2
    "short one",                                        # <3 tokens: no set
    "the quick brown fox jumps over the lazy dog",      # exact dup of 0
    "",                                                 # empty
    "unrelated words entirely here with no overlap at all",
]


def _run(texts, threshold, **kw):
    from jsonschema_ray.pipelines.dedup import ngram_jaccard_table

    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})
    out = ngram_jaccard_table(tbl, "doc_id", threshold=threshold, **kw) \
        .to_pandas().sort_values(["key_a", "key_b"]).reset_index(drop=True)
    return [tuple(r) for r in out.itertuples(index=False)]


def test_matches_bruteforce(ray_session):
    for th in (0.3, 0.5, 0.9):
        assert _run(CORPUS, th) == _brute(CORPUS, th), th


def test_exact_dup_pair_is_jaccard_one(ray_session):
    rows = _run(CORPUS, 0.999)
    assert (0, 5, 7, 1.0) in rows


def test_short_and_empty_docs_never_pair(ray_session):
    rows = _run(CORPUS, 0.0 + 1e-9)
    keys = {k for r in rows for k in r[:2]}
    assert 4 not in keys and 6 not in keys


def test_max_df_drops_only_common_shingle_pairs(ray_session):
    # every shingle of docs 0/1/5 appears in >=2 docs; max_df=1 keeps
    # nothing pairable, so the capped join returns no pairs at all
    texts = CORPUS[:2] + [CORPUS[5]]
    assert _run(texts, 0.3, max_df=1) == []
    # with the cap lifted the pairs come back
    assert len(_run(texts, 0.3)) == 3


def test_many_docs_randomized_vs_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 12)))
             for _ in range(120)]
    # plant a few near-dup clusters
    texts[10] = texts[11] = "alpha beta gamma delta epsilon zeta"
    texts[12] = "alpha beta gamma delta epsilon eta"
    assert _run(texts, 0.25) == _brute(texts, 0.25)


def test_agrees_with_minhash_verified_at_same_threshold(ray_session):
    """Recall certificate: the exact join and the LSH-prefiltered
    verified pairs must coincide when LSH recall is 1.0."""
    from jsonschema_ray.pipelines.dedup import minhash_verified_pairs

    tbl = pa.table({"doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                    "text": CORPUS})
    exact = {(r[0], r[1], r[3]) for r in _run(CORPUS, 0.5)}
    mh = minhash_verified_pairs(tbl, "doc_id", threshold=0.5).to_pandas()
    lsh = {(int(a), int(b), float(j))
           for a, b, j in zip(mh["key_a"], mh["key_b"], mh["jaccard"])}
    assert lsh == exact


def test_prefix_filtered_join_equals_exact(ray_session):
    """PPJoin prefix path returns EXACTLY the inverted-index join's
    result set (no false negatives), across thresholds including ones
    where t*n is a true integer (the ceil boundary)."""
    from jsonschema_ray.pipelines.dedup import ngram_jaccard_prefix_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 14)))
             for _ in range(150)]
    texts[5] = texts[6] = "alpha beta gamma delta epsilon zeta eta"
    texts[7] = "alpha beta gamma delta epsilon zeta theta"
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})
    for th in (0.3, 0.5, 0.75):
        exact = set(_run(texts, th))
        pf = ngram_jaccard_prefix_pairs(tbl, "doc_id", threshold=th) \
            .to_pandas()
        got = {(int(a), int(b), int(i), float(j)) for a, b, i, j in
               zip(pf["key_a"], pf["key_b"], pf["n_common"],
                   pf["jaccard"])}
        assert got == exact, th


def test_prefix_filter_prunes_candidates(ray_session):
    """On a corpus dominated by one common shingle, the prefix index
    generates strictly fewer candidate pairs than full inverted-index
    expansion (the point of PPJoin)."""
    from jsonschema_ray.pipelines.dedup import ngram_prefix_candidates

    # every doc shares 'the common core' but differs elsewhere
    texts = [f"u{i} v{i} the common core x{i} y{i} z{i}"
             for i in range(60)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})
    cand = ngram_prefix_candidates(tbl, "doc_id", threshold=0.5) \
        .count()
    full = 60 * 59 // 2  # 'the common core' shingle pairs every doc
    assert cand < full / 4
    # and nothing real is lost: no pair reaches 0.5 here
    assert _run(texts, 0.5) == []
