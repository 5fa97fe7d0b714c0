"""Distributed BPE tokenizer: the driver merge loop is pinned against
an independent quadratic reference implementation on random corpora
(incl. unicode and degenerate words); the distributed histogram +
encoder are pinned against driver-side recomputation; truncation
accounting is never silent."""

import random

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.pipelines.tokenizer import (BpeEncoder, bpe_encode,
                                                bpe_encode_word, bpe_train,
                                                bpe_train_table,
                                                word_histogram, _merge_word)


def naive_train(hist: dict, num_merges: int):
    """Quadratic reference: full pair recount after every merge."""
    words = {tuple(w): n for w, n in hist.items() if w}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        cands = [p for p, c in counts.items() if c >= 2]
        if not cands:
            break
        best = min(cands, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((best[0], best[1], counts[best]))
        new = {}
        for syms, n in words.items():
            m = _merge_word(syms, best)
            new[m] = new.get(m, 0) + n
        words = new
    return merges


VOCAB = ["low", "lower", "lowest", "newest", "widest", "wider", "new",
         "ab", "aab", "aaab", "abab", "xyz", "x", "", "ñandú", "ñañ",
         "日本語", "日本", "ααβ", "a b"]  # 'a b' never occurs post-split


class TestTrain:
    def test_differential_vs_quadratic_reference(self):
        rng = random.Random(7)
        for trial in range(40):
            hist = {w: rng.randint(1, 9)
                    for w in rng.sample(VOCAB, rng.randint(2, len(VOCAB)))}
            nm = rng.randint(1, 15)
            got = bpe_train(list(hist.items()), num_merges=nm)
            want = naive_train(hist, nm)
            assert got == want, (trial, hist, nm)

    def test_histogram_row_order_invariance(self):
        hist = [("newest", 6), ("widest", 3), ("lower", 2), ("low", 5)]
        a = bpe_train(hist, num_merges=10)
        b = bpe_train(list(reversed(hist)), num_merges=10)
        assert a == b

    def test_stops_when_no_pair_repeats(self):
        assert bpe_train([("ab", 1), ("cd", 1)], num_merges=10) == []
        # single repeated word keeps merging to one symbol
        m = bpe_train([("abc", 2)], num_merges=10)
        assert len(m) == 2 and "".join([m[0][0], m[0][1]]) in ("ab", "bc")

    def test_arrow_table_input(self):
        t = pa.table({"word": ["newest", "widest"], "n": [6, 3]})
        assert bpe_train(t, 4) == naive_train({"newest": 6, "widest": 3}, 4)


class TestEncodeWord:
    def _ranks(self, merges):
        return {(l, r): i for i, (l, r, *_x) in enumerate(merges)}

    def test_concatenation_preserved(self):
        merges = bpe_train([("newest", 5), ("widest", 3), ("new", 2)], 10)
        ranks = self._ranks(merges)
        for w in VOCAB:
            for word in w.split():
                assert "".join(bpe_encode_word(word, ranks)) == word

    def test_no_merges_is_characters(self):
        assert bpe_encode_word("abc", {}) == ["a", "b", "c"]
        assert bpe_encode_word("", {}) == []

    def test_trained_word_becomes_one_token(self):
        merges = bpe_train([("newest", 5)], 10)
        assert bpe_encode_word("newest", self._ranks(merges)) == ["newest"]


class TestDistributed:
    def _docs(self):
        rng = random.Random(13)
        texts = []
        for i in range(200):
            k = rng.randint(0, 12)
            texts.append(" ".join(rng.choice(VOCAB[:13]) for _ in range(k))
                         if k else "")
        texts[5] = None
        texts[6] = "   "
        return pa.table({"doc_id": [f"d{i:04d}" for i in range(200)],
                         "text": pa.array(texts, pa.string())})

    def _local_hist(self, t):
        counts = {}
        for s in t.column("text").to_pylist():
            for w in (s or "").split():
                counts[w] = counts.get(w, 0) + 1
        return counts

    def test_word_histogram_exact(self, ray_session):
        import ray.data as rd

        t = self._docs()
        got = {r["word"]: r["n"]
               for r in word_histogram(rd.from_arrow(t.select(
                   ["text"])).repartition(8)).take_all()}
        assert got == self._local_hist(t)

    def test_word_histogram_truncation_accounting(self, ray_session):
        import ray.data as rd

        t = self._docs()
        full = self._local_hist(t)
        got = word_histogram(rd.from_arrow(t.select(["text"]))
                             .repartition(8), max_words=3).take_all()
        rows = {r["word"]: r["n"] for r in got}
        top3 = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert {w: n for w, n in top3}.items() <= rows.items()
        # sentinel carries exactly the dropped mass; nothing silent
        assert rows[""] == sum(full.values()) - sum(n for _, n in top3)
        assert sum(rows.values()) == sum(full.values())

    def test_train_table_matches_reference_on_corpus(self, ray_session):
        import ray.data as rd

        t = self._docs()
        mt = bpe_train_table(rd.from_arrow(t), num_merges=25)
        want = naive_train(self._local_hist(t), 25)
        got = list(zip(mt.column("left").to_pylist(),
                       mt.column("right").to_pylist(),
                       mt.column("pair_count").to_pylist()))
        assert got == want
        assert mt.column("rank").to_pylist() == list(range(len(want)))

    def test_encode_matches_driver_reference(self, ray_session):
        import ray.data as rd

        t = self._docs()
        mt = bpe_train_table(rd.from_arrow(t), num_merges=25)
        enc = bpe_encode(rd.from_arrow(t).repartition(8), mt,
                         emit_tokens=True).to_pandas().set_index("doc_id")
        ranks = {(l, r): i for i, (l, r) in
                 enumerate(zip(mt.column("left").to_pylist(),
                               mt.column("right").to_pylist()))}
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            want = []
            for w in (text or "").split():
                want.extend(bpe_encode_word(w, ranks))
            row = enc.loc[doc_id]
            assert row["n_bpe_tokens"] == len(want), doc_id
            assert list(row["tokens"]) == want, doc_id

    def test_encoder_stage_standalone(self):
        merges = [("e", "s"), ("es", "t")]
        stage = BpeEncoder(merges, key_col="doc_id", text_col="text")
        out = stage(pa.table({"doc_id": ["a", "b", "c"],
                              "text": ["test best", None, ""]}))
        # t-est (2) + b-est (2)
        assert out.column("n_bpe_tokens").to_pylist() == [4, 0, 0]
