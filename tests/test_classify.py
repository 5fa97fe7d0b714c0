"""Naive-Bayes quality classifier: training counts pinned against a
driver recount, integer micro-nat scoring pinned against an
independent per-doc reference (and, in the registry, bit-exact vs
DuckDB — ORACLE['nb_quality_scores']), truncation/OOV exactness, and
degenerate corpora (one class, empty, null text)."""

import math
import random

import numpy as np
import pyarrow as pa

from jsonschema_ray.pipelines.classify import (NbScorer, nb_quality_scores,
                                               nb_train)

VOCAB = ["alpha", "beta", "gamma", "δέλτα", "ε", "zz"]


def make_docs(n=120, seed=3):
    rng = random.Random(seed)
    texts, chars = [], []
    for i in range(n):
        k = rng.randint(0, 9)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(k))
                     if k else "")
        chars.append(rng.randint(50, 400))
    texts[3] = None
    texts[4] = "  \t "
    return pa.table({"doc_id": [f"d{i:03d}" for i in range(n)],
                     "text": pa.array(texts, pa.string()),
                     "n_chars": pa.array(chars, pa.int64())})


def local_counts(t, threshold=200):
    counts, n0, n1 = {}, 0, 0
    for text, c in zip(t.column("text").to_pylist(),
                       t.column("n_chars").to_pylist()):
        y = 1 if c >= threshold else 0
        n1 += y
        n0 += 1 - y
        for w in (text or "").split():
            c0, c1 = counts.get(w, (0, 0))
            counts[w] = (c0 + 1 - y, c1 + y)
    return counts, n0, n1


def reference_scores(t, threshold=200):
    counts, n0, n1 = local_counts(t, threshold)
    t0 = sum(c0 for c0, _ in counts.values())
    t1 = sum(c1 for _, c1 in counts.values())
    v = len(counts)
    pq = math.floor(1e6 * (math.log(n1 + 1) - math.log(n0 + 1)) + 0.5)
    out = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        s = 0
        toks = (text or "").split()
        for w in toks:
            c0, c1 = counts[w]
            s += math.floor(1e6 * (math.log((c1 + 1) / (t1 + v))
                                   - math.log((c0 + 1) / (t0 + v)))
                            + 0.5)
        out[doc_id] = (len(toks), pq + s)
    return out


class TestTrain:
    def test_counts_exact(self, ray_session):
        import ray.data as rd

        t = make_docs()
        model, totals = nb_train(rd.from_arrow(t).repartition(8))
        want, n0, n1 = local_counts(t)
        got = {tok: (c0, c1) for tok, c0, c1 in
               zip(model.column("token").to_pylist(),
                   model.column("c0").to_pylist(),
                   model.column("c1").to_pylist())}
        assert got == want
        assert totals["N0"] == n0 and totals["N1"] == n1
        assert totals["V"] == len(want)
        assert totals["T0"] == sum(c for c, _ in want.values())
        assert totals["T1"] == sum(c for _, c in want.values())

    def test_truncation_keeps_total_mass(self, ray_session):
        import ray.data as rd

        t = make_docs()
        model, totals = nb_train(rd.from_arrow(t), vocab_top_k=2)
        full, _, _ = local_counts(t)
        assert model.num_rows == 2
        # totals reflect the FULL corpus, not the truncated vocab —
        # the OOV smoothed weight stays exact
        assert totals["T0"] == sum(c for c, _ in full.values())
        assert totals["T1"] == sum(c for _, c in full.values())
        assert totals["V"] == len(full)
        top2 = sorted(full.items(),
                      key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0]))[:2]
        assert sorted(model.column("token").to_pylist()) == \
            sorted(w for w, _ in top2)


class TestScore:
    def test_distributed_matches_reference(self, ray_session):
        import ray.data as rd

        t = make_docs()
        got = nb_quality_scores(rd.from_arrow(t).repartition(8)) \
            .to_pandas().set_index("doc_id")
        want = reference_scores(t)
        for doc_id, (n_tok, llr) in want.items():
            row = got.loc[doc_id]
            assert row["n_tokens"] == n_tok, doc_id
            assert row["nb_llr"] == llr, doc_id
            assert row["predicted"] == (1 if llr > 0 else 0), doc_id

    def test_oov_under_truncation(self, ray_session):
        import ray.data as rd

        t = make_docs()
        model, totals = nb_train(rd.from_arrow(t), vocab_top_k=2)
        scorer = NbScorer(model, totals)
        out = scorer(pa.table({"doc_id": ["x"],
                               "text": ["never-seen-token"]}))
        oov = math.floor(1e6 * (math.log(1 / (totals["T1"] + totals["V"]))
                                - math.log(1 / (totals["T0"]
                                                + totals["V"]))) + 0.5)
        pq = math.floor(1e6 * (math.log(totals["N1"] + 1)
                               - math.log(totals["N0"] + 1)) + 0.5)
        assert out.column("nb_llr").to_pylist() == [pq + oov]

    def test_single_class_corpus(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": ["a", "b"],
                      "text": ["alpha beta", "alpha"],
                      "n_chars": pa.array([300, 400], pa.int64())})
        got = nb_quality_scores(rd.from_arrow(t)).to_pandas()
        assert len(got) == 2
        # all-positive corpus: every token and the prior favor class 1
        assert (got["predicted"] == 1).all()

    def test_empty_and_null_docs(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": ["a", "b", "c"],
                      "text": pa.array([None, "", "alpha"], pa.string()),
                      "n_chars": pa.array([10, 300, 250], pa.int64())})
        got = nb_quality_scores(rd.from_arrow(t)).to_pandas() \
            .set_index("doc_id")
        assert got.loc["a", "n_tokens"] == 0
        assert got.loc["b", "n_tokens"] == 0
        # token-less docs score exactly the prior
        assert got.loc["a", "nb_llr"] == got.loc["b", "nb_llr"]
