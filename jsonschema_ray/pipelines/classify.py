"""Distributed model-based quality classification: multinomial Naive
Bayes trained by counting.

The fastText-style "quality classifier" of large-scale curation
pipelines (label a weak good/bad signal, train a linear text
classifier, score every document) — restructured for Ray Data so that
TRAINING IS A COUNTING SHUFFLE: the corpus streams once through
``map_batches`` emitting thin ``(token, c0, c1)`` partials (the text
never shuffles), one small ``groupby('token')`` merges them, and the
resulting log-likelihood-ratio table broadcasts via ``ray.put`` to a
scoring actor pool. No gradient loop, no epochs, no driver-side data
pass — a 100 TB corpus costs exactly one streaming read for training
and one for scoring.

Numerics follow the unigram-LM precedent (``textops.py``): every
per-token weight is quantized to INTEGER MICRO-NATS with one
``floor(1e6 * (ln r1 - ln r0) + 0.5)`` per token — the identical libm
expression DuckDB evaluates — so per-document sums are exact integer
arithmetic and the whole pipeline is SQL-oracleable bit-for-bit
(ORACLE['nb_quality_scores']).

Smoothing: add-one (Laplace) over the vocabulary; class prior as
``ln(N1+1) - ln(N0+1)``. With ``vocab_top_k`` set, out-of-vocabulary
tokens take the count-0 smoothed weight — at test scale the vocabulary
is never truncated so results stay bit-identical to the exact
computation (the same contract the unigram LM documents).

No reference analog (the reference has no classifier); LLM-ops
requirement from the round brief.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["nb_train", "nb_quality_scores", "NbScorer"]

_MODEL_SCHEMA = pa.schema([("token", pa.string()),
                           ("c0", pa.int64()), ("c1", pa.int64())])


def _label_array(batch: pa.Table, label_col: str,
                 threshold: int) -> np.ndarray:
    """Weak label: 1 when ``label_col >= threshold`` (int-exact)."""
    col = batch.column(label_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False)
    return (vals >= threshold).astype(np.int64)


def _doc_tokens(batch: pa.Table, text_col: str):
    """→ (list-of-token ListArray, flat tokens, per-doc lengths)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    split = pc.utf8_split_whitespace(col.fill_null(""))
    # drop empty tokens while PRESERVING the per-doc list structure:
    # filter the flat child and rebuild offsets from per-doc counts
    flat = pc.list_flatten(split)
    keep = pc.not_equal(flat, "")
    lengths = pc.list_value_length(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(flat):
        ends = np.cumsum(lengths)
        starts = ends - lengths
        kn = keep.to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(kn.astype(np.int64))])
        lengths = csum[ends] - csum[starts]
        flat = flat.filter(keep)
    return flat, lengths


def nb_train(source, text_col: str = "text", label_col: str = "n_chars",
             threshold: int = 200, vocab_top_k: int | None = None):
    """Distributed NB training → (model: pa.Table(token, c0, c1),
    totals: dict). One streaming pass: per batch, in-batch
    ``(token, label)`` count partials; one ``groupby('token')``
    merges them. ``totals`` carries T0/T1 (token mass per class),
    V (vocabulary size), N0/N1 (document counts per class) — all
    integers. ``vocab_top_k`` truncates to the most frequent tokens
    (count desc, token asc) with the dropped mass still counted in
    T0/T1, so OOV smoothing stays exact."""
    from ray.data.aggregate import Sum

    from jsonschema_ray.sources.readers import as_source

    ds = as_source(source).dataset(columns=[text_col, label_col])

    def partial(t: pa.Table) -> pa.Table:
        y = _label_array(t, label_col, threshold)
        flat, lengths = _doc_tokens(t, text_col)
        n1_docs = int(y.sum())
        n0_docs = int(len(y) - n1_docs)
        # per-block doc counts ride on a token='' carrier row ('' is
        # impossible as a real token, and Ray's sort shuffle rejects
        # null group keys — see raycompat.NULL_GROUP_KEY)
        carrier = pa.table({"token": pa.array([""], pa.string()),
                            "c0": pa.array([0], pa.int64()),
                            "c1": pa.array([0], pa.int64()),
                            "n0": pa.array([n0_docs], pa.int64()),
                            "n1": pa.array([n1_docs], pa.int64())})
        if not len(flat):
            return carrier
        tok_label = np.repeat(y, lengths)
        g = pa.table({"token": flat,
                      "c0": pa.array((1 - tok_label), pa.int64()),
                      "c1": pa.array(tok_label, pa.int64())}) \
            .group_by("token").aggregate([("c0", "sum"), ("c1", "sum")])
        n = g.num_rows
        body = pa.table({
            "token": g.column("token"),
            "c0": g.column("c0_sum"), "c1": g.column("c1_sum"),
            "n0": pa.array(np.zeros(n, np.int64)),
            "n1": pa.array(np.zeros(n, np.int64))})
        return pa.concat_tables([carrier, body])

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    n0 = int(parts.sum("n0") or 0)
    n1 = int(parts.sum("n1") or 0)
    # vocab-cardinality groupby: hashed-bucket shuffle + vectorized
    # in-bucket pandas agg (Ray's aggregate pays ~ms of Python per
    # group — see stages/hashagg.py)
    from jsonschema_ray.stages.hashagg import hash_group_agg

    agg = hash_group_agg(parts, "token",
                         {"c0": ("c0", "sum"), "c1": ("c1", "sum")})
    batches = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
               else b for b in agg.iter_batches(batch_format="pyarrow")]
    model = pa.concat_tables([b.select(["token", "c0", "c1"])
                              .cast(_MODEL_SCHEMA) for b in batches]) \
        if batches else _MODEL_SCHEMA.empty_table()
    model = model.filter(pc.not_equal(model.column("token"), ""))
    t0 = int(pc.sum(model.column("c0")).as_py() or 0)
    t1 = int(pc.sum(model.column("c1")).as_py() or 0)
    v = model.num_rows
    if vocab_top_k is not None and model.num_rows > vocab_top_k:
        total = pc.add(model.column("c0"), model.column("c1"))
        model = model.append_column("_t", total)
        order = pc.sort_indices(model, sort_keys=[("_t", "descending"),
                                                  ("token", "ascending")])
        model = model.take(order.slice(0, vocab_top_k)) \
            .select(["token", "c0", "c1"])
    totals = {"T0": t0, "T1": t1, "V": v, "N0": n0, "N1": n1}
    return model, totals


def _quantize_llr(c0: np.ndarray, c1: np.ndarray, totals: dict
                  ) -> np.ndarray:
    """floor(1e6 * (ln r1 - ln r0) + 0.5) in int64 — one floor per
    token, the identical expression the SQL oracle evaluates."""
    r1 = (c1 + 1.0) / float(totals["T1"] + totals["V"])
    r0 = (c0 + 1.0) / float(totals["T0"] + totals["V"])
    return np.floor(1e6 * (np.log(r1) - np.log(r0)) + 0.5).astype(np.int64)


def _prior_q(totals: dict) -> int:
    return int(math.floor(1e6 * (math.log(totals["N1"] + 1)
                                 - math.log(totals["N0"] + 1)) + 0.5))


class NbScorer:
    """Actor stage: text → (n_tokens, nb_llr, predicted). The
    token→micro-nat LLR table builds ONCE per actor from the broadcast
    model; scoring is a vectorized searchsorted gather over the flat
    token stream + per-doc segment sums — no Python loop over rows."""

    def __init__(self, model, totals: dict, key_col: str = "doc_id",
                 text_col: str = "text", oov_q: int | None = None):
        import ray

        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        toks = np.asarray(model.column("token").to_pylist(), dtype=object)
        c0 = model.column("c0").to_numpy(zero_copy_only=False)
        c1 = model.column("c1").to_numpy(zero_copy_only=False)
        q = _quantize_llr(c0.astype(np.float64), c1.astype(np.float64),
                          totals)
        order = np.argsort(toks)
        self.toks = toks[order]
        self.q = q[order]
        # OOV: the count-0 smoothed weight (exact under truncation)
        self.oov_q = int(np.floor(
            1e6 * (np.log(1.0 / (totals["T1"] + totals["V"]))
                   - np.log(1.0 / (totals["T0"] + totals["V"]))) + 0.5)) \
            if oov_q is None else oov_q
        self.prior_q = _prior_q(totals)
        self.key_col = key_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, lengths = _doc_tokens(batch, self.text_col)
        n = batch.num_rows
        if len(flat):
            fl = np.asarray(flat.to_pylist(), dtype=object)
            idx = np.searchsorted(self.toks, fl)
            idx = np.clip(idx, 0, max(0, len(self.toks) - 1))
            hit = (self.toks[idx] == fl) if len(self.toks) else \
                np.zeros(len(fl), bool)
            per_tok = np.where(hit, self.q[idx] if len(self.q) else 0,
                               self.oov_q)
            csum = np.concatenate([[0], np.cumsum(per_tok)])
            ends = np.cumsum(lengths)
            starts = ends - lengths
            sums = csum[ends] - csum[starts]
        else:
            sums = np.zeros(n, np.int64)
        llr = self.prior_q + sums
        return pa.table({
            self.key_col: batch.column(self.key_col),
            "n_tokens": pa.array(lengths, pa.int64()),
            "nb_llr": pa.array(llr, pa.int64()),
            "predicted": pa.array((llr > 0).astype(np.int32), pa.int32()),
        })


def nb_quality_scores(source, key_col: str = "doc_id",
                      text_col: str = "text", label_col: str = "n_chars",
                      threshold: int = 200,
                      vocab_top_k: int | None = None, *,
                      concurrency=(2, 8), batch_size: int = 4096):
    """End-to-end distributed train + score → Dataset ``(key,
    n_tokens, nb_llr, predicted)``. Training is one counting shuffle;
    the LLR model ships once via ``ray.put`` and scores in a second
    streaming pass."""
    import ray

    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)
    model, totals = nb_train(src, text_col=text_col, label_col=label_col,
                             threshold=threshold, vocab_top_k=vocab_top_k)
    ref = ray.put(model)
    ds = src.dataset(columns=[key_col, text_col])
    return ds.map_batches(
        NbScorer,
        fn_constructor_kwargs={"model": ref, "totals": totals,
                               "key_col": key_col, "text_col": text_col},
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")
