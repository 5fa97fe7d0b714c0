"""Distributed BPE tokenizer training + apply.

The reference engine tokenizes only implicitly (string length in code
points, regex assertions); a training-data pipeline at 100 TB needs a
real trainable subword tokenizer. This module implements byte-pair
encoding (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") restructured for Ray Data:

- ``word_histogram``  — the DATA-SCALE pass: one streaming
  ``map_batches`` over the corpus emitting one thin ``(word, n)`` row
  per DISTINCT word per block (the text itself never shuffles),
  pre-aggregated partials → one small ``groupby('word').sum`` →
  optional top-K truncation with explicit ``n_dropped_words``
  accounting. This is the only stage that touches every byte.
- ``bpe_train``       — the classic merge loop over the CAPPED word
  histogram on the driver, exactly the shape HuggingFace tokenizers'
  train-from-iterator uses: the histogram is orders of magnitude
  smaller than the corpus (bounded by ``max_words``), and pair counts
  are maintained INCREMENTALLY (only words containing the merged pair
  are re-scanned), so training cost is independent of corpus size.
  Fully deterministic: ties break on (count desc, left asc, right
  asc), no dict-iteration-order dependence.
- ``bpe_encode``      — apply: merge ranks are built once per actor
  (``BpeEncoder.__init__`` from a broadcast merges list), each batch
  encodes every DISTINCT word once (Arrow ``value_counts`` dedup —
  the per-word greedy merge loop runs on unique words only, then
  fans back out with a vectorized gather).

No reference-file analog (the reference has no tokenizer); LLM-ops
requirement from the round brief. Oracle strategy: the histogram
stage is SQL-exact (same whitespace contract as ``token_topk``); the
merge loop and encoder are pinned against an independent quadratic
reference implementation in ``tests/test_tokenizer.py`` (rows-only
for the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["word_histogram", "bpe_train", "bpe_train_table",
           "bpe_encode", "BpeEncoder"]

_HIST_SCHEMA = pa.schema([("word", pa.string()), ("n", pa.int64())])


def _collect(ds) -> pa.Table:
    """Bounded driver pull of a thin (word, n) dataset → Arrow."""
    batches = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
               else b for b in ds.iter_batches(batch_format="pyarrow")]
    if not batches:
        return _HIST_SCHEMA.empty_table()
    return pa.concat_tables([b.cast(_HIST_SCHEMA) for b in batches])


def word_histogram(source, text_col: str = "text",
                   max_words: int | None = None):
    """Distributed word-frequency histogram → Dataset ``(word, n)``
    [+ one ``(word='', n_dropped_words)`` accounting row when
    ``max_words`` truncates]. Whitespace tokenization, empty tokens
    dropped, null text as '' — the corpus-wide contract shared with
    ``token_topk`` / the unigram LM."""
    import ray
    from ray.data.aggregate import Sum

    from jsonschema_ray.sources.readers import as_source

    ds = as_source(source).dataset(columns=[text_col])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(pc.utf8_split_whitespace(col.fill_null("")))
        if len(toks):
            toks = toks.filter(pc.not_equal(toks, ""))
        if not len(toks):
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(max(2, cpus))
    from jsonschema_ray.stages.hashagg import hash_group_agg

    agg = hash_group_agg(parts, "word", {"n": ("n", "sum")})
    if max_words is None:
        return agg
    # Top-K truncation (count desc, word asc — deterministic), with
    # the dropped token MASS accounted in one sentinel row (word='',
    # impossible as a real token) so no cap is silent. Same
    # materialize-the-partials shape as the unigram-LM vocabulary
    # (textops.py): the corpus streams exactly once; only the thin
    # (word, n) partials are re-read for the total.
    import ray.data as rd

    parts = parts.materialize()
    agg = hash_group_agg(parts, "word", {"n": ("n", "sum")}).materialize()
    if agg.count() <= max_words:
        return agg
    head = _collect(agg.sort(["n", "word"], descending=[True, False])
                    .limit(max_words))
    total = int(parts.sum("n") or 0)
    dropped = total - int(pc.sum(head.column("n")).as_py() or 0)
    sentinel = pa.table({"word": pa.array([""], pa.string()),
                         "n": pa.array([dropped], pa.int64())})
    return rd.from_arrow(pa.concat_tables([head, sentinel]))


def _pair_stats(words: list[tuple[str, ...]], counts: list[int]):
    """pair → (total count, set of word indices containing it)."""
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, n) in enumerate(zip(words, counts)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
            pair_words.setdefault((a, b), set()).add(wi)
    return pair_counts, pair_words


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]
                ) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right occurrence of
    ``pair`` in ``syms`` with the concatenated symbol."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(histogram: "pa.Table | list[tuple[str, int]]",
              num_merges: int = 200) -> list[tuple[str, str, int]]:
    """Classic BPE merge loop over a word histogram → ordered list of
    ``(left, right, pair_count)`` merges. Words are sequences of
    Unicode code points (GPT-2-style: no end-of-word marker; merges
    never cross word boundaries). Incremental pair maintenance: after
    a merge only the words that CONTAIN the pair are re-scanned.
    Deterministic: argmax ties break (count desc, left asc, right
    asc); training stops early when no pair occurs twice."""
    if isinstance(histogram, pa.Table):
        pairs_in = list(zip(histogram.column("word").to_pylist(),
                            histogram.column("n").to_pylist()))
    else:
        pairs_in = list(histogram)
    # deterministic word order regardless of histogram row order
    pairs_in.sort(key=lambda r: (-r[1], r[0]))
    words = [tuple(w) for w, _ in pairs_in if w]
    counts = [int(n) for w, n in pairs_in if w]
    pair_counts, pair_words = _pair_stats(words, counts)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c < 2:
                continue
            key = (-c, p[0], p[1])
            if best is None or key < best[0]:
                best = (key, p, c)
        if best is None:
            break
        _, pair, c = best
        merges.append((pair[0], pair[1], c))
        # re-scan only the words containing the merged pair,
        # subtracting their old pair contributions and adding new ones
        affected = sorted(pair_words.get(pair, ()))
        for wi in affected:
            syms, n = words[wi], counts[wi]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= n
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[(a, b)]
            merged = _merge_word(syms, pair)
            words[wi] = merged
            for a, b in zip(merged, merged[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def bpe_train_table(source, text_col: str = "text",
                    num_merges: int = 200,
                    max_words: int = 100_000) -> pa.Table:
    """End-to-end distributed train → Arrow table ``(rank, left,
    right, pair_count)``. The corpus pass is ``word_histogram``
    (streamed, thin shuffle); the driver pull is bounded by
    ``max_words`` histogram rows — the documented scale contract, as
    for the unigram-LM vocabulary."""
    hist = word_histogram(source, text_col=text_col, max_words=max_words)
    t = _collect(hist)
    # drop the truncation sentinel (word='') if present
    t = t.filter(pc.not_equal(t.column("word"), ""))
    merges = bpe_train(t, num_merges=num_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int32()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64()),
    })


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]
                    ) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair (the standard GPT-2 apply loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor stage: text → BPE token count (and optionally the token
    list). Merge ranks build ONCE per actor from the broadcast merges
    list; per batch, every DISTINCT word is encoded once and the
    result fans back out with a vectorized gather."""

    def __init__(self, merges: "list[tuple[str, str]] | object",
                 key_col: str = "doc_id", text_col: str = "text",
                 emit_tokens: bool = False):
        import ray

        if isinstance(merges, ray.ObjectRef):
            merges = ray.get(merges)
        self.ranks = {(left, right): i
                      for i, (left, right, *_rest) in enumerate(merges)}
        self.key_col = key_col
        self.text_col = text_col
        self.emit_tokens = emit_tokens
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        word_lists = pc.utf8_split_whitespace(col.fill_null(""))
        flat = pc.list_flatten(word_lists)
        lengths = pc.list_value_length(word_lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq = pc.unique(flat).to_pylist()
        n_tok = {w: len(bpe_encode_word(w, self.ranks)) if w else 0
                 for w in uniq}
        per_word = np.array([n_tok[w] for w in flat.to_pylist()],
                            np.int64) if len(flat) else np.empty(0, np.int64)
        # per-doc sums: segment the flat word stream by list lengths
        ends = np.cumsum(lengths)
        starts = ends - lengths
        csum = np.concatenate([[0], np.cumsum(per_word)])
        doc_tokens = csum[ends] - csum[starts]
        cols = {self.key_col: batch.column(self.key_col),
                "n_bpe_tokens": pa.array(doc_tokens, pa.int64())}
        if self.emit_tokens:
            toks = []
            for lst in word_lists.to_pylist():
                out: list[str] = []
                for w in lst:
                    if w:
                        out.extend(bpe_encode_word(w, self.ranks))
                toks.append(out)
            cols["tokens"] = pa.array(toks, pa.list_(pa.string()))
        return pa.table(cols)


def bpe_encode(source, merges, key_col: str = "doc_id",
               text_col: str = "text", emit_tokens: bool = False, *,
               concurrency=(2, 8), batch_size: int = 4096):
    """Distributed apply → Dataset ``(key, n_bpe_tokens[, tokens])``.
    ``merges`` is the output of ``bpe_train``/``bpe_train_table`` (a
    list of (left, right[, count]) or that Arrow table); it is
    ``ray.put`` ONCE and read per actor, never re-shipped per batch."""
    import ray

    from jsonschema_ray.sources.readers import as_source

    if isinstance(merges, pa.Table):
        merges = list(zip(merges.column("left").to_pylist(),
                          merges.column("right").to_pylist()))
    ref = ray.put(list(merges))
    ds = as_source(source).dataset(columns=[key_col, text_col])
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": ref, "key_col": key_col,
                               "text_col": text_col,
                               "emit_tokens": emit_tokens},
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")
