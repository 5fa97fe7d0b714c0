"""Text-analysis operators over document tables.

Training-data-pipeline staples (large-scale curation): token counting,
quality scoring, language-ID and document fingerprinting — each a
vectorized ``map_batches`` stage over Arrow string columns (regex
kernels are RE2 via pyarrow.compute; counts, never Python loops over
rows).

These run over any table with a text column (the sandbox testdata
``documents`` table, or flattened ``spans.text``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.functions.sketches import hash64

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.!?,;:]"
UPPER_RE = r"[A-Z]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "es": ["el", "la", "de", "los", "que", "un", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht"],
}


def _count_re(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null text counts as empty (the repo-wide null-text contract --
    # matches the oracles' COALESCE(text, ''))
    return pc.count_substring_regex(col.fill_null(""), pattern)


def add_token_count(batch: pa.Table, text_col: str = "text",
                    out_col: str = "n_tokens") -> pa.Table:
    n = _count_re(batch.column(text_col), TOKEN_RE)
    return batch.append_column(out_col, n.cast(pa.int64()))


def add_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: token count, punctuation / stopword /
    uppercase ratios. Ratios are per-char or per-token, rounded to 4
    decimals for cross-engine comparability."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.fill_null("")
    n_chars = pc.utf8_length(col).cast(pa.float64())
    n_tokens = _count_re(col, TOKEN_RE).cast(pa.int64())
    n_punct = _count_re(col, PUNCT_RE).cast(pa.float64())
    stop_pat = r"\b(" + "|".join(LANG_PROFILES["en"]) + r")\b"
    n_stop = _count_re(col, stop_pat).cast(pa.float64())
    n_upper = _count_re(col, UPPER_RE).cast(pa.float64())

    def ratio(num, den):
        r = pc.if_else(pc.greater(den, 0.0), pc.divide(num, den), 0.0)
        return pc.round(r, ndigits=4)

    batch = batch.append_column("n_tokens", n_tokens)
    batch = batch.append_column("punct_ratio", ratio(n_punct, n_chars))
    batch = batch.append_column(
        "stop_ratio", ratio(n_stop, n_tokens.cast(pa.float64())))
    batch = batch.append_column("upper_ratio", ratio(n_upper, n_chars))
    return batch


def add_langid(batch: pa.Table, text_col: str = "text",
               out_col: str = "lang_pred") -> pa.Table:
    """Stopword-profile language ID: count hits per language profile,
    argmax (ties → profile order; no hits → 'und')."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.fill_null("")
    langs = list(LANG_PROFILES)
    scores = np.zeros((len(col), len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        pat = r"\b(" + "|".join(LANG_PROFILES[lang]) + r")\b"
        scores[:, j] = pc.count_substring_regex(col, pat) \
            .fill_null(0).to_numpy(zero_copy_only=False)
    best = np.argmax(scores, axis=1)
    pred = np.asarray(langs, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = "und"
    return batch.append_column(out_col, pa.array(pred, type=pa.string()))


# the Gopher rule-set stopwords (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", quality-filtering appendix — public rule set)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def add_gopher_flags(batch: pa.Table, text_col: str = "text",
                     min_words: int = 50, max_words: int = 100_000) -> pa.Table:
    """The Gopher quality-filter rule set as exact integer arithmetic
    (Rae et al. 2021): word-count bounds, mean word length in [3, 10],
    symbol-to-word ratio (``#`` / ellipsis) ≤ 0.1, ≥80% of words
    containing an alphabetic character, and ≥2 distinct stopwords
    present.  Every ratio test is an integer cross-multiplication
    (``3·n ≤ chars ≤ 10·n``) so the flags hash identically across
    engines — no float thresholds.  Pure vectorized RE2 kernels, zero
    shuffle; appends count columns + one bool flag per rule + ``passes``.
    """
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.fill_null("")
    i64 = pa.int64()
    n_words = pc.count_substring_regex(col, TOKEN_RE).cast(i64)
    word_chars = pc.subtract(
        pc.utf8_length(col).cast(i64),
        pc.count_substring_regex(col, r"\s").cast(i64))
    n_alpha = pc.count_substring_regex(
        col, r"[^\s]*[A-Za-z][^\s]*").cast(i64)
    n_symbols = pc.add(
        pc.count_substring(col, "#").cast(i64),
        pc.count_substring_regex(col, r"\.\.\.|…").cast(i64))
    n_stop = None
    for w in GOPHER_STOPWORDS:
        hit = pc.match_substring_regex(col, rf"\b{w}\b").cast(i64)
        n_stop = hit if n_stop is None else pc.add(n_stop, hit)

    def _mul(a, k):
        return pc.multiply(a, pa.scalar(k, type=i64))

    f_words = pc.and_(pc.greater_equal(n_words, min_words),
                      pc.less_equal(n_words, max_words))
    f_mean = pc.and_(pc.less_equal(_mul(n_words, 3), word_chars),
                     pc.less_equal(word_chars, _mul(n_words, 10)))
    f_symbol = pc.less_equal(_mul(n_symbols, 10), n_words)
    f_alpha = pc.greater_equal(_mul(n_alpha, 5), _mul(n_words, 4))
    f_stop = pc.greater_equal(n_stop, 2)
    passes = pc.and_(pc.and_(pc.and_(f_words, f_mean),
                             pc.and_(f_symbol, f_alpha)), f_stop)
    for name, arr in [("n_words", n_words), ("word_chars", word_chars),
                      ("n_alpha_words", n_alpha), ("n_symbols", n_symbols),
                      ("n_stop_distinct", n_stop),
                      ("flag_word_count", f_words),
                      ("flag_mean_word_len", f_mean),
                      ("flag_symbol_ratio", f_symbol),
                      ("flag_alpha_words", f_alpha),
                      ("flag_stopwords", f_stop), ("passes", passes)]:
        batch = batch.append_column(name, arr)
    return batch


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    """64-bit document fingerprint: hash of the full text (content
    identity key for exact dedup — cheap, order-sensitive)."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False)
    h = hash64(vals.astype(object))
    return batch.append_column(out_col, pa.array(h.astype(np.uint64)))


def winnow_fingerprints(source, key_col: str, text_col: str = "text",
                        shingle_k: int = 3, window: int = 4,
                        token_hash=hash64):
    """MOSS-style WINNOWING document fingerprints (Schleimer et al.,
    SIGMOD'03): per document, slide a ``window`` over the word-k-shingle
    hash stream and select each window's minimum hash (leftmost on
    ties); the DISTINCT selected (position, hash) set is the
    fingerprint — guaranteeing any shared run of ``window + k - 1``
    tokens yields a shared fingerprint. → Dataset (key, pos, fp),
    ``fp`` as a decimal string (uint64 exceeds BIGINT).

    Fully vectorized across document boundaries: one
    ``sliding_window_view`` over the batch-flat hash stream with
    cross-document windows masked out — no per-doc Python loop. Docs
    with fewer than ``window`` shingles emit nothing (no full window).
    With ``token_hash=md5_hash64`` the whole chain is re-derivable in
    SQL (see ORACLE['winnow_fingerprints'])."""
    from numpy.lib.stride_tricks import sliding_window_view

    from jsonschema_ray.pipelines.dedup import _shingle_hashes
    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)
    w = window

    def kern(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        d, h = _shingle_hashes(texts, shingle_k, token_hash=token_hash)
        empty = pa.table({key_col: keys.slice(0, 0),
                          "pos": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.string())})
        if len(h) < w:
            return empty
        wins = sliding_window_view(h, w)              # (n-w+1, w)
        valid = d[: len(d) - w + 1] == d[w - 1:]      # window within one doc
        am = wins.argmin(axis=1)                      # first min = leftmost
        gsel = np.unique(np.arange(len(am))[valid] + am[valid])
        if not len(gsel):
            return empty
        counts = np.bincount(d, minlength=len(texts))
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        dsel = d[gsel]
        return pa.table({
            key_col: keys.take(pa.array(dsel)),
            "pos": pa.array((gsel - starts[dsel]).astype(np.int64)),
            "fp": pa.array(h[gsel].astype(np.str_).astype(object),
                           pa.string()),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        kern, batch_format="pyarrow")


def token_topk(source, text_col: str = "text", k: int = 20,
               capacity: int | None = None) -> pa.Table:
    """Top-k token frequencies over a corpus.

    ``capacity=None`` → EXACT: per-batch Arrow ``value_counts`` on the
    flat token stream (each batch ships one thin (token, n) row per
    DISTINCT token — the text never shuffles), pre-aggregated partials
    → one small groupby → global sort + limit.

    ``capacity=N`` → Misra-Gries scale path: each block folds into an
    N-counter summary, summaries tree-merge on the driver (scalars, no
    shuffle at all); counts are lower bounds within N_tokens/(N+1)
    (``functions.sketches.MisraGries``). Use when the vocabulary itself
    is too big to shuffle (e.g. raw n-grams at 100 TB)."""
    import ray
    from ray.data.aggregate import Sum

    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)
    ds = src.dataset(columns=[text_col])

    if capacity is not None:
        from jsonschema_ray.functions.sketches import MisraGries

        def summarize(t: pa.Table) -> pa.Table:
            col = t.column(text_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            toks = pc.list_flatten(
                pc.utf8_split_whitespace(col.fill_null("")))
            if len(toks):
                toks = toks.filter(pc.not_equal(toks, ""))
            mg = MisraGries(capacity)
            if len(toks):
                vc = toks.value_counts()
                mg.add_counts(vc.field("values").to_pylist(),
                              vc.field("counts").to_pylist())
            return pa.table({"mg": pa.array([mg.serialize()],
                                            pa.binary())})

        mg = MisraGries(capacity)
        for b in ds.map_batches(summarize, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for s in b.column("mg").to_pylist():
                mg = mg.merge(MisraGries.deserialize(s))
        rows = mg.topk(k)
        return pa.table({"token": pa.array([t for t, _ in rows]),
                         "n": pa.array([n for _, n in rows], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(pc.utf8_split_whitespace(col.fill_null("")))
        if len(toks):
            toks = toks.filter(pc.not_equal(toks, ""))
        if not len(toks):
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    from jsonschema_ray.stages.hashagg import hash_group_agg

    agg = hash_group_agg(
        ds.map_batches(partial, batch_format="pyarrow")
          .repartition(max(2, cpus)),
        "token", {"n": ("n", "sum")})
    out = agg.sort(["n", "token"], descending=[True, False]).limit(k)
    batches = list(out.iter_batches(batch_format="pyarrow"))
    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not batches:
        return empty
    return pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
         else b for b in batches]).cast(empty.schema)


def chunk_documents(source, key_col: str, text_col: str = "text",
                    chunk_tokens: int = 64, overlap: int = 0):
    """Split documents into fixed-size TOKEN windows — the context-
    chunking stage of an embedding / RAG / training pipeline. → Dataset
    ``(key, chunk_idx, n_tokens, chunk)`` where chunk ``k`` covers
    tokens ``[k*(chunk_tokens-overlap), ...)[:chunk_tokens]``; the final
    partial window is kept. ``overlap=0`` gives disjoint windows.

    Fully vectorized: Arrow whitespace tokenization, numpy offset
    arithmetic over the flat token stream, per-chunk reassembly via a
    single ``np.char``-free join (tokens gathered with one fancy index,
    then ``pc.binary_join`` on a ListArray). No per-row Python."""
    import ray

    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    src = as_source(source)

    def chunks(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        counts, flat = _tokenize_flat(t.column(text_col))
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # number of chunks per doc: ceil over stride of (n - overlap)
        n_chunks = np.where(
            counts > 0,
            (np.maximum(counts - overlap, 1) + stride - 1) // stride,
            0).astype(np.int64)
        doc_of = np.repeat(np.arange(len(counts)), n_chunks)
        cidx = (np.arange(len(doc_of))
                - np.repeat(np.concatenate([[0], np.cumsum(n_chunks)])[:-1],
                            n_chunks))
        c_start = starts[doc_of] + cidx * stride
        c_len = np.minimum(chunk_tokens,
                           (starts[doc_of] + counts[doc_of]) - c_start)
        empty = pa.table({
            key_col: keys.slice(0, 0),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk": pa.array([], pa.string())})
        if not len(doc_of):
            return empty
        # gather every chunk's tokens with ONE flat fancy index, then
        # rebuild a ListArray and join with spaces
        tok_of_chunk = np.repeat(c_start, c_len) + (
            np.arange(int(c_len.sum()))
            - np.repeat(np.concatenate([[0], np.cumsum(c_len)])[:-1], c_len))
        gathered = pa.array(flat[tok_of_chunk])
        offsets = pa.array(np.concatenate([[0], np.cumsum(c_len)])
                           .astype(np.int32))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, gathered), " ")
        return pa.table({
            key_col: keys.take(pa.array(doc_of)),
            "chunk_idx": pa.array(cidx.astype(np.int64)),
            "n_tokens": pa.array(c_len.astype(np.int64)),
            "chunk": joined,
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        chunks, batch_format="pyarrow")


REDACTION_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (RE2 pattern, replacement token). Both Arrow and DuckDB
    # execute RE2, so the SAME pattern string behaves identically in
    # the engine and the SQL oracle.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def redact_text(source, key_col: str, text_col: str = "text",
                patterns=("email", "url", "ipv4")):
    """PII/noise scrubbing: replace emails / URLs / IPv4 literals with
    placeholder tokens — one vectorized ``replace_substring_regex``
    pass per pattern (RE2 in Arrow == RE2 in DuckDB, so the oracle
    runs the same regexes). → Dataset (key, text, n_redacted) where
    ``n_redacted`` counts replaced matches across all patterns."""
    from jsonschema_ray.sources.readers import as_source

    pats = [REDACTION_PATTERNS[p] if isinstance(p, str) else tuple(p)
            for p in patterns]
    src = as_source(source)

    def scrub(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")
        total = np.zeros(len(col), np.int64)
        for pat, repl in pats:
            total += pc.count_substring_regex(col, pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            col = pc.replace_substring_regex(col, pat, repl)
        return pa.table({key_col: t.column(key_col), text_col: col,
                         "n_redacted": pa.array(total)})

    return src.dataset(columns=[key_col, text_col]).map_batches(
        scrub, batch_format="pyarrow")


def repetition_signals(source, key_col: str = "doc_id",
                       text_col: str = "text"):
    """Gopher-style repetition quality signals per document (Rae et
    al. 2021, §A1.1 repetition heuristics), adapted to word 2-grams
    for single-line corpora: the most frequent 2-gram and the
    characters covered by it, plus characters covered by ALL 2-grams
    occurring ≥ 2 times (the simple non-overlap-adjusted variant —
    each occurrence counts its full gram length).

    Outputs are INTEGER counts/char totals, not float ratios, so the
    DuckDB oracle comparison is dtype- and rounding-exact (the ratio a
    filter needs is one division away). Per-batch local — no shuffle;
    tokenization is the shared Arrow kernel (``dedup._tokenize_flat``,
    == ``regexp_split_to_array(text, '\\s+')`` + drop empties in SQL).
    Top-gram ties break lexicographically (ASCII == DuckDB binary
    collation). → (key, n_tokens, top_2gram, top_2gram_count,
    top_2gram_chars, dup_2gram_chars)."""
    import pandas as pd

    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)

    def kern(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        counts, flat = _tokenize_flat(t.column(text_col))
        parent = np.repeat(np.arange(len(counts)), counts)
        n_docs = len(counts)
        top_g = np.full(n_docs, None, dtype=object)
        top_n = np.zeros(n_docs, np.int64)
        top_ch = np.zeros(n_docs, np.int64)
        dup_ch = np.zeros(n_docs, np.int64)
        if len(parent) > 1:
            adj = np.flatnonzero(parent[1:] == parent[:-1])
            if len(adj):
                grams = pc.binary_join_element_wise(
                    pa.array(flat[adj], type=pa.string()),
                    pa.array(flat[adj + 1], type=pa.string()), " ")
                cc = pd.DataFrame(
                    {"p": parent[adj],
                     "g": grams.to_numpy(zero_copy_only=False)}) \
                    .groupby(["p", "g"], sort=False).size() \
                    .reset_index(name="n")
                cc["chars"] = cc["n"] * cc["g"].str.len()
                top = cc.sort_values(["p", "n", "g"],
                                     ascending=[True, False, True]) \
                    .drop_duplicates("p")
                top_g[top["p"].to_numpy()] = top["g"].to_numpy()
                top_n[top["p"].to_numpy()] = top["n"].to_numpy()
                top_ch[top["p"].to_numpy()] = top["chars"].to_numpy()
                dup = cc[cc["n"] >= 2].groupby("p")["chars"].sum()
                dup_ch[dup.index.to_numpy()] = dup.to_numpy()
        return pa.table({
            key_col: keys,
            "n_tokens": pa.array(counts.astype(np.int64)),
            "top_2gram": pa.array(top_g, type=pa.string()),
            "top_2gram_count": pa.array(top_n),
            "top_2gram_chars": pa.array(top_ch),
            "dup_2gram_chars": pa.array(dup_ch),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        kern, batch_format="pyarrow")


#: Default vocabulary cap for unigram-LM scoring: the driver/broadcast
#: table never exceeds this many (token, count) rows no matter the
#: corpus size. Standard LM practice — tokens outside the top-K score
#: the max-surprise (count=1) bucket.
UNIGRAM_VOCAB_TOP_K = 1_000_000


def unigram_lm_scores(source, key_col: str = "doc_id",
                      text_col: str = "text",
                      vocab_top_k: int | None = UNIGRAM_VOCAB_TOP_K):
    """Unigram-LM quality score per document (the CCNet-style LM
    filtering signal, computed from the corpus itself): two passes —

    1. global token counts: per-block collapsed (token, n) partials →
       DISTRIBUTED ``groupby("token").sum`` → top-K truncation by
       (count desc, token asc) via distributed sort+limit, so the
       driver holds at most ``vocab_top_k`` rows even when the corpus
       vocabulary is web-scale (10⁸–10⁹ distinct tokens);
    2. broadcast the quantized per-token surprisal table
       ``q(tok) = floor(1e6·ln(N_total/count) + 0.5)`` (libm ``log``
       == DuckDB ``ln``), score each doc as the INTEGER sum of its
       tokens' q — integer arithmetic makes the result independent of
       summation order, so the oracle hash is exact.

    Tokens dropped by the truncation score the max-surprise bucket
    (count=1); when the vocabulary fits under the cap — always true at
    test scale — results are bit-identical to the untruncated exact
    computation, which keeps the SQL oracle green.

    → (key, n_tokens, lm_score); higher = more surprising/rarer
    tokens. The per-token table ships once via ``ray.put``."""
    import math

    import ray

    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)

    def partial(t: pa.Table) -> pa.Table:
        _, flat = _tokenize_flat(t.column(text_col))
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pa.array(flat, type=pa.string()).value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    parts = src.dataset(columns=[text_col]).map_batches(
        partial, batch_format="pyarrow").materialize()
    # distributed merge: the full vocabulary never visits the driver
    from jsonschema_ray.stages.hashagg import hash_group_agg

    vocab_ds = hash_group_agg(
        parts, "token", {"sum(n)": ("n", "sum")}).materialize()
    total = int(parts.sum("n") or 0)
    truncated = False
    if vocab_top_k is not None and vocab_ds.count() > vocab_top_k:
        truncated = True
        vocab_ds = vocab_ds.sort(["sum(n)", "token"],
                                 descending=[True, False]) \
            .limit(vocab_top_k)
    vb = [b for b in vocab_ds.iter_batches(batch_format="pyarrow")]
    if vb:
        vt = pa.concat_tables(vb).combine_chunks()
        toks = vt.column("token").to_numpy(zero_copy_only=False)
        cnts = vt.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(toks)          # searchsorted needs token order
        toks_sorted, cnt_sorted = toks[order], cnts[order]
    else:
        toks_sorted = np.array([], dtype=object)
        cnt_sorted = np.array([], dtype=np.int64)
    # vectorized identically to the scalar form (same libm log /
    # IEEE divide / floor per element) — a Python listcomp here is
    # O(vocab) driver time at a 10^6-row vocabulary cap
    q = np.floor(1e6 * np.log(total / cnt_sorted.astype(np.float64))
                 + 0.5).astype(np.int64) if len(cnt_sorted) \
        else np.array([], dtype=np.int64)
    # out-of-vocabulary tokens (dropped by truncation) take the
    # max-surprise count=1 bucket; without truncation every corpus
    # token is in vocab, and the guard keeps legacy score-0 semantics
    oov_q = math.floor(1e6 * math.log(total) + 0.5) \
        if (truncated and total > 0) else 0
    table_ref = ray.put((toks_sorted, q, oov_q))

    def score(t: pa.Table) -> pa.Table:
        toks, qv, oov = ray.get(table_ref)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        counts, fl = _tokenize_flat(t.column(text_col))
        parent = np.repeat(np.arange(len(counts)), counts)
        scores = np.zeros(len(counts), np.int64)
        if len(fl):
            idx = np.searchsorted(toks, fl) if len(toks) \
                else np.zeros(len(fl), dtype=np.int64)
            idx = np.clip(idx, 0, max(0, len(toks) - 1))
            hit = toks[idx] == fl if len(toks) \
                else np.zeros(len(fl), dtype=bool)
            np.add.at(scores, parent[hit], qv[idx[hit]])
            if oov:
                np.add.at(scores, parent[~hit],
                          np.full(int((~hit).sum()), oov, np.int64))
        return pa.table({
            key_col: keys,
            "n_tokens": pa.array(counts.astype(np.int64)),
            "lm_score": pa.array(scores),
        })

    return src.dataset(columns=[key_col, text_col]).map_batches(
        score, batch_format="pyarrow")


TFIDF_VOCAB_TOP_K = 1_000_000


def tfidf_top_terms(source, key_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    vocab_top_k: int | None = TFIDF_VOCAB_TOP_K):
    """Per-document top-``k`` terms by tf-idf — the classic keyword /
    salience extraction stage of a curation pipeline. Two passes:

    1. document frequency: per-block collapsed (token, df) partials
       (each doc's tokens deduplicated IN the block, so the shuffle
       carries one row per distinct (block, token)) → distributed
       ``groupby("token").sum`` — the vocabulary never visits the
       driver untruncated; above ``vocab_top_k`` it is cut by
       (df desc, token asc) via distributed sort+limit, exactly like
       :func:`unigram_lm_scores`' vocabulary. Dropped rare tokens
       take df=0 → the idf formula's +1 smoothing keeps them finite
       (max-idf bucket), standard practice.
    2. broadcast the (token, df) table once via ``ray.put``; each
       batch recomputes its per-doc tf (docs never straddle blocks —
       the pairs are derived per row), scores
       ``tfidf = tf · ln((N+1)/(df+1))`` in float64 and keeps the
       top ``k`` rows per doc by (score desc, token asc).

    Scores are quantized to ``floor(1e6·x + 0.5)`` integers so the
    driver's order-insensitive value hash is exact vs DuckDB (same
    libm ``log``). → (key, token, tf, df, tfidf_q, rank).
    """
    import pandas as pd
    import ray

    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)

    def df_partial(t: pa.Table) -> pa.Table:
        counts, flat = _tokenize_flat(t.column(text_col))
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        parent = np.repeat(np.arange(len(counts)), counts)
        # distinct (doc, token) pairs, then count docs per token
        pairs = pd.DataFrame({"p": parent, "t": flat}).drop_duplicates()
        vc = pairs["t"].value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "df": pa.array(vc.to_numpy(), pa.int64())})

    ds_text = src.dataset(columns=[text_col])
    n_docs = int(ds_text.count())
    from jsonschema_ray.stages.hashagg import hash_group_agg

    df_ds = hash_group_agg(
        ds_text.map_batches(df_partial, batch_format="pyarrow"),
        "token", {"sum(df)": ("df", "sum")}).materialize()
    if vocab_top_k is not None and df_ds.count() > vocab_top_k:
        df_ds = df_ds.sort(["sum(df)", "token"],
                           descending=[True, False]).limit(vocab_top_k)
    vb = list(df_ds.iter_batches(batch_format="pyarrow"))
    if vb:
        vt = pa.concat_tables(
            [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
             else b for b in vb]).combine_chunks()
        toks = vt.column("token").to_numpy(zero_copy_only=False)
        dfs = vt.column("sum(df)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(toks)
        toks_sorted, df_sorted = toks[order], dfs[order]
    else:
        toks_sorted = np.array([], dtype=object)
        df_sorted = np.array([], dtype=np.int64)
    table_ref = ray.put((toks_sorted, df_sorted))

    def score(t: pa.Table) -> pa.Table:
        toks, dfv = ray.get(table_ref)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kv = keys.to_numpy(zero_copy_only=False)
        counts, flat = _tokenize_flat(t.column(text_col))
        empty = pa.table({
            key_col: pa.array([], keys.type),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "tfidf_q": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())})
        if not len(flat):
            return empty
        parent = np.repeat(np.arange(len(counts)), counts)
        tf = pd.DataFrame({"p": parent, "t": flat}) \
            .groupby(["p", "t"], sort=False).size().reset_index(name="tf")
        pv = tf["p"].to_numpy()
        tv = tf["t"].to_numpy()
        tfv = tf["tf"].to_numpy().astype(np.int64)
        if len(toks):
            idx = np.clip(np.searchsorted(toks, tv), 0, len(toks) - 1)
            hit = toks[idx] == tv
            dfx = np.where(hit, dfv[idx], 0).astype(np.int64)
        else:
            dfx = np.zeros(len(tv), np.int64)
        sc = tfv * np.log((n_docs + 1.0) / (dfx + 1.0))
        q = np.floor(1e6 * sc + 0.5).astype(np.int64)
        # top-k per doc by (score desc, token asc): lexsort is stable
        ordr = np.lexsort((tv, -q, pv))
        pvo = pv[ordr]
        first = np.flatnonzero(np.r_[True, pvo[1:] != pvo[:-1]])
        rank = (np.arange(len(pvo))
                - np.repeat(first, np.diff(np.r_[first, len(pvo)])) + 1)
        keep = ordr[rank <= k]
        return pa.table({
            key_col: pa.array(kv[pv[keep]], keys.type),
            "token": pa.array(tv[keep], pa.string()),
            "tf": pa.array(tfv[keep]),
            "df": pa.array(dfx[keep]),
            "tfidf_q": pa.array(q[keep]),
            "rank": pa.array(rank[rank <= k].astype(np.int64))})

    return src.dataset(columns=[key_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def add_compression_ratio(batch: pa.Table, text_col: str = "text",
                          level: int = 6) -> pa.Table:
    """Gopher/RedPajama-style repetitiveness signal: deflate size /
    raw size per document (low ratio ⇒ highly repetitive / templated
    text; ~1 ⇒ high-entropy). zlib is C-speed per row — the per-row
    loop is a C call over the already-materialized utf8 buffer, not
    Python string work — and the stage is embarrassingly parallel
    (pure map_batches, no shuffle). No SQL oracle (DuckDB has no
    deflate); pinned by construction tests instead."""
    import zlib

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    out = np.ones(n, np.float64)
    buf = col.to_pylist()
    for i, s in enumerate(buf):
        if s:
            raw = s.encode("utf-8", "surrogatepass")
            out[i] = len(zlib.compress(raw, level)) / len(raw)
    return batch.append_column("compression_ratio",
                               pa.array(np.round(out, 6)))


def pack_sequences(source, key_col: str = "doc_id",
                   text_col: str = "text", cap: int = 200,
                   shard_size: int = 64):
    """Greedy sequence packing — the training-batch construction step
    that bins documents into fixed token-budget context windows
    (first-fit in key order, a doc longer than ``cap`` gets its own
    pack). Packing is inherently sequential, so the scalable contract
    is DETERMINISTIC SHARDS: ``shard = key // shard_size`` packs
    independently — shard boundaries are a pure function of the key,
    so results are stable across re-runs, block layouts and cluster
    sizes, and each shard's greedy scan is O(shard_size) local work
    under ``groupby(shard).map_groups`` (shards are sized thousands of
    docs at scale: bounded group count, never one group per doc).

    → (key, shard, pack, n_tokens): ``pack`` is the 0-based pack index
    within the shard.
    """
    import pandas as pd

    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)

    def prep(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        n = _count_re(t.column(text_col), TOKEN_RE).cast(pa.int64())
        shard = pc.divide(keys, shard_size)
        return pa.table({key_col: keys,
                         "shard": shard.cast(pa.int64()),
                         "n_tokens": n})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col)
        n = g["n_tokens"].to_numpy()
        packs = np.zeros(len(n), np.int64)
        acc = 0
        p = 0
        for i, x in enumerate(n):      # sequential by definition;
            if i and acc + x <= cap:   # O(shard_size) local scalars
                acc += x
            else:
                p += i > 0
                acc = x
            packs[i] = p
        return pd.DataFrame({key_col: g[key_col].to_numpy(),
                             "shard": g["shard"].to_numpy(),
                             "pack": packs,
                             "n_tokens": n})

    return src.dataset(columns=[key_col, text_col]) \
        .map_batches(prep, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack, batch_format="pandas")


# count-min sketch row-hash constants: public 64-bit mixing primes
# (splitmix64 / xxhash64) — fixed, no RNG, so the sketch state is
# deterministic and SQL-replicable
CMS_A = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
         0x165667B19E3779F9, 0x27D4EB2F165667C5)
CMS_B = (1, 3, 5, 7)


def cms_token_registers(source, text_col: str = "text", depth: int = 4,
                        width: int = 1024, token_hash=hash64):
    """Count-min sketch over the corpus token stream (Cormode &
    Muthukrishnan 2005) — the fixed-memory frequency summary for
    heavy-hitter estimation when the exact `groupby(token)` shuffle is
    too wide.  Register state is EXACT and mergeable: each block emits
    its ≤ depth·width nonzero cells ``(cell, cnt)``; one small
    ``groupby(cell).sum`` merges them (the shuffle carries registers,
    never tokens).  With ``token_hash=md5_hash64`` every register
    re-derives bit-exactly in DuckDB (same row-hash affine constants),
    so the sketch STATE is SQL-oracled even though its estimates are
    approximate — same certificate pattern as the HLL registers.

    → Dataset (r, c, cnt): nonzero registers, r = row, c = column.
    Driver/consumer footprint is bounded by depth·width regardless of
    corpus size."""
    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    if depth > len(CMS_A):
        raise ValueError(f"depth <= {len(CMS_A)} supported")
    if width & (width - 1):
        raise ValueError("width must be a power of two")
    a = np.array(CMS_A[:depth], np.uint64)
    b = np.array(CMS_B[:depth], np.uint64)
    # multiply-SHIFT row hash (Dietzfelbinger): take the HIGH bits of
    # the wrapped product — the low bits of h·a depend only on the low
    # bits of h, which would make the depth rows collide together
    shift = np.uint64(64 - (width.bit_length() - 1))

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, flat = _tokenize_flat(col)
        h = token_hash(flat) if len(flat) else np.empty(0, np.uint64)
        # one fused bincount over cell = r·width + pos for all rows
        with np.errstate(over="ignore"):
            pos = ((h[None, :] * a[:, None] + b[:, None]) >> shift)
        cell_all = (pos + (np.arange(depth, dtype=np.uint64) * np.uint64(width))[:, None]).ravel()
        cnt = np.bincount(cell_all.astype(np.int64),
                          minlength=depth * width)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    agg = as_source(source).dataset(columns=[text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").sum("cnt")

    def split(t: pa.Table) -> pa.Table:
        out = pa.table({
            "cell": t.column("cell"),
            "cnt": t.column("sum(cnt)").cast(pa.int64()),
        }).sort_by("cell")              # local: blocks stay ordered
        cell = out.column("cell").to_numpy(zero_copy_only=False)
        return pa.table({
            "r": pa.array(cell // width, pa.int64()),
            "c": pa.array(cell % width, pa.int64()),
            "cnt": out.column("cnt"),
        })

    # no global sort: Ray's sort-based aggregate already emits blocks
    # in cell order, and cell = r·width + c is monotone in (r, c); a
    # dedicated Sort would be a third all-to-all just to re-derive it
    return agg.map_batches(split, batch_format="pyarrow")


def cms_estimate(registers, tokens, depth: int = 4, width: int = 1024,
                 token_hash=hash64) -> np.ndarray:
    """Point-estimate token counts from a CMS register table
    (min over rows) — registers is the (r, c, cnt) output of
    :func:`cms_token_registers` as a pyarrow Table / pandas frame."""
    import pandas as pd

    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    dense = np.zeros((depth, width), np.int64)
    dense[registers["r"].to_numpy(), registers["c"].to_numpy()] = \
        registers["cnt"].to_numpy()
    toks = np.asarray(tokens, dtype=object)
    h = token_hash(toks) if len(toks) else np.empty(0, np.uint64)
    est = np.full(len(toks), np.iinfo(np.int64).max, np.int64)
    shift = np.uint64(64 - (width.bit_length() - 1))
    with np.errstate(over="ignore"):
        for r in range(depth):
            pos = ((h * np.uint64(CMS_A[r]) + np.uint64(CMS_B[r]))
                   >> shift).astype(np.int64)
            est = np.minimum(est, dense[r, pos])
    return est


def dsir_scores(source, target_source, key_col: str = "doc_id",
                text_col: str = "text", n_buckets: int = 8192,
                token_hash=hash64):
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every raw-corpus document by the log importance weight
    of a hashed-unigram bag-of-words model fit on a small TARGET
    distribution, ``score(x) = Σ_b c_b(x) · (ln p̂_b − ln q̂_b)`` with
    Laplace-smoothed bucket probabilities.

    Scale shape: both bucket-count passes are per-block ``bincount``
    partials merged by one ``groupby(bucket).sum`` — the driver holds
    exactly ``2·n_buckets`` integers no matter the corpus size; the
    per-bucket log-ratios are quantized ONCE to int64 micro-nats, so
    the per-document score is an exact associative INTEGER dot product
    (block layout cannot perturb it) broadcast via one ``ray.put``.
    With ``token_hash=md5_hash64`` the bucket ids and every count
    re-derive in DuckDB; the micro-nat table is the one float step,
    identical double expressions on both engines.

    → Dataset (key, score_q, n_tokens) over the RAW corpus; select by
    top-k/threshold on ``score_q`` downstream."""
    import ray

    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    a = np.uint64(CMS_A[0])
    b = np.uint64(CMS_B[0])
    shift = np.uint64(64 - (n_buckets.bit_length() - 1))

    def buckets(col) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts, flat = _tokenize_flat(col)
        h = token_hash(flat) if len(flat) else np.empty(0, np.uint64)
        with np.errstate(over="ignore"):
            pos = ((h * a + b) >> shift).astype(np.int64)
        return counts, pos

    def count_partial(t: pa.Table) -> pa.Table:
        _, pos = buckets(t.column(text_col))
        cnt = np.bincount(pos, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    def side_counts(src) -> np.ndarray:
        agg = as_source(src).dataset(columns=[text_col]) \
            .map_batches(count_partial, batch_format="pyarrow") \
            .groupby("bucket").sum("cnt")
        out = np.zeros(n_buckets, np.int64)
        for bt in agg.iter_batches(batch_format="pyarrow"):
            tb = pa.Table.from_batches([bt]) \
                if isinstance(bt, pa.RecordBatch) else bt
            out[tb.column("bucket").to_numpy(zero_copy_only=False)] = \
                tb.column("sum(cnt)").to_numpy(zero_copy_only=False)
        return out

    tgt = side_counts(target_source)
    raw = side_counts(source)
    t_tot, r_tot = int(tgt.sum()), int(raw.sum())
    # identical double expression as the SQL oracle: division, ln,
    # subtract, scale, floor(+0.5)
    lam = np.floor(1e6 * (np.log((tgt + 1.0) / (t_tot + n_buckets))
                          - np.log((raw + 1.0) / (r_tot + n_buckets)))
                   + 0.5).astype(np.int64)
    lam_ref = ray.put(lam)

    def score(t: pa.Table) -> pa.Table:
        lv = ray.get(lam_ref)
        counts, pos = buckets(t.column(text_col))
        doc_of = np.repeat(np.arange(t.num_rows), counts)
        sc = np.zeros(t.num_rows, np.int64)
        np.add.at(sc, doc_of, lv[pos])
        return pa.table({
            key_col: t.column(key_col),
            "score_q": pa.array(sc),
            "n_tokens": pa.array(counts.astype(np.int64)),
        })

    return as_source(source).dataset(columns=[key_col, text_col]) \
        .map_batches(score, batch_format="pyarrow")


def repetition_suite(source, key_col: str = "doc_id",
                     text_col: str = "text", token_hash=hash64):
    """The FULL Gopher within-document repetition rule set (Rae et al.
    2021, Table A1 — the signals behind the dup-fraction filters):

    - ``top{2,3,4}_chars``: characters covered by the doc's most
      frequent word n-gram (count × gram char length; ties broken by
      the gram's chain hash — deterministic without materializing gram
      strings, and replicable in SQL);
    - ``dup{5..10}_chars``: characters of tokens covered by ANY
      duplicated word n-gram instance (per-token marking, so
      overlapping instances never double-count);
    - ``tok_chars``: the denominator (total token characters).

    All integer outputs — consumers form the Gopher fractions/
    thresholds without float hashes. One vectorized pass per n over
    the batch-flat token stream (9 passes), zero shuffle. With
    ``token_hash=md5_hash64`` the whole suite re-derives in DuckDB.
    """
    from jsonschema_ray.pipelines.dedup import _shingle_hashes, _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    def per_batch(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.to_numpy(zero_copy_only=False)
        counts, flat = _tokenize_flat(texts)
        nd = t.num_rows
        lens = pc.utf8_length(pa.array(flat, pa.string())) \
            .to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(flat) else np.empty(0, np.int64)
        cs = np.concatenate([[0], np.cumsum(lens)])
        doc_of = np.repeat(np.arange(nd), counts)
        out = {key_col: t.column(key_col),
               "tok_chars": pa.array(np.bincount(
                   doc_of, weights=lens, minlength=nd).astype(np.int64))}

        for n in range(2, 11):
            top = np.zeros(nd, np.int64)
            dup = np.zeros(nd, np.int64)
            d, f, p = _shingle_hashes(texts, n, token_hash=token_hash,
                                      return_pos=True)
            if len(f):
                win = cs[p + n] - cs[p] + (n - 1)      # gram char length
                order = np.lexsort((f, d))
                ds_, fs, ps, ws = d[order], f[order], p[order], win[order]
                grp = np.empty(len(fs), bool)
                grp[0] = True
                grp[1:] = (ds_[1:] != ds_[:-1]) | (fs[1:] != fs[:-1])
                gid = np.cumsum(grp) - 1
                cnt = np.bincount(gid)
                if n <= 4:
                    # top gram per doc: count desc, fold-hash asc; the
                    # lexsort above orders folds asc within doc, so the
                    # FIRST group with max count per doc wins the tie
                    starts = np.flatnonzero(grp)
                    gdoc, gw = ds_[starts], ws[starts]
                    gchars = cnt * gw
                    o2 = np.lexsort((fs[starts], -cnt, gdoc))
                    first = np.empty(len(o2), bool)
                    gd2 = gdoc[o2]
                    first[0] = True
                    first[1:] = gd2[1:] != gd2[:-1]
                    top[gd2[first]] = gchars[o2][first]
                else:
                    # mark tokens covered by instances of dup grams
                    dup_inst = cnt[gid] >= 2
                    if dup_inst.any():
                        pd_, dd = ps[dup_inst], ds_[dup_inst]
                        m = len(lens)
                        diff = np.zeros(m + 1, np.int64)
                        np.add.at(diff, pd_, 1)
                        np.add.at(diff, pd_ + n, -1)
                        covered = np.cumsum(diff[:-1]) > 0
                        dup = np.bincount(doc_of[covered],
                                          weights=lens[covered],
                                          minlength=nd).astype(np.int64)
            name = f"top{n}_chars" if n <= 4 else f"dup{n}_chars"
            out[name] = pa.array(top if n <= 4 else dup)
        return pa.table(out)

    return as_source(source).dataset(columns=[key_col, text_col]) \
        .map_batches(per_batch, batch_format="pyarrow")

def inverted_index(source, key_col: str = "doc_id", text_col: str = "text",
                   sample_k: int = 5, n_buckets: int = 64):
    """Distributed inverted-index build (retrieval/search preprocessing):
    token → document frequency + the ``sample_k`` smallest posting ids
    (comma-joined, ascending).

    Scale shape: the text never shuffles. Each block flattens to
    DISTINCT (token, doc) pairs (a doc's row lives in exactly one
    block, so block-local dedup is global dedup per posting) and
    collapses to ≤ ``sample_k`` thin rows per (block, token) carrying
    the partial df and a posting sample. Partials merge inside hash
    buckets (``pb = md5(token) % n_buckets``) with vectorized pandas —
    never one Python group per token (web vocabulary is 10^8–10^9;
    same rationale as dedup._dup_clusters_star). Full posting lists
    are deliberately NOT merged: df + a bounded sample is the index
    STATISTICS surface; complete postings at scale are a partitioned
    write of the pair stream (no merge step needed), not a driver
    object.

    → (token, df:int64, top_docs:string).
    """
    import pandas as pd

    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)

    empty = pa.table({"pb": pa.array([], pa.int64()),
                      "token": pa.array([], pa.string()),
                      "d": pa.array([], pa.int64()),
                      "dfp": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kv = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        counts, flat = _tokenize_flat(t.column(text_col))
        if not len(flat):
            return empty
        parent = np.repeat(np.arange(len(counts)), counts)
        pairs = pd.DataFrame({"t": flat, "d": kv[parent]}) \
            .drop_duplicates().sort_values(["t", "d"], kind="stable")
        tv = pairs["t"].to_numpy()
        dv = pairs["d"].to_numpy()
        grp = np.empty(len(tv), bool)
        grp[0] = True
        grp[1:] = tv[1:] != tv[:-1]
        gid = np.cumsum(grp) - 1
        cnt = np.bincount(gid)                     # df partial per token
        starts = np.flatnonzero(grp)
        rank = np.arange(len(tv)) - starts[gid]    # 0-based within token
        keep = rank < sample_k
        # df partial rides on the rank-0 row only; sample rows carry 0
        dfp = np.where(rank == 0, cnt[gid], 0).astype(np.int64)
        tk = tv[keep]
        return pa.table({
            "pb": pa.array((md5_hash64(tk) % np.uint64(n_buckets))
                           .astype(np.int64)),
            "token": pa.array(tk, pa.string()),
            "d": pa.array(dv[keep]),
            "dfp": pa.array(dfp[keep]),
        })

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "d"], kind="stable")
        df = g.groupby("token", sort=False)["dfp"].sum()
        kept = g.groupby("token", sort=False).head(sample_k).copy()
        kept["ds"] = kept["d"].astype(str)
        top = kept.groupby("token", sort=False)["ds"].agg(",".join)
        out = pd.DataFrame({"token": df.index,
                            "df": df.to_numpy().astype(np.int64),
                            "top_docs": top.reindex(df.index).to_numpy()})
        return out.reset_index(drop=True)

    return src.dataset(columns=[key_col, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pb").map_groups(merge_bucket, batch_format="pandas")


BIGRAM_VOCAB_TOP_K = 10_000_000


def bigram_lm_scores(source, key_col: str = "doc_id",
                     text_col: str = "text",
                     vocab_top_k: int | None = BIGRAM_VOCAB_TOP_K):
    """Bigram conditional-LM quality score per document — the stronger
    sibling of :func:`unigram_lm_scores` (CCNet-style perplexity
    filtering uses exactly this n-gram conditional form): each
    adjacent token pair contributes the integer-quantized surprisal

        q(w1,w2) = floor(1e6 · ln(prefix(w1) / c(w1,w2)) + 0.5)

    i.e. −ln P(w2|w1) under the corpus MLE, where prefix(w1) is the
    total bigram count starting with w1. Only OBSERVED bigrams are
    scored (the model is built from the same corpus), so every ratio
    is ≥ 1 and no smoothing constant is needed; integer sums make the
    result summation-order independent (exact oracle hash).

    Scale shape: pass 1 counts bigrams via per-block collapsed
    (bigram, n) partials → distributed ``groupby.sum``; prefix counts
    are a second thin groupby OVER THE BIGRAM TABLE (never the token
    stream); above ``vocab_top_k`` the bigram table truncates by
    (count desc, bigram asc) and dropped pairs score the max-surprise
    bucket ln(total) — at test scale the cap never binds, keeping the
    SQL oracle bit-exact. The quantized q-table broadcasts once via
    ``ray.put``; pass 2 is one vectorized searchsorted per block.

    → (key, n_bigrams, lm2_score) for docs with ≥1 bigram (single-
    token docs have no conditional probability, matching the SQL
    inner join)."""
    import math

    import ray

    from jsonschema_ray.pipelines.dedup import _tokenize_flat
    from jsonschema_ray.sources.readers import as_source

    src = as_source(source)

    def _bigrams(t: pa.Table):
        """(counts_per_doc, flat_bigram_strings, parent_doc_index)."""
        counts, flat = _tokenize_flat(t.column(text_col))
        if not len(flat):
            return counts, np.array([], dtype=object), \
                np.array([], dtype=np.int64)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        valid = doc_of[:-1] == doc_of[1:]
        big = np.char.add(np.char.add(flat[:-1].astype(str), " "),
                          flat[1:].astype(str)).astype(object)[valid]
        return counts, big, doc_of[:-1][valid]

    def partial(t: pa.Table) -> pa.Table:
        _, big, _ = _bigrams(t)
        if not len(big):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pa.array(big, type=pa.string()).value_counts()
        return pa.table({"bigram": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    parts = src.dataset(columns=[text_col]).map_batches(
        partial, batch_format="pyarrow").materialize()
    from jsonschema_ray.stages.hashagg import hash_group_agg

    vocab_ds = hash_group_agg(
        parts, "bigram", {"sum(n)": ("n", "sum")}).materialize()
    total = int(parts.sum("n") or 0)
    truncated = False
    if vocab_top_k is not None and vocab_ds.count() > vocab_top_k:
        truncated = True
        vocab_ds = vocab_ds.sort(["sum(n)", "bigram"],
                                 descending=[True, False]).limit(vocab_top_k)

    def prefix_partial(t: pa.Table) -> pa.Table:
        col = t.column("bigram")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w1 = pc.list_element(pc.utf8_split_whitespace(col), 0)
        base = pa.table({"w1": w1, "n": t.column("sum(n)")})
        return base.group_by("w1").aggregate([("n", "sum")]) \
            .rename_columns(["w1", "n"])

    from ray.data.aggregate import Sum

    prefix_ds = hash_group_agg(
        vocab_ds.map_batches(prefix_partial, batch_format="pyarrow"),
        "w1", {"pc": ("n", "sum")})

    vb = list(vocab_ds.iter_batches(batch_format="pyarrow"))
    pb = list(prefix_ds.iter_batches(batch_format="pyarrow"))
    if vb:
        vt = pa.concat_tables(vb).combine_chunks()
        pt = pa.concat_tables(pb).combine_chunks()
        bigs = vt.column("bigram").to_numpy(zero_copy_only=False)
        cnts = vt.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pref_tok = pt.column("w1").to_numpy(zero_copy_only=False)
        pref_n = pt.column("pc").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        po = np.argsort(pref_tok)
        pref_tok, pref_n = pref_tok[po], pref_n[po]
        w1_of = np.array([b.split(" ", 1)[0] for b in bigs], dtype=object)
        pref_of = pref_n[np.searchsorted(pref_tok, w1_of)]
        order = np.argsort(bigs)
        bigs_sorted = bigs[order]
        # vectorized identically to the scalar form (same libm log /
        # IEEE divide / floor per element)
        q = np.floor(1e6 * np.log(pref_of[order].astype(np.float64)
                                  / cnts[order].astype(np.float64))
                     + 0.5).astype(np.int64)
    else:
        bigs_sorted = np.array([], dtype=object)
        q = np.array([], dtype=np.int64)
    oov_q = math.floor(1e6 * math.log(total) + 0.5) \
        if (truncated and total > 0) else 0
    table_ref = ray.put((bigs_sorted, q, oov_q))

    def score(t: pa.Table) -> pa.Table:
        bigs_s, qv, oov = ray.get(table_ref)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        counts, big, parent = _bigrams(t)
        nbg = np.zeros(len(counts), np.int64)
        scores = np.zeros(len(counts), np.int64)
        if len(big):
            np.add.at(nbg, parent, 1)
            idx = np.searchsorted(bigs_s, big) if len(bigs_s) \
                else np.zeros(len(big), dtype=np.int64)
            idx = np.clip(idx, 0, max(0, len(bigs_s) - 1))
            hit = bigs_s[idx] == big if len(bigs_s) \
                else np.zeros(len(big), dtype=bool)
            np.add.at(scores, parent[hit], qv[idx[hit]])
            if oov:
                np.add.at(scores, parent[~hit],
                          np.full(int((~hit).sum()), oov, np.int64))
        keep = nbg > 0
        return pa.table({
            key_col: keys.filter(pa.array(keep)),
            "n_bigrams": pa.array(nbg[keep]),
            "lm2_score": pa.array(scores[keep])})

    return src.dataset(columns=[key_col, text_col]).map_batches(
        score, batch_format="pyarrow")
