"""Deterministic shuffle-shard training-output writer.

The last stage of a curation pipeline: give the curated corpus a
reproducible pseudo-random order, pack it into N output shards, and
emit a verifiable manifest — so a downstream trainer streams shards
round-robin and gets a well-mixed corpus, and a re-run (or a resumed
run after a crash) produces byte-identical shards without rewriting
the ones already committed.

Design (Ray-Data-first, no global sort):

- Shard assignment and intra-shard order both derive from ONE
  md5-based hash of the seeded doc key (``functions.sketches
  .md5_hash64`` — bit-identical to DuckDB ``md5_number_lower``, so
  the whole layout is SQL-reproducible): ``shard = h % n_shards``,
  rows within a shard ordered by ``(h, doc_id)``. A hash-mod is the
  scale answer: balanced in expectation, no all-to-all sort, and any
  row's location is computable from its key alone.
- One ``groupby('shard').map_groups`` barrier writes each shard as a
  single sorted parquet file ATOMICALLY (tmp + ``os.replace``, then a
  ``_SUCCESS`` marker carrying the run fingerprint written last) and
  returns that shard's manifest row — the writer's output dataset IS
  the manifest ``(shard, n_docs, n_tokens, fp_xor)``. ``fp_xor`` is
  the bit-XOR of per-row content hashes: order-insensitive, exact,
  and reproducible in SQL (``bit_xor`` over ``md5_number_lower``).
- Resume: a shard whose ``_SUCCESS`` fingerprint matches is NOT
  rewritten (its manifest row is re-read from disk). The shuffle
  itself re-runs — it is the all-to-all; what resume protects is the
  expensive, externally-visible write.
- Sizing contract: one output shard materializes in one worker
  (`pandas` group) — pick ``n_shards ≥ corpus_bytes / target_shard_
  bytes`` exactly as a training-data layout would.

No reference analog (the reference writes per-input files); LLM-ops
requirement from the round brief. Registry query ``shard_manifest``
is hash-exact against ORACLE['shard_manifest'].
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["shuffle_shard_write"]

_MANIFEST_COLS = ["shard", "n_docs", "n_tokens", "fp_xor"]


def shuffle_shard_write(source, out_dir: str, n_shards: int = 8,
                        seed: int = 0, key_col: str = "doc_id",
                        text_col: str = "text"):
    """Shuffle-shard ``source`` into ``out_dir/shard=K/part.parquet``
    → manifest Dataset ``(shard, n_docs, n_tokens, fp_xor)`` with one
    row per NON-EMPTY shard (hash-mod may leave a shard empty at tiny
    corpus sizes; absent shards hold zero rows by construction)."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.sources.readers import as_source

    os.makedirs(out_dir, exist_ok=True)
    fingerprint = f"shardwriter/v1/seed={seed}/n={n_shards}" \
                  f"/key={key_col}/text={text_col}"

    ds = as_source(source).dataset(columns=[key_col, text_col])

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        karr = np.asarray([f"s{seed}|{k}" for k in keys.to_pylist()],
                          dtype=object)
        h = md5_hash64(karr) >> np.uint64(1)        # int64-safe
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        content = md5_hash64(np.asarray(
            text.fill_null("").to_pylist(), dtype=object)) >> np.uint64(1)
        # non-empty-token counts per doc (Arrow split emits ''
        # boundary tokens) — same contract as classify._doc_tokens
        from jsonschema_ray.pipelines.classify import _doc_tokens

        _, n_tok = _doc_tokens(t, text_col)
        return pa.table({
            key_col: keys, text_col: text,
            "h": pa.array(h.view(np.int64)),
            "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64)),
            "content_h": pa.array(content.view(np.int64)),
            "n_tokens": pa.array(n_tok),
        })

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        d = os.path.join(out_dir, f"shard={shard:05d}")
        marker = os.path.join(d, "_SUCCESS")
        n_docs = len(g)
        n_tokens = int(g["n_tokens"].sum())
        fp = int(np.bitwise_xor.reduce(
            g["content_h"].to_numpy().astype(np.int64)))
        row = pd.DataFrame({"shard": [shard], "n_docs": [n_docs],
                            "n_tokens": [n_tokens], "fp_xor": [fp]})
        if os.path.exists(marker):
            with open(marker) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == fingerprint:
                return pd.DataFrame({c: [meta[c]] for c in _MANIFEST_COLS})
        g = g.sort_values(["h", key_col], kind="mergesort")
        os.makedirs(d, exist_ok=True)
        out = pa.Table.from_pandas(
            g[[key_col, text_col, "n_tokens"]], preserve_index=False)
        import pyarrow.parquet as pq

        tmp = os.path.join(d, ".part.parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(d, "part.parquet"))
        with open(marker + ".tmp", "w") as f:
            json.dump({"fingerprint": fingerprint, "shard": shard,
                       "n_docs": n_docs, "n_tokens": n_tokens,
                       "fp_xor": fp}, f)
        os.replace(marker + ".tmp", marker)
        return row

    return ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("shard").map_groups(write_shard, batch_format="pandas")
