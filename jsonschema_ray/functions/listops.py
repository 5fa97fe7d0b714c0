"""Arrow list<struct> span operations — flatten, parent mapping, per-doc windows.

The reference evaluates array keywords by looping per-element per
instance (``LoopItems*`` instructions,
``/root/reference/vendor/blaze/src/evaluator/include/sourcemeta/blaze/evaluator_instruction.h:105-114``).
Columnar equivalent: flatten the ``spans`` list column once per batch
(`pc.list_flatten`, zero-copy view of the child data), compute the
parent-row index and within-parent span index, run all span predicates
vectorized over the flat struct arrays, then map violations back to
``(doc_id, span_index)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def span_lengths(spans: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-doc span count; null spans list counts as 0."""
    n = pc.list_value_length(spans)
    return n.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)


def flatten_spans(
    batch: pa.Table, spans_col: str = "spans"
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Flatten the span list column of a batch.

    Returns ``(flat, parent, span_idx)`` where ``flat`` is a table of
    the span struct's fields (one row per span), ``parent`` the row
    index of the owning doc in ``batch`` (int64) and ``span_idx`` the
    0-based position of the span within its doc (int32) — the
    ``span_index`` of the violation-row key.

    Length bookkeeping is derived from `pc.list_value_length` rather
    than raw offsets so sliced/chunked arrays behave; null lists
    contribute zero spans (matching `pc.list_flatten`).
    """
    spans = batch.column(spans_col)
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = span_lengths(spans)
    total = int(lengths.sum())
    parent = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    starts = np.cumsum(lengths) - lengths
    span_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)).astype(np.int32)
    flat_struct = pc.list_flatten(spans)
    flat = pa.Table.from_arrays(
        [flat_struct.field(i) for i in range(flat_struct.type.num_fields)],
        names=[flat_struct.type.field(i).name for i in range(flat_struct.type.num_fields)],
    )
    return flat, parent, span_idx


def monotonic_violations(
    values: pa.Array | pa.ChunkedArray | np.ndarray,
    parent: np.ndarray,
    strict: bool = True,
) -> np.ndarray:
    """Mask (over flattened spans) of sequence-order violations.

    A span violates if its value is not greater (>=, when ``strict`` is
    False) than its predecessor *within the same parent doc*, or if the
    value (or its predecessor) is null. The first span of each doc only
    violates when its own value is null — null-ness itself is the
    ``offset_nonnegative``-style rule's job, but order is undefined
    against a null neighbour so we flag the later span here too,
    mirroring the oracle.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        null_mask = pc.is_null(values).to_numpy(zero_copy_only=False)
        vals = values.to_numpy(zero_copy_only=False)
        vals = np.where(null_mask, 0, vals).astype(np.int64)
    else:
        null_mask = np.zeros(len(values), dtype=bool)
        vals = np.asarray(values, dtype=np.int64)
    n = len(vals)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    same_parent = np.empty(n, dtype=bool)
    same_parent[0] = False
    same_parent[1:] = parent[1:] == parent[:-1]
    diff = np.empty(n, dtype=np.int64)
    diff[0] = 1
    diff[1:] = vals[1:] - vals[:-1]
    bad_order = diff <= 0 if strict else diff < 0
    prev_null = np.empty(n, dtype=bool)
    prev_null[0] = False
    prev_null[1:] = null_mask[:-1]
    out = same_parent & (bad_order | null_mask | prev_null)
    return out
