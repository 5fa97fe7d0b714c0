"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Media payloads are ``binary`` columns with typed metadata — decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages (model/codec state loads once per actor in
``__init__``). The real codec libraries (PIL/ffmpeg/torchaudio) are
NOT in this container, so the byte-level decode is STUBBED: with
``allow_fake=True`` (default) a deterministic fake decoder parses the
synthetic payload header; with ``allow_fake=False`` the stage raises
``NotImplementedError`` at construction, making the dependency
explicit. Everything Ray-side — schemas, batch shapes, actor
signatures, output layout — is real and tested.

Synthetic payload format (``synth_media_batch``):
  bytes 0..3   magic  b"JMR0"
  bytes 4..5   width  (uint16 LE)   | audio: sample-rate/1000
  bytes 6..7   height (uint16 LE)   | video: n_frames
  bytes 8..    content hash bytes (repeating splitmix64 stream)
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np
import pyarrow as pa

from jsonschema_ray.sources.readers import as_source

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
])

_MAGIC = b"JMR0"


def synth_media_batch(refs: list[str] | np.ndarray, seed: int = 5) -> pa.Table:
    """Deterministic fake media payloads for a list of media_refs."""
    from jsonschema_ray.functions.sketches import hash64

    refs = np.asarray(refs, dtype=object)
    h = hash64(refs, seed=seed)
    mimes = np.array(["image/png", "audio/wav", "video/mp4"], dtype=object)
    mime = mimes[(h % np.uint64(3)).astype(np.int64)]
    payloads = []
    for i, r in enumerate(refs):
        w = int(16 + (h[i] >> np.uint64(8)) % np.uint64(48))
        ht = int(16 + (h[i] >> np.uint64(16)) % np.uint64(48))
        body = np.frombuffer(
            np.arange(8, dtype=np.uint64) * h[i], dtype=np.uint8).tobytes()
        payloads.append(_MAGIC + struct.pack("<HH", w, ht) + body)
    return pa.Table.from_arrays(
        [pa.array(refs, type=pa.string()), pa.array(mime, type=pa.string()),
         pa.array(payloads, type=pa.binary())],
        schema=MEDIA_SCHEMA)


def _parse_header(payload: bytes) -> tuple[int, int]:
    if payload is None or len(payload) < 8 or payload[:4] != _MAGIC:
        return (0, 0)
    return struct.unpack_from("<HH", payload, 4)


def _binary_parts(col) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of a binary column's raw buffers:
    (starts, lengths, flat_data, valid) — the batch-level primitives
    every vectorized byte kernel below indexes into (no per-row Python
    objects are ever materialized)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset: col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8) \
        if col.buffers()[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lens = np.diff(offsets).astype(np.int64)
    valid = np.ones(n, dtype=bool) if col.null_count == 0 else \
        col.is_valid().to_numpy(zero_copy_only=False)
    return starts, lens, data, valid


class DecodeMedia:
    """Actor stage: payload bytes → (width, height, ok). Real decoders
    would load here once per actor; the fake path parses the synthetic
    header and flags anything unparseable."""

    def __init__(self, allow_fake: bool = True):
        self.decoder = None
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self.decoder = "pil"
        except ImportError:
            if not allow_fake:
                raise NotImplementedError(
                    "no image codec available (PIL not installed); "
                    "pass allow_fake=True for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized header parse: gather magic + LE uint16 dims straight
        # out of the binary column's flat data buffer — no per-row bytes
        starts, lens, data, valid = _binary_parts(batch.column("payload"))
        n = len(lens)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        parse = valid & (lens >= 8)
        if parse.any():
            s = starts[parse]
            hdr_ok = np.ones(len(s), dtype=bool)
            for i, b in enumerate(_MAGIC):
                hdr_ok &= data[s + i] == b
            w = data[s + 4].astype(np.int32) | (data[s + 5].astype(np.int32) << 8)
            h = data[s + 6].astype(np.int32) | (data[s + 7].astype(np.int32) << 8)
            widths[parse] = np.where(hdr_ok, w, 0)
            heights[parse] = np.where(hdr_ok, h, 0)
        ok = (widths > 0) & (heights > 0)
        return (batch.drop_columns(["payload"])
                .append_column("width", pa.array(widths))
                .append_column("height", pa.array(heights))
                .append_column("decode_ok", pa.array(ok)))


class ExtractMediaFeatures:
    """Actor stage: payload → small feature vector (list<float>).

    Real path would run batched model inference; the stub derives a
    deterministic 8-dim vector from the payload bytes so downstream
    similarity plumbing is exercised end-to-end."""

    DIM = 8

    def __init__(self, allow_fake: bool = True):
        self.model = None  # real model would load here, once per actor
        if not allow_fake:
            raise NotImplementedError("no feature model available in sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized: gather a body window per row from the flat data
        # buffer (clamped + zero-masked for short payloads), then one
        # matrix reduce — the shape real batched inference would take
        starts, lens, data, valid = _binary_parts(batch.column("payload"))
        n = len(lens)
        body = self.DIM * 8
        window = np.minimum(np.maximum(lens - 8, 0), body)   # bytes available
        idx = starts[:, None] + 8 + np.arange(body)[None, :]
        in_range = np.arange(body)[None, :] < window[:, None]
        mat = np.zeros((n, body), dtype=np.float64)
        if n and len(data):
            flat_idx = np.clip(idx, 0, len(data) - 1)
            mat = data[flat_idx].astype(np.float64) * in_range
        full = valid & (window >= body)
        v = np.where(full[:, None],
                     mat.reshape(n, self.DIM, 8).mean(axis=2),
                     mat[:, : self.DIM])
        v[~valid | (lens < 8)] = 0.0
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        v = (v / norms[:, None]).astype(np.float32)
        return (batch.select(["media_ref", "mime"])
                .append_column("features",
                               pa.array(list(v), type=pa.list_(pa.float32()))))


def decode_media(source: Any, *, concurrency=(1, 8), batch_size: int = 1024,
                 allow_fake: bool = True):
    """payload → dims/ok. Small batches: binary payloads are heavy
    (batch bytes, not rows, bound worker memory)."""
    return as_source(source).dataset().map_batches(
        DecodeMedia, fn_constructor_kwargs={"allow_fake": allow_fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def media_features(source: Any, *, concurrency=(1, 8), batch_size: int = 1024,
                   allow_fake: bool = True):
    return as_source(source).dataset().map_batches(
        ExtractMediaFeatures, fn_constructor_kwargs={"allow_fake": allow_fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def frame_sample_offsets(n_frames: np.ndarray, k: int, seed: int = 3
                         ) -> list[list[int]]:
    """Deterministic frame sampling: k evenly spaced frame indices with
    a seeded per-video phase jitter (video analog of span sampling)."""
    from jsonschema_ray.functions.sketches import hash64

    phases = hash64(n_frames.astype(np.uint64)) % np.uint64(997)
    out = []
    for n, ph in zip(n_frames, phases):
        n = int(n)
        if n <= 0:
            out.append([])
            continue
        kk = min(k, n)
        base = (np.arange(kk) * n) // kk
        jitter = int(ph) % max(1, n // max(1, kk))
        out.append(((base + jitter) % n).tolist())
    return out
