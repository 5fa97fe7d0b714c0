"""MP3 (MPEG-1/2/2.5 Audio Layer III, ISO/IEC 11172-3 / 13818-3)
STRUCTURAL parsing — real, no codec. PCM reconstruction (huffman main
data, IMDCT, synthesis filterbank) is out of scope; what a 100 TB
audio-catalog stage needs from MP3 streams — frame boundaries,
bitrate/samplerate/channel layout, exact duration, and stable content
fingerprints that survive re-tagging and padding-variant re-muxing —
is pure spec-defined header arithmetic, implemented here from the
public standard:

- 4-byte frame-header decode (sync / version / layer / bitrate index /
  samplerate index / padding / channel mode per ISO 11172-3 §2.4.1.3
  and the 13818-3 LSF extension, incl. the MPEG-2.5 version bit);
- frame-size recurrence ``144·bitrate/samplerate + pad`` (MPEG-1 L3)
  and ``72·bitrate/samplerate + pad`` (MPEG-2/2.5 L3, 576-sample
  granules);
- ID3v2 tag skipping (syncsafe sizes, header+footer) and trailing
  ID3v1 ``TAG`` recognition, with junk-tolerant resync scanning;
- per-frame content fingerprints over the frame PAYLOAD only (header
  and the padding slot byte excluded) so a re-tagged or
  padding-shifted re-mux of identical coded audio fingerprints
  identically — the same re-mux-invariance contract as
  ``functions/h264.py:sample_fingerprint``;
- a *builder* for spec-valid deterministic MP3 byte streams
  (``build_mp3``) so tests and registry corpora can synthesize real
  framed streams without an encoder.

No reference analog (sourcemeta/jsonschema is a JSON toolkit) — this
is LLM-training-data-pipeline surface, same tier as the JPEG/H.264/
H.265 structural layers.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "parse_mp3_header", "parse_mp3", "mp3_frame_fingerprints",
    "build_mp3", "build_id3v2",
]

# bitrate tables (kbps), index 1..14; 0 = free-format (unsupported
# here), 15 = invalid.  ISO 11172-3 Table B.1 / 13818-3 Table B.2.
_BR_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320)
_BR_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160)
# samplerate tables by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_SR = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
       0: (11025, 12000, 8000)}


def parse_mp3_header(h: int) -> dict | None:
    """Decode one 32-bit Layer-III frame header (big-endian int).
    Returns None unless it is a valid, supported L3 header."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer = (h >> 17) & 0x3            # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    crc = ((h >> 16) & 1) == 0         # protection_bit 0 ⇒ CRC-16 present
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    pad = (h >> 9) & 1
    mode = (h >> 6) & 0x3              # 3 = mono
    bitrate = (_BR_V1_L3 if version == 3 else _BR_V2_L3)[br_idx]
    sr = _SR[version][sr_idx]
    spf = 1152 if version == 3 else 576        # samples per frame
    size = (144_000 if version == 3 else 72_000) * bitrate // sr + pad
    return {"version": version, "bitrate_kbps": bitrate,
            "samplerate": sr, "padding": pad, "crc": crc,
            "mode": mode, "channels": 1 if mode == 3 else 2,
            "samples": spf, "size": size}


def _id3v2_size(data: bytes, off: int) -> int:
    """Byte length of an ID3v2 tag starting at ``off`` (0 if none).
    Sizes are syncsafe (7 bits per byte); footer adds 10."""
    if data[off:off + 3] != b"ID3" or len(data) < off + 10:
        return 0
    b = data[off + 6:off + 10]
    if any(x & 0x80 for x in b):
        return 0
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    footer = 10 if data[off + 5] & 0x10 else 0
    return 10 + size + footer


def parse_mp3(data: bytes, *, max_resync: int = 1 << 16) -> dict | None:
    """Walk a Layer-III stream: skip ID3v2 tag(s), then follow the
    frame-size recurrence, resyncing through up to ``max_resync``
    junk bytes between frames (each resync candidate must decode to a
    valid header). Stops at a trailing ID3v1 ``TAG`` block or EOF.

    → ``{frames: [(offset, size, bitrate_kbps, padding)], samplerate,
    version, channels, duration_ms, id3v2_bytes, n_resync}`` or None
    when no valid frame exists."""
    n = len(data)
    off = 0
    id3 = 0
    while True:                                 # stacked tags are legal
        t = _id3v2_size(data, off)
        if not t:
            break
        off += t
        id3 += t
    end = n
    if n >= 128 and data[n - 128:n - 125] == b"TAG":
        end = n - 128
    frames: list[tuple[int, int, int, int]] = []
    meta = None
    resyncs = 0
    scanned = 0
    while off + 4 <= end:
        hdr = parse_mp3_header(struct.unpack_from(">I", data, off)[0])
        if hdr is None or off + hdr["size"] > end:
            if frames and scanned >= max_resync:
                break
            off += 1
            scanned += 1
            if frames:
                resyncs += 1
            continue
        scanned = 0
        if meta is None:
            meta = hdr
        frames.append((off, hdr["size"], hdr["bitrate_kbps"],
                       hdr["padding"]))
        off += hdr["size"]
    if meta is None:
        return None
    dur = 1000.0 * meta["samples"] * len(frames) / meta["samplerate"]
    return {"frames": frames, "samplerate": meta["samplerate"],
            "version": meta["version"], "channels": meta["channels"],
            "duration_ms": dur, "id3v2_bytes": id3, "n_resync": resyncs}


def mp3_frame_fingerprints(data: bytes) -> np.ndarray:
    """Stable per-frame content fingerprints: blake2b-64 over each
    frame's PAYLOAD — header (4 B), CRC slot (2 B when present) and
    the padding slot byte all excluded — so a re-tagged copy or a
    padding-shifted re-mux of the same coded audio yields the
    identical fingerprint sequence. Bit 62 is set to keep the value
    space disjoint from 16-bit Haitsma–Kalker sub-fingerprints when
    both families share one LSH bucket column.

    → int64 array, one fingerprint per frame (empty if not MP3)."""
    parsed = parse_mp3(data)
    if parsed is None:
        return np.empty(0, np.int64)
    out = np.empty(len(parsed["frames"]), np.int64)
    for k, (off, size, _, pad) in enumerate(parsed["frames"]):
        hdr = parse_mp3_header(struct.unpack_from(">I", data, off)[0])
        body_start = off + 4 + (2 if hdr["crc"] else 0)
        body = data[body_start:off + size - pad]
        h = hashlib.blake2b(body, digest_size=8).digest()
        v = int.from_bytes(h, "big") & 0x3FFF_FFFF_FFFF_FFFF
        out[k] = v | (1 << 62)
    return out


def _payload_bytes(seed: int, frame_idx: int, n: int) -> bytes:
    """Deterministic pseudo-random main-data bytes for one frame —
    splitmix64 over (seed, frame, lane), vectorized."""
    lanes = np.arange((n + 7) // 8, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(frame_idx) * np.uint64(0xBF58476D1CE4E5B9)
             + lanes)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x.tobytes()[:n]


def build_id3v2(seed: int, n_pad: int = 64) -> bytes:
    """Minimal spec-valid ID3v2.3 tag: one TIT2 text frame with a
    seed-derived title plus ``n_pad`` padding bytes."""
    title = f"synthetic-{seed:08d}".encode()
    frame = b"TIT2" + struct.pack(">I", len(title) + 1) + b"\x00\x00" \
        + b"\x00" + title
    body = frame + b"\x00" * n_pad
    sz = len(body)
    syncsafe = bytes(((sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                      (sz >> 7) & 0x7F, sz & 0x7F))
    return b"ID3\x03\x00\x00" + syncsafe + body


def build_mp3(seed: int, n_frames: int = 12, *, version: int = 3,
              bitrate_kbps: int = 128, samplerate: int = 44100,
              pad_phase: int | None = None, id3_seed: int | None = None,
              mono: bool = True) -> bytes:
    """Deterministic spec-valid Layer-III stream: ``n_frames`` frames
    whose main data is a pure function of (seed, frame index) — so two
    builds with the same seed but different tags / padding phase carry
    byte-identical payload regions and identical
    ``mp3_frame_fingerprints``. The padding bit follows the real
    encoder convention for 44100 Hz (non-integer frame length ⇒
    alternating pad), overridable via ``pad_phase`` (None ⇒ natural
    phase; an int shifts the alternation)."""
    sr_idx = _SR[version].index(samplerate)
    br_tab = _BR_V1_L3 if version == 3 else _BR_V2_L3
    br_idx = br_tab.index(bitrate_kbps)
    base = (144_000 if version == 3 else 72_000) * bitrate_kbps
    frames = []
    for k in range(n_frames):
        # spec-valid padding schedule: when base/samplerate is
        # non-integral (44100 family) real encoders alternate the pad
        # bit to keep the average frame length exact — model that with
        # a phase-shiftable alternation; integral rates never pad
        kk = k if pad_phase is None else k + pad_phase
        pad = (kk % 2) if base % samplerate else 0
        size = base // samplerate + pad
        h = (0x7FF << 21) | (version << 19) | (1 << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9) \
            | ((3 if mono else 0) << 6)
        body = _payload_bytes(seed, k, base // samplerate - 4)
        frames.append(struct.pack(">I", h) + body + (b"\x00" if pad
                                                     else b""))
    tag = build_id3v2(id3_seed) if id3_seed is not None else b""
    return tag + b"".join(frames)
