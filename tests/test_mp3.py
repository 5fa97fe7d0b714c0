"""MP3 structural layer (functions/mp3.py): header/frame-walk
exactness, re-tag + padding re-mux fingerprint invariance, resync
behavior, and the mixed WAV+MP3 audio_near_dup path."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.functions.mp3 import (build_id3v2, build_mp3,
                                          mp3_frame_fingerprints,
                                          parse_mp3, parse_mp3_header)


def test_header_decode_fields():
    b = build_mp3(1, n_frames=1)
    h = parse_mp3_header(struct.unpack_from(">I", b, 0)[0])
    assert h["version"] == 3 and h["bitrate_kbps"] == 128
    assert h["samplerate"] == 44100 and h["channels"] == 1
    assert h["samples"] == 1152
    # 144000*128/44100 = 417.9… → 417 + pad
    assert h["size"] == 417 + h["padding"]


def test_header_rejects_garbage():
    assert parse_mp3_header(0) is None
    assert parse_mp3_header(0xFFFFFFFF) is None          # br_idx 15
    assert parse_mp3_header(0xFFEB0000) is None          # br_idx 0 (free)
    # reserved version bits
    assert parse_mp3_header((0x7FF << 21) | (1 << 19) | (1 << 17)
                            | (9 << 12)) is None


@pytest.mark.parametrize("version,br,sr,spf", [
    (3, 128, 44100, 1152), (3, 320, 48000, 1152),
    (2, 64, 22050, 576), (0, 32, 11025, 576)])
def test_frame_walk_and_duration(version, br, sr, spf):
    n = 9
    b = build_mp3(7, n_frames=n, version=version, bitrate_kbps=br,
                  samplerate=sr)
    p = parse_mp3(b)
    assert len(p["frames"]) == n and p["n_resync"] == 0
    assert p["samplerate"] == sr and p["version"] == version
    assert p["duration_ms"] == pytest.approx(1000.0 * spf * n / sr)
    # frame sizes follow the recurrence exactly and tile the stream
    base = (144_000 if version == 3 else 72_000) * br
    for k, (off, size, bk, pad) in enumerate(p["frames"]):
        assert size == base // sr + pad and bk == br
    offs = [f[0] for f in p["frames"]]
    assert offs[0] == 0
    for k in range(1, n):
        assert offs[k] == offs[k - 1] + p["frames"][k - 1][1]


def test_id3v2_skip_and_id3v1_stop():
    tag = build_id3v2(3)
    body = build_mp3(11, n_frames=5)
    stream = tag + body + b"TAG" + b"\x00" * 125
    p = parse_mp3(stream)
    assert p["id3v2_bytes"] == len(tag)
    assert len(p["frames"]) == 5
    # offsets are absolute (include the tag)
    assert p["frames"][0][0] == len(tag)


def test_fingerprints_retag_and_padding_invariant():
    f0 = mp3_frame_fingerprints(build_mp3(42, n_frames=12))
    assert len(f0) == 12 and len(np.unique(f0)) == 12
    # every fingerprint carries the MP3 family bit and is non-negative
    assert ((f0 >> 62) & 1).all() and (f0 >= 0).all()
    f_tag = mp3_frame_fingerprints(build_mp3(42, n_frames=12,
                                             id3_seed=99))
    f_pad = mp3_frame_fingerprints(build_mp3(42, n_frames=12,
                                             pad_phase=1))
    np.testing.assert_array_equal(f0, f_tag)
    np.testing.assert_array_equal(f0, f_pad)
    f_other = mp3_frame_fingerprints(build_mp3(43, n_frames=12))
    assert not np.intersect1d(f0, f_other).size


def test_resync_through_corruption():
    b = build_mp3(5, n_frames=10)
    p0 = parse_mp3(b)
    # clobber the 4th frame's header: that frame is lost, the walker
    # resyncs on the 5th
    off = p0["frames"][3][0]
    bad = b[:off] + b"\x00\x00" + b[off + 2:]
    p = parse_mp3(bad)
    assert len(p["frames"]) == 9 and p["n_resync"] > 0


def test_non_mp3_inputs():
    assert parse_mp3(b"") is None
    assert parse_mp3(b"RIFF\x00\x00\x00\x00WAVEfmt ") is None
    assert mp3_frame_fingerprints(b"\xff\xfb").size == 0
    # a bare tag with no frames
    assert parse_mp3(build_id3v2(1)) is None


def test_audio_near_dup_mixed_wav_mp3(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.multimodal import (audio_near_dup,
                                                     synth_rich_wav_bytes)
    from jsonschema_ray.sources.readers import DatasetSource

    rows = [
        ("wav_a", synth_rich_wav_bytes(seed=1)),
        ("wav_a_re", synth_rich_wav_bytes(seed=1, scale=0.7)),
        ("wav_b", synth_rich_wav_bytes(seed=2)),
        ("mp3_a", build_mp3(100, n_frames=12)),
        ("mp3_a_remux", build_mp3(100, n_frames=12, id3_seed=1,
                                  pad_phase=1)),
        ("mp3_b", build_mp3(101, n_frames=12)),
        ("junk", b"\x00" * 64),
    ]
    t = pa.table({"media_ref": pa.array([r[0] for r in rows]),
                  "payload": pa.array([r[1] for r in rows],
                                      pa.binary())})
    out = audio_near_dup(DatasetSource(rd.from_arrow(t)),
                         min_shared=8).to_pandas()
    got = {tuple(sorted((a, b))): n for a, b, n in
           zip(out["key_a"], out["key_b"], out["n_shared"])}
    assert got[("mp3_a", "mp3_a_remux")] == 12    # every frame shared
    assert ("wav_a", "wav_a_re") in got
    # no cross-family or cross-seed pairs
    for (a, b) in got:
        fam = {a[:3], b[:3]}
        assert fam in ({"mp3"}, {"wav"}) or a[:3] == b[:3] \
            or {a, b} == {"wav_a", "wav_a_re"}
    assert ("mp3_a", "mp3_b") not in got
    assert all("junk" not in p for p in got)
