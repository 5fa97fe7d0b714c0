"""Video re-encode candidate tier (container-consensus) + the
documented contract boundary of the video family (round-5 verdict #7):
the structural-fingerprint tier (video_near_dup) catches re-MUXES; a
cross-codec RE-ENCODE of identical content is invisible to it (pixel
decode for H.264/HEVC is out of scope) and is caught as a CANDIDATE by
video_reencode_candidates instead — planted-pair-exactly on a corpus
with content-driven keyframe cadences."""

import numpy as np
import pyarrow as pa

from jsonschema_ray.pipelines.multimodal import (
    parse_mp4, synth_h264_mp4_bytes, synth_hevc_mp4_bytes,
    synth_mjpeg_mp4_bytes, video_near_dup, video_reencode_candidates)


def _corpus() -> pa.Table:
    # content A: scene cuts at samples (1, 4, 7) — re-encoded twice
    a_h264 = synth_h264_mp4_bytes(1, kf_positions=(1, 4, 7))
    a_hevc = synth_hevc_mp4_bytes(2, kf_positions=(1, 4, 7))
    # content B: cuts at (1, 3, 8)
    b_h264 = synth_h264_mp4_bytes(3, kf_positions=(1, 3, 8))
    b_hevc = synth_hevc_mp4_bytes(4, kf_positions=(1, 3, 8))
    # unrelated: different keyframe pattern / frame count / fps
    u1 = synth_h264_mp4_bytes(5, kf_positions=(2, 5))
    u2 = synth_hevc_mp4_bytes(6, n_frames=7)
    u3 = synth_mjpeg_mp4_bytes(7)            # 8 fps — timing differs
    return pa.table({
        "media_ref": pa.array(["a264", "a265", "b264", "b265",
                               "u1", "u2", "u3"]),
        "payload": pa.array([a_h264, a_hevc, b_h264, b_hevc,
                             u1, u2, u3], pa.binary()),
    })


def test_kf_pattern_is_content_signature():
    m1 = parse_mp4(synth_h264_mp4_bytes(1, kf_positions=(1, 4, 7)))
    m2 = parse_mp4(synth_hevc_mp4_bytes(9, kf_positions=(1, 4, 7)))
    m3 = parse_mp4(synth_h264_mp4_bytes(1, kf_positions=(1, 3, 8)))
    assert m1["kf_pattern"] == m2["kf_pattern"]      # codec-invariant
    assert m1["kf_pattern"] != m3["kf_pattern"]      # cadence-sensitive
    # re-mux invariance: container rewrite keeps the pattern
    m4 = parse_mp4(synth_h264_mp4_bytes(1, kf_positions=(1, 4, 7),
                                        remux_variant=1))
    assert m1["kf_pattern"] == m4["kf_pattern"]


def test_reencode_candidates_planted_exact(ray_session):
    import ray

    ds = ray.data.from_arrow(_corpus())
    got = video_reencode_candidates(ds).to_pandas()
    pairs = set(zip(got["key_a"], got["key_b"]))
    assert pairs == {("a264", "a265"), ("b264", "b265")}
    assert int(got["n_dropped"].sum()) == 0


def test_fingerprint_tier_misses_reencodes(ray_session):
    """The documented gap, pinned: the structural tier must NOT pair
    the cross-codec re-encodes (their coded bytes differ and no pixel
    decode exists for these codecs) — that is exactly what the
    candidate tier above exists for."""
    import ray

    ds = ray.data.from_arrow(_corpus())
    got = video_near_dup(ds, min_frames=1).to_pandas()
    pairs = set(zip(got["key_a"], got["key_b"])) if len(got) else set()
    assert ("a264", "a265") not in pairs
    assert ("b264", "b265") not in pairs
