"""H.264 structural layer: SPS build/parse round-trip, emulation
prevention, avcC record, sample fingerprints, and video_near_dup on an
H.264-boxed corpus — no fake decoder anywhere in this path."""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.functions.h264 import (
    NAL_IDR, NAL_SPS, build_avcc, build_pps, build_sps, ebsp_to_rbsp,
    nal_type, parse_avcc, parse_sps, rbsp_to_ebsp, sample_fingerprint,
    split_annexb, split_avcc)
from jsonschema_ray.pipelines.multimodal import (
    VideoKeyframePhash, mp4_codec_info, mp4_sample_table,
    synth_h264_mp4_bytes, video_near_dup)


class TestBitstream:
    @pytest.mark.parametrize("w,h", [(1920, 1080), (1280, 720), (96, 80),
                                     (640, 360), (176, 144), (354, 288)])
    def test_sps_round_trip_geometry(self, w, h):
        sps = build_sps(w, h)
        assert nal_type(sps) == NAL_SPS
        got = parse_sps(sps)
        assert got is not None
        assert (got["width"], got["height"]) == (w, h)
        assert got["profile_idc"] == 66

    def test_emulation_prevention_round_trip(self):
        payloads = [b"\x65" + b"\x00\x00\x01\x00\x00\x02\x00\x00\x03ab",
                    b"\x41" + b"\x00" * 10,
                    b"\x67" + bytes(range(256))]
        for p in payloads:
            e = rbsp_to_ebsp(p)
            # no start-code emulation survives in the EBSP payload
            assert b"\x00\x00\x01" not in e[1:]
            assert b"\x00\x00\x00" not in e[1:]
            assert ebsp_to_rbsp(e) == p

    def test_annexb_split(self):
        nals = [b"\x67abc", b"\x68de", b"\x65fgh"]
        stream = b"\x00\x00\x00\x01" + nals[0] + b"\x00\x00\x01" + \
            nals[1] + b"\x00\x00\x01" + nals[2]
        assert split_annexb(stream) == nals

    def test_avcc_split_and_malformed(self):
        nals = [b"\x65" + b"x" * 20, b"\x41" + b"y" * 5]
        data = b"".join(len(n).to_bytes(4, "big") + n for n in nals)
        assert split_avcc(data) == nals
        assert split_avcc(data + b"\x00\x00\x00\xFF") == []

    def test_avcc_record_round_trip(self):
        sps, pps = build_sps(640, 480), build_pps()
        rec = parse_avcc(build_avcc(sps, pps))
        assert rec["nal_length_size"] == 4
        assert rec["sps"] == [sps] and rec["pps"] == [pps]
        assert rec["geometry"]["width"] == 640
        assert rec["geometry"]["height"] == 480

    def test_sample_fingerprint_invariance(self):
        body = b"\x65" + b"\x00\x00\x01payload\x00\x00\x00"
        ebsp = rbsp_to_ebsp(body)
        avcc_framed = len(ebsp).to_bytes(4, "big") + ebsp
        annexb_framed = b"\x00\x00\x00\x01" + ebsp
        fa = sample_fingerprint(avcc_framed)
        fb = sample_fingerprint(annexb_framed)
        assert fa is not None and fb is not None
        assert fa == fb and fa[1] is True
        other_nal = b"\x65" + b"different"
        other = sample_fingerprint(
            len(other_nal).to_bytes(4, "big") + other_nal)
        assert other[0] != fa[0]


class TestSynthH264Container:
    def test_sample_table_and_codec_info(self):
        p = synth_h264_mp4_bytes(5, n_frames=9, width=354, height=288)
        fourcc, avcc = mp4_codec_info(p)
        assert fourcc == "avc1"
        assert avcc["geometry"]["width"] == 354
        assert avcc["geometry"]["height"] == 288
        offs, szs, kf = mp4_sample_table(p)
        assert len(offs) == 9 and list(kf) == [0, 3, 6]
        # every keyframe sample splits into NALs ending in an IDR
        for j in kf:
            raw = p[offs[j]: offs[j] + szs[j]]
            nals = split_avcc(raw, avcc["nal_length_size"])
            assert nal_type(nals[-1]) == NAL_IDR

    def test_remux_variant_same_samples(self):
        a = synth_h264_mp4_bytes(3, remux_variant=0)
        b = synth_h264_mp4_bytes(3, remux_variant=1)
        assert a != b
        for p, q in [(a, b)]:
            oa, sa, ka = mp4_sample_table(p)
            ob, sb, kb = mp4_sample_table(q)
            fa = [sample_fingerprint(p[o:o + s])[0]
                  for o, s in zip(oa, sa)]
            fb = [sample_fingerprint(q[o:o + s])[0]
                  for o, s in zip(ob, sb)]
            assert fa == fb


class TestVideoNearDupH264:
    def _corpus(self):
        rows = []
        for seed in range(4):
            rows.append((f"vid{seed}a",
                         synth_h264_mp4_bytes(seed, remux_variant=0)))
        # re-muxed duplicates of seeds 0 and 2
        rows.append(("vid0b", synth_h264_mp4_bytes(0, remux_variant=1)))
        rows.append(("vid2b", synth_h264_mp4_bytes(2, remux_variant=1)))
        return pa.table({
            "media_ref": [r[0] for r in rows],
            "payload": pa.array([r[1] for r in rows], pa.binary())})

    def test_stage_emits_idr_rows(self):
        stage = VideoKeyframePhash()
        out = stage(self._corpus())
        # 6 videos x 3 IDR keyframes
        assert out.num_rows == 18
        assert set(out.column("kf_index").to_pylist()) == {0, 3, 6}

    def test_near_dup_pairs(self, ray_session):
        import ray

        ds = ray.data.from_arrow(self._corpus())
        got = video_near_dup(ds, min_frames=2).to_pandas()
        pairs = set(map(tuple, got[["key_a", "key_b"]].values))
        assert ("vid0a", "vid0b") in pairs
        assert ("vid2a", "vid2b") in pairs
        # no cross-seed false positives
        assert all(a[:4] == b[:4] for a, b in pairs)
