"""H.265/HEVC structural layer: SPS build/parse round-trip (incl. the
full profile_tier_level block), two-byte-header emulation prevention,
hvcC record, IRAP fingerprints, and video_near_dup on a MIXED
H.264 + HEVC corpus — no fake decoder anywhere in this path."""

import pyarrow as pa
import pytest

from jsonschema_ray.functions.hevc import (
    NAL_CRA, NAL_IDR_W_RADL, NAL_SPS, NAL_TRAIL_R, build_hvcc, build_pps,
    build_sps, build_vps, ebsp_to_rbsp, is_irap, is_vcl, nal_type,
    parse_hvcc, parse_sps, rbsp_to_ebsp, sample_fingerprint,
    split_annexb, split_hvcc_sample)
from jsonschema_ray.pipelines.multimodal import (
    VideoKeyframePhash, mp4_codec_info, mp4_sample_table,
    synth_h264_mp4_bytes, synth_hevc_mp4_bytes, video_near_dup)


class TestBitstream:
    @pytest.mark.parametrize("w,h", [(3840, 2160), (1920, 1080),
                                     (1280, 720), (96, 80), (640, 360),
                                     (354, 288)])
    def test_sps_round_trip_geometry(self, w, h):
        sps = build_sps(w, h)
        assert nal_type(sps) == NAL_SPS
        got = parse_sps(sps)
        assert got is not None
        assert (got["width"], got["height"]) == (w, h)
        assert got["profile_idc"] == 1          # Main
        assert got["chroma_format_idc"] == 1    # 4:2:0
        assert got["bit_depth_luma"] == 8

    def test_emulation_prevention_round_trip(self):
        payloads = [bytes([NAL_IDR_W_RADL << 1, 1])
                    + b"\x00\x00\x01\x00\x00\x02\x00\x00\x03ab",
                    bytes([NAL_TRAIL_R << 1, 1]) + b"\x00" * 10,
                    bytes([NAL_SPS << 1, 1]) + bytes(range(256))]
        for p in payloads:
            e = rbsp_to_ebsp(p)
            # no start-code emulation survives past the 2-byte header
            assert b"\x00\x00\x01" not in e[2:]
            assert b"\x00\x00\x00" not in e[2:]
            assert ebsp_to_rbsp(e) == p

    def test_nal_type_taxonomy(self):
        assert is_vcl(NAL_TRAIL_R) and is_vcl(NAL_IDR_W_RADL)
        assert is_vcl(NAL_CRA) and not is_vcl(NAL_SPS)
        assert is_irap(NAL_IDR_W_RADL) and is_irap(NAL_CRA)
        assert not is_irap(NAL_TRAIL_R) and not is_irap(NAL_SPS)

    def test_hvcc_record_round_trip(self):
        vps, sps, pps = build_vps(), build_sps(640, 480), build_pps()
        rec = parse_hvcc(build_hvcc(vps, sps, pps))
        assert rec["nal_length_size"] == 4
        assert rec["vps"] == [vps]
        assert rec["sps"] == [sps] and rec["pps"] == [pps]
        assert rec["geometry"]["width"] == 640
        assert rec["geometry"]["height"] == 480

    def test_sample_fingerprint_invariance(self):
        body = bytes([NAL_IDR_W_RADL << 1, 1]) \
            + b"\x00\x00\x01payload\x00\x00\x00"
        ebsp = rbsp_to_ebsp(body)
        fa = sample_fingerprint(len(ebsp).to_bytes(4, "big") + ebsp)
        fb = sample_fingerprint(b"\x00\x00\x00\x01" + ebsp)
        assert fa is not None and fb is not None
        assert fa == fb and fa[1] is True
        trail = bytes([NAL_TRAIL_R << 1, 1]) + b"different"
        ft = sample_fingerprint(len(trail).to_bytes(4, "big") + trail)
        assert ft[1] is False and ft[0] != fa[0]
        # parameter-set-only sample: no VCL → None
        sps = build_sps(96, 80)
        assert sample_fingerprint(
            len(sps).to_bytes(4, "big") + sps) is None

    def test_annexb_split_shared_framing(self):
        nals = [build_sps(96, 80), build_pps(),
                bytes([NAL_IDR_W_RADL << 1, 1]) + b"abc"]
        stream = b"\x00\x00\x00\x01" + nals[0] + b"\x00\x00\x01" + \
            nals[1] + b"\x00\x00\x01" + nals[2]
        assert split_annexb(stream) == nals


class TestSynthHevcContainer:
    def test_sample_table_and_codec_info(self):
        p = synth_hevc_mp4_bytes(5, n_frames=9, width=354, height=288)
        fourcc, cfg = mp4_codec_info(p)
        assert fourcc == "hvc1"
        assert cfg["geometry"]["width"] == 354
        assert cfg["geometry"]["height"] == 288
        offs, szs, kf = mp4_sample_table(p)
        assert len(offs) == 9 and list(kf) == [0, 3, 6]
        # every keyframe sample splits into NALs ending in an IRAP
        for j in kf:
            raw = p[offs[j]: offs[j] + szs[j]]
            nals = split_hvcc_sample(raw, cfg["nal_length_size"])
            assert is_irap(nal_type(nals[-1]))

    def test_remux_variant_same_samples(self):
        a = synth_hevc_mp4_bytes(3, remux_variant=0)
        b = synth_hevc_mp4_bytes(3, remux_variant=1)
        assert a != b
        oa, sa, _ = mp4_sample_table(a)
        ob, sb, _ = mp4_sample_table(b)
        fa = [sample_fingerprint(a[o:o + s]) for o, s in zip(oa, sa)]
        fb = [sample_fingerprint(b[o:o + s]) for o, s in zip(ob, sb)]
        assert fa == fb


class TestVideoNearDupMixedCodec:
    def _corpus(self):
        """Mixed corpus: HEVC seeds 0..3 (0 and 2 re-muxed), plus an
        H.264 pair — one LSH pass over both codecs' frame rows."""
        rows = [(f"hv{seed}a", synth_hevc_mp4_bytes(seed, remux_variant=0))
                for seed in range(4)]
        rows.append(("hv0b", synth_hevc_mp4_bytes(0, remux_variant=1)))
        rows.append(("hv2b", synth_hevc_mp4_bytes(2, remux_variant=1)))
        rows.append(("avA", synth_h264_mp4_bytes(11, remux_variant=0)))
        rows.append(("avB", synth_h264_mp4_bytes(11, remux_variant=1)))
        return pa.table({
            "media_ref": [r[0] for r in rows],
            "payload": pa.array([r[1] for r in rows], pa.binary())})

    def test_stage_emits_irap_rows(self):
        out = VideoKeyframePhash()(self._corpus())
        # 8 videos x 3 keyframes (IRAP/IDR)
        assert out.num_rows == 24
        assert set(out.column("kf_index").to_pylist()) == {0, 3, 6}

    def test_near_dup_pairs(self, ray_session):
        import ray

        ds = ray.data.from_arrow(self._corpus())
        got = video_near_dup(ds, min_frames=2).to_pandas()
        pairs = set(map(tuple, got[["key_a", "key_b"]].values))
        assert ("hv0a", "hv0b") in pairs
        assert ("hv2a", "hv2b") in pairs
        assert ("avA", "avB") in pairs
        # no cross-seed or cross-codec false positives
        assert len(pairs) == 3

    def test_near_dup_frame_counts_exact(self, ray_session):
        """n_frames must be the EXACT distinct-frame-pair count (3
        identical IRAP fingerprints per re-mux pair), not inflated by
        the same frame pair surfacing from several LSH chunks.
        Regression pin: frame keys joined with an embedded \\x00 hit a
        pandas factorize(sort=True) bug (khash reads nul-terminated C
        strings) that broke Ray's pandas-block multi-key aggregate and
        reported n_frames≈22 here."""
        import ray

        ds = ray.data.from_arrow(self._corpus())
        got = video_near_dup(ds, min_frames=2).to_pandas()
        counts = {(r.key_a, r.key_b): r.n_frames
                  for r in got.itertuples()}
        assert counts[("hv0a", "hv0b")] == 3
        assert counts[("hv2a", "hv2b")] == 3
        assert counts[("avA", "avB")] == 3
