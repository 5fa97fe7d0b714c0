"""H.265/HEVC (ITU-T Rec. H.265 / ISO 23008-2) STRUCTURAL parsing —
real, no codec. The exact analog of ``functions/h264.py`` for the
other codec that dominates real-world video corpora: what a 100 TB
video-catalog stage needs from HEVC streams — NAL unit boundaries and
types (two-byte NAL header, §7.3.1.2), IRAP/IDR keyframe
identification (Table 7-1, types 16..23), SPS geometry with the
conformance window (§7.3.2.2.1 incl. a full profile_tier_level
parse, §7.3.3), stable content fingerprints of coded samples — is
pure spec-defined bit parsing, implemented here from the public
standard:

- NAL splitting reuses the framing-identical Annex-B / length-prefix
  splitters from ``h264.py`` (start codes and length prefixes are
  byte-compatible across the two specs);
- EBSP→RBSP emulation prevention (§7.4.2) — identical byte rule to
  H.264 but applied after the TWO-byte NAL header;
- seq_parameter_set_rbsp parser → profile/tier/level and cropped
  frame geometry (SubWidthC/SubHeightC per chroma_format_idc,
  Table 6-1);
- *builders* for minimal spec-valid VPS/SPS/PPS and an hvcC
  HEVCDecoderConfigurationRecord (ISO 14496-15 §8.3.3.1) so tests can
  synthesize spec-valid hvc1 streams deterministically.

Frame PIXEL reconstruction stays out of scope (codec territory), as
for H.264.
"""

from __future__ import annotations

import hashlib

import numpy as np

from jsonschema_ray.functions.h264 import (_BitReader, _BitWriter,
                                           split_annexb, split_avcc)

__all__ = [
    "split_annexb", "split_hvcc_sample", "ebsp_to_rbsp", "rbsp_to_ebsp",
    "nal_type", "is_vcl", "is_irap", "parse_sps", "build_vps",
    "build_sps", "build_pps", "build_hvcc", "parse_hvcc",
    "sample_fingerprint",
]

#: NAL unit types (Table 7-1). VCL = 0..31; IRAP (keyframe-capable
#: random access points) = 16..23; IDR_W_RADL=19, IDR_N_LP=20,
#: CRA_NUT=21. Parameter sets: VPS=32, SPS=33, PPS=34.
NAL_TRAIL_R = 1
NAL_IDR_W_RADL, NAL_IDR_N_LP, NAL_CRA = 19, 20, 21
NAL_VPS, NAL_SPS, NAL_PPS = 32, 33, 34

#: (SubWidthC, SubHeightC) per chroma_format_idc (Table 6-1);
#: monochrome and 4:4:4 crop in single luma samples.
_SUB_WH = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}


def nal_type(nal: bytes) -> int:
    """nal_unit_type from the two-byte HEVC NAL header (§7.3.1.2)."""
    return (nal[0] >> 1) & 0x3F if nal else -1


def is_vcl(t: int) -> bool:
    return 0 <= t <= 31


def is_irap(t: int) -> bool:
    return 16 <= t <= 23


def _nal_header(t: int) -> bytes:
    # forbidden_zero=0, nuh_layer_id=0, nuh_temporal_id_plus1=1
    return bytes([(t << 1) & 0x7E, 0x01])


def split_hvcc_sample(data: bytes, nal_length_size: int = 4) -> list[bytes]:
    """Length-prefixed sample framing is byte-identical to avcC."""
    return split_avcc(data, nal_length_size)


def ebsp_to_rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 → 00 00) from the
    payload AFTER the two-byte NAL header (§7.4.2)."""
    out = bytearray(nal[:2])
    i, n = 2, len(nal)
    while i < n:
        if (i + 2 < n and nal[i] == 0 and nal[i + 1] == 0
                and nal[i + 2] == 3):
            out += nal[i:i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def rbsp_to_ebsp(nal: bytes) -> bytes:
    """Insert emulation-prevention bytes after the two-byte header."""
    out = bytearray(nal[:2])
    zeros = 0
    for b in nal[2:]:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _parse_ptl(r: _BitReader, max_sub_layers_minus1: int) -> dict:
    """profile_tier_level(1, maxNumSubLayersMinus1) — §7.3.3. Returns
    profile_space/tier/profile_idc/level_idc; sub-layer PTLs are
    skipped bit-exactly."""
    profile_space = r.u(2)
    tier = r.u(1)
    profile = r.u(5)
    compat = r.u(32)
    r.u(48)                          # source/constraint + reserved bits
    level = r.u(8)
    sub_profile_present, sub_level_present = [], []
    for _ in range(max_sub_layers_minus1):
        sub_profile_present.append(r.u(1))
        sub_level_present.append(r.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(max_sub_layers_minus1, 8):
            r.u(2)                   # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if sub_profile_present[i]:
            r.u(88)                  # sub-layer profile block
        if sub_level_present[i]:
            r.u(8)
    return {"profile_space": profile_space, "tier_flag": tier,
            "profile_idc": profile, "compatibility_flags": compat,
            "level_idc": level}


def _write_ptl(w: _BitWriter, profile: int, level: int):
    """Minimal profile_tier_level(1, 0) block: Main-profile-style
    compatibility flags, progressive + non-packed + frame-only
    constraint sources, zero reserved bits."""
    w.u(0, 2)                        # general_profile_space
    w.u(0, 1)                        # general_tier_flag
    w.u(profile, 5)
    w.u(1 << (31 - profile), 32)     # compatibility: own profile bit
    w.u(1, 1)                        # progressive_source
    w.u(0, 1)                        # interlaced_source
    w.u(1, 1)                        # non_packed_constraint
    w.u(1, 1)                        # frame_only_constraint
    w.u(0, 44)                       # 43 reserved + inbld
    w.u(level, 8)


def parse_sps(nal: bytes) -> "dict | None":
    """seq_parameter_set_rbsp (§7.3.2.2.1) → dict(profile_idc,
    tier_flag, level_idc, chroma_format_idc, width, height,
    bit_depth_luma, bit_depth_chroma) or None. Accepts the EBSP NAL
    (two-byte header included). Geometry applies the conformance
    window in chroma units (SubWidthC/SubHeightC)."""
    if nal_type(nal) != NAL_SPS:
        return None
    r = _BitReader(ebsp_to_rbsp(nal)[2:])
    try:
        r.u(4)                       # sps_video_parameter_set_id
        max_sub_layers_minus1 = r.u(3)
        r.u(1)                       # sps_temporal_id_nesting_flag
        ptl = _parse_ptl(r, max_sub_layers_minus1)
        r.ue()                       # sps_seq_parameter_set_id
        chroma = r.ue()
        if chroma == 3:
            r.u(1)                   # separate_colour_plane_flag
        pw = r.ue()
        ph = r.ue()
        crop = [0, 0, 0, 0]
        if r.u(1):                   # conformance_window_flag
            crop = [r.ue() for _ in range(4)]
        bdl = r.ue() + 8
        bdc = r.ue() + 8
        sw, sh = _SUB_WH.get(chroma, (1, 1))
        width = pw - sw * (crop[0] + crop[1])
        height = ph - sh * (crop[2] + crop[3])
        return {"profile_idc": ptl["profile_idc"],
                "tier_flag": ptl["tier_flag"],
                "level_idc": ptl["level_idc"],
                "chroma_format_idc": chroma,
                "width": width, "height": height,
                "bit_depth_luma": bdl, "bit_depth_chroma": bdc}
    except (IndexError, ValueError):
        return None


def build_vps() -> bytes:
    """Minimal valid VPS NAL (§7.3.2.1): one layer, one sub-layer,
    no timing info, no extensions."""
    w = _BitWriter()
    w.u(0, 4)                        # vps_video_parameter_set_id
    w.u(1, 1)                        # vps_base_layer_internal_flag
    w.u(1, 1)                        # vps_base_layer_available_flag
    w.u(0, 6)                        # vps_max_layers_minus1
    w.u(0, 3)                        # vps_max_sub_layers_minus1
    w.u(1, 1)                        # vps_temporal_id_nesting_flag
    w.u(0xFFFF, 16)                  # vps_reserved_0xffff_16bits
    _write_ptl(w, profile=1, level=120)
    w.u(1, 1)                        # sub_layer_ordering_info_present
    w.ue(1)                          # vps_max_dec_pic_buffering_minus1
    w.ue(0)                          # vps_max_num_reorder_pics
    w.ue(0)                          # vps_max_latency_increase_plus1
    w.u(0, 6)                        # vps_max_layer_id
    w.ue(0)                          # vps_num_layer_sets_minus1
    w.u(0, 1)                        # vps_timing_info_present_flag
    w.u(0, 1)                        # vps_extension_flag
    w.trailing()
    return rbsp_to_ebsp(_nal_header(NAL_VPS) + w.bytes())


def build_sps(width: int, height: int, profile: int = 1,
              level: int = 120) -> bytes:
    """Minimal valid Main-profile SPS NAL for the given geometry
    (4:2:0, 8-bit, frame-only). pic dimensions are padded to the
    MinCbSizeY (8) multiple and cropped back via the conformance
    window in 2-luma-sample chroma units — so width/height must be
    even, as for every 4:2:0 encoder."""
    pw = (width + 7) // 8 * 8
    ph = (height + 7) // 8 * 8
    crop_r = (pw - width) // 2       # units of SubWidthC = 2
    crop_b = (ph - height) // 2
    w = _BitWriter()
    w.u(0, 4)                        # sps_video_parameter_set_id
    w.u(0, 3)                        # sps_max_sub_layers_minus1
    w.u(1, 1)                        # sps_temporal_id_nesting_flag
    _write_ptl(w, profile, level)
    w.ue(0)                          # sps_seq_parameter_set_id
    w.ue(1)                          # chroma_format_idc 4:2:0
    w.ue(pw)
    w.ue(ph)
    if crop_r or crop_b:
        w.u(1, 1)                    # conformance_window_flag
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.ue(0)                          # bit_depth_luma_minus8
    w.ue(0)                          # bit_depth_chroma_minus8
    w.ue(4)                          # log2_max_pic_order_cnt_lsb_minus4
    w.u(1, 1)                        # sub_layer_ordering_info_present
    w.ue(1)                          # sps_max_dec_pic_buffering_minus1
    w.ue(0)                          # sps_max_num_reorder_pics
    w.ue(0)                          # sps_max_latency_increase_plus1
    w.ue(0)                          # log2_min_luma_cb_size_minus3
    w.ue(3)                          # log2_diff_max_min_luma_cb_size
    w.ue(0)                          # log2_min_luma_tb_size_minus2
    w.ue(3)                          # log2_diff_max_min_luma_tb_size
    w.ue(0)                          # max_transform_hierarchy_inter
    w.ue(0)                          # max_transform_hierarchy_intra
    w.u(0, 1)                        # scaling_list_enabled_flag
    w.u(0, 1)                        # amp_enabled_flag
    w.u(0, 1)                        # sample_adaptive_offset_enabled
    w.u(0, 1)                        # pcm_enabled_flag
    w.ue(0)                          # num_short_term_ref_pic_sets
    w.u(0, 1)                        # long_term_ref_pics_present
    w.u(0, 1)                        # sps_temporal_mvp_enabled
    w.u(0, 1)                        # strong_intra_smoothing_enabled
    w.u(0, 1)                        # vui_parameters_present_flag
    w.u(0, 1)                        # sps_extension_present_flag
    w.trailing()
    return rbsp_to_ebsp(_nal_header(NAL_SPS) + w.bytes())


def build_pps() -> bytes:
    """Minimal valid PPS NAL (§7.3.2.3): no tiles, no WPP, no
    extensions."""
    w = _BitWriter()
    w.ue(0)                          # pps_pic_parameter_set_id
    w.ue(0)                          # pps_seq_parameter_set_id
    w.u(0, 1)                        # dependent_slice_segments_enabled
    w.u(0, 1)                        # output_flag_present_flag
    w.u(0, 3)                        # num_extra_slice_header_bits
    w.u(0, 1)                        # sign_data_hiding_enabled_flag
    w.u(0, 1)                        # cabac_init_present_flag
    w.ue(0)                          # num_ref_idx_l0_default_minus1
    w.ue(0)                          # num_ref_idx_l1_default_minus1
    w.se(0)                          # init_qp_minus26
    w.u(0, 1)                        # constrained_intra_pred_flag
    w.u(0, 1)                        # transform_skip_enabled_flag
    w.u(0, 1)                        # cu_qp_delta_enabled_flag
    w.se(0)                          # pps_cb_qp_offset
    w.se(0)                          # pps_cr_qp_offset
    w.u(0, 1)                        # slice_chroma_qp_offsets_present
    w.u(0, 1)                        # weighted_pred_flag
    w.u(0, 1)                        # weighted_bipred_flag
    w.u(0, 1)                        # transquant_bypass_enabled_flag
    w.u(0, 1)                        # tiles_enabled_flag
    w.u(0, 1)                        # entropy_coding_sync_enabled
    w.u(1, 1)                        # loop_filter_across_slices
    w.u(0, 1)                        # deblocking_filter_control_present
    w.u(0, 1)                        # pps_scaling_list_data_present
    w.u(0, 1)                        # lists_modification_present_flag
    w.ue(0)                          # log2_parallel_merge_level_minus2
    w.u(0, 1)                        # slice_header_extension_present
    w.u(0, 1)                        # pps_extension_present_flag
    w.trailing()
    return rbsp_to_ebsp(_nal_header(NAL_PPS) + w.bytes())


def build_hvcc(vps: bytes, sps: bytes, pps: bytes) -> bytes:
    """HEVCDecoderConfigurationRecord body (ISO 14496-15 §8.3.3.1),
    lengthSizeMinusOne = 3 (4-byte NAL prefixes). Profile/tier/level
    and chroma/bit-depth fields mirror the SPS."""
    geo = parse_sps(sps) or {}
    out = bytearray()
    out.append(1)                    # configurationVersion
    out.append((0 << 6) | (geo.get("tier_flag", 0) << 5)
               | (geo.get("profile_idc", 1) & 0x1F))
    out += (1 << (31 - geo.get("profile_idc", 1))).to_bytes(4, "big")
    out += bytes([0b10110000, 0, 0, 0, 0, 0])   # constraint indicators
    out.append(geo.get("level_idc", 120))
    out += (0xF000).to_bytes(2, "big")          # '1111' + min_spatial 0
    out.append(0xFC | 0)                        # parallelismType
    out.append(0xFC | (geo.get("chroma_format_idc", 1) & 3))
    out.append(0xF8 | ((geo.get("bit_depth_luma", 8) - 8) & 7))
    out.append(0xF8 | ((geo.get("bit_depth_chroma", 8) - 8) & 7))
    out += (0).to_bytes(2, "big")               # avgFrameRate
    out.append((0 << 6) | (1 << 3) | (1 << 2) | 3)  # numTL=1, nested, nls-1
    arrays = [(NAL_VPS, [vps]), (NAL_SPS, [sps]), (NAL_PPS, [pps])]
    out.append(len(arrays))
    for t, nals in arrays:
        out.append(0x80 | t)                    # array_completeness=1
        out += len(nals).to_bytes(2, "big")
        for n in nals:
            out += len(n).to_bytes(2, "big") + n
    return bytes(out)


def parse_hvcc(body: bytes) -> "dict | None":
    """Parse an hvcC record → dict(nal_length_size, vps/sps/pps
    (lists), geometry from the first SPS) or None."""
    if len(body) < 23 or body[0] != 1:
        return None
    nls = (body[21] & 3) + 1
    n_arrays = body[22]
    i = 23
    nal_lists: dict[int, list[bytes]] = {}
    try:
        for _ in range(n_arrays):
            t = body[i] & 0x3F
            n = int.from_bytes(body[i + 1:i + 3], "big")
            i += 3
            lst = nal_lists.setdefault(t, [])
            for _ in range(n):
                ln = int.from_bytes(body[i:i + 2], "big")
                lst.append(body[i + 2:i + 2 + ln])
                i += 2 + ln
    except (IndexError, ValueError):
        return None
    sps_list = nal_lists.get(NAL_SPS, [])
    geo = parse_sps(sps_list[0]) if sps_list else None
    return {"nal_length_size": nls, "vps": nal_lists.get(NAL_VPS, []),
            "sps": sps_list, "pps": nal_lists.get(NAL_PPS, []),
            "geometry": geo}


def sample_fingerprint(sample: bytes, nal_length_size: int = 4,
                       ) -> "tuple[int, bool] | None":
    """Stable 64-bit content fingerprint of a coded HEVC sample:
    blake2b over the concatenated VCL NAL RBSP payloads (types 0..31)
    — invariant under re-muxing, not under re-encoding. Returns
    (fingerprint, is_irap) or None when the sample has no VCL NAL."""
    nals = split_hvcc_sample(sample, nal_length_size)
    if not nals:
        nals = split_annexb(sample)
    vcl = [n for n in nals if is_vcl(nal_type(n))]
    if not vcl:
        return None
    h = hashlib.blake2b(digest_size=8)
    for n in vcl:
        h.update(ebsp_to_rbsp(n))
    fp = int.from_bytes(h.digest(), "big") & 0xFFFFFFFFFFFFFFFF
    irap = any(is_irap(nal_type(n)) for n in vcl)
    return np.uint64(fp), irap
