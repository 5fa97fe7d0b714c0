"""H.264 (ITU-T Rec. H.264 / ISO 14496-10) STRUCTURAL parsing — real,
no codec. Frame PIXEL reconstruction (inverse transform, prediction,
deblocking) is out of scope; what a 100 TB video-catalog stage needs
from H.264 streams — NAL unit boundaries and types, IDR/keyframe
identification, SPS geometry (width/height incl. cropping), stable
content fingerprints of coded samples — is pure spec-defined bit
parsing, implemented here from the public standard:

- NAL splitting for both framings: Annex-B start codes
  (``split_annexb``) and avcC length prefixes (``split_avcc``);
- EBSP→RBSP emulation-prevention removal (§7.4.1.1) and its inverse;
- Exp-Golomb bit reader/writer (§9.1) and a seq_parameter_set_rbsp
  parser (§7.3.2.1.1) → profile/level and cropped frame geometry;
- a *builder* for minimal valid SPS/PPS and an avcC configuration
  record (ISO 14496-15 §5.3.3.1) so tests can synthesize spec-valid
  avc1 streams deterministically.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "split_annexb", "split_avcc", "ebsp_to_rbsp", "rbsp_to_ebsp",
    "nal_type", "parse_sps", "build_sps", "build_pps", "build_avcc",
    "parse_avcc", "sample_fingerprint",
]

#: NAL unit types (Table 7-1): 1 = non-IDR slice, 5 = IDR slice,
#: 7 = SPS, 8 = PPS
NAL_SLICE, NAL_IDR, NAL_SPS, NAL_PPS = 1, 5, 7, 8


def nal_type(nal: bytes) -> int:
    return nal[0] & 0x1F if nal else -1


def split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex-B byte stream (00 00 01 / 00 00 00 01 start
    codes) into NAL units (EBSP, header byte included)."""
    out: list[bytes] = []
    i, n = 0, len(data)
    marks: list[tuple[int, int]] = []   # (code_start, payload_start)
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                marks.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                marks.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (_, s) in enumerate(marks):
        e = n if k + 1 == len(marks) else marks[k + 1][0]
        nal = data[s:e]
        if nal:
            out.append(nal)
    return out


def split_avcc(data: bytes, nal_length_size: int = 4) -> list[bytes]:
    """Split an avcC-framed sample (length-prefixed NALs) into NAL
    units. Returns [] on malformed framing."""
    out: list[bytes] = []
    i, n = 0, len(data)
    while i + nal_length_size <= n:
        ln = int.from_bytes(data[i:i + nal_length_size], "big")
        i += nal_length_size
        if ln <= 0 or i + ln > n:
            return []
        out.append(data[i:i + ln])
        i += ln
    return out if i == n else []


def ebsp_to_rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00) from the
    payload AFTER the one-byte NAL header."""
    out = bytearray(nal[:1])
    i, n = 1, len(nal)
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
    """Insert emulation-prevention bytes after the NAL header."""
    out = bytearray(nal[:1])
    zeros = 0
    for b in nal[1:]:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        nbits = k.bit_length()
        self.u(0, nbits - 1)
        self.u(k, nbits)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def trailing(self):
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def parse_sps(nal: bytes) -> "dict | None":
    """seq_parameter_set_rbsp (§7.3.2.1.1) → dict(profile_idc,
    level_idc, width, height, frame_mbs_only) or None. Accepts the
    EBSP NAL (header included)."""
    if nal_type(nal) != NAL_SPS:
        return None
    r = _BitReader(ebsp_to_rbsp(nal)[1:])
    try:
        profile = r.u(8)
        r.u(8)                       # constraint flags + reserved
        level = r.u(8)
        r.ue()                       # sps_id
        if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
            chroma = r.ue()
            if chroma == 3:
                r.u(1)
            r.ue()                   # bit_depth_luma_minus8
            r.ue()                   # bit_depth_chroma_minus8
            r.u(1)                   # qpprime flag
            if r.u(1):               # seq_scaling_matrix_present
                return None          # scaling lists: out of scope
        r.ue()                       # log2_max_frame_num_minus4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()
        elif poc_type == 1:
            r.u(1)
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()                       # max_num_ref_frames
        r.u(1)                       # gaps_in_frame_num
        pw = r.ue() + 1
        ph = r.ue() + 1
        frame_mbs_only = r.u(1)
        if not frame_mbs_only:
            r.u(1)                   # mb_adaptive
        r.u(1)                       # direct_8x8
        crop = [0, 0, 0, 0]
        if r.u(1):                   # frame_cropping
            crop = [r.ue() for _ in range(4)]
        width = pw * 16 - 2 * (crop[0] + crop[1])
        height = (2 - frame_mbs_only) * ph * 16 - 2 * (crop[2] + crop[3])
        return {"profile_idc": profile, "level_idc": level,
                "width": width, "height": height,
                "frame_mbs_only": frame_mbs_only}
    except (IndexError, ValueError):
        return None


def build_sps(width: int, height: int, profile: int = 66,
              level: int = 30) -> bytes:
    """Minimal valid baseline SPS NAL for the given geometry
    (4:2:0, frame_mbs_only, cropping for non-multiple-of-16 sizes)."""
    pw = (width + 15) // 16
    ph = (height + 15) // 16
    crop_r = (pw * 16 - width) // 2
    crop_b = (ph * 16 - height) // 2
    w = _BitWriter()
    w.u(profile, 8)
    w.u(0xC0, 8)                     # constraint_set0/1
    w.u(level, 8)
    w.ue(0)                          # sps_id
    w.ue(0)                          # log2_max_frame_num_minus4
    w.ue(2)                          # pic_order_cnt_type
    w.ue(1)                          # max_num_ref_frames
    w.u(0, 1)                        # gaps_in_frame_num
    w.ue(pw - 1)
    w.ue(ph - 1)
    w.u(1, 1)                        # frame_mbs_only
    w.u(1, 1)                        # direct_8x8
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)                        # vui_parameters_present
    w.trailing()
    return rbsp_to_ebsp(bytes([0x60 | NAL_SPS]) + w.bytes())


def build_pps() -> bytes:
    """Minimal valid PPS NAL (CAVLC, one slice group)."""
    w = _BitWriter()
    w.ue(0)                          # pps_id
    w.ue(0)                          # sps_id
    w.u(0, 1)                        # entropy_coding_mode (CAVLC)
    w.u(0, 1)                        # bottom_field_pic_order
    w.ue(0)                          # num_slice_groups_minus1
    w.ue(0)                          # num_ref_idx_l0
    w.ue(0)                          # num_ref_idx_l1
    w.u(0, 1)                        # weighted_pred
    w.u(0, 2)                        # weighted_bipred
    w.se(0)                          # pic_init_qp_minus26
    w.se(0)                          # pic_init_qs_minus26
    w.se(0)                          # chroma_qp_index_offset
    w.u(1, 1)                        # deblocking_filter_control
    w.u(0, 1)                        # constrained_intra_pred
    w.u(0, 1)                        # redundant_pic_cnt
    w.trailing()
    return rbsp_to_ebsp(bytes([0x60 | NAL_PPS]) + w.bytes())


def build_avcc(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord body (ISO 14496-15 §5.3.3.1),
    lengthSizeMinusOne = 3 (4-byte NAL prefixes)."""
    return bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1]) \
        + len(sps).to_bytes(2, "big") + sps \
        + bytes([1]) + len(pps).to_bytes(2, "big") + pps


def parse_avcc(body: bytes) -> "dict | None":
    """Parse an avcC record → dict(nal_length_size, sps(list),
    pps(list), geometry from the first SPS) or None."""
    if len(body) < 7 or body[0] != 1:
        return None
    nls = (body[4] & 3) + 1
    n_sps = body[5] & 0x1F
    i = 6
    sps_list, pps_list = [], []
    try:
        for _ in range(n_sps):
            ln = int.from_bytes(body[i:i + 2], "big")
            sps_list.append(body[i + 2:i + 2 + ln])
            i += 2 + ln
        n_pps = body[i]
        i += 1
        for _ in range(n_pps):
            ln = int.from_bytes(body[i:i + 2], "big")
            pps_list.append(body[i + 2:i + 2 + ln])
            i += 2 + ln
    except (IndexError, ValueError):
        return None
    geo = parse_sps(sps_list[0]) if sps_list else None
    return {"nal_length_size": nls, "sps": sps_list, "pps": pps_list,
            "geometry": geo}


def sample_fingerprint(sample: bytes, nal_length_size: int = 4,
                       ) -> "tuple[int, bool] | None":
    """Stable 64-bit content fingerprint of a coded H.264 sample:
    blake2b over the concatenated VCL NAL payloads (types 1/5) —
    invariant under re-muxing (box order, timescale, framing) but not
    under re-encoding, which requires pixel decode. Returns
    (fingerprint, is_idr) or None when the sample has no VCL NAL."""
    nals = split_avcc(sample, nal_length_size)
    if not nals:
        nals = split_annexb(sample)
    vcl = [n for n in nals if nal_type(n) in (NAL_SLICE, NAL_IDR)]
    if not vcl:
        return None
    h = hashlib.blake2b(digest_size=8)
    for n in vcl:
        h.update(ebsp_to_rbsp(n))
    fp = int.from_bytes(h.digest(), "big") & 0xFFFFFFFFFFFFFFFF
    is_idr = any(nal_type(n) == NAL_IDR for n in vcl)
    return np.uint64(fp), is_idr
