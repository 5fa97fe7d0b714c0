"""Baseline JFIF (JPEG) codec — pure numpy + stdlib, zero codec libs.

Real ITU-T T.81 baseline sequential + progressive decode: marker parse, DQT/DHT/
SOF0/SOS/DRI, canonical Huffman entropy decode with byte-unstuffing
and restart markers, dequantize + inverse zigzag, exact orthonormal
8×8 IDCT (matrix form), chroma upsampling for any (h,v) ∈ {1,2}
sampling factors, JFIF YCbCr→RGB. The matching encoder (Annex K
standard quantization + Huffman tables, IJG quality scaling, optional
4:2:0 subsampling) exists so the decoder can be round-trip tested
without any external library producing fixtures.

Progressive (SOF2) decode is also real: T.81 Annex G spectral
selection + successive approximation (DC/AC first and refinement
scans, EOB runs, per-scan Huffman tables), coefficients accumulated
across scans and reconstructed at EOI — round-trip tested against the
baseline path on identical coefficients (the progressive encoder
below) and against a real-world third-party progressive file. Scope honesty: arithmetic coding,
12-bit precision, and lossless modes still return None.

Reference context: sourcemeta/jsonschema treats media as opaque bytes
validated by ``media_ref`` format only; this engine adds real decode
stages per the training-data brief.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K / JFIF constants ---------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Standard Huffman specs (T.81 Annex K.3): (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8×8 DCT-II basis; IDCT is the exact transpose
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) \
    * np.where(_k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


def _canonical_codes(bits, vals):
    """T.81 C.2: canonical (code, length) per symbol."""
    codes, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """(length, code) → symbol for the bit-serial reader."""
    out = {}
    for sym, (code, ln) in _canonical_codes(bits, vals).items():
        out[(ln, code)] = sym
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jcparam.c semantics)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)    # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)   # pad with 1s


def _csize(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H,W) → (H//8 * W//8, 8, 8) in raster MCU-free order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    H = -(-h // mh) * mh
    W = -(-w // mw) * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = True, restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder: RGB (h,w,3) or gray (h,w)/(h,w,1) uint8
    → JPEG bytes. ``subsample=True`` emits 4:2:0 (the common web
    layout), else 4:4:4. Standard Annex K quant (quality-scaled) and
    Huffman tables. ``restart_interval`` emits DRI + RSTn markers
    every N MCUs (exercises the decoder's resync path)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qtab = [qy]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cbp = _pad_edge(cb, 2, 2)
            crp = _pad_edge(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtab = [qy, qc, qc]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component quantized coefficient blocks, in MCU scan order
    comp_blocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        P = _pad_edge(p, 8 * mcus_y * sv // 1, 8)[: 8 * mcus_y * sv]
        P = _pad_edge(P, 8, 8 * mcus_x * sh)[:, : 8 * mcus_x * sh]
        blocks = _blocks_of(P) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qtab[ci][UNZIGZAG].reshape(8, 8)
        quant = np.round(coef / q).astype(np.int32)
        comp_blocks.append(
            quant.reshape(mcus_y * sv, mcus_x * sh, 8, 8))

    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                tsel = 0 if qsel[ci] == 0 else 1
                dct_, act_ = dc_codes[tsel], ac_codes[tsel]
                for by in range(sv):
                    for bx in range(sh):
                        blk = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        zz = blk.reshape(64)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s = _csize(diff)
                        code, ln = dct_[s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff > 0
                                   else diff + (1 << s) - 1, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act_[0xF0]
                                bw.put(code, ln)
                                run -= 16
                            s = _csize(v)
                            code, ln = act_[(run << 4) | s]
                            bw.put(code, ln)
                            bw.put(v if v > 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = act_[0x00]
                            bw.put(code, ln)
    bw.flush()

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qy),) + (((1, qc),) if not gray else ()):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(x) for x in q)
    nf = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    specs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        specs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, vals) in specs:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"
    out += bw.buf
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF   # pad past end
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:                                # a real marker
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Skip to next 0xFFxx (for RST) — discards partial byte."""
        self.acc, self.n = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                return
            self.pos += 1


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def decode_jpeg(payload: bytes):
    """Baseline sequential JFIF decode → (h, w, c) uint8 (c = 3 for
    YCbCr, 1 for grayscale) or None for anything outside baseline
    scope (progressive SOF2, arithmetic coding, 12-bit, truncated or
    corrupt streams)."""
    try:
        return _decode_jpeg_inner(payload)
    except Exception:
        return None


def _decode_jpeg_inner(payload: bytes):
    if payload is None or len(payload) < 4 or payload[:2] != b"\xFF\xD8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id)
    comps = None
    h = w = 0
    restart = 0
    progressive = False
    coefs = None                              # per-comp zigzag coef arrays
    scans = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:
            # EOI: progressive streams reconstruct here; baseline
            # should have returned from its (single) SOS already
            if progressive and scans and coefs is not None:
                return _reconstruct_progressive(comps, coefs, qt, h, w)
            return None
        if pos + 4 > n:
            return None
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:                    # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None               # 16-bit tables: not baseline
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1) \
                    .astype(np.int32)
                i += 65
        elif marker == 0xC4:                  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                nv = sum(bits)
                vals = list(body[i + 17: i + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):    # SOF0/1 baseline, SOF2 prog
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nf not in (1, 3) or h == 0 or w == 0 \
                    or h * w > 64 << 20:
                return None
            progressive = marker == 0xC2
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci: 9 + 3 * ci]
                sh, sv = hv >> 4, hv & 0x0F
                if sh not in (1, 2) or sv not in (1, 2):
                    return None
                comps.append({"id": cid, "sh": sh, "sv": sv, "tq": tq})
            if progressive:
                hmax = max(c["sh"] for c in comps)
                vmax = max(c["sv"] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coefs = []
                for c in comps:
                    c["hmax"], c["vmax"] = hmax, vmax
                    c["mcus_x"], c["mcus_y"] = mcus_x, mcus_y
                    # non-interleaved (per-component) block extent:
                    # ceil(ceil(dim·sampling/max_sampling) / 8)
                    cw = -(-w * c["sh"] // hmax)
                    ch = -(-h * c["sv"] // vmax)
                    c["nbw"] = -(-cw // 8)
                    c["nbh"] = -(-ch // 8)
                    coefs.append(np.zeros(
                        (mcus_y * c["sv"], mcus_x * c["sh"], 64),
                        np.int32))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None                       # arithmetic/lossless
        elif marker == 0xDD:                  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                  # SOS
            if progressive:
                if comps is None or coefs is None:
                    return None
                pos = _decode_prog_scan(payload, pos + 2 + seglen, body,
                                        comps, coefs, huff, restart)
                scans += 1
                continue
            ns = body[0]
            if comps is None or ns != len(comps):
                return None
            for si in range(ns):
                cs, tsel = body[1 + 2 * si], body[2 + 2 * si]
                match = next((c for c in comps if c["id"] == cs), None)
                if match is None:
                    return None
                match["dc"] = huff.get((0, tsel >> 4))
                match["ac"] = huff.get((1, tsel & 0x0F))
                if match["dc"] is None or match["ac"] is None:
                    return None
            data_pos = pos + 2 + seglen
            return _decode_scan(payload, data_pos, comps, qt, h, w,
                                restart)
        pos += 2 + seglen
    return None


def _decode_scan(payload, pos, comps, qt, h, w, restart):
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["sv"] * 8,
                                mcus_x * c["sh"] * 8), np.float64))
        if c["tq"] not in qt:
            return None
        c["q"] = qt[c["tq"]][UNZIGZAG].reshape(8, 8).astype(np.float64)
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    zz = np.empty(64, np.int32)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_to_marker()
                d = br.data
                if br.pos + 1 < len(d) and d[br.pos] == 0xFF \
                        and 0xD0 <= d[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["sv"]):
                    for bx in range(c["sh"]):
                        zz[:] = 0
                        t = _huff_decode(br, c["dc"])
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, c["ac"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = zz
                        coef = blk.reshape(8, 8) * c["q"]
                        px = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * c["sv"] + by) * 8
                        x0 = (mx * c["sh"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    out_planes = []
    for c, p in zip(comps, planes):
        if c["sh"] != hmax or c["sv"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["sv"], axis=0),
                          hmax // c["sh"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 §G.2. Coefficients accumulate in
# zigzag order across scans (DC/AC spectral selection + successive
# approximation); reconstruction happens once at EOI.
# ---------------------------------------------------------------------------

def _next_marker(payload: bytes, pos: int) -> int:
    """Byte offset of the next real marker (skips fill bytes, stuffed
    zeros and RSTn) at or after ``pos``."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00 \
                and not (0xD0 <= payload[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def _decode_prog_scan(payload: bytes, data_pos: int, body: bytes,
                      comps: list, coefs: list, huff: dict,
                      restart: int) -> int:
    """Decode one progressive SOS into the coefficient arrays; returns
    the byte offset of the marker that follows the entropy data."""
    ns = body[0]
    scomps = []
    for si in range(ns):
        cs, tsel = body[1 + 2 * si], body[2 + 2 * si]
        ci = next((i for i, c in enumerate(comps) if c["id"] == cs), None)
        if ci is None:
            raise ValueError("unknown scan component")
        scomps.append((ci, comps[ci], tsel))
    ss = body[1 + 2 * ns]
    se = body[2 + 2 * ns]
    a = body[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if ss > se or se > 63:
        raise ValueError("bad spectral selection")
    if ss == 0 and se != 0:
        # progressive DC and AC never share a scan (T.81 G.1.1.1.1);
        # also rejects baseline entropy data mislabeled as SOF2
        raise ValueError("DC scan must have Se=0")
    br = _BitReader(payload, data_pos)

    def handle_restart(state):
        br.align_to_marker()
        d = br.data
        if br.pos + 1 < len(d) and d[br.pos] == 0xFF \
                and 0xD0 <= d[br.pos + 1] <= 0xD7:
            br.pos += 2
        state["pred"] = [0] * len(comps)
        state["eobrun"] = 0

    state = {"pred": [0] * len(comps), "eobrun": 0}

    if ss == 0:                               # DC scan (se must be 0)
        if ah == 0:
            tables = {}
            for ci, c, tsel in scomps:
                t = huff.get((0, tsel >> 4))
                if t is None:
                    raise ValueError("missing DC table")
                tables[ci] = t

        def dc_block(ci, c, by, bx):
            zz = coefs[ci][by, bx]
            if ah == 0:
                t = _huff_decode(br, tables[ci])
                diff = _extend(br.bits(t), t) if t else 0
                state["pred"][ci] += diff
                zz[0] = state["pred"][ci] << al
            else:                             # refinement: one bit
                if br.bit():
                    zz[0] |= (1 << al)

        if ns > 1:                            # interleaved MCU order
            c0 = scomps[0][1]
            mcu_count = 0
            for my in range(c0["mcus_y"]):
                for mx in range(c0["mcus_x"]):
                    if restart and mcu_count and mcu_count % restart == 0:
                        handle_restart(state)
                    for ci, c, _ in scomps:
                        for by in range(c["sv"]):
                            for bx in range(c["sh"]):
                                dc_block(ci, c, my * c["sv"] + by,
                                         mx * c["sh"] + bx)
                    mcu_count += 1
        else:                                 # single comp: one block/MCU
            ci, c, _ = scomps[0]
            mcu_count = 0
            for by in range(c["nbh"]):
                for bx in range(c["nbw"]):
                    if restart and mcu_count and mcu_count % restart == 0:
                        handle_restart(state)
                    dc_block(ci, c, by, bx)
                    mcu_count += 1
        return _next_marker(payload, br.pos)

    # AC scan: T.81 requires exactly one component
    if ns != 1:
        raise ValueError("interleaved progressive AC scan")
    ci, c, tsel = scomps[0]
    actab = huff.get((1, tsel & 0x0F))
    if actab is None:
        raise ValueError("missing AC table")
    p1 = 1 << al
    m1 = -1 << al

    def ac_first(zz):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, actab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.bits(r)
                    return
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("AC overflow")
            zz[k] = _extend(br.bits(s), s) << al
            k += 1

    def ac_refine(zz):
        # §G.1.2.3: correction bits interleave with newly-nonzero
        # coefficients; EOB runs still emit correction bits
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _huff_decode(br, actab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        # run INCLUDES the current block: its remaining
                        # correction bits are consumed in the tail below
                        # before the count decrements (T.81 G.1.2.3)
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.bits(r)
                        break
                    val = 0
                else:
                    if s != 1:
                        raise ValueError("bad refinement magnitude")
                    val = p1 if br.bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        if br.bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0 and br.bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1

    fn = ac_first if ah == 0 else ac_refine
    arr = coefs[ci]
    mcu_count = 0
    for by in range(c["nbh"]):
        for bx in range(c["nbw"]):
            if restart and mcu_count and mcu_count % restart == 0:
                handle_restart(state)
            fn(arr[by, bx])
            mcu_count += 1
    return _next_marker(payload, br.pos)


def _reconstruct_progressive(comps, coefs, qt, h, w):
    """Dequantize + IDCT the accumulated coefficient arrays and
    assemble the image (vectorized per component)."""
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    out_planes = []
    for c, arr in zip(comps, coefs):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]][UNZIGZAG].reshape(8, 8).astype(np.float64)
        bh, bw = arr.shape[:2]
        nat = np.zeros((bh, bw, 64), np.float64)
        nat[:, :, ZIGZAG] = arr
        blocks = nat.reshape(bh, bw, 8, 8) * q
        px = np.einsum("ij,yxjk,kl->yxil", _DCT.T, blocks, _DCT) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if c["sh"] != hmax or c["sv"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["sv"], axis=0),
                              hmax // c["sh"], axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive encoder — T.81 Annex G encoder procedures (structured
# after the public libjpeg encode_mcu_DC/AC_first/refine algorithms).
# Exists so the progressive DECODER can be round-trip tested against
# the baseline path on identical quantized coefficients, and so the
# synthetic media corpus can carry real progressive payloads.
# ---------------------------------------------------------------------------

def _quantized_coefs(img, quality, subsample):
    """Shared front half of encoding: color convert, subsample, DCT,
    quantize → per-component zigzag-order coefficient arrays."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qtab = [qy]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cbp = _pad_edge(cb, 2, 2)
            crp = _pad_edge(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * 3
        planes = [y, cb, cr]
        qtab = [qy, qc, qc]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_zz = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        P = _pad_edge(p, 8 * mcus_y * sv, 8)[: 8 * mcus_y * sv]
        P = _pad_edge(P, 8, 8 * mcus_x * sh)[:, : 8 * mcus_x * sh]
        blocks = _blocks_of(P) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qtab[ci][UNZIGZAG].reshape(8, 8)
        quant = np.round(coef / q).astype(np.int64)
        # zigzag-order rows: zz[k] = quant_natural[ZIGZAG[k]]
        zz = quant.reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(zz.reshape(mcus_y * sv, mcus_x * sh, 64))
    return gray, h, w, samp, qsel, (qy, qc), comp_zz, mcus_x, mcus_y


class _ProgEnt:
    """Per-scan entropy state: EOB run + buffered correction bits."""

    def __init__(self, bw, actab):
        self.bw, self.actab = bw, actab
        self.eobrun = 0
        self.be = []    # bits owned by pending EOB-run blocks

    def sym(self, s):
        code, ln = self.actab[s]
        self.bw.put(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            e = self.eobrun.bit_length() - 1
            self.sym(e << 4)
            if e:
                self.bw.put(self.eobrun - (1 << e), e)
            self.eobrun = 0
        for b in self.be:
            self.bw.put(b, 1)
        self.be = []


def _enc_ac_first(ent, zz, ss, se, al):
    if all(int(abs(zz[k])) >> al == 0 for k in range(ss, se + 1)):
        ent.eobrun += 1
        if ent.eobrun == 0x7FFF:
            ent.flush_eobrun()
        return
    ent.flush_eobrun()
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)
        if t == 0:
            r += 1
            continue
        while r > 15:
            ent.sym(0xF0)
            r -= 16
        s = _csize(t)
        ent.sym((r << 4) | s)
        ent.bw.put(t if t > 0 else t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        ent.eobrun += 1
        if ent.eobrun == 0x7FFF:
            ent.flush_eobrun()


def _enc_ac_refine(ent, zz, ss, se, al):
    absv = [int(abs(zz[k])) >> al for k in range(ss, se + 1)]
    eob_rel = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_rel = i
    r = 0
    br = []     # correction bits since the last emitted symbol
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_rel:
            ent.flush_eobrun()
            ent.sym(0xF0)
            r -= 16
            for b in br:
                ent.bw.put(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        ent.flush_eobrun()
        ent.sym((r << 4) | 1)
        ent.bw.put(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in br:
            ent.bw.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        ent.eobrun += 1
        ent.be.extend(br)
        if ent.eobrun == 0x7FFF or len(ent.be) > 900:
            ent.flush_eobrun()


def encode_progressive(img, quality: int = 85, subsample: bool = False,
                       dc_al: int = 1, ac_als=(2, 1, 0),
                       bands=((1, 5), (6, 63))) -> bytes:
    """Progressive JFIF stream with full successive approximation:
    interleaved DC first at ``dc_al`` + refinements to 0, then per-
    component AC band scans at ``ac_als[0]`` and refinement passes
    down the list. Flat custom Huffman tables (progressive needs EOBn
    symbols that the Annex K baseline tables lack) ride in DHT."""
    gray, h, w, samp, qsel, (qy, qc), comp_zz, mcus_x, mcus_y = \
        _quantized_coefs(img, quality, subsample)
    nf = 1 if gray else 3
    _DC_FLAT = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
    _AC_VALS = [(r << 4) | v for r in range(16) for v in range(11)]
    _AC_FLAT = ([0] * 8 + [len(_AC_VALS)] + [0] * 7, _AC_VALS)
    dc_codes = _canonical_codes(*_DC_FLAT)
    ac_codes = _canonical_codes(*_AC_FLAT)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qy),) + (((1, qc),) if not gray else ()):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(x) for x in q)
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    specs = [(0x00, _DC_FLAT), (0x10, _AC_FLAT)]
    if not gray:
        specs += [(0x01, _DC_FLAT), (0x11, _AC_FLAT)]
    for tc, (bits, vals) in specs:
        dht = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(dht)) + dht

    def sos_header(comp_ids_tsel, ss, se, ah, al):
        o = b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(comp_ids_tsel),
                                      len(comp_ids_tsel))
        for cid, tsel in comp_ids_tsel:
            o += bytes([cid, tsel])
        return o + bytes([ss, se, (ah << 4) | al])

    # DC first scan (interleaved, arithmetic point transform by dc_al)
    bw = _BitWriter()
    pred = [0] * nf
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nf):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(comp_zz[ci][my * sv + by,
                                             mx * sh + bx, 0]) >> dc_al
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = _csize(diff)
                        code, ln = dc_codes[s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff > 0
                                   else diff + (1 << s) - 1, s)
    bw.flush()
    out += sos_header([(ci + 1, (0 if qsel[ci] == 0 else 1) << 4)
                       for ci in range(nf)], 0, 0, 0, dc_al) + bw.buf

    # DC refinement scans down to 0
    for al in range(dc_al - 1, -1, -1):
        bw = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(nf):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(comp_zz[ci][my * sv + by,
                                                mx * sh + bx, 0])
                            bw.put((v >> al) & 1, 1)
        bw.flush()
        out += sos_header([(ci + 1, 0) for ci in range(nf)],
                          0, 0, al + 1, al) + bw.buf

    # AC scans: per component, first pass then refinements
    first_al = ac_als[0]
    hmax = max(s0 for s0, _ in samp)
    vmax = max(s1 for _, s1 in samp)
    for ci in range(nf):
        sh, sv = samp[ci]
        tsel = 0 if qsel[ci] == 0 else 1
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        nbw = -(-cw // 8)
        nbh = -(-ch // 8)
        for (ss, se) in bands:
            bw = _BitWriter()
            ent = _ProgEnt(bw, ac_codes)
            for by in range(nbh):
                for bx in range(nbw):
                    _enc_ac_first(ent, comp_zz[ci][by, bx], ss, se,
                                  first_al)
            ent.flush_eobrun()
            bw.flush()
            out += sos_header([(ci + 1, tsel)], ss, se, 0, first_al) \
                + bw.buf
        for j in range(1, len(ac_als)):
            al = ac_als[j]
            for (ss, se) in bands:
                bw = _BitWriter()
                ent = _ProgEnt(bw, ac_codes)
                for by in range(nbh):
                    for bx in range(nbw):
                        _enc_ac_refine(ent, comp_zz[ci][by, bx], ss, se,
                                       al)
                ent.flush_eobrun()
                bw.flush()
                out += sos_header([(ci + 1, tsel)], ss, se, al + 1, al) \
                    + bw.buf
    out += b"\xFF\xD9"
    return bytes(out)
