"""Baseline JPEG codec (functions/jpeg.py) — pure numpy + stdlib.

The encoder applies the T.81 forward pipeline (FDCT, Annex K quant,
canonical Huffman) independently of the decoder, so a round-trip with
a PSNR bar is a genuine two-sided test, not self-consistency. Scope
rejections (progressive, 16-bit quant tables, truncation) must return
None, never garbage pixels.
"""

import numpy as np
import pytest

from jsonschema_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 // max(1, w - 1)),
                     (yy * 255 // max(1, h - 1)),
                     ((xx + yy) % 256)], -1).astype(np.uint8)


def test_roundtrip_444_and_420_color():
    img = _gradient(41, 57)   # non-multiple-of-8/16 dims exercise padding
    for sub, bar in ((False, 40.0), (True, 36.0)):
        for q in (70, 85, 95):
            out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            assert out is not None and out.shape == img.shape
            assert _psnr(img, out) > bar, (sub, q)


def test_roundtrip_grayscale_and_tiny():
    g = _gradient(33, 29)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (33, 29, 1)
    assert _psnr(g, out[:, :, 0]) > 45.0
    # 1×1 and 8×8 edge sizes
    for h, w in ((1, 1), (8, 8), (7, 3)):
        img = _gradient(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=False))
        assert out.shape == (h, w, 3)


def test_roundtrip_noise_high_quality():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=95, subsample=False))
    assert _psnr(noise, out) > 30.0


def test_restart_markers():
    img = _gradient(64, 64)
    b = encode_jpeg(img, quality=85, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in b                   # DRI present
    assert any(bytes([0xFF, 0xD0 + m]) in b for m in range(8))
    out = decode_jpeg(b)
    assert out is not None
    base = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
    assert (out == base).all()    # RST resync is lossless vs no-RST


def test_determinism():
    img = _gradient(30, 30)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_rejects_out_of_scope_and_corrupt():
    img = _gradient(16, 16)
    b = bytearray(encode_jpeg(img, quality=85))
    assert decode_jpeg(bytes(b)) is not None
    # flip SOF0 marker to SOF2 (progressive) → None
    i = bytes(b).find(b"\xff\xc0")
    prog = bytes(b[:i + 1]) + b"\xc2" + bytes(b[i + 2:])
    assert decode_jpeg(prog) is None
    # truncate mid-entropy-data → None (huffman desync or short read)
    assert decode_jpeg(bytes(b[: len(b) // 3])) is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0junk") is None
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(None) is None


def test_image_features_stage_handles_jpeg(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.multimodal import (image_features,
                                                     real_media_table)
    from jsonschema_ray.sources.readers import DatasetSource

    t = real_media_table(32)
    src = DatasetSource(rd.from_arrow(t).repartition(4))
    img = image_features(src, concurrency=(1, 2)).to_pandas()
    ok = img[img["decode_ok"]]
    assert set(ok["mime"]) == {"image/x-portable-pixmap", "image/png",
                               "image/jpeg"}
    jp = ok[ok["mime"] == "image/jpeg"]
    assert len(jp) == 8
    assert (jp["width"] >= 16).all() and (jp["channels"] == 3).all()
    assert (jp["pix_std"] > 0).all()
    assert (jp["thumb"].str.len() == 64).all()


F3 = ("/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/"
      "doc/rust/html/embedded-book/assets/f3.jpg")


def test_progressive_roundtrip_matrix():
    """Progressive decode is bit-identical to baseline decode of the
    same quantized coefficients, across spectral-selection-only and
    multi-level successive-approximation scan scripts, gray/color,
    4:4:4/4:2:0, and non-multiple-of-8 dims; external validation of
    the decoder comes from the real-world third-party file below."""
    from jsonschema_ray.functions.jpeg import encode_progressive

    rng = np.random.default_rng(0)
    cases = [((8, 8), False), ((24, 32), False), ((24, 32, 3), False),
             ((24, 32, 3), True), ((37, 53, 3), True)]
    scripts = [(0, (0,), ((1, 63),)),
               (1, (2, 1, 0), ((1, 5), (6, 63))),
               (2, (3, 2, 1, 0), ((1, 2), (3, 10), (11, 63)))]
    for shape, sub in cases:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=80, subsample=sub))
        for dc_al, ac_als, bands in scripts:
            prog = decode_jpeg(encode_progressive(
                img, quality=80, subsample=sub, dc_al=dc_al,
                ac_als=ac_als, bands=bands))
            assert prog is not None, (shape, sub, dc_al)
            assert np.array_equal(base, prog), (shape, sub, dc_al)


def test_progressive_gradient_content():
    """Low-entropy content exercises long EOB runs across blocks."""
    from jsonschema_ray.functions.jpeg import encode_progressive

    img = _gradient(48, 64)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=False))
    prog = decode_jpeg(encode_progressive(img, quality=90,
                                          subsample=False))
    assert np.array_equal(base, prog)


@pytest.mark.skipif(not __import__("os").path.exists(F3),
                    reason="real-world progressive fixture not on disk")
def test_progressive_real_world_file():
    """A real progressive JPEG (third-party encoder, 4:2:2 sampling,
    10-scan script with AC refinement) decodes to plausible pixels."""
    img = decode_jpeg(open(F3, "rb").read())
    assert img is not None
    assert img.shape == (477, 720, 3)
    assert 60 < img.mean() < 180 and img.std() > 20
