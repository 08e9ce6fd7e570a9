"""Lossy WebP (VP8 key frame, RFC 6386) decoder tests.

The primary check is a TRUE differential: fixtures are encoded by the
system libwebp (ctypes, no Python bindings needed) and the decoder's
YUV 4:2:0 reconstruction — prediction, coefficients, dequant, inverse
transforms AND the in-loop deblocking filter — must match libwebp's
own ``WebPDecodeYUV`` byte-for-byte. That pins the RFC 6386 tables
and arithmetic against the format's reference implementation rather
than against a test-side re-implementation (no circularity). Skipped
wholesale where libwebp.so is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from littletable_spark.functions.vp8codec import (
    decode_vp8,
    decode_vp8_yuv,
    sniff_vp8,
)
from littletable_spark.functions.webpcodec import decode_webp


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        if hasattr(lib, "WebPEncodeRGB") and hasattr(lib, "WebPDecodeYUV"):
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeYUV.restype = u8p
            lib.WebPDecodeYUV.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(u8p), ctypes.POINTER(u8p),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available for differential"
)


def _encode(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeRGB(
        rgb.tobytes(), w, h, w * 3, float(quality), ctypes.byref(out)
    )
    assert n > 0, "libwebp encode failed"
    buf = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return buf


def _decode_yuv_ref(webp: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u = u8p()
    v = u8p()
    stride = ctypes.c_int()
    uvstride = ctypes.c_int()
    yp = _LIB.WebPDecodeYUV(
        webp, len(webp), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uvstride),
    )
    assert yp, "libwebp decode failed"
    W, H, S, US = w.value, h.value, stride.value, uvstride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.ctypeslib.as_array(yp, shape=(H, S))[:, :W].copy()
    U = np.ctypeslib.as_array(u, shape=(ch, US))[:, :cw].copy()
    V = np.ctypeslib.as_array(v, shape=(ch, US))[:, :cw].copy()
    _LIB.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return Y, U, V


def _vp8_payload(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        fourcc = webp[pos : pos + 4]
        (size,) = struct.unpack_from("<I", webp, pos + 4)
        if fourcc == b"VP8 ":
            return webp[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _images():
    rng = np.random.RandomState(42)
    out = []
    for w, h in [(16, 16), (32, 32), (48, 32), (17, 13), (1, 1), (5, 3),
                 (64, 64), (33, 49)]:
        yy, xx = np.mgrid[0:h, 0:w]
        grad = np.stack(
            [
                xx * 255 // max(w - 1, 1),
                yy * 255 // max(h - 1, 1),
                (xx + yy) * 127 // max(w + h - 2, 1),
            ],
            -1,
        ).astype(np.uint8)
        noise = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        flat = np.full((h, w, 3), 77, np.uint8)
        mixed = grad.copy()
        mixed[h // 2 :, :] = noise[h // 2 :, :]
        out += [
            (f"grad{w}x{h}", grad),
            (f"noise{w}x{h}", noise),
            (f"flat{w}x{h}", flat),
            (f"mix{w}x{h}", mixed),
        ]
    return out


@needs_libwebp
def test_yuv_bit_exact_differential_grid():
    """Every fixture (8 sizes x 4 contents x 4 qualities = 128 decodes,
    covering B_PRED and 16x16 modes, all coefficient planes, odd
    dimensions, segmentation as the encoder applies it, and the normal
    loop filter) matches libwebp's YUV planes byte-for-byte."""
    failures = []
    for name, img in _images():
        for q in (10, 50, 75, 95):
            webp = _encode(img, q)
            ry, ru, rv = _decode_yuv_ref(webp)
            my, mu, mv = decode_vp8_yuv(_vp8_payload(webp))
            for pn, a, b in (("Y", my, ry), ("U", mu, ru), ("V", mv, rv)):
                if a.shape != b.shape or not np.array_equal(a, b):
                    failures.append(f"{name} q{q} {pn}")
    assert not failures, failures


@needs_libwebp
def test_decode_webp_routes_lossy():
    """Container path: decode_webp recognizes the VP8 chunk and
    returns HxWx3 RGB; luma of the RGB matches the YUV reconstruction
    through the documented BT.601 conversion."""
    img = _images()[0][1]
    webp = _encode(img, 80)
    rgb = decode_webp(webp)
    assert rgb.shape == (16, 16, 3)
    assert rgb.dtype == np.float64
    y, _, _ = decode_vp8_yuv(_vp8_payload(webp))
    # invert: BT.601 full-range luma of RGB ≈ Y plane
    back = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    )
    # clipping at 0/255 makes exact inversion impossible; bound the gap
    assert np.abs(back - y.astype(np.float64)).mean() < 8.0


@needs_libwebp
def test_decode_image_pipeline_handles_lossy_webp():
    """End-to-end through the multimodal dispatch: sniff_format sees
    webp, decode_pixels returns the pixel grid."""
    from littletable_spark.functions.imagecodec import decode_pixels

    img = _images()[4][1]  # grad 48x32
    webp = _encode(img, 60)
    px = decode_pixels(webp)
    assert px.shape[0] == img.shape[0] and px.shape[1] == img.shape[1]


def test_sniff_and_rejections():
    assert not sniff_vp8(b"\x00" * 3)
    # interframe tag (low bit set) rejected
    with pytest.raises(ValueError, match="key frame|truncated|start code"):
        decode_vp8_yuv(b"\x01\x00\x00\x9d\x01\x2a\x10\x00\x10\x00")
    # bad start code
    with pytest.raises(ValueError, match="start code|truncated"):
        decode_vp8_yuv(b"\x00\x00\x00\xff\x01\x2a\x10\x00\x10\x00" + b"\x00" * 8)
    # truncated partition
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8_yuv(b"\xf0\xff\x00\x9d\x01\x2a\x10\x00\x10\x00")
    with pytest.raises(ValueError):
        decode_vp8(b"")


@needs_libwebp
def test_rgb_output_deterministic():
    img = _images()[8][1]
    webp = _encode(img, 42)
    a = decode_webp(webp)
    b = decode_webp(webp)
    assert np.array_equal(a, b)
