"""Lossy-WebP alpha (ALPH chunk) differential vs the system libwebp
(round 13): libwebp-ENCODED fixtures pin the VP8L-compressed alpha
path end-to-end (WebPEncodeRGBA / WebPEncodeLosslessRGBA →
decode_webp_rgba must equal WebPDecodeRGBA byte-for-byte on all four
channels), and hand-BUILT VP8X+ALPH containers pin the raw-alpha path
across all four filter methods — both decoders read the same bytes,
and ours must also round-trip the original plane. Plus the documented
rejections and the ANMF blend-flag compositing in webp_frames."""
from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from littletable_spark.functions.webpcodec import (
    _decode_alpha,
    decode_webp_rgba,
    webp_frames,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        if hasattr(lib, "WebPEncodeRGBA") and hasattr(lib, "WebPDecodeRGBA"):
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.restype = u8p
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available for differential"
)


def _encode_rgba(rgba: np.ndarray, quality: float | None) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.c_void_p()
    if quality is None:
        n = _LIB.WebPEncodeLosslessRGBA(
            rgba.tobytes(), w, h, w * 4, ctypes.byref(out)
        )
    else:
        n = _LIB.WebPEncodeRGBA(
            rgba.tobytes(), w, h, w * 4, float(quality), ctypes.byref(out)
        )
    assert n > 0, "libwebp encode failed"
    buf = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return buf


def _decode_rgba_ref(webp: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value * 4)).copy()
    _LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def _images():
    rng = np.random.RandomState(7)
    imgs = []
    # gradient RGB + diagonal alpha ramp
    h, w = 24, 33
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.dstack([
        (xx * 255 // max(w - 1, 1)),
        (yy * 255 // max(h - 1, 1)),
        ((xx + yy) * 255 // (w + h - 2)),
    ]).astype(np.uint8)
    a = ((xx + yy) * 255 // (w + h - 2)).astype(np.uint8)
    imgs.append(np.dstack([rgb, a]))
    # noise RGB + blocky alpha (sharp edges exercise filtering)
    h, w = 18, 27
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    a = np.where((np.arange(w) // 9)[None, :] % 2 == 0, 255, 40).astype(
        np.uint8
    ) * np.ones((h, 1), dtype=np.uint8)
    imgs.append(np.dstack([rgb, a]))
    # fully-opaque and nearly-transparent extremes
    h, w = 16, 16
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    imgs.append(np.dstack([rgb, np.full((h, w), 255, np.uint8)]))
    imgs.append(np.dstack([rgb, np.full((h, w), 3, np.uint8)]))
    return imgs


@needs_libwebp
def test_lossy_alpha_differential_vs_libwebp():
    """WebPEncodeRGBA emits VP8 + ALPH (VP8L-compressed alpha, encoder-
    chosen filter); our ALPHA plane must equal libwebp's byte-for-byte.
    (The RGB planes are pinned separately against WebPDecodeYUV in
    test_vp8codec — WebPDecodeRGBA's chroma path uses libwebp's fancy
    upsampler, ours the JPEG-style BT.601 conversion, so lossy RGB is
    compared at the YUV layer, not here.)"""
    n = 0
    for rgba in _images():
        for q in (50.0, 80.0, 95.0):
            webp = _encode_rgba(rgba, q)
            assert b"ALPH" in webp or (rgba[:, :, 3] == 255).all()
            ref = _decode_rgba_ref(webp)
            got = decode_webp_rgba(webp)
            assert got.shape == ref.shape
            assert (got[:, :, 3].astype(np.uint8) == ref[:, :, 3]).all()
            n += 1
    assert n == 12


@needs_libwebp
def test_lossless_alpha_differential_vs_libwebp():
    """WebPEncodeLosslessRGBA carries alpha in the VP8L A channel; our
    RGBA decode must equal libwebp's AND the original pixels."""
    for rgba in _images():
        webp = _encode_rgba(rgba, None)
        ref = _decode_rgba_ref(webp)
        got = decode_webp_rgba(webp).astype(np.uint8)
        assert (got == ref).all()
        assert (got == rgba).all()


def _forward_filter(plane: np.ndarray, method: int) -> np.ndarray:
    """libwebp's forward alpha filters (filters.c), for fixture
    construction: the differential below does not DEPEND on this being
    right (both decoders read the same bytes), but the round-trip
    assertion does."""
    h, w = plane.shape
    p = plane.astype(np.int64)
    out = p.copy()
    if method == 0:
        return plane
    # row 0 is always horizontally filtered with initial predictor 0
    out[0, 1:] = (p[0, 1:] - p[0, :-1]) & 0xFF
    if method == 1:  # horizontal
        out[1:, 0] = (p[1:, 0] - p[:-1, 0]) & 0xFF
        out[1:, 1:] = (p[1:, 1:] - p[1:, :-1]) & 0xFF
    elif method == 2:  # vertical
        out[1:] = (p[1:] - p[:-1]) & 0xFF
    else:  # gradient
        for y in range(1, h):
            for x in range(w):
                left = p[y, x - 1] if x else p[y - 1, 0]
                top = p[y - 1, x]
                tl = p[y - 1, x - 1] if x else top
                g = min(255, max(0, int(left) + int(top) - int(tl)))
                out[y, x] = (p[y, x] - g) & 0xFF
    return out.astype(np.uint8)


def _build_vp8x_alph(vp8_payload: bytes, alpha: np.ndarray,
                     filt: int, pre: int = 0) -> bytes:
    """Hand-build a VP8X still: ALPH (raw method, given filter,
    optional pre-processing bits) + VP8."""
    h, w = alpha.shape
    filtered = _forward_filter(alpha, filt)
    alph = bytes([(pre << 4) | (filt << 2)]) + filtered.tobytes()  # C=0 raw

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    vp8x = chunk(
        b"VP8X",
        bytes([0x10, 0, 0, 0])  # alpha flag
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little"),
    )
    body = b"WEBP" + vp8x + chunk(b"ALPH", alph) + chunk(b"VP8 ", vp8_payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8_payload(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        fourcc = webp[pos : pos + 4]
        (size,) = struct.unpack_from("<I", webp, pos + 4)
        if fourcc == b"VP8 ":
            return webp[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


@needs_libwebp
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_raw_alpha_all_filters_differential(filt):
    """Hand-built raw-method ALPH across every filter: libwebp and our
    decoder read the SAME container and their ALPHA planes must agree
    byte-for-byte AND round-trip the original values exactly (lossy
    RGB is pinned at the YUV layer in test_vp8codec)."""
    rng = np.random.RandomState(13 + filt)
    h, w = 21, 26
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    alpha = rng.randint(0, 256, (h, w), dtype=np.uint8)
    opaque = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    vp8 = _vp8_payload(_encode_rgba(opaque, 80.0))
    webp = _build_vp8x_alph(vp8, alpha, filt)
    ref = _decode_rgba_ref(webp)
    got = decode_webp_rgba(webp).astype(np.uint8)
    assert got.shape == ref.shape
    assert (got[:, :, 3] == ref[:, :, 3]).all()
    assert (got[:, :, 3] == alpha).all()


def test_alpha_rejections():
    with pytest.raises(ValueError, match="compression"):
        _decode_alpha(bytes([0x02]) + bytes(4), 2, 2)
    with pytest.raises(ValueError, match="truncated"):
        _decode_alpha(bytes([0x00]) + bytes(3), 2, 2)
    with pytest.raises(ValueError, match="empty"):
        _decode_alpha(b"", 2, 2)


@needs_libwebp
def test_anmf_blend_flag_compositing():
    """An ANMF frame with blend-method 0 alpha-composites over the
    canvas; blend-method 1 overwrites. Frame payload is a real lossy
    VP8 + raw ALPH pair; the expected canvas is computed with the
    documented round-half-up blend."""
    from littletable_spark.functions.vp8codec import decode_vp8

    h, w = 16, 16
    rgb = np.full((h, w, 3), 200, np.uint8)
    opaque = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    vp8 = _vp8_payload(_encode_rgba(opaque, 95.0))
    # what the lossy frame decodes to through OUR VP8 path (webp_frames
    # composites our decode; its YUV layer is pinned in test_vp8codec)
    frame_rgb = decode_vp8(vp8).astype(np.uint8).astype(np.uint32)
    alpha = np.full((h, w), 128, np.uint8)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def build(blend_bit: int) -> bytes:
        vp8x = chunk(
            b"VP8X",
            bytes([0x12, 0, 0, 0])  # anim + alpha flags
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"),
        )
        anim = chunk(b"ANIM", bytes([255, 255, 255, 255]) + b"\x00\x00")
        hdr = (
            (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
            + (10).to_bytes(3, "little") + bytes([blend_bit << 1])
        )
        anmf = chunk(
            b"ANMF",
            hdr + chunk(b"ALPH", bytes([0]) + alpha.tobytes())
            + chunk(b"VP8 ", vp8),
        )
        body = b"WEBP" + vp8x + anim + anmf
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # blend=0: composite over the white ANIM background
    frames = list(webp_frames(build(0)))
    assert len(frames) == 1
    got = frames[0][1].astype(np.uint32)
    bg = np.full_like(frame_rgb, 255)
    want = (frame_rgb * 128 + bg * 127 + 127) // 255
    assert (got == want).all()
    # blend=1: straight overwrite regardless of alpha
    frames = list(webp_frames(build(1)))
    assert (frames[0][1] == frame_rgb.astype(np.uint8)).all()


@needs_libwebp
def test_vp8l_real_encoder_differential_deep_codes():
    """Regression for the round-13 kCodeLengthCodeOrder fix (symbol 16
    sits at position 8, not last): real libwebp LOSSLESS encodes whose
    code-length codes use symbols >= 6 — exactly the streams the old
    constant misparsed — must decode byte-exactly on all 4 channels."""
    rng = np.random.RandomState(1)
    fixtures = [
        np.where(rng.randint(0, 2, (4, 4, 1)).astype(bool),
                 np.array([255, 0, 0, 255], np.uint8),
                 np.array([0, 0, 255, 255], np.uint8)),
        rng.randint(0, 256, (8, 8, 4), dtype=np.uint8),
        rng.randint(0, 256, (24, 31, 4), dtype=np.uint8),
        np.repeat(rng.randint(0, 256, (24, 1, 4), dtype=np.uint8), 17, axis=1),
    ]
    for rgba in fixtures:
        webp = _encode_rgba(np.ascontiguousarray(rgba), None)
        ref = _decode_rgba_ref(webp)
        got = decode_webp_rgba(webp).astype(np.uint8)
        assert (got == ref).all()


@needs_libwebp
def test_anmf_first_frame_blends_over_background_without_vp8x():
    """Round 14: with no VP8X chunk the canvas must initialize to the
    ANIM background color and frame 1 composites like any other frame
    (container spec) — previously the first frame's RGB was copied
    verbatim, showing frame pixels where background should show
    through its alpha."""
    from littletable_spark.functions.vp8codec import decode_vp8

    h, w = 16, 16
    rgb = np.full((h, w, 3), 200, np.uint8)
    opaque = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    vp8 = _vp8_payload(_encode_rgba(opaque, 95.0))
    frame_rgb = decode_vp8(vp8).astype(np.uint8).astype(np.uint32)
    alpha = np.full((h, w), 128, np.uint8)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    # ANIM (bg = solid green, BGRA order) + one ANMF, NO VP8X
    anim = chunk(b"ANIM", bytes([0, 255, 0, 255]) + b"\x00\x00")
    hdr = (
        (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        + (10).to_bytes(3, "little") + bytes([0])  # blend over canvas
    )
    anmf = chunk(
        b"ANMF",
        hdr + chunk(b"ALPH", bytes([0]) + alpha.tobytes())
        + chunk(b"VP8 ", vp8),
    )
    body = b"WEBP" + anim + anmf
    blob = b"RIFF" + struct.pack("<I", len(body)) + body

    frames = list(webp_frames(blob))
    assert len(frames) == 1
    got = frames[0][1].astype(np.uint32)
    bg = np.broadcast_to(np.array([0, 255, 0], np.uint32), (h, w, 3))
    want = (frame_rgb * 128 + bg * 127 + 127) // 255
    assert (got == want).all()


@needs_libwebp
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_preprocessed_levels_alpha_differential(filt):
    """Round 14: the ALPH pre-processing flag (P=1, set by encoders
    when alpha_quality < 100 quantized the levels) is INFORMATIVE per
    the container spec — libwebp's default path (alpha_dithering 0)
    returns the quantized plane verbatim. Hand-built P=1 containers
    with level-quantized planes must decode byte-identically in both
    decoders, across every row filter."""
    rng = np.random.RandomState(40 + filt)
    h, w = 19, 23
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    # level-quantized plane, like the encoder's quantize_levels output
    alpha = (rng.randint(0, 8, (h, w)) * 36).astype(np.uint8)
    opaque = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    vp8 = _vp8_payload(_encode_rgba(opaque, 80.0))
    webp = _build_vp8x_alph(vp8, alpha, filt, pre=1)
    ref = _decode_rgba_ref(webp)
    got = decode_webp_rgba(webp).astype(np.uint8)
    assert got.shape == ref.shape
    assert (got[:, :, 3] == ref[:, :, 3]).all()
    assert (got[:, :, 3] == alpha).all()
