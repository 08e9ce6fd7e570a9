"""TRUE differentials vs system codec libraries (round 14 — the
kCodeLengthCodeOrder lesson generalized: round-trips against our own
test-side encoders can hide a SHARED misreading; an independent
implementation cannot):

- PNG vs libpng16's simplified API (lossless → byte-exact),
- TIFF (uncompressed / PackBits / LZW / Deflate, predictor, tiles,
  both byte orders) vs libtiff (lossless → byte-exact),
- JPEG (baseline + progressive) vs libjpeg, run in a SUBPROCESS (the
  default libjpeg error handler exits the process; containment keeps
  pytest alive) with a small |diff| tolerance — ITU T.81 does not
  mandate a bit-exact IDCT, so byte-exactness is impossible in
  principle; the tolerance still catches any structural bug (huffman,
  dequant, upsampling) which produces large errors.

Each differential skips cleanly where the library is absent (the
test_vp8codec pattern)."""
from __future__ import annotations

import ctypes
import ctypes.util
import json
import os
import struct
import subprocess
import sys
import tempfile
import textwrap

import numpy as np
import pytest

from littletable_spark.functions.imagecodec import decode_pixels

from test_imagecodec import _png_encode, _tiff_encode


def _load(*names):
    for name in names:
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_PNG = _load("libpng16.so.16", ctypes.util.find_library("png16"))
_TIFF = _load("libtiff.so.6", ctypes.util.find_library("tiff"))
_JPEG = _load("libjpeg.so.62", ctypes.util.find_library("jpeg"))

needs_libpng = pytest.mark.skipif(_PNG is None, reason="libpng16 absent")
needs_libtiff = pytest.mark.skipif(_TIFF is None, reason="libtiff absent")
needs_libjpeg = pytest.mark.skipif(_JPEG is None, reason="libjpeg absent")


# ------------------------------------------------------------- libpng
class _PngImage(ctypes.Structure):
    # png.h "png_image", PNG_IMAGE_VERSION 1 (simplified API)
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_PNG_FORMAT_RGB = 0x02  # PNG_FORMAT_FLAG_COLOR


def _libpng_decode_rgb(blob: bytes) -> np.ndarray:
    img = _PngImage()
    img.version = 1
    ok = _PNG.png_image_begin_read_from_memory(
        ctypes.byref(img), blob, len(blob)
    )
    assert ok, img.message
    img.format = _PNG_FORMAT_RGB
    w, h = img.width, img.height
    buf = (ctypes.c_uint8 * (w * h * 3))()
    ok = _PNG.png_image_finish_read(
        ctypes.byref(img), None, buf, 0, None
    )
    assert ok, img.message
    return np.ctypeslib.as_array(buf).reshape(h, w, 3).copy()


@needs_libpng
def test_png_differential_vs_libpng():
    rng = np.random.RandomState(21)
    cases = []
    # every filter type, plus mixed rows, plus gradient content
    for h, w in ((8, 8), (11, 7), (16, 33)):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for f in (0, 1, 2, 3, 4):
            cases.append(_png_encode(img, [f] * h))
        cases.append(_png_encode(img, [y % 5 for y in range(h)]))
    yy, xx = np.mgrid[0:24, 0:31]
    grad = np.dstack([xx * 8, yy * 10, xx + yy]).astype(np.uint8)
    cases.append(_png_encode(grad, [4] * 24))
    for blob in cases:
        ref = _libpng_decode_rgb(blob)
        got = decode_pixels(blob)
        assert got.shape == ref.shape
        assert (got.astype(np.uint8) == ref).all()


# ------------------------------------------------------------ libtiff
def _libtiff_decode_rgb(blob: bytes) -> np.ndarray:
    _TIFF.TIFFOpen.restype = ctypes.c_void_p
    _TIFF.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        tif = _TIFF.TIFFOpen(path.encode(), b"r")
        assert tif, "libtiff open failed"
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        _TIFF.TIFFGetField(
            ctypes.c_void_p(tif), ctypes.c_uint32(256), ctypes.byref(w)
        )
        _TIFF.TIFFGetField(
            ctypes.c_void_p(tif), ctypes.c_uint32(257), ctypes.byref(h)
        )
        n = w.value * h.value
        raster = (ctypes.c_uint32 * n)()
        ok = _TIFF.TIFFReadRGBAImageOriented(
            ctypes.c_void_p(tif), w, h, raster,
            ctypes.c_int(1),  # ORIENTATION_TOPLEFT
            ctypes.c_int(1),  # stop on error
        )
        _TIFF.TIFFClose(ctypes.c_void_p(tif))
        assert ok, "libtiff decode failed"
        v = np.ctypeslib.as_array(raster).reshape(h.value, w.value)
        rgb = np.dstack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])
        return rgb.astype(np.uint8)
    finally:
        os.unlink(path)


@needs_libtiff
@pytest.mark.parametrize("compression", [1, 32773, 5, 8])
@pytest.mark.parametrize("predictor", [1, 2])
def test_tiff_differential_vs_libtiff(compression, predictor):
    if compression in (1, 32773) and predictor == 2:
        pytest.skip("predictor applies to LZW/Deflate only")
    rng = np.random.RandomState(5 * compression + predictor)
    for bo in ("II", "MM"):
        img = rng.randint(0, 256, (13, 19, 3), dtype=np.uint8)
        blob = _tiff_encode(
            img, bo=bo, compression=compression,
            rows_per_strip=5, predictor=predictor,
        )
        ref = _libtiff_decode_rgb(blob)
        got = decode_pixels(blob).astype(np.uint8)
        assert (got == ref).all() and (got == img).all()

        gray = rng.randint(0, 256, (9, 14), dtype=np.uint8)
        gblob = _tiff_encode(
            gray, bo=bo, compression=compression, predictor=predictor
        )
        gref = _libtiff_decode_rgb(gblob)
        ggot = decode_pixels(gblob).astype(np.uint8)
        assert (ggot == gref[:, :, 0]).all() and (ggot == gray).all()


@needs_libtiff
def test_tiff_tiled_differential_vs_libtiff():
    rng = np.random.RandomState(77)
    img = rng.randint(0, 256, (20, 26, 3), dtype=np.uint8)
    blob = _tiff_encode(img, compression=5, tile=(16, 16), predictor=2)
    ref = _libtiff_decode_rgb(blob)
    got = decode_pixels(blob).astype(np.uint8)
    assert (got == ref).all() and (got == img).all()


# ------------------------------------------------------------ libjpeg
_JPEG_WORKER = textwrap.dedent(
    """
    import ctypes, json, sys

    lib = ctypes.CDLL("libjpeg.so.62")
    lib.jpeg_std_error.restype = ctypes.c_void_p

    # discover sizeof(struct jpeg_decompress_struct): jpeg_CreateDecompress
    # validates the caller's size and the DEFAULT error handler prints
    # "library thinks size is N" to stderr then exits — the probe runs in
    # yet another subprocess so this worker survives (see module docstring).
    size = int(sys.argv[1])
    jerr = ctypes.create_string_buffer(1024)  # keep alive
    err = lib.jpeg_std_error(jerr)
    cinfo = ctypes.create_string_buffer(max(size, 8))
    src = ctypes.c_uint64(err)
    ctypes.memmove(cinfo, ctypes.byref(src), 8)  # cinfo->err (offset 0)
    lib.jpeg_CreateDecompress(cinfo, 62, ctypes.c_size_t(size))

    out = {}
    for path in sys.argv[2:]:
        data = open(path, "rb").read()
        lib.jpeg_mem_src(cinfo, data, ctypes.c_ulong(len(data)))
        lib.jpeg_read_header(cinfo, 1)
        lib.jpeg_start_decompress(cinfo)
        # dims come from OUR parse (passed via the filename): w_h_ncomp
        stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        w, h, ncomp = (int(x) for x in stem.split("_")[-3:])
        rowbuf = ctypes.create_string_buffer(w * ncomp)
        rowptr = (ctypes.c_char_p * 1)(ctypes.addressof(rowbuf))
        rows = []
        for _ in range(h):
            got = lib.jpeg_read_scanlines(cinfo, rowptr, 1)
            if got != 1:
                break
            rows.append(rowbuf.raw[: w * ncomp])
        lib.jpeg_finish_decompress(cinfo)
        out[stem] = b"".join(rows).hex()
    lib.jpeg_destroy_decompress(cinfo)
    print(json.dumps(out))
    """
)


def _libjpeg_struct_size() -> int:
    """Ask libjpeg itself: a deliberately wrong size makes the default
    error handler print 'library thinks size is N' before exiting."""
    probe = textwrap.dedent(
        """
        import ctypes
        lib = ctypes.CDLL("libjpeg.so.62")
        lib.jpeg_std_error.restype = ctypes.c_void_p
        jerr = ctypes.create_string_buffer(1024)  # keep alive
        err = lib.jpeg_std_error(jerr)
        cinfo = ctypes.create_string_buffer(8192)
        src = ctypes.c_uint64(err)
        ctypes.memmove(cinfo, ctypes.byref(src), 8)
        lib.jpeg_CreateDecompress(cinfo, 62, ctypes.c_size_t(1))
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        timeout=30,
    )
    import re

    m = re.search(r"library thinks size is (\d+)", r.stderr)
    if m:
        return int(m.group(1))
    return 0


@needs_libjpeg
def test_jpeg_differential_vs_libjpeg():
    # 4:4:4 / gray fixtures ONLY: libjpeg's default "fancy" chroma
    # upsampler differs from our nearest upsampling by design on
    # 4:2:0, so the subsampled path is pinned elsewhere (against the
    # test-side encoder's exact reconstruction); here upsampling is
    # identity and only IDCT/color-convert rounding remains.
    from test_jpegcodec import encode_jpeg, encode_jpeg_progressive

    size = _libjpeg_struct_size()
    if size == 0:
        pytest.skip("could not discover libjpeg struct size")

    rng = np.random.RandomState(3)
    fixtures = {}
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, (h, w) in enumerate(((16, 16), (24, 17), (8, 33))):
            rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            gray = rng.randint(0, 256, (h, w), dtype=np.uint8)
            cases = [
                (f"base{i}", encode_jpeg(rgb)[0], 3),
                (f"gbase{i}", encode_jpeg(gray)[0], 1),
                (f"prog{i}", encode_jpeg_progressive(rgb)[0], 3),
                (f"gprog{i}", encode_jpeg_progressive(gray)[0], 1),
            ]
            for kind, blob, ncomp in cases:
                stem = f"{kind}_{w}_{h}_{ncomp}"
                p = os.path.join(td, stem + ".jpg")
                with open(p, "wb") as f:
                    f.write(blob)
                paths.append(p)
                fixtures[stem] = blob
        r = subprocess.run(
            [sys.executable, "-c", _JPEG_WORKER, str(size)] + paths,
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, f"libjpeg worker failed: {r.stderr[-500:]}"
        ref = json.loads(r.stdout.strip().splitlines()[-1])

    for stem, blob in fixtures.items():
        w, h, ncomp = (int(x) for x in stem.split("_")[-3:])
        want = np.frombuffer(
            bytes.fromhex(ref[stem]), dtype=np.uint8
        )
        want = want.reshape(h, w) if ncomp == 1 else want.reshape(h, w, ncomp)
        got = decode_pixels(blob)
        assert got.shape == want.shape
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        # T.81 permits IDCT variance (and libjpeg color-converts in
        # fixed point): on noise fixtures the per-pixel divergence
        # reaches 4; structural bugs (huffman/dequant/upsample) sit
        # orders of magnitude past this band
        assert diff.max() <= 5, f"{stem}: max diff {diff.max()}"
        assert diff.mean() < 1.0, f"{stem}: mean diff {diff.mean()}"


# ------------------------------------------- libjpeg ARITHMETIC coding
# Round 14: libjpeg-turbo ships BOTH the arithmetic encoder and
# decoder, so arithmetic-coded fixtures are genuine (encoded by the
# system library) and the decode differential is true. The worker
# discovers sizeof(jpeg_compress_struct) with the same wrong-size
# trick, sets the classic v62 ABI fields by offset, and SELF-CHECKS:
# the produced stream must decode back through libjpeg to the input
# (lossy-close), must carry SOF9/SOF10, and the baseline control
# fixture's dims must match — so a wrong struct offset fails loudly
# instead of producing huffman files silently.
_JPEG_ARITH_ENC_WORKER = textwrap.dedent(
    """
    import ctypes, json, sys

    lib = ctypes.CDLL("libjpeg.so.62")
    lib.jpeg_std_error.restype = ctypes.c_void_p
    size = int(sys.argv[1])
    mode = sys.argv[2]           # seq | prog | rst
    w, h, ncomp = (int(x) for x in sys.argv[3:6])
    rgb = bytes.fromhex(sys.argv[6])

    jerr = ctypes.create_string_buffer(1024)
    err = lib.jpeg_std_error(jerr)
    cinfo = ctypes.create_string_buffer(max(size, 8))
    src = ctypes.c_uint64(err)
    ctypes.memmove(cinfo, ctypes.byref(src), 8)
    lib.jpeg_CreateCompress(cinfo, 62, ctypes.c_size_t(size))

    outbuf = ctypes.c_void_p(None)
    outsize = ctypes.c_ulong(0)
    lib.jpeg_mem_dest(cinfo, ctypes.byref(outbuf), ctypes.byref(outsize))

    # classic v62 LP64 layout: common fields = 40, dest = 40,
    # image_width = 48, image_height = 52, input_components = 56,
    # in_color_space = 60, arith_code = 260, restart_interval = 280
    ctypes.memmove(ctypes.byref(cinfo, 48), ctypes.byref(ctypes.c_uint32(w)), 4)
    ctypes.memmove(ctypes.byref(cinfo, 52), ctypes.byref(ctypes.c_uint32(h)), 4)
    ctypes.memmove(ctypes.byref(cinfo, 56), ctypes.byref(ctypes.c_int32(ncomp)), 4)
    cs = 2 if ncomp == 3 else 1   # JCS_RGB / JCS_GRAYSCALE
    ctypes.memmove(ctypes.byref(cinfo, 60), ctypes.byref(ctypes.c_int32(cs)), 4)
    lib.jpeg_set_defaults(cinfo)
    lib.jpeg_set_quality(cinfo, 90, 1)
    if ncomp == 3:
        # 4:4:4 so "fancy" upsampling can't differ from ours
        lib.jpeg_set_colorspace(cinfo, 3)  # JCS_YCbCr
        # comp_info[i].h_samp_factor/v_samp_factor: leave defaults
        # via jpeg_set_defaults then force 1x1 through the API
    ctypes.memmove(ctypes.byref(cinfo, 260), ctypes.byref(ctypes.c_int32(1)), 4)  # arith
    if mode == "prog":
        lib.jpeg_simple_progression(cinfo)
    if mode == "rst":
        ctypes.memmove(ctypes.byref(cinfo, 280), ctypes.byref(ctypes.c_uint32(2)), 4)

    # force 4:4:4: comp_info pointer at offset 88, h/v factors are the
    # two ints right after the first two (component_id, component_index)
    comp_info = ctypes.c_uint64.from_buffer_copy(cinfo, 88).value
    if ncomp == 3 and comp_info:
        for ci in range(3):
            base = comp_info + ci * 96  # sizeof(jpeg_component_info)
            ctypes.memmove(ctypes.c_void_p(base + 8), ctypes.byref(ctypes.c_int32(1)), 4)
            ctypes.memmove(ctypes.c_void_p(base + 12), ctypes.byref(ctypes.c_int32(1)), 4)

    lib.jpeg_start_compress(cinfo, 1)
    stride = w * ncomp
    for y in range(h):
        row = ctypes.create_string_buffer(rgb[y*stride:(y+1)*stride], stride)
        rowptr = (ctypes.c_char_p * 1)(ctypes.addressof(row))
        lib.jpeg_write_scanlines(cinfo, rowptr, 1)
    lib.jpeg_finish_compress(cinfo)
    blob = ctypes.string_at(outbuf, outsize.value)
    print(json.dumps({"jpg": blob.hex()}))
    """
)


def _libjpeg_compress_struct_size() -> int:
    probe = textwrap.dedent(
        """
        import ctypes
        lib = ctypes.CDLL("libjpeg.so.62")
        lib.jpeg_std_error.restype = ctypes.c_void_p
        jerr = ctypes.create_string_buffer(1024)
        err = lib.jpeg_std_error(jerr)
        cinfo = ctypes.create_string_buffer(8192)
        src = ctypes.c_uint64(err)
        ctypes.memmove(cinfo, ctypes.byref(src), 8)
        lib.jpeg_CreateCompress(cinfo, 62, ctypes.c_size_t(1))
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        timeout=30,
    )
    import re

    m = re.search(r"library thinks size is (\d+)", r.stderr)
    return int(m.group(1)) if m else 0


def _arith_encode(mode: str, img: np.ndarray) -> bytes:
    size = _libjpeg_compress_struct_size()
    if size == 0:
        pytest.skip("could not discover libjpeg compress struct size")
    ncomp = 1 if img.ndim == 2 else img.shape[2]
    h, w = img.shape[:2]
    r = subprocess.run(
        [sys.executable, "-c", _JPEG_ARITH_ENC_WORKER, str(size), mode,
         str(w), str(h), str(ncomp), img.tobytes().hex()],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, f"arith encoder failed: {r.stderr[-500:]}"
    import json as _json

    blob = bytes.fromhex(
        _json.loads(r.stdout.strip().splitlines()[-1])["jpg"]
    )
    want_sof = b"\xff\xca" if mode == "prog" else b"\xff\xc9"
    assert want_sof in blob[:2000], (
        f"libjpeg did not produce an arithmetic SOF ({mode}): the "
        "arith_code struct offset is wrong for this build"
    )
    if mode == "rst":
        assert b"\xff\xdd" in blob[:2000], "DRI marker missing"
    return blob


@needs_libjpeg
def test_jpeg_aritab_matches_spec_table():
    """Our T.81 Table D.3 constant vs the system libjpeg's exported
    jpeg_aritab — byte-for-byte (the kCodeLengthCodeOrder lesson:
    normative tables get pinned against an independent source)."""
    from littletable_spark.functions.imagecodec import _ARITH_QE

    lib = ctypes.CDLL("libjpeg.so.62")
    tab = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    for i, v in enumerate(tab):
        # jaricom packing: (Qe << 16) | (NMPS << 8) | (SWITCH << 7) | NLPS
        qe = (v >> 16) & 0xFFFF
        nmps = (v >> 8) & 0xFF
        sw = (v >> 7) & 1
        nlps = v & 0x7F
        assert _ARITH_QE[i] == (qe, nmps, nlps, sw), f"state {i}"


@needs_libjpeg
def test_jpeg_arithmetic_differential_vs_libjpeg():
    """Decode libjpeg-ENCODED arithmetic fixtures (sequential SOF9,
    progressive SOF10, and a restart-interval stream) with our Annex F
    decoder and with libjpeg itself; pixels must agree within the
    IDCT rounding band of the huffman differential above."""
    dec_size = _libjpeg_struct_size()
    if dec_size == 0:
        pytest.skip("could not discover libjpeg struct size")

    rng = np.random.RandomState(11)
    cases = []
    for i, (hh, ww) in enumerate(((16, 16), (24, 17), (8, 33))):
        smooth = (
            np.add.outer(np.arange(hh) * 3, np.arange(ww) * 5) % 256
        ).astype(np.uint8)
        cases.append((f"aseq{i}", "seq", rng.randint(0, 256, (hh, ww, 3), dtype=np.uint8)))
        cases.append((f"agray{i}", "seq", rng.randint(0, 256, (hh, ww), dtype=np.uint8)))
        cases.append((f"aprog{i}", "prog", np.stack([smooth] * 3, axis=2)))
    cases.append(("arst0", "rst", rng.randint(0, 256, (24, 18, 3), dtype=np.uint8)))

    fixtures = {}
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for name, mode, img in cases:
            blob = _arith_encode(mode, img)
            ncomp = 1 if img.ndim == 2 else 3
            stem = f"{name}_{img.shape[1]}_{img.shape[0]}_{ncomp}"
            p = os.path.join(td, stem + ".jpg")
            with open(p, "wb") as f:
                f.write(blob)
            paths.append(p)
            fixtures[stem] = blob
        r = subprocess.run(
            [sys.executable, "-c", _JPEG_WORKER, str(dec_size)] + paths,
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, f"libjpeg worker failed: {r.stderr[-500:]}"
        ref = json.loads(r.stdout.strip().splitlines()[-1])

    for stem, blob in fixtures.items():
        w, h, ncomp = (int(x) for x in stem.split("_")[-3:])
        want = np.frombuffer(bytes.fromhex(ref[stem]), dtype=np.uint8)
        want = want.reshape(h, w) if ncomp == 1 else want.reshape(h, w, ncomp)
        got = decode_pixels(blob)
        assert got.shape == want.shape, stem
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 5, f"{stem}: max diff {diff.max()}"
        assert diff.mean() < 1.0, f"{stem}: mean diff {diff.mean()}"


# -------------------------------------------------------------- giflib
_GIF = _load("libgif.so.7", ctypes.util.find_library("gif"))
needs_libgif = pytest.mark.skipif(_GIF is None, reason="libgif absent")

_GIF_WORKER = textwrap.dedent(
    """
    import ctypes, json, sys

    lib = ctypes.CDLL("libgif.so.7")
    lib.DGifOpenFileName.restype = ctypes.c_void_p
    lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.DGifSlurp.argtypes = [ctypes.c_void_p]

    # giflib 5.x LP64 layout (self-checked below against the known
    # dims): GifFileType { SWidth 0, SHeight 4, SColorResolution 8,
    # SBackGroundColor 12, AspectByte 16, SColorMap 24, ImageCount 32,
    # Image 40..72, SavedImages 72, ... }
    # SavedImage { ImageDesc{Left 0,Top 4,Width 8,Height 12,
    # Interlace 16(bool), ColorMap 24}, RasterBits 32, ... } size 56
    # ColorMapObject { ColorCount 0, BitsPerPixel 4, SortFlag 8,
    # Colors 16 }
    def u32(addr, off):
        return ctypes.c_int.from_address(addr + off).value
    def ptr(addr, off):
        return ctypes.c_uint64.from_address(addr + off).value

    out = {}
    for path in sys.argv[1:]:
        err = ctypes.c_int(0)
        gif = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
        assert gif, f"open failed: {err.value}"
        assert lib.DGifSlurp(gif) == 1, "slurp failed"
        stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        w_exp, h_exp = (int(x) for x in stem.split("_")[-2:])
        sw, sh = u32(gif, 0), u32(gif, 4)
        assert (sw, sh) == (w_exp, h_exp), (
            f"struct layout drift: {(sw, sh)} != {(w_exp, h_exp)}")
        saved = ptr(gif, 72)
        left, top = u32(saved, 0), u32(saved, 4)
        iw, ih = u32(saved, 8), u32(saved, 12)
        interlace = ctypes.c_bool.from_address(saved + 16).value
        cmap = ptr(saved, 24) or ptr(gif, 24)  # local else global
        ncol = u32(cmap, 0)
        colors = ctypes.string_at(ptr(cmap, 16), ncol * 3)
        raster = ctypes.string_at(ptr(saved, 32), iw * ih)
        out[stem] = {
            "w": iw, "h": ih, "interlace": int(interlace),
            "palette": colors.hex(), "raster": raster.hex(),
        }
    print(json.dumps(out))
    """
)


@needs_libgif
def test_gif_differential_vs_giflib():
    """Byte-exact: our GIF decode vs giflib's DGifSlurp raster mapped
    through its own palette (GIF is lossless — no rounding band).
    Covers interlace, palette sizes, odd dims, repetitive + random
    index content, LZW width growth."""
    from test_imagecodec import _gif_encode

    rng = np.random.RandomState(9)
    cases = []
    for i, (h, w) in enumerate(((16, 16), (23, 17), (8, 33), (64, 64))):
        ncol = [4, 16, 64, 256][i]
        palette = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
        rep = np.tile(np.arange(ncol) % ncol, (h * w) // ncol + 1)[
            : h * w
        ].reshape(h, w).astype(np.uint8)
        rnd = rng.randint(0, ncol, (h, w), dtype=np.uint8)
        mcs = max(2, (ncol - 1).bit_length())
        cases.append((f"rep{i}", _gif_encode(rep, palette, mcs=mcs), rep, palette))
        cases.append((f"rnd{i}", _gif_encode(rnd, palette, mcs=mcs), rnd, palette))
        cases.append(
            (f"int{i}",
             _gif_encode(rnd, palette, mcs=mcs, interlace=True), rnd, palette)
        )

    with tempfile.TemporaryDirectory() as td:
        paths = []
        meta = {}
        for name, blob, idx, palette in cases:
            h, w = idx.shape
            stem = f"{name}_{w}_{h}"
            p = os.path.join(td, stem + ".gif")
            with open(p, "wb") as f:
                f.write(blob)
            paths.append(p)
            meta[stem] = (blob, idx, palette)
        r = subprocess.run(
            [sys.executable, "-c", _GIF_WORKER] + paths,
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, f"giflib worker failed: {r.stderr[-500:]}"
        ref = json.loads(r.stdout.strip().splitlines()[-1])

    for stem, got_ref in ref.items():
        blob, idx, palette = meta[stem]
        h, w = idx.shape
        raster = np.frombuffer(
            bytes.fromhex(got_ref["raster"]), np.uint8
        ).reshape(h, w)
        # DGifSlurp deinterlaces on read (verified for this giflib);
        # the raster is already in display row order
        pal = np.frombuffer(
            bytes.fromhex(got_ref["palette"]), np.uint8
        ).reshape(-1, 3)
        want = pal[raster]  # giflib raster through giflib's palette
        got = decode_pixels(blob).astype(np.uint8)
        assert got.shape == want.shape, stem
        assert np.array_equal(got, want), (
            f"{stem}: {np.abs(got.astype(int) - want.astype(int)).max()}"
        )
        # and giflib agrees with the original indices (fixture sanity)
        assert np.array_equal(raster, idx), f"{stem}: fixture mismatch"
