"""Baseline JPEG decode without PIL: pure stdlib/numpy (ITU T.81).

Fixtures are ENCODED here from known pixel arrays by a minimal
test-side baseline encoder (forward DCT + quantize + huffman, simple
fixed-length code tables — the decoder reads whatever tables the file
carries). The encoder also computes its own expected reconstruction
(dequantize + IDCT + upsample + color convert, the decoder's exact
math), so the decoder is checked DIFFERENTIALLY and exactly — not with
a loose quality tolerance.
"""

import struct

import numpy as np
import pytest

from littletable_spark.functions.imagecodec import (
    _JPEG_ZIGZAG,
    _DCT_C,
    decode_pixels,
    decode_to_gray,
    sniff_format,
)

# Annex K.1/K.2 quantization tables (natural order after de-zigzag is
# how the decoder stores them; these literals are in natural row-major
# order and get zigzagged for the wire below)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


# ------------------------------------------------------------------ #
# test-side encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        """Pad the last byte with 1-bits (T.81 convention)."""
        while self.nbits:
            self.write(1, 1)


# fixed-length huffman tables: DC symbols 0..11 at 4 bits (code == sym),
# AC all 256 run/size symbols at 9 bits (code == sym) — wasteful but
# trivially valid canonical tables; the decoder reads them from DHT
_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_VALS = bytes(range(12))
_AC_BITS = bytes([0] * 8 + [255, 1] + [0] * 6)  # 255 at len 9, 1 at len 10
_AC_VALS = bytes(list(range(255)) + [255])


def _dc_codes():
    # canonical: length-4 codes 0..11
    return {s: (s, 4) for s in range(12)}


def _ac_codes():
    # canonical: 255 length-9 codes 0..254, then symbol 255 at length 10
    codes = {s: (s, 9) for s in range(255)}
    codes[255] = (255 << 1, 10)
    return codes


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of an MCU-aligned plane;
    returns integer coefficient blocks (natural order)."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    out = np.zeros((h // 8, w // 8, 8, 8), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            F = _DCT_C @ blk @ _DCT_C.T
            out[by, bx] = np.round(F / quant.reshape(8, 8)).astype(np.int64)
    return out


def _reconstruct(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """The decoder's exact math: dequantize + IDCT + level shift."""
    nby, nbx = coefs.shape[:2]
    plane = np.zeros((nby * 8, nbx * 8))
    for by in range(nby):
        for bx in range(nbx):
            deq = coefs[by, bx].astype(np.float64) * quant.reshape(8, 8)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _DCT_C.T @ deq @ _DCT_C + 128.0
            )
    return plane


def _encode_block(bw, coef_block, pred, dc_codes, ac_codes):
    zz = coef_block.reshape(64)[_JPEG_ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, nb = dc_codes[t]
    bw.write(code, nb)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, nb = ac_codes[0xF0]  # ZRL
            bw.write(code, nb)
            run -= 16
        s = _category(v)
        code, nb = ac_codes[(run << 4) | s]
        bw.write(code, nb)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, nb = ac_codes[0x00]  # EOB
        bw.write(code, nb)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    subsample: bool = False,
    restart: int = 0,
    divisor: float = 4.0,
):
    """Minimal baseline JFIF encoder. img: HxW (gray) or HxWx3 uint8
    RGB. Returns (jpeg_bytes, expected_float_image) where expected is
    the decoder's exact reconstruction (pre-clip math replicated, then
    clipped)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _QL / divisor  # milder quantization than Annex K baseline
    qc = _QC / divisor
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsample:  # 4:2:0 — nearest (strided) chroma
            cb, cr = cb[::2, ::2], cr[::2, ::2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [ql, qc, qc]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # ---- serialize headers ---------------------------------------- #
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # 8-bit DQT in zigzag order, rounded with a floor of 1 — the
    # coefficients and expected reconstruction below use the tables AS
    # WRITTEN so the differential comparison is exact
    q8l = np.maximum(np.round(ql[_JPEG_ZIGZAG]), 1).astype(np.uint8)
    q8c = np.maximum(np.round(qc[_JPEG_ZIGZAG]), 1).astype(np.uint8)
    out += seg(0xDB, bytes([0x00]) + q8l.tobytes())
    if not gray:
        out += seg(0xDB, bytes([0x01]) + q8c.tobytes())
    ql_wire = np.zeros(64)
    qc_wire = np.zeros(64)
    ql_wire[_JPEG_ZIGZAG] = q8l.astype(np.float64)
    qc_wire[_JPEG_ZIGZAG] = q8c.astype(np.float64)
    coefs = []
    recon = []
    quants_wire = [ql_wire] + ([] if gray else [qc_wire, qc_wire])
    for p, q, (hs, vs) in zip(planes, quants_wire, samp):
        padded = np.pad(
            np.clip(p, 0, 255),
            (
                (0, mcuy * vs * 8 - p.shape[0]),
                (0, mcux * hs * 8 - p.shape[1]),
            ),
            mode="edge",
        )
        c = _fdct_quant(padded, q)
        coefs.append(c)
        recon.append(_reconstruct(c, q))
    full = []
    for r, (hs, vs) in zip(recon, samp):
        if hs != hmax:
            r = np.repeat(r, hmax // hs, axis=1)
        if vs != vmax:
            r = np.repeat(r, vmax // vs, axis=0)
        full.append(r[:h, :w])
    if gray:
        expected = np.clip(full[0], 0.0, 255.0)
    else:
        yy, cbb, crr = full
        expected = np.clip(
            np.stack(
                [
                    yy + 1.402 * (crr - 128.0),
                    yy - 0.344136 * (cbb - 128.0) - 0.714136 * (crr - 128.0),
                    yy + 1.772 * (cbb - 128.0),
                ],
                axis=2,
            ),
            0.0,
            255.0,
        )

    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += seg(0xC0, sof[: 6 + 3 * nc])
    # DHT: one DC + one AC table, shared by all components
    out += seg(0xC4, bytes([0x00]) + _DC_BITS + _DC_VALS)
    out += seg(0xC4, bytes([0x10]) + _AC_BITS + _AC_VALS)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    dc_codes, ac_codes = _dc_codes(), _ac_codes()
    bw = _BitWriter()
    preds = [0] * nc
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart and mcu and mcu % restart == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            hs, vs = samp[ci]
            for by in range(vs):
                for bx in range(hs):
                    preds[ci] = _encode_block(
                        bw,
                        coefs[ci][my * vs + by, mx * hs + bx],
                        preds[ci],
                        dc_codes,
                        ac_codes,
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out), expected


def encode_jpeg_channels(
    channels: np.ndarray, adobe_transform: int | None, divisor: float = 4.0
):
    """Baseline encoder for N equal-resolution components with an
    Adobe APP14 marker (CMYK/YCCK/RGB layouts). channels: HxWxN uint8
    WIRE values. Returns (blob, per-channel decoder-exact recon)."""
    h, w, nc = channels.shape
    ql = _QL / divisor

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    if adobe_transform is not None:
        out += seg(
            0xEE,
            b"Adobe" + b"\x00\x64" + b"\x00\x00" * 2 + bytes([adobe_transform]),
        )
    q8 = np.maximum(np.round(ql[_JPEG_ZIGZAG]), 1).astype(np.uint8)
    out += seg(0xDB, bytes([0x00]) + q8.tobytes())
    q_wire = np.zeros(64)
    q_wire[_JPEG_ZIGZAG] = q8.astype(np.float64)
    mcux, mcuy = -(-w // 8), -(-h // 8)
    coefs, recon = [], []
    for ci in range(nc):
        p = channels[:, :, ci].astype(np.float64)
        padded = np.pad(
            p, ((0, mcuy * 8 - h), (0, mcux * 8 - w)), mode="edge"
        )
        c = _fdct_quant(padded, q_wire)
        coefs.append(c)
        recon.append(_reconstruct(c, q_wire)[:h, :w])
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(">BBB", i + 1, 0x11, 0)
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + _DC_BITS + _DC_VALS)
    out += seg(0xC4, bytes([0x10]) + _AC_BITS + _AC_VALS)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    dc_codes, ac_codes = _dc_codes(), _ac_codes()
    bw = _BitWriter()
    preds = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            preds[ci] = _encode_block(
                bw, coefs[ci][my, mx], preds[ci], dc_codes, ac_codes
            )
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out), recon


# ------------------------------------------------------------------ #
# tests


def _rng(seed=7):
    return np.random.RandomState(seed)


def test_sniff_jpeg():
    blob, _ = encode_jpeg(np.full((8, 8), 130, dtype=np.uint8))
    assert sniff_format(blob) == "jpeg"


def test_gray_uniform_exact():
    """A flat gray image is DC-only: decode must be exact."""
    img = np.full((16, 16), 136, dtype=np.uint8)
    blob, expected = encode_jpeg(img)
    got = decode_pixels(blob)
    assert got.shape == (16, 16)
    np.testing.assert_allclose(got, expected, atol=1e-8)
    # and the reconstruction is within quantization distance of input
    assert np.max(np.abs(got - 136.0)) < 4.0


def test_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes — a spec-valid padded file must decode identically."""
    img = (np.arange(16)[:, None] * 9 + np.arange(16)[None, :]).astype(np.uint8)
    blob, expected = encode_jpeg(img)
    # pad after SOI and before every non-entropy segment marker
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
    np.testing.assert_allclose(decode_pixels(padded), expected, atol=1e-8)


def _exif_app1(orientation: int, bo: str = "II") -> bytes:
    fmt = "<" if bo == "II" else ">"
    entry = (
        struct.pack(fmt + "HHI", 0x0112, 3, 1)
        + struct.pack(fmt + "H", orientation)
        + b"\x00\x00"
    )
    tiff = (
        bo.encode()
        + struct.pack(fmt + "HI", 42, 8)
        + struct.pack(fmt + "H", 1)
        + entry
        + struct.pack(fmt + "I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_exif_orientation_all_values(bo):
    """An EXIF-tagged JPEG decodes to DISPLAY orientation: the decoded
    pixels are the stored pixels mapped per tag 0x0112 (both TIFF byte
    orders) — so a rotated-capture photo dedups against its upright
    twin."""
    from littletable_spark.functions.imagecodec import _apply_orientation

    img = (np.arange(16)[:, None] * 9 + np.arange(24)[None, :] * 2).astype(
        np.uint8
    )
    blob, expected = encode_jpeg(img)
    for o in range(1, 9):
        tagged = blob[:2] + _exif_app1(o, bo) + blob[2:]
        got = decode_pixels(tagged)
        np.testing.assert_allclose(
            got, _apply_orientation(expected, o), atol=1e-8, err_msg=f"o={o}"
        )
    # malformed EXIF never fails the decode
    bad = blob[:2] + b"\xff\xe1\x00\x08Exif\x00\x00" + blob[2:]
    np.testing.assert_allclose(decode_pixels(bad), expected, atol=1e-8)


def _exif_full_app1(
    orientation=6, make=b"TestCam", gps=(48.85837, 2.294481), bo="II"
) -> bytes:
    """APP1 with IFD0 (orientation, Make, DateTime) + a GPS sub-IFD
    carrying rational lat/lon."""
    fmt = "<" if bo == "II" else ">"
    dt = b"2024:05:06 07:08:09\x00"

    def rat3(deg: float) -> bytes:
        d = int(deg)
        m = int((deg - d) * 60)
        s = (deg - d - m / 60) * 3600
        return struct.pack(
            fmt + "IIIIII", d, 1, m, 1, int(round(s * 10000)), 10000
        )

    lat, lon = abs(gps[0]), abs(gps[1])
    # layout: header(8) IFD0(2+4*12+4) GPSIFD(2+4*12+4) then data area
    ifd0_off = 8
    gps_off = ifd0_off + 2 + 4 * 12 + 4
    data_off = gps_off + 2 + 4 * 12 + 4
    make_b = make + b"\x00"
    data = bytearray()
    make_ptr = data_off + 0
    data += make_b
    dt_ptr = data_off + len(data)
    data += dt
    lat_ptr = data_off + len(data)
    data += rat3(lat)
    lon_ptr = data_off + len(data)
    data += rat3(lon)

    def entry(tag, typ, count, value4: bytes) -> bytes:
        return struct.pack(fmt + "HHI", tag, typ, count) + value4

    def u32(v):
        return struct.pack(fmt + "I", v)

    def u16pad(v):
        return struct.pack(fmt + "H", v) + b"\x00\x00"

    ifd0 = struct.pack(fmt + "H", 4)
    ifd0 += entry(0x010F, 2, len(make_b), u32(make_ptr))
    ifd0 += entry(0x0112, 3, 1, u16pad(orientation))
    ifd0 += entry(0x0132, 2, len(dt), u32(dt_ptr))
    ifd0 += entry(0x8825, 4, 1, u32(gps_off))
    ifd0 += u32(0)
    lat_ref = b"S\x00\x00\x00" if gps[0] < 0 else b"N\x00\x00\x00"
    lon_ref = b"W\x00\x00\x00" if gps[1] < 0 else b"E\x00\x00\x00"
    gifd = struct.pack(fmt + "H", 4)
    gifd += entry(0x0001, 2, 2, lat_ref)
    gifd += entry(0x0002, 5, 3, u32(lat_ptr))
    gifd += entry(0x0003, 2, 2, lon_ref)
    gifd += entry(0x0004, 5, 3, u32(lon_ptr))
    gifd += u32(0)
    tiff = (
        bo.encode() + struct.pack(fmt + "HI", 42, ifd0_off)
        + ifd0 + gifd + bytes(data)
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_parse_exif_full(bo):
    from littletable_spark.functions.exifmeta import parse_exif

    blob, _ = encode_jpeg(np.full((8, 8), 99, dtype=np.uint8))
    tagged = blob[:2] + _exif_full_app1(gps=(48.85837, -2.294481), bo=bo) + blob[2:]
    m = parse_exif(tagged)
    assert m["has_exif"] and m["has_gps"]
    assert m["orientation"] == 6
    assert m["make"] == "TestCam"
    assert m["datetime"] == "2024:05:06 07:08:09"
    assert m["gps_lat"] == pytest.approx(48.85837, abs=1e-4)
    assert m["gps_lon"] == pytest.approx(-2.294481, abs=1e-4)
    bare = parse_exif(blob)
    assert not bare["has_exif"] and not bare["has_gps"]
    assert parse_exif(b"not a jpeg")["has_exif"] is False


def test_strip_exif_pixels_identical():
    from littletable_spark.functions.exifmeta import parse_exif, strip_exif

    img = (np.arange(16)[:, None] * 7 + np.arange(16)[None, :]).astype(np.uint8)
    blob, expected = encode_jpeg(img)
    tagged = (
        blob[:2]
        + _exif_full_app1(orientation=1)
        + b"\xff\xfe\x00\x0acomment!"  # COM segment
        + blob[2:]
    )
    scrubbed = strip_exif(tagged)
    assert parse_exif(scrubbed)["has_exif"] is False
    assert b"comment!" not in scrubbed
    np.testing.assert_allclose(decode_pixels(scrubbed), expected, atol=1e-8)
    assert strip_exif(blob) == blob  # nothing to drop: unchanged
    assert strip_exif(b"plain") == b"plain"  # non-JPEG passthrough


def test_exif_png_and_webp_variants():
    """The audit+scrub pair covers PNG (eXIf/tEXt chunks) and WebP
    (EXIF RIFF chunk + VP8X flag fix-up) too — pixels untouched."""
    import zlib as _z

    from littletable_spark.functions.exifmeta import parse_exif, strip_exif
    from littletable_spark.functions.imagecodec import decode_pixels

    # minimal 1x1 gray PNG with eXIf + tEXt chunks
    def chunk(t, d):
        c = t + d
        return struct.pack(">I", len(d)) + c + struct.pack(">I", _z.crc32(c))

    tiff = _exif_full_app1(gps=(10.5, 20.25))[10:]  # strip FF E1 len Exif\0\0
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    idat = chunk(b"IDAT", _z.compress(b"\x00\x7f"))
    png = (
        b"\x89PNG\r\n\x1a\n" + ihdr
        + chunk(b"tEXt", b"Author\x00Somebody")
        + chunk(b"eXIf", tiff)
        + idat + chunk(b"IEND", b"")
    )
    m = parse_exif(png)
    assert m["has_exif"] and m["has_gps"]
    assert m["gps_lat"] == pytest.approx(10.5, abs=1e-4)
    clean = strip_exif(png)
    assert parse_exif(clean)["has_exif"] is False
    assert b"Somebody" not in clean
    np.testing.assert_array_equal(decode_pixels(clean), decode_pixels(png))

    # minimal 1x1 VP8L inside a VP8X container with an EXIF chunk
    bits = []

    def w(v, n):
        for i in range(n):
            bits.append((v >> i) & 1)

    w(0x2F, 8); w(0, 14); w(0, 14); w(0, 1); w(0, 3)
    w(0, 1); w(0, 1); w(0, 1)  # no transforms/cache/meta
    for sym in (77, 200, 30, 255, 0):
        w(1, 1); w(0, 1); w(1, 1); w(sym, 8)
    payload = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        payload[i >> 3] |= b << (i & 7)
    payload = bytes(payload)

    def riff_chunk(fourcc, data):
        return fourcc + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    vp8x = riff_chunk(b"VP8X", bytes([0x0C]) + b"\x00" * 9)  # EXIF|XMP flags
    exifc = riff_chunk(b"EXIF", b"Exif\x00\x00" + tiff)
    vp8l = riff_chunk(b"VP8L", payload)
    body = vp8x + exifc + vp8l
    webp = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    m2 = parse_exif(webp)
    assert m2["has_exif"] and m2["gps_lon"] == pytest.approx(20.25, abs=1e-4)
    clean2 = strip_exif(webp)
    assert parse_exif(clean2)["has_exif"] is False
    assert clean2[20] & 0x0C == 0  # VP8X metadata flags cleared
    assert struct.unpack("<I", clean2[4:8])[0] == len(clean2) - 8
    np.testing.assert_array_equal(decode_pixels(clean2), decode_pixels(webp))
    assert decode_pixels(webp)[0, 0].tolist() == [200.0, 77.0, 30.0]


def test_exif_report_and_scrub_spark(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import (
        exif_report,
        scrub_image_metadata,
    )

    blob, _ = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8))
    gps_blob = blob[:2] + _exif_full_app1(gps=(-33.8568, 151.2153)) + blob[2:]
    t = Table("imgs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "blob": gps_blob},
            {"id": 1, "blob": blob},
            {"id": 2, "blob": b"not an image"},
        ]
    )
    rep = {r.id: r for r in exif_report(t, "blob", "id")}
    assert rep[0].has_gps and rep[0].gps_lat == pytest.approx(-33.8568, abs=1e-4)
    assert rep[0].make == "TestCam"
    assert not rep[1].has_exif and not rep[2].has_exif
    scrubbed = {r.id: bytes(r.blob) for r in scrub_image_metadata(t, "blob", "id")}
    from littletable_spark.functions.exifmeta import parse_exif

    assert parse_exif(scrubbed[0])["has_exif"] is False
    assert scrubbed[1] == blob
    assert scrubbed[2] == b"not an image"


def test_adobe_cmyk_differential():
    """4-component Adobe JPEG, transform 0 (inverted CMYK): decoded
    RGB must equal R=C'·K'/255 on the decoder-exact channel recons."""
    ch = _rng(31).randint(0, 256, (16, 13, 4), dtype=np.uint8)
    blob, recon = encode_jpeg_channels(ch, adobe_transform=0)
    c, m, ye, k = (np.clip(r, 0.0, 255.0) for r in recon)
    expected = np.stack([c * k, m * k, ye * k], axis=2) / 255.0
    np.testing.assert_allclose(decode_pixels(blob), expected, atol=1e-8)


def test_adobe_ycck_differential():
    """Transform 2 (YCCK): YCbCr math on channels 0-2 yields inverted
    CMY, multiplied by K'."""
    ch = _rng(32).randint(0, 256, (12, 17, 4), dtype=np.uint8)
    blob, recon = encode_jpeg_channels(ch, adobe_transform=2)
    y, cb, cr, k = recon
    c = y + 1.402 * (cr - 128.0)
    m = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    ye = y + 1.772 * (cb - 128.0)
    c, m, ye, k = (np.clip(v, 0.0, 255.0) for v in (c, m, ye, k))
    got = decode_pixels(blob)
    np.testing.assert_allclose(
        got, np.stack([c * k, m * k, ye * k], axis=2) / 255.0, atol=1e-8
    )


def test_adobe_rgb_passthrough():
    """3-component Adobe transform 0: channels ARE RGB (no YCbCr)."""
    ch = _rng(33).randint(0, 256, (10, 10, 3), dtype=np.uint8)
    blob, recon = encode_jpeg_channels(ch, adobe_transform=0)
    expected = np.clip(np.stack(recon, axis=2), 0.0, 255.0)
    np.testing.assert_allclose(decode_pixels(blob), expected, atol=1e-8)


def test_four_components_without_adobe_marker_is_cmyk():
    ch = _rng(34).randint(0, 256, (9, 9, 4), dtype=np.uint8)
    blob, recon = encode_jpeg_channels(ch, adobe_transform=None)
    c, m, ye, k = (np.clip(r, 0.0, 255.0) for r in recon)
    np.testing.assert_allclose(
        decode_pixels(blob),
        np.stack([c * k, m * k, ye * k], axis=2) / 255.0,
        atol=1e-8,
    )


def test_exif_rotation_invariant_image_hash():
    """dHash of a rotated-capture JPEG (stored sideways + orientation
    tag) matches the upright capture within near-dup distance."""
    from littletable_spark.functions.imagecodec import decode_to_gray

    rng = np.random.RandomState(3)
    upright = np.repeat(
        np.repeat(rng.choice([0, 230], size=(4, 4)), 16, axis=0), 16, axis=1
    ).astype(np.uint8)
    stored = np.rot90(upright, 1).copy()  # display(stored, o=6) == upright
    up_blob, _ = encode_jpeg(upright)
    rot_blob, _ = encode_jpeg(stored)
    tagged = rot_blob[:2] + _exif_app1(6) + rot_blob[2:]

    def dhash(blob):
        g = decode_to_gray(blob, 9, 8)
        bits = 0
        for r in range(8):
            for c in range(8):
                if g[r, c] > g[r, c + 1]:
                    bits |= 1 << (r * 8 + c)
        return bits

    ham_fixed = bin(dhash(up_blob) ^ dhash(tagged)).count("1")
    ham_untagged = bin(dhash(up_blob) ^ dhash(rot_blob)).count("1")
    assert ham_fixed <= 4, ham_fixed
    assert ham_untagged > ham_fixed  # without the tag they diverge


def test_gray_gradient_differential():
    img = (
        np.arange(24)[:, None] * 5 + np.arange(40)[None, :] * 3
    ).astype(np.uint8)
    blob, expected = encode_jpeg(img)
    got = decode_pixels(blob)
    assert got.shape == (24, 40)
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_rgb_444_differential():
    img = _rng(1).randint(0, 256, (16, 24, 3)).astype(np.uint8)
    blob, expected = encode_jpeg(img)
    got = decode_pixels(blob)
    assert got.shape == (16, 24, 3)
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_rgb_420_subsampled_odd_dims_differential():
    """4:2:0 chroma subsampling with non-MCU-aligned dimensions: hits
    the multi-block-per-MCU loop, nearest upsampling, and the crop."""
    img = _rng(2).randint(0, 256, (19, 21, 3)).astype(np.uint8)
    blob, expected = encode_jpeg(img, subsample=True)
    got = decode_pixels(blob)
    assert got.shape == (19, 21, 3)
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_restart_markers_differential():
    """DRI + RSTn: predictors reset, bit reader re-aligns per segment."""
    img = _rng(3).randint(0, 256, (24, 24, 3)).astype(np.uint8)
    blob, expected = encode_jpeg(img, restart=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    got = decode_pixels(blob)
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_smooth_image_reconstruction_quality():
    """End-to-end sanity on a natural-ish smooth image: reconstruction
    error stays within a few quantization steps of the source."""
    yy, xx = np.mgrid[0:32, 0:32]
    img = (
        128 + 60 * np.sin(yy / 7.0) * np.cos(xx / 9.0)
    ).astype(np.uint8)
    blob, _ = encode_jpeg(img)
    got = decode_pixels(blob)
    assert np.mean(np.abs(got - img.astype(np.float64))) < 6.0


def test_decode_to_gray_pipeline():
    img = _rng(4).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    blob, expected = encode_jpeg(img)
    g = decode_to_gray(blob, 8, 8)
    assert g.shape == (8, 8) and 0.0 <= g.min() and g.max() <= 1.0
    lum = (
        expected[:, :, 0] * 0.299
        + expected[:, :, 1] * 0.587
        + expected[:, :, 2] * 0.114
    )
    ys = np.minimum((np.arange(8) * 16) // 8, 15)
    np.testing.assert_allclose(g, lum[np.ix_(ys, ys)] / 255.0, atol=1e-8)


def test_baseline_relabelled_sof2_decodes_identically():
    """A baseline stream relabelled SOF2 is a legal single-scan
    progressive file (Ss=0, Se=63, Ah=Al=0) — the unified decoder must
    produce bit-identical output (round 9: progressive supported)."""
    img = _rng(6).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    blob, expected = encode_jpeg(img)
    as_prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    np.testing.assert_allclose(decode_pixels(as_prog), expected, atol=1e-8)


def test_unsupported_sof_rejected():
    """Lossless/hierarchical SOFs still raise ValueError."""
    blob, _ = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
    bad = blob.replace(b"\xff\xc0", b"\xff\xc3", 1)  # SOF3 lossless
    with pytest.raises(ValueError):
        decode_pixels(bad)


# ------------------------------------------------------------------ #
# progressive encoder (test-side): spectral selection + successive
# approximation for DC and AC, per-component AC scans, EOB runs


def _enc_dc_first(bw, coefs_list, samp, al, dc_codes):
    preds = [0] * len(coefs_list)
    nby0, nbx0 = coefs_list[0].shape[:2]
    mcuy, mcux = nby0 // samp[0][1], nbx0 // samp[0][0]
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (hs, vs) in enumerate(samp):
            for by in range(vs):
                for bx in range(hs):
                    v = int(coefs_list[ci][my * vs + by, mx * hs + bx, 0])
                    approx = v >> al  # arithmetic shift, like C
                    diff = approx - preds[ci]
                    preds[ci] = approx
                    t = _category(diff)
                    code, nb = dc_codes[t]
                    bw.write(code, nb)
                    if t:
                        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)


def _enc_dc_refine(bw, coefs_list, samp, al):
    nby0, nbx0 = coefs_list[0].shape[:2]
    mcuy, mcux = nby0 // samp[0][1], nbx0 // samp[0][0]
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (hs, vs) in enumerate(samp):
            for by in range(vs):
                for bx in range(hs):
                    v = int(coefs_list[ci][my * vs + by, mx * hs + bx, 0])
                    bw.write((v >> al) & 1, 1)


def _flush_eobrun(bw, ac_codes, n):
    while n > 0:
        r = min(n.bit_length() - 1, 14)
        chunk = min(n, (1 << (r + 1)) - 1)
        r = chunk.bit_length() - 1
        code, nb = ac_codes[r << 4]
        bw.write(code, nb)
        if r:
            bw.write(chunk - (1 << r), r)
        n -= chunk
    return 0


def _enc_ac_first(bw, blocks, lo, hi, al, ac_codes):
    """AC first pass over one component's real block grid; sign-
    magnitude values at precision al; cross-block EOB runs."""
    eob = 0
    for coef in blocks:
        zzvals = [int(coef[z]) for z in _JPEG_ZIGZAG[lo : hi + 1]]
        mags = [(abs(v) >> al) for v in zzvals]
        if not any(mags):
            eob += 1
            continue
        eob = _flush_eobrun(bw, ac_codes, eob)
        run = 0
        last_nz = max(i for i, m in enumerate(mags) if m)
        for i, (v, m) in enumerate(zip(zzvals, mags)):
            if i > last_nz:
                break
            if m == 0:
                run += 1
                continue
            while run > 15:
                code, nb = ac_codes[0xF0]
                bw.write(code, nb)
                run -= 16
            s = m.bit_length()
            code, nb = ac_codes[(run << 4) | s]
            bw.write(code, nb)
            sv = m if v > 0 else -m
            bw.write(sv if sv > 0 else sv + (1 << s) - 1, s)
            run = 0
        if last_nz < len(mags) - 1:
            eob += 1  # block ends with zeros: start an EOB run
    _flush_eobrun(bw, ac_codes, eob)


def _enc_ac_refine(bw, blocks, lo, hi, al, ac_codes):
    """AC refinement: newly significant -> (run<<4)|1 + sign, history
    coefficients -> buffered correction bits; per-block EOB flush
    (EOBRUN of 1) keeps the stream simple and legal."""
    for coef in blocks:
        zzvals = [int(coef[z]) for z in _JPEG_ZIGZAG[lo : hi + 1]]
        mags = [abs(v) >> al for v in zzvals]
        newly = [i for i, m in enumerate(mags) if m == 1]
        last_new = newly[-1] if newly else -1
        run = 0
        pending: list[int] = []
        for i, (v, m) in enumerate(zip(zzvals, mags)):
            if i > last_new:
                break
            if m == 0:
                run += 1
            elif m > 1:  # history coefficient: buffer its correction bit
                pending.append(m & 1)
            else:  # newly significant
                while run > 15:
                    code, nb = ac_codes[0xF0]
                    bw.write(code, nb)
                    for b in pending:
                        bw.write(b, 1)
                    pending = []
                    run -= 16
                code, nb = ac_codes[(run << 4) | 1]
                bw.write(code, nb)
                bw.write(1 if v > 0 else 0, 1)
                for b in pending:
                    bw.write(b, 1)
                pending = []
                run = 0
        # tail: EOB (run-of-1) then correction bits for remaining history
        tail = [
            mags[i] & 1
            for i in range(max(last_new + 1, 0), len(mags))
            if mags[i] > 1
        ]
        if run > 0 or tail or last_new < len(mags) - 1:
            code, nb = ac_codes[0x00]
            bw.write(code, nb)
            for b in pending:
                bw.write(b, 1)
            for b in tail:
                bw.write(b, 1)


def encode_jpeg_progressive(
    img: np.ndarray,
    subsample: bool = False,
    dc_al: int = 1,
    ac_al: int = 1,
    bands=((1, 5), (6, 63)),
    divisor: float = 4.0,
):
    """Progressive JFIF encoder: interleaved DC scan at Al=dc_al + DC
    refinements, then per-component AC band scans at Al=ac_al + AC
    refinements. Returns (bytes, expected) with the same expected
    reconstruction as the baseline encoder (identical coefficients)."""
    base_blob, expected = encode_jpeg(img, subsample=subsample, divisor=divisor)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _QL / divisor
    qc = _QC / divisor
    q8l = np.maximum(np.round(ql[_JPEG_ZIGZAG]), 1).astype(np.uint8)
    q8c = np.maximum(np.round(qc[_JPEG_ZIGZAG]), 1).astype(np.uint8)
    ql_wire = np.zeros(64)
    qc_wire = np.zeros(64)
    ql_wire[_JPEG_ZIGZAG] = q8l.astype(np.float64)
    qc_wire[_JPEG_ZIGZAG] = q8c.astype(np.float64)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql_wire]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsample:
            cb, cr = cb[::2, ::2], cr[::2, ::2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [ql_wire, qc_wire, qc_wire]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for p, q, (hs, vs) in zip(planes, quants, samp):
        padded = np.pad(
            np.clip(p, 0, 255),
            ((0, mcuy * vs * 8 - p.shape[0]), (0, mcux * hs * 8 - p.shape[1])),
            mode="edge",
        )
        c = _fdct_quant(padded, q)
        coefs.append(c.reshape(c.shape[0], c.shape[1], 64))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    nc = 1 if gray else 3
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + q8l.tobytes())
    if not gray:
        out += seg(0xDB, bytes([0x01]) + q8c.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + _DC_BITS + _DC_VALS)
    out += seg(0xC4, bytes([0x10]) + _AC_BITS + _AC_VALS)
    dc_codes, ac_codes = _dc_codes(), _ac_codes()

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for c in comp_ids:
            body += bytes([c + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    # scan 1: interleaved DC first pass at Al=dc_al
    out += sos(list(range(nc)), 0, 0, 0, dc_al)
    bw = _BitWriter()
    _enc_dc_first(bw, coefs, samp, dc_al, dc_codes)
    bw.flush()
    out += bw.out
    # DC refinement down to full precision
    for al in range(dc_al - 1, -1, -1):
        out += sos(list(range(nc)), 0, 0, al + 1, al)
        bw = _BitWriter()
        _enc_dc_refine(bw, coefs, samp, al)
        bw.flush()
        out += bw.out
    # AC scans per component per band (real block grid, raster order)
    for ci in range(nc):
        hs, vs = samp[ci]
        comp_w = -(-(w * hs) // hmax)
        comp_h = -(-(h * vs) // vmax)
        nbx = -(-comp_w // 8)
        nby = -(-comp_h // 8)
        blocks = [
            coefs[ci][by, bx] for by in range(nby) for bx in range(nbx)
        ]
        for lo, hi in bands:
            out += sos([ci], lo, hi, 0, ac_al)
            bw = _BitWriter()
            _enc_ac_first(bw, blocks, lo, hi, ac_al, ac_codes)
            bw.flush()
            out += bw.out
        for al in range(ac_al - 1, -1, -1):
            for lo, hi in bands:
                out += sos([ci], lo, hi, al + 1, al)
                bw = _BitWriter()
                _enc_ac_refine(bw, blocks, lo, hi, al, ac_codes)
                bw.flush()
                out += bw.out
    out += b"\xff\xd9"
    return bytes(out), expected


def test_progressive_gray_differential():
    img = (
        np.arange(19)[:, None] * 6 + np.arange(21)[None, :] * 4
    ).astype(np.uint8)
    blob, expected = encode_jpeg_progressive(img)
    got = decode_pixels(blob)
    assert got.shape == (19, 21)
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_progressive_rgb_444_differential():
    img = _rng(8).randint(0, 256, (16, 24, 3)).astype(np.uint8)
    blob, expected = encode_jpeg_progressive(img)
    np.testing.assert_allclose(decode_pixels(blob), expected, atol=1e-8)


def test_progressive_420_subsampled_differential():
    """4:2:0 progressive: interleaved DC scan over the padded MCU grid,
    per-component AC scans over each component's REAL block grid.
    MCU-aligned dims so padded == real for the expected comparison."""
    img = _rng(9).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    blob, expected = encode_jpeg_progressive(img, subsample=True)
    np.testing.assert_allclose(decode_pixels(blob), expected, atol=1e-8)


def test_progressive_spectral_only_no_approximation():
    """Spectral selection without successive approximation (three
    bands, Ah=Al=0) — the EOB-run path without refinement."""
    img = _rng(10).randint(0, 256, (17, 15, 3)).astype(np.uint8)
    blob, expected = encode_jpeg_progressive(
        img, dc_al=0, ac_al=0, bands=((1, 2), (3, 20), (21, 63))
    )
    np.testing.assert_allclose(decode_pixels(blob), expected, atol=1e-8)


def test_progressive_deep_approximation():
    """Two levels of successive approximation for DC and AC — every
    refinement level runs both the newly-significant and the
    correction-bit paths."""
    img = _rng(11).randint(0, 256, (16, 16)).astype(np.uint8)
    blob, expected = encode_jpeg_progressive(img, dc_al=2, ac_al=2)
    np.testing.assert_allclose(decode_pixels(blob), expected, atol=1e-8)


def test_ac_refine_handcrafted_stream():
    """The AC-refinement decoder against a hand-computed bit stream:
    one block, band 1..4, Al=0, prior coefficients [_,8,0,-6,0] (zigzag
    positions 1-4). Scan: newly-significant +1 at position 2 with run=0
    after passing the history coef at 1 (correction bit 1 -> 8+=1),
    then EOB with tail correction for position 3 (bit 0 -> -6 stays)."""
    from littletable_spark.functions.imagecodec import (
        _JpegBits,
        _jpeg_ac_refine,
        _jpeg_build_huffman,
    )

    table = _jpeg_build_huffman(_AC_BITS, _AC_VALS)
    coef = np.zeros(64, dtype=np.int64)
    coef[_JPEG_ZIGZAG[1]] = 8
    coef[_JPEG_ZIGZAG[3]] = -6
    bw = _BitWriter()
    code, nb = _ac_codes()[(0 << 4) | 1]
    bw.write(code, nb)  # newly significant, run 0 (zero-HISTORY run)
    bw.write(1, 1)  # sign: positive
    bw.write(1, 1)  # correction bit for history coef at k=1 (8 -> 9)
    code, nb = _ac_codes()[0x00]
    bw.write(code, nb)  # EOB
    bw.write(0, 1)  # tail correction for k=3 (-6 unchanged)
    bw.flush()
    bits = _JpegBits(bytes(bw.out))
    eobrun = _jpeg_ac_refine(bits, coef, table, 1, 4, 0, 0)
    assert eobrun == 0
    assert coef[_JPEG_ZIGZAG[1]] == 9  # corrected history
    assert coef[_JPEG_ZIGZAG[2]] == 1  # newly significant
    assert coef[_JPEG_ZIGZAG[3]] == -6  # correction bit 0: unchanged
    assert coef[_JPEG_ZIGZAG[4]] == 0


def test_truncated_stream_rejected():
    blob, _ = encode_jpeg(
        _rng(5).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    )
    with pytest.raises(ValueError):
        decode_pixels(blob[: len(blob) // 3])


def test_true_mjpeg_avi_end_to_end(spark):
    """The real MJPEG contract (round-8 gap): AVI frames ARE JPEG
    bytes. frame_sample walks the container, decode_image decodes the
    sampled JPEG frames — both on the real (use_fake=False) path, and
    the decoded luma matches each frame's own expected reconstruction
    bit-for-bit."""
    from test_imagecodec import _avi_encode

    from littletable_spark import Table
    from littletable_spark.operators.multimodal import decode_image, frame_sample
    from pyspark.sql import functions as F

    jpegs = []
    expected = []
    rng = _rng(6)
    for _ in range(6):
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        blob, exp = encode_jpeg(img)
        jpegs.append(blob)
        expected.append(exp)
    t = Table("vids", spark=spark)
    t.insert_many([{"id": 0, "blob": _avi_encode(jpegs)}])
    frames = frame_sample(t, "blob", "id", n_frames=3, use_fake=False)
    rows = sorted((r.frame_idx, bytes(r.frame)) for r in frames)
    assert [i for i, _ in rows] == [0, 2, 4]
    assert [b for _, b in rows] == [jpegs[0], jpegs[2], jpegs[4]]

    ft = Table.from_df(
        frames.df.select(F.col("frame_idx").alias("fid"), "frame"),
        name="frames",
    )
    decoded = decode_image(ft, "frame", "fid", width=16, height=16, use_fake=False)
    got = {r.fid: np.array(r.pixels).reshape(16, 16) for r in decoded}
    assert set(got) == {0, 2, 4}
    for i in (0, 2, 4):
        exp = expected[i]
        lum = (
            exp[:, :, 0] * 0.299 + exp[:, :, 1] * 0.587 + exp[:, :, 2] * 0.114
        ) / 255.0
        np.testing.assert_allclose(got[i], lum, atol=1e-8)


def test_parse_exif_on_raw_tiff_file():
    """A TIFF file IS a TIFF body: IFD0 metadata reads directly."""
    from littletable_spark.functions.exifmeta import parse_exif

    tiff = _exif_full_app1(orientation=3, gps=(1.5, 2.5))[10:]
    m = parse_exif(tiff)
    assert m["has_exif"] and m["orientation"] == 3
    assert m["gps_lat"] == pytest.approx(1.5, abs=1e-4)


# ------------------------------------------- arithmetic coding (r14)
# Byte-literal fixtures ENCODED BY the system libjpeg's arithmetic
# encoder, with libjpeg's own decode as the pinned reference — so the
# Annex F decoder stays regression-pinned even on boxes where
# libjpeg.so is absent (the live differential in test_libcodec_diff
# then skips, this test does not). Provenance: generated by the
# ctypes compress worker in tests/test_libcodec_diff.py.
_ARITH_SEQ_JPG = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000302020302"
    "020303030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d"
    "0e12100d0e110e0b0b1016101113141515150c0f171816141812141514ff"
    "c9000b08000d000b01011100ffcc000600101005ffda0008010100003f00"
    "cb6c1c37acdab7e720a111f54b947ac97592eecf87457a1592c8ecbac866"
    "0e24ff0089ac38bb782207c30b5e20a55bf0634bc06fb4e34eff00f8744c"
    "b5b9c24dd1f4e21a5509cf52bb73cfa15dd8a63b774fed60086af0d08fc9"
    "880538e7cf8e21ff0057d43b49c1120ce1079d9e8ef5e6daf94d85690964"
    "7445e0fdfd3f8f153acf7456b06373c85c18e2c50b2358368d5a44b2b0e0"
    "5df9c76074afa7954c531e7405ea46b32d2b77f28b989cf10c7eb4ed447d"
    "c2ca6927f31987bc86de49b0b439295565b565c8bda354ab9402e5ffd9"
)
_ARITH_SEQ_REF = bytes.fromhex(
    "d9b749e962234b0354f05ea7d5e97858e849f6c520aa41089c19aa299c65"
    "d9cde2945812c1ad5157a381b8ce745590e9aa9b875714aaf5bbac677f8a"
    "3b0a3cad7a128136e878a18237daa087a17cb6dd78bf8667aeaa936aced0"
    "19b09342d82f0ca62cd6c8b750bb20b2aa92c0e268e500ced34e02e5abbd"
    "78c6f9445155a1ff77089ebb87659d0c97462a71e51492"
)
_ARITH_PROG_JPG = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000302020302"
    "020303030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d"
    "0e12100d0e110e0b0b1016101113141515150c0f171816141812141514ff"
    "ca000b080010001001011100ffcc00040010ffda0008010100000001ff00"
    "c884180410ffcc00041005ffda0008010100010502138fd514e34b10ffcc"
    "00041005ffda0008010100063f025e14ffcc00041005ffda000801010001"
    "3f21aa32e4ffda0008010100000010a0ffcc00041005ffda000801010001"
    "3f10a5e309db2db0ffd9"
)
_ARITH_PROG_REF = bytes.fromhex(
    "000306090c0f1215181b1e2124272a2d070a0d101316191c1f2225282b2e"
    "31340e1114171a1d202326292c2f3235383b15171b1e202327292d2f3336"
    "383b3f411d1f2326282b2f3135373b3e404347492326292c2f3235383b3e"
    "4144474a4d502a2d303336393c3f4245484b4e5154573134373a3d404346"
    "494c4f5255585b5e383b3e4144474a4d505356595c5f62653f4245484b4e"
    "5154575a5d606366696c46484c4f5154585a5e606467696c70724d4f5356"
    "585b5f6165676b6e7073777955575b5e606367696d6f7376787b7f815b5e"
    "6164676a6d707376797c7f8285886265686b6e7174777a7d808386898c8f"
    "696c6f7275787b7e8184878a8d909396"
)


def test_arithmetic_pinned_fixtures():
    """SOF9 sequential and SOF10 progressive byte-literal fixtures
    decode to libjpeg's pinned pixels within the IDCT rounding band."""
    import numpy as np

    from littletable_spark.functions.imagecodec import decode_pixels

    got = decode_pixels(_ARITH_SEQ_JPG)
    want = np.frombuffer(_ARITH_SEQ_REF, np.uint8).reshape(13, 11)
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 5 and diff.mean() < 1.0

    got = decode_pixels(_ARITH_PROG_JPG)
    want = np.frombuffer(_ARITH_PROG_REF, np.uint8).reshape(16, 16)
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 5 and diff.mean() < 1.0
