"""Real image decode without PIL: pure stdlib/numpy PNG/BMP/PPM codecs.

Fixtures are ENCODED here from known pixel arrays (PNG via zlib +
hand-computed per-row filters, covering all five filter types), so the
decoders are checked against exact expected values, not a library.
"""

import struct
import zlib

import numpy as np
import pytest

from littletable_spark.functions.imagecodec import (
    decode_pixels,
    decode_to_gray,
    sniff_format,
)


# ------------------------------------------------------------------ #
# encoders (test-side only)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_filter_row(row, prior, ftype, fpx):
    """Forward-apply a PNG filter (spec §6) to produce the wire bytes."""
    row = row.astype(np.int16)
    prior = prior.astype(np.int16)
    out = np.zeros_like(row)
    for i in range(len(row)):
        a = int(row[i - fpx]) if i >= fpx else 0  # RECONSTRUCTED left
        b = int(prior[i])
        c = int(prior[i - fpx]) if i >= fpx else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (int(row[i]) - pred) & 0xFF
    return out.astype(np.uint8)


def _png_encode(img: np.ndarray, filters: list[int]) -> bytes:
    """img: HxWx3 uint8; one filter type per row."""
    h, w, _ = img.shape
    fpx = 3
    raw = bytearray()
    prior = np.zeros(w * 3, dtype=np.uint8)
    for y, ftype in zip(range(h), filters):
        row = img[y].reshape(-1)
        raw.append(ftype)
        raw.extend(_png_filter_row(row, prior, ftype, fpx).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _bmp_encode(img: np.ndarray) -> bytes:
    """img: HxWx3 uint8 -> 24-bit uncompressed bottom-up BMP."""
    h, w, _ = img.shape
    row_bytes = ((w * 24 + 31) // 32) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = img[y, x]
            row += bytes([b, g, r])  # BGR on the wire
        row += b"\x00" * (row_bytes - len(row))
        body += row
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    return header + info + bytes(body)


@pytest.fixture()
def img4x3():
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, size=(3, 4, 3), dtype=np.uint8)


# ------------------------------------------------------------------ #


def test_png_roundtrip_all_filter_types(img4x3):
    # a taller image so every filter type 0..4 appears
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    blob = _png_encode(img, filters=[0, 1, 2, 3, 4])
    assert sniff_format(blob) == "png"
    out = decode_pixels(blob)
    assert out.shape == (5, 4, 3)
    np.testing.assert_array_equal(out.astype(np.uint8), img)


def test_png_gradient_sub_and_paeth():
    # smooth gradient: Sub/Paeth filters do real work
    x = np.arange(16, dtype=np.uint8)
    img = np.stack([np.add.outer(x, x) % 256] * 3, axis=-1).astype(np.uint8)
    blob = _png_encode(img, filters=[1] * 8 + [4] * 8)
    np.testing.assert_array_equal(decode_pixels(blob).astype(np.uint8), img)


def test_bmp_roundtrip(img4x3):
    blob = _bmp_encode(img4x3)
    assert sniff_format(blob) == "bmp"
    out = decode_pixels(blob)
    np.testing.assert_array_equal(out.astype(np.uint8), img4x3)


def test_ppm_binary_and_ascii(img4x3):
    w, h = img4x3.shape[1], img4x3.shape[0]
    p6 = b"P6\n# comment\n%d %d\n255\n" % (w, h) + img4x3.tobytes()
    np.testing.assert_array_equal(decode_pixels(p6).astype(np.uint8), img4x3)
    gray = img4x3[:, :, 0]
    p2 = (
        b"P2\n%d %d\n255\n" % (w, h)
        + " ".join(str(v) for v in gray.reshape(-1)).encode()
    )
    np.testing.assert_array_equal(decode_pixels(p2).astype(np.uint8), gray)


def test_decode_to_gray_resize_known_values():
    # 2x2 black/white checker as PNG -> 4x4 nearest-neighbor grid
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 1] = img[1, 0] = 255
    blob = _png_encode(img, filters=[0, 0])
    g = decode_to_gray(blob, width=4, height=4)
    assert g.shape == (4, 4)
    expect = np.array(
        [[0, 0, 1, 1], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 0, 0]], dtype=float
    )
    np.testing.assert_allclose(g, expect, atol=1e-9)


def test_undecodable_raises_value_error():
    with pytest.raises(ValueError, match="cannot decode"):
        decode_pixels(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_decode_image_real_path_mapinpandas(spark, img4x3):
    """The full Spark path — real bytes in a binary column through the
    same mapInPandas plumbing the fake uses (VERDICT r7 next-step #3)."""
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import decode_image

    png = _png_encode(img4x3, filters=[0, 2, 4])
    bmp = _bmp_encode(img4x3)
    t = Table("media", spark=spark)
    t.insert_many(
        [
            {"id": 0, "blob": png},
            {"id": 1, "blob": bmp},
            {"id": 2, "blob": b"corrupt"},
        ]
    )
    out = decode_image(t, "blob", "id", width=4, height=3, use_fake=False, on_error="null")
    rows = {r.id: r for r in out}
    # PNG and BMP encode the SAME image -> identical decoded grids
    assert rows[0].pixels == rows[1].pixels
    assert len(rows[0].pixels) == 12 and rows[0].width == 4
    exp = decode_to_gray(png, 4, 3).ravel()
    np.testing.assert_allclose(np.array(rows[0].pixels), exp, atol=1e-12)
    assert rows[2].pixels is None  # corrupt blob -> NULL, row kept

    # on_error="raise" fails the job on the corrupt blob
    with pytest.raises(Exception):
        decode_image(t, "blob", "id", use_fake=False).df.collect()


# ------------------------------------------------------------------ #
# audio (WAV/RIFF) — real decode, stdlib-encoded fixtures


def _wav_encode(samples: np.ndarray, rate: int, sampwidth: int = 2) -> bytes:
    """Encode (n, ch) float in [-1,1] with the stdlib wave module."""
    import io
    import wave

    n, ch = samples.shape
    if sampwidth == 2:
        raw = (samples * 32767).astype("<i2").reshape(-1).tobytes()
    else:
        raw = ((samples * 127) + 128).astype(np.uint8).reshape(-1).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(raw)
    return buf.getvalue()


def test_wav_decode_roundtrip():
    from littletable_spark.functions.audiocodec import decode_wav, wav_features

    t = np.arange(8000) / 8000.0
    sine = np.sin(2 * np.pi * 440 * t)
    blob = _wav_encode(np.stack([sine, -sine], axis=1), rate=8000)
    samples, rate = decode_wav(blob)
    assert rate == 8000 and samples.shape == (8000, 2)
    # int16 truncation + the 32767-encode/32768-decode scale mismatch
    np.testing.assert_allclose(samples[:, 0], sine, atol=1e-4)
    f = wav_features(blob)
    assert f["duration"] == 1.0 and f["n_channels"] == 2
    # stereo (sine, -sine) channel-means to ~0
    assert f["rms"] < 1e-4
    mono = _wav_encode(sine[:, None], rate=8000)
    fm = wav_features(mono)
    np.testing.assert_allclose(fm["rms"], 1 / np.sqrt(2), atol=1e-3)
    assert 0.10 < fm["zcr"] < 0.12  # 440 Hz at 8 kHz: ~0.11 crossings/frame
    assert len(fm["waveform"]) == 64


def test_wav_unsupported_raises():
    from littletable_spark.functions.audiocodec import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x03 not a wav")


def test_decode_audio_spark_path(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import decode_audio

    t64 = np.arange(4000) / 8000.0
    wav = _wav_encode(np.sin(2 * np.pi * 220 * t64)[:, None], rate=8000)
    t = Table("audio", spark=spark)
    t.insert_many(
        [
            {"id": 0, "blob": wav},
            {"id": 1, "blob": b"not audio"},
        ]
    )
    out = decode_audio(t, "blob", "id", on_error="null")
    rows = {r.id: r for r in out}
    assert rows[0].sample_rate == 8000 and rows[0].duration == 0.5
    assert abs(rows[0].rms - 1 / np.sqrt(2)) < 1e-3
    assert len(rows[0].waveform) == 64
    assert rows[1].sample_rate is None  # corrupt -> NULL, row kept
    with pytest.raises(Exception):
        decode_audio(t, "blob", "id").df.collect()
    # fake path is deterministic and cheap (plumbing/oracle contract)
    fake = {r.id: r for r in decode_audio(t, "blob", "id", use_fake=True)}
    fake2 = {r.id: r for r in decode_audio(t, "blob", "id", use_fake=True)}
    assert fake[0].rms == fake2[0].rms and fake[1].rms == fake2[1].rms


# ------------------------------------------------------------------ #
# video (AVI/RIFF container) — real frame sampling, hand-built fixture


def _avi_encode(frames: list[bytes]) -> bytes:
    """Minimal MJPEG-style AVI: RIFF('AVI ') holding a LIST('movi')
    of 00dc chunks (hdrl omitted — the frame walk doesn't need it)."""
    body = bytearray()
    for f in frames:
        body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            body += b"\x00"
    movi = b"movi" + bytes(body)
    lst = b"LIST" + struct.pack("<I", len(movi)) + movi
    riff_body = b"AVI " + lst
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_avi_frame_walk():
    from littletable_spark.functions.videocodec import (
        avi_video_frames,
        sample_avi_frames,
    )

    frames = [b"frame%d" % i for i in range(10)]
    blob = _avi_encode(frames)
    assert avi_video_frames(blob) == frames
    got = sample_avi_frames(blob, 4)
    assert [i for i, _ in got] == [0, 2, 5, 7]
    assert all(blob_ == frames[i] for i, blob_ in got)
    # fewer frames than requested: every frame once
    short = _avi_encode(frames[:2])
    assert sample_avi_frames(short, 4) == [(0, b"frame0"), (1, b"frame1")]
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_video_frames(b"\x00\x01\x02")


def test_frame_sample_real_avi_to_decoded_pixels(spark, img4x3):
    """End-to-end video story: real AVI container walk samples frame
    BYTES (PNG payloads here), and decode_image then decodes the
    sampled frames — container-real, codec via imagecodec."""
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import decode_image, frame_sample

    pngs = []
    for shift in range(6):
        img = ((img4x3.astype(int) + shift * 20) % 256).astype(np.uint8)
        pngs.append(_png_encode(img, filters=[0, 2, 4]))
    t = Table("vids", spark=spark)
    t.insert_many(
        [
            {"id": 0, "blob": _avi_encode(pngs)},
            {"id": 1, "blob": b"not a video"},
        ]
    )
    frames = frame_sample(t, "blob", "id", n_frames=3, use_fake=False, on_error="null")
    rows = sorted(
        ((r.id, r.frame_idx, r.frame) for r in frames), key=lambda x: (x[0], x[1] is None, x[1])
    )
    vid0 = [r for r in rows if r[0] == 0]
    assert [r[1] for r in vid0] == [0, 2, 4]
    assert [bytes(r[2]) for r in vid0] == [pngs[0], pngs[2], pngs[4]]
    bad = [r for r in rows if r[0] == 1]
    assert len(bad) == 1 and bad[0][2] is None  # null row, job survives

    # sampled frames decode through the image path
    from pyspark.sql import functions as F

    ft = Table.from_df(
        frames.df.where("frame IS NOT NULL").select(
            (F.col("id") * 10 + F.col("frame_idx")).alias("fid"),
            F.col("frame"),
        ),
        name="frames",
    )
    decoded = decode_image(ft, "frame", "fid", width=4, height=3, use_fake=False)
    assert decoded.df.where("pixels IS NOT NULL").count() == 3

    with pytest.raises(Exception):  # raise mode surfaces the bad blob
        frame_sample(t, "blob", "id", use_fake=False).df.collect()


# ------------------------------------------------------------------ #
# GIF — LZW decode, round-tripped against a test-side greedy encoder


def _gif_lzw_encode(pixels: list[int], mcs: int) -> bytes:
    """Greedy LZW; code widths follow the decoder's dict/width state
    machine (bump when dict size reaches 2^width, 4096 cap)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
    codes = [clear]
    w = ()
    for p in pixels:
        wk = w + (p,)
        if wk in table:
            w = wk
            continue
        codes.append(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        w = (p,)
    codes.append(table[w])
    codes.append(end)
    # width assignment: replicate the decoder's state transitions
    width, size, prev = mcs + 1, clear + 2, False
    bits = []
    for c in codes:
        bits.append((c, width))
        if c == clear:
            width, size, prev = mcs + 1, clear + 2, False
            continue
        if c == end:
            break
        if prev and size < 4096:
            size += 1
        if size >= (1 << width) and width < 12:
            width += 1
        prev = True
    # LSB-first bit packing
    acc = pos = 0
    out = bytearray()
    for c, wd in bits:
        acc |= c << pos
        pos += wd
        while pos >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            pos -= 8
    if pos:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_encode(
    indices: np.ndarray,
    palette: np.ndarray,
    mcs: int = 2,
    interlace: bool = False,
) -> bytes:
    h, w = indices.shape
    n = len(palette)
    gct_bits = max((n - 1).bit_length(), 1) - 1
    gct_n = 2 << gct_bits
    pal = np.zeros((gct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | gct_bits, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    if interlace:
        # store rows in the four-pass interlace order (GIF89a app. E)
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        indices = indices[order]
    data = _gif_lzw_encode(list(indices.reshape(-1)), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_repetitive_and_random():
    from littletable_spark.functions.imagecodec import decode_pixels

    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    # repetitive: exercises multi-symbol dict entries + the KwKwK case
    rep = np.zeros((4, 8), dtype=np.uint8)
    rep[1] = 1
    rep[2, ::2] = 2
    blob = _gif_encode(rep, palette)
    assert sniff_format(blob) == "gif"
    out = decode_pixels(blob)
    np.testing.assert_array_equal(out.astype(np.uint8), palette[rep])
    # random 16x16: dict grows enough to force code-width bumps
    rng = np.random.RandomState(5)
    rnd = rng.randint(0, 4, size=(16, 16)).astype(np.uint8)
    out2 = decode_pixels(_gif_encode(rnd, palette))
    np.testing.assert_array_equal(out2.astype(np.uint8), palette[rnd])


def test_gif_long_stream_width_growth():
    from littletable_spark.functions.imagecodec import decode_pixels

    # 64x64 of structured + noisy data: thousands of dict entries,
    # multiple width bumps (3 -> 9+ bits)
    rng = np.random.RandomState(11)
    idx = (np.add.outer(np.arange(64), np.arange(64)) % 4).astype(np.uint8)
    noise = rng.randint(0, 4, size=(64, 64))
    idx[noise == 0] = 3
    palette = np.array(
        [[10, 20, 30], [200, 100, 0], [0, 200, 100], [50, 50, 250]],
        dtype=np.uint8,
    )
    out = decode_pixels(_gif_encode(idx, palette))
    np.testing.assert_array_equal(out.astype(np.uint8), palette[idx])


def test_gif_rejects_garbage():
    from littletable_spark.functions.imagecodec import _decode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"PNG nope")


def _png_encode_interlaced(img: np.ndarray) -> bytes:
    """Adam7-interlaced PNG: seven filtered sub-images in pass order
    (filter 0 rows within a pass for pass 1, filter 2 thereafter)."""
    h, w, _ = img.shape
    raw = bytearray()
    for xs0, xst, ys0, yst in (
        (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
    ):
        sub = img[ys0::yst, xs0::xst]
        if sub.size == 0:
            continue
        prior = np.zeros(sub.shape[1] * 3, dtype=np.uint8)
        for yi in range(sub.shape[0]):
            row = sub[yi].reshape(-1)
            ftype = 0 if yi == 0 else 2
            raw.append(ftype)
            raw.extend(_png_filter_row(row, prior, ftype, 3).tobytes())
            prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced():
    rng = np.random.RandomState(13)
    for shape in ((9, 10), (3, 5), (16, 16), (1, 1)):
        img = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
        blob = _png_encode_interlaced(img)
        np.testing.assert_array_equal(
            decode_pixels(blob).astype(np.uint8), img, err_msg=str(shape)
        )


def test_gif_interlaced_roundtrip():
    """Interlaced GIFs (round 9): the four-pass row order is undone, so
    the decoded frame equals the plain-scan decode of the same pixels —
    exercised at heights hitting all four passes incl. non-multiples."""
    rng = np.random.RandomState(3)
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    for h in (16, 13, 9, 5, 1):
        idx = rng.randint(0, 4, (h, 7))
        plain = decode_pixels(_gif_encode(idx, palette))
        inter = decode_pixels(_gif_encode(idx, palette, interlace=True))
        np.testing.assert_array_equal(plain, inter)
        np.testing.assert_array_equal(inter, palette[idx].astype(np.float64))


def _png_encode_subbyte(
    samples: np.ndarray, bitdepth: int, palette: np.ndarray | None = None,
    filters=None,
) -> bytes:
    """samples: HxW ints < 2^bitdepth; gray (colortype 0) or, with a
    palette (Nx3 uint8), indexed (colortype 3). MSB-first packing per
    PNG spec; per-row filter types exercise byte-level filtering over
    packed data."""
    h, w = samples.shape
    stride = (w * bitdepth + 7) // 8
    per_byte = 8 // bitdepth
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    filters = filters or [0] * h
    from littletable_spark.functions import imagecodec as _ic  # noqa: F401

    for y, ftype in zip(range(h), filters):
        packed = np.zeros(stride, dtype=np.uint8)
        for x in range(w):
            shift = 8 - bitdepth * (x % per_byte + 1)
            packed[x // per_byte] |= int(samples[y, x]) << shift
        raw.append(ftype)
        raw.extend(_png_filter_row(packed, prior, ftype, 1).tobytes())
        prior = packed
    colortype = 3 if palette is not None else 0
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("bitdepth", [1, 2, 4])
def test_png_subbyte_gray(bitdepth):
    rng = np.random.RandomState(bitdepth)
    samples = rng.randint(0, 1 << bitdepth, size=(7, 13))
    blob = _png_encode_subbyte(samples, bitdepth, filters=[0, 1, 2, 3, 4, 0, 1])
    got = decode_pixels(blob)
    expected = samples.astype(np.float64) * (255.0 / ((1 << bitdepth) - 1))
    np.testing.assert_allclose(got, expected, atol=1e-9)


@pytest.mark.parametrize("bitdepth", [1, 2, 4])
def test_png_subbyte_palette(bitdepth):
    rng = np.random.RandomState(10 + bitdepth)
    n = 1 << bitdepth
    palette = rng.randint(0, 256, size=(n, 3), dtype=np.uint8)
    samples = rng.randint(0, n, size=(5, 9))
    blob = _png_encode_subbyte(samples, bitdepth, palette=palette)
    got = decode_pixels(blob)
    np.testing.assert_array_equal(got, palette[samples].astype(np.float64))


def test_png_subbyte_width_not_byte_aligned():
    """w*depth not divisible by 8: trailing pad bits ignored."""
    samples = np.array([[1, 0, 1], [0, 1, 1]])
    blob = _png_encode_subbyte(samples, 1)
    got = decode_pixels(blob)
    np.testing.assert_allclose(got, samples * 255.0, atol=1e-9)


# ------------------------------------------------------------------ #
# TIFF (baseline subset: uncompressed/PackBits/LZW/Deflate strips)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW writer (test side): MSB-first bit packing,
    early change — the encoder widens when its next code reaches
    2^width (one code earlier than GIF relative to the decoder's
    table, whose matching rule is table-size ≥ 2^width - 1)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8
            bitbuf &= (1 << bitcnt) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: restart
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(EOI)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits: repeat runs >=3 as fills, the rest literal."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i
            lit = bytearray()
            while j < n and len(lit) < 128:
                run2 = 1
                while j + run2 < n and data[j + run2] == data[j] and run2 < 128:
                    run2 += 1
                if run2 >= 3:
                    break
                lit += data[j : j + run2]
                j += run2
            out += bytes([len(lit) - 1]) + lit
            i = j
    return bytes(out)


def _tiff_diff(block: np.ndarray, width: int, spp: int) -> np.ndarray:
    b3 = block.reshape(block.shape[0], width, spp).astype(np.int16)
    diff = b3.copy()
    diff[:, 1:] = b3[:, 1:] - b3[:, :-1]
    return (diff % 256).astype(np.uint8)


def _tiff_compress(raw: bytes, compression: int) -> bytes:
    if compression == 32773:
        return _packbits_encode(raw)
    if compression == 5:
        return _tiff_lzw_encode(raw)
    if compression in (8, 32946):
        return zlib.compress(raw)
    return raw


def _tiff_encode(
    img: np.ndarray, bo: str = "II", compression: int = 1,
    rows_per_strip: int | None = None, photometric: int | None = None,
    predictor: int = 1, tile: tuple[int, int] | None = None,
) -> bytes:
    fmt = "<" if bo == "II" else ">"
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    if photometric is None:
        photometric = 1 if gray else 2
    rps = rows_per_strip or h
    strips = []
    if tile is not None:
        tw, th = tile
        img3 = img.reshape(h, w, spp)
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                block = np.zeros((th, tw, spp), dtype=np.uint8)
                src = img3[ty : ty + th, tx : tx + tw]
                block[: src.shape[0], : src.shape[1]] = src
                if predictor == 2:
                    block = _tiff_diff(block, tw, spp)
                strips.append(_tiff_compress(block.tobytes(), compression))
    else:
        for y0 in range(0, h, rps):
            block = img[y0 : y0 + rps]
            if predictor == 2:  # horizontal differencing per row/sample
                block = _tiff_diff(block, w, spp)
            strips.append(_tiff_compress(block.tobytes(), compression))
    out = bytearray(bo.encode() + struct.pack(fmt + "HI", 42, 0))
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) & 1:
        out += b"\x00"

    extra = bytearray()  # out-of-line arrays, placed after the IFD
    entries = []

    def entry(tag, typ, values, code):
        sz = {1: 1, 3: 2, 4: 4}[typ]
        if len(values) * sz <= 4:
            v4 = struct.pack(fmt + code * len(values), *values)
            v4 += b"\x00" * (4 - len(v4))
            entries.append((tag, typ, len(values), v4, None))
        else:
            entries.append((tag, typ, len(values), None, bytes(
                struct.pack(fmt + code * len(values), *values))))

    entry(256, 4, [w], "I")
    entry(257, 4, [h], "I")
    entry(258, 3, [8] * spp, "H")
    entry(259, 3, [compression], "H")
    entry(262, 3, [photometric], "H")
    entry(277, 3, [spp], "H")
    if tile is not None:
        entry(322, 4, [tile[0]], "I")
        entry(323, 4, [tile[1]], "I")
        entry(324, 4, strip_offsets, "I")
        entry(325, 4, [len(s) for s in strips], "I")
    else:
        entry(273, 4, strip_offsets, "I")
        entry(278, 4, [rps], "I")
        entry(279, 4, [len(s) for s in strips], "I")
    if predictor != 1:
        entry(317, 3, [predictor], "H")
    ifd_off = len(out)
    struct.pack_into(fmt + "I", out, 4, ifd_off)
    ifd = struct.pack(fmt + "H", len(entries))
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    pending = []
    for tag, typ, count, v4, ext in sorted(entries):
        if v4 is not None:
            ifd += struct.pack(fmt + "HHI", tag, typ, count) + v4
        else:
            ifd += struct.pack(fmt + "HHI", tag, typ, count)
            ifd += struct.pack(fmt + "I", data_off + len(extra))
            extra += ext
    ifd += struct.pack(fmt + "I", 0)
    return bytes(out) + ifd + bytes(extra)


def test_tiff_sniff_and_gray():
    img = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
    for bo in ("II", "MM"):
        blob = _tiff_encode(img, bo=bo)
        assert sniff_format(blob) == "tiff"
        np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))


def test_tiff_rgb_multistrip_packbits():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (10, 7, 3), dtype=np.uint8)
    img[3:6] = 77  # give PackBits real runs
    for comp in (1, 32773):
        blob = _tiff_encode(img, compression=comp, rows_per_strip=4)
        np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))


def test_tiff_white_is_zero_and_rejections():
    img = np.array([[0, 128], [255, 1]], dtype=np.uint8)
    blob = _tiff_encode(img, photometric=0)
    np.testing.assert_array_equal(
        decode_pixels(blob), 255.0 - img.astype(np.float64)
    )
    from littletable_spark.functions.imagecodec import (
        CORRUPT_ERRORS,
        _decode_tiff,
    )

    with pytest.raises(CORRUPT_ERRORS):
        _decode_tiff(_tiff_encode(img)[:20])  # truncated
    with pytest.raises(ValueError, match="not supported"):
        _decode_tiff(
            _tiff_encode(img, compression=4)  # CCITT G4: documented out
        )


def test_tiff_lzw_roundtrip_both_byte_orders():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
    img[4:8] = 200  # runs so LZW builds real multi-byte entries
    for bo in ("II", "MM"):
        blob = _tiff_encode(img, bo=bo, compression=5, rows_per_strip=5)
        np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))


def test_tiff_lzw_early_change_width_crossing():
    """Data with >253 distinct table entries forces the 9->10 bit code
    width switch — the TIFF early-change off-by-one is exercised, and
    a large repetitive image crosses 10->11->12 and a table restart."""
    # incompressible noise grows the table ~1 entry per emitted code
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    blob = _tiff_encode(img, compression=5)
    np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))
    big = np.tile(np.arange(256, dtype=np.uint8), (80, 2)).reshape(80, 512)
    blob = _tiff_encode(big, compression=5)
    np.testing.assert_array_equal(decode_pixels(blob), big.astype(np.float64))


def test_tiff_deflate_and_legacy_code():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (10, 6, 3), dtype=np.uint8)
    for comp in (8, 32946):
        blob = _tiff_encode(img, compression=comp, rows_per_strip=4)
        np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))


def test_tiff_horizontal_predictor():
    """Predictor 2 (horizontal differencing) undoes per row per sample,
    for LZW and Deflate, gray and RGB, across strip boundaries."""
    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, (11, 7, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (9, 14), dtype=np.uint8)
    for img in (rgb, gray):
        for comp in (5, 8):
            blob = _tiff_encode(
                img, compression=comp, rows_per_strip=4, predictor=2
            )
            np.testing.assert_array_equal(
                decode_pixels(blob), img.astype(np.float64)
            )


def test_tiff_lzw_differential_random():
    """Byte-level differential: the decoder inverts the test-side
    encoder on arbitrary byte strings (not just images)."""
    from littletable_spark.functions.imagecodec import _tiff_lzw_decode

    rng = np.random.RandomState(17)
    for trial in range(20):
        n = int(rng.randint(1, 5000))
        if trial % 3 == 0:  # runs-heavy: exercises long table entries
            data = np.repeat(
                rng.randint(0, 4, n // 8 + 1, dtype=np.uint8), 8
            )[:n].tobytes()
        else:
            data = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_tiff_tiled_layout():
    """Tiled TIFF (tags 322-325): row-major tile grid, edge tiles
    padded then cropped, every compression + the predictor."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)  # non-multiple
    for comp in (1, 5, 8, 32773):
        blob = _tiff_encode(img, compression=comp, tile=(16, 16))
        np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))
    gray = rng.randint(0, 256, (40, 32), dtype=np.uint8)  # exact multiple
    blob = _tiff_encode(gray, compression=5, tile=(16, 16), predictor=2)
    np.testing.assert_array_equal(decode_pixels(blob), gray.astype(np.float64))
    blob = _tiff_encode(gray, bo="MM", compression=8, tile=(32, 8), predictor=2)
    np.testing.assert_array_equal(decode_pixels(blob), gray.astype(np.float64))


# ------------------------------------------------------------------ #
# animated GIF frame sampling


def _gif_encode_animated(frames, palette, screen=None, gces=None) -> bytes:
    """frames: list of (left, top, index_array); gces: per-frame
    (disposal, transparent_idx | None) graphic-control settings."""
    n = len(palette)
    gct_bits = max((n - 1).bit_length(), 1) - 1
    gct_n = 2 << gct_bits
    pal = np.zeros((gct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    sw = screen[0] if screen else max(l + f.shape[1] for l, t, f in frames)
    sh = screen[1] if screen else max(t + f.shape[0] for l, t, f in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | gct_bits, 0, 0)
    out += pal.tobytes()
    for k, (left, top, idx) in enumerate(frames):
        if gces and gces[k] is not None:
            disposal, tidx = gces[k]
            packed = (disposal & 7) << 2 | (1 if tidx is not None else 0)
            out += bytes([0x21, 0xF9, 4, packed, 0, 0, tidx or 0, 0])
        h, w = idx.shape
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        mcs = max(gct_bits + 1, 2)
        out.append(mcs)
        data = _gif_lzw_encode(list(idx.reshape(-1)), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing():
    """Placement offsets, transparency, and disposal 2 (restore to
    background) compose across frames."""
    from littletable_spark.functions.imagecodec import gif_frames

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   dtype=np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)      # full screen, color 0
    patch = np.full((2, 2), 1, dtype=np.uint8)   # red patch
    trans = np.array([[2, 3], [3, 2]], dtype=np.uint8)  # 3 = transparent
    blob = _gif_encode_animated(
        [(0, 0, base), (1, 1, patch), (0, 0, trans)],
        pal,
        screen=(4, 4),
        gces=[None, (2, None), (0, 3)],
    )
    frames = dict(gif_frames(blob))
    assert len(frames) == 3
    np.testing.assert_array_equal(frames[0], np.full((4, 4, 3), 10))
    # frame 1: red patch drawn at (1,1)
    np.testing.assert_array_equal(frames[1][1:3, 1:3], np.full((2, 2, 3), [200, 0, 0]))
    np.testing.assert_array_equal(frames[1][0, 0], [10, 10, 10])
    # frame 2: disposal 2 restored the patch to background BEFORE this
    # frame; transparent pixels (idx 3) keep the background
    np.testing.assert_array_equal(frames[2][2, 2], [10, 10, 10])  # frame1 gone
    np.testing.assert_array_equal(frames[2][0, 0], [0, 200, 0])   # idx 2 drawn
    np.testing.assert_array_equal(frames[2][0, 1], [10, 10, 10])  # transparent
    np.testing.assert_array_equal(frames[2][1, 1], [0, 200, 0])   # redrawn


def test_gif_disposal_restore_previous():
    from littletable_spark.functions.imagecodec import gif_frames

    pal = np.array([[5, 5, 5], [250, 0, 0], [0, 250, 0]], dtype=np.uint8)
    base = np.zeros((3, 3), dtype=np.uint8)
    overlay = np.full((1, 1), 1, dtype=np.uint8)
    final = np.full((1, 1), 2, dtype=np.uint8)
    blob = _gif_encode_animated(
        [(0, 0, base), (1, 1, overlay), (0, 0, final)],
        pal,
        screen=(3, 3),
        gces=[None, (3, None), None],  # disposal 3: restore previous
    )
    frames = dict(gif_frames(blob))
    np.testing.assert_array_equal(frames[1][1, 1], [250, 0, 0])
    # after disposal 3 the overlay is gone; frame 2 draws only (0,0)
    np.testing.assert_array_equal(frames[2][1, 1], [5, 5, 5])
    np.testing.assert_array_equal(frames[2][0, 0], [0, 250, 0])


def test_gif_frame_sampling_even_spacing():
    from littletable_spark.functions.videocodec import sample_gif_frames
    from littletable_spark.functions.imagecodec import decode_pixels

    pal = np.array([[i * 25, 0, 0] for i in range(8)], dtype=np.uint8)
    frames = [
        (0, 0, np.full((2, 2), k, dtype=np.uint8)) for k in range(8)
    ]
    blob = _gif_encode_animated(frames, pal, screen=(2, 2))
    got = sample_gif_frames(blob, 4)
    assert [i for i, _ in got] == [0, 2, 4, 6]
    # sampled frames are P6 PPMs the builtin codecs read back exactly
    px = decode_pixels(got[2][1])
    np.testing.assert_array_equal(px, np.full((2, 2, 3), [100, 0, 0], dtype=float))
    # fewer frames than requested: every frame once
    assert [i for i, _ in sample_gif_frames(blob, 20)] == list(range(8))


def test_gif_frame_sample_operator(spark):
    """Spark frame_sample routes GIF blobs to the compositor; AVI and
    corrupt blobs keep their existing behavior."""
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import frame_sample

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    frames = [(0, 0, np.full((2, 2), k % 2, dtype=np.uint8)) for k in range(6)]
    gif = _gif_encode_animated(frames, pal, screen=(2, 2))
    t = Table("vids", spark=spark)
    t.insert_many([{"vid": 0, "blob": gif}, {"vid": 1, "blob": b"junk"}])
    out = frame_sample(t, "blob", "vid", n_frames=3, use_fake=False,
                       on_error="null")
    rows = sorted(
        ((r.vid, r.frame_idx) for r in out), key=lambda x: (x[0], x[1] or -1)
    )
    assert rows == [(0, 0), (0, 2), (0, 4), (1, None)]
