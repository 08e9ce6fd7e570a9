"""ISO-BMFF (mp4codec.py), Ogg (oggcodec.py), and the header-only
wav/flac/avi info walks, plus the unified ``media_info`` operator.

Fixtures are WRITTEN here with independent container writers (box
grammar per ISO/IEC 14496-12; Ogg pages with the real RFC 3533
CRC-32) so the readers are pinned against the spec layout, not
against themselves.
"""
from __future__ import annotations

import struct

import pytest

from littletable_spark.functions.audiocodec import flac_info, wav_info
from littletable_spark.functions.mp4codec import mp4_info, sniff_mp4
from littletable_spark.functions.oggcodec import ogg_info, sniff_ogg
from littletable_spark.functions.videocodec import avi_info

# ------------------------------------------------------------------ #
# ISO-BMFF writers (test-side, independent of the reader)


def box(typ: bytes, *payloads: bytes, large: bool = False) -> bytes:
    body = b"".join(payloads)
    if large:
        return struct.pack(">I4sQ", 1, typ, 16 + len(body)) + body
    return struct.pack(">I4s", 8 + len(body), typ) + body


def fullbox(typ: bytes, ver: int, *payloads: bytes) -> bytes:
    return box(typ, bytes([ver, 0, 0, 0]), *payloads)


def mvhd(timescale: int, duration: int, ver: int = 0) -> bytes:
    if ver == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    return fullbox(b"mvhd", ver, body + b"\x00" * 80)


def tkhd(width: int, height: int) -> bytes:
    body = b"\x00" * 20 + b"\x00" * 52 + struct.pack(
        ">II", width << 16, height << 16
    )
    return fullbox(b"tkhd", 0, body)


def hdlr(handler: bytes) -> bytes:
    return fullbox(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 13)


def video_stsd(fourcc: bytes) -> bytes:
    entry = box(fourcc, b"\x00" * 78)  # VisualSampleEntry-sized body
    return fullbox(b"stsd", 0, struct.pack(">I", 1), entry)


def audio_stsd(fourcc: bytes, channels: int, rate: int) -> bytes:
    entry = box(
        fourcc,
        b"\x00" * 8  # SampleEntry reserved + data_reference_index
        + b"\x00" * 8  # AudioSampleEntry reserved
        + struct.pack(">HHHHI", channels, 16, 0, 0, rate << 16),
    )
    return fullbox(b"stsd", 0, struct.pack(">I", 1), entry)


def trak(handler: bytes, stsd: bytes, dims: tuple | None = None) -> bytes:
    parts = [tkhd(*dims)] if dims else []
    parts.append(box(b"mdia", hdlr(handler), box(b"minf", box(b"stbl", stsd))))
    return box(b"trak", *parts)


def ilst_item(atom: bytes, text: str) -> bytes:
    data = box(b"data", struct.pack(">II", 1, 0) + text.encode())
    return box(atom, data)


def udta(*items: bytes) -> bytes:
    return box(b"udta", fullbox(b"meta", 0, hdlr(b"mdir"), box(b"ilst", *items)))


def ftyp(brand: bytes = b"isom") -> bytes:
    return box(b"ftyp", brand, struct.pack(">I", 0), b"isommp42")


# ------------------------------------------------------------------ #
# Ogg writer (test-side): real RFC 3533 pages incl. the CRC


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
            crc &= 0xFFFFFFFF
    return crc


def ogg_page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    htype: int = 0,
    continued_tail: bool = False,
) -> bytes:
    lacing = bytearray()
    payload = b"".join(packets)
    for i, p in enumerate(packets):
        n = len(p)
        lacing += b"\xff" * (n // 255)
        if not (continued_tail and i == len(packets) - 1):
            lacing.append(n % 255)
        elif n % 255:
            raise AssertionError("continued packet must be 255-aligned")
    hdr = struct.pack(
        "<4sBBqIIIB",
        b"OggS", 0, htype, granule, serial, seq, 0, len(lacing),
    )
    page = bytearray(hdr + bytes(lacing) + payload)
    struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
    return bytes(page)


def vorbis_id(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis"
        + struct.pack("<IB I i i i", 0, channels, rate, -1, 128000, -1)
        + b"\xb8\x01"
    )


def vorbis_comments(tags: dict, prefix: bytes = b"\x03vorbis") -> bytes:
    vendor = b"test"
    body = struct.pack("<I", len(vendor)) + vendor
    body += struct.pack("<I", len(tags))
    for k, v in tags.items():
        kv = f"{k}={v}".encode()
        body += struct.pack("<I", len(kv)) + kv
    out = prefix + body
    if prefix == b"\x03vorbis":
        out += b"\x01"  # framing bit
    return out


def flac_streaminfo(rate: int, channels: int, total: int) -> bytes:
    bits = (rate << 44) | ((channels - 1) << 41) | (15 << 36) | total
    return b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16


# ------------------------------------------------------------------ #
# MP4 tests


def test_mp4_video_audio_tags():
    blob = ftyp() + box(
        b"moov",
        mvhd(90000, 8 * 90000 + 45000),
        trak(b"vide", video_stsd(b"avc1"), dims=(640, 360)),
        trak(b"soun", audio_stsd(b"mp4a", 2, 44100)),
        udta(
            ilst_item(b"\xa9nam", "My Clip"),
            ilst_item(b"\xa9ART", "Someone"),
            ilst_item(b"\xa9alb", "Web"),
        ),
    )
    assert sniff_mp4(blob)
    got = mp4_info(blob)
    assert got["format"] == "mp4"
    assert got["duration_s"] == (8 * 90000 + 45000) / 90000
    assert (got["width"], got["height"]) == (640, 360)
    assert got["codec"] == "avc1"
    assert got["audio_codec"] == "mp4a"
    assert (got["channels"], got["sample_rate"]) == (2, 44100)
    assert got["n_tracks"] == 2
    assert (got["title"], got["artist"], got["album"]) == (
        "My Clip", "Someone", "Web",
    )


def test_mp4_m4a_and_mov_routing():
    audio = ftyp(b"M4A ") + box(
        b"moov",
        mvhd(44100, 44100 * 30, ver=1),  # 64-bit mvhd
        trak(b"soun", audio_stsd(b"mp4a", 1, 44100)),
    )
    got = mp4_info(audio)
    assert got["format"] == "m4a"
    assert got["duration_s"] == 30.0
    assert got["channels"] == 1

    mov = ftyp(b"qt  ") + box(
        b"moov",
        mvhd(600, 1200),
        trak(b"vide", video_stsd(b"jpeg"), dims=(320, 240)),
    )
    got = mp4_info(mov)
    assert got["format"] == "mov"
    assert got["codec"] == "jpeg"


def test_mp4_fragmented_mehd_duration():
    """DASH-style fMP4: mvhd duration 0, total in mvex/mehd."""
    mehd = fullbox(b"mehd", 1, struct.pack(">Q", 90000 * 12))
    blob = ftyp() + box(
        b"moov",
        mvhd(90000, 0),
        box(b"mvex", mehd),
        trak(b"vide", video_stsd(b"avc1"), dims=(320, 180)),
    )
    got = mp4_info(blob)
    assert got["duration_s"] == 12.0
    # a v0 mehd too
    blob0 = ftyp() + box(
        b"moov", mvhd(1000, 0),
        box(b"mvex", fullbox(b"mehd", 0, struct.pack(">I", 2500))),
    )
    assert mp4_info(blob0)["duration_s"] == 2.5


def test_mp4_largesize_uuid_and_errors():
    blob = ftyp() + box(b"uuid", b"X" * 16 + b"junk") + box(
        b"moov",
        mvhd(1000, 2500),
        large=True,
    )
    assert mp4_info(blob)["duration_s"] == 2.5

    with pytest.raises(ValueError):
        mp4_info(b"not a movie at all................")
    with pytest.raises(ValueError):
        mp4_info(ftyp())  # no moov
    bad = ftyp() + struct.pack(">I4s", 5, b"moov")  # size < 8
    with pytest.raises(ValueError):
        mp4_info(bad)


# ------------------------------------------------------------------ #
# Ogg tests


def test_ogg_vorbis_duration_and_tags():
    serial = 77
    pages = [
        ogg_page(serial, 0, 0, [vorbis_id(2, 44100)], htype=0x02),
        # comment + setup SHARE a page: the cut must land on the
        # first packet boundary
        ogg_page(
            serial, 1, 0,
            [vorbis_comments({"TITLE": "Song", "ARTIST": "Band",
                              "DATE": "2003"}),
             b"\x05vorbis" + b"\x00" * 40],
        ),
        ogg_page(serial, 2, 44100 * 2, [b"\xaa" * 100]),
        ogg_page(serial, 3, 44100 * 5, [b"\xbb" * 100], htype=0x04),
    ]
    got = ogg_info(b"".join(pages))
    assert got["format"] == "ogg-vorbis"
    assert got["audio_codec"] == "vorbis"
    assert (got["channels"], got["sample_rate"]) == (2, 44100)
    assert got["duration_s"] == (44100 * 5) / 44100
    assert (got["title"], got["artist"], got["year"]) == (
        "Song", "Band", "2003",
    )


def test_ogg_opus_preskip_and_long_comment():
    serial = 3
    head = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    # a comment packet long enough to span pages (255-lacing tail)
    tags = vorbis_comments(
        {"TITLE": "x" * 700, "ALBUM": "Pods"}, prefix=b"OpusTags"
    )
    first_cut = 510  # two full 255 segments continue to the next page
    pages = [
        ogg_page(serial, 0, 0, [head], htype=0x02),
        ogg_page(serial, 1, -1, [tags[:first_cut]], continued_tail=True),
        ogg_page(serial, 2, 0, [tags[first_cut:]], htype=0x01),
        ogg_page(serial, 3, 312 + 48000 * 3, [b"\xcc" * 50], htype=0x04),
    ]
    got = ogg_info(b"".join(pages))
    assert got["format"] == "ogg-opus"
    assert (got["channels"], got["sample_rate"]) == (2, 48000)
    assert got["duration_s"] == 3.0  # pre-skip removed
    assert got["title"] == "x" * 700
    assert got["album"] == "Pods"


def test_ogg_flac_and_theora_and_errors():
    serial = 9
    mapping = (
        b"\x7fFLAC\x01\x00" + struct.pack(">H", 1)
        + b"fLaC" + b"\x80" + (34).to_bytes(3, "big")
        + flac_streaminfo(8000, 1, 8000 * 7)
    )
    comment = b"\x84" + (0).to_bytes(3, "big")  # empty VORBIS_COMMENT
    pages = [
        ogg_page(serial, 0, 0, [mapping], htype=0x02),
        ogg_page(serial, 1, 0, [comment]),
    ]
    got = ogg_info(b"".join(pages))
    assert got["format"] == "ogg-flac"
    assert (got["sample_rate"], got["channels"]) == (8000, 1)
    assert got["duration_s"] == 7.0

    theora_id = (
        b"\x80theora" + bytes([3, 2, 1])
        + struct.pack(">HH", 40, 30)
        + (640).to_bytes(3, "big") + (480).to_bytes(3, "big")
    )
    got = ogg_info(ogg_page(5, 0, 0, [theora_id], htype=0x02))
    assert got["format"] == "ogg-theora"
    assert (got["width"], got["height"]) == (640, 480)
    assert got["codec"] == "theora"

    assert not sniff_ogg(b"OggX" + b"\x00" * 30)
    with pytest.raises(ValueError):
        ogg_info(b"random bytes, long enough to look at......")
    torn = ogg_page(1, 0, 0, [vorbis_id(1, 8000)], htype=0x02)
    with pytest.raises(ValueError):
        ogg_info(torn + b"JUNKJUNK" + b"\x00" * 30)  # lost sync


# ------------------------------------------------------------------ #
# wav / flac / avi header-only info


def _wav(rate: int, channels: int, n_frames: int, tag: int = 1) -> bytes:
    bits = 16
    data = b"\x00" * (n_frames * channels * 2)
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate,
        rate * channels * (bits // 8), channels * (bits // 8), bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_list_info_and_aiff_name_tags():
    from littletable_spark.functions.audiocodec import aiff_info, wav_info

    base = _wav(8000, 1, 8000)
    info = (
        b"INFO"
        + b"INAM" + struct.pack("<I", 8) + b"Title A\x00"
        + b"IART" + struct.pack("<I", 5) + b"Band\x00\x00"  # odd pad
        + b"ICRD" + struct.pack("<I", 4) + b"1999"
    )
    tagged = base + b"LIST" + struct.pack("<I", len(info)) + info
    got = wav_info(tagged)
    assert got["title"] == "Title A"
    assert got["artist"] == "Band"
    assert got["year"] == "1999"
    assert got["duration_s"] == 1.0  # fmt/data unaffected

    aiff = (
        _aiff(8000, 1, b"\x00" * 16, 8)
        + b"NAME" + struct.pack(">I", 5) + b"Tune\x00\x00"
        + b"AUTH" + struct.pack(">I", 2) + b"Me"
    )
    got = aiff_info(aiff)
    assert got["title"] == "Tune"
    assert got["artist"] == "Me"


def test_wav_info_pcm_and_compressed():
    got = wav_info(_wav(16000, 2, 16000 * 3))
    assert got == {
        "codec": "pcm", "sample_rate": 16000, "channels": 2,
        "duration_s": 3.0,
    }
    # compressed tag: duration falls back to the fmt byte rate
    got = wav_info(_wav(8000, 1, 8000, tag=0x55))
    assert got["codec"] == "wav-0x0055"
    assert got["duration_s"] == (8000 * 2) / (8000 * 1 * 2)
    with pytest.raises(ValueError):
        wav_info(b"RIFF\x00\x00\x00\x00AVI not wave")


def test_flac_info_streaminfo_and_comments():
    vc = vorbis_comments({"TITLE": "Take 1", "GENRE": "field"}, prefix=b"")
    blob = (
        b"fLaC"
        + b"\x00" + (34).to_bytes(3, "big") + flac_streaminfo(22050, 2, 22050)
        + b"\x84" + len(vc).to_bytes(3, "big") + vc
    )
    got = flac_info(blob)
    assert (got["sample_rate"], got["channels"]) == (22050, 2)
    assert got["duration_s"] == 1.0
    assert (got["title"], got["genre"]) == ("Take 1", "field")
    with pytest.raises(ValueError):
        flac_info(b"fLaC")  # truncated


def _avi(width: int, height: int, n: int, usf: int) -> bytes:
    avih = struct.pack("<I12xI12xII", usf, n, width, height) + b"\x00" * 8
    strh = b"vids" + b"MJPG" + b"\x00" * 48
    hdrl = (
        b"hdrl"
        + b"avih" + struct.pack("<I", len(avih)) + avih
        + b"LIST" + struct.pack("<I", 4 + 8 + len(strh))
        + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
    )
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_info():
    got = avi_info(_avi(320, 240, 250, 40000))
    assert (got["width"], got["height"]) == (320, 240)
    assert got["n_frames"] == 250
    assert got["duration_s"] == 250 * 40000 / 1_000_000
    assert got["codec"] == "MJPG"
    with pytest.raises(ValueError):
        avi_info(b"RIFF\x04\x00\x00\x00AVI ")  # no avih


# ------------------------------------------------------------------ #
# AIFF (independent test-side writer incl. the 80-bit rate encoder)


def _f80_enc(v: float) -> bytes:
    """Encode a positive number as IEEE 754 80-bit extended — written
    from the format definition (sign, 15-bit biased exponent, 64-bit
    mantissa with explicit integer bit), independent of the reader."""
    import math

    assert v > 0
    m, e = math.frexp(v)  # v = m * 2**e, m in [0.5, 1)
    mant = int(m * (1 << 64))
    return struct.pack(">H", e - 1 + 16383) + mant.to_bytes(8, "big")


def _aiff(rate: int, channels: int, frames_pcm: bytes, nframes: int,
          bits: int = 16, form: bytes = b"AIFF",
          compression: bytes = b"") -> bytes:
    comm = (
        struct.pack(">HIH", channels, nframes, bits)
        + _f80_enc(float(rate))
        + compression
    )
    ssnd = struct.pack(">II", 0, 0) + frames_pcm
    body = (
        form
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + (b"\x00" if len(comm) % 2 else b"")
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aiff_decode_and_info():
    import numpy as np

    from littletable_spark.functions.audiocodec import (
        aiff_info,
        decode_aiff,
        decode_audio_blob,
    )

    samples = np.array([0, 8192, -8192, 16384, -16384, 32767], "<i2")
    blob = _aiff(8000, 2, samples.astype(">i2").tobytes(), 3)
    got, rate = decode_aiff(blob)
    assert rate == 8000 and got.shape == (3, 2)
    assert abs(got[0, 1] - 8192 / 32768.0) < 1e-12
    # routed through the generic decoder too
    got2, _ = decode_audio_blob(blob)
    assert (got == got2).all()

    info = aiff_info(blob)
    assert info == {
        "codec": "pcm", "sample_rate": 8000, "channels": 2,
        "duration_s": 3 / 8000,
    }


def test_aifc_sowt_and_rejections():
    import numpy as np

    from littletable_spark.functions.audiocodec import decode_aiff

    samples = np.array([100, -200, 300, -400], "<i2")
    sowt = _aiff(
        16000, 1, samples.tobytes(), 4, form=b"AIFC",
        compression=b"sowt" + b"\x04sowt",
    )
    got, rate = decode_aiff(sowt)
    assert rate == 16000
    assert abs(got[1, 0] + 200 / 32768.0) < 1e-12

    with pytest.raises(ValueError):
        decode_aiff(
            _aiff(8000, 1, b"", 0, form=b"AIFC",
                  compression=b"ima4" + b"\x03IMA")
        )
    with pytest.raises(ValueError):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    with pytest.raises(ValueError):
        decode_aiff(b"RIFF not aiff at all")


def test_aiff_8bit_is_signed():
    import numpy as np

    from littletable_spark.functions.audiocodec import decode_aiff

    pcm = np.array([0, 64, -64, 127, -128], np.int8).tobytes()
    got, _ = decode_aiff(_aiff(8000, 1, pcm, 5, bits=8))
    assert abs(got[1, 0] - 0.5) < 1e-12
    assert abs(got[4, 0] + 1.0) < 1e-12


def test_fingerprint_wav_aiff_container_invariance():
    """The same samples must hash identically from WAV and AIFF —
    the container-invariance contract already pinned for FLAC."""
    import numpy as np

    from littletable_spark.functions.audiocodec import audio_fingerprint

    rng = np.random.default_rng(7)
    pcm = (rng.standard_normal(8000) * 8000).astype("<i2")
    wav = _wav_pcm16(8000, 1, pcm.tobytes())
    aiff = _aiff(8000, 1, pcm.astype(">i2").tobytes(), len(pcm))
    assert audio_fingerprint(wav) == audio_fingerprint(aiff)


def _wav_pcm16(rate: int, channels: int, data: bytes) -> bytes:
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------ #
# the unified operator


def test_media_info_operator(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import media_info

    m4a = ftyp(b"M4A ") + box(
        b"moov",
        mvhd(1000, 12500),
        trak(b"soun", audio_stsd(b"mp4a", 2, 48000)),
        udta(ilst_item(b"\xa9nam", "Pod")),
    )
    ogg = b"".join(
        [
            ogg_page(1, 0, 0, [vorbis_id(1, 16000)], htype=0x02),
            ogg_page(1, 1, 0, [vorbis_comments({"ARTIST": "A"})]),
            ogg_page(1, 2, 16000 * 4, [b"\x00" * 10], htype=0x04),
        ]
    )
    rows = [
        {"mid": 1, "blob": m4a},
        {"mid": 2, "blob": ogg},
        {"mid": 3, "blob": _wav(8000, 1, 8000 * 2)},
        {"mid": 4, "blob": _avi(160, 120, 50, 100000)},
        {"mid": 5, "blob": b"plain text, not media at all!"},
        {"mid": 6, "blob": _aiff(22050, 2, b"\x00" * (22050 * 4), 22050)},
    ]
    t = Table("media", spark=spark)
    t.insert_many(rows)
    got = {
        r.mid: r
        for r in media_info(t, "blob", "mid", on_error="null")
        .df.collect()
    }
    assert got[1].media_format == "m4a"
    assert got[1].duration_s == 12.5
    assert got[1].title == "Pod"
    assert got[1].audio_codec == "mp4a"
    assert got[2].media_format == "ogg-vorbis"
    assert got[2].duration_s == 4.0
    assert got[2].artist == "A"
    assert got[3].media_format == "wav"
    assert got[3].audio_codec == "pcm"
    assert got[3].duration_s == 2.0
    assert got[4].media_format == "avi"
    assert (got[4].width, got[4].height) == (160, 120)
    assert got[4].codec == "MJPG"
    assert got[5].media_format is None and got[5].duration_s is None
    assert got[6].media_format == "aiff"
    assert got[6].audio_codec == "pcm"
    assert got[6].duration_s == 1.0
    assert (got[6].channels, got[6].sample_rate) == (2, 22050)

    with pytest.raises(Exception):
        media_info(t, "blob", "mid", on_error="raise").df.collect()


# ------------------------------------------------------------------ #
# Matroska / WebM (EBML writer is test-side and independent)


def _eid(i: int) -> bytes:
    return i.to_bytes((i.bit_length() + 7) // 8, "big")


def _esize(n: int, length: int | None = None) -> bytes:
    if length is None:
        length = 1
        while n >= (1 << (7 * length)) - 1:
            length += 1
    out = bytearray(n.to_bytes(length, "big"))
    out[0] |= 1 << (8 - length)
    return bytes(out)


def el(i: int, body: bytes, size: bytes | None = None) -> bytes:
    return _eid(i) + (size if size is not None else _esize(len(body))) + body


def _mkv(
    doctype: str = "webm",
    duration_ticks: float = 4000.0,
    timescale: int = 1_000_000,
    title: str | None = "Clip",
    unknown_segment_size: bool = False,
) -> bytes:
    header = el(0x1A45DFA3, el(0x4282, doctype.encode()))
    info = el(0x2AD7B1, timescale.to_bytes(4, "big")) + el(
        0x4489, struct.pack(">d", duration_ticks)
    )
    if title is not None:
        info += el(0x7BA9, title.encode())
    video_tr = el(
        0xAE,
        el(0x83, b"\x01")
        + el(0x86, b"V_VP9")
        + el(0xE0, el(0xB0, (1280).to_bytes(2, "big"))
            + el(0xBA, (720).to_bytes(2, "big"))),
    )
    audio_tr = el(
        0xAE,
        el(0x83, b"\x02")
        + el(0x86, b"A_OPUS")
        + el(0xE1, el(0xB5, struct.pack(">f", 48000.0))
            + el(0x9F, b"\x02")),
    )
    cluster = el(0x1F43B675, b"\xde\xad" * 20)  # skipped by size
    seg_body = (
        el(0x1549A966, info)
        + el(0x1654AE6B, video_tr + audio_tr)
        + cluster
    )
    seg_size = b"\xff" if unknown_segment_size else None
    return header + el(0x18538067, seg_body, size=seg_size)


def test_mkv_webm_info():
    got = __import__(
        "littletable_spark.functions.mkvcodec", fromlist=["mkv_info"]
    ).mkv_info(_mkv())
    assert got["format"] == "webm"
    assert got["duration_s"] == 4.0  # 4000 ms ticks at the 1 ms scale
    assert (got["width"], got["height"]) == (1280, 720)
    assert got["codec"] == "V_VP9"
    assert got["audio_codec"] == "A_OPUS"
    assert (got["channels"], got["sample_rate"]) == (2, 48000)
    assert got["n_tracks"] == 2
    assert got["title"] == "Clip"


def test_mkv_tags_element():
    """Tags -> Tag -> SimpleTag pairs map to the unified columns; the
    segment Title element still wins for title."""
    from littletable_spark.functions.mkvcodec import mkv_info

    def stag(name: bytes, value: bytes) -> bytes:
        return el(0x67C8, el(0x45A3, name) + el(0x4487, value))

    tags = el(
        0x1254C367,
        el(0x7373, stag(b"ARTIST", b"Band") + stag(b"DATE_RELEASED", b"2019")
           + stag(b"GENRE", b"doc") + stag(b"IGNORED_NAME", b"x")),
    )
    base = _mkv()
    # splice the Tags element into the Segment: rebuild with a bigger body
    header = el(0x1A45DFA3, el(0x4282, b"webm"))
    from littletable_spark.functions.mkvcodec import _elements

    (eid, b0, e0), = list(_elements(base, len(header), len(base)))
    assert eid == 0x18538067
    blob = header + el(0x18538067, base[b0:e0] + tags)
    got = mkv_info(blob)
    assert got["artist"] == "Band"
    assert got["year"] == "2019"
    assert got["genre"] == "doc"
    assert got["title"] == "Clip"  # segment Title unaffected


def test_mkv_unknown_size_and_matroska_doctype():
    from littletable_spark.functions.mkvcodec import mkv_info, sniff_mkv

    got = mkv_info(
        _mkv(doctype="matroska", title=None, unknown_segment_size=True)
    )
    assert got["format"] == "mkv"
    assert got["title"] is None
    assert got["duration_s"] == 4.0

    assert not sniff_mkv(b"\x1a\x45\xdf\xa4nope")
    with pytest.raises(ValueError):
        mkv_info(b"no ebml here.....................")
    with pytest.raises(ValueError):
        # EBML header but no Segment
        mkv_info(el(0x1A45DFA3, el(0x4282, b"webm")))


# ------------------------------------------------------------------ #
# MP4 intra-frame sampling (sample-table walk)


def _stbl(sizes: list[int], chunk_offsets: list[int],
          stsc: list[tuple[int, int]], fourcc: bytes = b"jpeg") -> bytes:
    stsz = fullbox(
        b"stsz", 0,
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = fullbox(
        b"stco", 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stsc_b = fullbox(
        b"stsc", 0,
        struct.pack(">I", len(stsc))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in stsc),
    )
    return box(b"stbl", video_stsd(fourcc), stsz, stco, stsc_b)


def test_mp4_video_frames_sample_table():
    from littletable_spark.functions.mp4codec import (
        mp4_video_frames,
        sample_mp4_frames,
    )

    frames = [b"F0!", b"F1x!", b"F2xx!", b"F3xxx!"]
    ft = ftyp()
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    base = len(ft) + 8  # payload offset of the first frame
    # chunk 1 holds 2 samples, chunk 2 holds the rest
    offs = [base, base + len(frames[0]) + len(frames[1])]
    tk = box(
        b"trak",
        box(
            b"mdia", hdlr(b"vide"),
            box(b"minf", _stbl([len(f) for f in frames], offs, [(1, 2)])),
        ),
    )
    blob = ft + mdat + box(b"moov", mvhd(1000, 4000), tk)
    assert mp4_video_frames(blob) == frames
    assert sample_mp4_frames(blob, 2) == [(0, frames[0]), (2, frames[2])]
    assert sample_mp4_frames(blob, 9) == list(enumerate(frames))

    # inter-coded tracks refuse (they need ffmpeg)
    tk_avc = box(
        b"trak",
        box(
            b"mdia", hdlr(b"vide"),
            box(b"minf", _stbl([3], [base], [(1, 1)], fourcc=b"avc1")),
        ),
    )
    with pytest.raises(ValueError):
        mp4_video_frames(ft + mdat + box(b"moov", tk_avc))
    # sample beyond the blob
    tk_far = box(
        b"trak",
        box(
            b"mdia", hdlr(b"vide"),
            box(b"minf", _stbl([9999], [base], [(1, 1)])),
        ),
    )
    with pytest.raises(ValueError):
        mp4_video_frames(ft + mdat + box(b"moov", tk_far))


def test_frame_sample_routes_mp4(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import frame_sample

    frames = [b"AA", b"BBB", b"CCCC"]
    ft = ftyp()
    mdat = box(b"mdat", b"".join(frames))
    base = len(ft) + 8
    tk = box(
        b"trak",
        box(
            b"mdia", hdlr(b"vide"),
            box(b"minf", _stbl([len(f) for f in frames], [base], [(1, 3)])),
        ),
    )
    blob = ft + mdat + box(b"moov", tk)
    t = Table("v", spark=spark)
    t.insert_many([{"vid": 1, "blob": blob}])
    got = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in frame_sample(t, "blob", "vid", n_frames=3, use_fake=False)
    )
    assert got == list(enumerate(frames))


def test_media_info_routes_mkv(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import media_info, sniff_media

    t = Table("mk", spark=spark)
    t.insert_many([{"id": 1, "blob": _mkv()}])
    r = media_info(t, "blob", "id").df.collect()[0]
    assert r.media_format == "webm"
    assert r.duration_s == 4.0
    assert (r.width, r.height) == (1280, 720)
    assert r.title == "Clip"
    got = sniff_media(t, "blob", "meta").df.collect()[0]
    assert got.meta.format == "mkv"


def test_parsers_raise_catchable_errors_on_fuzz():
    """The on_error contract: every container walk must terminate and
    raise only the error types media_info's net catches (ValueError /
    struct.error / IndexError) on arbitrary junk — random bytes,
    magic-prefixed junk, and truncations of valid fixtures."""
    import random
    import struct as st

    from littletable_spark.functions.audiocodec import (
        aiff_info,
        flac_info,
        wav_info,
    )
    from littletable_spark.functions.mkvcodec import mkv_info
    from littletable_spark.functions.mp4codec import mp4_info, mp4_video_frames
    from littletable_spark.functions.oggcodec import ogg_info
    from littletable_spark.functions.videocodec import avi_info

    parsers = [
        mp4_info, mp4_video_frames, ogg_info, mkv_info,
        wav_info, flac_info, aiff_info, avi_info,
    ]
    magics = [
        b"", b"\x00" * 64,
        b"OggS" + b"\x00" * 40,
        b"\x1a\x45\xdf\xa3" + b"\xff" * 40,
        b"fLaC" + b"\x7f" * 20,
        b"FORM\x00\x00\x00\x30AIFF" + b"\x99" * 40,
        b"RIFF\x00\x00\x00\x30WAVE" + b"\x77" * 40,
        b"RIFF\x00\x00\x00\x30AVI " + b"\x55" * 40,
        st.pack(">I4s", 24, b"ftyp") + b"isom" + b"\x00" * 12,
    ]
    valid = [
        _mkv(),
        ftyp() + box(b"moov", mvhd(1000, 5000)),
        _wav(8000, 1, 100),
        _avi(32, 32, 10, 1000),
    ]
    rng = random.Random(1234)
    cases = list(magics)
    cases += [bytes(rng.randrange(256) for _ in range(64)) for _ in range(40)]
    cases += [v[:k] for v in valid for k in (5, 13, 21, len(v) - 3)]
    for blob in cases:
        for parse in parsers:
            try:
                parse(blob)
            except (ValueError, st.error, IndexError):
                pass  # the contract: catchable, terminating


def test_audio_tags_routes_ogg_m4a_flac(spark):
    """Round 14: audio_tags covers the VorbisComment family and ilst
    atoms, not just ID3."""
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import audio_tags

    ogg = b"".join(
        [
            ogg_page(4, 0, 0, [vorbis_id(2, 44100)], htype=0x02),
            ogg_page(4, 1, 0, [vorbis_comments({"TITLE": "OggSong"})]),
        ]
    )
    m4a = ftyp(b"M4A ") + box(
        b"moov",
        mvhd(10, 10),
        trak(b"soun", audio_stsd(b"mp4a", 2, 44100)),
        udta(ilst_item(b"\xa9alb", "Disc")),
    )
    vcb = vorbis_comments({"ARTIST": "F"}, prefix=b"")
    flac = (
        b"fLaC"
        + b"\x00" + (34).to_bytes(3, "big") + flac_streaminfo(8000, 1, 0)
        + b"\x84" + len(vcb).to_bytes(3, "big") + vcb
    )
    t = Table("tags", spark=spark)
    t.insert_many(
        [
            {"id": 1, "blob": ogg},
            {"id": 2, "blob": m4a},
            {"id": 3, "blob": flac},
            {"id": 4, "blob": b"OggS" + b"\x01" * 40},  # corrupt -> NULLs
        ]
    )
    got = {r.id: r for r in audio_tags(t, "blob", "id")}
    assert got[1].title == "OggSong"
    assert got[2].album == "Disc"
    assert got[3].artist == "F"
    assert got[4].title is None


def test_sniff_media_types_ogg(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import sniff_media

    t = Table("s", spark=spark)
    t.insert_many(
        [
            {"i": 1, "blob": ogg_page(1, 0, 0, [b"x"], htype=0x02)},
            {"i": 2, "blob": ftyp() + box(b"moov", mvhd(10, 10))},
        ]
    )
    got = {r.i: r.meta.format for r in
           sniff_media(t, "blob", "meta").df.select("i", "meta").collect()}
    assert got == {1: "ogg", 2: "mp4"}
