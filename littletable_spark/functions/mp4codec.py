"""ISO-BMFF (MP4 / M4A / MOV) container metadata — pure stdlib.

The dominant video container in any crawled corpus. No frame decode
here (inter-coded H.264/HEVC payloads are the documented ffmpeg
boundary, COVERAGE.md); what curation needs from an MP4 is the
CONTAINER story, and that is pure public spec (ISO/IEC 14496-12 box
grammar; Apple's QuickTime metadata ``ilst`` layout for the iTunes-
style tags every real .m4a/.mp4 carries):

- box walk: ``size(4) type(4)`` big-endian, ``size==1`` -> 64-bit
  largesize follows, ``size==0`` -> box runs to end of enclosure,
  ``uuid`` -> 16-byte usertype after the header;
- ``ftyp`` major brand (isom/mp42/M4A /qt  ...) routes the family;
- ``moov/mvhd`` (FullBox v0/v1) gives timescale + duration;
- per-``trak``: ``tkhd`` 16.16 presentation dims, ``mdia/hdlr``
  handler (vide/soun), ``mdia/mdhd`` media timescale,
  ``mdia/minf/stbl/stsd`` first sample-entry fourcc = the codec, and
  for ``soun`` entries the channel count + 16.16 sample rate at the
  fixed AudioSampleEntry offsets;
- ``moov/udta/meta/ilst`` (``meta`` is a FullBox — 4 flag bytes
  before its children, the classic parser trap): ``\\xa9nam`` /
  ``\\xa9ART`` / ``\\xa9alb`` / ``\\xa9day`` / ``\\xa9gen`` items,
  each wrapping a ``data`` box whose well-known type 1 payload is
  UTF-8 text.

``mp4_info`` returns one flat dict; malformed input raises
ValueError into the caller's ``on_error`` contract. Fixtures are
WRITTEN test-side (an independent box writer, tests/test_mp4codec.py)
so the reader is pinned against the spec layout, not against itself.
"""
from __future__ import annotations

import struct

__all__ = ["sniff_mp4", "mp4_info", "mp4_video_frames", "sample_mp4_frames"]

#: stsd fourccs whose samples are standalone intra frames (decodable
#: without ffmpeg: MJPEG samples are baseline JPEGs, png is png)
_INTRA_CODECS = {b"jpeg", b"mjpa", b"png "}

#: ilst item fourcc -> tag name (the (c)-prefixed iTunes atoms)
_ILST_TAGS = {
    b"\xa9nam": "title",
    b"\xa9ART": "artist",
    b"\xa9alb": "album",
    b"\xa9day": "year",
    b"\xa9gen": "genre",
}


def sniff_mp4(blob: bytes) -> bool:
    """True when the first box is a plausible ``ftyp`` (size field in
    range, type at bytes 4-8) — the same check sniff_media compiles
    natively."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        return False
    size = struct.unpack(">I", blob[:4])[0]
    return 8 <= size <= len(blob) and size % 4 == 0


def _boxes(buf: bytes, pos: int, end: int):
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    ``buf[pos:end]``. Tolerant of a trailing partial box (stops)."""
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        typ = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if body + 8 > end:
                return
            size = struct.unpack(">Q", buf[body : body + 8])[0]
            body += 8
            if size < 16:
                raise ValueError("mp4: bad largesize")
        elif size == 0:  # runs to end of the enclosing box
            size = end - pos
        elif size < 8:
            raise ValueError(f"mp4: bad box size {size}")
        if typ == b"uuid":
            body += 16
        box_end = pos + size
        if box_end > end or body > box_end:
            return  # truncated tail — surface what parsed so far
        yield typ, body, box_end
        pos = box_end


def _first(buf: bytes, pos: int, end: int, *path: bytes):
    """Body bounds of the first box at ``path`` below [pos, end)."""
    for name in path:
        for typ, b, e in _boxes(buf, pos, end):
            if typ == name:
                if name == b"meta":  # FullBox: children after ver/flags
                    b += 4
                pos, end = b, e
                break
        else:
            return None
    return pos, end


def _fullbox(buf: bytes, pos: int):
    ver = buf[pos]
    return ver, pos + 4


def _mvhd(buf: bytes, pos: int, end: int):
    ver, p = _fullbox(buf, pos)
    if ver == 1:
        p += 16  # creation + modification (64-bit each)
        timescale = struct.unpack(">I", buf[p : p + 4])[0]
        duration = struct.unpack(">Q", buf[p + 4 : p + 12])[0]
    else:
        p += 8
        timescale, duration = struct.unpack(">II", buf[p : p + 8])
    if not timescale:
        raise ValueError("mp4: mvhd timescale 0")
    return timescale, duration


def _tkhd_dims(buf: bytes, pos: int, end: int):
    ver, p = _fullbox(buf, pos)
    # ver0: 20 bytes of times/ids, ver1: 32; then 52 bytes of
    # reserved/layer/volume/matrix before the 16.16 width/height
    p += (32 if ver == 1 else 20) + 52
    if p + 8 > end:
        raise ValueError("mp4: short tkhd")
    w, h = struct.unpack(">II", buf[p : p + 8])
    return w >> 16, h >> 16


def _stsd_entry(buf: bytes, pos: int, end: int):
    """First sample entry of an stsd: ``(fourcc, body_start,
    body_end)``."""
    _, p = _fullbox(buf, pos)
    p += 4  # entry_count
    got = next(iter(_boxes(buf, p, end)), None)
    if got is None:
        raise ValueError("mp4: empty stsd")
    return got


def _audio_entry(buf: bytes, body: int, end: int):
    """channelcount + sample rate from the fixed AudioSampleEntry
    layout: 8 bytes SampleEntry, 8 reserved, then chan(2) size(2)
    predef(2) reserved(2) rate(16.16)."""
    p = body + 16
    if p + 12 > end:
        raise ValueError("mp4: short audio sample entry")
    channels = struct.unpack(">H", buf[p : p + 2])[0]
    rate = struct.unpack(">I", buf[p + 8 : p + 12])[0] >> 16
    return channels, rate


def _ilst_tags(buf: bytes, pos: int, end: int) -> dict:
    tags = {}
    for typ, b, e in _boxes(buf, pos, end):
        name = _ILST_TAGS.get(typ)
        if not name:
            continue
        for t2, b2, e2 in _boxes(buf, b, e):
            if t2 != b"data" or e2 - b2 < 8:
                continue
            dtype = struct.unpack(">I", buf[b2 : b2 + 4])[0]
            if dtype == 1:  # well-known type: UTF-8
                tags[name] = buf[b2 + 8 : e2].decode("utf-8", "replace")
            break
    return tags


def _stbl_tables(blob: bytes, spos: int, send: int):
    """(sizes, chunk_offsets, stsc_entries) from a sample table."""
    sizes: list[int] = []
    offsets: list[int] = []
    stsc: list[tuple[int, int]] = []
    for typ, b, e in _boxes(blob, spos, send):
        if typ == b"stsz":
            _, p = _fullbox(blob, b)
            uniform, count = struct.unpack(">II", blob[p : p + 8])
            if uniform:
                sizes = [uniform] * count
            else:
                sizes = list(
                    struct.unpack(f">{count}I", blob[p + 8 : p + 8 + 4 * count])
                )
        elif typ in (b"stco", b"co64"):
            _, p = _fullbox(blob, b)
            count = struct.unpack(">I", blob[p : p + 4])[0]
            fmt, width = (">Q", 8) if typ == b"co64" else (">I", 4)
            offsets = [
                struct.unpack(fmt, blob[p + 4 + k * width : p + 4 + (k + 1) * width])[0]
                for k in range(count)
            ]
        elif typ == b"stsc":
            _, p = _fullbox(blob, b)
            count = struct.unpack(">I", blob[p : p + 4])[0]
            for k in range(count):
                fc, spc = struct.unpack(
                    ">II", blob[p + 4 + k * 12 : p + 12 + k * 12]
                )
                stsc.append((fc, spc))
    return sizes, offsets, stsc


def mp4_video_frames(blob: bytes) -> list[bytes]:
    """All video sample payloads of an intra-coded MP4/MOV, in track
    order — the ISO-BMFF analogue of ``videocodec.avi_video_frames``
    (MJPEG samples ARE baseline JPEGs, so the chain into the native
    JPEG decoder is real). The sample table resolves each sample to
    its mdat bytes: stsc maps samples onto chunks, stco/co64 places
    the chunks, stsz sizes the samples, samples within a chunk are
    contiguous. Inter-coded tracks (avc1/hvc1/vp09...) raise — they
    need ffmpeg and surface through the caller's ``on_error``."""
    if not sniff_mp4(blob):
        raise ValueError("mp4: no ftyp box")
    moov = _first(blob, 0, len(blob), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    for typ, b, e in _boxes(blob, *moov):
        if typ != b"trak":
            continue
        hdlr = _first(blob, b, e, b"mdia", b"hdlr")
        if not hdlr or blob[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _first(blob, b, e, b"mdia", b"minf", b"stbl")
        if stbl is None:
            continue
        stsd = _first(blob, *stbl, b"stsd")
        fourcc = _stsd_entry(blob, *stsd)[0] if stsd else b"????"
        if fourcc not in _INTRA_CODECS:
            raise ValueError(
                f"mp4: inter-coded video ({fourcc.decode('latin-1')}) "
                "needs ffmpeg"
            )
        sizes, offsets, stsc = _stbl_tables(blob, *stbl)
        if not sizes or not offsets or not stsc:
            raise ValueError("mp4: incomplete sample table")
        frames: list[bytes] = []
        si = 0
        for ci, chunk_off in enumerate(offsets):
            # samples-per-chunk from the last stsc entry at/below ci+1
            spc = next(
                (s for fc, s in reversed(stsc) if fc <= ci + 1), stsc[0][1]
            )
            pos = chunk_off
            for _ in range(spc):
                if si >= len(sizes):
                    break
                end = pos + sizes[si]
                if end > len(blob):
                    raise ValueError("mp4: sample beyond blob")
                frames.append(bytes(blob[pos:end]))
                pos = end
                si += 1
        if not frames:
            raise ValueError("mp4: empty video track")
        return frames
    raise ValueError("mp4: no video track")


def sample_mp4_frames(blob: bytes, n_frames: int) -> list[tuple[int, bytes]]:
    """n evenly spaced (frame_index, frame_bytes) samples — fewer when
    the clip has fewer frames than requested (every frame, once)."""
    frames = mp4_video_frames(blob)
    total = len(frames)
    if total <= n_frames:
        return list(enumerate(frames))
    idxs = sorted({(i * total) // n_frames for i in range(n_frames)})
    return [(i, frames[i]) for i in idxs]


def mp4_info(blob: bytes) -> dict:
    """Container metadata of an ISO-BMFF blob without decoding frames:
    ``format`` (mp4 / m4a / mov by brand + track mix), ``duration_s``
    (mvhd duration / timescale as one float division; when the mvhd
    duration is 0 — fragmented/DASH files — the mvex/mehd
    fragment_duration is used instead), video
    ``width`` / ``height`` / ``codec`` fourcc from the first vide
    trak, ``audio_codec`` / ``channels`` / ``sample_rate`` from the
    first soun trak, ``n_tracks``, and the ilst ``title`` / ``artist``
    / ``album`` / ``year`` / ``genre`` tags. Raises ValueError on
    non-BMFF data (the on_error contract)."""
    if not sniff_mp4(blob):
        raise ValueError("mp4: no ftyp box")
    brand = blob[8:12].decode("latin-1").strip()
    moov = _first(blob, 0, len(blob), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    mpos, mend = moov
    info: dict = {
        "format": None,
        "duration_s": None,
        "width": None,
        "height": None,
        "codec": None,
        "audio_codec": None,
        "channels": None,
        "sample_rate": None,
        "n_tracks": 0,
        "title": None,
        "artist": None,
        "album": None,
        "year": None,
        "genre": None,
    }
    has_video = False
    timescale = mvhd_dur = mehd_dur = None
    for typ, b, e in _boxes(blob, mpos, mend):
        if typ == b"mvhd":
            timescale, mvhd_dur = _mvhd(blob, b, e)
        elif typ == b"mvex":
            # fragmented MP4 (DASH): mvhd duration is 0 and the total
            # lives in the movie-extends mehd fragment_duration
            mehd = _first(blob, b, e, b"mehd")
            if mehd:
                ver, p = _fullbox(blob, mehd[0])
                if ver == 1:
                    mehd_dur = struct.unpack(">Q", blob[p : p + 8])[0]
                else:
                    mehd_dur = struct.unpack(">I", blob[p : p + 4])[0]
        elif typ == b"trak":
            info["n_tracks"] += 1
            hdlr = _first(blob, b, e, b"mdia", b"hdlr")
            handler = (
                blob[hdlr[0] + 8 : hdlr[0] + 12] if hdlr else b""
            )
            stsd = _first(blob, b, e, b"mdia", b"minf", b"stbl", b"stsd")
            entry = _stsd_entry(blob, *stsd) if stsd else None
            if handler == b"vide" and not has_video:
                has_video = True
                tkhd = _first(blob, b, e, b"tkhd")
                if tkhd:
                    info["width"], info["height"] = _tkhd_dims(
                        blob, *tkhd
                    )
                if entry:
                    info["codec"] = entry[0].decode("latin-1").strip()
            elif handler == b"soun" and info["audio_codec"] is None:
                if entry:
                    fourcc, eb, ee = entry
                    info["audio_codec"] = fourcc.decode("latin-1").strip()
                    info["channels"], info["sample_rate"] = _audio_entry(
                        blob, eb, ee
                    )
        elif typ == b"udta":
            ilst = _first(blob, b, e, b"meta", b"ilst")
            if ilst:
                info.update(_ilst_tags(blob, *ilst))
    if timescale:
        if mvhd_dur:
            info["duration_s"] = mvhd_dur / timescale
        elif mehd_dur:
            info["duration_s"] = mehd_dur / timescale
    if brand in ("qt",):
        info["format"] = "mov"
    elif not has_video and info["audio_codec"] is not None:
        info["format"] = "m4a"
    else:
        info["format"] = "mp4"
    return info
