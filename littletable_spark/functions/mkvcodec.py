"""Matroska / WebM (EBML) container metadata — pure stdlib.

WebM is the other half of the crawled-video story next to ISO-BMFF
(functions/mp4codec.py). Public specs: RFC 8794 (EBML element
grammar — vint-coded IDs keep their length-marker bit, vint-coded
sizes strip it, all-ones size means unknown/to-end) and the Matroska
element registry (matroska.org; WebM is the same grammar with
``DocType`` "webm" and a codec subset).

One walk over ``Segment`` → ``Info`` (TimecodeScale ns/tick,
``Duration`` float in ticks, segment ``Title``) and ``Tracks`` →
``TrackEntry`` (TrackType 1=video 2=audio, CodecID "V_VP9"/"A_OPUS"
style strings, Video PixelWidth/PixelHeight, Audio
SamplingFrequency float + Channels). ``Cluster`` payloads — the
media bytes — are skipped by size, so per-blob cost is header
element count, not video bytes.

``mkv_info`` returns the same flat dict as ``mp4_info``/``ogg_info``;
malformed input raises ValueError into ``on_error``. Fixtures are
WRITTEN test-side with an independent EBML writer
(tests/test_mediainfo.py) so the reader is pinned against the spec
layout, not against itself.
"""
from __future__ import annotations

import struct

__all__ = ["sniff_mkv", "mkv_info"]

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element IDs (with their marker bits, as they appear on the wire)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TITLE = 0x7BA9
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_DOCTYPE = 0x4282
_TAGS = 0x1254C367
_TAG = 0x7373
_SIMPLE_TAG = 0x67C8
_TAG_NAME = 0x45A3
_TAG_STRING = 0x4487

#: Matroska official tag names -> our unified columns
_TAG_MAP = {
    "TITLE": "title",
    "ARTIST": "artist",
    "ALBUM": "album",
    "DATE_RELEASED": "year",
    "GENRE": "genre",
}


def sniff_mkv(blob: bytes) -> bool:
    return blob[:4] == _EBML_MAGIC


def _vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos). EBML vint: leading zeros of the first byte
    give the length; IDs keep the marker bit, sizes strip it."""
    if pos >= len(buf):
        raise ValueError("mkv: truncated vint")
    first = buf[pos]
    if first == 0:
        raise ValueError("mkv: invalid vint (>8 bytes)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        raise ValueError("mkv: truncated vint body")
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    return val, pos + length


def _elements(buf: bytes, pos: int, end: int):
    """Yield ``(element_id, body_start, body_end)``; an all-ones
    (unknown) size runs to the enclosing end."""
    while pos < end:
        eid, p = _vint(buf, pos, keep_marker=True)
        if p >= len(buf):
            raise ValueError("mkv: element without size")
        size_len = 8 - buf[p].bit_length() + 1
        size, p = _vint(buf, p, keep_marker=False)
        if size == (1 << (7 * size_len)) - 1:  # unknown size
            body_end = end
        else:
            body_end = p + size
        if body_end > end:
            body_end = end  # tolerate a truncated tail element
        yield eid, p, body_end
        pos = body_end


def _uint(buf: bytes, b: int, e: int) -> int:
    return int.from_bytes(buf[b:e], "big")


def _float(buf: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", buf[b:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[b:e])[0]
    if n == 0:
        return 0.0
    raise ValueError(f"mkv: bad float size {n}")


def mkv_info(blob: bytes) -> dict:
    """Container metadata of a Matroska/WebM blob without touching
    cluster payloads: ``format`` (webm when the EBML DocType says so,
    else mkv), ``duration_s`` (Duration ticks × TimecodeScale ns /
    1e9), first video track's ``width`` / ``height`` / ``codec``,
    first audio track's ``audio_codec`` / ``channels`` /
    ``sample_rate``, ``n_tracks``, and the segment ``title``. Raises
    ValueError on non-EBML data."""
    if not sniff_mkv(blob):
        raise ValueError("mkv: no EBML magic")
    info: dict = {
        "format": "mkv",
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
    duration_ticks: float | None = None
    timescale = 1_000_000  # Matroska default: 1 ms ticks
    segment = None
    for eid, b, e in _elements(blob, 0, len(blob)):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hb, he in _elements(blob, b, e):
                if hid == _DOCTYPE:
                    doctype = blob[hb:he].decode("latin-1").rstrip("\x00")
                    if doctype == "webm":
                        info["format"] = "webm"
        elif eid == _SEGMENT:
            segment = (b, e)
            break
    if segment is None:
        raise ValueError("mkv: no Segment element")
    for eid, b, e in _elements(blob, *segment):
        if eid == _INFO:
            for iid, ib, ie in _elements(blob, b, e):
                if iid == _TIMECODE_SCALE:
                    timescale = _uint(blob, ib, ie)
                elif iid == _DURATION:
                    duration_ticks = _float(blob, ib, ie)
                elif iid == _TITLE:
                    info["title"] = blob[ib:ie].decode("utf-8", "replace")
        elif eid == _TRACKS:
            for tid, tb, te in _elements(blob, b, e):
                if tid != _TRACK_ENTRY:
                    continue
                info["n_tracks"] += 1
                ttype, codec = None, None
                video: dict = {}
                audio: dict = {}
                for fid, fb, fe in _elements(blob, tb, te):
                    if fid == _TRACK_TYPE:
                        ttype = _uint(blob, fb, fe)
                    elif fid == _CODEC_ID:
                        codec = blob[fb:fe].decode("latin-1").rstrip("\x00")
                    elif fid == _VIDEO:
                        for vid, vb, ve in _elements(blob, fb, fe):
                            if vid == _PIXEL_W:
                                video["width"] = _uint(blob, vb, ve)
                            elif vid == _PIXEL_H:
                                video["height"] = _uint(blob, vb, ve)
                    elif fid == _AUDIO:
                        for aid, ab, ae in _elements(blob, fb, fe):
                            if aid == _SAMPLING_FREQ:
                                audio["sample_rate"] = int(
                                    _float(blob, ab, ae)
                                )
                            elif aid == _CHANNELS:
                                audio["channels"] = _uint(blob, ab, ae)
                if ttype == 1 and info["codec"] is None:
                    info["codec"] = codec
                    info.update(video)
                elif ttype == 2 and info["audio_codec"] is None:
                    info["audio_codec"] = codec
                    info["channels"] = audio.get("channels", 1)
                    if "sample_rate" in audio:
                        info["sample_rate"] = audio["sample_rate"]
        elif eid == _TAGS:
            # Tags -> Tag -> SimpleTag pairs (TagName / TagString);
            # segment-global tags only — per-track Targets are rare
            # in crawled files and out of scope for one-row metadata
            for tid, tb, te in _elements(blob, b, e):
                if tid != _TAG:
                    continue
                for sid, sb, se in _elements(blob, tb, te):
                    if sid != _SIMPLE_TAG:
                        continue
                    name = value = None
                    for fid, fb, fe in _elements(blob, sb, se):
                        if fid == _TAG_NAME:
                            name = blob[fb:fe].decode("utf-8", "replace")
                        elif fid == _TAG_STRING:
                            value = blob[fb:fe].decode("utf-8", "replace")
                    col = _TAG_MAP.get((name or "").upper())
                    if col and value and info.get(col) is None:
                        info[col] = value
    if duration_ticks is not None:
        info["duration_s"] = duration_ticks * timescale / 1e9
    return info
