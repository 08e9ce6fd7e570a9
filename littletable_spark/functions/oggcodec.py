"""Ogg container metadata (Vorbis / Opus / FLAC-in-Ogg / Theora) —
pure stdlib.

The free-codec audio family every crawled corpus carries. Public
specs: RFC 3533 (the Ogg page grammar), Vorbis I §4.2 (identification
+ comment headers), RFC 7845 (OpusHead / OpusTags), the FLAC-in-Ogg
mapping (``\\x7fFLAC`` + native STREAMINFO), and Theora I §6.2 for
video dims. One pass over the PAGE HEADERS only: the lacing table
gives each payload's length, so the scan skips payload bytes except
the first two packets per stream (identification + comment) — on a
100 TB corpus the per-blob cost is proportional to page count, not
audio bytes.

Duration comes from the stream's final granule position: PCM sample
count for Vorbis (/rate), 48 kHz samples minus pre-skip for Opus
(RFC 7845 §4), total-samples/rate for FLAC. Tags are VorbisComment
``KEY=value`` pairs, shared by all three audio mappings.

Page CRCs are NOT validated — tolerant parsing like the other codec
files (a flipped payload bit should not NULL the whole blob's
metadata); structural damage still raises ValueError into
``on_error``. Fixtures are WRITTEN test-side with an independent page
writer that DOES compute the RFC 3533 CRC-32 (poly 0x04C11DB7, init
0, unreflected), so the fixtures are real Ogg and the reader is
pinned against the spec, not against itself.
"""
from __future__ import annotations

import struct

__all__ = ["sniff_ogg", "ogg_info"]


def sniff_ogg(blob: bytes) -> bool:
    return blob[:4] == b"OggS" and len(blob) >= 27 and blob[4] == 0


def _pages(blob: bytes):
    """Yield ``(header_type, granule, serial, payload, lacing)`` per
    page. Stops at a truncated tail; raises on a broken header."""
    pos = 0
    n = len(blob)
    while pos + 27 <= n:
        if blob[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: lost page sync")
        if blob[pos + 4] != 0:
            raise ValueError("ogg: unknown page version")
        htype = blob[pos + 5]
        granule = struct.unpack("<q", blob[pos + 6 : pos + 14])[0]
        serial = struct.unpack("<I", blob[pos + 14 : pos + 18])[0]
        nsegs = blob[pos + 26]
        seg_end = pos + 27 + nsegs
        if seg_end > n:
            return
        lacing = blob[pos + 27 : seg_end]
        body = sum(lacing)
        if seg_end + body > n:
            return
        yield htype, granule, serial, blob[seg_end : seg_end + body], lacing
        pos = seg_end + body


def _vorbis_comments(data: bytes) -> dict:
    """VorbisComment block -> {title, artist, album, year, genre}."""
    out: dict = {}
    if len(data) < 8:
        return out
    vlen = struct.unpack("<I", data[:4])[0]
    p = 4 + vlen
    if p + 4 > len(data):
        return out
    count = struct.unpack("<I", data[p : p + 4])[0]
    p += 4
    names = {
        "title": "title",
        "artist": "artist",
        "album": "album",
        "date": "year",
        "genre": "genre",
    }
    for _ in range(min(count, 1024)):
        if p + 4 > len(data):
            break
        clen = struct.unpack("<I", data[p : p + 4])[0]
        p += 4
        if p + clen > len(data):
            break
        entry = data[p : p + clen]
        p += clen
        eq = entry.find(b"=")
        if eq <= 0:
            continue
        key = entry[:eq].decode("latin-1").lower()
        if key in names and names[key] not in out:
            out[names[key]] = entry[eq + 1 :].decode("utf-8", "replace")
    return out


def _flac_streaminfo(block: bytes) -> tuple[int, int, int]:
    """(rate, channels, total_samples) from a 34-byte STREAMINFO
    body."""
    if len(block) < 18:
        raise ValueError("ogg: short STREAMINFO")
    bits = int.from_bytes(block[10:18], "big")
    rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    total = bits & ((1 << 36) - 1)
    if not rate:
        raise ValueError("ogg: STREAMINFO rate 0")
    return rate, channels, total


def ogg_info(blob: bytes) -> dict:
    """Container metadata of an Ogg blob without decoding audio:
    ``format`` (ogg-vorbis / ogg-opus / ogg-flac / ogg-theora / ogg),
    ``duration_s`` from the final granule (one float division, see
    module docstring), ``audio_codec`` / ``channels`` /
    ``sample_rate``, Theora ``width`` / ``height`` / ``codec``, and
    the VorbisComment ``title`` / ``artist`` / ``album`` / ``year`` /
    ``genre``. Raises ValueError on non-Ogg data."""
    if not sniff_ogg(blob):
        raise ValueError("ogg: no OggS capture pattern")
    info: dict = {
        "format": "ogg",
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
    first: dict = {}  # serial -> id-header payload
    partial: dict = {}  # serial -> buffered comment-packet bytes
    comments: dict = {}  # serial -> comment-packet payload
    last_granule: dict = {}
    audio_serial = None
    pre_skip = 0
    for htype, granule, serial, payload, lacing in _pages(blob):
        if htype & 0x02:  # BOS
            info["n_tracks"] += 1
            first[serial] = payload
            continue
        if granule >= 0:
            last_granule[serial] = granule
        if serial in first and serial not in comments:
            # the comment packet ends at the first lacing < 255; the
            # setup packet usually CONTINUES in the same page, so cut
            # at the packet boundary rather than taking the payload
            cut, done = 0, False
            for lv in lacing:
                cut += lv
                if lv < 255:
                    done = True
                    break
            buf = partial.pop(serial, b"") + payload[:cut]
            if done:
                comments[serial] = buf
            else:
                partial[serial] = buf
    for serial, pkt in first.items():
        if pkt.startswith(b"\x01vorbis") and len(pkt) >= 16:
            info["audio_codec"] = "vorbis"
            info["channels"] = pkt[11]
            info["sample_rate"] = struct.unpack("<I", pkt[12:16])[0]
            audio_serial = serial
        elif pkt.startswith(b"OpusHead") and len(pkt) >= 16:
            info["audio_codec"] = "opus"
            info["channels"] = pkt[9]
            pre_skip = struct.unpack("<H", pkt[10:12])[0]
            info["sample_rate"] = struct.unpack("<I", pkt[12:16])[0]
            audio_serial = serial
        elif pkt.startswith(b"\x7fFLAC") and len(pkt) >= 51:
            # mapping header (9) + "fLaC" (4) + block header (4)
            info["audio_codec"] = "flac"
            rate, ch, total = _flac_streaminfo(pkt[17:])
            info["sample_rate"], info["channels"] = rate, ch
            if total:
                info["duration_s"] = total / rate
            audio_serial = serial
        elif pkt.startswith(b"\x80theora") and len(pkt) >= 20:
            info["codec"] = "theora"
            info["width"] = int.from_bytes(pkt[14:17], "big")
            info["height"] = int.from_bytes(pkt[17:20], "big")
    if info["audio_codec"]:
        info["format"] = f"ogg-{info['audio_codec']}"
    elif info["codec"]:
        info["format"] = "ogg-theora"
    if audio_serial is not None and info["duration_s"] is None:
        granule = last_granule.get(audio_serial)
        if granule is not None:
            if info["audio_codec"] == "opus":
                info["duration_s"] = (granule - pre_skip) / 48000
            elif info["sample_rate"]:
                info["duration_s"] = granule / info["sample_rate"]
    cpkt = comments.get(audio_serial, b"")
    if cpkt.startswith(b"\x03vorbis"):
        info.update(_vorbis_comments(cpkt[7:]))
    elif cpkt.startswith(b"OpusTags"):
        info.update(_vorbis_comments(cpkt[8:]))
    elif info["audio_codec"] == "flac" and len(cpkt) > 4:
        # a native FLAC metadata block: 1-byte type (4 =
        # VORBIS_COMMENT) + 3-byte length
        if cpkt[0] & 0x7F == 4:
            info.update(_vorbis_comments(cpkt[4:]))
    return info
