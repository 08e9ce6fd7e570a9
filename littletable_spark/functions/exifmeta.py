"""EXIF metadata extraction and scrubbing for image blobs (JPEG APP1,
PNG eXIf/text chunks, WebP EXIF/XMP chunks) — the image half of PII
curation.

Crawled photos routinely carry EXIF GPS coordinates (precise home
locations — PII), camera serial-adjacent Make/Model strings, and
capture timestamps. A pipeline that redistributes images must be able
to AUDIT (which blobs carry what) and SCRUB (emit the same pixels
without the metadata):

- ``parse_exif``: one JPEG blob → a flat summary dict (has_exif,
  orientation, make, model, datetime, has_gps, gps_lat, gps_lon).
  EXIF problems never raise — the pixels are still good; non-JPEG or
  EXIF-less blobs report ``has_exif=False``.
- ``strip_exif``: the same JPEG bytes minus every metadata segment
  (APP1 Exif/XMP, APP13 IPTC/Photoshop, COM comments). The entropy
  stream is untouched, so decoded pixels are bit-identical — but note
  an orientation tag is metadata too: scrub AFTER any decode that
  should honor display orientation.

Byte-level segment surgery per ITU T.81 (the same marker walk the
decoder uses, fill-byte aware). No reference analog; extends the
multimodal/PII mandate like textops.pii_scrub.
"""

from __future__ import annotations

import struct

__all__ = ["parse_exif", "strip_exif"]

_GPS_TAGS = {0x0001: "lat_ref", 0x0002: "lat", 0x0003: "lon_ref", 0x0004: "lon"}


def _read_ascii(tiff: bytes, fmt: str, count: int, value_off: int) -> str | None:
    """ASCII tag payload: inline when <=4 bytes, else at the pointed
    offset. NUL-terminated."""
    try:
        if count <= 4:
            raw = tiff[value_off : value_off + count]
        else:
            (off,) = struct.unpack_from(fmt + "I", tiff, value_off)
            raw = tiff[off : off + count]
        return raw.split(b"\x00", 1)[0].decode("ascii", errors="replace") or None
    except (struct.error, IndexError):
        return None


def _read_rational3(tiff: bytes, fmt: str, value_off: int) -> float | None:
    """Three RATIONALs (deg, min, sec) at the pointed offset → degrees."""
    try:
        (off,) = struct.unpack_from(fmt + "I", tiff, value_off)
        parts = []
        for k in range(3):
            num, den = struct.unpack_from(fmt + "II", tiff, off + 8 * k)
            parts.append(num / den if den else 0.0)
        d, m, s = parts
        return d + m / 60.0 + s / 3600.0
    except (struct.error, IndexError, ZeroDivisionError):
        return None


def _parse_tiff(tiff: bytes) -> dict:
    out: dict = {}
    if tiff[:2] == b"II":
        fmt = "<"
    elif tiff[:2] == b"MM":
        fmt = ">"
    else:
        return out
    try:
        if struct.unpack_from(fmt + "H", tiff, 2)[0] != 42:
            return out
        (ifd_off,) = struct.unpack_from(fmt + "I", tiff, 4)
        (n,) = struct.unpack_from(fmt + "H", tiff, ifd_off)
        gps_ifd = None
        for i in range(n):
            base = ifd_off + 2 + 12 * i
            tag, typ, count = struct.unpack_from(fmt + "HHI", tiff, base)
            voff = base + 8
            if tag == 0x0112 and typ == 3:
                (v,) = struct.unpack_from(fmt + "H", tiff, voff)
                if 1 <= v <= 8:
                    out["orientation"] = v
            elif tag == 0x010F and typ == 2:
                out["make"] = _read_ascii(tiff, fmt, count, voff)
            elif tag == 0x0110 and typ == 2:
                out["model"] = _read_ascii(tiff, fmt, count, voff)
            elif tag == 0x0132 and typ == 2:
                out["datetime"] = _read_ascii(tiff, fmt, count, voff)
            elif tag == 0x8825 and typ == 4:
                (gps_ifd,) = struct.unpack_from(fmt + "I", tiff, voff)
        if gps_ifd is not None:
            (gn,) = struct.unpack_from(fmt + "H", tiff, gps_ifd)
            gps: dict = {}
            for i in range(gn):
                base = gps_ifd + 2 + 12 * i
                tag, typ, count = struct.unpack_from(fmt + "HHI", tiff, base)
                voff = base + 8
                name = _GPS_TAGS.get(tag)
                if name in ("lat_ref", "lon_ref") and typ == 2:
                    gps[name] = _read_ascii(tiff, fmt, count, voff)
                elif name in ("lat", "lon") and typ == 5:
                    gps[name] = _read_rational3(tiff, fmt, voff)
            if gps.get("lat") is not None and gps.get("lon") is not None:
                lat = gps["lat"] * (-1.0 if gps.get("lat_ref") == "S" else 1.0)
                lon = gps["lon"] * (-1.0 if gps.get("lon_ref") == "W" else 1.0)
                out["gps_lat"] = lat
                out["gps_lon"] = lon
    except (struct.error, IndexError):
        pass
    return out


def _iter_segments(blob: bytes):
    """Yield (marker, seg_start, seg_end) for header segments up to
    (and excluding) SOS; fill-byte aware. seg bounds include the FF
    marker bytes."""
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            return
        start = pos
        while pos + 2 <= n and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            return
        seglen = struct.unpack_from(">H", blob, pos + 2)[0]
        end = pos + 2 + seglen
        yield marker, start, end
        pos = end


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _iter_png_chunks(blob: bytes):
    """Yield (type, chunk_start, chunk_end) over PNG chunks (bounds
    include length+type+crc)."""
    pos = 8
    n = len(blob)
    while pos + 12 <= n:
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        end = pos + 12 + length
        if end > n:
            return
        yield ctype, pos, end
        pos = end


def _iter_riff_chunks(blob: bytes):
    """Yield (fourcc, chunk_start, chunk_end incl. pad) over WebP RIFF
    chunks."""
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        end = pos + 8 + size + (size & 1)
        if pos + 8 + size > n:
            return
        yield fourcc, pos, end
        pos = end


def _fold_tiff(out: dict, tiff: bytes) -> None:
    out["has_exif"] = True
    parsed = _parse_tiff(tiff)
    for k in ("orientation", "make", "model", "datetime"):
        if parsed.get(k) is not None:
            out[k] = parsed[k]
    if "gps_lat" in parsed:
        out["has_gps"] = True
        out["gps_lat"] = parsed["gps_lat"]
        out["gps_lon"] = parsed["gps_lon"]


def parse_exif(blob: bytes) -> dict:
    """EXIF summary of one image blob — JPEG APP1, PNG ``eXIf`` chunk,
    or WebP ``EXIF`` RIFF chunk (see module docstring); all keys
    always present, ``has_exif=False`` for other data."""
    out = {
        "has_exif": False, "orientation": None, "make": None,
        "model": None, "datetime": None, "has_gps": False,
        "gps_lat": None, "gps_lon": None,
    }
    if blob.startswith(b"\xff\xd8"):
        for marker, start, end in _iter_segments(blob):
            # skip past the FF-run + marker + length
            i = start
            while blob[i + 1] == 0xFF:
                i += 1
            payload = blob[i + 4 : end]
            if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
                _fold_tiff(out, payload[6:])
    elif blob.startswith(_PNG_SIG):
        for ctype, start, end in _iter_png_chunks(blob):
            if ctype == b"eXIf":  # payload IS a TIFF body (PNG ext.)
                _fold_tiff(out, blob[start + 8 : end - 4])
    elif blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        for fourcc, start, end in _iter_riff_chunks(blob):
            if fourcc == b"EXIF":
                data = blob[start + 8 : end]
                if data[:6] == b"Exif\x00\x00":  # some writers prefix
                    data = data[6:]
                _fold_tiff(out, data)
    elif blob[:4] in (b"II*\x00", b"MM\x00*"):
        # a TIFF file IS a TIFF body: IFD0 tags read directly
        _fold_tiff(out, blob)
    return out


# metadata segments scrubbed: APP1 (Exif + XMP), APP13 (IPTC/Photoshop),
# APP2 ICC stays (color fidelity, not PII), COM comments go
_SCRUB_MARKERS = {0xE1, 0xED, 0xFE}
# PNG ancillary metadata chunks (text, EXIF, modification time)
_PNG_SCRUB = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}
# WebP metadata chunks
_RIFF_SCRUB = {b"EXIF", b"XMP "}


def _drop_spans(blob: bytes, drop: list[tuple[int, int]]) -> bytes:
    out = bytearray()
    pos = 0
    for start, end in drop:
        out += blob[pos:start]
        pos = end
    out += blob[pos:]
    return bytes(out)


def strip_exif(blob: bytes) -> bytes:
    """The same image minus metadata: JPEG APP1/APP13/COM segments,
    PNG tEXt/zTXt/iTXt/eXIf/tIME chunks, or WebP EXIF/XMP chunks (the
    RIFF size and VP8X flag bits are fixed up). The pixel data is
    byte-identical in every case. Other blobs pass through
    unchanged."""
    if blob.startswith(b"\xff\xd8"):
        drop = [
            (s, e) for m, s, e in _iter_segments(blob) if m in _SCRUB_MARKERS
        ]
        return _drop_spans(blob, drop) if drop else blob
    if blob.startswith(_PNG_SIG):
        drop = [
            (s, e) for t, s, e in _iter_png_chunks(blob) if t in _PNG_SCRUB
        ]
        return _drop_spans(blob, drop) if drop else blob
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        drop = [
            (s, e) for f, s, e in _iter_riff_chunks(blob) if f in _RIFF_SCRUB
        ]
        if not drop:
            return blob
        out = bytearray(_drop_spans(blob, drop))
        struct.pack_into("<I", out, 4, len(out) - 8)  # RIFF size
        # clear the VP8X EXIF (0x08) / XMP (0x04) flag bits
        if out[12:16] == b"VP8X" and len(out) >= 21:
            out[20] &= ~0x0C
        return bytes(out)
    return blob
