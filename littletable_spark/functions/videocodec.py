"""Pure-stdlib AVI (RIFF) container parsing for video frame sampling.

``frame_sample``'s production contract is one blob row in, n frame
rows out, each frame an opaque ``binary`` — so for MJPEG-style AVI
(every frame an independently-coded image, the common crawl/archive
shape) the CONTAINER walk is the whole job: find the ``movi`` LIST,
collect the ``##dc``/``##db`` video chunks, pick n evenly spaced ones.
No codec is required to sample frames; decoding the sampled JPEG/raw
frames is a separate step (PIL/ffmpeg, or ``imagecodec`` for the
formats it covers). Inter-coded codecs (H.264 etc.) need a real
demuxer+decoder and stay behind ffmpeg.

AVI RIFF layout is public (Microsoft "AVI RIFF File Reference").
Stdlib + nothing else; runs per-blob inside Arrow batches.
"""

from __future__ import annotations

import struct

__all__ = [
    "avi_video_frames",
    "avi_info",
    "sample_avi_frames",
    "sample_gif_frames",
    "sample_webp_frames",
]


def avi_info(blob: bytes) -> dict:
    """Header-only AVI metadata: dims / frame count / duration from
    the ``hdrl`` LIST's ``avih`` MainAVIHeader (dwMicroSecPerFrame at
    0, dwTotalFrames at 16, dwWidth/dwHeight at 32/36) and the video
    codec fourcc from the first ``strl`` whose ``strh`` is a ``vids``
    stream — no frame payload is touched. Raises ValueError on
    non-AVI data."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI blob")
    out: dict = {}

    def scan(pos: int, end: int) -> None:
        for cid, body, size in _walk_chunks(blob, pos, end):
            if cid == b"LIST":
                scan(body + 4, body + size)
            elif cid == b"avih" and size >= 40 and "width" not in out:
                us_frame, total = struct.unpack_from("<I12xI", blob, body)
                w, h = struct.unpack_from("<II", blob, body + 32)
                out["width"], out["height"] = w, h
                out["n_frames"] = total
                out["n_tracks"] = struct.unpack_from("<I", blob, body + 24)[0]
                out["duration_s"] = (
                    total * us_frame / 1_000_000 if us_frame else None
                )
            elif cid == b"strh" and size >= 12 and "codec" not in out:
                if blob[body : body + 4] == b"vids":
                    out["codec"] = (
                        blob[body + 4 : body + 8].decode("latin-1").strip()
                        or None
                    )

    scan(12, len(blob))
    if "width" not in out:
        raise ValueError("AVI missing avih header")
    return out


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for a RIFF chunk run."""
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", buf, pos)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks pad to even offsets


def avi_video_frames(blob: bytes) -> list[bytes]:
    """All video frame payloads of an AVI blob, in stream order.

    Frames are the ``##dc`` (compressed) / ``##db`` (uncompressed)
    chunks inside the ``movi`` LIST, including inside ``rec `` sub-
    lists. Raises ValueError for non-AVI input.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI blob")
    frames: list[bytes] = []

    def scan_list(pos: int, end: int) -> None:
        for cid, body, size in _walk_chunks(blob, pos, end):
            if cid == b"LIST":
                ltype = blob[body : body + 4]
                if ltype in (b"movi", b"rec "):
                    scan_list(body + 4, body + size)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(bytes(blob[body : body + size]))

    scan_list(12, len(blob))
    if not frames:
        raise ValueError("AVI has no video frame chunks (##dc/##db)")
    return frames


def sample_avi_frames(blob: bytes, n_frames: int) -> list[tuple[int, bytes]]:
    """n evenly spaced (frame_index, frame_bytes) samples — fewer when
    the clip has fewer frames than requested (every frame, once)."""
    frames = avi_video_frames(blob)
    total = len(frames)
    if total <= n_frames:
        return list(enumerate(frames))
    idxs = sorted({(i * total) // n_frames for i in range(n_frames)})
    return [(i, frames[i]) for i in idxs]


def sample_gif_frames(blob: bytes, n_frames: int) -> list[tuple[int, bytes]]:
    """n evenly spaced (frame_index, frame_bytes) samples from an
    animated GIF — the animation analogue of ``sample_avi_frames``.
    Frames are COMPOSITED on the logical screen (placement offsets,
    transparency, disposal methods — ``imagecodec.gif_frames``) and
    emitted as P6 PPM bytes, so downstream ``decode_image`` reads them
    with the same builtin codecs as any other blob. Every frame must
    be composited regardless of sampling (later frames depend on
    earlier canvases); only the selected canvases are serialized."""
    from .imagecodec import gif_frames

    # structural pre-scan for the frame count (descriptor walk only —
    # no LZW work), so sampling indices are known up front
    total = 0
    pos = 13
    if blob[10] & 0x80:
        pos += (2 << (blob[10] & 0x07)) * 3
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x21:
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:
            total += 1
            pos += 10
            ipacked = blob[pos - 1]
            if ipacked & 0x80:
                pos += (2 << (ipacked & 0x07)) * 3
            pos += 1  # min code size
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        else:
            break
    if total == 0:
        raise ValueError("GIF has no image frame")
    want = (
        set(range(total))
        if total <= n_frames
        else {(i * total) // n_frames for i in range(n_frames)}
    )
    out = []
    for idx, canvas in gif_frames(blob):
        if idx in want:
            h, w = canvas.shape[:2]
            out.append(
                (idx, b"P6\n%d %d\n255\n" % (w, h) + canvas.tobytes())
            )
        if idx >= max(want):
            break
    return out


def sample_webp_frames(blob: bytes, n_frames: int) -> list[tuple[int, bytes]]:
    """n evenly spaced (frame_index, frame_bytes) samples from an
    animated WebP — the same contract as ``sample_gif_frames``:
    frames are composited on the VP8X canvas (placement offsets,
    dispose-to-background; ``webpcodec.webp_frames``) and emitted as
    P6 PPM bytes, natively decodable downstream. Every frame must be
    composited regardless of sampling (later frames depend on earlier
    canvases); only the selected canvases are serialized."""
    import struct as _struct

    from .webpcodec import sniff_webp, webp_frames

    if not sniff_webp(blob):
        raise ValueError("not a WebP")
    # structural pre-scan: count ANMF chunks so sampling indices are
    # known before any pixel work
    total = 0
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", blob, pos + 4)
        if fourcc == b"ANMF":
            total += 1
        pos += 8 + size + (size & 1)
    if total == 0:
        total = 1  # plain still: webp_frames yields it as frame 0
    want = (
        set(range(total))
        if total <= n_frames
        else {(i * total) // n_frames for i in range(n_frames)}
    )
    out = []
    for idx, canvas in webp_frames(blob):
        if idx in want:
            h, w = canvas.shape[:2]
            out.append(
                (idx, b"P6\n%d %d\n255\n" % (w, h) + canvas.tobytes())
            )
        if idx >= max(want):
            break
    return out
