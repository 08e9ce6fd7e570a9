"""WebP lossless (VP8L) decoding, pure stdlib + numpy.

Implements the public WebP Lossless Bitstream Specification (the
format libwebp writes for screenshots/diagrams/UI crawl images):
RIFF container walk (plain, and VP8X extended layouts), then the VP8L
stream — LSB-first bit reading, canonical prefix codes in both
storage forms (simple 1/2-symbol and code-length-coded with 16/17/18
repeats and the optional max-symbol cut), color cache, meta prefix
codes via an entropy image, LZ77 backward references through the
120-entry distance-to-plane-code neighborhood map, and all four
transforms applied inverse-in-reverse-order:

- PREDICTOR (14 spatial predictors, per-block modes, the spec's
  flat-buffer top-right wrap on the rightmost column)
- COLOR (per-block signed 3.5 fixed-point cross-channel multipliers)
- SUBTRACT_GREEN
- COLOR_INDEXING (delta-coded palette, sub-byte index packing for
  palettes of ≤16 colors)

Lossy VP8 key frames route to vp8codec (RFC 6386 intra decode,
round 12 — differentially pinned bit-exact against the system
libwebp). Animated WebP (VP8X + ANIM/ANMF) composites through
``webp_frames`` (round 12): frame placement, dispose-to-background,
VP8L or VP8 frame payloads — the animation analogue of
imagecodec.gif_frames, feeding ``frame_sample``. Single-image
``decode_webp`` keeps rejecting animations (one image in, one grid
out). The ALPH alpha chunk decodes since round 13 (raw and
VP8L-compressed forms, all four inverse filters — container spec
§Alpha, differentially pinned byte-exact against the system
libwebp's WebPDecodeRGBA): ``decode_webp_rgba`` returns straight
RGBA for VP8X+ALPH lossy stills and VP8L alpha alike, and
``webp_frames`` honors the ANMF blend flag with real alpha
compositing. The level pre-processing flag (P=1, encoder-side level
quantization for alpha_quality<100) is informative per the spec and
accepted — the default libwebp decode path returns the quantized
plane verbatim, and so do we (round 14; differentially pinned). No
reference analog; extends the multimodal mandate like
imagecodec/audiocodec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "decode_webp_rgba", "sniff_webp", "webp_frames"]


def sniff_webp(blob: bytes) -> bool:
    return blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"


# ------------------------------------------------------------------ #
# bit reading (LSB-first within bytes, per the VP8L spec)


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def bits(self, k: int) -> int:
        if self.pos + k > self.n:
            raise ValueError("truncated VP8L stream")
        v = 0
        p = self.pos
        d = self.data
        for i in range(k):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + k
        return v

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("truncated VP8L stream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


# ------------------------------------------------------------------ #
# canonical prefix codes


class _Huff:
    """Decode table: either a single 0-bit symbol or a dict keyed by
    (code_length, code) with codes assigned canonically (shorter codes
    first, ties by symbol order — DEFLATE convention; bits are read
    MSB-of-code first)."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int]):
        used = [(length, sym) for sym, length in enumerate(lengths) if length]
        if not used:
            raise ValueError("empty VP8L prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        max_len = max(length for length, _ in used)
        if max_len > 15:
            raise ValueError("VP8L code length > 15")
        bl_count = [0] * (max_len + 1)
        for length, _ in used:
            bl_count[length] += 1
        # completeness (Kraft equality) — incomplete/oversubscribed
        # codes are invalid except the single-symbol case above
        kraft = sum(c << (max_len - i) for i, c in enumerate(bl_count) if i)
        if kraft != 1 << max_len:
            raise ValueError("invalid VP8L prefix code")
        next_code = [0] * (max_len + 1)
        code = 0
        for i in range(1, max_len + 1):
            code = (code + bl_count[i - 1]) << 1
            next_code[i] = code
        table: dict[tuple[int, int], int] = {}
        for sym, length in enumerate(lengths):
            if length:
                table[(length, next_code[length])] = sym
                next_code[length] += 1
        self.table = table
        self.max_len = max_len

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length >= self.max_len:
                raise ValueError("corrupt VP8L prefix stream")


# kCodeLengthCodeOrder: symbol 16 (repeat-previous) sits at POSITION 8,
# then 6..15 — NOT appended last. Round 13: the misplaced 16 was a
# latent shared misreading between this decoder and the test-side
# encoder (they agreed with each other, so round-11 round-trips passed)
# caught by the first REAL-libwebp differential; any stream whose
# code-length code uses symbols >= 6 misparsed before this fix.
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Huff:
    lengths = [0] * alphabet_size
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        first_8bits = br.bit()
        s0 = br.bits(8 if first_8bits else 1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.bits(8))
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
        if len(set(syms)) != len(syms):
            raise ValueError("VP8L simple-code duplicate symbol")
        for s in syms:
            lengths[s] = 1
        return _Huff(lengths)
    # normal: code lengths themselves prefix-coded
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_huff = _Huff(cl_lengths)
    if br.bit():  # explicit max symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_huff.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.bits(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _Huff(lengths)


# ------------------------------------------------------------------ #
# LZ77 prefix values and the 2D distance map

# (dx, dy) neighborhood offsets for distance codes 1..120 (spec 4.2.2)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _prefix_value(code: int, br: _Bits) -> int:
    """LZ77 length/distance prefix decoding (spec 4.2.2)."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dy * xsize + dx, 1)


# ------------------------------------------------------------------ #
# entropy-coded image (shared by the ARGB image, transform data,
# entropy image, and palette)

_HASH_MUL = 0x1E35A7BD


def _decode_image_stream(
    br: _Bits, w: int, h: int, is_level0: bool
) -> tuple[np.ndarray, list, int]:
    """Decode one VP8L image stream; returns (flat uint32 ARGB pixels
    of the ENTROPY-CODED size, transforms read (level0 only), the
    entropy-coded width — smaller than ``w`` under palette packing)."""
    transforms: list[tuple] = []
    w_coded = w
    if is_level0:
        seen: set[int] = set()
        while br.bit():
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype in (0, 1):  # PREDICTOR / COLOR
                size_bits = br.bits(3) + 2
                bw = -(-w_coded // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub, _, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub, w_coded))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2,))
            else:  # COLOR_INDEXING
                n_colors = br.bits(8) + 1
                pal, _, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are component-wise delta-coded
                comp = pal.view(np.uint8).reshape(-1, 4).astype(np.uint32)
                pal = (
                    np.cumsum(comp, axis=0, dtype=np.uint32) & 0xFF
                ).astype(np.uint8).reshape(-1).view(np.uint32).copy()
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal, w_coded))
                w_coded = -(-w_coded // (1 << width_bits))
    # color cache
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    # meta prefix codes (entropy image) — top-level only
    hbits = 0
    meta = None
    hx = 1
    n_groups = 1
    if is_level0 and br.bit():
        hbits = br.bits(3) + 2
        hx = -(-w_coded // (1 << hbits))
        hy = -(-h // (1 << hbits))
        entropy_img, _, _ = _decode_image_stream(br, hx, hy, False)
        meta = ((entropy_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    # prefix-code groups: 5 codes each
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = [
        (
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        )
        for _ in range(n_groups)
    ]
    # pixel decode
    total = w_coded * h
    pix = np.zeros(total, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    g_code, r_code, b_code, a_code, d_code = groups[0]
    pos = 0
    x = 0
    y = 0
    while pos < total:
        if meta is not None:
            gi = int(meta[(y >> hbits) * hx + (x >> hbits)])
            g_code, r_code, b_code, a_code, d_code = groups[gi]
        s = g_code.read(br)
        if s < 256:  # literal
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = px
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
            pos += 1
            x += 1
        elif s < 280:  # LZ77 backward reference
            length = _prefix_value(s - 256, br)
            dist = _plane_to_distance(_prefix_value(d_code.read(br), br), w_coded)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(pix[pos - dist])
                pix[pos] = px
                if cache is not None:
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
                pos += 1
            x = pos % w_coded
            y = pos // w_coded
            continue
        else:  # color-cache reference
            if cache is None:
                raise ValueError("VP8L cache reference without cache")
            px = cache[s - 280]
            pix[pos] = px
            pos += 1
            x += 1
        if x == w_coded:
            x = 0
            y += 1
    return pix, transforms, w_coded


# ------------------------------------------------------------------ #
# inverse transforms


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _add_pixels(a: int, b: int) -> int:
    ag = ((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00
    rb = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    return ag | rb


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(t: int, left: int, tl: int) -> int:
    tc, lc, cc = _chans(t), _chans(left), _chans(tl)
    p = sum(abs(lc[i] - cc[i]) - abs(tc[i] - cc[i]) for i in range(4))
    return t if p <= 0 else left


def _clamp_add_sub_full(left: int, t: int, tl: int) -> int:
    lc, tc, cc = _chans(left), _chans(t), _chans(tl)
    out = 0
    for i in range(4):
        v = lc[i] + tc[i] - cc[i]
        out = (out << 8) | (0 if v < 0 else 255 if v > 255 else v)
    return out


def _clamp_add_sub_half(left: int, t: int, tl: int) -> int:
    ave = _chans(_avg2(left, t))
    cc = _chans(tl)
    out = 0
    for i in range(4):
        d = ave[i] - cc[i]
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc division
        v = ave[i] + half
        out = (out << 8) | (0 if v < 0 else 255 if v > 255 else v)
    return out


def _predict(mode: int, left: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), t)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, left, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(left, t, tl)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _inv_predictor(pix: np.ndarray, w: int, h: int, size_bits: int,
                   modes: np.ndarray) -> None:
    """In-place inverse of the predictor transform. The top-right of
    the rightmost column resolves through the flat buffer to the
    leftmost (already decoded) pixel of the SAME row — normative."""
    bw = -(-w // (1 << size_bits))
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(pix[i - 1])  # left
            elif x == 0:
                pred = int(pix[i - w])  # top
            else:
                mode = int(modes[(y >> size_bits) * bw + (x >> size_bits)])
                pred = _predict(
                    (mode >> 8) & 0xFF,
                    int(pix[i - 1]),
                    int(pix[i - w]),
                    int(pix[i - w - 1]),
                    int(pix[i - w + 1]),
                )
            pix[i] = _add_pixels(int(pix[i]), pred)


def _ct_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point cross-channel multiplier (both int8)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(pix: np.ndarray, w: int, h: int, size_bits: int,
                         elems: np.ndarray) -> None:
    bw = -(-w // (1 << size_bits))
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            e = int(elems[(y >> size_bits) * bw + (x >> size_bits)])
            g2r = e & 0xFF
            g2b = (e >> 8) & 0xFF
            r2b = (e >> 16) & 0xFF
            p = int(pix[i])
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green)
            red &= 0xFF
            blue = (p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)
            blue &= 0xFF
            pix[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _inv_subtract_green(pix: np.ndarray) -> None:
    comp = pix.view(np.uint8).reshape(-1, 4)  # little-endian: B G R A
    g = comp[:, 1].astype(np.uint16)
    comp[:, 0] = ((comp[:, 0] + g) & 0xFF).astype(np.uint8)
    comp[:, 2] = ((comp[:, 2] + g) & 0xFF).astype(np.uint8)


def _inv_color_indexing(
    pix: np.ndarray, w_orig: int, h: int, width_bits: int, palette: np.ndarray
) -> np.ndarray:
    w_packed = -(-w_orig // (1 << width_bits))
    green = ((pix >> 8) & 0xFF).astype(np.uint32).reshape(h, w_packed)
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        mask = (1 << bits) - 1
        idx = np.zeros((h, w_packed * per), dtype=np.int64)
        for k in range(per):
            idx[:, k::per] = (green >> (k * bits)) & mask
        idx = idx[:, :w_orig]
    else:
        idx = green.astype(np.int64)
    # out-of-range palette indices resolve to transparent black (the
    # spec leaves them undefined; libwebp emits 0)
    safe = np.where(idx < len(palette), idx, 0)
    out = palette[safe]
    out[idx >= len(palette)] = 0
    return out.reshape(-1).astype(np.uint32)


# ------------------------------------------------------------------ #
# container + entry point


def _find_still(blob: bytes) -> tuple:
    """Walk the RIFF chunks to the still-image payload (plain or VP8X):
    returns ("VP8L"|"VP8", payload, alph_payload_or_None). The ALPH
    chunk precedes the VP8 chunk in the VP8X layout (container spec)."""
    if not sniff_webp(blob):
        raise ValueError("not a WebP")
    pos = 12
    n = len(blob)
    alph = None
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        payload = blob[pos + 8 : pos + 8 + size]
        if fourcc == b"ALPH":
            alph = payload
        elif fourcc == b"VP8L":
            return "VP8L", payload, alph
        elif fourcc == b"VP8 ":
            return "VP8", payload, alph
        elif fourcc == b"ANIM" or fourcc == b"ANMF":
            raise ValueError("animated WebP not supported")
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("no VP8/VP8L chunk in WebP")


def _find_stream(blob: bytes) -> tuple:
    """Back-compat form of ``_find_still`` without the ALPH payload."""
    kind, payload, _ = _find_still(blob)
    return kind, payload


def _find_vp8l(blob: bytes) -> bytes:
    kind, payload = _find_stream(blob)
    if kind != "VP8L":
        raise ValueError("not a lossless WebP")
    return payload


def _vp8l_pixels(data: bytes) -> np.ndarray:
    """Decode a full VP8L bitstream (with signature + size header) to
    an HxWx4 uint8 array in B,G,R,A channel order."""
    br = _Bits(data)
    if br.bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-is-used hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    pix = _vp8l_image(br, w, h)
    return pix.view(np.uint8).reshape(h, w, 4)  # little-endian B G R A


def _vp8l_image(br: _Bits, w: int, h: int) -> np.ndarray:
    """Entropy-decode + inverse-transform one level-0 VP8L image
    stream already positioned past any headers: flat uint32 ARGB."""
    pix, transforms, w_coded = _decode_image_stream(br, w, h, True)
    # inverse transforms, reverse order of appearance
    for tr in reversed(transforms):
        if tr[0] == 3:
            _, width_bits, palette, w_before = tr
            pix = _inv_color_indexing(pix, w_before, h, width_bits, palette)
            w_coded = w_before
        elif tr[0] == 2:
            _inv_subtract_green(pix)
        elif tr[0] == 0:
            _inv_predictor(pix, w_coded, h, tr[1], tr[2])
        else:
            _inv_color_transform(pix, w_coded, h, tr[1], tr[2])
    if w_coded != w:
        raise ValueError("VP8L stream width mismatch")
    return pix


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Inverse of the ALPH chunk's per-row filtering (container spec
    §Alpha; semantics match libwebp's {Horizontal,Vertical,Gradient}
    Unfilter: row 0 always unfilters horizontally with predictor 0)."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = plane.astype(np.int64)
    # row 0: horizontal with initial predictor 0 (cumulative sum)
    out[0] = np.cumsum(out[0]) & 0xFF
    if method == 1:  # HORIZONTAL: pred = left; first col pred = above[0]
        for y in range(1, h):
            out[y, 0] = (out[y, 0] + out[y - 1, 0]) & 0xFF
            out[y] = np.cumsum(out[y]) & 0xFF
    elif method == 2:  # VERTICAL: pred = above (vectorizes per row)
        for y in range(1, h):
            out[y] = (out[y] + out[y - 1]) & 0xFF
    else:  # GRADIENT: pred = clip(left + above - above_left)
        for y in range(1, h):
            prev = out[y - 1]
            left = int(prev[0])
            tl = left
            row = out[y]
            for x in range(w):
                t = int(prev[x])
                g = left + t - tl
                left = (int(row[x]) + (0 if g < 0 else 255 if g > 255 else g)) & 0xFF
                row[x] = left
                tl = t
    return out.astype(np.uint8)


def _decode_alpha(payload: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk to the (h, w) uint8 alpha plane.

    Header byte (container spec): bits 0-1 compression (0 = raw,
    1 = VP8L), bits 2-3 filtering, bits 4-5 pre-processing. The VP8L
    form is a HEADERLESS level-0 image stream of implicit dimensions
    w x h whose GREEN channel carries the alpha values.

    Pre-processing (P=1, emitted when the encoder quantized alpha
    levels for alpha_quality < 100) is INFORMATIVE per the container
    spec: "Decoders are not required to use this information in any
    specified way." libwebp's default decode path (WebPDecodeRGBA,
    alpha_dithering_strength = 0) returns the quantized plane verbatim
    and only its optional dithering mode consumes the flag — so for
    byte-exactness the flag is accepted and the plane decodes
    normally (pinned by the libwebp differential on hand-assembled
    P=1 containers, test_webp_alpha.py)."""
    if not payload:
        raise ValueError("empty ALPH chunk")
    hdr = payload[0]
    comp = hdr & 3
    filt = (hdr >> 2) & 3
    if comp > 1:
        raise ValueError(f"bad ALPH compression method {comp}")
    if comp == 0:
        if len(payload) < 1 + w * h:
            raise ValueError("truncated raw ALPH chunk")
        plane = np.frombuffer(
            payload, dtype=np.uint8, count=w * h, offset=1
        ).reshape(h, w)
    else:
        pix = _vp8l_image(_Bits(payload[1:]), w, h)
        plane = ((pix >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    return _unfilter_alpha(plane, filt)


def decode_webp(blob: bytes) -> np.ndarray:
    """Decode a WebP blob to an HxWx3 float64 RGB array in 0..255
    (alpha dropped, like the PNG path — ``decode_webp_rgba`` keeps
    it). Lossless (VP8L) decodes here; lossy (VP8 key frame) routes
    to vp8codec — bit-exact YUV reconstruction, JPEG-style BT.601 RGB
    conversion."""
    kind, data = _find_stream(blob)
    if kind == "VP8":
        from .vp8codec import decode_vp8

        return decode_vp8(data)
    comp = _vp8l_pixels(data)
    return comp[:, :, [2, 1, 0]].astype(np.float64)


def decode_webp_rgba(blob: bytes) -> np.ndarray:
    """Decode a WebP still to HxWx4 float64 RGBA in 0..255 (straight,
    non-premultiplied — byte-exact vs libwebp's WebPDecodeRGBA).
    Lossless alpha comes from the VP8L A channel; lossy alpha decodes
    the VP8X layout's ALPH chunk (raw and VP8L-compressed forms, all
    four inverse filters); a lossy still with no ALPH is opaque."""
    kind, data, alph = _find_still(blob)
    if kind == "VP8L":
        comp = _vp8l_pixels(data)
        return comp[:, :, [2, 1, 0, 3]].astype(np.float64)
    from .vp8codec import decode_vp8

    rgb = decode_vp8(data)
    h, w = rgb.shape[:2]
    if alph is None:
        a = np.full((h, w), 255.0)
    else:
        a = _decode_alpha(alph, w, h).astype(np.float64)
    return np.dstack([rgb, a])


# ------------------------------------------------------------------ #
# animated WebP (public container spec: VP8X + ANIM/ANMF chunks)


def webp_frames(blob: bytes):
    """Composited RGB frames of a (possibly animated) WebP: yields
    ``(frame_index, HxWx3 uint8 canvas)`` — each a COPY of the canvas
    after drawing that frame, honoring the VP8X canvas size, ANMF
    frame placement offsets, and the dispose-to-background flag.
    Frame pixel data decodes through the builtin VP8L (lossless) or
    VP8 (lossy key-frame) decoders. A non-animated WebP yields its
    single image as frame 0.

    Alpha-aware since round 13: VP8L frame alpha and lossy frames'
    ALPH subchunks both decode, and the ANMF blend flag is honored —
    blend-method 0 alpha-composites the frame over the canvas
    (canvas is opaque, so ``out = (src*a + dst*(255-a) + 127) // 255``
    per channel, round-half-up), blend-method 1 overwrites the rect.
    Dispose-to-background still rect-fills with the ANIM background.
    """
    if not sniff_webp(blob):
        raise ValueError("not a WebP")

    def u24(off: int) -> int:
        return blob[off] | (blob[off + 1] << 8) | (blob[off + 2] << 16)

    pos = 12
    n = len(blob)
    canvas = None
    bg = np.array([255, 255, 255], dtype=np.uint8)
    findex = 0
    saw_frame = False
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body_at = pos + 8
        if fourcc == b"VP8X":
            cw = u24(body_at + 4) + 1
            ch = u24(body_at + 7) + 1
            canvas = np.broadcast_to(bg, (ch, cw, 3)).astype(np.uint8).copy()
        elif fourcc == b"ANIM":
            # background color is BGRA
            b_, g_, r_ = blob[body_at], blob[body_at + 1], blob[body_at + 2]
            bg = np.array([r_, g_, b_], dtype=np.uint8)
            if canvas is not None:
                canvas[:] = bg
        elif fourcc == b"ANMF":
            fx = u24(body_at) * 2
            fy = u24(body_at + 3) * 2
            dispose_bg = bool(blob[body_at + 15] & 0x01)
            no_blend = bool(blob[body_at + 15] & 0x02)
            # subchunks after the 16-byte ANMF header
            sub = body_at + 16
            end = body_at + size
            rgb = None
            alpha = None
            alph_payload = None
            while sub + 8 <= end:
                sc = blob[sub : sub + 4]
                (ssz,) = struct.unpack_from("<I", blob, sub + 4)
                if sc == b"ALPH":
                    alph_payload = blob[sub + 8 : sub + 8 + ssz]
                elif sc == b"VP8L":
                    comp = _vp8l_pixels(blob[sub + 8 : sub + 8 + ssz])
                    rgb = comp[:, :, [2, 1, 0]].astype(np.float64)
                    alpha = comp[:, :, 3]
                elif sc == b"VP8 ":
                    from .vp8codec import decode_vp8

                    rgb = decode_vp8(blob[sub + 8 : sub + 8 + ssz])
                sub += 8 + ssz + (ssz & 1)
            if rgb is None:
                raise ValueError("ANMF frame without VP8/VP8L data")
            frame = rgb.astype(np.uint8)
            if alph_payload is not None and alpha is None:
                alpha = _decode_alpha(
                    alph_payload, frame.shape[1], frame.shape[0]
                )
            if canvas is None:
                # no VP8X: canvas starts as the ANIM background color
                # (container spec) and frame 1 composites like any
                # other — a partially-transparent first frame must show
                # background, not its own RGB, through its alpha
                fy = fx = 0
                canvas = (
                    np.broadcast_to(bg, frame.shape).astype(np.uint8).copy()
                )
            fh = min(frame.shape[0], canvas.shape[0] - fy)
            fw = min(frame.shape[1], canvas.shape[1] - fx)
            if no_blend or alpha is None:
                canvas[fy : fy + fh, fx : fx + fw] = frame[:fh, :fw]
            else:
                a = alpha[:fh, :fw].astype(np.uint32)[..., None]
                src = frame[:fh, :fw].astype(np.uint32)
                dst = canvas[fy : fy + fh, fx : fx + fw].astype(np.uint32)
                canvas[fy : fy + fh, fx : fx + fw] = (
                    (src * a + dst * (255 - a) + 127) // 255
                ).astype(np.uint8)
            yield findex, canvas.copy()
            findex += 1
            saw_frame = True
            if dispose_bg:
                canvas[fy : fy + fh, fx : fx + fw] = bg
        elif fourcc in (b"VP8L", b"VP8 ") and not saw_frame:
            rgb = decode_webp(blob)
            yield 0, rgb.astype(np.uint8)
            return
        pos += 8 + size + (size & 1)
    if not saw_frame:
        raise ValueError("no image frames in WebP")
