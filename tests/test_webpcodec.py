"""WebP lossless (VP8L) decoding against a test-side encoder.

The encoder here is written from the public VP8L spec INDEPENDENTLY of
the decoder's structure (tokenize → frequencies → canonical prefix
codes → bit-exact stream), covering simple + code-length-coded prefix
codes, color cache, LZ77 with both direct and 2D plane distance codes,
meta prefix groups via an entropy image, and all four transforms.
Because VP8L is lossless the expected output is the input itself —
every test is an exact round trip. A hand-assembled bitstream pins the
bit-level conventions (LSB-first reads, canonical code assignment)
without trusting the encoder."""

import heapq
import struct

import numpy as np
import pytest

from littletable_spark.functions.imagecodec import decode_pixels, sniff_format
from littletable_spark.functions.webpcodec import decode_webp

# ------------------------------------------------------------------ #
# bit writer (LSB-first, matching the spec's ReadBits)


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits are consumed MSB-of-code first."""
        for i in reversed(range(length)):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ------------------------------------------------------------------ #
# canonical prefix codes (DEFLATE convention, as the spec requires)


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths from frequencies (plain Huffman; test data never
    exceeds depth 15)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, sym, sym) for sym, f in freqs.items()]  # (freq, tie, node)
    heapq.heapify(heap)
    parent: dict = {}
    counter = 1 << 30
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        counter += 1
        parent[n1] = counter
        parent[n2] = counter
        heapq.heappush(heap, (f1 + f2, counter, counter))
    depths = {}
    for sym in freqs:
        d = 0
        n = sym
        while n in parent:
            n = parent[n]
            d += 1
        depths[sym] = d
    assert max(depths.values()) <= 15
    return depths


def _canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code, length)} canonical by (length, symbol)."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for length in lengths.values():
        bl_count[length] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for i in range(1, max_len + 1):
        code = (code + bl_count[i - 1]) << 1
        next_code[i] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


# kCodeLengthCodeOrder with 16 at position 8 (round-13 fix: both this
# encoder and the decoder had 16 appended last, agreeing with each
# other but not with libwebp — caught by the real-libwebp differential)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _write_prefix_code(bw: _BW, lengths: dict[int, int], alphabet: int) -> None:
    """Emit one prefix code. Simple storage when the ≤2 used symbols
    fit its 8-bit symbol fields; else code-length-coded storage with
    every alphabet length written literally."""
    used = sorted(lengths)
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal
    full = [lengths.get(s, 0) for s in range(alphabet)]
    cl_freqs: dict[int, int] = {}
    for v in full:
        cl_freqs[v] = cl_freqs.get(v, 0) + 1
    cl_lengths = _huff_lengths(cl_freqs)
    num_codes = max(4, max(_CL_ORDER.index(s) for s in cl_lengths) + 1)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no explicit max_symbol: all lengths follow
    if len(cl_lengths) == 1:
        return  # single-symbol code-length code: zero bits per length
    codes = _canon_codes(cl_lengths)
    for v in full:
        c, ln = codes[v]
        bw.write_code(c, ln)


# ------------------------------------------------------------------ #
# LZ77 prefix encoding (inverse of the decoder's _prefix_value)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40 + 24):
        eb = (code - 2) >> 1
        low = (2 + (code & 1)) << eb
        if low + 1 <= v <= low + (1 << eb):
            return code, v - low - 1, eb
    raise AssertionError(f"value {v} out of prefix range")


_HASH_MUL = 0x1E35A7BD


def _tokenize(
    pixels: list[int], w: int, cache_bits: int, lz77: bool, plane_codes: bool
) -> list[tuple]:
    """Greedy tokens: ('cache', idx) | ('lit', px) | ('copy', length,
    distance). Models the decoder's cache inserts exactly."""
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    toks = []
    n = len(pixels)
    pos = 0

    def insert(px: int) -> None:
        if cache is not None:
            cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px

    while pos < n:
        if lz77 and pos >= 1:
            # try dist=1 (run) and dist=w (copy row above)
            best_len, best_dist = 0, 0
            for dist in (1, w):
                if dist > pos:
                    continue
                ln = 0
                while pos + ln < n and pixels[pos + ln] == pixels[pos + ln - dist]:
                    ln += 1
                    if ln >= 4096:
                        break
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                toks.append(("copy", best_len, best_dist))
                for k in range(best_len):
                    insert(pixels[pos + k])
                pos += best_len
                continue
        px = pixels[pos]
        slot = ((_HASH_MUL * px) & 0xFFFFFFFF) >> shift if cache is not None else 0
        if cache is not None and cache[slot] == px:
            toks.append(("cache", slot))
        else:
            toks.append(("lit", px))
            insert(px)
        pos += 1
    return toks


_PLANE_INV = {}  # (dx, dy) -> plane code


def _plane_code(dist: int, w: int, use_plane: bool) -> int:
    if use_plane:
        if not _PLANE_INV:
            from littletable_spark.functions.webpcodec import _DIST_MAP

            for i, (dx, dy) in enumerate(_DIST_MAP):
                _PLANE_INV[(dx, dy)] = i + 1
        for (dx, dy), code in _PLANE_INV.items():
            if dy * w + dx == dist and dy * w + dx >= 1:
                return code
    return dist + 120


def _encode_image_data(
    bw: _BW,
    pixels: list[int],
    w: int,
    h: int,
    cache_bits: int = 0,
    lz77: bool = False,
    plane_codes: bool = False,
    meta: tuple[int, list[int]] | None = None,
    is_level0: bool = False,
) -> None:
    """Entropy-coded image: cache bit, optional meta groups (level0),
    prefix codes, pixels."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    groups_of = [0] * len(pixels)
    n_groups = 1
    hbits = 0
    if is_level0:
        if meta is not None:
            hbits, meta_img = meta
            hx = -(-w // (1 << hbits))
            bw.write(1, 1)
            bw.write(hbits - 2, 3)
            _encode_image_data(
                bw, [(0xFF << 24) | (g << 8) for g in meta_img],
                hx, -(-h // (1 << hbits)),
            )
            n_groups = max(meta_img) + 1
            for i in range(len(pixels)):
                x, y = i % w, i // w
                groups_of[i] = meta_img[(y >> hbits) * hx + (x >> hbits)]
        else:
            bw.write(0, 1)
    toks = _tokenize(pixels, w, cache_bits, lz77, plane_codes)
    # frequencies per group × 5 codes
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    freqs = [[{} for _ in range(5)] for _ in range(n_groups)]

    def bump(g: int, ci: int, sym: int) -> None:
        d = freqs[g][ci]
        d[sym] = d.get(sym, 0) + 1

    pos = 0
    for tok in toks:
        g = groups_of[pos]
        if tok[0] == "lit":
            px = tok[1]
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
            pos += 1
        elif tok[0] == "cache":
            bump(g, 0, 280 + tok[1])
            pos += 1
        else:
            _, length, dist = tok
            lp, _, _ = _prefix_encode(length)
            bump(g, 0, 256 + lp)
            dp, _, _ = _prefix_encode(_plane_code(dist, w, plane_codes))
            bump(g, 4, dp)
            pos += length
    # every code needs >=1 symbol for the decoder's table build
    alpha_sizes = (green_alpha, 256, 256, 256, 40)
    tables = []
    for g in range(n_groups):
        row = []
        for ci in range(5):
            f = freqs[g][ci] or {0: 1}
            lengths = _huff_lengths(f)
            _write_prefix_code(bw, lengths, alpha_sizes[ci])
            row.append(_canon_codes(lengths) if len(lengths) > 1 else
                       {next(iter(lengths)): (0, 0)})
        tables.append(row)
    # pixel stream
    pos = 0
    for tok in toks:
        t = tables[groups_of[pos]]
        if tok[0] == "lit":
            px = tok[1]
            for ci, sym in (
                (0, (px >> 8) & 0xFF), (1, (px >> 16) & 0xFF),
                (2, px & 0xFF), (3, (px >> 24) & 0xFF),
            ):
                c, ln = t[ci][sym]
                bw.write_code(c, ln)
            pos += 1
        elif tok[0] == "cache":
            c, ln = t[0][280 + tok[1]]
            bw.write_code(c, ln)
            pos += 1
        else:
            _, length, dist = tok
            lp, ev, ec = _prefix_encode(length)
            c, ln = t[0][256 + lp]
            bw.write_code(c, ln)
            bw.write(ev, ec)
            dp, ev, ec = _prefix_encode(_plane_code(dist, w, plane_codes))
            c, ln = t[4][dp]
            bw.write_code(c, ln)
            bw.write(ev, ec)
            pos += length


def _container(vp8l_payload: bytes, vp8x: bool = False) -> bytes:
    chunks = b""
    if vp8x:
        chunks += b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    chunks += b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def encode_vp8l(
    rgb: np.ndarray,
    *,
    cache_bits: int = 0,
    lz77: bool = False,
    plane_codes: bool = False,
    meta: tuple[int, list[int]] | None = None,
    subtract_green: bool = False,
    predictor: int | None = None,
    pred_bits: int = 2,
    color: tuple[int, int, int] | None = None,
    palette: bool = False,
    vp8x: bool = False,
) -> bytes:
    """Encode an HxWx3 uint8 array as lossless WebP (alpha = 0xFF)."""
    h, w, _ = rgb.shape
    pixels = [
        (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for r, g, b in rgb.reshape(-1, 3)
    ]
    bw = _BW()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    w_coded = w
    if palette:
        colors = list(dict.fromkeys(pixels))
        assert len(colors) <= 256
        cmap = {c: i for i, c in enumerate(colors)}
        n = len(colors)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n - 1, 8)
        # delta-coded palette, component-wise mod 256
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _encode_image_data(bw, deltas, n, 1)
        # pack indices into green
        per = 1 << width_bits
        bits = 8 >> width_bits
        w_coded = -(-w // per)
        packed = []
        for y in range(h):
            for xp in range(w_coded):
                gval = 0
                for k in range(per):
                    x = xp * per + k
                    if x < w:
                        gval |= cmap[pixels[y * w + x]] << (k * bits)
                packed.append((0xFF << 24) | (gval << 8))
        pixels = packed
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        pixels = [
            (p & 0xFF00FF00)
            | ((((p >> 16) - (p >> 8)) & 0xFF) << 16)
            | ((p - (p >> 8)) & 0xFF)
            for p in pixels
        ]
    if color is not None:
        g2r, g2b, r2b = color
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR transform
        bw.write(pred_bits - 2, 3)
        bs = 1 << pred_bits
        bw_blocks = -(-w_coded // bs)
        bh_blocks = -(-h // bs)
        elem = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _encode_image_data(bw, [elem] * (bw_blocks * bh_blocks), bw_blocks, bh_blocks)

        def delta(t, c):
            if t >= 128:
                t -= 256
            if c >= 128:
                c -= 256
            return (t * c) >> 5

        out = []
        for p in pixels:
            green = (p >> 8) & 0xFF
            red = (p >> 16) & 0xFF
            blue = p & 0xFF
            nr = (red - delta(g2r, green)) & 0xFF
            nb = (blue - delta(g2b, green) - delta(r2b, red)) & 0xFF
            out.append((p & 0xFF00FF00) | (nr << 16) | nb)
        pixels = out
    if predictor is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(pred_bits - 2, 3)
        bs = 1 << pred_bits
        bw_blocks = -(-w_coded // bs)
        bh_blocks = -(-h // bs)
        _encode_image_data(
            bw, [(0xFF << 24) | (predictor << 8)] * (bw_blocks * bh_blocks),
            bw_blocks, bh_blocks,
        )
        from littletable_spark.functions.webpcodec import _predict

        res = []
        for i, p in enumerate(pixels):
            x, y = i % w_coded, i // w_coded
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w_coded]
            else:
                pred = _predict(
                    predictor, pixels[i - 1], pixels[i - w_coded],
                    pixels[i - w_coded - 1], pixels[i - w_coded + 1],
                )
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((p >> sh) - (pred >> sh)) & 0xFF) << sh
            res.append(d)
        pixels = res
    bw.write(0, 1)  # end of transforms
    _encode_image_data(
        bw, pixels, w_coded, h, cache_bits=cache_bits, lz77=lz77,
        plane_codes=plane_codes, meta=meta, is_level0=True,
    )
    return _container(bw.tobytes(), vp8x=vp8x)


# ------------------------------------------------------------------ #
# fixtures


def _rgb(h, w, seed=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def _check(rgb: np.ndarray, **kw) -> None:
    got = decode_webp(encode_vp8l(rgb, **kw))
    np.testing.assert_array_equal(got, rgb.astype(np.float64))


# ------------------------------------------------------------------ #
# tests


def test_sniff():
    blob = encode_vp8l(_rgb(4, 4))
    assert sniff_format(blob) == "webp"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVE") == "unknown"


def test_literals_only_roundtrip():
    _check(_rgb(8, 11))


def test_single_color_simple_codes():
    img = np.full((5, 7, 3), 200, dtype=np.uint8)
    img[:, :, 1] = 13
    _check(img)


def test_vp8x_container_layout():
    _check(_rgb(6, 5), vp8x=True)


def test_color_cache():
    rng = np.random.RandomState(1)
    # few distinct colors: cache hits dominate
    img = rng.choice([0, 85, 170, 255], size=(16, 16, 3)).astype(np.uint8)
    _check(img, cache_bits=4)
    _check(img, cache_bits=11)


def test_lz77_direct_distances():
    img = np.tile(_rgb(1, 16, seed=5), (12, 1, 1))  # every row identical
    _check(img, lz77=True)
    _check(img, lz77=True, cache_bits=3)


def test_lz77_plane_codes():
    img = np.tile(_rgb(1, 16, seed=6), (12, 1, 1))
    _check(img, lz77=True, plane_codes=True)  # dist=w → plane code 1


def test_meta_prefix_groups():
    # left half red-ish, right half blue-ish → two entropy groups
    img = _rgb(16, 16, seed=7)
    img[:, :8, 0] = 255
    img[:, 8:, 2] = 255
    hbits = 3  # 8x8 blocks → 2x2 entropy image
    _check(img, meta=(hbits, [0, 1, 0, 1]))


def test_subtract_green():
    _check(_rgb(9, 9, seed=8), subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_all_predictor_modes(mode):
    _check(_rgb(13, 10, seed=mode + 20), predictor=mode, pred_bits=2)


def test_predictor_large_blocks():
    _check(_rgb(17, 23, seed=40), predictor=11, pred_bits=4)


def test_color_transform():
    _check(_rgb(12, 12, seed=9), color=(38, 220, 5))
    _check(_rgb(12, 12, seed=10), color=(255, 128, 127))


def test_stacked_transforms():
    # subtract-green read first, then predictor: inverse order matters
    _check(_rgb(11, 14, seed=11), subtract_green=True, predictor=7)
    _check(_rgb(11, 14, seed=12), subtract_green=True, color=(17, 99, 240),
           predictor=12)


def test_palette_packing():
    rng = np.random.RandomState(13)
    for n_colors, wbits in ((2, 3), (4, 2), (12, 1), (40, 0)):
        cols = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
        img = cols[rng.randint(0, n_colors, (9, 21))]
        _check(img, palette=True)


def test_palette_with_cache_and_lz77():
    cols = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    img = cols[np.random.RandomState(14).randint(0, 2, (8, 40))]
    _check(img, palette=True, lz77=True, cache_bits=2)


def test_hand_assembled_1x1_stream():
    """Bit-level pin, independent of the encoder: 1x1 red pixel with
    simple 1-symbol codes everywhere. Validates LSB-first header
    fields and zero-bit single-symbol reads."""
    bw = _BW()
    bw.write(0x2F, 8)
    bw.write(0, 14)  # w-1
    bw.write(0, 14)  # h-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    for sym in (200, 255, 7, 255, 0):  # green,red,blue,alpha,dist
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit
        bw.write(sym, 8)
    # pixel stream: zero bits (all codes single-symbol)
    got = decode_webp(_container(bw.tobytes()))
    assert got.shape == (1, 1, 3)
    assert got[0, 0].tolist() == [255.0, 200.0, 7.0]


def test_two_symbol_simple_code_canonical_order():
    """With a 2-symbol simple code the SMALLER symbol value takes code
    0 (canonical), regardless of stream order."""
    bw = _BW()
    bw.write(0x2F, 8)
    bw.write(1, 14)  # w=2
    bw.write(0, 14)  # h=1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green: simple 2-symbol, declared LARGER first (50 then 20)
    bw.write(1, 1)
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # 8-bit first
    bw.write(50, 8)
    bw.write(20, 8)
    for sym in (9, 8, 255):  # red, blue, alpha single
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    bw.write(1, 1)  # dist single
    bw.write(0, 1)
    bw.write(0, 1)  # 1-bit symbol
    bw.write(0, 1)
    # pixels: code 0 → symbol 20, code 1 → symbol 50
    bw.write_code(0, 1)
    bw.write_code(1, 1)
    got = decode_webp(_container(bw.tobytes()))
    assert got[0, 0, 1] == 20.0 and got[0, 1, 1] == 50.0


def test_random_transform_combinations_hypothesis():
    """Property: ANY image round-trips exactly through ANY encoder
    configuration (transform stack × cache × LZ77 × plane codes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        seed=st.integers(0, 10_000),
        sub_green=st.booleans(),
        pred=st.one_of(st.none(), st.integers(0, 13)),
        color=st.booleans(),
        cache=st.sampled_from([0, 2, 6]),
        lz77=st.booleans(),
        plane=st.booleans(),
        few_colors=st.booleans(),
    )
    def check(h, w, seed, sub_green, pred, color, cache, lz77, plane, few_colors):
        rng = np.random.RandomState(seed)
        if few_colors:
            cols = rng.randint(0, 256, (3, 3), dtype=np.uint8)
            img = cols[rng.randint(0, 3, (h, w))]
        else:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        kw = dict(
            subtract_green=sub_green,
            predictor=pred,
            cache_bits=cache,
            lz77=lz77,
            plane_codes=plane,
        )
        if color:
            kw["color"] = (
                int(rng.randint(0, 256)),
                int(rng.randint(0, 256)),
                int(rng.randint(0, 256)),
            )
        got = decode_webp(encode_vp8l(img, **kw))
        np.testing.assert_array_equal(got, img.astype(np.float64))

    check()


def test_rejections():
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    # a VP8 chunk now ROUTES to the lossy decoder (round 12); a
    # 4-zero-byte payload is a truncated frame, still a clean error
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(lossy)
    anim = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"ANIM" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="animated"):
        decode_webp(anim)
    good = encode_vp8l(_rgb(6, 6))
    with pytest.raises(ValueError):
        decode_webp(good[:20])
    # decode_pixels on a corrupt lossy blob → PIL fallback → ValueError
    with pytest.raises(ValueError):
        decode_pixels(lossy)


def test_decode_pixels_and_gray_pipeline():
    from littletable_spark.functions.imagecodec import decode_to_gray

    img = _rgb(10, 10, seed=15)
    blob = encode_vp8l(img, subtract_green=True, predictor=2)
    np.testing.assert_array_equal(decode_pixels(blob), img.astype(np.float64))
    g = decode_to_gray(blob, 4, 4)
    assert g.shape == (4, 4) and 0.0 <= g.min() and g.max() <= 1.0


def test_decode_image_real_path_spark(spark):
    """WebP through the Spark decode_image real path (mapInPandas)."""
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import decode_image

    img = _rgb(6, 6, seed=16)
    t = Table("blobs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "blob": encode_vp8l(img)},
            {"id": 1, "blob": b"RIFF junk not webp"},
        ]
    )
    rows = {
        r.id: r
        for r in decode_image(
            t, "blob", "id", width=3, height=3, use_fake=False, on_error="null"
        )
    }
    assert rows[0].pixels is not None and len(rows[0].pixels) == 9
    assert rows[1].pixels is None


# ------------------------------------------------------------------ #
# animated WebP (VP8X + ANIM/ANMF) — round 12


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _u24(v: int) -> bytes:
    return bytes([v & 255, (v >> 8) & 255, (v >> 16) & 255])


def _vp8l_chunk(rgb: np.ndarray) -> bytes:
    """The bare VP8L chunk of a test-side lossless encode."""
    container = encode_vp8l(rgb)
    assert container[12:16] == b"VP8L"
    (sz,) = struct.unpack_from("<I", container, 16)
    return _chunk(b"VP8L", container[20 : 20 + sz])


def _anim_webp(canvas_wh, frames, bg=(0, 0, 255, 255)) -> bytes:
    """Hand-assembled animated WebP: frames = [(x, y, rgb, dispose_bg)]."""
    cw, ch = canvas_wh
    body = _chunk(
        b"VP8X",
        bytes([0x02]) + b"\x00" * 3 + _u24(cw - 1) + _u24(ch - 1),
    )
    b_, g_, r_, a_ = bg[2], bg[1], bg[0], bg[3]
    body += _chunk(b"ANIM", bytes([b_, g_, r_, a_]) + struct.pack("<H", 0))
    for x, y, rgb, dispose in frames:
        h, w, _ = rgb.shape
        hdr = (
            _u24(x // 2) + _u24(y // 2) + _u24(w - 1) + _u24(h - 1)
            + _u24(40) + bytes([0x01 if dispose else 0x00])
        )
        body += _chunk(b"ANMF", hdr + _vp8l_chunk(rgb))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_webp_frames_composites_placement():
    from littletable_spark.functions.webpcodec import webp_frames

    base = _rgb(6, 8)  # full canvas: 6 rows, 8 cols
    patch = np.full((2, 4, 3), 200, np.uint8)
    blob = _anim_webp((8, 6), [(0, 0, base, False), (2, 2, patch, False)])
    frames = list(webp_frames(blob))
    assert [i for i, _ in frames] == [0, 1]
    np.testing.assert_array_equal(frames[0][1], base)
    expect = base.copy()
    expect[2:4, 2:6] = 200
    np.testing.assert_array_equal(frames[1][1], expect)


def test_webp_frames_dispose_to_background():
    from littletable_spark.functions.webpcodec import webp_frames

    base = _rgb(8, 8)
    patch = np.full((4, 4, 3), 9, np.uint8)
    tail = np.full((2, 2, 3), 77, np.uint8)
    blob = _anim_webp(
        (8, 8),
        [(0, 0, base, False), (4, 4, patch, True), (0, 0, tail, False)],
        bg=(10, 20, 30, 255),
    )
    frames = list(webp_frames(blob))
    # frame 2's canvas: patch rect restored to ANIM background color
    last = frames[2][1]
    np.testing.assert_array_equal(
        last[4:8, 4:8], np.broadcast_to([10, 20, 30], (4, 4, 3))
    )
    np.testing.assert_array_equal(last[0:2, 0:2], tail)


def test_webp_frames_still_image_single_frame():
    from littletable_spark.functions.webpcodec import webp_frames

    img = _rgb(5, 4)
    frames = list(webp_frames(encode_vp8l(img)))
    assert len(frames) == 1 and frames[0][0] == 0
    np.testing.assert_array_equal(frames[0][1], img)


def test_sample_webp_frames_ppm_roundtrip():
    from littletable_spark.functions.imagecodec import decode_pixels
    from littletable_spark.functions.videocodec import sample_webp_frames

    base = _rgb(6, 6)
    frames = [(0, 0, base, False)] + [
        (0, 0, np.full((6, 6, 3), 30 * k, np.uint8), False)
        for k in range(1, 6)
    ]
    blob = _anim_webp((6, 6), frames)
    out = sample_webp_frames(blob, 3)
    assert len(out) == 3
    idxs = [i for i, _ in out]
    assert idxs == sorted(idxs) and idxs[0] == 0
    px = decode_pixels(out[-1][1])
    np.testing.assert_array_equal(
        px.astype(np.uint8), np.full((6, 6, 3), 30 * idxs[-1], np.uint8)
    )


def test_frame_sample_routes_animated_webp(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import frame_sample

    base = _rgb(6, 6)
    blob = _anim_webp(
        (6, 6),
        [(0, 0, base, False), (0, 0, np.full((6, 6, 3), 50, np.uint8), False)],
    )
    t = Table("vids", spark=spark)
    t.insert_many([{"vid": 1, "blob": blob}])
    out = frame_sample(t, "blob", "vid", n_frames=2, use_fake=False)
    rows = sorted((r.vid, r.frame_idx) for r in out)
    assert rows == [(1, 0), (1, 1)]
