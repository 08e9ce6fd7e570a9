"""VP8 key-frame (lossy WebP) decoding, pure stdlib + numpy.

Implements the intra-frame half of RFC 6386 — the only half a WebP
still image ever uses (every VP8 chunk in a WebP still is a key
frame): boolean arithmetic decoder (§7), key-frame headers (§9)
including segmentation, loop-filter parameters, token partitions and
quantizer indices, intra prediction modes with the key-frame trees
and contexts (§11), DCT/WHT coefficient decoding through the token
tree with the default/updated probability tables (§13), dequant
(§14.1), the exact integer inverse WHT/DCT (§14.3-14.4), intra
reconstruction for 16x16, chroma 8x8 and the ten 4x4 B-modes (§12),
and the in-loop deblocking filter, both normal and simple, with
per-segment/per-mode level adjustments (§15).

Output is the bit-exact YUV 4:2:0 reconstruction — the test suite
pins every plane byte-for-byte against the system libwebp
(``WebPDecodeYUV``) across sizes, qualities and filter settings
where the shared library is present. The RGB conversion used for the
``decode_webp`` image path is the JPEG-style full-range BT.601 with
nearest chroma upsampling — deterministic and documented, but
deliberately NOT libwebp's fancy upsampler (hashes/features downstream
need stability, not its exact RGB rendition).

Static probability/quantizer tables live in vp8tables.py (normative
RFC 6386 content). This module decodes SINGLE key frames; animated
WebP composites through webpcodec.webp_frames (which calls back in
here per ANMF frame), and the ALPH alpha channel stays out of scope
(documented boundary — frames render opaque). No reference analog;
extends the multimodal mandate like imagecodec/webpcodec.
"""

from __future__ import annotations

import struct

import numpy as np

from .vp8tables import (
    AC_QLOOKUP,
    COEFF_DEFAULT_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

__all__ = ["decode_vp8", "decode_vp8_yuv", "sniff_vp8"]


def sniff_vp8(blob: bytes) -> bool:
    return len(blob) >= 6 and blob[3:6] == b"\x9d\x01\x2a" and not blob[0] & 1


# ------------------------------------------------------------------ #
# boolean arithmetic decoder (RFC 6386 §7)


class _Bool:
    __slots__ = ("data", "pos", "n", "range", "value", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data)
        self.range = 255
        self.value = (self._byte() << 8) | self._byte()
        self.bit_count = 0

    def _byte(self) -> int:
        # past-the-end reads return 0: the spec allows the decoder to
        # consume up to a byte of virtual trailing zeros
        if self.pos < self.n:
            b = self.data[self.pos]
        else:
            b = 0
        self.pos += 1
        return b

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._byte()
        return ret

    def bit(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def flagged_delta(self, n: int) -> int:
        """An optional signed n-bit value: flag, then magnitude+sign."""
        return self.signed_literal(n) if self.get(128) else 0

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


# ------------------------------------------------------------------ #
# trees and small constant tables (RFC 6386 §11, §13)

# 16x16 / chroma prediction modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)

# 4x4 intra submodes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
    -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
#: implied subblock modes for whole-MB prediction (context for
#: neighbors' B-mode decoding, §11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

#: KF_BMODE_PROBS ships in the widely-used implementation enum order
#: (…HE, RD, VR, LD, VL…); this module uses RFC 6386's declaration
#: order (…HE, LD, RD, VR, VL…). The 9 node probabilities inside each
#: entry are tree-node-ordered (format-defined, order-independent);
#: only the [above][left] OUTER indices need permuting.
_RFC_TO_IMPL = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
_KF_BMODE_PROBS = tuple(
    tuple(KF_BMODE_PROBS[_RFC_TO_IMPL[a]][_RFC_TO_IMPL[l]] for l in range(10))
    for a in range(10)
)

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# token tree (§13.2); leaves: 0..4 literal values, 5..10 categories
_CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6 = 5, 6, 7, 8, 9, 10
# RFC coeff tree: indexes are node pairs; leaf -> -value_id (EOB = 11)
_COEFF_TREE = (
    -11, 2,          # EOB
    -0, 4,           # DCT_0
    -1, 6,           # DCT_1
    8, 12,
    -2, 10,          # DCT_2
    -3, -4,          # DCT_3, DCT_4
    14, 16,
    -_CAT1, -_CAT2,
    18, 20,
    -_CAT3, -_CAT4,
    -_CAT5, -_CAT6,
)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


def _clamp(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


# ------------------------------------------------------------------ #
# inverse transforms (§14.3, §14.4) — exact integer arithmetic


def _iwht4x4(c: list) -> list:
    out = [0] * 16
    t = [0] * 16
    for i in range(4):
        a1 = c[i] + c[12 + i]
        b1 = c[4 + i] + c[8 + i]
        c1 = c[4 + i] - c[8 + i]
        d1 = c[i] - c[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(c: list) -> np.ndarray:
    """§14.4: 20091/35468 fixed-point inverse DCT; returns 4x4 int."""
    t = [0] * 16
    for i in range(4):
        a1 = c[i] + c[8 + i]
        b1 = c[i] - c[8 + i]
        t1 = (c[4 + i] * 35468) >> 16
        t2 = c[12 + i] + ((c[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = c[4 + i] + ((c[4 + i] * 20091) >> 16)
        t2 = (c[12 + i] * 35468) >> 16
        d1 = t1 + t2
        t[i] = a1 + d1
        t[12 + i] = a1 - d1
        t[4 + i] = b1 + c1
        t[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 2]
        b1 = t[r] - t[r + 2]
        t1 = (t[r + 1] * 35468) >> 16
        t2 = t[r + 3] + ((t[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = t[r + 1] + ((t[r + 1] * 20091) >> 16)
        t2 = (t[r + 3] * 35468) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# ------------------------------------------------------------------ #
# header state


class _Frame:
    pass


def _parse_headers(data: bytes) -> _Frame:
    f = _Frame()
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe: WebP stills are key frames only")
    f.show_frame = (tag >> 4) & 1
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    (w16,) = struct.unpack_from("<H", data, 6)
    (h16,) = struct.unpack_from("<H", data, 8)
    f.width = w16 & 0x3FFF
    f.height = h16 & 0x3FFF
    if not f.width or not f.height:
        raise ValueError("bad VP8 dimensions")
    if 10 + part0_size > len(data):
        raise ValueError("truncated VP8 partition 0")
    bd = _Bool(data[10 : 10 + part0_size])
    f.bd = bd
    bd.literal(1)  # color space (must be 0 for the defined YUV)
    bd.literal(1)  # clamping type hint

    # segmentation (§9.3)
    f.seg_enabled = bd.literal(1)
    f.seg_update_map = 0
    f.seg_probs = [255, 255, 255]
    f.seg_abs = 0
    f.seg_quant = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    if f.seg_enabled:
        f.seg_update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            f.seg_abs = bd.literal(1)
            for i in range(4):
                f.seg_quant[i] = bd.flagged_delta(7)
            for i in range(4):
                f.seg_lf[i] = bd.flagged_delta(6)
        if f.seg_update_map:
            for i in range(3):
                f.seg_probs[i] = bd.literal(8) if bd.literal(1) else 255

    # loop filter (§9.4)
    f.filter_type = bd.literal(1)  # 1 = simple
    f.filter_level = bd.literal(6)
    f.sharpness = bd.literal(3)
    f.lf_delta_enabled = bd.literal(1)
    f.ref_lf_delta = [0, 0, 0, 0]
    f.mode_lf_delta = [0, 0, 0, 0]
    if f.lf_delta_enabled:
        if bd.literal(1):  # deltas updated this frame
            for i in range(4):
                f.ref_lf_delta[i] = bd.flagged_delta(6)
            for i in range(4):
                f.mode_lf_delta[i] = bd.flagged_delta(6)

    # token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    body = data[10 + part0_size :]
    sizes = []
    off = 3 * (n_parts - 1)
    if len(body) < off:
        raise ValueError("truncated VP8 partition table")
    for i in range(n_parts - 1):
        sizes.append(body[3 * i] | (body[3 * i + 1] << 8) | (body[3 * i + 2] << 16))
    pos = off
    f.parts = []
    for i, s in enumerate(sizes):
        if pos + s > len(body):
            raise ValueError("truncated VP8 token partition")
        f.parts.append(_Bool(body[pos : pos + s]))
        pos += s
    f.parts.append(_Bool(body[pos:]))

    # quantizers (§9.6)
    f.y_ac_qi = bd.literal(7)
    f.y_dc_delta = bd.flagged_delta(4)
    f.y2_dc_delta = bd.flagged_delta(4)
    f.y2_ac_delta = bd.flagged_delta(4)
    f.uv_dc_delta = bd.flagged_delta(4)
    f.uv_ac_delta = bd.flagged_delta(4)

    bd.literal(1)  # refresh entropy probs (irrelevant for stills)

    # token probability updates (§13.4)
    probs = [
        [[list(COEFF_DEFAULT_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for p in range(11):
                    if bd.get(upd[p]):
                        row[p] = bd.literal(8)
    f.coeff_probs = probs

    f.mb_no_skip = bd.literal(1)
    f.prob_skip_false = bd.literal(8) if f.mb_no_skip else 0
    return f


def _dequant_factors(f: _Frame) -> list:
    """Per-segment (y1dc,y1ac,y2dc,y2ac,uvdc,uvac) — §9.6/§14.1."""
    out = []
    for s in range(4):
        if f.seg_enabled:
            q = f.seg_quant[s] if f.seg_abs else f.y_ac_qi + f.seg_quant[s]
        else:
            q = f.y_ac_qi
        q = _clamp(q, 0, 127)

        def dc(i):
            return DC_QLOOKUP[_clamp(i, 0, 127)]

        def ac(i):
            return AC_QLOOKUP[_clamp(i, 0, 127)]

        y1dc = dc(q + f.y_dc_delta)
        y1ac = ac(q)
        y2dc = dc(q + f.y2_dc_delta) * 2
        y2ac = ac(q + f.y2_ac_delta) * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = dc(q + f.uv_dc_delta)
        if uvdc > 132:
            uvdc = 132
        uvac = ac(q + f.uv_ac_delta)
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# ------------------------------------------------------------------ #
# coefficient decoding (§13)


def _decode_block(bd: _Bool, probs, first: int, ctx: int, dqf) -> tuple:
    """Decode one 4x4 coefficient block. Returns (coeffs list in
    raster order, ended-at position)."""
    coeffs = [0] * 16
    i = first
    start = 0  # tree start: 2 skips EOB after a zero token
    while i < 16:
        band_probs = probs[_COEFF_BANDS[i]][ctx]
        tok = bd.tree(_COEFF_TREE, band_probs, start)
        if tok == 11:  # EOB
            break
        if tok == 0:
            ctx = 0
            start = 2
            i += 1
            continue
        if tok <= 4:
            v = tok
        else:
            cat = tok - 5
            v = 0
            for p in _CAT_PROBS[cat]:
                v = (v << 1) | bd.get(p)
            v += _CAT_BASE[cat]
        ctx = 2 if v > 1 else 1
        if bd.bit():
            v = -v
        coeffs[_ZIGZAG[i]] = v * (dqf[0] if i == 0 else dqf[1])
        start = 0
        i += 1
    return coeffs, i


# ------------------------------------------------------------------ #
# intra prediction (§12). All predictors work on int32 numpy views.


def _pred16_or_8(mode: int, above, left, tl, size: int, have_a: bool, have_l: bool):
    if mode == DC_PRED:
        if have_a and have_l:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                (size.bit_length() - 1) + 1
            )
        elif have_a:
            dc = (int(above.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        elif have_l:
            dc = (int(left.sum()) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.repeat(above[np.newaxis, :], size, axis=0).astype(np.int32)
    if mode == H_PRED:
        return np.repeat(left[:, np.newaxis], size, axis=1).astype(np.int32)
    # TM_PRED
    p = left[:, np.newaxis].astype(np.int32) + above[np.newaxis, :] - int(tl)
    return np.clip(p, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2p(a, b):
    return (a + b + 1) >> 1


def _pred4(mode: int, a, l, tl):
    """4x4 B-mode predictors (§12.3). ``a`` is the 8 above pixels
    (above row + above-right), ``l`` the 4 left, ``tl`` the corner."""
    o = np.empty((4, 4), dtype=np.int32)
    A = [int(x) for x in a]
    L = [int(x) for x in l]
    tl = int(tl)
    if mode == B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        o[:] = dc
    elif mode == B_TM:
        p = np.array(L, dtype=np.int32)[:, None] + np.array(A[:4], dtype=np.int32)[None, :] - tl
        o[:] = np.clip(p, 0, 255)
    elif mode == B_VE:
        row = [
            _avg3(tl, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        o[:] = np.array(row, dtype=np.int32)
    elif mode == B_HE:
        col = [
            _avg3(tl, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        o[:] = np.array(col, dtype=np.int32)[:, None]
    elif mode == B_LD:
        d = [
            _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]), _avg3(A[3], A[4], A[5]),
            _avg3(A[4], A[5], A[6]), _avg3(A[5], A[6], A[7]),
            _avg3(A[6], A[7], A[7]),
        ]
        for r in range(4):
            for c_ in range(4):
                o[r, c_] = d[r + c_]
    elif mode == B_RD:
        e = [
            _avg3(L[3], L[2], L[1]), _avg3(L[2], L[1], L[0]),
            _avg3(L[1], L[0], tl), _avg3(L[0], tl, A[0]),
            _avg3(tl, A[0], A[1]), _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
        ]
        for r in range(4):
            for c_ in range(4):
                o[r, c_] = e[c_ - r + 3]
    elif mode == B_VR:
        o[0, 0] = o[2, 0] = _avg2p(tl, A[0])
        o[0, 1] = o[2, 1] = _avg2p(A[0], A[1])
        o[0, 2] = o[2, 2] = _avg2p(A[1], A[2])
        o[0, 3] = o[2, 3] = _avg2p(A[2], A[3])
        o[1, 0] = o[3, 0] = _avg3(L[0], tl, A[0])
        o[1, 1] = o[3, 1] = _avg3(tl, A[0], A[1])
        o[1, 2] = o[3, 2] = _avg3(A[0], A[1], A[2])
        o[1, 3] = o[3, 3] = _avg3(A[1], A[2], A[3])
        o[2, 0] = _avg3(tl, L[0], L[1])
        o[3, 0] = _avg3(L[0], L[1], L[2])
        o[2, 1:] = o[0, :3]
        o[3, 1:] = o[1, :3]
    elif mode == B_VL:
        o[0, 0] = _avg2p(A[0], A[1])
        o[0, 1] = o[2, 0] = _avg2p(A[1], A[2])
        o[0, 2] = o[2, 1] = _avg2p(A[2], A[3])
        o[0, 3] = o[2, 2] = _avg2p(A[3], A[4])
        o[1, 0] = _avg3(A[0], A[1], A[2])
        o[1, 1] = o[3, 0] = _avg3(A[1], A[2], A[3])
        o[1, 2] = o[3, 1] = _avg3(A[2], A[3], A[4])
        o[1, 3] = o[3, 2] = _avg3(A[3], A[4], A[5])
        o[2, 3] = _avg3(A[4], A[5], A[6])
        o[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        o[0, 0] = _avg2p(tl, L[0])
        o[0, 1] = _avg3(L[0], tl, A[0])
        o[0, 2] = _avg3(tl, A[0], A[1])
        o[0, 3] = _avg3(A[0], A[1], A[2])
        o[1, 0] = _avg2p(L[0], L[1])
        o[1, 1] = _avg3(tl, L[0], L[1])
        o[1, 2] = o[0, 0]
        o[1, 3] = o[0, 1]
        o[2, 0] = _avg2p(L[1], L[2])
        o[2, 1] = _avg3(L[0], L[1], L[2])
        o[2, 2] = o[1, 0]
        o[2, 3] = o[1, 1]
        o[3, 0] = _avg2p(L[2], L[3])
        o[3, 1] = _avg3(L[1], L[2], L[3])
        o[3, 2] = o[2, 0]
        o[3, 3] = o[2, 1]
    elif mode == B_HU:
        o[0, 0] = _avg2p(L[0], L[1])
        o[0, 1] = _avg3(L[0], L[1], L[2])
        o[0, 2] = _avg2p(L[1], L[2])
        o[0, 3] = _avg3(L[1], L[2], L[3])
        o[1, 0] = o[0, 2]
        o[1, 1] = o[0, 3]
        o[1, 2] = _avg2p(L[2], L[3])
        o[1, 3] = _avg3(L[2], L[3], L[3])
        o[2, 0] = o[1, 2]
        o[2, 1] = o[1, 3]
        o[2, 2] = o[2, 3] = L[3]
        o[3, :] = L[3]
    else:
        raise ValueError(f"bad B mode {mode}")
    return o


# ------------------------------------------------------------------ #
# loop filter (§15) — vectorized per edge line


def _nf_mask(p3, p2, p1, p0, q0, q1, q2, q3, ilim, elim):
    m = (
        (np.abs(p3 - p2) <= ilim)
        & (np.abs(p2 - p1) <= ilim)
        & (np.abs(p1 - p0) <= ilim)
        & (np.abs(q1 - q0) <= ilim)
        & (np.abs(q2 - q1) <= ilim)
        & (np.abs(q3 - q2) <= ilim)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elim)
    )
    return m


def _sclamp(x):
    # minimum/maximum beat np.clip's wrapper dispatch on the tiny
    # per-edge arrays this filter runs on
    return np.minimum(np.maximum(x, -128), 127)


def _u2s(x):
    return x - 128  # slabs arrive int32 (see _edge_slab_*)


def _s2u(x):
    return np.minimum(np.maximum(x + 128, 0), 255)


def _filter_common(p1, p0, q0, q1, use_outer, mask):
    """§15.3 common 4-tap adjustment (int32 inputs). Returns new
    (p0, q0, filt)."""
    ps1, ps0, qs0, qs1 = _u2s(p1), _u2s(p0), _u2s(q0), _u2s(q1)
    filt = np.where(use_outer, _sclamp(ps1 - qs1), 0)
    filt = _sclamp(filt + 3 * (qs0 - ps0))
    filt = np.where(mask, filt, 0)
    f1 = _sclamp(filt + 4) >> 3
    f2 = _sclamp(filt + 3) >> 3
    return _s2u(ps0 + f2), _s2u(qs0 - f1), f1


def _subblock_filter(pix, ilim, elim, thresh):
    """Normal sub-block edge filter on a (8, n) pixel slab
    [p3..p0,q0..q3] x n; returns filtered slab."""
    p3, p2, p1, p0, q0, q1, q2, q3 = pix
    mask = _nf_mask(p3, p2, p1, p0, q0, q1, q2, q3, ilim, elim)
    hev = (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)
    np0, nq0, f1 = _filter_common(p1, p0, q0, q1, hev, mask)
    # outer taps on non-hev pixels
    filt = (f1 + 1) >> 1
    filt = np.where(mask & ~hev, filt, 0)
    nq1 = _s2u(_u2s(q1) - filt)
    np1 = _s2u(_u2s(p1) + filt)
    out = pix.copy()
    out[2] = np.where(mask, np1, p1)
    out[3] = np0
    out[4] = nq0
    out[5] = np.where(mask, nq1, q1)
    return out


def _mbedge_filter(pix, ilim, elim, thresh):
    """Normal macroblock edge filter (§15.3, 6-tap wide)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = pix
    mask = _nf_mask(p3, p2, p1, p0, q0, q1, q2, q3, ilim, elim)
    hev = (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)
    ps2, ps1, ps0 = _u2s(p2), _u2s(p1), _u2s(p0)
    qs0, qs1, qs2 = _u2s(q0), _u2s(q1), _u2s(q2)

    # hev pixels take the common 4-tap adjustment
    cp0, cq0, _ = _filter_common(p1, p0, q0, q1, True, mask & hev)

    w = _sclamp(_sclamp(ps1 - qs1) + 3 * (qs0 - ps0))
    w = np.where(mask & ~hev, w, 0)
    a = (27 * w + 63) >> 7
    nq0 = _s2u(qs0 - a)
    np0 = _s2u(ps0 + a)
    a = (18 * w + 63) >> 7
    nq1 = _s2u(qs1 - a)
    np1 = _s2u(ps1 + a)
    a = (9 * w + 63) >> 7
    nq2 = _s2u(qs2 - a)
    np2 = _s2u(ps2 + a)

    out = pix.copy()
    use_w = mask & ~hev
    out[1] = np.where(use_w, np2, p2)
    out[2] = np.where(use_w, np1, p1)
    out[3] = np.where(use_w, np0, np.where(mask & hev, cp0, p0))
    out[4] = np.where(use_w, nq0, np.where(mask & hev, cq0, q0))
    out[5] = np.where(use_w, nq1, q1)
    out[6] = np.where(use_w, nq2, q2)
    return out


def _simple_filter(pix, elim):
    """Simple filter (§15.1): only p1,p0,q0,q1 in the slab rows 2..5."""
    p1, p0, q0, q1 = pix[2], pix[3], pix[4], pix[5]
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= elim
    np0, nq0, _ = _filter_common(p1, p0, q0, q1, True, mask)
    out = pix.copy()
    out[3] = np0
    out[4] = nq0
    return out


def _edge_slab_v(plane, x, y0, h):
    """(8,h) int32 slab of columns x-4..x+3 for a vertical edge."""
    return plane[y0 : y0 + h, x - 4 : x + 4].T.astype(np.int32)


def _put_slab_v(plane, x, y0, slab):
    plane[y0 : y0 + slab.shape[1], x - 4 : x + 4] = slab.T


def _edge_slab_h(plane, y, x0, w):
    return plane[y - 4 : y + 4, x0 : x0 + w].astype(np.int32)


def _put_slab_h(plane, y, x0, slab):
    plane[y - 4 : y + 4, x0 : x0 + slab.shape[1]] = slab


# ------------------------------------------------------------------ #
# frame decode


def decode_vp8_yuv(data: bytes, loop_filter: bool = True):
    """Decode a VP8 key frame to its bit-exact (Y, U, V) uint8 planes
    (full reconstruction including the in-loop filter — pass
    ``loop_filter=False`` for the pre-filter reconstruction), cropped
    to the frame's stated dimensions."""
    f = _parse_headers(data)
    w, h = f.width, f.height
    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4
    dqs = _dequant_factors(f)

    # reconstruction planes with 1 extra border row/col baked into the
    # arrays would complicate the loop filter; keep exact-size padded
    # to MB multiples and track borders explicitly
    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)

    # -------------------- pass 1: modes (partition 0) ----------------
    bd = f.bd
    mb_seg = np.zeros((mb_h, mb_w), dtype=np.int8)
    mb_skip = np.zeros((mb_h, mb_w), dtype=bool)
    mb_ymode = np.zeros((mb_h, mb_w), dtype=np.int8)
    mb_uvmode = np.zeros((mb_h, mb_w), dtype=np.int8)
    mb_bmodes = {}
    # B-mode contexts: above[col][0..3], left[0..3]
    above_b = [[B_DC] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_b = [B_DC] * 4
        for mx in range(mb_w):
            if f.seg_enabled and f.seg_update_map:
                mb_seg[my, mx] = bd.tree(_SEGMENT_TREE, f.seg_probs)
            if f.mb_no_skip:
                mb_skip[my, mx] = bool(bd.get(f.prob_skip_false))
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            mb_ymode[my, mx] = ym
            if ym == B_PRED:
                modes = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        a = above_b[mx][sx] if sy == 0 else modes[(sy - 1) * 4 + sx]
                        l = left_b[sy] if sx == 0 else modes[sy * 4 + sx - 1]
                        m = bd.tree(_BMODE_TREE, _KF_BMODE_PROBS[a][l])
                        modes[sy * 4 + sx] = m
                mb_bmodes[(my, mx)] = modes
                above_b[mx] = modes[12:16]
                left_b = [modes[3], modes[7], modes[11], modes[15]]
            else:
                b = _MODE_TO_B[ym]
                above_b[mx] = [b] * 4
                left_b = [b] * 4
            mb_uvmode[my, mx] = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)

    # -------------------- pass 2: coefficients + reconstruction ------
    # nonzero contexts: above per MB column, left per MB
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 Y, 2 U, 2 V, 1 Y2
    mb_coeffs = {}
    mb_nocoeff = np.zeros((mb_h, mb_w), dtype=bool)
    for my in range(mb_h):
        left_nz = [0] * 9
        bdt = f.parts[my % len(f.parts)]
        for mx in range(mb_w):
            seg = int(mb_seg[my, mx])
            dq = dqs[seg]
            ym = int(mb_ymode[my, mx])
            has_y2 = ym != B_PRED
            if mb_skip[my, mx]:
                # skipped MB: zero coefficient contexts (Y2 only when
                # this MB codes a Y2 block)
                a, l = above_nz[mx], left_nz
                a[0:4] = [0] * 4
                l[0:4] = [0] * 4
                a[4:8] = [0] * 4
                l[4:8] = [0] * 4
                if has_y2:
                    a[8] = l[8] = 0
                mb_nocoeff[my, mx] = True
                continue
            a, l = above_nz[mx], left_nz
            blocks = {}
            any_coeff = False
            if has_y2:
                ctx = a[8] + l[8]
                c2, _ = _decode_block(
                    bdt, f.coeff_probs[1], 0, ctx, (dq[2], dq[3])
                )
                nz = any(c2)
                a[8] = l[8] = int(nz)
                any_coeff |= nz
                dcs = _iwht4x4(c2)
                plane = 0
                first = 1
            else:
                dcs = None
                plane = 3
                first = 0
            for b in range(16):
                bx, by = b & 3, b >> 2
                ctx = a[bx] + l[by]
                cf, _ = _decode_block(
                    bdt, f.coeff_probs[plane], first, ctx, (dq[0], dq[1])
                )
                nz = any(cf[first:])
                a[bx] = l[by] = int(nz)
                if dcs is not None:
                    cf[0] = dcs[b]
                any_coeff |= any(cf)
                blocks[b] = cf
            for b in range(8):
                # 4 U blocks then 4 V blocks, each plane 2x2
                plane_off = 4 if b < 4 else 6
                local = b & 3
                bx, by = local & 1, local >> 1
                ai = plane_off + bx
                li = plane_off + by
                ctx = a[ai] + l[li]
                cf, _ = _decode_block(
                    bdt, f.coeff_probs[2], 0, ctx, (dq[4], dq[5])
                )
                nz = any(cf)
                a[ai] = l[li] = int(nz)
                any_coeff |= nz
                blocks[16 + b] = cf
            mb_coeffs[(my, mx)] = blocks
            mb_nocoeff[my, mx] = not any_coeff

    # reconstruction (§12): raster MB order
    for my in range(mb_h):
        for mx in range(mb_w):
            _reconstruct_mb(
                f, Y, U, V, my, mx, mb_w, mb_h,
                int(mb_ymode[my, mx]), int(mb_uvmode[my, mx]),
                mb_bmodes.get((my, mx)), mb_coeffs.get((my, mx)),
            )

    # -------------------- loop filter (§15) --------------------------
    if loop_filter and f.filter_level:
        _loop_filter(f, Y, U, V, mb_w, mb_h, mb_seg, mb_ymode, mb_nocoeff)

    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return Y[:h, :w], U[:ch, :cw], V[:ch, :cw]


def _above_row(plane, my, mx, size, mb_w, right_pad):
    """Above row of ``size`` pixels + ``right_pad`` above-right pixels
    + the above-left corner, with RFC border conventions (127 above
    the frame, 129 left of it)."""
    py = my * size
    px = mx * size
    if my == 0:
        above = np.full(size + right_pad, 127, dtype=np.int32)
        tl = 127
    else:
        row = plane[py - 1]
        above = np.empty(size + right_pad, dtype=np.int32)
        above[:size] = row[px : px + size]
        if right_pad:
            if mx == mb_w - 1:
                # rightmost MB: replicate the last above pixel
                above[size:] = above[size - 1]
            else:
                above[size:] = row[px + size : px + size + right_pad]
        tl = 129 if mx == 0 else int(row[px - 1])
        if my == 0:
            tl = 127
    return above, tl


def _left_col(plane, my, mx, size):
    py, px = my * size, mx * size
    if mx == 0:
        return np.full(size, 129, dtype=np.int32)
    return plane[py : py + size, px - 1].astype(np.int32)


def _reconstruct_mb(f, Y, U, V, my, mx, mb_w, mb_h, ym, uvm, bmodes, blocks):
    py, px = my * 16, mx * 16
    if ym == B_PRED:
        # subblock-at-a-time: prediction uses already-reconstructed
        # neighbors INSIDE the MB
        above21, tl = _above_row(Y, my, mx, 16, mb_w, 4)
        left16 = _left_col(Y, my, mx, 16)
        for b in range(16):
            sy, sx = b >> 2, b & 3
            y0, x0 = py + sy * 4, px + sx * 4
            # above 4 + above-right 4
            if sy == 0:
                arow = above21[sx * 4 : sx * 4 + 8].copy()
                if sx == 3:
                    arow[4:8] = above21[16:20]
            else:
                arow = np.empty(8, dtype=np.int32)
                arow[:4] = Y[y0 - 1, x0 : x0 + 4]
                if sx == 3:
                    # above-right of right-column subblocks below the
                    # top row comes from the MB's above-right (§12.3)
                    arow[4:8] = above21[16:20]
                else:
                    arow[4:8] = Y[y0 - 1, x0 + 4 : x0 + 8]
            if sx == 0:
                lcol = left16[sy * 4 : sy * 4 + 4]
            else:
                lcol = Y[y0 : y0 + 4, x0 - 1].astype(np.int32)
            if sy == 0 and sx == 0:
                corner = tl
            elif sy == 0:
                corner = int(above21[sx * 4 - 1])
            elif sx == 0:
                corner = int(left16[sy * 4 - 1])
            else:
                corner = int(Y[y0 - 1, x0 - 1])
            pred = _pred4(bmodes[b], arow, lcol, corner)
            cf = blocks[b] if blocks else None
            if cf and any(cf):
                res = _idct4x4(cf)
                pred = pred + res
            Y[y0 : y0 + 4, x0 : x0 + 4] = np.clip(pred, 0, 255).astype(np.uint8)
    else:
        above, tl = _above_row(Y, my, mx, 16, mb_w, 0)
        left = _left_col(Y, my, mx, 16)
        pred = _pred16_or_8(ym, above, left, tl, 16, my > 0, mx > 0)
        out = pred.copy()
        if blocks:
            for b in range(16):
                cf = blocks[b]
                if any(cf):
                    sy, sx = (b >> 2) * 4, (b & 3) * 4
                    out[sy : sy + 4, sx : sx + 4] += _idct4x4(cf)
        Y[py : py + 16, px : px + 16] = np.clip(out, 0, 255).astype(np.uint8)

    for plane, base in ((U, 16), (V, 20)):
        above, tl = _above_row(plane, my, mx, 8, mb_w, 0)
        left = _left_col(plane, my, mx, 8)
        pred = _pred16_or_8(uvm, above, left, tl, 8, my > 0, mx > 0)
        out = pred.copy()
        if blocks:
            for b in range(4):
                cf = blocks[base + b]
                if any(cf):
                    sy, sx = (b >> 1) * 4, (b & 1) * 4
                    out[sy : sy + 4, sx : sx + 4] += _idct4x4(cf)
        cy, cx = my * 8, mx * 8
        plane[cy : cy + 8, cx : cx + 8] = np.clip(out, 0, 255).astype(np.uint8)


def _mb_filter_level(f, seg, ym, mb_nocoeff):
    level = f.filter_level
    if f.seg_enabled:
        level = f.seg_lf[seg] if f.seg_abs else level + f.seg_lf[seg]
    level = _clamp(level, 0, 63)
    if f.lf_delta_enabled:
        level += f.ref_lf_delta[0]  # keyframes reference INTRA_FRAME
        if ym == B_PRED:
            level += f.mode_lf_delta[0]
        level = _clamp(level, 0, 63)
    return level


def _loop_filter(f, Y, U, V, mb_w, mb_h, mb_seg, mb_ymode, mb_nocoeff):
    for my in range(mb_h):
        for mx in range(mb_w):
            level = _mb_filter_level(
                f, int(mb_seg[my, mx]), int(mb_ymode[my, mx]), None
            )
            if level == 0:
                continue
            ilim = level
            if f.sharpness:
                ilim >>= 2 if f.sharpness > 4 else 1
                if ilim > 9 - f.sharpness:
                    ilim = 9 - f.sharpness
            if ilim < 1:
                ilim = 1
            hev = 0
            if level >= 40:
                hev = 2
            elif level >= 15:
                hev = 1
            mb_elim = (level + 2) * 2 + ilim
            sub_elim = level * 2 + ilim
            inner = (not mb_nocoeff[my, mx]) or int(mb_ymode[my, mx]) == B_PRED
            py, px = my * 16, mx * 16
            cy, cx = my * 8, mx * 8
            if f.filter_type:  # simple: Y only
                if mx > 0:
                    s = _edge_slab_v(Y, px, py, 16)
                    _put_slab_v(Y, px, py, _simple_filter(s, mb_elim))
                if inner:
                    for dx in (4, 8, 12):
                        s = _edge_slab_v(Y, px + dx, py, 16)
                        _put_slab_v(Y, px + dx, py, _simple_filter(s, sub_elim))
                if my > 0:
                    s = _edge_slab_h(Y, py, px, 16)
                    _put_slab_h(Y, py, px, _simple_filter(s, mb_elim))
                if inner:
                    for dy in (4, 8, 12):
                        s = _edge_slab_h(Y, py + dy, px, 16)
                        _put_slab_h(Y, py + dy, px, _simple_filter(s, sub_elim))
                continue
            # normal filter: Y then chroma
            if mx > 0:
                s = _edge_slab_v(Y, px, py, 16)
                _put_slab_v(Y, px, py, _mbedge_filter(s, ilim, mb_elim, hev))
                for pl, c0 in ((U, cx), (V, cx)):
                    s = _edge_slab_v(pl, c0, cy, 8)
                    _put_slab_v(pl, c0, cy, _mbedge_filter(s, ilim, mb_elim, hev))
            if inner:
                for dx in (4, 8, 12):
                    s = _edge_slab_v(Y, px + dx, py, 16)
                    _put_slab_v(
                        Y, px + dx, py, _subblock_filter(s, ilim, sub_elim, hev)
                    )
                for pl in (U, V):
                    s = _edge_slab_v(pl, cx + 4, cy, 8)
                    _put_slab_v(
                        pl, cx + 4, cy, _subblock_filter(s, ilim, sub_elim, hev)
                    )
            if my > 0:
                s = _edge_slab_h(Y, py, px, 16)
                _put_slab_h(Y, py, px, _mbedge_filter(s, ilim, mb_elim, hev))
                for pl in (U, V):
                    s = _edge_slab_h(pl, cy, cx, 8)
                    _put_slab_h(pl, cy, cx, _mbedge_filter(s, ilim, mb_elim, hev))
            if inner:
                for dy in (4, 8, 12):
                    s = _edge_slab_h(Y, py + dy, px, 16)
                    _put_slab_h(
                        Y, py + dy, px, _subblock_filter(s, ilim, sub_elim, hev)
                    )
                for pl in (U, V):
                    s = _edge_slab_h(pl, cy + 4, cx, 8)
                    _put_slab_h(
                        pl, cy + 4, cx, _subblock_filter(s, ilim, sub_elim, hev)
                    )


def decode_vp8(data: bytes) -> np.ndarray:
    """Decode a VP8 key frame to HxWx3 float64 RGB in 0..255 —
    JPEG-style full-range BT.601 with nearest chroma upsampling
    (deterministic; see module docstring)."""
    y, u, v = decode_vp8_yuv(data)
    h, w = y.shape
    uf = np.repeat(np.repeat(u.astype(np.float64), 2, 0), 2, 1)[:h, :w]
    vf = np.repeat(np.repeat(v.astype(np.float64), 2, 0), 2, 1)[:h, :w]
    yf = y.astype(np.float64)
    r = yf + 1.402 * (vf - 128.0)
    g = yf - 0.344136 * (uf - 128.0) - 0.714136 * (vf - 128.0)
    b = yf + 1.772 * (uf - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0)
