"""Legacy .doc extraction (functions/doccodec.py): a from-scratch
test-side CFB WRITER (header, FAT, directory, miniFAT + mini stream)
plus hand-built FIB/CLX piece tables pin the reader against the
MS-CFB / MS-DOC layouts — compressed (cp1252) and UTF-16 pieces,
out-of-order piece fc's, both table-stream names, RgPrc skipping,
big (main-FAT) and small (mini-stream) streams, and the Spark
extract_text routing."""
from __future__ import annotations

import struct

import pytest

from littletable_spark.functions.doccodec import (
    CompoundFile,
    extract_doc_text,
    sniff_doc,
)

FREE = 0xFFFFFFFF
END = 0xFFFFFFFE


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Minimal spec-conformant CFB: 512-byte sectors, one level of
    header DIFAT, miniFAT + mini stream for streams under 4096."""
    sectors: list[bytes] = []
    fat: list[int] = []

    def alloc_chain(data: bytes) -> int:
        n = max(1, -(-len(data) // 512))
        first = len(sectors)
        for k in range(n):
            sectors.append(data[k * 512 : (k + 1) * 512].ljust(512, b"\x00"))
            fat.append(first + k + 1)
        fat[-1] = END
        return first

    # split streams into mini (<4096) and big
    mini_chunks: list[bytes] = []
    minifat: list[int] = []
    placements: dict[str, tuple[int, int]] = {}  # name -> (start, size)
    for name, data in streams.items():
        if len(data) < 4096:
            n = max(1, -(-len(data) // 64))
            first = len(mini_chunks)
            for k in range(n):
                mini_chunks.append(
                    data[k * 64 : (k + 1) * 64].ljust(64, b"\x00")
                )
                minifat.append(first + k + 1)
            minifat[-1] = END
            placements[name] = (first, len(data))
    ministream = b"".join(mini_chunks)

    for name, data in streams.items():
        if len(data) >= 4096:
            placements[name] = (alloc_chain(data), len(data))
    mini_start = alloc_chain(ministream) if ministream else END
    minifat_blob = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_start = alloc_chain(minifat_blob) if minifat_blob else END
    n_minifat_secs = max(1, -(-len(minifat_blob) // 512)) if minifat_blob else 0

    # directory: root + one entry per stream
    def dirent(name: str, etype: int, start: int, size: int,
               child: int = FREE, right: int = FREE) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, FREE)   # left
        struct.pack_into("<I", e, 72, right)  # right
        struct.pack_into("<I", e, 76, child)  # child
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    names = list(streams)
    ents = [dirent("Root Entry", 5, mini_start, len(ministream),
                   child=1 if names else FREE)]
    for i, name in enumerate(names):
        start, size = placements[name]
        right = i + 2 if i + 1 < len(names) else FREE
        ents.append(dirent(name, 2, start, size, right=right))
    dir_blob = b"".join(ents)
    dir_start = alloc_chain(dir_blob)

    # FAT sector(s) — mark themselves, then fix the header
    n_fat_secs = max(1, -(-(len(fat) + 1) // 128))
    fat_first = len(sectors)
    for k in range(n_fat_secs):
        fat.append(0xFFFFFFFD)  # FATSECT marker
        sectors.append(b"")     # placeholder
    fat_blob = b"".join(struct.pack("<I", v) for v in fat).ljust(
        n_fat_secs * 512, b"\xff"
    )
    for k in range(n_fat_secs):
        sectors[fat_first + k] = fat_blob[k * 512 : (k + 1) * 512]

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", hdr, 24, 0x3E)   # minor
    struct.pack_into("<H", hdr, 26, 3)      # major (512-byte sectors)
    struct.pack_into("<H", hdr, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", hdr, 30, 9)      # sector shift
    struct.pack_into("<H", hdr, 32, 6)      # mini shift
    struct.pack_into("<I", hdr, 44, n_fat_secs)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, 4096)   # mini cutoff
    struct.pack_into("<I", hdr, 60, minifat_start)
    struct.pack_into("<I", hdr, 64, n_minifat_secs)
    struct.pack_into("<I", hdr, 68, END)    # no DIFAT chain
    struct.pack_into("<I", hdr, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", hdr, 76 + 4 * i,
            fat_first + i if i < n_fat_secs else FREE,
        )
    return bytes(hdr) + b"".join(sectors)


def make_doc(pieces, table="1Table", prc: bytes = b"",
             pad_word: int = 0, reverse_fc: bool = False) -> bytes:
    """pieces: list of (text, compressed) in CP order; fc placement
    follows list order after the FIB, or REVERSED list order with
    ``reverse_fc`` (CP order then disagrees with stream order — the
    piece-table indirection the reader must honor)."""
    fib = bytearray(1124)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 0x0A, 0x0200 if table == "1Table" else 0)
    word = bytearray(fib) + b"\x00" * pad_word
    fields: dict[int, int] = {}
    order = range(len(pieces) - 1, -1, -1) if reverse_fc else range(len(pieces))
    for k in order:
        text, compressed = pieces[k]
        if compressed:
            fields[k] = 0x40000000 | (len(word) * 2)
            word += text.encode("cp1252")
        else:
            fields[k] = len(word)
            word += text.encode("utf-16-le")
    placed = [(len(pieces[k][0]), fields[k]) for k in range(len(pieces))]
    cps = [0]
    for n, _ in placed:
        cps.append(cps[-1] + n)
    plc = b"".join(struct.pack("<I", c) for c in cps) + b"".join(
        struct.pack("<HIH", 0, fc, 0) for _, fc in placed
    )
    clx = prc + b"\x02" + struct.pack("<I", len(plc)) + plc
    tbl = bytearray(b"\xaa" * 32)  # fcClx offset exercised
    fc_clx = len(tbl)
    tbl += clx
    struct.pack_into("<II", word, 154 + 66 * 4, fc_clx, len(clx))
    return write_cfb({"WordDocument": bytes(word), table: bytes(tbl)})


def test_compressed_piece_and_control_chars():
    # field CODE ('HYPERLINK u') strips, the shown result stays
    text = "Héllo\rworld\x07cell \x13HYPERLINK u\x14shown\x15 end"
    blob = make_doc([(text, True)])
    assert sniff_doc(blob)
    assert extract_doc_text(blob) == "Héllo\nworld\tcell shown end"


def test_utf16_and_out_of_cp_order_pieces():
    # CP order: UTF-16 CJK piece then compressed latin piece — but the
    # compressed piece is placed FIRST in the WordDocument stream
    # (reverse_fc), so assembling by stream order would transpose them
    blob = make_doc(
        [("中文 text\r", False), ("tail piece", True)], reverse_fc=True
    )
    assert extract_doc_text(blob) == "中文 text\ntail piece"


def test_0table_variant_and_prc_skip():
    prc = b"\x01" + struct.pack("<h", 4) + b"\xde\xad\xbe\xef"
    blob = make_doc([("zero table", True)], table="0Table", prc=prc)
    assert extract_doc_text(blob) == "zero table"


def test_big_wordstream_uses_main_fat():
    body = ("long paragraph " * 400 + "\r").strip("\r") + "\r"  # > 4096 chars
    blob = make_doc([(body, True)], pad_word=4096)
    got = extract_doc_text(blob)
    assert got == body.replace("\r", "\n").strip()
    # the WordDocument stream really was big enough for the main FAT
    assert len(CompoundFile(blob).stream("WordDocument")) >= 4096


def test_sniff_and_rejections():
    assert not sniff_doc(b"not ole at all")
    # an OLE file WITHOUT a WordDocument stream (xls-like) sniffs false
    xls_like = write_cfb({"Workbook": b"\x09\x08" * 40})
    assert not sniff_doc(xls_like)
    with pytest.raises(ValueError, match="WordDocument"):
        extract_doc_text(xls_like)
    with pytest.raises(ValueError, match="compound"):
        CompoundFile(b"\x00" * 600)


def test_extract_text_routes_doc(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    rows = [
        {"id": 0, "blob": make_doc([("doc body text\rsecond", True)])},
        {"id": 1, "blob": write_cfb({"Workbook": b"\x09\x08" * 40})},
    ]
    t = Table("blobs", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[0].doc_format == "doc"
    assert out[0].text == "doc body text\nsecond"
    assert out[1].doc_format is None and out[1].text is None  # OLE, not .doc


# ------------------------------------------------------------------ #
# legacy .xls (BIFF8): a test-side record writer pins the reader.


def _rec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))


def _sst_bodies(strings, split=None):
    """SST record body (+ optional CONTINUE bodies). ``split`` =
    (string_index, char_offset) forces that string to spill into a
    CONTINUE whose fragment restarts with its own option flags."""
    bodies = [bytearray(struct.pack("<II", len(strings), len(strings)))]
    for k, s in enumerate(strings):
        wide = any(ord(c) > 255 for c in s)
        head = struct.pack("<HB", len(s), 1 if wide else 0)
        if split and split[0] == k:
            a, b = s[: split[1]], s[split[1] :]
            bodies[-1] += head + a.encode(
                "utf-16-le" if wide else "latin-1"
            )
            frag = bytes([1 if wide else 0]) + b.encode(
                "utf-16-le" if wide else "latin-1"
            )
            bodies.append(bytearray(frag))
        else:
            bodies[-1] += head + s.encode(
                "utf-16-le" if wide else "latin-1"
            )
    out = [_rec(0x00FC, bytes(bodies[0]))]
    for c in bodies[1:]:
        out.append(_rec(0x003C, bytes(c)))
    return b"".join(out)


def make_xls(sheets, shared, split=None) -> bytes:
    """sheets: list of sheet cell lists [(row, col, kind, value)];
    kind in {'s','label','n','rk','bool'}."""
    sheet_blobs = []
    for cells in sheets:
        body = bytearray(_bof(0x0010))
        for row, col, kind, val in cells:
            if kind == "s":
                body += _rec(0x00FD, struct.pack("<HHHI", row, col, 0, val))
            elif kind == "label":
                wide = any(ord(c) > 255 for c in val)
                s = struct.pack("<HB", len(val), 1 if wide else 0) + \
                    val.encode("utf-16-le" if wide else "latin-1")
                body += _rec(0x0204, struct.pack("<HHH", row, col, 0) + s)
            elif kind == "n":
                body += _rec(0x0203, struct.pack("<HHHd", row, col, 0, val))
            elif kind == "rk":
                body += _rec(0x027E, struct.pack("<HHHI", row, col, 0, val))
            elif kind == "bool":
                body += _rec(
                    0x0205,
                    struct.pack("<HHHBB", row, col, 0, 1 if val else 0, 0),
                )
        body += _rec(0x000A, b"")
        sheet_blobs.append(bytes(body))

    # globals with BOUNDSHEET offsets patched in a second pass
    def globals_blob(offsets):
        g = bytearray(_bof(0x0005))
        g += _sst_bodies(shared, split)
        for i, off in enumerate(offsets):
            name = f"S{i+1}".encode("latin-1")
            g += _rec(
                0x0085,
                struct.pack("<IH", off, 0)
                + bytes([len(name), 0]) + name,
            )
        g += _rec(0x000A, b"")
        return bytes(g)

    glen = len(globals_blob([0] * len(sheet_blobs)))
    offsets = []
    pos = glen
    for sb in sheet_blobs:
        offsets.append(pos)
        pos += len(sb)
    stream = globals_blob(offsets) + b"".join(sheet_blobs)
    return write_cfb({"Workbook": stream})


def test_xls_cell_kinds_and_sheets():
    from littletable_spark.functions.doccodec import (
        extract_xls_text,
        sniff_xls,
    )

    blob = make_xls(
        [
            [(0, 0, "s", 0), (0, 1, "n", 42.5), (1, 0, "s", 1),
             (1, 1, "rk", (7 << 2) | 2)],          # int RK 7
            [(0, 0, "label", "inline ştring"), (0, 1, "bool", True)],
        ],
        shared=["hello", "wörld"],
    )
    assert sniff_xls(blob)
    assert extract_xls_text(blob) == (
        "hello\t42.5\nwörld\t7\ninline ştring\tTRUE"
    )


def test_xls_rk_forms():
    from littletable_spark.functions.doccodec import extract_xls_text

    import struct as _s
    # float RK: high 32 bits of IEEE double for 2.5; x100 variant
    high = _s.unpack("<I", _s.pack("<d", 2.5)[4:])[0] & 0xFFFFFFFC
    blob = make_xls(
        [[(0, 0, "rk", high), (0, 1, "rk", high | 1),
          (0, 2, "rk", ((100 << 2) | 2) | 1)]],   # int 100 / 100 = 1
        shared=[],
    )
    assert extract_xls_text(blob) == "2.5\t0.025\t1"


def test_xls_sst_continue_spillover():
    from littletable_spark.functions.doccodec import extract_xls_text

    long = "abcdefghij" * 10
    blob = make_xls(
        [[(0, 0, "s", 0), (1, 0, "s", 1)]],
        shared=[long, "after"],
        split=(0, 37),  # split the long string mid-way into a CONTINUE
    )
    assert extract_xls_text(blob) == f"{long}\nafter"


def test_xls_rejections_and_routing(spark):
    from littletable_spark import Table
    from littletable_spark.functions.doccodec import extract_xls_text
    from littletable_spark.operators.multimodal import extract_text

    # FILEPASS (encrypted) rejects
    enc_stream = _bof(0x0005) + _rec(0x002F, b"\x00" * 4) + _rec(0x000A, b"")
    with pytest.raises(ValueError, match="encrypted"):
        extract_xls_text(write_cfb({"Workbook": enc_stream}))

    blob = make_xls([[(0, 0, "s", 0)]], shared=["routed cell"])
    doc = make_doc([("word text", True)])
    t = Table("blobs", spark=spark)
    t.insert_many([{"id": 0, "blob": blob}, {"id": 1, "blob": doc}])
    out = {r.id: r for r in extract_text(t, "blob", "id")}
    assert out[0].doc_format == "xls" and out[0].text == "routed cell"
    assert out[1].doc_format == "doc" and out[1].text == "word text"
