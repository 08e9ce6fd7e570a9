"""Legacy binary Word (.doc) text extraction — pure stdlib.

Two public-spec layers:

1. OLE2 / Compound File Binary (MS-CFB): 512-byte header with the
   D0CF11E0 magic, a FAT of uint32 sector chains built from the 109
   header DIFAT slots (+ DIFAT chain for huge files), a directory of
   128-byte entries, and a mini-stream (the root entry's chain,
   64-byte mini-sectors via the miniFAT) for streams under the 4096
   cutoff. ``CompoundFile`` reads any stream by name — .doc here,
   and reusable for other OLE-hosted formats.

2. MS-DOC: the ``WordDocument`` stream starts with the FIB (magic
   0xA5EC); FIB flag bit 0x0200 picks the ``1Table``/``0Table``
   companion stream holding the CLX at (fcClx, lcbClx). The CLX's
   Pcdt carries the PIECE TABLE: n+1 character positions plus n PCDs
   whose fc encodes where each piece's text lives in WordDocument and
   whether it is compressed (bit 30: 8-bit cp1252 at fc/2) or UTF-16LE
   (at fc). Every post-Word-97 file uses this layout, including
   "non-complex" saves.

Control characters map like the other codecs: 0x0D/0x0B -> newline,
cell mark 0x07 -> tab (row mark ends the line), field/object marks
(0x13/0x14/0x15/0x01/0x08) drop, non-breaking/optional hyphens map to
'-'/''. Malformed input raises ValueError into ``on_error``.

Fixtures are WRITTEN test-side (a from-scratch CFB writer + piece
tables, tests/test_doccodec.py) so the reader is pinned against the
spec layout, not against itself.
"""
from __future__ import annotations

import re
import struct

__all__ = [
    "CompoundFile",
    "sniff_doc",
    "extract_doc_text",
    "sniff_xls",
    "extract_xls_text",
    "extract_ppt_text",
    "extract_ole_text",
    "ole_title",
]

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


class CompoundFile:
    """Minimal MS-CFB reader: directory walk + stream extraction
    (FAT chains for big streams, miniFAT chains inside the root's
    mini stream for streams under the cutoff)."""

    def __init__(self, blob: bytes) -> None:
        if len(blob) < 512 or blob[:8] != _CFB_MAGIC:
            raise ValueError("not an OLE2 compound file")
        (
            sector_shift,
            mini_shift,
        ) = struct.unpack_from("<HH", blob, 30)
        self.sec = 1 << sector_shift
        self.minisec = 1 << mini_shift
        if self.sec not in (512, 4096) or self.minisec != 64:
            raise ValueError("unsupported CFB sector geometry")
        (n_fat,) = struct.unpack_from("<I", blob, 44)
        (dir_start,) = struct.unpack_from("<I", blob, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", blob, 56)
        (minifat_start,) = struct.unpack_from("<I", blob, 60)
        (n_minifat,) = struct.unpack_from("<I", blob, 64)
        (difat_start,) = struct.unpack_from("<I", blob, 68)
        (n_difat,) = struct.unpack_from("<I", blob, 72)
        self.blob = blob

        # FAT sector list: 109 header DIFAT slots, then the DIFAT chain
        fat_secs = [
            s
            for (s,) in struct.iter_unpack("<I", blob[76:512])
            if s not in (_FREE, _ENDCHAIN)
        ]
        seen = 0
        sect = difat_start
        while sect not in (_FREE, _ENDCHAIN) and seen < n_difat:
            body = self._sector(sect)
            entries = list(struct.unpack_from(f"<{self.sec // 4}I", body))
            fat_secs.extend(
                s for s in entries[:-1] if s not in (_FREE, _ENDCHAIN)
            )
            sect = entries[-1]
            seen += 1
        self.fat: list[int] = []
        for s in fat_secs[:n_fat] if n_fat else fat_secs:
            self.fat.extend(
                struct.unpack_from(f"<{self.sec // 4}I", self._sector(s))
            )

        # directory entries
        self.entries: dict[str, tuple[int, int, int]] = {}
        root = None
        for body in self._chain_sectors(dir_start):
            for off in range(0, len(body), 128):
                e = body[off : off + 128]
                if len(e) < 128:
                    break
                (nlen,) = struct.unpack_from("<H", e, 64)
                etype = e[66]
                if etype == 0 or nlen < 2:
                    continue
                name = e[: nlen - 2].decode("utf-16-le", "replace")
                (start,) = struct.unpack_from("<I", e, 116)
                (size,) = struct.unpack_from("<Q", e, 120)
                self.entries[name] = (etype, start, size)
                if etype == 5:
                    root = (start, size)
        if root is None:
            raise ValueError("CFB has no root directory entry")

        # miniFAT + the mini stream (the root entry's FAT chain)
        self.minifat: list[int] = []
        sect = minifat_start
        count = 0
        while sect not in (_FREE, _ENDCHAIN) and count < n_minifat:
            self.minifat.extend(
                struct.unpack_from(f"<{self.sec // 4}I", self._sector(sect))
            )
            sect = self.fat[sect] if sect < len(self.fat) else _ENDCHAIN
            count += 1
        self.ministream = b"".join(self._chain_sectors(root[0]))[: root[1]]

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sec
        body = self.blob[off : off + self.sec]
        if len(body) < self.sec:
            raise ValueError("truncated CFB sector")
        return body

    def _chain_sectors(self, start: int):
        sect = start
        hops = 0
        while sect not in (_FREE, _ENDCHAIN):
            yield self._sector(sect)
            sect = self.fat[sect] if sect < len(self.fat) else _ENDCHAIN
            hops += 1
            if hops > len(self.blob) // 64:
                raise ValueError("cyclic CFB FAT chain")

    def stream(self, name: str) -> bytes:
        """The named stream's bytes (mini stream routed when small)."""
        if name not in self.entries:
            raise ValueError(f"CFB stream missing: {name}")
        etype, start, size = self.entries[name]
        if etype != 2:
            raise ValueError(f"CFB entry {name!r} is not a stream")
        if size < self.mini_cutoff:
            out = bytearray()
            sect = start
            hops = 0
            while sect not in (_FREE, _ENDCHAIN):
                off = sect * self.minisec
                out += self.ministream[off : off + self.minisec]
                sect = (
                    self.minifat[sect]
                    if sect < len(self.minifat)
                    else _ENDCHAIN
                )
                hops += 1
                if hops > len(self.blob) // 16:
                    raise ValueError("cyclic CFB miniFAT chain")
            return bytes(out[:size])
        return b"".join(self._chain_sectors(start))[:size]


def sniff_doc(blob: bytes) -> bool:
    """OLE2 magic + a WordDocument stream (cheap full check — CFB
    parse is linear and the magic alone also matches xls/ppt/msi)."""
    if not blob.startswith(_CFB_MAGIC):
        return False
    try:
        return "WordDocument" in CompoundFile(blob).entries
    except ValueError:
        return False


# Word control characters -> text (MS-DOC §2.8; same flattening
# conventions as the other office codecs)
_DOC_CHARMAP = {
    "\r": "\n",        # paragraph mark
    "\x0b": "\n",      # hard line break
    "\x0c": "\f",      # page break / section mark
    "\x07": "\t",      # cell mark (row mark handled below)
    "\x1e": "-",       # non-breaking hyphen
    "\x1f": "",        # optional hyphen
    "\xa0": " ",       # non-breaking space
    "\x01": "",        # inline object anchor
    "\x08": "",        # drawn-object anchor
    "\x13": "",        # field begin
    "\x14": "",        # field separator
    "\x15": "",        # field end
    "\x05": "",        # annotation reference
}


def extract_doc_text(blob: bytes) -> str:
    """All text of a legacy .doc blob via the piece table."""
    cf = CompoundFile(blob)
    word = cf.stream("WordDocument")
    if len(word) < 1124 or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise ValueError("WordDocument stream has no FIB magic")
    (flags,) = struct.unpack_from("<H", word, 0x000A)
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = cf.stream(table_name)
    # FibRgFcLcb97: after base(32) + csw(2)+fibRgW(28) + cslw(2)+
    # fibRgLw(88) + cbRgFcLcb(2) = offset 154; fcClx/lcbClx are dwords
    # 66/67 of that blob
    fc_clx, lcb_clx = struct.unpack_from("<II", word, 154 + 66 * 4)
    if lcb_clx == 0:
        raise ValueError(".doc has no CLX (piece table)")
    clx = table[fc_clx : fc_clx + lcb_clx]
    # CLX = RgPrc (clxt=1 blocks) then Pcdt (clxt=2)
    pos = 0
    plc = None
    while pos < len(clx):
        t = clx[pos]
        if t == 1:  # Prc: 2-byte size + data
            (sz,) = struct.unpack_from("<h", clx, pos + 1)
            pos += 3 + sz
        elif t == 2:  # Pcdt: 4-byte size + PlcPcd
            (sz,) = struct.unpack_from("<I", clx, pos + 1)
            plc = clx[pos + 5 : pos + 5 + sz]
            break
        else:
            raise ValueError(f"unknown CLX block type {t}")
    if plc is None:
        raise ValueError(".doc CLX has no Pcdt")
    # PlcPcd over n pieces: (n+1) CPs (4 bytes) + n PCDs (8 bytes)
    n = (len(plc) - 4) // 12
    if n < 1:
        raise ValueError("empty .doc piece table")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out: list[str] = []
    for k in range(n):
        fc_field = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * k + 2)[0]
        n_chars = cps[k + 1] - cps[k]
        if fc_field & 0x40000000:  # fCompressed: 8-bit cp1252 at fc/2
            fc = (fc_field & 0x3FFFFFFF) // 2
            raw = word[fc : fc + n_chars]
            out.append(raw.decode("cp1252", "replace"))
        else:
            fc = fc_field & 0x3FFFFFFF
            raw = word[fc : fc + 2 * n_chars]
            out.append(raw.decode("utf-16-le", "replace"))
    text = "".join(out)
    # field CODES (between field-begin 0x13 and separator 0x14, e.g.
    # 'HYPERLINK "..."') are instructions, not text: strip them
    # innermost-first (bounded nesting), keep the shown result
    for _ in range(4):
        stripped = re.sub("\x13[^\x13\x14\x15]*\x14", "", text)
        if stripped == text:
            break
        text = stripped
    # row marks are cell marks ending a row: "\x07" runs already map to
    # tabs; a trailing cell mark before a paragraph end reads fine as a
    # tab, so apply the plain map (documented flattening)
    return "".join(_DOC_CHARMAP.get(ch, ch) for ch in text).strip()


# ------------------------------------------------------------------ #
# legacy .xls (BIFF8, MS-XLS): cell text from the Workbook stream.
# Bounded scope: BIFF8 only (the Excel 97-2003 default), SST shared
# strings incl. CONTINUE spillover with per-fragment option flags,
# LABELSST / LABEL / NUMBER / RK / BOOLERR cells, sheets in BOUNDSHEET
# order. BIFF5 and encrypted workbooks (FILEPASS) raise to on_error.

_XLS_SHEET_SEP = "\n"


def sniff_xls(blob: bytes) -> bool:
    if not blob.startswith(_CFB_MAGIC):
        return False
    try:
        return "Workbook" in CompoundFile(blob).entries
    except ValueError:
        return False


def _biff_records(data: bytes):
    pos = 0
    while pos + 4 <= len(data):
        rid, sz = struct.unpack_from("<HH", data, pos)
        yield rid, pos + 4, sz
        pos += 4 + sz
        if rid == 0x000A:  # EOF record ends a substream; keep scanning
            continue


def _read_xl_string(data: bytes, pos: int, n_chars: int) -> str:
    """XLUnicodeRichExtendedString body at ``pos`` (the char count is
    already consumed; ``pos`` points at the option-flags byte):
    returns the text, honoring compressed (latin-1) vs UTF-16 forms.
    Rich-text run counts and phonetic blocks are length-skipped."""
    flags = data[pos]
    pos += 1
    if flags & 0x08:  # rich text: run count precedes the characters
        pos += 2
    if flags & 0x04:  # phonetic: byte count precedes the characters
        pos += 4
    if flags & 0x01:
        return data[pos : pos + 2 * n_chars].decode("utf-16-le", "replace")
    return data[pos : pos + n_chars].decode("latin-1", "replace")


def _parse_sst(stream: bytes, rec_at: int, rec_sz: int,
               records: list[tuple[int, int, int]], rec_idx: int) -> list[str]:
    """The SST record (+ its CONTINUE records): a list of shared
    strings. Strings may split across CONTINUE boundaries; each
    continued fragment restarts with its own option-flags byte."""
    # gather the SST byte span plus following CONTINUEs with their
    # boundaries (each CONTINUE restarts option flags — so we parse
    # fragment-aware rather than concatenating blindly)
    chunks = [(rec_at, rec_sz)]
    j = rec_idx + 1
    while j < len(records) and records[j][0] == 0x003C:  # CONTINUE
        chunks.append((records[j][1], records[j][2]))
        j += 1
    (n_total,) = struct.unpack_from("<I", stream, rec_at + 4)
    strings: list[str] = []
    ci = 0
    pos = chunks[0][0] + 8  # skip cstTotal + cstUnique
    end = chunks[0][0] + chunks[0][1]
    while len(strings) < n_total:
        if pos >= end:
            ci += 1
            if ci >= len(chunks):
                break
            pos, sz = chunks[ci]
            end = pos + sz
        if pos + 3 > end:
            raise ValueError("truncated XLS SST record")
        (n_chars,) = struct.unpack_from("<H", stream, pos)
        pos += 2
        flags = stream[pos]
        pos += 1
        n_runs = 0
        extsz = 0
        if flags & 0x08:
            (n_runs,) = struct.unpack_from("<H", stream, pos)
            pos += 2
        if flags & 0x04:
            (extsz,) = struct.unpack_from("<I", stream, pos)
            pos += 4
        parts: list[str] = []
        remaining = n_chars
        wide = bool(flags & 0x01)
        while remaining:
            avail = (end - pos) // (2 if wide else 1)
            take = min(remaining, avail)
            raw = stream[pos : pos + take * (2 if wide else 1)]
            parts.append(
                raw.decode("utf-16-le" if wide else "latin-1", "replace")
            )
            pos += take * (2 if wide else 1)
            remaining -= take
            if remaining:
                ci += 1
                if ci >= len(chunks):
                    raise ValueError("XLS SST string spills past CONTINUE")
                pos, sz = chunks[ci]
                end = pos + sz
                wide = bool(stream[pos] & 0x01)  # fragment option flags
                pos += 1
        # skip rich runs + phonetic data (may themselves span chunks)
        skip = 4 * n_runs + extsz
        while skip:
            step = min(skip, end - pos)
            pos += step
            skip -= step
            if skip:
                ci += 1
                if ci >= len(chunks):
                    raise ValueError("XLS SST trailer spills past CONTINUE")
                pos, sz = chunks[ci]
                end = pos + sz
        strings.append("".join(parts))
    return strings


def _rk_value(rk: int) -> str:
    """RkNumber: bit0 = divide by 100, bit1 = 30-bit signed int vs the
    high 30 bits of an IEEE-754 double (low 34 bits zero)."""
    div = 100.0 if rk & 1 else 1.0
    if rk & 2:
        v = rk >> 2
        if rk & 0x80000000:
            v -= 1 << 30
        num = v / div
    else:
        high = struct.pack("<I", rk & 0xFFFFFFFC)
        num = struct.unpack("<d", b"\x00\x00\x00\x00" + high)[0] / div
    return f"{num:g}"


def extract_xls_text(blob: bytes) -> str:
    """Cell text of a legacy .xls blob: one line per row, cells
    tab-joined in record order (the same text-mining flattening as
    extract_xlsx_text), sheets in BOUNDSHEET order separated by
    newlines."""
    cf = CompoundFile(blob)
    try:
        stream = cf.stream("Workbook")
    except ValueError:
        stream = cf.stream("Book")  # BIFF5 name — then rejected below
    records = list(_biff_records(stream))
    sst: list[str] = []
    sheet_starts: list[int] = []
    for idx, (rid, at, sz) in enumerate(records):
        if rid == 0x0809 and sz >= 4:  # BOF
            (ver,) = struct.unpack_from("<H", stream, at)
            if ver != 0x0600:
                raise ValueError(f"unsupported BIFF version {ver:#06x}")
        elif rid == 0x002F:  # FILEPASS
            raise ValueError("encrypted XLS workbook")
        elif rid == 0x00FC:  # SST
            sst = _parse_sst(stream, at, sz, records, idx)
        elif rid == 0x0085 and sz >= 8:  # BOUNDSHEET
            (lb_pos,) = struct.unpack_from("<I", stream, at)
            sheet_starts.append(lb_pos)
    if not sheet_starts:
        raise ValueError("XLS has no BOUNDSHEET records")

    sheets_text: list[str] = []
    for start in sheet_starts:
        rows: dict[int, list[str]] = {}

        def put(row: int, text: str) -> None:
            rows.setdefault(row, []).append(text)

        pos = start
        while pos + 4 <= len(stream):
            rid, sz = struct.unpack_from("<HH", stream, pos)
            at = pos + 4
            pos += 4 + sz
            if rid == 0x000A:  # EOF: end of this sheet substream
                break
            if rid == 0x00FD and sz >= 10:  # LABELSST
                row, _col, _ixfe, isst = struct.unpack_from(
                    "<HHHI", stream, at
                )
                put(row, sst[isst] if isst < len(sst) else "")
            elif rid == 0x0204 and sz >= 8:  # LABEL (BIFF8 inline)
                row, _col, _ixfe = struct.unpack_from("<HHH", stream, at)
                (n_chars,) = struct.unpack_from("<H", stream, at + 6)
                put(row, _read_xl_string(stream, at + 8, n_chars))
            elif rid == 0x0203 and sz >= 14:  # NUMBER
                row, _col, _ixfe = struct.unpack_from("<HHH", stream, at)
                (num,) = struct.unpack_from("<d", stream, at + 6)
                put(row, f"{num:g}")
            elif rid == 0x027E and sz >= 10:  # RK
                row, _col, _ixfe = struct.unpack_from("<HHH", stream, at)
                (rk,) = struct.unpack_from("<I", stream, at + 6)
                put(row, _rk_value(rk))
            elif rid == 0x0205 and sz >= 8:  # BOOLERR
                row, _col, _ixfe = struct.unpack_from("<HHH", stream, at)
                val, is_err = stream[at + 6], stream[at + 7]
                put(row, "#ERR" if is_err else ("TRUE" if val else "FALSE"))
        sheets_text.append(
            "\n".join("\t".join(rows[r]) for r in sorted(rows))
        )
    return _XLS_SHEET_SEP.join(s for s in sheets_text if s).strip()


# MS-PPT record types (all records — PowerPoint and the embedded
# OfficeArt drawing layer — share the 8-byte header: verAndInstance
# uint16, recType uint16, recLen uint32; recVer 0xF marks a container)
_PPT_SLIDE = 0x03EE          # Slide container
_PPT_SLIDEPERSIST = 0x03F3   # SlidePersistAtom (SlideListWithText)
_PPT_TEXTCHARS = 0x0FA0      # TextCharsAtom: UTF-16LE
_PPT_TEXTBYTES = 0x0FA8      # TextBytesAtom: ANSI (cp1252)
_PPT_CRYPT = 0x2F14          # CryptSession10Container: encrypted


def _ppt_clean(text: str) -> str:
    """MS-PPT text-atom payload → lines: CR is the paragraph mark,
    VT the soft line break (MS-PPT §2.9; same flattening as .doc)."""
    return (
        text.replace("\r\n", "\n")
        .replace("\r", "\n")
        .replace("\x0b", "\n")
        .rstrip("\x00")
        .strip()
    )


def extract_ppt_text(blob: bytes) -> str:
    """All slide text of a legacy .ppt blob (MS-PPT): walk the
    `PowerPoint Document` stream's record tree (containers recurse —
    the OfficeArt drawing records nested under each slide share the
    header format), collecting TextCharsAtom (UTF-16LE) and
    TextBytesAtom (ANSI) payloads. A new slide bucket opens at each
    Slide container (drawing-layer text) or SlidePersistAtom
    (SlideListWithText outline text) — persist order as laid out in
    the stream; slides are form-feed separated like the pptx path.
    Encrypted decks (CryptSession10Container) raise to on_error."""
    cf = CompoundFile(blob)
    stream = cf.stream("PowerPoint Document")
    buckets: list[list[str]] = [[]]

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            opts, rtype, rlen = struct.unpack_from("<HHI", stream, pos)
            pos += 8
            end = min(pos + rlen, hi)
            if rtype == _PPT_CRYPT:
                raise ValueError(
                    "encrypted PowerPoint (CryptSession10) is not "
                    "extractable"
                )
            if rtype in (_PPT_SLIDE, _PPT_SLIDEPERSIST):
                buckets.append([])
            if (opts & 0xF) == 0xF:
                walk(pos, end)
            elif rtype == _PPT_TEXTCHARS:
                buckets[-1].append(
                    _ppt_clean(
                        stream[pos:end].decode("utf-16-le", "replace")
                    )
                )
            elif rtype == _PPT_TEXTBYTES:
                buckets[-1].append(
                    _ppt_clean(stream[pos:end].decode("cp1252", "replace"))
                )
            pos = end

    walk(0, len(stream))
    slides = ["\n".join(p for p in b if p) for b in buckets]
    slides = [s for s in slides if s]
    if not slides:
        raise ValueError("no text atoms in PowerPoint Document stream")
    return "\f".join(slides).strip()


def ole_title(cf: CompoundFile) -> str:
    """Document title from the ``\\x05SummaryInformation`` property-set
    stream (MS-OLEPS): PIDSI_TITLE (0x02) in the first property set,
    honoring the set's PID 1 codepage for VT_LPSTR values. Missing
    stream / property / any malformation → "" — titles are optional
    metadata and must never NULL the text."""
    name = "\x05SummaryInformation"
    if name not in cf.entries:
        return ""
    try:
        data = cf.stream(name)
        (off,) = struct.unpack_from("<I", data, 44)
        (_sz, nprops) = struct.unpack_from("<II", data, off)
        codepage = 1252
        title_at = None
        for i in range(nprops):
            pid, poff = struct.unpack_from("<II", data, off + 8 + 8 * i)
            if pid == 1:
                (cp,) = struct.unpack_from("<H", data, off + poff + 4)
                codepage = cp or 1252
            elif pid == 2:
                title_at = off + poff
        if title_at is None:
            return ""
        (vt,) = struct.unpack_from("<I", data, title_at)
        (n,) = struct.unpack_from("<I", data, title_at + 4)
        if vt == 30:  # VT_LPSTR: n bytes incl. NUL, set codepage
            raw = data[title_at + 8 : title_at + 8 + n]
            if codepage == 1200:
                txt = raw.decode("utf-16-le", "replace")
            else:
                txt = raw.decode(f"cp{codepage}", "replace")
        elif vt == 31:  # VT_LPWSTR: n UTF-16 code units incl. NUL
            raw = data[title_at + 8 : title_at + 8 + 2 * n]
            txt = raw.decode("utf-16-le", "replace")
        else:
            return ""
        return re.sub(r"\s+", " ", txt.split("\x00", 1)[0]).strip()
    except (ValueError, struct.error, IndexError, LookupError):
        return ""


def extract_ole_text(blob: bytes) -> tuple[str, str, str]:
    """(format, text, title) for an OLE2-magic blob: .doc, .xls, or
    .ppt (title from the SummaryInformation property set when
    present); other OLE hosts (msi, msg, ...) raise into the caller's
    on_error."""
    cf = CompoundFile(blob)
    if "WordDocument" in cf.entries:
        return "doc", extract_doc_text(blob), ole_title(cf)
    if "Workbook" in cf.entries or "Book" in cf.entries:
        return "xls", extract_xls_text(blob), ole_title(cf)
    if "PowerPoint Document" in cf.entries:
        return "ppt", extract_ppt_text(blob), ole_title(cf)
    raise ValueError("OLE2 file is not a Word/Excel/PowerPoint document")
