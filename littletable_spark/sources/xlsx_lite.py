"""Minimal stdlib-only .xlsx codec (zipfile + xml.etree).

The reference's Excel path (littletable.py:3019-3115 import,
littletable.py:3415-3459 export) depends on openpyxl, which is absent in
this environment. xlsx is just a zip of SpreadsheetML parts, and the
subset littletable exercises — one value grid per sheet, Excel-native
int/float/str/bool/date cells (test/data_types.xlsx) — needs no styling
engine, so this codec implements it directly:

reader: workbook.xml (sheet names) + workbook.xml.rels (sheet targets) +
sharedStrings.xml + styles.xml (date-format detection via numFmtId) +
per-sheet cell grid with A1-reference gap filling.

writer: a complete minimal package — inline strings (no shared-string
table), native number/bool cells, date/datetime as Excel serials with a
date style.

Excel's serial epoch is 1899-12-30 (the Lotus leap-year bug makes serial
60 a fictional Feb 29 1900; files written by modern tools never rely on
pre-1900 dates, and neither does the reference test data).
"""

from __future__ import annotations

import datetime
import io
import re
import zipfile
from typing import Any, BinaryIO
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELS_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_EPOCH = datetime.datetime(1899, 12, 30)
# builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30);
# 14-17 are date-only, 18-22 and 45-47 include a time component
_DATE_FMT_IDS = set(range(14, 23)) | set(range(45, 48))
_DATE_ONLY_FMT_IDS = set(range(14, 18))
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB3' -> 27."""
    m = _CELL_REF.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _is_date_format(code: str) -> bool:
    """A number format is a date format if it uses y/m/d/h/s tokens
    outside of quoted literals, color/condition brackets, and escapes."""
    code = re.sub(r'"[^"]*"', "", code)
    code = re.sub(r"\[[^\]]*\]", "", code)
    code = re.sub(r"\\.", "", code)
    return bool(re.search(r"[ymdhs]", code, re.IGNORECASE))


def _serial_to_pydate(
    serial: float, date_only: bool
) -> datetime.datetime | datetime.date:
    # Excel serials are float64 days, so far dates carry ~1 µs of
    # representation error (e.g. 2080-01-01 01:42:12.479 reads back
    # .478999 via timedelta(days=serial)).  Excel's effective precision
    # is the millisecond; reconstruct by rounding to integer ms, which
    # is exact for any serial our writer (or openpyxl) produces.
    dt = _EPOCH + datetime.timedelta(milliseconds=round(serial * 86400_000))
    # a date-only format with an integral serial is a date; a format
    # with a time component keeps midnight datetimes as datetimes
    if date_only and serial == int(serial):
        return dt.date()
    return dt


class _Workbook:
    def __init__(self, data: bytes):
        self.zf = zipfile.ZipFile(io.BytesIO(data))
        book = ET.fromstring(self.zf.read("xl/workbook.xml"))
        rels = ET.fromstring(self.zf.read("xl/_rels/workbook.xml.rels"))
        targets = {
            r.get("Id"): r.get("Target") for r in rels.iter(f"{_RELS_NS}Relationship")
        }
        self.sheets: list[tuple[str, str]] = []  # (name, zip path)
        for sh in book.iter(f"{_NS}sheet"):
            target = targets[sh.get(_DOC_REL)].lstrip("/")
            if not target.startswith("xl/"):
                target = "xl/" + target
            self.sheets.append((sh.get("name"), target))
        self.shared: list[str] = []
        if "xl/sharedStrings.xml" in self.zf.namelist():
            sst = ET.fromstring(self.zf.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_NS}si"):
                self.shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        self.date_styles: set[int] = set()
        self.date_only_styles: set[int] = set()
        if "xl/styles.xml" in self.zf.namelist():
            styles = ET.fromstring(self.zf.read("xl/styles.xml"))
            custom = {}
            for fmt in styles.iter(f"{_NS}numFmt"):
                custom[int(fmt.get("numFmtId"))] = fmt.get("formatCode", "")
            xfs = styles.find(f"{_NS}cellXfs")
            if xfs is not None:
                for i, xf in enumerate(xfs.findall(f"{_NS}xf")):
                    fid = int(xf.get("numFmtId", "0"))
                    code = custom.get(fid, "")
                    if fid in _DATE_FMT_IDS or (code and _is_date_format(code)):
                        self.date_styles.add(i)
                        if fid in _DATE_ONLY_FMT_IDS or (
                            code
                            and _is_date_format(code)
                            and not re.search(
                                r"[hs]",
                                re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code),
                                re.IGNORECASE,
                            )
                        ):
                            self.date_only_styles.add(i)

    def _cell_value(self, c: ET.Element) -> Any:
        ctype = c.get("t", "n")
        if ctype == "inlineStr":
            is_el = c.find(f"{_NS}is")
            return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
        v = c.find(f"{_NS}v")
        if v is None or v.text is None:
            return None
        raw = v.text
        if ctype == "s":
            return self.shared[int(raw)]
        if ctype == "b":
            return raw == "1"
        if ctype in ("str", "e"):
            return raw
        num = float(raw)
        style = int(c.get("s", "0"))
        if style in self.date_styles:
            return _serial_to_pydate(num, style in self.date_only_styles)
        if num == int(num) and "e" not in raw.lower() and "." not in raw:
            return int(raw)
        return num

    def rows(self, sheet: str | int | None = None) -> list[list[Any]]:
        if isinstance(sheet, str):
            try:
                path = dict(self.sheets)[sheet]
            except KeyError:
                raise KeyError(
                    f"no sheet named {sheet!r}; have {[n for n, _ in self.sheets]}"
                ) from None
        else:
            path = self.sheets[sheet or 0][1]
        ws = ET.fromstring(self.zf.read(path))
        out: list[list[Any]] = []
        width = 0
        dim = ws.find(f"{_NS}dimension")
        if dim is not None and ":" in (dim.get("ref") or ""):
            width = _col_index(dim.get("ref").split(":")[1]) + 1
        for row in ws.iter(f"{_NS}row"):
            vals: list[Any] = []
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(vals)
                while len(vals) < idx:
                    vals.append(None)
                vals.append(self._cell_value(c))
            width = max(width, len(vals))
            out.append(vals)
        for vals in out:
            vals.extend([None] * (width - len(vals)))
        return out


def read_xlsx(
    source: str | bytes | BinaryIO, sheet: str | int | None = None
) -> list[list[Any]]:
    """Value grid of one sheet (header row included), Excel-native types
    decoded: shared/inline strings, bool, int vs float, date/datetime."""
    if isinstance(source, bytes):
        data = source
    elif hasattr(source, "read"):
        data = source.read()
    else:
        with open(source, "rb") as f:
            data = f.read()
    return _Workbook(data).rows(sheet)


def sheet_names(source: str | bytes | BinaryIO) -> list[str]:
    if isinstance(source, bytes):
        data = source
    elif hasattr(source, "read"):
        data = source.read()
    else:
        with open(source, "rb") as f:
            data = f.read()
    return [n for n, _ in _Workbook(data).sheets]


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# style index 1 = builtin numFmtId 14 (short date), 2 = 22 (date+time)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="3">
<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
<xf numFmtId="14" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
<xf numFmtId="22" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, datetime.datetime):
        # quantize to integer milliseconds (Excel's effective precision)
        # BEFORE dividing: total_seconds() loses µs for far dates, and an
        # exact M/86400000 serial round-trips bit-perfectly through the
        # reader's round-to-ms reconstruction
        ms = (v.replace(tzinfo=None) - _EPOCH) // datetime.timedelta(milliseconds=1)
        serial = ms / 86400_000.0
        return f'<c r="{ref}" s="2"><v>{serial!r}</v></c>'
    if isinstance(v, datetime.date):
        serial = (datetime.datetime(v.year, v.month, v.day) - _EPOCH).days
        return f'<c r="{ref}" s="1"><v>{serial}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    text = escape(str(v))
    space = ' xml:space="preserve"' if text != text.strip() else ""
    return f'<c r="{ref}" t="inlineStr"><is><t{space}>{text}</t></is></c>'


def write_xlsx(
    dest: str | BinaryIO,
    rows: list[list[Any]],
    sheet_name: str = "Sheet1",
) -> None:
    """Write a value grid (header first) as a minimal valid .xlsx."""
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letters(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    width = max((len(r) for r in rows), default=1)
    dim = f"A1:{_col_letters(max(width - 1, 0))}{max(len(rows), 1)}"
    ws = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<dimension ref="{dim}"/>'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/worksheets/sheet1.xml", ws)
