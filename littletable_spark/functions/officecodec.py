"""DOCX / ODT / XLSX / PPTX text extraction — pure stdlib
(zipfile + xml.etree).

Office documents are the largest class of real-corpus text blobs after
PDF/HTML (reference parity: littletable has no blob ingestion at all —
this extends the crawl-ingestion surface the same way pdfcodec.py
does). All four formats are ZIP containers holding XML:

- DOCX (ECMA-376 WordprocessingML): ``word/document.xml`` body plus
  ``word/header*.xml`` / ``word/footer*.xml`` parts. Text lives in
  ``w:t`` runs inside ``w:p`` paragraphs; ``w:tab`` is a tab, ``w:br``
  / ``w:cr`` are line breaks; tables are ``w:tbl`` > ``w:tr`` >
  ``w:tc``.
- ODT (OASIS OpenDocument v1.2 §3.3): ``mimetype`` member declares
  ``application/vnd.oasis.opendocument.text``; ``content.xml`` holds
  ``text:p`` / ``text:h`` paragraphs with ``text:tab``,
  ``text:line-break``, and ``text:s`` (run-length spaces) whitespace
  elements; tables are ``table:table`` > ``table-row`` > ``table-cell``.
- XLSX (ECMA-376 SpreadsheetML, round 13): ``xl/worksheets/sheetN.xml``
  rows, cells resolved through ``xl/sharedStrings.xml`` (``t="s"``,
  rich ``<r>`` runs concatenated), inline strings (``t="inlineStr"``),
  and raw ``<v>`` values; one line per row, cells tab-joined, sheets
  in numeric order.
- PPTX (ECMA-376 PresentationML, round 13): ``ppt/slides/slideN.xml``
  in numeric order; each ``a:p`` paragraph is one line (``a:t`` runs,
  ``a:br`` newline, ``a:tab`` tab); slides separated by form feeds —
  the same page convention as pdfcodec.
- EPUB (OCF/OPF, round 13): ``META-INF/container.xml`` names the
  package document; its ``<spine>`` orders the manifest's XHTML
  chapters, each extracted through the HTML codec, chapters separated
  by form feeds.

Whitespace semantics (deterministic, tested):
- each paragraph / heading / sheet row is one output line;
- table rows / sheet rows are one line each, cells joined by tabs (a
  DOCX/ODT cell's inner paragraphs joined by a single space);
- DOCX part order: headers, body, footers.

Every failure mode (corrupt zip, missing part, encrypted/locked
members, malformed XML, non-document zip) raises ``ValueError`` so the
caller's ``on_error`` policy (multimodal.extract_text) applies
uniformly.
"""
from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

__all__ = [
    "sniff_office",
    "extract_docx_text",
    "extract_odt_text",
    "extract_xlsx_text",
    "extract_pptx_text",
    "extract_epub_text",
    "extract_office_text",
    "office_title",
]

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_T = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TBL = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_SS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"

_ODT_MIME = b"mimetypeapplication/vnd.oasis.opendocument.text"
_EPUB_MIME = b"mimetypeapplication/epub+zip"


def sniff_office(blob: bytes) -> str | None:
    """'docx' / 'odt' / 'xlsx' / 'pptx' / 'epub' / None for a PK-magic
    blob. The ODT/EPUB fast path is the spec's own guarantee (ODF §3.2
    and OCF both mandate ``mimetype`` as the FIRST member, STORED, so
    its name+bytes sit at a fixed offset); the OOXML kinds need the
    central directory for their marker member."""
    if not blob.startswith(b"PK\x03\x04"):
        return None
    # ODT/EPUB: local header (30 bytes) + 'mimetype' + literal mime
    # bytes (OCF and ODF both mandate the first-member STORED layout)
    if blob[30:30 + len(_ODT_MIME)] == _ODT_MIME:
        return "odt"
    if blob[30:30 + len(_EPUB_MIME)] == _EPUB_MIME:
        return "epub"
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            names = set(zf.namelist())
    except Exception:
        return None
    if "word/document.xml" in names:
        return "docx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    if "mimetype" in names:
        try:
            with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                mime = zf.read("mimetype")
            if mime.startswith(b"application/vnd.oasis.opendocument.text"):
                return "odt"
            if mime.startswith(b"application/epub+zip"):
                return "epub"
        except Exception:
            return None
    return None


def _open_zip(blob: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(blob))
    except zipfile.BadZipFile as e:
        raise ValueError(f"corrupt zip container: {e}") from e


def _read_member(zf: zipfile.ZipFile, name: str) -> bytes:
    try:
        return zf.read(name)
    except KeyError as e:
        raise ValueError(f"zip member missing: {name}") from e
    except (RuntimeError, NotImplementedError, zipfile.BadZipFile) as e:
        # encrypted ('password required') or unsupported compression
        raise ValueError(f"unreadable zip member {name}: {e}") from e


def _parse_xml(data: bytes, part: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed XML in {part}: {e}") from e


# ---------------------------------------------------------------- DOCX

def _docx_para_text(p) -> str:
    """Flatten one w:p: w:t text, w:tab -> \\t, w:br / w:cr -> \\n."""
    out: list[str] = []
    for el in p.iter():
        tag = el.tag
        if tag == f"{_W}t":
            out.append(el.text or "")
        elif tag == f"{_W}tab":
            out.append("\t")
        elif tag in (f"{_W}br", f"{_W}cr"):
            out.append("\n")
    return "".join(out)


def _docx_block_lines(root) -> list[str]:
    """Lines for the direct block children of a body-like element:
    paragraphs one line each, tables one line per row (cells joined by
    tabs, a cell's paragraphs joined by a space)."""
    lines: list[str] = []
    for child in root:
        tag = child.tag
        if tag == f"{_W}p":
            lines.append(_docx_para_text(child))
        elif tag == f"{_W}tbl":
            for tr in child.iter(f"{_W}tr"):
                cells = []
                for tc in tr.findall(f"{_W}tc"):
                    cells.append(
                        " ".join(
                            _docx_para_text(p) for p in tc.iter(f"{_W}p")
                        )
                    )
                lines.append("\t".join(cells))
        elif tag == f"{_W}sdt":
            # structured document tag: recurse into its content block
            content = child.find(f"{_W}sdtContent")
            if content is not None:
                lines.extend(_docx_block_lines(content))
    return lines


# headers/footers sorted by the numeric suffix so header1, header2, …
_HDR_RE = re.compile(r"^word/(header|footer)(\d+)\.xml$")


def extract_docx_text(blob: bytes) -> str:
    """Text of a DOCX blob: headers, then the document body, then
    footers; one line per paragraph / table row."""
    with _open_zip(blob) as zf:
        names = zf.namelist()
        if "word/document.xml" not in names:
            raise ValueError("not a DOCX: word/document.xml missing")
        headers, footers = [], []
        for n in names:
            m = _HDR_RE.match(n)
            if m:
                (headers if m.group(1) == "header" else footers).append(
                    (int(m.group(2)), n)
                )
        lines: list[str] = []
        for _, n in sorted(headers):
            lines.extend(_docx_block_lines(_part_body(zf, n)))
        body = _parse_xml(
            _read_member(zf, "word/document.xml"), "word/document.xml"
        ).find(f"{_W}body")
        if body is None:
            raise ValueError("DOCX document.xml has no w:body")
        lines.extend(_docx_block_lines(body))
        for _, n in sorted(footers):
            lines.extend(_docx_block_lines(_part_body(zf, n)))
    return "\n".join(lines).strip()


def _part_body(zf: zipfile.ZipFile, name: str):
    """A header/footer part's root element (w:hdr / w:ftr) — its
    children are the same block content as w:body's."""
    return _parse_xml(_read_member(zf, name), name)


# ----------------------------------------------------------------- ODT

def _odt_para_text(p) -> str:
    """Flatten one text:p / text:h, expanding ODF whitespace elements
    in document order (ElementTree: element text, then each child's
    expansion, then the child's tail)."""
    out: list[str] = []

    def walk(el) -> None:
        tag = el.tag
        if tag == f"{_T}tab":
            out.append("\t")
        elif tag == f"{_T}line-break":
            out.append("\n")
        elif tag == f"{_T}s":
            out.append(" " * int(el.get(f"{_T}c", "1") or "1"))
        if el.text and tag not in (f"{_T}tab", f"{_T}line-break", f"{_T}s"):
            out.append(el.text)
        for ch in el:
            walk(ch)
            if ch.tail:
                out.append(ch.tail)

    out.append(p.text or "")
    for ch in p:
        walk(ch)
        if ch.tail:
            out.append(ch.tail)
    return "".join(out)


def _odt_block_lines(root) -> list[str]:
    lines: list[str] = []
    for child in root:
        tag = child.tag
        if tag in (f"{_T}p", f"{_T}h"):
            lines.append(_odt_para_text(child))
        elif tag == f"{_TBL}table":
            for tr in child.iter(f"{_TBL}table-row"):
                cells = []
                for tc in tr.findall(f"{_TBL}table-cell"):
                    cells.append(
                        " ".join(
                            _odt_para_text(p)
                            for p in tc.iter()
                            if p.tag in (f"{_T}p", f"{_T}h")
                        )
                    )
                lines.append("\t".join(cells))
        elif tag == f"{_T}section":
            lines.extend(_odt_block_lines(child))
    return lines


def extract_odt_text(blob: bytes) -> str:
    """Text of an ODT blob (content.xml office:body > office:text)."""
    _O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
    with _open_zip(blob) as zf:
        root = _parse_xml(_read_member(zf, "content.xml"), "content.xml")
    body = root.find(f"{_O}body")
    text = body.find(f"{_O}text") if body is not None else None
    if text is None:
        raise ValueError("ODT content.xml has no office:body/office:text")
    return "\n".join(_odt_block_lines(text)).strip()


# ---------------------------------------------------------------- XLSX

_SHEET_RE = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")


def _xlsx_cell_text(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "s":  # shared-string index
        v = c.find(f"{_SS}v")
        try:
            idx = int((v.text or "").strip()) if v is not None else -1
        except ValueError:
            idx = -1
        return shared[idx] if 0 <= idx < len(shared) else ""
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(f"{_SS}t"))
    v = c.find(f"{_SS}v")  # numeric / boolean / formula-cached str
    return (v.text or "") if v is not None else ""


def extract_xlsx_text(blob: bytes) -> str:
    """Text of an XLSX blob: one line per sheet row, cells tab-joined
    in document order (empty-column GAPS are not reconstructed — cell
    addresses are ignored, which is the right shape for text mining,
    not for layout fidelity), sheets in numeric filename order."""
    with _open_zip(blob) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sst = _parse_xml(
                _read_member(zf, "xl/sharedStrings.xml"),
                "xl/sharedStrings.xml",
            )
            for si in sst.iter(f"{_SS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_SS}t"))
                )
        sheets = sorted(
            (int(m.group(1)), n)
            for n in names
            for m in (_SHEET_RE.match(n),)
            if m
        )
        if not sheets:
            raise ValueError("XLSX has no xl/worksheets/sheetN.xml")
        lines: list[str] = []
        for _, n in sheets:
            root = _parse_xml(_read_member(zf, n), n)
            for row in root.iter(f"{_SS}row"):
                lines.append(
                    "\t".join(
                        _xlsx_cell_text(c, shared)
                        for c in row.findall(f"{_SS}c")
                    )
                )
    return "\n".join(lines).strip()


# ---------------------------------------------------------------- PPTX

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def extract_pptx_text(blob: bytes) -> str:
    """Text of a PPTX blob: slides in numeric order separated by form
    feeds (the pdfcodec page convention); each a:p paragraph one line,
    a:t runs concatenated, a:br -> newline, a:tab -> tab."""
    with _open_zip(blob) as zf:
        names = set(zf.namelist())
        slides = sorted(
            (int(m.group(1)), n)
            for n in names
            for m in (_SLIDE_RE.match(n),)
            if m
        )
        if not slides:
            raise ValueError("PPTX has no ppt/slides/slideN.xml")
        pages: list[str] = []
        for _, n in slides:
            root = _parse_xml(_read_member(zf, n), n)
            lines: list[str] = []
            for p in root.iter(f"{_A}p"):
                out: list[str] = []
                for el in p.iter():
                    if el.tag == f"{_A}t":
                        out.append(el.text or "")
                    elif el.tag == f"{_A}br":
                        out.append("\n")
                    elif el.tag == f"{_A}tab":
                        out.append("\t")
                lines.append("".join(out))
            pages.append("\n".join(lines).strip())
    return "\f".join(pages).strip()


# ---------------------------------------------------------------- EPUB

_CNT = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"


def extract_epub_text(blob: bytes) -> str:
    """Text of an EPUB (OCF/OPF): META-INF/container.xml names the
    package document, whose <spine> orders the manifest's XHTML
    chapters; each chapter extracts through the HTML codec, chapters
    separated by form feeds (the pdfcodec page convention)."""
    import posixpath

    from .htmlcodec import extract_html_text

    with _open_zip(blob) as zf:
        container = _parse_xml(
            _read_member(zf, "META-INF/container.xml"),
            "META-INF/container.xml",
        )
        root = None
        for rf in container.iter(f"{_CNT}rootfile"):
            root = rf.get("full-path")
            if root:
                break
        if not root:
            raise ValueError("EPUB container.xml names no rootfile")
        opf = _parse_xml(_read_member(zf, root), root)
        base = posixpath.dirname(root)
        items: dict[str, tuple[str, str]] = {}
        for it in opf.iter(f"{_OPF}item"):
            iid = it.get("id")
            if iid:
                items[iid] = (it.get("href") or "", it.get("media-type") or "")
        pages: list[str] = []
        for ref in opf.iter(f"{_OPF}itemref"):
            href, mtype = items.get(ref.get("idref") or "", ("", ""))
            if not href or "xhtml" not in mtype and "html" not in mtype:
                continue
            member = posixpath.normpath(posixpath.join(base, href))
            got = extract_html_text(_read_member(zf, member))
            pages.append(got["text"].strip())
    if not pages:
        raise ValueError("EPUB spine has no XHTML chapters")
    return "\f".join(pages).strip()


_DC = "{http://purl.org/dc/elements/1.1/}"


def office_title(blob: bytes, kind: str) -> str:
    """Document title of an Office/ODF/EPUB container — cheap,
    dedup-useful curation metadata:

    - OOXML (docx/xlsx/pptx): ``docProps/core.xml`` ``<dc:title>``
      (ECMA-376 Part 2 §11 core properties);
    - ODT: ``meta.xml`` ``<dc:title>`` (ODF 1.2 §3.1.3.4);
    - EPUB: the package document's ``<dc:title>`` (OPF metadata).

    Missing part / element → "" (titles are optional everywhere);
    malformed XML in an otherwise-extractable document also → "" —
    a bad optional metadata part must not NULL the text."""
    part = {
        "docx": "docProps/core.xml",
        "xlsx": "docProps/core.xml",
        "pptx": "docProps/core.xml",
        "odt": "meta.xml",
    }.get(kind)
    try:
        with _open_zip(blob) as zf:
            if kind == "epub":
                container = _parse_xml(
                    _read_member(zf, "META-INF/container.xml"),
                    "META-INF/container.xml",
                )
                part = next(
                    (
                        rf.get("full-path")
                        for rf in container.iter(f"{_CNT}rootfile")
                        if rf.get("full-path")
                    ),
                    None,
                )
            if part is None or part not in zf.namelist():
                return ""
            root = _parse_xml(_read_member(zf, part), part)
    except ValueError:
        return ""
    el = next(root.iter(f"{_DC}title"), None)
    if el is None:
        return ""
    return re.sub(r"\s+", " ", "".join(el.itertext())).strip()


def extract_office_text(blob: bytes) -> tuple[str, str, str]:
    """(format, text, title) for a PK-magic blob; ValueError when the
    zip is not a recognized Office/ODF/EPUB document (plain archives
    included — the caller's on_error policy decides whether that kills
    the job)."""
    kind = sniff_office(blob)
    if kind == "docx":
        text = extract_docx_text(blob)
    elif kind == "odt":
        text = extract_odt_text(blob)
    elif kind == "xlsx":
        text = extract_xlsx_text(blob)
    elif kind == "pptx":
        text = extract_pptx_text(blob)
    elif kind == "epub":
        text = extract_epub_text(blob)
    else:
        raise ValueError(
            "zip container is not a DOCX/ODT/XLSX/PPTX/EPUB document"
        )
    return kind, text, office_title(blob, kind)
