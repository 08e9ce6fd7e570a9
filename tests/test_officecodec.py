"""DOCX / ODT extraction (functions/officecodec.py): fixture writers
build real zip containers with hand-built WordprocessingML / ODF XML —
paragraph, tab/break, table, header/footer, and run-length-space
semantics are all pinned, plus every failure route (corrupt zip,
encrypted member, non-document zip) and the Spark extract_text
composition into token_stats."""
from __future__ import annotations

import io
import zipfile

import pytest

from littletable_spark.functions.officecodec import (
    extract_docx_text,
    extract_odt_text,
    extract_office_text,
    sniff_office,
)

_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_ODF_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
)


def make_docx(body_xml: str, headers=(), footers=()) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document {_W_NS}>'
            f"<w:body>{body_xml}</w:body></w:document>",
        )
        for i, h in enumerate(headers, 1):
            zf.writestr(
                f"word/header{i}.xml",
                f'<?xml version="1.0"?><w:hdr {_W_NS}>{h}</w:hdr>',
            )
        for i, f_ in enumerate(footers, 1):
            zf.writestr(
                f"word/footer{i}.xml",
                f'<?xml version="1.0"?><w:ftr {_W_NS}>{f_}</w:ftr>',
            )
    return buf.getvalue()


def make_odt(text_body_xml: str) -> bytes:
    """ODF-conformant container: 'mimetype' FIRST and STORED (that
    placement is what the sniff fast path reads)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.text",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            "content.xml",
            f'<?xml version="1.0"?><office:document-content {_ODF_NS}>'
            f"<office:body><office:text>{text_body_xml}</office:text>"
            "</office:body></office:document-content>",
        )
    return buf.getvalue()


def _p(text: str) -> str:
    return f"<w:p><w:r><w:t>{text}</w:t></w:r></w:p>"


def test_docx_paragraphs_tabs_breaks():
    body = (
        "<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t xml:space='preserve'> "
        "world</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>c</w:t></w:r></w:p>"
    )
    blob = make_docx(body)
    assert sniff_office(blob) == "docx"
    assert extract_docx_text(blob) == "Hello world\na\tb\nc"


def test_docx_table_rows_tab_joined():
    tbl = (
        "<w:tbl>"
        f"<w:tr><w:tc>{_p('h1')}</w:tc><w:tc>{_p('h2')}</w:tc></w:tr>"
        f"<w:tr><w:tc>{_p('a')}{_p('b')}</w:tc><w:tc>{_p('c')}</w:tc></w:tr>"
        "</w:tbl>"
    )
    blob = make_docx(_p("before") + tbl + _p("after"))
    # a cell's inner paragraphs join with a space; cells join with tabs
    assert extract_docx_text(blob) == "before\nh1\th2\na b\tc\nafter"


def test_docx_headers_body_footers_order():
    blob = make_docx(
        _p("BODY"),
        headers=[_p("HDR1"), _p("HDR2")],
        footers=[_p("FTR")],
    )
    assert extract_docx_text(blob) == "HDR1\nHDR2\nBODY\nFTR"


def test_odt_paragraph_whitespace_elements():
    body = (
        "<text:h>Title</text:h>"
        "<text:p>a<text:tab/>b<text:line-break/>c</text:p>"
        "<text:p>x<text:s text:c='3'/>y<text:s/>z</text:p>"
        "<text:p>spanned <text:span>inner</text:span> tail</text:p>"
    )
    blob = make_odt(body)
    assert sniff_office(blob) == "odt"
    assert extract_odt_text(blob) == (
        "Title\na\tb\nc\nx   y z\nspanned inner tail"
    )


def test_odt_table_rows():
    body = (
        "<text:p>pre</text:p>"
        "<table:table>"
        "<table:table-row>"
        "<table:table-cell><text:p>r1c1</text:p></table:table-cell>"
        "<table:table-cell><text:p>r1c2</text:p></table:table-cell>"
        "</table:table-row>"
        "<table:table-row>"
        "<table:table-cell><text:p>r2c1</text:p><text:p>more</text:p>"
        "</table:table-cell>"
        "<table:table-cell><text:p>r2c2</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table>"
    )
    blob = make_odt(body)
    assert extract_odt_text(blob) == "pre\nr1c1\tr1c2\nr2c1 more\tr2c2"


def test_non_document_zip_rejected():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "not a document")
    blob = buf.getvalue()
    assert sniff_office(blob) is None
    with pytest.raises(ValueError, match="not a DOCX/ODT/XLSX/PPTX"):
        extract_office_text(blob)


def test_corrupt_zip_rejected():
    blob = make_docx(_p("x"))[:40]  # truncated: PK magic, broken body
    with pytest.raises(ValueError):
        extract_office_text(blob)


def _set_encrypted_flag(blob: bytes, member: bytes) -> bytes:
    """Flip the encryption bit (general-purpose flag bit 0) for one
    member in both the local header and the central directory — the
    'password required' shape zipfile refuses to read."""
    b = bytearray(blob)
    for sig, name_off, flag_off in (
        (b"PK\x03\x04", 30, 6),   # local header
        (b"PK\x01\x02", 46, 8),   # central directory
    ):
        i = 0
        while True:
            i = b.find(sig, i)
            if i < 0:
                break
            if bytes(b[i + name_off:i + name_off + len(member)]) == member:
                b[i + flag_off] |= 1
            i += 4
    return bytes(b)


def test_encrypted_member_routes_to_valueerror():
    blob = _set_encrypted_flag(make_odt("<text:p>secret</text:p>"),
                               b"content.xml")
    assert sniff_office(blob) == "odt"  # fast path reads mimetype only
    with pytest.raises(ValueError, match="unreadable zip member"):
        extract_odt_text(blob)


def test_extract_text_routes_office_blobs(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text
    from littletable_spark.operators.textops import token_stats

    rows = [
        {"id": 0, "blob": make_docx(_p("alpha beta") + _p("gamma"))},
        {"id": 1, "blob": make_odt("<text:p>delta epsilon</text:p>")},
        {"id": 2, "blob": b"plain utf-8 text"},
        {"id": 3, "blob": make_docx(_p("x"))[:40]},  # corrupt
    ]
    t = Table("blobs", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[0].doc_format == "docx" and out[0].text == "alpha beta\ngamma"
    assert out[1].doc_format == "odt" and out[1].text == "delta epsilon"
    assert out[2].doc_format == "text"
    assert out[3].text is None and out[3].doc_format is None

    # corrupt blob kills the job under on_error='raise'
    with pytest.raises(Exception):
        extract_text(t, "blob", "id", on_error="raise").df.collect()

    # composition: extracted office text feeds token_stats
    txt = extract_text(t, "blob", "id", on_error="null")
    stats = {
        r.id: r.n_tokens
        for r in token_stats(
            Table.from_df(txt.df.where("text is not null"), name="txt"),
            "text",
            "id",
        )
    }
    assert stats[0] == 3 and stats[1] == 2


_SS_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_P_NS = (
    'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
)


def make_xlsx(sheets: dict[int, str], shared_xml: str = "") -> bytes:
    """sheets: {sheet_number: <sheetData inner xml>}."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", f"<workbook {_SS_NS}/>")
        if shared_xml:
            zf.writestr(
                "xl/sharedStrings.xml", f"<sst {_SS_NS}>{shared_xml}</sst>"
            )
        for num, inner in sheets.items():
            zf.writestr(
                f"xl/worksheets/sheet{num}.xml",
                f"<worksheet {_SS_NS}><sheetData>{inner}</sheetData>"
                "</worksheet>",
            )
    return buf.getvalue()


def make_pptx(slides: dict[int, str]) -> bytes:
    """slides: {slide_number: <spTree inner xml using p:/a: prefixes>}."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("ppt/presentation.xml", f"<p:presentation {_P_NS}/>")
        for num, inner in slides.items():
            zf.writestr(
                f"ppt/slides/slide{num}.xml",
                f"<p:sld {_P_NS}><p:cSld><p:spTree>{inner}"
                "</p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()


def test_xlsx_shared_inline_and_numeric_cells():
    from littletable_spark.functions.officecodec import extract_xlsx_text

    shared = "<si><t>hello</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si>"
    sheet = (
        '<row><c t="s"><v>0</v></c><c><v>42</v></c></row>'
        '<row><c t="s"><v>1</v></c>'
        '<c t="inlineStr"><is><t>inline</t></is></c></row>'
        '<row><c t="s"><v>99</v></c><c/></row>'  # oob index + empty cell
    )
    blob = make_xlsx({1: sheet}, shared)
    assert sniff_office(blob) == "xlsx"
    # the oob-index + empty-cell row renders as "\t" and strips away
    assert extract_xlsx_text(blob) == "hello\t42\nrich\tinline"


def test_xlsx_multi_sheet_numeric_order():
    from littletable_spark.functions.officecodec import extract_xlsx_text

    blob = make_xlsx({
        10: '<row><c><v>third</v></c></row>',
        2: '<row><c><v>second</v></c></row>',
        1: '<row><c><v>first</v></c></row>',
    })
    assert extract_xlsx_text(blob) == "first\nsecond\nthird"


def test_pptx_slides_runs_breaks_tabs():
    from littletable_spark.functions.officecodec import extract_pptx_text

    s1 = (
        "<p:sp><p:txBody>"
        "<a:p><a:r><a:t>Title here</a:t></a:r><a:br/>"
        "<a:r><a:t>after break</a:t></a:r></a:p>"
        "<a:p><a:r><a:t>a</a:t></a:r><a:tab/><a:r><a:t>b</a:t></a:r></a:p>"
        "</p:txBody></p:sp>"
    )
    s2 = "<p:sp><p:txBody><a:p><a:r><a:t>second slide</a:t></a:r></a:p></p:txBody></p:sp>"
    blob = make_pptx({2: s2, 1: s1})
    assert sniff_office(blob) == "pptx"
    assert extract_pptx_text(blob) == (
        "Title here\nafter break\na\tb\fsecond slide"
    )


def test_extract_text_routes_xlsx_pptx(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    rows = [
        {"id": 0, "blob": make_xlsx(
            {1: '<row><c t="s"><v>0</v></c></row>'}, "<si><t>cell</t></si>")},
        {"id": 1, "blob": make_pptx(
            {1: "<p:sp><p:txBody><a:p><a:r><a:t>slide text</a:t></a:r>"
                "</a:p></p:txBody></p:sp>"})},
    ]
    t = Table("blobs", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[0].doc_format == "xlsx" and out[0].text == "cell"
    assert out[1].doc_format == "pptx" and out[1].text == "slide text"


def make_epub(chapters: dict[str, str], spine: list[str],
              opf_dir: str = "OEBPS") -> bytes:
    """chapters: {id: body html}; spine: chapter ids in reading order."""
    cnt_ns = 'xmlns="urn:oasis:names:tc:opendocument:xmlns:container"'
    opf_ns = 'xmlns="http://www.idpf.org/2007/opf"'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"), "application/epub+zip",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            "META-INF/container.xml",
            f'<container {cnt_ns}><rootfiles>'
            f'<rootfile full-path="{opf_dir}/content.opf" '
            'media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>",
        )
        manifest = "".join(
            f'<item id="{cid}" href="ch/{cid}.xhtml" '
            'media-type="application/xhtml+xml"/>'
            for cid in chapters
        ) + '<item id="css" href="style.css" media-type="text/css"/>'
        spine_xml = "".join(f'<itemref idref="{cid}"/>' for cid in spine)
        zf.writestr(
            f"{opf_dir}/content.opf",
            f'<package {opf_ns} version="3.0">'
            f"<manifest>{manifest}</manifest>"
            f"<spine>{spine_xml}</spine></package>",
        )
        zf.writestr(f"{opf_dir}/style.css", "body {}")
        for cid, body in chapters.items():
            zf.writestr(
                f"{opf_dir}/ch/{cid}.xhtml",
                "<html><head><title>t</title></head>"
                f"<body>{body}</body></html>",
            )
    return buf.getvalue()


def test_epub_spine_order_and_html_extraction():
    from littletable_spark.functions.officecodec import extract_epub_text

    blob = make_epub(
        {"c2": "<p>Second chapter.</p>",
         "c1": "<h1>First</h1><p>chapter one</p>"},
        spine=["c1", "c2"],
    )
    assert sniff_office(blob) == "epub"
    assert extract_epub_text(blob) == (
        "First\nchapter one\fSecond chapter."
    )
    # spine picks and orders: reversed spine reverses the text
    blob2 = make_epub(
        {"c1": "<p>one</p>", "c2": "<p>two</p>"}, spine=["c2", "c1"]
    )
    assert extract_epub_text(blob2) == "two\fone"


def test_epub_rejections_and_routing(spark):
    from littletable_spark import Table
    from littletable_spark.functions.officecodec import extract_epub_text
    from littletable_spark.operators.multimodal import extract_text

    # an epub-mimetyped zip without container.xml raises
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("mimetype"), "application/epub+zip",
                    compress_type=zipfile.ZIP_STORED)
    with pytest.raises(ValueError, match="container.xml"):
        extract_epub_text(buf.getvalue())

    blob = make_epub({"c1": "<p>book text</p>"}, spine=["c1"])
    t = Table("blobs", spark=spark)
    t.insert_many([{"id": 0, "blob": blob}])
    out = list(extract_text(t, "blob", "id"))
    assert out[0].doc_format == "epub" and out[0].text == "book text"


# ------------------------------------------------------------- titles
_CP_NS = (
    'xmlns:cp="http://schemas.openxmlformats.org/package/2006/'
    'metadata/core-properties" '
    'xmlns:dc="http://purl.org/dc/elements/1.1/"'
)


def _with_member(blob: bytes, name: str, data: str) -> bytes:
    """Re-zip an existing fixture with one extra member appended."""
    src = zipfile.ZipFile(io.BytesIO(blob))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for zi in src.infolist():
            zf.writestr(zi, src.read(zi.filename))
        zf.writestr(name, data)
    return buf.getvalue()


def test_docx_core_title():
    from littletable_spark.functions.officecodec import extract_office_text

    blob = _with_member(
        make_docx(_p("body")),
        "docProps/core.xml",
        f'<cp:coreProperties {_CP_NS}>'
        "<dc:title>  The   Annual\nReport </dc:title>"
        "</cp:coreProperties>",
    )
    assert extract_office_text(blob) == (
        "docx",
        "body",
        "The Annual Report",
    )


def test_odt_meta_title():
    from littletable_spark.functions.officecodec import extract_office_text

    meta = (
        '<office:document-meta '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<office:meta><dc:title>Ein Titel</dc:title></office:meta>"
        "</office:document-meta>"
    )
    blob = _with_member(
        make_odt("<text:p>odt body</text:p>"), "meta.xml", meta
    )
    assert extract_office_text(blob) == ("odt", "odt body", "Ein Titel")


def test_title_absent_or_malformed_is_empty():
    from littletable_spark.functions.officecodec import extract_office_text

    assert extract_office_text(make_docx(_p("b")))[2] == ""
    # malformed optional metadata part must not NULL the text
    blob = _with_member(
        make_docx(_p("b")), "docProps/core.xml", "<unclosed"
    )
    assert extract_office_text(blob) == ("docx", "b", "")
