"""Legacy .ppt extraction (functions/doccodec.py extract_ppt_text):
test-side MS-PPT record builders over the test-side CFB writer pin
the record walk (container recursion, TextCharsAtom UTF-16LE,
TextBytesAtom ANSI, slide buckets, SlideListWithText persist order,
encrypted-deck rejection), plus the OLE SummaryInformation title
reader (MS-OLEPS) and the Spark extract_text routing."""
from __future__ import annotations

import struct

import pytest

from littletable_spark.functions.doccodec import (
    CompoundFile,
    extract_ole_text,
    extract_ppt_text,
    ole_title,
)

from test_doccodec import write_cfb

# MS-PPT record types used by the fixtures
DOCUMENT = 0x03E8
SLIDE = 0x03EE
SLIDEPERSIST = 0x03F3
SLIDELISTWITHTEXT = 0x0FF0
TEXTCHARS = 0x0FA0
TEXTBYTES = 0x0FA8
CRYPT = 0x2F14
DRAWING = 0x040C  # PPDrawing container (OfficeArt host)


def atom(rtype: int, payload: bytes, instance: int = 0) -> bytes:
    return struct.pack("<HHI", instance << 4, rtype, len(payload)) + payload


def container(rtype: int, *children: bytes, instance: int = 0) -> bytes:
    body = b"".join(children)
    return (
        struct.pack("<HHI", 0xF | (instance << 4), rtype, len(body)) + body
    )


def ppt_blob(ppt_stream: bytes, extra: dict | None = None) -> bytes:
    streams = {"PowerPoint Document": ppt_stream}
    if extra:
        streams.update(extra)
    return write_cfb(streams)


def summary_information(
    title: str, codepage: int = 1252, wide: bool = False
) -> bytes:
    """MS-OLEPS SummaryInformation stream: codepage (PID 1, VT_I2) +
    title (PID 2, VT_LPSTR or VT_LPWSTR)."""
    if wide:
        raw = title.encode("utf-16-le") + b"\x00\x00"
        val = struct.pack("<II", 31, len(raw) // 2) + raw
    else:
        raw = title.encode(f"cp{codepage}") + b"\x00"
        val = struct.pack("<II", 30, len(raw)) + raw
    cpval = struct.pack("<IHH", 2, codepage, 0)  # VT_I2 + pad
    off_cp = 8 + 8 * 2
    off_title = off_cp + len(cpval)
    section = (
        struct.pack("<II", off_title + len(val), 2)
        + struct.pack("<II", 1, off_cp)
        + struct.pack("<II", 2, off_title)
        + cpval
        + val
    )
    # FMTID F29F85E0-4FF9-1068-AB91-08002B27B3D9, section at offset 48
    head = (
        struct.pack("<HHI", 0xFFFE, 0, 0x00020006)
        + b"\x00" * 16
        + struct.pack("<I", 1)
        + bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
        + struct.pack("<I", 48)
    )
    return head + section


# ------------------------------------------------------------ records
def test_textchars_and_textbytes_slides():
    stream = container(
        DOCUMENT,
        container(
            SLIDE,
            atom(TEXTCHARS, "Wide Title".encode("utf-16-le")),
            atom(TEXTBYTES, b"ansi body"),
        ),
        container(
            SLIDE,
            atom(TEXTBYTES, b"second slide"),
        ),
    )
    assert extract_ppt_text(ppt_blob(stream)) == (
        "Wide Title\nansi body\fsecond slide"
    )


def test_officeart_nesting_recurses():
    # text atoms buried two container levels deep (PPDrawing-style)
    stream = container(
        DOCUMENT,
        container(
            SLIDE,
            container(
                DRAWING,
                container(0xF004, atom(TEXTBYTES, b"deep text")),
            ),
        ),
    )
    assert extract_ppt_text(ppt_blob(stream)) == "deep text"


def test_slidelistwithtext_persist_buckets():
    # outline text: SlidePersistAtom opens each slide's bucket
    stream = container(
        DOCUMENT,
        container(
            SLIDELISTWITHTEXT,
            atom(SLIDEPERSIST, b"\x00" * 20),
            atom(TEXTCHARS, "slide one".encode("utf-16-le")),
            atom(SLIDEPERSIST, b"\x00" * 20),
            atom(TEXTBYTES, b"slide two"),
        ),
    )
    assert extract_ppt_text(ppt_blob(stream)) == "slide one\fslide two"


def test_paragraph_marks_flatten():
    stream = container(
        DOCUMENT,
        container(
            SLIDE,
            atom(TEXTBYTES, b"line a\rline b\x0bline c"),
        ),
    )
    assert extract_ppt_text(ppt_blob(stream)) == "line a\nline b\nline c"


def test_empty_deck_raises():
    stream = container(DOCUMENT, container(SLIDE))
    with pytest.raises(ValueError):
        extract_ppt_text(ppt_blob(stream))


def test_encrypted_deck_raises():
    stream = container(
        DOCUMENT,
        container(CRYPT, atom(0x2F15, b"\x00" * 8)),
        container(SLIDE, atom(TEXTBYTES, b"hidden")),
    )
    with pytest.raises(ValueError, match="encrypted"):
        extract_ppt_text(ppt_blob(stream))


def test_extract_ole_text_routes_ppt():
    stream = container(
        DOCUMENT, container(SLIDE, atom(TEXTBYTES, b"routed"))
    )
    kind, text, title = extract_ole_text(ppt_blob(stream))
    assert (kind, text, title) == ("ppt", "routed", "")


# -------------------------------------------------------------- title
def test_ole_title_lpstr():
    stream = container(
        DOCUMENT, container(SLIDE, atom(TEXTBYTES, b"body"))
    )
    blob = ppt_blob(
        stream,
        {"\x05SummaryInformation": summary_information("Quarterly Deck")},
    )
    kind, text, title = extract_ole_text(blob)
    assert (kind, text, title) == ("ppt", "body", "Quarterly Deck")


def test_ole_title_lpwstr_and_codepage():
    stream = container(
        DOCUMENT, container(SLIDE, atom(TEXTBYTES, b"body"))
    )
    blob = ppt_blob(
        stream,
        {
            "\x05SummaryInformation": summary_information(
                "Отчёт за квартал", wide=True
            )
        },
    )
    assert extract_ole_text(blob)[2] == "Отчёт за квартал"
    blob2 = ppt_blob(
        stream,
        {
            "\x05SummaryInformation": summary_information(
                "Отчёт", codepage=1251
            )
        },
    )
    assert extract_ole_text(blob2)[2] == "Отчёт"


def test_ole_title_absent_or_corrupt_is_empty():
    stream = container(
        DOCUMENT, container(SLIDE, atom(TEXTBYTES, b"body"))
    )
    assert ole_title(CompoundFile(ppt_blob(stream))) == ""
    corrupt = ppt_blob(stream, {"\x05SummaryInformation": b"\xfe\xff\x00"})
    assert extract_ole_text(corrupt) == ("ppt", "body", "")


# ----------------------------------------------------- Spark routing
def test_extract_text_routes_ppt(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    stream = container(
        DOCUMENT,
        container(
            SLIDE, atom(TEXTCHARS, "Deck body".encode("utf-16-le"))
        ),
    )
    rows = [
        {
            "id": 1,
            "blob": ppt_blob(
                stream,
                {"\x05SummaryInformation": summary_information("A Deck")},
            ),
        },
        {"id": 2, "blob": write_cfb({"NotADocStream": b"\x00" * 16})},
    ]
    t = Table("decks", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[1].doc_format == "ppt"
    assert out[1].text == "Deck body"
    assert out[1].title == "A Deck"
    assert out[2].doc_format is None and out[2].text is None
