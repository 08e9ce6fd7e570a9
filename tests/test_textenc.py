"""Charset-tolerant plain-text decoding (functions/textenc.py): the
BOM → UTF-8 strict → detected 8-bit/shift-jis → latin-1 ladder, the
binary-junk guard, and the Spark extract_text routing with the new
``encoding`` column."""
from __future__ import annotations

import pytest

from littletable_spark.functions.textenc import decode_text_blob


# ---------------------------------------------------------------- BOMs
def test_utf8_bom():
    text, enc = decode_text_blob(b"\xef\xbb\xbf" + "héllo".encode("utf-8"))
    assert (text, enc) == ("héllo", "utf-8-sig")


def test_utf16_le_bom():
    t = "Доброе утро"
    assert decode_text_blob(b"\xff\xfe" + t.encode("utf-16-le")) == (
        t,
        "utf-16-le",
    )


def test_utf16_be_bom():
    assert decode_text_blob(b"\xfe\xff" + "héllo".encode("utf-16-be")) == (
        "héllo",
        "utf-16-be",
    )


def test_utf32_le_bom_beats_utf16_prefix():
    # UTF-32-LE's BOM starts with UTF-16-LE's — longest prefix wins
    t = "abc"
    blob = b"\xff\xfe\x00\x00" + t.encode("utf-32-le")
    assert decode_text_blob(blob) == (t, "utf-32-le")


def test_utf32_be_bom():
    t = "abc"
    blob = b"\x00\x00\xfe\xff" + t.encode("utf-32-be")
    assert decode_text_blob(blob) == (t, "utf-32-be")


def test_lying_bom_raises():
    with pytest.raises(UnicodeDecodeError):
        decode_text_blob(b"\xfe\xff" + b"\xd8\x00\x41")  # lone surrogate


# ------------------------------------------------------------- ladder
def test_plain_ascii_is_utf8():
    assert decode_text_blob(b"hello world") == ("hello world", "utf-8")


def test_utf8_strict_wins():
    t = "naïve — déjà vu ✓"
    assert decode_text_blob(t.encode("utf-8")) == (t, "utf-8")


def test_cp1251_cyrillic_runs():
    t = "Привет мир, как дела сегодня"
    assert decode_text_blob(t.encode("cp1251")) == (t, "cp1251")


def test_latin1_accents_decode_as_cp1252():
    # isolated accents inside ASCII words -> Western European; cp1252
    # is a latin-1 superset so the text round-trips identically
    t = "café au lait, déjà vu, señor"
    text, enc = decode_text_blob(t.encode("latin-1"))
    assert text == t
    assert enc == "cp1252"


def test_cp1252_smart_quotes():
    t = "the “best” café — really"
    assert decode_text_blob(t.encode("cp1252")) == (t, "cp1252")


def test_shift_jis():
    t = "こんにちは世界、元気ですか"
    assert decode_text_blob(t.encode("shift_jis")) == (t, "shift_jis")


def test_empty_blob():
    assert decode_text_blob(b"") == ("", "utf-8")


def test_undetectable_falls_to_latin1():
    # a lone 0x81 byte: invalid UTF-8, shift-jis lead byte without a
    # trail... exercise the final total fallback
    text, enc = decode_text_blob(b"x \x81y \xfe z")
    assert enc in ("latin-1", "cp1252")
    assert len(text) == len(b"x \x81y \xfe z")


# ------------------------------------------------------- binary guard
def test_nul_bytes_raise():
    with pytest.raises(ValueError):
        decode_text_blob(b"MZ\x90\x00\x03\x00\x00\x00text inside")


def test_control_heavy_raises():
    with pytest.raises(ValueError):
        decode_text_blob(bytes(range(1, 32)) * 8)


def test_text_control_chars_ok():
    t = "line1\nline2\ttab\fpage\r\n"
    assert decode_text_blob(t.encode("utf-8")) == (t, "utf-8")


# ----------------------------------------------------- Spark routing
def test_extract_text_encoding_column(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    rows = [
        {"id": 1, "blob": "plain utf-8 text".encode("utf-8")},
        {"id": 2, "blob": "café déjà vu, señor".encode("latin-1")},
        {"id": 3, "blob": "Привет мир, как дела".encode("cp1251")},
        {"id": 4, "blob": b"\xff\xfe" + "wide text".encode("utf-16-le")},
        {"id": 5, "blob": b"\x00\x01\x02binary junk\x00\x00"},
        {"id": 6, "blob": b"%PDF-1.4\ngarbage"},  # pdf path: no encoding
    ]
    t = Table("txt", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[1].text == "plain utf-8 text"
    assert out[1].encoding == "utf-8"
    assert out[2].text == "café déjà vu, señor"
    assert out[2].encoding == "cp1252"
    assert out[3].text == "Привет мир, как дела"
    assert out[3].encoding == "cp1251"
    assert out[4].text == "wide text"
    assert out[4].encoding == "utf-16-le"
    assert out[5].text is None and out[5].encoding is None
    assert out[6].text is None
    for r in out.values():
        if r.doc_format not in (None, "text"):
            assert r.encoding is None
