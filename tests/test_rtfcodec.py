"""RTF extraction (functions/rtfcodec.py): hand-built RTF pins the
control-word walk — groups/destinations, code-page and Unicode
escapes with the \\ucN fallback-skip convention, whitespace words,
symbol words, literal escapes — plus the Spark extract_text routing."""
from __future__ import annotations

import pytest

from littletable_spark.functions.rtfcodec import extract_rtf_text, sniff_rtf


def test_plain_and_whitespace_words():
    assert extract_rtf_text(rb"{\rtf1\ansi Hello World}") == "Hello World"
    assert extract_rtf_text(
        rb"{\rtf1\ansi\ansicpg1252 Line one\par Line two\tab tabbed}"
    ) == "Line one\nLine two\ttabbed"
    # table row/cell words flatten like the office codecs (trailing
    # cell/row whitespace strips)
    assert extract_rtf_text(
        rb"{\rtf1 a\cell b\cell\row c\cell d\cell\row}"
    ) == "a\tb\t\nc\td"


def test_destinations_skipped_body_kept():
    src = (
        rb"{\rtf1\ansi"
        rb"{\fonttbl{\f0\fswiss Helvetica;}{\f1 Times;}}"
        rb"{\colortbl;\red255\green0\blue0;}"
        rb"{\info{\author Nobody}}"
        rb"{\*\generator Riched20 10.0;}"
        rb"\f0\fs24 Body \b bold\b0  text}"
    )
    assert extract_rtf_text(src) == "Body bold text"


def test_codepage_and_hex_escapes():
    assert extract_rtf_text(rb"{\rtf1 caf\'e9 \'80 sign}") == "café € sign"
    # cp1251 declared: 0xE0 is Cyrillic а
    assert extract_rtf_text(
        rb"{\rtf1\ansi\ansicpg1251 \'e0\'e1\'e2}"
    ) == "абв"


def test_unicode_escapes_and_uc_fallback():
    # default \uc1: the one fallback char ('?') is swallowed
    assert extract_rtf_text(rb"{\rtf1 \u233 ? rest}") == "é rest"
    # \uc2 swallows two fallback chars ('ab')
    assert extract_rtf_text(rb"{\rtf1\uc2 \u233 ab rest}") == "é rest"
    # a \'hh fallback counts as ONE skipped character
    assert extract_rtf_text(rb"{\rtf1 \u233 \'e9 tail}") == "é tail"
    # negative = 16-bit two's complement
    assert extract_rtf_text(rb"{\rtf1 \u-32513 ?}") == chr(65536 - 32513)
    # \uc is group-scoped: restored on group close
    assert extract_rtf_text(
        rb"{\rtf1 {\uc2 \u233 ab}\u234 ? z}"
    ) == "éê z"


def test_literal_escapes_and_symbols():
    assert extract_rtf_text(
        rb"{\rtf1 br\{ace\} back\\slash}"
    ) == "br{ace} back\\slash"
    assert extract_rtf_text(
        rb"{\rtf1 a\emdash b\endash c\rquote\ldblquote q\rdblquote\bullet}"
    ) == "a—b–c’“q”•"
    assert extract_rtf_text(rb"{\rtf1 non\~breaking}") == "non breaking"


def test_bin_skips_raw_bytes():
    # \bin5 payload may contain braces/backslashes that must NOT parse
    src = rb"{\rtf1 pre{\*\objdata \bin5 }\{x\ junk}post}"
    assert extract_rtf_text(src) == "prepost"


def test_rejections():
    with pytest.raises(ValueError, match="not an RTF"):
        extract_rtf_text(b"plain text")
    with pytest.raises(ValueError, match="unbalanced"):
        extract_rtf_text(b"{\\rtf1 x}}")
    assert sniff_rtf(b"{\\rtf1") and not sniff_rtf(b"{rtf")


def test_extract_text_routes_rtf(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    rows = [
        {"id": 0, "blob": rb"{\rtf1\ansi RTF body\par second line}"},
        {"id": 1, "blob": b"plain utf-8"},
    ]
    t = Table("blobs", spark=spark)
    t.insert_many(rows)
    out = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert out[0].doc_format == "rtf"
    assert out[0].text == "RTF body\nsecond line"
    assert out[1].doc_format == "text"


def test_u_fallback_scope_ends_with_group():
    """Round 14: a \\uN as the LAST token of a group must not swallow
    the first chars of the parent group's following text — per spec
    the fallback scope ends at the group boundary."""
    from littletable_spark.functions.rtfcodec import extract_rtf_text

    assert extract_rtf_text(rb"{\rtf1{\uc1\u1055}text}") == "\u041ftext"
    # two pending fallback chars when the group closes
    assert extract_rtf_text(rb"{\rtf1{\uc2\u1055}ab}") == "\u041fab"
    # inside the SAME group the fallback is still consumed
    assert extract_rtf_text(rb"{\rtf1{\uc1\u1055 Xtail}}") == "\u041ftail"
