"""SRT / WebVTT subtitle extraction (functions/subcodec.py) and its
routing through extract_text's charset ladder."""
from __future__ import annotations

import pytest

from littletable_spark.functions.subcodec import (
    extract_srt_text,
    extract_vtt_text,
    looks_like_srt,
    looks_like_vtt,
)

SRT = """1
00:00:01,000 --> 00:00:03,500
<i>Hello there.</i>

2
00:00:04,000 --> 00:00:06,000
Two lines of
dialog here.

3
00:01:00,000 --> 00:01:02,000
{\\an8}Positioned line.
"""

VTT = """WEBVTT - with a header comment

NOTE
this block is skipped
entirely

STYLE
::cue { color: red }

intro-cue-id
00:01.000 --> 00:03.000 align:start
<v Narrator>Welcome back.</v>

00:04.000 --> 00:06.000
Second cue,
continued.
"""


def test_srt_extraction_and_sniff():
    assert looks_like_srt(SRT)
    assert not looks_like_srt("just some prose\nwith lines")
    assert not looks_like_srt("1\n2\n3\n4\n")  # digits but no timing
    got = extract_srt_text(SRT)
    assert got.splitlines() == [
        "Hello there.",
        "Two lines of",
        "dialog here.",
        "Positioned line.",
    ]
    with pytest.raises(ValueError):
        extract_srt_text("1\n00:00:01,000 --> 00:00:02,000\n\n")


def test_srt_period_millis_and_no_index():
    # period separator + missing index lines (both appear in the wild)
    s = "00:00:01.000 --> 00:00:02.000\nBare cue.\n"
    assert looks_like_srt(s)
    assert extract_srt_text(s) == "Bare cue."


def test_vtt_extraction_blocks_ids_tags():
    assert looks_like_vtt(VTT)
    assert not looks_like_vtt(SRT)
    got = extract_vtt_text(VTT)
    assert got.splitlines() == [
        "Welcome back.",
        "Second cue,",
        "continued.",
    ]
    with pytest.raises(ValueError):
        extract_vtt_text("no header\n00:01.000 --> 00:02.000\nx\n")


def test_vtt_hour_timestamps():
    v = "WEBVTT\n\n01:02:03.000 --> 01:02:04.000\nLate cue.\n"
    assert extract_vtt_text(v) == "Late cue."


def test_extract_text_routes_generic_xml(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    rss = (
        '<?xml version="1.0"?><rss><channel><title>Feed</title>'
        "<item><title>Post one</title><description>Body text here"
        "</description></item></channel></rss>"
    ).encode()
    malformed = b'<?xml version="1.0"?><open><unclosed></open>'
    xhtml = (
        b'<?xml version="1.0"?><html><head><title>X</title></head>'
        b"<body><p>xhtml body</p></body></html>"
    )
    t = Table("xmls", spark=spark)
    t.insert_many(
        [
            {"id": 1, "blob": rss},
            {"id": 2, "blob": malformed},
            {"id": 3, "blob": xhtml},
        ]
    )
    got = {r.id: r for r in extract_text(t, "blob", "id", on_error="null")}
    assert got[1].doc_format == "xml"
    assert got[1].text.splitlines() == ["Feed", "Post one", "Body text here"]
    assert got[2].doc_format == "text"  # malformed degrades, not NULL
    assert got[2].text.startswith("<?xml")
    assert got[3].doc_format == "html"  # XHTML stays with the HTML codec
    assert got[3].title == "X"


def test_extract_text_routes_subtitles(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_text

    t = Table("subs", spark=spark)
    t.insert_many(
        [
            {"id": 1, "blob": SRT.encode()},
            {"id": 2, "blob": VTT.encode()},
            # latin-1 SRT: the charset ladder runs FIRST
            {"id": 3, "blob": (
                "1\n00:00:01,000 --> 00:00:02,000\ncafé déjà\n"
            ).encode("latin-1")},
            {"id": 4, "blob": b"ordinary prose stays text"},
        ]
    )
    got = {r.id: r for r in extract_text(t, "blob", "id").df.collect()}
    assert got[1].doc_format == "srt"
    assert got[1].text.startswith("Hello there.")
    assert got[2].doc_format == "vtt"
    assert "Welcome back." in got[2].text
    assert got[3].doc_format == "srt"
    assert got[3].text == "café déjà"
    assert got[3].encoding == "cp1252"
    assert got[4].doc_format == "text"
