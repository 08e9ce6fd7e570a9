"""extract_archive_text: one row per archive member through the same
per-document core as extract_text."""
from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pytest


def _zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _tar(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_zip_and_targz_members(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_archive_text

    zip_blob = _zip(
        {
            "readme.txt": b"plain member text",
            "docs/page.html": (
                b"<html><head><title>P</title></head>"
                b"<body><p>html member</p></body></html>"
            ),
            "subs/a.srt": b"1\n00:00:01,000 --> 00:00:02,000\nzip cue\n",
            "empty.txt": b"",
            "dir/": b"",
        }
    )
    targz_blob = gzip.compress(
        _tar(
            {
                "notes/a.txt": "texte caf\xe9".encode("latin-1"),
                # a compressed member inside the tar unwraps AGAIN
                "nested.txt.gz": gzip.compress(b"nested payload"),
            }
        )
    )
    t = Table("arc", spark=spark)
    t.insert_many(
        [
            {"id": 1, "blob": zip_blob},
            {"id": 2, "blob": targz_blob},
            {"id": 3, "blob": b"not an archive at all, just text"},
        ]
    )
    rows = extract_archive_text(t, "blob", "id", on_error="null").df.collect()
    got = {(r.id, r.member): r for r in rows}

    assert got[(1, "readme.txt")].doc_format == "text"
    assert got[(1, "readme.txt")].text == "plain member text"
    assert got[(1, "docs/page.html")].doc_format == "html"
    assert got[(1, "docs/page.html")].title == "P"
    assert got[(1, "subs/a.srt")].doc_format == "srt"
    assert got[(1, "subs/a.srt")].text == "zip cue"
    # empty member and directory entry are skipped
    assert (1, "empty.txt") not in got and (1, "dir/") not in got

    assert got[(2, "notes/a.txt")].text == "texte café"
    assert got[(2, "notes/a.txt")].encoding == "cp1252"
    assert got[(2, "nested.txt.gz")].text == "nested payload"

    # non-archive blob -> one null row with NULL member
    assert got[(3, None)].doc_format is None


def test_member_cap_and_binary_member(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_archive_text

    blob = _zip(
        {
            "big.txt": b"x" * 4096,
            "junk.bin": b"\x00\x01\x02\x03" * 16,  # binary -> member null
            "ok.txt": b"fine",
        }
    )
    t = Table("caps", spark=spark)
    t.insert_many([{"id": 1, "blob": blob}])
    rows = extract_archive_text(
        t, "blob", "id", on_error="null", member_cap=1024
    ).df.collect()
    got = {r.member: r for r in rows}
    assert got["big.txt"].doc_format is None  # over the declared cap
    assert got["junk.bin"].doc_format is None  # binary guard
    assert got["ok.txt"].text == "fine"

    with pytest.raises(Exception):
        extract_archive_text(
            t, "blob", "id", on_error="raise", member_cap=1024
        ).df.collect()
    with pytest.raises(ValueError):
        extract_archive_text(t, "blob", "id", on_error="bogus")


def test_max_members_bound(spark):
    from littletable_spark import Table
    from littletable_spark.operators.multimodal import extract_archive_text

    blob = _tar({f"f{i}.txt": b"m" for i in range(10)})
    t = Table("many", spark=spark)
    t.insert_many([{"id": 1, "blob": blob}])
    rows = extract_archive_text(
        t, "blob", "id", on_error="null", max_members=4
    ).df.collect()
    assert len(rows) == 4
