"""WARC (Web ARChive, ISO 28500 — public) crawl ingestion.

Real pretraining corpora start as WARC files (Common-Crawl-style):
records of ``WARC/1.x`` header blocks plus a Content-Length payload,
optionally gzip-compressed one member per record (``.warc.gz`` — the
standard layout; Python's zlib consumes concatenated members).

``warc_import`` builds on the ``binaryFile`` scan (one file per row,
glob/size pushdown like ``binary_import``) and explodes each file into
its records inside an Arrow pass: ``(path, record_ord, warc_type,
url, warc_date, content_type, http_status, payload binary)``. For
``response``/``resource`` records the HTTP envelope is split off so
``payload`` is the actual document body — ready for ``extract_text``
→ quality → dedup → tokenize, the full crawl pipeline in-engine.

Scale shape: one task per WARC file (the standard distributed-WARC
contract — files are sized for that, ~1 GB), records parsed
sequentially within the task with no driver involvement; column
pruning drops ``payload`` for metadata-only queries before the Arrow
transfer.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession

from ..table import Table
from .binary_io import binary_import

__all__ = ["warc_import", "parse_warc"]


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout).
    Corruption surfaces as ValueError so the on_error policy applies."""
    out = bytearray()
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
            out += d.flush()
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC: {exc}") from None
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        data = d.unused_data
    return bytes(out)


def parse_warc(blob: bytes) -> list[dict]:
    """All records of one WARC file as dicts. Raises ValueError on a
    stream that does not parse as WARC."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    if not blob.startswith(b"WARC/"):
        raise ValueError("not a WARC stream")
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            # trailing record separators / padding
            if blob[pos:].strip() == b"":
                break
            raise ValueError(f"malformed WARC record at offset {pos}")
        hdr_end = blob.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        length = int(headers.get("content-length", "0"))
        body = blob[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        # each record is terminated by two CRLFs
        while blob.startswith(b"\r\n", pos):
            pos += 2
        warc_type = headers.get("warc-type", "")
        content_type = headers.get("content-type", "")
        status = None
        payload = body
        if body[:5] == b"HTTP/":  # split the HTTP envelope
            hend = body.find(b"\r\n\r\n")
            if hend >= 0:
                http_lines = body[:hend].split(b"\r\n")
                try:
                    status = int(http_lines[0].split()[1])
                except (IndexError, ValueError):
                    status = None
                for line in http_lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        content_type = v.strip().decode("latin-1")
                payload = body[hend + 4 :]
        records.append(
            {
                "warc_type": warc_type,
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": content_type,
                "http_status": status,
                "payload": payload,
            }
        )
    return records


def warc_import(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    recursive: bool = False,
    record_types: tuple[str, ...] = ("response",),
    max_bytes: int | None = None,
    name: str = "",
    on_error: str = "raise",
) -> Table:
    """Read a directory of ``.warc`` / ``.warc.gz`` files into one row
    per record. ``record_types`` filters at parse time (``response``
    by default — the documents; pass ``()`` for everything incl.
    request/metadata records). ``on_error="null"`` skips unparseable
    FILES (one bad archive never kills the crawl job) — they surface
    as zero records; count per-path rows downstream for the audit
    trail."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"warc_import: on_error must be raise|null, got {on_error!r}")
    files = binary_import(
        spark, path, pattern=pattern, recursive=recursive, max_bytes=max_bytes
    )
    schema = (
        "path string, record_ord int, warc_type string, url string, "
        "warc_date string, content_type string, http_status int, "
        "payload binary"
    )
    want = tuple(record_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc(bytes(content or b""))
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
                for i, r in enumerate(recs):
                    if want and r["warc_type"] not in want:
                        continue
                    rows.append(
                        (
                            p, i, r["warc_type"], r["url"], r["warc_date"],
                            r["content_type"], r["http_status"], r["payload"],
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "path", "record_ord", "warc_type", "url",
                        "warc_date", "content_type", "http_status",
                        "payload",
                    ],
                )

    out = files.df.select("path", "content").mapInPandas(run, schema)
    return Table.from_df(out, name=name or f"warc:{path}")
