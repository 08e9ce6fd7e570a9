"""10x scale probe for the round-9 crawl-ingestion ops: WARC parsing,
format-routed text extraction (html+pdf mix), and perceptual image
dedup (real dHash decode + the blocked Hamming pair join).

Claims probed (each pinned in BASELINE.md):
- warc_import: one task per archive, records streamed out in
  ``records_per_batch`` chunks — time grows with total archive BYTES
  (linear 1x→10x), never with per-archive inflation factor.
- extract_text: per-blob CPU inside bounded Arrow batches — linear.
- image_hash(real)/image_dup_pairs: decode scan linear; the blocked
  pair join stays near-linear (one equi-join per block, no cross
  join).

Methodology matches scale_probe.py: all synthetic inputs are written/
persisted and counted BEFORE timing, so rows measure operator growth,
not input synthesis. Usage: python scripts/crawl_probe.py
"""

from __future__ import annotations

import gzip
import struct
import sys
import tempfile
import time
import zlib
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from littletable_spark import Table, get_spark

N_FILES_1X = 4
RECORDS_PER_FILE = 1500
N_DOCS_1X = 2000
N_IMAGES_1X = 1500


# ------------------------------------------------------------------ #
# synthetic crawl content (same framing as the test fixtures)


def _warc_record(url: str, body: bytes) -> bytes:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    head = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        + url.encode()
        + b"\r\nWARC-Date: 2024-01-02T03:04:05Z\r\nContent-Length: "
        + str(len(payload)).encode()
        + b"\r\n"
    )
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _html_page(i: int) -> bytes:
    return (
        "<html><head><title>Page %d</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<h1>Doc %d</h1><p>%s</p><div>%s</div></body></html>"
        % (
            i,
            i,
            "sentence %d of synthetic crawl body text " % i * 12,
            "secondary block with enough length to survive filters %d " % i * 8,
        )
    ).encode()


def _pdf_doc(i: int) -> bytes:
    """Minimal linear-layout PDF with one uncompressed content stream."""
    text = b"BT /F1 12 Tf 72 720 Td (synthetic pdf %d) Tj 0 -14 Td (line two %d) Tj ET" % (i, i)
    stream = zlib.compress(text)
    objs = [
        b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(stream)
        + stream + b"\nendstream",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 1 0 R >>",
        b"<< /Type /Catalog /Pages 2 0 R >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for n, body in enumerate(objs, start=1):
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    out += b"%%EOF"
    return bytes(out)


def _bmp(i: int, w: int = 32, h: int = 32) -> bytes:
    """Tiny true-color BMP (bottom-up, BGR, rows padded to 4 bytes)."""
    rng = np.random.RandomState(i)
    px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    row_len = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y, :, ::-1].tobytes()
        body += row + b"\x00" * (row_len - len(row))
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54, 40, w, h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return header + bytes(body)


def timed(label: str, fn, res: dict) -> None:
    t0 = time.perf_counter()
    fn()
    res[label] = time.perf_counter() - t0


def main() -> None:
    from littletable_spark.operators.multimodal import (
        extract_text,
        image_dup_pairs,
        image_hash,
    )
    from littletable_spark.sources.warc_io import warc_import

    spark = get_spark(cpus=32)
    res: dict[str, float] = {}

    with tempfile.TemporaryDirectory() as td:
        # ---- WARC archives on disk, 1x and 10x file counts -------- #
        for scale, n_files in (("1x", N_FILES_1X), ("10x", N_FILES_1X * 10)):
            d = Path(td) / f"warc_{scale}"
            d.mkdir()
            for f in range(n_files):
                recs = b"".join(
                    _warc_record(
                        f"http://s{f}.test/{r}", _html_page(f * 10000 + r)
                    )
                    for r in range(RECORDS_PER_FILE)
                )
                (d / f"{f:03d}.warc.gz").write_bytes(gzip.compress(recs))

        def parse(scale):
            t = warc_import(spark, str(Path(td) / f"warc_{scale}"), pattern="*.warc.gz")
            n, nbytes = t.df.agg(
                F.count(F.lit(1)), F.sum(F.length("payload"))
            ).collect()[0]
            assert n == (N_FILES_1X if scale == "1x" else N_FILES_1X * 10) * RECORDS_PER_FILE
            assert nbytes > 0

        parse("1x")  # untimed warmup (session/Arrow first-job cost)
        timed("warc_parse_1x", lambda: parse("1x"), res)
        timed("warc_parse_10x", lambda: parse("10x"), res)

        # ---- extract_text over an html+pdf mix -------------------- #
        def doc_table(n):
            rows = [
                {
                    "doc_id": i,
                    "blob": _pdf_doc(i) if i % 4 == 0 else _html_page(i),
                }
                for i in range(n)
            ]
            t = Table("docs", spark=spark)
            t.insert_many(rows)
            df = t.df.persist()
            df.count()
            return Table.from_df(df, name="docs")

        docs1 = doc_table(N_DOCS_1X)
        docs10 = doc_table(N_DOCS_1X * 10)

        def extract(t, n):
            out = extract_text(t, "blob", "doc_id", html_main_content=True)
            row = out.df.agg(
                F.count(F.lit(1)), F.sum("n_chars"),
                F.sum(F.when(F.col("doc_format") == "pdf", 1).otherwise(0)),
            ).collect()[0]
            assert row[0] == n and row[1] > 0 and row[2] == -(-n // 4)

        extract(docs1, N_DOCS_1X)  # untimed warmup
        timed("extract_text_1x", lambda: extract(docs1, N_DOCS_1X), res)
        timed("extract_text_10x", lambda: extract(docs10, N_DOCS_1X * 10), res)

        # ---- perceptual image dedup ------------------------------- #
        def img_table(n):
            # ~1/3 duplicates: same seed modulo -> identical pixels
            rows = [
                {"img_id": i, "blob": _bmp(i % ((2 * n) // 3 or 1))}
                for i in range(n)
            ]
            t = Table("imgs", spark=spark)
            t.insert_many(rows)
            df = t.df.persist()
            df.count()
            return Table.from_df(df, name="imgs")

        imgs1 = img_table(N_IMAGES_1X)
        imgs10 = img_table(N_IMAGES_1X * 10)

        def hash_real(t):
            assert image_hash(t, "blob", "img_id", use_fake=False).df.where(
                "img_hash IS NOT NULL"
            ).count() == t.df.count()

        hash_real(imgs1)  # untimed warmup
        timed("image_hash_real_1x", lambda: hash_real(imgs1), res)
        timed("image_hash_real_10x", lambda: hash_real(imgs10), res)

        def dup_pairs(t):
            image_dup_pairs(
                t, "blob", "img_id", max_hamming=3, use_fake=False
            ).df.count()

        timed("image_dup_pairs_1x", lambda: dup_pairs(imgs1), res)
        timed("image_dup_pairs_10x", lambda: dup_pairs(imgs10), res)

        # ---- URL frontier ops: canonicalize+dedup, robots filter --- #
        from littletable_spark.operators.robots import (
            filter_by_robots,
            parse_robots,
        )
        from littletable_spark.operators.urlops import dedup_urls

        def url_table(n):
            df = (
                spark.range(n)
                .selectExpr(
                    "id",
                    "concat('https://Site-', cast(id % 50 as string), "
                    "'.com:443/p/', cast(id % (5 * {0}) as string), "
                    "case when id % 3 = 0 then '?utm_source=x&b=2&a=1' "
                    "else '?a=1&b=2' end) AS url".format(n // 10 or 1),
                )
                .persist()
            )
            df.count()
            return Table.from_df(df, name="urls")

        u1 = url_table(N_DOCS_1X * 5)
        u10 = url_table(N_DOCS_1X * 50)

        def frontier(t):
            dedup_urls(t, "url", order_col="id").df.count()

        frontier(u1)  # untimed warmup
        timed("url_frontier_dedup_1x", lambda: frontier(u1), res)
        timed("url_frontier_dedup_10x", lambda: frontier(u10), res)

        rt = Table("robots", spark=spark)
        rt.insert_many(
            [
                {
                    "domain": f"site-{k}.com",
                    "txt": "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n",
                }
                for k in range(50)
            ]
        )
        rules = parse_robots(rt, "txt", "domain")

        def robots_pass(t):
            filter_by_robots(t, rules, "url").df.count()

        robots_pass(u1)  # untimed warmup
        timed("robots_filter_1x", lambda: robots_pass(u1), res)
        timed("robots_filter_10x", lambda: robots_pass(u10), res)

    for k, v in res.items():
        print(f"{k:28s} {v:8.3f}s")
    for fam in (
        "warc_parse", "extract_text", "image_hash_real", "image_dup_pairs",
        "url_frontier_dedup", "robots_filter",
    ):
        r = res[f"{fam}_10x"] / max(res[f"{fam}_1x"], 1e-9)
        print(f"{fam:28s} 10x/1x ratio {r:6.2f}")


if __name__ == "__main__":
    main()
