"""Document-codec scale probe (round 13, extended round 14): the
extract_text formats (docx / odt / xlsx / pptx / rtf / epub via
officecodec + rtfcodec, legacy doc / xls / ppt via doccodec, plus the
round-14 charset-ladder text rows, SRT subtitles, and gzipped HTML
through the transparent unwrap) through the REAL Spark blob
pipeline at 1x / 10x volume.

Claim probed (COVERAGE.md): every extractor is per-blob CPU inside
bounded Arrow batches — throughput scales ~linearly with blob count
(no superlinear term from the Arrow feed, zip parsing, or the CFB
FAT walks).

Fixtures are synthesized in the driver with the same writers the unit
suites pin (zip containers, a CFB writer vendored from
tests/test_doccodec.py), built and persisted BEFORE timing.
Usage: python scripts/document_probe.py
"""
from __future__ import annotations

import io
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from pyspark.sql import functions as F  # noqa: E402

from littletable_spark import Table, get_spark  # noqa: E402

N_1X = 2_000


def _blob(i: int) -> bytes:
    """One deterministic document blob per index, cycling the formats."""
    from test_doccodec import make_doc, make_xls  # test-side writers

    k = i % 13
    body = f"Document {i} body text with enough words to matter " * 8
    if k == 0:  # docx
        w = ('xmlns:w="http://schemas.openxmlformats.org/'
             'wordprocessingml/2006/main"')
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(
                "word/document.xml",
                f"<w:document {w}><w:body><w:p><w:r><w:t>{body}</w:t>"
                "</w:r></w:p></w:body></w:document>",
            )
        return buf.getvalue()
    if k == 1:  # odt
        o = ('xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
             'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"')
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(
                zipfile.ZipInfo("mimetype"),
                "application/vnd.oasis.opendocument.text",
                compress_type=zipfile.ZIP_STORED,
            )
            zf.writestr(
                "content.xml",
                f"<office:document-content {o}><office:body><office:text>"
                f"<text:p>{body}</text:p></office:text></office:body>"
                "</office:document-content>",
            )
        return buf.getvalue()
    if k == 2:  # xlsx
        s = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("xl/workbook.xml", f"<workbook {s}/>")
            rows = "".join(
                f'<row><c t="inlineStr"><is><t>cell {i}-{r}</t></is></c>'
                f"<c><v>{r}</v></c></row>"
                for r in range(20)
            )
            zf.writestr(
                "xl/worksheets/sheet1.xml",
                f"<worksheet {s}><sheetData>{rows}</sheetData></worksheet>",
            )
        return buf.getvalue()
    if k == 3:  # pptx
        p = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/'
             '2006/main" xmlns:a="http://schemas.openxmlformats.org/'
             'drawingml/2006/main"')
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("ppt/presentation.xml", f"<p:presentation {p}/>")
            zf.writestr(
                "ppt/slides/slide1.xml",
                f"<p:sld {p}><p:cSld><p:spTree><p:sp><p:txBody>"
                f"<a:p><a:r><a:t>{body}</a:t></a:r></a:p>"
                "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>",
            )
        return buf.getvalue()
    if k == 4:  # rtf
        return (
            "{\\rtf1\\ansi{\\fonttbl{\\f0 T;}}%s\\par tail\\tab x}" % body
        ).encode("ascii")
    if k == 5:  # epub
        c = 'xmlns="urn:oasis:names:tc:opendocument:xmlns:container"'
        o = 'xmlns="http://www.idpf.org/2007/opf"'
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(zipfile.ZipInfo("mimetype"), "application/epub+zip",
                        compress_type=zipfile.ZIP_STORED)
            zf.writestr(
                "META-INF/container.xml",
                f'<container {c}><rootfiles><rootfile '
                'full-path="OEBPS/content.opf"/></rootfiles></container>',
            )
            zf.writestr(
                "OEBPS/content.opf",
                f'<package {o}><manifest><item id="c" href="c.xhtml" '
                'media-type="application/xhtml+xml"/></manifest>'
                '<spine><itemref idref="c"/></spine></package>',
            )
            zf.writestr(
                "OEBPS/c.xhtml", f"<html><body><p>{body}</p></body></html>"
            )
        return buf.getvalue()
    if k == 6:  # legacy .doc
        return make_doc([(body.replace(" ", " ") + "\r", True)])
    if k == 7:  # legacy .xls
        return make_xls(
            [[(r, 0, "label", f"cell {i}-{r}") for r in range(20)]],
            shared=[],
        )
    if k == 8:  # legacy .ppt (round 14)
        from test_doccodec import write_cfb
        from test_pptcodec import DOCUMENT, SLIDE, TEXTBYTES, atom, container

        stream = container(
            DOCUMENT, container(SLIDE, atom(TEXTBYTES, body.encode()))
        )
        return write_cfb({"PowerPoint Document": stream})
    if k == 9:  # latin-1 text (round-14 charset ladder -> cp1252)
        return (body + " caf\xe9 d\xe9j\xe0").encode("latin-1")
    if k == 10:  # UTF-16-LE with BOM
        return b"\xff\xfe" + (body + " wide").encode("utf-16-le")
    if k == 11:  # SRT subtitles (round 14)
        cues = "".join(
            f"{c + 1}\n00:00:{c:02d},000 --> 00:00:{c + 1:02d},000\n"
            f"cue {i}-{c} with some dialog text\n\n"
            for c in range(12)
        )
        return cues.encode()
    # gzipped HTML (round-14 transparent unwrap)
    import gzip

    return gzip.compress(
        (f"<html><head><title>D{i}</title></head><body><p>{body}</p>"
         "</body></html>").encode()
    )


def main() -> None:
    from littletable_spark.operators.multimodal import extract_text

    spark = get_spark(cpus=32)
    res: dict[str, float] = {}
    tables = {}
    for s in (1, 10):
        rows = [{"id": i, "blob": _blob(i)} for i in range(N_1X * s)]
        df = spark.createDataFrame(rows, "id long, blob binary").persist()
        df.count()
        tables[s] = Table.from_df(df, name=f"docs_{s}x")

    def run(t: Table, n: int) -> None:
        out = extract_text(t, "blob", "id", on_error="null")
        agg = out.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
            F.count(F.when(F.col("text").isNull(), 1)).alias("nulls"),
        ).collect()[0]
        assert agg["n"] == n and agg["nulls"] == 0, (agg, n)

    run(tables[1], N_1X)  # untimed warmup
    for s in (1, 10):
        t0 = time.perf_counter()
        run(tables[s], N_1X * s)
        res[f"extract_{s}x"] = round(time.perf_counter() - t0, 3)
        print(f"extract_{s}x  {res[f'extract_{s}x']:8.3f}s", flush=True)
    print(f"documents 10x/1x ratio: "
          f"{res['extract_10x'] / res['extract_1x']:.2f} "
          f"({N_1X} -> {N_1X * 10} blobs, 13 formats cycling)")


if __name__ == "__main__":
    main()
