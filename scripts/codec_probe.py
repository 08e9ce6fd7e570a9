"""Round-12 codec scale probe: lossy-WebP decode and encrypted-PDF
extraction through the REAL Spark blob pipeline at 1x/10x volume.

Claims probed (documented in COVERAGE.md):
- decode_image/image_hash over VP8 (lossy) blobs runs per-blob CPU
  inside bounded Arrow batches — throughput scales ~linearly with
  blob count (the Arrow feed and batch bounding add no superlinear
  term).
- extract_text over RC4/AES-encrypted PDFs decrypts inline at the
  same shape: linear in blobs, wrong-password blobs NULL out without
  failing the job.

Fixtures are synthesized in the driver (libwebp via ctypes when
present for VP8 — else the probe reports SKIP for the webp half; the
PDF writer is pure stdlib + the repo's own crypto). All inputs are
built and persisted BEFORE timing, matching scale_probe.py.
Usage: python scripts/codec_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from littletable_spark import Table, get_spark


def _libwebp():
    import ctypes
    import ctypes.util

    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        if hasattr(lib, "WebPEncodeRGB"):
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            return lib
    return None


def _webp_blobs(n: int) -> list[bytes]:
    import ctypes

    lib = _libwebp()
    if lib is None:
        return []
    rng = np.random.RandomState(7)
    out = []
    # 16 distinct 96x64 images re-encoded with varying quality: content
    # variety without driver-side encode dominating setup
    base_imgs = []
    for k in range(16):
        yy, xx = np.mgrid[0:64, 0:96]
        img = np.stack(
            [(xx * (k + 1)) % 256, (yy * (k + 2)) % 256, (xx + yy + 31 * k) % 256],
            -1,
        ).astype(np.uint8)
        img[32:, :] = rng.randint(0, 256, (32, 96, 3), dtype=np.uint8)
        base_imgs.append(img)
    for i in range(n):
        img = base_imgs[i % 16]
        buf = ctypes.c_void_p()
        sz = lib.WebPEncodeRGB(
            img.tobytes(), 96, 64, 96 * 3, 30.0 + (i % 5) * 15.0,
            ctypes.byref(buf),
        )
        out.append(ctypes.string_at(buf, sz))
        lib.WebPFree(buf)
    return out


def _pdf_blobs(n: int) -> list[bytes]:
    sys.path.insert(0, "/root/repo/tests")
    from test_pdfcodec import _make_encrypted_pdf

    out = []
    for i in range(n):
        aes = i % 2 == 0
        out.append(
            _make_encrypted_pdf(
                b"Benchmark secret page %d with some more words" % i,
                v=4 if aes else 2,
                r=4 if aes else 3,
                aes=aes,
            )
        )
    return out


def main() -> None:
    spark = get_spark(cpus=int(sys.argv[1]) if len(sys.argv) > 1 else 32)
    from littletable_spark.operators.multimodal import decode_image, extract_text

    results = {}
    webp_1x = _webp_blobs(200)
    if webp_1x:
        webp_10x = webp_1x * 10
        for label, blobs in (("webp_decode_1x", webp_1x), ("webp_decode_10x", webp_10x)):
            t = Table("imgs", spark=spark)
            t.insert_many(
                [{"img_id": i, "blob": b} for i, b in enumerate(blobs)]
            )
            t.df.persist().count()
            t0 = time.perf_counter()
            out = decode_image(t, "blob", "img_id", use_fake=False, on_error="null")
            n_ok = out.df.where(F.col("width").isNotNull()).count()
            results[label] = (time.perf_counter() - t0, n_ok, len(blobs))
            t.df.unpersist()
    else:
        print("webp: SKIP (no system libwebp encoder for fixtures)")

    pdf_1x = _pdf_blobs(60)
    pdf_10x = pdf_1x * 10
    for label, blobs in (("pdf_decrypt_1x", pdf_1x), ("pdf_decrypt_10x", pdf_10x)):
        t = Table("docs", spark=spark)
        t.insert_many([{"doc_id": i, "blob": b} for i, b in enumerate(blobs)])
        t.df.persist().count()
        t0 = time.perf_counter()
        out = extract_text(t, "blob", "doc_id", on_error="null")
        n_ok = out.df.where(F.col("text").isNotNull()).count()
        results[label] = (time.perf_counter() - t0, n_ok, len(blobs))
        t.df.unpersist()

    for label, (dt, ok, total) in results.items():
        print(f"{label:18s} {dt:7.2f}s  ok {ok}/{total}  ({total/dt:,.0f} blobs/s)")
    for fam in ("webp_decode", "pdf_decrypt"):
        a, b = results.get(f"{fam}_1x"), results.get(f"{fam}_10x")
        if a and b:
            print(f"{fam:18s} 10x/1x ratio {b[0]/a[0]:6.2f}")


if __name__ == "__main__":
    main()
