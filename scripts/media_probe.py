"""Media-container scale probe (round 14): the media_info formats
(MP4 / M4A / Ogg Vorbis / Ogg Opus / WAV / native FLAC / WebM / AVI)
through the REAL Spark blob pipeline at 1x / 10x volume.

Claim probed (COVERAGE.md): every container walk is header-only
per-blob CPU inside bounded Arrow batches — the Ogg reader touches
lacing tables, the EBML reader skips Cluster payloads by size, the
BMFF reader walks boxes — so throughput scales ~linearly with blob
count and is INDEPENDENT of media payload bytes. The 10x set also
makes each blob's dummy payload 4x larger to separate the two axes:
the ratio should track blob COUNT, not byte volume.

Fixtures are synthesized in the driver with the writers the unit
suite pins (tests/test_mediainfo.py), built and persisted BEFORE
timing. Usage: python scripts/media_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from pyspark.sql import functions as F  # noqa: E402

from littletable_spark import Table, get_spark  # noqa: E402

N_1X = 3_000


def _blob(i: int, pad: int) -> bytes:
    """One deterministic media blob per index, cycling the formats;
    ``pad`` scales the skipped payload (mdat / Ogg audio pages /
    EBML Cluster / WAV data / AVI movi)."""
    from test_mediainfo import (
        _avi,
        _mkv,
        _wav,
        audio_stsd,
        box,
        flac_streaminfo,
        ftyp,
        ilst_item,
        mvhd,
        ogg_page,
        trak,
        udta,
        video_stsd,
        vorbis_comments,
        vorbis_id,
    )

    k = i % 8
    if k == 0:  # MP4 with an mdat the walk never reads
        return (
            ftyp()
            + box(b"mdat", b"\xab" * (256 * pad))
            + box(
                b"moov",
                mvhd(1000, (i % 40 + 1) * 1000),
                trak(b"vide", video_stsd(b"avc1"), dims=(640, 360)),
                udta(ilst_item(b"\xa9nam", f"clip {i}")),
            )
        )
    if k == 1:  # M4A
        return ftyp(b"M4A ") + box(
            b"moov",
            mvhd(44100, (i % 200 + 1) * 44100, ver=1),
            trak(b"soun", audio_stsd(b"mp4a", 2, 44100)),
        )
    if k == 2:  # Ogg Vorbis with padded audio pages
        pages = [
            ogg_page(i, 0, 0, [vorbis_id(2, 44100)], htype=0x02),
            ogg_page(i, 1, 0, [vorbis_comments({"TITLE": f"t{i}"})]),
        ]
        pages += [
            ogg_page(i, 2 + j, (j + 1) * 44100, [b"\xcd" * (200 * pad)])
            for j in range(4)
        ]
        return b"".join(pages)
    if k == 3:  # Ogg Opus
        head = (
            b"OpusHead\x01\x02" + (312).to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + b"\x00\x00\x00"
        )
        return (
            ogg_page(i, 0, 0, [head], htype=0x02)
            + ogg_page(i, 1, 0, [vorbis_comments({}, prefix=b"OpusTags")])
            + ogg_page(i, 2, 312 + (i % 30 + 1) * 48000,
                       [b"\xcd" * (200 * pad)], htype=0x04)
        )
    if k == 4:  # PCM WAV — data chunk scales with pad
        return _wav(8000, 1, 400 * pad)
    if k == 5:  # native FLAC, metadata only
        vcb = vorbis_comments({"ARTIST": f"a{i}"}, prefix=b"")
        return (
            b"fLaC"
            + b"\x00" + (34).to_bytes(3, "big")
            + flac_streaminfo(16000, 2, (i % 50 + 1) * 16000)
            + b"\x84" + len(vcb).to_bytes(3, "big") + vcb
        )
    if k == 6:  # WebM with a Cluster the walk skips by size
        return _mkv(title=f"w{i}") + b""  # cluster inside _mkv
    # AVI header walk
    return _avi(320, 240, 100 + i % 50, 40000)


def main() -> None:
    from littletable_spark.operators.multimodal import media_info

    spark = get_spark(cpus=32)
    res: dict[str, float] = {}
    tables = {}
    for s, pad in ((1, 1), (10, 4)):
        rows = [{"id": i, "blob": _blob(i, pad)} for i in range(N_1X * s)]
        df = spark.createDataFrame(rows, "id long, blob binary").persist()
        df.count()
        tables[s] = Table.from_df(df, name=f"media_{s}x")

    def run(t: Table, n: int) -> None:
        out = media_info(t, "blob", "id", on_error="null")
        agg = out.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("duration_s").alias("dur"),
            F.count(F.when(F.col("media_format").isNull(), 1)).alias("nulls"),
        ).collect()[0]
        assert agg["n"] == n and agg["nulls"] == 0, (agg, n)

    run(tables[1], N_1X)  # untimed warmup
    for s in (1, 10):
        t0 = time.perf_counter()
        run(tables[s], N_1X * s)
        res[f"probe_{s}x"] = round(time.perf_counter() - t0, 3)
        print(f"probe_{s}x  {res[f'probe_{s}x']:8.3f}s", flush=True)
    print(
        f"media 10x/1x ratio: {res['probe_10x'] / res['probe_1x']:.2f} "
        f"({N_1X} -> {N_1X * 10} blobs, 8 formats cycling, payload pad 4x)"
    )


if __name__ == "__main__":
    main()