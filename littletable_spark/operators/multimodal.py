"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

North-star requirement (no reference analog): a 100 TB training-data
pipeline carries media as ``binary`` columns with a typed metadata
struct. The Spark-side plumbing here — schemas, magic-byte sniffing,
Arrow batch shapes, partition sizing — is real and tested; the actual
codec work (pixel decode, resampling) is stubbed behind a deterministic
fake because no media libraries ship in this environment
(``use_fake=False`` raises NotImplementedError until PIL/ffmpeg are
provisioned).

Scale notes:
- metadata sniffing is a narrow native projection over the first bytes
  (no UDF, no full-blob scan — parquet stores blobs contiguously and the
  projection reads only what it needs);
- decode/featurize run in ``mapInPandas`` so each Arrow batch amortizes
  Python crossing; blobs never pass through the driver;
- ``media_repartition`` sizes partitions by *bytes*, not rows — blob
  tables skew by size, so row-count partitioning would OOM executors.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as SQLT

from ..table import Table

#: canonical metadata struct for media blobs
MEDIA_META_SCHEMA = SQLT.StructType(
    [
        SQLT.StructField("format", SQLT.StringType()),
        SQLT.StructField("n_bytes", SQLT.LongType()),
        SQLT.StructField("content_hash", SQLT.StringType()),
    ]
)

_MAGIC = [
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("riff", "52494646"),  # wav/avi/webp container
    ("mp4", "00000018667479"),
    ("pdf", "25504446"),
]


def sniff_media(table: Table, bin_col: str, out_col: str = "media_meta") -> Table:
    """Attach the typed metadata struct — pure native projection.

    Format comes from magic-byte prefixes (hex-compare on the first
    bytes), size from ``length``, identity from md5 — no UDF anywhere.
    """
    prefix = F.upper(F.hex(F.substring(F.col(bin_col), 1, 8)))
    fmt = F.lit("unknown")
    for name, magic in reversed(_MAGIC):
        fmt = F.when(prefix.startswith(magic), F.lit(name)).otherwise(fmt)
    meta = F.struct(
        fmt.alias("format"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_hash"),
    )
    out = table._require_df().withColumn(out_col, meta)
    return table._derive(out)


def media_repartition(df: DataFrame, bin_col: str, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition a blob table by cumulative byte size, not row count.

    At 100 TB, row-count partitioning puts arbitrarily many blobs in one
    task; sizing by bytes keeps every task under ``target_bytes`` of
    payload.
    """
    sized = df.withColumn("__sz__", F.length(F.col(bin_col)).cast("long"))
    total = sized.agg(F.sum("__sz__")).collect()[0][0] or 1
    n_parts = max(1, int(total // target_bytes) + 1)
    return sized.repartition(n_parts).drop("__sz__")


def _bound_arrow_batch_rows(spark, max_rows: int = 256) -> None:
    """Blob rows are FAT, and get_spark disables Spark 4.1's per-batch
    byte cap (the Int.MaxValue maxBytesPerBatch fix — see session.py):
    the only remaining bound on an Arrow feed batch is
    ``maxRecordsPerBatch``, and the 10k default times multi-MB blobs
    is a multi-GB batch on the JVM feed side. Every blob-consuming
    mapInPandas entry point therefore LOWERS the session's records cap
    to ``max_rows`` (256 × 5 MB ≈ 1.3 GB worst case) before returning
    its plan. Only ever lowers — a caller-tightened cap is respected —
    and the setting is session-sticky (documented; skinny-row ops lose
    nothing measurable at 256+ rows per batch)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    try:
        current = int(spark.conf.get(key))
    except Exception:
        current = 10000
    if current > max_rows:
        spark.conf.set(key, str(max_rows))


def _fake_pixels(blob: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for a pixel decode: md5-seeded grid."""
    h = hashlib.md5(blob or b"").digest()
    return [h[(x * 31 + y) % 16] / 255.0 for x in range(width) for y in range(height)]


def decode_image(
    table: Table,
    bin_col: str,
    id_col: str,
    width: int = 8,
    height: int = 8,
    use_fake: bool = True,
) -> Table:
    """Decode + resize to a fixed grid of floats via mapInPandas.

    ``use_fake=True`` produces a deterministic md5-seeded grid so the
    full pipeline (schema, batching, downstream features) is exercised
    without codec libraries; ``use_fake=False`` requires PIL.
    """
    if not use_fake:
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed; "
                "use use_fake=True for the deterministic stand-in"
            ) from e

    schema = f"{id_col} long, pixels array<double>, width int, height int"

    # local def, not the module-level helper: closures must be
    # self-contained so cloudpickle ships them by value to workers that
    # don't have this package on sys.path
    def fake_pixels(blob: bytes) -> list[float]:
        import hashlib as _hl

        h = _hl.md5(blob or b"").digest()
        return [
            h[(x * 31 + y) % 16] / 255.0
            for x in range(width)
            for y in range(height)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if use_fake:
                pixels = [fake_pixels(b) for b in pdf[bin_col]]
            else:  # pragma: no cover - codec libs absent in this env
                from io import BytesIO

                from PIL import Image

                pixels = []
                for b in pdf[bin_col]:
                    img = Image.open(BytesIO(b)).convert("L").resize((width, height))
                    pixels.append([p / 255.0 for p in img.getdata()])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pixels": pixels,
                    "width": width,
                    "height": height,
                }
            )

    _bound_arrow_batch_rows(table.spark)
    out = table.df.select(id_col, bin_col).mapInPandas(run, schema)
    return Table.from_df(out, name=f"{table.table_name}_decoded")


def media_features(table: Table, id_col: str, pixels_col: str = "pixels") -> Table:
    """Feature extraction over decoded grids — native array aggregates."""
    px = F.col(pixels_col)
    out = table.df.select(
        F.col(id_col),
        F.aggregate(px, F.lit(0.0), lambda a, v: a + v).alias("psum"),
        F.array_min(px).alias("pmin"),
        F.array_max(px).alias("pmax"),
        F.size(px).alias("n_px"),
    ).withColumn("pmean", F.col("psum") / F.col("n_px"))
    return Table.from_df(out, name=f"{table.table_name}_features")


def frame_sample(
    table: Table,
    bin_col: str,
    id_col: str,
    n_frames: int = 4,
    use_fake: bool = True,
) -> Table:
    """Sample n 'frames' per video blob — one output row per frame.

    The fake path slices the blob into byte windows (deterministic);
    the real path would seek with ffmpeg/pyav. The Spark shape — one
    blob row in, n frame rows out, each with a frame index — is the
    production contract.
    """
    if not use_fake:
        raise NotImplementedError("real frame sampling requires pyav/ffmpeg")

    schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = r[bin_col] or b""
                step = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    rows.append(
                        (r[id_col], i, bytes(blob[i * step : i * step + step]))
                    )
            if rows:
                yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    _bound_arrow_batch_rows(table.spark)
    out = table.df.select(id_col, bin_col).mapInPandas(run, schema)
    return Table.from_df(out, name=f"{table.table_name}_frames")
