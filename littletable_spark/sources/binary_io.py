"""Binary-blob and line-text file ingestion.

Net-new over the reference (its importers are all text-table-shaped —
littletable.py's csv/tsv/json/xlsx family): a 100 TB multimodal corpus
starts life as directories of raw files (images, audio, archives, plain
text), and the distributed way in is Spark's built-in ``binaryFile``
and ``text`` data sources — executor-side, split-planned, partition-
pruned — never a driver-side directory walk.

- ``binary_import``: one row per file with (path, modificationTime,
  length, content BINARY) — the standard input to the multimodal
  pipeline (``sniff_media`` → ``media_repartition`` → ``decode_image``).
  ``pathGlobFilter`` / ``recursiveFileLookup`` push file pruning into
  the listing itself; a ``max_bytes`` guard refuses single blobs larger
  than a task should hold.
- ``text_import``: one row per line (or per file with
  ``whole_file=True``) plus the source path — raw-crawl ingestion that
  feeds the documents pipeline.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..table import Table


BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def binary_import(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    recursive: bool = False,
    name: str = "",
    max_bytes: int | None = None,
    stream: bool = False,
) -> Table:
    """Read a directory of raw files as (path, modificationTime,
    length, content) rows via Spark's ``binaryFile`` source.

    ``pattern`` is a glob (e.g. ``*.png``) pushed into the file listing
    (files are pruned before any read, not filtered after). With
    ``max_bytes`` set, oversized files are dropped by a pushed
    ``length`` filter — the scan never materializes their content
    (binaryFile supports predicate pushdown on length/path/time).

    ``stream=True`` returns a streaming Table over the same directory
    (``readStream`` file source, fixed binaryFile schema): newly landed
    files flow through the narrow curation ops (sniff → filter → sink)
    without re-listing history — the continuous-ingest half of the
    multimodal pipeline."""
    if stream:
        reader = spark.readStream.format("binaryFile").schema(BINARY_FILE_SCHEMA)
    else:
        reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= F.lit(int(max_bytes)))
    return Table(name=name or path, df=df, spark=spark)


def text_import(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    recursive: bool = False,
    whole_file: bool = False,
    line_sep: str | None = None,
    name: str = "",
    stream: bool = False,
) -> Table:
    """Read text files as (path, text) rows — one row per line, or one
    per file with ``whole_file=True`` — via Spark's ``text`` source
    (split-planned per HDFS block for large files unless whole_file).

    ``line_sep`` overrides the newline delimiter (e.g. ``\\0`` for
    record-separated crawls). ``stream=True`` tails the directory as a
    Structured Streaming file source."""
    reader = (spark.readStream if stream else spark.read).format("text")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if whole_file:
        reader = reader.option("wholetext", "true")
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    df = reader.load(path).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
    return Table(name=name or path, df=df, spark=spark)
