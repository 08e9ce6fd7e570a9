"""SparkSession helper tuned for this engine.

Local testing runs on ``local[N]``; the configuration below is chosen so
the same code scales to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden by AQE's coalescing from an initial high partition count.
- Arrow enabled so pandas-UDF paths and ``toPandas`` are vectorized.
- UTC session timezone so timestamp semantics are stable and match
  columnar engines (parquet instants, DuckDB naive-UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "littletable_spark", cpus: int | None = None) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # EXACTLY Int.MaxValue: BatchedPythonArrowInput.underBatchSizeLimit
        # short-circuits on == INT_MAX and skips its per-row
        # ArrowWriter.sizeInBytes() walk (verified in the 4.1.2
        # bytecode). With the default 64m cap that walk degrades ~6x
        # session-wide once any mapInPandas input has carried an array
        # column (root-caused round 7 — BASELINE.md "Arrow-feed
        # pollution"), taxing every later Arrow pass. This restores
        # Spark 3.x batching semantics: batches are bounded by
        # maxRecordsPerBatch (10k rows) only — pipelines pushing very
        # fat rows (multi-MB binary blobs) through Pandas UDFs should
        # lower spark.sql.execution.arrow.maxRecordsPerBatch to keep
        # per-batch bytes in check.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647b")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
