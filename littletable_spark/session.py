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


def _runtime_sql_confs(cpus: int) -> dict[str, str]:
    """The SQL confs this engine depends on — all runtime-settable, so
    they can be applied both at builder time and onto a session someone
    else created (a driver harness handing us its own SparkSession must
    still get the load-bearing Arrow batching fix below)."""
    return {
        "spark.sql.shuffle.partitions": str(cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # EXACTLY Int.MaxValue: BatchedPythonArrowInput.underBatchSizeLimit
        # short-circuits on == INT_MAX and skips its per-row
        # ArrowWriter.sizeInBytes() walk (verified in the 4.1.2
        # bytecode). With the default 64m cap that walk degrades ~6x
        # session-wide once any mapInPandas input has carried an array
        # column (root-caused round 7 — BASELINE.md "Arrow-feed
        # pollution"), taxing every later Arrow pass. This restores
        # Spark 3.x batching semantics: batches are bounded by
        # maxRecordsPerBatch (10k rows) only — blob-consuming operators
        # bound their INPUT PARTITIONS instead of this conf (see
        # operators/multimodal._bounded_blob_input) so fat rows never
        # produce multi-GB batches.
        "spark.sql.execution.arrow.maxBytesPerBatch": "2147483647b",
    }


_APPLIED: set[int] = set()


def apply_runtime_confs(spark: SparkSession, cpus: int | None = None) -> SparkSession:
    """Idempotently apply the engine's runtime SQL confs to a session
    created by someone else (e.g. a test harness that hands us its own
    SparkSession). Memoized per session object so hot paths can call it
    freely."""
    if id(spark) in _APPLIED:
        return spark
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    for k, v in _runtime_sql_confs(cpus).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a conf the host locked down; the rest still apply
    _APPLIED.add(id(spark))
    return spark


def get_spark(app_name: str = "littletable_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    confs = _runtime_sql_confs(cpus)
    active = SparkSession.getActiveSession()
    if active is not None:
        # apply the runtime-settable confs to the pre-existing session
        # too — previously this returned it untouched, which silently
        # dropped the Arrow maxBytesPerBatch fix when a harness created
        # the session first (VERDICT r7 #2).
        _APPLIED.discard(id(active))
        return apply_runtime_confs(active, cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
