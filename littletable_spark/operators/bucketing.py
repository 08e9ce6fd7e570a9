"""Bucketed storage for shuffle-free co-located joins.

Scale capability (no reference analog — littletable has no storage
layout). Writing both sides of a recurring join bucketed on the join key
lets Spark execute the join with **zero Exchange operators**: each task
reads matching buckets from both tables. At 100 TB this is the
difference between re-shuffling the fact table on every query and never
shuffling it.

``tests/test_bucketing.py`` asserts the no-Exchange plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..table import Table


def write_bucketed(
    table: Table,
    name: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (parquet)."""
    if mode == "overwrite":
        # saveAsTable(overwrite) still fails if a previous run dropped the
        # table but left its warehouse directory behind
        import shutil
        from urllib.parse import urlparse

        spark = table.spark
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if warehouse:
            shutil.rmtree(f"{warehouse.rstrip('/')}/{name.lower()}", ignore_errors=True)
    writer = (
        table.df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> Table:
    return Table(name=name, df=spark.table(name), spark=spark)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    key: str,
    how: str = "inner",
    force_merge: bool = False,
) -> Table:
    """Join two same-bucketed tables — no shuffle on either side.

    ``force_merge=True`` hints sort-merge so the plan demonstrates the
    bucket property even when a side is small enough to broadcast (at
    real scale neither side fits a broadcast and SMJ is chosen anyway).
    """
    left = spark.table(left_name)
    right = spark.table(right_name)
    if force_merge:
        left = left.hint("merge")
    drop = [c for c in right.columns if c in left.columns and c != key]
    out = left.join(right.drop(*drop), on=key, how=how)
    return Table(name=f"{left_name}:{right_name}", df=out, spark=spark)
