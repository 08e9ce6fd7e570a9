"""Fixed-width text ingestion (littletable.py:937-995).

``FixedWidthReader`` takes ``(label, start[, end[, transform]])`` slice
specs (0-based starts, like the reference). Spark-first: the scan is
``spark.read.text`` and every column is a native ``substring``
projection — fully parallel, no Python in the row path unless a spec
carries an arbitrary transform callable.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..table import Table
from .csv_io import _transform_column
from .resolver import resolve_source


class FixedWidthReader:
    def __init__(
        self,
        slice_specs: Sequence[tuple],
        src: Any,
        spark: SparkSession | None = None,
    ) -> None:
        self.specs = self._normalize(slice_specs)
        self.src = src
        self.spark = spark

    @staticmethod
    def _normalize(specs: Sequence[tuple]) -> list[tuple[str, int, int | None, Any]]:
        out: list[tuple[str, int, int | None, Any]] = []
        for i, spec in enumerate(specs):
            label, start, end, fn = (tuple(spec) + (None, None, None))[:4]
            if end is None and i + 1 < len(specs):
                end = specs[i + 1][1]
            out.append((label, start, end, fn))
        return out

    def table(self) -> Table:
        spark = self.spark
        if spark is None:
            from ..session import get_spark

            spark = get_spark()
        resolved = resolve_source(self.src, suffix=".txt")
        df = spark.read.text(resolved.path)
        cols = []
        for label, start, end, fn in self.specs:
            length = (end - start) if end is not None else 2_000_000
            col = F.trim(F.substring(F.col("value"), start + 1, length))
            if fn is not None:
                col = _transform_column(col, fn, None)
            cols.append(col.alias(label))
        out = df.select(*cols)
        return Table(name=str(self.src)[:80], df=out, spark=spark)

    def __iter__(self):
        return iter(self.table())


def fixed_width_import(
    source: Any, slice_specs: Sequence[tuple], spark: SparkSession | None = None
) -> Table:
    return FixedWidthReader(slice_specs, source, spark).table()
