"""Column statistics: ``Table.stats`` (littletable.py:3832-3915).

One JVM-side aggregation computes every statistic for every requested
field in a single pass (partial aggregation map-side); the tiny result is
reshaped driver-side into the reference's by-field / by-stat layouts.

- ``median`` uses exact interpolated ``percentile`` (matches Python
  ``statistics.median`` and DuckDB ``median`` for numeric input). At
  100 TB swap to ``percentile_approx`` — noted, not default, to keep
  oracle parity.
- non-numeric values are excluded per field (reference filters them out,
  littletable.py:3869-3874): numeric-typed columns pass through; string
  columns are ``try_cast`` so unparseable cells count as missing.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F
from pyspark.sql import types as SQLT

from ..table import Table

_NUMERIC_TYPES = (
    SQLT.ByteType,
    SQLT.ShortType,
    SQLT.IntegerType,
    SQLT.LongType,
    SQLT.FloatType,
    SQLT.DoubleType,
    SQLT.DecimalType,
)

STAT_NAMES = ["mean", "median", "min", "max", "variance", "std_dev", "count", "missing"]


def stats_table(table: Table, field_names: Any = None, by_field: bool = True) -> Table:
    df = table.df
    schema = {f.name: f.dataType for f in df.schema.fields}
    if field_names is None:
        fields = [
            c for c in df.columns if isinstance(schema[c], _NUMERIC_TYPES)
        ]
    elif isinstance(field_names, str):
        fields = field_names.replace(",", " ").split()
    else:
        fields = list(field_names)

    aggs = []
    for c in fields:
        col = (
            F.col(c).cast("double")
            if isinstance(schema.get(c), _NUMERIC_TYPES)
            else F.col(c).try_cast("double")
            if c in schema
            else F.lit(None).cast("double")
        )
        aggs += [
            F.avg(col).alias(f"{c}__mean"),
            F.percentile(col, F.lit(0.5)).alias(f"{c}__median"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.var_samp(col).alias(f"{c}__variance"),
            F.stddev_samp(col).alias(f"{c}__std_dev"),
            F.count(col).alias(f"{c}__count"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__missing"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()

    spark = table.spark
    if by_field:
        recs = [
            {
                "name": c,
                **{s: row[f"{c}__{s}"] for s in STAT_NAMES},
            }
            for c in fields
        ]
        schema_str = (
            "name string, mean double, median double, min double, max double, "
            "variance double, std_dev double, count long, missing long"
        )
        out = spark.createDataFrame(recs, schema=schema_str)
    else:
        recs = [
            {"stat": s, **{c: float(row[f"{c}__{s}"]) if row[f"{c}__{s}"] is not None else None for c in fields}}
            for s in STAT_NAMES
        ]
        schema_str = "stat string, " + ", ".join(f"`{c}` double" for c in fields)
        out = spark.createDataFrame(recs, schema=schema_str)
    t = Table.from_df(out, name=f"{table.table_name}_stats")
    return t
