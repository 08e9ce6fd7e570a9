"""CSV/TSV import with reference semantics.

Capability parity: ``csv_import``/``tsv_import`` (littletable.py:2872-3017)
including string-first typing (every column arrives as string unless a
transform converts it — littletable.py:2892-2898), per-column
``transforms`` with ``(fn, default)`` error handling and the ``"*"``
wildcard (littletable.py:2763-2808), pre-insert ``filters``
(littletable.py:2810-2840), ``limit``, and ``fieldnames`` for headerless
files.

Spark-first: the scan is ``spark.read.csv`` (parallel, pushdown-capable);
transforms compile to native casts when they are the well-known
converters (int/float/str), degrading to UDFs only for arbitrary
callables — mirroring the engine-wide slow-path rule.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SQLT

from ..table import Table
from .resolver import resolve_source

_NATIVE_CASTS: dict[Any, str] = {
    int: "bigint",
    float: "double",
    str: "string",
    bool: "boolean",
}


def _transform_column(col: Column, fn: Any, default: Any) -> Column:
    """Compile a transform to a native try_cast when possible."""
    from ..functions.convert import ColumnTransform

    if isinstance(fn, ColumnTransform):
        out = fn.to_column(col)
        if default is not None:
            out = F.coalesce(out, F.lit(default))
        return out
    if fn in _NATIVE_CASTS:
        out = col.try_cast(_NATIVE_CASTS[fn])
        if default is not None:
            out = F.coalesce(out, F.lit(default))
        return out
    # arbitrary callable -> UDF with reference on-error default semantics
    def safe(v: Any, _fn=fn, _d=default) -> Any:
        try:
            return _fn(v)
        except Exception:
            return _d

    return F.udf(safe)(col)


def csv_import(
    source: Any,
    encoding: str = "utf-8",
    transforms: dict[str, Any] | None = None,
    filters: dict[str, Any] | None = None,
    row_class: Any = None,
    limit: int | None = None,
    fieldnames: list[str] | str | None = None,
    delimiter: str = ",",
    spark: SparkSession | None = None,
    zippath: str | None = None,
    **kwargs: Any,
) -> Table:
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    # URL auth/SSL passthrough (reference littletable.py:804-833)
    resolved = resolve_source(
        source,
        suffix=".csv",
        zippath=zippath,
        username=kwargs.get("username"),
        password=kwargs.get("password"),
        cafile=kwargs.get("cafile"),
    )
    reader = (
        spark.read.option("header", fieldnames is None)
        .option("sep", delimiter)
        .option("encoding", encoding)
        .option("inferSchema", False)  # string-first, reference semantics
    )
    df = reader.csv(resolved.path)
    if fieldnames is not None:
        names = fieldnames.split() if isinstance(fieldnames, str) else list(fieldnames)
        df = df.toDF(*names)

    if transforms:
        wildcard = transforms.get("*")
        for c in df.columns:
            spec = transforms.get(c, wildcard if wildcard is not None else None)
            if spec is None or c == "*":
                continue
            fn, default = (spec if isinstance(spec, tuple) else (spec, None))
            df = df.withColumn(c, _transform_column(F.col(c), fn, default))

    t = Table(name=str(source)[:80], df=df, spark=spark)
    if filters:
        t = t.where(**filters)
    if limit is not None:
        t = t.head(limit)
    # rows materialize as row_class(**fields), reference littletable.py:2846
    t.row_class = row_class
    t.import_source_type = resolved.source_type
    t.import_source = str(source)[:256]
    import datetime as _dt

    t.import_time = _dt.datetime.now().astimezone(_dt.timezone.utc)
    return t


def tsv_import(source: Any, **kwargs: Any) -> Table:
    kwargs.setdefault("delimiter", "\t")
    return csv_import(source, **kwargs)
