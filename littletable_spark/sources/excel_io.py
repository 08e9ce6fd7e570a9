"""Excel import/export (littletable.py:3019-3115, 3415-3459).

Driver-side openpyxl (xlsx is not a splittable format — the reference is
driver-bound here too), then ``createDataFrame``. Gated behind an
import-try: raises a clear error when openpyxl is absent.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from ..table import Table


def excel_import(
    source: Any,
    sheet: str | int | None = None,
    transforms: dict[str, Any] | None = None,
    limit: int | None = None,
    spark: SparkSession | None = None,
    **kwargs: Any,
) -> Table:
    try:
        import openpyxl
    except ImportError as e:
        raise ImportError(
            "excel_import requires openpyxl (not installed in this environment)"
        ) from e
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    wb = openpyxl.load_workbook(source, read_only=True, data_only=True)
    ws = (
        wb[sheet]
        if isinstance(sheet, str)
        else wb.worksheets[sheet or 0]
    )
    rows = ws.iter_rows(values_only=True)
    header = [str(h) for h in next(rows)]
    dicts = [dict(zip(header, r)) for r in rows]
    if limit is not None:
        dicts = dicts[:limit]
    t = Table(name=str(source)[:80], spark=spark)
    t.insert_many(dicts)
    if transforms:
        from pyspark.sql import functions as F

        from .csv_io import _transform_column

        for c, spec in transforms.items():
            if c in t.fields:
                fn, default = (spec if isinstance(spec, tuple) else (spec, None))
                t._mutate(
                    t._require_df().withColumn(c, _transform_column(F.col(c), fn, default))
                )
    t.import_source_type = "excel"
    t.import_source = str(source)[:256]
    return t


def excel_export(table: Table, dest: Any, fieldnames: Any = None, **kwargs: Any) -> None:
    try:
        import openpyxl
    except ImportError as e:
        raise ImportError(
            "excel_export requires openpyxl (not installed in this environment)"
        ) from e
    wb = openpyxl.Workbook()
    ws = wb.active
    t = table.select(fieldnames) if fieldnames is not None else table
    ws.append(t.fields)
    for ns in t:
        ws.append([getattr(ns, c, None) for c in t.fields])
    wb.save(dest)
