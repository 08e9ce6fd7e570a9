"""Excel import/export (littletable.py:3019-3115, 3415-3459).

Driver-side decode (xlsx is not a splittable format — the reference is
driver-bound here too), then ``createDataFrame``. Uses openpyxl when
present; otherwise falls back to the stdlib-only SpreadsheetML codec in
``xlsx_lite`` (zipfile + xml.etree), so Excel support works in
environments without openpyxl. Excel-native cell types
(int/float/str/bool/date — reference fixture test/data_types.xlsx) are
preserved either way.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from ..table import Table


def _read_grid(source: Any, sheet: str | int | None) -> list[list[Any]]:
    try:
        import openpyxl
    except ImportError:
        from .xlsx_lite import read_xlsx

        return read_xlsx(source, sheet)
    wb = openpyxl.load_workbook(source, read_only=True, data_only=True)
    ws = wb[sheet] if isinstance(sheet, str) else wb.worksheets[sheet or 0]
    return [list(r) for r in ws.iter_rows(values_only=True)]


def excel_import(
    source: Any,
    sheet: str | int | None = None,
    transforms: dict[str, Any] | None = None,
    limit: int | None = None,
    row_class: Any = None,
    spark: SparkSession | None = None,
    **kwargs: Any,
) -> Table:
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    grid = _read_grid(source, sheet)
    header = [str(h) for h in grid[0]]
    dicts = [dict(zip(header, r)) for r in grid[1:]]
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
    t.row_class = row_class
    t.import_source_type = "excel"
    t.import_source = str(source)[:256]
    import datetime as _dt

    t.import_time = _dt.datetime.now().astimezone(_dt.timezone.utc)
    return t


def excel_export(table: Table, dest: Any, fieldnames: Any = None, **kwargs: Any) -> None:
    t = table.select(fieldnames) if fieldnames is not None else table
    try:
        import openpyxl
    except ImportError:
        from .xlsx_lite import write_xlsx

        grid: list[list[Any]] = [list(t.fields)]
        for ns in t:
            grid.append([getattr(ns, c, None) for c in t.fields])
        write_xlsx(dest, grid, sheet_name=table.table_name or "Sheet1")
        return
    wb = openpyxl.Workbook()
    ws = wb.active
    ws.append(t.fields)
    for ns in t:
        ws.append([getattr(ns, c, None) for c in t.fields])
    wb.save(dest)
