"""JSON / JSONL import.

Capability parity: ``json_import`` (littletable.py:3204-3312) — JSON
array documents, JSONL streams, and ``path=`` descent into a nested
container. Spark-first: ``spark.read.json`` parses JSONL natively in
parallel; array documents use ``multiLine``; ``path=`` descent becomes
``select``/``explode`` on the parsed structure (nested objects arrive as
StructType columns, mirroring the reference's recursive namespace wrap).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..table import Table
from .resolver import resolve_source


def json_import(
    source: Any,
    path: str = "",
    streaming: bool = False,
    transforms: dict[str, Any] | None = None,
    limit: int | None = None,
    row_class: Any = None,
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
        suffix=".json",
        zippath=zippath,
        username=kwargs.get("username"),
        password=kwargs.get("password"),
        cafile=kwargs.get("cafile"),
    )

    # sniff document shape: JSONL (default) vs single JSON array/object
    with open(resolved.path, "rb") as f:
        head = f.read(4096).lstrip()
    is_array_doc = head.startswith(b"[") or (head.startswith(b"{") and path)

    if is_array_doc or path:
        df = spark.read.option("multiLine", True).json(resolved.path)
        if path:
            # descend a dotted path into the container, exploding arrays
            for part in path.split("."):
                if part in df.columns:
                    field_type = df.schema[part].dataType.typeName()
                    if field_type == "array":
                        df = df.select(F.explode(F.col(part)).alias("__elem__"))
                        df = df.select("__elem__.*")
                    else:
                        df = df.select(F.col(f"{part}.*"))
                else:
                    raise KeyError(f"json path element {part!r} not found")
    else:
        df = spark.read.json(resolved.path)

    t = Table(name=str(source)[:80], df=df, spark=spark)
    if transforms:
        for c, spec in transforms.items():
            if c in t.fields:
                from .csv_io import _transform_column

                fn, default = (spec if isinstance(spec, tuple) else (spec, None))
                t._mutate(t._require_df().withColumn(c, _transform_column(F.col(c), fn, default)))
    if limit is not None:
        t = t.head(limit)
    t.row_class = row_class
    t.import_source_type = resolved.source_type
    t.import_source = str(source)[:256]
    import datetime as _dt

    t.import_time = _dt.datetime.now().astimezone(_dt.timezone.utc)
    return t
