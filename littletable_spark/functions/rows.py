"""Row-object ingestion: convert arbitrary Python record objects to dicts.

The reference accepts any object type as a row — dict, namedtuple,
dataclass, SimpleNamespace, slotted class, attrs, pydantic
(README.md:14-26; littletable.py:398-417 is its own converter). We accept
the same surface at the ingestion boundary and normalize to plain dicts,
which Spark's ``createDataFrame`` then turns into typed Rows.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping


def to_row_dict(obj: Any) -> dict[str, Any]:
    if isinstance(obj, Mapping):
        return {str(k): _normalize_value(v) for k, v in obj.items()}
    # namedtuple
    if isinstance(obj, tuple) and hasattr(obj, "_fields") and hasattr(obj, "_asdict"):
        return {k: _normalize_value(v) for k, v in obj._asdict().items()}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            f.name: _normalize_value(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    # attrs classes (slots or not): field list lives on the type
    attrs_fields = getattr(type(obj), "__attrs_attrs__", None)
    if attrs_fields:
        return {
            f.name: _normalize_value(getattr(obj, f.name)) for f in attrs_fields
        }
    # traitlets HasTraits: values live behind descriptors, instance
    # __dict__ holds only private machinery — use the traits API
    if callable(getattr(obj, "trait_values", None)) and callable(
        getattr(obj, "trait_names", None)
    ):
        return {
            str(k): _normalize_value(v) for k, v in obj.trait_values().items()
        }
    # pydantic v2 / v1
    for meth in ("model_dump", "dict"):
        fn = getattr(obj, meth, None)
        if callable(fn) and not isinstance(obj, type):
            try:
                return {str(k): _normalize_value(v) for k, v in fn().items()}
            except TypeError:
                pass
    # plain __dict__ objects (SimpleNamespace, user classes)
    if hasattr(obj, "__dict__") and obj.__dict__:
        return {
            k: _normalize_value(v)
            for k, v in vars(obj).items()
            if not k.startswith("_")
        }
    # slotted classes
    slots = getattr(type(obj), "__slots__", None)
    if slots:
        return {
            s: _normalize_value(getattr(obj, s, None))
            for s in ([slots] if isinstance(slots, str) else slots)
        }
    raise TypeError(f"cannot convert {type(obj).__name__} to a row dict")


def _normalize_value(v: Any) -> Any:
    """Nested dicts/objects become Rows → Spark StructType.

    Mirrors the reference's recursive dict wrapping into namespaces
    (littletable.py:1147-1156): a struct, not a map — map inference would
    force one common value type across heterogeneous nested fields.
    """
    if isinstance(v, Mapping):
        from pyspark.sql import Row

        return Row(**{str(k): _normalize_value(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)) and not hasattr(v, "_fields"):
        return [_normalize_value(x) for x in v]
    if hasattr(v, "__dict__") and not isinstance(v, type) and vars(v):
        cls = type(v).__module__
        if cls not in ("builtins", "datetime", "decimal", "numpy"):
            from pyspark.sql import Row

            return Row(**{str(k): _normalize_value(x) for k, x in vars(v).items()})
    return v
