"""Comparator objects for ``Table.where(attr=Table.gt(100))`` style filters.

Capability parity with the reference's comparator factory
(littletable.py:998-1139): lt/le/gt/ge/ne/eq, is_none/is_not_none,
is_null/is_not_null, is_in/not_in, startswith/endswith, between/within/
in_range, plus the documented regex idiom (how_to_use_littletable.md:615-646)
exposed as ``re_match``.

Instead of per-row Python predicates, each comparator compiles to a native
``pyspark.sql.Column`` expression so Catalyst can push it into the scan.
The reference's "TypeError during compare is False" rule
(littletable.py:1006-1009) maps onto SQL three-valued logic: comparisons
against NULL are NULL and are dropped by ``filter`` — same observable
behavior, no UDF needed.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


class Comparator:
    """A deferred predicate on a single attribute, compiled to a Column."""

    __slots__ = ("_fn", "_desc")

    def __init__(self, fn: Callable[[Column], Column], desc: str) -> None:
        self._fn = fn
        self._desc = desc

    def to_column(self, col: Column) -> Column:
        return self._fn(col)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Comparator({self._desc})"


def lt(value: Any) -> Comparator:
    return Comparator(lambda c: c < F.lit(value), f"< {value!r}")


def le(value: Any) -> Comparator:
    return Comparator(lambda c: c <= F.lit(value), f"<= {value!r}")


def gt(value: Any) -> Comparator:
    return Comparator(lambda c: c > F.lit(value), f"> {value!r}")


def ge(value: Any) -> Comparator:
    return Comparator(lambda c: c >= F.lit(value), f">= {value!r}")


def eq(value: Any) -> Comparator:
    return Comparator(lambda c: c == F.lit(value), f"== {value!r}")


def ne(value: Any) -> Comparator:
    # Python None != value is True, so None/missing rows are INCLUDED by
    # the reference; plain SQL != would drop them under 3VL
    return Comparator(
        lambda c: c.isNull() | (c != F.lit(value)), f"!= {value!r}"
    )


def is_none() -> Comparator:
    """Identity-None test (littletable.py:1022-1036)."""
    return Comparator(lambda c: c.isNull(), "is None")


def is_not_none() -> Comparator:
    return Comparator(lambda c: c.isNotNull(), "is not None")


def is_null() -> Comparator:
    """None, empty string, or missing attribute (littletable.py:1039-1057)."""
    return Comparator(lambda c: c.isNull() | (c.cast("string") == F.lit("")), "is null")


def is_not_null() -> Comparator:
    return Comparator(
        lambda c: c.isNotNull() & (c.cast("string") != F.lit("")), "is not null"
    )


def is_in(values: Iterable[Any]) -> Comparator:
    vals = list(values)
    return Comparator(lambda c: c.isin(vals), f"in {vals!r}")


def not_in(values: Iterable[Any]) -> Comparator:
    vals = list(values)
    # Python `None not in seq` is True (when None isn't in seq), so
    # None/missing rows are INCLUDED by the reference; ~isin would drop
    # them under SQL 3VL
    return Comparator(
        lambda c: c.isNull() | ~c.isin(vals), f"not in {vals!r}"
    )


def startswith(prefix: str) -> Comparator:
    return Comparator(lambda c: c.startswith(prefix), f"startswith {prefix!r}")


def endswith(suffix: str) -> Comparator:
    return Comparator(lambda c: c.endswith(suffix), f"endswith {suffix!r}")


def between(lower: Any, upper: Any) -> Comparator:
    """Exclusive both ends: lower < x < upper (littletable.py:1060-1082)."""
    return Comparator(
        lambda c: (c > F.lit(lower)) & (c < F.lit(upper)), f"between {lower!r},{upper!r}"
    )


def within(lower: Any, upper: Any) -> Comparator:
    """Inclusive both ends: lower <= x <= upper (littletable.py:1134-1136)."""
    return Comparator(lambda c: c.between(F.lit(lower), F.lit(upper)), "within")


def in_range(lower: Any, upper: Any) -> Comparator:
    """Half-open: lower <= x < upper (littletable.py:1137-1139)."""
    return Comparator(
        lambda c: (c >= F.lit(lower)) & (c < F.lit(upper)), "in_range"
    )


def re_match(pattern: str | re.Pattern) -> Comparator:
    """Regex search anywhere in the value — ``rlike`` (Java regex) native."""
    pat = pattern.pattern if isinstance(pattern, re.Pattern) else pattern
    return Comparator(lambda c: c.rlike(pat), f"~ /{pat}/")
