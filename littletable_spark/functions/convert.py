"""Type-conversion helpers — the reference's closest thing to a type
system (littletable.py:1158-1284): ``convert_numeric``,
``parse_datetime``, ``parse_date``, ``parse_timedelta``.

Each helper is a ``ColumnTransform``: usable as a ``transforms=`` value
in the importers and as an in-place column conversion on a Table. All
compile to native expressions (``try_cast`` / ``try_to_timestamp`` +
regexp arithmetic) — no UDFs, ANSI-safe, errors become the configured
default instead of raising (the reference's on-error semantics).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class ColumnTransform:
    """A declarative str->T column conversion."""

    def to_column(self, col: Column) -> Column:  # pragma: no cover - interface
        raise NotImplementedError


class ConvertNumeric(ColumnTransform):
    """str -> number; `empty` for ''-cells, `non_numeric` for junk
    (littletable.py:1158-1220). Output column type is double — a Spark
    column holds one type, so the reference's per-cell int-vs-float
    distinction becomes integral doubles."""

    def __init__(
        self, empty: Any = 0, non_numeric: Any = None, force_float: bool = False
    ) -> None:
        self.empty = empty
        self.non_numeric = non_numeric
        self.force_float = force_float

    def to_column(self, col: Column) -> Column:
        trimmed = F.trim(col.cast("string"))
        parsed = trimmed.try_cast("double")
        out = (
            F.when(trimmed.isNull() | (trimmed == ""), F.lit(self.empty).cast("double"))
            .when(parsed.isNotNull(), parsed)
            .otherwise(F.lit(self.non_numeric).cast("double"))
        )
        return out


class ParseDatetime(ColumnTransform):
    def __init__(self, fmt: str | None = None) -> None:
        self.fmt = fmt

    def to_column(self, col: Column) -> Column:
        if self.fmt:
            return F.try_to_timestamp(col.cast("string"), F.lit(self.fmt))
        return F.try_to_timestamp(col.cast("string"))


class ParseDate(ColumnTransform):
    def __init__(self, fmt: str | None = None) -> None:
        self.fmt = fmt

    def to_column(self, col: Column) -> Column:
        return ParseDatetime(self.fmt).to_column(col).cast("date")


class ParseTimedelta(ColumnTransform):
    """'[D day[s], ]HH:MM:SS[.fff]' -> seconds as double.

    The reference produces ``datetime.timedelta`` cells; the portable
    columnar representation is total seconds (convert to
    DayTimeIntervalType with ``make_dt_interval`` when needed).
    """

    _PAT = r"^(?:(\d+)\s+days?,\s*)?(\d{1,3}):(\d{2}):(\d{2}(?:\.\d+)?)$"

    def to_column(self, col: Column) -> Column:
        s = F.trim(col.cast("string"))
        days = F.regexp_extract(s, self._PAT, 1).try_cast("double")
        hh = F.regexp_extract(s, self._PAT, 2).try_cast("double")
        mm = F.regexp_extract(s, self._PAT, 3).try_cast("double")
        ss = F.regexp_extract(s, self._PAT, 4).try_cast("double")
        total = (
            F.coalesce(days, F.lit(0.0)) * 86400
            + hh * 3600
            + mm * 60
            + ss
        )
        return F.when(s.rlike(self._PAT), total).otherwise(F.lit(None).cast("double"))


def convert_numeric(
    empty: Any = 0, non_numeric: Any = None, force_float: bool = False
) -> ConvertNumeric:
    return ConvertNumeric(empty, non_numeric, force_float)


def parse_datetime(fmt: str | None = None) -> ParseDatetime:
    return ParseDatetime(fmt)


def parse_date(fmt: str | None = None) -> ParseDate:
    return ParseDate(fmt)


def parse_timedelta() -> ParseTimedelta:
    return ParseTimedelta()
