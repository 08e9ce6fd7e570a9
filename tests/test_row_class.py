"""Row-class fidelity: user row types round-trip through import and
iteration (reference littletable.py:2751-2758, 2846; test matrix
unit_tests.py:220-365)."""

from collections import namedtuple
from dataclasses import dataclass

import pytest

from littletable_spark import Table, csv_import

Rec = namedtuple("Rec", "a b c")


@dataclass
class DRec:
    a: int
    b: int
    c: int


class SlottedRec:
    __slots__ = ("a", "b", "c")

    def __init__(self, a, b, c):
        self.a = a
        self.b = b
        self.c = c

    def __eq__(self, other):
        return (self.a, self.b, self.c) == (other.a, other.b, other.c)


CSV = "a,b,c\n1,2,3\n4,5,6\n"


@pytest.mark.parametrize("cls", [Rec, DRec, SlottedRec])
def test_csv_import_row_class_materializes(spark, cls):
    t = csv_import(CSV, transforms={"*": int}, row_class=cls, spark=spark)
    rows = list(t)
    assert all(isinstance(r, cls) for r in rows)
    assert (rows[0].a, rows[0].b, rows[0].c) == (1, 2, 3)
    assert (rows[1].a, rows[1].b, rows[1].c) == (4, 5, 6)


def test_row_class_survives_derivation(spark):
    t = csv_import(CSV, transforms={"*": int}, row_class=Rec, spark=spark)
    filtered = t.where(a=Table.gt(1))
    rows = list(filtered)
    assert rows and all(isinstance(r, Rec) for r in rows)
    assert isinstance(t[0], Rec)
    assert isinstance(t.clone()[0], Rec)


def test_row_class_via_indexed_access(spark):
    t = csv_import(CSV, transforms={"*": int}, row_class=Rec, spark=spark)
    t.create_index("a", unique=True)
    assert isinstance(t.by.a[4], Rec)


def test_typed_rows_insert_and_materialize(spark):
    t = Table("typed", spark=spark)
    t.insert_many([Rec(1, 2, 3), Rec(4, 5, 6)])
    t.row_class = Rec
    assert list(t) == [Rec(1, 2, 3), Rec(4, 5, 6)]


def test_row_class_default_is_simplenamespace(spark):
    from types import SimpleNamespace

    t = csv_import(CSV, spark=spark)
    assert isinstance(t[0], SimpleNamespace)
    assert t.row_class is SimpleNamespace
