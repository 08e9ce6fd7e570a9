"""Row-type parameterization — the reference suite's backbone
(unit_tests.py:220-365 runs every test class per storage type). Here:
every supported record representation ingests to the same table."""

from collections import namedtuple
from dataclasses import dataclass
from types import SimpleNamespace
from typing import NamedTuple

import pytest

from littletable_spark import Table

NT = namedtuple("NT", "a b c")


class TypedNT(NamedTuple):
    a: int
    b: int
    c: int


@dataclass
class DC:
    a: int
    b: int
    c: int


class Slotted:
    __slots__ = ("a", "b", "c")

    def __init__(self, a, b, c):
        self.a, self.b, self.c = a, b, c


class Plain:
    def __init__(self, a, b, c):
        self.a, self.b, self.c = a, b, c


def _pydantic_rows():
    try:
        from pydantic import BaseModel
    except ImportError:
        pytest.skip("pydantic not installed")

    class PM(BaseModel):
        a: int
        b: int
        c: int

    return [PM(a=i, b=i * 2, c=i * 3) for i in range(3)]


ROW_MAKERS = {
    "dict": lambda: [{"a": i, "b": i * 2, "c": i * 3} for i in range(3)],
    "namedtuple": lambda: [NT(i, i * 2, i * 3) for i in range(3)],
    "typing_namedtuple": lambda: [TypedNT(i, i * 2, i * 3) for i in range(3)],
    "dataclass": lambda: [DC(i, i * 2, i * 3) for i in range(3)],
    "simplenamespace": lambda: [SimpleNamespace(a=i, b=i * 2, c=i * 3) for i in range(3)],
    "slotted": lambda: [Slotted(i, i * 2, i * 3) for i in range(3)],
    "plain_object": lambda: [Plain(i, i * 2, i * 3) for i in range(3)],
    "pydantic": _pydantic_rows,
}


@pytest.mark.parametrize("kind", list(ROW_MAKERS))
def test_ingest_row_type(spark, kind):
    rows = ROW_MAKERS[kind]()
    t = Table(kind, spark=spark)
    t.insert_many(rows)
    assert t.fields == ["a", "b", "c"]
    assert len(t) == 3
    got = sorted((r.a, r.b, r.c) for r in t)
    assert got == [(0, 0, 0), (1, 2, 3), (2, 4, 6)]
    # query path works identically regardless of source representation
    assert len(t.where(b=Table.gt(0))) == 2


def test_nested_dict_becomes_struct(spark):
    t = Table("nested", spark=spark)
    t.insert({"title": "ep1", "cast": {"kirk": "shatner", "spock": "nimoy"}})
    row = t[0]
    assert row.cast["kirk"] == "shatner"


def test_nested_namespace_becomes_struct(spark):
    t = Table("nested2", spark=spark)
    t.insert(SimpleNamespace(title="ep1", meta=SimpleNamespace(season=2, rating=8.5)))
    row = t[0]
    assert row.meta["season"] == 2 and row.meta["rating"] == 8.5


def test_list_cell_becomes_array(spark):
    t = Table("arr", spark=spark)
    t.insert({"id": 1, "tags": ["x", "y"]})
    assert t[0].tags == ["x", "y"]


def test_stats_approx_mode(spark):
    t = Table.parquet_import(spark, "/root/testdata/sf0.001/lineitem.parquet")
    exact = {r.name: r.median for r in t.stats(["l_quantity"])}
    approx = {r.name: r.median for r in t.stats(["l_quantity"], approx=True)}
    assert abs(exact["l_quantity"] - approx["l_quantity"]) <= 1.0


def _attrs_rows():
    try:
        import attr
    except ImportError:
        pytest.skip("attrs not installed")

    @attr.s(auto_attribs=True)
    class AR:
        a: int
        b: int
        c: int

    return [AR(a=i, b=i * 2, c=i * 3) for i in range(3)]


def _attrs_slots_rows():
    try:
        import attr
    except ImportError:
        pytest.skip("attrs not installed")

    @attr.s(auto_attribs=True, slots=True)
    class ARS:
        a: int
        b: int
        c: int

    return [ARS(a=i, b=i * 2, c=i * 3) for i in range(3)]


def _traitlets_rows():
    try:
        from traitlets import HasTraits, Int
    except ImportError:
        pytest.skip("traitlets not installed")

    class TR(HasTraits):
        a = Int()
        b = Int()
        c = Int()

    return [TR(a=i, b=i * 2, c=i * 3) for i in range(3)]


def _typeddict_rows():
    from typing import TypedDict

    class TD(TypedDict):
        a: int
        b: int
        c: int

    return [TD(a=i, b=i * 2, c=i * 3) for i in range(3)]


ROW_MAKERS.update(
    {
        "attrs": _attrs_rows,
        "attrs_slots": _attrs_slots_rows,
        "traitlets": _traitlets_rows,
        "typeddict": _typeddict_rows,
    }
)


@pytest.mark.parametrize(
    "kind", ["attrs", "attrs_slots", "traitlets", "typeddict"]
)
def test_ingest_extended_row_type(spark, kind):
    rows = ROW_MAKERS[kind]()
    t = Table(kind, spark=spark)
    t.insert_many(rows)
    assert t.fields == ["a", "b", "c"]
    got = sorted((r.a, r.b, r.c) for r in t)
    assert got == [(0, 0, 0), (1, 2, 3), (2, 4, 6)]
    assert len(t.where(b=Table.gt(0))) == 2


def test_attrs_row_class_round_trip(spark):
    """row_class= materialization with an attrs class (kw-constructible)."""
    import attr

    @attr.s(auto_attribs=True)
    class ARow:
        a: int
        b: int
        c: int

    t = Table("attrs_rc", spark=spark)
    t.insert_many([{"a": 1, "b": 2, "c": 3}, {"a": 4, "b": 5, "c": 6}])
    t._row_class = ARow
    rows = sorted(t, key=lambda r: r.a)
    assert all(isinstance(r, ARow) for r in rows)
    assert (rows[1].a, rows[1].b, rows[1].c) == (4, 5, 6)


def test_traitlets_row_class_round_trip(spark):
    from traitlets import HasTraits, Int

    class TRow(HasTraits):
        a = Int()
        b = Int()
        c = Int()

    t = Table("traitlets_rc", spark=spark)
    t.insert_many([{"a": 1, "b": 2, "c": 3}])
    t._row_class = TRow
    (row,) = list(t)
    assert isinstance(row, TRow) and (row.a, row.b, row.c) == (1, 2, 3)
