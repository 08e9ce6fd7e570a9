"""Table.update (conditional in-place column update) and Table.upsert
(keyed MERGE: replace matched in place, append unmatched) — the
Spark-idiomatic replacements for the reference idiom of mutating row
objects directly (impossible over immutable DataFrame rows)."""

import pytest
from pyspark.sql import functions as F

from littletable_spark import Table
from littletable_spark.exceptions import UniqueKeyViolation


@pytest.fixture()
def inv(spark):
    t = Table("inv", spark=spark)
    t.insert_many(
        [
            {"sku": "a", "qty": 5, "status": "ok"},
            {"sku": "b", "qty": 0, "status": "ok"},
            {"sku": "c", "qty": 7, "status": "hold"},
            {"sku": "d", "qty": 0, "status": "hold"},
        ]
    )
    return t


def test_update_literal_with_criteria(inv):
    n = inv.update({"qty": 0}, status="restock")
    assert n == 2
    rows = {r.sku: (r.qty, r.status) for r in inv}
    assert rows == {
        "a": (5, "ok"),
        "b": (0, "restock"),
        "c": (7, "hold"),
        "d": (0, "restock"),
    }
    # row order untouched by the narrow projection
    assert [r.sku for r in inv] == ["a", "b", "c", "d"]


def test_update_column_callable_and_all_rows(inv):
    # Column expression over the current row
    inv.update({"status": "hold"}, qty=F.col("qty") + 100)
    assert {r.sku: r.qty for r in inv} == {"a": 5, "b": 0, "c": 107, "d": 100}
    # callable (typed via first-matching-row probe); where=None -> all rows
    n = inv.update(None, double_qty=lambda r: r.qty * 2)
    assert n == 4
    assert {r.sku: r.double_qty for r in inv} == {
        "a": 10, "b": 0, "c": 214, "d": 200,
    }


def test_update_new_column_null_elsewhere(inv):
    inv.update({"sku": Table.is_in(["a", "c"])}, flag=1)
    flags = {r.sku: r.flag for r in inv}
    assert flags == {"a": 1, "b": None, "c": 1, "d": None}


def test_update_comparator_and_sql_string_where(inv):
    assert inv.update({"qty": Table.gt(4)}, status="big") == 2
    assert inv.update("qty = 0", status="zero") == 2
    assert {r.sku: r.status for r in inv} == {
        "a": "big", "b": "zero", "c": "big", "d": "zero",
    }


def test_update_unique_violation_is_atomic(inv):
    inv.create_index("sku", unique=True)
    before = [(r.sku, r.qty, r.status) for r in inv]
    with pytest.raises(UniqueKeyViolation):
        inv.update({"status": "hold"}, sku="dup")  # c and d both -> "dup"
    assert [(r.sku, r.qty, r.status) for r in inv] == before


def test_upsert_replaces_in_place_and_appends(inv):
    out = inv.upsert(
        [
            {"sku": "b", "qty": 42, "status": "refill"},
            {"sku": "e", "qty": 9, "status": "new"},
        ],
        key="sku",
    )
    assert out is inv
    assert [r.sku for r in inv] == ["a", "b", "c", "d", "e"]  # b in place, e appended
    rows = {r.sku: (r.qty, r.status) for r in inv}
    assert rows["b"] == (42, "refill") and rows["e"] == (9, "new")
    assert rows["a"] == (5, "ok")


def test_upsert_widens_schema_and_takes_table(inv, spark):
    batch = Table("batch", spark=spark)
    batch.insert_many([{"sku": "a", "origin": "eu"}, {"sku": "z", "origin": "us"}])
    inv.upsert(batch, key="sku")
    rows = {r.sku: r.origin for r in inv}
    assert rows["a"] == "eu" and rows["z"] == "us"
    assert rows["b"] is None  # widened column, untouched row
    # replaced row keeps its other columns
    assert {r.qty for r in inv.where(sku="a")} == {5}


def test_upsert_guards(inv):
    before = len(inv)
    with pytest.raises(UniqueKeyViolation, match="ambiguous"):
        inv.upsert([{"sku": "x", "qty": 1}, {"sku": "x", "qty": 2}], key="sku")
    assert len(inv) == before
    with pytest.raises(ValueError, match="no key column"):
        inv.upsert([{"qty": 1}], key="sku")


def test_upsert_into_empty_table(spark):
    t = Table("empty_up", spark=spark)
    t.upsert([{"k": 1, "v": "a"}], key="k")
    assert [(r.k, r.v) for r in t] == [(1, "a")]


def test_update_predicate_overlapping_set_column(inv):
    """Round-7 advisor repro: when the where-predicate references a
    column that is ALSO being set, every later set must still see the
    pre-update match (the predicate is materialized once, not
    re-resolved against the half-updated frame)."""
    n = inv.update({"status": "hold"}, status="done", qty=999)
    assert n == 2
    rows = {r.sku: (r.status, r.qty) for r in inv}
    assert rows == {
        "a": ("ok", 5),
        "b": ("ok", 0),
        "c": ("done", 999),
        "d": ("done", 999),
    }


def test_update_set_order_sees_prior_sets(inv):
    """Column set values apply in order (the reference's sequential
    row-mutation idiom): a later set referencing an earlier-set column
    sees the NEW value; the match itself stays pre-update."""
    inv.update({"status": "hold"}, qty=F.col("qty") + 100, qty2=F.col("qty"))
    rows = {r.sku: (r.qty, r.qty2) for r in inv}
    assert rows["c"] == (107, 107)
    assert rows["a"] == (5, None)


def test_upsert_unique_violation_on_replaced_column(inv):
    """upsert must enforce unique indexes like every other mutation
    path: a replaced non-key column colliding with an untouched row
    raises and leaves the table unchanged."""
    t2 = Table("u2", spark=inv.spark)
    t2.insert_many(
        [
            {"sku": "a", "qty": 1, "status": "ok"},
            {"sku": "b", "qty": 2, "status": "ok"},
            {"sku": "c", "qty": 3, "status": "hold"},
            {"sku": "d", "qty": 4, "status": "hold"},
        ]
    )
    t2.create_index("qty", unique=True)
    before = [(r.sku, r.qty, r.status) for r in t2]
    with pytest.raises(UniqueKeyViolation):
        # replaces b.qty -> 3, colliding with untouched c.qty == 3
        t2.upsert([{"sku": "b", "qty": 3}], key="sku")
    assert [(r.sku, r.qty, r.status) for r in t2] == before


def test_upsert_unique_violation_on_appended_null(spark):
    """appended rows get NULL for columns absent from the batch; an
    accept_none=False unique index on such a column must reject the
    merge atomically."""
    t = Table("u3", spark=spark)
    t.insert_many([{"k": 1, "u": 10}, {"k": 2, "u": 20}])
    t.create_index("u", unique=True)
    before = [(r.k, r.u) for r in t]
    with pytest.raises(UniqueKeyViolation):
        t.upsert([{"k": 3}], key="k")  # appends with u = NULL
    assert [(r.k, r.u) for r in t] == before


def test_upsert_valid_merge_with_unique_index_passes(spark):
    t = Table("u4", spark=spark)
    t.insert_many([{"k": 1, "u": 10}, {"k": 2, "u": 20}])
    t.create_index("u", unique=True)
    t.upsert([{"k": 2, "u": 25}, {"k": 3, "u": 30}], key="k")
    assert {r.k: r.u for r in t} == {1: 10, 2: 25, 3: 30}
