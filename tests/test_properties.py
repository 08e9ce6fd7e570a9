"""Property-based tests (hypothesis) — randomized equivalence between the
engine and in-memory Python over small generated tables. The reference
suite has none of these (SURVEY §5.6); they guard the ordered-bag and
filter semantics against edge inputs (negatives, duplicates, empty)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from littletable_spark import Table

rows_strategy = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(-5, 5)), min_size=0, max_size=12
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def make_table(spark, rows):
    t = Table("prop", spark=spark)
    if rows:
        t.insert_many([{"a": a, "b": b} for a, b in rows])
    return t


@given(rows=rows_strategy, lo=st.integers(-5, 5))
@SETTINGS
def test_where_matches_python_filter(spark, rows, lo):
    t = make_table(spark, rows)
    got = sorted((r.a, r.b) for r in t.where(a=Table.gt(lo)))
    expect = sorted((a, b) for a, b in rows if a > lo)
    assert got == expect


@given(rows=rows_strategy)
@SETTINGS
def test_orderby_matches_python_sorted(spark, rows):
    t = make_table(spark, rows)
    t.orderby("a, b desc")
    got = [(r.a, r.b) for r in t]
    expect = sorted(rows, key=lambda x: (x[0], -x[1]))
    assert got == expect


@given(rows=rows_strategy)
@SETTINGS
def test_unique_keep_first(spark, rows):
    t = make_table(spark, rows)
    got = [(r.a, r.b) for r in t.unique(key="a")]
    seen, expect = set(), []
    for a, b in rows:
        if a not in seen:
            seen.add(a)
            expect.append((a, b))
    assert sorted(got) == sorted(expect)


@given(rows=rows_strategy, n=st.integers(1, 5))
@SETTINGS
def test_head_slice_consistency(spark, rows, n):
    t = make_table(spark, rows)
    if not rows:
        pytest.skip("empty table has no schema")
    head = [(r.a, r.b) for r in t.head(n)]
    sliced = [(r.a, r.b) for r in t[0:n]]
    assert head == rows[:n]
    assert sliced == rows[:n]
