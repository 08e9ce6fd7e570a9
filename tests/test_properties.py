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


# ---- xlsx codec round-trip (no Spark: pure driver-side codec) ---------- #

_cell = st.one_of(
    st.none(),
    st.integers(-(10**12), 10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
        ),
        max_size=18,
    ),
    st.dates(),
    st.datetimes(
        min_value=__import__("datetime").datetime(1901, 1, 1),
        max_value=__import__("datetime").datetime(2200, 1, 1),
    ),
)


@given(
    grid=st.lists(
        st.lists(_cell, min_size=1, max_size=5), min_size=1, max_size=6
    ).filter(lambda g: len({len(r) for r in g}) == 1)
)
@settings(max_examples=40, deadline=None)
def test_xlsx_roundtrip_property(grid):
    """write_xlsx → read_xlsx is the identity for every Excel-native cell
    type (the writer never silently coerces)."""
    import datetime
    import io

    from littletable_spark.sources.xlsx_lite import read_xlsx, write_xlsx

    buf = io.BytesIO()
    write_xlsx(buf, grid)
    back = read_xlsx(buf.getvalue())

    def norm(v):
        # Excel has one numeric type: integral floats read back as ints,
        # and datetimes are serial numbers (sub-microsecond truncation)
        if isinstance(v, float) and v == int(v) and abs(v) < 10**15:
            return int(v)
        if isinstance(v, datetime.datetime):
            return v.replace(microsecond=v.microsecond // 1000 * 1000)
        if isinstance(v, str) and v == "":
            return None  # empty text cell is indistinguishable from blank
        return v

    assert len(back) == len(grid)
    for got_row, exp_row in zip(back, grid):
        assert [norm(v) for v in got_row] == [norm(v) for v in exp_row]
