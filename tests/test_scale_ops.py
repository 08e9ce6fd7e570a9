"""Scale machinery: salted joins, bucketed co-located joins, raw-mode
search, typed callable summaries, comparator-on-missing-attr edge."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from littletable_spark import Table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    big = Table("big", spark=spark)
    # skewed: key 1 holds most rows
    big.insert_many([{"k": 1 if i % 10 else i, "v": i} for i in range(200)])
    dim = Table("dim", spark=spark)
    dim.insert_many([{"k": i, "label": f"L{i}"} for i in range(200)])
    plain = big.join(dim, **{"k": "k"})
    from littletable_spark.operators.joins import salted_join

    salted = salted_join(big, dim, "k", "k", salt=8)
    a = sorted((r.k, r.v, r.label) for r in plain)
    b = sorted((r.k, r.v, r.label) for r in salted)
    assert a == b


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from littletable_spark.operators.bucketing import (
        bucketed_join,
        read_bucketed,
        write_bucketed,
    )

    c = Table.parquet_import(spark, "/root/testdata/sf0.001/customer.parquet")
    o = Table.parquet_import(spark, "/root/testdata/sf0.001/orders.parquet")
    o2 = Table.from_df(o.df.withColumnRenamed("o_custkey", "c_custkey"))
    write_bucketed(c, "bt_cust", "c_custkey", n_buckets=4)
    write_bucketed(o2, "bt_ord", "c_custkey", n_buckets=4)
    j = bucketed_join(spark, "bt_cust", "bt_ord", "c_custkey", force_merge=True)
    plan = _plan(j.df)
    # co-located bucketed join: sort-merge with no Exchange (shuffle)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert len(j) == 1500
    assert len(read_bucketed(spark, "bt_cust")) == 150


def test_search_raw_mode(spark):
    t = Table("s", spark=spark)
    t.insert_many(
        [
            {"id": 0, "txt": "tables and chairs"},
            {"id": 1, "txt": "table lamp"},
        ]
    )
    t.create_search_index("txt", normalize=False)
    # raw mode: no plural folding -> 'table' only matches doc 1
    res = t.search.txt("table", as_table=False)
    assert [ns.id for ns, _ in res] == [1]
    # stopwords not removed in raw mode
    res2 = t.search.txt("and", as_table=False)
    assert [ns.id for ns, _ in res2] == [0]


def test_groupby_summaries_typed_callable(abc):
    g = abc.groupby_with_summaries(
        "a",
        spread=(lambda rows: max(r.b for r in rows) - min(r.b for r in rows), "long"),
    )
    vals = {r.a: r.spread for r in g}
    assert vals == {0: 2, 1: 2, 2: 2}


def test_where_comparator_on_missing_attr(abc):
    # comparator against a missing attribute evaluates over None -> False
    assert len(abc.where(zzz=Table.gt(1))) == 0
    assert len(abc.where(zzz=Table.is_null())) == 27


def test_exact_medians_iterative_narrowing_bounded_band(spark):
    """Distributed k-th selection: with a tiny band cap the bracket must
    iterate (count-only passes) and still reconstruct the exact
    interpolated median — the driver never collects more than the cap."""
    import statistics

    from pyspark.sql import functions as F

    from littletable_spark.operators.stats import _exact_medians

    df = spark.range(0, 20001).select(
        (F.col("id") * 7 % 20001).cast("double").alias("x"),
        (F.col("id") % 13).cast("double").alias("dup"),
    )
    cols = {"x": F.col("x"), "dup": F.col("dup")}
    counts = {"x": 20001, "dup": 20001}
    got = _exact_medians(df, cols, counts, band_limit=40, max_iters=6)
    xs = [float((i * 7) % 20001) for i in range(20001)]
    dups = [float(i % 13) for i in range(20001)]
    assert got["x"] == statistics.median(xs)
    assert got["dup"] == statistics.median(dups)
