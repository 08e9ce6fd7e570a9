"""Stateful streaming, keyed-lookup cache, presentation extras."""

import json

import pytest
from pyspark.sql import functions as F

from littletable_spark import Table


def test_stateful_running_totals_matches_batch(spark):
    from littletable_spark.streaming import load_events, running_totals_stream

    path = "/root/testdata/sf0.001/events.parquet"
    batch = (
        load_events(spark, path)
        .df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    expect = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch}
    streamed = running_totals_stream(spark, path).collect()
    # update mode: keep the last emitted row per key
    final = {}
    for r in streamed:
        final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert final == expect


def test_unique_index_cache_point_lookup(spark):
    t = Table("c", spark=spark)
    t.insert_many([{"k": i, "v": f"row{i}"} for i in range(20)])
    t.create_index("k", unique=True, cache=True)
    assert t.by.k[7].v == "row7"
    with pytest.raises(KeyError):
        t.by.k[999]
    # cache invalidates on mutation
    t.insert({"k": 99, "v": "new"})
    assert t.by.k[99].v == "new"


def test_present_groupby_suppression(spark, capsys):
    t = Table("p", spark=spark)
    t.insert_many(
        [
            {"grp": "a", "v": 1},
            {"grp": "a", "v": 2},
            {"grp": "b", "v": 3},
        ]
    )
    t.present(groupby="grp")
    out = capsys.readouterr().out
    lines = [line for line in out.splitlines() if line.strip()]
    # the second 'a' row is blanked
    assert sum(1 for line in lines if line.lstrip().startswith("a")) == 1


def test_json_export_custom_encoder(spark):
    class Weird:
        def __str__(self):
            return "weird"

    class WeirdEncoder(json.JSONEncoder):
        def default(self, o):
            if isinstance(o, Weird):
                return {"weird": True}
            raise TypeError

    t = Table("j", spark=spark)
    t.insert_many([{"x": 1}])
    # encoder chain applies to non-serializable cells; plain cells unaffected
    text = t.json_export(json_encoder=WeirdEncoder)
    assert json.loads(text) == [{"x": 1}]


def test_formatted_table(spark):
    t = Table("f", spark=spark)
    t.insert_many([{"name": "x", "val": 3.14159}])
    ft = t.formatted_table("name", "val", val="{:.2f}")
    row = ft[0]
    assert row.val == "3.14"


def test_excel_export_gated(spark, tmp_path):
    t = Table("e", spark=spark)
    t.insert_many([{"a": 1}])
    try:
        import openpyxl  # noqa: F401

        t.excel_export(str(tmp_path / "o.xlsx"))
    except ImportError as e:
        assert "openpyxl" in str(e)
