"""Streaming windows (true readStream path) and import/export round-trips."""

import gzip
import json
import os
import zipfile

import pytest

from littletable_spark import Table, csv_import, json_import, tsv_import


def test_streaming_tumbling_matches_batch(spark):
    from pyspark.sql import functions as F

    from littletable_spark.streaming import load_events, tumbling_window
    from littletable_spark.streaming.events import streaming_tumbling_demo

    path = "/root/testdata/sf0.001/events.parquet"
    batch = tumbling_window(
        load_events(spark, path), 3600, keys=["event_type"], n=F.count(F.lit(1))
    )
    batch_counts = {(r.window_start, r.event_type): r.n for r in batch}
    streamed = streaming_tumbling_demo(spark, path, 3600, keys=("event_type",))
    srows = streamed.collect()
    assert len(srows) == len(batch_counts)
    import calendar

    for r in srows:
        # collected timestamps are naive in the session TZ (UTC)
        key = (calendar.timegm(r["window"].start.timetuple()), r["event_type"])
        assert batch_counts[key] == r["n_events"]


def test_sessionize_gap_splits(spark):
    from littletable_spark.streaming import sessionize

    t = Table("ev", spark=spark)
    t.insert_many(
        [
            {"user_id": 1, "ts_sec": 0},
            {"user_id": 1, "ts_sec": 100},
            {"user_id": 1, "ts_sec": 5000},  # new session (gap > 1800)
            {"user_id": 2, "ts_sec": 50},
        ]
    )
    out = sessionize(t, 1800, "user_id")
    sessions = {(r.user_id, r.session_start): (r.session_end, r.n_events) for r in out}
    assert sessions == {(1, 0): (100, 2), (1, 5000): (5000, 1), (2, 50): (50, 1)}


ABC_CSV = "a,b,c\n0,0,0\n0,0,1\n1,2,2\n"


def test_csv_import_from_string(spark):
    t = csv_import(ABC_CSV, transforms={"*": int}, spark=spark)
    assert len(t) == 3
    assert t[2].a == 1 and t[2].c == 2


def test_csv_import_transforms_error_default(spark):
    t = csv_import(
        "a,b\n1,x\n2,3\n",
        transforms={"a": int, "b": (int, -1)},
        spark=spark,
    )
    rows = list(t)
    assert rows[0].b == -1 and rows[1].b == 3


def test_csv_import_filters_and_limit(spark):
    t = csv_import(
        ABC_CSV, transforms={"*": int}, filters={"a": Table.eq(0)}, spark=spark
    )
    assert len(t) == 2
    t2 = csv_import(ABC_CSV, transforms={"*": int}, limit=1, spark=spark)
    assert len(t2) == 1


def test_csv_roundtrip(spark, tmp_path):
    t = csv_import(ABC_CSV, transforms={"*": int}, spark=spark)
    out = t.csv_export()
    assert out == ABC_CSV
    p = tmp_path / "x.csv"
    t.csv_export(str(p))
    t2 = csv_import(str(p), transforms={"*": int}, spark=spark)
    assert [vars(r) for r in t2] == [vars(r) for r in t]


def test_csv_import_gz_and_zip(spark, tmp_path):
    gz = tmp_path / "abc.csv.gz"
    gz.write_bytes(gzip.compress(ABC_CSV.encode()))
    t = csv_import(str(gz), transforms={"*": int}, spark=spark)
    assert len(t) == 3
    zp = tmp_path / "abc.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("abc.csv", ABC_CSV)
    t2 = csv_import(str(zp), transforms={"*": int}, spark=spark)
    assert len(t2) == 3


def test_tsv_import(spark):
    t = tsv_import("a\tb\n1\t2\n", transforms={"*": int}, spark=spark)
    assert t[0].a == 1 and t[0].b == 2


def test_json_import_jsonl_and_nested(spark):
    data = (
        '{"title": "ep1", "cast": {"kirk": "shatner"}}\n'
        '{"title": "ep2", "cast": {"spock": "nimoy"}}\n'
    )
    t = json_import(data, spark=spark)
    assert len(t) == 2
    rows = sorted(t, key=lambda r: r.title)
    assert rows[0].cast["kirk"] == "shatner"


def test_json_export_roundtrip(spark):
    t = Table("j", spark=spark)
    t.insert_many([{"x": 1, "y": "a"}, {"x": 2, "y": "b"}])
    text = t.json_export()
    assert json.loads(text) == [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]
    jsonl = t.json_export(streaming=True)
    assert [json.loads(line) for line in jsonl.splitlines()] == json.loads(text)


def test_fixed_width_import(spark):
    from littletable_spark.sources.fixed_width import FixedWidthReader

    data = "0 1 2 \n1 2 0 \n"
    t = FixedWidthReader([("a", 0, 2, int), ("b", 2, 4, int), ("c", 4, 6, int)], data, spark).table()
    rows = sorted(t, key=lambda r: r.a)
    assert vars(rows[0]) == {"a": 0, "b": 1, "c": 2}
    assert vars(rows[1]) == {"a": 1, "b": 2, "c": 0}


def test_as_markdown_alignment(spark):
    t = Table("m", spark=spark)
    t.insert_many([{"name": "ab", "n": 1, "ok": "y"}, {"name": "cd", "n": 22, "ok": "N"}])
    md = t.as_markdown()
    lines = md.splitlines()
    assert lines[0] == "| name | n | ok |"
    # reference layout: left / numeric-right / bool-ish-center
    assert lines[1] == "|---|---:|:---:|"
    assert lines[2] == "| ab | 1 | y |"


def test_as_html(spark):
    t = Table("h", spark=spark)
    t.insert_many([{"name": "ab", "n": 1}])
    html = t.as_html()
    assert "<table>" in html and "<th" in html
    assert '<td><div align="left">ab</div></td>' in html
    assert '<td><div align="right">1</div></td>' in html


def test_format_iterator(spark):
    t = Table("f", spark=spark)
    t.insert_many([{"a": 1, "b": 2}])
    assert list(t.format("{a}+{b}")) == ["1+2"]


def test_streaming_dedup_matches_batch_distinct(spark):
    """Watermarked dropDuplicates over the stream keeps exactly one row
    per key — same cardinality as a batch distinct on the drained input."""
    from littletable_spark.streaming import load_events
    from littletable_spark.streaming.events import streaming_dedup_demo

    path = "/root/testdata/sf0.001/events.parquet"
    streamed = streaming_dedup_demo(spark, path, keys=("user_id", "event_type"))
    batch = load_events(spark, path).df.select("user_id", "event_type").distinct()
    assert streamed.count() == batch.count()
    # and the emitted rows are themselves unique on the key
    assert (
        streamed.select("user_id", "event_type").distinct().count()
        == streamed.count()
    )


def test_epoch_seconds_tz_independent(spark, tmp_path):
    """epoch_seconds must agree with DuckDB's naive-as-UTC epoch for every
    timestamp encoding, regardless of the Spark session timezone."""
    import datetime

    import duckdb
    from pyspark.sql import functions as F

    from littletable_spark.streaming.events import epoch_seconds

    wall = datetime.datetime(2024, 3, 7, 13, 45, 59)
    expected = int(
        duckdb.sql("SELECT epoch(TIMESTAMP '2024-03-07 13:45:59')").fetchone()[0]
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")  # UTC+8:45
        ntz = spark.createDataFrame(
            [(wall,)], "ts timestamp_ntz"
        )
        got_ntz = ntz.select(epoch_seconds(ntz, "ts").alias("s")).collect()[0]["s"]
        assert got_ntz == expected

        nanos = spark.createDataFrame([(expected * 1_000_000_000,)], "ts long")
        got_ns = nanos.select(epoch_seconds(nanos, "ts").alias("s")).collect()[0]["s"]
        assert got_ns == expected

        ltz = spark.createDataFrame([(expected,)], "sec long").select(
            F.timestamp_seconds("sec").alias("ts")
        )
        got_ltz = ltz.select(epoch_seconds(ltz, "ts").alias("s")).collect()[0]["s"]
        assert got_ltz == expected
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_load_events_timestamp_us(spark, tmp_path):
    """load_events adapts to plain timestamp[us] parquet (current driver
    format) and still produces exact epoch seconds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.array([1700000000_000000, 1700000123_500000], type=pa.timestamp("us"))
    tbl = pa.table({"ts": ts, "user_id": pa.array([1, 2], type=pa.int64())})
    path = str(tmp_path / "ev.parquet")
    pq.write_table(tbl, path)

    from littletable_spark.streaming import load_events

    out = {r["user_id"]: r["ts_sec"] for r in load_events(spark, path).df.collect()}
    assert out == {1: 1700000000, 2: 1700000123}


def test_time_rollup_tiers_consistent(spark):
    """Each tier of the multi-resolution rollup equals the equivalent
    single-resolution tumbling window; coarse tiers aggregate fine ones."""
    from pyspark.sql import functions as F

    from littletable_spark.streaming import load_events, tumbling_window
    from littletable_spark.streaming.events import time_rollup

    e = load_events(spark, "/root/testdata/sf0.001/events.parquet")
    rolled = time_rollup(
        e, resolutions=(3600, 86400), keys=("event_type",),
        n=F.count(F.lit(1)),
    ).df
    hourly = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in tumbling_window(
            e, 3600, keys=["event_type"], n=F.count(F.lit(1))
        ).df.collect()
    }
    got_hourly = {
        (r["bucket_start"], r["event_type"]): r["n"]
        for r in rolled.filter(F.col("resolution") == 3600).collect()
    }
    assert got_hourly == hourly
    daily_total = sum(
        r["n"] for r in rolled.filter(F.col("resolution") == 86400).collect()
    )
    assert daily_total == sum(hourly.values())


def test_epoch_seconds_date_type(spark):
    """DATE columns (a writer re-encoding date-semantic fields as
    parquet DATE is a known cross-round occurrence) derive midnight-UTC
    epoch seconds, timezone-free like the other encodings."""
    import datetime

    from littletable_spark.streaming.events import epoch_seconds

    df = spark.createDataFrame(
        [(1, datetime.date(1970, 1, 2)), (2, datetime.date(1998, 1, 1))],
        "id long, d date",
    )
    got = {r.id: r.e for r in df.select("id", epoch_seconds(df, "d").alias("e")).collect()}
    assert got[1] == 86400
    assert got[2] == 883612800  # 1998-01-01T00:00:00Z
    # TZ-independence: same answer under a shifted session timezone
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        got2 = {r.id: r.e for r in df.select("id", epoch_seconds(df, "d").alias("e")).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got2 == got


def test_renderers_null_and_decimal_cells(spark):
    """Spark NULLs render empty (the reference's missing-attribute
    case), never the string 'None'; DecimalType columns right-align."""
    import decimal

    t = Table("nulls", spark=spark)
    t.insert_many(
        [
            {"name": "ab", "price": decimal.Decimal("1.50")},
            {"name": None, "price": decimal.Decimal("22.25")},
        ]
    )
    md = t.as_markdown()
    assert "None" not in md
    # null cell renders empty (Decimal scale varies with inference)
    assert any(line.startswith("|  | 22.25") for line in md.splitlines())
    assert md.splitlines()[1] == "|---|---:|"  # decimal right-aligned
    html = t.as_html()
    assert "None" not in html
    assert '<td><div align="right">1.50' in html


def test_filter_quality_runs_on_streams(spark):
    """The curation projections are narrow, so they apply unchanged to
    a readStream source: stream filter_quality over documents and match
    the batch result row-for-row (ingest-time filtering at scale)."""
    import shutil
    import tempfile
    import uuid

    from littletable_spark import Table
    from littletable_spark.operators.textops import filter_quality

    src = "/root/testdata/sf0.001/documents.parquet"
    stage = tempfile.mkdtemp(prefix="lts_fq_stream_")
    shutil.copy(src, stage)
    schema = spark.read.parquet(src).schema
    stream_df = spark.readStream.schema(schema).parquet(stage)
    out = filter_quality(Table.from_df(stream_df), "text", "doc_id").df
    assert out.isStreaming
    sink = f"fq_sink_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r.doc_id: (r.keep, tuple(r.failed_rules))
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch = {
        r.doc_id: (r.keep, tuple(r.failed_rules))
        for r in filter_quality(
            Table.parquet_import(spark, src), "text", "doc_id"
        )
    }
    assert streamed == batch


def test_cluster_labeling_runs_on_streams(spark):
    """Train-once-assign-forever: with a frozen centroids= model the
    cluster assignment is a stateless Arrow projection, so it applies
    unchanged to a readStream source — ingest-time semantic labeling.
    Streamed labels must match the batch assignment row-for-row."""
    import shutil
    import tempfile
    import uuid

    import numpy as np

    from littletable_spark import Table
    from littletable_spark.operators.similarity import cluster_embeddings

    src = "/root/testdata/sf0.001/embeddings.parquet"
    rng = np.random.RandomState(11)
    model = rng.randn(4, 64)

    stage = tempfile.mkdtemp(prefix="lts_cl_stream_")
    shutil.copy(src, stage)
    schema = spark.read.parquet(src).schema
    stream_df = spark.readStream.schema(schema).parquet(stage)
    out = cluster_embeddings(
        Table.from_df(stream_df), "vec_id", "embedding", centroids=model
    ).df
    assert out.isStreaming
    sink = f"cl_sink_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r.vec_id: (r.cluster, r.cosine)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch = {
        r.vec_id: (r.cluster, r.cosine)
        for r in cluster_embeddings(
            Table.parquet_import(spark, src), "vec_id", "embedding", centroids=model
        )
    }
    assert streamed == batch and len(batch) > 0


def test_enrich_stream_matches_batch_join(spark):
    """Stream-static enrichment: streamed left join against a broadcast
    dimension equals the batch join row-for-row; dimensionless events
    pass through with NULLs."""
    import shutil
    import tempfile
    import uuid

    from littletable_spark import Table
    from littletable_spark.streaming import enrich_stream, load_events

    dim = Table("profiles", spark=spark)
    dim.insert_many(
        [{"uid": i, "tier": "gold" if i % 2 == 0 else "free"} for i in range(0, 40, 2)]
    )

    src = "/root/testdata/sf0.001/events.parquet"
    stage = tempfile.mkdtemp(prefix="lts_enrich_")
    shutil.copy(src, stage)
    schema = spark.read.parquet(src).schema
    stream = Table.from_df(spark.readStream.schema(schema).parquet(stage))
    out = enrich_stream(stream, dim, {"user_id": "uid"}).df
    assert out.isStreaming
    sink = f"enrich_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r.event_id: r.tier for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    batch = {
        r.event_id: r.tier
        for r in enrich_stream(
            Table.from_df(spark.read.parquet(src)), dim, {"user_id": "uid"}
        )
    }
    assert streamed == batch and len(batch) > 0
    # dimension misses pass through as NULL, never dropped
    assert any(v is None for v in batch.values())
    assert any(v is not None for v in batch.values())


def test_streaming_followup_join_matches_batch(spark):
    """Watermarked stream-stream interval self-join equals the batch
    self-join under the same (key, time-bound) condition."""
    from pyspark.sql import functions as F

    from littletable_spark.streaming import load_events
    from littletable_spark.streaming.events import streaming_followup_join_demo

    path = "/root/testdata/sf0.001/events.parquet"
    streamed = {
        (r.a_event_id, r.b_event_id)
        for r in streaming_followup_join_demo(
            spark, path, key="user_id", within_sec=1800
        ).collect()
    }
    ev = load_events(spark, path).df
    a = ev.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("a_event_id"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("user_id").alias("bk"),
        F.col("event_id").alias("b_event_id"),
        F.col("ts").alias("b_ts"),
    )
    batch = {
        (r.a_event_id, r.b_event_id)
        for r in a.join(
            b,
            (a["k"] == b["bk"])
            & (b["b_ts"] > a["a_ts"])
            & (b["b_ts"] <= a["a_ts"] + F.expr("INTERVAL 1800 SECONDS")),
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
