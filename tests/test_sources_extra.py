"""URL import (local HTTP server), JSON path descent, cross join,
pivot HTML — remaining SURVEY §2 edges."""

import http.server
import json
import threading

import pytest

from littletable_spark import Table, csv_import, json_import

ABC_CSV = "a,b,c\n0,0,0\n0,0,1\n1,2,2\n"


@pytest.fixture()
def http_url():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = ABC_CSV.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}/abc.csv"
    srv.shutdown()


def test_csv_import_from_url(spark, http_url):
    t = csv_import(http_url, transforms={"*": int}, spark=spark)
    assert len(t) == 3
    assert t.import_source_type == "url"
    assert t[2].c == 2


def test_json_import_path_descent(spark):
    doc = json.dumps(
        {
            "meta": {"version": 1},
            "payload": {
                "episodes": [
                    {"title": "ep1", "season": 1},
                    {"title": "ep2", "season": 1},
                    {"title": "ep3", "season": 2},
                ]
            },
        }
    )
    # descend payload -> episodes (array explodes to rows)
    t = json_import(doc + "\n", path="payload.episodes", spark=spark)
    assert len(t) == 3
    assert sorted(r.title for r in t) == ["ep1", "ep2", "ep3"]


def test_cross_join(abc, spark):
    small = Table("tags", spark=spark)
    small.insert_many([{"tag": "x"}, {"tag": "y"}])
    x = abc.cross_join(small)
    assert len(x) == 54
    assert set(r.tag for r in x.head(54)) == {"x", "y"}


def test_pivot_as_html(abc):
    html = abc.pivot("a b").as_html()
    assert "<table>" in html and "Total" in html
    # grand total cell
    assert "<td>27</td>" in html


@pytest.fixture()
def auth_http_url():
    """Server that requires basic auth; records the received header."""
    seen = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            auth = self.headers.get("Authorization", "")
            seen["auth"] = auth
            if not auth.startswith("Basic "):
                self.send_response(401)
                self.end_headers()
                return
            body = ABC_CSV.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}/abc.csv", seen
    srv.shutdown()


def test_csv_import_url_basic_auth_passthrough(spark, auth_http_url):
    """username/password reach the HTTP request (littletable.py:804-833)."""
    import base64

    url, seen = auth_http_url
    t = csv_import(
        url, transforms={"*": int}, spark=spark,
        username="alice", password="s3cret",
    )
    assert len(t) == 3
    expected = base64.b64encode(b"alice:s3cret").decode()
    assert seen["auth"] == f"Basic {expected}"


def test_info_includes_lifecycle_timestamps(spark):
    import datetime

    t = Table("t", spark=spark)
    info0 = t.info()
    assert isinstance(info0["created"], datetime.datetime)
    assert info0["modified"] == info0["created"]
    assert info0["last_import"] is None
    t.insert({"a": 1})
    info1 = t.info()
    assert info1["modified"] >= info0["created"]
    t2 = csv_import(ABC_CSV, spark=spark)
    assert isinstance(t2.info()["last_import"], datetime.datetime)


def test_by_accessor_mapping_surface(spark):
    t = Table("t", spark=spark)
    t.insert_many([{"k": "b", "v": 1}, {"k": "a", "v": 2}, {"k": "b", "v": 3}])
    t.create_index("k")
    acc = t.by.k
    # first-occurrence iteration order, like reference dict insertion
    assert list(acc) == ["b", "a"]
    assert len(acc) == 2
    items = dict((k, len(sub)) for k, sub in acc.items())
    assert items == {"b": 2, "a": 1}
    assert [len(v) for v in acc.values()] == [2, 1]


def test_pivot_dump_three_level(spark):
    t = Table("t", spark=spark)
    t.insert_many(
        [
            {"a": 1, "b": "x", "c": "p", "v": 10},
            {"a": 1, "b": "x", "c": "q", "v": 11},
            {"a": 2, "b": "y", "c": "p", "v": 12},
        ]
    )
    pt = t.pivot("a b c")
    text = pt.dump(out=type("S", (), {"write": lambda self, s: None})())
    lines = text.splitlines()
    assert lines[0] == "Pivot: a,b,c"
    assert "  a:1" in lines
    assert "    a:1/b:x" in lines
    assert "      a:1/b:x/c:p" in lines
    assert "      a:1/b:x/c:q" in lines
    assert "  a:2" in lines
    # leaf rows rendered one level deeper than their subtable header
    assert any(line.startswith("        namespace(") for line in lines)
    # dump_counts still refuses 3-level, like the reference
    with pytest.raises(ValueError):
        pt.dump_counts(stream=type("S", (), {"write": lambda self, s: None})())


def test_load_events_conf_restored(spark):
    from littletable_spark.streaming import load_events
    from littletable_spark.streaming.events import TS_NANOS_CONF

    e = load_events(spark, "/root/testdata/sf0.001/events.parquet")
    assert e.df.count() > 0
    assert spark.conf.get(TS_NANOS_CONF, None) in (None, "false")


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC round-trips with full fidelity and, like parquet, pushes
    filters into the scan."""
    import io
    import contextlib

    from littletable_spark import Table

    src = Table.parquet_import(spark, "/root/testdata/sf0.001/orders.parquet")
    p = str(tmp_path / "orders_orc")
    src.orc_export(p)
    back = Table.orc_import(spark, p)
    assert len(back) == len(src)
    assert sorted(back.fields) == sorted(src.fields)
    big = back.where(o_totalprice=Table.gt(100_000.0))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        big.explain()
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_totalprice" in plan
    # partitioned variant prunes partitions
    src.orc_export(str(tmp_path / "orc_part"), partition_by="o_orderstatus")
    part = Table.orc_import(spark, str(tmp_path / "orc_part"))
    sub = part.where(o_orderstatus="F")
    assert len(sub) == len(src.where(o_orderstatus="F"))
    # persist/unpersist passthrough chains
    assert src.persist().unpersist() is src


def test_xml_roundtrip_and_options(spark, tmp_path):
    """XML source/sink (native Spark 4 data source): export → import
    round-trips values, row_tag selects the record element, and reader
    options (attributePrefix) pass through."""
    from littletable_spark import Table

    src = Table.parquet_import(
        spark, "/root/testdata/sf0.001/nation.parquet"
    ).select("n_nationkey, n_name, n_regionkey")
    p = str(tmp_path / "nation_xml")
    src.xml_export(p, row_tag="nation", root_tag="nations")
    back = Table.xml_import(spark, p, row_tag="nation")
    assert len(back) == len(src)
    assert sorted(back.fields) == sorted(src.fields)
    assert sorted(r.n_name for r in back) == sorted(r.n_name for r in src)

    # hand-written file with attributes: attributePrefix option reaches
    # the reader, and row_tag picks the repeating element
    f = tmp_path / "attr.xml"
    f.write_text(
        "<catalog><item sku='a1'><qty>3</qty></item>"
        "<item sku='b2'><qty>5</qty></item></catalog>"
    )
    t = Table.xml_import(
        spark, str(f), row_tag="item", attributePrefix="at_"
    )
    rows = sorted((r.at_sku, r.qty) for r in t)
    assert rows == [("a1", 3), ("b2", 5)]


def test_binary_import_glob_and_max_bytes(spark, tmp_path):
    """binaryFile source: glob pruning in the listing, content bytes
    intact, and the max_bytes guard pushed into the scan as a length
    filter (oversized blobs never materialize)."""
    import io
    import contextlib

    from littletable_spark import binary_import

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG\r\n\x1a\nrest")
    (d / "b.png").write_bytes(b"\x89PNG" + b"x" * 100)
    (d / "c.txt").write_bytes(b"not a png")
    t = binary_import(spark, str(d), pattern="*.png")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in t}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"].startswith(b"\x89PNG")
    capped = binary_import(spark, str(d), pattern="*.png", max_bytes=50)
    assert [r.path.rsplit("/", 1)[-1] for r in capped] == ["a.png"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        capped.explain()
    plan = buf.getvalue()
    assert "length" in plan  # pushed file-metadata filter


def test_binary_import_recursive_feeds_multimodal(spark, tmp_path):
    """recursive listing + the standard pipeline handoff: binary rows
    flow into sniff_media without any driver-side file walk."""
    from littletable_spark import binary_import
    from littletable_spark.operators.multimodal import sniff_media

    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    (tmp_path / "tree" / "top.bin").write_bytes(b"\x89PNG\r\n\x1a\n....")
    (d / "deep.bin").write_bytes(b"RIFF1234WAVEfmt ")
    t = binary_import(spark, str(tmp_path / "tree"), recursive=True)
    assert len(t) == 2
    sniffed = sniff_media(t, "content")
    kinds = {r["media_meta"]["format"] for r in sniffed.df.collect()}
    assert kinds == {"png", "wav"}


def test_text_import_lines_whole_file_and_sep(spark, tmp_path):
    from littletable_spark import text_import

    d = tmp_path / "txt"
    d.mkdir()
    (d / "x.txt").write_text("line one\nline two\n")
    (d / "y.txt").write_text("only line")
    lines = text_import(spark, str(d))
    assert sorted(r.text for r in lines) == ["line one", "line two", "only line"]
    assert all(r.path.startswith("file:") for r in lines)
    whole = text_import(spark, str(d), whole_file=True)
    got = {r.path.rsplit("/", 1)[-1]: r.text for r in whole}
    assert got["x.txt"] == "line one\nline two\n"
    (d / "z.rec").write_text("r1\x00r2\x00r3")
    recs = text_import(spark, str(d), pattern="*.rec", line_sep="\x00")
    assert sorted(r.text for r in recs) == ["r1", "r2", "r3"]


def test_binary_and_text_stream_import(spark, tmp_path):
    """stream=True: the same directories tail as Structured Streaming
    file sources; narrow curation ops (sniff_media) apply unchanged and
    drain through a memory sink with availableNow."""
    from littletable_spark import binary_import, text_import
    from littletable_spark.operators.multimodal import sniff_media

    d = tmp_path / "stream_blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG\r\n\x1a\npayload")
    (d / "b.bin").write_bytes(b"RIFF0000WAVEfmt ")
    bt = binary_import(spark, str(d), stream=True)
    assert bt.df.isStreaming
    sniffed = sniff_media(bt, "content")
    q = (
        sniffed.df.selectExpr("path", "media_meta.format AS fmt", "length")
        .writeStream.format("memory")
        .queryName("blob_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["path"].rsplit("/", 1)[-1]: r["fmt"]
            for r in spark.sql("select * from blob_stream_t").collect()}
    assert rows == {"a.png": "png", "b.bin": "wav"}

    td = tmp_path / "stream_txt"
    td.mkdir()
    (td / "x.txt").write_text("alpha\nbeta\n")
    tt = text_import(spark, str(td), stream=True)
    assert tt.df.isStreaming
    q2 = (
        tt.df.writeStream.format("memory")
        .queryName("text_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    got = sorted(r["text"] for r in spark.sql("select * from text_stream_t").collect())
    assert got == ["alpha", "beta"]
