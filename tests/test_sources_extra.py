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
