"""Crawl ingestion: WARC source + HTML text extraction, end-to-end
into the text pipeline. Fixtures are WRITTEN here (WARC records with
proper CRLF framing, per-member gzip) — the repo's
encode-your-own-fixtures pattern."""

import gzip

import pytest

from littletable_spark import Table
from littletable_spark.functions.htmlcodec import (
    extract_html_text,
    looks_like_html,
)
from littletable_spark.sources.warc_io import parse_warc, warc_import


# ------------------------------------------------------------------ #
# test-side WARC writer


def _warc_record(
    warc_type: str,
    url: str,
    body: bytes,
    http: bool = True,
    content_type: bytes = b"text/html",
) -> bytes:
    if http:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type
            + b"\r\nServer: test\r\n\r\n" + body
        )
    else:
        payload = body
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type.encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
    )
    return head + b"\r\n" + payload + b"\r\n\r\n"


_PAGE = b"""<!DOCTYPE html>
<html><head><title>A Test  Page</title>
<meta charset="utf-8">
<script>var x = "SCRIPT NOISE";</script>
<style>.c { color: red }</style>
</head><body>
<nav><a href="/">Home</a> | <a href="/a">About</a> | <a href="/c">Contact</a></nav>
<h1>Heading One</h1>
<p>This is the first paragraph of real content, long enough to keep
and it even mentions caf\xc3\xa9s &amp; r\xc3\xa9sum\xc3\xa9s.</p>
<div>Second block of content here, also plenty long to survive the
minimum block length filter in main-content mode.</div>
<pre>  keep   spacing  </pre>
<footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer>
</body></html>"""


# ------------------------------------------------------------------ #
# html codec


def test_looks_like_html():
    assert looks_like_html(_PAGE)
    assert looks_like_html(b"  <html lang='en'>...")
    assert not looks_like_html(b"%PDF-1.4 ...")
    assert not looks_like_html(b"just some text with <brackets>")


def test_extract_html_text_full():
    got = extract_html_text(_PAGE)
    assert got["title"] == "A Test Page"
    assert "SCRIPT NOISE" not in got["text"]
    assert "color: red" not in got["text"]
    lines = got["text"].split("\n")
    assert "Heading One" in lines
    assert any(line.startswith("This is the first paragraph") for line in lines)
    assert "cafés & résumés" in got["text"]  # entities + utf-8 decode
    assert "  keep   spacing  " in got["text"]  # <pre> preserved
    assert "Home | About | Contact" in got["text"]  # kept without main_content


def test_extract_html_main_content_drops_boilerplate():
    got = extract_html_text(_PAGE, main_content=True)
    assert "Home" not in got["text"]  # link-dense nav dropped
    assert "Privacy" not in got["text"]  # footer dropped
    assert "first paragraph of real content" in got["text"]
    assert "Second block of content" in got["text"]


def test_charset_declaration_latin1():
    page = (
        b"<html><head><meta charset=\"iso-8859-1\"></head>"
        b"<body><p>caf\xe9 cr\xe8me</p></body></html>"
    )
    assert extract_html_text(page)["text"] == "caf\xe9 cr\xe8me"


# ------------------------------------------------------------------ #
# warc parsing


def test_parse_warc_plain_and_gzip():
    raw = (
        _warc_record("warcinfo", "", b"software: test\r\n", http=False)
        + _warc_record("request", "http://x.test/", b"GET / HTTP/1.1", http=False)
        + _warc_record("response", "http://x.test/", _PAGE)
        + _warc_record(
            "response", "http://x.test/plain.txt", b"plain body",
            content_type=b"text/plain",
        )
    )
    for blob in (raw, b"".join(
        gzip.compress(r) for r in (
            _warc_record("warcinfo", "", b"software: test\r\n", http=False),
            _warc_record("response", "http://x.test/", _PAGE),
        )
    )):
        recs = parse_warc(blob)
        responses = [r for r in recs if r["warc_type"] == "response"]
        assert responses, "no response records parsed"
        r = responses[0]
        assert r["url"] == "http://x.test/"
        assert r["http_status"] == 200
        assert r["content_type"].startswith("text/html")
        assert r["payload"] == _PAGE  # HTTP envelope stripped
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # corrupt gzip surfaces as ValueError (the on_error contract), not
    # a bare zlib.error that would escape warc_import's null policy
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b" + b"\x00" * 30)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(gzip.compress(b"WARC/1.0\r\n\r\n")[:-5])


def test_warc_import_to_text_pipeline(spark, tmp_path):
    """The whole crawl story in-engine: WARC files on disk ->
    warc_import -> extract_text (HTML main content) -> token_stats."""
    from littletable_spark.operators.multimodal import extract_text
    from littletable_spark.operators.textops import token_stats

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(
        _warc_record("warcinfo", "", b"x", http=False)
        + _warc_record("response", "http://a.test/1", _PAGE)
        + _warc_record(
            "response", "http://a.test/2", b"short plain doc",
            content_type=b"text/plain",
        )
    )
    (d / "b.warc.gz").write_bytes(
        gzip.compress(_warc_record("response", "http://b.test/1", _PAGE))
    )
    (d / "junk.warc").write_bytes(b"this is not a warc at all")

    recs = warc_import(spark, str(d), pattern="*.warc*", on_error="null")
    rows = sorted((r.url, r.http_status) for r in recs)
    assert rows == [
        ("http://a.test/1", 200),
        ("http://a.test/2", 200),
        ("http://b.test/1", 200),
    ]

    docs = Table.from_df(
        recs.df.selectExpr(
            "concat(url, '#', cast(record_ord as string)) AS doc_id",
            "payload",
        ),
        name="docs",
    )
    texts = extract_text(
        docs, "payload", "doc_id", html_main_content=True, on_error="null"
    )
    got = {r.doc_id: r for r in texts}
    assert got["http://a.test/1#1"].doc_format == "html"
    assert got["http://a.test/1#1"].title == "A Test Page"
    assert "first paragraph" in got["http://a.test/1#1"].text
    assert got["http://a.test/2#2"].doc_format == "text"
    assert got["http://a.test/2#2"].text == "short plain doc"

    stats = token_stats(
        Table.from_df(texts.df.where("text IS NOT NULL"), name="t"),
        "text",
        "doc_id",
    )
    by_id = {r.doc_id: r.n_tokens for r in stats}
    assert by_id["http://a.test/2#2"] == 3
    assert by_id["http://a.test/1#1"] > 20


def test_warc_explode_yields_bounded_chunks():
    """The Arrow-pass generator flushes every records_per_batch
    records, so peak task memory is the raw blob plus ONE chunk —
    matching iter_warc's incremental contract (not one DataFrame with
    the whole inflated archive)."""
    from littletable_spark.sources.warc_io import _explode_files

    blob = b"".join(
        _warc_record("response", f"http://m.test/{i}", b"body %d" % i)
        for i in range(600)
    )
    frames = list(_explode_files(iter([("f", blob)]), ("response",), "raise", 256))
    assert [len(f) for f in frames] == [256, 256, 88]
    assert frames[0]["record_ord"].tolist() == list(range(256))
    assert frames[2]["url"].iloc[-1] == "http://m.test/599"
    # multiple small files pack into shared chunks (flush is by count,
    # not per file)
    half = b"".join(
        _warc_record("response", f"http://h.test/{i}", b"y") for i in range(300)
    )
    two = list(
        _explode_files(iter([("a", half), ("b", blob)]), ("response",), "raise", 500)
    )
    assert sum(len(f) for f in two) == 900 and all(len(f) <= 500 for f in two)
    assert len(two) == 2  # flush is by count, not per file


def test_warc_explode_chunking_preserves_salvage():
    """Corruption mid-archive after a flush boundary: already-flushed
    chunks AND the good records accumulated since remain."""
    from littletable_spark.sources.warc_io import _explode_files

    good = b"".join(
        _warc_record("response", f"http://s.test/{i}", b"x") for i in range(300)
    )
    frames = list(
        _explode_files(
            iter([("f", good + b"CORRUPT TAIL")]), ("response",), "null", 256
        )
    )
    assert [len(f) for f in frames] == [256, 44]


def test_wet_conversion_records(spark, tmp_path):
    """Common Crawl WET files are WARC archives of WARC-Type:
    conversion records (pre-extracted text, no HTTP envelope) —
    record_types=('conversion',) ingests them directly into the text
    pipeline."""
    d = tmp_path / "wet"
    d.mkdir()
    recs = _warc_record(
        "warcinfo", "", b"software: wet-writer", http=False
    ) + b"".join(
        _warc_record(
            "conversion",
            f"http://w.test/{i}",
            ("extracted text of document %d with several words" % i).encode(),
            http=False,
            content_type=b"text/plain",
        )
        for i in range(5)
    )
    (d / "c.warc.wet.gz").write_bytes(gzip.compress(recs))
    t = warc_import(
        spark, str(d), pattern="*.wet.gz", record_types=("conversion",)
    )
    rows = sorted((r.url, r.payload.decode()) for r in t)
    assert len(rows) == 5
    assert rows[0] == (
        "http://w.test/0",
        "extracted text of document 0 with several words",
    )
    # straight into token stats: WET payload IS the document text
    from littletable_spark.operators.textops import token_stats

    docs = Table.from_df(
        t.df.selectExpr("url AS doc_id", "decode(payload, 'utf-8') AS text"),
        name="wet_docs",
    )
    stats = {r.doc_id: r.n_tokens for r in token_stats(docs, "text", "doc_id")}
    assert stats["http://w.test/3"] == 8


def test_warc_import_small_batch_end_to_end(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    (d / "m.warc").write_bytes(
        b"".join(
            _warc_record("response", f"http://e.test/{i}", b"doc") for i in range(17)
        )
    )
    recs = warc_import(spark, str(d), records_per_batch=5)
    assert sorted(r.record_ord for r in recs) == list(range(17))
    with pytest.raises(ValueError, match="records_per_batch"):
        warc_import(spark, str(d), records_per_batch=0)


# ------------------------------------------------------------------ #
# url curation features


def test_url_features(spark):
    from littletable_spark.operators.urlops import url_features

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "https://www.example.co.uk/a/b/c?x=1&y=2#frag"},
            {"id": 1, "url": "http://10.1.2.3:8080/only"},
            {"id": 2, "url": "https://user:pw@Sub.Host.ORG/"},
            {"id": 3, "url": "not a url"},
            {"id": 4, "url": None},
        ]
    )
    got = {r.id: r for r in url_features(t, "url")}
    r0 = got[0]
    assert r0.host == "www.example.co.uk"
    # co.uk is a public suffix: registrable domain is the THIRD label
    assert r0.domain == "example.co.uk"
    assert r0.tld == "uk"
    assert r0.path_depth == 3 and r0.n_params == 2 and not r0.is_ip
    r1 = got[1]
    assert r1.host == "10.1.2.3" and r1.is_ip and r1.domain == "10.1.2.3"
    assert r1.tld == "" and r1.path_depth == 1 and r1.n_params == 0
    r2 = got[2]
    assert r2.host == "sub.host.org" and r2.domain == "host.org"
    assert got[3].host == "" and got[4].host == ""  # junk never fails


def test_url_features_public_suffixes(spark):
    """Registrable domain on ccTLD second-level registries: default
    snapshot, psl= iterable override, and psl= Table broadcast join
    all agree; a bare-suffix host degrades to the suffix itself."""
    from littletable_spark.operators.urlops import url_features

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "https://www.bbc.co.uk/news"},
            {"id": 1, "url": "https://shop.example.com.au/x"},
            {"id": 2, "url": "https://plain.com/x"},
            {"id": 3, "url": "https://co.uk/"},           # bare suffix host
            {"id": 4, "url": "https://a.b.custom.zz/x"},  # only via psl=
        ]
    )
    got = {r.id: r.domain for r in url_features(t, "url")}
    assert got[0] == "bbc.co.uk"
    assert got[1] == "example.com.au"
    assert got[2] == "plain.com"           # ordinary TLD: last two labels
    assert got[3] == "co.uk"               # no third label to take
    assert got[4] == "custom.zz"           # zz not in the snapshot

    # iterable override REPLACES the snapshot
    got_it = {r.id: r.domain for r in url_features(t, "url", psl=["custom.zz"])}
    assert got_it[4] == "b.custom.zz"
    assert got_it[0] == "co.uk"  # co.uk absent from the override list

    # Table form: broadcast left join, case-normalized
    p = Table("psl", spark=spark)
    p.insert_many([{"suffix": "CO.UK"}, {"suffix": "custom.zz"}])
    got_tb = {r.id: r.domain for r in url_features(t, "url", psl=p)}
    assert got_tb[0] == "bbc.co.uk" and got_tb[4] == "b.custom.zz"
    assert got_tb[1] == "com.au"  # com.au not in this psl table: 2 labels


def test_filter_url_blocklist_per_site_on_cctld(spark):
    """A blocklist entry names ONE British site, not all of co.uk —
    and mixed-case Table rows still match (lowercased before the
    anti-join, like the iterable path)."""
    from littletable_spark.operators.urlops import filter_url_blocklist

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "https://bad.co.uk/x"},
            {"id": 1, "url": "https://good.co.uk/y"},
        ]
    )
    kept = filter_url_blocklist(t, ["bad.co.uk"], "url")
    assert sorted(r.id for r in kept) == [1]
    bl = Table("bl", spark=spark)
    bl.insert_many([{"domain": "Bad.CO.uk"}])
    kept2 = filter_url_blocklist(t, bl, "url")
    assert sorted(r.id for r in kept2) == [1]


def test_filter_url_blocklist(spark):
    from littletable_spark.operators.urlops import filter_url_blocklist

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "https://good.site.com/x"},
            {"id": 1, "url": "https://spam.bad.com/y"},
            {"id": 2, "url": "https://sub.bad.com/z"},
        ]
    )
    # literal list: matches registrable domain, not host
    kept = filter_url_blocklist(t, ["bad.com"], "url")
    assert sorted(r.id for r in kept) == [0]
    assert "domain" not in kept.fields  # derived columns dropped again
    # Table blocklist: broadcast anti-join
    bl = Table("bl", spark=spark)
    bl.insert_many([{"domain": "site.com"}])
    kept2 = filter_url_blocklist(t, bl, "url")
    assert sorted(r.id for r in kept2) == [1, 2]


def test_warc_salvage_keeps_records_before_corruption(spark, tmp_path):
    """on_error='null' salvages the records parsed before a corrupt
    byte (iter_warc parses incrementally — peak memory is one record,
    and partial archives still contribute their good prefix)."""
    d = tmp_path / "c"
    d.mkdir()
    good = _warc_record("response", "http://ok.test/1", b"<html><p>fine</p></html>")
    (d / "partial.warc").write_bytes(good + b"GARBAGE NOT A RECORD")
    recs = warc_import(spark, str(d), on_error="null")
    assert [(r.url, r.record_ord) for r in recs] == [("http://ok.test/1", 0)]
    with pytest.raises(Exception):
        warc_import(spark, str(d), on_error="raise").df.collect()


def test_canonicalize_urls(spark):
    """Frontier-key canonicalization: case, default ports, userinfo,
    fragments, tracking params, param order, and empty paths all
    collapse; junk canonicalizes to NULL without failing."""
    from littletable_spark.operators.urlops import canonicalize_urls

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "HTTP://Example.COM:80/a/b?z=2&a=1#frag"},
            {"id": 1, "url": "http://example.com/a/b?a=1&z=2"},
            {"id": 2, "url": "https://u:pw@Site.org:443"},
            {"id": 3, "url": "https://site.org:8443/x?utm_source=tw&q=hi&utm_medium=&gclid=abc"},
            {"id": 4, "url": "http://a.com/p?&&"},
            {"id": 5, "url": "not a url"},
            {"id": 6, "url": None},
            {"id": 7, "url": "http://a.com/p?ref=x&REF=y"},  # case-sensitive names
        ]
    )
    got = {r.id: r.canon_url for r in canonicalize_urls(t, "url")}
    assert got[0] == "http://example.com/a/b?a=1&z=2"
    assert got[1] == got[0]  # param order + default port + case collapse
    assert got[2] == "https://site.org/"
    assert got[3] == "https://site.org:8443/x?q=hi"
    assert got[4] == "http://a.com/p"  # empty params, ? dropped
    assert got[5] is None and got[6] is None
    assert got[7] == "http://a.com/p?REF=y"  # REF= kept (names case-sensitive)
    kept_all = {
        r.id: r.canon_url
        for r in canonicalize_urls(t, "url", drop_tracking_params=False)
    }
    assert kept_all[3] == (
        "https://site.org:8443/x?gclid=abc&q=hi&utm_medium=&utm_source=tw"
    )
    with pytest.raises(ValueError, match="overwrite existing"):
        canonicalize_urls(Table.from_df(
            canonicalize_urls(t, "url").df, name="x"
        ), "url")


def test_url_features_column_conflict_guard(spark):
    from littletable_spark.operators.urlops import url_features

    t = Table("recs", spark=spark)
    t.insert_many([{"id": 0, "url": "https://a.com/", "domain": "preexisting"}])
    with pytest.raises(ValueError, match="overwrite existing"):
        url_features(t, "url")


def test_dedup_urls_frontier(spark):
    """One row per canonical URL; junk rows all survive (no key);
    order_col picks the canonical representative deterministically."""
    from littletable_spark.operators.urlops import dedup_urls

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "HTTP://A.com:80/x?b=2&a=1", "rank": 5},
            {"id": 1, "url": "http://a.com/x?a=1&b=2&utm_source=z", "rank": 3},
            {"id": 2, "url": "http://a.com/other", "rank": 1},
            {"id": 3, "url": "junk", "rank": 9},
            {"id": 4, "url": "junk", "rank": 9},
        ]
    )
    out = dedup_urls(t, "url", order_col="rank")
    kept = sorted(r.id for r in out)
    assert kept == [1, 2, 3, 4]  # 0/1 collapse (rank 3 wins); junk kept
    assert set(out.fields) == {"id", "url", "rank"}


def test_url_features_differential_vs_urllib(spark):
    """Hypothesis differential: host/path/params extraction agrees
    with urllib.parse over generated http(s) URLs (the regexes must
    match the stdlib's reading of the same grammar)."""
    from urllib.parse import urlparse

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from littletable_spark.operators.urlops import url_features

    label = st.text("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=8).filter(
        lambda s: not s.startswith("-") and not s.endswith("-")
    )

    @settings(max_examples=25, deadline=None)
    @given(
        data=st.data(),
        scheme=st.sampled_from(["http", "https", "HTTP"]),
        n_labels=st.integers(1, 4),
        userinfo=st.booleans(),
        port=st.one_of(st.none(), st.integers(1, 65535)),
        n_path=st.integers(0, 4),
        n_params=st.integers(0, 3),
        frag=st.booleans(),
    )
    def check(data, scheme, n_labels, userinfo, port, n_path, n_params, frag):
        host = ".".join(data.draw(label) for _ in range(n_labels))
        url = scheme + "://"
        if userinfo:
            url += "user:pw@"
        url += host
        if port is not None:
            url += f":{port}"
        segs = [data.draw(label) for _ in range(n_path)]
        url += "".join("/" + s for s in segs)
        if n_params:
            url += "?" + "&".join(
                f"{data.draw(label)}={data.draw(label)}" for _ in range(n_params)
            )
        if frag:
            url += "#sec"
        t = Table("u", spark=spark)
        t.insert_many([{"id": 0, "url": url}])
        r = list(url_features(t, "url"))[0]
        p = urlparse(url)
        assert r.host == (p.hostname or "")
        assert r.path_depth == len([s for s in p.path.split("/") if s])
        want_params = len([q for q in p.query.split("&") if q]) if p.query else 0
        assert r.n_params == want_params
        assert r.tld == (p.hostname or "").rsplit(".", 1)[-1] if "." in (p.hostname or "") else True

    check()


def test_extract_links_resolution(spark):
    """<a href> discovery + RFC 3986 resolution: absolute kept,
    scheme-relative / root-relative / relative resolved, fragments
    stripped, non-http schemes dropped, dot segments normalized,
    multiplicity preserved."""
    from littletable_spark.operators.urlops import extract_links

    html = (
        '<p><a href="https://other.com/abs">x</a>'
        "<a href='//cdn.com/sr'>y</a>"
        '<a href="/root/page?q=1#frag">z</a>'
        '<a href="sub/rel.html">r</a>'
        '<a href="../up/./two.html">u</a>'
        '<a href="mailto:a@b.c">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="#same-page">s</a>'
        '<a href="https://other.com/abs">dup</a></p>'
    )
    t = Table("pages", spark=spark)
    t.insert_many(
        [{"doc_id": 0, "html": html, "url": "https://a.com/dir/sub/index.html"}]
    )
    out = extract_links(t, "html", "url", "doc_id")
    links = sorted(r.link for r in out)
    assert links == sorted(
        [
            "https://other.com/abs",
            "https://other.com/abs",           # multiplicity preserved
            "https://cdn.com/sr",
            "https://a.com/root/page?q=1",     # fragment stripped
            "https://a.com/dir/sub/sub/rel.html",
            "https://a.com/dir/up/two.html",   # ../ and ./ normalized
        ]
    )
    assert set(out.fields) == {"doc_id", "link"}


def test_extract_links_base_area_and_query_only(spark):
    """Round-12 breadth: <base href> re-roots relative links (absolute
    base, root-relative base, ignored-when-absent), <area href> links
    are discovered, and a query-only ?ref keeps the FULL base path per
    RFC 3986 §5.3 (pagination links), both with and without <base>."""
    from littletable_spark.operators.urlops import extract_links

    rows = [
        {  # absolute <base>: every relative form re-roots to it
            "doc_id": 0,
            "html": (
                '<head><base href="https://b.org/bb/x.html"></head>'
                '<a href="rel.html">r</a>'
                '<a href="/root">q</a>'
                '<a href="?page=2">p</a>'
                "<area shape='rect' href='m/ap.html'>"
            ),
            "url": "https://a.com/dir/p.html",
        },
        {  # root-relative <base>: doc scheme+authority, base path
            "doc_id": 1,
            "html": (
                "<head><base href='/newroot/'></head>"
                '<a href="rel.html">r</a><a href="?k=v">p</a>'
            ),
            "url": "https://a.com/dir/p.html",
        },
        {  # no <base>: query-only keeps the doc's full path
            "doc_id": 2,
            "html": '<a href="?page=9">p</a><area href="/m2">',
            "url": "https://a.com/dir/p.html",
        },
        {  # fragment-only <base> is treated as absent
            "doc_id": 3,
            "html": '<base href="#top"><a href="rel.html">r</a>',
            "url": "https://a.com/dir/p.html",
        },
    ]
    t = Table("pages", spark=spark)
    t.insert_many(rows)
    out = extract_links(t, "html", "url", "doc_id")
    got = sorted((r.doc_id, r.link) for r in out)
    assert got == sorted(
        [
            (0, "https://b.org/bb/rel.html"),
            (0, "https://b.org/root"),
            (0, "https://b.org/bb/x.html?page=2"),
            (0, "https://b.org/bb/m/ap.html"),
            (1, "https://a.com/newroot/rel.html"),
            (1, "https://a.com/newroot/?k=v"),
            (2, "https://a.com/dir/p.html?page=9"),
            (2, "https://a.com/m2"),
            (3, "https://a.com/dir/rel.html"),
        ]
    )


def test_extract_links_composes_with_frontier(spark):
    """Discovery feeds the frontier: extract -> canonicalize -> dedup."""
    from littletable_spark.operators.urlops import dedup_urls, extract_links

    t = Table("pages", spark=spark)
    t.insert_many(
        [
            {
                "doc_id": i,
                "html": '<a href="/P?utm_source=x&a=1">l</a>'
                '<a href="/P?a=1">l2</a>',
                "url": f"https://S{i % 2}.com/x",
            }
            for i in range(4)
        ]
    )
    links = extract_links(t, "html", "url", "doc_id")
    assert len(links) == 8
    deduped = dedup_urls(links, "link")
    # 2 hosts x 1 canonical URL (utm dropped, same ?a=1)
    assert len(deduped) == 2


def test_full_crawl_loop_composition(spark):
    """The whole discovery loop in one pipeline: pages -> extract_links
    -> canonicalize/dedup -> filter_by_robots -> pagerank priorities ->
    schedule_fetches. Every stage is the real operator; the assertions
    pin the cross-stage contracts (frontier keys survive, disallowed
    URLs never reach the schedule, authority orders the fetches)."""
    from littletable_spark.operators.graph import pagerank
    from littletable_spark.operators.robots import (
        filter_by_robots,
        parse_robots,
        robots_crawl_delays,
        schedule_fetches,
    )
    from littletable_spark.operators.urlops import dedup_urls, extract_links

    # three crawled pages; hub.com is linked from everywhere
    pages = Table("pages", spark=spark)
    pages.insert_many(
        [
            {
                "doc_id": 0,
                "url": "https://a.com/index.html",
                "html": '<a href="https://hub.com/x">h</a>'
                '<a href="/private/p1">p</a>'
                '<a href="/ok/1?utm_source=z">o</a>',
            },
            {
                "doc_id": 1,
                "url": "https://b.com/page",
                "html": '<a href="https://hub.com/x#frag">h</a>'
                '<a href="https://a.com/ok/1">o</a>',
            },
            {
                "doc_id": 2,
                "url": "https://hub.com/x",
                "html": '<a href="https://a.com/ok/1?utm_source=q">o</a>'
                '<a href="mailto:x@y.z">m</a>',
            },
        ]
    )
    links = extract_links(pages, "html", "url", "doc_id")
    # page->link edges drive both the frontier and the authority graph
    frontier = dedup_urls(
        Table.from_df(links.df.select("link"), name="f"), "link"
    )
    robots = Table("robots", spark=spark)
    robots.insert_many(
        [
            {
                "domain": "a.com",
                "txt": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
            },
            {"domain": "hub.com", "txt": "User-agent: *\n"},
        ]
    )
    rules = parse_robots(robots, "txt", "domain")
    allowed = filter_by_robots(frontier, rules, "link")
    kept = sorted(r.link for r in allowed)
    assert kept == [
        "https://a.com/ok/1",       # tracking param canonicalized away
        "https://hub.com/x",        # fragment variant collapsed
    ]
    # authority graph over CANONICAL keys: a.com/ok/1 collects all
    # three in-links (two tracking-param variants collapse onto it)
    from littletable_spark.operators.urlops import canonicalize_urls

    canon_links = canonicalize_urls(links, "link", out_col="canon")
    edges = Table.from_df(
        canon_links.df.selectExpr(
            "cast(doc_id as string) AS src", "canon AS dst"
        ),
        name="edges",
    )
    pr = pagerank(edges, iterations=5)
    ranks = {r.node: r.rank for r in pr}
    delays = robots_crawl_delays(robots, "txt", "domain")
    prio = Table.from_df(
        allowed.df.join(
            pr.df.withColumnRenamed("node", "link"), "link", "left"
        ),
        name="prio",
    )
    sched = schedule_fetches(prio, delays, url_col="link", priority_col="rank")
    got = {r.link: r.fetch_at for r in sched}
    # one URL per host here -> everything fetchable at t=0
    assert set(got.values()) == {0.0}
    assert ranks["https://a.com/ok/1"] > ranks["https://hub.com/x"] > 0


def test_extract_canonical_shapes(spark):
    """<link rel=canonical>: both attribute orders and quote styles,
    effective-base resolution, non-http -> NULL, absent -> NULL,
    stylesheet decoys never match, first canonical wins."""
    from littletable_spark.operators.urlops import extract_canonical

    rows = [
        {"doc_id": 0,
         "html": '<link rel="stylesheet" href="/s.css">'
                 '<link rel="canonical" href="https://c.org/x">'
                 '<link rel="canonical" href="https://c.org/second">',
         "url": "https://a.com/d/p.html"},
        {"doc_id": 1,
         "html": "<link href='/canon/1' rel='canonical'>",
         "url": "https://a.com/d/p.html"},
        {"doc_id": 2,
         "html": '<head><base href="https://b.net/bb/"></head>'
                 '<link rel=canonical href="rel.html#f">',
         "url": "https://a.com/d/p.html"},
        {"doc_id": 3, "html": '<link rel="canonical" href="ftp://x/y">',
         "url": "https://a.com/d/p.html"},
        {"doc_id": 4, "html": "<p>no links at all</p>",
         "url": "https://a.com/d/p.html"},
        {"doc_id": 5,
         "html": '<link rel="canonical" href="?page=3">',
         "url": "https://a.com/d/p.html"},
    ]
    t = Table("pages", spark=spark)
    t.insert_many(rows)
    out = extract_canonical(t, "html", "url", "doc_id")
    got = {r.doc_id: r.canonical_url for r in out}
    assert got == {
        0: "https://c.org/x",          # first canonical wins
        1: "https://a.com/canon/1",
        2: "https://b.net/bb/rel.html",
        3: None,
        4: None,
        5: "https://a.com/d/p.html?page=3",
    }
    assert len(out) == 6  # one row per page, always


def test_bracketed_ipv6_authorities(spark):
    """RFC 3986 §3.2.2 bracketed-IPv6 authorities across the URL
    family (round 13): host = the bracket contents, the address's
    colons never read as a port, userinfo and real ports still strip,
    brackets survive canonicalization, and plain hosts are unchanged."""
    from littletable_spark.operators.urlops import (
        canonicalize_urls,
        url_features,
    )

    t = Table("recs", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "http://[2001:DB8::1]/a/b?x=1"},
            {"id": 1, "url": "https://u:pw@[::1]:8443/x"},
            {"id": 2, "url": "HTTPS://[2001:db8::2]:443/y"},
            {"id": 3, "url": "http://[::ffff:10.0.0.1]:80/z"},
            {"id": 4, "url": "http://plain.example.com:8080/p"},
        ]
    )
    feats = {r.id: r for r in url_features(t, "url")}
    assert feats[0].host == "2001:db8::1"  # lowercased, brackets gone
    assert feats[0].is_ip and feats[0].domain == "2001:db8::1"
    assert feats[0].tld == "" and feats[0].path_depth == 2
    assert feats[1].host == "::1" and feats[1].is_ip  # userinfo+port strip
    assert feats[3].host == "::ffff:10.0.0.1" and feats[3].is_ip
    assert feats[4].host == "plain.example.com" and not feats[4].is_ip

    canon = {r.id: r.canon_url for r in canonicalize_urls(t, "url")}
    assert canon[0] == "http://[2001:db8::1]/a/b?x=1"  # brackets kept
    assert canon[1] == "https://[::1]:8443/x"  # non-default port kept
    assert canon[2] == "https://[2001:db8::2]/y"  # default :443 stripped
    assert canon[3] == "http://[::ffff:10.0.0.1]/z"  # default :80 stripped
    assert canon[4] == "http://plain.example.com:8080/p"


def test_canonical_and_base_document_order_across_quote_styles(spark):
    """Round-13 ADVICE fix: 'first wins' is DOCUMENT order, not
    quote-style order — an earlier single-quoted <link rel=canonical>
    (or <base href>) beats a later double-quoted one, and vice versa."""
    from littletable_spark.operators.urlops import (
        extract_canonical,
        extract_links,
    )

    rows = [
        {"doc_id": 0,
         "html": "<link rel='canonical' href='https://first.org/sq'>"
                 '<link rel="canonical" href="https://second.org/dq">',
         "url": "https://a.com/p"},
        {"doc_id": 1,
         "html": '<link rel="canonical" href="https://first.org/dq">'
                 "<link rel='canonical' href='https://second.org/sq'>",
         "url": "https://a.com/p"},
        {"doc_id": 2,  # earlier sq <base> re-roots; later dq base loses
         "html": "<head><base href='/sqroot/'>"
                 '<base href="https://dq.example.com/lost/"></head>'
                 '<link rel="canonical" href="rel.html">',
         "url": "https://a.com/d/p"},
    ]
    t = Table("pages", spark=spark)
    t.insert_many(rows)
    got = {r.doc_id: r.canonical_url
           for r in extract_canonical(t, "html", "url", "doc_id")}
    assert got[0] == "https://first.org/sq"
    assert got[1] == "https://first.org/dq"
    assert got[2] == "https://a.com/sqroot/rel.html"

    # extract_links resolves against the same document-order base
    links = {r.link for r in extract_links(
        Table.from_df(t.df.where("doc_id = 2"), name="p2"),
        "html", "url", "doc_id")}
    assert links == set()  # canonical <link> is not an <a>; no a-hrefs
    t2 = Table("pages2", spark=spark)
    t2.insert_many([{
        "doc_id": 0,
        "html": "<base href='/sqroot/'>"
                '<base href="https://dq.example.com/lost/">'
                '<a href="x.html">x</a>',
        "url": "https://a.com/d/p",
    }])
    links = {r.link for r in extract_links(t2, "html", "url", "doc_id")}
    assert links == {"https://a.com/sqroot/x.html"}
