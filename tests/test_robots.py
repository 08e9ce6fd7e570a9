"""robots.txt (RFC 9309) parsing + URL filtering."""

import pytest

from littletable_spark import Table
from littletable_spark.operators.robots import (
    _parse_one,
    filter_by_robots,
    parse_robots,
    robots_like_pattern,
)

_ROBOTS = """\
# a comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp*.bak$

User-agent: GoodBot
User-agent: OtherBot
Disallow: /goodbot-only/
Allow:

User-agent: badbot
Disallow: /
"""


def test_parse_one_group_selection():
    star = _parse_one(_ROBOTS, "SomeCrawler")
    assert ("/private/", False) in star and ("/private/ok", True) in star
    assert ("/tmp*.bak$", False) in star
    good = _parse_one(_ROBOTS, "goodbot")
    assert good == [("/goodbot-only/", False)]
    # stacked user-agent lines share one group
    other = _parse_one(_ROBOTS, "OtherBot")
    assert other == good
    # token containment: agent string contains the UA token
    assert _parse_one(_ROBOTS, "BadBot/2.1 (+http://x)") == [("/", False)]
    # empty Disallow: emits no rule (allow-all idiom)
    assert _parse_one("User-agent: *\nDisallow:\n", "x") == []


def test_empty_specific_group_allows_all():
    """RFC 9309: a matching specific-agent group with ZERO rules means
    allow-all for that agent — it must NOT fall through to a ``*``
    group that disallows everything. (The Sitemap line between the
    groups keeps them distinct; adjacent UA lines would merge.)"""
    txt = (
        "User-agent: mybot\n"
        "Sitemap: https://x.com/s.xml\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    assert _parse_one(txt, "mybot") == []
    assert _parse_one(txt, "otherbot") == [("/", False)]


def test_like_pattern_translation():
    assert robots_like_pattern("/a/b") == "/a/b%"
    assert robots_like_pattern("/a*z") == "/a%z%"
    assert robots_like_pattern("/exact$") == "/exact"
    assert robots_like_pattern("/50%_off") == "/50\\%\\_off%"


def test_parse_robots_table(spark):
    t = Table("robots", spark=spark)
    t.insert_many(
        [
            {"domain": "a.com", "txt": _ROBOTS},
            {"domain": "b.com", "txt": "User-agent: *\nDisallow: /\n"},
            {"domain": "c.com", "txt": "not robots at all"},
        ]
    )
    rules = parse_robots(t, "txt", "domain")
    got = {(r.domain, r.path_pattern): (r.allow, r.rule_len) for r in rules}
    assert got[("a.com", "/private/")] == (False, 9)
    assert got[("a.com", "/private/ok")] == (True, 11)
    assert got[("b.com", "/")] == (False, 1)
    assert not any(d == "c.com" for d, _ in got)


def test_filter_by_robots_precedence(spark):
    rt = Table("robots", spark=spark)
    rt.insert_many(
        [
            {"domain": "a.com", "txt": _ROBOTS},
            {"domain": "deny.com", "txt": "User-agent: *\nDisallow: /\n"},
        ]
    )
    rules = parse_robots(rt, "txt", "domain")
    t = Table("urls", spark=spark)
    t.insert_many(
        [
            {"doc_id": 0, "url": "https://a.com/public/page"},
            {"doc_id": 1, "url": "https://a.com/private/secret"},
            {"doc_id": 2, "url": "https://a.com/private/ok/fine"},  # Allow wins
            {"doc_id": 3, "url": "https://a.com/tmp123.bak"},       # $ anchor
            {"doc_id": 4, "url": "https://a.com/tmp123.bak.txt"},   # not anchored
            {"doc_id": 5, "url": "https://deny.com/anything"},
            {"doc_id": 6, "url": "https://unlisted.org/x"},
        ]
    )
    kept = sorted(r.doc_id for r in filter_by_robots(t, rules, "url"))
    assert kept == [0, 2, 4, 6]
    strict = sorted(
        r.doc_id
        for r in filter_by_robots(t, rules, "url", keep_unlisted=False)
    )
    assert strict == [0, 2, 4]
    # original columns come back unchanged
    out = filter_by_robots(t, rules, "url")
    assert set(out.fields) == {"doc_id", "url"}


def test_filter_allow_beats_disallow_on_tie(spark):
    rt = Table("r", spark=spark)
    rt.insert_many(
        [{"domain": "t.com", "txt": "User-agent: *\nDisallow: /a/\nAllow: /b/\n"}]
    )
    rules = parse_robots(rt, "txt", "domain")
    # same-length competing rules for one path: craft via two rules of
    # equal length matching the same URL
    rt2 = Table("r2", spark=spark)
    rt2.insert_many(
        [{"domain": "t.com", "txt": "User-agent: *\nDisallow: /pg\nAllow: /pg\n"}]
    )
    rules2 = parse_robots(rt2, "txt", "domain")
    t = Table("u", spark=spark)
    t.insert_many([{"doc_id": 0, "url": "https://t.com/pg/x"}])
    assert [r.doc_id for r in filter_by_robots(t, rules2, "url")] == [0]


def test_filter_preserves_duplicate_rows_and_needs_no_key(spark):
    """Filters must never dedup: identical rows (and colliding
    pseudo-ids) keep their multiplicity — the winning-rule window keys
    on a synthesized per-row ordinal."""
    rt = Table("r", spark=spark)
    rt.insert_many(
        [{"domain": "s.com", "txt": "User-agent: *\nDisallow: /no/\n"}]
    )
    rules = parse_robots(rt, "txt", "domain")
    t = Table("u", spark=spark)
    t.insert_many(
        [
            {"ord": 0, "url": "https://s.com/a"},
            {"ord": 0, "url": "https://s.com/b"},   # colliding ord
            {"ord": 0, "url": "https://s.com/b"},   # true duplicate row
            {"ord": 1, "url": "https://s.com/no/x"},
        ]
    )
    kept = sorted(r.url for r in filter_by_robots(t, rules, "url"))
    assert kept == ["https://s.com/a", "https://s.com/b", "https://s.com/b"]


def test_filter_matches_query_string_not_fragment(spark):
    """RFC 9309 rules match the path-AND-query — ``/*?sessionid=`` and
    ``/search?q=`` must fire — but never the fragment."""
    rt = Table("r", spark=spark)
    rt.insert_many(
        [
            {
                "domain": "q.com",
                "txt": (
                    "User-agent: *\n"
                    "Disallow: /*?sessionid=\n"
                    "Disallow: /search?q=\n"
                ),
            }
        ]
    )
    rules = parse_robots(rt, "txt", "domain")
    t = Table("u", spark=spark)
    t.insert_many(
        [
            {"doc_id": 0, "url": "https://q.com/p?sessionid=abc"},   # drop
            {"doc_id": 1, "url": "https://q.com/p"},                 # keep
            {"doc_id": 2, "url": "https://q.com/search?q=x"},        # drop
            {"doc_id": 3, "url": "https://q.com/search"},            # keep
            # '?' inside the fragment is NOT a query — rule must not fire
            {"doc_id": 4, "url": "https://q.com/p#frag?sessionid=1"},
            {"doc_id": 5, "url": "https://q.com/a?sessionid=2&x=1"},  # drop
            # '&sessionid=' is not '?sessionid=' — the rule's literal
            # '?' must not fire mid-query
            {"doc_id": 6, "url": "https://q.com/a?x=1&sessionid=2"},  # keep
        ]
    )
    kept = sorted(r.doc_id for r in filter_by_robots(t, rules, "url"))
    assert kept == [1, 3, 4, 6]


def test_filter_subdomain_suffix_chain(spark):
    """Domain equality on the exploded host-suffix chain: rules for
    ``a.co.uk`` govern ``www.a.co.uk`` but never ``nota.co.uk``."""
    rt = Table("r", spark=spark)
    rt.insert_many(
        [{"domain": "a.co.uk", "txt": "User-agent: *\nDisallow: /\n"}]
    )
    rules = parse_robots(rt, "txt", "domain")
    t = Table("u", spark=spark)
    t.insert_many(
        [
            {"doc_id": 0, "url": "https://a.co.uk/x"},        # drop
            {"doc_id": 1, "url": "https://www.a.co.uk/x"},    # drop
            {"doc_id": 2, "url": "https://deep.www.a.co.uk/x"},  # drop
            {"doc_id": 3, "url": "https://nota.co.uk/x"},     # unlisted → keep
        ]
    )
    kept = sorted(r.doc_id for r in filter_by_robots(t, rules, "url"))
    assert kept == [3]
    assert len(filter_by_robots(t, rules, "url", keep_unlisted=False)) == 0


def test_robots_sitemaps_directives(spark):
    """Sitemap: lines extract group-independently and hand off to the
    sitemap parser."""
    from littletable_spark.operators.robots import robots_sitemaps

    rt = Table("r", spark=spark)
    rt.insert_many(
        [
            {
                "domain": "a.com",
                "txt": (
                    "Sitemap: https://a.com/sitemap.xml\n"
                    "User-agent: *\nDisallow: /x\n"
                    "sitemap:https://a.com/sitemap2.xml.gz  # trailing\n"
                    "Sitemap: not-a-url\n"
                ),
            },
            {"domain": "b.com", "txt": "User-agent: *\nAllow: /\n"},
        ]
    )
    got = sorted((r.domain, r.sitemap_url) for r in robots_sitemaps(rt, "txt"))
    assert got == [
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/sitemap2.xml.gz"),
    ]


def test_robots_crawl_delays(spark):
    """Crawl-delay: group-scoped per RFC practice, numeric parse,
    default where absent; a delay-only group still selects."""
    from littletable_spark.operators.robots import robots_crawl_delays

    rt = Table("r", spark=spark)
    rt.insert_many(
        [
            {
                "domain": "a.com",
                "txt": (
                    "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"
                    "User-agent: fastbot\nCrawl-delay: 0.1\n"
                ),
            },
            {"domain": "b.com", "txt": "User-agent: *\nDisallow: /\n"},
            {"domain": "c.com", "txt": "User-agent: *\nCrawl-delay: nonsense\n"},
        ]
    )
    star = {r.domain: r.crawl_delay for r in robots_crawl_delays(rt, "txt")}
    assert star == {"a.com": 2.5, "b.com": 1.0, "c.com": 1.0}
    fast = {
        r.domain: r.crawl_delay
        for r in robots_crawl_delays(rt, "txt", agent="FastBot/9")
    }
    assert fast["a.com"] == 0.1  # delay-only group still wins for its agent


def test_schedule_fetches_politeness(spark):
    """Per-host fetch offsets: priority-desc order, crawl_delay
    spacing, default for unlisted hosts, one keyed window."""
    from littletable_spark.operators.robots import (
        robots_crawl_delays,
        schedule_fetches,
    )

    rt = Table("robots", spark=spark)
    rt.insert_many(
        [
            {"domain": "a.com", "txt": "User-agent: *\nCrawl-delay: 2.5\n"},
            {"domain": "b.com", "txt": "User-agent: *\nDisallow: /x\n"},
        ]
    )
    delays = robots_crawl_delays(rt, "txt", "domain", default_delay=1.0)
    t = Table("u", spark=spark)
    t.insert_many(
        [
            {"url": "https://a.com/p1", "prio": 1},
            {"url": "https://a.com/p2", "prio": 9},
            {"url": "https://a.com/p3", "prio": 5},
            {"url": "https://b.com/q1", "prio": 2},
            {"url": "https://c.org/r1", "prio": 3},  # unlisted host
            {"url": "https://c.org/r2", "prio": 3},  # tie -> url order
        ]
    )
    out = schedule_fetches(
        t, delays, priority_col="prio", default_delay=0.25
    )
    got = {r.url: r.fetch_at for r in out}
    # a.com: p2 (prio 9) at 0, p3 at 2.5, p1 at 5.0
    assert got["https://a.com/p2"] == 0.0
    assert got["https://a.com/p3"] == 2.5
    assert got["https://a.com/p1"] == 5.0
    # b.com listed in robots (no Crawl-delay) -> delays table default 1.0
    assert got["https://b.com/q1"] == 0.0
    # c.org unlisted -> schedule default 0.25; tie broken by url
    assert got["https://c.org/r1"] == 0.0
    assert got["https://c.org/r2"] == 0.25
    assert set(out.fields) == {"url", "prio", "fetch_at"}
    # without a delays table every host uses the default
    out2 = schedule_fetches(t, None, default_delay=2.0)
    assert {r.fetch_at for r in out2 if "a.com" in r.url} == {0.0, 2.0, 4.0}


def test_filter_post_shuffle_determinism(spark):
    """Round-11 verdict hazard regression: a frontier that reaches the
    robots filter AFTER a shuffle (dedup_urls window + a round-robin
    repartition — deliberately unstable row order) must still key
    verdicts correctly and stably: the verdict fold's key is row
    CONTENT, never a per-branch nondeterministic ordinal, so repeated
    actions on the same plan agree exactly."""
    from littletable_spark.operators.urlops import dedup_urls

    rt = Table("r", spark=spark)
    rt.insert_many(
        [{"domain": "s.com", "txt": "User-agent: *\nDisallow: /no\n"}]
    )
    rules = parse_robots(rt, "txt", "domain")
    t = Table("u", spark=spark)
    t.insert_many(
        [
            {
                "doc_id": i,
                "url": (
                    f"https://s.com/no/{i}" if i % 3 == 0
                    else f"https://s.com/ok/{i}"
                ),
            }
            for i in range(300)
        ]
        # duplicates that dedup_urls collapses -> window shuffle upstream
        # (only for /ok/ originals so the dup shares their canonical key)
        + [{"doc_id": 1000 + i, "url": f"https://s.com/ok/{i}#frag"}
           for i in range(0, 300, 7) if i % 3 != 0]
    )
    frontier = dedup_urls(t, "url")
    # force an additional order-scrambling exchange between dedup and
    # the filter (round-robin repartition = nondeterministic placement)
    frontier = frontier._derive(frontier._require_df().repartition(13))
    expected = {i for i in range(300) if i % 3 != 0}
    runs = [
        sorted(r.doc_id for r in filter_by_robots(frontier, rules, "url"))
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    assert set(runs[0]) == expected


def test_schedule_fetches_sort_key_is_hash_not_blobs(spark):
    """The per-host window's sort key is (priority, url, two 8-byte
    xxhash64 keys) — wide payload columns never enter the sort, and
    map-typed columns (at any nesting depth) are excluded from the
    hashes."""
    from pyspark.sql import functions as F

    from littletable_spark.operators.robots import schedule_fetches

    t = Table("u", spark=spark)
    t.insert_many(
        [
            {
                "url": f"https://a.com/{i}",
                "prio": i % 3,
                "body": "x" * 50,
                "tags": ["a", "b"],
            }
            for i in range(10)
        ]
    )
    # add a map-nested column: must be skipped by the hash tiebreak
    t.compute_field("meta", F.array(F.create_map(F.lit("k"), F.lit("v"))))
    out = schedule_fetches(t, None, priority_col="prio")
    analyzed = out.df._jdf.queryExecution().analyzed().toString()
    import re

    # Catalyst extracts the hash into a _w<n> pre-projection the window
    # sorts on: assert the hash exists, covers body+tags but NOT the
    # map-nested meta, and is the only extra sort key
    assert re.search(r"xxhash64\(struct\(body, body#\d+, tags, tags#\d+\)",
                     analyzed), analyzed
    # the second, independent tiebreak: seeded + reversed field order
    assert re.search(
        r"xxhash64\(2654435769, struct\(tags, tags#\d+, body, body#\d+\)",
        analyzed), analyzed
    spec = re.search(r"windowspecdefinition\((.*)", analyzed).group(1)
    assert re.search(r"_w\d+#\d+L? ASC", spec), analyzed
    # the raw body/tags/meta columns are not sort keys themselves
    assert not re.search(r"body#\d+ ASC", analyzed), analyzed
    assert not re.search(r"tags#\d+ ASC", analyzed), analyzed
    assert not re.search(r"meta#\d+ ASC", analyzed), analyzed
    # and the schedule itself is still deterministic + correct
    got = [r.fetch_at for r in out]
    assert sorted(got)[:3] == [0.0, 1.0, 2.0]


def test_robots_and_schedule_ipv6_hosts(spark):
    """A listed bracketed-IPv6 host behaves like any registered name:
    its rules apply (host = bracket contents via the shared chain in
    urlops), and schedule_fetches gives it its own politeness window."""
    from littletable_spark import Table
    from littletable_spark.operators.robots import (
        filter_by_robots,
        parse_robots,
        schedule_fetches,
    )

    robots = Table("robots", spark=spark)
    robots.insert_many(
        [{"domain": "2001:db8::1",
          "txt": "User-agent: *\nDisallow: /private/\n"}]
    )
    rules = parse_robots(robots, "txt", "domain")
    t = Table("urls", spark=spark)
    t.insert_many(
        [
            {"id": 0, "url": "http://[2001:db8::1]/ok"},
            {"id": 1, "url": "http://u@[2001:DB8::1]:8080/private/x"},
            {"id": 2, "url": "http://[2001:db8::9]/private/x"},  # unlisted
        ]
    )
    kept = sorted(r.id for r in filter_by_robots(t, rules, "url"))
    assert kept == [0, 2]  # rule blocks 1; unlisted IPv6 kept by default
    strict = sorted(
        r.id for r in filter_by_robots(t, rules, "url", keep_unlisted=False)
    )
    assert strict == [0]

    sched = schedule_fetches(t, None, default_delay=2.0)
    by_id = {r.id: r.fetch_at for r in sched}
    # ids 0 and 1 share host 2001:db8::1 (port/userinfo stripped) ->
    # politeness-spaced; id 2 is its own host -> slot 0
    assert sorted([by_id[0], by_id[1]]) == [0.0, 2.0]
    assert by_id[2] == 0.0
