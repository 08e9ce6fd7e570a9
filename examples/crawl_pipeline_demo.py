"""The full crawl story in-engine (rounds 9-10): WARC archives on
disk → records → robots filtering → canonical-URL dedup → extracted
text → quality gates → cross-site dedup → link discovery (resolve,
canonicalize, robots-filter, PageRank-prioritize, politeness-schedule)
text → quality filter → content dedup → curation report.

Builds a small synthetic crawl (two .warc/.warc.gz files of HTML +
plain-text responses, one corrupt archive) in a temp dir, then runs
the pipeline a real pretraining-data job would:

1. ``warc_import``       — one task per archive, HTTP envelope split,
                           records streamed out in bounded chunks
2. ``parse_robots`` + ``filter_by_robots`` — RFC 9309 politeness
3. ``canonicalize_urls`` — frontier-key dedup (tracking params, case,
                           ports, fragments collapse)
4. ``extract_text``      — format-routed (HTML main-content / PDF /
                           UTF-8), boilerplate dropped
5. ``gopher_quality_filter`` — rule-based audit-trail filtering
6. ``exact_dedup``       — content-hash dedup
7. ``corpus_report``     — per-format counts/tokens/percentiles

Run: python examples/crawl_pipeline_demo.py
"""

import gzip
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark
from littletable_spark.operators.dedup import exact_dedup
from littletable_spark.operators.multimodal import extract_text
from littletable_spark.operators.stats import corpus_report
from littletable_spark.sources.warc_io import warc_import


def _record(url: str, body: bytes, ctype: bytes = b"text/html") -> bytes:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
    )
    head = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    return head


def _page(i: int) -> bytes:
    # even docs declare a canonical URL (the publisher dedup key)
    canonical = (
        "<link rel='canonical' href='http://site-a.test/%d'>" % i
        if i % 2 == 0
        else ""
    )
    body = (
        "<html><head><title>Doc %d</title>%s</head><body>"
        "<nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
        "<p>This is substantial unique content for document %d, with "
        "enough words that the quality rules keep it. It discusses "
        "topic %d in satisfying, fully punctuated sentences.</p>"
        "<footer><a href='/terms'>Terms</a></footer></body></html>"
        % (i, canonical, i, i % 3)
    ).encode()
    return body


def main() -> None:
    spark = get_spark(cpus=8)
    root = Path(tempfile.mkdtemp(prefix="crawl_demo_"))

    a = b"".join(_record(f"http://site-a.test/{i}", _page(i)) for i in range(6))
    # site B repeats site A's pages 0-2 (the crawl-duplicate case)
    b = b"".join(
        _record(f"http://site-b.test/{i}", _page(i)) for i in range(3)
    ) + _record("http://site-b.test/plain", b"tiny", b"text/plain")
    (root / "site_a.warc").write_bytes(a)
    (root / "site_b.warc.gz").write_bytes(gzip.compress(b))
    (root / "broken.warc").write_bytes(b"not a warc")

    # 1. archives -> records
    recs = warc_import(spark, str(root), pattern="*.warc*", on_error="null")
    print(f"records: {len(recs)}")

    # 2. robots politeness: site B disallows /2 for everyone
    from littletable_spark.operators.robots import filter_by_robots, parse_robots

    robots = Table("robots", spark=spark)
    robots.insert_many(
        [{"domain": "site-b.test", "txt": "User-agent: *\nDisallow: /2\n"}]
    )
    rules = parse_robots(robots, "txt", "domain")
    polite = filter_by_robots(recs, rules, "url")
    print(f"robots: {len(polite)}/{len(recs)} allowed")

    # 3. canonical frontier keys: tracking params / fragments collapse
    from littletable_spark.operators.urlops import dedup_urls

    frontier = dedup_urls(polite, "url")
    print(f"frontier: {len(frontier)} unique canonical urls")

    docs = Table.from_df(
        frontier.df.select(F.col("url").alias("doc_id"), "payload"), name="docs"
    )
    texts = extract_text(
        docs, "payload", "doc_id", html_main_content=True, on_error="null"
    )

    # 3. quality rules with audit trail (drops the 1-token plain doc)
    from littletable_spark.operators.textops import filter_quality

    kept = filter_quality(
        Table.from_df(texts.df.where("text IS NOT NULL"), name="texts"),
        "text",
        "doc_id",
        # demo pages are short; relax the Gopher token band accordingly
        rules={"n_tokens": (10.0, 100_000.0), "stopword_ratio": (0.02, 1.0)},
    )
    survivors = kept.where(keep=True)
    print(f"quality: {len(survivors)}/{len(texts)} kept")

    # 4. exact dedup across sites (site B mirrors three site-A pages)
    with_text = Table.from_df(
        survivors.df.join(texts.df.select("doc_id", "text"), "doc_id"),
        name="survivors",
    )
    deduped = exact_dedup(with_text, ["text"], "doc_id")
    print(f"dedup: {len(deduped)} canonical docs "
          f"({len(with_text) - len(deduped)} mirrors removed)")

    # 5. discovery loop (round 11-12 ops): links out of the fetched
    # pages feed the NEXT crawl cycle — resolve every <a>/<area> href
    # (honoring <base href>), prefer publisher-declared canonical
    # URLs, drop disallowed targets, rank authority, space fetches
    from littletable_spark.operators.graph import pagerank
    from littletable_spark.operators.robots import (
        robots_crawl_delays,
        schedule_fetches,
    )
    from littletable_spark.operators.urlops import (
        extract_canonical,
        extract_links,
    )

    pages = Table.from_df(
        frontier.df.selectExpr(
            "url", "cast(payload as string) AS html"
        ),
        name="pages",
    )
    links = extract_links(pages, "html", "url", "url", link_col="link")
    canon = extract_canonical(pages, "html", "url", "url")
    print(f"discovery: {len(links)} links, "
          f"{canon.df.where('canonical_url IS NOT NULL').count()} canonical tags")

    next_frontier = dedup_urls(
        Table.from_df(links.df.selectExpr("link AS url"), name="nf"), "url"
    )
    allowed = filter_by_robots(next_frontier, rules, "url")
    edges = Table.from_df(
        links.df.selectExpr("url AS src", "link AS dst"), name="edges"
    )
    ranks = pagerank(edges, iterations=5)
    prio = Table.from_df(
        allowed.df.join(
            ranks.df.withColumnRenamed("node", "url"), "url", "left"
        ).fillna(0.0, ["rank"]),
        name="prio",
    )
    delays = robots_crawl_delays(robots, "txt", "domain")
    sched = schedule_fetches(prio, delays, priority_col="rank")
    head = sched.df.orderBy("fetch_at").limit(3).collect()
    print("next fetches:", [(r.url, round(r.fetch_at, 2)) for r in head])

    # 6. the curation report
    report = corpus_report(
        Table.from_df(
            texts.df.where("text IS NOT NULL"), name="texts"
        ),
        "text",
        by=("doc_format",),
    )
    report.orderby("doc_format")
    print(report.as_markdown())


if __name__ == "__main__":
    main()
