"""Frontier-pipeline scale probe (round 11): sitemap_entries →
canonicalize/dedup_urls → filter_by_robots end-to-end at 1×/10×/100×
URL volume against a 1M-row rules table (50k domains × 20 rules).

Claims probed (pinned in BASELINE.md):
- The robots filter is an EQUI-join on the exploded host-suffix chain:
  cost scales with matched (url, rule-domain) pairs, NOT corpus ×
  total-rules. Under the pre-round-11 BroadcastNestedLoopJoin shape,
  5M URLs × 1M rules = 5e12 row comparisons — this probe would not
  finish; post-rewrite it is three linear shuffles.
- The whole frontier pipeline (parse sitemaps, canonicalize, dedup,
  robots-filter) grows sub-quadratically 1×→10×→100×.

Methodology matches scale_probe.py: all synthetic inputs (sitemap
blobs, the parsed 1M-rule table) are built, persisted, and counted
BEFORE timing. Usage: python scripts/frontier_probe.py
"""

from __future__ import annotations

import gzip
import sys
import time
from typing import Iterator

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from littletable_spark import Table, get_spark

N_DOMAINS = 50_000
URLS_PER_SITEMAP = 1_000
N_URLS_1X = 50_000

# 20 rules per domain → 1M rules total at 50k domains
_RULES_TXT = "User-agent: *\n" + "".join(
    f"Disallow: /sec{k}/\nAllow: /sec{k}/ok\n" for k in range(9)
) + "Disallow: /tmp*.bak$\nDisallow: /*?sessionid=\n"


def _sitemap_blob(map_id: int) -> bytes:
    base = map_id * URLS_PER_SITEMAP
    parts = ['<?xml version="1.0"?>\n'
             '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for j in range(URLS_PER_SITEMAP):
        i = base + j
        dom = i % N_DOMAINS
        seg = f"sec{i % 12}" if i % 12 < 9 else ("public", "tmp", "media")[i % 3]
        # ~20% duplicate pages reached via different tracking params /
        # casings so dedup_urls has real work
        page = i if i % 5 else i - 1
        q = "?utm_source=probe&amp;a=1" if i % 2 else "?a=1"
        tail = "?sessionid=9" if i % 17 == 0 else q
        parts.append(
            f"<url><loc>https://Site-{dom}.com:443/{seg}/{page}{tail}"
            f"</loc></url>"
        )
    parts.append("</urlset>")
    return gzip.compress("".join(parts).encode())


def blob_table(spark, n_urls: int, name: str) -> Table:
    n_maps = n_urls // URLS_PER_SITEMAP

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "map_id": pdf["id"],
                    "blob": [_sitemap_blob(int(i)) for i in pdf["id"]],
                }
            )

    df = (
        spark.range(n_maps)
        .repartition(32)
        .mapInPandas(gen, "map_id long, blob binary")
        .persist()
    )
    assert df.count() == n_maps
    return Table.from_df(df, name=name)


def timed(label: str, fn, res: dict) -> None:
    t0 = time.perf_counter()
    fn()
    res[label] = time.perf_counter() - t0


def main() -> None:
    from littletable_spark.operators.robots import filter_by_robots, parse_robots
    from littletable_spark.operators.urlops import dedup_urls
    from littletable_spark.sources.sitemap_io import sitemap_entries

    spark = get_spark(cpus=32)
    res: dict[str, float] = {}

    robots = Table.from_df(
        spark.range(N_DOMAINS).select(
            F.concat(
                F.lit("site-"), F.col("id").cast("string"), F.lit(".com")
            ).alias("domain"),
            F.lit(_RULES_TXT).alias("txt"),
        ),
        name="robots",
    )
    rules_df = parse_robots(robots, "txt", "domain").df.persist()
    n_rules = rules_df.count()
    assert n_rules == N_DOMAINS * 20, n_rules
    rules = Table.from_df(rules_df, name="rules")
    print(f"rules table: {n_rules} rows ({N_DOMAINS} domains x 20)")

    tables = {
        s: blob_table(spark, N_URLS_1X * s, f"maps_{s}x") for s in (1, 10, 100)
    }

    def pipeline(blobs: Table, n_urls: int) -> None:
        ent = sitemap_entries(blobs, "blob", "map_id")
        urls = Table.from_df(
            ent.df.where("kind = 'url'").select(F.col("loc").alias("url")),
            name="frontier",
        )
        deduped = dedup_urls(urls, "url")
        kept = filter_by_robots(deduped, rules, "url")
        n = kept.df.count()
        # sanity: dedup collapsed something, robots dropped something
        assert 0 < n < n_urls, (n, n_urls)

    pipeline(tables[1], N_URLS_1X)  # untimed warmup
    for s in (1, 10, 100):
        timed(f"frontier_{s}x", lambda s=s: pipeline(tables[s], N_URLS_1X * s), res)

    # robots filter ALONE on the deduped 10x frontier vs the 1M rules —
    # the direct matched-pairs-scaling claim
    pre = {}
    for s in (1, 10):
        ent = sitemap_entries(tables[s], "blob", "map_id")
        urls = Table.from_df(
            ent.df.where("kind = 'url'").select(F.col("loc").alias("url")),
            name="f2",
        )
        d = dedup_urls(urls, "url").df.persist()
        d.count()
        pre[s] = Table.from_df(d, name=f"pre_{s}x")
    for s in (1, 10):
        timed(
            f"robots_only_{s}x",
            lambda s=s: filter_by_robots(pre[s], rules, "url").df.count(),
            res,
        )

    # link discovery (pure projection + explode) and per-host
    # politeness scheduling (one keyed window) at 1x/10x
    from littletable_spark.operators.robots import schedule_fetches
    from littletable_spark.operators.urlops import extract_links

    def html_table(n_docs: int, name: str) -> Table:
        df = (
            spark.range(n_docs)
            .selectExpr(
                "id",
                "concat('https://site-', cast(id % {0} as string), "
                "'.com/d/', cast(id as string), '/p.html') AS url".format(
                    N_DOMAINS
                ),
                "concat('<a href=\"/r/', cast(id % 97 as string), '\">x</a>',"
                "'<a href=\"rel/', cast(id % 13 as string), '.html\">y</a>',"
                "'<a href=\"https://ext.org/', cast(id as string), '\">z</a>',"
                "'<a href=\"../up/', cast(id % 7 as string), '\">u</a>',"
                "'<a href=\"mailto:a@b.c\">m</a>') AS html",
            )
            .persist()
        )
        df.count()
        return Table.from_df(df, name=name)

    pages = {s: html_table(N_URLS_1X * s, f"pages_{s}x") for s in (1, 10)}

    def links(t: Table, n: int) -> None:
        assert extract_links(t, "html", "url", "id").df.count() == 4 * n

    links(pages[1], N_URLS_1X)  # untimed warmup
    for s in (1, 10):
        timed(f"links_{s}x", lambda s=s: links(pages[s], N_URLS_1X * s), res)

    def sched(t: Table) -> None:
        schedule_fetches(t, None, url_col="url").df.agg(
            F.sum("fetch_at")
        ).collect()

    sched(pre[1])  # untimed warmup (pre = deduped frontier tables)
    for s in (1, 10):
        timed(f"schedule_{s}x", lambda s=s: sched(pre[s]), res)

    # pagerank over the extracted link graph (page url -> link),
    # 3 iterations — the Pregel loop's per-iteration cost must grow
    # with EDGES, not iterations x corpus scans
    from littletable_spark.operators.graph import pagerank

    graphs = {}
    for s in (1, 10):
        edf = (
            extract_links(pages[s], "html", "url", "id")
            .df.join(pages[s].df.select("id", "url"), "id")
            .selectExpr("url AS src", "link AS dst")
            .persist()
        )
        edf.count()
        graphs[s] = Table.from_df(edf, name=f"graph_{s}x")

    def pr(t: Table) -> None:
        pagerank(t, iterations=3).df.agg(F.sum("rank")).collect()

    pr(graphs[1])  # untimed warmup
    for s in (1, 10):
        timed(f"pagerank_{s}x", lambda s=s: pr(graphs[s]), res)

    for k, v in res.items():
        print(f"{k:20s} {v:8.3f}s")
    print(f"{'frontier':20s} 10x/1x  ratio {res['frontier_10x'] / res['frontier_1x']:6.2f}")
    print(f"{'frontier':20s} 100x/10x ratio {res['frontier_100x'] / res['frontier_10x']:6.2f}")
    print(f"{'robots_only':20s} 10x/1x  ratio {res['robots_only_10x'] / res['robots_only_1x']:6.2f}")
    print(f"{'links':20s} 10x/1x  ratio {res['links_10x'] / res['links_1x']:6.2f}")
    print(f"{'schedule':20s} 10x/1x  ratio {res['schedule_10x'] / res['schedule_1x']:6.2f}")
    print(f"{'pagerank':20s} 10x/1x  ratio {res['pagerank_10x'] / res['pagerank_1x']:6.2f}")


if __name__ == "__main__":
    main()
