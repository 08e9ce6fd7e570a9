"""robots.txt (RFC 9309) parsing and URL filtering — crawl politeness
as data-pipeline operators.

A compliant crawl pipeline must drop URLs a site's robots.txt
disallows for its user agent, and space per-host fetches to honor
Crawl-delay. The operators:

- ``parse_robots``: one robots.txt blob per domain → a RULES table
  ``(domain, path_pattern, allow, rule_len, like_pattern)``. Group
  selection per RFC 9309: the group(s) whose ``User-agent`` line
  matches the crawler's product token (case-insensitive), else the
  ``*`` groups; multiple groups for the same agent merge. ``Allow`` /
  ``Disallow`` values keep their ``*`` wildcards and ``$`` end anchor;
  an empty ``Disallow:`` is the allow-all idiom (no rule emitted).
  Parsing is stateful across lines, so it runs as an Arrow pass —
  the OUTPUT is list-sized (rules per domain), which is what makes
  the filter below broadcastable.

- ``filter_by_robots``: keep the rows whose URL the rules allow.
  Fully native and EQUI-JOINED: each URL's host explodes into its
  bounded label-suffix chain (``www.a.co.uk`` → ``[www.a.co.uk,
  a.co.uk, co.uk]``), which hash-joins the rules on exact domain
  equality — the suffix chain realizes the subdomain rule without a
  non-equi ``endswith`` condition, so the plan is a standard shuffled
  (or AQE-broadcast) hash join that scales with MATCHED pairs, never
  an O(corpus × rules) nested loop. Rule matching is SQL ``LIKE``
  (the ``like_pattern`` column is the rule translated at parse time:
  ``*`` → ``%``, ``$`` → anchored end — identical semantics in Spark
  and DuckDB, so the filter is oracle-checkable) against the URL's
  path-AND-query (RFC 9309 matches ``/search?q=`` rules), and the
  winning rule per URL is one map-combined ``max(struct(rule_len,
  allow))`` aggregation: longest rule wins, ``Allow`` wins ties
  (RFC 9309 §2.2.2). URLs on domains with no rules are kept (or
  dropped with ``keep_unlisted=False`` for strict-allowlist crawls).

Scale shape: rules table can be web-crawl-sized (millions of
domains × tens of rules) — it is NEVER broadcast-nested-looped; the
corpus side shuffles on the exploded host suffix (≤ label count per
URL), the verdict fold is a partial-aggregating groupBy on the
deterministic content key (host, path-and-query), and the join back
to the corpus is a plain equi-join on that same content key.
No reference analog; net-new crawl capability like urlops/warc_io.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..table import Table
from .urlops import host_of

# Path AND query (everything after the authority up to any fragment):
# RFC 9309 rules match against the path-and-query, so a rule like
# ``Disallow: /search?q=`` or ``Disallow: /*?sessionid=`` must see the
# query string. Fragments are never part of the match target.
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"

__all__ = [
    "parse_robots",
    "filter_by_robots",
    "robots_sitemaps",
    "robots_crawl_delays",
    "robots_like_pattern",
    "schedule_fetches",
]


def robots_like_pattern(rule: str) -> str:
    """Translate a robots path rule to a SQL LIKE pattern (portable:
    Spark and DuckDB agree on %/_/escape semantics with ESCAPE '\\\\').
    ``*`` matches any run, ``$`` anchors the end; otherwise the rule
    is a prefix match."""
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    out = []
    for ch in rule:
        if ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def _walk_groups(text: str, agent: str):
    """The selected user-agent group's ``(rules, crawl_delay)`` for one
    robots.txt: specific-agent groups win over ``*`` groups (most
    specific token containment); same-agent groups merge. Lines
    outside any group and unknown directives are ignored."""
    agent = agent.lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
    delays: dict[str, float] = {}
    current: list[str] = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            ua = val.lower()
            if not last_was_ua:
                current = []
            current.append(ua)
            for u in current:
                groups.setdefault(u, groups.get(u, []))
            last_was_ua = True
            continue
        last_was_ua = False
        if key in ("allow", "disallow"):
            if not current:
                continue  # rule before any user-agent line
            if val == "":
                continue  # empty Disallow: allow-all idiom; no rule
            for u in current:
                groups.setdefault(u, []).append((val, key == "allow"))
        elif key == "crawl-delay" and current:
            try:
                for u in current:
                    delays[u] = float(val)
            except ValueError:
                pass
        # other directives (sitemap etc.): group continues

    def pick() -> str | None:
        # RFC 9309 §2.2.1: once a specific-agent group exists it is
        # selected even when it holds ZERO rules — an empty matching
        # group means allow-all for that agent, NOT fall through to
        # the ``*`` group (which might disallow everything).
        if agent in groups:
            return agent
        best = ""
        for ua in groups:
            if ua != "*" and ua in agent and len(ua) > len(best):
                best = ua
        return best or ("*" if "*" in groups else None)

    chosen = pick()
    if chosen is None:
        return [], None
    return groups.get(chosen, []), delays.get(chosen)


def _parse_one(text: str, agent: str) -> list[tuple[str, bool]]:
    return _walk_groups(text, agent)[0]


def parse_robots(
    table: Table,
    text_col: str,
    domain_col: str = "domain",
    agent: str = "*",
) -> Table:
    """One robots.txt per row → the rules table for ``agent``:
    ``(domain, path_pattern, allow, rule_len, like_pattern)``."""
    schema = (
        f"{domain_col} string, path_pattern string, allow boolean, "
        "rule_len int, like_pattern string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for dom, text in zip(pdf[domain_col], pdf[text_col]):
                for rule, allow in _parse_one(str(text or ""), agent):
                    rows.append(
                        (dom, rule, allow, len(rule), robots_like_pattern(rule))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    domain_col, "path_pattern", "allow", "rule_len",
                    "like_pattern",
                ],
            )

    out = (
        table._require_df()
        .select(domain_col, text_col)
        .mapInPandas(run, schema)
    )
    return Table.from_df(out, name=f"{table.table_name}_robots_rules")


def robots_crawl_delays(
    table: Table,
    text_col: str,
    domain_col: str = "domain",
    agent: str = "*",
    default_delay: float = 1.0,
) -> Table:
    """Per-domain ``Crawl-delay`` (seconds) for ``agent`` — the fetch
    SCHEDULING input (non-standard but widely honored): one row per
    domain, ``default_delay`` where robots.txt names none. Group
    selection matches ``parse_robots``. Compose with per-domain
    quotas: a domain's sustainable crawl budget over a window is
    ``window / crawl_delay`` pages."""
    schema = f"{domain_col} string, crawl_delay double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for dom, text in zip(pdf[domain_col], pdf[text_col]):
                _, delay = _walk_groups(str(text or ""), agent)
                rows.append(
                    (dom, float(default_delay) if delay is None else delay)
                )
            yield pd.DataFrame(rows, columns=[domain_col, "crawl_delay"])

    out = (
        table._require_df()
        .select(domain_col, text_col)
        .mapInPandas(run, schema)
    )
    return Table.from_df(out, name=f"{table.table_name}_crawl_delays")


def robots_sitemaps(
    table: Table,
    text_col: str,
    domain_col: str = "domain",
) -> Table:
    """``Sitemap:`` directives from robots.txt blobs — the discovery
    hand-off: feed the resulting ``(domain, sitemap_url)`` rows to the
    fetcher, then the fetched blobs to ``sitemap_entries``. Sitemap
    lines are group-independent per RFC 9309 (they apply regardless of
    user agent), so this is a stateless line scan — still an Arrow
    pass for symmetry with ``parse_robots`` (one blob → few rows)."""
    schema = f"{domain_col} string, sitemap_url string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for dom, text in zip(pdf[domain_col], pdf[text_col]):
                for raw in str(text or "").splitlines():
                    line = raw.split("#", 1)[0].strip()
                    key, _, val = line.partition(":")
                    if key.strip().lower() == "sitemap":
                        url = val.strip()
                        if url.startswith(("http://", "https://")):
                            rows.append((dom, url))
            yield pd.DataFrame(rows, columns=[domain_col, "sitemap_url"])

    out = (
        table._require_df()
        .select(domain_col, text_col)
        .mapInPandas(run, schema)
    )
    return Table.from_df(out, name=f"{table.table_name}_sitemaps")


def filter_by_robots(
    table: Table,
    rules: Table,
    url_col: str = "url",
    keep_unlisted: bool = True,
) -> Table:
    """Keep rows whose URL the robots rules allow. Longest matching
    rule wins; ``Allow`` wins length ties; a LISTED domain with no
    matching rule keeps the row (RFC 9309: no rule = allowed); a
    domain with no robots entry at all keeps the row only when
    ``keep_unlisted`` (set False for strict known-sites-only crawls).
    Domain match is subdomain-safe: rules for ``site.com`` govern
    ``www.site.com`` but never ``notsite.com``. Rules match against
    the URL's path-and-query (RFC 9309), never the fragment.

    Plan shape: the host explodes into its label-suffix chain so the
    rules join is PURE EQUALITY on domain — a hash join that scales
    with matched (url, rule) pairs, not corpus × rules. The verdict
    per URL is one map-combined ``max(struct(rule_len, allow))``
    groupBy keyed on the CONTENT pair ``(host, path-and-query)`` —
    the verdict is a pure function of that pair, so every key is
    deterministic row content, both branches of the plan compute
    identical keys under any upstream shuffle/retry order, and the
    join back to the corpus gives each duplicate row its verdict
    without deduping (filters must never dedup; identical URLs get
    the identical verdict by definition). No synthesized ordinal is
    involved, so the Table's own ``__row_ord__`` order column passes
    through untouched. The same aggregation's group EXISTENCE is the
    listed-domain probe (no second join)."""
    df = table._require_df()
    url = F.coalesce(F.col(url_col), F.lit(""))
    host = host_of(url)  # shared chain: userinfo/port/IPv6-brackets
    raw_pq = F.regexp_extract(url, _PATHQ_RE, 1)
    pathq = F.when(raw_pq == F.lit(""), F.lit("/")).otherwise(raw_pq)
    work = df.withColumn("__host__", host).withColumn("__path__", pathq)
    rdf = rules._require_df().select(
        F.lower(F.col(rules.fields[0])).alias("__rdom__"),
        F.col("allow").alias("__allow__"),
        F.col("rule_len").alias("__rlen__"),
        F.col("like_pattern").alias("__rlike__"),
    )

    # www.a.co.uk → [www.a.co.uk, a.co.uk, co.uk]: every label-boundary
    # suffix; equality on a suffix IS the subdomain-or-exact match, so
    # no endswith/OR condition survives into the join.
    suffixes = F.expr(
        "transform(sequence(1, size(split(__host__, '\\\\.'))), "
        "i -> array_join(slice(split(__host__, '\\\\.'), i, "
        "size(split(__host__, '\\\\.'))), '.'))"
    )
    sufs = work.select(
        "__host__", "__path__", F.explode(suffixes).alias("__hsuf__")
    )
    matches = sufs.join(rdf, F.col("__hsuf__") == F.col("__rdom__"), "inner")
    # Group existence ⇒ the domain is listed; __best__ is null when no
    # rule's LIKE pattern matched the path-and-query (listed-no-match
    # ⇒ allowed). max(struct) orders by rule_len first, then allow
    # (true > false): longest rule wins, Allow wins ties. Duplicate
    # URLs collapse map-side here (max/count are duplicate-idempotent
    # for the existence test), so a hot URL never hot-keys the fold.
    verdicts = matches.groupBy("__host__", "__path__").agg(
        F.max(
            F.when(
                F.like(F.col("__path__"), F.col("__rlike__"), F.lit("\\")),
                F.struct(F.col("__rlen__"), F.col("__allow__")),
            )
        ).alias("__best__"),
        F.count(F.lit(1)).alias("__nlisted__"),
    )
    joined = work.join(verdicts, ["__host__", "__path__"], "left")
    keep = F.when(
        F.col("__best__").isNotNull(), F.col("__best__").getField("__allow__")
    ).otherwise(
        F.when(F.col("__nlisted__").isNotNull(), F.lit(True)).otherwise(
            F.lit(bool(keep_unlisted))
        )
    )
    out = joined.where(keep).drop(
        "__host__", "__path__", "__best__", "__nlisted__"
    )
    return table._derive(out)


def schedule_fetches(
    table: Table,
    delays: Table | None = None,
    url_col: str = "url",
    domain_col: str = "domain",
    delay_col: str = "crawl_delay",
    priority_col: str | None = None,
    default_delay: float = 1.0,
    out_col: str = "fetch_at",
) -> Table:
    """Per-host politeness schedule — the fetch-ORDERING hand-off that
    closes the crawl loop (sitemaps/WARC → canonicalize → dedup →
    robots filter → THIS → fetcher): order each host's URLs (by
    ``priority_col`` descending when given, then URL) and space them
    ``crawl_delay`` seconds apart. ``out_col`` is the per-row offset in
    seconds from crawl start at which the URL may be fetched without
    violating its host's Crawl-delay; a fetcher fleet keyed on host can
    dispatch row-at-``fetch_at`` independently per host. Compose with
    ``parse_robots``/``robots_crawl_delays`` for the delays table;
    hosts absent from it use ``default_delay``. Crawl-delay is an
    origin-host property (each host serves its own robots.txt), so the
    delays join is EXACT host equality — no suffix chain needed here.

    Plan shape: one broadcast-able equi-join on host + ONE keyed window
    (per host — never a global sort); at web scale the window's
    partition key is the host, whose fan-in is the per-site page count,
    not the corpus.
    """
    from pyspark.sql import Window

    df = table._require_df()
    url = F.coalesce(F.col(url_col), F.lit(""))
    host = host_of(url)  # shared chain: userinfo/port/IPv6-brackets
    work = df.withColumn("__host__", host)
    if delays is not None:
        ddf = delays._require_df().select(
            F.lower(F.col(domain_col)).alias("__ddom__"),
            F.col(delay_col).cast("double").alias("__delay__"),
        )
        work = work.join(
            ddf, F.col("__host__") == F.col("__ddom__"), "left"
        ).drop("__ddom__")
    else:
        work = work.withColumn("__delay__", F.lit(None).cast("double"))
    delay = F.coalesce(F.col("__delay__"), F.lit(float(default_delay)))
    fields = table.fields
    order = []
    if priority_col:
        order.append(F.desc_nulls_last(priority_col))
    order.append(F.col(url_col))
    # total-order discipline: tiebreak rows tied on (priority, url) by
    # TWO independent 8-byte xxhash64 keys over the remaining columns
    # (the second hashes the struct with a shifted seed column and
    # reversed field order), not the raw columns themselves — a
    # frontier carrying wide payloads (page text, HTML) must never
    # feed whole blobs into the window's sort key. Fully identical
    # rows hash identically under both and stay interchangeable (they
    # swap slots within the same fetch_at set), so the output multiset
    # is run-stable; two distinct rows would need a simultaneous
    # 64+64-bit collision to get run-dependent slots (round 13,
    # closing the r12 single-hash collision nit). xxhash64 rejects map
    # types at ANY nesting depth (array<map<...>>, struct with a map
    # field), so any column whose type mentions map is skipped.
    dtypes = dict(df.dtypes)
    rest = [
        c
        for c in fields
        if c not in (url_col, priority_col) and "map<" not in dtypes.get(c, "")
    ]
    if rest:
        # F.struct resolves plain names JVM-side — saves a py4j round
        # trip per column on this per-call builder
        order.append(F.xxhash64(F.struct(*rest)))
        order.append(
            F.xxhash64(
                F.lit(0x9E3779B9), F.struct(*list(reversed(rest)))
            )
        )
    w = Window.partitionBy("__host__").orderBy(*order)
    out = work.select(
        *fields,
        ((F.row_number().over(w) - 1) * delay).alias(out_col),
    )
    return table._derive(out)
