"""robots.txt (RFC 9309) parsing and URL filtering — crawl politeness
as data-pipeline operators.

A compliant crawl pipeline must drop URLs a site's robots.txt
disallows for its user agent. Two operators:

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
  Fully native: derive (domain, path) with the urlops regexes,
  broadcast-join the rules on domain, match via SQL ``LIKE`` (the
  ``like_pattern`` column is the rule translated at parse time:
  ``*`` → ``%``, ``$`` → anchored end — identical semantics in Spark
  and DuckDB, so the filter is oracle-checkable), then pick the
  winning rule per URL with one window: longest rule wins, ``Allow``
  wins ties (RFC 9309 §2.2.2). URLs on domains with no rules are
  kept (or dropped with ``keep_unlisted=False`` for strict-allowlist
  crawls).

Scale shape: rules are list-sized (one site's robots.txt) →
broadcast; the only shuffle is the per-row window on ``id_col``.
No reference analog; net-new crawl capability like urlops/warc_io.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..table import Table
from .urlops import _HOST_RE, _PATH_RE

__all__ = [
    "parse_robots",
    "filter_by_robots",
    "robots_sitemaps",
    "robots_crawl_delays",
    "robots_like_pattern",
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
        if agent in groups and (groups[agent] or agent in delays):
            return agent
        best = ""
        for ua in groups:
            if (
                ua != "*"
                and ua in agent
                and len(ua) > len(best)
                and (groups[ua] or ua in delays)
            ):
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
    ``www.site.com`` but never ``notsite.com``.

    Row identity for the winning-rule window is a synthesized
    per-row ordinal (``monotonically_increasing_id`` computed BEFORE
    the rules join), so the input needs no unique key and duplicate
    rows keep their multiplicity — filters must never dedup."""
    df = table._require_df()
    url = F.coalesce(F.col(url_col), F.lit(""))
    authority = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]*)", 1)
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == F.lit(""), F.lit("/")).otherwise(raw_path)
    work = (
        df.withColumn("__row_ord__", F.monotonically_increasing_id())
        .withColumn("__host__", host)
        .withColumn("__path__", path)
    )
    rdf = rules._require_df().select(
        F.lower(F.col(rules.fields[0])).alias("__rdom__"),
        F.col("allow").alias("__allow__"),
        F.col("rule_len").alias("__rlen__"),
        F.col("like_pattern").alias("__rlike__"),
    )

    def dom_match(rdom: F.Column) -> F.Column:
        return (F.col("__host__") == rdom) | F.col("__host__").endswith(
            F.concat(F.lit("."), rdom)
        )

    listed = rdf.select("__rdom__").distinct().withColumn(
        "__listed__", F.lit(True)
    )
    work = work.join(
        F.broadcast(listed), dom_match(F.col("__rdom__")), "left"
    ).drop("__rdom__")
    joined = work.join(
        F.broadcast(rdf),
        dom_match(F.col("__rdom__"))
        & F.like(F.col("__path__"), F.col("__rlike__"), F.lit("\\")),
        "left",
    )
    w = Window.partitionBy("__row_ord__").orderBy(
        F.desc_nulls_last("__rlen__"),
        F.desc_nulls_last("__allow__"),
    )
    ranked = joined.withColumn("__rn__", F.row_number().over(w)).where(
        F.col("__rn__") == 1
    )
    keep = F.when(F.col("__rlen__").isNotNull(), F.col("__allow__")).otherwise(
        F.when(F.col("__listed__").isNotNull(), F.lit(True)).otherwise(
            F.lit(bool(keep_unlisted))
        )
    )
    out = ranked.where(keep).drop(
        "__row_ord__", "__host__", "__path__", "__rdom__", "__allow__",
        "__rlen__", "__rlike__", "__rn__", "__listed__",
    )
    return table._derive(out)
