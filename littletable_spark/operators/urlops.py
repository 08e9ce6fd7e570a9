"""URL curation features — the per-domain half of crawl curation.

Web-crawl pipelines filter and budget by URL structure before they
ever read the page: per-domain quotas (a few hosts dominate any
crawl), blocklists, TLD and path-shape heuristics. ``warc_import``
gives every record a ``url``; this module turns it into curation
columns, all with native ``regexp_extract``/array expressions — the
SAME regexes run in Java regex and RE2, so every feature is
oracle-checkable in DuckDB (deliberately NOT Spark's ``parse_url``,
which DuckDB cannot replay).

- ``url_features``: host, registrable domain (last two labels — the
  practical heuristic; a full public-suffix list is a data file, not
  an algorithm), tld, path depth, query-param count, is_ip.
- ``filter_url_blocklist``: drop rows whose domain is on a blocklist —
  a broadcast anti-join for Table-sized lists, an ``isin`` for small
  literal lists.
- per-domain caps: compose with ``sampling.cap_per_group`` on the
  ``domain`` column (already quota-aware and token-weighted).

No reference analog; net-new pipeline capability like dedup/textops.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..table import Table

__all__ = ["url_features", "filter_url_blocklist"]

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_features(table: Table, url_col: str = "url") -> Table:
    """Add ``host``, ``domain``, ``tld``, ``path_depth``, ``n_params``,
    ``is_ip`` columns derived from ``url_col``. Pure narrow projection
    (no UDF, no shuffle); unparseable/relative URLs yield empty host
    and zero counts rather than failing the job."""
    taken = {"host", "domain", "tld", "path_depth", "n_params", "is_ip"}
    clash = sorted(taken & set(table.fields))
    if clash:
        raise ValueError(
            f"url_features would overwrite existing column(s) {clash}; "
            "rename them first"
        )
    url = F.coalesce(F.col(url_col), F.lit(""))
    authority = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    # strip userinfo and port: host is what's between '@' and ':'
    host = F.regexp_extract(authority, r"^(?:[^@]*@)?([^:]*)", 1)
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    domain = F.when(is_ip, host).otherwise(
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    )
    tld = F.when(is_ip, F.lit("")).otherwise(
        F.regexp_extract(host, r"\.([A-Za-z0-9-]+)$", 1)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path_depth = F.size(
        F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    )
    query = F.regexp_extract(url, _QUERY_RE, 1)
    n_params = F.when(query == F.lit(""), F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    out = table._require_df().withColumns(
        {
            "host": host,
            "domain": domain,
            "tld": tld,
            "path_depth": path_depth,
            "n_params": n_params,
            "is_ip": is_ip,
        }
    )
    return table._derive(out)


def filter_url_blocklist(
    table: Table,
    blocked,
    url_col: str = "url",
    domain_col: str | None = None,
) -> Table:
    """Drop rows whose registrable domain is blocklisted.

    ``blocked`` is a Table with a ``domain`` column (broadcast
    LEFT ANTI join — the blocklist is list-sized, the crawl is not) or
    a Python iterable of domains (compiled to one ``isin`` predicate,
    pushed to the scan). When ``domain_col`` is None the domain is
    derived from ``url_col`` via ``url_features``' expression."""
    if domain_col is None:
        t = url_features(table, url_col)
        domain_col = "domain"
        df = t._require_df()
        added = ["host", "domain", "tld", "path_depth", "n_params", "is_ip"]
    else:
        df = table._require_df()
        added = []
    if isinstance(blocked, Table):
        bdf = blocked._require_df().select(
            F.col("domain").alias("__blocked__")
        )
        out = df.join(
            F.broadcast(bdf),
            df[domain_col] == F.col("__blocked__"),
            "left_anti",
        )
    else:
        blocked = [str(b).lower() for b in blocked]
        out = df.where(~F.col(domain_col).isin(blocked))
    if added:
        out = out.drop(*added)
    return table._derive(out)
