"""URL curation features — the per-domain half of crawl curation.

Web-crawl pipelines filter and budget by URL structure before they
ever read the page: per-domain quotas (a few hosts dominate any
crawl), blocklists, TLD and path-shape heuristics. ``warc_import``
gives every record a ``url``; this module turns it into curation
columns, all with native ``regexp_extract``/array expressions — the
SAME regexes run in Java regex and RE2, so every feature is
oracle-checkable in DuckDB (deliberately NOT Spark's ``parse_url``,
which DuckDB cannot replay).

- ``url_features``: host, registrable domain, tld, path depth,
  query-param count, is_ip. The registrable domain respects two-level
  public suffixes (``bbc.co.uk`` → ``bbc.co.uk``, not ``co.uk``):
  by default an embedded snapshot of the common ccTLD second-level
  registries (public data from publicsuffix.org) is consulted; pass
  ``psl=`` (a Table with a ``suffix`` column, or an iterable) to
  supply the full public-suffix list as data. This matters because
  the feature's two consumers break without it: ``cap_per_group``
  on ``domain`` would pool every ``*.co.uk`` site into ONE quota
  bucket, and a blocklist entry could not name a single British site
  without blocking the whole registry.
- ``filter_url_blocklist``: drop rows whose domain is on a blocklist —
  a broadcast anti-join for Table-sized lists, an ``isin`` for small
  literal lists.
- per-domain caps: compose with ``sampling.cap_per_group`` on the
  ``domain`` column (already quota-aware and token-weighted).

No reference analog; net-new pipeline capability like dedup/textops.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import functions as F

from ..table import Table

__all__ = [
    "extract_links",
    "extract_canonical",
    "url_features",
    "filter_url_blocklist",
    "canonicalize_urls",
    "dedup_urls",
    "COMMON_TWO_LEVEL_SUFFIXES",
    "TRACKING_PARAM_RE",
]

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
# ONE definition of "host of a URL" for the whole URL family —
# url_features / canonicalize_urls / filter_by_robots /
# schedule_fetches consume these builders, and the DuckDB oracle
# generators compose the SQL twins (``host_sql``), so the engines
# cannot drift. Bracketed-IPv6 authorities (RFC 3986 §3.2.2,
# ``http://[2001:db8::1]:8080/``) yield host = the bracket contents
# and port = the digits after ``]:``; every regex is RE2-safe (no
# lookaround, no backrefs) so Spark's Java regex and DuckDB agree.
_HOSTPORT_RE = r"^(?:[^@]*@)?(.*)$"  # strip userinfo
_HOST_TOKEN_RE = r"^(\[[^\]]*\]|[^:]*)"  # bracketed IPv6 | up-to-colon
_BRACKETS_RE = r"^\[|\]$"
_PORT_RE = r"^(?:\[[^\]]*\]|[^:]*):([0-9]+)$"


def hostport_of(url: F.Column) -> F.Column:
    """Lowercased authority of a URL column, userinfo stripped."""
    authority = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.regexp_extract(authority, _HOSTPORT_RE, 1)


def host_token_of(hostport: F.Column) -> F.Column:
    """Host part of a ``hostport_of`` value with IPv6 brackets KEPT
    (``[2001:db8::1]``) — the form a canonical URL re-embeds."""
    return F.regexp_extract(hostport, _HOST_TOKEN_RE, 1)


def host_of(url: F.Column) -> F.Column:
    """THE host of a URL column: lowercased, userinfo and port
    stripped, bracketed-IPv6 authorities yield the bracket contents."""
    return F.regexp_replace(
        host_token_of(hostport_of(url)), _BRACKETS_RE, ""
    )


def port_of(hostport: F.Column) -> F.Column:
    """Explicit port of a ``hostport_of`` value ('' when absent) —
    bracket-aware, so an IPv6 address's colons never read as a port."""
    return F.regexp_extract(hostport, _PORT_RE, 1)


def hostport_sql(url_expr: str) -> str:
    """DuckDB SQL text computing ``hostport_of(url_expr)``."""
    return (
        f"regexp_extract(lower(regexp_extract({url_expr}, "
        f"'{_HOST_RE}', 1)), '{_HOSTPORT_RE}', 1)"
    )


def host_sql(url_expr: str) -> str:
    """DuckDB SQL text computing exactly ``host_of(url_expr)``."""
    token = (
        f"regexp_extract({hostport_sql(url_expr)}, '{_HOST_TOKEN_RE}', 1)"
    )
    return f"regexp_replace({token}, '{_BRACKETS_RE}', '', 'g')"
# The query is extracted from the PRE-FRAGMENT substring so a '?'
# inside the fragment never reads as a query ('http://a/p#f?x' has no
# query). Two linear extracts — a single lazy-prefix regex
# ('^[^#]*?\?...') backtracks quadratically on long query-less URLs.
_PREFRAG_RE = r"^([^#]*)"


def _query_of(url):
    return F.regexp_extract(
        F.regexp_extract(url, _PREFRAG_RE, 1), r"\?(.*)$", 1
    )

# Embedded snapshot of the most common two-level public suffixes —
# the ccTLD second-level registries under which sites register
# directly (public data: publicsuffix.org). NOT the full list (that
# is a data file callers pass via ``psl=``); this default covers the
# registries that actually dominate crawls. Three-or-more-level
# suffixes (e.g. city-level .jp) are out of the default's scope.
COMMON_TWO_LEVEL_SUFFIXES = (
    # United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    # Japan / Korea / Taiwan / Hong Kong / Singapore
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    # China / India / Indonesia / Thailand / Malaysia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id",
    "co.th", "ac.th", "go.th", "or.th", "in.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    "com.pe", "com.ve", "com.ec", "com.uy",
    # Africa / Middle East / Europe ccSLDs
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "co.ke", "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.eg", "com.sa", "com.ng", "com.gh",
    # South / Southeast Asia remainder
    "com.ph", "com.vn", "com.pk", "com.bd", "com.np", "com.lk",
)

_FEATURE_COLS = ("host", "domain", "tld", "path_depth", "n_params", "is_ip")


def url_features(table: Table, url_col: str = "url", psl=None) -> Table:
    """Add ``host``, ``domain``, ``tld``, ``path_depth``, ``n_params``,
    ``is_ip`` columns derived from ``url_col``.

    ``domain`` is the registrable domain: the last two host labels,
    or the last THREE when the last two are a public suffix —
    ``COMMON_TWO_LEVEL_SUFFIXES`` by default, or the suffixes in
    ``psl`` (a Table with a ``suffix`` column → broadcast left join;
    an iterable → compiled into the predicate). With the default /
    iterable form this stays a pure narrow projection (no UDF, no
    shuffle, no join); the Table form adds one broadcast join.
    Unparseable/relative URLs yield empty host and zero counts rather
    than failing the job. Bracketed-IPv6 authorities parse like IPv4
    literals: ``host`` is the bracket contents, ``is_ip`` is true,
    ``domain`` = host, ``tld`` = ''."""
    taken = set(_FEATURE_COLS)
    clash = sorted(taken & set(table.fields))
    if clash:
        raise ValueError(
            f"url_features would overwrite existing column(s) {clash}; "
            "rename them first"
        )
    df = table._require_df()
    fields = table.fields
    if not isinstance(psl, Table):
        suffixes = (
            tuple(COMMON_TWO_LEVEL_SUFFIXES)
            if psl is None
            else tuple(str(s).lower() for s in psl)
        )
        out = df.withColumns(_url_feature_cols(url_col, suffixes))
        return table._derive(out)

    url = F.coalesce(F.col(url_col), F.lit(""))
    # shared host chain (userinfo/port stripped, IPv6 brackets removed)
    host = host_of(url)
    # dotted-quad IPv4, or IPv6 (a colon can only appear in a host via
    # a bracketed-IPv6 authority — plain hosts lose theirs to the port)
    is_ip = host.rlike(
        r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
    ) | host.contains(":")
    sfx2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    sfx3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    tld = F.when(is_ip, F.lit("")).otherwise(
        F.regexp_extract(host, r"\.([A-Za-z0-9-]+)$", 1)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path_depth = F.size(
        F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    )
    query = _query_of(url)
    n_params = F.when(query == F.lit(""), F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )

    def _domain(on_suffix) -> F.Column:
        return F.when(is_ip, host).otherwise(
            F.when(on_suffix & (sfx3 != F.lit("")), sfx3).otherwise(sfx2)
        )

    if isinstance(psl, Table):
        pdf = (
            psl._require_df()
            .select(F.lower(F.col("suffix")).alias("__psl_suffix__"))
            .distinct()
        )
        joined = df.join(
            F.broadcast(pdf), sfx2 == F.col("__psl_suffix__"), "left"
        )
        domain = _domain(F.col("__psl_suffix__").isNotNull())
        out = joined.select(
            *fields,
            host.alias("host"),
            domain.alias("domain"),
            tld.alias("tld"),
            path_depth.alias("path_depth"),
            n_params.alias("n_params"),
            is_ip.alias("is_ip"),
        )
    return table._derive(out)


@lru_cache(maxsize=32)
def _url_feature_cols(url_col: str, suffixes: tuple) -> dict:
    """``url_features``' input-independent Column map for the
    default/iterable-psl path, built once per (url_col, suffix-list)
    shape (see _links_packed_expr). The Table-psl path stays inline —
    its broadcast join references a caller-provided frame."""
    url = F.coalesce(F.col(url_col), F.lit(""))
    host = host_of(url)
    is_ip = host.rlike(
        r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
    ) | host.contains(":")
    sfx2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    sfx3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    tld = F.when(is_ip, F.lit("")).otherwise(
        F.regexp_extract(host, r"\.([A-Za-z0-9-]+)$", 1)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path_depth = F.size(
        F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    )
    query = _query_of(url)
    n_params = F.when(query == F.lit(""), F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    on_suffix = sfx2.isin(list(suffixes)) if suffixes else F.lit(False)
    domain = F.when(is_ip, host).otherwise(
        F.when(on_suffix & (sfx3 != F.lit("")), sfx3).otherwise(sfx2)
    )
    return {
        "host": host,
        "domain": domain,
        "tld": tld,
        "path_depth": path_depth,
        "n_params": n_params,
        "is_ip": is_ip,
    }


# query parameters that never change page content (analytics /
# click-tracking) — dropped during canonicalization so the same page
# reached via different campaigns dedups to ONE frontier key.
# Engine-portable regex (no lookaround): anchored full-param match.
TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|gclid|dclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src"
    r"|_ga|yclid|wbraid|gbraid)(=.*)?$"
)


def canonicalize_urls(
    table: Table,
    url_col: str = "url",
    out_col: str = "canon_url",
    drop_tracking_params: bool = True,
) -> Table:
    """Add ``out_col``: the canonical form of ``url_col`` — THE dedup /
    crawl-frontier key (the same page reached via different casings,
    default ports, fragments, tracking params, or query-param orders
    must collapse to one key before URL-level dedup or per-URL quotas
    mean anything).

    Normalizations (all engine-portable native expressions — one
    narrow projection, no UDF, no shuffle; oracle-checkable in DuckDB
    with the same regexes):

    - scheme and host lowercased; userinfo (``user:pw@``) dropped
    - default ports stripped (``:80`` for http, ``:443`` for https);
      other ports kept — bracket-aware, so an IPv6 address's colons
      never read as a port and the brackets survive in the canonical
      form (``http://[2001:db8::1]/``)
    - fragment (``#...``) dropped
    - empty path becomes ``/``
    - query params: empty params dropped, tracking params
      (``TRACKING_PARAM_RE``: utm_*, gclid, fbclid, ...) dropped when
      ``drop_tracking_params``, the rest SORTED (byte order —
      identical in Spark and DuckDB); an emptied query drops its ``?``

    Rows whose URL has no scheme or host canonicalize to NULL (count
    them downstream for the audit trail; junk never fails the job).
    """
    if out_col in table.fields:
        raise ValueError(
            f"canonicalize_urls would overwrite existing column {out_col!r}; "
            "pass a different out_col"
        )
    canon = _canon_url_expr(url_col, bool(drop_tracking_params))
    out = table._require_df().withColumn(out_col, canon)
    return table._derive(out)


@lru_cache(maxsize=32)
def _canon_url_expr(url_col: str, drop_tracking_params: bool):
    """``canonicalize_urls``' input-independent Column tree, built once
    per (url_col, drop_tracking_params) shape (see
    _links_packed_expr)."""
    url = F.coalesce(F.col(url_col), F.lit(""))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = hostport_of(url)
    host_token = host_token_of(hostport)  # IPv6 brackets kept
    host = F.regexp_replace(host_token, _BRACKETS_RE, "")
    port = port_of(hostport)
    default_port = (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    ) | ((scheme == F.lit("https")) & (port == F.lit("443")))
    port_part = F.when(
        (port == F.lit("")) | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == F.lit(""), F.lit("/")).otherwise(raw_path)
    query = _query_of(url)
    keep = F.filter(
        F.split(query, "&"),
        (lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE))
        if drop_tracking_params
        else (lambda p: p != F.lit("")),
    )
    query_part = F.when(F.size(keep) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(keep), "&"))
    )
    return F.when(
        (scheme == F.lit("")) | (host == F.lit("")), F.lit(None).cast("string")
    ).otherwise(
        F.concat(scheme, F.lit("://"), host_token, port_part, path, query_part)
    )


def dedup_urls(
    table: Table,
    url_col: str = "url",
    order_col: str | None = None,
    drop_tracking_params: bool = True,
) -> Table:
    """Keep ONE row per canonical URL — the frontier-dedup pass: the
    same page reached via different casings, ports, fragments,
    tracking params, or query-param orders survives once.

    The kept row is the one with the smallest ``order_col`` value
    (``url_col`` itself by default — a deterministic, engine-portable
    tiebreak). Rows whose URL does not canonicalize (junk/NULL) are
    all kept: they carry no frontier key to collide on. One narrow
    projection + one hash shuffle on the canonical key."""
    canon = canonicalize_urls(
        table, url_col, out_col="__canon__",
        drop_tracking_params=drop_tracking_params,
    )
    from pyspark.sql import Window

    df = canon._require_df()
    order = F.col(order_col) if order_col else F.col(url_col)
    w = Window.partitionBy("__canon__").orderBy(order)
    out = (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__canon__").isNull() | (F.col("__rn__") == 1))
        .drop("__canon__", "__rn__")
    )
    return table._derive(out)


def filter_url_blocklist(
    table: Table,
    blocked,
    url_col: str = "url",
    domain_col: str | None = None,
    psl=None,
) -> Table:
    """Drop rows whose registrable domain is blocklisted.

    ``blocked`` is a Table with a ``domain`` column (broadcast
    LEFT ANTI join — the blocklist is list-sized, the crawl is not) or
    a Python iterable of domains (compiled to one ``isin`` predicate,
    pushed to the scan). When ``domain_col`` is None the domain is
    derived from ``url_col`` via ``url_features`` (``psl`` passes
    through), so a blocklist entry like ``bbc.co.uk`` blocks exactly
    that site, not the whole ``co.uk`` registry."""
    if domain_col is None:
        t = url_features(table, url_col, psl=psl)
        domain_col = "domain"
        df = t._require_df()
        added = list(_FEATURE_COLS)
    else:
        df = table._require_df()
        added = []
    if isinstance(blocked, Table):
        # lower() mirrors the iterable path: blocklist rows with mixed
        # case must still match url_features' lowercased domain
        bdf = blocked._require_df().select(
            F.lower(F.col("domain")).alias("__blocked__")
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


# href values in double or single quotes; unquoted hrefs (rare,
# malformed-leaning) are out of scope. Non-greedy attr scan, (?i) —
# identical semantics in java.util.regex (Spark) and RE2 (DuckDB).
_HREF_DQ_RE = r'(?i)<a\s[^>]*?href\s*=\s*"([^"]*)"'
_HREF_SQ_RE = r"(?i)<a\s[^>]*?href\s*=\s*'([^']*)'"
_AREA_DQ_RE = r'(?i)<area\s[^>]*?href\s*=\s*"([^"]*)"'
_AREA_SQ_RE = r"(?i)<area\s[^>]*?href\s*=\s*'([^']*)'"
_BASE_DQ_RE = r'(?i)<base\s[^>]*?href\s*=\s*"([^"]*)"'
_BASE_SQ_RE = r"(?i)<base\s[^>]*?href\s*=\s*'([^']*)'"
# <link rel=canonical href=...> in both attribute orders and both
# quote styles — four alternations instead of lookahead, so the SAME
# patterns run under Java regex (Spark) and RE2 (DuckDB oracle)
_CANON_RF_DQ = r'(?i)<link\s[^>]*rel\s*=\s*["\x27]?canonical[^>]*href\s*=\s*"([^"]*)"'
_CANON_RF_SQ = r"(?i)<link\s[^>]*rel\s*=\s*[\"\x27]?canonical[^>]*href\s*=\s*'([^']*)'"
_CANON_HF_DQ = r'(?i)<link\s[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*["\x27]?canonical'
_CANON_HF_SQ = r"(?i)<link\s[^>]*href\s*=\s*'([^']*)'[^>]*rel\s*=\s*[\"\x27]?canonical"
# a path segment that is NOT '.' or '..' followed by '/../' — RE2 has
# no lookahead, so spell out "has a non-dot char or 3+ chars":
_DOTDOT_RE = r"/([^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)/\.\.(/|$)"
_DOT_SEG_ITERS = 6


def _normalize_dot_segments(col: F.Column) -> F.Column:
    """Bounded RFC 3986 dot-segment removal on a path(+query) column:
    '/./' collapses, up to ``_DOT_SEG_ITERS`` levels of '/seg/../'
    unwind (crawl URLs deeper than that are pathological), leading
    '/../' clamps to '/'. Pure chained regexp_replace — identical
    passes are generated into the DuckDB oracle."""
    for _ in range(2):
        col = F.regexp_replace(col, r"/\.(/|$)", "/")
    for _ in range(_DOT_SEG_ITERS):
        col = F.regexp_replace(col, _DOTDOT_RE, "/")
        col = F.regexp_replace(col, r"^/\.\.(/|$)", "/")
    return col


def _earliest_match(html, pats):
    """Group-1 of whichever pattern's first match occurs EARLIEST in
    the document (full-match position via instr — the regex's leftmost
    match IS the matched text's first occurrence, so instr equals the
    match offset; ties break on the match text then the href, all
    deterministic and engine-portable). NULL when nothing matches.
    Round-13 ADVICE fix: pattern ORDER (double-quote-first) no longer
    overrides document order when both quote styles appear."""
    entries = F.array(
        *[
            F.struct(
                F.regexp_extract(html, p, 0).alias("m"),
                F.regexp_extract(html, p, 1).alias("href"),
            )
            for p in pats
        ]
    )
    positioned = F.transform(
        entries,
        lambda x: F.struct(
            F.instr(html, x["m"]).alias("pos"),
            x["m"].alias("m"),
            x["href"].alias("href"),
        ),
    )
    valid = F.filter(positioned, lambda x: x["m"] != F.lit(""))
    return F.get(F.array_sort(valid), F.lit(0))["href"]


def _effective_base(html, base):
    """The page's effective base URL: the first ``<base href>`` in
    DOCUMENT order across both quote styles (fragment stripped),
    resolved against the document URL; any explicit scheme passes
    through untouched (non-http bases then drop their links at the
    final scheme filter rather than producing junk concatenations);
    no ``<base>`` → the document URL."""
    bref = F.regexp_extract(
        F.coalesce(
            _earliest_match(html, (_BASE_DQ_RE, _BASE_SQ_RE)), F.lit("")
        ),
        r"^([^#]*)",
        1,
    )
    d_scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    d_auth = F.regexp_extract(base, _HOST_RE, 1)
    d_path = F.regexp_extract(base, _PATH_RE, 1)
    d_dir = F.regexp_replace(
        F.when(d_path == F.lit(""), F.lit("/")).otherwise(d_path),
        r"[^/]*$",
        "",
    )
    return (
        F.when(bref == F.lit(""), base)
        .when(bref.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), bref)
        .when(bref.startswith("//"), F.concat(d_scheme, F.lit(":"), bref))
        .when(
            bref.startswith("/"),
            F.concat(d_scheme, F.lit("://"), d_auth, bref),
        )
        .otherwise(F.concat(d_scheme, F.lit("://"), d_auth, d_dir, bref))
    )


def _resolve_ref(raw_col, base_col):
    """RFC 3986 §5 reference resolution as a native CASE: ``raw_col``
    (an href, fragment NOT yet stripped) resolved against ``base_col``
    (an absolute URL). Absolute http(s) kept, other schemes → NULL,
    scheme-relative ``//``, root-relative ``/``, query-only ``?``
    (keeps the FULL base path per §5.3), relative paths via the base
    directory; bounded dot-segment normalization; fragments stripped.

    Expression-size discipline: the bounded dot-segment chain (14
    chained regexp_replace calls) appears ONCE, applied to a merged
    "path to normalize" CASE (root-relative raw | base-dir + relative
    raw), with the no-normalization forms (absolute, scheme-relative,
    query-only) folded in via coalesce — duplicating the chain per
    branch blows the generated Java method past janino's 64 KB limit
    and silently drops the whole stage to interpreted mode."""
    b_scheme = F.regexp_extract(
        base_col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1
    )
    b_auth = F.regexp_extract(base_col, _HOST_RE, 1)
    b_path = F.regexp_extract(base_col, _PATH_RE, 1)
    b_path_full = F.when(b_path == F.lit(""), F.lit("/")).otherwise(b_path)
    b_dir = F.regexp_replace(b_path_full, r"[^/]*$", "")
    return _resolve_ref_parts(raw_col, b_scheme, b_auth, b_path_full, b_dir)


def _resolve_ref_parts(raw_col, b_scheme, b_auth, b_path_full, b_dir):
    """`_resolve_ref` with the base already split into its parts —
    callers that fan one base out to MANY references (extract_links'
    explode) pass the parts as materialized columns so the base
    regexes run once per page in the pre-explode projection, not once
    per link inside the post-explode consume method (which must stay
    under janino's 64 KB ceiling)."""
    raw = F.regexp_extract(raw_col, r"^([^#]*)", 1)  # strip fragment
    has_scheme = raw.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    # forms needing no path normalization (NULL otherwise)
    direct = (
        F.when(raw == F.lit(""), F.lit(None).cast("string"))
        .when(
            has_scheme,
            F.when(raw.rlike(r"^(?i)https?://"), raw).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .when(raw.startswith("//"), F.concat(b_scheme, F.lit(":"), raw))
        .when(
            # RFC 3986 §5.3: an empty-path query-only reference keeps
            # the FULL base path (…/p.html + ?page=2 → …/p.html?page=2)
            raw.startswith("?"),
            F.concat(b_scheme, F.lit("://"), b_auth, b_path_full, raw),
        )
    )
    # the one path that runs through dot-segment normalization
    path_part = (
        F.when(
            (raw == F.lit("")) | has_scheme
            | raw.startswith("//") | raw.startswith("?"),
            F.lit(None).cast("string"),
        )
        .when(raw.startswith("/"), raw)
        .otherwise(F.concat(b_dir, raw))
    )
    normalized = F.concat(
        b_scheme, F.lit("://"), b_auth, _normalize_dot_segments(path_part)
    )
    # NOTE: direct is NULL exactly when the reference is a
    # normalization-form or an invalid form; in the invalid forms
    # path_part is NULL so `normalized` is NULL too and the coalesce
    # yields NULL overall
    return F.coalesce(direct, normalized)


def extract_links(
    table: Table,
    html_col: str,
    base_col: str,
    id_col: str,
    link_col: str = "link",
) -> Table:
    """Link discovery — the crawl-frontier feeder extract_text can't
    provide: pull every ``<a href>`` and ``<area href>`` out of the
    HTML column and resolve it against the page's EFFECTIVE base per
    RFC 3986 (absolute kept, scheme-relative ``//``, root-relative
    ``/``, query-only ``?`` — which keeps the full base path per
    §5.3 — and relative paths resolved; fragments stripped;
    ``mailto:``/``javascript:``/other non-http(s) schemes dropped;
    bounded dot-segment normalization). The effective base honors the
    page's first ``<base href>`` when present (itself resolved against
    the document URL — a page with ``<base>`` mis-resolves EVERY
    relative link if ignored); otherwise the row's ``base_col``.
    Output: one ``(id, link)`` row per extracted link, multiplicity
    preserved — feed into canonicalize/dedup/filter_by_robots/
    schedule_fetches for the full discovery loop.

    Fully native (regexp_extract_all + explode + CASE resolution, zero
    Python in the row path) and 1:1 SQL-expressible, so the whole
    extraction+resolution is oracle-checkable. At 100 TB the plan is a
    narrow projection + one generate (explode) — no shuffle at all.
    """
    df = table._require_df()
    packed = _links_packed_expr(html_col, base_col)
    out = df.select(F.col(id_col), F.explode(packed).alias(link_col))
    return Table.from_df(out, name=f"{table.table_name}_links")


@lru_cache(maxsize=32)
def _links_packed_expr(html_col: str, base_col: str):
    """``extract_links``' input-independent Column tree, built once per
    column-name shape: the four href scans + the ~20-regexp resolution
    CASE cost ~0.2 s of py4j round trips per call (same memoization as
    textops._lang_id_exprs; guide §1.2, driver-side edition)."""
    html = F.coalesce(F.col(html_col), F.lit(""))
    base = F.coalesce(F.col(base_col), F.lit(""))
    hrefs = F.concat(
        F.regexp_extract_all(html, F.lit(_HREF_DQ_RE), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_HREF_SQ_RE), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_AREA_DQ_RE), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_AREA_SQ_RE), F.lit(1)),
    )
    # Resolution runs INSIDE the array (transform), validity filtering
    # on the array elements (filter), and only the finished links
    # explode. Three reasons, all load-bearing at scale:
    # - resolving AFTER the explode put the ~20-regexp resolution CASE
    #   in the post-Generate projection, where predicate pushdown
    #   substituted it into the validity Filter too — the whole
    #   expression evaluated TWICE per link, and the fused consume
    #   method blew janino's 64 KB ceiling, dropping the entire stage
    #   out of whole-stage codegen;
    # - the array form evaluates the resolution exactly ONCE per href
    #   and leaves the explode with zero downstream expressions;
    # - the html-scanning work (the four href scans and the
    #   document-order effective-base pick, the expensive part) is
    #   materialized ONCE per row in the outer single-element array —
    #   expressions captured in a transform lambda re-evaluate per
    #   element, so only cheap extracts over the short materialized
    #   base string may live inside the per-href lambda (same-box A/B
    #   round 13: capturing the base expression directly cost 1.7x).
    return F.get(
        F.transform(
            F.array(
                F.struct(
                    hrefs.alias("h"),
                    _effective_base(html, base).alias("b"),
                )
            ),
            lambda x: F.filter(
                F.transform(x["h"], lambda r: _resolve_ref(r, x["b"])),
                lambda link: link.rlike(r"^(?i)https?://[^/?#]+"),
            ),
        ),
        F.lit(0),
    )


def extract_canonical(
    table: Table,
    html_col: str,
    base_col: str,
    id_col: str,
    out_col: str = "canonical_url",
) -> Table:
    """The page's ``<link rel=canonical>`` target, resolved — the
    publisher-declared dedup key: pages reachable at many URLs
    (pagination params, mirrors, mobile subdomains) declare one
    canonical form, and grouping a crawl by it collapses them BEFORE
    expensive content dedup. Output: one ``(id, canonical_url)`` row
    per input row; NULL when the page declares none (or the target
    is not http(s)) — compose with ``coalesce(canonical_url, url)``
    then ``dedup_urls``.

    The first canonical link in DOCUMENT order wins (round 13: across
    both attribute orders AND both quote styles — earliest full-match
    position, not pattern order); the target resolves against the
    page's effective base (honoring ``<base href>``) exactly like
    ``extract_links``. Fully native and 1:1 SQL-expressible (the
    alternation patterns avoid lookahead so Spark's Java regex and
    the DuckDB oracle's RE2 agree). Plan: one narrow projection, NO
    explode, zero shuffle.
    """
    df = table._require_df()
    resolved = _canonical_resolved_expr(html_col, base_col)
    out = df.select(F.col(id_col), resolved.alias(out_col))
    return Table.from_df(out, name=f"{table.table_name}_canonical")


@lru_cache(maxsize=32)
def _canonical_resolved_expr(html_col: str, base_col: str):
    """``extract_canonical``'s input-independent Column tree, built
    once per column-name shape (see _links_packed_expr)."""
    html = F.coalesce(F.col(html_col), F.lit(""))
    base = F.coalesce(F.col(base_col), F.lit(""))
    raw = F.nullif(
        F.coalesce(
            _earliest_match(
                html,
                (_CANON_RF_DQ, _CANON_RF_SQ, _CANON_HF_DQ, _CANON_HF_SQ),
            ),
            F.lit(""),
        ),
        F.lit(""),
    )
    # Evaluate the 4-pattern extraction and the effective base ONCE by
    # routing them through a single-element transform() lambda —
    # inlined directly, every reference inside _resolve_ref's CASE
    # branches re-evaluates them (subexpression elimination cannot
    # hoist out of conditional branches), multiplying the html-scanning
    # regex work ~15x (measured 1.2s -> 0.1s per bench pass at sf0.1).
    resolved0 = F.get(
        F.transform(
            F.array(F.struct(raw.alias("r"), _effective_base(html, base).alias("b"))),
            lambda x: F.when(
                x["r"].isNotNull(), _resolve_ref(x["r"], x["b"])
            ),
        ),
        F.lit(0),
    )
    return F.when(
        resolved0.rlike(r"^(?i)https?://[^/?#]+"), resolved0
    ).otherwise(F.lit(None).cast("string"))
