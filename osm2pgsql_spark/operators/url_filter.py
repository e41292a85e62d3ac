"""URL / domain filtering — the blocklist stage every crawl-derived
training corpus runs first (C4's badwords-domain list, FineWeb's URL
filtering; RefinedWeb §3.1): drop documents whose source URL is on a
blocked domain (including subdomains) or matches a blocked pattern.

Scale shape: the blocklist is small by nature (10^4-10^6 rows) and
BROADCASTS; the corpus side never shuffles — host extraction is a
regexp projection and the domain test a broadcast join, so the stage
is scan-bound at 100 TB.  Host parsing uses the same regex on both
engines (Spark's parse_url has no DuckDB twin) so keep decisions
reproduce bit-for-bit in the gate oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://HOST[:port]/..., lowercased — the Java/RE2 common subset
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def url_host(col: Column) -> Column:
    """The lowercased host of a URL ('' when the URL has none or is
    NULL — NULL must not poison the keep decision downstream)."""
    return F.coalesce(F.lower(F.regexp_extract(col, HOST_RE, 1)), F.lit(""))


def url_host_sql(expr: str) -> str:
    """DuckDB twin of url_host (regexp_extract group 1, coalesced —
    DuckDB returns NULL on no match where Spark returns '')."""
    return f"coalesce(lower(regexp_extract({expr}, '{HOST_RE}', 1)), '')"


def url_filter(
    docs: DataFrame,
    blocked_domains: list[str],
    blocked_patterns: list[str] | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, url, host, blocked_domain, blocked_pattern, is_kept):
    keep decisions for the URL blocklist stage.

    A document is domain-blocked when its host IS a blocked domain or
    a SUBDOMAIN of one (host == d or host endswith '.' + d — the
    public-suffix-style test every blocklist implementation uses),
    and pattern-blocked when the full URL matches any blocked regex.
    Both lists broadcast; rows with no/unparseable URL keep
    (host = '', nothing matches — the conservative default: absence
    of a URL is not evidence of badness)."""
    host = url_host(F.col(url_col))
    d = docs.select(F.col(id_col), F.col(url_col).alias("url"),
                    host.alias("host"))
    doms = docs.sparkSession.createDataFrame(
        [(x.lower(),) for x in blocked_domains], "domain string"
    )
    j = d.join(
        F.broadcast(doms),
        (F.col("host") == F.col("domain"))
        | F.col("host").endswith(F.concat(F.lit("."), F.col("domain"))),
        "left",
    ).groupBy(id_col, "url", "host").agg(
        F.min("domain").alias("blocked_domain")  # deterministic pick
    )
    pat_hit = F.lit(False)
    for p in (blocked_patterns or []):
        pat_hit = pat_hit | (F.regexp_count(F.col("url"), F.lit(p)) > 0)
    pat_hit = F.coalesce(pat_hit, F.lit(False))  # NULL url: no match
    return j.select(
        id_col, "url", "host", "blocked_domain",
        pat_hit.alias("blocked_pattern"),
        (F.col("blocked_domain").isNull() & ~pat_hit).alias("is_kept"),
    )


def url_filter_sql(
    blocked_domains: list[str],
    blocked_patterns: list[str] | None = None,
    url_expr: str = "url",
    id_expr: str = "doc_id",
    relation: str = "documents",
) -> str:
    """DuckDB twin of url_filter over `relation` (which must expose
    the id and url expressions).  Blocklist entries are escaped as
    SQL literals (single quotes doubled); an empty domain list yields
    an empty inline relation rather than a bare `VALUES `."""
    def _lit(s: str) -> str:
        return s.replace("'", "''")

    host = url_host_sql("url")
    if blocked_domains:
        doms_rel = "(VALUES " + ", ".join(
            f"('{_lit(d.lower())}')" for d in blocked_domains
        ) + ") AS b(domain)"
    else:
        doms_rel = ("(SELECT CAST(NULL AS VARCHAR) AS domain "
                    "WHERE FALSE) AS b")
    pats_raw = " OR ".join(
        f"regexp_matches(url, '{_lit(p)}')"
        for p in (blocked_patterns or [])
    ) or "FALSE"
    pats = f"coalesce({pats_raw}, FALSE)"  # NULL url: no match
    return f"""
    SELECT doc_id, url, host,
           (SELECT min(domain) FROM {doms_rel}
            WHERE host = domain
               OR suffix(host, '.' || domain)) AS blocked_domain,
           ({pats}) AS blocked_pattern,
           ((SELECT min(domain) FROM {doms_rel}
             WHERE host = domain
                OR suffix(host, '.' || domain)) IS NULL
            AND NOT ({pats})) AS is_kept
    FROM (SELECT doc_id, url, {host} AS host
          FROM (SELECT {id_expr} AS doc_id, {url_expr} AS url
                FROM {relation}))
    """
