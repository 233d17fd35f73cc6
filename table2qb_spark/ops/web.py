"""Web-corpus URL operators: canonicalization, registered-domain extraction,
URL-level exact dedup.

Every large-scale web ingest (C4, CCNet, RefinedWeb — all public recipes)
dedups and balances by URL before touching content: the same page is crawled
many times under cosmetically different URLs (scheme/host case, ``www.``,
default ports, tracking query parameters, fragments, trailing slashes).
These operators re-express that stage Spark-first:

- ``url_normalize_expr``: ONE Catalyst projection per URL — ``parse_url``
  (JVM, codegen) splits the URL; normalization is case-folding, default-port
  and fragment stripping, tracking-parameter removal and query-parameter
  sorting via ``filter``/``array_sort``/``array_join`` higher-order
  functions. Zero shuffle, zero Python.
- ``registered_domain_expr``: PSL-lite eTLD+1 — a bundled multi-label
  public-suffix set (the high-traffic entries; the full Mozilla PSL drops in
  as a broadcast join if ever needed) + a two-label default. Pure label
  arithmetic over ``split``, no UDF.
- ``url_dedup``: group by canonical URL, keep the minimum id — a single
  map-side-combinable aggregate (min/count), deliberately NOT a window:
  partial aggregation collapses duplicate URLs inside each scan task, so
  the shuffle carries one row per (task, canonical URL), never per page —
  the same scale argument as ops/dedup.py's paragraph dedup.

Reference analog: none (table2qb converts curated statistical CSV, not web
crawl) — north-rule-added surface, same status as the C4/Gopher gates in
ops/text.py.

Canonical form produced (documented so the oracle and any downstream joiner
agree): ``scheme://host[:port]path[?query]`` with lowercase scheme and host,
a leading ``www.`` removed, the port dropped when it is the scheme default
(80/443), trailing slashes stripped from the path (so ``/`` becomes
empty), tracking parameters (``utm_*``, fbclid, gclid, msclkid, ref)
removed, remaining query parameters sorted, and the fragment dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact-name tracking parameters; any name starting with utm_ is also dropped
TRACKING_PARAM_NAMES = ("fbclid", "gclid", "msclkid", "ref")

# multi-label public suffixes (PSL-lite): when a host's last two labels are
# in this set, the registered domain keeps three labels instead of two
MULTI_LABEL_SUFFIXES = (
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.ar", "com.au", "com.br", "com.cn", "com.mx", "com.tr",
    "gov.uk", "net.au", "org.au", "org.uk",
)


def _part(url: Column, part: str) -> Column:
    return F.parse_url(url, F.lit(part))


def url_normalize_expr(url: Column) -> Column:
    """Canonical URL as one Catalyst expression (see module docstring for
    the exact form). NULL/unparseable input yields NULL, never an error."""
    scheme = F.lower(_part(url, "PROTOCOL"))
    host = F.regexp_replace(F.lower(_part(url, "HOST")), r"^www\.", "")
    authority = _part(url, "AUTHORITY")
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        F.when(scheme == "https", "443").when(scheme == "http", "80").otherwise("")
    )
    port_part = F.when(
        (port != "") & (port != default_port), F.concat(F.lit(":"), port)
    ).otherwise("")
    path = F.regexp_replace(F.coalesce(_part(url, "PATH"), F.lit("")), "/+$", "")
    query = F.coalesce(_part(url, "QUERY"), F.lit(""))
    name = lambda p: F.substring_index(p, "=", 1)  # noqa: E731
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~name(p).startswith("utm_")
            & ~name(p).isin(*TRACKING_PARAM_NAMES),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(""),
    )


def registered_domain_expr(host: Column) -> Column:
    """eTLD+1 from an (already lowercased) hostname: two labels by default,
    three when the last two are a known multi-label public suffix. Hosts
    with fewer than two labels pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    return (
        F.when(
            (n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES),
            F.concat_ws(".", F.element_at(labels, -3), last2),
        )
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL with the keeper
    (minimum id — deterministic on any engine at any parallelism) and the
    duplicate count. Single map-side-combinable aggregate; at 100 TB the
    shuffle carries one row per canonical URL per task, not one per page."""
    norm = df.select(
        F.col(id_col), url_normalize_expr(F.col(url_col)).alias("url_norm")
    )
    return norm.groupBy("url_norm").agg(
        F.min(id_col).alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )
