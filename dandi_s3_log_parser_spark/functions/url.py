"""Canonical-URL normalization — the crawl-dedup key.

Web crawls re-fetch the same page under many spellings: scheme/host
case, default ports, trailing slashes, fragments, tracking parameters,
and query-parameter order.  Canonicalizing the URL is the FIRST dedup
pass of every crawl pipeline (cheaper than any content hash, removes
the bulk of refetch duplicates).

Everything here is native column expressions (regexp + array HOFs) —
no UDF, stays inside whole-stage codegen, and the same RE2-safe
patterns are shared verbatim with the DuckDB oracle (the
``pii_redact`` precedent).  Rules applied, in order:

1. scheme and host lowercased;
2. default port stripped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``);
5. remaining query parameters sorted bytewise;
6. trailing slashes stripped from the path (the bare host and ``/``
   are the same resource).

A URL that does not look like ``scheme://...`` is passed through
unchanged (crawl manifests contain junk; canonicalization must be
total, the junk dedups by exact bytes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# parameters that never identify content
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored to text BEFORE any '#': a '?' inside the fragment (SPA-style
# '#/route?x=1') is fragment content and must be dropped with it (rule 3),
# not resurrected as query params (round-4 ADVICE, medium)
_QUERY_RE = r"^[^#]*?\?([^#]*)"


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    # strip default ports per scheme
    host = (
        F.when(
            (scheme == "http"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), "/+$", ""
    )
    rawq = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "")
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme != "", rebuilt).otherwise(url)


def domain_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname, longest first: ``a.b.c`` ->
    ``["a.b.c", "b.c", "c"]`` — the candidate set for registrable-
    domain blocklist matching ("block ``bad.com`` and every subdomain").

    Pure array HOFs (split / sequence / slice / array_join): stays in
    whole-stage codegen, and the suffix count is the label count (a
    hostname has <=127), so the explode fan-out is small and bounded.
    """
    parts = F.split(F.lower(host), r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )
