"""URL normalization/analytics expressions — JVM built-ins, no UDFs.

Crawl curation needs URL-level semantics the raw ``WARC-Target-URI``
string doesn't give: the same page arrives as ``HTTP://Example.COM:80/a``
and ``http://example.com/a?utm_source=x``, and corpus health is audited
per registrable DOMAIN, not per raw string. Everything here is a pure
Spark SQL expression (lower/regexp/split/filter — whole-stage codegen,
no Python in the hot path) with an exact DuckDB-expressible contract,
so the `web_url_normalize` library row hash-checks the whole surface.

The normalization is a DOCUMENTED SUBSET of RFC 3986 §6 + the de-facto
tracking-param strip used by crawl pipelines:

- scheme and authority lowercased (userinfo is lowercased along with
  the authority — negligible in crawl corpora, documented);
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment removed;
- empty path with an authority becomes ``/``;
- tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_eid``, ``igshid``), survivor ORDER preserved, the
  ``?`` dropped when nothing survives;
- everything else (percent-encoding, dot-segments, param sorting) is
  left VERBATIM — those rewrites change semantics on real-world URLs
  more often than they canonicalize, so they stay out of scope.

A URL without a ``scheme://`` prefix is returned trimmed-but-otherwise
verbatim: guessing a scheme would fabricate data.

``url_registrable_domain`` is a public-suffix HEURISTIC (last two
labels, or three for a built-in set of common second-level suffixes
like ``co.uk``) — the full Mozilla PSL is an external artifact this
stdlib-only repo does not vendor; the docstring says so and the
column is named to its semantics, not to PSL exactness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters dropped by normalization (anchored at the '='/end)
TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid)(=|$)"

#: common second-level public suffixes (heuristic subset; PSL not vendored)
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "or.jp", "ne.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.ar", "com.tr", "com.tw",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_normalize(col: Column | str) -> Column:
    """Normalized URL per the module contract — one nested expression,
    fully JVM-side."""
    url = F.trim(_c(col))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    # everything after '://', fragment dropped
    rest = F.split(F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""), "#", 2)[0]
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    after = F.substring(rest, F.length(authority) + 1, F.lit(1 << 30))
    path = F.regexp_extract(after, r"^([^?]*)", 1)
    query = F.when(
        F.length(after) > F.length(path),
        F.substring(after, F.length(path) + 2, F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    auth_norm = F.lower(authority)
    auth_norm = F.when(
        (scheme == "http"), F.regexp_replace(auth_norm, ":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(auth_norm, ":443$", "")
    ).otherwise(auth_norm)
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_norm = F.array_join(kept, "&")
    normalized = F.concat(
        scheme,
        F.lit("://"),
        auth_norm,
        path_norm,
        F.when(query_norm == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_norm)
        ),
    )
    return F.when(scheme == "", url).otherwise(normalized)


def url_host(col: Column | str) -> Column:
    """Lowercased host of a hierarchical URL: authority minus userinfo
    and port. Bracketed IPv6 literals come back intact
    (``http://[2001:db8::1]/x`` → ``[2001:db8::1]`` — the bare
    colon-stops-host rule would return ``[``; r13 review). Empty
    string for schemeless input."""
    url = F.trim(_c(col))
    rest = F.split(F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""), "#", 2)[0]
    has_scheme = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1) != ""
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    nouser = F.regexp_extract(authority, r"^(?:[^@]*@)?(.*)$", 1)
    host = F.when(
        nouser.startswith("["),
        F.lower(F.regexp_extract(nouser, r"^(\[[^\]]*\])", 1)),
    ).otherwise(F.lower(F.regexp_extract(nouser, r"^([^:]*)", 1)))
    return F.when(has_scheme, host).otherwise(F.lit(""))


def url_registrable_domain(col: Column | str) -> Column:
    """Heuristic registrable domain of ``url_host``-shaped input (pass
    a host column, not a full URL): the last two labels, or the last
    three when the last two form a known second-level suffix
    (``a.b.co.uk`` → ``b.co.uk``). Hosts with fewer labels (bare TLDs,
    localhost, IPs-with-dots get last-2 like any host) pass through."""
    host = _c(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_sl = F.lower(last2).isin(*SECOND_LEVEL_SUFFIXES)
    # every branch lowercases — the n<=2 passthrough previously kept
    # the input's case, splitting domain aggregates across case
    # variants when callers pass raw hosts (r13 review)
    return (
        F.when(n <= 2, F.lower(host))
        .when((n >= 3) & is_sl, F.lower(last3))
        .otherwise(F.lower(last2))
    )
