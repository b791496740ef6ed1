"""URL canonicalization + hashing — Arrow-vectorized, oracle-shared.

The reference builds URLs by f-string concatenation with no
normalization (/root/reference/scraper/home_depo.py:212,
/root/reference/scraper/library_event.py:89-92); a frontier at
10^10-URL scale must instead collapse duplicate URL spellings
(trailing slash, tracking params, case-variant hosts) to one canonical
form before dedup, or the seen-set balloons.

Two implementations of the SAME rule set:

- ``canonicalize_series``: vectorized pandas (``.str`` ops only — C
  regex engine under the hood, no per-row Python), used inside the
  engine's pandas UDF;
- ``canonicalize_url``: single-URL wrapper used by the pure-Python
  parity oracle, defined AS the series version on a 1-row series, so
  engine and oracle can never diverge.

``url_hash`` is Spark's built-in ``xxhash64`` (JVM-side, codegen'd) —
the murmur-class 64-bit hash of the north rule.  Parity with the
oracle is checked on canonical URL *strings* (strictly stronger than
hash parity); the hash is an engine-internal join/partition key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tracking parameters stripped during canonicalization (public
# convention: Google Analytics / click-id params).
_TRACKING_PARAM_RE = r"(?:utm_[A-Za-z_]*|fbclid|gclid|msclkid)=[^&#]*"


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization. Rules, in order:

    1. trim surrounding whitespace
    2. drop the fragment (``#...``)
    3. lowercase scheme and host
    4. strip default ports (``:80`` for http, ``:443`` for https)
    5. strip tracking query params (utm_*, fbclid, gclid, msclkid);
       drop a query separator left empty
    6. strip trailing slashes at the end of the path
    """
    s = s.astype("string").fillna("")

    def masked_replace(series: pd.Series, find: str, pat: str, repl: str) -> pd.Series:
        """Rewrite only rows that can match — a contains() scan is a
        bool array; a str.replace over all rows reallocates every
        string.  Most URLs have no fragment/port/tracking params, so
        this cuts memory traffic by the non-matching fraction (the
        dominant cost at 10^7-rows-per-executor batch sizes)."""
        mask = series.str.contains(find, regex=True)
        mask = mask.fillna(False).astype(bool)
        if mask.any():
            series = series.copy()
            series[mask] = series[mask].str.replace(pat, repl, regex=True)
        return series

    ws = s.str.contains(r"^\s|\s$", regex=True).fillna(False).astype(bool)
    if ws.any():
        s = s.copy()
        s[ws] = s[ws].str.strip()
    s = masked_replace(s, r"#", r"#.*$", "")

    # Split into scheme, host[:port], rest.
    parts = s.str.extract(r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>.*)$")
    has_scheme = parts["scheme"].notna()
    scheme = parts["scheme"].str.lower()
    host = parts["host"].str.lower()
    rest = parts["rest"].fillna("")

    # Default-port stripping, conditional on scheme.
    port = host.str.contains(r":\d+$", regex=True).fillna(False).astype(bool)
    http_mask = has_scheme & (scheme == "http") & port
    https_mask = has_scheme & (scheme == "https") & port
    if http_mask.any():
        host = host.mask(http_mask, host[http_mask].str.replace(r":80$", "", regex=True))
    if https_mask.any():
        host = host.mask(https_mask, host[https_mask].str.replace(r":443$", "", regex=True))

    # Tracking-param removal (run twice for adjacent params), then tidy
    # dangling separators.
    tracked = rest.str.contains(
        r"utm_|fbclid|gclid|msclkid", regex=True
    ).fillna(False).astype(bool)
    if tracked.any():
        sub = rest[tracked]
        sub = sub.str.replace(_TRACKING_PARAM_RE + r"&", "", regex=True)
        sub = sub.str.replace(_TRACKING_PARAM_RE + r"&", "", regex=True)
        sub = sub.str.replace(r"[?&]" + _TRACKING_PARAM_RE, "", regex=True)
        sub = sub.str.replace(r"\?&", "?", regex=True)
        sub = sub.str.replace(r"[?&]$", "", regex=True)
        rest = rest.copy()
        rest[tracked] = sub

    # Trailing-slash normalization on the path component.
    rest = masked_replace(rest, r"/(?:\?|$)", r"/+(\?|$)", r"\1")

    rebuilt = scheme.fillna("") + "://" + host.fillna("") + rest
    out = s.mask(has_scheme, rebuilt)
    return out.astype("string")


def canonicalize_url(url: str) -> str:
    """Single-URL canonicalization for the parity oracle — delegates to
    the vectorized implementation so the two can never diverge."""
    return str(canonicalize_series(pd.Series([url])).iloc[0])


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls).astype(object)


def host_of(col):
    """Host of a canonical URL — JVM-side (parse_url is codegen'd)."""
    return F.lower(F.parse_url(col, F.lit("HOST")))


def domain_of(col):
    """Registrable-domain approximation: last two host labels.  The
    synthetic universe uses single-label + TLD hosts, so this is exact
    there; on real data swap in a public-suffix-list UDF."""
    host = host_of(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url"
) -> DataFrame:
    """Add canonical url + url_hash + host + domain columns.

    The canonicalize step is the only Python in the path (one Arrow
    batch per 10k rows); hash/host/domain stay JVM-side.
    """
    return (
        df.withColumn(out_col, canonicalize_udf(F.col(url_col)))
        .withColumn("url_hash", F.xxhash64(F.col(out_col)))
        .withColumn("host", host_of(F.col(out_col)))
        .withColumn("domain", domain_of(F.col(out_col)))
    )


def surt_key(col) -> "F.Column":
    """SURT (Sort-friendly URI Reordering Transform) key of a URL —
    the Common-Crawl / CDX-index canonical form that sorts all pages
    of a registrable domain contiguously, so an Iceberg frontier
    partitioned or Z-ordered by this key clusters per-host work
    without a shuffle.

    Rules (applied entirely with codegen'd built-ins, no UDF):

    1. lowercase; strip the scheme
    2. split ``host[:port]`` from path+query at the first ``/``/``?``
    3. drop default ports 80/443, keep others as ``:port``
    4. strip one leading ``www.``; reverse host labels, join with ','
    5. append ``)`` then the path (``/`` if empty)
    6. query params sorted lexicographically after ``?``

    ``http://WWW.Foo.Example:8080/A/b?b=2&a=1`` →
    ``example,foo:8080)/a/b?a=1&b=2``.
    """
    u = F.lower(col)
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(u, r"^([^/?]*)", 1)
    rest = F.regexp_extract(u, r"^[^/?]*(.*)$", 1)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    portpart = F.when(
        (port != "") & (port != "80") & (port != "443"),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    qpart = F.when(
        query != "",
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")),
    ).otherwise(F.lit(""))
    return F.concat(rev, portpart, F.lit(")"), path, qpart)


def _remove_dot_segments(path: "F.Column") -> "F.Column":
    """RFC 3986 §5.2.4 over an absolute path, as a pure Catalyst fold —
    ``aggregate`` over the segment array plays the spec's output-stack
    algorithm exactly ('..' pops, '.' and empty segments drop), so the
    depth is unbounded (no fixed-iteration regex approximation in the
    LIBRARY; the driver oracle uses a bounded-iteration mirror valid
    for its synthetic universe).  Empty-segment collapse ('a//b' →
    'a/b') is a deliberate canonicalization choice on top of the RFC
    (the DUST-style normalizers in this package already collapse
    duplicate slashes).

    Trailing-'/' semantics follow the spec: a path ending in '/', '/.'
    or '/..' resolves to a directory (output keeps the trailing '/').
    """
    segs = F.filter(
        F.split(path, "/"), lambda s: (s != "") & (s != ".")
    )
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (s == "..") & (F.size(acc) > 0),
            F.slice(acc, 1, F.size(acc) - 1),
        )
        .when(s == "..", acc)
        .otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.concat(F.lit("/"), F.array_join(folded, "/"))
    is_dir = path.rlike(r"(/|/\.|/\.\.)$")
    return F.when(
        is_dir & (joined != "/"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def resolve_reference(base: "F.Column", ref: "F.Column") -> "F.Column":
    """RFC 3986 §5 reference resolution — the primitive every outlink
    the crawler discovers passes through (href values are relative far
    more often than absolute; the reference's browser resolved them
    invisibly via document.baseURI, a Spark pipeline must do it
    itself).  Handles the crawl-relevant reference forms: absolute URL,
    network-path ('//host/x'), absolute-path ('/x'), relative path
    ('a/b', './a', '../a'), query-only ('?q'), and empty; fragments are
    stripped (a crawler never fetches them).  Bases are assumed
    absolute hierarchical URLs with an authority (http/https), which is
    what a frontier contains by construction.

    Pure codegen: regexp component split + CASE + the aggregate-fold
    dot-segment removal — zero shuffles, O(bytes).
    """
    b = F.regexp_replace(base, "#.*$", "")
    r = F.regexp_replace(ref, "#.*$", "")

    b_scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    b_auth = F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?]*)", 1)
    b_rest = F.regexp_replace(b, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", "")
    b_path = F.regexp_extract(b_rest, r"^([^?]*)", 1)

    r_has_scheme = r.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    r_query = F.regexp_extract(r, r"(\?.*)$", 1)
    r_nofrag_path = F.regexp_extract(r, r"^([^?]*)", 1)

    # absolute ref: normalize its own path in place
    abs_scheme = F.regexp_extract(r, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    abs_auth = F.regexp_extract(r, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?]*)", 1)
    abs_rest = F.regexp_replace(r, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", "")
    abs_path = F.regexp_extract(abs_rest, r"^([^?]*)", 1)
    abs_norm = F.when(abs_path == "", F.lit("/")).otherwise(
        _remove_dot_segments(abs_path)
    )

    # network-path ref ('//host/x'): adopt the base scheme
    np_auth = F.regexp_extract(r, r"^//([^/?]*)", 1)
    np_rest = F.regexp_replace(r, r"^//[^/?]*", "")
    np_path = F.regexp_extract(np_rest, r"^([^?]*)", 1)
    np_norm = F.when(np_path == "", F.lit("/")).otherwise(
        _remove_dot_segments(np_path)
    )

    base_dir = F.when(b_path == "", F.lit("/")).otherwise(
        F.regexp_replace(b_path, r"[^/]*$", "")
    )
    merged = F.when(
        r_nofrag_path.startswith("/"), r_nofrag_path
    ).otherwise(F.concat(base_dir, r_nofrag_path))

    prefix = F.concat(b_scheme, F.lit("://"), b_auth)
    return (
        F.when(
            r_has_scheme,
            F.concat(abs_scheme, F.lit("://"), abs_auth, abs_norm, r_query),
        )
        .when(
            r.startswith("//"),
            F.concat(b_scheme, F.lit(":"), F.lit("//"), np_auth, np_norm, r_query),
        )
        .when(r == "", b)
        .when(
            r.startswith("?"),
            F.concat(prefix, F.when(b_path == "", F.lit("/")).otherwise(b_path), r),
        )
        .otherwise(F.concat(prefix, _remove_dot_segments(merged), r_query))
    )
