"""HTTP response-cache policy parsing (RFC 9111) — the header-derived
side of revisit scheduling.

operators/revisit.py estimates change rates from OBSERVED content
(Cho & Garcia-Molina); this module extracts what the server itself
DECLARES: ``Cache-Control`` directives, validators (``ETag`` /
``Last-Modified``) and ``Expires``, turning a raw header block into
typed policy columns a scheduler can aggregate per host — which hosts
are conditional-GET friendly (pair with d9_conditional_get's 304
accounting), which forbid storage, which publish explicit freshness.

The reference fetches pages with caching disabled entirely
(/root/reference/scraper/browser.py — a fresh headless context per
run); a polite large-scale crawler must do the opposite and honor
declared freshness to avoid re-downloading unchanged bodies.

Everything is codegen ``regexp_extract`` / ``rlike`` over the header
string — one projection, no UDF, no shuffle; the patterns are the
RE2/Java-regex common subset so a SQL oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Header-line extractors. (?im): case-insensitive header names per RFC
# 9110 §5.1, multi-line ^ anchors per header line.  Values run to the
# line terminator.
_CC_RE = r"(?im)^cache-control:[ \t]*([^\r\n]*)"
_MAX_AGE_RE = r"(?i)(?:^|[,\s])max-age[ \t]*=[ \t]*([0-9]+)"


def cache_policy(header: Column) -> dict[str, Column]:
    """Parse a raw response-header block into caching policy columns.

    Returns a dict of columns:
      max_age           declared freshness lifetime seconds (null if
                        no max-age directive)
      no_store          response must not be cached at all
      no_cache          cacheable but must revalidate before reuse
      has_etag          strong/weak validator present
      has_last_modified Last-Modified validator present
      has_expires       legacy Expires header present
      revalidatable     a conditional GET is possible (either validator)
      fresh_ttl_s       usable freshness seconds: 0 under no-store /
                        no-cache, else max-age when declared, else 0
                        (Expires-only responses need a Date diff the
                        caller does with real timestamps; the flag
                        column carries that case)
    """
    cc = F.regexp_extract(header, _CC_RE, 1)
    max_age_str = F.regexp_extract(cc, _MAX_AGE_RE, 1)
    max_age = F.when(max_age_str != "", max_age_str.cast("long"))
    no_store = cc.rlike(r"(?i)(?:^|[,\s])no-store(?:$|[,\s])")
    no_cache = cc.rlike(r"(?i)(?:^|[,\s])no-cache(?:$|[,\s])")
    has_etag = header.rlike(r"(?im)^etag:")
    has_lm = header.rlike(r"(?im)^last-modified:")
    has_expires = header.rlike(r"(?im)^expires:")
    fresh_ttl = (
        F.when(no_store | no_cache, F.lit(0).cast("long"))
        .when(max_age.isNotNull(), max_age)
        .otherwise(F.lit(0).cast("long"))
    )
    return {
        "max_age": max_age,
        "no_store": no_store,
        "no_cache": no_cache,
        "has_etag": has_etag,
        "has_last_modified": has_lm,
        "has_expires": has_expires,
        "revalidatable": has_etag | has_lm,
        "fresh_ttl_s": fresh_ttl,
    }
