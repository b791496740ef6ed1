"""Robots *meta* directives — the page-level half of politeness.

robots.txt (functions/robotstxt.py) gates what may be FETCHED;
`<meta name="robots">` and per-anchor ``rel="nofollow"`` gate what a
crawled page contributes downstream:

- ``noindex``  → the page is fetched but excluded from corpus export;
- ``nofollow`` (page-level) → none of its outlinks enter discovery;
- ``rel=nofollow`` on an individual anchor → that one link is skipped;
- ``none`` ≡ ``noindex, nofollow``; ``all`` ≡ neither (HTML spec,
  https://html.spec.whatwg.org/multipage/semantics.html#meta-robots).

The reference scraper never honored these (it fetched fixed seed pages
— scraper/base.py drives explicit URLs), but any open-web crawl must:
Googlebot semantics are the de-facto contract, and a Common-Crawl-style
corpus that exports noindex pages is not policy-clean.

Everything here is a codegen projection (regexp_extract / rlike over
the html column) — zero shuffles, zero Python rows — and every regexp
is RE2-compatible so the DuckDB oracle replays the exact same parse.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# The whole <meta ... name=robots ... > tag, attribute order and
# quoting agnostic (name may precede or follow content).
META_ROBOTS_TAG_RE = r"""(?i)<meta[^>]*name\s*=\s*["']?robots\b[^>]*>"""
# content="..." inside a tag: quoted and bare forms are disjoint
# patterns (the bare class can't start at a quote), so each is a
# single-group regexp that extracts identically in Spark and RE2.
CONTENT_QUOTED_RE = r"""(?i)content\s*=\s*["']([^"']*)["']"""
CONTENT_BARE_RE = r"""(?i)content\s*=\s*([^"'\s>]+)"""
# Directive token with comma/space boundaries, applied to the content
# string padded with commas on both ends (so one RE2 pattern, no
# lookarounds, matches first/middle/last tokens alike).
_TOKEN = "[,\\s]({})[,\\s]"
# Every <a ...> opening tag (bounded so <abbr>/<area> never match);
# group 0 is the tag, re-parsed per link.
ANCHOR_TAG_RE = r"(?i)<a(?:\s[^>]*)?>"
HREF_IN_TAG_RE = r"""(?i)href\s*=\s*["']?([^"'> ]+)"""
# rel value containing the nofollow token (rel is space-separated
# per HTML; nofollow may ride with others, e.g. rel="external nofollow").
REL_NOFOLLOW_RE = r"""(?i)rel\s*=\s*["']?[^"'>]*nofollow"""


def _meta_content(html: Column) -> Column:
    """Lower-cased content of the first meta-robots tag, '' if none."""
    tag = F.regexp_extract(html, META_ROBOTS_TAG_RE, 0)
    quoted = F.regexp_extract(tag, CONTENT_QUOTED_RE, 1)
    bare = F.regexp_extract(tag, CONTENT_BARE_RE, 1)
    return F.lower(F.when(quoted != "", quoted).otherwise(bare))


def _has_token(content: Column, token_alt: str) -> Column:
    padded = F.concat(F.lit(","), content, F.lit(","))
    return padded.rlike(_TOKEN.format(token_alt))


def meta_robots_flags(html: Column) -> Column:
    """struct<noindex:boolean, nofollow:boolean> from the page's meta
    robots directives; absent tag / ``all`` → (false, false)."""
    c = _meta_content(html)
    return F.struct(
        _has_token(c, "noindex|none").alias("noindex"),
        _has_token(c, "nofollow|none").alias("nofollow"),
    )


def anchor_tags(html: Column) -> Column:
    """array<string> of raw ``<a ...>`` opening tags, document order."""
    return F.regexp_extract_all(html, F.lit(ANCHOR_TAG_RE), 0)


def tag_href(tag: Column) -> Column:
    """href value of one anchor tag ('' if the tag has none)."""
    return F.regexp_extract(tag, HREF_IN_TAG_RE, 1)


def tag_is_nofollow(tag: Column) -> Column:
    """True when the anchor tag carries rel=...nofollow...."""
    return tag.rlike(REL_NOFOLLOW_RE)
