"""Sitemap ingestion — the other standard seed source a crawl frontier
consumes (sitemaps.org protocol: ``<urlset>`` leaf sitemaps and
``<sitemapindex>`` files pointing at further sitemaps).

The reference hard-codes its target URLs
(/root/reference/scraper/home_depo.py:127-129); a web-scale crawler
instead bulk-loads millions of fetched sitemap XML files and turns them
into prioritized frontier seeds.  Parsing is pure Catalyst:
``regexp_extract_all`` with a DOTALL group per record block, explode,
per-field extracts — no XML library, no UDF, one codegen pass whose
cost is O(total sitemap bytes).  Sitemap-index entries come out as
``kind='sitemap'`` rows (the next fetch wave), leaf URLs as
``kind='url'`` rows that :func:`sitemap_seeds` maps onto the
SEEDS_SCHEMA consumed by ``plans/round.py::init_state``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal XML entity set sitemaps must escape (sitemaps.org protocol).
# &amp; is decoded LAST so "&amp;lt;" decodes to the literal "&lt;".
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def _unescape(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _records(xml: Column, tag: str, kind: str) -> Column:
    """Array of <tag>…</tag> inner blocks, each mapped to a
    (kind, loc, lastmod, priority) struct."""
    blocks = F.regexp_extract_all(xml, F.lit(f"(?s)<{tag}>(.*?)</{tag}>"), 1)
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.lit(kind).alias("kind"),
            _unescape(
                F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
            ).alias("loc"),
            F.nullif(
                F.regexp_extract(b, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1),
                F.lit(""),
            ).alias("lastmod"),
            F.nullif(
                F.regexp_extract(
                    b, r"(?s)<priority>\s*(.*?)\s*</priority>", 1
                ),
                F.lit(""),
            )
            .try_cast("double")
            .alias("priority"),
        ),
    )


def parse_sitemaps(
    df: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse one sitemap XML document per row.

    Output: (domain, kind, loc, lastmod, priority) — ``kind='url'`` for
    ``<urlset>`` entries (crawlable pages), ``kind='sitemap'`` for
    ``<sitemapindex>`` children (further sitemaps to fetch).  Rows with
    an empty ``<loc>`` are dropped.  No shuffle: explode of per-row
    regex matches only.
    """
    xml = F.col(xml_col)
    recs = F.concat(
        _records(xml, "url", "url"), _records(xml, "sitemap", "sitemap")
    )
    return (
        df.select(F.col(domain_col).alias("domain"), F.explode(recs).alias("r"))
        .select("domain", "r.kind", "r.loc", "r.lastmod", "r.priority")
        .filter(F.col("loc") != "")
    )


def sitemap_seeds(parsed: DataFrame, high_cutoff: float = 0.8) -> DataFrame:
    """Map parsed leaf URLs onto the frontier seed shape
    (SEEDS_SCHEMA: url, priority int).  Sitemap priority is 0.0–1.0
    (default 0.5 per the protocol); ≥ ``high_cutoff`` becomes frontier
    priority 0 (revisit-every-round tier), everything else priority 1 —
    the same two-tier cadence the seed list uses."""
    return parsed.filter(F.col("kind") == "url").select(
        F.col("loc").alias("url"),
        F.when(
            F.coalesce(F.col("priority"), F.lit(0.5)) >= high_cutoff, F.lit(0)
        )
        .otherwise(F.lit(1))
        .cast("int")
        .alias("priority"),
    )
