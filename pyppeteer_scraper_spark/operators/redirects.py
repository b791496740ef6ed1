"""Redirect-chain resolution and DUST URL-alias rule mining.

Reference parity: the reference scraper follows HTTP redirects
implicitly inside pyppeteer's ``page.goto`` (one URL at a time) and
only ever sees the final URL.  A 10^10-URL frontier cannot afford
that: every alias of a terminal page would be scheduled, fetched and
deduped separately.  Both operators here resolve aliasing
*relationally*, before scheduling:

``resolve_redirects``
    pointer-doubling (path-doubling) resolution of a redirect /
    rel=canonical map: after k self-join rounds every chain of depth
    <= 2**k is fully resolved — log-depth in the longest chain, one
    equi-join shuffle per round, never a driver-side walk.  Cycles
    and over-depth chains surface as ``resolved = false`` instead of
    looping forever.

``dust_rules``
    DUST ("Do not crawl in the DUST: different URLs with similar
    text", Bar-Yossef/Keidar/Schonfeld, WWW 2007) parameter-rule
    mining: a per-host URL parameter is *strippable* when URLs that
    differ only by that parameter always carry the same content
    digest.  Evidence is gathered with a single equi-join on
    (host, path) between parameterized and plain URLs — O(aliases)
    shuffle on the digest-bearing keys, never an all-pairs URL
    comparison.  Contradictions (same URL-minus-param, different
    digest) veto a rule, so content-bearing params are never
    stripped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Resolve every redirect chain in ``edges`` (a URL -> URL map;
    one outgoing edge per src — callers dedup first).

    Returns (src, final, hops, resolved): the terminal URL reached
    from ``src``, how many hops it took, and whether the chain
    actually terminated within 2**iters hops (False = cycle or
    over-depth; schedulers should quarantine those, not fetch them).

    Scale shape: each round self-joins the CURRENT resolution map on
    its own src column — k rounds resolve depth 2**k, so 5 rounds
    cover depth-32 chains (real redirect chains are < 10; browsers
    cap at ~20).  Per-round ``localCheckpoint`` truncates the doubled
    join lineage so the plan stays flat.
    """
    f = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(iters):
        nxt = f.select(
            F.col("src").alias("j_src"),
            F.col("dst").alias("j_dst"),
            F.col("hops").alias("j_hops"),
        )
        f = (
            f.join(nxt, f["dst"] == nxt["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_dst", "dst").alias("dst"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("j_hops"), F.lit(0).cast("long"))
                ).alias("hops"),
            )
            .localCheckpoint()
        )
    # a chain is resolved iff its endpoint has no outgoing edge
    srcs = edges.select(F.col(src).alias("t_src")).distinct()
    return (
        f.join(srcs, f["dst"] == srcs["t_src"], "left")
        .select(
            "src",
            F.col("dst").alias("final"),
            "hops",
            F.col("t_src").isNull().alias("resolved"),
        )
    )


def dust_rules(
    pages: DataFrame,
    url: str = "url",
    digest: str = "digest",
    min_support: int = 2,
) -> DataFrame:
    """Mine per-host strip-this-parameter rules from (url, digest)
    observations.

    Returns (host, param, n_support, n_contradict, safe):
      * n_support    — distinct (path, digest) pairs where the URL
                       with ``param`` and the param-less URL carry
                       the SAME digest,
      * n_contradict — pairs where they differ (param is
                       content-bearing),
      * safe         — n_support >= min_support and n_contradict == 0.

    Only single-parameter URLs are treated as rule evidence (the
    WWW'07 likelihood trick needs attributable deltas); multi-param
    URLs still benefit at apply time because safe rules compose.
    """
    parts = F.regexp_extract(F.col(url), r"^[a-z]+://([^/?]*)([^?]*)\??(.*)$", 1)
    path = F.regexp_extract(F.col(url), r"^[a-z]+://([^/?]*)([^?]*)\??(.*)$", 2)
    qs = F.regexp_extract(F.col(url), r"^[a-z]+://([^/?]*)([^?]*)\??(.*)$", 3)
    base = pages.select(
        parts.alias("host"),
        path.alias("path"),
        qs.alias("qs"),
        F.col(digest).alias("digest"),
    )
    plain = (
        base.filter(F.col("qs") == "")
        .select("host", "path", F.col("digest").alias("plain_digest"))
        .distinct()
    )
    with_param = (
        base.filter((F.col("qs") != "") & (~F.col("qs").contains("&")))
        .select(
            "host",
            "path",
            F.split(F.col("qs"), "=").getItem(0).alias("param"),
            "digest",
        )
        .distinct()
    )
    pairs = with_param.join(plain, ["host", "path"])
    return (
        pairs.groupBy("host", "param")
        .agg(
            F.countDistinct(
                F.when(F.col("digest") == F.col("plain_digest"), F.col("path"))
            ).alias("n_support"),
            F.countDistinct(
                F.when(F.col("digest") != F.col("plain_digest"), F.col("path"))
            ).alias("n_contradict"),
        )
        .select(
            "host",
            "param",
            F.col("n_support").cast("long").alias("n_support"),
            F.col("n_contradict").cast("long").alias("n_contradict"),
            (
                (F.col("n_support") >= min_support)
                & (F.col("n_contradict") == 0)
            ).alias("safe"),
        )
    )


def canonical_link_aliases(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Extract ``<link rel="canonical">`` declarations and resolve them
    into page→canonical alias edges — the publisher-declared dedup
    signal (Google's canonical-link element, RFC 6596) that a crawl
    pipeline folds into URL aliasing BEFORE content dedup ever runs:
    a canonical edge collapses parameterized/mirrored URLs for free,
    no shingling needed.  Chains/cycles across pages resolve with the
    same connected-components operator the dedup family uses.

    Returns (url, canonical_url, is_self, cross_host); pages without
    a canonical link emit (NULL, false, false) — crawlers treat an
    undeclared canonical as self, and the flags stay NON-NULL booleans
    so engines/pandas never disagree on null-bool representation.

    Pure-codegen projection: two anchored ``regexp_extract`` passes
    cover both attribute orders (rel-then-href / href-then-rel, either
    quote style), the match is confined to one tag (``[^>]*``), and
    relative hrefs resolve against the page URL with the same RFC 3986
    ``resolve_reference`` used for outlinks.  No UDF, no shuffle.
    """
    html = F.col(html_col).cast("string")
    rel_first = F.regexp_extract(
        html,
        r"""(?i)<link[^>]*\brel=["']?canonical["']?[^>]*\bhref=["']?([^"'>\s]+)""",
        1,
    )
    href_first = F.regexp_extract(
        html,
        r"""(?i)<link[^>]*\bhref=["']?([^"'>\s]+)["']?[^>]*\brel=["']?canonical["']?""",
        1,
    )
    raw = F.coalesce(
        F.nullif(rel_first, F.lit("")), F.nullif(href_first, F.lit(""))
    )
    from pyppeteer_scraper_spark.functions.canonicalize import (
        host_of,
        resolve_reference,
    )

    # STAGED projections, not one expression tree: resolve_reference
    # references its ref ~15x and the flag columns reference the
    # resolved URL 4x — inlined, the two html regexps would run
    # O(60x) per row (measured 25 s vs ~1 s at sf0.1).  Each stage
    # materializes the shared value as a column; CollapseProject keeps
    # the boundaries because the aliases are non-cheap and
    # multiply-referenced (SPARK-36718).
    staged = pages.select(
        F.col(url_col).alias("url"), raw.alias("__href")
    ).select(
        "url",
        F.when(
            F.col("__href").isNotNull(),
            resolve_reference(F.col("url"), F.col("__href")),
        ).alias("canonical_url"),
    )
    return staged.select(
        "url",
        "canonical_url",
        F.coalesce(
            F.col("canonical_url") == F.col("url"), F.lit(False)
        ).alias("is_self"),
        F.coalesce(
            host_of(F.col("canonical_url")) != host_of(F.col("url")),
            F.lit(False),
        ).alias("cross_host"),
    )
