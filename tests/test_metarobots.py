"""Meta-robots directive parsing and rel=nofollow link gating
(functions/metarobots.py) — edge cases the fixture query can't pin:
decoy tags, multiple rel values, tag-name boundaries, header variants.
"""

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.metarobots import (
    anchor_tags,
    meta_robots_flags,
    tag_href,
    tag_is_nofollow,
)

CASES = [
    # (html, noindex, nofollow)
    ('<meta name="robots" content="index,follow">', False, False),
    ('<meta name="robots" content="noindex">', True, False),
    ('<meta name="robots" content="nofollow">', False, True),
    ('<meta name="robots" content="noindex, nofollow">', True, True),
    ('<meta name="robots" content="noindex,nofollow">', True, True),
    ('<meta name="robots" content="none">', True, True),
    ('<meta name="robots" content="all">', False, False),
    ("<META NAME=ROBOTS CONTENT=NOINDEX>", True, False),
    ("<meta name='robots' content='NoFollow'>", False, True),
    # attribute order swapped
    ('<meta content="noindex" name="robots">', True, False),
    # decoys: wrong name, name as substring, directive in other attrs
    ('<meta name="description" content="noindex">', False, False),
    ('<meta name="robotsx" content="noindex">', False, False),
    # 'noindexing' must not token-match noindex
    ('<meta name="robots" content="noindexing">', False, False),
    # no meta tag at all
    ("<html><body>plain</body></html>", False, False),
    ("", False, False),
]


def test_meta_robots_flags_edge_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(CASES)], "i int, html string"
    )
    out = {
        r["i"]: (r["f"]["noindex"], r["f"]["nofollow"])
        for r in df.select(
            "i", meta_robots_flags(F.col("html")).alias("f")
        ).collect()
    }
    for i, (html, noindex, nofollow) in enumerate(CASES):
        assert out[i] == (noindex, nofollow), html


ANCHOR_CASES = [
    # (html, n_tags, n_follow)
    ('<a href="/a">x</a>', 1, 1),
    ('<a rel="nofollow" href="/a">x</a>', 1, 0),
    ('<a href="/a" rel="external nofollow">x</a>', 1, 0),
    ("<a href=/a rel=nofollow>x</a>", 1, 0),
    ('<A HREF="/a" REL="NOFOLLOW">x</A>', 1, 0),
    # rel on a different tag must not bleed into the anchor
    ('<link rel="nofollow"><a href="/a">x</a>', 1, 1),
    # <abbr>/<area> must not parse as anchors
    ("<abbr>t</abbr><a href=/a>x</a><area>", 1, 1),
    ('<a href="/a">x</a><a rel=nofollow href="/b">y</a><a href="/c">z</a>', 3, 2),
    ("no links here", 0, 0),
]


def test_anchor_nofollow_gating(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(ANCHOR_CASES)],
        "i int, html string",
    )
    tags = anchor_tags(F.col("html"))
    out = {
        r["i"]: (r["n"], r["nf"])
        for r in df.select(
            "i",
            F.size(tags).alias("n"),
            F.size(F.filter(tags, lambda t: ~tag_is_nofollow(t))).alias("nf"),
        ).collect()
    }
    for i, (html, n, nf) in enumerate(ANCHOR_CASES):
        assert out[i] == (n, nf), html


def test_tag_href_extraction(spark):
    df = spark.createDataFrame(
        [
            ('<a href="/q">x</a>', "/q"),
            ("<a href=/bare>x</a>", "/bare"),
            ("<a href='/sq'>x</a>", "/sq"),
            ("<a rel=nofollow>anchor without href</a>", ""),
        ],
        "tag string, want string",
    )
    bad = df.filter(tag_href(F.col("tag")) != F.col("want")).count()
    assert bad == 0


@pytest.mark.parametrize(
    "content,noindex,nofollow",
    [("noindex , nofollow", True, True), ("  none  ", True, True)],
)
def test_whitespace_tolerant_tokens(spark, content, noindex, nofollow):
    html = f'<meta name="robots" content="{content}">'
    row = (
        spark.range(1)
        .select(meta_robots_flags(F.lit(html)).alias("f"))
        .collect()[0]["f"]
    )
    assert (row["noindex"], row["nofollow"]) == (noindex, nofollow)
