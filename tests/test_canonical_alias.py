"""rel=canonical alias extraction (operators/redirects.py)."""

from pyppeteer_scraper_spark.operators.redirects import (
    canonical_link_aliases,
)


def test_canonical_parser_edge_cases(spark):
    cases = [
        # (url, html, want_canonical, want_self, want_cross)
        (
            "https://a.example/p/1",
            '<link rel="canonical" href="https://a.example/p/1">',
            "https://a.example/p/1", True, False,
        ),
        (  # uppercase tag + attribute names, unquoted values
            "https://a.example/p/2",
            "<LINK REL=canonical HREF=/c/2>",
            "https://a.example/c/2", False, False,
        ),
        (  # extra attributes between rel and href
            "https://a.example/p/3",
            '<link rel="canonical" type="text/html" '
            'href="//b.example/x">',
            "https://b.example/x", False, True,
        ),
        (  # relative with dot segments, resolved per RFC 3986
            "https://a.example/d/e/p",
            '<link rel="canonical" href="../q">',
            "https://a.example/d/q", False, False,
        ),
        (  # decoy links only — no canonical
            "https://a.example/p/4",
            '<link rel="stylesheet" href="/s.css">'
            '<link rel="icon" href="/i.png">',
            None, False, False,
        ),
        (  # canonical declared via href-then-rel
            "https://a.example/p/5",
            "<link href='https://a.example/p/5' rel='canonical'>",
            "https://a.example/p/5", True, False,
        ),
    ]
    df = spark.createDataFrame(
        [(u, h) for u, h, *_ in cases], ["url", "html"]
    )
    got = {r["url"]: r for r in canonical_link_aliases(df).collect()}
    for u, _, want, self_, cross in cases:
        r = got[u]
        assert r["canonical_url"] == want, (u, r)
        assert r["is_self"] == self_, (u, r)
        assert r["cross_host"] == cross, (u, r)
