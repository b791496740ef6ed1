"""HITS ranks and robots URL matching (RFC 9309 semantics)."""

import re

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.robotstxt import (
    match_robots,
    robots_pattern_regex,
)
from pyppeteer_scraper_spark.operators.linkrank import hits


# Google's robots.txt spec example table (same content as RFC 9309
# §2.2.2's wildcard examples): (pattern, path, should_match)
SPEC_EXAMPLES = [
    ("/fish", "/fish", True),
    ("/fish", "/fish.html", True),
    ("/fish", "/fishheads/yummy.html", True),
    ("/fish", "/Fish.asp", False),
    ("/fish", "/catfish", False),
    ("/fish", "/desert/fish", False),
    ("/fish*", "/fish.html", True),
    ("/fish*", "/catfish", False),
    ("/fish/", "/fish/", True),
    ("/fish/", "/fish/salmon.htm", True),
    ("/fish/", "/fish", False),
    ("/fish/", "/fish.html", False),
    ("/*.php", "/index.php", True),
    ("/*.php", "/folder/filename.php", True),
    ("/*.php", "/", False),
    ("/*.php", "/windows.PHP", False),
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/folder/filename.php", True),
    ("/*.php$", "/filename.php?parameters", False),
    ("/*.php$", "/filename.php/", False),
    ("/fish*.php", "/fish.php", True),
    ("/fish*.php", "/fishheads/catfish.php?parameters", True),
    ("/fish*.php", "/Fish.PHP", False),
]


def test_pattern_regex_matches_rfc_examples():
    for pattern, path, want in SPEC_EXAMPLES:
        rx = robots_pattern_regex(pattern)
        got = re.search(rx, path) is not None
        assert got == want, (pattern, rx, path, want)


def test_match_robots_precedence(spark):
    # longest pattern wins; Allow wins length ties; no match -> allowed
    rules = spark.createDataFrame(
        [
            ("d", "/p", robots_pattern_regex("/p"), False),
            ("d", "/page", robots_pattern_regex("/page"), True),
            ("d", "/pagf", robots_pattern_regex("/pagf"), False),
        ],
        ["domain", "pattern", "regex", "allow"],
    )
    urls = spark.createDataFrame(
        [("d", "/page"), ("d", "/pa"), ("d", "/other")],
        ["domain", "path"],
    )
    got = {
        r["path"]: (r["allowed"], r["matched_pattern"])
        for r in match_robots(urls, rules).collect()
    }
    assert got["/page"] == (True, "/page")  # longest match wins
    assert got["/pa"] == (False, "/p")
    assert got["/other"] == (True, None)  # unmatched -> allowed


def test_match_robots_allow_wins_length_tie(spark):
    rules = spark.createDataFrame(
        [
            ("d", "/dir1", robots_pattern_regex("/dir1"), False),
            ("d", "/dir*", robots_pattern_regex("/dir*"), True),
        ],
        ["domain", "pattern", "regex", "allow"],
    )
    urls = spark.createDataFrame([("d", "/dir1/x")], ["domain", "path"])
    row = match_robots(urls, rules).collect()[0]
    assert row["allowed"] is True  # equal length 5, Allow wins


def test_hits_invariants(spark):
    # star graph: hub h points to a1..a3; a1 also points to h
    edges = spark.createDataFrame(
        [("h", "a1"), ("h", "a2"), ("h", "a3"), ("a1", "h")],
        ["src", "dst"],
    )
    out = {r["node"]: r for r in hits(edges, iters=2).collect()}
    # L1 normalization: both distributions sum to 1
    assert sum(r["hub"] for r in out.values()) == pytest.approx(1.0)
    assert sum(r["authority"] for r in out.values()) == pytest.approx(1.0)
    # h is the dominant hub; a1..a3 are the authorities
    assert out["h"]["hub"] == max(r["hub"] for r in out.values())
    assert out["h"]["authority"] < out["a1"]["authority"]
    for a in ("a1", "a2", "a3"):
        assert out[a]["hub"] <= out["a1"]["hub"]
    # a1..a3 receive equal authority from the single hub
    assert out["a1"]["authority"] == pytest.approx(out["a2"]["authority"])
