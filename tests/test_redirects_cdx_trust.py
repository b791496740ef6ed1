"""Redirect resolution, DUST rule mining, CDX parsing, TrustRank."""

import pytest
from pyspark.sql import functions as F


def test_resolve_redirects_chains_and_cycle(spark):
    from pyppeteer_scraper_spark.operators.redirects import resolve_redirects

    # chain a->b->c->d (depth 3) + 2-cycle x<->y + self-contained hop e->f
    edges = spark.createDataFrame(
        [
            ("a", "b"),
            ("b", "c"),
            ("c", "d"),
            ("x", "y"),
            ("y", "x"),
            ("e", "f"),
        ],
        "src string, dst string",
    )
    out = {
        r["src"]: r
        for r in resolve_redirects(edges, iters=3).collect()
    }
    assert out["a"]["final"] == "d" and out["a"]["hops"] == 3
    assert out["a"]["resolved"] is True
    assert out["b"]["final"] == "d" and out["b"]["hops"] == 2
    assert out["e"]["final"] == "f" and out["e"]["hops"] == 1
    # cycle: 2**3 = 8 hops from x lands back on x, never resolves
    assert out["x"]["resolved"] is False
    assert out["x"]["hops"] == 8
    assert out["y"]["resolved"] is False


def test_resolve_redirects_depth_budget(spark):
    from pyppeteer_scraper_spark.operators.redirects import resolve_redirects

    # a 6-deep chain with iters=2 (budget 4) must NOT claim resolution
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    out = {r["src"]: r for r in resolve_redirects(edges, iters=2).collect()}
    assert out[0]["hops"] == 4 and out[0]["resolved"] is False
    assert out[3]["hops"] == 3 and out[3]["resolved"] is True


def test_dust_rules_support_and_veto(spark):
    from pyppeteer_scraper_spark.operators.redirects import dust_rules

    rows = []
    # utm is strippable on 3 paths; sid strippable on 1 (below support);
    # print changes content (veto)
    for p in range(3):
        rows.append((f"http://h.example/p{p}", f"d{p}"))
        rows.append((f"http://h.example/p{p}?utm=x", f"d{p}"))
    rows.append(("http://h.example/p0?sid=1", "d0"))
    rows.append(("http://h.example/p1?print=1", "OTHER"))
    pages = spark.createDataFrame(rows, "url string, digest string")
    out = {r["param"]: r for r in dust_rules(pages, min_support=2).collect()}
    assert out["utm"]["n_support"] == 3 and out["utm"]["safe"] is True
    assert out["sid"]["n_support"] == 1 and out["sid"]["safe"] is False
    assert out["print"]["n_contradict"] == 1 and out["print"]["safe"] is False


def test_parse_cdx_fields_and_quarantine(spark):
    from pyppeteer_scraper_spark.sources.cdx import parse_cdx

    good = (
        "com,example)/a 20240114083059 "
        '{"url": "https://example.com/a", "status": "301", '
        '"mime": "text/html", "digest": "sha1:AB12", "length": "512"}'
    )
    lines = spark.createDataFrame([(good,), ("garbage",)], "line string")
    rows = parse_cdx(lines).collect()
    bysurt = {r["surt"]: r for r in rows}
    g = bysurt["com,example)/a"]
    assert g["url"] == "https://example.com/a"
    assert g["status"] == 301 and g["length"] == 512
    assert g["digest"] == "sha1:AB12"
    assert g["fetch_ts"].strftime("%Y%m%d%H%M%S") == "20240114083059"
    bad = bysurt[None]
    assert bad["url"] is None and bad["status"] is None


def test_trustrank_mass_and_seed_locality(spark):
    from pyppeteer_scraper_spark.operators.linkrank import trustrank

    # star: seed s links to a,b; spam farm f1<->f2 unreachable from s
    edges = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "s"), ("f1", "f2"), ("f2", "f1")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], ["node"])
    t = {r["node"]: r["trust"] for r in trustrank(edges, seeds, iters=4).collect()}
    # probability mass conserved
    assert abs(sum(t.values()) - 1.0) < 1e-9
    # trust stays within link distance of the seed; spam farm gets zero
    assert t["f1"] == 0.0 and t["f2"] == 0.0
    assert t["s"] > t["a"] > 0
    assert t["a"] == pytest.approx(t["b"])


def test_trustrank_dangling_mass_returns_to_seeds(spark):
    from pyppeteer_scraper_spark.operators.linkrank import trustrank

    # d is dangling (no out-edges): its mass must teleport to the seed,
    # not be redistributed uniformly as in vanilla PageRank
    edges = spark.createDataFrame([("s", "d")], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], ["node"])
    # mass sloshes s->d->s each iteration in this 2-node graph; an even
    # iteration count lands it back concentrated on the seed
    t = {r["node"]: r["trust"] for r in trustrank(edges, seeds, iters=4).collect()}
    assert abs(sum(t.values()) - 1.0) < 1e-9
    assert t["s"] > t["d"] > 0
