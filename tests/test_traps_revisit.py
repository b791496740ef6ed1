"""Crawl-trap detection (operators/traps.py) and adaptive revisit
scheduling (operators/revisit.py) — planted golden cases; the
corpus-scale parity lives in `q:rank_trap_patterns` /
`q:d6_adaptive_revisit`."""

import math
from datetime import datetime

from pyspark.sql import functions as F


def test_trap_patterns_flags_exploding_template(spark):
    from pyppeteer_scraper_spark.operators.traps import trap_patterns

    rows = [("cal.example", f"/cal/2024-01-{d:02d}") for d in range(1, 31)]
    rows += [("cal.example", "/cal/2024-01-05")] * 3  # repeat hits
    rows += [("shop.example", f"/p/{i}") for i in range(5)] * 4
    urls = spark.createDataFrame(rows, "domain string, path string")
    out = {
        (r["domain"], r["pattern"]): r
        for r in trap_patterns(urls, min_distinct_urls=10).collect()
    }
    cal = out[("cal.example", "/cal/N-N-N")]
    assert cal["n_urls"] == 30 and cal["n_hits"] == 33
    assert cal["is_trap"] == 1
    shop = out[("shop.example", "/p/N")]
    assert shop["n_urls"] == 5 and shop["n_hits"] == 20
    assert shop["is_trap"] == 0


def test_demote_trap_urls_only_pending_matching_rows(spark):
    from pyppeteer_scraper_spark.operators.traps import (
        demote_trap_urls,
        trap_patterns,
    )

    urls = spark.createDataFrame(
        [("cal.example", f"/cal/{i}") for i in range(20)],
        "domain string, path string",
    )
    traps = trap_patterns(urls, min_distinct_urls=10)
    frontier = spark.createDataFrame(
        [
            ("https://cal.example/cal/99", "cal.example", 1, "pending"),
            ("https://cal.example/cal/7", "cal.example", 0, "fetched"),
            ("https://cal.example/about", "cal.example", 1, "pending"),
            ("https://other.example/cal/3", "other.example", 1, "pending"),
            ("https://cal.example/cal/1", "cal.example", 5, "pending"),
        ],
        "url string, domain string, priority int, state string",
    )
    out = {
        r["url"]: r["priority"]
        for r in demote_trap_urls(frontier, traps, demoted_priority=3).collect()
    }
    assert out == {
        "https://cal.example/cal/99": 3,   # pending + trap template
        "https://cal.example/cal/7": 0,    # fetched: untouched
        "https://cal.example/about": 1,    # different template
        "https://other.example/cal/3": 1,  # different domain
        "https://cal.example/cal/1": 5,    # already demoted further
    }
    assert set(out) == {r["url"] for r in frontier.collect()}


def test_traps_demote_live_frontier_between_legs(spark, sf_small, tmp_path):
    """Close the loop into the live scheduler, mirroring the link-rank
    hook: after a crawl leg, trap templates mined from the frontier's
    own URLs demote matching pending rows (the datagen mega-host's
    unbounded /pN template is exactly the trap shape), touching nothing
    else — ready for the next resume leg."""
    from pyppeteer_scraper_spark.operators.traps import (
        demote_trap_urls,
        strip_scheme_host,
        trap_patterns,
    )
    from pyppeteer_scraper_spark.plans.checkpoint import crawl
    from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

    t = generate_crawl_tables(spark, sf_small)
    res = crawl(
        spark, t["pages"], t["seeds"], t["robots"], 2,
        str(tmp_path / "trapleg"),
    )
    frontier = res.state.frontier
    urls = frontier.select(
        "domain", strip_scheme_host(F.col("url")).alias("path")
    )
    # threshold at the largest template: only the mega-host trips
    counts = trap_patterns(urls, min_distinct_urls=1)
    top = counts.agg(F.max("n_urls").alias("m")).collect()[0]["m"]
    traps = trap_patterns(urls, min_distinct_urls=top)
    n_traps = traps.filter(F.col("is_trap") == 1).count()
    assert 1 <= n_traps < counts.count()

    out = demote_trap_urls(frontier, traps, demoted_priority=3)
    assert out.columns == frontier.columns
    before = {
        r["url"]: (r["priority"], r["state"], r["domain"])
        for r in frontier.collect()
    }
    trap_keys = {
        (r["domain"], r["pattern"])
        for r in traps.filter(F.col("is_trap") == 1).collect()
    }
    import re

    demoted = 0
    for r in out.collect():
        p0, st, dom = before[r["url"]]
        path = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]*", "", r["url"])
        pat = re.sub(r"[0-9]+", "N", path)
        if st == "pending" and (dom, pat) in trap_keys:
            assert r["priority"] == max(p0, 3)
            if r["priority"] != p0:
                demoted += 1
        else:
            assert r["priority"] == p0, r["url"]
    assert demoted > 0


def test_change_rate_schedule_hand_computed(spark):
    from pyppeteer_scraper_spark.operators.revisit import (
        change_rate_schedule,
    )

    def ts(day):
        return datetime(2024, 1, day)

    obs = spark.createDataFrame(
        [
            # hot page: 4 obs daily, every interval changed
            (1, ts(1), 0), (1, ts(2), 1), (1, ts(3), 1), (1, ts(4), 1),
            # cold page: 4 obs daily, never changed
            (2, ts(1), 0), (2, ts(2), 0), (2, ts(3), 0), (2, ts(4), 0),
            # single observation: unknown -> max interval
            (3, ts(1), 0),
        ],
        "page long, ts timestamp, changed int",
    )
    out = {r["page"]: r for r in change_rate_schedule(obs).collect()}
    # page 1: n=3 intervals, X=3, i_bar=1 day
    lam1 = -math.log((3 - 3 + 0.5) / (3 + 0.5)) / 1.0
    assert out[1]["lambda_hat"] == round(lam1, 6)
    assert out[1]["revisit_days"] == round(1.0 / lam1, 6)
    # page 2: X=0 -> the +0.5 bias correction keeps the rate finite
    lam2 = -math.log((3 - 0 + 0.5) / (3 + 0.5)) / 1.0
    assert lam2 == 0.0  # n-X+0.5 == n+0.5 when X=0
    assert out[2]["n_changes"] == 0
    # 1/0 clamps to the 30-day cap via least()
    assert out[2]["revisit_days"] == 30.0
    # page 3: single obs
    assert out[3]["lambda_hat"] == 0.0 and out[3]["revisit_days"] == 30.0
    # hot page recrawls sooner than cold page
    assert out[1]["revisit_days"] < out[2]["revisit_days"]


def test_change_rate_schedule_floor_clamp(spark):
    from pyppeteer_scraper_spark.operators.revisit import (
        change_rate_schedule,
    )

    # changes every 10 minutes -> 1/lambda far below the 1h floor
    obs = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 10 * i), 1 if i else 0)
            for i in range(6)
        ],
        "page long, ts timestamp, changed int",
    )
    out = change_rate_schedule(obs).collect()[0]
    assert out["revisit_days"] == round(1.0 / 24, 6)
