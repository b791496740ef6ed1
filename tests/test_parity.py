"""Engine-vs-oracle parity: crawl order, URL-seen set, byte-identical
extracted text, and workshop decisions (SURVEY.md §5 item 2)."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.plans.checkpoint import crawl
from pyppeteer_scraper_spark.plans.oracle import simulate
from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

N_ROUNDS = 3


def run_both(spark, sf_dir, tmp_path):
    t = generate_crawl_tables(spark, sf_dir)
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    result = crawl(
        spark,
        pages,
        seeds,
        robots,
        n_rounds=N_ROUNDS,
        ckpt_dir=str(tmp_path / "ckpt"),
        collect_outputs=True,
    )
    oracle = simulate(
        pages.toPandas(), seeds.toPandas(), robots.toPandas(), N_ROUNDS
    )
    return result, oracle


def test_crawl_parity(spark, sf_small, tmp_path):
    result, oracle = run_both(spark, sf_small, tmp_path)
    state = result.state

    # --- URL-seen set parity (canonical URLs + first-seen round)
    seen_engine = {
        (r["url"], r["first_seen_round"]) for r in state.url_seen.collect()
    }
    seen_oracle = set(oracle.seen.items())
    assert seen_engine == seen_oracle

    # --- crawl-order parity per round, under the total order
    eng_seen = state.url_seen.toPandas()
    for rnd in range(1, N_ROUNDS + 1):
        got = sorted(
            eng_seen[eng_seen["first_seen_round"] == rnd]["url"].tolist()
        )
        want = sorted(oracle.batches[rnd - 1])
        assert got == want, f"round {rnd}: {len(got)} vs {len(want)}"

    # --- byte-identical extracted text per url
    frontier = state.frontier.toPandas()
    fetched_urls = set(frontier[frontier["state"] == "fetched"]["url"])
    assert fetched_urls == set(oracle.texts)

    # engine texts from the per-round outputs is not retained after
    # checkpoint reload; re-extract from the final fetched set instead
    from pyppeteer_scraper_spark.plans.extract import extract_pages
    from pyppeteer_scraper_spark.plans.round import prepare_pages

    t = generate_crawl_tables(spark, sf_small)
    pp = prepare_pages(t["pages"])
    fetched_df = pp.join(
        state.frontier.filter(F.col("state") == "fetched").select("url"), "url"
    )
    texts = {
        r["url"]: r["text"] for r in extract_pages(fetched_df).collect()
    }
    assert texts == oracle.texts
    for u, txt in texts.items():
        assert txt.encode() == oracle.texts[u].encode()

    # --- workshop decisions (alert/register) parity
    ws_engine = {
        r["event_code"]: (r["is_registered"], r["seats_taken"])
        for r in state.workshops.collect()
    }
    ws_oracle = {
        c: (w["is_registered"], w["seats_taken"]) for c, w in oracle.workshops.items()
    }
    assert ws_engine == ws_oracle
    assert len(ws_engine) > 0, "fixture should surface at least one workshop"
    assert any(reg for reg, _ in ws_engine.values()), "register rule should fire"
    assert not all(reg for reg, _ in ws_engine.values()), "10:30 variant should not register"

    # --- politeness: no domain ever exceeds its per-round cap
    robots_pd = t["robots"].toPandas().set_index("domain")
    from pyppeteer_scraper_spark.plans.oracle import _domain

    for rnd in range(1, N_ROUNDS + 1):
        per_dom: dict[str, int] = {}
        for u in oracle.batches[rnd - 1]:
            per_dom[_domain(u)] = per_dom.get(_domain(u), 0) + 1
        for dom, n in per_dom.items():
            cap = int(robots_pd.loc[dom, "max_per_round"]) if dom in robots_pd.index else 4
            assert n <= cap, f"round {rnd} domain {dom}: {n} > cap {cap}"

    # --- blocked domains yield zero fetches
    blocked_domains = set(robots_pd[~robots_pd["allow"]].index)
    for u in oracle.seen:
        assert _domain(u) not in blocked_domains
