"""Engine-vs-oracle parity: crawl order (including revisit cadence),
URL-seen set, byte-identical extracted text, and two-phase workshop
decisions (SURVEY.md §5 item 2)."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.plans.checkpoint import crawl
from pyppeteer_scraper_spark.plans.oracle import simulate
from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

N_ROUNDS = 4


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
    return t, result, oracle


def test_crawl_parity(spark, sf_small, tmp_path):
    t, result, oracle = run_both(spark, sf_small, tmp_path)
    state = result.state

    # --- crawl-order parity per round (revisits included)
    assert result.outputs is not None
    for rnd, out in enumerate(result.outputs, start=1):
        got = sorted(r["url"] for r in out.batch.select("url").collect())
        want = sorted(oracle.batches[rnd - 1])
        assert got == want, f"round {rnd}: {len(got)} vs {len(want)}"
        # revisit cadence: priority-0 seeds re-fetched every round
        if rnd >= 2:
            assert len(set(got) & set(oracle.batches[0])) > 0, "no revisits"

    # --- URL-seen set parity (canonical URLs + first-seen round; a
    # revisited URL must appear exactly once)
    seen_engine = sorted(
        (r["url"], r["first_seen_round"]) for r in state.url_seen.collect()
    )
    assert len({u for u, _ in seen_engine}) == len(seen_engine)
    assert seen_engine == sorted(oracle.seen.items())

    # --- byte-identical extracted text per url
    from pyppeteer_scraper_spark.plans.extract import extract_pages
    from pyppeteer_scraper_spark.plans.round import prepare_pages

    pp = prepare_pages(t["pages"])
    fetched_df = pp.join(
        state.frontier.filter(F.col("state") == "fetched").select("url"), "url"
    )
    texts = {r["url"]: r["text"] for r in extract_pages(fetched_df).collect()}
    assert set(texts) <= set(oracle.texts)
    for u, txt in texts.items():
        assert txt.encode() == oracle.texts[u].encode()

    # --- per-round action parity (alert-until-registered semantics)
    for rnd, out in enumerate(result.outputs, start=1):
        got = sorted(
            (r["event_code"], r["register"]) for r in out.actions.collect()
        )
        assert got == oracle.actions[rnd - 1], f"actions round {rnd}"

    # --- error-path parity: exactly one error row per failure per round
    # (fetch miss / bad JSON / missing key), reference-faithful texts;
    # empty workshop lists raise NO error
    any_errors = False
    for rnd, out in enumerate(result.outputs, start=1):
        rows = out.errors.collect()
        got = sorted((r["url"], r["error_kind"]) for r in rows)
        assert got == oracle.errors[rnd - 1], f"errors round {rnd}"
        assert len(got) == len(set(got)), "duplicate error rows"
        any_errors = any_errors or bool(got)
        for r in rows:
            if r["error_kind"] == "json_parse":
                assert r["error_message"] == "JSON parsing error"
            elif r["error_kind"] == "missing_key":
                assert "missing expected" in r["error_message"]
            elif r["error_kind"] == "fetch_empty":
                assert "empty" in r["error_message"].lower()
    assert any_errors, "fixture should exercise the error paths"
    kinds = {
        r["error_kind"] for out in result.outputs for r in out.errors.collect()
    }
    assert kinds == {"fetch_empty", "json_parse", "missing_key"}

    # --- retry/fallback parity: fallback-only pages are fetched on
    # attempt 2, primary pages on attempt 1
    att_engine = {
        r["url"]: r["fetch_attempt"]
        for r in state.frontier.filter(F.col("state") == "fetched").collect()
    }
    att_oracle = {
        u: a for u, a in oracle.fetch_attempts.items() if u in att_engine
    }
    assert att_engine == att_oracle
    assert 2 in att_engine.values(), "fixture should exercise the fallback"

    # --- final workshop state parity (two-phase: registered is monotonic)
    eng = (
        state.workshops.groupBy("event_code")
        .agg(
            F.max("is_registered").alias("reg"),
            F.min("discovered_round").alias("disc"),
        )
        .collect()
    )
    ws_engine = {r["event_code"]: (r["reg"], r["disc"]) for r in eng}
    ws_oracle = {
        c: (w["is_registered"], w["discovered_round"])
        for c, w in oracle.workshops.items()
    }
    assert ws_engine == ws_oracle
    assert len(ws_engine) > 0, "fixture should surface at least one workshop"
    assert any(reg for reg, _ in ws_engine.values()), "register rule should fire"
    assert not all(reg for reg, _ in ws_engine.values()), "10:30 variant must stay unregistered"

    # unregistered events re-alert on revisit rounds
    all_actions = [c for acts in oracle.actions for c, _ in acts]
    assert len(all_actions) > len(set(all_actions)), "expected repeat alerts"

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


def test_crawl_delay_parity(spark, sf_small, tmp_path):
    """crawl_delay_ms is ENFORCED (VERDICT r2 'What's wrong' #2): a
    binding mega-host delay scales its per-round cap down, and a delay
    past the round window defers whole domains to crc32-phased
    skip-round turns — engine ≡ oracle under both."""
    from zlib import crc32

    from pyppeteer_scraper_spark.plans.oracle import _domain
    from pyppeteer_scraper_spark.plans.round import ROUND_INTERVAL_MS
    from pyppeteer_scraper_spark.sources.datagen import MEGA_HOST, generate_robots

    t = generate_crawl_tables(spark, sf_small)
    # mega delay 12 s → effective cap floor(60000/12000)=5, tighter than
    # its max_per_round=8; hash%7==3 domains get 180 s → stride-3 turns.
    robots = generate_robots(t["pages"], mega_delay_ms=12_000, slow_tier_mod=7)
    result = crawl(
        spark, t["pages"], t["seeds"], robots,
        n_rounds=N_ROUNDS, ckpt_dir=str(tmp_path / "ckpt"),
        collect_outputs=True,
    )
    oracle = simulate(
        t["pages"].toPandas(), t["seeds"].toPandas(), robots.toPandas(), N_ROUNDS
    )

    mega_eff_cap = ROUND_INTERVAL_MS // 12_000
    slow_domains = {
        r["domain"]
        for r in robots.filter(F.col("crawl_delay_ms") == 180_000).collect()
    }
    assert slow_domains, "slow tier must be non-empty for this test to bite"

    delay_bound_seen = False
    for rnd, out in enumerate(result.outputs, start=1):
        got = sorted(r["url"] for r in out.batch.select("url").collect())
        assert got == sorted(oracle.batches[rnd - 1]), f"round {rnd}"
        mega_n = sum(1 for u in got if _domain(u) == MEGA_HOST)
        assert mega_n <= mega_eff_cap
        delay_bound_seen = delay_bound_seen or mega_n == mega_eff_cap
        for u in got:
            dom = _domain(u)
            if dom in slow_domains:
                assert rnd % 3 == crc32(dom.encode()) % 3, (
                    f"slow domain {dom} fetched off-turn in round {rnd}"
                )
    assert delay_bound_seen, "mega delay should bind (cap 5 < max_per_round 8)"
    assert any(
        _domain(u) in slow_domains for b in oracle.batches for u in b
    ), "some slow-tier domain should get a turn within 4 rounds"
