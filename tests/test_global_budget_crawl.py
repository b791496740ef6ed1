"""crawl(global_budget=K): round-level fetch capacity shared max-min
fairly across domains on top of per-domain politeness — budget
respected, allocation provably water-filled, no URL lost (unfunded
rows stay pending and get fetched in later rounds)."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.plans.checkpoint import crawl
from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

BUDGET = 25


def test_global_budget_caps_rounds_and_waterfills(spark, sf_small, tmp_path):
    t = generate_crawl_tables(spark, sf_small)
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    free = crawl(
        spark, pages, seeds, robots, 1, str(tmp_path / "free"),
        collect_outputs=True,
    )
    capped = crawl(
        spark, pages, seeds, robots, 1, str(tmp_path / "cap"),
        collect_outputs=True, global_budget=BUDGET,
    )

    # budget respected
    assert capped.fetched_per_round[0] <= BUDGET
    # demand exceeded the budget in this fixture (else the test is vacuous)
    assert free.fetched_per_round[0] > BUDGET

    # the allocation IS the max-min-fair water-fill of the unbudgeted
    # batch's per-domain counts (round 1 sees identical pending sets)
    def per_domain(out):
        return {
            r["domain"]: r["n"]
            for r in out.batch.groupBy("domain")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    demand = per_domain(free.outputs[0])
    got = per_domain(capped.outputs[0])

    alloc = {d: 0 for d in demand}
    remaining = BUDGET
    while remaining > 0:
        open_d = sorted(
            (demand[d], d) for d in demand if alloc[d] < demand[d]
        )
        if not open_d:
            break
        for _, d in open_d:
            if remaining == 0:
                break
            alloc[d] += 1
            remaining -= 1
    assert got == {d: a for d, a in alloc.items() if a > 0}


def test_global_budget_loses_no_urls(spark, sf_small, tmp_path):
    """Unfunded rows stay PENDING — never dropped.  (A convergence
    check "enough rounds fetches everything the free crawl fetched"
    would be wrong: discovered links can legitimately outrank unfunded
    seeds within a domain for many rounds.  The budget contract is
    no-loss + work conservation, so that is what we assert.)"""
    t = generate_crawl_tables(spark, sf_small)
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    free = crawl(spark, pages, seeds, robots, 1, str(tmp_path / "free"))
    free_fetched = {
        r["url"]
        for r in free.state.frontier.filter(F.col("state") == "fetched").collect()
    }
    assert len(free_fetched) > BUDGET  # budget actually binds below

    capped = crawl(
        spark, pages, seeds, robots, 3, str(tmp_path / "cap"),
        global_budget=BUDGET,
    )
    by_state = {"fetched": set(), "pending": set()}
    for r in capped.state.frontier.collect():
        by_state.setdefault(r["state"], set()).add(r["url"])

    # no loss: everything the free crawl fetched is fetched or pending
    # (same robots table, so none of it can be blocked)
    assert free_fetched <= (by_state["fetched"] | by_state["pending"])
    # work conservation: while the backlog exceeds the budget, every
    # round spends the WHOLE budget — never more, never less
    assert capped.fetched_per_round == [BUDGET] * 3
