"""Resume-from-checkpoint exactness + parallelism invariance
(SURVEY.md §5 items 4-5)."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.plans.checkpoint import crawl, load_state
from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables


def _state_snapshot(state):
    frontier = sorted(
        (r["url"], r["priority"], r["depth"], r["state"])
        for r in state.frontier.collect()
    )
    seen = sorted((r["url"], r["first_seen_round"]) for r in state.url_seen.collect())
    ws = sorted(
        (r["event_code"], r["is_registered"], r["discovered_round"])
        for r in state.workshops.collect()
    )
    return frontier, seen, ws


def test_resume_equals_uninterrupted(spark, sf_small, tmp_path):
    t = generate_crawl_tables(spark, sf_small)
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    full = crawl(spark, pages, seeds, robots, 3, str(tmp_path / "full"))

    # interrupted: 2 rounds, then a fresh resume (simulating a restart —
    # state is reloaded purely from the checkpoint dir) for 1 more
    crawl(spark, pages, seeds, robots, 2, str(tmp_path / "part"))
    resumed = crawl(
        spark, pages, seeds, robots, 1, str(tmp_path / "part"), resume=True
    )

    assert resumed.state.round_no == full.state.round_no == 3
    assert _state_snapshot(resumed.state) == _state_snapshot(full.state)

    # every intermediate round remains individually loadable (lineage)
    for rnd in range(0, 3):
        st = load_state(spark, str(tmp_path / "full"), rnd)
        assert st.round_no == rnd
        assert st.url_seen.filter(F.col("first_seen_round") > rnd).count() == 0


def test_partitioning_invariance(spark, sf_small, tmp_path):
    """Same results regardless of shuffle parallelism — the in-process
    proxy for the local[8]-vs-local[32] scaling invariance (the real
    two-master comparison runs in bench_scaling.py)."""
    t = generate_crawl_tables(spark, sf_small)
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = crawl(spark, pages, seeds, robots, 2, str(tmp_path / "p3"))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = crawl(spark, pages, seeds, robots, 2, str(tmp_path / "p17"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert _state_snapshot(a.state) == _state_snapshot(b.state)
