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


def test_incremental_frontier_equals_full(spark, sf_small, tmp_path):
    """Bucketed incremental frontier checkpoints (only touched
    domain-buckets rewritten per round, Iceberg-MERGE emulation) must
    be state-identical to full rewrites, resumable mid-crawl, and must
    actually skip untouched buckets."""
    import json
    import os

    t = generate_crawl_tables(spark, sf_small)
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    full = crawl(spark, pages, seeds, robots, 3, str(tmp_path / "f"))
    inc_dir = str(tmp_path / "i")
    crawl(spark, pages, seeds, robots, 2, inc_dir, incremental_frontier=True)
    inc = crawl(
        spark, pages, seeds, robots, 1, inc_dir,
        resume=True, incremental_frontier=True,
    )
    assert _state_snapshot(inc.state) == _state_snapshot(full.state)

    # every intermediate round is individually loadable via its pointers
    for rnd in range(0, 4):
        st = load_state(spark, inc_dir, rnd)
        assert st.frontier.count() > 0

    # later rounds rewrite a strict subset of buckets; pointers span rounds
    with open(os.path.join(inc_dir, "round=3", "manifest.json")) as f:
        meta = json.load(f)["frontier"]
    assert meta["layout"] == "bucketed"
    rounds_pointed = set(meta["pointers"].values())
    assert len(rounds_pointed) > 1, "no bucket skipped a rewrite — not incremental"
    bdir3 = os.path.join(inc_dir, "frontier_buckets", "round=3")
    written3 = {n for n in os.listdir(bdir3) if n.startswith("__bucket=")}
    assert len(written3) < len(meta["pointers"]), "round 3 rewrote every bucket"
