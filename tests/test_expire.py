"""Snapshot expiry (plans/expire.py): after deleting everything the
kept manifests don't reference, every retained round loads
byte-identically; expired rounds are actually gone from disk."""

import os

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.plans.checkpoint import (
    crawl,
    load_metrics,
    load_state,
)
from pyppeteer_scraper_spark.plans.expire import expire_snapshots
from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables


def _snap(state):
    return (
        sorted(map(tuple, state.frontier.select("url", "state", "priority").collect())),
        sorted(r["url_hash"] for r in state.url_seen.collect()),
        sorted(map(tuple, state.workshops.collect())),
    )


def test_expire_keeps_recent_rounds_identical(spark, sf_small, tmp_path):
    t = generate_crawl_tables(spark, sf_small)
    ckpt = str(tmp_path / "exp")
    crawl(
        spark, t["pages"], t["seeds"], t["robots"], 4, ckpt,
        compact_every=2, incremental_frontier=True, n_buckets=8,
    )
    before_latest = _snap(load_state(spark, ckpt, 4))
    before_prev = _snap(load_state(spark, ckpt, 3))
    before_metrics = sorted(
        map(tuple, load_metrics(spark, ckpt, 4).collect())
    )

    res = expire_snapshots(ckpt, keep_last=2)
    assert res["kept_rounds"] == [3, 4]
    assert res["deleted"], "expiry on a 4-round crawl must delete something"

    # retained rounds unchanged, byte-for-byte
    assert _snap(load_state(spark, ckpt, 4)) == before_latest
    assert _snap(load_state(spark, ckpt, 3)) == before_prev
    assert sorted(
        map(tuple, load_metrics(spark, ckpt, 4).collect())
    ) == before_metrics

    # expired manifests are gone from disk
    for r in (0, 1, 2):
        assert not os.path.isdir(os.path.join(ckpt, f"round={r}"))
    # superseded url_seen deltas below every kept compacted pointer
    # (compact_every=2 -> kept loads at 3/4 read base round=4 or 2,
    #  min pointer 2 -> deltas <=2 deleted)
    seen_deltas = {
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(ckpt, "url_seen"))
        if d.startswith("round=")
    }
    assert seen_deltas <= {3, 4}

    # resume still works from the expired checkpoint
    res2 = crawl(
        spark, t["pages"], t["seeds"], t["robots"], 1, ckpt,
        resume=True, compact_every=2, incremental_frontier=True,
        n_buckets=8,
    )
    assert res2.state.round_no == 5
    assert res2.state.url_seen.count() >= len(before_latest[1])


def test_expire_preserves_edge_history(spark, sf_small, tmp_path):
    t = generate_crawl_tables(spark, sf_small)
    ckpt = str(tmp_path / "expe")
    crawl(
        spark, t["pages"], t["seeds"], t["robots"], 2, ckpt,
        track_edges=True,
    )
    from pyppeteer_scraper_spark.operators.linkrank import load_edges

    n_before = load_edges(spark, ckpt).count()
    expire_snapshots(ckpt, keep_last=1)
    # cumulative link-graph history is not a superseded snapshot
    assert load_edges(spark, ckpt).count() == n_before
