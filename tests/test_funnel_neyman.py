"""Funnel conversion and Neyman allocation pins."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.plans.queries import QUERIES


def test_funnel_hand_corpus(spark, tmp_path):
    rows = [
        # user 1: signup then purchase -> converted
        (1, "2024-01-01 00:00:00", 1, "signup", 1.0, "{}"),
        (2, "2024-01-01 02:00:00", 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE signup only -> not converted
        (3, "2024-01-01 00:00:00", 2, "purchase", 1.0, "{}"),
        (4, "2024-01-01 01:00:00", 2, "signup", 1.0, "{}"),
        # user 3: no signup -> excluded
        (5, "2024-01-01 00:00:00", 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path)
    df.write.parquet(f"{d}/events.parquet")
    out = {
        r["user_id"]: r
        for r in QUERIES["a_event_funnel"](spark, d).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["converted"] is True
    assert out[1]["hrs_to_convert"] == 2.0
    assert out[2]["converted"] is False
    assert out[2]["purchase_ts"] is None


def test_neyman_allocation_sums_to_budget(spark, sf_small):
    out = QUERIES["sample_neyman_allocation"](spark, sf_small).collect()
    assert sum(r["alloc"] for r in out) == 1000
    # proportionality: the largest N_h*sd_h stratum gets the most
    key = {r["event_type"]: r["n_h"] * r["sd_h"] for r in out}
    alloc = {r["event_type"]: r["alloc"] for r in out}
    top = max(key, key=key.get)
    assert alloc[top] == max(alloc.values())
