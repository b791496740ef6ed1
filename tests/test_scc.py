"""Round-4 session-10: t-bounded SCC certificates."""

from pyppeteer_scraper_spark.operators.linkrank import scc_certificates


def _rows(df):
    return {
        r["node"]: (r["fwd_min"], r["bwd_min"], r["in_scc"])
        for r in df.collect()
    }


def test_scc_cycle_certified_chain_not(spark):
    # 3-cycle a->b->c->a plus tail c->d: cycle members all see min 'a'
    # both directions; d reaches nothing smaller forward and is on no
    # cycle.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    got = _rows(scc_certificates(e, rounds=3))
    assert got["a"] == ("a", "a", 1)
    assert got["b"] == ("a", "a", 1)
    assert got["c"] == ("a", "a", 1)
    # d: fwd stays 'd' (no out-edges); bwd reaches back to 'a'
    assert got["d"] == ("d", "a", 0)


def test_scc_bound_is_monotone_in_rounds(spark):
    # 4-cycle: round 1 can't certify (min must travel 3 hops forward),
    # enough rounds can.  Soundness: in_scc never fires for the chain.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["src", "dst"]
    )
    r1 = _rows(scc_certificates(e, rounds=1))
    r3 = _rows(scc_certificates(e, rounds=3))
    assert sum(v[2] for v in r1.values()) <= sum(v[2] for v in r3.values())
    assert all(v == ("a", "a", 1) for v in r3.values())


def test_scc_two_components_keep_separate_minima(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")], ["src", "dst"]
    )
    got = _rows(scc_certificates(e, rounds=2))
    assert got["a"] == ("a", "a", 1) and got["b"] == ("a", "a", 1)
    assert got["x"] == ("x", "x", 1) and got["y"] == ("x", "x", 1)
