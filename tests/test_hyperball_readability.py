"""Round-4 session-10: HyperBall sketches + readability features."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.text import readability_features
from pyppeteer_scraper_spark.operators.hyperball import (
    ball_summary,
    hyperball,
    node_registers,
)


def test_hyperball_chain_matches_exact_ball_registers(spark):
    # chain a->b->c->d, t=2: ball(a)={a,b,c}, ball(b)={b,c,d},
    # ball(c)={c,d}, ball(d)={d}.  HyperBall's merged registers must
    # equal the registers derived directly from each exact ball.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {
        (r["node"], r["bucket"], r["rho"])
        for r in hyperball(e, t=2, p=8).collect()
    }
    balls = {
        "a": ["a", "b", "c"],
        "b": ["b", "c", "d"],
        "c": ["c", "d"],
        "d": ["d"],
    }
    pairs = [(n, m) for n, ms in balls.items() for m in ms]
    members = spark.createDataFrame(pairs, ["owner", "member"])
    exact = (
        members.join(
            node_registers(
                members.select(F.col("member").alias("node")).distinct(),
                "node",
                p=8,
            ).withColumnRenamed("node", "member"),
            "member",
        )
        .groupBy(F.col("owner").alias("node"), "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    want = {(r["node"], r["bucket"], r["rho"]) for r in exact.collect()}
    assert got == want


def test_hyperball_t0_is_singletons_and_summary_counts(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    regs = hyperball(e, t=0, p=8)
    assert regs.count() == 2  # one register per node at t=0
    s = {r["node"]: r for r in ball_summary(regs, p=8).collect()}
    for n in ("a", "b"):
        assert s[n]["n_filled"] == 1
        assert s[n]["frac"] == 2.0 ** -s[n]["sum_rho"]


def test_readability_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran!")], ["doc_id", "text"]
    )
    f = readability_features(F.col("text"))
    row = df.select(
        *[f[k].alias(k) for k in
          ("n_words", "n_sentences", "n_syllables", "flesch_ease",
           "fk_grade")]
    ).collect()[0]
    # words: single-space split -> 5; sentences: 2 non-blank segments;
    # vowel groups of "the cat sat. it ran!": e,a,a,i,a -> 5
    assert row["n_words"] == 5
    assert row["n_sentences"] == 2
    assert row["n_syllables"] == 5
    assert row["flesch_ease"] == round(
        206.835 - 1.015 * 2.5 - 84.6 * 1.0, 4
    )
    assert row["fk_grade"] == round(0.39 * 2.5 + 11.8 * 1.0 - 15.59, 4)


def test_readability_no_terminal_punct_counts_one_sentence(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    f = readability_features(F.col("text"))
    row = df.select(f["n_sentences"].alias("s")).collect()[0]
    assert row["s"] == 1


def test_harmonic_estimates_close_to_exact(spark):
    from pyppeteer_scraper_spark.operators.hyperball import (
        harmonic_estimates,
    )

    # directed graph: star out of 'h' plus a 2-chain; exact t<=2
    # truncated harmonic H(v) = sum_{0<d(v,u)<=2} 1/d(v,u).
    edges = [("h", f"s{i}") for i in range(6)] + [("s0", "x"), ("x", "y")]
    e = spark.createDataFrame(edges, ["src", "dst"])
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    nodes = {a for a, _ in edges} | {b for _, b in edges}

    def exact(v, t_max=2):
        dist = {v: 0}
        frontier = [v]
        for d in range(1, t_max + 1):
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        return sum(1.0 / d for d in dist.values() if d > 0)

    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_estimates(e, t_max=2, p=8).collect()
    }
    for v in nodes:
        want = exact(v)
        assert abs(got[v] - want) <= max(0.35, 0.06 * want), (v, got[v], want)
