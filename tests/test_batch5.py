"""Round-4 session-5 operators: boilerplate lines, PMI collocations,
int8 quantization, OPIC, calibration — hand-computed goldens plus the
invariants each operator must keep at scale."""

import math

import pytest
from pyspark.sql import Row, functions as F

from pyppeteer_scraper_spark.functions.classifier import calibration_bins
from pyppeteer_scraper_spark.functions.collocations import pmi_bigrams
from pyppeteer_scraper_spark.operators.boilerplate import (
    boilerplate_summary,
    strip_boilerplate,
)
from pyppeteer_scraper_spark.operators.linkrank import opic, pagerank
from pyppeteer_scraper_spark.operators.similarity import int8_quantize_stats


# ---------------------------------------------------------------- boiler


def _lines_df(spark):
    # host h1: "nav bar" on all 4 docs (boiler), "footer x" on 2 of 4
    # (boiler at min_docs=2/min_frac=0.5), "unique N" one-offs.
    rows = []
    for d in range(4):
        rows.append(("h1", d, "nav bar"))
        rows.append(("h1", d, f"unique {d}"))
    rows += [("h1", 0, "footer x"), ("h1", 1, "footer x")]
    # host h2: two docs, nothing repeats across docs
    rows += [("h2", 10, "nav bar"), ("h2", 11, "other line")]
    return spark.createDataFrame(rows, ["host", "doc_id", "line"])


def _host_docs(spark):
    return spark.createDataFrame(
        [("h1", 4), ("h2", 2)], ["host", "n_docs"]
    )


def test_boilerplate_summary_golden(spark):
    out = {
        r["host"]: r
        for r in boilerplate_summary(
            _lines_df(spark), _host_docs(spark), min_docs=2, min_frac=0.5
        ).collect()
    }
    h1 = out["h1"]
    # distinct lines: nav bar, footer x, unique 0..3 = 6
    assert h1["n_lines"] == 10 and h1["n_distinct_lines"] == 6
    assert h1["n_boiler_lines"] == 2  # nav bar (4/4), footer x (2/4)
    assert h1["n_boiler_instances"] == 6
    # chars: nav bar 7*4 + footer x 8*2 = 44 boiler; uniques 8*4 = 32
    assert h1["pct_chars_removed"] == pytest.approx(44 / 76, abs=1e-6)
    h2 = out["h2"]
    # "nav bar" appears once on h2 — host-scoped stats must NOT leak
    # h1's frequency across hosts
    assert h2["n_boiler_lines"] == 0 and h2["pct_chars_removed"] == 0.0


def test_strip_boilerplate_removes_exactly_the_flagged_set(spark):
    kept = strip_boilerplate(
        _lines_df(spark), _host_docs(spark), min_docs=2, min_frac=0.5
    ).collect()
    kept_h1 = sorted(r["line"] for r in kept if r["host"] == "h1")
    assert kept_h1 == ["unique 0", "unique 1", "unique 2", "unique 3"]
    # h2 keeps everything, including the line that is boiler ON h1
    assert sorted(r["line"] for r in kept if r["host"] == "h2") == [
        "nav bar",
        "other line",
    ]


# ------------------------------------------------------------------ pmi


def test_pmi_bigrams_golden(spark):
    # 4 docs: "a b" always adjacent; "c" frequent but never with "a"
    docs = spark.createDataFrame(
        [("a b c",), ("a b c",), ("a b",), ("c a b",)], ["text"]
    )
    out = {(r["w1"], r["w2"]): r for r in pmi_bigrams(docs, min_count=2, top_k=10).collect()}
    # unigrams: a=4 b=4 c=3, N_tok=11; bigrams: (a,b)=4 (b,c)=2 (c,a)=1, N_pair=7
    ab = out[("a", "b")]
    assert ab["n_pair"] == 4 and ab["n_w1"] == 4 and ab["n_w2"] == 4
    expect = math.log((4 / 7) / ((4 / 11) * (4 / 11)))
    assert ab["pmi"] == pytest.approx(expect, abs=1e-6)
    assert ("c", "a") not in out  # below min_count
    # ordering: strongest collocation first
    top = pmi_bigrams(docs, min_count=2, top_k=10).collect()[0]
    assert (top["w1"], top["w2"]) == ("a", "b")


def test_pmi_multispace_tokens_dropped(spark):
    docs = spark.createDataFrame([("a  b a  b a  b",)], ["text"])
    out = pmi_bigrams(docs, min_count=2, top_k=10).collect()
    # runs of spaces must not mint '' tokens or ('a','') pairs
    assert all(r["w1"] and r["w2"] for r in out)


# ----------------------------------------------------------------- int8


def test_int8_quantize_golden(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, label=0, embedding=[1.27, 0.0]),
            Row(vec_id=1, label=0, embedding=[-1.27, 0.635]),
        ]
    )
    out = int8_quantize_stats(emb).collect()
    assert len(out) == 1
    r = out[0]
    # scales: dim0 = 1.27/127 = 0.01, dim1 = 0.635/127 = 0.005 — every
    # value is an exact multiple of its scale, so reconstruction is
    # exact up to float64 rounding
    assert r["n_vecs"] == 2
    assert r["mse"] == pytest.approx(0.0, abs=1e-12)
    assert r["max_abs_err"] == pytest.approx(0.0, abs=1e-9)
    assert r["avg_cos_sim"] == pytest.approx(1.0, abs=1e-6)


def test_int8_error_bounded_by_half_step(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, label=i % 2, embedding=[rng.uniform(-2, 2) for _ in range(8)])
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows)
    flat_max = max(abs(x) for r in rows for x in r.embedding)
    out = int8_quantize_stats(emb).collect()
    # symmetric max-abs scaling never clamps, so |err| <= scale/2 with
    # scale <= global_max/127
    bound = flat_max / 127 / 2 + 1e-9
    for r in out:
        assert r["max_abs_err"] <= bound


# ----------------------------------------------------------------- opic


def test_opic_golden_two_nodes(spark):
    # a -> b, b -> a: cash just swaps each round; importance uniform
    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    out = {r["node"]: r["importance"] for r in opic(e, iters=3).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-9)
    assert out["b"] == pytest.approx(0.5, abs=1e-9)


def test_opic_mass_conservation_and_hub_detection(spark):
    # star into hub d; d feeds a and the DANGLING node e (no out-edges),
    # so the virtual-page redistribution path is exercised every round
    e = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d"), ("d", "a"), ("d", "e")],
        ["src", "dst"],
    )
    res = opic(e, iters=4).collect()
    total = sum(r["importance"] for r in res)
    assert total == pytest.approx(1.0, abs=1e-9)
    imp = {r["node"]: r["importance"] for r in res}
    assert imp["d"] == max(imp.values())  # the hub dominates
    # same ordering signal as pagerank on this graph
    pr = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    assert max(pr, key=pr.get) == "d"


# ---------------------------------------------------------- calibration


def test_calibration_bins_golden(spark):
    rows = [
        # bin 1 (0.1-0.2): two examples, scores .10/.20? (.20 -> bin 2)
        Row(score=0.10, label=True),
        Row(score=0.15, label=False),
        # bin 9 catches score == 1.0 (the least() clamp)
        Row(score=1.0, label=True),
        Row(score=0.95, label=True),
    ]
    out = {r["bin"]: r for r in calibration_bins(spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 9}
    b1, b9 = out[1], out[9]
    assert b1["n"] == 2 and b1["confidence"] == pytest.approx(0.125, abs=1e-6)
    assert b1["accuracy"] == pytest.approx(0.5, abs=1e-6)
    assert b9["n"] == 2 and b9["accuracy"] == pytest.approx(1.0, abs=1e-6)
    assert b9["confidence"] == pytest.approx(0.975, abs=1e-6)
    # ece = (2*|0.125-0.5| + 2*|0.975-1.0|) / 4
    expect = (2 * 0.375 + 2 * 0.025) / 4
    for r in out.values():
        assert r["ece"] == pytest.approx(expect, abs=1e-6)


def test_label_propagation_two_triangles_hand_computed(spark):
    """Two triangles {0,1,2} and {3,4,5} joined by the bridge 2-3:
    the hand-run of 3 deterministic sweeps (plurality, min-label
    ties) converges to community 0 on the left and 2 on the right —
    the bridge does NOT merge them."""
    from pyppeteer_scraper_spark.operators.linkrank import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        ["src", "dst"],
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iters=3).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}


def test_label_propagation_directed_input_is_symmetrized(spark):
    """A directed chain 0→1→2 must behave as the undirected path:
    after one sweep every node adopts its min neighbor's label."""
    from pyppeteer_scraper_spark.operators.linkrank import (
        label_propagation,
    )

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iters=1).collect()
    }
    # node0's only neighbor is 1; node1 ties {0,2}→0; node2's is 1
    assert out == {0: 1, 1: 0, 2: 1}


def test_logreg_train_matches_numpy_and_learns(spark):
    """The relational GD trainer reproduces the numpy reference
    trajectory exactly (same w0/lr/iterations), and on linearly
    separable data the learned weights actually classify: training
    accuracy > 0.9 after a few iterations."""
    import numpy as np

    from pyppeteer_scraper_spark.functions.classifier import (
        logreg_train_relational,
    )

    rng = np.random.default_rng(11)
    x = rng.standard_normal((200, 8))
    w_true = np.array([2.0, -1.5, 1.0, 0, 0, 0.5, -0.5, 0])
    y = (x @ w_true > 0).astype(float)
    df = spark.createDataFrame(
        [(list(map(float, xi)), float(yi)) for xi, yi in zip(x, y)],
        "embedding array<double>, y double",
    )
    got = np.array(
        logreg_train_relational(df, "embedding", "y", iters=5, lr=1.0))

    w = np.zeros(8)
    for _ in range(5):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        w = w - 1.0 * ((p - y)[:, None] * x).mean(axis=0)
    assert np.abs(got - w).max() < 1e-9

    acc = (((x @ got) > 0).astype(float) == y).mean()
    assert acc > 0.9, acc
    # direction aligns with the generating weights
    cos = (got @ w_true) / (
        np.linalg.norm(got) * np.linalg.norm(w_true))
    assert cos > 0.8, cos


def test_triangle_stats_hand_computed(spark):
    """Triangle 0-1-2 with pendant 3 and an isolated edge 4-5: the
    triangle nodes count 1 with clustering 1.0 (node 2's extra pendant
    edge drops its coefficient to 1/3), degree-1 nodes get 0."""
    from pyppeteer_scraper_spark.operators.linkrank import (
        triangle_stats,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (4, 5)], ["src", "dst"])
    out = {r["node"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_stats(edges).collect()}
    assert out[0] == (2, 1, 1.0)
    assert out[1] == (2, 1, 1.0)
    assert out[2] == (3, 1, round(2 * 1 / (3 * 2), 6))
    assert out[3] == (1, 0, 0.0)
    assert out[4] == (1, 0, 0.0)
    assert out[5] == (1, 0, 0.0)


def test_triangle_stats_k4_and_direction_invariance(spark):
    """K4: every node sits in C(3,2)=3 triangles, clustering 1.0; and
    reversed/duplicated directed edges do not change the undirected
    counts."""
    from pyppeteer_scraper_spark.operators.linkrank import (
        triangle_stats,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + k4[:3]
    out = {r["node"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_stats(
               spark.createDataFrame(noisy, ["src", "dst"])).collect()}
    for n in range(4):
        assert out[n] == (3, 3, 1.0)
