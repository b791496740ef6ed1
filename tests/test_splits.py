"""Corpus split / stratified sample / decontamination tests
(operators/splits.py).

Reference has no split notion (it emits alerts, not datasets) — these
cover the training-pipeline extension surface: deterministic membership,
fraction accuracy, growth stability, and leakage detection with exact
recall on planted duplicates.
"""

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.splits import (
    _threshold_hex,
    hash_split,
    split_exact_contamination,
    split_neardup_contamination,
    stratified_hash_sample,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_threshold_literals_match_registry_sql():
    """The DuckDB oracle SQL hardcodes threshold hex literals; they must
    equal the operator helper's output or engine and oracle silently
    diverge."""
    assert _threshold_hex(0.90) == "e66666"
    assert _threshold_hex(0.95) == "f33333"
    assert _threshold_hex(0.50) == "800000"
    assert _threshold_hex(0.25) == "400000"
    assert _threshold_hex(0.10) == "199999"
    assert _threshold_hex(0.75) == "c00000"
    # full-fraction cap: stays 6 chars, never overflows the key width
    assert _threshold_hex(1.0) == "ffffff"


def test_hash_split_fractions_deterministic_and_growth_stable(spark, sf_small):
    docs = _docs(spark, sf_small)
    n = docs.count()
    s1 = hash_split(docs)
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    # 90/5/5 within binomial noise at n=500 (5σ ≈ 0.067 for p=0.9)
    assert abs(counts["train"] / n - 0.90) < 0.07
    assert abs(counts["valid"] / n - 0.05) < 0.05
    assert abs(counts["test"] / n - 0.05) < 0.05
    # determinism: identical assignment on re-computation
    s2 = hash_split(docs)
    assert s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).count() == 0
    # growth stability: membership of a subset is unchanged when the
    # rest of the corpus is absent (assignment is row-local)
    sub = hash_split(docs.filter(F.col("doc_id") % 3 == 0)).select("doc_id", "split")
    full = s1.filter(F.col("doc_id") % 3 == 0).select("doc_id", "split")
    assert sub.exceptAll(full).count() == 0
    # salt re-roll: a different salt must move SOME rows
    s3 = hash_split(docs, salt="split-v2").select("doc_id", "split")
    assert s3.exceptAll(s1.select("doc_id", "split")).count() > 0


def test_stratified_sample_fractions_and_edge_cases(spark, sf_small):
    docs = _docs(spark, sf_small)
    per_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    fr = {"en": 0.5, "fr": 1.0, "de": 0.0}
    kept = stratified_hash_sample(docs, "lang", fr)
    kc = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # frac=1.0 keeps the entire stratum exactly (special-cased: no hex
    # threshold edge-loss); frac=0 and unlisted strata drop entirely
    assert kc.get("fr") == per_lang["fr"]
    assert "de" not in kc and "es" not in kc and "zh" not in kc
    # 0.5 of en within 5σ (n≈200)
    assert abs(kc["en"] / per_lang["en"] - 0.5) < 0.18
    # deterministic
    again = stratified_hash_sample(docs, "lang", fr)
    assert kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_stratified_sample_listed_stratum_never_uses_default(spark, sf_small):
    """A listed stratum's row that fails its own threshold must be
    DROPPED — it must not fall through to the (larger) default
    threshold.  With default=1.0, listed strata still keep only their
    own fraction while unlisted strata keep everything."""
    docs = _docs(spark, sf_small)
    per_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = stratified_hash_sample(docs, "lang", {"en": 0.25}, default=1.0)
    kc = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # unlisted strata fully kept by default=1.0
    for lang in ("fr", "de", "es", "zh"):
        assert kc[lang] == per_lang[lang]
    # listed stratum keeps ~25%, nowhere near the 100% default
    assert kc["en"] < per_lang["en"] * 0.6
    assert abs(kc["en"] / per_lang["en"] - 0.25) < 0.2


@pytest.fixture()
def contam_corpus(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return hash_split(docs.unionByName(copies)).cache()


def test_exact_contamination_finds_all_planted_leaks(spark, contam_corpus):
    found = {
        r["doc_id"]
        for r in split_exact_contamination(contam_corpus).collect()
    }
    # ground truth from the split labels themselves: an eval doc is
    # contaminated iff its planted twin (id ± 1e6) landed in train
    labels = {r["doc_id"]: r["split"] for r in contam_corpus.select("doc_id", "split").collect()}
    expected = set()
    for d, s in labels.items():
        twin = d + 1_000_000 if d < 1_000_000 else d - 1_000_000
        if twin in labels and s != "train" and labels[twin] == "train":
            expected.add(d)
    assert expected, "fixture produced no cross-split duplicate — planted set too small"
    assert found >= expected
    # no false train rows and every found row is genuinely duplicated
    eval_rows = split_exact_contamination(contam_corpus)
    assert eval_rows.filter(F.col("split") == "train").count() == 0
    contam_corpus.unpersist()


def test_neardup_contamination_recovers_exact_dups_and_only_cross_split(
    spark, contam_corpus
):
    out = split_neardup_contamination(contam_corpus, threshold=0.7).cache()
    # candidate generation must be the banded equi-join — never all-pairs
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = out.collect()
    labels = {r["doc_id"]: r["split"] for r in contam_corpus.select("doc_id", "split").collect()}
    # every reported pair crosses the boundary in the right direction
    for r in rows:
        assert labels[r["eval_id"]] != "train"
        assert labels[r["train_id"]] == "train"
        assert r["jaccard"] >= 0.7
    # recall floor: planted exact copies (jaccard 1.0) crossing the
    # boundary must ALL be reported (LSH miss prob ≈ (1-1)^b = 0)
    planted = set()
    for d, s in labels.items():
        twin = d + 1_000_000 if d < 1_000_000 else d - 1_000_000
        if twin in labels and s != "train" and labels[twin] == "train":
            planted.add((d, twin))
    got = {(r["eval_id"], r["train_id"]) for r in rows}
    missing = {p for p in planted if p not in got}
    assert not missing, f"planted exact-dup leaks missed: {sorted(missing)[:5]}"
    out.unpersist()
    contam_corpus.unpersist()


def test_stratified_join_form_equals_when_chain(spark, sf_small):
    """The broadcast-join form (for thousands of strata) must select
    EXACTLY the same rows as the when-chain form, including the
    frac>=1.0 keep-all case, the listed-stratum-fails-threshold drop,
    and the unlisted-stratum default."""
    from pyppeteer_scraper_spark.operators.splits import (
        stratified_hash_sample_join,
    )

    docs = _docs(spark, sf_small)
    for fr, default in (
        ({"en": 0.5, "fr": 0.9, "es": 0.25, "de": 0.1, "zh": 0.75}, 0.0),
        ({"en": 0.25, "fr": 1.0}, 0.5),
        ({}, 0.3),
    ):
        a = stratified_hash_sample(docs, "lang", fr, default=default)
        b = stratified_hash_sample_join(docs, "lang", fr, default=default)
        ai = {r["doc_id"] for r in a.select("doc_id").collect()}
        bi = {r["doc_id"] for r in b.select("doc_id").collect()}
        assert ai == bi, (fr, default, len(ai), len(bi))
        assert set(b.columns) == set(docs.columns)
    # plan shape: broadcast join, no shuffle of the corpus
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stratified_hash_sample_join(docs, "lang", {"en": 0.5}).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_hand_computed_and_mass_conservation(spark):
    """A→B, A→C, B→C with C dangling (n=3), one iteration by hand:
    r(A) = .15/3 + .85·(dangling ⅓)/3, r(B) adds A's ½ share,
    r(C) adds A's ½ + B's 1.  Mass must stay exactly 1 every
    iteration (dangling redistribution)."""
    from pyppeteer_scraper_spark.operators.linkrank import indegree, pagerank

    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C")], ["src", "dst"]
    )
    r1 = {r["node"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    third = 1.0 / 3
    assert abs(r1["A"] - (0.15 / 3 + 0.85 * (third / 3))) < 1e-12
    assert abs(r1["B"] - (0.15 / 3 + 0.85 * (third / 2 + third / 3))) < 1e-12
    assert abs(r1["C"] - (0.15 / 3 + 0.85 * (third / 2 + third + third / 3))) < 1e-12
    assert abs(sum(r1.values()) - 1.0) < 1e-12
    r5 = [r["rank"] for r in pagerank(edges, iters=5).collect()]
    assert abs(sum(r5) - 1.0) < 1e-9
    deg = {r["node"]: r["n_inlinks"] for r in indegree(edges).collect()}
    assert deg == {"B": 1, "C": 2}
