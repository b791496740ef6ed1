"""Distributed suffix array (operators/suffix.py)."""

from pyppeteer_scraper_spark.operators.suffix import (
    SEP,
    global_suffix_array,
)
from pyppeteer_scraper_spark.sources.tables import load_table


def _reference(doc_list):
    """Sort the raw suffixes in python — the independent derivation."""
    cat = "".join(t + SEP for _, t in sorted(doc_list))
    offs = {}
    pos = 0
    for did, t in sorted(doc_list):
        for i in range(len(t) + 1):
            offs[pos + i] = (did, i)
        pos += len(t) + 1
    order = sorted(range(len(cat)), key=lambda p: cat[p:])
    return sorted((rk + 1, *offs[p]) for rk, p in enumerate(order))


def test_suffix_array_matches_sorted_suffixes_hand_data(spark):
    """Repetitive strings (banana/abracadabra + a shared 'banana'
    prefix across docs) force deep rank ties — the doubling loop
    cannot shortcut via unique single chars; empty doc covered."""
    docs = [(1, "banana"), (2, "abracadabra"), (3, ""), (5, "bananaban")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r["suffix_rank"], r["doc_id"], r["off"])
        for r in global_suffix_array(df).collect()
    )
    assert got == _reference(docs)


def test_suffix_array_matches_on_real_corpus_sample(spark, sf_small):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_small, "documents")
        .filter("doc_id % 17 = 2")
        .collect()
    ]
    assert len(docs) >= 2
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r["suffix_rank"], r["doc_id"], r["off"])
        for r in global_suffix_array(df).collect()
    )
    want = _reference(docs)
    assert len(got) == len(want)
    assert got == want


def test_adjacent_lcp_detects_planted_duplicate(spark):
    """A 60-char string planted in two docs must surface as an
    adjacent SA pair with lcp == cap (the Lee et al. detection
    signal); every pair's lcp must equal the python common-prefix of
    the true concatenated suffixes (capped)."""
    from pyppeteer_scraper_spark.operators.suffix import (
        suffix_adjacent_lcp,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, "alpha beta gamma " + dup + " tail one"),
        (2, "completely different middle " + dup + " other tail"),
        (3, "unrelated filler text with no repeats at all here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cap = 48
    rows = suffix_adjacent_lcp(df, cap=cap).collect()

    cat = "".join(t + SEP for _, t in sorted(docs))
    offs, pos = {}, 0
    for did, t in sorted(docs):
        for i in range(len(t) + 1):
            offs[pos + i] = (did, i)
        pos += len(t) + 1
    order = sorted(range(len(cat)), key=lambda p: cat[p:])
    gpos_of = {}
    for rk, p in enumerate(order):
        gpos_of[rk + 1] = p

    def ref_lcp(p, q):
        a, b = cat[p : p + cap], cat[q : q + cap]
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        return n

    planted_hit = False
    assert len(rows) == len(cat) - 1
    for r in rows:
        p, q = gpos_of[r["rank_a"]], gpos_of[r["rank_a"] + 1]
        assert (r["doc_a"], r["off_a"]) == offs[p], r
        assert (r["doc_b"], r["off_b"]) == offs[q], r
        assert r["lcp"] == ref_lcp(p, q), (r, ref_lcp(p, q))
        if (
            r["lcp"] == cap
            and {r["doc_a"], r["doc_b"]} == {1, 2}
        ):
            planted_hit = True
    assert planted_hit


def test_adjacent_lcp_single_char_docs(spark):
    """Round 5: the block-assembled context rebuild is exact for EVERY
    input — including a corpus of single-character docs, which violated
    the retired <=2-doc lead-window's precondition (ADVICE r04: docs
    jointly shorter than cap silently undercounted LCP).  Every pair's
    lcp must equal the python common-prefix of the true concatenated
    suffixes."""
    from pyppeteer_scraper_spark.operators.suffix import (
        suffix_adjacent_lcp,
    )

    docs = [(i, "ab"[i % 2]) for i in range(1, 24)]  # 1-char docs
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cap = 48
    rows = suffix_adjacent_lcp(df, cap=cap).collect()

    cat = "".join(t + SEP for _, t in sorted(docs))
    offs, pos = {}, 0
    for did, t in sorted(docs):
        for i in range(len(t) + 1):
            offs[pos + i] = (did, i)
        pos += len(t) + 1
    order = sorted(range(len(cat)), key=lambda p: cat[p:])
    gpos_of = {rk + 1: p for rk, p in enumerate(order)}

    def ref_lcp(p, q):
        a, b = cat[p : p + cap], cat[q : q + cap]
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        return n

    assert len(rows) == len(cat) - 1
    for r in rows:
        p, q = gpos_of[r["rank_a"]], gpos_of[r["rank_a"] + 1]
        assert (r["doc_a"], r["off_a"]) == offs[p], r
        assert (r["doc_b"], r["off_b"]) == offs[q], r
        assert r["lcp"] == ref_lcp(p, q), (r, ref_lcp(p, q))


def test_adjacent_lcp_tiny_blocks(spark):
    """Block assembly must be seam-exact: with block_chars barely
    above cap, every suffix's context crosses block boundaries and the
    carry-in region does the work."""
    from pyppeteer_scraper_spark.operators.suffix import (
        suffix_adjacent_lcp,
    )

    dup = "shared duplicate span here"
    docs = [(1, "aaa " + dup + " xx"), (2, dup + " trailing bits")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cap = 16
    rows = suffix_adjacent_lcp(df, cap=cap, block_chars=17).collect()

    cat = "".join(t + SEP for _, t in sorted(docs))
    order = sorted(range(len(cat)), key=lambda p: cat[p:])
    gpos_of = {rk + 1: p for rk, p in enumerate(order)}

    def ref_lcp(p, q):
        a, b = cat[p : p + cap], cat[q : q + cap]
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        return n

    assert len(rows) == len(cat) - 1
    for r in rows:
        p, q = gpos_of[r["rank_a"]], gpos_of[r["rank_a"] + 1]
        assert r["lcp"] == ref_lcp(p, q), (r, p, q, ref_lcp(p, q))


def test_suffix_dup_coverage_planted_vs_window_approx(spark):
    """End-to-end exact coverage on planted duplicates: (a) matches an
    independent python derivation exactly; (b) agrees with the shipped
    k-token-window approximation (dedup.substring_dup_coverage) on
    which docs contain duplication — the VERDICT-r04 A/B tying the
    exact path to the approximation on one corpus."""
    from pyppeteer_scraper_spark.operators.dedup import (
        substring_dup_coverage,
    )
    from pyppeteer_scraper_spark.operators.suffix import (
        suffix_dup_coverage,
    )

    dup = "the quick brown fox jumps over the lazy dog once more"
    docs = [
        (1, "alpha beta gamma " + dup + " tail one ending"),
        (2, "completely different middle " + dup + " other tail"),
        (3, "unrelated filler text with no repeats at all here ok"),
        (4, dup + " and " + dup),  # internal repeat too
        (5, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    threshold, cap = 20, 48
    got = {
        r["doc_id"]: (r["doc_len"], r["covered_chars"], r["coverage"])
        for r in suffix_dup_coverage(df, threshold=threshold, cap=cap).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}

    # independent python derivation of the same definition
    cat = "".join(t + SEP for _, t in sorted(docs))
    offs, pos = {}, 0
    for did, t in sorted(docs):
        for i in range(len(t) + 1):
            offs[pos + i] = (did, i)
        pos += len(t) + 1
    order = sorted(range(len(cat)), key=lambda p: cat[p:])

    def ref_lcp(p, q):
        a, b = cat[p : p + cap], cat[q : q + cap]
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        return n

    lens = {did: len(t) for did, t in docs}
    ivs = {did: [] for did in lens}
    for i in range(len(order) - 1):
        p, q = order[i], order[i + 1]
        l = ref_lcp(p, q)
        if l >= threshold:
            for g in (p, q):
                did, off = offs[g]
                end = min(off + l, lens[did])
                if end > off:
                    ivs[did].append((off, end))
    for did, (dl, cc, cv) in got.items():
        assert dl == lens[did]
        merged, covered = [], 0
        for st, e in sorted(ivs[did]):
            if merged and st <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((st, e))
        covered = sum(e - st for st, e in merged)
        assert cc == covered, (did, cc, covered)
        assert abs(cv - round(covered / max(dl, 1), 6)) < 1e-9

    # A/B vs the k-token-window approximation: same verdict on which
    # docs carry duplication
    approx = {
        r["doc_id"]: r["dup_frac"]
        for r in substring_dup_coverage(df, k=8).collect()
    }
    for did in (1, 2, 4):
        assert got[did][1] > 0, got
        assert approx[did] > 0, approx
    assert got[3][1] == 0 and approx[3] == 0.0
    assert got[5][1] == 0


def test_lcp_pipeline_plan_has_no_single_partition_funnel(spark):
    """VERDICT r04 'What's wrong #1' regression pin: the LCP pipeline
    (context rebuild included) must contain NO SinglePartition
    exchange and NO unpartitioned data-sized window — the round-4
    implementation funneled the whole corpus text through one task via
    Window.orderBy(doc_id)."""
    import contextlib
    import io

    from pyppeteer_scraper_spark.operators.suffix import (
        _context_blocks,
        suffix_adjacent_lcp,
        suffix_dup_coverage,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some shared text payload") for i in range(40)],
        ["doc_id", "text"],
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # the block assembly feeding every context read: pure
    # explode -> hash-partitioned groupBy, windowless by construction
    placed = docs.select(
        F.col("doc_id"),
        F.concat("text", F.lit("\x01")).alias("t"),
        (F.col("doc_id") * 100).cast("long").alias("start_tok"),
    )
    bplan = plan_of(_context_blocks(placed, cap=48, block_chars=4096))
    assert "SinglePartition" not in bplan, bplan
    assert "Window" not in bplan, bplan

    # the end-to-end pipelines (post-checkpoint visible plan)
    for df in (
        suffix_adjacent_lcp(docs, cap=24),
        suffix_dup_coverage(docs, threshold=10, cap=24),
    ):
        plan = plan_of(df)
        assert "SinglePartition" not in plan, plan
