"""Unsupervised character-trigram language-model quality scoring — the
CCNet-style "perplexity filter" (Wenzek et al. 2020): fit an n-gram LM
on the corpus, score each document by its average token log-probability,
drop the high-perplexity tail.

This is the unsupervised sibling of the fastText-shaped supervised
model in functions/classifier.py: no labels, the corpus is its own
model.  Char trigrams with add-one smoothing keep the whole pipeline
exactly reproducible in SQL (the public CCNet uses word-piece KenLM —
a served binary model; the trigram form is the from-scratch analog
with the same filtering semantics).

Scale shape (all relational, no Python):
  1. explode docs into (doc, trigram) — O(total chars) rows, the
     irreducible cost of fitting an n-gram LM;
  2. trigram counts: groupBy(trigram) — key space bounded by
     |alphabet|^3, so the aggregate output is tiny however big the
     corpus; partial aggregation absorbs the fan-in map-side;
  3. score: join the exploded stream back to the two count tables
     (trigram, context) — both joins key on bounded-cardinality keys;
     the count tables broadcast behind a driver-side cardinality guard
     (ASCII corpora always qualify; a full-Unicode corpus can observe
     billions of distinct trigrams, past the bound the joins shuffle);
  4. per-doc average: groupBy(doc).

The trigram-count table (tiny: bounded by |alphabet|^3) is persist()ed
before the fit statistics are collected, so the O(total-chars) explode
runs exactly twice — once to FIT (materializing the cached counts) and
once as the SCORE stream — instead of replaying for the stats collect,
the trigram join, and the context aggregate separately.  (Uncached
DataFrames do NOT reuse scans across actions; the round-3 version
re-ran the corpus explode up to 4x.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tri) — one row per char-trigram position.

    Guarded for len<3: Spark's ``sequence(1, n)`` DESCENDS when n<1,
    which would fabricate garbage positions — short docs yield an
    empty array instead.
    """
    text = F.col(text_col)
    n = F.length(text)
    tris = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: text.substr(i, F.lit(3))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("__id"), F.explode(tris).alias("tri")
    )


def trigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc LM quality: (id_col, n_trigrams, avg_logp, ppl).

    avg_logp = mean over trigram positions of
    ln((C(abc)+1) / (C(ab·)+V)) with V = corpus-distinct third
    characters (add-one smoothing over the observed next-char
    alphabet); ppl = exp(-avg_logp).  Low-probability (weird) text
    scores low avg_logp / high ppl — the drop signal.
    """
    tg = _doc_trigrams(docs, id_col, text_col)
    # persist the model table BEFORE the stats collect: it is bounded
    # by |alphabet|^3 rows however large the corpus, and the collect
    # below materializes the cache, so the corpus-wide explode is not
    # replayed for the context aggregate or the scoring joins.
    tri_counts = (
        tg.groupBy("tri").agg(F.count("*").alias("c3")).persist()
    )
    # One action fetches BOTH the smoothing alphabet size V and the
    # model cardinality.  The broadcast hint is cardinality-GUARDED
    # (same policy as the politeness dom_counts broadcast): an ASCII
    # corpus has <=128^3 trigram keys and broadcasts, but a
    # full-Unicode 100-TB corpus can observe billions of distinct
    # trigrams — past the bound the joins fall back to shuffle and the
    # bounded-key groupBy output co-partitions them cheaply.
    stats = tri_counts.agg(
        F.countDistinct(F.substring("tri", 3, 1)).alias("v"),
        F.count("*").alias("n_keys"),
    ).collect()[0]
    v = stats["v"]
    model_broadcastable = stats["n_keys"] <= 4_000_000
    ctx_counts = tri_counts.groupBy(
        F.substring("tri", 1, 2).alias("ctx")
    ).agg(F.sum("c3").alias("c2"))
    # r06: fold the context counts into a per-TRIGRAM score table
    # first (model-sized dimension join), so the corpus-sized explode
    # pays ONE join instead of two.  lp per row is the same expression
    # of the same (c3, c2, v) — bit-identical results.
    score = tri_counts.join(
        ctx_counts, F.substring(F.col("tri"), 1, 2) == F.col("ctx")
    ).select(
        "tri",
        F.log(
            (F.col("c3") + F.lit(1.0))
            / (F.col("c2") + F.lit(1.0) * F.lit(float(v)))
        ).alias("lp"),
    )
    if model_broadcastable:
        score = F.broadcast(score)
    scored = tg.join(score, "tri").select("__id", "lp")
    return scored.groupBy("__id").agg(
        F.count("*").alias("n_trigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.avg("lp")), 3).alias("ppl"),
    ).withColumnRenamed("__id", id_col)


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail corpus partitioning (Wenzek et al. 2020
    §4.3): within each language, rank documents by LM perplexity and
    cut the ranking into ``n_buckets`` equal-count buckets — bucket 1
    ("head") is the most-fluent third the downstream pipeline trains
    on first.

    Returns one row per doc: (group_col, id_col, ppl, bucket) with
    bucket in 1..n_buckets.

    Determinism contract: ranking uses the ROUNDED (3 dp) perplexity
    from trigram_lm_scores — hash-stable across engines — with the doc
    id as total-order tie-break, and ntile's integer row-count
    arithmetic, so a SQL oracle reproduces the buckets exactly.  Docs
    shorter than one trigram have no LM row and are excluded (the
    curation funnel counts them as too_short BEFORE this stage —
    plans/queries.py text_curation_funnel_full).

    Scale shape: ntile is a per-language window — one shuffle on
    group_col, sort bounded by the LARGEST language (the same
    bounded-skew class as sessionization; operators/asof.py's
    time-bucket carry-forward pattern applies if one language is the
    whole corpus).  The published CCNet computes the cut points from a
    SAMPLE instead (percentile thresholds then a broadcast-join
    filter) — that is the documented 100-TB swap-in
    (F.percentile_approx over a per-lang aggregate, no full sort); the
    exact ntile form is kept here because it is oracle-reproducible
    bit-for-bit.
    """
    from pyspark.sql import Window

    scores = trigram_lm_scores(docs, id_col=id_col, text_col=text_col)
    labeled = docs.select(group_col, id_col).join(scores, id_col)
    w = Window.partitionBy(group_col).orderBy(F.col("ppl"), F.col(id_col))
    return labeled.select(
        group_col,
        id_col,
        "ppl",
        F.ntile(n_buckets).over(w).cast("long").alias("bucket"),
    )


def kn_bigram_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the
    interpolated form of Chen & Goodman 1999 §2.7) at character level
    — the smoothing the real KenLM filters use, upgrading the add-one
    trigram model with the continuation-probability backoff that
    stops frequent-but-context-bound characters (the "San Francisco"
    effect) from inflating unseen-pair probabilities:

        P(w2|w1) = (max(C(w1w2) - d, 0)
                    + d * N1+(w1,.) * Pcont(w2)) / C(w1.)
        Pcont(w2) = N1+(., w2) / |distinct bigram types|

    Returns (id_col, n_bigrams, avg_logp, ppl) — same contract as
    trigram_lm_scores, so the curation funnel / ppl_buckets compose
    with either model.

    Scale shape mirrors trigram_lm_scores: ONE O(total-chars) explode
    feeds both fit and score; every model table (bigram counts,
    per-context totals + continuation fan-outs, the scalar type
    count) is bounded by |alphabet|^2 regardless of corpus size,
    persisted before the fit collect so the corpus scan is never
    replayed, and broadcast behind the same cardinality guard (a
    full-Unicode corpus can exceed it; past the bound the joins
    shuffle on bounded keys).  Docs shorter than one bigram emit no
    row (the funnel counts them too_short upstream).
    """
    text = F.col(text_col)
    n = F.length(text)
    bis = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1), lambda i: text.substr(i, F.lit(2))
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(F.col(id_col).alias("__id"), F.explode(bis).alias("bi"))
    bc = bg.groupBy("bi").agg(F.count("*").alias("c2")).persist()
    t = bc.count()  # materializes the cache; |distinct bigram types|
    ctx = bc.groupBy(F.substring("bi", 1, 1).alias("w1")).agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1f")
    )
    cont = bc.groupBy(F.substring("bi", 2, 1).alias("w2")).agg(
        F.count("*").alias("n1b")
    )
    d = F.lit(float(discount))
    # r06: fold ctx/cont into a per-BIGRAM score table first (t rows,
    # dimension-side joins), so the corpus-sized bg explode pays ONE
    # join instead of three.  lp per row is the same expression of the
    # same (c2, n1f, n1b, c1, t) values — bit-identical results.
    score = (
        bc.join(ctx, F.substring(F.col("bi"), 1, 1) == F.col("w1"))
        .join(cont, F.substring(F.col("bi"), 2, 1) == F.col("w2"))
        .select(
            "bi",
            F.log(
                (
                    F.greatest(F.col("c2") - d, F.lit(0.0))
                    + d
                    * F.col("n1f")
                    * (F.col("n1b") / F.lit(float(t)))
                )
                / F.col("c1")
            ).alias("lp"),
        )
    )
    scorej = F.broadcast(score) if t <= 4_000_000 else score
    scored = bg.join(scorej, "bi").select("__id", "lp")
    out = (
        scored.groupBy("__id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg("lp")), 3).alias("ppl"),
        )
        .withColumnRenamed("__id", id_col)
    )
    # ADVICE r04: pin the scored result eagerly, then release the
    # bigram-count cache — the same localCheckpoint+unpersist
    # discipline as text_source_kl (no session-lifetime cache leak).
    out = out.localCheckpoint(eager=True)
    bc.unpersist()
    return out
