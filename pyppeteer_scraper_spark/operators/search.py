"""BM25 ranked retrieval over the document corpus.

The engine already builds the inverted index (plans/queries.py::
text_inverted_index) and IDF tables (functions/text.py); BM25
(Robertson/Spärck Jones; the Lucene-default scoring function) is the
standard way a corpus this size is actually QUERIED — quality
inspection ("show me the docs this filter would keep for topic X"),
decontamination review, and eval-set mining all reduce to ranked
lookups.  The reference has nothing comparable (it greps single pages
as they arrive).

Scale shape: the score join is posting-list-sized — the term-frequency
table is inner-joined to the (broadcast, tiny) query-term list FIRST,
so only postings of queried terms flow through the rest of the plan;
corpus-level stats (N, avgdl) ride in as a broadcast 1-row aggregate.
All built-ins: one explode + three aggregates + window top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    n_query_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_n`` documents per query term under BM25.

    ``query_terms=None`` derives the terms deterministically as the
    ``n_query_terms`` most frequent corpus tokens (tf desc, term asc) —
    the driver-oracle form, where both engines must agree on the term
    set without a side channel.  Scoring uses the Lucene BM25 variant
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``; ties rank by doc id.

    Output: (term, doc_id, tf, dl, score, rnk).
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ", -1)).alias("term")
    )
    dl = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("dl"))
    # every doc has ≥1 token row (split of "" is ['']), so dl covers all
    # docs and ONE aggregate yields both corpus stats.  They attach via
    # an explicit broadcast crossJoin: the build side is exactly one
    # row, so the BroadcastNestedLoopJoin this plans is a scalar
    # attach, not an all-pairs join — declared as such in the registry
    # plan sweep's allowlist (tests/test_plan_quality.py).
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    if query_terms is None:
        qt = (
            tok.groupBy("term")
            .agg(F.count("*").alias("ctf"))
            .orderBy(F.desc("ctf"), "term")
            .limit(n_query_terms)
            .select("term")
        )
    else:
        qt = docs.sparkSession.createDataFrame(
            [(t,) for t in query_terms], "term string"
        )

    tf = (
        tok.join(F.broadcast(qt), "term")  # prune to queried postings first
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top_n)
        .select("term", id_col, "tf", "dl", "score", "rnk")
    )


def lexical_cosine_topk(
    docs: DataFrame,
    max_df_frac: float = 0.2,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``top_n`` lexical neighbours by tf-idf cosine,
    computed EXACTLY over the df-pruned term space via an
    inverted-index self-join (Bayardo/Ma/Srikant, "Scaling Up All
    Pairs Similarity Search", WWW'07 — the candidate-generation idea:
    two documents can only be similar if they share a term, so join
    postings on term instead of crossing documents).

    Semantics (the operator's contract, mirrored bit-for-bit by the
    SQL oracle):

    - tf over a single-space split of ``text_col``;
      ``idf = ln(n_docs / df)``; weights L2-normalised per doc.
    - Terms with ``df > max_df_frac * n_docs`` are DROPPED before
      weighting (stop-word pruning).  This is part of the score's
      definition, not an approximation layered on an exact score: the
      cosine is exact over the pruned vocabulary.  The cap is also
      what bounds the join: each term contributes O(df^2) candidate
      pairs, so the worst-case fan-out per term is
      ``(max_df_frac * n_docs)^2`` instead of ``n_docs^2`` for a
      corpus-wide stop word.  At 100 TB the cap is the knob: lower it
      (or switch to an absolute df cap) until the largest posting
      list's pair count fits a task.
    - Docs whose every term is pruned (or whose weights are all zero
      because every remaining term appears in all docs) drop out.
    - Ranking uses the ROUNDED score (6 dp) with partner-id
      tie-break, so cross-engine ordering is deterministic at the
      same granularity the output is compared at.

    Scale shape: one explode, three aggregates, then a posting-list
    self-join shuffled on ``term`` and a pair aggregate shuffled on
    (doc_a, doc_b) — never an all-pairs cross join.  All built-ins
    (whole-stage codegen); no UDFs.

    Reference analog: none — the reference greps one page at a time
    (scraper/home_depo.py fetch loop); corpus-level "which pages are
    lexically near" queries only exist once the corpus is a table.

    Output: (doc_id, partner_id, cos_sim, rnk).
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ", -1)).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = docs.agg(F.count("*").cast("double").alias("n_docs"))

    # weight only the surviving (pruned) vocabulary; df table is
    # vocab-sized → broadcast; stats is one row → scalar attach.
    w = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") <= max_df_frac * F.col("n_docs"))
        .withColumn("w", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .select(id_col, "term", "w")
    )
    nrm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    wn = (
        w.join(nrm, id_col)
        .filter(F.col("nrm") > 0)
        .select(id_col, "term", (F.col("w") / F.col("nrm")).alias("wn"))
    )

    a = wn.select(
        F.col(id_col).alias("doc_a"), F.col("term"), F.col("wn").alias("wa")
    )
    b = wn.select(
        F.col(id_col).alias("doc_b"), F.col("term"), F.col("wn").alias("wb")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cos_sim"))
    )
    sym = pairs.select(
        F.col("doc_a").alias(id_col),
        F.col("doc_b").alias("partner_id"),
        "cos_sim",
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias(id_col),
            F.col("doc_a").alias("partner_id"),
            "cos_sim",
        )
    )
    rounded = sym.withColumn("cos_sim", F.round("cos_sim", 6))
    win = Window.partitionBy(id_col).orderBy(F.desc("cos_sim"), "partner_id")
    return (
        rounded.withColumn("rnk", F.row_number().over(win).cast("long"))
        .filter(F.col("rnk") <= top_n)
        .select(id_col, "partner_id", "cos_sim", "rnk")
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching via positional postings — the classic
    inverted-index access path (Manning/Raghavan/Schütze IR ch. 2):
    tokenize with positions, keep ONLY postings of the phrase's k
    terms (term-selective pushdown — the whole point of an inverted
    index: the join never sees non-query terms), then chain k-1
    equi-joins on (doc, start_pos) with each term's positions shifted
    by its phrase offset.  Returns (id_col, n_matches) for docs with
    at least one occurrence.

    Scale shape: the postings explode is one pass; the term filter
    cuts it to posting-list size before any shuffle; the k-1 joins
    are equi-joins on (doc, pos) — co-partitioned after the first
    shuffle, no re-exchange.  The filtered postings are persisted
    once and served to every term branch.
    """
    terms = [t for t in phrase.split(" ") if t != ""]
    if not terms:
        raise ValueError("empty phrase")
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    # eager localCheckpoint, not lazy persist: the k per-term branches
    # join concurrently and a lazy cache races — each branch would
    # replay the full tokenize-explode before any populates it.  The
    # materialized table is posting-list-sized (query terms only).
    ptok = tok.filter(F.col("term").isin(terms)).localCheckpoint()
    cur = (
        ptok.filter(F.col("term") == terms[0])
        .select(id_col, "pos")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = ptok.filter(F.col("term") == t).select(
            id_col, (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(nxt, [id_col, "pos"])
    return cur.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_matches")
    )
