"""Unigram-LM tokenizer (Kudo, ACL 2018 — the SentencePiece 'unigram'
algorithm), Spark-first; the probabilistic sibling of functions/bpe.py
covering the second of the two standard subword algorithms.

Like the BPE trainer, training runs on the WORD-FREQUENCY table
(distinct words + counts, Heaps-law small), never the corpus:

1. seed vocabulary: every substring of length <= ``max_piece_len`` of
   every distinct word, scored by occurrence-count x length; top
   ``seed_size`` survive, plus ALL single characters (coverage floor —
   any word stays segmentable);
2. hard-EM rounds (deterministic Viterbi-E + count-M — the
   reproducible variant of Kudo's full EM/forward-backward; same
   fixed-iteration honesty as kmeans_relational/PageRank):
   E: Viterbi-segment each distinct word under current piece
      log-probs (an Arrow pandas UDF over the word table with the
      bounded vocab broadcast — O(len x max_piece_len) DP per word);
   M: piece probability = corpus-weighted piece count / total;
      unused non-char pieces drop out;
3. prune to ``vocab_size`` by probability (chars always kept).

Viterbi tie-break is explicit so every engine/run agrees: higher
total log-prob wins; equal scores prefer the LONGER last piece
(fewer, bigger pieces), matching the DP's natural argmax order.

Encoding Viterbi-segments with the FINAL vocab — same UDF, applied to
the word table and joined back to documents, so each distinct word is
segmented once however often it occurs (the same trick that makes the
BPE encoder corpus-size-independent).

No SQL oracle is possible (iterative EM + per-word DP); the query is
rows-only, pinned by hand-computed EM traces and invariants in
tests/test_unigram.py (BPE precedent: tok_bpe_train).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyppeteer_scraper_spark.functions.bpe import word_counts


def seed_vocab(
    words: DataFrame,
    seed_size: int = 200,
    max_piece_len: int = 6,
) -> DataFrame:
    """Candidate pieces: substrings (len <= max_piece_len) of distinct
    words, scored by corpus occurrences x piece length; top
    ``seed_size`` by (score desc, piece) plus all single chars.
    Returns (piece, score:long).  The explode is bounded by
    |word table| x len x max_piece_len, not the corpus."""
    w = words.select("word", "cnt", F.length("word").alias("n"))
    subs = w.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.col("n")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len), F.col("n") - i + 1
                            ),
                        ),
                        lambda ln: F.col("word").substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
        F.col("cnt"),
    )
    scored = subs.groupBy("piece").agg(
        (F.sum("cnt") * F.length(F.col("piece"))).alias("score")
    )
    top = (
        scored.filter(F.length("piece") > 1)
        .orderBy(F.desc("score"), "piece")
        .limit(seed_size)
    )
    chars = scored.filter(F.length("piece") == 1)
    return top.unionByName(chars).select(
        "piece", F.col("score").cast("long").alias("score")
    )


def _viterbi_udf(logp: dict, max_len: int):
    """Pandas UDF: word -> best segmentation (array of pieces) under
    piece log-probs ``logp``.  Tie-break: higher score, then longer
    last piece (the DP iterates piece length ascending and takes
    strictly-better OR equal-score updates, so the longest last piece
    wins ties)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            n = len(w)
            best = [-math.inf] * (n + 1)
            back = [0] * (n + 1)
            best[0] = 0.0
            for j in range(1, n + 1):
                for ln in range(1, min(max_len, j) + 1):
                    piece = w[j - ln : j]
                    lp = logp.get(piece)
                    if lp is None:
                        continue
                    cand = best[j - ln] + lp
                    if cand >= best[j]:
                        best[j] = cand
                        back[j] = ln
            if best[n] == -math.inf:
                out.append(None)
                continue
            pieces = []
            j = n
            while j > 0:
                ln = back[j]
                pieces.append(w[j - ln : j])
                j -= ln
            out.append(pieces[::-1])
        return pd.Series(out)

    return seg


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 60,
    n_iters: int = 2,
    seed_size: int = 200,
    max_piece_len: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram-LM vocabulary; returns (piece, logp rounded
    6, n_chars) sorted nowhere (caller orders).  Deterministic: seed
    scoring, Viterbi tie-breaks, and pruning order are all total."""
    words = word_counts(docs, text_col=text_col).persist()
    words.count()
    seeds = seed_vocab(
        words, seed_size=seed_size, max_piece_len=max_piece_len
    ).collect()
    total0 = sum(r["score"] for r in seeds) or 1
    logp = {
        r["piece"]: math.log(r["score"] / total0) for r in seeds
    }
    chars = {r["piece"] for r in seeds if len(r["piece"]) == 1}

    for _ in range(n_iters):
        seg = _viterbi_udf(logp, max_piece_len)
        counts = (
            words.select(
                F.explode(seg(F.col("word"))).alias("piece"),
                F.col("cnt"),
            )
            .groupBy("piece")
            .agg(F.sum("cnt").alias("c"))
            .collect()
        )
        total = sum(r["c"] for r in counts) or 1
        new_logp = {
            r["piece"]: math.log(r["c"] / total) for r in counts
        }
        # coverage floor: chars never vanish (tiny pseudo-prob if the
        # Viterbi path never used them this round)
        floor = math.log(0.5 / total)
        for ch in chars:
            new_logp.setdefault(ch, floor)
        logp = new_logp
        # prune between iterations: keep chars + best multi-char
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda x: (-x[1], x[0]),
        )[: max(0, vocab_size - len(chars))]
        logp = {p: lp for p, lp in multi}
        for ch in chars:
            logp[ch] = new_logp[ch]

    words.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(p, round(lp, 6), len(p)) for p, lp in sorted(logp.items())],
        "piece string, logp double, n_chars int",
    )


def encode_unigram(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
) -> DataFrame:
    """Viterbi-encode documents with a trained vocab: segment each
    DISTINCT word once, join segmentations back, concatenate in word
    order.  Returns (id_col, pieces: array<string>)."""
    logp = {
        r["piece"]: r["logp"] for r in vocab.collect()
    }
    seg = _viterbi_udf(logp, max_piece_len)
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    wt = tok.select("word").distinct().select(
        "word", seg(F.col("word")).alias("pieces")
    )
    return (
        tok.join(wt, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "pieces"))
                ).pieces
            ).alias("pieces")
        )
    )
