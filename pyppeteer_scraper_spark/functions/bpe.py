"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

Training (Sennrich/Haddow/Birch, ACL 2016) never touches the corpus
per merge: it runs on the *word-frequency table* — distinct words
with counts — which Heaps' law keeps orders of magnitude smaller than
the corpus (the standard trick every production BPE trainer uses).
Each merge round is one pair-count aggregation (map-side combinable,
shuffle = distinct pairs) plus ONE (pair, count) row collected to the
driver, then a JVM-side fold (``F.aggregate``) applies the merge to
the symbol arrays — greedy leftmost, exactly the reference semantics,
no Python in the loop.

Encoding applies a learned merge list to text.  That is inherently
per-word iterative (merge ranks interact), so it uses the sanctioned
escape hatch: an Arrow-batched pandas UDF over the token arrays with
the merge table broadcast — never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) frequency table — the trainer's input."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _merge_fold(syms_col, a: str, b: str, merged: str):
    """Greedy leftmost application of merge (a, b) -> merged over a
    symbol array, as a JVM fold: a merged symbol never re-pairs with
    the following symbol in the same pass (matches reference BPE on
    runs like 'g g g' -> 'gg g')."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    words: DataFrame,
    n_merges: int = 16,
    word_col: str = "word",
    count_col: str = "cnt",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, count) table.

    Returns (merges, symbolized) where merges is a list of
    (left, right, pair_count) in rank order — ties broken by pair
    lexicographic order, so training is fully deterministic — and
    ``symbolized`` is the word table with the final symbol arrays.

    Per round: one pair-count groupBy (shuffle = distinct pairs, KBs)
    + one 3-field row to the driver; the merge apply is a codegen
    fold.  ``localCheckpoint`` every 4 rounds truncates the stacked
    fold lineage.
    """
    syms = words.select(
        F.col(word_col).alias("word"),
        F.col(count_col).alias("cnt"),
        F.split(F.col(word_col), "").alias("syms"),
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        pairs = syms.filter(F.size("syms") >= 2).select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] is None:
            break
        a, b, n = best[0]["p"]["l"], best[0]["p"]["r"], int(best[0]["n"])
        merges.append((a, b, n))
        syms = syms.select(
            "word", "cnt", _merge_fold(F.col("syms"), a, b, a + b).alias("syms")
        )
        if (i + 1) % 4 == 0:
            syms = syms.localCheckpoint()
    return merges, syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list: split to words,
    apply merges in rank order per word (greedy leftmost within each
    rank), emit the flat token array.  Arrow-batched pandas UDF; the
    merge table rides the closure (KBs), applied with a linear scan
    per rank — reference BPE encode semantics."""
    ranked = [(a, b) for a, b, _ in merges]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        def enc_word(w: str) -> list[str]:
            syms = list(w)
            for a, b in ranked:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            return syms

        def enc_text(t) -> list[str]:
            if t is None:
                return []
            toks: list[str] = []
            for w in t.split():
                toks.extend(enc_word(w))
            return toks

        return texts.map(enc_text)

    return docs.withColumn(out_col, enc(F.col(text_col)))
