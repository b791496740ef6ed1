"""Token-stream sequence packing — the LM-pretraining step that
concatenates documents in a deterministic order into one token stream
and cuts it into fixed-capacity training sequences (the GPT/"packed
dataset" recipe: no padding, documents span chunk boundaries).

For each document this computes its global token offset and the range
of sequence ids it lands in:

    (doc_id, n_tokens, start_tok, first_seq, last_seq, n_seqs)

with start_tok = exclusive prefix sum of n_tokens in doc_id order and
seq boundaries every ``capacity`` tokens.

SCALE SHAPE — the whole point of this operator: the naive Spark
formulation is ``sum(n_tokens) over (order by doc_id)``, and a global
ordered window WITHOUT a partitionBy collapses the entire table into
ONE task — the classic 100-TB killer.  This implementation is the
two-pass distributed prefix sum instead:

  pass 1: aggregate per-bucket token totals (bucket = doc_id range),
          a tiny table — one groupBy shuffle that reduces 10^10 rows
          to ~n_buckets rows;
  pass 2: cumulative-sum those totals with a window over the BUCKET
          table (thousands of rows on one task — trivially safe),
          broadcast-join the bucket base offsets back, and finish with
          a per-bucket ordered window (partitionBy bucket — parallel).

Output is bit-identical to the single-task window (asserted in
tests/test_packing.py) while every stage stays bounded.

Requires a dense-ordered integer id space only for the BUCKETING
(ids may have gaps; bucket = id // bucket_size just needs monotone
ids).  The reference has no packing analog — this is part of the
"operations a large-scale training-data pipeline needs" mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_stream(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Assign each doc its packed-sequence span under ``capacity``
    tokens per sequence, concatenating docs in ``id_col`` order.

    Returns (id_col, n_tokens, start_tok, first_seq, last_seq, n_seqs)
    where ``n_seqs`` is how many training sequences the doc spans
    (>1 when it crosses a boundary; 0-token docs occupy no sequence
    and get first_seq = last_seq = the sequence they sit between,
    n_seqs = 0).
    """
    # `div` is exact integer division on longs; float division +
    # cast('long') can cross an integer boundary via IEEE rounding for
    # offsets beyond ~2^45 with non-power-of-two divisors.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.expr(
            f"cast({id_col} as bigint) div {int(bucket_size)}"
        ).alias("__bucket"),
    )
    # pass 1: per-bucket totals (tiny)
    btotals = base.groupBy("__bucket").agg(
        F.sum("n_tokens").alias("__btotal")
    )
    # pass 2a: exclusive prefix over buckets — window over the tiny
    # bucket table only (bounded rows on one task, never the data)
    wb = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boffsets = btotals.select(
        "__bucket",
        F.coalesce(F.sum("__btotal").over(wb), F.lit(0)).alias("__base"),
    )
    # pass 2b: per-bucket ordered prefix (partitionBy bucket — parallel),
    # bucket base offsets broadcast back onto the data
    wd = Window.partitionBy("__bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    placed = (
        base.join(F.broadcast(boffsets), "__bucket")
        .withColumn(
            "start_tok",
            F.col("__base")
            + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0)),
        )
    )
    cap = int(capacity)
    first_seq = F.expr(f"start_tok div {cap}")
    # last token of the doc sits at start_tok + n_tokens - 1
    last_seq = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_tok + n_tokens - 1) div {cap}"),
    ).otherwise(first_seq)
    return placed.select(
        F.col("doc_id").alias(id_col),
        "n_tokens",
        "start_tok",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last_seq - first_seq + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )


def passage_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window passage chunking — cut each document into
    ``size``-token windows every ``stride`` tokens (overlap =
    ``size - stride`` when ``stride < size``), the standard unit for
    retrieval indexing and context-window-bounded training examples.

    Unlike :func:`pack_token_stream` (which concatenates ACROSS
    documents to fill fixed sequences), chunking stays WITHIN a
    document, so it needs no global prefix sum: chunk starts are a
    per-row ``sequence(0, n-1, stride)`` explode, the slice/join is
    per-row too, and the whole operator is one codegen projection with
    ZERO shuffles — embarrassingly parallel at any corpus size.  Fan-out
    is bounded at ~n_tokens/stride rows per doc; chunk text duplicates
    at most size/stride × corpus bytes (the caller's overlap choice).

    Tokens are single-space-split positions (ws_token_count semantics —
    the engine-wide tokenizer, see functions/text.py).  Output:
    ``(id, chunk_idx, start_tok, n_chunk_tokens, passage)``; empty
    passages (from empty/whitespace-only docs) are dropped.
    """
    toks = F.split(F.col(text_col), " ", -1)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.slice(F.col("__toks"), F.col("start_tok").cast("int") + 1, size).alias(
                "__chunk"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            "start_tok",
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("__chunk")).alias("passage"),
        )
        .filter(F.length("passage") > 0)
    )
