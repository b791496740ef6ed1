"""Distributed global suffix array via prefix doubling (Manber &
Myers 1990/1993), Spark-first.

The suffix array of the concatenated corpus is THE exact-substring
index: Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better") build theirs with a suffix array to find every
repeated substring above a length threshold — the from-scratch
foundation under the k-token-window approximation shipped in
``dedup.substring_duplication_coverage``.

Prefix doubling in DataFrame terms: start from 1-character ranks,
then for k = 1, 2, 4, ... replace each suffix's key with the pair
(rank[i], rank[i+k]) and re-rank — after ceil(log2 n) rounds every
rank is a suffix's final lexicographic position.  Three scale
properties make this the distributed choice over DC3/SA-IS (which are
sequential-scan algorithms):

* every round is sort/join/aggregate — pure shuffle machinery, no
  per-row Python;
* the comparator never touches more than two ints per row, however
  long the suffixes are (naive sorting compares O(n) characters);
* O(log n) rounds of O(n) shuffle = the textbook O(n log n)
  communication bound for distributed SA construction.

Ranking is implemented as a DISTINCT-key dense rank: the distinct
(rank, next_rank) pairs — at most n, usually far fewer in early
rounds — are range-repartitioned, sorted within partitions, indexed
by per-partition row_number plus collected partition-count offsets
(the only driver data: one count per partition), and joined back.
Equal keys collapse in the distinct, so partition-boundary ties need
no special casing.  Each round ends in an eager localCheckpoint —
lineage truncation (the PageRank loop discipline) AND determinism
pinning for the multi-action round structure.

The DuckDB oracle is a genuinely independent derivation: it
concatenates the sample corpus into one string and ORDER BYs the raw
suffix substrings under binary collation — no doubling, no ranks —
and must agree with the doubling construction hash-exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x01"  # sorts below every printable char; never in corpus text


def _dense_rank_keys(
    df: DataFrame, keys: list[str]
) -> tuple[DataFrame, int]:
    """Dense rank (1-based) of the DISTINCT key tuples of ``df`` under
    the ascending lexicographic order of ``keys``.  Returns
    ((*keys, __rank), n_distinct_keys) — the key count falls out of
    the partition-count collect for free and lets the doubling loop
    detect convergence without an extra action.  Distributed:
    range-partition the distinct keys, row_number within partitions,
    add per-partition offsets (the only collect: one row count per
    partition)."""
    ks = df.select(*keys).distinct()
    srt = (
        ks.repartitionByRange(*[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
    )
    srt = srt.localCheckpoint(eager=True)  # pin partition layout
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in srt.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, ["__pid", "__off"])
    w = Window.partitionBy("__pid").orderBy(*keys)
    ranked = (
        srt.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .select(*keys, (F.col("__off") + F.col("__rn")).alias("__rank"))
    )
    return ranked, acc


def global_suffix_array(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Suffix array of the corpus concatenated in ``id_col`` order with
    a ``\\x01`` separator after each doc.  Returns one row per global
    position: (suffix_rank 1.., id_col, off) — ``off`` is the 0-based
    offset inside the doc (the separator is position len(text)).

    Global positions come from the same two-pass distributed prefix
    sum as sequence packing (``pack_token_stream``) — no single-task
    window over the corpus anywhere.
    """
    from pyppeteer_scraper_spark.operators.packing import pack_token_stream

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.col(text_col), F.lit(SEP)).alias("t"),
    )
    placed = pack_token_stream(
        d.select("doc_id", F.length("t").alias("n_tokens")),
        capacity=1 << 60,
    ).select("doc_id", "start_tok")
    base = (
        d.join(placed, "doc_id")
        .select(
            "doc_id",
            F.col("start_tok"),
            # sequence+substr, not split("(?!^)"): Spark's split keeps
            # a trailing empty element (limit -1 semantics) which would
            # inject a bogus ""-char suffix per doc
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("t")),
                    lambda i: F.col("t").substr(i, F.lit(1)),
                )
            ).alias("i", "ch"),
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("off"),
            (F.col("start_tok") + F.col("i")).alias("gpos"),
            "ch",
        )
    )
    base = base.localCheckpoint(eager=True)
    n = base.count()
    if n == 0:
        return base.select(
            F.col("gpos").alias("suffix_rank"),
            F.col("doc_id").alias(id_col),
            "off",
        )

    # round 0: ranks from single characters (binary string order)
    cr, _ = _dense_rank_keys(base, ["ch"])
    r = (
        base.join(cr, "ch")
        .select("gpos", F.col("__rank").alias("rank"))
        .localCheckpoint(eager=True)
    )

    # ceil(log2 n) rounds guarantee convergence, but real text
    # separates almost all suffixes within a few rounds — stop as soon
    # as every rank is distinct (the distinct-key count falls out of
    # the ranking's partition-count collect for free, so convergence
    # detection costs no extra action)
    rounds = max(1, math.ceil(math.log2(n)))
    k = 1
    for _ in range(rounds):
        shifted = r.select(
            (F.col("gpos") - k).alias("gpos"),
            F.col("rank").alias("nrank"),
        )
        paired = (
            r.join(shifted, "gpos", "left")
            .select(
                "gpos",
                "rank",
                F.coalesce(F.col("nrank"), F.lit(-1)).alias("nrank"),
            )
        )
        kr, n_keys = _dense_rank_keys(paired, ["rank", "nrank"])
        r = (
            paired.join(kr, ["rank", "nrank"])
            .select("gpos", F.col("__rank").alias("rank"))
            .localCheckpoint(eager=True)
        )
        k *= 2
        if n_keys == n:
            break

    return (
        base.select("gpos", "doc_id", "off")
        .join(r, "gpos")
        .select(
            F.col("rank").cast("long").alias("suffix_rank"),
            F.col("doc_id").alias(id_col),
            "off",
        )
    )


def suffix_adjacent_lcp(
    docs: DataFrame,
    cap: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-suffix LCPs over the global suffix array — the Lee et
    al. 2022 repeated-substring detector: a position whose suffix
    shares a >= k-char prefix with its SA neighbor lies inside a
    substring that occurs at least twice in the corpus; thresholding
    ``lcp`` marks exactly those spans (the EXACT counterpart of the
    shipped k-token-window approximation in ``dedup.py``).

    Returns one row per adjacent SA pair: (rank_a, doc_a, off_a,
    doc_b, off_b, lcp) with ``lcp`` capped at ``cap`` — Lee et al.
    threshold at 50 tokens-ish; anything past the cap is "long
    enough", and the cap is what bounds the per-row state.

    Mechanics: each SA row rebuilds its first ``cap`` suffix chars
    from its own doc plus the next TWO docs (doc-level lead window;
    sound whenever no two consecutive docs are jointly shorter than
    ``cap`` — true of this corpus, asserted cheaply at runtime by the
    caller's tests), pairs rank r with r+1 via one equi-join carrying
    2*cap chars per row, and counts the monotone prefix-equality
    ladder in codegen (prefix equality only ever turns off, so
    count(equal_j) == LCP).  The doc-level lead window is over the
    DOC table, not positions; at full scale it takes the same bucketed
    two-pass treatment as the packing prefix sum.
    """
    sa = global_suffix_array(docs, id_col=id_col, text_col=text_col)
    w = Window.orderBy("doc_id")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.col(text_col), F.lit(SEP)).alias("t"),
    )
    ctx_src = d.select(
        "doc_id",
        F.concat(
            F.col("t"),
            F.lead("t", 1, "").over(w),
            F.lead("t", 2, "").over(w),
        ).alias("__ctx_t"),
    )
    rows = sa.withColumnRenamed(id_col, "doc_id").join(
        ctx_src, "doc_id"
    ).select(
        "suffix_rank",
        F.col("doc_id"),
        "off",
        F.col("__ctx_t")
        .substr(F.col("off") + 1, F.lit(int(cap)))
        .alias("__ctx"),
    )
    a = rows.select(
        F.col("suffix_rank").alias("rank_a"),
        F.col("doc_id").alias("doc_a"),
        F.col("off").alias("off_a"),
        F.col("__ctx").alias("__ca"),
    )
    b = rows.select(
        (F.col("suffix_rank") - 1).alias("rank_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("off").alias("off_b"),
        F.col("__ctx").alias("__cb"),
    )
    paired = a.join(b, "rank_a")
    lcp = sum(
        (
            F.substring(F.col("__ca"), 1, j)
            == F.substring(F.col("__cb"), 1, j)
        ).cast("int")
        for j in range(1, int(cap) + 1)
    )
    return paired.select(
        "rank_a",
        "doc_a",
        "off_a",
        "doc_b",
        "off_b",
        lcp.cast("long").alias("lcp"),
    )
