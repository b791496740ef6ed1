"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):
score every raw-corpus document by how much its hashed-n-gram profile
resembles a small trusted/target corpus, so sampling by the weights
shifts the corpus toward the target distribution.

The published method fits two bag-of-hashed-n-grams unigram models —
``p_target`` on the trusted set, ``p_raw`` on the full corpus — and
weights each document by its likelihood ratio:

    log w(doc) = sum over grams g of  log p_target[b(g)] - log p_raw[b(g)]

with the hashing trick collapsing the open vocabulary into ``B``
buckets.  The reference has no data-selection stage at all (it crawls
everything its filters pass); DSIR is the standard scale-out answer to
"I have 100 TB of crawl and a 1 GB trusted corpus — which documents do
I keep?".

Scale shape (mirrors functions/lm.py, which fits the same way):
  1. one explode pass over the corpus → (doc, bucket) gram stream —
     O(total tokens), the irreducible fit cost;
  2. ONE aggregation fits BOTH models: groupBy(bucket) with
     ``count(*)`` (raw) and ``count_if(is_target)`` (target) — output
     bounded by B rows however large the corpus, partial aggregation
     absorbs the fan-in map-side;
  3. score: re-join the gram stream to the broadcast count table (B
     rows — always broadcastable) and average the per-gram log-ratio
     per document.
Total: exactly two passes over the gram explode, no all-pairs, no UDF.

Bucketing is the md5-hex→int trick from functions/classifier.py: ANSI-
expressible, so the DuckDB oracle refits both models in SQL and checks
the weights end-to-end (same policy as the trigram-LM oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.classifier import _grams

N_BUCKETS = 256


def _bucket(gram: Column, salt: str, n_buckets: int) -> Column:
    """md5-derived bucket in [0, n_buckets) — byte-identical to the
    oracle's ``('0x' || substr(md5(...), 1, 6))::BIGINT % B``."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), gram)), 1, 6),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_buckets),
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir-v1",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-doc importance weights vs the ``is_target`` trusted subset.

    Returns (id_col, n_grams, avg_log_ratio, log_weight) where
    ``log_weight = sum_g [ln((ct_b+1)/(T+B)) - ln((cr_b+1)/(R+B))]``
    (add-one smoothing; ct/cr = target/raw bucket counts, T/R their
    totals), ``avg_log_ratio`` its per-gram mean, both rounded to 6 dp
    so the SQL oracle's float summation order can't flip the hash.
    Docs with no grams get 0.0 (they carry no evidence either way).
    """
    grams = docs.select(
        F.col(id_col).alias("__id"),
        is_target.alias("__tgt"),
        F.explode(_grams(F.col(text_col))).alias("g"),
    ).select("__id", "__tgt", _bucket(F.col("g"), salt, n_buckets).alias("b"))

    # One fit aggregation for BOTH distributions; output ≤ n_buckets
    # rows → always broadcastable, whatever the corpus size.  Persist
    # it BEFORE the totals collect: the collect materializes the tiny
    # table, so the corpus-wide gram scan is not replayed to rebuild
    # `counts` inside the scoring join below (2 corpus passes, not 3).
    counts = grams.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.count_if(F.col("__tgt")).alias("ct"),
    ).persist()
    totals = counts.agg(
        F.sum("cr").alias("r_total"), F.sum("ct").alias("t_total")
    ).collect()[0]
    r_total, t_total = int(totals["r_total"] or 0), int(totals["t_total"] or 0)

    log_ratio = F.log(
        (F.col("ct") + F.lit(1.0)) / F.lit(float(t_total + n_buckets))
    ) - F.log((F.col("cr") + F.lit(1.0)) / F.lit(float(r_total + n_buckets)))
    scored = (
        grams.join(F.broadcast(counts), "b")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.avg(log_ratio), 6).alias("avg_log_ratio"),
            F.round(F.sum(log_ratio), 6).alias("log_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("avg_log_ratio", F.lit(0.0)).alias("avg_log_ratio"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_gumbel_topk(
    docs: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir-v1",
    sample_salt: str = "resample-v1",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """DSIR step 3 (Xie et al. 2023): importance-RESAMPLE the corpus —
    draw k docs with probability ∝ exp(log_weight) via seeded
    Gumbel-top-k (Kool et al. 2019): key = log_weight + Gumbel(0,1),
    take the k largest.  Working in log space means the (often huge)
    log-ratios never pass through exp(), so there is no overflow and
    the draw is exact.

    The Gumbel noise is DETERMINISTIC — u = (md5(sample_salt, id)[0:12
    hex] + 1) / (16^12 + 1), g = -ln(-ln(u)) — so the sample is a pure
    function of (weights, salt): reproducible across cluster sizes and
    replayable by a SQL oracle (t5_seeded_random_pick's policy, scaled
    to weighted sampling).  Keys round to 6 dp (the log_weight inputs
    already do) so cross-engine ln() ulp can't flip the hash.

    Scale: the noise is one codegen projection; top-k is TakeOrdered
    (per-partition heap + driver merge of k·P candidates) — no global
    sort.  Returns (id_col, log_weight, gumbel_key), the selected docs.
    """
    weights = dsir_log_weights(
        docs,
        is_target,
        id_col=id_col,
        text_col=text_col,
        salt=salt,
        n_buckets=n_buckets,
    )
    denom = float(16**12 + 1)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.lit(sample_salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    ).cast("double") / F.lit(denom)
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn(
            "gumbel_key", F.round(F.col("log_weight") + gumbel, 6)
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(int(k))
        .select(id_col, "log_weight", "gumbel_key")
    )
