"""Quality-first token-budget corpus selection — per source, admit
documents in descending model-quality order until a token budget is
exhausted (the FineWeb/DCLM-style "take the best N tokens per source"
curation step that sits between quality scoring and sequence packing).

Reference analog: the reference keeps only rows that pass its
per-scraper filter chain (e.g. /root/reference/scraper/home_depo.py:
444-455) — a boolean gate.  A training-data pipeline additionally has
a CAPACITY: the corpus target is "X tokens", not "everything that
passes", so the gate becomes a budgeted top-prefix per source.

Scale shape: ONE shuffle on source (the window partition key).  The
running token total is a window cumulative sum within each source
ordered by (score desc, doc_id) — no global sort, no driver collect.
Skew: the partition key has low cardinality (sources), so a mega
source funnels one task; the two-phase pre-rank in operators/topk.py
is the documented swap-in when a single source exceeds a task's rows
(the budget bound means only ~budget/min_doc_tokens rows per source
can ever be admitted, so pre-filtering to each source's top
candidates by score bounds the window input before the exact pass).

Determinism contract (driver hash parity): ordering uses the ROUNDED
(6 dp) sigmoid score from functions/classifier.py — hash-stable across
engines (text_model_quality is driver-green) — with doc_id as the
total-order tie-break, and the admitted set is {rows whose cumulative
tokens INCLUDING self <= budget} (a doc that would overshoot is
dropped, as are all after it in score order).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.classifier import quality_model_scored


def select_by_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit the best-scoring prefix of each source under a per-source
    token budget.  Returns one row per ADMITTED doc:
    (source, doc_id, n_tokens, score, cum_tokens).

    Token counting is the oracle family's whitespace split
    (``split(text, ' ')`` — single-space, empties counted) so the
    DuckDB twin is exact.
    """
    # staged model score (round 6): the Column form's score embeds the
    # tokenization 3x per row (classifier.quality_model_scored); text is
    # carried one projection so n_tokens uses the same input column
    scored = quality_model_scored(
        docs.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            F.col(text_col),
        ),
        text_col=text_col,
        carry=("source", "doc_id", text_col),
    ).select(
        "source",
        "doc_id",
        F.size(F.split(F.col(text_col), " ", -1)).cast("long").alias(
            "n_tokens"
        ),
        "score",
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
    )


def ucb1_host_allocation(
    rewards: DataFrame,
    n_rounds: int = 3,
    host_col: str = "host",
    ts_col: str = "ts",
    reward_col: str = "reward",
    order_cols: tuple = (),
) -> DataFrame:
    """UCB1 (Auer, Cesa-Bianchi & Fischer 2002) focused-crawl budget
    allocation: treat each host as a bandit arm whose pulls yield the
    host's successive observed rewards (e.g. fraction of novel URLs /
    quality of pages in each fetched batch), initialize with one pull
    per host, then spend ``n_rounds`` extra fetch slots greedily on

        UCB(h) = mean_h + sqrt(2 ln T / n_h)

    (T = total pulls so far; ties break to the lexicographically
    smallest host).  This is the exploration/exploitation policy for
    focused crawling — hosts that keep yielding novel content earn
    more of the politeness budget, cold hosts keep a guaranteed
    exploration bonus — replacing the reference's static per-scraper
    cron shares with a closed-loop allocation.

    Returns (host, n_pulls, mean_reward, ucb) with mean/ucb rounded to
    6 dp (ucb computed at the FINAL T, i.e. the score the next round
    would use).  A host pulled past its observed history yields reward
    0 (no data = no payoff).

    Scale shape: the reward log shuffles ONCE (row_number per host);
    the per-round loop touches only the (host, n, sum) stats table —
    bounded by the host count — and collects exactly ONE scalar row
    per round (the argmax arm), the same driver-contract class as
    PageRank's dangling-mass scalar.  The sequential rounds are
    inherent to the policy (each pull conditions on all previous
    pulls), not an implementation artifact.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(host_col).orderBy(*order)
    ranked = rewards.select(
        F.col(host_col).alias("host"),
        F.col(reward_col).cast("double").alias("r"),
        F.row_number().over(w).alias("rk"),
    ).persist()
    # init: one pull per host = its first reward
    stats = (
        ranked.filter(F.col("rk") == 1)
        .select("host", F.lit(1).alias("n"), F.col("r").alias("s"))
        .persist()
    )
    n_hosts = stats.count()
    if n_hosts == 0:
        # ADVICE r04: empty reward log -> empty allocation, not a
        # math.log(0) crash in the first policy round.
        out = stats.select(
            "host",
            F.col("n").cast("long").alias("n_pulls"),
            F.col("s").cast("double").alias("mean_reward"),
            F.col("s").cast("double").alias("ucb"),
        ).localCheckpoint(eager=True)
        stats.unpersist()
        ranked.unpersist()
        return out
    for t in range(n_rounds):
        total = n_hosts + t
        ucb = (F.col("s") / F.col("n")) + F.sqrt(
            2.0 * math.log(float(total)) / F.col("n")
        )
        pick = (
            stats.select("host", "n", ucb.alias("ucb"))
            .orderBy(F.desc("ucb"), "host")
            .limit(1)
            .collect()[0]
        )
        nxt = (
            ranked.filter(
                (F.col("host") == pick["host"])
                & (F.col("rk") == pick["n"] + 1)
            )
            .select("r")
            .collect()
        )
        got = nxt[0]["r"] if nxt else 0.0
        new_stats = stats.select(
            "host",
            F.when(F.col("host") == pick["host"], F.col("n") + 1)
            .otherwise(F.col("n"))
            .alias("n"),
            F.when(
                F.col("host") == pick["host"], F.col("s") + F.lit(got)
            )
            .otherwise(F.col("s"))
            .alias("s"),
        ).persist()
        new_stats.count()
        stats.unpersist()
        stats = new_stats
    final_total = n_hosts + n_rounds
    out = stats.select(
        "host",
        F.col("n").cast("long").alias("n_pulls"),
        F.round(F.col("s") / F.col("n"), 6).alias("mean_reward"),
        F.round(
            (F.col("s") / F.col("n"))
            + F.sqrt(2.0 * math.log(float(final_total)) / F.col("n")),
            6,
        ).alias("ucb"),
    ).localCheckpoint(eager=True)
    stats.unpersist()
    ranked.unpersist()
    return out
