"""Corpus-composition ("data mixing") weights — temperature-scaled
multinomial sampling over sources, the mC4/mT5 recipe (Xue et al. 2021
§3.1, after Arivazhagan et al. 2019): sample source ``s`` with

    p_s ∝ (n_tokens_s) ** alpha          (alpha ∈ (0, 1])

so low-resource sources are up-sampled relative to their raw share
(alpha=1 reproduces natural proportions; alpha→0 approaches uniform).
Also reports each source's effective epoch count under a token budget
— the "how many times will this slice repeat in training" number a
mixing design is judged by.

The reference has no corpus assembly stage; this is the step between
"deduped, filtered documents" and "training shards" at 100 TB.  Pure
aggregation: one groupBy over the corpus (map-side partial agg), then
arithmetic over ≤|sources| rows — nothing here scales with corpus
size except the single token-count pass.  (The unpartitioned windows
below run over the ≤|sources|-row AGGREGATE, not the corpus — a
driver-scale table, no single-partition risk.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temperature_mix_weights(
    docs: DataFrame,
    group_cols: list | None = None,
    token_count=None,
    alpha: float = 0.3,
    token_budget: int | None = None,
) -> DataFrame:
    """Per-group sampling weights: (group_cols..., n_docs, n_tokens,
    raw_share, weight[, epochs]).

    ``token_count``: a Column of per-doc token counts (default: the
    single-space split count — the engine-wide tokenizer semantics,
    functions/text.py).  ``weight`` = n_tokens^alpha normalized over
    groups, rounded to 6 dp.  With ``token_budget``, ``epochs`` =
    weight * budget / n_tokens — values > 1 mean that slice repeats
    during training.
    """
    if group_cols is None:
        group_cols = ["source"]
    if token_count is None:
        token_count = F.size(F.split(F.col("text"), " ", -1))
    per = docs.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count).cast("long").alias("n_tokens"),
    )
    total = Window.partitionBy()
    scaled = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    weight = scaled / F.sum(scaled).over(total)  # unrounded for epochs
    cols = [
        *group_cols,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), 6).alias(
            "raw_share"
        ),
        F.round(weight, 6).alias("weight"),
    ]
    if token_budget is not None:
        cols.append(
            F.round(
                weight * F.lit(float(token_budget)) / F.col("n_tokens"), 6
            ).alias("epochs")
        )
    return per.select(*cols)
