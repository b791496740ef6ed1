"""Deterministic corpus splitting, stratified sampling, and split
decontamination — the train/valid/test half of a training-data pipeline.

The reference has no notion of dataset splits (it emits alert rows,
/root/reference/service/alert.py); these operators extend the engine the
same way the dedup/similarity family does: the operations a 100 TB
web-text corpus needs before it becomes training data.

Design notes (scale-first):
- Split assignment is a PROJECTION — no shuffle, no RNG state.  Each row
  hashes ``(salt, id)`` with md5 and compares the first 6 hex chars
  against precomputed threshold strings (lowercase hex is uniform in
  [0, 16^6) and ASCII-orders identically in every engine, so the same
  rule is expressible in DuckDB for the correctness oracle — Spark's
  xxhash64 is not).  6 hex chars = 16.7M buckets ⇒ split fractions are
  exact to ~6e-8.
- ``salt`` versions the split: changing it re-rolls membership globally,
  keeping it fixed keeps membership stable as the corpus grows (a doc's
  split never depends on other rows — the property that makes the split
  reproducible across ingestion batches and cluster sizes).
- Decontamination: exact form is a fingerprint semi-join (uniform md5
  keys — no skew); near-dup form reuses the MinHash-LSH banding path
  (never all-pairs) and keeps only candidate pairs that CROSS the
  train/eval boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_BUCKETS = 16**6


def _threshold_hex(cum_fraction: float) -> str:
    """Lowercase 6-hex-char threshold for a cumulative fraction —
    comparable against ``substring(md5(x), 1, 6)`` in Spark and DuckDB
    alike (digits sort before a-f in ASCII, so lexicographic order on
    the fixed-width hex string IS numeric order)."""
    return format(min(int(cum_fraction * _HEX_BUCKETS), _HEX_BUCKETS - 1), "06x")


def _hash_key(id_col: str, salt: str):
    # \x1f (unit separator) keeps (salt, id) concatenation unambiguous.
    return F.substring(
        F.md5(F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))), 1, 6
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    fractions: tuple = (("train", 0.90), ("valid", 0.05), ("test", 0.05)),
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label.

    ``fractions`` is an ordered (name, fraction) tuple summing to 1; the
    last split takes the remainder so rounding never drops a row.
    """
    key = _hash_key(id_col, salt)
    cum = 0.0
    expr = None
    for name, frac in fractions[:-1]:
        cum += frac
        cond = key < F.lit(_threshold_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = fractions[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    default: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance languages):
    keep a row iff its hash key falls under its stratum's threshold.

    Unlike ``df.sampleBy`` this is reproducible row-by-row (no RNG
    stream, no partition-order dependence) and therefore exactly
    oracle-able.  The when-chain suits tens of strata; for thousands,
    broadcast-join a (stratum, threshold) dim instead — same plan shape,
    still no shuffle of ``df``.
    """
    key = _hash_key(id_col, salt)
    # Branch on the STRATUM, decide keep/drop inside the branch: a listed
    # stratum's row that fails its own threshold must be dropped, never
    # fall through to the default test (which applies to unlisted strata
    # only).
    expr = None
    for stratum, frac in sorted(fractions.items()):
        # frac ≥ 1 keeps the whole stratum (no hex edge-loss)
        verdict = (
            F.lit(True) if frac >= 1.0 else key < F.lit(_threshold_hex(frac))
        )
        cond = F.col(strata_col) == stratum
        expr = (
            F.when(cond, verdict) if expr is None else expr.when(cond, verdict)
        )
    default_verdict = (
        F.lit(True) if default >= 1.0 else key < F.lit(_threshold_hex(default))
    )
    keep = default_verdict if expr is None else expr.otherwise(default_verdict)
    return df.filter(keep)


def stratified_hash_sample_join(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    default: float = 0.0,
) -> DataFrame:
    """The broadcast-join form of :func:`stratified_hash_sample` for
    LARGE strata counts (thousands+): the (stratum, threshold) pairs
    become a tiny broadcast dimension instead of a when-chain whose
    expression tree grows per stratum.  Same row-local semantics —
    results are identical (pytest-asserted) — and still no shuffle of
    ``df`` (broadcast hash join + filter).
    """
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, _threshold_hex(f) if f < 1.0 else "g") for s, f in fractions.items()],
        f"{strata_col} string, __thr string",
    )  # "g" > every hex char ⇒ frac≥1 keeps the whole stratum
    default_thr = _threshold_hex(default) if default < 1.0 else "g"
    return (
        df.join(F.broadcast(dim), strata_col, "left")
        .filter(_hash_key(id_col, salt) < F.coalesce("__thr", F.lit(default_thr)))
        .drop("__thr")
    )


def split_exact_contamination(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    train_split: str = "train",
) -> DataFrame:
    """Eval-split rows whose EXACT text also appears in the train split
    (the leakage a held-out set must not have).

    Output: (id_col, split, fp).  Semi-join on md5(text) — uniform
    128-bit keys, no skew; AQE may demote to broadcast when the train
    fingerprint set is small.
    """
    fps = df.select(
        F.col(id_col), F.col(split_col), F.md5(F.col(text_col)).alias("fp")
    )
    train_fps = fps.filter(F.col(split_col) == train_split).select("fp").distinct()
    return (
        fps.filter(F.col(split_col) != train_split)
        .join(train_fps, "fp", "left_semi")
        .select(id_col, split_col, "fp")
    )


def split_ngram_contamination(
    df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    train_split: str = "train",
) -> DataFrame:
    """Eval docs sharing ANY n-token n-gram with the train split — the
    GPT-3 decontamination rule (Brown et al. 2020 App. C: 13-gram
    overlap; also LLaMA / Gopher eval hygiene).  Exact-text dedup
    misses partial leakage (a benchmark question pasted inside a blog
    post); n-gram overlap catches it.

    Output: (eval_id, eval_split, n_grams, n_hits, contaminated) — one
    row per eval doc (hit or not), ``n_hits`` = how many of its
    n-grams appear anywhere in train.

    Scale shape: explode each doc into md5-fingerprinted n-gram
    windows (hash join keys: 16 B instead of ~100 B of gram text —
    same ids-only-shuffle policy as operators/similarity.py), distinct
    the train side (bounded by train token count), then a left-semi-
    style aggregate join.  Tokens are the engine-wide single-space
    split; docs shorter than n tokens have no windows and are clean by
    definition.
    """
    # split staged in its own projection (r06): in-lambda split()
    # re-evaluates per window start — codegen CSE stops at lambdas
    toks = F.col("__toks")
    n_toks = F.size(toks)
    windows = F.when(
        n_toks >= n,
        F.transform(
            F.sequence(F.lit(1), n_toks - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(" ", F.slice(toks, i, F.lit(n)))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the window projection (a 13-token concat + md5 PER TOKEN over
    # the whole corpus) is by far the dominant cost and is read three
    # times (train fingerprints, eval hits, eval sizes) — materialize
    # it once
    base = df.select(
        F.col(id_col),
        F.col(split_col),
        F.split(F.col(text_col), " ", -1).alias("__toks"),
    ).select(
        F.col(id_col), F.col(split_col), windows.alias("__w")
    ).localCheckpoint()
    train_fps = (
        base.filter(F.col(split_col) == train_split)
        .select(F.explode("__w").alias("fp"))
        .distinct()
    )
    ev = base.filter(F.col(split_col) != train_split)
    hits = (
        ev.select(F.col(id_col), F.explode("__w").alias("fp"))
        .join(train_fps, "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        ev.select(
            F.col(id_col).alias("eval_id"),
            F.col(split_col).alias("eval_split"),
            F.size("__w").cast("long").alias("n_grams"),
        )
        .join(hits.withColumnRenamed(id_col, "eval_id"), "eval_id", "left")
        .select(
            "eval_id",
            "eval_split",
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_neardup_contamination(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    train_split: str = "train",
    threshold: float = 0.7,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Eval docs NEAR-duplicating a train doc (MinHash-LSH banding →
    exact shingle-Jaccard verify → keep pairs crossing the boundary).

    Output: (eval_id, eval_split, train_id, jaccard).  Candidate
    generation is the bucketed LSH path — never all-pairs; the split
    filter runs after pair verification, so thresholds match
    ``shingle_jaccard_pairs_lsh`` exactly.
    """
    from pyppeteer_scraper_spark.operators.dedup import shingle_jaccard_pairs_lsh

    pairs = shingle_jaccard_pairs_lsh(
        df,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        n_perm=n_perm,
        bands=n_bands,
        k=shingle_k,
    )
    labels = df.select(F.col(id_col), F.col(split_col))
    lab = (
        pairs.join(
            labels.select(
                F.col(id_col).alias("a"), F.col(split_col).alias("split_a")
            ),
            "a",
        ).join(
            labels.select(
                F.col(id_col).alias("b"), F.col(split_col).alias("split_b")
            ),
            "b",
        )
    )
    a_is_eval = (F.col("split_a") != train_split) & (F.col("split_b") == train_split)
    b_is_eval = (F.col("split_b") != train_split) & (F.col("split_a") == train_split)
    return (
        lab.filter(a_is_eval | b_is_eval)
        .select(
            F.when(a_is_eval, F.col("a")).otherwise(F.col("b")).alias("eval_id"),
            F.when(a_is_eval, F.col("split_a"))
            .otherwise(F.col("split_b"))
            .alias("eval_split"),
            F.when(a_is_eval, F.col("b")).otherwise(F.col("a")).alias("train_id"),
            F.col("jaccard"),
        )
    )


def systematic_pps_sample(
    docs: DataFrame,
    n_samples: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    group_col: str = "source",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling — the
    deterministic, exactly-oracle-able way to draw a quality/size-
    weighted corpus sample (Madow 1949; the fixed-skip PPS design
    survey texts recommend when an order is available): lay all docs
    on a weight line in ``id_col`` order, place ``n_samples`` points
    at every ``step = total_weight div n_samples`` positions, and a
    doc is drawn once per point inside its [start, start+w) span —
    big docs can be drawn multiple times (replication counts, exactly
    how weighted corpus sampling repeats high-value slices).

    ALL integer arithmetic (ceil via (x + step - 1) div step), so two
    engines agree bit-for-bit — no float RNG to diverge on.

    Returns per ``group_col``: (group, n_docs, n_sampled, n_hits,
    w_total, w_sampled).

    Scale shape: the global prefix sum is the same two-pass bucketed
    form as operators/packing.py::pack_token_stream (per-bucket totals
    → tiny exclusive window over buckets → per-bucket parallel
    window); total weight is one 8-byte driver scalar.
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(group_col).alias("grp"),
        F.col(weight_col).cast("long").alias("w"),
        F.expr(f"cast({id_col} as bigint) div {int(bucket_size)}").alias(
            "__bucket"
        ),
    )
    # persist the tiny per-bucket totals: the total-weight collect
    # below materializes them, so the corpus scan runs exactly twice
    # (bucket totals + the final placed window), never a third time
    # just to sum weights the bucket aggregate already holds
    btotals = (
        base.groupBy("__bucket").agg(F.sum("w").alias("__btotal")).persist()
    )
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    boffsets = btotals.select(
        "__bucket",
        F.coalesce(F.sum("__btotal").over(wb), F.lit(0)).alias("__base"),
    )
    wd = Window.partitionBy("__bucket").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    placed = base.join(F.broadcast(boffsets), "__bucket").withColumn(
        "start",
        F.col("__base") + F.coalesce(F.sum("w").over(wd), F.lit(0)),
    )
    total = btotals.agg(F.sum("__btotal")).collect()[0][0] or 0
    step = max(int(total) // int(n_samples), 1)
    n_hits = F.expr(
        f"((start + w + {step} - 1) div {step})"
        f" - ((start + {step} - 1) div {step})"
    )
    return (
        placed.withColumn("n_hits", n_hits)
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("n_hits") > 0).cast("long"))
            .cast("long")
            .alias("n_sampled"),
            F.sum("n_hits").cast("long").alias("n_hits"),
            F.sum("w").cast("long").alias("w_total"),
            F.sum(F.when(F.col("n_hits") > 0, F.col("w")).otherwise(0))
            .cast("long")
            .alias("w_sampled"),
        )
    )


def weighted_sample_ares(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ares",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, the A-ES scheme): draw u ~ U(0,1]
    per row from a salted hash, rank by key = -ln(u)/w, keep the k
    smallest.  Inclusion probability is proportional to weight, the
    whole draw is one deterministic pass (re-runs and engines agree
    bit-for-bit because u comes from md5, not an RNG), and unlike
    sequential weighted draws it needs NO global state — the
    canonical distributed form of "sample 10M docs weighted by
    quality" at corpus scale.

    Spark executes the top-k as TakeOrderedAndProject (per-partition
    partial top-k, then a k-row merge — never a full global sort).

    Output: (id, weight, ares_key, rnk), smallest key first.
    """
    v = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("double")
    u = (v + 1) / F.lit(float(16**8 + 1))
    key = -F.log(u) / F.col(weight_col).cast("double")
    keyed = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        F.round(key, 10).alias("ares_key"),
    )
    w = Window.orderBy("ares_key", id_col)
    return (
        keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
