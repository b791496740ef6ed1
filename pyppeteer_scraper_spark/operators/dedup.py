"""Deduplication operators for web-text corpora, Spark-first.

The reference dedups one record at a time against a JSON seen-set
(/root/reference/scraper/home_depo.py:472-491); a 100 TB corpus needs
the full family: exact (hash groupBy), MinHash+LSH banding, SimHash,
and n-gram Jaccard — each expressed with built-in JVM-side operators
(explode → hash → groupBy/min → band-bucket self-join), no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups keyed by md5(text): canonical id = min id.

    Output: (fp, canonical_id, n_dups).  Scale note: a groupBy on the
    128-bit fingerprint — uniform keys, no skew, map-side partial agg.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups"))
    )


def word_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs of k-word shingles — JVM-side via split +
    transform over positions + explode.

    The tokenization is materialized in its OWN projection first
    (round 6): referencing ``split(text)`` inside the transform lambda
    re-evaluates the regex split per POSITION — O(words²) regex work
    per doc — because codegen does not common-subexpression-eliminate
    into higher-order-function lambdas.  Splitting once per row in a
    preceding Project is ~4× faster on the bench corpus (guide §1.2
    "per-task work").

    ``distinct=False`` skips the (id, shingle) dedup shuffle — correct
    whenever every consumer aggregate is MULTISET-INVARIANT (min() for
    minhash, collect_set() for exact set verify): duplicates change
    neither, so the result is identical and the shingle table reaches
    the consumer's groupBy with ONE exchange instead of two (round 6,
    guide §2.4).  Keep the default for consumers that COUNT shingles
    (document frequency, containment sizes)."""
    toks = F.col("__toks")
    n = F.size(toks)
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))  # noqa: E731
    out = (
        df.select(
            F.col(id_col), F.split(F.col(text_col), r"\s+").alias("__toks")
        )
        .select(F.col(id_col), F.explode(F.transform(idxs, shingle)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_perm: int = 64
) -> DataFrame:
    """(id, sig array<long>[n_perm]): n_perm independent permutations
    simulated by seeding xxhash64 with the permutation index (all
    codegen'd; the classic MinHash construction from Broder '97).

    Round 6 (guide §2.3 "aggregate before you shuffle"): computed as
    n_perm min-aggregates over the SHINGLE rows — one partially-
    aggregated row per (doc, map partition) crosses the exchange —
    instead of the old explode(sequence(0, n_perm-1)) form, which
    shuffled |shingles| × n_perm rows (64× the shingle table) into a
    (doc, perm) groupBy.  The minhash VALUES are identical:
    min over xxhash64(shingle, perm) for the same (shingle, perm)
    pairs, only the aggregation shape changed."""
    return shingles.groupBy(id_col).agg(
        F.array(
            *[
                F.min(F.xxhash64(F.col("shingle"), F.lit(p)))
                for p in range(n_perm)
            ]
        ).alias("sig")
    )


def minhash_band_candidates(
    sig: DataFrame, id_col: str, n_perm: int, bands: int
) -> DataFrame:
    """Candidate (a, b) pairs sharing ≥1 LSH band signature.  The band
    self-join is an equi-join on the band's minhash slice (no skew:
    xxhash64 values are uniform); true duplicates cluster in small
    buckets, so the join output stays near-linear in the duplicate
    count.

    Round 6: bands are array SLICES of the one-row-per-doc signature
    (posexplode of n_bands r-long slices) joined on array equality —
    the old path re-aggregated the exploded (doc, perm) rows into md5
    band strings (an extra shuffle + hash per band).  Same candidate
    set: equality of the r minhash longs IS equality of the old md5
    over them (the md5 only ever added false-positive collisions)."""
    rows_per_band = n_perm // bands
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.slice("sig", b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a = banded.select(F.col(id_col).alias("a"), "band", "key")
    b = banded.select(F.col(id_col).alias("b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding, verified by
    estimated Jaccard (fraction of agreeing minhashes).

    Pipeline: shingle → minhash (n_perm) → band signature → self-join
    on (band, signature) → estimate jaccard from full signatures →
    filter ≥ threshold.

    Output: (a, b, jaccard_est) with a < b.
    """
    # sig feeds the banding AND both verify sides: materialize once
    # (one row per doc, n_perm longs) instead of replaying the shingle
    # explode 3x
    sig = minhash_signatures(
        word_shingles(df, text_col, id_col, k, distinct=False), id_col, n_perm
    ).localCheckpoint()
    candidates = minhash_band_candidates(sig, id_col, n_perm, bands)
    sa = sig.select(F.col(id_col).alias("a"), F.col("sig").alias("siga"))
    sb = sig.select(F.col(id_col).alias("b"), F.col("sig").alias("sigb"))
    # estimated jaccard = fraction of agreeing minhash slots, computed
    # per candidate pair from the two signature ARRAYS in one codegen
    # zip_with — the old row-format verify joined the 64-rows-per-doc
    # signature table twice and re-aggregated per pair (guide §2.3)
    est = (
        candidates.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with(
                            "siga", "sigb", lambda x, y: x == y
                        ),
                        lambda v: v,
                    )
                )
                / F.lit(float(n_perm)),
                6,
            ).alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= threshold)
    )
    return est


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash (Charikar '02): per-token hash, bitwise weighted
    majority vote, reassembled to one long.  Entirely JVM-side: explode
    tokens → xxhash64 → per-bit ±1 sums via shiftright/&1 → sign bits.

    Output: (id, simhash).
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs under Hamming distance ≤ max_hamming using the
    block-permutation trick (Manku et al. '07): split the 64-bit
    signature into n_blocks 16-bit blocks; any pair within distance
    ``n_blocks - 1`` must agree on ≥ 1 block → equi-join per block.

    Output: (a, b, hamming).
    """
    # sig (one row per doc, 2 longs) feeds BOTH sides of the block
    # self-join; unpinned, the token explode + 64-column vote aggregate
    # would be evaluated twice (guide §2.4 — same fix as the SRP
    # signature pin in similarity.py)
    sig = simhash(df, text_col, id_col).localCheckpoint()
    blocks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * (64 // n_blocks))
                        .bitwiseAND(F.lit((1 << (64 // n_blocks)) - 1))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.blk"), F.col("bk.key"))
    a = blocks.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("sa"), "blk", "key"
    )
    b = blocks.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("sb"), "blk", "key"
    )
    pairs = (
        a.join(b, ["blk", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard between all qualifying pairs (the
    brute-force baseline the MinHash estimate approximates).

    Output: (a, b, n_common, n_union, jaccard).  Quadratic — use only
    on bounded candidate sets; at scale MinHash-LSH supplies the
    candidates and this verifies them.
    """
    toks = F.array_distinct(F.split(F.col(text_col), r"\s+"))
    t = df.select(F.col(id_col), toks.alias("toks"))
    a = t.select(F.col(id_col).alias("a"), F.col("toks").alias("ta"))
    b = t.select(F.col(id_col).alias("b"), F.col("toks").alias("tb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_common"),
            F.size(F.array_union("ta", "tb")).cast("long").alias("n_union"),
        )
        .withColumn(
            "jaccard", F.round(F.col("n_common") / F.col("n_union"), 6)
        )
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_jaccard_pairs_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT k-shingle Jaccard near-dup pairs without the crossJoin:
    MinHash-LSH banding proposes candidates (sublinear bucket equi-join),
    then each candidate is verified with the exact shingle-set Jaccard —
    precision is exact by construction; a true pair at jaccard j is
    missed with probability (1-j^r)^b (r=n_perm/bands rows per band),
    ≈ 7e-14 at j=0.96 with the defaults.  This is the scale path for
    what ``ngram_jaccard_pairs`` computes by brute force.

    Output: (a, b, n_common, n_union, jaccard) with a < b.
    """
    # distinct=False: both consumers below (min aggregate, collect_set)
    # are multiset-invariant, so the dedup shuffle is pure overhead
    shingles = word_shingles(df, text_col, id_col, k, distinct=False)
    # one row per doc; both band-join sides read it — materialize so
    # the shingle→min aggregation runs once, not twice (r06: the sig is
    # now already one row per doc, so this pin is docs × n_perm longs)
    sig = minhash_signatures(shingles, id_col, n_perm).localCheckpoint()
    candidates = minhash_band_candidates(sig, id_col, n_perm, bands)
    # one row per doc; read by both verify sides — materialize so the
    # shingle explode + collect_set aggregation runs once, not twice
    sets = shingles.groupBy(id_col).agg(
        F.collect_set("shingle").alias("sh")
    ).localCheckpoint()
    sa = sets.select(F.col(id_col).alias("a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col(id_col).alias("b"), F.col("sh").alias("shb"))
    return (
        candidates.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias("n_common"),
            F.size(F.array_union("sha", "shb")).cast("long").alias("n_union"),
        )
        .withColumn("jaccard", F.round(F.col("n_common") / F.col("n_union"), 6))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Resolve near-dup pairs to a keep-set: drop every id that appears
    as the larger member of a pair (min-id-wins union-find
    approximation, single pass — the standard corpus-dedup shortcut).
    NOT transitive: in a chain a–b, b–c the pair (a,c) may be absent and
    b is dropped anyway, so c survives even though it transitively
    matches a.  For true transitive resolution use
    :func:`connected_components` + :func:`dedup_keep_components`."""
    drop = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node points its strictly-larger
    neighbors at the minimum of its closed neighborhood."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("__mn"))
    return (
        sym.join(mins, "a")
        .withColumn("__m", F.least(F.col("a"), F.col("__mn")))
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("__m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge large→small, then every
    node points its ≤-neighbors (and itself) at the neighborhood min."""
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).distinct()
    mins = oriented.groupBy("a").agg(F.min("b").alias("__mn"))
    joined = oriented.join(mins, "a")
    return (
        joined.select(F.col("b").alias("a"), F.col("__mn").alias("b"))
        .union(mins.select("a", F.col("__mn").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive near-dup resolution: connected components over a pair
    graph via alternating large-star / small-star contraction (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    O(log n) rounds of groupBy-min + self-join, all JVM-side, no
    driver-held state beyond one 2-long convergence aggregate per round.

    ``pairs``: (a, b) edges (e.g. the output of :func:`minhash_lsh_pairs`
    or :func:`ngram_jaccard_pairs`).  ``nodes``: optional one-column
    frame of ``id_col`` members; isolated nodes label themselves.

    Output: (``id_col``, component) where component is the minimum id in
    the node's component.

    Scale notes: each round is two shuffles on uniformly-hashed ids; the
    high-degree "min" node of a giant component is exactly what
    large-star contracts first, so skew self-resolves (the paper's
    point).  Lineage is truncated every round with an eager
    localCheckpoint — without it the plan doubles per iteration.  The
    reference resolves duplicates one record at a time against a JSON
    seen-set (/root/reference/scraper/home_depo.py:472-491); this is the
    corpus-scale equivalent for pair graphs.
    """
    edges = (
        pairs.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # Convergence = edge set fixed point; one tiny aggregate per
        # round (order-independent xor-hash signature — xor, not sum,
        # which overflows under ANSI mode), no collect of the edge set.
        row = edges.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # At the fixpoint every edge is (member, component-min) with
    # member > min, so the component roots never appear on the `a` side;
    # union in their self-labels so every non-isolated node gets a row
    # even without an explicit `nodes` frame (isolated nodes still need
    # `nodes` — the pair graph never saw them).
    labels = edges.select(F.col("a").alias(id_col), F.col("b").alias("component"))
    if nodes is None:
        roots = edges.select(
            F.col("b").alias(id_col), F.col("b").alias("component")
        ).distinct()
        return labels.union(roots)
    return (
        nodes.select(F.col(id_col).cast("long"))
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )


def dedup_keep_components(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Transitive keep-set: one survivor (the min id) per connected
    component of the pair graph — the exact version of
    :func:`dedup_keep_canonical`."""
    comp = connected_components(pairs, nodes=df.select(id_col), id_col=id_col)
    keep = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    pos_factor: int = 100_000,
) -> DataFrame:
    """Corpus-level line deduplication (the C4 preprocessing rule): every
    line keeps exactly its FIRST occurrence across the whole corpus —
    first = minimum (doc id, line position) — and later occurrences are
    dropped; documents are reassembled from their surviving lines.

    Output: (id_col, n_lines, n_kept, text_kept) — docs whose every line
    was claimed elsewhere disappear (n_kept would be 0), which is the C4
    behavior.

    Scale shape: posexplode → the owner aggregation shuffles only
    (md5(line), encoded-position) pairs — 24 B rows, map-side combined,
    uniform keys — then one equi-join back and a per-doc reassembly
    groupBy.  The corpus' line text itself is shuffled once (by doc id,
    for reassembly), which any line-level rewrite must pay.  Ordering is
    encoded as ``id*pos_factor + pos`` (1-based pos; caller guarantees
    lines-per-doc < pos_factor) so the min is a plain long — the same
    arithmetic a SQL oracle can express.

    ``line_sep`` is a LITERAL separator (escaped before the regex-based
    ``F.split``), so split and reassembly agree for any separator.
    """
    import re as _re

    sep_re = _re.escape(line_sep)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re)).alias("pos0", "line"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        "line",
        (F.col(id_col).cast("long") * pos_factor + F.col("pos0") + 1).alias(
            "okey"
        ),
        F.md5("line").alias("lh"),
    )
    owners = lines.groupBy("lh").agg(F.min("okey").alias("first_key"))
    # per-doc line count is derivable row-locally from the ORIGINAL
    # frame — no second pass over the exploded corpus, and the join-back
    # input is doc-sized, not line-sized
    n_lines = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep_re)).alias("n_lines"),
    )
    kept = lines.join(owners, "lh").filter(F.col("okey") == F.col("first_key"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                line_sep,
            ).alias("text_kept"),
        )
        .join(n_lines, id_col)
        .select(id_col, "n_lines", "n_kept", "text_kept")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 64,
    threshold: float = 0.95,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 512,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    dedup for training corpora — cluster with spherical k-means, then
    within each cluster greedily keep one exemplar per semantic-
    duplicate group (leader pass in ascending id order: an item is
    dropped iff some already-KEPT lower-id item in its cluster has
    cosine > ``threshold``; min-id survivor matches this module's other
    keep rules).

    Reuses the IVF coarse quantizer (operators/similarity.py::ivf_index
    — deterministic init, Lloyd iterations with KB-scale driver
    collects).  Returns ``(verdicts, cache_handle)``: verdicts =
    (id, cell, kept, dup_of, cosine) where dup_of is the kept item the
    drop scored highest against (NULL for kept rows); unpersist the
    handle after materializing.

    Scale shape: the expensive step is per-CLUSTER, not per-corpus —
    one applyInPandas over ``cell`` (an equi-shuffle on a bounded key
    space, never a crossJoin; the plan-quality all-pairs ban applies).
    Within a cluster the leader pass runs on chunked matmuls (peak
    memory O(chunk × cell), never cell²) with a sequential resolve only
    over precomputed rows.  Cluster size is the knob: mean n/k rows —
    at 10^9 docs raise n_centroids to ~10^4-10^5 (SemDeDup's published
    regime) so cells stay ~10^4-10^5 rows.  Cross-cluster near-dups can
    survive by construction — the method's documented recall trade; the
    LSH family (embedding_near_dup_pairs) is the no-partition
    alternative.
    """
    import numpy as np
    import pandas as pd

    from pyppeteer_scraper_spark.operators.similarity import ivf_index

    assigned, _, handle = ivf_index(
        corpus, n_centroids=n_centroids, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    out_schema = (
        f"{id_col} long, cell int, kept boolean, dup_of long, cosine double"
    )
    thr = float(threshold)

    def leader_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["unit"]])
        n = len(pdf)
        kept = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        best = np.full(n, np.nan)
        kept_rows: list[int] = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            blk = m[s:e]
            # two matmuls per chunk: vs already-kept rows, vs the chunk
            # itself (sequential dependency resolved in the cheap loop)
            prior = blk @ m[kept_rows].T if kept_rows else None
            intra = blk @ blk.T
            for i in range(e - s):
                sims_prior = prior[i] if prior is not None else np.empty(0)
                local = [j for j in range(i) if kept[s + j]]
                sims_local = intra[i, local] if local else np.empty(0)
                sims = np.concatenate([sims_prior, sims_local])
                if sims.size and sims.max() > thr:
                    srcs = np.concatenate(
                        [np.asarray(kept_rows), np.asarray([s + j for j in local])]
                    ).astype(np.int64)
                    a = int(sims.argmax())
                    dup_of[s + i] = ids[srcs[a]]
                    best[s + i] = round(float(sims[a]), 6)
                else:
                    kept[s + i] = True
            kept_rows.extend(s + i for i in range(e - s) if kept[s + i])
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": pdf["cell"].to_numpy(),
                "kept": kept,
                "dup_of": pd.array(
                    [None if d < 0 else int(d) for d in dup_of], dtype="Int64"
                ),
                "cosine": best,
            }
        )

    verdicts = assigned.groupBy("cell").applyInPandas(leader_pass, out_schema)
    return verdicts, handle


def substring_dup_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact-substring duplication coverage (the measurement half of
    Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 — their suffix-array pass finds repeated
    >=k-token spans; at Spark scale the equivalent signal is k-token
    window hashing): a token position counts as duplicated when some
    k-token window covering it occurs MORE THAN ONCE in the corpus
    (another document, or another position of the same document).

    Output: (id, n_tokens, n_dup_tokens, dup_frac) — one row per input
    document, zeros for docs shorter than ``k`` tokens.

    Scale shape: one posexplode to (id, pos, md5(window)) ~ O(total
    tokens) rows; duplicate-window detection is a groupBy on the
    uniform 128-bit hash (map-side combine, no skew); marked windows
    re-join on the same hash (equi-join).  Overlapping windows are
    merged per document with a gaps-and-islands window over
    (id, pos) — summing island extents instead of exploding k coverage
    positions per window keeps the shuffle O(duplicated windows), not
    O(k x windows).
    """
    toks = F.split(F.col(text_col), r"\s+")
    base = df.select(
        F.col(id_col), toks.alias("toks"), F.size(toks).cast("long").alias("n_tokens")
    )
    wins = base.filter(F.col("n_tokens") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_tokens") - k).cast("int")),
                lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i + 1, F.lit(k)))),
            )
        ).alias("pos", "wh"),
    )
    # one hash-partitioned window count replaces groupBy(wh) + re-join:
    # the token/window explode is evaluated once and the wh key is
    # shuffled once instead of twice (guide §2.4); c > 1 marks the same
    # rows the dup-hash semi-join did
    dwins = (
        wins.withColumn("c", F.count("*").over(Window.partitionBy("wh")))
        .filter(F.col("c") > 1)
        .select(id_col, "pos")
    )

    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dwins.withColumn(
        "flag",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn("gid", F.sum("flag").over(w))
    per_doc = (
        flagged.groupBy(id_col, "gid")
        .agg((F.max(F.col("pos") + k) - F.min("pos")).alias("cov"))
        .groupBy(id_col)
        .agg(F.sum("cov").cast("long").alias("n_dup_tokens"))
    )
    return base.select(id_col, "n_tokens").join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        F.round(
            F.coalesce("n_dup_tokens", F.lit(0))
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("dup_frac"),
    )


def keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Representative selection for near-dup clusters: resolve ``pairs``
    transitively (:func:`connected_components`) and keep the HIGHEST-
    ``score_col`` member of each component, ties to the lowest id —
    the policy production dedup actually wants (C4/RefinedWeb keep a
    canonical copy; keeping the *best-quality* copy instead of the
    first-seen one is the standard refinement when a quality model is
    available).

    Returns (component, kept_id, kept_quality, n_members).

    Scale shape: the component table is O(docs) ids; the argmax is one
    max(struct) groupBy — no window, no per-component sort.
    """
    comp = connected_components(pairs, nodes=docs.select(id_col), id_col=id_col)
    j = comp.join(docs.select(id_col, score_col), id_col)
    return (
        j.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col(score_col).alias("q"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("m"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            "component",
            (-F.col("m.nid")).alias("kept_id"),
            F.col("m.q").alias("kept_quality"),
            "n_members",
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    df_cap: int = 50,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs — |A∩B| / |A| over distinct
    k-shingle sets (Broder's containment coefficient).

    Jaccard misses the commonest web duplication mode: one page
    *containing* another (aggregators quoting articles, boilerplate
    wrappers around syndicated bodies, paginated supersets).  A short
    doc fully embedded in a long one has Jaccard |A|/|B| ≈ 0 but
    containment(A in B) = 1.  The reference has no corpus-level notion
    of this at all; CC-scale curation pipelines dedup on containment
    to drop the embedded copy and keep the superset.

    Scale shape: posting-list equi-join on shared shingles — NEVER an
    all-pairs crossJoin.  A document-frequency cap (``df_cap``) drops
    boilerplate shingles whose posting lists would otherwise explode
    the self-join quadratically (the classic hot-key skew of "© 2026"
    grams); the cap bounds every join group at ``df_cap`` rows, so the
    worst-case intersection work is O(n_shingles · df_cap), linear in
    corpus size.  Numerator AND denominators are computed over the
    same df-capped shingle universe, so the coefficient stays a true
    ratio of the retained sets (self-consistent, oracle-mirrorable)
    rather than a mixed estimate.

    Output: (a, b, n_common, n_a, n_b, containment_a, containment_b)
    for a < b where max(containment) ≥ threshold.
    """
    # two eager materializations cap the pipeline at one shingle
    # explode: `grams` feeds the df aggregate and the retained join;
    # `rare` feeds the size aggregate and BOTH sides of the
    # intersection self-join (3 references; lazy caches race across
    # the join's concurrently-running sides).
    grams = word_shingles(df, text_col, id_col, k).localCheckpoint()
    rare = grams.join(
        grams.groupBy("shingle")
        .agg(F.count("*").alias("__gdf"))
        .filter(F.col("__gdf") <= df_cap)
        .select("shingle"),
        "shingle",
    ).localCheckpoint()
    sizes = rare.groupBy(id_col).agg(F.count("*").cast("long").alias("n"))
    inter = (
        rare.select(F.col(id_col).alias("a"), "shingle")
        .join(rare.select(F.col(id_col).alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("n_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("n_b")), "b")
        .select(
            "a",
            "b",
            "n_common",
            "n_a",
            "n_b",
            F.round(F.col("n_common") / F.col("n_a"), 6).alias("containment_a"),
            F.round(F.col("n_common") / F.col("n_b"), 6).alias("containment_b"),
        )
        .filter(F.greatest("containment_a", "containment_b") >= threshold)
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "title",
) -> DataFrame:
    """Exact edit-distance-1 near-dup pairs via deletion-neighborhood
    blocking (the FastSS / SymSpell scheme, Bocek et al. 2007):
    ed(x, y) <= 1 implies x and y share a common member of their
    1-deletion neighborhoods (delete-at-p covers deletion, insertion
    and substitution; the string itself covers identity), so the
    candidate set from an EQUI-JOIN on deletion variants is provably
    complete — never all-pairs, no recall loss.  Candidates are then
    verified with the built-in ``levenshtein`` (JVM codegen).

    Returns (id_a, id_b, dist) with id_a < id_b and dist <= 1.

    Scale shape: the variant table is (len+1) rows per string of ids +
    short variant strings; the self-join is an equi-join on variant
    (shuffle keyed by variant, no skew beyond shared-variant
    frequency); verification hydrates only candidate pairs.  At 100 TB
    this is the same banding-then-verify shape as MinHash-LSH — with
    an exactness guarantee instead of a recall floor.  For k >= 2 the
    neighborhood is C(len, k)-sized; production systems cap k at 1-2
    (this implements k=1).
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t")
    )
    # all 1-deletion variants + the string itself (i == length slot),
    # one codegen expression, distinct per id (duplicate chars give
    # duplicate variants)
    variants = base.select(
        "id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(t)), i -> "
                    "concat(substring(t, 1, i), substring(t, i + 2)))"
                )
            )
        ).alias("v"),
    )
    cands = (
        variants.alias("x")
        .join(variants.alias("y"), "v")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")
        )
        .distinct()
    )
    return (
        cands.join(base.select(F.col("id").alias("id_a"),
                               F.col("t").alias("ta")), "id_a")
        .join(base.select(F.col("id").alias("id_b"),
                          F.col("t").alias("tb")), "id_b")
        .withColumn("dist", F.levenshtein("ta", "tb"))
        .where(F.col("dist") <= 1)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )


def incremental_minhash_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Incremental near-dup detection: new batch vs existing corpus
    ONLY — the production recrawl/ingest shape, where each crawl
    round's documents are checked against the accumulated corpus
    without re-pairing the corpus with itself.

    Same banding-then-exact-verify contract as
    :func:`shingle_jaccard_pairs_lsh`, but the band join is
    ASYMMETRIC (new bands ⋈ corpus bands), so its cost is
    O(new × collision rate), independent of corpus-internal
    duplication — at 100 TB the corpus side is a persisted band-
    signature table maintained across rounds (append new bands after
    each batch), so each round reads signatures, never corpus text.

    Output: (new_id, corpus_id, n_common, n_union, jaccard) with
    jaccard >= threshold; exact shingle-set Jaccard, so precision is
    exact and the oracle can verify by brute force.
    """
    # distinct=False: min() and collect_set() below are multiset-
    # invariant, so the per-side dedup shuffles were pure overhead
    sh_new = word_shingles(new_df, text_col, id_col, k, distinct=False)
    sh_old = word_shingles(corpus_df, text_col, id_col, k, distinct=False)
    sig_new = minhash_signatures(sh_new, id_col, n_perm)
    sig_old = minhash_signatures(sh_old, id_col, n_perm)
    rows_per_band = n_perm // bands

    # r06: bands are array slices of the one-row-per-doc signature
    # joined on array equality (same candidate set as the old md5 band
    # strings — the md5 only ever added hash-collision false positives,
    # and the exact verify below filters candidates either way)
    def banded(sig):
        return sig.select(
            F.col(id_col),
            F.posexplode(
                F.array(
                    *[
                        F.slice(
                            "sig", b * rows_per_band + 1, rows_per_band
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "key"),
        )

    cands = (
        banded(sig_new)
        .select(F.col(id_col).alias("new_id"), "band", "key")
        .join(
            banded(sig_old).select(
                F.col(id_col).alias("corpus_id"), "band", "key"),
            ["band", "key"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    sets_new = sh_new.groupBy(id_col).agg(
        F.collect_set("shingle").alias("sha"))
    sets_old = sh_old.groupBy(id_col).agg(
        F.collect_set("shingle").alias("shb"))
    return (
        cands.join(
            sets_new.select(F.col(id_col).alias("new_id"), "sha"),
            "new_id")
        .join(
            sets_old.select(F.col(id_col).alias("corpus_id"), "shb"),
            "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias(
                "n_common"),
            F.size(F.array_union("sha", "shb")).cast("long").alias(
                "n_union"),
        )
        .withColumn(
            "jaccard", F.round(F.col("n_common") / F.col("n_union"), 6))
        .filter(F.col("jaccard") >= threshold)
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram,
    slide a w-hash window, select each window's minimum hash with the
    RIGHTMOST position breaking ties, dedupe selections.  Guarantees:
    any shared substring of length >= k + w - 1 contributes at least
    one identical fingerprint to both docs (the detection guarantee),
    while storing only ~2/(w+1) of all hashes — the local, position-
    robust alternative to MinHash when match LOCATION matters
    (plagiarism spans, quote detection, boilerplate localization).

    Engine-portable determinism: gram hash = first 40 bits of md5;
    rightmost-min tie-break is encoded arithmetically as
    ``h * 2^16 + (65535 - pos)`` so the window aggregate is a plain
    integer MIN — no struct ordering, bit-identical in any engine
    (positions must fit 16 bits: document offsets < 65536, ample for
    web pages; shard longer docs upstream).

    Scale shape: one explode (positions stay document-local), one
    window MIN per doc partition — a single shuffle on doc id; the
    distinct on selections is position-pruned to ~2N/w rows.  No
    UDFs, no all-pairs; cross-doc matching downstream is an equi-join
    on the fingerprint hash.
    """
    n_grams = F.length(F.col(text_col)) - k + 1
    grams = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n_grams >= 1,
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {k} + 1),"
                    f" i -> substring({text_col}, i, {k}))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("pos0", "gram"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),  # 1-based like substring()
        F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10)
        .cast("long")
        .alias("h"),
    )
    combined = (F.col("h") * F.lit(65536) + (F.lit(65535) - F.col("pos"))).alias(
        "key"
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        grams.select(id_col, "pos", combined)
        .withColumn("wmin", F.min("key").over(win))
        .withColumn(
            "n_pos",
            F.max("pos").over(Window.partitionBy(id_col)),
        )
        # only positions that START a full w-window select a fingerprint
        .filter(F.col("pos") <= F.col("n_pos") - (w - 1))
        .select(
            id_col,
            # exact integer division — wmin reaches 2^56, past double's
            # 53-bit mantissa, so `/` + cast would corrupt high hashes
            F.expr("wmin div 65536").alias("fp"),
            (F.lit(65535) - F.col("wmin") % F.lit(65536)).alias("fp_pos"),
        )
        .distinct()
    )
    return sel


def winnow_shared_spans(
    docs: DataFrame,
    k: int = 8,
    w: int = 16,
    max_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document quote/plagiarism candidates from winnowing
    fingerprints: docs sharing >= 1 selected fingerprint, scored by
    how many they share.  Returns (doc_a, doc_b, n_shared) with
    doc_a < doc_b.

    Skew control — the detail that decides whether this runs at
    100 TB: fingerprints of boilerplate ("all rights reserved")
    appear in millions of documents, and a raw self-join on fp would
    square the hottest posting. Fingerprints present in more than
    ``max_df`` documents are dropped BEFORE the join (the stop-gram
    cut — same role as stopword removal in inverted indexes; Broder's
    shingling work applies the identical document-frequency cut), so
    the join's per-key fan-out is bounded by max_df² regardless of
    corpus size.  Dropped fps are the commonest, least-informative
    ones; near-verbatim quotes of length >= k+w-1 still share RARE
    fingerprints by the winnowing guarantee.
    """
    fps = winnow_fingerprints(docs, k=k, w=w, text_col=text_col,
                              id_col=id_col)
    per_doc = fps.select(id_col, "fp").distinct()
    rare = (
        per_doc.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    pruned = per_doc.join(rare, "fp")
    a = pruned.select(F.col("fp"), F.col(id_col).alias("doc_a"))
    b = pruned.select(F.col("fp"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def cdc_chunks(
    docs: DataFrame,
    w: int = 8,
    bits: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync scheme — Muthitacharoen
    et al. SOSP 2001; FastCDC's min/max refinements are a documented
    non-goal here since their greedy skip is inherently sequential):
    a chunk boundary is cut after every w-gram whose hash has its low
    ``bits`` bits zero, so expected chunk length is 2^bits characters
    and — the whole point — boundaries are functions of CONTENT, not
    position: an insertion shifts offsets but downstream boundaries
    re-synchronize, so unchanged regions keep identical chunk hashes.
    That's what makes dedup of re-crawled/re-encoded WARC payloads
    work at the storage layer, where position-based (fixed-size)
    blocks would never realign.

    Returns (id, start, length, chunk_md5), 1-based inclusive spans
    covering the document exactly.

    Engine-portable determinism: gram hash = the usual 40-bit md5
    prefix; the boundary predicate and the span reconstruction (window
    lag over cut positions + an end-of-doc sentinel) are plain
    relational ops, so the SQL oracle states the identical derivation.

    Scale shape: one explode over gram positions (document-local), one
    per-doc window — a single shuffle keyed by doc id; chunk hashing
    re-reads the text via an equi-join on id.  Cross-corpus dedup
    downstream is a groupBy on chunk_md5.
    """
    n_grams = F.length(F.col(text_col)) - w + 1
    grams = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n_grams >= 1,
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {w} + 1),"
                    f" i -> substring({text_col}, i, {w}))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("pos0", "gram"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10)
        .cast("long")
        .alias("h"),
    )
    cuts = grams.filter(F.col("h") % F.lit(2**bits) == 0).select(
        id_col, (F.col("pos") + w - 1).alias("cut")
    )
    sentinel = docs.select(
        F.col(id_col), F.length(text_col).cast("long").alias("cut")
    ).filter(F.col("cut") > 0)
    all_cuts = cuts.select(id_col, F.col("cut").cast("long")).union(
        sentinel
    ).distinct()
    win = Window.partitionBy(id_col).orderBy("cut")
    spans = all_cuts.select(
        id_col,
        (F.coalesce(F.lag("cut").over(win), F.lit(0)) + 1).alias("start"),
        F.col("cut").alias("end"),
    )
    return (
        spans.join(docs.select(id_col, text_col), id_col)
        .select(
            id_col,
            "start",
            (F.col("end") - F.col("start") + 1).alias("length"),
            F.md5(
                F.expr(
                    f"substring({text_col}, start, end - start + 1)"
                )
            ).alias("chunk_md5"),
        )
    )


def winnow_matched_spans(
    docs: DataFrame,
    k: int = 8,
    w: int = 16,
    max_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Localize the shared spans behind winnowing matches: matched
    fingerprints between a doc pair that sit on a common alignment
    DIAGONAL (pos_b - pos_a constant) are one contiguous shared
    region; merging them with a gaps-and-islands pass recovers the
    span boundaries — the "where exactly is the quote" answer that
    winnow_shared_spans' pair counts don't give (the localization
    payoff Schleimer et al. §5 describe for MOSS match reporting).

    Returns (doc_a, doc_b, diag, a_start, a_end, n_fps) with
    doc_a < doc_b; the matched region in doc_b is the same span
    shifted by ``diag``.  Islands merge fingerprints on the same
    diagonal whose positions are within k + w - 1 (the winnowing
    guarantee distance: inside a shared span, consecutive selections
    are at most w windows apart).

    Scale shape: the df-capped fingerprint self-join from
    winnow_shared_spans (bounded fan-out), then one window over
    (pair, diag) ordered by position — shuffle keyed by the pair,
    island extents instead of exploded coverage rows.
    """
    fps = winnow_fingerprints(docs, k=k, w=w, text_col=text_col,
                              id_col=id_col)
    per = fps.select(id_col, "fp", "fp_pos")
    rare = (
        per.select(id_col, "fp").distinct()
        .groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    pruned = per.join(rare, "fp").localCheckpoint()
    a = pruned.select(
        F.col("fp"), F.col(id_col).alias("doc_a"), F.col("fp_pos").alias("pa")
    )
    b = pruned.select(
        F.col("fp"), F.col(id_col).alias("doc_b"), F.col("fp_pos").alias("pb")
    )
    matched = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "pa",
            (F.col("pb") - F.col("pa")).alias("diag"),
        )
        .distinct()
    )
    win = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    gap = k + w - 1
    prev = F.lag("pa").over(win)
    flagged = matched.withColumn(
        "flag",
        F.when(prev.isNull() | (F.col("pa") - prev > gap), 1).otherwise(0),
    ).withColumn("gid", F.sum("flag").over(win))
    return (
        flagged.groupBy("doc_a", "doc_b", "diag", "gid")
        .agg(
            F.min("pa").alias("a_start"),
            (F.max("pa") + k - 1).alias("a_end"),
            F.count("*").cast("long").alias("n_fps"),
        )
        .drop("gid")
    )
