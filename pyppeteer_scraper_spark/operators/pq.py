"""Product quantization (PQ) for embedding compression + approximate
distance, Spark-first.

Jegou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split the d-dim space into M orthogonal
subspaces, quantize each subvector against its own K-entry codebook,
and estimate query-to-vector distances asymmetrically (ADC) as the sum
of M table lookups.  Codes are M small ints (M bytes at K<=256) per
vector — a 64-dim float32 embedding (256 B) compresses ~64x, which is
what makes candidate scans affordable at 10^10-vector scale; composed
with the IVF coarse quantizer in ``similarity.ivf_index`` this is the
standard IVF-PQ / IVFADC layout.

Reference analog: none (the reference holds no vectors); this extends
the engine's similarity-search family (SURVEY.md "beyond the
reference" ANN requirement) with the compressed-domain scan path.

Scale notes:
- the codebook is M x K x (d/M) float64 — for M=16, K=256, d=128
  that's 512 KB; captured by closure => a true broadcast, never a
  shuffle.
- encode+ADC is ONE Arrow ``pandas_udf`` pass over the corpus — no
  shuffle at all; the per-batch temporary is n x M x K doubles
  (argmin distance tensor), bounded by the Arrow batch size
  (``spark.sql.execution.arrow.maxRecordsPerBatch``), not the corpus.
- the deterministic sample codebook (first K vectors in id order)
  keeps the whole pipeline hash-exactly oracle-checkable in SQL; a
  trained codebook is the same code path with ``codebook=`` swapped
  for per-subspace Lloyd output (``similarity.kmeans_relational``
  proves that training math under its own oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pq_sample_codebook(
    emb: DataFrame,
    n_sub: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic training-free codebook: subvectors of the ``k``
    smallest-id corpus vectors.  Returns (n_sub, k, subdim) float64.
    Collects k full vectors to the driver — KBs, independent of corpus
    size (same contract as ivf_index's centroid collect)."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"corpus has {len(rows)} < k={k} vectors")
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    dim = mat.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    # (k, n_sub, subdim) -> (n_sub, k, subdim)
    return mat.reshape(k, n_sub, dim // n_sub).transpose(1, 0, 2)


def pq_encode_adc(
    emb: DataFrame,
    codebook: np.ndarray,
    query: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its M PQ codes and attach the ADC
    (asymmetric) squared-distance estimate to ``query``.

    Output: (id_col, codes: array<int>, approx_d2: double).  The ADC
    lookup table (M x K) is built ONCE on the driver from the query
    and captured with the codebook; per row the estimate is M table
    lookups + a sum — never touches the original vector again, which
    is the compressed-domain scan that makes 10^10-vector candidate
    evaluation memory-bandwidth-bound instead of FLOP-bound."""
    n_sub, k, subdim = codebook.shape
    q = np.asarray(query, dtype=np.float64).reshape(n_sub, 1, subdim)
    # qtab[m, j] = ||q_m - C[m, j]||^2
    qtab = ((q - codebook) ** 2).sum(axis=2)

    out_t = T.StructType(
        [
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("approx_d2", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def enc(vs: pd.Series) -> pd.DataFrame:
        if not len(vs):
            return pd.DataFrame({"codes": [], "approx_d2": []})
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        xs = x.reshape(len(x), n_sub, subdim)
        # (n, n_sub, k): squared distance of each subvector to each
        # codeword; sum over the subdim axis matches the oracle's
        # per-(vid, m, cent) SUM group.
        d2 = ((xs[:, :, None, :] - codebook[None]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2).astype("int32")
        approx = qtab[np.arange(n_sub)[None, :], codes].sum(axis=1)
        return pd.DataFrame(
            {"codes": list(codes), "approx_d2": approx}
        )

    return emb.select(
        F.col(id_col), enc(F.col(vec_col)).alias("pq")
    ).select(id_col, "pq.codes", "pq.approx_d2")


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_sub: int = 4,
    pq_k: int = 16,
    iters: int = 2,
    train_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF-ADC top-k: IVF cells prune candidates, PQ codes price them.

    The FAISS ``IVFx,PQy`` layout minus residual refinement: corpus
    vectors are (a) assigned to an IVF cell (``similarity.ivf_index``
    spherical k-means) and (b) PQ-encoded ONCE against the sample
    codebook; each query scans only its ``n_probe`` nearest cells and
    ranks candidates by the ADC table-lookup estimate — it never
    touches a full corpus vector again.  At 10^10 vectors that is the
    difference between streaming M-byte codes and streaming 4d-byte
    floats through every candidate scan.  (Classic IVF-PQ encodes the
    RESIDUAL x - centroid[cell]; that refinement is a per-cell
    codebook swap on the same code path, left out to keep the encode
    corpus-independent.)

    Returns (result, cache_handle): result is (query_id, neighbor_id,
    rank, approx_d2); unpersist the handle after materializing.

    Scale shape: the per-query ADC table (n_sub x pq_k doubles) is
    built once per QUERY GROUP inside applyInPandas — grouped on
    query_id, so each group prices all its candidates with one
    vectorized gather; the candidate join is an equi-join on ``cell``
    (broadcast queries), identical to ivf_topk's pruning contract.
    """
    from pyppeteer_scraper_spark.operators.similarity import (
        ivf_index,
        with_unit_norm,
    )

    assigned, centroids, cache_handle = ivf_index(
        corpus,
        n_centroids=n_centroids,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    unit_corpus = with_unit_norm(corpus, vec_col).select(
        F.col(id_col), F.col("unit").alias(vec_col)
    )
    if train_iters > 0:
        codebook = pq_train_codebook(
            unit_corpus, n_sub=n_sub, k=pq_k, iters=train_iters,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        codebook = pq_sample_codebook(
            unit_corpus, n_sub=n_sub, k=pq_k,
            id_col=id_col, vec_col=vec_col,
        )
    n_sub_, k_, subdim = codebook.shape

    # encode the corpus once: codes ride with the cell assignment
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        xs = x.reshape(len(x), n_sub_, subdim)
        d2 = ((xs[:, :, None, :] - codebook[None]) ** 2).sum(axis=3)
        return pd.Series(list(d2.argmin(axis=2).astype("int32")))

    coded = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        enc(F.col("unit")).alias("codes"),
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
    cand = coded.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("approx_d2", T.DoubleType()),
        ]
    )

    def adc_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qv = np.asarray(pdf["qv"].iloc[0], dtype=np.float64).reshape(
            n_sub_, 1, subdim
        )
        qtab = ((qv - codebook) ** 2).sum(axis=2)  # (n_sub, pq_k)
        codes = np.stack(
            [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
        )
        d2 = qtab[np.arange(n_sub_)[None, :], codes].sum(axis=1)
        order = np.lexsort((pdf["neighbor_id"].to_numpy(), d2))[:k]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": pdf["neighbor_id"].to_numpy()[order],
                "rank": np.arange(1, len(order) + 1, dtype="int32"),
                "approx_d2": np.round(d2[order], 6),
            }
        )

    result = cand.groupBy("query_id").applyInPandas(adc_group, out_schema)
    return result, cache_handle


def pq_train_codebook(
    emb: DataFrame,
    n_sub: int = 4,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the PQ codebook with per-subspace Lloyd iterations, all M
    subspaces in parallel per corpus pass (Jegou et al. 2011 §III.A).

    Init is the deterministic sample codebook; each iteration is ONE
    mapInPandas pass emitting per-batch partial sums keyed
    (subspace, code, component) — at most n_sub*k*subdim rows per
    batch, so the shuffle and the driver collect are codebook-sized
    (KBs) however large the corpus.  Empty cells keep their previous
    codeword (same policy as ivf_index).
    """
    codebook = pq_sample_codebook(
        emb, n_sub=n_sub, k=k, id_col=id_col, vec_col=vec_col
    )
    n_sub_, k_, subdim = codebook.shape
    src = emb.select(F.col(vec_col).alias("v"))

    for _ in range(iters):
        cb = codebook  # capture current iterate

        def partials(batches, cb=cb):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                )
                xs = x.reshape(len(x), n_sub_, subdim)
                d2 = ((xs[:, :, None, :] - cb[None]) ** 2).sum(axis=3)
                codes = d2.argmin(axis=2)  # (n, n_sub)
                out = {"m": [], "code": [], "j": [], "s": [], "n": []}
                for m in range(n_sub_):
                    for c in np.unique(codes[:, m]):
                        sel = xs[codes[:, m] == c, m, :]
                        out["m"].extend([m] * subdim)
                        out["code"].extend([int(c)] * subdim)
                        out["j"].extend(range(subdim))
                        out["s"].extend(sel.sum(axis=0).tolist())
                        out["n"].extend([len(sel)] * subdim)
                import pandas as _pd

                yield _pd.DataFrame(out)

        agg = (
            src.mapInPandas(
                partials,
                "m int, code int, j int, s double, n long",
            )
            .groupBy("m", "code", "j")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = codebook.copy()
        for r in agg:
            if r["n"]:
                new[r["m"], r["code"], r["j"]] = r["s"] / r["n"]
        codebook = new
    return codebook
