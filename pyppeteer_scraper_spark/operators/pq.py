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
