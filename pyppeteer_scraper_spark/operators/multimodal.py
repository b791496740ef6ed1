"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The real decode step (PIL/ffmpeg/torchaudio) is STUBBED — those libs
are not in this container — behind ``decoder=`` hooks that default to
a deterministic fake.  Everything Spark-side is real and tested:
schemas, batch shapes, partitioning, and the UDF signatures a decoder
plugs into.  Reference analog: the screenshot binary sink
(/root/reference/scraper/costco.py:123-128) — binary payloads ride in
ordinary columns.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: folds the payload
    bytes into a fixed-dim float vector.  Replace with a real
    PIL/ffmpeg decode when the libs exist."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return arr.reshape(-1, dim).mean(axis=0).astype(np.float32) / 255.0


def real_decode_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """The seam a real decoder fills.  Kept explicit so downstream code
    paths exercise the error contract too."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this container; "
        "pass decoder=fake_decode or plug in PIL/ffmpeg here"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    batch_note_dim: int = 8,
) -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item feature vectors.

    mapInPandas keeps one Arrow batch in flight per task; the binary
    column never round-trips through the driver.  Partitioning of the
    input is preserved — repartition upstream by size if payloads are
    skewed (e.g. video >> image).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index, computed from metadata only (the decode itself is the
    stubbed step).  Demonstrates the explode-shaped UDTF plumbing."""
    from pyspark.sql import functions as F

    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idxs = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idxs).alias("frame_idx"))
    )
