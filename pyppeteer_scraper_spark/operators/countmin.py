"""Count-Min sketch (Cormode & Muthukrishnan 2005) in relational form —
bounded-memory frequency estimation for heavy-hitter tracking over
unbounded key spaces (per-token counts over a 100-TB corpus, per-URL
hit counts over a crawl), completing the mergeable-sketch family next
to HyperLogLog++ and t-digest (a_sketch_aggregates).

The sketch IS a DataFrame: ``(d, b, cnt)`` with depth·width rows —
so "merge" is union + groupBy-sum (exact, associative, any number of
partial sketches), persistence is a parquet write, and the whole
structure stays engine-native (no UDAF, no binary blobs).  Build cost
is one explode (×depth, a small constant) + one map-side-combined
groupBy whose OUTPUT is bounded by depth·width however large the
input — the same bounded-key-space shape as the trigram LM fit.

Estimates are deterministic integer arithmetic over md5-derived
buckets, so a SQL oracle replays build AND query exactly
(q:a_countmin_heavy_hitters); the one-sided error guarantee
(estimate ≥ true count, overshoot bounded by collisions) is
pytest-asserted on a planted-skew corpus with a deliberately tiny
width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item, d, width: int, salt: str):
    """md5-derived bucket for depth row ``d`` — ANSI-replayable:
    ``('0x' || substr(md5(salt || d || chr(31) || item), 1, 6))::BIGINT
    % width``."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        d.cast("string"),
                        F.lit("\x1f"),
                        item.cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms-v1:",
) -> DataFrame:
    """Build the sketch table (d, b, cnt) from one item per input row
    (pre-explode multisets upstream)."""
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    ex = items.select(F.col(item_col).alias("__item"), d)
    return (
        ex.groupBy(
            "d", _bucket(F.col("__item"), F.col("d"), width, salt).alias("b")
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Exact merge of partial sketches built with identical
    (depth, width, salt): union + groupBy-sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms-v1:",
) -> DataFrame:
    """Point-estimate counts for the items in ``queries``: min over
    depth rows of the counter each depth hashes the item to.  Returns
    ``queries`` + ``cms_est`` (≥ the true count always; equality unless
    every depth row has a colliding key).

    The probe explodes each query item ×depth and equi-joins the
    sketch on (d, b) — the sketch side is depth·width rows, broadcast
    material at any corpus size.
    """
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    probes = queries.select(
        F.col(item_col), d
    ).withColumn("b", _bucket(F.col(item_col), F.col("d"), width, salt))
    hit = probes.join(F.broadcast(cms), ["d", "b"], "left").select(
        item_col, F.coalesce("cnt", F.lit(0)).alias("c")
    )
    return hit.groupBy(item_col).agg(
        F.min("c").cast("long").alias("cms_est")
    )
