"""Sharded bloom-filter URL-seen sidecar (north_rule: "URL-seen dedup
via a sharded bloom/cuckoo filter maintained per partition").

Role at scale: the exact left-anti join against ``url_seen`` shuffles
candidate URLs against a 10^10-row table every round.  A per-shard
bloom filter — shard = pmod(url_hash, n_shards), host-aligned with the
frontier's partitioning — answers "definitely unseen" locally for the
overwhelming majority of fresh links, so only bloom-positives (true
seen + false positives at rate ~(1-e^{-kn/m})^k) reach the exact
anti-join.  False positives are corrected by that exact join; false
negatives are impossible, so results are byte-identical with or
without the bloom (asserted in tests).

Shards are numpy bit arrays persisted per round (the parquet-sidecar
analog of an Iceberg puffin blob), built/updated incrementally from
each round's url_seen delta inside ``applyInPandas`` — vectorized
double hashing, no per-row Python.

Sizing: a bloom filter saturates when n ≫ m/bits_per_key — past that
the FP rate → 1 and every candidate falls through to the exact
anti-join (still correct, but the optimization evaporates exactly when
it matters).  ``params_for(expected_n)`` sizes m at ~10 bits/key with
k=4, giving FP ≈ (1-e^{-kn/m})^k ≈ 1.2% at capacity.  The parameters
are persisted in ``params.json`` beside the shards: a probe or update
with different parameters would read garbage bit positions, so loads
assert the stored params and the crawl driver rebuilds from the full
url_seen table on mismatch (or when the sidecar is first enabled on a
resumed crawl — delta-only inserts would otherwise let previously-seen
URLs through the "definitely unseen" fast path).

Storage: all shard/params I/O goes through a pluggable ``ShardStore``
(read/write/list/delete of named blobs).  The default maps the
``bloom_dir`` path to the local filesystem — correct in local[N], and
on a multi-node cluster ONLY if ``bloom_dir`` is a shared mount.  A
cluster deploy passes ``store_factory=`` (any callable ``uri ->
ShardStore``; it is serialized into the executor closures, so locally
defined classes work) implementing the same four methods over S3/HDFS/
object storage — no engine edits.  The Iceberg-native form of this
sidecar is a puffin blob per snapshot.

Reference analog: the whole-file JSON seen-set re-read every run
(/root/reference/service/alert.py:460-490) — the thing this replaces.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHARDS = 16
DEFAULT_BITS = 1 << 20  # 1 Mi bits/shard ≈ 131 KiB packed
DEFAULT_K = 4


class ShardStore:
    """Blob storage seam for bloom shards + params: four methods over
    named byte blobs.  Implementations must be safe to pickle into
    executor closures (keep them stateless beyond config strings)."""

    def read(self, name: str) -> bytes | None:  # pragma: no cover - interface
        raise NotImplementedError

    def write(self, name: str, data: bytes) -> None:  # pragma: no cover
        raise NotImplementedError

    def list(self) -> list[str]:  # pragma: no cover
        raise NotImplementedError

    def delete(self, name: str) -> None:  # pragma: no cover
        raise NotImplementedError


class LocalShardStore(ShardStore):
    """Default store: blobs are files under ``base`` (a local or shared
    mount path)."""

    def __init__(self, base: str):
        self.base = base

    def read(self, name: str) -> bytes | None:
        path = os.path.join(self.base, name)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    def write(self, name: str, data: bytes) -> None:
        os.makedirs(self.base, exist_ok=True)
        tmp = os.path.join(self.base, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(self.base, name))

    def list(self) -> list[str]:
        if not os.path.isdir(self.base):
            return []
        return [n for n in os.listdir(self.base) if not n.startswith(".")]

    def delete(self, name: str) -> None:
        path = os.path.join(self.base, name)
        if os.path.exists(path):
            os.remove(path)


def _store(bloom_dir: str, store_factory=None) -> ShardStore:
    """Resolve the store INSIDE the task (the factory travels through
    the closure, the store object itself need not pre-exist on the
    executor)."""
    if store_factory is not None:
        return store_factory(bloom_dir)
    return LocalShardStore(bloom_dir)


@dataclass(frozen=True)
class BloomParams:
    n_shards: int = DEFAULT_SHARDS
    m: int = DEFAULT_BITS
    k: int = DEFAULT_K


def params_for(
    expected_n: int,
    n_shards: int = DEFAULT_SHARDS,
    bits_per_key: int = 10,
    k: int = DEFAULT_K,
) -> BloomParams:
    """Size shards for ``expected_n`` total keys at ``bits_per_key``
    (default 10 bits/key + k=4 → ~1.2% FP at capacity), rounding m up
    to a power of two, floor 2^16 bits/shard."""
    per_shard = expected_n // max(1, n_shards) + 1
    m = 1 << max(16, int(per_shard * bits_per_key - 1).bit_length())
    return BloomParams(n_shards=n_shards, m=m, k=k)


def save_params(bloom_dir: str, params: BloomParams, store_factory=None) -> None:
    _store(bloom_dir, store_factory).write(
        "params.json", json.dumps(asdict(params)).encode()
    )


def load_params(bloom_dir: str, store_factory=None) -> BloomParams | None:
    raw = _store(bloom_dir, store_factory).read("params.json")
    if raw is None:
        return None
    return BloomParams(**json.loads(raw))


def resolve_params(
    bloom_dir: str, params: BloomParams | None, store_factory=None
) -> BloomParams:
    """Stored params win; explicit params must MATCH stored ones (a
    probe with different (n_shards, m, k) reads garbage bits)."""
    stored = load_params(bloom_dir, store_factory)
    if stored is None:
        return params or BloomParams()
    if params is not None and params != stored:
        raise ValueError(
            f"bloom params mismatch: dir has {stored}, caller wants {params}; "
            "rebuild the sidecar (crawl(..., bloom_params=...) does this)"
        )
    return stored


def _indices(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """k bit positions per hash via Kirsch-Mitzenmacher double hashing
    (h1 + i*h2 mod m), fully vectorized."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = ((h >> np.uint64(33)) | (h << np.uint64(31))) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * (h2[:, None] % np.uint64(m))) % np.uint64(m)).astype(
        np.int64
    )


def _load_shard(store: ShardStore, shard: int, m: int) -> np.ndarray:
    raw = store.read(f"shard={shard}.npz")
    if raw is not None:
        import io

        return np.unpackbits(np.load(io.BytesIO(raw))["bits"]).astype(bool)[:m]
    return np.zeros(m, dtype=bool)


def _save_shard(store: ShardStore, shard: int, bits: np.ndarray) -> None:
    import io

    buf = io.BytesIO()
    np.savez_compressed(buf, bits=np.packbits(bits))
    store.write(f"shard={shard}.npz", buf.getvalue())


def update_bloom_shards(
    url_seen_delta: DataFrame,
    bloom_dir: str,
    params: BloomParams | None = None,
    store_factory=None,
) -> int:
    """OR this round's url_hash delta into the persisted shards.
    Returns the number of hashes inserted.

    Each shard group is processed by one task that loads its bit
    array, sets bits for its batch, and writes it back — O(delta)
    work per round, never O(history).  The sidecar's (n_shards, m, k)
    are persisted in params.json on first update; later updates and
    probes must use the same values or the bit positions are garbage.
    """
    params = resolve_params(bloom_dir, params, store_factory)
    save_params(bloom_dir, params, store_factory)
    n_shards, m, k = params.n_shards, params.m, params.k

    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        store = _store(bloom_dir, store_factory)
        shard = int(pdf["shard"].iloc[0])
        bits = _load_shard(store, shard, m)
        idx = _indices(pdf["url_hash"].to_numpy(), m, k)
        bits[idx.ravel()] = True
        _save_shard(store, shard, bits)
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    delta = url_seen_delta.select(
        "url_hash", F.pmod(F.col("url_hash"), F.lit(n_shards)).alias("shard")
    )
    out = delta.groupBy("shard").applyInPandas(upd, "shard int, n long")
    return sum(r["n"] for r in out.collect())


def ensure_bloom_sidecar(
    url_seen: DataFrame,
    bloom_dir: str,
    params: BloomParams | None = None,
    store_factory=None,
) -> BloomParams:
    """Make the sidecar consistent with ``url_seen`` and ``params``:
    (re)build from the FULL url_seen table when the dir is new or the
    stored params differ.  Without this, enabling bloom on a resumed
    crawl (or resizing it) would insert only future deltas — previously
    seen URLs would pass the "definitely unseen" fast path and re-enter
    the frontier.  Rebuild cost is one pass over url_seen; at 10^10
    keys that is the same order as a single round's exact anti-join,
    paid once per resize instead of every round."""
    store = _store(bloom_dir, store_factory)
    stored = load_params(bloom_dir, store_factory)
    want = params or stored or BloomParams()
    if stored == want:
        return want
    for name in store.list():
        if name.endswith(".npz") or name == "params.json":
            store.delete(name)
    save_params(bloom_dir, want, store_factory)
    update_bloom_shards(
        url_seen.select("url_hash"), bloom_dir, want, store_factory
    )
    return want


def bloom_annotate(
    candidates: DataFrame,
    bloom_dir: str,
    params: BloomParams | None = None,
    hash_col: str = "url_hash",
    store_factory=None,
) -> DataFrame:
    """Add ``maybe_seen`` (bool): False ⇒ definitely unseen (no exact
    join needed); True ⇒ check exactly."""
    params = resolve_params(bloom_dir, params, store_factory)
    n_shards, m, k = params.n_shards, params.m, params.k

    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        bits = _load_shard(_store(bloom_dir, store_factory), shard, m)
        idx = _indices(pdf[hash_col].to_numpy(), m, k)
        pdf = pdf.drop(columns="__shard")
        pdf["maybe_seen"] = bits[idx].all(axis=1)
        return pdf

    from pyspark.sql import types as T

    # fresh StructType — .add() mutates the DataFrame's cached schema
    schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType())]
    )
    return (
        candidates.withColumn("__shard", F.pmod(F.col(hash_col), F.lit(n_shards)))
        .groupBy("__shard")
        .applyInPandas(test, schema)
    )


def anti_join_with_bloom(
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom_dir: str,
    params: BloomParams | None = None,
    caches: list | None = None,
    store_factory=None,
) -> DataFrame:
    """candidates ∖ url_seen, bloom-accelerated and exactly equal to the
    plain left-anti join: bloom-negatives pass straight through; only
    bloom-positives pay the exact anti-join shuffle.

    ``annotated`` is cached because both branches (fresh / suspect)
    filter it — uncached, the bloom probe and its whole upstream
    lineage (canonicalize UDF, link explode) would run twice.  The
    handle is appended to ``caches`` so the caller's round-level
    unpersist sweep releases it.
    """
    annotated = bloom_annotate(
        candidates, bloom_dir, params, store_factory=store_factory
    ).cache()
    # Populate the cache SERIALLY before the fresh/suspect branches
    # consume it: both branches are independent stages of the same
    # downstream job, run concurrently, and a lazily-populated cache
    # races — each side replays the canonicalize UDF + link explode
    # upstream.  One count() materializes once; the handle still goes
    # through the caller's round-level unpersist sweep.
    annotated.count()
    if caches is not None:
        caches.append(annotated)
    fresh = annotated.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = annotated.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = suspect.join(
        url_seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
    )
    return fresh.unionByName(verified)


def bloom_shard_words(
    df: DataFrame,
    url_col: str = "url",
    n_shards: int = 8,
    m_bits: int = 4096,
    k_hashes: int = 3,
    salt: str = "bloom-v1",
) -> DataFrame:
    """Build the sharded URL-seen bloom filter AS A DATAFRAME and emit
    it in word-packed exportable form: (shard, word_idx, word_val) for
    every nonzero 32-bit word.  This is the relational twin of the
    ``ShardStore`` sidecar (``update_bloom_shards``) — the exact
    bitmaps, reconstructable by any reader, so a NEW cluster (or the
    oracle) can verify / resume URL-seen dedup from the exported rows
    alone instead of trusting opaque binary shards.

    Hashing is pure codegen (md5 substrings, no UDF): shard = first
    32 md5 bits mod n_shards; the k bit positions are the next k
    24-bit md5 slices mod m_bits (requires m_bits <= 2^24 and
    k_hashes <= 4 for one md5; chain a salted second md5 for more).
    Words are 32-bit so every packed value stays positive in an int64
    — no two's-complement edge to disagree on across engines.

    Scale: the explode is k rows per URL, immediately collapsed by the
    (shard, pos) distinct whose key space is n_shards x m_bits —
    bounded by the FILTER size, not the corpus; the final groupBy
    emits <= n_shards x m_bits/32 rows.  Both aggregations map-side
    combine, so the shuffle carries at most the filter's own bits.
    """
    # ADVICE r04: enforce the documented envelope instead of silently
    # corrupting the filter — k_hashes=5 would read past md5's 32 hex
    # chars (conv('') -> null/garbage positions), m_bits > 2^24 would
    # alias positions through the 24-bit slices.
    if not 1 <= int(k_hashes) <= 4:
        raise ValueError(
            f"k_hashes must be in [1, 4] for one md5 (got {k_hashes}); "
            "chain a salted second md5 for more"
        )
    if not 32 <= int(m_bits) <= (1 << 24):
        raise ValueError(
            f"m_bits must be in [32, 2^24] (got {m_bits}): positions are "
            "24-bit md5 slices"
        )
    if int(n_shards) < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    h = F.md5(F.concat_ws("\x1f", F.lit(salt), F.col(url_col)))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
        F.lit(int(n_shards)),
    ).cast("int")
    poss = F.array(
        *[
            F.pmod(
                F.conv(F.substring(h, 9 + i * 6, 6), 16, 10).cast("bigint"),
                F.lit(int(m_bits)),
            ).cast("int")
            for i in range(k_hashes)
        ]
    )
    bits = (
        df.select(shard.alias("shard"), F.explode(poss).alias("pos"))
        .distinct()
    )
    return (
        bits.groupBy(
            # exact integer division (`div`), not float-divide+cast —
            # same rule ADVICE enforced in operators/packing.py
            "shard", F.expr("pos div 32").cast("int").alias("word_idx")
        )
        .agg(
            # SQL form: the Python F.shiftleft binding takes only a
            # literal int for numBits, not a Column
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), pmod(pos, 32))")
            ).alias("word_val")
        )
    )


def bloom_words_sidecar_scheme(
    df: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 8,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """The SIDECAR's exact bitmaps, derationally: same sharding
    (pmod(url_hash, n_shards)) and same Kirsch-Mitzenmacher double
    hashing as ``_indices`` — h1 = u64(h) % m, h2 = rot(h) | 1,
    pos_i = (h1 + i * (h2 % m)) % m — expressed in pure codegen over
    SIGNED int64 (shiftleft wraps two's-complement = the same bit
    pattern as numpy's uint64; the unsigned mod is recovered with the
    constant 2^64 % m correction on negative values).  Emits the same
    (shard, word_idx, word_val) 32-bit word rows as
    ``bloom_shard_words``; ``load_bloom_shards_from_words`` turns them
    back into byte-identical ``shard=N.npz`` blobs — a new cluster
    resumes URL-seen dedup from exported ROWS, no binary handoff.

    Bit-exactness vs the numpy sidecar is pinned by
    tests/test_bloom_words_roundtrip.py.
    """
    wrap = (1 << 64) % m

    def umod(col):
        # unsigned-mod over a signed int64 bit pattern
        return F.pmod(
            F.when(col < 0, F.pmod(col, F.lit(m)) + F.lit(wrap)).otherwise(
                F.pmod(col, F.lit(m))
            ),
            F.lit(m),
        )

    h = F.col(hash_col)
    h1 = umod(h)
    h2 = F.expr(
        f"shiftrightunsigned({hash_col}, 33) | shiftleft({hash_col}, 31) | 1"
    )
    h2m = umod(h2)
    poss = F.array(*[F.pmod(h1 + F.lit(i) * h2m, F.lit(m)).cast("int") for i in range(k)])
    bits = (
        df.select(
            F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
            F.explode(poss).alias("pos"),
        )
        .distinct()
    )
    return bits.groupBy(
        "shard", F.expr("pos div 32").cast("int").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), pmod(pos, 32))")
        ).alias("word_val")
    )


def load_bloom_shards_from_words(
    words: DataFrame,
    bloom_dir: str,
    params: BloomParams,
    store_factory=None,
) -> int:
    """Rebuild the binary sidecar from exported (shard, word_idx,
    word_val) rows: one task per shard decodes its words into the bit
    array and writes the same ``shard=N.npz`` blob ``_save_shard``
    produces (plus params.json), so ``bloom_annotate`` /
    ``anti_join_with_bloom`` run unchanged against a store
    reconstructed purely from rows.  Returns total set bits."""
    save_params(bloom_dir, params, store_factory)
    m = params.m

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        store = _store(bloom_dir, store_factory)
        shard = int(pdf["shard"].iloc[0])
        bits = np.zeros(m, dtype=bool)
        vals = pdf["word_val"].to_numpy().astype(np.uint64)
        idx = pdf["word_idx"].to_numpy().astype(np.int64)
        bitmat = (vals[:, None] >> np.arange(32, dtype=np.uint64)) & np.uint64(1)
        w, b = np.nonzero(bitmat)
        bits[idx[w] * 32 + b] = True
        _save_shard(store, shard, bits)
        return pd.DataFrame({"shard": [shard], "n": [int(bits.sum())]})

    out = words.groupBy("shard").applyInPandas(rebuild, "shard int, n long")
    return sum(r["n"] for r in out.collect())


# Generic seen-filter interface (shared with operators/cuckoo.py) so the
# crawl loop can dispatch on a `seen_filter` kind string.
ensure_sidecar = ensure_bloom_sidecar
update_shards = update_bloom_shards
anti_join_with_filter = anti_join_with_bloom
