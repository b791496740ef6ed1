"""Sharded cuckoo-filter URL-seen sidecar — the deletion-capable
alternative to ``operators/bloom.py`` (north_rule: "URL-seen dedup via
a sharded bloom/cuckoo filter maintained per partition").

Same role and same storage seam as the bloom sidecar: shard =
pmod(url_hash, n_shards), shards persisted through a pluggable
``ShardStore``, probes answer "definitely unseen" locally so only
positives pay the exact anti-join.  What cuckoo adds over bloom
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014):

- **Deletion.**  ``delete_cuckoo_shards`` removes a batch of keys in
  O(batch) — the recrawl/TTL-eviction path.  A bloom filter cannot
  delete; re-crawling a URL cohort under bloom means rebuilding the
  whole sidecar from url_seen (one full-table pass).
- Lower FP at the same size class: two 4-slot buckets of 16-bit
  fingerprints give FP ≈ 2·b/2^f ≈ 0.012% vs ~1.2% for 10-bit/key
  bloom.

Layout per shard: a ``(n_buckets, 4)`` uint16 table (0 = empty; the
fingerprint is mapped into [1, 65535]).  Key x with 64-bit ``url_hash``
h gets fingerprint fp = h % 65535 + 1 and two candidate buckets
i1 = h mod nb, i2 = i1 XOR (fp * K mod nb) — the XOR form makes each
bucket computable from the other plus the resident fingerprint, which
is what lets eviction walks and deletes run without the original key.

No-false-negative guarantee (required for crawl correctness — a false
negative would re-crawl forever): duplicates ARE stored (each insert
writes its own copy), deletes remove exactly one copy, and inserts
that still fail after ``max_kicks`` evictions land in a small per-shard
overflow stash checked by every probe.  The stash only grows past the
load-factor capacity the sizing targets (0.66; cuckoo filters fill to
~0.95 before thrashing), and ``ensure_cuckoo_sidecar`` rebuilds at a
bigger size on param change, mirroring the bloom resize path.

Vectorization: batch inserts place items slot-pass by slot-pass (one
numpy scatter per (bucket-choice, slot) — 8 vector ops per sweep);
only the rare items still homeless after the vector sweeps walk the
sequential eviction loop (same tail strategy as the rolling-hash
fingerprint: vectorize the mass, loop the outliers).  Probes and
deletes are pure numpy gathers over the batch.

Reference analog: the whole-file JSON seen-set re-read every run
(/root/reference/service/alert.py:460-490) — same thing the bloom
sidecar replaces, now with per-cohort forgetting.
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.bloom import LocalShardStore, ShardStore

DEFAULT_SHARDS = 16
DEFAULT_BUCKETS = 1 << 15  # 32Ki buckets × 4 slots × 2 B = 256 KiB/shard
SLOTS = 4
MAX_KICKS = 500
_ODD_MULT = np.uint64(0x5BD1E995)  # odd ⇒ bijective mod 2^k


def _store(cuckoo_dir: str, store_factory=None) -> ShardStore:
    if store_factory is not None:
        return store_factory(cuckoo_dir)
    return LocalShardStore(cuckoo_dir)


@dataclass(frozen=True)
class CuckooParams:
    n_shards: int = DEFAULT_SHARDS
    n_buckets: int = DEFAULT_BUCKETS  # power of two
    max_kicks: int = MAX_KICKS


def params_for(
    expected_n: int, n_shards: int = DEFAULT_SHARDS, load_factor: float = 0.66
) -> CuckooParams:
    """Size shards for ``expected_n`` total keys at ``load_factor``
    occupancy (default 0.66 keeps eviction walks short and the
    overflow stash empty), rounding buckets up to a power of two,
    floor 2^10 buckets/shard."""
    per_shard = expected_n // max(1, n_shards) + 1
    need = int(per_shard / (SLOTS * load_factor))
    nb = 1 << max(10, need.bit_length())
    return CuckooParams(n_shards=n_shards, n_buckets=nb)


def save_params(cuckoo_dir: str, params: CuckooParams, store_factory=None) -> None:
    _store(cuckoo_dir, store_factory).write(
        "params.json", json.dumps(asdict(params)).encode()
    )


def load_params(cuckoo_dir: str, store_factory=None) -> CuckooParams | None:
    raw = _store(cuckoo_dir, store_factory).read("params.json")
    if raw is None:
        return None
    return CuckooParams(**json.loads(raw))


def resolve_params(
    cuckoo_dir: str, params: CuckooParams | None, store_factory=None
) -> CuckooParams:
    stored = load_params(cuckoo_dir, store_factory)
    if stored is None:
        return params or CuckooParams()
    if params is not None and params != stored:
        raise ValueError(
            f"cuckoo params mismatch: dir has {stored}, caller wants {params}; "
            "rebuild the sidecar (ensure_cuckoo_sidecar does this)"
        )
    return stored


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    h = hashes.astype(np.uint64)
    return (h % np.uint64(65535) + np.uint64(1)).astype(np.uint16)


def _bucket1(hashes: np.ndarray, nb: int) -> np.ndarray:
    return (hashes.astype(np.uint64) % np.uint64(nb)).astype(np.int64)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    """i XOR (fp·K mod nb): self-inverse, computable from either side."""
    off = (fp.astype(np.uint64) * _ODD_MULT) % np.uint64(nb)
    return (bucket.astype(np.uint64) ^ off).astype(np.int64) % nb


def _load_shard(
    store: ShardStore, shard: int, nb: int
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (table (nb,SLOTS) uint16, stash uint64 1-D of url_hashes)."""
    raw = store.read(f"cuckoo={shard}.npz")
    if raw is not None:
        z = np.load(io.BytesIO(raw))
        return z["table"].reshape(nb, SLOTS).copy(), z["stash"].copy()
    return (
        np.zeros((nb, SLOTS), dtype=np.uint16),
        np.zeros(0, dtype=np.uint64),
    )


def _save_shard(
    store: ShardStore, shard: int, table: np.ndarray, stash: np.ndarray
) -> None:
    buf = io.BytesIO()
    np.savez_compressed(buf, table=table, stash=stash)
    store.write(f"cuckoo={shard}.npz", buf.getvalue())


def _insert_batch(
    table: np.ndarray, stash: np.ndarray, hashes: np.ndarray, params: CuckooParams
) -> np.ndarray:
    """Insert ``hashes`` into ``table``; returns the updated stash.
    Duplicates are stored (delete removes one copy each)."""
    nb = params.n_buckets
    fp = _fingerprints(hashes)
    b1 = _bucket1(hashes, nb)
    b2 = _alt_bucket(b1, fp, nb)
    pending = np.arange(len(hashes))
    # vector sweeps: for each (bucket choice, slot), place at most one
    # pending item per bucket whose target cell is empty.
    for b in (b1, b2):
        for s in range(SLOTS):
            if len(pending) == 0:
                break
            pb = b[pending]
            _, first = np.unique(pb, return_index=True)
            cand = pending[first]
            ok = table[b[cand], s] == 0
            place = cand[ok]
            table[b[place], s] = fp[place]
            placed = np.zeros(len(hashes), dtype=bool)
            placed[place] = True
            pending = pending[~placed[pending]]
    # sequential eviction walk for the rare leftovers
    new_stash: list[int] = []
    for idx in pending:
        cur_fp = int(fp[idx])
        cur_b = int(b1[idx])
        # deterministic per-item LCG so tests are reproducible
        seed = int(hashes[idx]) & 0xFFFFFFFF
        placed_ok = False
        for _ in range(params.max_kicks):
            row = table[cur_b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                table[cur_b, empty[0]] = cur_fp
                placed_ok = True
                break
            seed = (seed * 1103515245 + 12345) & 0x7FFFFFFF
            slot = seed % SLOTS
            victim = int(table[cur_b, slot])
            table[cur_b, slot] = cur_fp
            cur_fp = victim
            cur_b = int(
                _alt_bucket(
                    np.array([cur_b]), np.array([victim], dtype=np.uint16), nb
                )[0]
            )
        if not placed_ok:
            # a failed walk leaves exactly ONE homeless fingerprint: the
            # final displaced victim (the original key's fp was written
            # into the table on the first kick).  Park it in the stash
            # keyed by (fp, bucket); probes check the stash against both
            # candidate buckets, so it stays findable, and deletes check
            # the stash after the table, so copy accounting holds.
            new_stash.append(int(cur_fp) | (int(cur_b) << 16))
    if new_stash:
        stash = np.concatenate([stash, np.array(new_stash, dtype=np.uint64)])
    return stash


def _stash_match(
    stash: np.ndarray, fp: np.ndarray, b1: np.ndarray, b2: np.ndarray
) -> np.ndarray:
    """Membership of (fp, b1|b2) pairs in the packed stash (tiny)."""
    if len(stash) == 0:
        return np.zeros(len(fp), dtype=bool)
    key1 = fp.astype(np.uint64) | (b1.astype(np.uint64) << np.uint64(16))
    key2 = fp.astype(np.uint64) | (b2.astype(np.uint64) << np.uint64(16))
    return np.isin(key1, stash) | np.isin(key2, stash)


def _contains(
    table: np.ndarray, stash: np.ndarray, hashes: np.ndarray, params: CuckooParams
) -> np.ndarray:
    nb = params.n_buckets
    fp = _fingerprints(hashes)
    b1 = _bucket1(hashes, nb)
    b2 = _alt_bucket(b1, fp, nb)
    hit = (table[b1] == fp[:, None]).any(axis=1) | (
        table[b2] == fp[:, None]
    ).any(axis=1)
    return hit | _stash_match(stash, fp, b1, b2)


def _delete_batch(
    table: np.ndarray, stash: np.ndarray, hashes: np.ndarray, params: CuckooParams
) -> tuple[np.ndarray, int]:
    """Remove ONE stored copy per key present; returns (stash, n_removed).
    Buckets are processed in a per-bucket loop over the delete batch
    only (deletes are the rare recrawl path; slot bookkeeping under
    duplicate fingerprints needs sequential updates per bucket)."""
    nb = params.n_buckets
    fp = _fingerprints(hashes)
    b1 = _bucket1(hashes, nb)
    b2 = _alt_bucket(b1, fp, nb)
    removed = 0
    for i in range(len(hashes)):
        done = False
        for b in (int(b1[i]), int(b2[i])):
            row = table[b]
            slots = np.nonzero(row == fp[i])[0]
            if len(slots):
                table[b, slots[0]] = 0
                removed += 1
                done = True
                break
        if not done and len(stash):
            key1 = np.uint64(int(fp[i]) | (int(b1[i]) << 16))
            key2 = np.uint64(int(fp[i]) | (int(b2[i]) << 16))
            pos = np.nonzero((stash == key1) | (stash == key2))[0]
            if len(pos):
                stash = np.delete(stash, pos[0])
                removed += 1
    return stash, removed


def _apply_shard_op(
    delta: DataFrame,
    cuckoo_dir: str,
    params: CuckooParams,
    store_factory,
    op: str,
) -> int:
    """Group the delta by shard; each task loads its shard, applies the
    insert/delete batch, writes it back — O(delta) per call."""
    n_shards = params.n_shards

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        store = _store(cuckoo_dir, store_factory)
        shard = int(pdf["shard"].iloc[0])
        table, stash = _load_shard(store, shard, params.n_buckets)
        hashes = pdf["url_hash"].to_numpy().astype(np.uint64)
        if op == "insert":
            stash = _insert_batch(table, stash, hashes, params)
            n = len(hashes)
        else:
            stash, n = _delete_batch(table, stash, hashes, params)
        _save_shard(store, shard, table, stash)
        return pd.DataFrame({"shard": [shard], "n": [n]})

    keyed = delta.select(
        "url_hash", F.pmod(F.col("url_hash"), F.lit(n_shards)).alias("shard")
    )
    out = keyed.groupBy("shard").applyInPandas(run, "shard int, n long")
    return sum(r["n"] for r in out.collect())


def update_cuckoo_shards(
    url_seen_delta: DataFrame,
    cuckoo_dir: str,
    params: CuckooParams | None = None,
    store_factory=None,
) -> int:
    """Insert this round's url_hash delta.  Returns hashes inserted."""
    params = resolve_params(cuckoo_dir, params, store_factory)
    save_params(cuckoo_dir, params, store_factory)
    return _apply_shard_op(
        url_seen_delta.select("url_hash"), cuckoo_dir, params, store_factory,
        "insert",
    )


def delete_cuckoo_shards(
    url_delta: DataFrame,
    cuckoo_dir: str,
    params: CuckooParams | None = None,
    store_factory=None,
) -> int:
    """Remove one stored copy per key — the recrawl/TTL eviction path
    bloom cannot express.  Returns copies removed."""
    params = resolve_params(cuckoo_dir, params, store_factory)
    return _apply_shard_op(
        url_delta.select("url_hash"), cuckoo_dir, params, store_factory,
        "delete",
    )


def ensure_cuckoo_sidecar(
    url_seen: DataFrame,
    cuckoo_dir: str,
    params: CuckooParams | None = None,
    store_factory=None,
) -> CuckooParams:
    """(Re)build from the FULL url_seen when the dir is new or params
    changed — same contract as ensure_bloom_sidecar."""
    store = _store(cuckoo_dir, store_factory)
    stored = load_params(cuckoo_dir, store_factory)
    want = params or stored or CuckooParams()
    if stored == want:
        return want
    for name in store.list():
        if name.startswith("cuckoo=") or name == "params.json":
            store.delete(name)
    save_params(cuckoo_dir, want, store_factory)
    update_cuckoo_shards(
        url_seen.select("url_hash"), cuckoo_dir, want, store_factory
    )
    return want


def cuckoo_annotate(
    candidates: DataFrame,
    cuckoo_dir: str,
    params: CuckooParams | None = None,
    hash_col: str = "url_hash",
    store_factory=None,
) -> DataFrame:
    """Add ``maybe_seen`` (bool): False ⇒ definitely unseen."""
    params = resolve_params(cuckoo_dir, params, store_factory)
    n_shards = params.n_shards

    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        table, stash = _load_shard(
            _store(cuckoo_dir, store_factory), shard, params.n_buckets
        )
        hashes = pdf[hash_col].to_numpy().astype(np.uint64)
        pdf = pdf.drop(columns="__shard")
        pdf["maybe_seen"] = _contains(table, stash, hashes, params)
        return pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType())]
    )
    return (
        candidates.withColumn(
            "__shard", F.pmod(F.col(hash_col), F.lit(n_shards))
        )
        .groupBy("__shard")
        .applyInPandas(test, schema)
    )


def anti_join_with_cuckoo(
    candidates: DataFrame,
    url_seen: DataFrame,
    cuckoo_dir: str,
    params: CuckooParams | None = None,
    caches: list | None = None,
    store_factory=None,
) -> DataFrame:
    """candidates ∖ url_seen — byte-identical to the plain left-anti
    join (cuckoo-negatives pass straight through; positives are
    verified exactly).  Same contract as anti_join_with_bloom."""
    annotated = cuckoo_annotate(
        candidates, cuckoo_dir, params, store_factory=store_factory
    ).cache()
    if caches is not None:
        caches.append(annotated)
    fresh = annotated.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = annotated.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = suspect.join(
        url_seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
    )
    return fresh.unionByName(verified)


# Generic seen-filter interface (shared with operators/bloom.py).
ensure_sidecar = ensure_cuckoo_sidecar
update_shards = update_cuckoo_shards
anti_join_with_filter = anti_join_with_cuckoo
