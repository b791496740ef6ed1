"""Deterministic shuffled-shard export — the last stage of a
training-data pipeline: turn a curated corpus into N fixed, globally
shuffled shard files whose contents and internal order are a pure
function of (salt, doc ids), independent of cluster size, partition
count, or ingestion order.

The reference writes its outputs as single JSON/parquet-ish artifacts
per run (/root/reference/service/alert.py:460-490 rewrites one state
file); an LLM-training corpus instead ships as a directory of shards
that data loaders stream and shuffle between epochs.  The properties
that matter at 100 TB:

- **Determinism**: shard membership and intra-shard order derive from
  ``md5(salt \\x1f id)`` only — re-running the export on the same corpus
  (any cluster size, any input partitioning) produces byte-identical
  shards, so an export is reproducible and diffable.
- **Global shuffle for free**: md5 order IS a uniform random permutation
  of the corpus (seeded by ``salt``), so consumers can read shards
  sequentially and still see i.i.d.-like data — no separate shuffle job
  over 100 TB.
- **Scale**: one Spark task per shard.  Shards are sized like the real
  artifact (100 MB–1 GB, WebDataset/TFRecord practice), so ``n_shards``
  GROWS with the corpus (100 TB → ~10^5 shards of 1 GB) and per-task
  work stays constant — the plan is one hash-partition shuffle by shard
  id plus a per-shard sort, both bounded by shard size, never by corpus
  size.
- **Exact oracle**: hex-string hashing keeps every step expressible in
  ANSI SQL (``conv(hex,16,10)`` in Spark ≡ ``('0x'||hex)::BIGINT`` in
  DuckDB), so the (id → shard, seq) plan is hash-checked against an
  independent engine, not just replayed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 12 hex chars = 48 uniform bits; conv() and ('0x'||·)::BIGINT both hold
# 48 bits losslessly in a signed 64-bit value.
_SHARD_HEX_CHARS = 12


def _shuffle_key(id_col: str, salt: str):
    """Full md5 hex of (salt, id) — the deterministic permutation key.
    Lowercase fixed-width hex ASCII-orders identically in every engine."""
    return F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
    )


def shard_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "export-v1",
    shard_col: str = "shard",
    seq_col: str = "seq",
) -> DataFrame:
    """Assign every row its (shard, seq) position in a deterministic
    globally-shuffled export.

    ``shard = first-48-bits(md5(salt, id)) mod n_shards`` (uniform, so
    shard sizes are balanced to ~sqrt(n/n_shards)); ``seq`` numbers rows
    1..k within each shard in md5-key order (ties — impossible for
    distinct ids — break by id).  One hash shuffle by shard + per-shard
    sort; each window partition is exactly one shard, so sizing shards
    like the physical artifact (≤~1 GB) bounds per-task memory
    regardless of corpus size.
    """
    key = _shuffle_key(id_col, salt)
    bucket = F.conv(F.substring(key, 1, _SHARD_HEX_CHARS), 16, 10).cast("bigint")
    out = df.withColumn("__key", key).withColumn(
        shard_col, F.pmod(bucket, F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy("__key", id_col)
    return out.withColumn(seq_col, F.row_number().over(w)).drop("__key")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "export-v1",
    fmt: str = "parquet",
) -> None:
    """Materialize the export: exactly one file per shard, rows in
    deterministic md5-key order inside each file.

    ``repartition(n_shards, shard)`` hash-places each shard id into its
    own task (ids 0..n_shards-1 with numPartitions = n_shards may
    co-locate a few shards per task — still deterministic, and
    ``partitionBy(shard)`` splits them back into one file per shard
    directory on write), then ``sortWithinPartitions`` fixes the row
    order.  No global sort, no driver collect; re-running yields
    byte-identical shard contents.
    """
    planned = shard_plan(
        df, id_col=id_col, n_shards=n_shards, salt=salt
    )
    (
        planned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "seq")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def zorder_key(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two ``bits``-bit dimensions —
    multi-dimensional file clustering for scan pruning (what Delta's
    OPTIMIZE ZORDER / Iceberg's sort-order rewrite compute): rows close
    in BOTH dimensions land in the same files, so per-file min/max
    stats prune scans filtered on EITHER dimension, not just the lead
    sort column of a lexicographic layout.

    Statically unrolled bit arithmetic (2·bits shift/mask/add terms,
    one codegen projection, exact integers — so a SQL oracle replays
    it bit-for-bit).  Inputs must already be reduced to [0, 2^bits)
    (mask or bucket upstream).
    """
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_layout(
    df: DataFrame,
    a_col: str,
    b_col: str,
    id_col: str,
    rows_per_file: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Plan a Z-ordered file layout and report per-file min/max stats
    for both dimensions — the numbers a format's data-skipping index
    stores, and the direct measure of how prunable the layout is.

    Returns (file_id, n_rows, a_min, a_max, b_min, b_max, z_min,
    z_max).  This exact form uses one global row_number over z (oracle
    parity); the production write is ``repartitionByRange(z)`` +
    ``sortWithinPartitions(z)`` — the same range-partitioned global
    sort every z-order table rewrite pays, amortized once per layout,
    bounded per task by rows_per_file·tasks, never by corpus size.
    """
    z = zorder_key(F.col(a_col), F.col(b_col), bits=bits).alias("z")
    keyed = df.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
        F.col(id_col).alias("__id"),
        z,
    )
    return (
        keyed.withColumn(
            "file_id",
            # exact integer division (div), not float-/ + cast — IEEE
            # rounding past 2^45 mis-assigns ids (the packing.py lesson)
            F.expr(
                f"(row_number() over (order by z, __id) - 1)"
                f" div {int(rows_per_file)}"
            ).cast("long"),
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
    )


def binpack_hosts(
    host_loads: DataFrame,
    n_shards: int,
    *,
    host_col: str = "host",
    load_col: str = "n_urls",
) -> DataFrame:
    """Balance hosts across ``n_shards`` fetch shards with a
    serpentine (boustrophedon) rank assignment — the distributed
    stand-in for greedy LPT bin packing.

    Hosts ranked by load descending are dealt 0,1,...,n-1 then
    n-1,...,1,0 and so on, so each shard receives one host from every
    consecutive "tier" of the load distribution and the heavy tail
    cannot pile onto shard 0 the way plain ``rank % n`` does.  For a
    Zipf-ish host-size law (the empirical web), serpentine lands
    within a few percent of LPT's makespan while needing only ONE
    global rank over the (distinct-host) aggregate — no driver loop,
    no iterative state, and the host table (10^7 rows at 10^10 URLs)
    never leaves the executors: the rank comes from the distributed
    range-partitioned row_number (``topk.global_row_number``, round
    5 — bounded by construction, no single-partition window).

    Returns one row per host: (host, load, shard), plus the rank used
    (``tier`` = rank div n identifies the dealing row for audits).

    The reference scraper has no sharding concept (single process,
    ~10 URLs: /root/reference/scraper/home_depo.py); this exists for
    the 1000-executor fetch fleet the north rule targets.
    """
    from pyppeteer_scraper_spark.operators.topk import global_row_number

    ranked = global_row_number(
        host_loads.select(host_col, F.col(load_col)),
        [F.col(load_col).desc(), F.col(host_col)],
        out_col="__r1",
    ).select(host_col, load_col, (F.col("__r1") - 1).alias("_rk"))
    pos = F.col("_rk") % n_shards
    tier = F.expr(f"_rk div {n_shards}")
    return ranked.select(
        host_col,
        load_col,
        tier.cast("long").alias("tier"),
        F.when(tier % 2 == 0, pos)
        .otherwise(n_shards - 1 - pos)
        .cast("int")
        .alias("shard"),
    )


def shard_checksum_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    content_col: str = "text",
    salt: str = "shard-v1",
) -> DataFrame:
    """Order-independent per-shard content checksums — the manifest a
    resumable verified export writes next to its shards so a re-run
    (or a reader) can prove shard integrity WITHOUT re-reading in the
    writer's order: (shard, n_docs, checksum).

    checksum = bit_xor over docs of the first-60-bits of
    md5(salt \\x1f id \\x1f content) — XOR is commutative/associative,
    so any task/partition ordering yields the same value, and a single
    flipped byte anywhere in the shard flips it.  Shard assignment is
    the same md5-bucket rule as ``shard_plan`` (first 48 bits mod
    n_shards), so the manifest matches the exported layout.

    One groupBy over n_shards keys, map-side combined; the shuffle
    carries (shard, 8-byte partial XOR) rows only.
    """
    key = F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"),
                    F.col(content_col))
    )
    shard = F.pmod(
        F.conv(F.substring(F.md5(
            F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
        ), 1, 12), 16, 10).cast("bigint"),
        F.lit(int(n_shards)),
    )
    word = F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint")
    return (
        docs.select(shard.cast("int").alias("shard"), word.alias("w"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.bit_xor("w").alias("checksum"),
        )
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str = "domain",
    nodes: list[str] | None = None,
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing: assign each key to
    the node with the max hash(key, node) — the fleet-assignment
    scheme a distributed crawler wants for per-host politeness
    ownership, because it is MINIMALLY DISRUPTIVE: adding or removing
    one node moves only ~1/n of the keys (mod-N hashing reshuffles
    almost everything), and every coordinator computes the same answer
    with no shared state (Thaler & Ravishankar 1998).

    Engine shape: keys × nodes is a bounded explode (|nodes| rows per
    key, nodes lists are O(10³) at most), argmax per key via one
    window over the key — the same skew-free two-phase shape as
    operators/topk.py.  The weight is md5(key || '|' || node), chosen
    over xxhash64 because the hex form compares identically in every
    engine an oracle might run on.

    Output: df + ``assigned_node``.
    """
    if nodes is None:
        nodes = [f"node{i}" for i in range(8)]
    cand = df.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(n) for n in nodes])).alias("node"),
    ).withColumn(
        "w", F.md5(F.concat(F.col(key_col), F.lit("|"), F.col("node")))
    )
    w = Window.partitionBy(key_col).orderBy(F.desc("w"), "node")
    best = (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col(key_col), F.col("node").alias("assigned_node"))
    )
    return df.join(best, key_col)


def stride_interleave(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    k: int | None = None,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Deterministic proportional interleave of multiple source streams
    — the data-loader ordering step after mixture weights are chosen:
    emit documents so that at every prefix of the output each source
    has contributed ~its share, with no randomness (stride scheduling /
    weighted-fair-queueing virtual time; Waldspurger & Weihl, OSDI 94).

    Item ``rn`` of source ``s`` (1-based, in ``id_col`` order) gets
    virtual time ``vt = rn / n_s``; the global output order is
    (vt, source, rn).  With weights = source sizes every source
    finishes exactly at vt = 1.0, and a prefix of the stream is a
    proportional sample of every source — the property epoch-spanning
    training loaders want (contrast export shards, which give a global
    SHUFFLE; this gives a global SCHEDULE).

    ``vt`` is a single IEEE division of two int64s — bit-identical in
    every engine, so the full ordering is exactly oracle-checkable.

    SCALE SHAPE: per-source ranks use the packing.py two-pass bucketed
    prefix (per-(source, bucket) counts → per-source base offsets over
    the tiny bucket table → per-(source, bucket) ordered row_number) so
    a mega-source never lands in one task; the global order is
    materialized only for the top-``k`` head (TakeOrdered — no global
    sort) when ``k`` is given, else returned as an unordered column set
    ((vt, source, rn) IS the order; writers sort per output shard).

    Returns (pos, source, id_col, rn, vt) when ``k`` is set, else
    (source, id_col, rn, vt).
    """
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.expr(f"cast({id_col} as bigint) div {int(bucket_size)}").alias(
            "__bucket"
        ),
    )
    sb = base.groupBy("source", "__bucket").agg(
        F.count("*").alias("__bn")
    )
    ns = sb.groupBy("source").agg(F.sum("__bn").cast("long").alias("__ns"))
    wb = (
        Window.partitionBy("source")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = sb.select(
        "source",
        "__bucket",
        F.coalesce(F.sum("__bn").over(wb), F.lit(0)).alias("__base"),
    )
    wd = Window.partitionBy("source", "__bucket").orderBy(id_col)
    placed = (
        base.join(F.broadcast(boff), ["source", "__bucket"])
        .withColumn(
            "rn", (F.col("__base") + F.row_number().over(wd)).cast("long")
        )
        .join(F.broadcast(ns), "source")
        .withColumn(
            "vt", F.col("rn").cast("double") / F.col("__ns").cast("double")
        )
    )
    out = placed.select("source", id_col, "rn", "vt")
    if k is None:
        return out
    head = out.orderBy("vt", "source", "rn").limit(int(k))
    wpos = Window.orderBy("vt", "source", "rn")  # <=k rows: driver-scale
    return head.select(
        F.row_number().over(wpos).cast("long").alias("pos"),
        "source",
        id_col,
        "rn",
        F.round("vt", 6).alias("vt"),
    )


def frontcode_urls(
    urls: DataFrame,
    url_col: str = "url",
    group_col: str = "domain",
) -> DataFrame:
    """Front-coding for sorted URL lists — the compression scheme web
    archives use for URL indexes (Common Crawl's ZipNum/CDX blocks):
    within each group, URLs sorted lexicographically store only
    (shared-prefix length with predecessor, remaining suffix).  Dense
    crawls share long scheme://host/path prefixes, so this typically
    removes 60-90% of URL index bytes before general compression even
    runs.

    Returns (group, url, rank, prefix_len, suffix) — ``url`` retained
    so the oracle can verify losslessness; a real index writes only
    (prefix_len, suffix).  Reconstruction: url[rank] =
    url[rank-1][:prefix_len] + suffix, checked exactly in
    tests/test_export_shards.py.

    Shape: one window over (group, url) — the same single shuffle a
    sorted index write needs anyway; the common-prefix computation is
    a higher-order ``aggregate`` over a char sequence (JVM codegen,
    no Python).  Groups are domains, so partition-local; a global
    (ungrouped) front-coding would instead use range partitioning +
    per-partition boundary stitching.
    """
    w = Window.partitionBy(group_col).orderBy(url_col)
    staged = (
        urls.select(group_col, url_col)
        .withColumn("lag_u", F.lag(url_col).over(w))
        .withColumn("rank", F.row_number().over(w))
    )
    # longest i with a[1..i] == b[1..i]: running accumulator stays at
    # i only while every prefix position matched so far (contiguity
    # via acc = i-1)
    prefix_len = F.when(F.col("lag_u").isNull(), F.lit(0)).otherwise(
        F.expr(
            f"aggregate(sequence(1, least(length({url_col}), "
            f"length(lag_u))), 0, (acc, i) -> IF(acc = i - 1 AND "
            f"substring({url_col}, i, 1) = substring(lag_u, i, 1), "
            "i, acc))"
        )
    )
    return (
        staged.withColumn("prefix_len", prefix_len.cast("int"))
        .select(
            group_col,
            url_col,
            "rank",
            "prefix_len",
            F.expr(f"substring({url_col}, prefix_len + 1)").alias(
                "suffix"),
        )
    )
