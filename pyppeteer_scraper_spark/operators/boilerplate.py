"""Host-scoped boilerplate-line detection — the WET/CCNet "chrome"
removal step: a line that repeats across many pages OF THE SAME HOST
(nav bars, cookie banners, footers) carries no document content and is
stripped before dedup/quality scoring (Wenzek et al., CCNet, 2020 §3;
the C4 pipeline's "boilerplate" heuristics, Raffel et al. 2020 §2.2).

Distinct from corpus-level first-occurrence line dedup
(operators/dedup.py::line_dedup): that keeps ONE copy of a duplicated
line corpus-wide; this removes EVERY copy of a line that is frequent
within its host — host chrome is noise even in its first occurrence.

Reference analog: none — the reference scrapes single known sites and
hand-picks CSS selectors around the chrome (/root/reference/scraper/
costco.py:69-83 extracts only the card body).  At 100 TB nobody writes
per-site selectors; frequency statistics replace them.

Scale shape: one explode pass over (host, doc, line); ONE shuffle on
(host, md5(line)) — 40-byte rows, never the line text — producing
per-line document frequency AND char mass in the same aggregate; the
host-level rollup then reduces ≤|distinct lines| rows by host.  Host
doc counts come from a separate tiny aggregate joined on host (equi,
AQE-broadcast when small).  No second pass over the corpus, no join
back to full text for the summary path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_host_stats(
    lines: DataFrame,
    host_col: str = "host",
    doc_col: str = "doc_id",
    line_col: str = "line",
) -> DataFrame:
    """Per-(host, line-hash) stats from long-form ``lines``:
    (host, line_hash, n_docs_line, n_inst, chars_inst).  Shuffles only
    hashes + counters."""
    return (
        lines.select(
            F.col(host_col).alias("host"),
            F.col(doc_col).alias("doc_id"),
            F.md5(F.col(line_col)).alias("line_hash"),
            F.length(F.col(line_col)).cast("long").alias("lc"),
        )
        .groupBy("host", "line_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs_line"),
            F.count("*").alias("n_inst"),
            F.sum("lc").alias("chars_inst"),
        )
    )


def boilerplate_summary(
    lines: DataFrame,
    host_docs: DataFrame,
    host_col: str = "host",
    doc_col: str = "doc_id",
    line_col: str = "line",
    min_docs: int = 3,
    min_frac: float = 0.5,
) -> DataFrame:
    """Per-host boilerplate report: (host, n_docs, n_lines,
    n_distinct_lines, n_boiler_lines, n_boiler_instances,
    pct_chars_removed).

    A line is boilerplate for its host iff it appears in >= min_docs
    distinct docs AND in >= min_frac of the host's docs.  Both
    thresholds matter at scale: min_docs alone misfires on two-page
    hosts; min_frac alone misfires on mega-hosts where 1% of pages is
    still thousands of docs.

    ``host_docs``: (host, n_docs) — the per-host document counts
    (aggregate of the doc table; kept an input so callers with a
    pre-computed host dimension don't re-scan).
    """
    stats = line_host_stats(lines, host_col, doc_col, line_col)
    hd = host_docs.select(
        F.col(host_col).alias("host"), F.col("n_docs").cast("long").alias("n_docs")
    )
    tagged = stats.join(hd, "host").withColumn(
        "is_boiler",
        (F.col("n_docs_line") >= F.lit(int(min_docs)))
        & (
            F.col("n_docs_line").cast("double")
            >= F.lit(float(min_frac)) * F.col("n_docs").cast("double")
        ),
    )
    return (
        tagged.groupBy("host", "n_docs")
        .agg(
            F.sum("n_inst").alias("n_lines"),
            F.count("*").alias("n_distinct_lines"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
            .cast("long")
            .alias("n_boiler_lines"),
            F.sum(F.when(F.col("is_boiler"), F.col("n_inst")).otherwise(0))
            .cast("long")
            .alias("n_boiler_instances"),
            F.round(
                F.sum(F.when(F.col("is_boiler"), F.col("chars_inst")).otherwise(0))
                / F.greatest(F.sum("chars_inst"), F.lit(1)),
                6,
            ).alias("pct_chars_removed"),
        )
    )


def strip_boilerplate(
    lines: DataFrame,
    host_docs: DataFrame,
    host_col: str = "host",
    doc_col: str = "doc_id",
    line_col: str = "line",
    pos_col: str = "pos",
    min_docs: int = 3,
    min_frac: float = 0.5,
) -> DataFrame:
    """Content lines only: the input minus each host's boilerplate set
    — reassembly input for the cleaned corpus.  The boilerplate keys
    per host are a small fraction of distinct lines; the removal join
    is equi on (host, line_hash) and AQE can broadcast it when small.
    """
    stats = line_host_stats(lines, host_col, doc_col, line_col)
    hd = host_docs.select(
        F.col(host_col).alias("host"), F.col("n_docs").cast("long").alias("n_docs")
    )
    boiler_keys = (
        stats.join(hd, "host")
        .filter(
            (F.col("n_docs_line") >= F.lit(int(min_docs)))
            & (
                F.col("n_docs_line").cast("double")
                >= F.lit(float(min_frac)) * F.col("n_docs").cast("double")
            )
        )
        .select("host", "line_hash")
    )
    keyed = lines.withColumn("line_hash", F.md5(F.col(line_col)))
    return keyed.join(
        boiler_keys.withColumnRenamed("host", host_col),
        [host_col, "line_hash"],
        "left_anti",
    ).drop("line_hash")
