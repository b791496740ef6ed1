"""WARC (Web ARChive, ISO 28500) record parsing — Common Crawl's
native interchange format, parsed straight into the engine's page
shape (url, warc_ts, html, …).

A crawl at Common-Crawl scale both CONSUMES WARC (bootstrapping a
frontier/corpus from an existing archive) and PRODUCES page rows that
mirror WARC response records; the reference never touches the format
(it scrapes live sites one page at a time).  This parser is pure
Catalyst: one regex split on the record boundary, per-field
``regexp_extract`` over the record head, and a two-stage body split
(WARC block → HTTP payload) — O(total archive bytes), no shuffle, no
UDF, so ingesting a 100 TB crawl archive is a single codegen scan.

Format notes handled:
- record boundary ``WARC/1.0`` (or 1.1) at line start; CRLF or LF
- named headers are case-insensitive per spec — matched
  case-insensitively here
- ``response`` records carry an HTTP envelope in the block: status
  line + HTTP headers, blank line, payload.  ``conversion`` /
  ``resource`` records carry the payload directly.
- ``WARC-Date`` is ISO-8601 UTC → parsed to timestamp

This is the text-mode parser (Common Crawl's WET/WAT files and
uncompressed WARC); per-member gzip decompression is an I/O concern —
point ``spark.read.text``/``binaryFiles`` at decompressed inputs or
front it with the multimodal ``mapInPandas`` seam
(operators/multimodal.py) when member-gzip handling is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BOUNDARY = r"(?m)^(?=WARC/1\.[01]\r?\n)"


def _header(rec: Column, name: str) -> Column:
    """Case-insensitive WARC header value from a record's head section
    (everything before the first blank line)."""
    return F.nullif(
        F.regexp_extract(
            rec, rf"(?im)^{name}:[ \t]*([^\r\n]*)\r?$", 1
        ),
        F.lit(""),
    )


def parse_warc(
    df: DataFrame,
    warc_col: str = "warc",
    id_cols: tuple = (),
) -> DataFrame:
    """Explode WARC file contents (one file per input row) into one row
    per record.

    Output: ``(*id_cols, record_type, url, warc_ts, content_type,
    payload)`` — ``payload`` is the HTTP body for ``response`` records
    (envelope stripped), the raw block otherwise; ``warc_ts`` is the
    parsed ``WARC-Date``.  ``warcinfo``/``request`` bookkeeping records
    pass through with their type so callers can filter.
    """
    recs = F.split(F.col(warc_col), _BOUNDARY)
    exploded = df.select(
        *[F.col(c) for c in id_cols], F.explode(recs).alias("rec")
    ).filter(F.col("rec").startswith("WARC/1."))
    # WARC head = up to the first blank line; block = the rest.
    head = F.regexp_extract(F.col("rec"), r"(?s)^(.*?)\r?\n\r?\n", 1)
    block = F.regexp_replace(F.col("rec"), r"(?s)^.*?\r?\n\r?\n", "")
    parsed = exploded.select(
        *id_cols,
        F.lower(_header(head, "WARC-Type")).alias("record_type"),
        _header(head, "WARC-Target-URI").alias("url"),
        F.to_timestamp(_header(head, "WARC-Date")).alias("warc_ts"),
        _header(head, "Content-Type").alias("content_type"),
        block.alias("block"),
    )
    # response records: strip the HTTP envelope (status line + headers +
    # blank line); everything else keeps its block as the payload.
    http_body = F.regexp_replace(
        F.col("block"), r"(?s)^HTTP/[0-9.]+ .*?\r?\n\r?\n", ""
    )
    payload = F.when(
        F.col("record_type") == "response", http_body
    ).otherwise(F.col("block"))
    # Trailing record separator (two CRLFs) is format framing, not body.
    return parsed.select(
        *id_cols,
        "record_type",
        "url",
        "warc_ts",
        "content_type",
        F.regexp_replace(payload, r"(\r?\n)+$", "").alias("payload"),
    )


def warc_pages(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """WARC responses as the engine's page-table shape
    (schemas.py::PAGES: url, warc_ts, html, text, lang) — html carries
    the payload bytes, text/lang stay null for the downstream extract/
    language-ID stages to fill (plans/extract.py, functions/text.py)."""
    return (
        parse_warc(df, warc_col=warc_col)
        .filter(F.col("record_type") == "response")
        .select(
            "url",
            "warc_ts",
            F.col("payload").cast("binary").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


def serialize_warc(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "text",
    ts_is_iso_string: bool = False,
) -> DataFrame:
    """Render page rows as WARC/1.0 response records — the EMIT side of
    this module (a crawl at Common-Crawl scale also publishes its
    fetches as WARC shards).  Inverse of :func:`parse_warc`:
    serialize → parse is identity on (url, payload) — pytest-pinned.

    Pure codegen string concat, O(bytes), no shuffle.  Output adds a
    ``warc_record`` column; ``Content-Length`` is the BYTE length of
    the block (HTTP envelope + payload), per spec.  The record framing
    note from the parser applies in reverse: bodies containing a
    line-initial ``WARC/1.x`` would confuse the text-mode parser's
    boundary regex (real consumers frame by Content-Length, which this
    writer emits correctly).
    """
    crlf = "\r\n"
    body = F.coalesce(F.col(body_col).cast("string"), F.lit(""))
    block = F.concat(
        F.lit("HTTP/1.1 200 OK" + crlf),
        F.lit("Content-Type: text/html" + crlf),
        F.lit(crlf),
        body,
    )
    # ts_is_iso_string=True takes the column verbatim (already ISO-8601
    # text) — date_format renders in the SESSION timezone, which an
    # engine-independent oracle comparison must not depend on.
    ts_iso = (
        F.col(ts_col)
        if ts_is_iso_string
        else F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
    record = F.concat(
        F.lit("WARC/1.0" + crlf),
        F.lit("WARC-Type: response" + crlf),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(crlf),
        F.lit("WARC-Date: "), ts_iso, F.lit(crlf),
        F.lit("Content-Type: application/http; msgtype=response" + crlf),
        F.lit("Content-Length: "),
        F.octet_length(block).cast("string"), F.lit(crlf),
        F.lit(crlf),
        block,
        F.lit(crlf + crlf),
    )
    return pages.withColumn("warc_record", record)
