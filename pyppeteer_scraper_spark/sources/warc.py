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

from pyspark.sql import Column, DataFrame, Window
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
    return _parse_record_rows(exploded, id_cols)


def _parse_record_rows(exploded: DataFrame, id_cols: tuple) -> DataFrame:
    """Per-record field extraction over an already-record-framed ``rec``
    column — shared by the text-mode splitter (:func:`parse_warc`) and
    the gzip-member path (:func:`parse_warc_gz`), where each member IS
    one record and must not be re-split (bodies may legitimately
    contain line-initial ``WARC/1.x``)."""
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


def split_gzip_members(
    df: DataFrame,
    bin_col: str = "content",
    id_cols: tuple = ("path",),
) -> DataFrame:
    """Split per-record-gzipped WARC files (``.warc.gz``) into one text
    row per gzip member — Common Crawl's ACTUAL wire format.

    Common Crawl compresses each WARC record as its own gzip MEMBER and
    concatenates the members, so consumers can seek to a (offset,
    length) from the CDX index and inflate one record without touching
    the rest of the ~1 GB file (cf. operators/export.py's
    ``export_warc_offsets``, which produces exactly those offsets on
    the emit side).  Sequential member-walking is the indexless path:
    ``zlib.decompressobj(wbits=31)`` inflates one member, its
    ``unused_data`` is the byte-exact start of the next — stdlib-only,
    no PIL/warcio needed.

    Scale shape: Arrow-batched ``mapInPandas`` over ``binaryFile`` rows
    — parallelism is per-FILE (a 100 TB archive is ~10^5 segment files,
    far more than any cluster's cores), each task streams one file's
    members and never materializes more than one inflated record plus
    the remaining compressed tail.  For sub-file parallelism, read the
    CDX index instead and range-request (offset, length) per record —
    the parser here is the same either way.

    Output: ``(*id_cols, member_idx, text)`` — ``member_idx`` is the
    0-based member ordinal within its file; ``text`` the inflated
    member decoded UTF-8 (errors→U+FFFD, matching how Common Crawl WET
    consumers treat stray bytes).  Feed straight into
    :func:`parse_warc` (one member = one record).
    """
    import zlib

    out_schema = ", ".join(
        [f"{c} string" for c in id_cols] + ["member_idx long", "text string"]
    )

    def walk(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[bin_col])
                idx = 0
                while data:
                    d = zlib.decompressobj(31)
                    try:
                        raw = d.decompress(data)
                    except zlib.error:
                        break  # trailing garbage / truncated member
                    rows.append(
                        tuple(str(r[c]) for c in id_cols)
                        + (idx, raw.decode("utf-8", errors="replace"))
                    )
                    idx += 1
                    data = d.unused_data
            yield pd.DataFrame(
                rows, columns=[*id_cols, "member_idx", "text"]
            )

    return df.mapInPandas(walk, out_schema)


def parse_warc_gz(
    df: DataFrame, bin_col: str = "content", id_cols: tuple = ("path",)
) -> DataFrame:
    """``binaryFile`` rows of ``.warc.gz`` content → parsed records:
    member split (Python, unavoidable for gzip) then :func:`parse_warc`
    per member (pure codegen).  ``member_idx`` rides along so callers
    can join back to CDX offsets."""
    members = split_gzip_members(df, bin_col=bin_col, id_cols=id_cols)
    return _parse_record_rows(
        members.withColumnRenamed("text", "rec").filter(
            F.col("rec").startswith("WARC/1.")
        ),
        id_cols=(*id_cols, "member_idx"),
    )


def revisit_records(
    fetches: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Classify each fetch as a WARC ``response`` or ``revisit`` record
    (ISO 28500 / WARC 1.1 §6.7.2): when a recrawl's payload digest
    matches a PRIOR capture of the same URL, archives write a skeletal
    ``revisit`` record pointing at the original capture instead of
    storing the bytes again — the storage-side dedup that keeps a
    perpetual crawl archive sub-linear in fetch count (Common Crawl
    and the Wayback Machine both do exactly this; unchanged pages
    dominate recrawl traffic, cf. operators/revisit.py's change-rate
    estimates).

    One window over (url, digest) ordered by fetch time: the first
    capture of each distinct payload is the stored ``response``; every
    later identical capture becomes ``revisit`` with ``refers_to_ts``
    = the original's timestamp.  Single shuffle keyed on (url, digest)
    — partition sizes are per-page capture counts, never corpus-wide.

    Output: input + (record_type, refers_to_ts).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(url_col, digest_col).orderBy(*order)
    rn = F.row_number().over(w)
    first_ts = F.first(F.col(ts_col)).over(w)
    return fetches.select(
        *[F.col(c) for c in fetches.columns],
        F.when(rn == 1, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "record_type"
        ),
        F.when(rn > 1, first_ts).alias("refers_to_ts"),
    )
