"""Common-Crawl CDXJ index ingestion.

The public Common Crawl URL index ships one CDXJ line per capture:

    <SURT key> <14-digit timestamp> <JSON blob>

e.g. ``com,example)/page 20240114083000 {"url": "...", "status":
"200", "mime": "text/html", "digest": "sha1:...", "length": "512"}``
(status/length are JSON *strings* in the real index — parsing must
cast).  A crawl scheduler seeds and dedups its frontier from this
index, so ingesting it at 10^10-line scale is a first-class source.

Everything here is JVM built-ins — ``regexp_extract`` for the three
space-delimited fields and ``get_json_object`` for the blob — so the
parse stays inside whole-stage codegen with zero Python in the path.

Reference parity: the reference scraper keeps its seen-set in a JSON
state file (scraper/utils/state.py) — this is the web-scale analog of
loading prior-capture knowledge before a crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"


def parse_cdx(lines: DataFrame, col: str = "line") -> DataFrame:
    """Parse CDXJ ``lines`` into typed columns.

    Returns (surt, fetch_ts, url, status, mime, digest, length);
    malformed lines (no 3-field match) come back with NULL surt so
    callers can quarantine instead of crash — same shape-guard policy
    as the F10 operator.
    """
    c = F.col(col)
    surt = F.regexp_extract(c, _LINE_RE, 1)
    ts = F.regexp_extract(c, _LINE_RE, 2)
    js = F.regexp_extract(c, _LINE_RE, 3)
    return lines.select(
        F.when(surt != "", surt).alias("surt"),
        F.try_to_timestamp(ts, F.lit("yyyyMMddHHmmss")).alias("fetch_ts"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").cast("int").alias("status"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
    )
