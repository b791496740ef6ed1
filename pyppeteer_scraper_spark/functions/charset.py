"""Charset sniffing for fetched page bytes — BOM detection plus
HTML ``<meta>`` declaration extraction, alias-normalized.

A crawl that ingests raw bytes (WARC payloads, sources/warc.py) must
decide a decoding per page before ANY text operator runs; mis-decoded
pages surface downstream as mojibake that script_profile
(functions/text.py) flags but can no longer fix.  Precedence follows
the WHATWG encoding sniffing order a browser applies: byte-order mark
(authoritative) → ``<meta charset>`` / ``http-equiv Content-Type``
declaration → caller default.  The reference scrapes through a real
browser which does all of this invisibly; a Spark pipeline has to do
it explicitly.

Everything here is a codegen projection (regexp_extract + byte-prefix
compares) — zero shuffles, O(bytes) over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Lowercased label → canonical encoding name (the subset of the WHATWG
# encoding-label registry a web crawl sees in volume).
CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "iso-8859-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "gbk": "gbk",
    "gb2312": "gbk",
    "euc-kr": "euc-kr",
    "big5": "big5",
    "utf-16": "utf-16",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
}

# Matches both `<meta charset="x">` and
# `<meta http-equiv="Content-Type" content="text/html; charset=x">`.
META_CHARSET_RE = r'(?i)<meta[^>]*charset\s*=\s*["\']?\s*([A-Za-z0-9_\-]+)'


def normalize_charset(col: Column) -> Column:
    """Lowercase + alias-fold a raw charset label; unknown labels pass
    through lowercased (a crawl wants to SEE novel labels, not lose
    them)."""
    lowered = F.lower(col)
    expr = lowered
    for alias, canon in CHARSET_ALIASES.items():
        if alias != canon:
            expr = F.when(lowered == alias, F.lit(canon)).otherwise(expr)
    return expr


def meta_charset(html_col: Column) -> Column:
    """Declared charset from the page's first ``<meta>`` declaration,
    normalized; NULL when the page declares nothing."""
    raw = F.nullif(F.regexp_extract(html_col, META_CHARSET_RE, 1), F.lit(""))
    return normalize_charset(raw)


def bom_charset(bin_col: Column) -> Column:
    """Byte-order-mark sniff over a binary column — authoritative when
    present (WHATWG precedence).  NULL when no BOM."""
    prefix4 = F.hex(F.substring(bin_col, 1, 4))
    prefix3 = F.hex(F.substring(bin_col, 1, 3))
    prefix2 = F.hex(F.substring(bin_col, 1, 2))
    return (
        F.when(prefix3 == "EFBBBF", F.lit("utf-8"))
        .when(prefix4 == "FFFE0000", F.lit("utf-32le"))
        .when(prefix4 == "0000FEFF", F.lit("utf-32be"))
        .when(prefix2 == "FFFE", F.lit("utf-16le"))
        .when(prefix2 == "FEFF", F.lit("utf-16be"))
    )


def sniff_charset(
    html_col: Column,
    bin_col: Column | None = None,
    default: str = "utf-8",
) -> Column:
    """Resolved decoding for a page: BOM → meta declaration → default."""
    declared = meta_charset(html_col)
    if bin_col is not None:
        return F.coalesce(bom_charset(bin_col), declared, F.lit(default))
    return F.coalesce(declared, F.lit(default))
