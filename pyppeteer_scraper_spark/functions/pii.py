"""PII detection and redaction for webtext curation pipelines.

Standard pre-training curation step (public C4 / CCNet / Dolma
recipes): count and mask emails, phone numbers, and IP addresses
before a corpus ships.  Everything here is built-in
``pyspark.sql.functions`` regex — JVM-side, whole-stage-codegen, no
Python per row; at 100 TB the redaction pass is a single narrow
projection with no shuffle.

The patterns are deliberately RE2-compatible (no backreferences or
lookaround) so the same literal pattern runs under Java regex (Spark)
and RE2 (the DuckDB oracle) with identical matches.

Generalizes the reference's scalar text cleanup (regex field fixes,
/root/reference/scraper/home_depo.py:149-153) to a corpus-scale
masking pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (an email contains no phone/IP match, but
# masking IPs first could split a dotted hostname inside an email).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(col) -> dict[str, Column]:
    """Per-kind match counts (long), one ``regexp_count`` each."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("long")
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii(col) -> Column:
    """Mask every PII match with its typed placeholder, in pattern
    order (emails before IPs — see PII_PATTERNS comment)."""
    out = col
    for pat, repl in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, repl)
    return out
