"""cache_policy (functions/httpcache.py) and mojibake_signals
(functions/text.py): hand-built header blocks and planted
encoding-damage strings, including the clean-text non-triggers."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.httpcache import cache_policy
from pyppeteer_scraper_spark.functions.text import mojibake_signals

CRLF = "\r\n"


def _policies(spark, headers):
    df = spark.createDataFrame([(h,) for h in headers], "hdr string")
    pol = cache_policy(F.col("hdr"))
    return df.select(*[c.alias(k) for k, c in pol.items()]).collect()


def test_cache_policy_directives(spark):
    rows = _policies(
        spark,
        [
            "HTTP/1.1 200 OK" + CRLF + "Cache-Control: public, max-age=300"
            + CRLF + 'ETag: "abc"' + CRLF,
            "HTTP/1.1 200 OK" + CRLF + "cache-control: NO-STORE" + CRLF,
            "HTTP/1.1 200 OK" + CRLF + "Cache-Control: no-cache" + CRLF
            + "Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT" + CRLF,
            "HTTP/1.1 200 OK" + CRLF
            + "Expires: Thu, 01 Jan 2026 00:00:00 GMT" + CRLF,
            "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF,
        ],
    )
    a, b, c, d, e = rows
    assert a.max_age == 300 and not a.no_store and a.has_etag
    assert a.revalidatable and a.fresh_ttl_s == 300
    # directive names are case-insensitive (RFC 9111 §4.2.1)
    assert b.no_store and b.max_age is None and b.fresh_ttl_s == 0
    assert c.no_cache and c.has_last_modified and c.revalidatable
    assert c.fresh_ttl_s == 0  # no-cache forces revalidation
    assert d.has_expires and d.max_age is None and not d.revalidatable
    assert not any(
        [e.no_store, e.no_cache, e.has_etag, e.has_expires]
    ) and e.fresh_ttl_s == 0


def test_cache_policy_edge_forms(spark):
    rows = _policies(
        spark,
        [
            # whitespace around '=', directive mid-list
            "Cache-Control: private , max-age = 60 , must-revalidate" + CRLF,
            # max-age inside another token must NOT match
            "Cache-Control: s-maxage=900" + CRLF,
            # no-store as substring of another token must NOT match
            "Cache-Control: no-store-preview" + CRLF,
            # header name is matched only at line start
            "X-Note: Cache-Control: max-age=999" + CRLF,
        ],
    )
    assert rows[0].max_age == 60 and rows[0].fresh_ttl_s == 60
    assert rows[1].max_age is None
    assert not rows[2].no_store
    assert rows[3].max_age is None


def _signals(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    sig = mojibake_signals(F.col("t"))
    return df.select(*[c.alias(k) for k, c in sig.items()]).collect()


def test_mojibake_detects_planted_damage(spark):
    rows = _signals(
        spark,
        [
            "the cafÃ© was open",          # UTF-8 e-acute read as CP1252
            "he said â€œhelloâ€" + chr(0x9D),  # curly quotes mangled
            "decoder gave up �� here",
            "bare control" + chr(0x85) + "char",
        ],
    )
    assert rows[0].n_double_utf8 == 1 and rows[0].is_mojibake
    assert rows[1].n_double_utf8 >= 2 and rows[1].n_c1_controls == 1
    assert rows[2].n_replacement == 2 and rows[2].is_mojibake
    assert rows[3].n_c1_controls == 1 and rows[3].is_mojibake


def test_mojibake_clean_text_not_flagged(spark):
    rows = _signals(
        spark,
        [
            "plain ascii text",
            "café déjà vu — “fine” text…",   # real accents + punctuation
            "naïve âge Ærø Åse Älva",        # legit Â/Ã/Ä/Å-adjacent letters
            "Ã is also a standalone letter", # lead char before ASCII: clean
        ],
    )
    for r in rows:
        assert not r.is_mojibake, r
