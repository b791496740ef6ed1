"""WARC parser (sources/warc.py) — multi-record archives, multi-line
payload preservation, HTTP-envelope stripping, and the warc_pages
mapping onto the engine's page schema (which then flows into the
existing prepare_pages canonicalization).  Variant/timestamp parity vs
an independent derivation is covered by the `warc_parse_records`
DuckDB oracle."""

from pyspark.sql import functions as F

_ARCHIVE = (
    "WARC/1.0\r\n"
    "WARC-Type: warcinfo\r\n"
    "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    "Content-Type: application/warc-fields\r\n"
    "\r\n"
    "software: test\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: request\r\n"
    "WARC-Target-URI: https://w.example/a\r\n"
    "WARC-Date: 2026-01-02T00:00:00Z\r\n"
    "\r\n"
    "GET /a HTTP/1.1\r\nHost: w.example\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: https://w.example/a\r\n"
    "WARC-Date: 2026-01-02T00:00:01Z\r\n"
    "Content-Type: application/http;msgtype=response\r\n"
    "\r\n"
    "HTTP/1.1 200 OK\r\n"
    "Content-Type: text/html; charset=utf-8\r\n"
    "X-Header: WARC/1.0 lookalike value\r\n"
    "\r\n"
    "<html>\r\n<body>line1\r\nline2</body>\r\n</html>\r\n"
    "\r\n"
)


def test_multi_record_archive_and_envelope_strip(spark):
    from pyppeteer_scraper_spark.sources.warc import parse_warc

    df = spark.createDataFrame([(_ARCHIVE,)], "warc string")
    rows = {
        r["record_type"]: r
        for r in parse_warc(df).collect()
    }
    assert sorted(rows) == ["request", "response", "warcinfo"]
    assert rows["warcinfo"]["payload"] == "software: test"
    # request blocks keep their envelope (they ARE the envelope)
    assert rows["request"]["payload"].startswith("GET /a HTTP/1.1")
    # response: HTTP envelope stripped, multi-line body intact, and the
    # mid-header "WARC/1.0" lookalike must NOT split the record
    assert (
        rows["response"]["payload"]
        == "<html>\r\n<body>line1\r\nline2</body>\r\n</html>"
    )
    assert str(rows["response"]["warc_ts"]) == "2026-01-02 00:00:01"


def test_warc_pages_matches_page_schema(spark):
    from pyppeteer_scraper_spark.plans.round import prepare_pages
    from pyppeteer_scraper_spark.schemas import PAGES_SCHEMA
    from pyppeteer_scraper_spark.sources.warc import warc_pages

    df = spark.createDataFrame([(_ARCHIVE,)], "warc string")
    pages = warc_pages(df)
    assert [f.name for f in pages.schema.fields] == [
        f.name for f in PAGES_SCHEMA.fields
    ]
    got = pages.collect()
    assert len(got) == 1 and got[0]["url"] == "https://w.example/a"
    assert bytes(got[0]["html"]).startswith(b"<html>")

    # flows into the existing canonicalize/dedupe stage unchanged
    prepped = prepare_pages(pages)
    assert prepped.count() == 1
    assert prepped.filter(F.col("url_hash").isNull()).count() == 0
