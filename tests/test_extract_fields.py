"""Parameterized extraction operator (P1/P2): arbitrary field specs,
extract-first vs extract-all, binary and string inputs, and the
refactored page projection staying identical to its spec form."""

import pandas as pd

from pyppeteer_scraper_spark.plans.extract import (
    PAGE_SPECS,
    ExtractSpec,
    extract_fields,
    extract_fields_pdf,
    extract_pdf,
)

HTML = (
    '<html><head><title>T1</title></head><body><p>hello world</p>'
    '<a href="https://a.example/1">a</a><a href="https://b.example/2">b</a>'
    '<span data-price="$12.50">x</span></body></html>'
)


def test_extract_fields_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, HTML.encode()), (2, b"<html><p>no links</p></html>"), (3, None)],
        "id long, html binary",
    )
    specs = [
        ExtractSpec("title", r"<title>(.*?)</title>"),
        ExtractSpec("links", r'<a href="([^"]*)"', many=True),
        ExtractSpec("price", r'data-price="\$([0-9.]+)"'),
    ]
    rows = {
        r["id"]: r
        for r in extract_fields(df, specs, input_col="html", keep=("id",)).collect()
    }
    assert rows[1]["title"] == "T1"
    assert rows[1]["links"] == ["https://a.example/1", "https://b.example/2"]
    assert rows[1]["price"] == "12.50"
    assert rows[2]["title"] is None and rows[2]["links"] == []
    assert rows[3]["title"] is None  # null input → null/empty fields
    # schema derived from specs: string vs array<string>
    out = extract_fields(df, specs, input_col="html", keep=("id",))
    kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert kinds == {
        "id": "bigint",
        "title": "string",
        "links": "array<string>",
        "price": "string",
    }


def test_extract_pdf_equals_spec_form():
    """The crawl projection is PAGE_SPECS through the generic operator —
    same code object as the parity oracle, byte-identical output."""
    pdf = pd.DataFrame(
        {"url": ["u1"], "html": [HTML.encode()], "lang": ["en"]}
    )
    via_specs = extract_fields_pdf(pdf, PAGE_SPECS, input_col="html", keep=())
    full = extract_pdf(pdf)
    assert full.loc[0, "title"] == via_specs.loc[0, "title"] == "T1"
    assert full.loc[0, "text"] == via_specs.loc[0, "text"] == "hello world"
    assert list(full.loc[0, "links"]) == list(via_specs.loc[0, "links"])


def test_extract_fields_string_input(spark):
    df = spark.createDataFrame([(7, "alpha value beta value")], "doc_id long, text string")
    out = extract_fields(
        df,
        [ExtractSpec("hits", r"(value)", many=True), ExtractSpec("first", r"(alpha|beta)")],
        input_col="text",
        keep=("doc_id",),
    ).collect()[0]
    assert out["hits"] == ["value", "value"] and out["first"] == "alpha"
