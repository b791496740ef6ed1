"""Page extraction — parameterized field specs over html/text columns.

Reference equivalents: ``extract_one``/``extract_many`` with arbitrary
(selector, attribute) arguments (/root/reference/scraper/home_depo.py:78-101,
duplicated at scraper/scraper_template.py:87-110 and scraper/movie.py:66-89),
per-card projections (/root/reference/scraper/library_event.py:110-153),
full-page content (/root/reference/scraper/scraper_template.py:73-75).

``ExtractSpec`` is the engine's (selector, attr) analog: a named regex
with one capture group, ``many=False`` → first match (extract_one),
``many=True`` → all matches (extract_many).  A new site/field is a new
spec passed as an argument — not an engine edit.

One shared, pure, vectorized pandas function (``extract_fields_pdf``)
is used by BOTH the distributed ``mapInPandas`` stage and the
single-process parity oracle — same code object, therefore
byte-identical extracted text per URL (the input_hint invariant).  All
regex work runs in pandas' C regex engine over Arrow batches; no
per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pyppeteer_scraper_spark.schemas import EXTRACTED_SCHEMA

TITLE_RE = r"<title>(.*?)</title>"
TEXT_RE = r"<p>(.*?)</p>"
LINK_RE = r'<a href="([^"]*)"'
PAYLOAD_RE = r'<script type="application/json">(.*?)</script>'


@dataclass(frozen=True)
class ExtractSpec:
    """One extraction rule: ``pattern`` must contain exactly one capture
    group.  ``many=False`` → first match or null (reference
    ``extract_one``); ``many=True`` → array of all matches (reference
    ``extract_many``)."""

    name: str
    pattern: str
    many: bool = False


# The reference workshop/product page fields, as specs (what round 1
# hardcoded as four module-level regex applications).
PAGE_SPECS: tuple[ExtractSpec, ...] = (
    ExtractSpec("title", TITLE_RE),
    ExtractSpec("text", TEXT_RE),
    ExtractSpec("links", LINK_RE, many=True),
    ExtractSpec("payload_json", PAYLOAD_RE),
)


def decode_utf8_series(col: pd.Series) -> pd.Series:
    """binary-or-string column → pandas string series (vectorized)."""
    first = col.dropna().head(1)
    if len(first) and isinstance(first.iloc[0], (bytes, bytearray)):
        col = col.str.decode("utf-8")  # vectorized C path for binary cols
    return col.astype("string").fillna("")


def apply_specs(s: pd.Series, specs: Sequence[ExtractSpec]) -> dict[str, pd.Series]:
    """Run every spec over a decoded string series → {name: series}."""
    return {
        spec.name: (
            s.str.findall(spec.pattern)
            if spec.many
            else s.str.extract(spec.pattern, expand=False)
        )
        for spec in specs
    }


def extract_fields_pdf(
    pdf: pd.DataFrame,
    specs: Sequence[ExtractSpec],
    input_col: str = "html",
    keep: Sequence[str] = ("url",),
) -> pd.DataFrame:
    """Apply every spec to ``input_col``; passthrough ``keep`` columns.
    Pure + vectorized — shared by the engine and the parity oracle."""
    s = decode_utf8_series(pdf[input_col])
    out = {k: pdf[k] for k in keep}
    out.update(apply_specs(s, specs))
    return pd.DataFrame(out)


def extract_fields(
    df: DataFrame,
    specs: Sequence[ExtractSpec],
    input_col: str = "html",
    keep: Sequence[str] = ("url",),
) -> DataFrame:
    """Distributed parameterized extraction: one ``mapInPandas`` stage,
    schema derived from the specs (string / array<string> per field).

    This is the engine's ``extract_many(selector, attr)`` — the operator
    is generic; callers pass the field inventory.
    """
    in_schema = {f.name: f for f in df.schema.fields}
    fields = [in_schema[k] for k in keep] + [
        T.StructField(
            s.name, T.ArrayType(T.StringType()) if s.many else T.StringType()
        )
        for s in specs
    ]
    schema = T.StructType(fields)
    cols = list(dict.fromkeys([*keep, input_col]))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_fields_pdf(pdf, specs, input_col=input_col, keep=keep)

    return df.select(*cols).mapInPandas(run, schema)


def extract_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """(url, html:bytes, lang) → (url, title, text, lang, links,
    payload_json) — the crawl round's page projection, expressed as
    ``PAGE_SPECS`` through the generic spec machinery (one decoded
    series, no intermediate frame)."""
    ex = apply_specs(decode_utf8_series(pdf["html"]), PAGE_SPECS)
    return pd.DataFrame(
        {
            "url": pdf["url"].astype("string"),
            "title": ex["title"],
            "text": ex["text"],
            "lang": pdf["lang"].astype("string")
            if "lang" in pdf
            else pd.Series(pd.NA, index=pdf.index, dtype="string"),
            "links": ex["links"],
            "payload_json": ex["payload_json"],
        }
    )


def extract_pages(fetched: DataFrame) -> DataFrame:
    """Distributed extraction over a fetched batch (url, html, lang)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_pdf(pdf)

    return fetched.select("url", "html", "lang").mapInPandas(run, EXTRACTED_SCHEMA)
