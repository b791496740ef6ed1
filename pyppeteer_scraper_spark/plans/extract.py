"""Page extraction — html → (title, text, links[], payload_json).

Reference equivalents: ``extract_one``/``extract_many``
(/root/reference/scraper/home_depo.py:78-101), per-card projections
(/root/reference/scraper/library_event.py:110-153), full-page content
(/root/reference/scraper/scraper_template.py:73-75).

One shared, pure, vectorized pandas function (``extract_pdf``) is used
by BOTH the distributed ``mapInPandas`` stage and the single-process
parity oracle — same code object, therefore byte-identical extracted
text per URL (the input_hint invariant).  All regex work runs in
pandas' C regex engine over Arrow batches; no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pyppeteer_scraper_spark.schemas import EXTRACTED_SCHEMA

TITLE_RE = r"<title>(.*?)</title>"
TEXT_RE = r"<p>(.*?)</p>"
LINK_RE = r'<a href="([^"]*)"'
PAYLOAD_RE = r'<script type="application/json">(.*?)</script>'


def extract_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """(url, html:bytes, lang) → (url, title, text, lang, links, payload_json)."""
    h = pdf["html"]
    first = h.dropna().head(1)
    if len(first) and isinstance(first.iloc[0], (bytes, bytearray)):
        html = h.str.decode("utf-8")  # vectorized C path for binary cols
    else:
        html = h
    html = html.astype("string").fillna("")
    out = pd.DataFrame(
        {
            "url": pdf["url"].astype("string"),
            "title": html.str.extract(TITLE_RE, expand=False),
            "text": html.str.extract(TEXT_RE, expand=False),
            "lang": pdf["lang"].astype("string") if "lang" in pdf else pd.Series(pd.NA, index=pdf.index, dtype="string"),
            "links": html.str.findall(LINK_RE),
            "payload_json": html.str.extract(PAYLOAD_RE, expand=False),
        }
    )
    return out


def extract_pages(fetched: DataFrame) -> DataFrame:
    """Distributed extraction over a fetched batch (url, html, lang)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_pdf(pdf)

    return fetched.select("url", "html", "lang").mapInPandas(run, EXTRACTED_SCHEMA)
