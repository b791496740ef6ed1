"""Page extraction — parameterized field specs over html/text columns.

Reference equivalents: ``extract_one``/``extract_many`` with arbitrary
(selector, attribute) arguments (/root/reference/scraper/home_depo.py:78-101,
duplicated at scraper/scraper_template.py:87-110 and scraper/movie.py:66-89),
per-card projections (/root/reference/scraper/library_event.py:110-153),
full-page content (/root/reference/scraper/scraper_template.py:73-75).

``ExtractSpec`` is the engine's (selector, attr) equivalent, with two
backends behind one name: a named regex with one capture group (the
fast vectorized path), or a real CSS ``selector`` + DOM property
``attr`` evaluated by ``functions.selectors`` (querySelectorAll
semantics, matching the reference's actual DOM queries — tolerant of
its unterminated-bracket selectors).  ``many=False`` → first match
(extract_one), ``many=True`` → all matches (extract_many).  A new
site/field is a new spec passed as an argument — not an engine edit.

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
    """One extraction rule — exactly one of two backends:

    - ``pattern``: a regex with exactly one capture group, evaluated in
      pandas' C regex engine (vectorized — the scale default);
    - ``selector`` (+ ``attr``): a CSS selector evaluated on a parsed
      DOM with querySelector(All) semantics, ``attr`` being
      ``textContent``/``innerText`` or any HTML attribute — the
      reference's ``extract_many(selector, attr)`` signature
      (/root/reference/scraper/home_depo.py:78-101).  Per-document
      Python inside the Arrow batch; use for selector fidelity, the
      regex form for throughput.

    ``many=False`` → first match or null (``extract_one``);
    ``many=True`` → array of all matches (``extract_many``)."""

    name: str
    pattern: str | None = None
    many: bool = False
    selector: str | None = None
    attr: str = "textContent"

    def __post_init__(self) -> None:
        if (self.pattern is None) == (self.selector is None):
            raise ValueError(
                f"ExtractSpec {self.name!r}: exactly one of pattern/selector"
            )


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
    """Run every spec over a decoded string series → {name: series}.

    Regex specs stay fully vectorized; selector specs share ONE parsed
    DOM per document across all selector specs in the batch."""
    out: dict[str, pd.Series] = {}
    sel_specs = [sp for sp in specs if sp.selector is not None]
    trees = None
    if sel_specs:
        from pyppeteer_scraper_spark.functions.selectors import parse_html, select_all

        trees = [parse_html(doc) for doc in s.tolist()]
    for spec in specs:
        if spec.selector is None:
            out[spec.name] = (
                s.str.findall(spec.pattern)
                if spec.many
                else s.str.extract(spec.pattern, expand=False)
            )
        else:
            vals: list = []
            for tree in trees:
                nodes = select_all(tree, spec.selector)
                if spec.many:
                    vals.append([n.get_prop(spec.attr) for n in nodes])
                else:
                    vals.append(nodes[0].get_prop(spec.attr) if nodes else None)
            ser = pd.Series(vals, index=s.index, dtype=object)
            out[spec.name] = ser if spec.many else ser.astype("string")
    return out


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
