"""CSS-selector extraction backend: querySelector(All) semantics on the
stdlib-built DOM, exercised with the REFERENCE'S OWN selector strings
(including its unterminated-bracket quirks), plus engine/pandas parity
for selector-backed ExtractSpecs."""

import pandas as pd

from pyppeteer_scraper_spark.functions.selectors import (
    parse_html,
    select_all,
    select_one,
)
from pyppeteer_scraper_spark.plans.extract import (
    LINK_RE,
    TITLE_RE,
    ExtractSpec,
    extract_fields,
    extract_fields_pdf,
)

# A page shaped like the reference's library/stonebridge/home-depot DOMs
# (/root/reference/scraper/library_event.py:109-153,
#  stonebridge_event.py:91-96, home_depo.py:68,136-147).
CARDS_HTML = """
<html><body>
<localized-tabs-content>
  <div><h3>Kids Workshop A</h3><button>Register</button><p>Sat 08:30</p></div>
  <div><h3>Kids Workshop B</h3><button>Closed</button><p>Sun 10:30</p></div>
</localized-tabs-content>
<div class="day-event-card">
  <h3>Lego Club</h3>
  <div class="card-reg future">Open for registration</div>
  <span class="event-dow">Sat</span><span class="event-date">14</span>
  <span class="event-month">2</span><strong>Main Library</strong>
</div>
<div class="day-event-card">
  <h3>Story Time</h3>
  <div class="card-reg">Full</div>
  <span class="event-dow">Sun</span><span class="event-date">15</span>
  <span class="event-month">3</span><strong>Branch</strong>
</div>
<ul id="menu-item-2452"><li><a href="/e/1">Soccer 2026</a></li>
<li><a href="/e/2">Kinder Gym</a></li></ul>
<ul><li role="listitem">Outside item</li></ul>
<button class="x acl-reset-button-lg">close</button>
</body></html>
"""


def test_reference_selector_inventory():
    root = parse_html(CARDS_HTML)

    # tag + class (library_event.py:109)
    cards = select_all(root, "div.day-event-card")
    assert [select_one(c, "h3").text_content() for c in cards] == [
        "Lego Club",
        "Story Time",
    ]
    # per-card sub-selects (library_event.py:112-150)
    first = cards[0]
    assert select_one(first, "div.card-reg").text_content() == "Open for registration"
    assert select_one(first, "span.event-dow").text_content() == "Sat"
    assert select_one(first, "span.event-month").text_content() == "2"
    assert select_one(first, "strong").text_content() == "Main Library"
    # the reference's UNTERMINATED attribute selector (library_event.py:146)
    assert select_one(root, "div[class='card-reg future'").text_content() == (
        "Open for registration"
    )
    # id + descendant (stonebridge_event.py:91) and attr extraction
    lis = select_all(root, "#menu-item-2452 li")
    assert len(lis) == 2
    assert [select_one(li, "a").get_prop("href") for li in lis] == ["/e/1", "/e/2"]
    # child combinator (home_depo.py:136)
    tabs = select_all(root, "localized-tabs-content > div")
    assert [select_one(d, "h3").text_content() for d in tabs] == [
        "Kids Workshop A",
        "Kids Workshop B",
    ]
    assert [select_one(d, "button").text_content() for d in tabs] == [
        "Register",
        "Closed",
    ]
    # substring attribute match (home_depo.py:68)
    assert select_one(root, "button[class*=acl-reset-button]").text_content() == "close"
    # unterminated + unquoted (scraper_template.py:168)
    assert [n.text_content() for n in select_all(root, "li[role=listitem")] == [
        "Outside item"
    ]
    # select_one = first in document order; miss → None
    assert select_one(root, "h3").text_content() == "Kids Workshop A"
    assert select_one(root, "div.nope") is None


def test_selector_specs_engine_equals_pandas(spark):
    """Selector-backed ExtractSpecs through the distributed mapInPandas
    stage ≡ the shared pandas function (byte-identical), and ≡ the
    regex backend where both can express the field."""
    docs = [
        f"<html><head><title>Doc {i}</title></head><body>"
        f"<p>body {i}</p>"
        f'<a href="https://x.example/a{i}">a</a>'
        f'<a href="https://x.example/b{i}">b</a></body></html>'
        for i in range(40)
    ]
    pdf = pd.DataFrame({"url": [f"u{i}" for i in range(40)], "html": docs})
    specs = (
        ExtractSpec("title", selector="title"),
        ExtractSpec("body", selector="p"),
        ExtractSpec("links", selector="a", attr="href", many=True),
    )
    local = extract_fields_pdf(pdf, specs)
    df = spark.createDataFrame(pdf)
    dist = extract_fields(df, specs).toPandas().sort_values("url").reset_index(drop=True)
    local = local.sort_values("url").reset_index(drop=True)
    assert list(dist["title"]) == list(local["title"])
    assert [list(x) for x in dist["links"]] == [list(x) for x in local["links"]]
    assert list(dist["body"]) == list(local["body"])

    # regex backend agreement on the same corpus (same sort order)
    rx = extract_fields_pdf(
        pdf,
        (
            ExtractSpec("title", TITLE_RE),
            ExtractSpec("links", LINK_RE, many=True),
        ),
    ).sort_values("url").reset_index(drop=True)
    assert list(rx["title"]) == list(local["title"])
    assert [list(x) for x in rx["links"]] == [list(x) for x in local["links"]]


def test_selector_spec_validation():
    import pytest

    with pytest.raises(ValueError):
        ExtractSpec("both", pattern="x(.)", selector="p")
    with pytest.raises(ValueError):
        ExtractSpec("neither")


def test_selector_parity_on_datagen_pages(spark, sf_small):
    """Byte-identical selector extraction on the synthetic crawl pages:
    distributed mapInPandas ≡ the shared pandas function (the oracle
    path), and the DOM's <p> textContent ≡ the engine's regex text
    field used for crawl parity."""
    from pyppeteer_scraper_spark.plans.extract import TEXT_RE
    from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

    pages = generate_crawl_tables(spark, sf_small)["pages"].limit(200)
    specs = (
        ExtractSpec("title", selector="title"),
        ExtractSpec("body_text", selector="p"),
        ExtractSpec("hrefs", selector="a", attr="href", many=True),
    )
    dist = (
        extract_fields(pages, specs)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    local = (
        extract_fields_pdf(pages.toPandas(), specs)
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(dist["url"]) == list(local["url"])
    for col in ("title", "body_text"):
        for a, b in zip(dist[col], local[col]):
            assert (a is None and b is None) or a.encode() == b.encode()
    assert [list(x) for x in dist["hrefs"]] == [list(x) for x in local["hrefs"]]

    # DOM text ≡ regex text (the crawl's byte-identical invariant field)
    rx = extract_fields_pdf(
        pages.toPandas(), (ExtractSpec("t", TEXT_RE),)
    ).sort_values("url").reset_index(drop=True)
    for a, b in zip(local["body_text"], rx["t"]):
        assert a.encode() == b.encode()
