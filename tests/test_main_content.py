"""Main-content extraction (functions/content.py): block splitting,
densitometric classification, skip subtrees, whitespace-join behavior,
nested-block attribution, and malformed-HTML tolerance."""

from pyppeteer_scraper_spark.functions.content import (
    extract_main_content,
    html_blocks,
)

PROSE = ("one two three four five six seven eight nine ten eleven")


def test_blocks_attribute_to_deepest_block_ancestor():
    html = f"<div>outer start<p>{PROSE}</p>outer end</div>"
    bs = html_blocks(html)
    texts = [b["text"] for b in bs]
    # div's own runs and the nested p are separate blocks
    assert texts == ["outer start", PROSE, "outer end"]


def test_link_density_counts_anchor_chars():
    html = '<p><a>abcde</a> fghij</p>'
    (b,) = html_blocks(html)
    assert b["n_link_chars"] == 5
    assert b["text"] == "abcde fghij"
    assert 0.4 < b["link_density"] < 0.5


def test_skip_subtrees_never_leak():
    html = (
        "<head><title>TT</title></head><nav>menu</nav>"
        "<script>var x=1;</script><style>.a{}</style>"
        f"<footer>foot</footer><p>{PROSE}</p>"
    )
    bs = html_blocks(html)
    assert [b["text"] for b in bs] == [PROSE]


def test_classification_rules():
    html = (
        f"<p>{PROSE}</p>"              # content: 11 words, no links
        "<p>short</p>"                  # boiler: < min_words
        f"<p><a>{PROSE}</a></p>"        # boiler: link density 1.0
    )
    r = extract_main_content(html)
    assert r["n_blocks"] == 3
    assert r["n_content_blocks"] == 1
    assert r["main_text"] == PROSE
    assert r["boiler_chars"] > 0


def test_whitespace_between_inline_elements_preserved():
    html = "<p><a>home page</a> <a>contact us</a> end</p>"
    (b,) = html_blocks(html)
    assert b["text"] == "home page contact us end"


def test_malformed_html_tolerated():
    # unclosed tags, stray end tags, bare text
    html = f"<div><p>{PROSE}<p>second {PROSE}</div></span>trailing"
    r = extract_main_content(html)
    assert PROSE in r["main_text"]
    assert r["n_blocks"] >= 2


def test_empty_and_whitespace_only():
    assert html_blocks("") == []
    assert html_blocks("   \n  ") == []
    r = extract_main_content("<p>   </p>")
    assert r["n_blocks"] == 0 and r["main_text"] == ""
