"""Main-content extraction from HTML — block-level text/link density
classification (the boilerpipe/trafilatura family's core heuristic,
Kohlschütter et al. WSDM'10, re-implemented from scratch).

A Common-Crawl-scale text pipeline cannot feed nav bars, cookie
banners and footers to a tokenizer; the standard fix is structural:
split the page into BLOCKS (deepest block-level element containing
each text run), score each block by word count and link density
(chars inside <a> / total chars), and keep blocks that read like
prose (enough words, few link chars).  ``script``/``style``/``nav``/
``header``/``footer``/``aside``/``form`` subtrees are dropped
outright.

Built on the same stdlib DOM as the CSS-selector engine
(functions/selectors.py::parse_html) — one parse serves both
extraction paths.  Runs Arrow-batched via mapInPandas (plans/
queries.py::text_main_content); HTML never shuffles, only the
extracted text does.

Reference analog: the reference extracts per-card text with
querySelector pipelines (/root/reference/scraper/home_depo.py) —
main-content extraction is the corpus-scale generalization SURVEY.md
§6 (text analysis) calls for.
"""

from __future__ import annotations

from pyppeteer_scraper_spark.functions.selectors import Node, parse_html

BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "li", "td", "th",
    "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
    "figcaption", "dd", "dt",
})
SKIP_TAGS = frozenset({
    "head", "title", "script", "style", "nav", "header", "footer",
    "aside", "noscript", "form", "template", "iframe", "svg",
    "button", "select",
})


def html_blocks(html: str) -> list[dict]:
    """Split HTML into text blocks with per-block stats.

    Each text run is attributed to its nearest block-level ancestor
    (document order preserved); runs inside <a> count toward the
    block's link chars.  Returns [{text, n_chars, n_link_chars,
    n_words, link_density}] for non-empty blocks, document order.
    """
    root = parse_html(html)
    blocks: list[list] = []  # [raw_parts, link_chars, total_chars]
    order: list[int] = []
    current = -1  # index into blocks; -1 = implicit top block

    def ensure_block(idx: int) -> int:
        if idx == -1:
            blocks.append([[], 0, 0])
            order.append(len(blocks) - 1)
            return len(blocks) - 1
        return idx

    def walk(node: Node, block_idx: int, in_link: bool) -> int:
        for child in node.children:
            if isinstance(child, str):
                if child.strip():
                    block_idx = ensure_block(block_idx)
                elif block_idx == -1 or not blocks[block_idx][0]:
                    # whitespace-only run with no open block: drop
                    continue
                # whitespace runs joining an open block are kept so
                # "</a> <a>" does not fuse adjacent words
                b = blocks[block_idx]
                b[0].append(child)
                n = len(child)
                b[2] += n
                if in_link:
                    b[1] += n
                continue
            tag = child.tag
            if tag in SKIP_TAGS:
                continue
            if tag in BLOCK_TAGS:
                blocks.append([[], 0, 0])
                order.append(len(blocks) - 1)
                walk(child, len(blocks) - 1, in_link)
                # a block element breaks the flow: parent text after
                # it starts a fresh block (document order preserved)
                block_idx = -1
            else:
                block_idx = walk(
                    child, block_idx, in_link or tag == "a")
        return block_idx

    walk(root, -1, False)
    out = []
    for i in order:
        raw_parts, link_chars, total_chars = blocks[i]
        text = " ".join("".join(raw_parts).split())
        if not text:
            continue
        out.append({
            "text": text,
            "n_chars": total_chars,
            "n_link_chars": link_chars,
            "n_words": len(text.split()),
            "link_density": (link_chars / total_chars)
            if total_chars else 0.0,
        })
    return out


def extract_main_content(
    html: str,
    min_words: int = 10,
    max_link_density: float = 1 / 3,
) -> dict:
    """Classify blocks and join the content ones with newlines.

    A block is CONTENT iff it has >= ``min_words`` words and link
    density <= ``max_link_density`` — the boilerpipe densitometric
    rule pair.  Returns {main_text, n_blocks, n_content_blocks,
    content_chars, boiler_chars}.
    """
    bs = html_blocks(html)
    content = [
        b for b in bs
        if b["n_words"] >= min_words
        and b["link_density"] <= max_link_density
    ]
    content_set = {id(b) for b in content}
    return {
        "main_text": "\n".join(b["text"] for b in content),
        "n_blocks": len(bs),
        "n_content_blocks": len(content),
        "content_chars": sum(len(b["text"]) for b in content),
        "boiler_chars": sum(
            len(b["text"]) for b in bs if id(b) not in content_set),
    }
