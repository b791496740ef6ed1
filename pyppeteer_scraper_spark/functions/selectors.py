"""Tiny CSS-selector engine over stdlib ``html.parser`` — the DOM-query
backend for ``ExtractSpec(selector=..., attr=...)``.

The reference's ``extract_many``/``extract_one`` are real DOM queries
(``page.querySelectorAll(selector)`` then ``element.getProperty(attr)``,
/root/reference/scraper/home_depo.py:78-101); the regex ``ExtractSpec``
is only an analog.  No C HTML parser ships in this environment (lxml /
selectolax / bs4 all absent), so this module implements the selector
subset the reference actually uses on a stdlib-built DOM:

- simple selectors: ``tag``, ``#id``, ``.class``, ``*``
- attribute tests ``[attr]``, ``[attr=v]``, ``[attr*=v]``, ``[attr^=v]``,
  ``[attr$=v]``, ``[attr~=v]`` — values optionally quoted, and the
  closing ``]`` may be MISSING (the reference passes
  ``"li[role=listitem"`` scraper_template.py:168 and
  ``"div[class='card-reg future'"`` library_event.py:146 — Chromium
  tolerates the unterminated form, so we do too)
- combinators: descendant (whitespace) and child (``>``)
- properties: ``textContent`` (recursive text), ``innerText`` (alias),
  plus any HTML attribute name (``href``, ``src``, ...)

Matching walks the document in source order and verifies the compound
chain right-to-left against ancestors — O(nodes · chain length), fine
for page-sized documents.  At scale this runs INSIDE the existing
``mapInPandas`` extraction seam (one Arrow batch of pages per task);
the parse is per-document Python and is the documented slow path — swap
``parse_html`` for an lxml/selectolax build where those libs exist, the
selector API stays identical.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# HTML void elements never get a closing tag.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_text")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        self._text: str | None = None

    def text_content(self) -> str:
        if self._text is None:
            parts: list[str] = []
            stack: list[Node | str] = list(reversed(self.children))
            while stack:
                c = stack.pop()
                if isinstance(c, str):
                    parts.append(c)
                else:
                    stack.extend(reversed(c.children))
            self._text = "".join(parts)
        return self._text

    def get_prop(self, attr: str) -> str | None:
        if attr in ("textContent", "innerText"):
            return self.text_content()
        return self.attrs.get(attr.lower())


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None)
        self._cur = self.root

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self._cur)
        self._cur.children.append(node)
        if tag not in _VOID:
            self._cur = node

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._cur.children.append(
            Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self._cur)
        )

    def handle_endtag(self, tag: str) -> None:
        # Pop to the nearest matching open element; ignore stray ends.
        n = self._cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self._cur = n.parent

    def handle_data(self, data: str) -> None:
        if data:
            self._cur.children.append(data)


def parse_html(html: str) -> Node:
    b = _DomBuilder()
    b.feed(html or "")
    return b.root


# --- selector parsing --------------------------------------------------

# one attribute test; the closing ] is optional (reference quirk).
_ATTR_RE = re.compile(
    r"\[\s*(?P<name>[\w:-]+)\s*(?:(?P<op>[*^$~|]?=)\s*"
    r"(?P<val>\"[^\"]*\"|'[^']*'|[^\]]*?)\s*)?\]?\s*$"
)
_PART_RE = re.compile(
    r"(?P<tag>\*|[\w:-]+)?(?P<rest>(?:[#.][\w:-]+|\[[^\]]*\]?)*)$"
)
_REST_TOKEN_RE = re.compile(r"[#.][\w:-]+|\[[^\]]*\]?")


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self, compound: str):
        # attribute blocks may contain spaces — split them off first
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str]] = []  # (name, op, value)
        m = _PART_RE.match(compound.strip())
        if not m:
            raise ValueError(f"unsupported selector part: {compound!r}")
        if m.group("tag") and m.group("tag") != "*":
            self.tag = m.group("tag").lower()
        for tok in _REST_TOKEN_RE.findall(m.group("rest") or ""):
            if tok.startswith("#"):
                self.id = tok[1:]
            elif tok.startswith("."):
                self.classes.append(tok[1:])
            else:
                am = _ATTR_RE.match(tok)
                if not am:
                    raise ValueError(f"unsupported attribute selector: {tok!r}")
                val = am.group("val")
                if val is not None and len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                self.attrs.append((am.group("name").lower(), am.group("op"), val))

    def matches(self, node: Node) -> bool:
        if self.tag is not None and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            cls = node.attrs.get("class", "").split()
            if any(c not in cls for c in self.classes):
                return False
        for name, op, val in self.attrs:
            got = node.attrs.get(name)
            if got is None:
                return False
            if op is None or val is None:
                continue  # bare [attr] presence test
            if op == "=":
                ok = got == val
            elif op == "*=":
                ok = val in got
            elif op == "^=":
                ok = got.startswith(val)
            elif op == "$=":
                ok = got.endswith(val)
            elif op == "~=":
                ok = val in got.split()
            elif op == "|=":
                ok = got == val or got.startswith(val + "-")
            else:  # pragma: no cover - regex admits only the ops above
                ok = False
            if not ok:
                return False
        return True


def _parse_selector(selector: str) -> list[tuple[str, _Simple]]:
    """'a > b c' → [(' ', a), ('>', b), (' ', c)] — combinator BEFORE
    each simple selector.  Attribute values may contain spaces, so split
    outside brackets only."""
    parts: list[tuple[str, str]] = []
    buf, comb, depth = [], " ", 0
    i = 0
    s = selector.strip()
    while i < len(s):
        ch = s[i]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        if depth == 0 and ch in " >\t":
            if buf:
                parts.append((comb, "".join(buf)))
                buf, comb = [], " "
            if ch == ">":
                comb = ">"
            else:
                j = i
                while j < len(s) and s[j] in " \t":
                    j += 1
                if j < len(s) and s[j] == ">":
                    comb = ">"
                    i = j
        else:
            buf.append(ch)
        i += 1
    if buf:
        parts.append((comb, "".join(buf)))
    if not parts:
        raise ValueError(f"empty selector: {selector!r}")
    return [(c, _Simple(p)) for c, p in parts]


def _chain_matches(node: Node, chain: list[tuple[str, _Simple]]) -> bool:
    if not chain[-1][1].matches(node):
        return False
    cur = node
    for idx in range(len(chain) - 1, 0, -1):
        comb = chain[idx][0]
        target = chain[idx - 1][1]
        anc = cur.parent
        if comb == ">":
            if anc is None or anc.tag == "#document" or not target.matches(anc):
                return False
            cur = anc
        else:
            while anc is not None and anc.tag != "#document":
                if target.matches(anc):
                    break
                anc = anc.parent
            else:
                return False
            if anc is None or anc.tag == "#document":
                return False
            cur = anc
    return True


def select_all(root: Node, selector: str) -> list[Node]:
    """All elements matching ``selector``, in document order — the
    ``querySelectorAll`` of the engine."""
    chain = _parse_selector(selector)
    out: list[Node] = []
    stack: list[Node | str] = list(reversed(root.children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if _chain_matches(n, chain):
            out.append(n)
        stack.extend(reversed(n.children))
    return out


def select_one(root: Node, selector: str) -> Node | None:
    """First match in document order (``querySelector``)."""
    found = select_all(root, selector)
    return found[0] if found else None
