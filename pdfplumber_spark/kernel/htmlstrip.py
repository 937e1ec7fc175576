"""From-scratch DOM boilerplate stripper (stdlib html.parser only).

The HTML analogue of the PDF extraction kernel, per the north rule: main
content extracted via text-density + tag heuristics (in the spirit of
Kohlschütter et al., "Boilerplate Detection Using Shallow Text Features",
WSDM 2010 — public method, re-implemented from scratch).

The kernel is deterministic and self-contained: the "reference" output for
an HTML url IS this kernel run single-process; the Spark path must produce
byte-identical text (structural identity — same code, Arrow-batched).

Algorithm:
1. Parse into a flat block sequence: block-level tags open/close blocks;
   ``script/style/noscript/template/svg`` content is dropped entirely;
   text inside ``nav/header/footer/aside/form/menu`` (or elements whose
   id/class matches a boilerplate pattern) is tagged *chrome*.
2. Per block compute: text length, link-text length (chars inside <a>),
   word count.
3. Keep a block iff: not chrome, word count >= 3, and link density
   (link chars / chars) <= 0.5; single-block documents are kept as-is.
4. Join kept blocks with a single "\n"; whitespace inside a block is
   collapsed to single spaces and trimmed.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "td", "th", "dd", "dt",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "figcaption",
    "br", "tr", "table", "ul", "ol", "dl", "body",
}
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe", "head"}
CHROME_TAGS = {"nav", "header", "footer", "aside", "form", "menu", "button"}
CHROME_PATTERNS = (
    "nav", "menu", "footer", "header", "sidebar", "banner", "ad-", "-ad",
    "advert", "promo", "cookie", "popup", "social", "share", "comment",
    "related", "breadcrumb",
)

MIN_WORDS = 3
MAX_LINK_DENSITY = 0.5


class _Block:
    __slots__ = ("parts", "link_chars", "chrome_depth")

    def __init__(self, chrome: bool):
        self.parts: List[str] = []
        self.link_chars = 0
        self.chrome_depth = 1 if chrome else 0


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[tuple] = []  # (text, link_chars, is_chrome)
        self._parts: List[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._chrome_depth = 0
        self._link_depth = 0
        self._block_was_chrome = False
        # per-tag count of opens that incremented chrome (so the matching
        # close decrements — attr-based chrome can sit on any tag)
        self._chrome_opens: dict = {}

    @staticmethod
    def _attrs_look_chrome(attrs) -> bool:
        for k, v in attrs:
            if k in ("id", "class", "role") and v:
                lv = v.lower()
                if any(p in lv for p in CHROME_PATTERNS):
                    return True
        return False

    def _flush(self) -> None:
        raw = "".join(self._parts)
        text = " ".join(raw.split())
        if text:
            self.blocks.append((text, self._link_chars, self._block_was_chrome))
        self._parts = []
        self._link_chars = 0
        self._block_was_chrome = self._chrome_depth > 0

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        chrome = tag in CHROME_TAGS or self._attrs_look_chrome(attrs)
        if tag in BLOCK_TAGS or chrome:
            self._flush()
        if chrome:
            self._chrome_depth += 1
            self._chrome_opens[tag] = self._chrome_opens.get(tag, 0) + 1
            self._block_was_chrome = True
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        closes_chrome = self._chrome_opens.get(tag, 0) > 0
        if closes_chrome or tag in BLOCK_TAGS:
            self._flush()
        if closes_chrome:
            self._chrome_opens[tag] -= 1
            self._chrome_depth = max(0, self._chrome_depth - 1)
            self._block_was_chrome = self._chrome_depth > 0
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._chrome_depth:
            self._block_was_chrome = True
        self._parts.append(data)
        if self._link_depth:
            self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_main_text(html: str) -> str:
    """Main-content text of an HTML document (deterministic kernel)."""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed markup: fall back to whatever blocks parsed so far
        p._flush()
    blocks = p.blocks
    if not blocks:
        return ""
    content = []
    for text, link_chars, chrome in blocks:
        if chrome:
            continue
        words = text.split()
        if len(words) < MIN_WORDS:
            continue
        if len(text) > 0 and (link_chars / len(text)) > MAX_LINK_DENSITY:
            continue
        content.append(text)
    if not content:
        # fall back: longest non-chrome block, else longest block
        cands = [t for t, _, ch in blocks if not ch] or [t for t, _, _ in blocks]
        return max(cands, key=len)
    return "\n".join(content)


def extract_main_text_bytes(payload: bytes) -> str:
    """Decode (utf-8 with latin-1 fallback) then extract."""
    try:
        html = payload.decode("utf-8")
    except UnicodeDecodeError:
        html = payload.decode("latin-1")
    return extract_main_text(html)
