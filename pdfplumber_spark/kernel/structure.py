"""Document structure tree (Tagged PDF, ISO 32000 §14.7-14.8).

Re-expresses the reference's ``PDFStructTree`` / ``PDFStructElement``
(``/root/reference/pdfplumber/structure.py:101-509``): a recursive element
tree with type / attributes / mcids / children, page scoping, and
``find`` / ``find_all`` / ``all_mcids`` matchers. The Spark-side form is a
JSON string column per document (SURVEY §1.2: Spark has no recursive
StructType), produced by ``tree_to_json``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable, Iterator, List, Optional, Pattern, Union

from .pdfparse import Name, PDFDocument, Ref

MatchType = Union[str, Pattern, Callable]


@dataclass
class StructElement:
    type: str
    attributes: dict = field(default_factory=dict)
    mcids: List[int] = field(default_factory=list)
    children: List["StructElement"] = field(default_factory=list)
    page_number: Optional[int] = None
    lang: Optional[str] = None
    alt: Optional[str] = None
    title: Optional[str] = None

    def __iter__(self) -> Iterator["StructElement"]:
        return iter(self.children)

    def find_all(self, matcher: MatchType) -> Iterator["StructElement"]:
        return _find_all(self.children, matcher)

    def find(self, matcher: MatchType) -> Optional["StructElement"]:
        return next(_find_all(self.children, matcher), None)

    def all_mcids(self):
        """Yield (page_number, mcid) depth-first (structure.py:158-176)."""
        for mcid in self.mcids:
            yield (self.page_number, mcid)
        for child in self.children:
            yield from child.all_mcids()

    def to_dict(self) -> dict:
        out = {"type": self.type}
        if self.lang:
            out["lang"] = self.lang
        if self.alt:
            out["alt"] = self.alt
        if self.title:
            out["title"] = self.title
        if self.attributes:
            out["attributes"] = self.attributes
        if self.page_number is not None:
            out["page_number"] = self.page_number
        if self.mcids:
            out["mcids"] = self.mcids
        if self.children:
            out["children"] = [c.to_dict() for c in self.children]
        return out


def _find_all(elements, matcher: MatchType) -> Iterator[StructElement]:
    """Pre-order depth-first match (structure.py:39-71: deque.popleft +
    extendleft(reversed(children)) — 'Iterate depth-first')."""
    if isinstance(matcher, str):
        match = lambda e: e.type == matcher  # noqa: E731
    elif isinstance(matcher, re.Pattern):
        match = lambda e: bool(matcher.match(e.type))  # noqa: E731
    else:
        match = matcher
    queue = list(elements)
    while queue:
        el = queue.pop(0)
        if match(el):
            yield el
        queue[:0] = el.children


class StructTree:
    """Parsed structure tree; optionally scoped to one page (page-scoped
    trees report ``page_number=None`` per the reference's API,
    tests/test_structure.py:907-933)."""

    def __init__(self, doc: PDFDocument, page_number: Optional[int] = None):
        self.doc = doc
        self._page_scope = page_number
        self._page_of_ref = {}
        for i, spec in enumerate(doc.pages()):
            if spec.get("_ref") is not None:
                self._page_of_ref[spec["_ref"]] = i + 1
        root = doc.resolve(doc.trailer.get("Root")) or {}
        st_root = doc.resolve(root.get("StructTreeRoot"))
        self.children: List[StructElement] = []
        if isinstance(st_root, dict):
            for el in self._parse_kids(st_root.get("K"), None):
                self.children.append(el)
        if page_number is not None:
            self.children = [
                el for el in self.children if _touches_page(el, page_number)
            ]
            _strip_pages(self.children)

    # -- parsing ---------------------------------------------------------
    def _page_num(self, pg) -> Optional[int]:
        if isinstance(pg, Ref):
            return self._page_of_ref.get(pg.num)
        return None

    def _parse_kids(self, k, inherited_page) -> List[StructElement]:
        doc = self.doc
        out: List[StructElement] = []
        if k is None:
            return out
        kids = k if isinstance(k, list) else [k]
        for kid in kids:
            kidr = doc.resolve(kid)
            if isinstance(kidr, dict) and "S" in kidr:
                out.append(self._parse_elem(kidr, inherited_page))
        return out

    def _parse_elem(self, d: dict, inherited_page) -> StructElement:
        doc = self.doc
        page = self._page_num(d.get("Pg")) or inherited_page
        el = StructElement(
            type=str(doc.resolve(d.get("S", ""))),
            page_number=page,
        )
        for key, attr in (("Lang", "lang"), ("Alt", "alt"), ("T", "title")):
            v = doc.resolve(d.get(key))
            if isinstance(v, (bytes, bytearray)):
                try:
                    v = bytes(v).decode("utf-8")
                except UnicodeDecodeError:
                    v = bytes(v).decode("latin-1")
            if v is not None:
                setattr(el, attr, str(v))
        # /A attributes: dict or list of dicts (+ revision ints, skipped)
        a = doc.resolve(d.get("A"))
        attrs = {}
        for part in a if isinstance(a, list) else ([a] if a else []):
            part = doc.resolve(part)
            if isinstance(part, dict):
                for ak, av in part.items():
                    av = doc.resolve(av)
                    attrs[str(ak)] = (
                        str(av) if isinstance(av, Name) else av
                    )
        if attrs:
            el.attributes = attrs
        # children / content items
        k = doc.resolve(d.get("K"))
        items = k if isinstance(k, list) else ([] if k is None else [k])
        for item in items:
            item_r = doc.resolve(item)
            if isinstance(item_r, int):
                el.mcids.append(item_r)
            elif isinstance(item_r, dict):
                t = str(doc.resolve(item_r.get("Type", "")))
                if t == "MCR" or "MCID" in item_r:
                    mcid = doc.resolve(item_r.get("MCID"))
                    if isinstance(mcid, int):
                        el.mcids.append(mcid)
                elif t == "OBJR":
                    continue
                elif "S" in item_r:
                    el.children.append(self._parse_elem(item_r, page))
        return el

    # -- API ---------------------------------------------------------------
    def __iter__(self) -> Iterator[StructElement]:
        return iter(self.children)

    def find_all(self, matcher: MatchType) -> Iterator[StructElement]:
        return _find_all(self.children, matcher)

    def find(self, matcher: MatchType) -> Optional[StructElement]:
        return next(_find_all(self.children, matcher), None)


def _touches_page(el: StructElement, page_number: int) -> bool:
    if el.page_number == page_number and (el.mcids or not el.children):
        return True
    if el.page_number == page_number:
        return True
    return any(_touches_page(c, page_number) for c in el.children)


def _strip_pages(elements: List[StructElement]) -> None:
    for el in elements:
        el.page_number = None
        _strip_pages(el.children)


def tree_to_json(data: bytes, password: str = "") -> str:
    """Document structure tree as a JSON string (the Spark column form)."""
    doc = PDFDocument(data, password=password)
    tree = StructTree(doc)
    return json.dumps([el.to_dict() for el in tree.children])
