"""Static-HTML scrape backend over a REAL transport (SRC1 live tier).

The reference scrapes G1 with a headless Chromium because the page
lazy-loads on scroll (scripts/scraper.py:38-56). For any statically-served
page — and for CI — the same extraction contract can run over plain HTTP:
`HttpScraper` fetches with `requests` (present in this container), parses
with the stdlib `html.parser` (no bs4/lxml dependency), and feeds the
resulting DOM into the SAME `extract_headlines` used by the browser path,
through the same `BrowserPage`/`PageElement` protocols. Scrolling is a
no-op on static HTML; every selector tier, link-resolution tier, length
floor and dedup rule is shared code with `sources/scrape.py`.

tests/test_sources.py serves a fixture page from an in-process
http.server and drives this scraper END TO END over a real socket — the
live-transport counterpart to the Playwright stub, in the same spirit as
the embedded-Derby JDBC test.

Selector grammar implemented (the exact forms `G1_SELECTORS` uses):
``tag``, ``.class``, ``[attr]``, and their conjunctions
``tag.class``, ``tag[attr]``, ``.class[attr]`` — presence-only attribute
match, single class, case-insensitive tag.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .scrape import BASE_URL, extract_headlines

# HTML void elements never receive an end tag; treating them as
# self-closing keeps the tree from swallowing siblings.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_SELECTOR_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9]*)?"
    r"(?:\.(?P<cls>[\w-]+))?"
    r"(?:\[(?P<attr>[\w-]+)\])?$"
)


class _Node:
    __slots__ = ("tag", "attrs", "parent", "children", "texts")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[_Node] = []
        self.texts: list[str] = []

    def walk(self):
        for c in self.children:
            yield c
            yield from c.walk()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag.lower(), {k.lower(): v for k, v in attrs}, self._stack[-1])
        self._stack[-1].children.append(node)
        if tag.lower() not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag.lower(), {k.lower(): v for k, v in attrs}, self._stack[-1])
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data.strip():
            self._stack[-1].texts.append(data)


def _matches(node: _Node, selector: str) -> bool:
    m = _SELECTOR_RE.match(selector.strip())
    if not m or not any(m.groupdict().values()):
        return False
    tag, cls, attr = m.group("tag"), m.group("cls"), m.group("attr")
    if tag and node.tag != tag.lower():
        return False
    if cls and cls not in (node.attrs.get("class") or "").split():
        return False
    if attr and attr not in node.attrs:
        return False
    return True


@dataclass
class HtmlElement:
    """PageElement over a parsed node — same three link tiers as the
    browser path (nearest enclosing <a>, first descendant <a>, nearest
    ancestor's data-mrf-link)."""

    node: _Node

    def inner_text(self) -> str | None:
        parts: list[str] = []

        def rec(n: _Node) -> None:
            parts.extend(t.strip() for t in n.texts)
            for c in n.children:
                rec(c)

        rec(self.node)
        text = " ".join(p for p in parts if p)
        return text or None

    def closest_anchor_href(self) -> str | None:
        n: _Node | None = self.node
        while n is not None:
            if n.tag == "a" and n.attrs.get("href"):
                return n.attrs["href"]
            n = n.parent
        return None

    def child_anchor_href(self) -> str | None:
        for d in self.node.walk():
            if d.tag == "a" and d.attrs.get("href"):
                return d.attrs["href"]
        return None

    def parent_data_link(self) -> str | None:
        n = self.node.parent
        while n is not None:
            if n.attrs.get("data-mrf-link"):
                return n.attrs["data-mrf-link"]
            n = n.parent
        return None


@dataclass
class HtmlPage:
    """BrowserPage over static HTML: scroll is a no-op (nothing lazy-loads
    without a JS runtime), selection walks the parsed tree."""

    html: str
    _root: _Node = field(init=False, repr=False)

    def __post_init__(self) -> None:
        builder = _TreeBuilder()
        builder.feed(self.html)
        self._root = builder.root

    def scroll_to_bottom(self) -> None:
        return None

    def query_selector_all(self, selector: str) -> list[HtmlElement]:
        return [HtmlElement(n) for n in self._root.walk() if _matches(n, selector)]


@dataclass
class HttpScraper:
    """Scraper protocol over requests + HtmlPage. Identical downstream
    contract to PlaywrightScraper — `extract_headlines` is shared — so
    jobs built on `scrape_to_dataframe` take either interchangeably."""

    url: str = BASE_URL
    timeout_sec: float = 30.0
    scroll_attempts: int = 0  # static page: scrolling cannot load more

    def _fetch(self) -> str:
        import importlib.util

        if importlib.util.find_spec("requests") is None:  # pragma: no cover
            raise NotImplementedError(
                "STUB: HttpScraper needs the requests package"
            )
        import requests

        resp = requests.get(
            self.url,
            timeout=self.timeout_sec,
            headers={"User-Agent": "airdatapipeline-spark/0.1"},
        )
        resp.raise_for_status()
        return resp.text

    def scrape(self) -> list[dict]:
        page = HtmlPage(self._fetch())
        return extract_headlines(page, scroll_attempts=self.scroll_attempts)
