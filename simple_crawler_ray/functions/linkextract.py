"""HTML link + visible-text extraction (pure functions; used inside
``map_batches`` UDFs, in the serial golden oracle, and in the corpus
generator, so all three agree byte-for-byte).

Reference parity (simple_crawler/parser.py:22-41):
- anchors: every ``<a>`` tag carrying an ``href`` attribute, in document
  order (bs4 ``find_all("a", href=True)``).
- absolutization: ``urljoin(page_url, href)`` (parser.py:32-33).
- same-domain filter: ``urlparse(abs).netloc == urlparse(page_url).netloc``
  (parser.py:38) — this also drops ``javascript:`` etc. hrefs
  (reference tests/test_parser.py:104-110).

Semantics decisions (documented per SURVEY §2.10 — the reference's intended,
unit-tested behavior, not its broken paths):
- bs4 is not available in this environment; we use the stdlib
  ``html.parser.HTMLParser``, which agrees with bs4's ``html.parser``
  builder on well-formed HTML (all corpus HTML is self-generated and
  well-formed). The golden oracle uses THIS module, so the byte-identical
  invariant is internally consistent.
- ``linked_urls`` is the first-occurrence document-order unique list (the
  reference returns a ``set`` but admits links to the frontier per-tag in
  document order via SADD-gated ``request_download``, parser.py:40 +
  cache.py:91-97 — document order IS the frontier admission order).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

__all__ = ["extract_hrefs", "extract_links", "extract_text", "extract_page"]

_WS_RE = re.compile(r"\s+")


class _AnchorCollector(HTMLParser):
    """Collect href attribute values of <a> tags in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: D102
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break


class _TextCollector(HTMLParser):
    """Collect visible text (everything outside <script>/<style>)."""

    _SKIP = {"script", "style"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: D102
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:  # noqa: D102
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:  # noqa: D102
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


def extract_hrefs(html: str) -> list[str]:
    """All raw href values of ``<a href=...>`` tags in document order."""
    p = _AnchorCollector()
    p.feed(html)
    p.close()
    return p.hrefs


def extract_links(page_url: str, html: str) -> list[str]:
    """Same-domain absolutized outlinks, first-occurrence document order.

    Mirrors reference parser.py:22-41 (see module docstring). Returns ``[]``
    on any parse/urljoin error, matching the reference's error path
    (parser.py:34-35 returns an empty set).
    """
    try:
        page_netloc = urlparse(page_url).netloc
        seen: set[str] = set()
        out: list[str] = []
        for href in extract_hrefs(html):
            absolute = urljoin(page_url, href)
            if urlparse(absolute).netloc == page_netloc and absolute not in seen:
                seen.add(absolute)
                out.append(absolute)
        return out
    except Exception:
        return []


class _PageCollector(HTMLParser):
    """Single-pass collector: anchor hrefs (document order) + visible text
    (outside script/style) in one parse — the hot-path fusion of
    _AnchorCollector + _TextCollector (HTML parsing dominates the crawl's
    compute; two passes would double it)."""

    _SKIP = {"script", "style"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: D102
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break
        elif tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:  # noqa: D102
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:  # noqa: D102
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


def _netloc_fast(absolute: str) -> str | None:
    """netloc of an absolute http(s) URL without urlparse (hot path);
    None → caller falls back to urlparse. Identical to urlparse().netloc
    for scheme://netloc[/path][?q][#f] shapes."""
    if absolute.startswith("https://"):
        rest = absolute[8:]
    elif absolute.startswith("http://"):
        rest = absolute[7:]
    else:
        return None
    for i, ch in enumerate(rest):
        if ch in "/?#":
            return rest[:i]
    return rest


def extract_page(page_url: str, html: str) -> tuple[str, list[str]]:
    """(text, same-domain links) in ONE parse; byte-identical to
    (extract_text(html), extract_links(page_url, html)).

    Hot-path fast lanes (urljoin+urlparse cost ~5 µs/href × millions of
    links): absolute http(s) hrefs pass through unchanged and root-relative
    hrefs concatenate scheme://netloc directly — both exactly what urljoin
    produces for those shapes; anything else falls back to urljoin.
    """
    p = _PageCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return _WS_RE.sub(" ", "".join(p.chunks)).strip(), []
    text = _WS_RE.sub(" ", "".join(p.chunks)).strip()
    try:
        parsed = urlparse(page_url)
        page_netloc = parsed.netloc
        base_prefix = f"{parsed.scheme}://{page_netloc}"
        seen: set[str] = set()
        links: list[str] = []
        for href in p.hrefs:
            # fast lanes bypass urljoin only for shapes it passes through
            # verbatim; hrefs carrying "?"/"#" (urljoin drops EMPTY query/
            # fragment markers), "/." (urljoin removes dot segments) or
            # \t\r\n (urllib strips unsafe bytes) take the exact slow path
            plain = not any(c in href for c in "?#\t\r\n") and "/." not in href
            if plain and href.startswith("/") and not href.startswith("//"):
                absolute = base_prefix + href
                netloc = page_netloc
            else:
                netloc = _netloc_fast(href) if plain else None
                if netloc is not None:
                    absolute = href
                else:
                    absolute = urljoin(page_url, href)
                    netloc = urlparse(absolute).netloc
            if netloc == page_netloc and absolute not in seen:
                seen.add(absolute)
                links.append(absolute)
    except Exception:
        links = []
    return text, links


def extract_text(html: str) -> str:
    """Deterministic visible-text extraction: text nodes outside
    script/style, whitespace collapsed to single spaces, stripped.

    This function defines the byte-identical-text-per-url invariant
    (BASELINE.json input_hint): the corpus generator's ``text`` column, the
    Ray extraction stage, and the serial golden oracle all call it.
    """
    p = _TextCollector()
    p.feed(html)
    p.close()
    return _WS_RE.sub(" ", "".join(p.chunks)).strip()
