"""Sitemap XML parsing + recursive seeding.

Reference parity (simple_crawler/mapper.py):
- sitemap-index docs: ALL ``<loc>`` texts (bs4 ``find_all("loc")``,
  mapper.py:57) → recurse into each member.
- urlset docs: only the FIRST ``<url>`` element is processed
  (``soup.find("url")``, mapper.py:70); fields ``SITEMAP_FEILDS =
  ["loc", "priority", "changefreq", "modified"]`` (mapper.py:15). Real
  sitemaps carry ``<lastmod>`` not ``<modified>`` so "modified" is
  faithfully None.
- a successfully parsed urlset admits its (first) ``loc`` to the frontier.
  The reference calls the nonexistent ``crawl_tracker.add_page_to_visit``
  (mapper.py:99; real API is ``request_download``, cache.py:91) — SURVEY
  §2.10; the rebuild uses request_download semantics (the intended path).

bs4/lxml are unavailable; corpus sitemaps are well-formed, namespace-free
XML, parsed with ``xml.etree.ElementTree`` (agrees with bs4 on these docs).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

SITEMAP_FIELDS = ["loc", "priority", "changefreq", "modified"]  # mapper.py:15

__all__ = ["SITEMAP_FIELDS", "SitemapResult", "parse_sitemap_doc", "recurse_sitemap"]


@dataclass
class SitemapResult:
    """Accumulators mirroring SiteMapper.sitemap_indexes / sitemap_details
    (mapper.py:28-30) plus the admitted frontier locs in admission order."""

    indexes: dict[str, list[str]] = field(default_factory=dict)
    details: list[dict] = field(default_factory=list)
    admitted: list[str] = field(default_factory=list)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_doc(xml_text: str) -> tuple[str, ET.Element] | None:
    """Returns ("index"|"urlset", root) or None on parse failure."""
    try:
        root = ET.fromstring(xml_text)
    except Exception:
        return None
    kind = "index" if _localname(root.tag) == "sitemapindex" else "urlset"
    return kind, root


def _process_urlset(cur_url: str, root: ET.Element, index: str | None) -> dict:
    """First-<url>-only field extraction — mapper.py:63-79 (M8)."""
    details: dict = {"source_url": cur_url, "index": index}
    url_el = None
    for el in root.iter():
        if _localname(el.tag) == "url":
            url_el = el
            break
    if url_el is not None:
        details["status"] = "Success"
        for f in SITEMAP_FIELDS:
            child = None
            for el in url_el:
                if _localname(el.tag) == f:
                    child = el
                    break
            details[f] = child.text if child is not None else None
    return details


def recurse_sitemap(
    url: str,
    contents: str,
    fetch: "callable",
    result: SitemapResult,
    index: str | None = None,
) -> None:
    """DFS through the index→sitemap tree — mapper.py:81-104 (M9).

    ``fetch(url) -> str | None`` looks a sitemap document up in the corpus
    (the reference's direct HTTP ``request_page``, mapper.py:36-52).
    """
    parsed = parse_sitemap_doc(contents)
    if parsed is None:
        return
    kind, root = parsed
    if kind == "index":
        locs = [el.text for el in root.iter() if _localname(el.tag) == "loc" and el.text]
        result.indexes.setdefault(url, []).extend(locs)
        for link in locs:
            content = fetch(link)
            if content is None:
                continue
            recurse_sitemap(link, content, fetch, result, index=url)
    else:
        details = _process_urlset(url, root, index)
        result.indexes.setdefault(index, []).append(url)
        result.details.append(details)
        if details.get("status") == "Success" and details.get("loc"):
            result.admitted.append(details["loc"])
