"""Deterministic serial reimplementation of the reference crawler's intended
semantics — the GOLDEN ORACLE for conformance tests (SURVEY §2.8, §5).

The reference's actual async interleaving is nondeterministic; its
serial-equivalent spec (what 'matching the reference's crawl ordering' means)
is:

    pop top of LIFO frontier (Redis lpush/lpop, cache.py:86,96)
    → robots gate (default-allow on error, downloader.py:24-34)
    → fetch = corpus lookup (stand-in for requests.get, downloader.py:71)
    → extract links in document order (parser.py:30 find_all order)
    → push each FIRST-SEEN same-domain link LIFO
      (SADD-gated request_download, cache.py:91-97; parser.py:38-40)
    → repeat until frontier empty or completed pages ≥ max_pages
      (completed_pages counter → "exit" stopword, cache.py:53-59)

Semantics decisions (documented per SURVEY §2.10):
- "completed" counts every processed pop — parsed, disallowed, or error —
  because every such URL is closed out of the flow (docs/flow.md:4-15); the
  reference only increments on its failure paths due to the close_url wiring
  bug, which contradicts its own max_pages design intent.
- fetch miss (URL absent from corpus) → crawl_status=ERROR(-2),
  req_status=404; robots-disallowed → DISALLOWED(-1), 403
  (downloader.py:63-67, tests/test_downloader.py:55-71).
- Seeding: sitemap discovery per mapper.py:130-159 (robots → site_maps()[0]
  else /sitemap-index.xml, fallback /sitemap.xml, fallback bare seed URL,
  main.py:26-33).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.linkextract import extract_links, extract_text
from ..functions.robots import RulesIndex
from ..functions.sitemaps import SitemapResult, recurse_sitemap
from ..functions.urlkit import host_of, parse_url
from ..schemas import CrawlStatus

__all__ = ["SerialCrawlResult", "serial_crawl", "seed_frontier"]


@dataclass
class SerialCrawlResult:
    """Golden outputs (FIXTURES.md §3)."""

    # (seq, url, depth, parent_url, req_status, crawl_status)
    order: list[tuple[int, str, int, str, int, int]] = field(default_factory=list)
    seen: list[str] = field(default_factory=list)  # admission order
    extracted: dict[str, tuple[str, list[str]]] = field(default_factory=dict)
    sitemaps: SitemapResult = field(default_factory=SitemapResult)


def seed_frontier(
    seed_urls: list[str],
    corpus: dict[str, str],
    rules: RulesIndex,
    use_sitemap: bool = True,
) -> tuple[list[str], SitemapResult]:
    """Sitemap-first seeding with the reference's fallback chain
    (mapper.py:130-159 → main.py:26-33). Returns (admitted seed list in
    admission order, sitemap metadata)."""
    sm = SitemapResult()
    admitted: list[str] = []
    for seed_url in seed_urls:
        locs: list[str] = []
        if use_sitemap:
            scheme, netloc, _ = parse_url(seed_url)
            base = f"{scheme}://{netloc}"
            host_rules = rules.for_host(netloc)
            # the fallback chain runs even with NO robots.txt: the reference
            # GETs robots unconditionally (a 404 body parses as empty robots
            # → no Sitemap: entries) and still tries /sitemap-index.xml then
            # /sitemap.xml (mapper.py:138-153, downloader.py:36-44)
            sitemaps = (
                list(host_rules.sitemaps)
                if host_rules.robots_text is not None
                else []
            )
            source = sitemaps[0] if sitemaps else f"{base}/sitemap-index.xml"
            for candidate in (source, f"{base}/sitemap.xml"):
                contents = corpus.get(candidate)
                if contents is None:
                    continue
                before = len(sm.admitted)
                recurse_sitemap(candidate, contents, corpus.get, sm, index="root")
                locs = sm.admitted[before:]
                break
        admitted.extend(locs if locs else [seed_url])
    return admitted, sm


def serial_crawl(
    corpus: dict[str, str],
    seed_urls: list[str],
    max_pages: int,
    rules: RulesIndex,
    use_sitemap: bool = True,
) -> SerialCrawlResult:
    """Run the serial-equivalent reference crawl over an in-memory corpus
    (url → decoded html/text). This is O(visited) and used only on small
    fixtures; the distributed engine in pipelines/crawl.py must match it."""
    res = SerialCrawlResult()
    seeds, res.sitemaps = seed_frontier(seed_urls, corpus, rules, use_sitemap)

    seen: set[str] = set()
    stack: list[tuple[str, int, str]] = []  # (url, depth, parent)

    def request_download(url: str, depth: int, parent: str) -> None:
        # SADD-gated admission, cache.py:91-97
        if url not in seen:
            seen.add(url)
            res.seen.append(url)
            stack.append((url, depth, parent))  # lpush (LIFO head)

    for s in seeds:
        request_download(s, 0, "")

    completed = 0
    seq = 0
    while stack and completed < max_pages:
        url, depth, parent = stack.pop()  # lpop from the LIFO head
        host_rules = rules.for_host(host_of(url))
        if not host_rules.can_fetch(url):
            res.order.append(
                (seq, url, depth, parent, 403, int(CrawlStatus.DISALLOWED))
            )
        else:
            html = corpus.get(url)
            if html is None:
                res.order.append((seq, url, depth, parent, 404, int(CrawlStatus.ERROR)))
            else:
                links = extract_links(url, html)
                res.extracted[url] = (extract_text(html), links)
                # document-order LIFO push of first-seen links (parser.py:30-40)
                for link in links:
                    request_download(link, depth + 1, url)
                res.order.append((seq, url, depth, parent, 200, int(CrawlStatus.PARSED)))
        seq += 1
        completed += 1
    return res
