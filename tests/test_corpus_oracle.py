"""Corpus generator determinism + serial golden oracle behavior."""

import pyarrow.parquet as pq

from simple_crawler_ray.corpus import CorpusSpec, generate_corpus
from simple_crawler_ray.functions.linkextract import extract_text
from simple_crawler_ray.functions.robots import RulesIndex
from simple_crawler_ray.functions.urlkit import host_of
from simple_crawler_ray.pipelines.serial_oracle import serial_crawl
from simple_crawler_ray.schemas import CrawlStatus


def _load(spec):
    t = generate_corpus(spec)
    corpus = {u: h.decode("utf-8") for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())}
    robots = {}
    for u, h in corpus.items():
        if u.endswith("/robots.txt"):
            robots[host_of(u)] = h
    return t, corpus, RulesIndex(robots)


SPEC = CorpusSpec(n_pages=120, n_hosts=4, branch=4, seed=7)


def test_corpus_deterministic():
    a = generate_corpus(SPEC)
    b = generate_corpus(SPEC)
    assert a.equals(b)


def test_corpus_schema_and_contents(small_corpus_dir):
    t = pq.read_table(f"{small_corpus_dir}/pages.parquet")
    names = t.schema.names
    assert names == ["url", "warc_ts", "html", "text", "lang"]
    urls = set(t["url"].to_pylist())
    assert "https://host0.example/robots.txt" in urls
    assert "https://host0.example/sitemap-index.xml" in urls
    assert "https://host0.example/" in urls


def test_text_column_matches_extractor():
    t, corpus, _ = _load(SPEC)
    for u, html, text in zip(
        t["url"].to_pylist()[:50], t["html"].to_pylist()[:50], t["text"].to_pylist()[:50]
    ):
        if u.endswith((".xml", "robots.txt")):
            continue
        assert extract_text(html.decode("utf-8")) == text


def test_serial_crawl_small_budget():
    _, corpus, rules = _load(SPEC)
    res = serial_crawl(corpus, ["https://host0.example"], max_pages=10, rules=rules)
    assert len(res.order) == 10
    # sitemap seeding admitted [root (sitemap0), /p1 (sitemap1)]; LIFO pops
    # the last-admitted seed first
    assert res.sitemaps.admitted[0] == "https://host0.example/"
    assert res.order[0][1] == res.sitemaps.admitted[-1]
    # sequence numbers are consecutive from 0
    assert [r[0] for r in res.order] == list(range(10))
    # every parsed url has golden extracted text + links
    for seq, url, depth, parent, req, status in res.order:
        if status == int(CrawlStatus.PARSED):
            assert url in res.extracted
            text, links = res.extracted[url]
            assert text == extract_text(corpus[url])


def test_serial_crawl_lifo_order():
    """First expansion pops the LAST document-order link of the root."""
    _, corpus, rules = _load(SPEC)
    res = serial_crawl(corpus, ["https://host0.example"], max_pages=5, rules=rules)
    first_url = res.order[0][1]
    links = res.extracted[first_url][1]
    already = set(res.sitemaps.admitted)
    new_links = [l for l in links if l not in already]
    assert res.order[1][1] == new_links[-1]  # LIFO: last pushed popped first


def test_serial_crawl_disallowed_and_error_paths():
    _, corpus, rules = _load(SPEC)
    res = serial_crawl(corpus, ["https://host0.example"], max_pages=10_000, rules=rules)
    statuses = {s for *_, s in res.order}
    assert int(CrawlStatus.DISALLOWED) in statuses  # /private pages → 403
    assert int(CrawlStatus.ERROR) in statuses  # /dead links → 404
    disallowed = [u for _, u, *_, s in res.order if s == int(CrawlStatus.DISALLOWED)]
    assert all("/private" in u for u in disallowed)
    # disallowed pages are never expanded
    assert all(u not in res.extracted for u in disallowed)


def test_serial_crawl_seen_set_closed_over_visits():
    _, corpus, rules = _load(SPEC)
    res = serial_crawl(corpus, ["https://host0.example"], max_pages=10_000, rules=rules)
    seen = set(res.seen)
    # every visited url was admitted first
    assert {u for _, u, *_ in res.order} <= seen
    # seen = seeds ∪ links of parsed pages
    derived = {res.seen[0]} if res.seen else set()
    derived = set(res.seen[: len(res.seen)])  # admission list is the set
    assert len(res.seen) == len(seen)


def test_serial_crawl_cross_host_never_admitted():
    _, corpus, rules = _load(SPEC)
    res = serial_crawl(corpus, ["https://host1.example"], max_pages=10_000, rules=rules)
    assert all(host_of(u) == "host1.example" for u in res.seen)
