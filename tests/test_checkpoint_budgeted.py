"""Resume of a BUDGETED crawl (string-replay path) + edge cases."""

import pyarrow.parquet as pq

from simple_crawler_ray.functions.robots import RulesIndex
from simple_crawler_ray.functions.urlkit import host_of
from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl
from simple_crawler_ray.pipelines.serial_oracle import serial_crawl


def _cfg(small_corpus_dir, out_dir, **kw):
    kw.setdefault("seed_urls", ["https://host0.example"])
    return CrawlConfig(
        corpus_dir=small_corpus_dir,
        out_dir=out_dir,
        num_seen_shards=2,
        num_buckets=8,
        **kw,
    )


def test_budgeted_resume_matches_fresh(ray_session, small_corpus_dir, tmp_path):
    budget = 40
    fresh = crawl(_cfg(small_corpus_dir, str(tmp_path / "fresh"), max_pages=budget))
    out = str(tmp_path / "res")
    crawl(_cfg(small_corpus_dir, out, max_pages=budget, max_rounds=2))
    resumed = crawl(_cfg(small_corpus_dir, out, max_pages=budget, resume=True))
    assert resumed.order.equals(fresh.order)
    assert resumed.seen.equals(fresh.seen)


def test_budgeted_truncated_by_max_rounds(ray_session, small_corpus_dir, tmp_path):
    """A budgeted crawl cut off by max_rounds must emit the PARTIAL replay
    order (a prefix of the fresh run's order), not empty outputs, and must
    not log a `complete` run event."""
    import json

    budget = 40
    fresh = crawl(_cfg(small_corpus_dir, str(tmp_path / "full"), max_pages=budget))
    out = str(tmp_path / "trunc")
    part = crawl(_cfg(small_corpus_dir, out, max_pages=budget, max_rounds=2))
    assert 0 < part.order.num_rows <= fresh.order.num_rows
    assert part.order.equals(fresh.order.slice(0, part.order.num_rows))
    assert part.seen["url"].to_pylist() == fresh.seen["url"].to_pylist()[: part.seen.num_rows]
    with open(f"{out}/run_manifest.json") as f:
        events = [e["event"] for e in json.load(f)]
    assert events[-1] == "truncated"
    assert part.metrics["totals"]["truncated"] is True


def test_budget_larger_than_reachable(ray_session, small_corpus_dir, tmp_path):
    """A budget above the reachable component behaves like exhaustion."""
    t = pq.read_table(f"{small_corpus_dir}/pages.parquet")
    corpus = {u: h.decode() for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())}
    rules = RulesIndex(
        {host_of(u): h for u, h in corpus.items() if u.endswith("/robots.txt")}
    )
    golden = serial_crawl(corpus, ["https://host0.example"], max_pages=10**6, rules=rules)
    res = crawl(_cfg(small_corpus_dir, str(tmp_path / "big"), max_pages=10**6))
    assert res.order.num_rows == len(golden.order)
    assert res.seen["url"].to_pylist() == golden.seen


def test_adjacency_via_disk_matches_ram(ray_session, small_corpus_dir, tmp_path):
    """The 10^10-scale adjacency path (emit_links=False + post-loop
    parallel disk re-read) must produce identical outputs to the default
    RAM-accumulated path."""
    ram = crawl(_cfg(small_corpus_dir, str(tmp_path / "ram"), max_pages=None))
    disk = crawl(
        _cfg(
            small_corpus_dir,
            str(tmp_path / "disk"),
            max_pages=None,
            adjacency_via_disk=True,
        )
    )
    assert disk.order.equals(ram.order)
    assert disk.seen.equals(ram.seen)


def test_empty_seed_list(ray_session, small_corpus_dir, tmp_path):
    res = crawl(_cfg(small_corpus_dir, str(tmp_path / "empty"), seed_urls=[]))
    assert res.order.num_rows == 0
    assert res.seen.num_rows == 0


def test_seed_host_without_robots(ray_session, small_corpus_dir, tmp_path):
    """Unknown host: no robots → no sitemap → bare-seed fallback →
    single ERROR visit (reference fallback chain, main.py:26-33)."""
    res = crawl(
        _cfg(
            small_corpus_dir,
            str(tmp_path / "nohost"),
            seed_urls=["https://nosuch.example"],
            max_pages=5,
        )
    )
    assert res.order.num_rows == 1
    assert res.order["crawl_status"].to_pylist() == [-2]
