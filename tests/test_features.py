"""CLI, run events, sitemap JSON sink, retries, hot-host salting,
fair-frontier shuffle — SURVEY §2 coverage (S1, S6, K4, O4, §4 skew)."""

import json
import os

import pyarrow as pa
import pytest

from simple_crawler_ray.cli import build_parser
from simple_crawler_ray.functions.urlkit import shard_of
from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl, prioritize_frontier


def test_cli_parser_reference_surface():
    # reference cli.py:10-25 surface: url positional + max-pages + retries
    args = build_parser().parse_args(
        ["https://host0.example", "--corpus", "/c", "--out", "/o",
         "--max-pages", "10", "--retries", "2"]
    )
    assert args.url == ["https://host0.example"]
    assert args.max_pages == 10
    assert args.retries == 2


def test_hot_host_salting_spreads_and_stays_deterministic():
    salt = {"hot.example": 4}
    urls = [f"https://hot.example/p{i}" for i in range(200)]
    shards = {shard_of(u, 8, salt) for u in urls}
    assert len(shards) == 4  # spread over k shards
    # deterministic per url
    assert [shard_of(u, 8, salt) for u in urls] == [
        shard_of(u, 8, salt) for u in urls
    ]
    # unsalted host stays on one shard
    cold = {shard_of(f"https://cold.example/p{i}", 8, salt) for i in range(50)}
    assert len(cold) == 1


def test_salted_seen_set_still_exact(ray_session):
    from simple_crawler_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet(num_shards=4, salt={"hot.example": 3})
    urls = [f"https://hot.example/p{i}" for i in range(100)]
    assert all(seen.admit(urls))
    assert not any(seen.admit(urls))
    seen.shutdown()


def test_sitemap_fallback_without_robots():
    """A robots-less host still gets the /sitemap-index.xml → /sitemap.xml
    fallback chain (reference GETs robots unconditionally and a 404 body
    parses as empty robots; mapper.py:138-153, downloader.py:36-44)."""
    from simple_crawler_ray.functions.robots import RulesIndex
    from simple_crawler_ray.pipelines.serial_oracle import seed_frontier

    base = "https://bare.example"
    corpus = {
        f"{base}/sitemap.xml": (
            '<?xml version="1.0"?>\n<urlset>\n'
            f"  <url><loc>{base}/</loc><priority>0.9</priority></url>\n"
            "</urlset>\n"
        ),
        f"{base}/": "<html><body>root</body></html>",
    }
    rules = RulesIndex({})  # no robots anywhere
    seeds, sm = seed_frontier([base], corpus, rules, use_sitemap=True)
    assert seeds == [f"{base}/"]  # sitemap loc, not the bare seed
    assert sm.details and sm.details[0]["status"] == "Success"

    # and with NO sitemap either, the bare seed is the fallback
    seeds2, _ = seed_frontier(["https://none.example"], {}, rules, True)
    assert seeds2 == ["https://none.example"]


def test_run_events_and_sitemap_json(ray_session, small_corpus_dir, tmp_path):
    out = str(tmp_path / "run")
    crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=out,
            seed_urls=["https://host0.example"],
            max_pages=5,
            num_seen_shards=2,
            num_buckets=8,
            run_id="evt",
        )
    )
    with open(os.path.join(out, "run_manifest.json")) as f:
        events = json.load(f)
    assert [e["event"] for e in events] == ["start", "complete"]
    assert events[0]["run_id"] == "evt"
    with open(os.path.join(out, "sitemap_indexes.json")) as f:
        indexes = json.load(f)
    # index doc maps to its member sitemaps (mapper.py:122-123 shape)
    assert any(k.endswith("/sitemap-index.xml") for k in indexes)


def test_listener_hooks(ray_session, small_corpus_dir, tmp_path):
    """Pluggable listener surface (reference DatabaseManager.add_listener,
    data.py:103-109): run/round events fire in order; a raising listener
    never fails the crawl."""
    events = []

    def listener(event, payload):
        events.append((event, payload))

    def broken(event, payload):
        raise RuntimeError("listener bug")

    res = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=str(tmp_path / "lst"),
            seed_urls=["https://host0.example"],
            max_pages=10,
            num_seen_shards=2,
            num_buckets=8,
            listeners=[listener, broken],
        )
    )
    kinds = [e for e, _ in events]
    assert kinds[0] == "run_start"
    assert kinds[-1] == "run_complete"
    assert kinds.count("round_complete") == res.rounds
    assert events[0][1]["run_id"] == "run0"
    assert events[-1][1]["visited"] == res.order.num_rows


def test_retries_defer_errors_but_outputs_invariant(
    ray_session, small_corpus_dir, tmp_path
):
    base = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=str(tmp_path / "r1"),
            seed_urls=["https://host0.example"],
            max_pages=None,
            num_seen_shards=2,
            num_buckets=8,
            retries=1,
        )
    )
    retried = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=str(tmp_path / "r3"),
            seed_urls=["https://host0.example"],
            max_pages=None,
            num_seen_shards=2,
            num_buckets=8,
            retries=3,
        )
    )
    assert retried.order.equals(base.order)
    assert retried.seen.equals(base.seen)
    assert retried.rounds >= base.rounds  # retries add rounds, not rows


def test_fair_frontier_round_robin(ray_session):
    rows = [(f"https://h{h}.example/p{i}", h) for h in range(3) for i in range(4)]
    frontier = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "host": pa.array([f"h{r[1]}.example" for r in rows]),
            "depth": pa.array([1] * len(rows), pa.int32()),
            "parent_url": pa.array([""] * len(rows)),
        }
    )
    out = prioritize_frontier(frontier)
    hosts = out["host"].to_pylist()
    # first len(hosts-distinct) rows cover every host (round-robin fairness)
    assert set(hosts[:3]) == {"h0.example", "h1.example", "h2.example"}
    assert sorted(out["url"].to_pylist()) == sorted(frontier["url"].to_pylist())


def test_fair_frontier_crawl_outputs_invariant(
    ray_session, small_corpus_dir, tmp_path
):
    a = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=str(tmp_path / "a"),
            seed_urls=["https://host0.example"],
            max_pages=None,
            num_seen_shards=2,
            num_buckets=8,
        )
    )
    b = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=str(tmp_path / "b"),
            seed_urls=["https://host0.example"],
            max_pages=None,
            num_seen_shards=2,
            num_buckets=8,
            fair_frontier=True,
            small_round_threshold=1,  # force the shuffle path
        )
    )
    assert a.order.equals(b.order)
    assert a.seen.equals(b.seen)
