"""Unit tests for the vectorized politeness gate (robots Disallow prefixes,
Crawl-delay + Request-rate token buckets; reference downloader.py:24-44)."""

import pyarrow as pa

from simple_crawler_ray.functions.robots import RulesIndex
from simple_crawler_ray.stages.politeness import politeness_gate


def _frontier(urls):
    from simple_crawler_ray.functions.urlkit import host_of

    return pa.table(
        {
            "url": pa.array(urls),
            "host": pa.array([host_of(u) for u in urls]),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "parent_url": pa.array([""] * len(urls)),
        }
    )


def _rules(text, host="h.example"):
    return RulesIndex({host: text})


def test_disallow_prefix():
    rules = _rules("User-agent: *\nDisallow: /private\n")
    gate = politeness_gate(
        _frontier(["https://h.example/a", "https://h.example/private/x"]), rules
    )
    assert gate.allowed["url"].to_pylist() == ["https://h.example/a"]
    assert gate.disallowed["url"].to_pylist() == ["https://h.example/private/x"]


def test_no_robots_allows_all():
    rules = RulesIndex({})
    gate = politeness_gate(_frontier(["https://x.example/a"]), rules)
    assert gate.allowed.num_rows == 1


def test_crawl_delay_budget():
    rules = _rules("User-agent: *\nCrawl-delay: 2\n")
    urls = [f"https://h.example/p{i}" for i in range(10)]
    gate = politeness_gate(_frontier(urls), rules, round_seconds=6.0)
    assert gate.allowed.num_rows == 3  # 6 // 2
    assert gate.deferred.num_rows == 7
    # earlier frontier rows win the budget
    assert gate.allowed["url"].to_pylist() == urls[:3]


def test_request_rate_budget():
    rules = _rules("User-agent: *\nRequest-rate: 2/10\n")
    urls = [f"https://h.example/p{i}" for i in range(10)]
    gate = politeness_gate(_frontier(urls), rules, round_seconds=20.0)
    assert gate.allowed.num_rows == 4  # 2 per 10s * 20s
    assert gate.deferred.num_rows == 6


def test_rate_and_delay_take_minimum():
    rules = _rules("User-agent: *\nCrawl-delay: 1\nRequest-rate: 1/10\n")
    urls = [f"https://h.example/p{i}" for i in range(10)]
    gate = politeness_gate(_frontier(urls), rules, round_seconds=10.0)
    assert gate.allowed.num_rows == 1  # rate (1/10s) binds below delay (10)


def test_complex_robots_falls_back_exact():
    # Allow lines disable the vectorized prefix path → RobotFileParser
    rules = _rules("User-agent: *\nAllow: /public\nDisallow: /\n")
    gate = politeness_gate(
        _frontier(["https://h.example/public/x", "https://h.example/other"]), rules
    )
    assert gate.allowed["url"].to_pylist() == ["https://h.example/public/x"]
    assert gate.disallowed["url"].to_pylist() == ["https://h.example/other"]


def test_empty_frontier():
    gate = politeness_gate(_frontier([]), RulesIndex({}))
    assert gate.allowed.num_rows == 0


def test_backoff_decays_budget():
    """ST7 parity: the 429-equivalent backoff factor divides the host's
    effective per-round budget (reference check_every ×1.5 on HTTP 429,
    main.py:80-84)."""
    rules = _rules("User-agent: *\nCrawl-delay: 1\n")
    urls = [f"https://h.example/p{i}" for i in range(20)]
    base = politeness_gate(_frontier(urls), rules, round_seconds=9.0)
    assert base.allowed.num_rows == 9
    once = politeness_gate(
        _frontier(urls), rules, round_seconds=9.0, backoff={"h.example": 1.5}
    )
    assert once.allowed.num_rows == 6  # 9 / 1.5
    twice = politeness_gate(
        _frontier(urls), rules, round_seconds=9.0, backoff={"h.example": 2.25}
    )
    assert twice.allowed.num_rows == 4  # int(9 / 2.25)
    # a different host's backoff never leaks
    other = politeness_gate(
        _frontier(urls), rules, round_seconds=9.0, backoff={"x.example": 4.0}
    )
    assert other.allowed.num_rows == 9


def test_distributed_gate_matches_driver(ray_session):
    """The Ray groupby(host) gate stage must split exactly like the
    driver-side gate, including within-host budget winners and row
    order."""
    from simple_crawler_ray.stages.politeness import politeness_gate_distributed

    rules = RulesIndex(
        {
            "a.example": "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n",
            "b.example": "User-agent: *\nRequest-rate: 1/5\n",
        }
    )
    urls = []
    for i in range(40):
        h = "a.example" if i % 3 else "b.example"
        path = "/private/x" if i % 7 == 0 else f"/p{i}"
        urls.append(f"https://{h}{path}")
    frontier = _frontier(urls)
    backoff = {"a.example": 1.5}
    drv = politeness_gate(frontier, rules, round_seconds=10.0, backoff=backoff)
    dist = politeness_gate_distributed(
        frontier, rules, round_seconds=10.0, backoff=backoff
    )
    for side in ("allowed", "disallowed", "deferred"):
        assert getattr(dist, side).equals(getattr(drv, side)), side


def test_distributed_gate_crawl_outputs_invariant(
    ray_session, small_corpus_dir, tmp_path
):
    """Forcing every round through the distributed gate stage must leave
    crawl outputs identical to the driver-gate crawl."""
    from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl

    def run(tag, threshold):
        return crawl(
            CrawlConfig(
                corpus_dir=small_corpus_dir,
                out_dir=str(tmp_path / tag),
                seed_urls=["https://host0.example"],
                max_pages=None,
                num_seen_shards=2,
                num_buckets=8,
                round_seconds=4.0,
                gate_distributed_threshold=threshold,
            )
        )

    drv = run("drv", 1 << 30)
    dist = run("dist", 0)  # every non-empty frontier goes distributed
    assert dist.order.equals(drv.order)
    assert dist.seen.equals(drv.seen)


def test_backoff_crawl_outputs_invariant(ray_session, small_corpus_dir, tmp_path):
    """Backoff decay changes round composition only — final crawl outputs
    are identical with it on or off."""
    from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl

    def run(tag, backoff_enabled):
        return crawl(
            CrawlConfig(
                corpus_dir=small_corpus_dir,
                out_dir=str(tmp_path / tag),
                seed_urls=["https://host0.example"],
                max_pages=None,
                num_seen_shards=2,
                num_buckets=8,
                round_seconds=4.0,
                backoff_enabled=backoff_enabled,
            )
        )

    on = run("on", True)
    off = run("off", False)
    assert on.order.equals(off.order)
    assert on.seen.equals(off.seen)
    # backoff genuinely bites: decayed budgets stretch the crawl
    assert on.rounds >= off.rounds
