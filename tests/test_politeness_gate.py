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
