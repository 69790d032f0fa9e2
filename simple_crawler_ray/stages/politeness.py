"""Per-host robots + politeness gate.

Reference parity: robots Disallow is enforced BEFORE fetch, disallowed →
(403, DISALLOWED) closed row (downloader.py:59-67, tests/test_downloader.py:
55-71); robots parse errors / missing robots default-allow
(downloader.py:33-34). The reference re-fetches robots.txt per URL
(downloader.py:24-34 — SURVEY §2.10); the rebuild parses ONCE per host into
a broadcast RulesIndex.

Token bucket (north_star; reference reads crawl_delay but never enforces it,
downloader.py:36-44): each round models ``round_seconds`` of wall time, so a
host with Crawl-delay d may fetch ``max(1, round_seconds // d)`` pages per
round; the rest are DEFERRED to the next round (counted in the ``deferred``
metric, never dropped). Deferral is pure scheduling — it changes round
composition, never the final crawl graph, so ordering parity (replay) is
unaffected.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..functions.robots import RulesIndex

__all__ = ["GateResult", "politeness_gate"]


@dataclass
class GateResult:
    allowed: pa.Table
    disallowed: pa.Table
    deferred: pa.Table


def politeness_gate(
    frontier: pa.Table,
    rules: RulesIndex,
    round_seconds: float | None = None,
) -> GateResult:
    """Split a round's frontier (needs ``url`` and ``host`` columns) into
    allowed / disallowed / deferred.

    Within a host, earlier frontier rows win the token budget (frontier
    order is the admission order → recency-consistent scheduling).
    """
    urls = frontier["url"].to_pylist()
    hosts = frontier["host"].to_pylist()

    allowed_idx: list[int] = []
    disallowed_idx: list[int] = []
    deferred_idx: list[int] = []
    budget: dict[str, int] = {}

    for i, (url, host) in enumerate(zip(urls, hosts)):
        host_rules = rules.for_host(host)
        if not host_rules.can_fetch(url):
            disallowed_idx.append(i)
            continue
        if round_seconds is not None and host_rules.crawl_delay:
            if host not in budget:
                budget[host] = max(1, int(round_seconds // host_rules.crawl_delay))
            if budget[host] <= 0:
                deferred_idx.append(i)
                continue
            budget[host] -= 1
        allowed_idx.append(i)

    return GateResult(
        allowed=frontier.take(pa.array(allowed_idx, pa.int64())),
        disallowed=frontier.take(pa.array(disallowed_idx, pa.int64())),
        deferred=frontier.take(pa.array(deferred_idx, pa.int64())),
    )
