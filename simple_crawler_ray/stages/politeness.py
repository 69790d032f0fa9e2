"""Per-host robots + politeness gate (vectorized).

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
metric, never dropped). Within a host, earlier frontier rows win the budget
(admission order → recency-consistent scheduling). Deferral is pure
scheduling — it changes round composition, never the final crawl graph, so
ordering parity (replay) is unaffected.

Implementation: pandas-vectorized per host group. Hosts with simple robots
(only `Disallow: <prefix>` under `User-agent: *` — the overwhelmingly common
shape) take the exact vectorized prefix path; complex robots fall back to
per-URL ``RobotFileParser.can_fetch`` (which costs ~30 µs/url and would
serialize the driver on wide frontiers).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.robots import RulesIndex

__all__ = ["GateResult", "politeness_gate"]


@dataclass
class GateResult:
    allowed: pa.Table
    disallowed: pa.Table
    deferred: pa.Table


def _path_of(url: str, host: str) -> str:
    """path+query part after the host (what RobotFileParser matches on)."""
    i = url.find("://")
    j = url.find("/", i + 3) if i >= 0 else -1
    return url[j:] if j >= 0 else "/"


def politeness_gate(
    frontier: pa.Table,
    rules: RulesIndex,
    round_seconds: float | None = None,
) -> GateResult:
    """Split a round's frontier (needs ``url`` and ``host`` columns) into
    allowed / disallowed / deferred (see module docstring)."""
    n = frontier.num_rows
    if n == 0:
        return GateResult(frontier, frontier.slice(0, 0), frontier.slice(0, 0))

    urls = pd.Series(frontier["url"].to_pylist())
    hosts = pd.Series(frontier["host"].to_pylist())
    disallowed = np.zeros(n, dtype=bool)
    deferred = np.zeros(n, dtype=bool)

    for host, idx in hosts.groupby(hosts).groups.items():
        host_rules = rules.for_host(host)
        hurls = urls[idx]
        dmask = np.zeros(len(idx), dtype=bool)
        prefixes = host_rules.simple_disallow_prefixes
        if host_rules.robots_text is None:
            pass  # no robots → allow all
        elif prefixes is not None:
            if prefixes:
                paths = hurls.map(lambda u, h=host: _path_of(u, h))
                for p in prefixes:
                    dmask |= paths.str.startswith(p).to_numpy()
        else:  # complex robots: exact per-URL fallback
            dmask = ~hurls.map(host_rules.can_fetch).to_numpy(dtype=bool)
        disallowed[idx] = dmask

        if round_seconds is not None and (
            host_rules.crawl_delay or host_rules.request_rate
        ):
            budget = None
            if host_rules.crawl_delay:
                budget = max(1, int(round_seconds // host_rules.crawl_delay))
            if host_rules.request_rate:
                req, per = host_rules.request_rate
                rate_budget = max(1, int(req * round_seconds / max(per, 1e-9)))
                budget = rate_budget if budget is None else min(budget, rate_budget)
            ok = ~dmask
            over_budget = ok.cumsum() > budget
            deferred[idx] = ok & over_budget

    allowed_mask = ~(disallowed | deferred)
    return GateResult(
        allowed=frontier.filter(pa.array(allowed_mask)),
        disallowed=frontier.filter(pa.array(disallowed)),
        deferred=frontier.filter(pa.array(deferred)),
    )
