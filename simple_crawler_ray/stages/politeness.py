"""Per-host robots + politeness gate (vectorized), driver and distributed.

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

Backoff decay (ST7; reference multiplies its poll interval ×1.5 after an
HTTP 429, main.py:80-84): the corpus-join fetch cannot produce a live 429,
so the engine's 429-equivalent signal is DEFER PRESSURE — a host that
exceeded its token budget in a round. Each *transition into* deferral
(a new congestion episode) multiplies the host's backoff factor by 1.5,
dividing its effective per-round budget; a host that merely stays
deferred while draining at its decayed rate is not decayed again (that
would be a positive feedback loop driven by the engine's own decay, not
by pressure — round-2 ADVICE), and the factor relaxes one ×1.5 step on
each round the host clears within budget. Scheduling-only: outputs are
invariant (docs/SEMANTICS.md).

Execution: the per-host kernel is shared by two drivers —
``politeness_gate`` runs it on the driver (pandas groupby over the round
frontier; right answer while rounds are ≤ ~100k rows), and
``politeness_gate_distributed`` runs it as a Ray ``groupby("host")``
shuffle + ``map_groups`` stage for 10^10-frontier rounds, returning the
same three tables with original frontier order restored via a carried
``seq`` key. ``gate`` picks by frontier size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.robots import RulesIndex

__all__ = [
    "GateResult",
    "politeness_gate",
    "politeness_gate_distributed",
    "gate",
    "BACKOFF_MULTIPLIER",
]

BACKOFF_MULTIPLIER = 1.5  # reference main.py:80-84 (check_every *= 1.5)


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


def _host_budget(host_rules, round_seconds: float, backoff: float) -> int | None:
    """Per-round fetch budget for one host under the token bucket, scaled
    down by the host's 429-equivalent backoff factor."""
    budget = None
    if host_rules.crawl_delay:
        budget = max(1, int(round_seconds // host_rules.crawl_delay))
    if host_rules.request_rate:
        req, per = host_rules.request_rate
        rate_budget = max(1, int(req * round_seconds / max(per, 1e-9)))
        budget = rate_budget if budget is None else min(budget, rate_budget)
    if budget is not None and backoff > 1.0:
        budget = max(1, int(budget / backoff))
    return budget


def _gate_host(
    hurls: pd.Series,
    host_rules,
    round_seconds: float | None,
    backoff: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """The per-host kernel: (disallowed_mask, deferred_mask) over one
    host's frontier rows IN ORDER (earlier rows win the budget)."""
    n = len(hurls)
    dmask = np.zeros(n, dtype=bool)
    prefixes = host_rules.simple_disallow_prefixes
    if host_rules.robots_text is None:
        pass  # no robots → allow all
    elif prefixes is not None:
        if prefixes:
            paths = hurls.map(lambda u: _path_of(u, ""))
            for p in prefixes:
                dmask |= paths.str.startswith(p).to_numpy()
    else:  # complex robots: exact per-URL fallback
        dmask = ~hurls.map(host_rules.can_fetch).to_numpy(dtype=bool)

    defmask = np.zeros(n, dtype=bool)
    if round_seconds is not None and (
        host_rules.crawl_delay or host_rules.request_rate
    ):
        budget = _host_budget(host_rules, round_seconds, backoff)
        if budget is not None:
            ok = ~dmask
            defmask = ok & (ok.cumsum() > budget)
    return dmask, defmask


def politeness_gate(
    frontier: pa.Table,
    rules: RulesIndex,
    round_seconds: float | None = None,
    backoff: dict[str, float] | None = None,
) -> GateResult:
    """Driver-side gate: split a round's frontier (needs ``url`` and
    ``host`` columns) into allowed / disallowed / deferred."""
    n = frontier.num_rows
    if n == 0:
        return GateResult(frontier, frontier.slice(0, 0), frontier.slice(0, 0))

    urls = pd.Series(frontier["url"].to_pylist())
    hosts = pd.Series(frontier["host"].to_pylist())
    disallowed = np.zeros(n, dtype=bool)
    deferred = np.zeros(n, dtype=bool)

    for host, idx in hosts.groupby(hosts).groups.items():
        dmask, defmask = _gate_host(
            urls[idx],
            rules.for_host(host),
            round_seconds,
            (backoff or {}).get(host, 1.0),
        )
        disallowed[idx] = dmask
        deferred[idx] = defmask

    allowed_mask = ~(disallowed | deferred)
    return GateResult(
        allowed=frontier.filter(pa.array(allowed_mask)),
        disallowed=frontier.filter(pa.array(disallowed)),
        deferred=frontier.filter(pa.array(deferred)),
    )


def politeness_gate_distributed(
    frontier: pa.Table,
    rules: RulesIndex,
    round_seconds: float | None = None,
    backoff: dict[str, float] | None = None,
) -> GateResult:
    """Distributed gate for wide frontiers: a Ray ``groupby("host")``
    shuffle (host is already the engine-wide partitioning key, SURVEY
    §7.3) with the same per-host kernel inside ``map_groups``. The rules
    index and backoff map are broadcast once via ``ray.put``; a carried
    ``seq`` column restores the original frontier order (budget winners
    must match the driver path exactly)."""
    import ray
    import ray.data as rd

    n = frontier.num_rows
    if n == 0:
        return GateResult(frontier, frontier.slice(0, 0), frontier.slice(0, 0))
    with_seq = frontier.append_column("seq", pa.array(np.arange(n), pa.int64()))
    rules_ref = ray.put((rules, backoff or {}))

    def gate_group(g: pd.DataFrame) -> pd.DataFrame:
        rls, bk = ray.get(rules_ref)
        g = g.sort_values("seq")
        host = g["host"].iloc[0]
        dmask, defmask = _gate_host(
            g["url"].reset_index(drop=True),
            rls.for_host(host),
            round_seconds,
            bk.get(host, 1.0),
        )
        verdict = np.zeros(len(g), dtype=np.int8)
        verdict[defmask] = 2
        verdict[dmask] = 1
        return g.assign(verdict=verdict)

    out = (
        rd.from_arrow(with_seq)
        .groupby("host")
        .map_groups(gate_group, batch_format="pandas")
    )
    tables = [
        t
        for t in out.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    merged = (
        pa.concat_tables(tables)
        if tables
        else with_seq.append_column("verdict", pa.array([], pa.int8()))
    )
    merged = merged.sort_by("seq")
    import pyarrow.compute as pc

    def pick(code: int) -> pa.Table:
        return merged.filter(pc.equal(merged["verdict"], code)).drop_columns(
            ["seq", "verdict"]
        )

    return GateResult(allowed=pick(0), disallowed=pick(1), deferred=pick(2))


def gate(
    frontier: pa.Table,
    rules: RulesIndex,
    round_seconds: float | None = None,
    backoff: dict[str, float] | None = None,
    distributed_threshold: int = 200_000,
) -> GateResult:
    """Gate dispatcher: driver path for normal rounds, distributed
    host-shuffle path once the frontier outgrows the driver (the
    crossover on this box is ~10^5 rows; a 10^10-URL frontier is always
    distributed)."""
    if frontier.num_rows > distributed_threshold:
        return politeness_gate_distributed(frontier, rules, round_seconds, backoff)
    return politeness_gate(frontier, rules, round_seconds, backoff)
