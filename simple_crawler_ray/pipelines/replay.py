"""Deterministic serial-equivalent ordering replay.

The reference's crawl order is only well-defined serially (LIFO Redis list +
async interleaving, SURVEY §2.8); a parallel engine cannot "discover" that
order online, but it can (a) expand the crawl graph in parallel rounds —
the heavy, distributed work — and (b) assign the serial-equivalent
``(seq, depth, parent)`` by replaying the reference's LIFO/first-seen state
machine over the *adjacency metadata only* (url → status + ordered outlink
list; no html/text ever touches the replay).

The replay is incremental: ``advance()`` runs until the page budget is
reached, the stack drains, or it reaches a URL whose fetch result isn't
known yet (``blocked_on`` → the driver schedules more rounds). It is a pure
function of (seeds, adjacency), so resume-after-kill just re-advances over
re-read adjacency — no replay state needs checkpointing (north_rule
per-partition lineage lives in the round results + seen-shard snapshots).

Scale note: replay is O(visited) dict/stack work over ~100 bytes/URL
metadata — inherently sequential (matching a serial crawler's order is a
sequential decision problem), but it is the only non-distributed piece and
touches no page payloads. At 10^10 frontier scale it streams adjacency
segments from Parquet and spills its stack; typical page budgets
(reference default max_pages=10, configuration.py:28) keep it trivially
small.
"""

from __future__ import annotations

from ..schemas import CrawlStatus

__all__ = ["OrderingReplay"]


class OrderingReplay:
    """Incremental serial-equivalent replayer (mirrors
    pipelines/serial_oracle.serial_crawl exactly — shared semantics:
    LIFO pop cache.py:86,96; SADD-gated admission cache.py:91-97;
    document-order link push parser.py:30-40; every processed pop counts
    toward max_pages)."""

    def __init__(self, seeds: list[str], max_pages: int | None):
        self.max_pages = max_pages
        self._stack: list[tuple[str, int, str]] = []
        self._seen: set[str] = set()
        self.seen_order: list[str] = []
        # (seq, url, depth, parent, req_status, crawl_status)
        self.order: list[tuple[int, str, int, str, int, int]] = []
        self.completed = 0
        self.blocked_on: str | None = None
        for s in seeds:
            self._admit(s, 0, "")

    def _admit(self, url: str, depth: int, parent: str) -> None:
        if url not in self._seen:
            self._seen.add(url)
            self.seen_order.append(url)
            self._stack.append((url, depth, parent))

    def done(self) -> bool:
        budget_hit = self.max_pages is not None and self.completed >= self.max_pages
        return budget_hit or (not self._stack and self.blocked_on is None)

    def advance(self, adjacency: dict[str, tuple[int, int, list[str]]]) -> str:
        """``adjacency``: url → (crawl_status, req_status, ordered links).
        Returns "done" or "blocked" (see ``blocked_on``)."""
        self.blocked_on = None
        while self._stack:
            if self.max_pages is not None and self.completed >= self.max_pages:
                return "done"
            url, depth, parent = self._stack[-1]
            fate = adjacency.get(url)
            if fate is None:
                self.blocked_on = url
                return "blocked"
            self._stack.pop()
            crawl_status, req_status, links = fate
            if crawl_status == int(CrawlStatus.PARSED):
                for link in links:
                    self._admit(link, depth + 1, url)
            self.order.append(
                (len(self.order), url, depth, parent, req_status, crawl_status)
            )
            self.completed += 1
        return "done"
