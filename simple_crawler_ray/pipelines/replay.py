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
touches no page payloads. At 10^10 frontier scale the streaming variant
(``replay_stream.py``: distributed integer-id segments, bounded LRU
segment cache, spillable stack — enabled via ``adjacency_via_disk``)
replaces this in-RAM form; typical page budgets
(reference default max_pages=10, configuration.py:28) keep it trivially
small.
"""

from __future__ import annotations

from ..schemas import CrawlStatus

__all__ = ["OrderingReplay", "replay_exhaustive"]


def replay_exhaustive(
    seeds: list[str],
    pages: "pa.Table",
    closed: "pa.Table | None",
) -> tuple["pa.Table", "pa.Table"]:
    """Integer-ID replay for exhaustion crawls (identical semantics to
    OrderingReplay, but the URL→id mapping and link-id resolution run as
    vectorized Arrow kernels and the serial walk touches only ints —
    ~5-10× faster than dict-of-strings at 10^5+ pages; the conformance
    tests pin equivalence against the serial oracle).

    ``pages``: (url, linked_urls) of every parsed page;
    ``closed``: (url, req_status, crawl_status) of disallowed/error urls.
    Returns (crawl_order table, seen table) per schemas.py.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.urlkit import url_sha1_batch

    page_urls = pages["url"].combine_chunks()
    link_lists = pages["linked_urls"].combine_chunks()
    flat_links = link_lists.flatten()
    closed_urls = (
        closed["url"].combine_chunks() if closed is not None else pa.array([], pa.string())
    )
    seeds_arr = pa.array(seeds, pa.string())

    unique = pc.unique(
        pa.concat_arrays([page_urls, flat_links.combine_chunks() if isinstance(flat_links, pa.ChunkedArray) else flat_links, closed_urls, seeds_arr])
    )
    n = len(unique)
    page_ids = pc.index_in(page_urls, value_set=unique).to_numpy(zero_copy_only=False)
    link_ids = pc.index_in(flat_links, value_set=unique).to_numpy(zero_copy_only=False)
    offsets = link_lists.offsets.to_numpy(zero_copy_only=False)
    seed_ids = pc.index_in(seeds_arr, value_set=unique).to_numpy(zero_copy_only=False)

    # id → page row (for link slices); id → closed fate
    page_row = np.full(n, -1, dtype=np.int64)
    page_row[page_ids] = np.arange(len(page_ids))
    closed_req = np.zeros(n, dtype=np.int32)
    closed_st = np.zeros(n, dtype=np.int8)
    has_closed = np.zeros(n, dtype=bool)
    if closed is not None and closed.num_rows:
        cids = pc.index_in(closed_urls, value_set=unique).to_numpy(zero_copy_only=False)
        closed_req[cids] = closed["req_status"].to_numpy(zero_copy_only=False)
        closed_st[cids] = closed["crawl_status"].to_numpy(zero_copy_only=False)
        has_closed[cids] = True

    seen = np.zeros(n, dtype=bool)
    seen_order: list[int] = []
    stack: list[tuple[int, int, int]] = []  # (id, depth, parent_id)
    for sid in seed_ids:
        sid = int(sid)
        if not seen[sid]:
            seen[sid] = True
            seen_order.append(sid)
            stack.append((sid, 0, -1))

    o_url: list[int] = []
    o_depth: list[int] = []
    o_parent: list[int] = []
    o_req: list[int] = []
    o_st: list[int] = []
    while stack:
        uid, depth, parent = stack.pop()
        row = page_row[uid]
        if row >= 0:
            s, e = offsets[row], offsets[row + 1]
            d = depth + 1
            lids = link_ids[s:e]
            unseen = lids[~seen[lids]]  # vectorized pre-filter: the python
            # loop below only touches first-discoveries (+ same-page dups)
            for lid in unseen:
                if not seen[lid]:
                    seen[lid] = True
                    seen_order.append(int(lid))
                    stack.append((int(lid), d, uid))
            o_req.append(200)
            o_st.append(int(CrawlStatus.PARSED))
        elif has_closed[uid]:
            o_req.append(int(closed_req[uid]))
            o_st.append(int(closed_st[uid]))
        else:
            # fate unknown (crawl truncated by max_rounds): stop here —
            # matches OrderingReplay's "blocked" behaviour
            break
        o_url.append(uid)
        o_depth.append(depth)
        o_parent.append(parent)

    id_arr = pa.array(o_url, pa.int64())
    parent_arr = pa.array([p if p >= 0 else None for p in o_parent], pa.int64())
    order_t = pa.table(
        {
            "seq": pa.array(range(len(o_url)), pa.int64()),
            "url": pc.take(unique, id_arr),
            "depth": pa.array(o_depth, pa.int32()),
            "parent_url": pc.fill_null(
                pc.take(unique, parent_arr).cast(pa.string()), ""
            ),
            "req_status": pa.array(o_req, pa.int32()),
            "crawl_status": pa.array(o_st, pa.int8()),
        }
    )
    seen_urls = pc.take(unique, pa.array(seen_order, pa.int64()))
    seen_t = pa.table(
        {
            "url": seen_urls,
            "url_sha1": pa.array(url_sha1_batch(seen_urls), pa.binary()),
        }
    )
    return order_t, seen_t


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
