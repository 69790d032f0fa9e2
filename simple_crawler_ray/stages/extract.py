"""map_batches stages of the crawl round: broadcast semi-join fetch filter,
link+text extraction, candidate explode, seen-set admission.

All stages are Arrow-in/Arrow-out (``batch_format="pyarrow"``, zero-copy
from the object store). Extraction is the CPU-heavy stage: HTML parsing is
inherently per-document, but it runs batched inside parallel tasks with no
Python-object block conversion, and outputs are assembled columnar.

Design note — tasks, not actor pools: these stages' only state is a
broadcast lookup (``ray.put`` once per round on the driver). Spinning an
actor pool per round costs seconds (measured ~7 s vs ~0.6 s task-based per
round on this box) while the state costs ~nothing to acquire, so the stages
are plain functions run as stateless tasks, with a per-worker-process
broadcast cache (``_get_broadcast``) so each worker deserializes a
broadcast object once, not once per batch. A stage with genuinely
expensive setup (model load, big index) should flip back to a callable
class + ``concurrency=N`` (ray_guide: actor pools).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.linkextract import extract_page
from ..functions.urlkit import host_of
from ..schemas import CrawlStatus

__all__ = [
    "fetch_extract_batch",
    "candidate_batch",
    "crawl_round_batch",
    "crawl_round_file_batch",
]

# per-worker-process cache of deserialized broadcast objects
_BROADCAST_CACHE: dict[str, object] = {}
# per-worker cumulative sub-step timings (SCR_TASKPROF=1 diagnostics only)
_TASKPROF: dict = {}


def _get_url_set(ref) -> set:
    """The round's frontier URL broadcast ships as a SORTED LIST (the
    row-group pruner needs it ordered); the membership set each task
    filters with is derived once per worker and cached alongside."""
    obj = _get_broadcast(ref)
    if isinstance(obj, set):
        return obj
    key = (ref.hex() + ":set") if isinstance(ref, ray.ObjectRef) else None
    if key is None:
        return set(obj)
    if key not in _BROADCAST_CACHE:
        while len(_BROADCAST_CACHE) >= 12:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        _BROADCAST_CACHE[key] = set(obj)
    return _BROADCAST_CACHE[key]


def _get_broadcast(ref):
    if not isinstance(ref, ray.ObjectRef):
        return ref  # driver fast path passes plain objects
    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        # a round uses ~5 broadcast-derived entries (frontier list + its
        # derived set, depth map, recent list + its derived set); evict
        # FIFO — clear-all here caused mid-round thrash where every task
        # re-deserialized + re-built the sets, and unbounded growth makes
        # workers accumulate hundreds of MB across rounds (GC pressure
        # degrades every later execution)
        while len(_BROADCAST_CACHE) >= 12:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def fetch_extract_batch(
    batch: pa.Table, *, url_set_ref: "ray.ObjectRef", keep_html: bool = False
) -> pa.Table:
    """Fused fetch-filter + extract.

    Input: corpus batches (url, html) from the pruned bucket read.
    - semi-join filter against the broadcast frontier URL set (no shuffle;
      the small side is shipped once via ``ray.put``, SURVEY §4)
    - link+text extraction on the surviving rows.

    Output: (url, host, req_status, crawl_status, text, linked_urls[, html]).

    Reference parity: link extraction per parser.py:22-41 (document-order
    same-domain urljoin; see functions/linkextract.py), status transitions
    per downloader.py:46-51 + parser.py:43-46 (downloaded→parsed on
    success). Text is the byte-identical golden extraction.
    """
    url_set = _get_url_set(url_set_ref)
    mask = pa.array([u in url_set for u in batch["url"].to_pylist()], pa.bool_())
    batch = batch.filter(mask)
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts: list[str] = []
    links: list[list[str]] = []
    hosts: list[str] = []
    for url, html_bytes in zip(urls, htmls):
        html = html_bytes.decode("utf-8", errors="replace")
        text, page_links = extract_page(url, html)  # single parse pass
        texts.append(text)
        links.append(page_links)
        hosts.append(host_of(url))
    n = len(urls)
    cols = {
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "req_status": pa.array([200] * n, pa.int32()),
        "crawl_status": pa.array([int(CrawlStatus.PARSED)] * n, pa.int8()),
        "text": pa.array(texts, pa.string()),
        "linked_urls": pa.array(links, pa.list_(pa.string())),
    }
    if keep_html:
        cols["html"] = batch["html"]
    return pa.table(cols)


def crawl_round_batch(
    batch: pa.Table,
    *,
    url_set_ref: "ray.ObjectRef",
    depth_ref: "ray.ObjectRef",
    out_dir: str,
    keep_html: bool = False,
    seen_pool=None,
    emit_links: bool = True,
    push_epoch: str | None = None,
    recent_ref=None,
) -> pa.Table:
    """The WHOLE crawl round as one fused stage → one Ray Data execution per
    round (fetch-filter → extract → persist → explode+local-dedup →
    shard-partitioned admission push), so the per-round fixed cost is a
    single pipeline, not four.

    ``emit_links=False`` drops the per-page linked_urls from the RETURNED
    metadata (they are always persisted in the parquet part): an exhaustion
    crawl (max_pages=None) doesn't need per-round adjacency — the ordering
    replay streams the persisted parts once after the loop — and shipping
    millions of link strings through the driver every round is the single
    biggest serial cost at scale. A budgeted crawl needs them per round so
    the replay can decide termination.

    Side effect 1: persists the full extracted rows (incl. text/html) as a
    Parquet part file under ``out_dir`` — the checkpoint/results unit. The
    part filename is a content hash so a retried task overwrites its own
    output instead of duplicating it.

    Side effect 2 — DISTRIBUTED ADMISSION (SADD parity, cache.py:91-97):
    locally-deduped candidate rows are pushed directly to their host-affine
    seen-set shard actors (``seen_pool.push_candidates``) — candidate
    metadata never transits the driver, and the driver holds NO seen-set
    mirror (O(1) driver state). The push acks are awaited before the task
    returns, so a finished round execution implies every shard has
    processed its pushes; the driver then collects the admitted rows with
    one ``drain_admitted`` RPC per shard. A retried task re-pushes, which
    is safe: shard admission is exact and idempotent per URL — and the
    worker-persistent push filter is only updated AFTER the acks succeed
    (``commit_pushed_keys``), so a retry after a mid-push failure cannot
    be silently filtered out.

    Returns ONLY small per-page metadata rows:
    ``(url, host, linked_urls)`` — adjacency for the budgeted replay, and
    the ``found`` set for the post-fetch corpus-miss diff.
    """
    import hashlib
    import os
    import time as _time

    import pyarrow.parquet as pq

    _t0 = _time.perf_counter()
    fetched = fetch_extract_batch(batch, url_set_ref=url_set_ref, keep_html=keep_html)
    _t1 = _time.perf_counter()
    if fetched.num_rows:
        key = hashlib.sha1(
            ("|".join(fetched["url"].to_pylist()[:3]) + str(fetched.num_rows)).encode()
        ).hexdigest()[:16]
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(fetched, os.path.join(out_dir, f"part-{key}.parquet"))
    _t2 = _time.perf_counter()

    _t3 = _t2
    if seen_pool is not None and fetched.num_rows:
        candidates = candidate_batch(
            fetched.select(["url", "linked_urls"]),
            depth_ref=depth_ref,
            num_shards=seen_pool.num_shards,
            salt=seen_pool.salt,
            push_epoch=push_epoch,
            recent_ref=recent_ref,
        )
        _t3 = _time.perf_counter()
        if candidates.num_rows:
            ray.get(seen_pool.push_candidates(candidates))
            # only now are these keys durably at their shards — safe to
            # suppress them from this worker's future pushes
            commit_pushed_keys(push_epoch, candidates["key"].to_pylist())
    _t4 = _time.perf_counter()
    if os.environ.get("SCR_TASKPROF"):
        _TASKPROF["extract"] = _TASKPROF.get("extract", 0) + (_t1 - _t0)
        _TASKPROF["write"] = _TASKPROF.get("write", 0) + (_t2 - _t1)
        _TASKPROF["cand"] = _TASKPROF.get("cand", 0) + (_t3 - _t2)
        _TASKPROF["push"] = _TASKPROF.get("push", 0) + (_t4 - _t3)
        _TASKPROF["n"] = _TASKPROF.get("n", 0) + fetched.num_rows
        import json as _json

        with open(f"/tmp/scr_taskprof_{os.getpid()}.json", "w") as _f:
            _json.dump(_TASKPROF, _f)

    np_ = fetched.num_rows
    page_links = (
        fetched["linked_urls"].combine_chunks()
        if emit_links
        else pa.nulls(np_, pa.list_(pa.string()))
    )
    return pa.table(
        {
            "url": fetched["url"].combine_chunks(),
            "host": fetched["host"].combine_chunks(),
            "linked_urls": page_links,
        }
    )


def crawl_round_file_batch(
    batch: pa.Table,
    *,
    url_set_ref: "ray.ObjectRef",
    depth_ref: "ray.ObjectRef",
    out_dir: str,
    keep_html: bool = False,
    seen_pool=None,
    emit_links: bool = True,
    push_epoch: str | None = None,
    recent_ref=None,
) -> pa.Table:
    """Per-file driver of the fused round stage: input batches carry bucket
    Parquet file PATHS; each task opens its file directly and runs
    ``crawl_round_batch`` on it.

    Why not ``read_parquet``: on this Ray version a fresh ``read_parquet``
    dataset spends several seconds in parquet metadata fetch + decoding-size
    sampling BEFORE execution starts — measured ~7 s per round vs ~0.3 s
    this way on a 32-file bucket set. One task per bucket part file is also
    the right granularity at scale: the bucketize step writes ~128-256 MB
    parts, so tasks stay uniform without Ray's sampling machinery.

    Reads are row-group pruned: bucket files are url-sorted at bucketize
    time, so only row groups whose [min, max] url range can contain a
    frontier URL are decoded (sources/pages.read_bucket_rows) — small and
    straggler rounds stop paying whole-bucket decode.
    """
    from ..sources.pages import read_bucket_rows

    sorted_urls = _get_broadcast(url_set_ref)
    if isinstance(sorted_urls, set):
        sorted_urls = sorted(sorted_urls)
    tables = [
        crawl_round_batch(
            read_bucket_rows(path, sorted_urls, columns=["url", "html"]),
            url_set_ref=url_set_ref,
            depth_ref=depth_ref,
            out_dir=out_dir,
            keep_html=keep_html,
            seen_pool=seen_pool,
            emit_links=emit_links,
            push_epoch=push_epoch,
            recent_ref=recent_ref,
        )
        for path in batch["path"].to_pylist()
    ]
    return pa.concat_tables(tables)


# worker-persistent push filter: keys this WORKER PROCESS already pushed to
# the shards during the current crawl epoch. Dropping a re-discovered key is
# always safe (its shard has already arbitrated it), so this is an EXACT
# traffic filter with no broadcast and no driver state — in a web graph a
# popular URL is re-linked ~in-degree times, and this caps its pushes at
# once per worker instead. Keyed by a per-crawl-invocation epoch so a new
# crawl (or a resume, whose shard state was rolled back to a snapshot)
# never inherits stale entries. Memory is bounded by the safety valve; an
# eviction only costs a redundant push, never correctness.
_PUSH_FILTER: dict = {"epoch": None, "keys": set()}
_PUSH_FILTER_CAP = 8_000_000  # ~160 MB of sha1 keys per worker, worst case


def commit_pushed_keys(push_epoch: str | None, keys) -> None:
    """Commit a batch's candidate keys into the worker-persistent push
    filter — called ONLY after the shard push acks succeeded.

    ``candidate_batch`` reads the filter but never writes it: if the task
    dies between building candidates and a successful ``ray.get`` on the
    push acks, a retry on the same worker must re-push those keys. Marking
    them pushed before the ack would silently drop them from the crawl.
    """
    if push_epoch is None or _PUSH_FILTER["epoch"] != push_epoch:
        return
    _PUSH_FILTER["keys"].update(keys)


def candidate_batch(
    batch: pa.Table,
    *,
    depth_ref: "ray.ObjectRef",
    num_shards: int = 8,
    salt: dict | None = None,
    push_epoch: str | None = None,
    recent_ref=None,
) -> pa.Table:
    """Explode outlinks to candidate rows, deduped against everything this
    worker already pushed (exact; cuts the admission-push volume), with the
    destination seen-set shard precomputed per row (host-affine
    ``shard_of``; SURVEY §7.3 — dedup, politeness and admission share one
    partitioning key) and the SADD dedup key (``sha1(raw_url)``) shipped
    as a column so the shard actor does no per-URL hashing.

    Input: extracted batches (url, linked_urls). For each page, explode its
    ordered outlinks to (url=link, parent_url, depth=parent_depth+1,
    shard, key) rows.

    ``depth_ref`` is the broadcast {url: depth} map of THIS round's frontier
    (metadata for in-flight pages only, not the whole crawl).

    Cross-WORKER duplicate links are not filtered here — the host-affine
    shard that receives the push is both the filter and the authority
    (exact first-seen), so no broadcast seen-mirror exists anywhere. Which
    parallel batch wins a duplicate link is nondeterministic, but final
    (seq, depth, parent) attribution is recomputed deterministically by
    the ordering replay — candidates only gate *expansion*.
    """
    from ..functions.urlkit import shard_of_batch
    from ..state.seen import url_key

    if _PUSH_FILTER["epoch"] != push_epoch or len(_PUSH_FILTER["keys"]) > _PUSH_FILTER_CAP:
        _PUSH_FILTER["epoch"] = push_epoch
        _PUSH_FILTER["keys"] = set()
    # READ-ONLY view: a batch's own keys are committed via
    # commit_pushed_keys() only after the shard push is acked, so a task
    # retried after a failed push re-pushes them (see ADVICE round 2).
    pushed: set = _PUSH_FILTER["keys"]
    # epoch=None (direct/unit-test calls) keeps filtering batch-local only
    persistent = push_epoch is not None

    depth_map: dict[str, int] = _get_broadcast(depth_ref)
    # recent-frontier drop set: every URL that appeared in the last few
    # rounds' frontiers is a KNOWN member of the seen set, so dropping a
    # link to it is exact — and, unlike the per-worker push filter, this
    # broadcast is identical for every worker (worker-count-independent
    # traffic reduction; in a web graph most re-links target recently
    # crawled pages). Bounded: the driver ships a sliding window, never
    # the full seen set.
    recent: set = _get_url_set(recent_ref) if recent_ref is not None else set()
    parents = batch["url"].to_pylist()
    link_lists = batch["linked_urls"].to_pylist()
    batch_new: set = set()
    links: list[str] = []
    keys: list[bytes] = []
    out_parents: list[str] = []
    depths: list[int] = []
    for parent, plinks in zip(parents, link_lists):
        d = depth_map.get(parent, 0) + 1
        for link in plinks or ():
            if link in recent:
                continue  # exact: member of a recent frontier ⇒ admitted
            k = url_key(link)
            if k not in batch_new and not (persistent and k in pushed):
                batch_new.add(k)
                links.append(link)
                keys.append(k)
                out_parents.append(parent)
                depths.append(d)
    return pa.table(
        {
            "url": pa.array(links, pa.string()),
            "host": pa.array([host_of(u) for u in links], pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "parent_url": pa.array(out_parents, pa.string()),
            "shard": pa.array(
                shard_of_batch(links, num_shards, salt), pa.int32()
            ),
            "key": pa.array(keys, pa.binary()),
        }
    )
