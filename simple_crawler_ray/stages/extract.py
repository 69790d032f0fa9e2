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


def _get_broadcast(ref):
    if not isinstance(ref, ray.ObjectRef):
        return ref  # driver fast path passes plain objects
    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        # a round uses ≤3 broadcasts (url set, depth map, seen set) but the
        # seen-set broadcast can be many MB — keep the cache TINY or workers
        # accumulate hundreds of MB across rounds/crawls and GC pressure
        # degrades every later execution
        if len(_BROADCAST_CACHE) >= 6:
            _BROADCAST_CACHE.clear()
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
    url_set: set[str] = _get_broadcast(url_set_ref)
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
    seen_ref: "ray.ObjectRef | None" = None,
    emit_links: bool = True,
) -> pa.Table:
    """The WHOLE crawl round as one fused stage → one Ray Data execution per
    round (fetch-filter → extract → persist → explode+local-dedup), so the
    per-round fixed cost is a single pipeline, not four.

    ``emit_links=False`` drops the per-page linked_urls from the RETURNED
    metadata (they are always persisted in the parquet part): an exhaustion
    crawl (max_pages=None) doesn't need per-round adjacency — the ordering
    replay streams the persisted parts once after the loop — and shipping
    millions of link strings through the driver every round is the single
    biggest serial cost at scale. A budgeted crawl needs them per round so
    the replay can decide termination.

    Side effect: persists the full extracted rows (incl. text/html) as a
    Parquet part file under ``out_dir`` — the checkpoint/results unit. The
    part filename is a content hash so a retried task overwrites its own
    output instead of duplicating it.

    Returns ONLY small metadata rows, tagged by ``kind``:
      kind="page": url, host, linked_urls        (adjacency for the replay)
      kind="cand": url, host, depth, parent_url  (locally-deduped candidates)

    Global first-seen admission (SADD parity) runs on the DRIVER against the
    sharded seen-set actors: a blocking actor RPC from inside a map task
    parks the worker in ray.get, which makes Ray spawn extra (cold) workers
    and triggers an import storm mid-round — measured far slower than
    funneling the (tiny) candidate metadata through the driver. At
    multi-node scale the distributed alternative is a shard-partitioned
    groupby(shard) stage whose per-group task talks to exactly one shard.
    """
    import hashlib
    import os

    import pyarrow.parquet as pq

    fetched = fetch_extract_batch(batch, url_set_ref=url_set_ref, keep_html=keep_html)
    if fetched.num_rows:
        key = hashlib.sha1(
            ("|".join(fetched["url"].to_pylist()[:3]) + str(fetched.num_rows)).encode()
        ).hexdigest()[:16]
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(fetched, os.path.join(out_dir, f"part-{key}.parquet"))

    new_frontier = candidate_batch(
        fetched.select(["url", "linked_urls"]), depth_ref=depth_ref, seen_ref=seen_ref
    )
    np_, nn = fetched.num_rows, new_frontier.num_rows
    page_links = (
        fetched["linked_urls"].combine_chunks()
        if emit_links
        else pa.nulls(np_, pa.list_(pa.string()))
    )
    return pa.table(
        {
            "kind": pa.array(["page"] * np_ + ["cand"] * nn, pa.string()),
            "url": pa.concat_arrays(
                [fetched["url"].combine_chunks(), new_frontier["url"].combine_chunks()]
            ),
            "host": pa.concat_arrays(
                [fetched["host"].combine_chunks(), new_frontier["host"].combine_chunks()]
            ),
            "depth": pa.concat_arrays(
                [pa.nulls(np_, pa.int32()), new_frontier["depth"].combine_chunks()]
            ),
            "parent_url": pa.concat_arrays(
                [pa.nulls(np_, pa.string()), new_frontier["parent_url"].combine_chunks()]
            ),
            "linked_urls": pa.concat_arrays(
                [page_links, pa.nulls(nn, pa.list_(pa.string()))]
            ),
        }
    )


def crawl_round_file_batch(
    batch: pa.Table,
    *,
    url_set_ref: "ray.ObjectRef",
    depth_ref: "ray.ObjectRef",
    out_dir: str,
    keep_html: bool = False,
    seen_ref: "ray.ObjectRef | None" = None,
    emit_links: bool = True,
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
    """
    import pyarrow.parquet as pq

    tables = [
        crawl_round_batch(
            pq.read_table(path, columns=["url", "html"]),
            url_set_ref=url_set_ref,
            depth_ref=depth_ref,
            out_dir=out_dir,
            keep_html=keep_html,
            seen_ref=seen_ref,
            emit_links=emit_links,
        )
        for path in batch["path"].to_pylist()
    ]
    return pa.concat_tables(tables)


def candidate_batch(
    batch: pa.Table,
    *,
    depth_ref: "ray.ObjectRef",
    seen_ref: "ray.ObjectRef | None" = None,
) -> pa.Table:
    """Explode outlinks to candidate rows, deduped locally within the batch
    (cuts the metadata volume the driver merges before global admission).

    Input: extracted batches (url, linked_urls). For each page, explode its
    ordered outlinks to (url=link, parent_url, depth=parent_depth+1) rows.

    ``depth_ref`` is the broadcast {url: depth} map of THIS round's frontier
    (metadata for in-flight pages only, not the whole crawl).

    ``seen_ref`` (optional) broadcasts the urls already admitted in PRIOR
    rounds; dropping those links here is exact (a set member can never be
    first-seen again) and removes the dominant share of candidate traffic —
    in a web graph most links point at already-crawled pages. At 10^10-URL
    scale this broadcast becomes the merged Bloom of the seen shards
    (false positive there would wrongly drop a URL, so the Bloom variant
    must keep maybe-seen candidates for exact confirm — only
    definitely-not-seen links skip confirmation).

    Which parallel batch wins a duplicate link is nondeterministic, but
    final (seq, depth, parent) attribution is recomputed deterministically
    by the ordering replay — candidates only gate *expansion*.
    """
    depth_map: dict[str, int] = _get_broadcast(depth_ref)
    seen_prior: set[str] = _get_broadcast(seen_ref) if seen_ref is not None else set()
    parents = batch["url"].to_pylist()
    link_lists = batch["linked_urls"].to_pylist()
    seen_local: set[str] = set()
    links: list[str] = []
    out_parents: list[str] = []
    depths: list[int] = []
    for parent, plinks in zip(parents, link_lists):
        d = depth_map.get(parent, 0) + 1
        for link in plinks or ():
            if link not in seen_local and link not in seen_prior:
                seen_local.add(link)
                links.append(link)
                out_parents.append(parent)
                depths.append(d)
    return pa.table(
        {
            "url": pa.array(links, pa.string()),
            "host": pa.array([host_of(u) for u in links], pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "parent_url": pa.array(out_parents, pa.string()),
        }
    )
