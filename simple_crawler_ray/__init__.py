"""simple_crawler_ray — a Ray-Data-native rebuild of wischmcj/simple-crawler.

A streaming URL-frontier + fetch scheduler over Parquet tables of
Common-Crawl-style web pages, built idiomatically on ``ray.data.Dataset``:

- fetch = pruned read of a hash-bucketed page corpus (no per-round full scan)
- link/text extraction = stateless ``map_batches`` over zero-copy Arrow batches
- URL-seen set = sharded Bloom-filter + exact-confirm actor pool
- politeness = per-host robots.txt gate + token-bucket budget per round
- ordering parity = deterministic serial-equivalent replay over adjacency
  metadata (reference semantics: LIFO frontier, document-order link push,
  first-seen dedup — see ``pipelines/serial_oracle.py``)
- checkpoint/resume = per-epoch manifest (frontier segment Parquet, seen-shard
  snapshots, metrics)

The reference engine (asyncio + Redis + SQLite, ~1.1k LoC) is described in
/root/repo/SURVEY.md; file:line citations into the reference appear in
docstrings throughout this package.
"""

__version__ = "0.1.0"
