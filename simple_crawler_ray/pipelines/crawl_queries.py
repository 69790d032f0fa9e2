"""Crawl-engine queries for the driver harness.

The crawl runs over the deterministic synthetic web-graph corpus (see
corpus.py) sized from the sf directory name — the driver's TPC-H-ish
tables cannot provide a link-closed web graph (FIXTURES.md §7), so these
queries are checked rows-only by the driver, while exact reference parity
is enforced by the conformance tests in tests/test_crawl_conformance.py
(order/seen/byte-identical text vs the serial oracle).

One crawl per (process, sf) — cached and shared by the c1..c4 accessors.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..corpus import CorpusSpec, ensure_corpus
from .crawl import CrawlConfig, CrawlResult, crawl

__all__ = ["c1_crawl_order", "c2_crawl_seen", "c3_crawl_urls_out", "c4_sitemaps_out"]

_CACHE: dict[str, CrawlResult] = {}


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", "")) if base.startswith("sf") else 0.001
    except ValueError:
        return 0.001


def run_crawl_for(sf_dir: str, num_cpus_hint: int | None = None) -> CrawlResult:
    key = os.path.normpath(sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    sf = sf_of(sf_dir)
    spec = CorpusSpec.for_sf(sf)
    corpus_dir = ensure_corpus(spec)
    out_dir = tempfile.mkdtemp(prefix=f"scr_crawl_{os.path.basename(key)}_")
    cfg = CrawlConfig(
        corpus_dir=corpus_dir,
        out_dir=out_dir,
        seed_urls=["https://host0.example", "https://host1.example"],
        max_pages=None,  # exhaustion: deterministic full reachable component
        keep_html=False,
        num_buckets=32,
        num_seen_shards=8,
        run_id="driver",
    )
    res = crawl(cfg)
    _CACHE[key] = res
    return res


def c1_crawl_order(sf_dir: str) -> pa.Table:
    return run_crawl_for(sf_dir).order


def c2_crawl_seen(sf_dir: str) -> pa.Table:
    res = run_crawl_for(sf_dir)
    # hex the sha1 for a driver-friendly string column
    t = res.seen
    return pa.table(
        {
            "url": t["url"],
            "url_sha1": pa.array(
                [b.hex() for b in t["url_sha1"].to_pylist()], pa.string()
            ),
        }
    )


def c3_crawl_urls_out(sf_dir: str) -> pa.Table:
    res = run_crawl_for(sf_dir)
    t = pq.read_table(
        os.path.join(res.out_dir, "urls_out"),
        columns=["run_id", "seed_url", "url", "req_status", "crawl_status"],
    )
    return t.sort_by("url")


def c4_sitemaps_out(sf_dir: str) -> pa.Table:
    res = run_crawl_for(sf_dir)
    return pq.read_table(os.path.join(res.out_dir, "sitemaps.parquet"))
