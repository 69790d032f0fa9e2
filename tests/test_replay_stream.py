"""Streaming replay (replay_stream.py): parity with the in-RAM integer
replay, bounded driver residency, segment-cache eviction, stack spill."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl
from simple_crawler_ray.pipelines.replay_stream import (
    _SpillStack,
    build_replay_segments,
    replay_streaming,
    streaming_replay_from_rounds,
)


@pytest.fixture(scope="module")
def rounds_dir(ray_session, small_corpus_dir, tmp_path_factory):
    """One exhaustion crawl whose persisted rounds feed every test here."""
    out = str(tmp_path_factory.mktemp("stream") / "run")
    res = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=out,
            seed_urls=["https://host0.example"],
            max_pages=None,
            num_seen_shards=2,
            num_buckets=8,
        )
    )
    return out, res


def test_streaming_matches_inram_under_tiny_segments(ray_session, rounds_dir):
    """Force many segments + a 2-segment LRU + a 4-entry stack spill: the
    walk must still reproduce the in-RAM replay's exact order/seen."""
    out, res = rounds_dir
    order_t, seen_t, index = streaming_replay_from_rounds(
        out,
        res.effective_seeds,
        pages_per_seg=8,
        cache_cap=2,
        stack_spill=4,
    )
    assert order_t.to_pylist() == res.order.to_pylist()
    assert seen_t["url"].to_pylist() == res.seen["url"].to_pylist()
    assert seen_t["url_sha1"].to_pylist() == res.seen["url_sha1"].to_pylist()


def test_driver_residency_bounded(ray_session, rounds_dir):
    """The streaming claim: peak resident adjacency (int segment cache)
    stays well under the corpus' link STRING bytes — the quantity the
    old path concatenated onto the driver."""
    out, res = rounds_dir
    index = build_replay_segments(out, res.effective_seeds, pages_per_seg=8, cache_cap=2)
    assert index.total_link_string_bytes > 0
    replay_streaming(index)
    assert 0 < index.peak_cache_bytes < 0.5 * index.total_link_string_bytes


def test_segments_are_range_partitioned_and_sorted(ray_session, rounds_dir):
    out, res = rounds_dir
    index = build_replay_segments(out, res.effective_seeds, pages_per_seg=8)
    import glob
    import os

    seg_files = glob.glob(os.path.join(index.seg_dir, "seg=*.parquet"))
    assert len(seg_files) > 1  # tiny span ⇒ multiple segments
    for f in seg_files:
        seg = int(os.path.basename(f).split("=")[1].split(".")[0])
        pids = pq.read_table(f)["pid"].to_numpy()
        assert (np.diff(pids) > 0).all()  # sorted, unique
        assert (pids // index.seg_span == seg).all()  # range-partitioned


def test_spill_stack_lifo_parity(tmp_path):
    s = _SpillStack(str(tmp_path / "spill"), threshold=10)
    items = [(i, i % 5, i - 1) for i in range(100)]
    for it in items:
        s.push(it)
    assert s.spill_count > 0
    popped = []
    while s:
        popped.append(s.pop())
    assert popped == list(reversed(items))


def test_int_buffer_chunking_and_bytes():
    """_IntBuffer must cross chunk boundaries losslessly and account its
    residency at exactly 8 B per entry (the disclosed driver floor of the
    streaming walk — no Python-list object overhead)."""
    from simple_crawler_ray.pipelines.replay_stream import _IntBuffer

    buf = _IntBuffer(chunk_rows=7)
    vals = list(range(100, 0, -1)) + [0, -5, 2**62]
    for v in vals:
        buf.append(v)
    assert len(buf) == len(vals)
    assert buf.nbytes == 8 * len(vals)
    out = buf.array()
    assert out.dtype == np.int64
    assert out.tolist() == vals

    empty = _IntBuffer(chunk_rows=4)
    assert len(empty) == 0 and empty.nbytes == 0
    assert empty.array().tolist() == []
