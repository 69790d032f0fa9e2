"""Checkpoint/resume: a crawl killed after epoch k resumes with identical
final state (north_rule: per-partition lineage; SURVEY §4 checkpoint row)."""

import json
import os

import pyarrow.parquet as pq

from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl


def _cfg(small_corpus_dir, out_dir, **kw):
    return CrawlConfig(
        corpus_dir=small_corpus_dir,
        out_dir=out_dir,
        seed_urls=["https://host0.example"],
        num_seen_shards=2,
        num_buckets=8,
        max_pages=None,
        **kw,
    )


def test_resume_matches_fresh_run(ray_session, small_corpus_dir, tmp_path):
    # golden: uninterrupted run
    fresh = crawl(_cfg(small_corpus_dir, str(tmp_path / "fresh")))
    assert fresh.rounds >= 3

    # interrupted run: stop after 2 rounds (simulated kill)
    out = str(tmp_path / "resumed")
    partial = crawl(_cfg(small_corpus_dir, out, max_rounds=2))
    assert partial.rounds == 2
    # round checkpoints exist: frontier segment + seen shards + manifest
    rdir = os.path.join(out, "rounds", "round=1")
    assert os.path.exists(os.path.join(rdir, "frontier.parquet"))
    assert os.path.exists(os.path.join(rdir, "seen", "shard0.bin"))
    with open(os.path.join(rdir, "manifest.json")) as f:
        assert json.load(f)["complete"] is True

    # resume to completion
    resumed = crawl(_cfg(small_corpus_dir, out, resume=True))
    assert resumed.rounds == fresh.rounds
    assert resumed.order.equals(fresh.order)
    assert resumed.seen.equals(fresh.seen)

    uo_fresh = pq.read_table(os.path.join(str(tmp_path / "fresh"), "urls_out"))
    uo_res = pq.read_table(os.path.join(out, "urls_out"))
    assert uo_res.num_rows == uo_fresh.num_rows
    assert sorted(uo_res["url"].to_pylist()) == sorted(uo_fresh["url"].to_pylist())


def test_resume_matches_fresh_adjacency_via_disk(
    ray_session, small_corpus_dir, tmp_path
):
    """Resume in the 10^10-scale adjacency mode (emit_links=False +
    post-loop disk replay) must also reconverge to the fresh run."""
    fresh = crawl(_cfg(small_corpus_dir, str(tmp_path / "fresh")))
    out = str(tmp_path / "res_disk")
    crawl(_cfg(small_corpus_dir, out, max_rounds=2, adjacency_via_disk=True))
    resumed = crawl(
        _cfg(small_corpus_dir, out, resume=True, adjacency_via_disk=True)
    )
    assert resumed.order.equals(fresh.order)
    assert resumed.seen.equals(fresh.seen)


def test_resume_noop_when_no_checkpoint(ray_session, small_corpus_dir, tmp_path):
    """resume=True on an empty out_dir falls back to a fresh run."""
    res = crawl(_cfg(small_corpus_dir, str(tmp_path / "empty"), resume=True))
    assert res.metrics["totals"]["visited"] > 0
