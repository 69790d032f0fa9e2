"""Conformance of the distributed Ray crawl against the serial golden
oracle: identical crawl order, URL-seen set, and byte-identical extracted
text per url (BASELINE.json north_rule / input_hint)."""

import glob

import pyarrow.parquet as pq
import pytest

from simple_crawler_ray.functions.robots import RulesIndex
from simple_crawler_ray.functions.urlkit import host_of
from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl
from simple_crawler_ray.pipelines.serial_oracle import serial_crawl
from simple_crawler_ray.schemas import CrawlStatus


@pytest.fixture(scope="module")
def corpus_bits(small_corpus_dir):
    t = pq.read_table(f"{small_corpus_dir}/pages.parquet")
    corpus = {
        u: h.decode() for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())
    }
    rules = RulesIndex(
        {host_of(u): h for u, h in corpus.items() if u.endswith("/robots.txt")}
    )
    return corpus, rules


def _order_tuples(order_table):
    return list(
        zip(
            order_table["seq"].to_pylist(),
            order_table["url"].to_pylist(),
            order_table["depth"].to_pylist(),
            order_table["parent_url"].to_pylist(),
            order_table["req_status"].to_pylist(),
            order_table["crawl_status"].to_pylist(),
        )
    )


def _run(small_corpus_dir, tmp_path, **kw):
    cfg = CrawlConfig(
        corpus_dir=small_corpus_dir,
        out_dir=str(tmp_path / "run"),
        seed_urls=kw.pop("seed_urls", ["https://host0.example"]),
        num_seen_shards=2,
        num_buckets=8,
        **kw,
    )
    return crawl(cfg)


@pytest.mark.parametrize("budget", [15, None])
def test_order_and_seen_parity(
    ray_session, small_corpus_dir, corpus_bits, tmp_path, budget
):
    corpus, rules = corpus_bits
    golden = serial_crawl(
        corpus, ["https://host0.example"], max_pages=budget or 10**9, rules=rules
    )
    res = _run(small_corpus_dir, tmp_path, max_pages=budget)
    assert _order_tuples(res.order) == golden.order
    assert res.seen["url"].to_pylist() == golden.seen


def test_byte_identical_text(ray_session, small_corpus_dir, corpus_bits, tmp_path):
    """Extracted text of every parsed url matches the corpus golden text
    column byte-for-byte (input_hint invariant)."""
    corpus, rules = corpus_bits
    res = _run(small_corpus_dir, tmp_path, max_pages=25)
    pages = pq.read_table(
        f"{small_corpus_dir}/pages.parquet", columns=["url", "text"]
    )
    golden_text = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    fetched = pq.read_table(
        glob.glob(f"{res.out_dir}/rounds/round=*/fetched/*.parquet"),
        columns=["url", "text"],
    )
    assert fetched.num_rows > 0
    for u, text in zip(fetched["url"].to_pylist(), fetched["text"].to_pylist()):
        assert text == golden_text[u], u


def test_urls_out_shape(ray_session, small_corpus_dir, tmp_path):
    res = _run(small_corpus_dir, tmp_path, max_pages=15, run_id="t1")
    uo = pq.read_table(f"{res.out_dir}/urls_out")
    assert uo.num_rows == 15
    assert uo.schema.names == [
        "run_id",
        "seed_url",
        "url",
        "content",
        "req_status",
        "crawl_status",
        "linked_urls",
        "created_at",
    ]
    assert set(uo["run_id"].to_pylist()) == {"t1"}
    # parsed rows carry html content; closed rows carry null
    for st, content in zip(uo["crawl_status"].to_pylist(), uo["content"].to_pylist()):
        if st == int(CrawlStatus.PARSED):
            assert content is not None and content.startswith(b"<html>")


def test_urls_out_join_path_matches_broadcast(
    ray_session, small_corpus_dir, tmp_path, monkeypatch
):
    """The writer's large-scale path (Dataset.join hash shuffle) must
    produce the same urls_out rows as the small-crawl broadcast path."""
    from simple_crawler_ray.pipelines import crawl as crawl_mod

    res_b = _run(small_corpus_dir, tmp_path / "b", max_pages=15, run_id="tj")
    monkeypatch.setattr(crawl_mod, "_URLS_OUT_BROADCAST_MAX", 0)
    res_j = _run(small_corpus_dir, tmp_path / "j", max_pages=15, run_id="tj")

    def canon(path):
        t = pq.read_table(f"{path}/urls_out").drop_columns(["created_at"])
        return t.sort_by("url").to_pylist()

    assert canon(res_j.out_dir) == canon(res_b.out_dir)


def test_politeness_deferral_changes_schedule_not_outputs(
    ray_session, small_corpus_dir, corpus_bits, tmp_path
):
    """Token bucket (round_seconds) defers fetches but never changes the
    final order/seen (scheduling-only; stages/politeness.py)."""
    corpus, rules = corpus_bits
    golden = serial_crawl(corpus, ["https://host0.example"], max_pages=12, rules=rules)
    res = _run(
        small_corpus_dir, tmp_path, max_pages=12, round_seconds=10.0
    )
    assert sum(m["deferred"] for m in res.metrics["rounds"]) > 0
    assert _order_tuples(res.order) == golden.order
    assert res.seen["url"].to_pylist() == golden.seen


def test_multi_seed_and_no_sitemap(
    ray_session, small_corpus_dir, corpus_bits, tmp_path
):
    corpus, rules = corpus_bits
    seeds = ["https://host1.example", "https://host2.example"]
    golden = serial_crawl(corpus, seeds, max_pages=20, rules=rules, use_sitemap=False)
    res = _run(
        small_corpus_dir, tmp_path, seed_urls=seeds, max_pages=20, use_sitemap=False
    )
    assert _order_tuples(res.order) == golden.order
    assert res.seen["url"].to_pylist() == golden.seen


def test_sitemaps_out_table(ray_session, small_corpus_dir, tmp_path):
    """Reference sitemaps-table shape (config/sqlite.yml:60-95): one row per
    urlset doc, first-<url>-only fields (mapper.py:63-79)."""
    res = _run(small_corpus_dir, tmp_path, max_pages=5)
    sm = pq.read_table(f"{res.out_dir}/sitemaps.parquet")
    assert sm.num_rows == 2  # two urlset docs per host
    assert sm["priority"].to_pylist() == ["0.8", "0.8"]
    assert sm["frequency"].to_pylist() == ["daily", "daily"]
    assert sm["status"].to_pylist() == ["Success", "Success"]
    assert all(i.endswith("/sitemap-index.xml") for i in sm["index_url"].to_pylist())


def test_metrics_emitted(ray_session, small_corpus_dir, tmp_path):
    res = _run(small_corpus_dir, tmp_path, max_pages=None)
    totals = res.metrics["totals"]
    assert totals["fetched"] > 0
    assert totals["disallowed"] > 0  # /private pages
    assert totals["errors"] > 0  # /dead links
    assert totals["visited"] == totals["fetched"] + totals["errors"] + totals["disallowed"]
    for m in res.metrics["rounds"]:
        assert {"fetched", "deduped", "deferred", "wall_sec"} <= set(m)


def test_ray_data_round_path_matches_task_path(
    ray_session, small_corpus_dir, tmp_path
):
    """Rounds dispatch as plain Ray tasks up to task_round_max_files and
    as a Ray Data streaming execution above it; both paths must produce
    the identical crawl (task_round_max_files=0 forces every distributed
    round through the streaming path; small_round_threshold=0 keeps the
    driver fast path out of the comparison)."""
    res_task = _run(
        tmp_path=tmp_path / "t",
        small_corpus_dir=small_corpus_dir,
        small_round_threshold=0,
    )
    res_stream = _run(
        tmp_path=tmp_path / "s",
        small_corpus_dir=small_corpus_dir,
        small_round_threshold=0,
        task_round_max_files=0,
    )
    assert res_task.order.equals(res_stream.order)
    assert sorted(res_task.seen["url"].to_pylist()) == sorted(
        res_stream.seen["url"].to_pylist()
    )
