"""RunReader — programmatic run-output access (reference data_conn.py
parity, README.md:68-75)."""

from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl
from simple_crawler_ray.reader import RunReader


def test_run_reader_surfaces(ray_session, small_corpus_dir, tmp_path):
    res = crawl(
        CrawlConfig(
            corpus_dir=small_corpus_dir,
            out_dir=str(tmp_path / "run"),
            seed_urls=["https://host0.example"],
            max_pages=10,
            num_seen_shards=2,
            num_buckets=8,
            run_id="rr",
        )
    )
    rd = RunReader(res.out_dir)
    urls = rd.urls()
    assert urls.num_rows == 10
    assert rd.urls(columns=["url"]).schema.names == ["url"]
    assert rd.crawl_order().num_rows == 10
    assert rd.seen().num_rows >= 10
    assert rd.sitemaps().num_rows == 2
    assert rd.sitemap_indexes()
    assert [e["event"] for e in rd.run_events()] == ["start", "complete"]
    assert rd.metrics()["totals"]["visited"] == 10
    text = rd.extracted_text()
    assert set(text.schema.names) == {"url", "text"}
    assert text.num_rows > 0
