"""RunReader — programmatic run-output access (reference data_conn.py
parity, README.md:68-75)."""

from simple_crawler_ray.pipelines.crawl import CrawlConfig, crawl
from simple_crawler_ray.reader import RunReader


def test_read_bucket_rows_prunes_row_groups(tmp_path):
    """Row-group pruning must return every frontier row that exists while
    decoding only row groups whose url range overlaps the frontier."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_crawler_ray.sources.pages import read_bucket_rows

    urls = [f"https://h.example/p{i:05d}" for i in range(1000)]
    t = pa.table({"url": pa.array(urls), "html": pa.array([b"x"] * 1000, pa.binary())})
    path = str(tmp_path / "bucket.parquet")
    pq.write_table(t.sort_by("url"), path, row_group_size=100)

    # frontier hits only the first and last row groups
    wanted = sorted(["https://h.example/p00003", "https://h.example/p00999"])
    out = read_bucket_rows(path, wanted, ["url", "html"])
    got = set(out["url"].to_pylist())
    assert set(wanted) <= got
    assert out.num_rows <= 200  # 2 of 10 row groups decoded, not 1000 rows

    # no overlap → empty, correct schema
    none = read_bucket_rows(path, ["https://zzz.example/x"], ["url", "html"])
    assert none.num_rows == 0
    assert none.schema.names == ["url", "html"]


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
