"""Page-corpus source: one-time hash-bucketing + pruned point-lookup reads.

"Fetch" in the rebuild is a lookup of frontier URLs in the Parquet page
corpus (the stand-in for live HTTP GET, SURVEY §2.4 J3). A naive
frontier ⋈ corpus join would scan the full corpus EVERY round — at 100 TB
that is the difference between an O(frontier) round and an O(corpus) round.

So the corpus is bucketed ONCE by ``sha1(canonicalize(url))[:4] % B`` into B
Parquet files (a Ray Data job: add bucket column → write partitioned), and
each round reads ONLY the bucket files containing frontier URLs, filtering
batches against a broadcast (``ray.put``) frontier URL set inside
``map_batches`` — a broadcast semi-join, no shuffle (ray_guide: joins).

The bucket layout is also the resumable unit: bucketing is skipped when the
``_BUCKETS_OK`` manifest exists.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

from ..functions.urlkit import canonicalize

__all__ = [
    "url_bucket",
    "bucket_array",
    "ensure_bucketed",
    "bucket_files_for",
    "load_meta_docs",
]


def url_bucket(url: str, num_buckets: int) -> int:
    d = hashlib.sha1(canonicalize(url).encode("utf-8")).digest()
    return int.from_bytes(d[:4], "big") % num_buckets


def bucket_array(urls: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    return pa.array(
        [url_bucket(u, num_buckets) for u in urls.to_pylist()], pa.int32()
    )


def ensure_bucketed(
    pages_path: str, out_dir: str, num_buckets: int = 32
) -> str:
    """Bucket the corpus once. Returns the bucket directory.

    Runs as a Ray Data pipeline: read → add bucket column →
    ``groupby(bucket).map_groups`` writing ONE consolidated Parquet file
    per bucket. Consolidation matters: a naive partitioned write emits one
    file per executor block (measured 6,112 tiny files for a 60k-page
    corpus), and every crawl round then pays thousands of micro-tasks +
    admission pushes instead of ~num_buckets uniform ones. One file per
    bucket keeps round tasks at the intended ~corpus/num_buckets
    granularity; at 100 TB, num_buckets is sized so each bucket lands at
    the 128-256 MB Parquet sweet spot and the one-time groupby shuffle is
    the documented prep cost (resumable via the marker).
    """
    import ray.data as rd

    layout_version = 3  # 3 = consolidated one-file-per-bucket, url-sorted
    marker = os.path.join(out_dir, "_BUCKETS_OK")
    if (
        os.path.exists(marker)
        and os.path.exists(os.path.join(out_dir, "_host_counts.parquet"))
        and os.path.isdir(os.path.join(out_dir, "_meta_docs"))
    ):
        try:
            with open(marker) as f:
                if json.load(f).get("layout") == layout_version:
                    return out_dir
        except Exception:
            pass
    if os.path.exists(out_dir):  # stale layout (older bucketize version)
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("bucket", bucket_array(batch["url"], num_buckets))

    def write_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq2

        b = group["bucket"][0].as_py()
        d = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        # sort by url so parquet row-group min/max stats support row-group
        # pruning at fetch time (read_bucket_rows) — a frontier that touches
        # k of a bucket's row groups decodes k*row_group_size rows, not the
        # whole bucket
        _pq2.write_table(
            group.drop_columns(["bucket"]).sort_by("url"),
            os.path.join(d, "part-0.parquet"),
            row_group_size=4096,
        )
        return pa.table({"bucket": pa.array([b], pa.int32())})

    (
        rd.read_parquet(pages_path)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    # tiny per-host page-count side table: feeds hot-host salting without
    # ever loading a URL index to the driver (corpus misses are detected
    # exactly by the post-fetch found-diff in pipelines/crawl.py, so no
    # driver-resident corpus URL structure exists at any scale)
    import pyarrow.parquet as _pq

    from ..functions.urlkit import host_of as _host_of

    def host_partial(batch: pa.Table) -> pa.Table:
        hosts = [_host_of(u) for u in batch["url"].to_pylist()]
        vc = pa.table({"host": pa.array(hosts, pa.string())}).group_by("host").aggregate(
            [("host", "count")]
        )
        return pa.table({"host": vc["host"], "n": vc["host_count"]})

    partials = (
        rd.read_parquet(pages_path, columns=["url"])
        .map_batches(host_partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray as _ray

    merged = pa.concat_tables([t for t in _ray.get(partials) if t.num_rows])
    counts = merged.group_by("host").aggregate([("n", "sum")])
    _pq.write_table(
        pa.table({"host": counts["host"], "n": counts["n_sum"]}),
        os.path.join(out_dir, "_host_counts.parquet"),
    )
    # host-metadata side table (robots.txt + sitemap docs): one small file
    # so rules loading + sitemap seeding never scan the corpus again
    import pyarrow.compute as _pc

    meta = rd.read_parquet(pages_path).map_batches(
        lambda t: t.filter(
            _pc.or_(
                _pc.ends_with(t["url"], pattern="/robots.txt"),
                _pc.ends_with(t["url"], pattern=".xml"),
            )
        ),
        batch_format="pyarrow",
    )
    meta.write_parquet(os.path.join(out_dir, "_meta_docs"))
    with open(marker, "w") as f:
        json.dump({"num_buckets": num_buckets, "source": pages_path, "layout": layout_version}, f)
    return out_dir


def load_meta_docs(bucket_dir: str) -> dict[str, str]:
    """url → decoded text of robots.txt + sitemap docs (see ensure_bucketed)."""
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(bucket_dir, "_meta_docs")).to_table(
        columns=["url", "html"]
    )
    return {
        u: h.decode("utf-8", errors="replace")
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())
    }


# process-local bucket-file memo: (mtime_ns, size) → open ParquetFile +
# decoded per-row-group url [min, max] stats. A crawl touches the same
# bucket files EVERY round (driver fast path and worker tasks alike), and
# footer parse + per-row-group stats decode were paid per round per file;
# values are invalidated by mtime/size so a re-bucketized corpus can
# never serve stale handles.
_PF_CACHE: dict = {}
_PF_CACHE_CAP = 256


def _bucket_file(path: str):
    import pyarrow.parquet as _pq

    st = os.stat(path)
    key = (st.st_mtime_ns, st.st_size)
    ent = _PF_CACHE.get(path)
    if ent is not None and ent[0] == key:
        return ent[1], ent[2]
    pf = _pq.ParquetFile(path)
    md = pf.metadata
    stats = None
    if "url" in pf.schema_arrow.names:
        url_idx = pf.schema_arrow.names.index("url")
        stats = []
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(url_idx).statistics
            if s is None or s.min is None or s.max is None:
                stats.append(None)
            else:
                stats.append(
                    (
                        s.min if isinstance(s.min, str) else s.min.decode(),
                        s.max if isinstance(s.max, str) else s.max.decode(),
                    )
                )
    if len(_PF_CACHE) >= _PF_CACHE_CAP:
        _PF_CACHE.clear()
    _PF_CACHE[path] = (key, pf, stats)
    return pf, stats


def read_bucket_rows(
    path: str, sorted_urls: list[str], columns: list[str]
) -> pa.Table:
    """Row-group-pruned point read of one url-sorted bucket file: a row
    group is decoded only if its [min, max] url range can contain a
    frontier URL (binary search against the sorted frontier list). Rows
    still need the exact membership filter afterwards — this prunes I/O
    and decode, not semantics. Falls back to a full read when stats are
    missing. File handles + stats are memoized per process
    (``_bucket_file``)."""
    import bisect

    pf, stats = _bucket_file(path)
    if stats is None:
        return pf.read(columns=columns)
    keep: list[int] = []
    for rg, rg_stats in enumerate(stats):
        if rg_stats is None:
            keep.append(rg)
            continue
        lo, hi = rg_stats
        i = bisect.bisect_left(sorted_urls, lo)
        if i < len(sorted_urls) and sorted_urls[i] <= hi:
            keep.append(rg)
    if not keep:
        return pf.schema_arrow.empty_table().select(columns)
    return pf.read_row_groups(keep, columns=columns)


def bucket_files_for(
    bucket_dir: str, buckets: set[int]
) -> list[str]:
    """Parquet paths for the given bucket ids (hive-partitioned layout)."""
    paths: list[str] = []
    for b in sorted(buckets):
        d = os.path.join(bucket_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    return paths
