"""Arrow schemas + status codes for every table the engine reads/writes.

The reference declares its durable schemas in YAML → SQLite DDL
(simple_crawler/config/sqlite.yml, loader configuration.py:80-101); the
rebuild declares them as ``pyarrow.schema`` constants (SURVEY §2.9).
"""

from __future__ import annotations

from enum import IntEnum

import pyarrow as pa


class CrawlStatus(IntEnum):
    """Crawl status lifecycle — values per reference cache.py:13-21."""

    ERROR = -2
    DISALLOWED = -1
    FRONTIER = 0
    DOWNLOADED = 1
    PARSED = 2
    CLOSED = 3


# Input corpus (BASELINE.json input_hint): Common-Crawl-style pages.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Frontier rows carried between rounds. (depth, seq) is the deterministic
# ordering key standing in for the reference's LIFO Redis list (cache.py:86,96).
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_sha1", pa.binary()),
        ("depth", pa.int32()),
        ("discovered_round", pa.int32()),
        ("parent_url", pa.string()),
        ("retry_count", pa.int32()),
    ]
)

# Post-fetch/extract rows (before html is dropped).
FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("req_status", pa.int32()),
        ("crawl_status", pa.int8()),
        ("text", pa.string()),
        ("linked_urls", pa.list_(pa.string())),
        ("round", pa.int32()),
    ]
)

# Final output table — reference `urls` table shape (config/sqlite.yml:29-58).
URLS_OUT_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("seed_url", pa.string()),
        ("url", pa.string()),
        ("content", pa.binary()),
        ("req_status", pa.int32()),
        ("crawl_status", pa.int8()),
        ("linked_urls", pa.list_(pa.string())),
        ("created_at", pa.timestamp("s")),
    ]
)

# Crawl-order output (golden conformance target; FIXTURES.md §3.1).
CRAWL_ORDER_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("req_status", pa.int32()),
        ("crawl_status", pa.int8()),
    ]
)

# URL-seen set output (download_requests parity; FIXTURES.md §3.2).
SEEN_SCHEMA = pa.schema([("url", pa.string()), ("url_sha1", pa.binary())])

# Sitemap metadata output — reference `sitemaps` table (config/sqlite.yml:60-95,
# fields SITEMAP_FEILDS mapper.py:15).
SITEMAPS_OUT_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("seed_url", pa.string()),
        ("url", pa.string()),
        ("index_url", pa.string()),
        ("loc", pa.string()),
        ("priority", pa.string()),
        ("frequency", pa.string()),
        ("modified", pa.string()),
        ("status", pa.string()),
    ]
)
