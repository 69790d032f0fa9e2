"""Programmatic access to a crawl run's outputs — the rebuild of the
reference's `data_conn.py` consumer (reads the per-run SQLite `urls` table,
README.md:68-75) over the run directory's Parquet layout.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

__all__ = ["RunReader"]


class RunReader:
    """Read the durable outputs of a crawl run directory."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def urls(self, columns: list[str] | None = None) -> pa.Table:
        """The `urls_out` table (reference `urls`, config/sqlite.yml:29-58)."""
        return pads.dataset(os.path.join(self.out_dir, "urls_out")).to_table(
            columns=columns
        )

    def crawl_order(self) -> pa.Table:
        return pq.read_table(os.path.join(self.out_dir, "crawl_order.parquet"))

    def seen(self) -> pa.Table:
        return pq.read_table(os.path.join(self.out_dir, "seen.parquet"))

    def sitemaps(self) -> pa.Table:
        return pq.read_table(os.path.join(self.out_dir, "sitemaps.parquet"))

    def sitemap_indexes(self) -> dict:
        with open(os.path.join(self.out_dir, "sitemap_indexes.json")) as f:
            return json.load(f)

    def run_events(self) -> list[dict]:
        with open(os.path.join(self.out_dir, "run_manifest.json")) as f:
            return json.load(f)

    def metrics(self) -> dict:
        with open(os.path.join(self.out_dir, "metrics.json")) as f:
            return json.load(f)

    def extracted_text(self) -> pa.Table:
        """(url, text) for every fetched page across all rounds."""
        import glob

        parts = glob.glob(
            os.path.join(self.out_dir, "rounds", "round=*", "fetched", "*.parquet")
        )
        return pads.dataset(parts).to_table(columns=["url", "text"])
