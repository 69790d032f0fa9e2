"""CLI entry point — reference parity: simple_crawler/cli.py:10-25
(``url``, ``--max-pages``, ``--retries``, ``--check_every``) plus the
rebuild's corpus/output knobs.

Owns the Ray session (library code never calls ray.init; SURVEY §3.1).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="simple-crawler-ray",
        description="Ray-Data-native crawl over a Parquet page corpus",
    )
    p.add_argument("url", nargs="+", help="seed URL(s) (reference cli.py:11)")
    p.add_argument(
        "--corpus", required=True, help="corpus directory containing pages.parquet"
    )
    p.add_argument("--out", required=True, help="run output directory")
    p.add_argument(
        "--max-pages",
        type=int,
        default=None,
        help="page budget (reference default 10, configuration.py:28; "
        "omit to crawl to exhaustion)",
    )
    p.add_argument(
        "--retries", type=int, default=3, help="fetch retries per url (cli.py:13)"
    )
    p.add_argument(
        "--round-seconds",
        type=float,
        default=None,
        help="politeness token-bucket window per round (the rebuild's "
        "enforcement of Crawl-delay; reference check_every analogue)",
    )
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-sitemap", action="store_true")
    p.add_argument(
        "--no-backoff",
        action="store_true",
        help="disable the 429-equivalent per-host budget decay (ST7)",
    )
    p.add_argument(
        "--adjacency-via-disk",
        action="store_true",
        help="10^10-scale adjacency: rounds return url-only metadata and "
        "the final replay re-reads persisted parts in parallel Ray tasks",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.crawl import CrawlConfig, crawl

    run_id = args.run_id or "run_cli"
    cfg = CrawlConfig(
        corpus_dir=args.corpus,
        out_dir=args.out,
        seed_urls=args.url,
        max_pages=args.max_pages,
        use_sitemap=not args.no_sitemap,
        run_id=run_id,
        retries=args.retries,
        round_seconds=args.round_seconds,
        resume=args.resume,
        backoff_enabled=not args.no_backoff,
        adjacency_via_disk=args.adjacency_via_disk,
    )
    res = crawl(cfg)
    print(json.dumps(res.metrics["totals"]))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
