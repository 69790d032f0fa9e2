"""Deterministic synthetic web-graph corpus generator.

Produces the input table of BASELINE.json input_hint —
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
— as a link-closed multi-host web graph (FIXTURES.md §1):

- H hosts with Zipf-skewed page counts (≥1 hot host exercises salting/skew);
- each page's ``html`` embeds ``<a href>`` outlinks closed over the corpus:
  relative hrefs, absolute same-host, cross-host (filtered by the same-domain
  predicate, reference parser.py:38), and invalid (``javascript:void(0)``,
  reference tests/test_parser.py:104-110);
- per host: ``/robots.txt`` (Disallow + Crawl-delay + Sitemap lines),
  ``/sitemap-index.xml`` + member ``/sitemap{k}.xml`` urlsets;
- some links point at ``/private...`` (robots-disallowed → 403 path) and at
  ``/dead...`` pages absent from the corpus (fetch-error path);
- ``text`` is computed with ``functions.linkextract.extract_text`` — the
  byte-identical-text-per-url golden.

Everything is a pure function of (seed, size knobs); no external data.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.linkextract import extract_text

__all__ = ["CorpusSpec", "generate_corpus", "corpus_path", "ensure_corpus"]

_WORDS = (
    "data ray crawl frontier page link host graph arrow batch actor shard "
    "bloom filter queue stream block shuffle spill token bucket robots delay "
    "index text corpus parquet schema column vector engine round epoch"
).split()


@dataclass(frozen=True)
class CorpusSpec:
    """Size knobs; all derived deterministically from these + seed."""

    n_pages: int = 200  # total content pages across hosts (excl. robots/sitemaps)
    n_hosts: int = 5
    branch: int = 8  # spanning-tree branch factor (diameter ≈ log_branch(n))
    extra_links: int = 6  # extra random same-host links per page
    cross_links: int = 2  # cross-host links per page (must be filtered out)
    n_paragraphs: int = 4
    dead_frac: float = 0.03  # fraction of pages linking to a missing page
    private_frac: float = 0.04  # fraction of pages that are robots-disallowed
    seed: int = 42

    @staticmethod
    def for_sf(sf: float, seed: int = 42) -> "CorpusSpec":
        n_pages = max(200, int(round(sf * 200_000)))
        n_hosts = max(5, int(round(sf * 80)))
        # bigger corpora get a wider tree so crawl diameter stays small
        branch = 8 if n_pages < 5_000 else 32
        return CorpusSpec(n_pages=n_pages, n_hosts=n_hosts, branch=branch, seed=seed)

    @staticmethod
    def for_scaling(sf: float, seed: int = 42) -> "CorpusSpec":
        """Scaling-leg corpus: same page count as the bench corpus but
        ~3× the text per page (~18 KB — much closer to real web-page
        weight than the 6 KB bench pages). The scaling criterion compares
        the SAME job at two CPU counts; heavier pages make the
        distributed work dominate the per-job fixed cost (round
        launches + serial replay ≈ constant seconds) the way a
        production-size corpus would — at 10^10 URLs that fixed cost is
        noise, and a 60k-page toy corpus must not let it dominate the
        measurement."""
        base = CorpusSpec.for_bench(sf, seed)
        return CorpusSpec(
            n_pages=base.n_pages,
            n_hosts=base.n_hosts,
            branch=base.branch,
            extra_links=base.extra_links,
            n_paragraphs=90,
            seed=seed,
        )

    @staticmethod
    def for_bench(sf: float, seed: int = 42) -> "CorpusSpec":
        """Bench corpus: more pages and heavier HTML (~10 KB, dozens of
        links — much closer to real page weight than the tiny test pages)
        so extraction compute — not pipeline fixed cost — dominates and
        scaling across CPU counts is observable."""
        n_pages = max(2_000, int(round(sf * 600_000)))
        n_hosts = max(8, int(round(sf * 160)))
        return CorpusSpec(
            n_pages=n_pages,
            n_hosts=n_hosts,
            branch=32,
            extra_links=40,
            n_paragraphs=30,
            seed=seed,
        )


def _host_sizes(spec: CorpusSpec) -> list[int]:
    """Zipf-skewed page counts per host (host0 is the hot host)."""
    w = 1.0 / np.arange(1, spec.n_hosts + 1, dtype=np.float64)
    w /= w.sum()
    sizes = np.maximum(3, np.floor(w * spec.n_pages).astype(np.int64))
    return sizes.tolist()


def _page_path(i: int) -> str:
    return "/" if i == 0 else f"/p{i}"


def _host_seed(spec: CorpusSpec, h: int) -> int:
    # independent per-host streams so hosts can generate in parallel
    return (spec.seed * 1_000_003 + h * 9973) % (2**31 - 1)


def _gen_host(
    host: str, n: int, spec: CorpusSpec, rng: np.random.RandomState
) -> tuple[list[dict], str, list[tuple[str, str]]]:
    """Generate one host's pages. Returns (page rows, robots_text,
    [(sitemap_url, xml)])."""
    base = f"https://{host}"
    urls = [base + _page_path(i) for i in range(n)]
    n_private = max(1, int(n * spec.private_frac)) if n >= 10 else 0
    private_paths = [f"/private{j}" for j in range(n_private)]
    private_urls = [base + p for p in private_paths]

    crawl_delay = 1 + (zlib.crc32(host.encode()) % 3)  # deterministic per host
    robots_lines = ["User-agent: *"]
    robots_lines += [f"Disallow: {p}" for p in ["/private"]]
    robots_lines += [f"Crawl-delay: {crawl_delay}"]
    robots_lines += [f"Sitemap: {base}/sitemap-index.xml"]
    robots_text = "\n".join(robots_lines) + "\n"

    rows: list[dict] = []
    for i in range(n):
        url = urls[i]
        # spanning tree children guarantee reachability from the root
        children = [
            c for c in range(i * spec.branch + 1, i * spec.branch + 1 + spec.branch) if c < n
        ]
        extra = rng.randint(0, n, size=spec.extra_links).tolist()
        hrefs: list[str] = []
        for c in children:
            # mix relative and absolute same-host forms (reference handles both
            # via urljoin, parser.py:32-33)
            hrefs.append(_page_path(c) if (i + c) % 2 == 0 else urls[c])
        hrefs += [_page_path(e) for e in extra]
        if n_private and i % max(2, int(1 / spec.private_frac)) == 0:
            hrefs.append(private_paths[i % n_private])
        if spec.dead_frac and i % max(2, int(1 / spec.dead_frac)) == 1:
            hrefs.append(f"/dead{i}")
        # cross-host links: same-domain predicate must drop these
        cross_hosts = rng.randint(0, spec.n_hosts, size=spec.cross_links)
        hrefs += [f"https://host{ch}.example/" for ch in cross_hosts]
        hrefs.append("javascript:void(0)")

        paras = []
        for k in range(spec.n_paragraphs):
            widx = rng.randint(0, len(_WORDS), size=24)
            paras.append("<p>" + " ".join(_WORDS[w] for w in widx) + f" #{i}.{k}</p>")
        anchors = "\n".join(f'<a href="{h}">link {j}</a>' for j, h in enumerate(hrefs))
        html = (
            f"<html><head><title>{host} page {i}</title>"
            f"<style>p{{margin:0}}</style>"
            f"<script>var x={i};</script></head>\n"
            f"<body><h1>{host} page {i}</h1>\n" + "\n".join(paras) + "\n" + anchors +
            "\n</body></html>"
        )
        rows.append({"url": url, "html": html, "kind": "page"})

    for purl in private_urls:
        rows.append(
            {
                "url": purl,
                "html": f"<html><body><h1>private {purl}</h1></body></html>",
                "kind": "page",
            }
        )

    # sitemaps: index → 2 urlset members; the FIRST <url> of the first urlset
    # is the host root (the reference admits only the first <url> per urlset,
    # mapper.py:70 + SURVEY §2.2 M8, so seeding lands on the root).
    n_sm = 2
    sm_urls = [f"{base}/sitemap{k}.xml" for k in range(n_sm)]
    idx_xml = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<sitemapindex>\n"
        + "\n".join(f"  <sitemap><loc>{u}</loc></sitemap>" for u in sm_urls)
        + "\n</sitemapindex>\n"
    )
    sitemap_docs = [(f"{base}/sitemap-index.xml", idx_xml)]
    for k, su in enumerate(sm_urls):
        first = urls[0] if k == 0 else urls[min(1, n - 1)]
        entries = (
            f"  <url><loc>{first}</loc><priority>0.8</priority>"
            f"<changefreq>daily</changefreq><lastmod>2023-01-0{k + 1}</lastmod></url>"
        )
        # extra <url> entries that the faithful mode must IGNORE (mapper.py:70)
        for j in range(2, min(5, n)):
            entries += f"\n  <url><loc>{urls[j]}</loc><priority>0.5</priority></url>"
        sitemap_docs.append(
            (su, "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<urlset>\n" + entries + "\n</urlset>\n")
        )
    return rows, robots_text, sitemap_docs


def _host_rows(spec: CorpusSpec, h: int, n: int) -> list[dict]:
    """All rows of one host (pages + robots + sitemaps); deterministic in
    (spec, h) — safe to generate hosts in parallel."""
    host = f"host{h}.example"
    rng = np.random.RandomState(_host_seed(spec, h))
    rows, robots_text, sitemap_docs = _gen_host(host, n, spec, rng)
    rows.append(
        {"url": f"https://{host}/robots.txt", "html": robots_text, "kind": "robots"}
    )
    rows.extend({"url": su, "html": xml, "kind": "sitemap"} for su, xml in sitemap_docs)
    return rows


def _rows_to_table(all_rows: list[dict], ts_offset: int = 0) -> pa.Table:
    urls = [r["url"] for r in all_rows]
    htmls = [r["html"].encode("utf-8") for r in all_rows]
    texts = [
        extract_text(r["html"]) if r["kind"] == "page" else "" for r in all_rows
    ]
    langs = ["en" if i % 17 else ("de" if i % 2 else "fr") for i in range(len(all_rows))]
    base_ts = 1_700_000_000 + ts_offset
    ts = [base_ts + i for i in range(len(all_rows))]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("s")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_corpus(spec: CorpusSpec) -> pa.Table:
    """Build the full pages table (content pages + robots + sitemaps).

    Hosts generate in parallel as Ray tasks when a Ray session is up and
    the corpus is big (generation + golden-text extraction is CPU-bound);
    per-host seeds keep the output byte-identical either way.
    """
    sizes = _host_sizes(spec)
    use_ray = False
    if spec.n_pages >= 20_000:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False

    offsets = np.cumsum([0] + [s + 10 for s in sizes[:-1]])  # stable-ish ts per host
    if use_ray:
        import ray

        gen = ray.remote(
            lambda sp, h, n, off: _rows_to_table(_host_rows(sp, h, n), off)
        )
        tables = ray.get(
            [gen.remote(spec, h, n, int(offsets[h])) for h, n in enumerate(sizes)]
        )
    else:
        tables = [
            _rows_to_table(_host_rows(spec, h, n), int(offsets[h]))
            for h, n in enumerate(sizes)
        ]
    return pa.concat_tables(tables)


_GEN_VERSION = 2  # bump when the generation algorithm changes (cache key)


def corpus_path(spec: CorpusSpec, root: str = "/tmp/scr_corpus") -> str:
    key = (
        f"v{_GEN_VERSION}_n{spec.n_pages}_h{spec.n_hosts}_b{spec.branch}"
        f"_p{spec.n_paragraphs}_e{spec.extra_links}_s{spec.seed}"
    )
    return os.path.join(root, key)


def ensure_corpus(spec: CorpusSpec, root: str = "/tmp/scr_corpus") -> str:
    """Generate-once cache. Returns a directory containing ``pages.parquet``
    (row-grouped so Ray can split blocks) and ``spec.json``."""
    d = corpus_path(spec, root)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    table = generate_corpus(spec)
    pq.write_table(
        table, os.path.join(d, "pages.parquet"), row_group_size=4096
    )
    with open(os.path.join(d, "spec.json"), "w") as f:
        json.dump(asdict(spec), f)
    with open(marker, "w") as f:
        f.write("ok")
    return d
