"""extract_page (fused single-pass extractor) must be byte-identical to the
two-pass extract_text + extract_links on every corpus page and on edge-case
href shapes (it is the crawl hot path)."""

import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from simple_crawler_ray.functions.linkextract import (
    extract_links,
    extract_page,
    extract_text,
)

EDGE_PAGES = [
    ("https://site.com/a/b", '<a href="/root">r</a><a href="rel">x</a>'),
    ("https://site.com", '<a href="https://site.com/x?q=1#f">q</a>'),
    ("https://site.com", '<a href="http://site.com/x">scheme-diff</a>'),
    ("https://site.com", '<a href="//site.com/pp">protocol-relative</a>'),
    ("https://site.com", '<a href="javascript:void(0)">js</a>'),
    ("https://site.com", '<a href="">empty</a>'),
    ("https://site.com", '<a href="HTTPS://SITE.com/Y">case</a>'),
    ("https://site.com", '<a href="mailto:x@y.z">mail</a>'),
    ("https://site.com:8080/p", '<a href="/x">port</a><a href="https://site.com:8080/z">abs</a>'),
    ("https://site.com", '<style>a{}</style><script>s</script><p>t  x</p>'),
]


def test_edge_pages_equivalent():
    for url, html in EDGE_PAGES:
        assert extract_page(url, html) == (
            extract_text(html),
            extract_links(url, html),
        ), (url, html)


def test_corpus_pages_equivalent(small_corpus_dir):
    t = pq.read_table(f"{small_corpus_dir}/pages.parquet", columns=["url", "html"])
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        html = html.decode()
        assert extract_page(url, html) == (
            extract_text(html),
            extract_links(url, html),
        ), url


@settings(max_examples=200, deadline=None)
@given(
    href=st.text(
        alphabet="abc/:.?#%&=_-~ \t" + "hps", min_size=0, max_size=30
    )
)
def test_random_hrefs_equivalent(href):
    url = "https://host0.example/p/q"
    html = f'<a href="{href}">x</a>'
    assert extract_page(url, html) == (extract_text(html), extract_links(url, html))
