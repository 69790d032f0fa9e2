"""Link/text extraction parity tests — ported behavioral contracts from
reference tests/test_parser.py (SURVEY §5)."""

from simple_crawler_ray.functions.linkextract import (
    extract_hrefs,
    extract_links,
    extract_text,
)

PAGE = """<html><head><title>t</title><style>p{}</style>
<script>var x=1;</script></head>
<body>
<a href="/rel1">relative</a>
<a href="https://site.com/abs1">absolute same-domain</a>
<a href="https://other.com/x">cross-domain</a>
<a href="javascript:void(0)">js</a>
<a name="no-href">no href</a>
<a href="/rel1">duplicate</a>
<p>hello   world</p>
</body></html>"""


def test_relative_href_joined():
    # reference tests/test_parser.py:16-34
    links = extract_links("https://site.com/base", PAGE)
    assert "https://site.com/rel1" in links


def test_same_domain_kept_cross_domain_dropped():
    links = extract_links("https://site.com/base", PAGE)
    assert "https://site.com/abs1" in links
    assert all("other.com" not in l for l in links)


def test_javascript_href_dropped():
    # reference tests/test_parser.py:104-110 — javascript: has no netloc
    links = extract_links("https://site.com/base", PAGE)
    assert all(not l.startswith("javascript:") for l in links)


def test_document_order_first_occurrence_unique():
    links = extract_links("https://site.com/base", PAGE)
    assert links == ["https://site.com/rel1", "https://site.com/abs1"]


def test_href_missing_anchor_skipped():
    assert extract_hrefs('<a name="x">y</a>') == []


def test_empty_and_malformed_input():
    assert extract_links("https://site.com", "") == []
    assert extract_links("https://site.com", "<a href='/x'") == []  # truncated tag


def test_extract_text_skips_script_style_and_collapses_ws():
    text = extract_text(PAGE)
    assert "var x=1" not in text
    assert "p{}" not in text
    assert "hello world" in text
    assert "  " not in text


def test_extract_text_deterministic():
    assert extract_text(PAGE) == extract_text(PAGE)
