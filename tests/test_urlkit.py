"""Unit tests for URL helpers (reference utils.py:12-15 parity + rebuild
canonicalization, SURVEY §2.7 / north_star)."""

import hashlib

from simple_crawler_ray.functions.urlkit import (
    absolutize,
    canonicalize,
    host_of,
    parse_url,
    shard_of,
    url_sha1,
)


def test_parse_url():
    assert parse_url("https://example.com/a/b?q=1") == ("https", "example.com", "/a/b")


def test_host_of_lowercases():
    assert host_of("https://EXAMPLE.com/x") == "example.com"


def test_canonicalize():
    assert canonicalize("HTTPS://Example.COM") == "https://example.com/"
    assert canonicalize("https://example.com:443/a#frag") == "https://example.com/a"
    assert canonicalize("http://example.com:80/a?x=1") == "http://example.com/a?x=1"
    # non-default port preserved
    assert canonicalize("http://example.com:8080/") == "http://example.com:8080/"


def test_url_sha1_is_sha1_of_canonical():
    u = "https://Example.com/page"
    assert url_sha1(u) == hashlib.sha1(canonicalize(u).encode()).digest()
    assert len(url_sha1(u)) == 20


def test_shard_is_host_affine():
    # all URLs of one host land on one shard (SURVEY §7.3)
    a = shard_of("https://hostA.example/p1", 16)
    b = shard_of("https://hostA.example/deep/q?z=2", 16)
    assert a == b
    assert 0 <= a < 16


def test_absolutize_matches_urljoin():
    assert absolutize("https://e.com/a/b", "/c") == "https://e.com/c"
    assert absolutize("https://e.com/a/", "c") == "https://e.com/a/c"
