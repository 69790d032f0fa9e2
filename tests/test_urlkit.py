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


def test_url_sha1_batch_matches_scalar():
    """The regex fast lane must agree with per-URL canonicalize+sha1 on
    every shape that exercises a lane boundary."""
    import pyarrow as pa

    from simple_crawler_ray.functions.urlkit import url_sha1, url_sha1_batch

    urls = [
        "https://host0.example/p1",          # fast lane
        "http://host.example/a b?q=1&x=2",   # space + query, fast lane
        "https://HOST.example/p",            # uppercase host -> slow
        "HTTPS://host.example/p",            # uppercase scheme -> slow
        "https://host.example",              # empty path -> slow ("/" added)
        "http://host.example:80/p",          # default port stripped -> slow
        "https://host.example:443/p",        # default port stripped -> slow
        "https://host.example:8080/p",       # nonstandard port -> slow (kept)
        "https://host.example/p#frag",       # fragment dropped -> slow
        "https://host.example/p;x=1",        # params dropped -> slow
        "https://user@host.example/p",       # userinfo -> slow
        "https://host.example/P/Q.HTML",     # uppercase path stays, fast
    ]
    assert url_sha1_batch(urls) == [url_sha1(u) for u in urls]
    assert url_sha1_batch(pa.array(urls)) == [url_sha1(u) for u in urls]
    assert url_sha1_batch([]) == []


def test_shard_of_batch_matches_scalar():
    """shard_of_batch (fast host lane + memoized base) must equal the
    scalar shard_of for every URL shape, salted and unsalted."""
    from simple_crawler_ray.functions.urlkit import shard_of, shard_of_batch

    urls = [
        "https://host0.example/p1",
        "http://host1.example:80/a?q=1#f",
        "https://HOST2.Example/Path",
        "https://host3.example",
        "https://user@host4.example/x",
        "ftp://host5.example/y",
        "https://host0.example/p2?a=b",
        "http://host6.example#frag",
        # WHATWG whitespace stripping: urlparse removes \t\r\n anywhere,
        # so the fast lane must fall back for these (round-3 ADVICE #2)
        "https://host7.ex\tample/p",
        "https://host8.example/a\nb",
        "http://ho\rst9.example/x",
        "https://\thost0.example/p1",
    ] * 3
    salt = {"host0.example": 3, "host1.example": 2}
    for s in (None, salt):
        batch = shard_of_batch(urls, 8, s)
        scalar = [shard_of(u, 8, s) for u in urls]
        assert batch == scalar, (s, batch, scalar)
