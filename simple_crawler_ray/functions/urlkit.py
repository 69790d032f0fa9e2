"""URL parsing / canonicalization / hashing helpers.

Reference parity:
- ``parse_url`` mirrors simple_crawler/utils.py:12-15 (urlparse → scheme,
  netloc, path).
- The reference deduplicates on the *raw absolutized* URL string (Redis SADD,
  cache.py:93); canonicalization + SHA-1 is the rebuild's addition (north_star)
  used for hash-partitioning and Bloom membership, while exact-confirm still
  compares raw URL strings so parity with SADD semantics is preserved.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlparse

__all__ = [
    "parse_url",
    "host_of",
    "canonicalize",
    "url_sha1",
    "shard_of",
    "absolutize",
]


def parse_url(url: str) -> tuple[str, str, str]:
    """Split a URL into (scheme, netloc, path). cf. reference utils.py:12-15."""
    p = urlparse(url)
    return p.scheme, p.netloc, p.path


def host_of(url: str) -> str:
    """Netloc (host[:port]) of a URL, lower-cased."""
    return urlparse(url).netloc.lower()


def canonicalize(url: str) -> str:
    """Canonical form used for hashing/partitioning (NOT for dedup equality).

    Lower-case scheme+host, strip default ports, drop fragment, empty path
    → "/". Query string preserved. The seen-set still stores raw URLs for
    exact SADD parity (reference cache.py:93); this canonical form only feeds
    SHA-1 partition keys and the Bloom pre-filter.
    """
    p = urlparse(url)
    scheme = p.scheme.lower()
    netloc = p.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = p.path or "/"
    out = f"{scheme}://{netloc}{path}"
    if p.query:
        out += f"?{p.query}"
    return out


def url_sha1(url: str) -> bytes:
    """SHA-1 digest (20 bytes) of the canonicalized URL (north_star)."""
    return hashlib.sha1(canonicalize(url).encode("utf-8")).digest()


def shard_of(url: str, num_shards: int, salt: dict[str, int] | None = None) -> int:
    """Stable shard id for the seen-set actor pool: hash of the *host* so all
    URLs of one host land on one shard (host-affine partitioning; SURVEY §7.3).

    ``salt`` maps HOT hosts to a salt factor k>1: their URLs spread over k
    consecutive shards (keyed by hash(url), so routing stays deterministic
    per url) — the explicit hot-host salting of the north_star. Dedup
    exactness is unaffected: a url always routes to the same shard.
    """
    host = host_of(url)
    h = hashlib.sha1(host.encode("utf-8")).digest()
    base = int.from_bytes(h[:4], "big")
    if salt:
        k = salt.get(host, 1)
        if k > 1:
            hu = hashlib.sha1(url.encode("utf-8")).digest()
            base += int.from_bytes(hu[:4], "big") % k
    return base % num_shards


def absolutize(base_url: str, href: str) -> str:
    """urljoin, identical call to reference parser.py:32-33."""
    return urljoin(base_url, href)
