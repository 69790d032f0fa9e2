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
    "url_sha1_batch",
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


# URLs matching this are their own canonical form (lowercase scheme+host,
# no port, non-empty path, no fragment/params), so canonicalize() can be
# skipped — same fast-lane idiom as linkextract's urljoin-exact lanes.
# ';' is excluded because urlparse splits it into params, which
# canonicalize drops; ':' in the host class is excluded so any port
# (default or not) takes the slow lane.
_CANONICAL_RE = r"^https?://[a-z0-9._\-]+/[^#;]*$"


def url_sha1_batch(urls) -> list[bytes]:
    """Vectorized ``url_sha1`` over an Arrow array / list of URLs: one
    regex pass classifies canonical-shaped URLs (the overwhelming
    majority of a crawl), which hash directly; the rest fall back to
    ``canonicalize``. ~6× faster than the per-URL path at 10^4+ URLs —
    the final replay's seen-table build was dominated by urlparse."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(urls, pa.string())
    fast = pc.match_substring_regex(urls, _CANONICAL_RE).to_numpy(
        zero_copy_only=False
    )
    sha1 = hashlib.sha1
    return [
        sha1(u.encode("utf-8")).digest()
        if f
        else sha1(canonicalize(u).encode("utf-8")).digest()
        for u, f in zip(urls.to_pylist(), fast)
    ]


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
