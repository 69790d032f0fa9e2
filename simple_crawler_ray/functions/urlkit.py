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
    "shard_of_batch",
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


# worker-persistent host → shard-base memo (hosts repeat massively in any
# crawl stream; values are pure functions of the host so staleness cannot
# exist; bounded by the clear-at-cap safety valve)
_HOST_BASE_CACHE: dict[str, int] = {}
_HOST_BASE_CAP = 1_000_000


def _fast_host_of(url: str) -> str:
    """host_of fast lane: substring parse for plain http(s)://host/...
    URLs (no userinfo/query/fragment oddities in the authority), exact
    urlparse fallback otherwise. Must return EXACTLY host_of's value —
    shard routing everywhere keys off it (asserted by property test).
    urlparse strips tab/CR/LF anywhere in the URL (WHATWG rule) — the
    substring lane can't, so those fall back too (round-3 ADVICE #2)."""
    if "\t" in url or "\r" in url or "\n" in url:
        return host_of(url)
    if url.startswith("https://"):
        rest = url[8:]
    elif url.startswith("http://"):
        rest = url[7:]
    else:
        return host_of(url)
    end = len(rest)
    for stop in ("/", "?", "#"):
        i = rest.find(stop)
        if 0 <= i < end:
            end = i
    host = rest[:end]
    if "@" in host:
        return host_of(url)
    return host.lower()


def shard_of_batch(
    urls, num_shards: int, salt: dict[str, int] | None = None
) -> list[int]:
    """Vectorized ``shard_of`` over a sequence of URLs: fast host parse +
    memoized per-host base digest (one sha1 per DISTINCT host instead of
    one urlparse + sha1 per URL — the driver-side admit path and the
    candidate explode were spending ~7 µs/url here, 3.4 s of a 500k-url
    admission stream). Identical output to per-url ``shard_of``."""
    cache = _HOST_BASE_CACHE
    out: list[int] = []
    _sha1 = hashlib.sha1
    for u in urls:
        host = _fast_host_of(u)
        base = cache.get(host)
        if base is None:
            if len(cache) >= _HOST_BASE_CAP:
                cache.clear()
            base = int.from_bytes(_sha1(host.encode("utf-8")).digest()[:4], "big")
            cache[host] = base
        if salt:
            k = salt.get(host, 1)
            if k > 1:
                base = base + (
                    int.from_bytes(_sha1(u.encode("utf-8")).digest()[:4], "big") % k
                )
        out.append(base % num_shards)
    return out


def absolutize(base_url: str, href: str) -> str:
    """urljoin, identical call to reference parser.py:32-33."""
    return urljoin(base_url, href)
