"""robots.txt parsing + politeness rules.

Reference parity (simple_crawler/downloader.py:24-44):
- ``can_fetch(url)``: fetch ``{scheme}://{netloc}/robots.txt``, parse, check
  ``can_fetch("*", url)``; on ANY error (missing robots, parse failure)
  **default allow** (downloader.py:33-34).
- ``read_politeness_info``: robots → (sitemaps, request_rate("*"),
  crawl_delay("*")) (downloader.py:36-44). The reference reads crawl_delay
  but never enforces it; the rebuild enforces it as a per-host token bucket
  (north_star), which affects only scheduling, never the final crawl graph.

protego is not available in this environment; we use the stdlib
``urllib.robotparser.RobotFileParser``, which supports the same surface
(can_fetch / crawl_delay / request_rate / site_maps). Corpus robots.txt
files are self-generated and use only Disallow/Crawl-delay/Sitemap lines,
on which the two parsers agree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.robotparser import RobotFileParser

__all__ = ["HostRules", "parse_robots", "RulesIndex"]


@dataclass
class HostRules:
    """Parsed politeness rules for one host."""

    host: str
    robots_text: str | None = None  # None → no robots.txt → allow-all
    crawl_delay: float | None = None
    request_rate: tuple[int, int] | None = None  # (requests, seconds)
    sitemaps: list[str] = field(default_factory=list)
    # fast path: when the robots file is only simple `Disallow: <prefix>`
    # rules for `User-agent: *`, these prefixes are RobotFileParser-exact
    # and the gate can evaluate them vectorized; None → complex robots →
    # per-URL RobotFileParser fallback
    simple_disallow_prefixes: list[str] | None = field(default=None)
    _rp: RobotFileParser | None = field(default=None, repr=False, compare=False)

    def can_fetch(self, url: str) -> bool:
        """Reference default-allow semantics (downloader.py:33-34)."""
        if self._rp is None:
            return True
        try:
            return self._rp.can_fetch("*", url)
        except Exception:
            return True


def _simple_prefixes(robots_text: str) -> list[str] | None:
    """Extract Disallow prefixes iff the file is the simple shape
    (single `User-agent: *` group, no Allow/wildcard/$ rules) where
    prefix matching is exactly RobotFileParser's longest-match result."""
    prefixes: list[str] = []
    for raw in robots_text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if val != "*":
                return None
        elif key == "disallow":
            if not val:
                continue  # empty Disallow ⇒ allow all (no rule)
            if "*" in val or "$" in val:
                return None
            prefixes.append(val)
        elif key == "allow":
            return None
        elif key in ("crawl-delay", "request-rate", "sitemap"):
            continue
        else:
            return None
    return prefixes


def parse_robots(host: str, robots_text: str | None) -> HostRules:
    """Parse robots.txt text into HostRules (once per host — the reference
    re-fetches+re-parses per URL, downloader.py:24-34; see SURVEY §2.1 S3)."""
    rules = HostRules(host=host, robots_text=robots_text)
    if robots_text is None:
        return rules
    try:
        rp = RobotFileParser()
        rp.parse(robots_text.splitlines())
        rules._rp = rp
        rules.crawl_delay = rp.crawl_delay("*")
        rr = rp.request_rate("*")
        if rr is not None:
            rules.request_rate = (rr.requests, rr.seconds)
        rules.sitemaps = list(rp.site_maps() or [])
        rules.simple_disallow_prefixes = _simple_prefixes(robots_text)
    except Exception:
        rules._rp = None  # default allow
    return rules


class RulesIndex:
    """host → HostRules lookup built from the corpus' robots.txt pages.

    Small-side broadcast object: the driver builds it once (one robots page
    per host), ``ray.put``s it, and every politeness/gate task reads it —
    no shuffle, no per-batch reshipping (SURVEY §4 / ray_guide joins).
    """

    def __init__(self, robots_by_host: dict[str, str | None]):
        self._rules = {h: parse_robots(h, t) for h, t in robots_by_host.items()}

    def for_host(self, host: str) -> HostRules:
        host = host.lower()
        rules = self._rules.get(host)
        if rules is None:
            rules = HostRules(host=host)  # unknown host → allow-all
            self._rules[host] = rules
        return rules

    def can_fetch(self, url: str) -> bool:
        from .urlkit import host_of

        return self.for_host(host_of(url)).can_fetch(url)

    def hosts(self) -> list[str]:
        return sorted(self._rules)
