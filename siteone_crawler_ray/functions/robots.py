"""robots.txt parsing + allow-checks with the reference's exact semantics.

Behavioral parity with /root/reference/src/engine/robots_txt.rs:
- only ``User-agent: *`` and ``User-agent: SiteOne-Crawler`` sections
  contribute rules (:61-63); ``Sitemap:`` lines are collected from any
  section; ``#`` comments stripped; empty Disallow ignored.
- frontend assets (js/css/json/fonts/images) are ALWAYS allowed
  regardless of rules (:8-10, 107) — the substring regex matches
  anywhere in the URL, a quirk we keep for seen-set parity.
- Allow overrides Disallow; matching is case-insensitive prefix, with
  ``*`` wildcards matched by sequential earliest-find (NOT regex
  backtracking — the ``$``-anchored + wildcard combination inherits the
  reference's earliest-find behavior) and a ``$`` end anchor meaning
  exact equality when no wildcard is present (:174-223).

Rules are parsed once per host on the driver and shipped to fetch /
filter actors as a broadcast dict (``ray.put``), so the per-candidate
check is a cheap in-memory lookup — no shuffle, no re-parse per batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

ASSET_EXTENSION_RE = re.compile(
    r"\.(js|css|json|eot|ttf|woff2|woff|otf|png|gif|jpg|jpeg|ico|webp|avif|tif|bmp|svg)",
    re.I,
)
_UA_RE = re.compile(r"^User-agent:\s*(.*)", re.I)
_DISALLOW_RE = re.compile(r"^Disallow:\s*(.*)", re.I)
_ALLOW_RE = re.compile(r"^Allow:\s*(.*)", re.I)
_SITEMAP_RE = re.compile(r"^Sitemap:\s*(.*)", re.I)

RELEVANT_AGENTS = ("*", "SiteOne-Crawler")


def _wildcard_match(url_path_lower: str, pattern: str, exact_end: bool) -> bool:
    """Sequential earliest-find wildcard matching (robots_txt.rs:196-223)."""
    parts = pattern.split("*")
    search_from = 0
    for i, part in enumerate(parts):
        if not part:
            continue
        pos = url_path_lower.find(part.lower(), search_from)
        if pos < 0:
            return False
        if i == 0 and pos != 0:
            return False
        search_from = pos + len(part)
    if exact_end:
        return search_from == len(url_path_lower)
    return True


def path_matches(url_path: str, pattern: str) -> bool:
    """robots_txt.rs:174-192 — prefix / wildcard / ``$`` anchor matching."""
    low = url_path.lower()
    if pattern.endswith("$"):
        body = pattern[:-1]
        if "*" in body:
            return _wildcard_match(low, body, True)
        return low == body.lower()
    if "*" in pattern:
        return _wildcard_match(low, pattern, False)
    return low.startswith(pattern.lower())


@dataclass(frozen=True)
class RobotsRules:
    """Parsed rules for one host. Hashable/picklable → broadcastable."""

    disallowed: tuple[str, ...] = ()
    allowed: tuple[str, ...] = ()
    sitemaps: tuple[str, ...] = ()

    def is_allowed(self, url: str) -> bool:
        if ASSET_EXTENSION_RE.search(url):
            return True
        if not self.disallowed:
            return True
        path = _extract_path(url)
        for a in self.allowed:
            if path_matches(path, a):
                return True
        for d in self.disallowed:
            if path_matches(path, d):
                return False
        return True


def _extract_path(url: str) -> str:
    if "://" in url:
        rest = url.split("://", 1)[1]
        slash = rest.find("/")
        path = rest[slash:] if slash >= 0 else "/"
    else:
        path = url
    q = path.find("?")
    # full-URL form keeps its query out of the path (url::Url::path());
    # bare-path form strips at '?' too (robots_txt.rs:117-125)
    return path[:q] if q >= 0 else path


def parse_robots(content: str) -> RobotsRules:
    disallowed: list[str] = []
    allowed: list[str] = []
    sitemaps: list[str] = []
    current_ua: str | None = None
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if m := _UA_RE.match(line):
            current_ua = m.group(1).strip()
        elif current_ua in RELEVANT_AGENTS:
            if m := _DISALLOW_RE.match(line):
                if p := m.group(1).strip():
                    disallowed.append(p)
            elif m := _ALLOW_RE.match(line):
                if p := m.group(1).strip():
                    allowed.append(p)
        if m := _SITEMAP_RE.match(line):
            if s := m.group(1).strip():
                sitemaps.append(s)
    return RobotsRules(tuple(disallowed), tuple(allowed), tuple(sitemaps))


@dataclass
class RobotsIndex:
    """host → RobotsRules map; the broadcast small side for filter stages.

    ``None`` rules (no robots.txt for a host) → everything allowed, same
    as the reference's Option<RobotsTxt> (crawler.rs:1453-1471).
    """

    by_host: dict[str, RobotsRules] = field(default_factory=dict)

    @classmethod
    def from_bodies(cls, bodies: dict[str, str]) -> "RobotsIndex":
        return cls({h: parse_robots(b) for h, b in bodies.items()})

    def is_allowed(self, host: str, url: str) -> bool:
        rules = self.by_host.get(host)
        return True if rules is None else rules.is_allowed(url)
