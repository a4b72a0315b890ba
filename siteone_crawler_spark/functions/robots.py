"""robots.txt parsing and path matching.

Reimplements (from observed public behavior) the reference's robots engine:
parser at /root/reference/src/engine/robots_txt.rs:42-98, matcher at :175-223,
wired into the enqueue pipeline at src/engine/crawler.rs:1107-1128.

Semantics:
  - only `User-agent: *` and `User-agent: SiteOne-Crawler` sections are
    honored (case-insensitive);
  - `Allow:` overrides `Disallow:`;
  - patterns are prefix matches with `*` wildcards and a `$` end anchor,
    case-insensitive;
  - an empty `Disallow:` value allows everything;
  - static-asset extensions (js/css/images/fonts) are ALWAYS allowed;
  - `#` comments stripped; `Sitemap:` lines are collected but the reference
    never enqueues them — we preserve that (fixtures assert it).

Rules are tiny per host: they live in a small DataFrame broadcast to the
executors; evaluation happens inside the frontier filter pandas UDF (robots
`*`/`$` wildcards are not Catalyst-expressible).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

HONORED_AGENTS = ("*", "siteone-crawler")

# always-allowed asset extensions (robots_txt.rs asset override)
_ASSET_EXT_RE = re.compile(
    r"\.(js|css|png|jpe?g|gif|webp|avif|ico|svg|woff2?|ttf|otf|eot)(\?.*)?$",
    re.IGNORECASE,
)


@dataclass
class RobotsRules:
    disallowed: list[str] = field(default_factory=list)
    allowed: list[str] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)
    # NORTH-RULE SUPERSET: the reference parses robots.txt but ignores
    # Crawl-delay entirely (verified: zero matches in /root/reference/src).
    # The engine's politeness scheduler honors it per host.
    crawl_delay: float | None = None

    def to_rows(self, host: str) -> list[tuple[str, str, str]]:
        """Flatten to (host, rule_type, pattern) rows for the broadcast table."""
        rows = [(host, "disallow", p) for p in self.disallowed]
        rows += [(host, "allow", p) for p in self.allowed]
        rows += [(host, "sitemap", p) for p in self.sitemaps]
        return rows


def parse_robots(body: str) -> RobotsRules:
    rules = RobotsRules()
    if not body:
        return rules
    active = False
    seen_agent_line = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        field_name, _, value = line.partition(":")
        field_name = field_name.strip().lower()
        value = value.strip()
        if field_name == "user-agent":
            # a new agent group begins; within a group multiple UA lines stack
            if seen_agent_line:
                active = value.lower() in HONORED_AGENTS
                seen_agent_line = False
            else:
                active = active or value.lower() in HONORED_AGENTS
            continue
        if field_name == "sitemap":
            rules.sitemaps.append(value)
            seen_agent_line = True
            continue
        seen_agent_line = True
        if not active:
            continue
        if field_name == "disallow":
            if value:  # empty Disallow allows everything
                rules.disallowed.append(value)
        elif field_name == "allow":
            if value:
                rules.allowed.append(value)
        elif field_name == "crawl-delay":
            try:
                rules.crawl_delay = float(value)
            except ValueError:
                pass
    return rules


import functools


@functools.lru_cache(maxsize=65536)
def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored_end else ""), re.IGNORECASE)


def path_matches(pattern: str, path: str) -> bool:
    """robots-style prefix match with * wildcards and $ end anchor."""
    if not pattern:
        return False
    return _pattern_to_regex(pattern).match(path) is not None


def is_allowed(rules: RobotsRules | None, path: str) -> bool:
    """Allow overrides Disallow; assets always allowed; no rules => allowed."""
    if rules is None:
        return True
    if _ASSET_EXT_RE.search(path or ""):
        return True
    for pat in rules.allowed:
        if path_matches(pat, path):
            return True
    for pat in rules.disallowed:
        if path_matches(pat, path):
            return False
    return True


def compile_rules_map(robots_bodies: dict[str, str]) -> dict[str, RobotsRules]:
    """host -> parsed rules, suitable for a Spark broadcast variable."""
    return {host: parse_robots(body) for host, body in robots_bodies.items()}
