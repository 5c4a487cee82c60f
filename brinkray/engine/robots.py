"""robots.txt: parsing and per-domain policy.

Absent from the reference (SURVEY §2.11) — mandated by the north rule.
Semantics: RFC 9309 longest-match — the most specific matching rule
(longest prefix) wins; Allow beats Disallow on equal length; no match
=> allowed. Group selection: exact user-agent token match,
case-insensitive, falling back to ``*``.

Placement in the crawl: the robots filter runs right after
normalization, BEFORE the seen check — a disallowed URL is never
fetched, never marked, never replayed, and drops identically on every
rediscovery. The single-process oracle applies the same policy at the
same point, so robots-enabled runs stay oracle-diffable.

Robots bodies come from the pages table itself (``{domain}/robots.txt``
rows) — in the sandbox the web IS the table; a real deployment fetches
them through the same Fetcher session.
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["Rule", "parse_robots", "parse_crawl_delay", "RobotsPolicy"]


@dataclass(frozen=True)
class Rule:
    allow: bool
    prefix: str


def parse_robots(text: str, agent: str = "*") -> list[Rule]:
    """Extract the rule group applying to ``agent`` (fallback ``*``)."""
    groups: dict[str, list[Rule]] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
            last_was_agent = True
        elif key in ("disallow", "allow"):
            last_was_agent = False
            if not current_agents:
                continue
            if value == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            for a in current_agents:
                groups.setdefault(a, []).append(Rule(key == "allow", value))
        else:
            last_was_agent = False
    al = agent.lower()
    if al in groups:
        return groups[al]
    return groups.get("*", [])


def parse_crawl_delay(text: str, agent: str = "*") -> float | None:
    """``Crawl-delay`` seconds for ``agent`` (same group-selection
    semantics as :func:`parse_robots`: exact agent token, else ``*``).
    Not part of RFC 9309 but the de-facto politeness extension most
    large sites ship; invalid / non-positive values are ignored."""
    delays: dict[str, float] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            last_was_agent = True
        elif key == "crawl-delay":
            last_was_agent = False
            try:
                d = float(value)
            except ValueError:
                continue
            if d > 0:
                for a in current_agents:
                    delays[a] = d
        else:
            last_was_agent = False
    al = agent.lower()
    if al in delays:
        return delays[al]
    return delays.get("*")


@dataclass
class RobotsPolicy:
    """domain -> rules (+ Crawl-delay seconds); built once, shipped
    into task closures (small)."""

    rules: dict[str, tuple[Rule, ...]] = field(default_factory=dict)
    agent: str = "*"
    crawl_delays: dict[str, float] = field(default_factory=dict)

    @classmethod
    def from_pages(cls, robots_bodies: dict[str, str], agent: str = "*") -> "RobotsPolicy":
        delays = {}
        for d, txt in robots_bodies.items():
            cd = parse_crawl_delay(txt, agent)
            if cd is not None:
                delays[d] = cd
        return cls(
            rules={
                d: tuple(parse_robots(txt, agent))
                for d, txt in robots_bodies.items()
            },
            agent=agent,
            crawl_delays=delays,
        )

    def allowed(self, domain: str, path: str) -> bool:
        rules = self.rules.get(domain)
        if not rules:
            return True
        best_len = -1
        best_allow = True
        for r in rules:
            if path.startswith(r.prefix) and len(r.prefix) >= best_len:
                if len(r.prefix) > best_len or r.allow:
                    best_allow = r.allow
                best_len = len(r.prefix)
        return best_allow
