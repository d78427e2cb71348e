"""robots.txt parsing and URL matching (RFC 9309 subset).

The crawl-frontier side of a web pipeline: before fetching (or when
filtering an extracted link frontier), every target URL is checked
against its host's robots rules. Implemented per the Robots Exclusion
Protocol as standardized in RFC 9309 + the de-facto Google semantics:

* ``User-agent`` groups; the group chosen is the longest
  user-agent token that is a case-insensitive substring match of the
  product token, falling back to ``*``;
* ``Allow`` / ``Disallow`` path rules with ``*`` wildcards and a
  ``$`` end anchor;
* most-specific (longest-pattern, in octets) rule wins; on a tie
  between Allow and Disallow, **Allow wins**;
* no matching rule, empty Disallow, or no group → allowed.

``RobotsRules`` precompiles each pattern to a regex once (rules are
per-host state, built once per actor in the filtering stage — not per
batch, and never per URL).
"""

from __future__ import annotations

import re

__all__ = ["RobotsRules", "parse_robots"]


def _compile(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile(".*".join(parts) + ("$" if anchored else ""))


class RobotsRules:
    """Matched-group rules for one host; ``allowed(path)`` decides."""

    def __init__(self, rules: list[tuple[bool, str]]) -> None:
        # (allow, raw_pattern) — precompile, keep octet length for
        # specificity ranking
        self._rules = [(allow, len(raw.encode("utf-8")), _compile(raw))
                       for allow, raw in rules if raw]

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for allow, plen, rx in self._rules:
            if rx.match(path):
                # longest wins; tie -> Allow wins (allow=True sorts up)
                if plen > best_len or (plen == best_len and allow):
                    best_len = plen
                    best_allow = allow
        return best_allow


def parse_robots(text: str | bytes, *, agent: str = "*") -> RobotsRules:
    """Parse a robots.txt body, selecting the group for ``agent``."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    agent_l = agent.lower()

    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_group_body = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, in_group_body = [], [], False

    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            cur_rules.append((field == "allow", value))
        # sitemap/crawl-delay etc.: ignored, do not split groups
    flush()

    # group selection: longest user-agent token contained in `agent`
    best: list[tuple[bool, str]] | None = None
    best_len = -1
    star: list[tuple[bool, str]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif a in agent_l and len(a) > best_len:
                best, best_len = rules, len(a)
    chosen = best if best is not None else (star or [])
    return RobotsRules(chosen)
