"""Crawl-frontier filtering: robots.txt decisions over link targets.

The step between link extraction and fetch scheduling: every frontier
URL is checked against its host's robots rules (engine/robots.py).
The filter is a driver-built instance shipped per task (rules are KBs
of compiled regexes — broadcast-lookup state, not per-actor warm
state, so no actor pool; see CLAUDE.md). Host/path splitting is
Arrow-vectorized; only the per-path rule match itself is a Python
call, and only for rows whose host actually has rules. At real crawl
scale the robots map for the hosts in flight is small (rules, not
pages); if it ever outgrew the shipped instance, the scale path is
hash-partitioning the frontier by host and joining per-host rules —
same shape as every keyed lookup in this repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["SYNTH_ROBOTS", "filter_frontier"]

# deterministic fixture rules for the synth host (the SQL oracle
# hardcodes the resulting decisions): /r* blocked except /r2 exactly
# via longest-match Allow; /buy blocked with a $ anchor; badbot
# group must NOT apply to our agent
SYNTH_ROBOTS = (b"User-agent: badbot\nDisallow: /\n\n"
                b"User-agent: *\n"
                b"Disallow: /r\n"
                b"Allow: /r2$\n"
                b"Disallow: /buy$\n"
                b"Allow: /\n")


_URL_RE = (r"^[A-Za-z][A-Za-z0-9+.\-]*://"
           r"(?P<host>[^/?#]*)(?P<path>/[^?#]*)?")


def _split_host_path(urls: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Vectorized (host, path) split: ONE Arrow ``extract_regex``
    (RE2) kernel over the column — equivalent to ``urlsplit`` for the
    absolute http(s) URLs a frontier carries. Non-matching rows (no
    scheme) get a null host → treated as rule-less → allowed."""
    parts = pc.extract_regex(urls, _URL_RE)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    path = pc.fill_null(pc.struct_field(parts, "path"), "/")
    return host, path


class FrontierFilter:
    """Driver-built, task-shipped UDF: (target,...) rows → + allowed."""

    def __init__(self, robots_by_host: dict[str, bytes], *,
                 agent: str = "pdf2dom-ray") -> None:
        from ..engine.robots import parse_robots
        self._rules = {host.lower(): parse_robots(txt, agent=agent)
                       for host, txt in robots_by_host.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        host, path = _split_host_path(t.column("target").combine_chunks()
                                      if isinstance(t.column("target"),
                                                    pa.ChunkedArray)
                                      else t.column("target"))
        hosts = host.to_numpy(zero_copy_only=False)
        # no robots.txt for a host -> allowed (RFC 9309 §2.3.1.2);
        # rule matching runs only on rows whose host has rules
        allowed = np.ones(len(hosts), dtype=bool)
        ruled = np.array([h in self._rules for h in hosts], dtype=bool)
        if ruled.any():
            paths = path.to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(ruled)
            allowed[idx] = [self._rules[hosts[i]].allowed(paths[i])
                            for i in idx]
        return t.append_column("allowed",
                               pa.array(allowed, pa.bool_()))


def filter_frontier(targets: rd.Dataset,
                    robots_by_host: dict[str, bytes], *,
                    agent: str = "pdf2dom-ray",
                    concurrency=None) -> rd.Dataset:
    """Annotate frontier rows with the robots decision."""
    fn = FrontierFilter(robots_by_host, agent=agent)
    return targets.map_batches(fn, batch_format="pyarrow")
