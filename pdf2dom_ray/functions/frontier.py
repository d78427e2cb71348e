"""Crawl-frontier filtering: robots.txt decisions over link targets.

The step between link extraction and fetch scheduling: every frontier
URL is checked against its host's robots rules (engine/robots.py).
Rules are per-host state — parsed ONCE per actor in ``__init__`` from
a broadcast host→robots map (``ray.put``), then each batch is a pure
lookup + precompiled-regex match. At real crawl scale the robots map
for the hosts in flight is small (rules, not pages); if it ever
outgrew a broadcast, the scale path is hash-partitioning the frontier
by host and joining per-host rules — same shape as every keyed lookup
in this repo.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pyarrow as pa
import ray
import ray.data as rd

from ..stages.pool import default_pool

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


class FrontierFilter:
    """Actor-pool UDF: (target,...) rows → + allowed flag."""

    def __init__(self, robots_ref, *, agent: str = "pdf2dom-ray") -> None:
        from ..engine.robots import parse_robots
        robots_by_host = ray.get(robots_ref)
        self._rules = {host: parse_robots(txt, agent=agent)
                       for host, txt in robots_by_host.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        allowed = []
        for u in t.column("target").to_pylist():
            parts = urlsplit(u)
            rules = self._rules.get(parts.netloc.lower())
            # no robots.txt for a host -> allowed (RFC 9309 §2.3.1.2)
            allowed.append(True if rules is None
                           else rules.allowed(parts.path or "/"))
        return t.append_column("allowed", pa.array(allowed, pa.bool_()))


def filter_frontier(targets: rd.Dataset,
                    robots_by_host: dict[str, bytes], *,
                    agent: str = "pdf2dom-ray",
                    concurrency=None) -> rd.Dataset:
    """Annotate frontier rows with the robots decision."""
    if concurrency is None:
        concurrency = default_pool()
    ref = ray.put(robots_by_host)
    return targets.map_batches(
        FrontierFilter, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"agent": agent},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
