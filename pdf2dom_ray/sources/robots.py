"""robots.txt source: RFC 9309 rule files → normalized rule rows.

``read_robots(paths)`` is a file-parallel Ray Data source (the
``sources/warc.py`` / ``sources/sitemap.py`` layout): one read task
per ``robots_{host}.txt`` file, emitting Arrow blocks of
``(host, agent, seq, field, value)`` — the normalized rule relation a
crawl scheduler joins against its frontier (the per-host decision
kernel itself lives in ``engine/robots.py``; this source feeds rule
ANALYTICS: coverage, crawl-delay distributions, sitemap discovery).

Format handling (RFC 9309 §2.2):

* groups start at one or more consecutive ``User-agent`` lines (all
  of which share the group's rules); a blank line only ends a group
  once rules have been seen;
* ``Disallow`` / ``Allow`` / ``Crawl-delay`` rows carry the group's
  agent (one row per agent for multi-agent groups);
* ``Sitemap`` is a GLOBAL field per the spec — emitted with agent ''
  regardless of position;
* comments (#) and unknown fields are skipped; field names are
  case-insensitive and values are trimmed;
* the host comes from the ``robots_{host}.txt`` file name (a file
  corpus stands in for one-fetch-per-host), and ``seq`` preserves
  file order so longest-match semantics stay reconstructible.
"""

from __future__ import annotations

import os
from typing import Iterator

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

__all__ = ["RobotsDatasource", "read_robots", "parse_robots_rows",
           "ROBOTS_SCHEMA"]

ROBOTS_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("agent", pa.string()),
    ("seq", pa.int64()),
    ("field", pa.string()),
    ("value", pa.string()),
])

_RULE_FIELDS = {"disallow", "allow", "crawl-delay"}


def parse_robots_rows(text: str, host: str
                      ) -> list[tuple[str, str, int, str, str]]:
    rows: list[tuple[str, str, int, str, str]] = []
    agents: list[str] = []
    in_group_rules = False
    seq = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            if in_group_rules:
                agents, in_group_rules = [], False
            continue
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_rules:               # new group begins
                agents, in_group_rules = [], False
            agents.append(value)
        elif field == "sitemap":             # global per RFC 9309
            rows.append((host, "", seq, "sitemap", value))
            seq += 1
        elif field in _RULE_FIELDS:
            in_group_rules = True
            for agent in (agents or ["*"]):
                rows.append((host, agent, seq, field, value))
            seq += 1
        # unknown fields: skipped
    return rows


class RobotsDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["txt"]

    def __init__(self, paths, **kwargs):
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **kwargs)

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        name = os.path.basename(path)
        host = name[len("robots_"):-len(".txt")] \
            if name.startswith("robots_") and name.endswith(".txt") \
            else name
        rows = parse_robots_rows(
            f.readall().decode("utf-8", "replace"), host)
        yield pa.table({
            "host": pa.array([r[0] for r in rows], pa.string()),
            "agent": pa.array([r[1] for r in rows], pa.string()),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "field": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.string()),
        })


def read_robots(paths) -> rd.Dataset:
    return rd.read_datasource(RobotsDatasource(paths))
