"""Deterministic sitemap-protocol XML writer for the synthetic corpus.

Renders the synthetic crawl's URL inventory as a sitemaps.org file
set per host (the discovery channel every crawler reconciles against
its frontier): per-host ``<urlset>`` files capped at ``chunk`` URLs
(the protocol caps real files at 50k) plus one ``<sitemapindex>``
per host referencing its chunks — readers must handle both document
types, exactly as with real sitemaps.

The inventory is a pure function of the corpus size N (these rules
ARE the SQL oracles for ``sitemap_ingest`` / ``sitemap_gap`` in
``__ray_entry__.py`` — change them together and bump
SITEMAPGEN_VERSION, the CLAUDE.md coupling rule):

- page x lives on host ``[docs, news, blog, cdn][x % 4]`` with URL
  ``https://{host}.synth.test/d/{x}`` (the host-graph URL scheme);
- the sitemap lists crawled ids ``i in [0, N) with i % 5 != 2``
  (ids ≡ 2 (mod 5) are crawled-but-unlisted — stale sitemaps) plus
  phantom ids ``N + j for j in [0, ceil(N / 10))`` (listed-but-
  uncrawled — frontier work);
- ``lastmod(x)`` = UTC date of corpus epoch (2024-01-01) + x hours.

Re-running the writer produces byte-identical files.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

__all__ = ["SITEMAPGEN_VERSION", "HOST_SUBS", "sitemap_ids_for_host",
           "page_host", "page_url", "lastmod_date",
           "write_sitemap_files"]

SITEMAPGEN_VERSION = 1

HOST_SUBS = ("docs", "news", "blog", "cdn")

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def page_host(x: int) -> str:
    return f"{HOST_SUBS[x % 4]}.synth.test"


def page_url(x: int) -> str:
    return f"https://{page_host(x)}/d/{x}"


def lastmod_date(x: int) -> str:
    return (_EPOCH + timedelta(hours=x)).strftime("%Y-%m-%d")


def sitemap_ids_for_host(n_docs: int, sub: str) -> list[int]:
    """Listed ids for one host, ascending (rule in module docstring)."""
    h = HOST_SUBS.index(sub)
    listed = [i for i in range(n_docs) if i % 4 == h and i % 5 != 2]
    n_phantom = -(-n_docs // 10)
    listed += [n_docs + j for j in range(n_phantom)
               if (n_docs + j) % 4 == h]
    return listed


def _urlset_xml(ids: list[int]) -> bytes:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<urlset xmlns="{_NS}">']
    for x in ids:
        lines += ["  <url>",
                  f"    <loc>{page_url(x)}</loc>",
                  f"    <lastmod>{lastmod_date(x)}</lastmod>",
                  "  </url>"]
    lines.append("</urlset>")
    return "\n".join(lines).encode()


def _index_xml(sub: str, n_chunks: int) -> bytes:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<sitemapindex xmlns="{_NS}">']
    for c in range(n_chunks):
        lines += ["  <sitemap>",
                  f"    <loc>https://{sub}.synth.test/"
                  f"sitemap_{sub}_{c}.xml</loc>",
                  "  </sitemap>"]
    lines.append("</sitemapindex>")
    return "\n".join(lines).encode()


def write_sitemap_files(sf_dir: str, out_dir: str, *,
                        chunk: int = 1000) -> str:
    """Write (idempotently, version-stamped) and return ``out_dir``."""
    import pyarrow.parquet as pq
    stamp = os.path.join(out_dir, ".version")
    want = f"{SITEMAPGEN_VERSION}:{chunk}"
    if os.path.exists(stamp) and open(stamp).read() == want:
        return out_dir
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    os.makedirs(out_dir, exist_ok=True)
    for sub in HOST_SUBS:
        ids = sitemap_ids_for_host(n, sub)
        chunks = [ids[i:i + chunk] for i in range(0, len(ids), chunk)] \
            or [[]]
        for c, part in enumerate(chunks):
            with open(os.path.join(out_dir,
                                   f"sitemap_{sub}_{c}.xml"),
                      "wb") as f:
                f.write(_urlset_xml(part))
        with open(os.path.join(out_dir, f"sitemapindex_{sub}.xml"),
                  "wb") as f:
            f.write(_index_xml(sub, len(chunks)))
    with open(stamp, "w") as f:
        f.write(want)
    return out_dir
