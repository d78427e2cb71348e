"""Sitemap-protocol source: sitemaps.org XML → URL inventory rows.

``read_sitemaps(paths)`` is a file-parallel Ray Data source
(``FileBasedDatasource``, same layout as ``sources/warc.py``): one
read task per XML file, each emitting Arrow blocks of
``(host, url, lastmod)``. This is the crawl-discovery ingestion path:
a large site publishes thousands of chunked ``<urlset>`` files behind
``<sitemapindex>`` documents, and file-granular read tasks let the
streaming executor schedule and backpressure the scan.

Format handling (sitemaps.org protocol):

* ``<urlset>`` documents emit one row per ``<url>`` entry — ``<loc>``
  required (entries without it are skipped, per protocol), optional
  ``<lastmod>`` passed through as its string form ('' when absent);
* ``<sitemapindex>`` documents emit no URL rows (their ``<loc>``
  children reference other sitemap FILES, which a directory-walking
  reader already scans directly — following remote references would
  be a network fetch, which this engine never does);
* the namespace is matched loosely (any or no xmlns), as real-world
  sitemaps are sloppy about it;
* malformed XML raises ``ValueError`` naming the file — a corrupt
  shard fails its read task loudly (retry/quarantine), never silently
  shortens the inventory.
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urlparse
from xml.etree import ElementTree

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

__all__ = ["SitemapDatasource", "read_sitemaps", "parse_sitemap",
           "SITEMAP_SCHEMA"]

SITEMAP_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("url", pa.string()),
    ("lastmod", pa.string()),
])

_TAG = re.compile(r"^(?:\{[^}]*\})?(.*)$")


def _local(tag: str) -> str:
    return _TAG.match(tag).group(1)


def parse_sitemap(data: bytes, path: str = "<bytes>"
                  ) -> list[tuple[str, str, str]]:
    """(host, url, lastmod) rows of one sitemap document."""
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed sitemap XML in {path}: {e}")
    kind = _local(root.tag)
    if kind == "sitemapindex":
        return []
    if kind != "urlset":
        raise ValueError(
            f"unexpected sitemap root <{kind}> in {path}")
    rows = []
    for el in root:
        if _local(el.tag) != "url":
            continue
        loc, lastmod = None, ""
        for child in el:
            t = _local(child.tag)
            if t == "loc":
                loc = (child.text or "").strip()
            elif t == "lastmod":
                lastmod = (child.text or "").strip()
        if not loc:
            continue                      # <loc> is required
        rows.append((urlparse(loc).netloc, loc, lastmod))
    return rows


class SitemapDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["xml"]

    def __init__(self, paths, **kwargs):
        # the extension filter must reach the base class explicitly
        # (the _FILE_EXTENSIONS attr alone does not prune e.g. the
        # generator's .version stamp in this Ray version)
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **kwargs)

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        rows = parse_sitemap(f.readall(), path)
        yield pa.table({
            "host": pa.array([r[0] for r in rows], pa.string()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "lastmod": pa.array([r[2] for r in rows], pa.string()),
        })


def read_sitemaps(paths) -> rd.Dataset:
    return rd.read_datasource(SitemapDatasource(paths))
