"""URL canonicalization + host analytics + politeness scheduling.

The crawl-side triple every web corpus pipeline runs between link
extraction and fetching / dedup:

- ``canonicalize_urls``: RFC 3986 §6.2 syntax-based normalization plus
  the Common-Crawl-style conventions training pipelines actually use —
  lowercase scheme/host, strip the scheme's default port, drop the
  fragment, collapse duplicate slashes, resolve ``/./`` and ``/../``
  dot segments, strip tracking parameters (``utm_*``/``fbclid``/
  ``gclid``/``msclkid``), sort surviving query parameters. Two messy
  URLs for the same resource then compare equal, which is what makes
  URL-keyed dedup (``crawl_latest``, ``dedup_url_keep_best``) sound.
- ``host_stats``: per-host corpus footprint (document count, total
  text chars) — the input to per-domain quotas and blocklists.
- ``crawl_schedule``: per-host politeness scheduling — every frontier
  URL gets a deterministic ``fetch_round`` (one fetch per host per
  round, md5-priority order within the host) and a ``shard`` (which
  fetcher owns the host), i.e. the static schedule a polite fetcher
  fleet executes.

Scale shape: canonicalization is row-local — Arrow RE2 kernels over
the whole column for the regular steps; the query-parameter
filter/sort runs as a pandas ``split/explode/sort/groupby-join``
(C kernels, no per-row Python) and only over the rows that carry a
query string. ``host_stats`` is combiner → small groupby
(``stages/hashagg.py``). ``crawl_schedule`` needs a global per-host
rank, so it pays exactly ONE hash exchange on the host (narrow
(url, host, priority) rows) and ranks each host inside its partition
vectorized — hosts are the natural partition key of a fetcher fleet,
and hot hosts cost only their own rank, never a second exchange.

The ``synth_messy_url`` rule IS the SQL oracle in ``__ray_entry__``
(same coupling rule as synth/corpus.py; bump URLNORM_VERSION when
changing either side).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["URLNORM_VERSION", "canonicalize", "canonicalize_urls",
           "host_of", "host_stats", "crawl_schedule", "mirror_hosts",
           "url_templates", "url_templates_oracle_sql",
           "synth_messy_url", "synth_canonical_url", "synth_host"]

URLNORM_VERSION = 1

# dropped query parameters: pure click-tracking, never content-bearing
_TRACKING_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid)="

_SPLIT_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
             r"(?P<host>[^/?#]*)(?P<rest>[/?#].*)?$")
_REST_RE = r"^(?P<path>[^?#]*)(?P<q>\?[^#]*)?(?P<frag>#.*)?$"


def _resolve_dots(path: pa.Array) -> pa.Array:
    """remove_dot_segments (RFC 3986 §5.2.4) on an absolute-path
    column: bounded fixpoint of vectorized RE2 replaces (each pass
    strips one nesting level; depth ≤ segment count, and real URLs
    bottom out in 1-2 passes). RE2 has no lookahead, so ``/a/../`` is
    stripped innermost-first and a root-level ``/../`` collapses to
    ``/`` — exactly the RFC behavior for rooted paths."""
    path = pc.replace_substring_regex(path, r"/{2,}", "/")
    for _ in range(64):
        step = pc.replace_substring_regex(path, r"/\./", "/")
        step = pc.replace_substring_regex(step, r"/\.$", "/")
        step = pc.replace_substring_regex(step, r"/([^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)/\.\./", "/")
        step = pc.replace_substring_regex(step, r"/([^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)/\.\.$", "/")
        step = pc.replace_substring_regex(step, r"^/\.\.(/|$)", "/")
        if step.equals(path):
            break
        path = step
    return path


def _clean_queries(q: pd.Series) -> pd.Series:
    """Filter tracking params + sort the rest — vectorized pandas
    split/explode/sort/join; runs only on rows that HAVE a query."""
    has = q.notna() & (q.str.len() > 1)
    if not has.any():
        return pd.Series([""] * len(q), index=q.index, dtype=object)
    sub = q[has].str.slice(1)               # drop the leading '?'
    parts = sub.str.split("&").explode()
    parts = parts[(parts != "") &
                  ~parts.str.match(_TRACKING_RE, na=False)]
    joined = parts.sort_values(kind="mergesort") \
        .groupby(level=0).agg("&".join)
    out = pd.Series([""] * len(q), index=q.index, dtype=object)
    keep = joined[joined != ""]
    out.loc[keep.index] = "?" + keep
    return out


def canonicalize(urls: pa.Array) -> pa.Array:
    """Column kernel: canonical form of every absolute http(s)-style
    URL; rows that don't parse as ``scheme://host...`` pass through
    unchanged (a canonicalizer must never invent structure)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _SPLIT_RE)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    # default-port strip is scheme-conditional
    host = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(host, r":80$", ""),
                      host)
    host = pc.if_else(pc.equal(scheme, "https"),
                      pc.replace_substring_regex(host, r":443$", ""),
                      host)
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "/")
    sub = pc.extract_regex(rest, _REST_RE)
    path = pc.struct_field(sub, "path")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    path = _resolve_dots(path)
    q = _clean_queries(pc.struct_field(sub, "q").to_pandas())
    rebuilt = pc.binary_join_element_wise(
        scheme, "://", pc.binary_join_element_wise(
            host, path, pa.array(q.to_numpy(dtype=object), pa.string()),
            ""), "")
    return pc.if_else(ok, rebuilt, urls)


def canonicalize_urls(ds: rd.Dataset, *, col: str = "url",
                      out: str = "url_canon") -> rd.Dataset:
    """Append the canonical form (and its host) to every row."""
    def fn(t: pa.Table) -> pa.Table:
        canon = canonicalize(t.column(col))
        return (t.append_column(out, canon)
                 .append_column("host", host_of(canon)))
    return ds.map_batches(fn, batch_format="pyarrow")


def host_of(urls: pa.Array) -> pa.Array:
    """Lowercased host of each URL (one RE2 kernel); null if the row
    has no ``scheme://host`` shape."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _SPLIT_RE)
    return pc.utf8_lower(pc.struct_field(parts, "host"))


def host_stats(ds: rd.Dataset, *, url_col: str = "url",
               chars_col: str | None = None,
               num_partitions: int | None = None) -> rd.Dataset:
    """(host, n_docs, total_chars): per-host corpus footprint over
    canonicalized URLs. Combiner → small hash-partitioned groupby;
    the exchange moves one narrow row per (batch, host)."""
    from ..stages.hashagg import hash_aggregate

    def narrow(t: pa.Table) -> pa.Table:
        host = host_of(canonicalize(t.column(url_col)))
        n = (t.column(chars_col).cast(pa.int64())
             if chars_col else
             pa.array(np.zeros(t.num_rows, dtype=np.int64)))
        return pa.table({"host": host, "total_chars": n,
                         "n_docs": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("host", as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))

    cols = [url_col] + ([chars_col] if chars_col else [])
    thin = ds.select_columns(cols).map_batches(narrow,
                                               batch_format="pyarrow")
    return hash_aggregate(thin, ["host"], combine,
                          num_partitions=num_partitions)


def _fetch_pri(urls: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(f"fetch:{u}".encode()).hexdigest()
                     for u in urls], dtype=object)


def shard_of_host(host: str, n_shards: int) -> int:
    """Fetcher shard owning a host: first md5 nibble mod shards —
    string-stable so the SQL oracle replays it exactly."""
    return int(hashlib.md5(f"shard:{host}".encode()).hexdigest()[0],
               16) % n_shards


def crawl_schedule(ds: rd.Dataset, *, url_col: str = "url",
                   n_shards: int = 8,
                   num_partitions: int | None = None) -> rd.Dataset:
    """(url, host, shard, fetch_round): the static polite-fetch
    schedule — within each host, URLs fetch one per round in
    md5-priority order (deterministic, so a re-run resumes the same
    schedule); hosts map to fetcher shards by md5 nibble.

    One hash exchange on the host (narrow rows), vectorized rank per
    partition. The md5 priority is the only per-row Python step and
    is shared with every other md5-keyed decision in this repo.
    """
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    def tag(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        host = host_of(urls)
        u = urls.to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(host.to_numpy(zero_copy_only=False)), index=False)
        return pa.table({
            "url": urls,
            "host": host,
            "pri": pa.array(_fetch_pri(u), pa.string()),
            "__part": pa.array((h % num_partitions).astype("int64")
                               .to_numpy()),
        })

    def rank(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["host", "pri", "url"], kind="mergesort")
        hosts = g["host"].to_numpy(dtype=object)
        new = np.empty(len(g), dtype=bool)
        new[:1] = True
        new[1:] = hosts[1:] != hosts[:-1]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        rounds = np.arange(len(g), dtype=np.int64) - starts[grp]
        shards = np.array([shard_of_host(h, n_shards)
                           for h in g["host"].drop_duplicates()],
                          dtype=np.int64)
        return pa.table({
            "url": pa.array(g["url"].to_numpy(dtype=object),
                            pa.string()),
            "host": pa.array(hosts, pa.string()),
            "shard": pa.array(shards[grp], pa.int64()),
            "fetch_round": pa.array(rounds, pa.int64()),
        })

    thin = ds.select_columns([url_col]).map_batches(
        tag, batch_format="pyarrow")
    return thin.groupby("__part").map_groups(rank,
                                             batch_format="pandas")


def mirror_hosts(ds: rd.Dataset, *, key_col: str = "k",
                 host_col: str = "host",
                 max_hosts_per_key: int = 64,
                 num_partitions: int | None = None) -> rd.Dataset:
    """(host_a, host_b, shared): mirror-site detection — pairs of
    hosts serving identical content, scored by how many distinct
    content keys they share (host_a < host_b). The standard crawl-side
    precursor to domain-level dedup: a pair sharing most of its corpus
    is one site behind two names.

    Scale shape: per-batch distinct (key, host) rows first, ONE hash
    exchange on the content key, then each key group emits its
    C(h, 2) host pairs (h capped at ``max_hosts_per_key`` — a key on
    more hosts than that is template/boilerplate content, not mirror
    evidence; the cap bounds the quadratic emit exactly like the LSH
    bucket caps) and a combiner → small groupby counts pairs.
    """
    from ..stages.hashagg import hash_aggregate

    def distinct_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "host": t.column(host_col).to_pandas(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def emit_pairs(g: pd.DataFrame) -> pa.Table:
        hosts = np.unique(g["host"].to_numpy(dtype=object))
        if len(hosts) < 2 or len(hosts) > max_hosts_per_key:
            return pa.table({"host_a": pa.array([], pa.string()),
                             "host_b": pa.array([], pa.string())})
        ia, ib = np.triu_indices(len(hosts), k=1)
        return pa.table({
            "host_a": pa.array(hosts[ia], pa.string()),
            "host_b": pa.array(hosts[ib], pa.string())})

    def count(df: pd.DataFrame) -> pd.DataFrame:
        if "shared" in df.columns:
            return df.groupby(["host_a", "host_b"],
                              as_index=False)["shared"].sum()
        out = df.groupby(["host_a", "host_b"], as_index=False).size()
        return out.rename(columns={"size": "shared"})

    kh = ds.map_batches(distinct_partial, batch_format="pyarrow")
    pairs = kh.groupby("k").map_groups(emit_pairs,
                                       batch_format="pandas")
    out = hash_aggregate(pairs, ["host_a", "host_b"], count,
                         num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({
            "host_a": t.column("host_a"),
            "host_b": t.column("host_b"),
            "shared": t.column("shared").cast(pa.int64())})
        if t.num_columns else
        pa.table({"host_a": pa.array([], pa.string()),
                  "host_b": pa.array([], pa.string()),
                  "shared": pa.array([], pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# synthetic messy-URL rule (the oracle twin lives in __ray_entry__)
# ---------------------------------------------------------------------------

_SUBS = ("docs", "news", "blog", "cdn")


def synth_host(doc_id: int) -> str:
    return f"{_SUBS[doc_id % 4]}.synth.test"


def synth_messy_url(doc_id: int) -> str:
    """Deterministic messy variant per document: six canonicalization
    hazards cycled by doc_id %% 6 (case+default port, fragment, dot
    segments, tracking params, unsorted params, duplicate slashes)."""
    base = synth_host(doc_id)
    p = f"/d/{doc_id}"
    v = doc_id % 6
    if v == 0:
        return f"HTTPS://{base.upper()}:443{p}"
    if v == 1:
        return f"https://{base}{p}#sec-{doc_id % 3}"
    if v == 2:
        return f"https://{base}/x/..{p}"
    if v == 3:
        return f"https://{base}{p}?utm_source=feed&utm_medium=rss"
    if v == 4:
        return f"https://{base}{p}?b={doc_id % 5}&a=1"
    return f"https://{base}//d//{doc_id}"


def url_templates(ds: rd.Dataset, *, url_col: str = "url",
                  min_count: int = 1,
                  num_partitions: int | None = None) -> rd.Dataset:
    """(template, n_urls:int64): URL path-template mining — every
    frontier URL reduced to its structural template (query/fragment
    stripped, every digit run replaced by ``{n}``), counted by
    occurrence. The crawl-side trap detector: calendar pages,
    paginated archives and session-id families collapse to one
    template whose count explodes, which is the signal a frontier
    budgeter throttles on (one template = one crawl "shape", cf. the
    URL-pattern rules every production crawler ships).

    Occurrence counts (not distinct URLs) by design: frontier VOLUME
    per shape is the throttling signal, and it keeps the whole
    operator a pure combiner → small hash groupby — two RE2 kernels
    over the column, narrow (template, count) partials, no URL-level
    exchange at any scale. ``min_count`` drops singleton templates."""
    from ..stages.hashagg import hash_aggregate

    def narrow(t: pa.Table) -> pa.Table:
        base = pc.replace_substring_regex(t.column(url_col),
                                          r"[?#].*$", "")
        tmpl = pc.replace_substring_regex(base, r"[0-9]+", "{n}")
        return pa.table({"template": tmpl,
                         "n_urls": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("template", as_index=False) \
            .agg(n_urls=("n_urls", "sum"))

    counted = hash_aggregate(
        ds.select_columns([url_col]).map_batches(
            narrow, batch_format="pyarrow"),
        ["template"], combine, num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "template" not in df.columns:
            return pd.DataFrame({
                "template": pd.Series([], dtype="object"),
                "n_urls": pd.Series([], dtype="int64")})
        df = df[df["n_urls"] >= min_count].copy()
        df["n_urls"] = df["n_urls"].astype("int64")
        return df

    return counted.map_batches(finish, batch_format="pandas")


def url_templates_oracle_sql(urls_cte: str, *,
                             min_count: int = 1) -> str:
    """DuckDB twin of ``url_templates`` (``urls_cte`` yields url)."""
    return f"""
        WITH raw_u AS ({urls_cte})
        SELECT regexp_replace(regexp_replace(url, '[?#].*$', ''),
                              '[0-9]+', '{{n}}', 'g') AS template,
               CAST(count(*) AS BIGINT) AS n_urls
        FROM raw_u GROUP BY 1
        HAVING count(*) >= {min_count}"""


def synth_canonical_url(doc_id: int) -> str:
    """What ``canonicalize`` must produce for the messy variant."""
    q = f"?a=1&b={doc_id % 5}" if doc_id % 6 == 4 else ""
    return f"https://{synth_host(doc_id)}/d/{doc_id}{q}"
