"""Host-graph collapse + host-level PageRank composition.

The standard web-scale ranking trick (Common Crawl publishes exactly
this artifact as its host-level rank dataset; Henzinger et al.'s early
host-graph studies motivated it): the URL-level link graph is orders
of magnitude larger than the HOST graph it collapses onto, so compute
PageRank once on the collapsed graph and annotate every page with its
host's authority. At 100 TB the URL graph has ~10^11 edges but only
~10^8 hosts — the collapse is one combiner-style aggregation over the
edge stream, and the iterative work then runs on a graph ~1000×
smaller. The reference engine has no graph op (corpus-level addition
per SURVEY §2).

Three composable pieces:

- ``host_collapse``: (src, target) URL edges → (src_host, target_host,
  n_links) host-pair link counts. ``n_links`` counts link
  OCCURRENCES (not distinct URL pairs): that keeps the collapse a
  pure combiner → small groupby with no global distinct exchange over
  the URL-level edges — the scale-defining choice (pre-apply
  ``dedup.dedup_exact`` on (src, target) first if distinct-edge
  counts are wanted).
- ``host_rank``: ``pagerank`` (functions/pagerank.py, same
  fixed-point int64 convention, driver + BSP scale paths) over the
  collapsed distinct host-pair set → (host, rank).
- ``page_host_rank``: every distinct URL of the edge set annotated
  with its host's rank → (url, host, host_rank). Host ranks are tiny
  relative to URLs, so under ``broadcast_limit`` hosts they ship once
  as sorted numpy arrays (``ray.put``, zero-copy searchsorted probe
  per task); beyond it a ``join_ready``-guarded hash join takes over.
  Both paths bit-identical (tests).

Host extraction is ``urlnorm.host_of`` (one vectorized RE2 kernel,
lowercased). The SQL oracles replay it as
``lower(split_part(url, '/', 3))`` — identical for every
``scheme://host[:port]/path`` URL without userinfo, which the synth
inputs (and any canonicalized corpus) satisfy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _distinct, _n_partitions, pagerank, \
    pagerank_oracle_sql
from .urlnorm import host_of

__all__ = ["host_collapse", "host_rank", "page_host_rank",
           "crawl_priority",
           "host_collapse_oracle_sql", "host_rank_oracle_sql",
           "page_host_rank_oracle_sql"]


def host_collapse(edges: rd.Dataset, *, src_col: str = "src",
                  target_col: str = "target",
                  num_partitions: int | None = None) -> rd.Dataset:
    """(src, target) URL edge rows → (src_host, target_host,
    n_links:int64) link-occurrence counts per host pair.

    Pure combiner shape: per-batch host projection + pandas groupby
    partial, one narrow hash exchange over (src_host, target_host)
    partial rows (``stages/hashagg.py``) — the URL payload never
    shuffles."""
    from ..stages.hashagg import hash_aggregate

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": host_of(t.column(src_col)),
            "target_host": host_of(t.column(target_col)),
            "n_links": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["src_host", "target_host"],
                          as_index=False).agg(n_links=("n_links", "sum"))

    thin = edges.select_columns([src_col, target_col]) \
        .map_batches(narrow, batch_format="pyarrow")
    return hash_aggregate(thin, ["src_host", "target_host"], combine,
                          num_partitions=num_partitions)


def host_rank(edges: rd.Dataset, *, iterations: int = 5,
              src_col: str = "src", target_col: str = "target",
              weighted: bool = False,
              driver_edge_limit: int = 5_000_000,
              num_partitions: int | None = None) -> rd.Dataset:
    """URL edges → (host, rank:int64): fixed-point PageRank over the
    collapsed host-pair graph (composition: ``host_collapse`` →
    ``pagerank``; the collapse output is already pair-distinct, and
    ``pagerank`` inherits its driver/BSP path split + bit-exact int64
    convention). With ``weighted=True`` the surfer follows a host
    pair with probability proportional to its ``n_links`` multiplicity
    instead of flattening it (``functions/wpagerank.py`` — the
    Common-Crawl-style weighted host rank)."""
    from .dedup import join_ready
    # hash_aggregate's map_groups emits pandas blocks, some schema-less
    # empty — join_ready (arrow-coerce + materialize + even-repartition)
    # merges them away before the Project ops (the CLAUDE.md
    # uniform-block-type / empty-block gotcha); the collapsed table is
    # narrow by construction (one row per host pair)
    hc = join_ready(
        host_collapse(edges, src_col=src_col, target_col=target_col,
                      num_partitions=num_partitions),
        num_partitions or _n_partitions())
    if weighted:
        from .wpagerank import weighted_pagerank
        he = hc.rename_columns({"src_host": "src",
                                "target_host": "target",
                                "n_links": "w"})
        return weighted_pagerank(he, iterations=iterations,
                                 driver_edge_limit=driver_edge_limit,
                                 num_partitions=num_partitions) \
            .rename_columns({"url": "host"})
    he = hc.select_columns(["src_host", "target_host"]) \
        .rename_columns({"src_host": "src", "target_host": "target"})
    return pagerank(he, iterations=iterations,
                    driver_edge_limit=driver_edge_limit) \
        .rename_columns({"url": "host"})


def page_host_rank(edges: rd.Dataset, *, iterations: int = 5,
                   src_col: str = "src", target_col: str = "target",
                   broadcast_limit: int = 5_000_000,
                   driver_edge_limit: int = 5_000_000,
                   num_partitions: int | None = None) -> rd.Dataset:
    """URL edges → (url, host, host_rank:int64) for every distinct
    URL endpoint: each page annotated with its host's authority.

    One narrow distinct exchange over the URL universe; the host-rank
    side broadcasts under ``broadcast_limit`` hosts (sorted numpy
    key/value arrays, searchsorted probe — the tpch.py pattern), hash
    join beyond (``join_ready``-guarded)."""
    n_part = num_partitions or _n_partitions()
    ranks = host_rank(edges, iterations=iterations, src_col=src_col,
                      target_col=target_col,
                      driver_edge_limit=driver_edge_limit,
                      num_partitions=num_partitions).materialize()

    srcs = edges.select_columns([src_col]) \
        .rename_columns({src_col: "url"})
    tgts = edges.select_columns([target_col]) \
        .rename_columns({target_col: "url"})
    urls = _distinct(srcs.union(tgts), ["url"])

    def with_host(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("url"),
                         "host": host_of(t.column("url"))})

    pages = urls.map_batches(with_host, batch_format="pyarrow")

    return _attach_host_rank(pages, ranks, ["url", "host"],
                             broadcast_limit, n_part)


def _attach_host_rank(ds: rd.Dataset, ranks: rd.Dataset,
                      keep_cols: list[str], broadcast_limit: int,
                      n_part: int) -> rd.Dataset:
    """Append ``host_rank`` to every row of ``ds`` (which carries a
    ``host`` column) from the small (host, rank) table. Under
    ``broadcast_limit`` hosts: ship sorted numpy key/value arrays once
    (``ray.put``) and probe with searchsorted per batch; beyond: a
    ``join_ready``-guarded left join. Hosts absent from the rank table
    get 0 (a crawler treats an unranked host as no-authority, not an
    error) — both paths, tested."""
    n_hosts = ranks.count()
    if n_hosts <= broadcast_limit:
        rt = pa.concat_tables(
            b for b in ray.get(ranks.to_arrow_refs()) if b.num_columns)
        hosts = np.asarray(rt.column("host").to_pandas(), dtype=object)
        vals = np.asarray(rt.column("rank").to_pandas(),
                          dtype=np.int64)
        order = np.argsort(hosts)
        hosts_ref = ray.put(hosts[order])
        vals_ref = ray.put(vals[order])

        def attach(t: pa.Table) -> pa.Table:
            hs = ray.get(hosts_ref)
            vs = ray.get(vals_ref)
            h = np.asarray(t.column("host").to_pandas(), dtype=object)
            pos = np.minimum(np.searchsorted(hs, h),
                             max(len(hs) - 1, 0))
            hit = (hs[pos] == h) if len(hs) else \
                np.zeros(len(h), dtype=bool)
            out = np.where(hit, vs[pos] if len(vs) else 0, 0) \
                .astype(np.int64)
            cols = {c: t.column(c) for c in keep_cols}
            cols["host_rank"] = pa.array(out, pa.int64())
            return pa.table(cols)

        return ds.map_batches(attach, batch_format="pyarrow")

    from .dedup import join_ready
    left = join_ready(ds, n_part)
    rside = join_ready(
        ranks.rename_columns({"rank": "host_rank"}), n_part)
    out = left.join(rside, join_type="left_outer",
                    num_partitions=min(n_part, max(1, n_hosts)),
                    on=("host",))

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {c: t.column(c) for c in keep_cols}
        cols["host_rank"] = pc.coalesce(
            t.column("host_rank"),
            pa.scalar(0, pa.int64())).cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(fill, batch_format="pyarrow")


def crawl_priority(frontier: rd.Dataset, edges: rd.Dataset, *,
                   url_col: str = "url", n_shards: int = 8,
                   iterations: int = 5, weighted: bool = False,
                   broadcast_limit: int = 5_000_000,
                   driver_edge_limit: int = 5_000_000,
                   num_partitions: int | None = None) -> rd.Dataset:
    """The fetcher fleet's dispatch table: the politeness schedule
    (``urlnorm.crawl_schedule`` — one fetch per host per round,
    deterministic md5 order) annotated with each host's PageRank from
    the link graph → (url, host, shard, fetch_round,
    host_rank:int64). A fetcher drains its shard in (fetch_round,
    -host_rank, url) order: politeness first, authority as the
    tie-break across hosts — the standard priority rule
    (Cho/Garcia-Molina/Page 1998 ordered crawling, applied per
    politeness round).

    Composition only: ONE host-keyed exchange for the schedule, the
    collapse + rank of ``host_rank``, and a broadcast attach — no new
    shuffle. Frontier hosts absent from the link graph rank 0."""
    from .urlnorm import crawl_schedule
    n_part = num_partitions or _n_partitions()
    sched = crawl_schedule(frontier, url_col=url_col,
                           n_shards=n_shards,
                           num_partitions=num_partitions)
    ranks = host_rank(edges, iterations=iterations, weighted=weighted,
                      driver_edge_limit=driver_edge_limit,
                      num_partitions=num_partitions).materialize()
    return _attach_host_rank(
        sched, ranks, ["url", "host", "shard", "fetch_round"],
        broadcast_limit, n_part)


_HOST_SQL_EXPR = "lower(split_part({col}, '/', 3))"


def host_collapse_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of ``host_collapse`` (see module docstring for the
    host-extraction equivalence)."""
    s = _HOST_SQL_EXPR.format(col="src")
    t = _HOST_SQL_EXPR.format(col="target")
    return f"""
        WITH raw_e AS ({edges_cte})
        SELECT {s} AS src_host, {t} AS target_host,
               CAST(count(*) AS BIGINT) AS n_links
        FROM raw_e GROUP BY 1, 2"""


def _host_edges_cte(edges_cte: str) -> str:
    s = _HOST_SQL_EXPR.format(col="src")
    t = _HOST_SQL_EXPR.format(col="target")
    return (f"SELECT {s} AS src, {t} AS target "
            f"FROM ({edges_cte}) he_raw")


def host_rank_oracle_sql(edges_cte: str, *,
                         iterations: int = 5) -> str:
    """DuckDB twin of ``host_rank``: the pagerank oracle (unrolled
    AS MATERIALIZED integer recurrence) over the collapsed host
    pairs (pagerank's own DISTINCT supplies the pair dedup)."""
    pr = pagerank_oracle_sql(_host_edges_cte(edges_cte),
                             iterations=iterations)
    return f"SELECT url AS host, rank FROM ({pr}) pr_host"


def page_host_rank_oracle_sql(edges_cte: str, *,
                              iterations: int = 5) -> str:
    """DuckDB twin of ``page_host_rank``."""
    u = _HOST_SQL_EXPR.format(col="u.url")
    pr = pagerank_oracle_sql(_host_edges_cte(edges_cte),
                             iterations=iterations)
    return f"""
        WITH raw_e AS ({edges_cte}),
        u AS (SELECT DISTINCT url FROM
              (SELECT src AS url FROM raw_e
               UNION ALL SELECT target FROM raw_e))
        SELECT u.url, {u} AS host, hr.rank AS host_rank
        FROM u JOIN (SELECT url AS host, rank FROM ({pr}) p) hr
          ON {u} = hr.host"""
