"""Host-partition modularity (exact-integer Newman Q contributions).

"How host-modular is the link graph?" — Newman–Girvan modularity of
the partition-by-host is the one-number answer crawl analysts use to
tell intra-site navigation structure from genuine cross-site linking
(and its collapse over a snapshot is a link-spam tripwire). For the
undirected simple graph (symmetrized, self-loops dropped) with m
edges, within-community edge counts e_c and community degree masses
d_c,

    Q = Σ_c [ e_c/m − (d_c/(2m))² ]  =  Σ_c (4·m·e_c − d_c²) / 4m²

— so over the common denominator 4m² every per-host contribution
q_contrib_c = 4·m·e_c − d_c² is EXACT int64 (the CLAUDE.md
integer-aggregate rule; Q itself is one post-hoc division by 4m²).
4·m·e_c ≤ 4m² must stay < 2^63 (m ≲ 1.5e9 edges; per-host-shard
modularity is the documented decomposition past that).

The key scale identity: d_c = Σ_edges([host(u)=c] + [host(v)=c]) —
degree mass per host falls straight out of the EDGE list, so no
node-level exchange exists at all. Distributed shape: one canonical-
pair distinct exchange (u<v ordering + batch-local dedup combiners),
then per-batch (host, e_in, d) partials → one tiny host groupby →
q_contrib attached with the already-known m. Host extraction is the
substring between "://" and the next "/" (the SQL twin's
regexp_extract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["host_modularity", "modularity_oracle_sql",
           "host_conductance", "conductance_oracle_sql"]


def _hosts(urls: np.ndarray) -> np.ndarray:
    s = pd.Series(urls, dtype=object)
    return (s.str.split("://").str[-1].str.split("/").str[0]
            .to_numpy(dtype=object))


def host_modularity(edges: rd.Dataset) -> rd.Dataset:
    """(host, e_in, d, q_contrib) per host over the symmetrized
    distinct URL link graph; Q = Σ q_contrib / (4m²)."""
    from .dedup import _to_arrow_blocks

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pandas(), dtype=object)
        g = np.asarray(t.column("target").to_pandas(), dtype=object)
        keep = s != g                    # self-loops out
        s, g = s[keep], g[keep]
        swap = s > g
        lo = np.where(swap, g, s)
        hi = np.where(swap, s, g)
        df = pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()
        return pa.table({
            "lo": pa.array(df["lo"].tolist(), pa.string()),
            "hi": pa.array(df["hi"].tolist(), pa.string()),
            "one": pa.array(np.ones(len(df), dtype=np.int64),
                            pa.int64())})

    dedup = _to_arrow_blocks(
        edges.map_batches(canon, batch_format="pyarrow")
             .groupby(["lo", "hi"])
             .aggregate(Sum("one", alias_name="one"))).materialize()
    m = dedup.count()
    if m == 0:
        return rd.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "e_in": pa.array([], pa.int64()),
            "d": pa.array([], pa.int64()),
            "q_contrib": pa.array([], pa.int64())}))

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"host": pa.array([], pa.string()),
                             "e_in": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        hl = _hosts(np.asarray(t.column("lo").to_pandas(),
                               dtype=object))
        hh = _hosts(np.asarray(t.column("hi").to_pandas(),
                               dtype=object))
        within = hl == hh
        df = pd.concat([
            pd.DataFrame({"host": hl,
                          "e_in": within.astype(np.int64),
                          "d": np.ones(len(hl), dtype=np.int64)}),
            pd.DataFrame({"host": hh,
                          "e_in": np.zeros(len(hh), dtype=np.int64),
                          "d": np.ones(len(hh), dtype=np.int64)})])
        g = df.groupby("host", as_index=False).sum()
        return pa.table({
            "host": pa.array(g["host"].tolist(), pa.string()),
            "e_in": pa.array(g["e_in"].to_numpy(np.int64),
                             pa.int64()),
            "d": pa.array(g["d"].to_numpy(np.int64), pa.int64())})

    agg = _to_arrow_blocks(
        dedup.map_batches(partial, batch_format="pyarrow")
             .groupby("host")
             .aggregate(Sum("e_in", alias_name="e_in"),
                        Sum("d", alias_name="d")))

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.table({"host": pa.array([], pa.string()),
                             "e_in": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "q_contrib": pa.array([], pa.int64())})
        e_in = t.column("e_in").to_numpy()
        d = t.column("d").to_numpy()
        return pa.table({
            "host": t.column("host"),
            "e_in": pa.array(e_in, pa.int64()),
            "d": pa.array(d, pa.int64()),
            "q_contrib": pa.array(4 * m * e_in - d * d, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def modularity_oracle_sql(edges_cte: str) -> str:
    """The same per-host integer Q contributions in DuckDB
    (LEAST/GREATEST canonical pairs, regexp host extraction)."""
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, target) AS lo,
                   GREATEST(src, target) AS hi
            FROM raw_e WHERE src != target),
        m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m
                           FROM e),
        he AS MATERIALIZED (
            SELECT regexp_extract(lo, '://([^/]+)', 1) AS h_lo,
                   regexp_extract(hi, '://([^/]+)', 1) AS h_hi
            FROM e),
        contrib AS MATERIALIZED (
            SELECT host, CAST(SUM(e_in) AS BIGINT) AS e_in,
                   CAST(SUM(d) AS BIGINT) AS d
            FROM (
                SELECT h_lo AS host,
                       CASE WHEN h_lo = h_hi THEN 1 ELSE 0 END
                           AS e_in,
                       1 AS d
                FROM he
                UNION ALL
                SELECT h_hi, 0, 1 FROM he)
            GROUP BY host)
        SELECT c.host, c.e_in, c.d,
               CAST(4 * m.m * c.e_in - c.d * c.d AS BIGINT)
                   AS q_contrib
        FROM contrib c CROSS JOIN m"""


def host_conductance(edges: rd.Dataset) -> rd.Dataset:
    """(host, cut, vol, conductance_ppm) per host community over the
    symmetrized distinct URL link graph — the partition-quality twin
    of ``host_modularity``: φ(S) = cut(S)/min(vol(S), 2m−vol(S))
    (Shi & Malik / Kannan-Vempala-Vetta's sparsity objective), as
    exact integer ppm. Low φ = a well-separated site; φ→10⁶ = a host
    that mostly links out (spam satellites, CDN shards).

    Scale shape: identical to modularity — one distinct-pair
    reduction, per-batch (host, cut, vol) int64 partials (each edge
    credits BOTH endpoint hosts' volumes and, when the hosts differ,
    both cuts), one host-keyed narrow groupby, driver-free finish
    (2m is the one scalar broadcast into the ppm division)."""
    from .dedup import _to_arrow_blocks

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pandas(), dtype=object)
        g = np.asarray(t.column("target").to_pandas(), dtype=object)
        keep = s != g
        s, g = s[keep], g[keep]
        swap = s > g
        lo = np.where(swap, g, s)
        hi = np.where(swap, s, g)
        df = pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()
        return pa.table({
            "lo": pa.array(df["lo"].tolist(), pa.string()),
            "hi": pa.array(df["hi"].tolist(), pa.string()),
            "one": pa.array(np.ones(len(df), dtype=np.int64),
                            pa.int64())})

    dedup = _to_arrow_blocks(
        edges.map_batches(canon, batch_format="pyarrow")
             .groupby(["lo", "hi"])
             .aggregate(Sum("one", alias_name="one"))).materialize()
    m = dedup.count()
    empty = pa.table({"host": pa.array([], pa.string()),
                      "cut": pa.array([], pa.int64()),
                      "vol": pa.array([], pa.int64()),
                      "conductance_ppm": pa.array([], pa.int64())})
    if m == 0:
        return rd.from_arrow(empty)

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"host": pa.array([], pa.string()),
                             "cut": pa.array([], pa.int64()),
                             "vol": pa.array([], pa.int64())})
        hl = _hosts(np.asarray(t.column("lo").to_pandas(),
                               dtype=object))
        hh = _hosts(np.asarray(t.column("hi").to_pandas(),
                               dtype=object))
        crossing = (hl != hh).astype(np.int64)
        df = pd.concat([
            pd.DataFrame({"host": hl, "cut": crossing,
                          "vol": np.ones(len(hl), dtype=np.int64)}),
            pd.DataFrame({"host": hh, "cut": crossing,
                          "vol": np.ones(len(hh), dtype=np.int64)})])
        g = df.groupby("host", as_index=False).sum()
        return pa.table({
            "host": pa.array(g["host"].tolist(), pa.string()),
            "cut": pa.array(g["cut"].to_numpy(np.int64), pa.int64()),
            "vol": pa.array(g["vol"].to_numpy(np.int64),
                            pa.int64())})

    agg = _to_arrow_blocks(
        dedup.map_batches(partial, batch_format="pyarrow")
             .groupby("host")
             .aggregate(Sum("cut", alias_name="cut"),
                        Sum("vol", alias_name="vol")))

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return empty
        cut = t.column("cut").to_numpy()
        vol = t.column("vol").to_numpy()
        denom = np.maximum(np.minimum(vol, 2 * m - vol), 1)
        return pa.table({
            "host": t.column("host"),
            "cut": pa.array(cut, pa.int64()),
            "vol": pa.array(vol, pa.int64()),
            "conductance_ppm": pa.array((1_000_000 * cut) // denom,
                                        pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def conductance_oracle_sql(edges_cte: str) -> str:
    """The same per-host integer conductance in DuckDB."""
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, target) AS lo,
                   GREATEST(src, target) AS hi
            FROM raw_e WHERE src != target),
        m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m
                           FROM e),
        he AS MATERIALIZED (
            SELECT regexp_extract(lo, '://([^/]+)', 1) AS h_lo,
                   regexp_extract(hi, '://([^/]+)', 1) AS h_hi
            FROM e),
        agg AS MATERIALIZED (
            SELECT host, CAST(SUM(cut) AS BIGINT) AS cut,
                   CAST(SUM(vol) AS BIGINT) AS vol
            FROM (
                SELECT h_lo AS host,
                       CASE WHEN h_lo = h_hi THEN 0 ELSE 1 END
                           AS cut, 1 AS vol
                FROM he
                UNION ALL
                SELECT h_hi,
                       CASE WHEN h_lo = h_hi THEN 0 ELSE 1 END, 1
                FROM he)
            GROUP BY host)
        SELECT a.host, a.cut, a.vol,
               -- numerator non-negative: truncation == floor
               CAST((1000000 * a.cut)
                    // GREATEST(LEAST(a.vol, 2 * m.m - a.vol), 1)
                    AS BIGINT) AS conductance_ppm
        FROM agg a CROSS JOIN m"""
