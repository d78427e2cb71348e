"""k-truss peel over an edge set (bounded synchronous rounds).

The edge-density sibling of the k-core (``kcore.py``): the k-truss is
the maximal subgraph in which every edge participates in ≥ k−2
triangles (Cohen 2008, "Trusses: cohesive subgraphs for social
network analysis") — a stricter mesh detector than the core (every
truss edge needs k−2 *mutual* neighbors, not just endpoints of high
degree), the standard community-backbone / spam-mesh primitive.

Semantics: DISTINCT undirected pair set, self-loops dropped;
``rounds`` synchronous peels — each round recomputes every surviving
edge's support (common-neighbor count within the surviving set) and
drops all edges with support < k−2 AT ONCE. Bounded rounds are a
closed-form, partition-independent quantity the unrolled SQL oracle
replays (the ``bfs.py``/``kcore.py`` convention); enough rounds
reach the true k-truss. Output: (a, b, support) for surviving edges
(a < b), support recomputed within the final surviving set.

Scale shape: each peel round IS a per-edge common-neighbor pass —
exactly ``linkpred.edge_neighbor_overlap``'s wedge-join (oriented
wedge emission from the lower-degree endpoint, one (v,w)-edge hash
join; O(Σ wedges), never adjacency×adjacency) — so the distributed
path simply iterates that operator over the shrinking edge set,
``rounds``× its cost, no new exchange primitive. Below
``driver_edge_limit`` the whole peel runs in one numpy bitset loop
(n×⌈n/64⌉ packed adjacency; support = popcount(row[a] & row[b]) —
vectorized over all edges at once) with early fixed-point exit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["ktruss_edges", "ktruss_oracle_sql"]


def _canon(edges: rd.Dataset, src_col: str,
           dst_col: str) -> rd.Dataset:
    def local(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()
    return edges.map_batches(local, batch_format="pandas")


def _driver_ktruss(df: pd.DataFrame, k: int, rounds: int) -> pa.Table:
    nodes, codes = np.unique(
        np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
        return_inverse=True)
    n = len(nodes)
    m = len(df)
    combo = np.unique(codes[:m].astype(np.int64) * n + codes[m:])
    ui, vi = (combo // n).astype(np.int64), \
        (combo % n).astype(np.int64)

    W = (n + 63) // 64

    def support(ui, vi):
        adj = np.zeros((n, W), dtype=np.uint64)
        # unbuffered: fancy |= drops duplicate (row, word) updates
        np.bitwise_or.at(adj, (ui, vi >> 6),
                         np.uint64(1) << (vi & 63).astype(np.uint64))
        np.bitwise_or.at(adj, (vi, ui >> 6),
                         np.uint64(1) << (ui & 63).astype(np.uint64))
        both = adj[ui] & adj[vi]
        bits = np.unpackbits(both.view(np.uint8), axis=1)
        return bits.sum(axis=1).astype(np.int64)

    for _ in range(rounds):
        if not len(ui):
            break
        sup = support(ui, vi)
        keep = sup >= k - 2
        if keep.all():
            break           # fixed point
        ui, vi = ui[keep], vi[keep]
    sup = support(ui, vi) if len(ui) else np.zeros(0, np.int64)
    order = np.lexsort((vi, ui))
    return pa.table({
        "a": pa.array(nodes[ui[order]].tolist()),
        "b": pa.array(nodes[vi[order]].tolist()),
        "support": pa.array(sup[order], pa.int64())})


def ktruss_edges(edges: rd.Dataset, *, k: int = 4, rounds: int = 3,
                 src_col: str = "src", dst_col: str = "target",
                 driver_edge_limit: int = 5_000_000,
                 num_partitions: int | None = None) -> rd.Dataset:
    """(a, b, support) for the edges surviving ``rounds`` synchronous
    k-truss peels of ``edges`` (undirected, dups/self-loops fine)."""
    if k < 3:
        raise ValueError("ktruss requires k >= 3")
    thin = _canon(edges, src_col, dst_col).materialize()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(empty)
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(
            _driver_ktruss(thin.to_pandas(), k, rounds))

    from .linkpred import edge_neighbor_overlap
    surv = thin
    for _ in range(rounds):
        ov = edge_neighbor_overlap(
            surv, src_col="a", dst_col="b",
            num_partitions=num_partitions,
            driver_edge_limit=0).materialize()
        nxt = ov.map_batches(
            lambda df: df.loc[df["cn"] >= k - 2, ["a", "b"]],
            batch_format="pandas").materialize()
        if nxt.count() == surv.count():
            surv = nxt
            break           # fixed point
        surv = nxt
        if surv.count() == 0:
            return rd.from_arrow(empty)
    final = edge_neighbor_overlap(surv, src_col="a", dst_col="b",
                                  num_partitions=num_partitions,
                                  driver_edge_limit=0)
    return final.map_batches(
        lambda df: df[["a", "b", "cn"]]
        .rename(columns={"cn": "support"})
        .sort_values(["a", "b"]),
        batch_format="pandas")


def ktruss_oracle_sql(edges_cte: str, *, k: int = 4,
                      rounds: int = 3) -> str:
    """Unrolled ``rounds``-peel k-truss in DuckDB; every per-round
    CTE AS MATERIALIZED (CLAUDE.md invariant). Support per round is
    the wedge join e⋈bd⋈bd; edges absent from sup{r} have zero
    common neighbors and are peeled implicitly by the INNER join
    (k ≥ 3 ⇒ threshold ≥ 1). The final support LEFT-joins so
    bounded-round survivors with eroded support still report."""
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        e0 AS MATERIALIZED (
            SELECT DISTINCT least(src, target) AS a,
                            greatest(src, target) AS b
            FROM e WHERE src <> target)"""]
    for r in range(rounds):
        parts.append(f""",
        bd{r} AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e{r}
            UNION ALL SELECT b, a FROM e{r}),
        sup{r} AS MATERIALIZED (
            SELECT g.a, g.b, count(*) AS cn
            FROM e{r} g
            JOIN bd{r} x ON x.u = g.a
            JOIN bd{r} y ON y.u = g.b AND y.v = x.v
            GROUP BY 1, 2),
        e{r + 1} AS MATERIALIZED (
            SELECT a, b FROM sup{r} WHERE cn >= {k - 2})""")
    parts.append(f""",
        bdf AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e{rounds}
            UNION ALL SELECT b, a FROM e{rounds}),
        supf AS MATERIALIZED (
            SELECT g.a, g.b, count(*) AS cn
            FROM e{rounds} g
            JOIN bdf x ON x.u = g.a
            JOIN bdf y ON y.u = g.b AND y.v = x.v
            GROUP BY 1, 2)
        SELECT g.a, g.b,
               CAST(COALESCE(supf.cn, 0) AS BIGINT) AS support
        FROM e{rounds} g
        LEFT JOIN supf ON g.a = supf.a AND g.b = supf.b
        ORDER BY 1, 2""")
    return "".join(parts)
