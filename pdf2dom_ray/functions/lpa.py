"""Label-propagation community detection (synchronous LPA).

Raghavan, Albert & Kumara 2007 ("Near linear time algorithm to detect
community structures in large-scale networks", Phys. Rev. E 76):
every node starts labeled with its own id; each round every node
adopts the label that is MOST FREQUENT among its neighbors' labels
(the node's own label does not vote), ties broken by the smallest
label. Densely intra-connected groups converge to one label per
group — the web-graph community / topic-cluster primitive, the
near-linear-time complement to modularity methods. Eighth member of
the graph family (PageRank, HITS, triangles, BFS, CC, k-core,
TrustRank).

Semantics: the graph is the DISTINCT undirected simple pair set
(self-loops dropped, (u,v) ≡ (v,u) — the ``kcore.py`` convention);
``rounds`` SYNCHRONOUS updates — every round-k+1 label is the mode of
round-k neighbor labels. Synchronous LPA can oscillate (a bipartite
graph 2-colors and flips forever), so the bounded ``rounds`` is part
of the semantics, not just a budget: the result after exactly R
rounds is a closed-form, partition-independent quantity the unrolled
SQL oracle replays (the bounded-round convention of ``bfs.py`` /
``ccomp.py`` / ``kcore.py``). The deterministic mode/tie rule (count
desc, label asc) replaces the random tie-coin of the paper — required
for the oracle to hash-match.

Scale shape: reuses ``graphbsp.ShardedGraph`` with BOTH layouts and
canonical pairs (the k-core configuration — directed shard-local
dedup on canonical pairs is exactly undirected dedup); per round 2·P
scatter tasks push labels along lo→hi and hi→lo edges grouped by the
receiving shard and P gather tasks take the per-node mode; exchange
volume is O(m) label values. The mode with a deterministic tie rule
is a set function of the received multiset — order-independent, so
labels are identical under any partitioning (locked against the
driver path by tests). Below ``driver_edge_limit`` the whole
recurrence is one numpy loop over integer codes (codes preserve id
order, so min-code ties == min-id ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["lpa_communities", "lpa_oracle_sql"]


def _mode_update(lbl: np.ndarray, nbr_dst: np.ndarray,
                 nbr_lbl: np.ndarray, n: int) -> np.ndarray:
    """One synchronous LPA round over integer codes: for every node
    appearing in ``nbr_dst``, the most frequent ``nbr_lbl`` value
    (ties → smallest). n² must fit int64 (n ≤ ~3e9 — the driver-path
    regime by construction)."""
    key = nbr_dst * n + nbr_lbl
    uniq, cnt = np.unique(key, return_counts=True)
    node, lab = uniq // n, uniq % n
    order = np.lexsort((lab, -cnt, node))
    node, lab = node[order], lab[order]
    _, first = np.unique(node, return_index=True)
    nxt = lbl.copy()
    nxt[node[first]] = lab[first]
    return nxt


def _driver_lpa(df: pd.DataFrame, rounds: int) -> pa.Table:
    u = df["src"].to_numpy()
    v = df["target"].to_numpy()
    nodes, codes = np.unique(np.concatenate([u, v]),
                             return_inverse=True)
    n = len(nodes)
    combo = np.unique(codes[:len(u)].astype(np.int64) * n
                      + codes[len(u):])
    ui, vi = combo // n, combo % n
    nbr_dst = np.concatenate([ui, vi])
    nbr_src = np.concatenate([vi, ui])
    lbl = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        nxt = _mode_update(lbl, nbr_dst, lbl[nbr_src], n)
        if np.array_equal(nxt, lbl):
            break                  # fixed point: further rounds no-op
        lbl = nxt
    return pa.table({"node": pa.array(nodes.tolist()),
                     "community": pa.array(nodes[lbl].tolist())})


def lpa_communities(edges: rd.Dataset, *, rounds: int = 4,
                    driver_edge_limit: int = 5_000_000,
                    n_part: int | None = None) -> rd.Dataset:
    """(node, community) after ``rounds`` synchronous label
    propagations over ``edges`` (treated as simple undirected;
    duplicates/self-loops fine). ``community`` is a node id — the
    round-R label."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph
    from .kcore import _canonical

    thin = _canonical(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "community": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_lpa(thin.to_pandas(), rounds))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P, both_directions=True)

    @ray.remote
    def init_lbl(node_shard):
        urls, _ = node_shard
        return np.asarray(urls, dtype=object)   # label = own id

    @ray.remote
    def scatter(edge_shard, lbl):
        key_idx, other_idx, offsets = edge_shard
        cand = lbl[key_idx]
        out = tuple((other_idx[offsets[q]:offsets[q + 1]],
                     cand[offsets[q]:offsets[q + 1]])
                    for q in range(len(offsets) - 1))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, cand)
        return out if len(out) > 1 else out[0]

    @ray.remote
    def gather(lbl, *pieces):
        """Per-node mode of the received labels (count desc, label
        asc) — object-dtype comparisons are Python-level but the rule
        is a pure set function of the multiset, so order-independent
        and bit-identical to the driver path."""
        idx = np.concatenate([p[0] for p in pieces])
        lab = np.concatenate([p[1] for p in pieces])
        nxt = lbl.copy()
        if len(idx) == 0:
            return nxt
        order = np.lexsort((lab, idx))
        idx, lab = idx[order], lab[order]
        change = np.empty(len(idx), dtype=bool)
        change[0] = True
        change[1:] = (idx[1:] != idx[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(change)
        run_i = idx[starts]
        run_l = lab[starts]
        run_c = np.diff(np.append(starts, len(idx)))
        # stable sort by (node, count desc); within a node equal
        # counts keep label-ascending order, so first-per-node is the
        # mode with min-label tie-break
        order2 = np.lexsort((-run_c, run_i))
        _, first = np.unique(run_i[order2], return_index=True)
        sel = order2[first]
        nxt[run_i[sel]] = run_l[sel]
        return nxt

    @ray.remote
    def finalize(node_shard, lbl) -> pa.Table:
        urls, _ = node_shard
        return pa.table({"node": pa.array(np.asarray(urls).tolist()),
                         "community": pa.array(lbl.tolist())})

    lbl = [init_lbl.remote(g.node_shards[q]) for q in range(P)]
    for _ in range(rounds):
        fwd = [scatter.options(num_returns=P)
               .remote(g.edges_by_src[p], lbl[p]) for p in range(P)]
        rev = [scatter.options(num_returns=P)
               .remote(g.edges_by_tgt[p], lbl[p]) for p in range(P)]
        if P == 1:
            fwd, rev = [[s] for s in fwd], [[s] for s in rev]
        lbl = [gather.remote(lbl[q],
                             *[fwd[p][q] for p in range(P)],
                             *[rev[p][q] for p in range(P)])
               for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], lbl[q]) for q in range(P)])


def lpa_oracle_sql(edges_cte: str, *, rounds: int = 4) -> str:
    """Unrolled ``rounds``-step synchronous LPA in DuckDB. Every
    per-round CTE is AS MATERIALIZED (CLAUDE.md invariant). Tie rule:
    count desc, label asc — DuckDB's binary VARCHAR collation equals
    numpy object-string ordering for the ascii ids used here, and
    integer ids order identically on both sides."""
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, target) AS a,
                            greatest(src, target) AS b
            FROM e WHERE src <> target),
        ee AS MATERIALIZED (
            SELECT a AS u, b AS v FROM und
            UNION ALL SELECT b, a FROM und),
        l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl
                            FROM ee)"""]
    for k in range(rounds):
        parts.append(f""",
        c{k} AS MATERIALIZED (
            SELECT ee.u AS node, l.lbl AS lab, count(*) AS cnt
            FROM ee JOIN l{k} l ON ee.v = l.node
            GROUP BY ee.u, l.lbl),
        l{k + 1} AS MATERIALIZED (
            SELECT node, lab AS lbl FROM (
                SELECT node, lab,
                       ROW_NUMBER() OVER (PARTITION BY node
                           ORDER BY cnt DESC, lab ASC) AS rn
                FROM c{k})
            WHERE rn = 1)""")
    parts.append(f"\nSELECT node, lbl AS community FROM l{rounds}")
    return "".join(parts)
