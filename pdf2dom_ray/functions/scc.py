"""Strongly connected components by bounded forward-backward peeling.

The directed complement of ``ccomp.py``'s undirected components: SCC
labels are what link-farm detection, crawl bow-tie censuses and
dedup-graph condensation consume. Exact distributed SCC is iterative
divide-and-conquer (Fleischer et al. 2000, FW-BW); this operator is
its PEEL variant with the repo's bounded-round convention so the
result is a closed form the unrolled SQL oracle replays:

    repeat ``outer_rounds`` times over the remaining graph:
        pivot = smallest remaining node id
        F = nodes reachable FROM pivot within ``rounds`` hops
        B = nodes reaching pivot within ``rounds`` hops
        label F ∩ B (pivot's SCC) with the pivot id; remove them
    every node still unlabeled keeps its own id.

With ``rounds`` ≥ diameter and ``outer_rounds`` ≥ the number of
non-trivial SCCs met in min-id order, the labeling is EXACT (the
min-id pivot is its component's canonical label, and singleton SCCs
self-label by construction); smaller bounds are still deterministic,
partition-independent quantities (the bfs.py convention). The synth
host graph has two non-trivial SCCs, so the defaults are exact there.

Scale shape: a pure composition — per outer round two
``bfs_depths`` passes (driver-numpy under ``driver_edge_limit``,
raw-task BSP scatter/gather beyond) over the peeled edge set. The
peel filter ships the labeled-node set via ``ray.put`` broadcast
(sorted searchsorted probe) under ``broadcast_limit``; past it, two
``join_ready``-guarded ``left_anti`` hash joins (src side, then
target side) remove labeled endpoints — the honest big-edge path.
Known bound: each peeled component's node ids ARE materialized
driver-side (the F∩B intersection) — fine for the label sets this
operator exists for (link-farm cores, mirror rings); a peel whose
single component exceeds driver memory would need the intersection
kept as a dataset (hash-partitioned semi-join), the same escalation
path the dedup CC takes past ``driver_edge_limit``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .bfs import bfs_depths, bfs_oracle_sql
from .dedup import join_ready
from .pagerank import _thin

__all__ = ["scc_labels", "scc_oracle_sql", "condensation_edges",
           "condensation_oracle_sql"]


def _swap(t: pa.Table) -> pa.Table:
    return pa.table({"src": t.column("target"),
                     "target": t.column("src")})


def _endpoint_min(thin: rd.Dataset) -> int | None:
    """Smallest node id among edge endpoints (None if no edges)."""
    lo_s = thin.min("src")
    lo_t = thin.min("target")
    if lo_s is None and lo_t is None:
        return None
    return int(min(x for x in (lo_s, lo_t) if x is not None))


def scc_labels(edges: rd.Dataset, *, outer_rounds: int = 3,
               rounds: int = 8,
               driver_edge_limit: int = 5_000_000,
               broadcast_limit: int = 2_000_000,
               n_part: int | None = None) -> rd.Dataset:
    """(node, scc) int64 labels for every edge endpoint under the
    bounded FW-BW peel above."""
    from ..scale import scale_partitions

    npart = n_part or scale_partitions()
    thin = _thin(edges, ["src", "target"]).materialize()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "scc": pa.array([], pa.int64())})
    if thin.count() == 0:
        return rd.from_arrow(empty)

    labeled: list[pa.Table] = []          # (node, scc) chunks
    cur = thin
    for _ in range(outer_rounds):
        if cur.count() == 0:
            break
        pivot = _endpoint_min(cur)
        fwd = bfs_depths(cur, [pivot], rounds=rounds,
                         driver_edge_limit=driver_edge_limit)
        bwd = bfs_depths(cur.map_batches(_swap,
                                         batch_format="pyarrow"),
                         [pivot], rounds=rounds,
                         driver_edge_limit=driver_edge_limit)
        f_ids = np.sort(np.concatenate(
            [b.column("node").to_numpy()
             for b in ray.get(fwd.to_arrow_refs()) if b.num_columns]
            or [np.empty(0, np.int64)]).astype(np.int64))
        comp = None
        b_blocks = [b for b in ray.get(bwd.to_arrow_refs())
                    if b.num_columns]
        parts = []
        for b in b_blocks:
            ids = b.column("node").to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(f_ids, ids),
                             max(len(f_ids) - 1, 0))
            hit = f_ids[pos] == ids if len(f_ids) else \
                np.zeros(len(ids), dtype=bool)
            parts.append(ids[hit])
        comp = np.sort(np.concatenate(parts)) if parts else \
            np.array([pivot], dtype=np.int64)
        if not len(comp):
            comp = np.array([pivot], dtype=np.int64)
        labeled.append(pa.table({
            "node": pa.array(comp, pa.int64()),
            "scc": pa.array(np.full(len(comp), pivot, np.int64),
                            pa.int64())}))

        # peel: drop every edge touching a labeled node
        if len(comp) <= broadcast_limit:
            comp_ref = ray.put(comp)

            def drop(t: pa.Table, _ref=comp_ref) -> pa.Table:
                c = ray.get(_ref)
                s = t.column("src").to_numpy()
                g = t.column("target").to_numpy()

                def out(ids):
                    if not len(c):
                        return np.ones(len(ids), dtype=bool)
                    p = np.minimum(np.searchsorted(c, ids),
                                   len(c) - 1)
                    return c[p] != ids

                return t.filter(pa.array(out(s) & out(g)))

            cur = cur.map_batches(drop,
                                  batch_format="pyarrow") \
                .materialize()
        else:
            # join partition count must not exceed the row count:
            # surplus hash partitions receive only empty blocks and
            # the join finalize rejects them (CLAUDE.md join flake)
            np_eff = max(1, min(npart, cur.count(), len(comp)))
            comp_ds = join_ready(rd.from_arrow(pa.table({
                "node": pa.array(comp, pa.int64())})), np_eff)
            cur = join_ready(cur, np_eff).join(
                comp_ds, join_type="left_anti",
                num_partitions=np_eff, on=("src",),
                right_on=("node",)).materialize()
            n1 = cur.count()
            if n1 == 0:
                # join_ready cannot save a FULLY empty side
                # (CLAUDE.md): the target-side peel is vacuous anyway
                break
            cur = join_ready(cur, min(np_eff, n1)).join(
                comp_ds, join_type="left_anti",
                num_partitions=min(np_eff, n1), on=("target",),
                right_on=("node",)).materialize()

    # every ORIGINAL endpoint not peeled self-labels (deriving the
    # remainder from the peeled edge set would lose nodes isolated
    # by the peel — e.g. a node whose only edge pointed into a
    # removed component)
    from .pagerank import _distinct

    def endpoints(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            t.column("src").combine_chunks().cast(pa.int64()),
            t.column("target").combine_chunks().cast(pa.int64())])
        ids = np.unique(np.asarray(node, dtype=np.int64))
        return pa.table({"node": pa.array(ids, pa.int64())})

    universe = _distinct(
        thin.map_batches(endpoints, batch_format="pyarrow"),
        ["node"])
    lab = np.sort(np.concatenate(
        [t.column("node").to_numpy() for t in labeled]
        or [np.empty(0, np.int64)]).astype(np.int64)) \
        if labeled else np.empty(0, np.int64)
    if len(lab) <= broadcast_limit:
        lab_ref = ray.put(lab)

        def unlabeled(t: pa.Table, _ref=lab_ref) -> pa.Table:
            c = ray.get(_ref)
            ids = t.column("node").to_numpy()
            if not len(c):
                keep = np.ones(len(ids), dtype=bool)
            else:
                p = np.minimum(np.searchsorted(c, ids), len(c) - 1)
                keep = c[p] != ids
            ids = ids[keep].astype(np.int64)
            return pa.table({"node": pa.array(ids, pa.int64()),
                             "scc": pa.array(ids, pa.int64())})

        rest = universe.map_batches(unlabeled,
                                    batch_format="pyarrow")
    else:
        np_eff = max(1, min(npart, universe.count(), len(lab)))
        lab_ds = join_ready(rd.from_arrow(pa.table({
            "lnode": pa.array(lab, pa.int64())})), np_eff)

        def selfl(t: pa.Table) -> pa.Table:
            ids = t.column("node").to_numpy().astype(np.int64)
            return pa.table({"node": pa.array(ids, pa.int64()),
                             "scc": pa.array(ids, pa.int64())})

        rest = join_ready(universe, np_eff).join(
            lab_ds, join_type="left_anti", num_partitions=np_eff,
            on=("node",), right_on=("lnode",)) \
            .map_batches(selfl, batch_format="pyarrow")

    if labeled:
        done = rd.from_arrow(pa.concat_tables(labeled))
        return done.union(rest) if rest.count() else done
    return rest


def scc_oracle_sql(edges_cte: str, *, outer_rounds: int = 3,
                   rounds: int = 8) -> str:
    """Unrolled peel: per outer round, two bfs reach CTEs over the
    current edge set, the F∩B component, and the filtered next edge
    set — every level AS MATERIALIZED (CLAUDE.md invariant)."""
    parts = [f"WITH e_0 AS MATERIALIZED ({edges_cte})"]
    for r in range(outer_rounds):
        pivot = (f"(SELECT LEAST(MIN(src), MIN(target)) FROM e_{r})")
        seeds = f"SELECT {pivot} AS node"
        fwd = bfs_oracle_sql(f"SELECT src, target FROM e_{r}",
                             seeds, rounds=rounds)
        bwd = bfs_oracle_sql(
            f"SELECT target AS src, src AS target FROM e_{r}",
            seeds, rounds=rounds)
        parts.append(f""",
        f_{r} AS MATERIALIZED ({fwd}),
        b_{r} AS MATERIALIZED ({bwd}),
        c_{r} AS MATERIALIZED (
            SELECT f.node, CAST({pivot} AS BIGINT) AS scc
            FROM f_{r} f JOIN b_{r} b ON f.node = b.node),
        e_{r + 1} AS MATERIALIZED (
            SELECT src, target FROM e_{r}
            WHERE src NOT IN (SELECT node FROM c_{r})
              AND target NOT IN (SELECT node FROM c_{r}))""")
    comps = " UNION ALL ".join(
        f"SELECT node, scc FROM c_{r}" for r in range(outer_rounds))
    not_in = " AND ".join(
        f"node NOT IN (SELECT node FROM c_{r})"
        for r in range(outer_rounds))
    return "".join(parts) + f"""
        SELECT CAST(node AS BIGINT) AS node,
               CAST(scc AS BIGINT) AS scc
        FROM ({comps}
              UNION ALL
              SELECT node, node AS scc FROM
                (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM e_0
                   UNION ALL SELECT target FROM e_0))
              WHERE {not_in})"""


def condensation_edges(edges: rd.Dataset, *, outer_rounds: int = 3,
                       rounds: int = 8,
                       driver_edge_limit: int = 5_000_000,
                       broadcast_limit: int = 2_000_000,
                       n_part: int | None = None) -> rd.Dataset:
    """(scc_src, scc_target, n_edges) — the SCC quotient DAG (the
    "condensation"): every edge relabeled by its endpoints' SCC
    labels, self-loops dropped, parallel edges counted. The graph a
    crawl planner actually schedules over (inter-component reachability
    without cycles).

    Scale shape: ``scc_labels`` (above) + ONE label attach. The label
    table is ≤ one narrow row per node; under ``broadcast_limit`` it
    ships once via ``ray.put`` as sorted arrays and each edge batch
    relabels map-side (no join), then one narrow groupby counts pair
    multiplicity. Past the limit the attach is two ``join_ready``
    hash joins — the same dual path as the peel filter.
    """
    import pandas as pd

    from ..scale import scale_partitions
    from .dedup import _to_arrow_blocks
    from .pagerank import _distinct

    npart = n_part or scale_partitions()
    labels = scc_labels(edges, outer_rounds=outer_rounds,
                        rounds=rounds,
                        driver_edge_limit=driver_edge_limit,
                        broadcast_limit=broadcast_limit,
                        n_part=npart)
    lab_blocks = [b for b in ray.get(
        _to_arrow_blocks(labels).to_arrow_refs()) if b.num_columns]
    empty = pa.table({"scc_src": pa.array([], pa.int64()),
                      "scc_target": pa.array([], pa.int64()),
                      "n_edges": pa.array([], pa.int64())})
    if not lab_blocks:
        return rd.from_arrow(empty)
    lab = pa.concat_tables(lab_blocks)
    nodes = lab.column("node").to_numpy().astype(np.int64)
    sccs = lab.column("scc").to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    nodes, sccs = nodes[order], sccs[order]
    lab_ref = ray.put((nodes, sccs))

    # GLOBAL distinct, matching the oracle's SELECT DISTINCT — batch-
    # local _thin would double-count an edge duplicated across blocks
    thin = _distinct(edges, ["src", "target"])

    def relabel(t: pa.Table) -> pa.Table:
        ks, lb = ray.get(lab_ref)
        s = t.column("src").to_numpy().astype(np.int64)
        g = t.column("target").to_numpy().astype(np.int64)
        ps = np.searchsorted(ks, s)
        pg = np.searchsorted(ks, g)
        a, b = lb[ps], lb[pg]
        keep = a != b                       # quotient drops self-loops
        df = pd.DataFrame({"scc_src": a[keep],
                           "scc_target": b[keep]})
        df["n_edges"] = np.int64(1)
        g2 = df.groupby(["scc_src", "scc_target"],
                        as_index=False)["n_edges"].sum()
        return pa.Table.from_pandas(g2, preserve_index=False)

    from ..stages.hashagg import hash_aggregate
    out = hash_aggregate(
        thin.map_batches(relabel, batch_format="pyarrow"),
        ["scc_src", "scc_target"],
        lambda df: df.groupby(["scc_src", "scc_target"],
                              as_index=False)["n_edges"].sum())
    return out


def condensation_oracle_sql(edges_cte: str, *, outer_rounds: int = 3,
                            rounds: int = 8) -> str:
    """The peel oracle as a labels CTE + relabel/aggregate."""
    labels = scc_oracle_sql(edges_cte, outer_rounds=outer_rounds,
                            rounds=rounds)
    return f"""
        WITH lab AS MATERIALIZED ({labels}),
        raw AS (SELECT DISTINCT src, target FROM ({edges_cte}))
        SELECT ls.scc AS scc_src, lt.scc AS scc_target,
               CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM raw
        JOIN lab ls ON raw.src = ls.node
        JOIN lab lt ON raw.target = lt.node
        WHERE ls.scc <> lt.scc
        GROUP BY 1, 2"""
