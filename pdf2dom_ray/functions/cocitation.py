"""Co-citation / bibliographic-coupling related-page pairs.

The classic "related pages" signals (Small 1973 co-citation; Kessler
1963 bibliographic coupling; applied to the web by Dean & Henzinger
1999, "Finding Related Pages in the World Wide Web", WWW8): two pages
are related when many common HUBS link to both (co-citation), or when
they themselves cite many common targets (coupling). Complements the
centrality family (pagerank / HITS / SALSA) with a pairwise
similarity primitive over pure link structure — no content needed.

Semantics
---------
Over the distinct (src, target) edge set, with ``mode="cocitation"``
(hub = src, item = target; ``"coupling"`` swaps the roles):

    drop hubs whose distinct-item fan-out exceeds ``max_fanout``
    n_common(a, b) = #hubs h (kept) with (h,a) and (h,b) edges, a < b
    emit pairs with n_common >= ``min_count``

The fan-out cap is part of the published formulation, not a
performance hack: mega-hubs (navigation pages, link farms) co-cite
everything with everything and carry no relatedness signal — Dean &
Henzinger discard high-degree hubs for the same reason. It is also
what bounds the quadratic step (below). Counts are integers over a
deterministic pair orientation (lexicographic a < b), so the DuckDB
oracle (``cocitation_oracle_sql``) hash-matches exactly.

Scale shape (100 TB reading)
----------------------------
One hash exchange keyed on the hub (narrow (hub, item) rows — every
copy of an edge lands in its hub's partition, so global dedup and the
fan-out count are partition-local), then a fully VECTORIZED
within-partition pair emission (the numpy repeat/arange index
arithmetic shared with ``triangles.py``'s wedge step — no per-hub
Python loop), then a combiner → hash-partitioned count on the (a, b)
pair. Pair volume is Σ_h C(min(d_h, cap), 2) <= cap·m/2 — LINEAR in
edges for a fixed cap, never the uncapped Σ d² blowup; skewed hubs
cost only their own (capped) group. Below ``driver_edge_limit``
distinct edges the same vectorized emission runs once on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["cocitation", "cocitation_reference",
           "cocitation_oracle_sql"]


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def _pairs_from_sorted(hub: np.ndarray, item: np.ndarray,
                       max_fanout: int):
    """Distinct (hub, item) rows sorted by (hub, item) → (a, b) arrays
    of every within-hub item pair (a before b in sort order), skipping
    hubs with more than ``max_fanout`` items. Pure index arithmetic —
    no Python loop (the triangles.py wedge pattern)."""
    n = len(hub)
    if not n:
        return item[:0], item[:0]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = hub[1:] != hub[:-1]
    grp = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    local = np.arange(n) - starts[grp]
    reps = np.where(sizes[grp] <= max_fanout,
                    sizes[grp] - 1 - local, 0)
    total = int(reps.sum())
    if not total:
        return item[:0], item[:0]
    v_rows = np.repeat(np.arange(n), reps)
    cum = np.concatenate(([0], np.cumsum(reps)))
    w_rows = np.arange(total) - np.repeat(cum[:-1], reps) + v_rows + 1
    return item[v_rows], item[w_rows]


def cocitation(edges: rd.Dataset, *, mode: str = "cocitation",
               max_fanout: int = 64, min_count: int = 2,
               src_col: str = "src", target_col: str = "target",
               num_partitions: int | None = None,
               driver_edge_limit: int = 5_000_000) -> rd.Dataset:
    """(src, target) edge rows → (a, b, n_common:int64) related-item
    pairs (a < b lexicographically). ``edges`` may carry extra columns
    and duplicate edges; the graph is the distinct (src, target) set.
    ``driver_edge_limit=0`` forces the distributed path."""
    from ..stages.hashagg import hash_aggregate
    from .pagerank import _thin

    if mode not in ("cocitation", "coupling"):
        raise ValueError(f"unknown mode {mode!r}")
    hub_col, item_col = (src_col, target_col) if mode == "cocitation" \
        else (target_col, src_col)

    # item dtype survives empty intermediates (a pair-free graph must
    # still yield a stable (a, b, n_common) schema — triangles.py's
    # sentinel pattern)
    sch = edges.schema()
    t = dict(zip(sch.names, sch.types))[item_col]
    item_dtype = t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") \
        else ("object" if t is object else t)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "a": pd.Series([], dtype=item_dtype),
            "b": pd.Series([], dtype=item_dtype),
            "n_common": pd.Series([], dtype="int64")})

    thin = _thin(edges.select_columns([hub_col, item_col])
                 .rename_columns({hub_col: "hub", item_col: "item"}),
                 ["hub", "item"]).materialize()
    n_part = num_partitions or _n_partitions()

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["hub", "item"]].drop_duplicates() \
            .sort_values(["hub", "item"], kind="mergesort")
        a, b = _pairs_from_sorted(g["hub"].to_numpy(),
                                  g["item"].to_numpy(), max_fanout)
        return pd.DataFrame({"a": a, "b": b,
                             "n_common": np.ones(len(a),
                                                 dtype=np.int64)})

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], as_index=False) \
            .agg(n_common=("n_common", "sum"))

    if thin.count() <= driver_edge_limit:
        pairs = emit(thin.to_pandas())
        out = count_pairs(pairs) if len(pairs) else _empty()
        out = out[out["n_common"] >= min_count]
        out["n_common"] = out["n_common"].astype("int64")
        return rd.from_pandas(out if len(out) else _empty())

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["hub"], index=False)
        return df.assign(__part=(h % n_part).astype("int64")
                         .to_numpy())

    pairs = thin.map_batches(tag, batch_format="pandas") \
        .groupby("__part").map_groups(
            lambda g: emit(g.drop(columns="__part")),
            batch_format="pandas")
    counted = hash_aggregate(pairs, ["a", "b"], count_pairs,
                             num_partitions=n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "a" not in df.columns:
            return _empty()
        df = df[df["n_common"] >= min_count].copy()
        df["n_common"] = df["n_common"].astype("int64")
        return df

    # a pair-free graph produces ZERO blocks; one typed empty sentinel
    # keeps the schema stable
    return counted.map_batches(finish, batch_format="pandas") \
        .union(rd.from_pandas(_empty()))


def cocitation_reference(edge_list, *, mode: str = "cocitation",
                         max_fanout: int = 64,
                         min_count: int = 2) -> dict:
    """Pure-Python reference of the same semantics (tests):
    (a, b) -> n_common."""
    edges = set(edge_list)
    if mode == "coupling":
        edges = {(v, u) for u, v in edges}
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    counts: dict = {}
    for items in adj.values():
        if len(items) > max_fanout:
            continue
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                counts[(s[i], s[j])] = counts.get((s[i], s[j]), 0) + 1
    return {p: c for p, c in counts.items() if c >= min_count}


def cocitation_oracle_sql(edges_cte: str, *,
                          mode: str = "cocitation",
                          max_fanout: int = 64,
                          min_count: int = 2) -> str:
    """DuckDB twin of ``cocitation`` (same cap + pair orientation)."""
    key, val = ("src", "target") if mode == "cocitation" \
        else ("target", "src")
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT {key} AS hub, {val} AS item FROM raw_e),
        od AS (SELECT hub, count(*) AS d FROM e GROUP BY hub),
        ok AS (SELECT e.hub, e.item FROM e JOIN od USING (hub)
               WHERE od.d <= {max_fanout})
        SELECT x.item AS a, y.item AS b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM ok x JOIN ok y ON x.hub = y.hub AND x.item < y.item
        GROUP BY 1, 2
        HAVING count(*) >= {min_count}"""
