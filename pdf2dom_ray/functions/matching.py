"""Maximal matching by parallel symmetry breaking (fixed priorities).

The pairing sibling of ``mis.py``'s Luby MIS: pick a maximal set of
edges no two of which share an endpoint. Corpus/crawl uses: pair up
near-duplicate candidates for A/B keep-one arbitration, pair mirror
hosts for diff probes, pair shards for balanced merge trees — any
"each item commits to at most one partner, no coordinator" step.

Rule (deterministic Israeli–Itai-style rounds): every canonical edge
(a < b) draws the priority string ``q = md5('match:'‖a‖':'‖b) ‖ ':'
‖ a ‖ ':' ‖ b`` — the md5 seeds the order (DuckDB's ``md5()``
replays it), the appended endpoints make q UNIQUE so "strictly
minimal" needs no tie handling. Each synchronous round matches every
surviving edge whose q is the minimum among all surviving edges at
BOTH endpoints (locally minimal edges are independent by
construction), then removes both endpoints. Bounded ``rounds`` is
the repo's closed-form convention (``mis.py``/``kcore.py``) and the
unrolled SQL oracle replays it; enough rounds yield a true maximal
matching (O(log n) w.h.p. for random priorities).

Scale shape: below ``driver_edge_limit`` one pandas/numpy loop.
Beyond: per round, per-node min-q through the hash-partitioned
aggregate (shard-local pre-min — the exchange is unique-node wide),
two ``join_ready`` equi-joins re-attach the mins to edges (matched =
q equals both), and the shrinking edge set anti-probes the matched
node set (broadcast — per round it is ≤ 2·matched edges; the
join fallback is the q22 pattern). No driver sync inside a round
beyond the broadcast put.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["maximal_matching", "matching_oracle_sql"]


def _q_of(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.array(
        [hashlib.md5(f"match:{x}:{y}".encode()).hexdigest()
         + f":{x}:{y}" for x, y in zip(a.tolist(), b.tolist())],
        dtype=object)


def _canon_pairs(edges: rd.Dataset, src_col: str,
                 dst_col: str) -> rd.Dataset:
    def local(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()
    return edges.map_batches(local, batch_format="pandas")


def _driver_matching(df: pd.DataFrame, rounds: int) -> pa.Table:
    df = df.drop_duplicates(subset=["a", "b"])
    a = df["a"].to_numpy()
    b = df["b"].to_numpy()
    q = _q_of(a, b)
    matched_a, matched_b = [], []
    for _ in range(rounds):
        if not len(a):
            break
        inc = pd.DataFrame({
            "node": np.concatenate([a, b]),
            "q": np.concatenate([q, q])})
        mq = inc.groupby("node")["q"].min()
        is_min = (q == mq[a].to_numpy()) & (q == mq[b].to_numpy())
        if not is_min.any():
            break
        matched_a.append(a[is_min])
        matched_b.append(b[is_min])
        dead = set(a[is_min].tolist()) | set(b[is_min].tolist())
        keep = np.array([x not in dead and y not in dead
                         for x, y in zip(a.tolist(), b.tolist())])
        a, b, q = a[keep], b[keep], q[keep]
    if not matched_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ma = np.concatenate(matched_a)
    mb = np.concatenate(matched_b)
    order = np.lexsort((mb, ma))
    return pa.table({"a": pa.array(ma[order].tolist()),
                     "b": pa.array(mb[order].tolist())})


def maximal_matching(edges: rd.Dataset, *, rounds: int = 6,
                     src_col: str = "src", dst_col: str = "target",
                     driver_edge_limit: int = 5_000_000,
                     num_partitions: int | None = None) -> rd.Dataset:
    """(a, b) matched pairs after ``rounds`` synchronous rounds."""
    from ..scale import scale_partitions
    n_part = num_partitions or scale_partitions()
    from ..stages.hashagg import hash_aggregate
    from .dedup import join_ready

    thin = _canon_pairs(edges, src_col, dst_col).materialize()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if thin.count() == 0:
        return rd.from_arrow(empty)
    if thin.count() <= driver_edge_limit:
        return rd.from_arrow(_driver_matching(thin.to_pandas(),
                                              rounds))

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"])

    surv = hash_aggregate(thin, ["a", "b"], dedup,
                          num_partitions=n_part)

    def with_q(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(q=pd.Series([], dtype=object))
        return df.assign(q=_q_of(df["a"].to_numpy(),
                                 df["b"].to_numpy()))

    surv = surv.map_batches(with_q,
                            batch_format="pandas").materialize()
    matched = []
    for _ in range(rounds):
        if surv.count() == 0:
            break

        def endpoints(df: pd.DataFrame) -> pd.DataFrame:
            # idempotent under re-application (hash_aggregate calls
            # it per batch AND per merge partition): edge rows fan
            # out to endpoints, partial rows min-merge as-is
            if "node" not in df.columns:
                df = pd.DataFrame({
                    "node": pd.concat([df["a"], df["b"]],
                                      ignore_index=True),
                    "mq": pd.concat([df["q"], df["q"]],
                                    ignore_index=True)})
            return df.groupby("node", as_index=False) \
                .agg(mq=("mq", "min"))

        nm = join_ready(hash_aggregate(surv, ["node"], endpoints,
                                       num_partitions=n_part),
                        n_part)
        e1 = join_ready(surv, n_part).join(
            nm, join_type="inner", num_partitions=n_part,
            on=("a",), right_on=("node",))
        e1 = join_ready(e1.map_batches(
            lambda df: df.rename(columns={"mq": "mqa"}),
            batch_format="pandas"), n_part)
        e2 = e1.join(nm, join_type="inner", num_partitions=n_part,
                     on=("b",), right_on=("node",))

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            win = (df["q"] == df["mqa"]) & (df["q"] == df["mq"])
            return df.loc[win, ["a", "b"]]

        m = e2.map_batches(pick, batch_format="pandas") \
            .materialize()
        if m.count() == 0:
            break
        matched.append(m.to_pandas())
        dead = np.unique(np.concatenate(
            [matched[-1]["a"].to_numpy(),
             matched[-1]["b"].to_numpy()]))
        dead_ref = ray.put(np.sort(dead))

        def drop_dead(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(dead_ref)   # zero-copy broadcast read
            av = df["a"].to_numpy()
            bv = df["b"].to_numpy()
            pa_ = np.minimum(np.searchsorted(ks, av), len(ks) - 1)
            pb_ = np.minimum(np.searchsorted(ks, bv), len(ks) - 1)
            keep = (ks[pa_] != av) & (ks[pb_] != bv)
            return df[keep]

        surv = surv.map_batches(drop_dead,
                                batch_format="pandas").materialize()
    if not matched:
        return rd.from_arrow(empty)
    out = pd.concat(matched, ignore_index=True) \
        .sort_values(["a", "b"])
    return rd.from_arrow(pa.Table.from_pandas(out,
                                              preserve_index=False))


def matching_oracle_sql(edges_cte: str, *, rounds: int = 6) -> str:
    """Unrolled fixed-priority matching rounds in DuckDB; every
    per-round CTE AS MATERIALIZED (CLAUDE.md invariant)."""
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        e0 AS MATERIALIZED (
            SELECT a, b,
                   md5('match:' || CAST(a AS VARCHAR) || ':'
                       || CAST(b AS VARCHAR))
                   || ':' || CAST(a AS VARCHAR)
                   || ':' || CAST(b AS VARCHAR) AS q
            FROM (SELECT DISTINCT least(src, target) AS a,
                         greatest(src, target) AS b
                  FROM e WHERE src <> target))"""]
    for r in range(rounds):
        parts.append(f""",
        bd{r} AS MATERIALIZED (
            SELECT a AS node, q FROM e{r}
            UNION ALL SELECT b, q FROM e{r}),
        nm{r} AS MATERIALIZED (
            SELECT node, MIN(q) AS mq FROM bd{r} GROUP BY 1),
        m{r} AS MATERIALIZED (
            SELECT g.a, g.b FROM e{r} g
            JOIN nm{r} na ON na.node = g.a AND na.mq = g.q
            JOIN nm{r} nb ON nb.node = g.b AND nb.mq = g.q),
        mn{r} AS MATERIALIZED (
            SELECT a AS node FROM m{r}
            UNION SELECT b FROM m{r}),
        e{r + 1} AS MATERIALIZED (
            SELECT g.a, g.b, g.q FROM e{r} g
            WHERE g.a NOT IN (SELECT node FROM mn{r})
              AND g.b NOT IN (SELECT node FROM mn{r}))""")
    union = "\n            UNION ALL ".join(
        f"SELECT a, b FROM m{r}" for r in range(rounds))
    parts.append(f"""
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
        FROM ({union}) ORDER BY 1, 2""")
    return "".join(parts)
