"""Deterministic random-walk corpus over the link graph.

DeepWalk (Perozzi et al. 2014) and node2vec (Grover & Leskovec 2016)
turn a graph into a TRAINING CORPUS by sampling truncated random
walks and feeding the node sequences to a skip-gram model — the
graph-side analogue of this repo's text-corpus operators. The walk
generator is the whole distributed problem (the skip-gram consumer is
the existing text/packing machinery); at web scale it is a
walker-scatter BSP loop over the partitioned graph (the approach of
KnightKing, Yang et al. SOSP 2019: walkers live with their current
node's shard and migrate one hop per superstep).

Semantics
---------
Over the distinct (src, target) edge set, from caller-supplied seeds
(walk_id, url), ``length`` steps of the md5-derandomized walk:

    nbrs(u)  = distinct targets of u, ordered by target ASC
    h(w,k,u) = int(md5(f"{salt}:{w}:{k}:{u}")[:2], 16)   (0..255)
    next     = nbrs(u)[ h(walk_id, step, u) % |nbrs(u)| ]

A walk emits (walk_id, step, url) rows from step 0 (the seed) and
STOPS at a dangling node (no out-edges) — truncated-walk semantics.
The md5 convention is the repo's standard derandomizer (CLAUDE.md:
md5-hex decisions are string-stable so DuckDB replays them exactly);
the two-hex-digit draw is deliberately SQL-replayable
(``walks_oracle_sql`` unrolls every step). Pseudo-randomness, not
uniformity, is the contract — the 256-value draw has ordinary modulo
bias, which skip-gram training is insensitive to.

Scale shape (100 TB reading)
----------------------------
The distributed path pins a walk-specific layout once (built with raw
tasks from the same edge-block splits as ``graphbsp``): per node
shard, a CSR of neighbors sorted by target string, each neighbor
stored as its (shard, local-index) coordinate so a walker never needs
a global lookup. Each superstep is P step tasks (walkers draw their
next hop against their shard's CSR; per-walker md5 is the only
per-row Python, the repo-wide convention for md5-keyed decisions) + P
migrate merges; emitted rows stay sharded until one finalize per
shard. Walker traffic per superstep is O(active walks), independent
of graph size. Below ``driver_edge_limit`` distinct edges the same
arithmetic runs as one driver loop over a local CSR.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["random_walks", "random_walks_reference",
           "walks_oracle_sql", "skipgram_pairs",
           "skipgram_oracle_sql", "node2vec_walks",
           "node2vec_reference", "node2vec_oracle_sql"]


def _draw(salt: str, walk_id: int, step: int, url) -> int:
    return int(hashlib.md5(
        f"{salt}:{walk_id}:{step}:{url}".encode()).hexdigest()[:2], 16)


def _local_csr(src: np.ndarray, tgt: np.ndarray):
    """Distinct (src, tgt) rows → (urls, offsets, nbr_idx): per-url
    neighbor slices sorted by target string (the oracle's
    row_number ORDER BY target convention)."""
    urls = np.unique(np.concatenate([src, tgt]))
    si = np.searchsorted(urls, src).astype(np.int64)
    ti = np.searchsorted(urls, tgt).astype(np.int64)
    combo = np.unique(si * len(urls) + ti)
    si, ti = combo // len(urls), combo % len(urls)
    # combo sort == (src, target-index) == (src, target string) order
    offsets = np.searchsorted(si, np.arange(len(urls) + 1)) \
        .astype(np.int64)
    return urls, offsets, ti


def _driver_walks(df: pd.DataFrame, seeds, length: int,
                  salt: str) -> pa.Table:
    urls, offsets, nbr = _local_csr(df["src"].to_numpy(),
                                    df["target"].to_numpy())
    wid = np.asarray([w for w, _ in seeds], dtype=np.int64)
    # seeds absent from the graph still emit their step-0 row and
    # stop immediately (they have no out-edges by definition)
    pos = np.searchsorted(urls, [u for _, u in seeds])
    pos = np.minimum(pos, max(len(urls) - 1, 0))
    in_graph = np.array([len(urls) > 0 and urls[p] == u
                         for p, (_, u) in zip(pos, seeds)])
    out_w, out_s, out_u = list(wid), [0] * len(wid), \
        [u for _, u in seeds]
    active = in_graph.copy()
    cur = pos.copy()
    for step in range(length):
        od = offsets[cur + 1] - offsets[cur]
        active &= od > 0
        if not active.any():
            break
        idx = np.flatnonzero(active)
        for i in idx:
            k = _draw(salt, int(wid[i]), step, urls[cur[i]]) % od[i]
            cur[i] = nbr[offsets[cur[i]] + k]
            out_w.append(int(wid[i]))
            out_s.append(step + 1)
            out_u.append(urls[cur[i]])
    return pa.table({
        "walk_id": pa.array(np.asarray(out_w, dtype=np.int64),
                            pa.int64()),
        "step": pa.array(np.asarray(out_s, dtype=np.int64),
                         pa.int64()),
        "url": pa.array([str(u) for u in out_u], pa.string())})


def random_walks(edges: rd.Dataset, seeds, *, length: int = 8,
                 salt: str = "walk",
                 driver_edge_limit: int = 5_000_000,
                 n_part: int | None = None) -> rd.Dataset:
    """(src, target) edge rows + [(walk_id, url), ...] seeds →
    (walk_id, step, url) truncated md5-derandomized walk rows.
    Duplicate edges fine (distinct set); seeds not in the graph emit
    only their step-0 row. ``driver_edge_limit=0`` forces the
    walker-scatter BSP path."""
    from .pagerank import _n_partitions, _thin

    seeds = sorted({(int(w), u) for w, u in seeds})
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0 or not seeds:
        return rd.from_arrow(pa.table({
            "walk_id": pa.array([w for w, _ in seeds], pa.int64()),
            "step": pa.array([0] * len(seeds), pa.int64()),
            "url": pa.array([u for _, u in seeds], pa.string())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_walks(thin.to_pandas(), seeds,
                                           length, salt))
    return _walks_bsp(thin, seeds, length, salt,
                      n_part or _n_partitions())


def _walks_bsp(e: rd.Dataset, seeds, length: int, salt: str,
               n_part: int) -> rd.Dataset:
    """Walker-scatter BSP: per node shard a CSR of neighbors sorted
    by target string, each stored as a (shard, local-idx) coordinate;
    per superstep P step tasks + a migrate regroup."""
    from .graphbsp import _build_node_urls, _shard_of, \
        _split_edge_block

    P = n_part
    eblocks = e.to_arrow_refs()
    esplits = [_split_edge_block.options(num_returns=P)
               .remote(b, P) for b in eblocks]
    if P == 1:
        esplits = [[s] for s in esplits]
    url_refs = [_build_node_urls.remote(*[sp[q] for sp in esplits])
                for q in range(P)]

    @ray.remote
    def build_csr(my_urls, all_url_refs, *pieces):
        """One src shard's CSR: neighbors sorted by target STRING,
        stored as (shard, local idx). ``my_urls`` arrives resolved
        (top-level arg); the other shards' url arrays stay refs
        inside the list and are fetched one at a time."""
        key = np.concatenate([p[0][0] for p in pieces]) if pieces \
            else np.empty(0, dtype=object)
        tgt = np.concatenate([p[0][1] for p in pieces]) if pieces \
            else np.empty(0, dtype=object)
        ki = np.searchsorted(my_urls, key).astype(np.int64)
        # global dedup + (src, target-string) order in one lexsort
        order = np.lexsort((tgt, ki))
        ki, tgt = ki[order], tgt[order]
        if len(ki):
            keep = np.empty(len(ki), dtype=bool)
            keep[0] = True
            keep[1:] = (ki[1:] != ki[:-1]) | (tgt[1:] != tgt[:-1])
            ki, tgt = ki[keep], tgt[keep]
        offsets = np.searchsorted(ki, np.arange(len(my_urls) + 1)) \
            .astype(np.int64)
        nsh = _shard_of(tgt, P) if len(tgt) else \
            np.empty(0, dtype=np.int64)
        nidx = np.zeros(len(tgt), dtype=np.int64)
        for q in range(P):
            m = nsh == q
            if m.any():
                urls_q = ray.get(all_url_refs[q])
                nidx[m] = np.searchsorted(urls_q, tgt[m])
        return my_urls, offsets, nsh.astype(np.int64), nidx

    csr = [build_csr.remote(url_refs[q], url_refs,
                            *[sp[q] for sp in esplits])
           for q in range(P)]

    @ray.remote
    def seed_shard(shard_q: int, csr_q, seed_list):
        """Walkers whose seed url hashes to this shard and EXISTS
        here; also this shard's step-0 emission rows."""
        urls = csr_q[0]
        mine = [(w, u) for w, u in seed_list
                if _shard_of(np.array([u], dtype=object), P)[0]
                == shard_q]
        wid, cur = [], []
        for w, u in mine:
            p = np.searchsorted(urls, u)
            if p < len(urls) and urls[p] == u:
                wid.append(w)
                cur.append(int(p))
        emit = pa.table({
            "walk_id": pa.array([w for w, _ in mine], pa.int64()),
            "step": pa.array([0] * len(mine), pa.int64()),
            "url": pa.array([u for _, u in mine], pa.string())})
        return (np.asarray(wid, dtype=np.int64),
                np.asarray(cur, dtype=np.int64)), emit

    @ray.remote
    def step_task(csr_q, state, step: int):
        """Advance this shard's walkers one hop; route them to their
        next shard. Returns P (wid, next_local_idx) pieces + the
        emission rows for the arrived-at nodes."""
        urls, offsets, nsh, nidx = csr_q
        wid, cur = state
        outs_w = [[] for _ in range(P)]
        outs_i = [[] for _ in range(P)]
        em_w, em_s, em_u = [], [], []
        for i in range(len(wid)):
            c = cur[i]
            lo, hi = offsets[c], offsets[c + 1]
            if hi <= lo:
                continue          # dangling: walk ends
            k = _draw(salt, int(wid[i]), step, urls[c]) % (hi - lo)
            q = int(nsh[lo + k])
            outs_w[q].append(int(wid[i]))
            outs_i[q].append(int(nidx[lo + k]))
        out = tuple((np.asarray(outs_w[q], dtype=np.int64),
                     np.asarray(outs_i[q], dtype=np.int64))
                    for q in range(P))
        return out if P > 1 else out[0]

    @ray.remote
    def migrate(csr_q, step: int, *pieces):
        """Merge arriving walkers; emit their arrival rows."""
        urls = csr_q[0]
        wid = np.concatenate([p[0] for p in pieces]) if pieces else \
            np.empty(0, dtype=np.int64)
        cur = np.concatenate([p[1] for p in pieces]) if pieces else \
            np.empty(0, dtype=np.int64)
        emit = pa.table({
            "walk_id": pa.array(wid, pa.int64()),
            "step": pa.array(np.full(len(wid), step, dtype=np.int64),
                             pa.int64()),
            "url": pa.array([str(urls[c]) for c in cur], pa.string())})
        return (wid, cur), emit

    seeded = [seed_shard.options(num_returns=2)
              .remote(q, csr[q], seeds) for q in range(P)]
    state = [s[0] for s in seeded]
    emits = [[s[1]] for s in seeded]
    for step in range(length):
        scat = [step_task.options(num_returns=P)
                .remote(csr[p], state[p], step) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        outs = [migrate.options(num_returns=2)
                .remote(csr[q], step + 1,
                        *[scat[p][q] for p in range(P)])
                for q in range(P)]
        state = [o[0] for o in outs]
        for q in range(P):
            emits[q].append(outs[q][1])

    @ray.remote
    def concat(*tables) -> pa.Table:
        keep = [t for t in tables if t.num_rows]
        if not keep:
            # a shard no walker ever visited still needs a typed
            # empty block (schema-stability, CLAUDE.md empty-block
            # hazard)
            return pa.table({"walk_id": pa.array([], pa.int64()),
                             "step": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string())})
        return pa.concat_tables(keep)

    return rd.from_arrow_refs([concat.remote(*emits[q])
                               for q in range(P)])


def _draw4(salt: str, walk_id: int, step: int, url) -> int:
    """Four-hex-digit draw (0..65535) — the 2nd-order walk's totals
    exceed 256, so the biased pick needs the wider SQL-replayable
    range."""
    return int(hashlib.md5(
        f"{salt}:{walk_id}:{step}:{url}".encode()).hexdigest()[:4], 16)


def node2vec_walks(edges: rd.Dataset, seeds, *, length: int = 8,
                   wp: int = 1, w1: int = 2, wq: int = 1,
                   salt: str = "n2v",
                   driver_edge_limit: int = 5_000_000,
                   chunk: int = 4096) -> rd.Dataset:
    """node2vec (Grover & Leskovec 2016) second-order biased walks:
    from current node ``cur`` with previous node ``prev``, candidate
    out-neighbor ``x`` (target-ascending) draws weight

        wp  if x = prev                (return,   the paper's 1/p)
        w1  if (prev, x) is an edge    (BFS-ish,  the paper's 1)
        wq  otherwise                  (DFS-ish,  the paper's 1/q)

    as INTEGERS (pass the paper's 1/p : 1 : 1/q ratios scaled by a
    common denominator), picked by a four-hex-digit md5 draw modulo
    the weight total against the cumulative-weight ladder — exactly
    replayable by the unrolled DuckDB oracle (``node2vec_oracle_sql``).
    Step 0 (no prev) uses ``random_walks``' uniform two-hex rule.
    Output (walk_id, step, url), truncated at dangling nodes.

    Scale shape: the second-order bias needs adjacency tests against
    PREV's edge set, so the wired distributed path broadcasts the
    CSR + a sorted edge-code array once (``ray.put``) and fans walker
    CHUNKS out as tasks — the standard practice while the graph fits
    the object store (DeepWalk-era systems and DGL/PyG samplers do
    the same); beyond-memory graphs take KnightKing-style rejection
    sampling on the walker-scatter loop (``_walks_bsp``'s shape), the
    documented extension. Below ``driver_edge_limit`` the same
    arithmetic runs in-process."""
    from .pagerank import _thin

    seeds = sorted({(int(w), u) for w, u in seeds})
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0 or not seeds:
        return rd.from_arrow(pa.table({
            "walk_id": pa.array([w for w, _ in seeds], pa.int64()),
            "step": pa.array([0] * len(seeds), pa.int64()),
            "url": pa.array([u for _, u in seeds], pa.string())}))

    @ray.remote
    def build(*blocks):
        t = pa.concat_tables([b for b in blocks if b.num_columns])
        src = np.asarray(t.column("src").to_pandas(), dtype=object)
        tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
        urls, offsets, nbr = _local_csr(src, tgt)
        # sorted global edge codes for the O(log m) prev→x test
        si = np.repeat(np.arange(len(urls), dtype=np.int64),
                       np.diff(offsets))
        codes = si * len(urls) + nbr
        return urls, offsets, nbr, np.sort(codes)

    def run_chunk(graph, chunk_seeds):
        urls, offsets, nbr, codes = graph
        n = len(urls)
        out_w, out_s, out_u = [], [], []
        for w, u in chunk_seeds:
            out_w.append(w)
            out_s.append(0)
            out_u.append(u)
            p = int(np.searchsorted(urls, u))
            if p >= n or urls[p] != u:
                continue
            prev = -1
            cur = p
            for k in range(length):
                lo, hi = offsets[cur], offsets[cur + 1]
                if hi <= lo:
                    break
                cand = nbr[lo:hi]
                if prev < 0:
                    j = cand[_draw(salt, w, k, urls[cur])
                             % (hi - lo)]
                else:
                    wt = np.full(len(cand), wq, dtype=np.int64)
                    pe = prev * n + cand
                    pos = np.searchsorted(codes, pe)
                    pos = np.minimum(pos, len(codes) - 1)
                    wt[codes[pos] == pe] = w1
                    wt[cand == prev] = wp
                    cs = np.cumsum(wt)
                    r = _draw4(salt, w, k, urls[cur]) % int(cs[-1])
                    j = cand[int(np.searchsorted(cs, r, side="right"))]
                prev, cur = cur, int(j)
                out_w.append(w)
                out_s.append(k + 1)
                out_u.append(str(urls[cur]))
        return pa.table({
            "walk_id": pa.array(np.asarray(out_w, dtype=np.int64),
                                pa.int64()),
            "step": pa.array(np.asarray(out_s, dtype=np.int64),
                             pa.int64()),
            "url": pa.array([str(u) for u in out_u], pa.string())})

    graph_ref = build.remote(*thin.to_arrow_refs())
    if n_thin <= driver_edge_limit and len(seeds) <= chunk:
        return rd.from_arrow(run_chunk(ray.get(graph_ref), seeds))

    @ray.remote
    def chunk_task(graph, chunk_seeds) -> pa.Table:
        return run_chunk(graph, chunk_seeds)

    refs = [chunk_task.remote(graph_ref, seeds[i:i + chunk])
            for i in range(0, len(seeds), chunk)]
    return rd.from_arrow_refs(refs)


def node2vec_reference(edge_list, seeds, *, length: int = 8,
                       wp: int = 1, w1: int = 2, wq: int = 1,
                       salt: str = "n2v") -> list[tuple]:
    """Pure-Python reference (tests): sorted (walk_id, step, url)."""
    e = sorted(set(edge_list))
    eset = set(e)
    adj: dict = {}
    for u, v in e:
        adj.setdefault(u, [])
        if v not in adj[u]:
            adj[u].append(v)
    for u in adj:
        adj[u].sort()
    rows = []
    for w, u in sorted({(int(w), u) for w, u in seeds}):
        rows.append((w, 0, u))
        prev, cur = None, u
        for k in range(length):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            if prev is None:
                nxt = nbrs[_draw(salt, w, k, cur) % len(nbrs)]
            else:
                wts = [wp if x == prev else
                       w1 if (prev, x) in eset else wq for x in nbrs]
                r = _draw4(salt, w, k, cur) % sum(wts)
                cs = 0
                for x, wt in zip(nbrs, wts):
                    cs += wt
                    if r < cs:
                        nxt = x
                        break
            prev, cur = cur, nxt
            rows.append((w, k + 1, cur))
    return sorted(rows)


_HEX4_SQL = ("((strpos('0123456789abcdef', substr(md5({x}), 1, 1)) - 1)"
             " * 4096 +"
             " (strpos('0123456789abcdef', substr(md5({x}), 2, 1)) - 1)"
             " * 256 +"
             " (strpos('0123456789abcdef', substr(md5({x}), 3, 1)) - 1)"
             " * 16 +"
             " strpos('0123456789abcdef', substr(md5({x}), 4, 1)) - 1)")


def node2vec_oracle_sql(edges_cte: str, seeds_cte: str, *,
                        length: int = 8, wp: int = 1, w1: int = 2,
                        wq: int = 1, salt: str = "n2v") -> str:
    """Unrolled DuckDB twin: per step a candidate join, CASE weights,
    a cumulative-weight window, and the md5 ladder pick. Every
    per-step CTE is AS MATERIALIZED (CLAUDE.md invariant)."""
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        adj AS (SELECT src, target,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY target) - 1 AS rk
                FROM e),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS d
               FROM e GROUP BY src),
        w0 AS MATERIALIZED (
            SELECT DISTINCT CAST(walk_id AS BIGINT) AS walk_id,
                   CAST(NULL AS VARCHAR) AS prev, url
            FROM ({seeds_cte}) s)"""]
    for k in range(length):
        h2 = _HEX2_SQL.format(
            x=f"'{salt}:' || CAST(w.walk_id AS VARCHAR) || "
              f"':{k}:' || w.url")
        h4 = _HEX4_SQL.format(
            x=f"'{salt}:' || CAST(c.walk_id AS VARCHAR) || "
              f"':{k}:' || c.cur")
        parts.append(f""",
        u{k} AS MATERIALIZED (
            -- no-prev walkers: uniform two-hex draw
            SELECT w.walk_id, w.url AS prev, a.target AS url
            FROM w{k} w
            JOIN od o ON w.url = o.src
            JOIN adj a ON a.src = w.url
                       AND a.rk = {h2} % o.d
            WHERE w.prev IS NULL),
        c{k} AS MATERIALIZED (
            SELECT w.walk_id, w.url AS cur, a.target AS x,
                   CAST(CASE WHEN a.target = w.prev THEN {wp}
                        WHEN EXISTS (SELECT 1 FROM e pe
                                     WHERE pe.src = w.prev
                                       AND pe.target = a.target)
                        THEN {w1} ELSE {wq} END AS BIGINT) AS wt
            FROM w{k} w JOIN adj a ON a.src = w.url
            WHERE w.prev IS NOT NULL),
        b{k} AS MATERIALIZED (
            SELECT c.walk_id, c.cur AS prev, c.x AS url,
                   SUM(c.wt) OVER (PARTITION BY c.walk_id
                                   ORDER BY c.x
                                   ROWS UNBOUNDED PRECEDING) AS cs,
                   SUM(c.wt) OVER (PARTITION BY c.walk_id) AS tot,
                   c.wt, {h4} AS h
            FROM c{k} c),
        w{k + 1} AS MATERIALIZED (
            SELECT walk_id, prev, url FROM u{k}
            UNION ALL
            SELECT walk_id, prev, url FROM b{k}
            WHERE h % tot >= cs - wt AND h % tot < cs)""")
    levels = "\n        UNION ALL ".join(
        f"SELECT walk_id, CAST({k} AS BIGINT) AS step, url FROM w{k}"
        for k in range(length + 1))
    parts.append(f"""
        {levels}""")
    return "".join(parts)


def skipgram_pairs(walks: rd.Dataset, *, window: int = 2,
                   num_partitions: int | None = None) -> rd.Dataset:
    """(walk_id, step, url) walk rows → (center, context,
    n_pairs:int64) skip-gram co-occurrence counts with the given
    ``window`` (|Δstep| ≤ window, Δstep ≠ 0) — the step that turns the
    walk corpus into word2vec-style training pairs (DeepWalk §4.2
    feeds exactly these to hierarchical-softmax skip-gram).

    ONE hash exchange keyed on walk_id (a walk's rows must meet —
    walks are short, so groups are tiny and skew-free), vectorized
    per-partition searchsorted window expansion, then a combiner →
    hash-partitioned count per (center, context) pair."""
    from ..stages.hashagg import hash_aggregate
    from .pagerank import _n_partitions

    n_part = num_partitions or _n_partitions()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["walk_id"], index=False)
        return df.assign(__part=(h % n_part).astype("int64")
                         .to_numpy())

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["walk_id", "step"], kind="mergesort")
        wid = g["walk_id"].to_numpy()
        step = g["step"].to_numpy()
        url = g["url"].to_numpy(dtype=object)
        n = len(g)
        if not n:
            return pd.DataFrame({
                "center": pd.Series([], dtype="object"),
                "context": pd.Series([], dtype="object"),
                "n_pairs": pd.Series([], dtype="int64")})
        # rows are (walk, step)-sorted; encode to one monotone key so
        # each row's window is a contiguous slice found by searchsorted
        key = wid * (step.max() + window + 2) + step
        lo = np.searchsorted(key, key - window)
        hi = np.searchsorted(key, key + window, side="right")
        reps = hi - lo - 1                    # exclude self
        centers = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        offs = np.arange(int(reps.sum())) - np.repeat(cum[:-1], reps)
        ctx = np.repeat(lo, reps) + offs
        ctx += (ctx >= centers)               # skip the center itself
        return pd.DataFrame({
            "center": url[centers],
            "context": url[ctx],
            "n_pairs": np.ones(len(centers), dtype=np.int64)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["center", "context"], as_index=False) \
            .agg(n_pairs=("n_pairs", "sum"))

    pairs = walks.map_batches(tag, batch_format="pandas") \
        .groupby("__part").map_groups(
            lambda g: expand(g.drop(columns="__part")),
            batch_format="pandas")
    out = hash_aggregate(pairs, ["center", "context"], combine,
                         num_partitions=n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "center" not in df.columns:
            return pd.DataFrame({
                "center": pd.Series([], dtype="object"),
                "context": pd.Series([], dtype="object"),
                "n_pairs": pd.Series([], dtype="int64")})
        df["n_pairs"] = df["n_pairs"].astype("int64")
        return df

    return out.map_batches(finish, batch_format="pandas")


def skipgram_oracle_sql(walks_cte: str, *, window: int = 2) -> str:
    """DuckDB twin of ``skipgram_pairs`` (``walks_cte`` yields
    (walk_id, step, url))."""
    return f"""
        WITH w AS ({walks_cte})
        SELECT a.url AS center, b.url AS context,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM w a JOIN w b ON a.walk_id = b.walk_id
            AND abs(a.step - b.step) <= {window}
            AND a.step <> b.step
        GROUP BY 1, 2"""


def random_walks_reference(edge_list, seeds, *, length: int = 8,
                           salt: str = "walk") -> list[tuple]:
    """Pure-Python reference (tests): sorted (walk_id, step, url)."""
    e = sorted(set(edge_list))
    adj: dict = {}
    for u, v in e:
        adj.setdefault(u, [])
        if v not in adj[u]:
            adj[u].append(v)
    for u in adj:
        adj[u].sort()
    rows = []
    for w, u in sorted({(int(w), u) for w, u in seeds}):
        rows.append((w, 0, u))
        cur = u
        for k in range(length):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            cur = nbrs[_draw(salt, w, k, cur) % len(nbrs)]
            rows.append((w, k + 1, cur))
    return sorted(rows)


_HEX2_SQL = ("((strpos('0123456789abcdef', substr(md5({x}), 1, 1)) - 1)"
             " * 16 + strpos('0123456789abcdef', substr(md5({x}), 2, 1))"
             " - 1)")


def walks_oracle_sql(edges_cte: str, seeds_cte: str, *,
                     length: int = 8, salt: str = "walk") -> str:
    """Unrolled ``length``-step DuckDB twin. ``seeds_cte`` yields
    (walk_id, url); every per-step CTE is AS MATERIALIZED (CLAUDE.md
    invariant)."""
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        adj AS (SELECT src, target,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY target) - 1 AS rk
                FROM e),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS d
               FROM e GROUP BY src),
        w0 AS MATERIALIZED (SELECT DISTINCT CAST(walk_id AS BIGINT)
                   AS walk_id, url FROM ({seeds_cte}) s)"""]
    for k in range(length):
        h = _HEX2_SQL.format(
            x=f"'{salt}:' || CAST(w.walk_id AS VARCHAR) || "
              f"':{k}:' || w.url")
        parts.append(f""",
        w{k + 1} AS MATERIALIZED (
            SELECT w.walk_id, a.target AS url
            FROM w{k} w
            JOIN od o ON w.url = o.src
            JOIN adj a ON a.src = w.url
                       AND a.rk = {h} % o.d)""")
    levels = "\n        UNION ALL ".join(
        f"SELECT walk_id, CAST({k} AS BIGINT) AS step, url FROM w{k}"
        for k in range(length + 1))
    parts.append(f"""
        {levels}""")
    return "".join(parts)
