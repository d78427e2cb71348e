"""HNSW approximate nearest neighbor — the graph-based member of the
ANN family (brute / LSH / IVF / PQ live in ann.py).

Distribution model is the production "sharded HNSW" layout: each
data shard (Ray block) builds an INDEPENDENT small-world index and a
query fans out to every shard, merging per-shard top-k — exactly how
HNSW deployments scale past one node (per-shard graphs, no
cross-shard edges). On a cluster each block's build+search runs where
the block lives; the driver only merges ≤ k rows per block through
the bounded fold (`ann._take_ordered`).

Determinism (the repo's baseline requirement): HNSW is normally
randomized twice — geometric level draws and insertion order. Here
both are pinned: insertion follows ascending vec_id, and a node's
level is the trailing-zero count of a Knuth-hash of its id (the same
geometric(1/2) distribution, but a pure function of the id), so the
graph — and therefore every search — is identical across runs and
partitionings of equal blocks. Neighbor selection and search
tie-break on (distance, id).

No SQL twin exists for a navigable-small-world search (the driver
records the weaker rows-only check); correctness is locked by tests:
exact-equality on a hand graph, same-result determinism, and
recall@k ≥ 0.9 against ann.brute_topk on the driver embeddings.

Search quality/cost knobs are the standard M (graph degree) and
ef (candidate beam); build cost is O(n·ef·M) distance evaluations
per shard, vectorized numpy per candidate expansion.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .ann import _TOPK_EMPTY, _emb_matrix, _take_ordered

__all__ = ["HnswIndex", "hnsw_topk", "hnsw_knn_join"]


def _level_of(vid: int, max_level: int = 8) -> int:
    """Deterministic geometric(1/2) level: trailing zeros of the
    Knuth multiplicative hash of the id."""
    h = (int(vid) * 2654435761) & 0xFFFFFFFF
    lvl = 0
    while lvl < max_level and not (h >> lvl) & 1:
        lvl += 1
    return lvl


class HnswIndex:
    """Hierarchical navigable small world over unit-normalized rows
    (cosine via dot product). Pure numpy + heapq; one instance per
    data shard."""

    def __init__(self, ids: np.ndarray, x: np.ndarray, *,
                 m: int = 8, ef_construction: int = 48):
        self.ids = np.asarray(ids, dtype=np.int64)
        norm = np.linalg.norm(x, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        self.x = np.ascontiguousarray(x / norm)
        self.m = m
        self.efc = ef_construction
        n = len(self.ids)
        self.levels = np.array([_level_of(v) for v in self.ids],
                               dtype=np.int64)
        # neighbors[layer][node] -> list of node indices
        self.nbrs: list[list[list[int]]] = []
        self.entry = -1
        order = np.argsort(self.ids)       # pinned insertion order
        for row in order:
            self._insert(int(row))

    # -- internals ---------------------------------------------------
    def _dist(self, q: np.ndarray, rows) -> np.ndarray:
        return 1.0 - self.x[rows] @ q       # vectorized per expansion

    def _search_layer(self, q: np.ndarray, eps: list[int],
                      ef: int, layer: int) -> list[tuple[float, int]]:
        """Beam search in one layer → ef closest (dist, row) pairs,
        ties broken by id for determinism."""
        adj = self.nbrs[layer]
        d0 = self._dist(q, eps)
        visited = set(eps)
        # candidates: min-heap by (dist, id); results: max-heap
        cand = [(float(d), int(self.ids[e]), e)
                for d, e in zip(d0, eps)]
        heapq.heapify(cand)
        res = [(-float(d), -int(self.ids[e]), e)
               for d, e in zip(d0, eps)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            d, _, e = heapq.heappop(cand)
            worst = -res[0][0] if res else np.inf
            if d > worst and len(res) >= ef:
                break
            new = [u for u in adj[e] if u not in visited]
            if not new:
                continue
            visited.update(new)
            dn = self._dist(q, new)
            for du, u in zip(dn, new):
                du = float(du)
                worst = -res[0][0] if res else np.inf
                if len(res) < ef or du < worst or \
                        (du == worst and int(self.ids[u])
                         < -res[0][1]):
                    heapq.heappush(cand, (du, int(self.ids[u]), u))
                    heapq.heappush(res, (-du, -int(self.ids[u]), u))
                    if len(res) > ef:
                        heapq.heappop(res)
        out = [(-nd, -nid, e) for nd, nid, e in res]
        out.sort(key=lambda t: (t[0], t[1]))
        return [(d, e) for d, _, e in out]

    def _insert(self, row: int) -> None:
        lvl = int(self.levels[row])
        while len(self.nbrs) <= lvl:
            self.nbrs.append([[] for _ in range(len(self.ids))])
        if self.entry < 0:
            self.entry = row
            return
        q = self.x[row]
        ep = [self.entry]
        top = int(self.levels[self.entry])
        for layer in range(top, lvl, -1):
            if layer < len(self.nbrs):
                ep = [self._search_layer(q, ep, 1, layer)[0][1]]
        for layer in range(min(lvl, top), -1, -1):
            found = self._search_layer(q, ep, self.efc, layer)
            m_max = self.m if layer > 0 else 2 * self.m
            sel = [e for _, e in found[:self.m]]
            adj = self.nbrs[layer]
            adj[row] = list(sel)
            for e in sel:
                if row not in adj[e]:
                    adj[e].append(row)
                    if len(adj[e]) > m_max:
                        # prune farthest (tie: larger id) — keeps
                        # degree bounded and deterministic
                        de = self._dist(self.x[e], adj[e])
                        keep = sorted(
                            zip(de, (int(self.ids[u])
                                     for u in adj[e]), adj[e]),
                            key=lambda t: (t[0], t[1]))[:m_max]
                        adj[e] = [u for _, _, u in keep]
            ep = [e for _, e in found]
        if lvl > top:
            self.entry = row

    # -- queries -----------------------------------------------------
    def search(self, q: np.ndarray, k: int,
               ef: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """(ids, cosine sims) of the ≤k approximate neighbors."""
        if self.entry < 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64))
        qn = np.asarray(q, dtype=np.float64)
        nv = np.linalg.norm(qn)
        if nv:
            qn = qn / nv
        ep = [self.entry]
        for layer in range(int(self.levels[self.entry]), 0, -1):
            ep = [self._search_layer(qn, ep, 1, layer)[0][1]]
        found = self._search_layer(qn, ep, max(ef, k), 0)[:k]
        rows = np.array([e for _, e in found], dtype=np.int64)
        sims = 1.0 - np.array([d for d, _ in found])
        return self.ids[rows], sims


def hnsw_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10, *,
              m: int = 8, ef: int = 64,
              shard_rows: int = 512) -> rd.Dataset:
    """Sharded-HNSW global top-k: each shard builds its own
    small-world graph and answers locally; the driver merges ≤ k
    rows per shard (bounded fold). ``shard_rows`` caps the per-task
    build (the O(n·ef·m) Python loop) so shards construct in
    parallel — smaller shards trade a few more merge rows for
    near-linear build speedup AND higher recall (per-shard search is
    more exhaustive relative to shard size)."""
    query_ref = ray.put(np.asarray(query, dtype=np.float64))

    def local(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _TOPK_EMPTY
        idx = HnswIndex(t.column("vec_id").to_numpy(),
                        _emb_matrix(t), m=m)
        ids, sims = idx.search(ray.get(query_ref), k, ef)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "sim": pa.array(sims, pa.float64())})

    scored = ds.map_batches(local, batch_format="pyarrow",
                            batch_size=shard_rows)
    return _take_ordered(
        scored, [("sim", "descending"), ("vec_id", "ascending")], k,
        _TOPK_EMPTY)


def hnsw_knn_join(ds: rd.Dataset, queries: np.ndarray, qids,
                  k: int = 5, *, m: int = 8,
                  ef: int = 64) -> rd.Dataset:
    """Batched variant: ONE index build per shard answers every
    query (the case sharded HNSW exists for); per-(qid) merge on the
    driver over ≤ k·blocks narrow rows."""
    import pandas as pd

    from .fold import bounded_fold_tables

    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(qids, dtype=np.int64)
    q_ref = ray.put((q, qids))

    def local(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        idx = HnswIndex(t.column("vec_id").to_numpy(),
                        _emb_matrix(t), m=m)
        qm, qi = ray.get(q_ref)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qi)):
            ids, sims = idx.search(qm[j], k, ef)
            out_q.extend([int(qi[j])] * len(ids))
            out_v.extend(ids.tolist())
            out_s.extend(sims.tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    tables = [t for t in bounded_fold_tables(
        ds.map_batches(local, batch_format="pyarrow",
                       batch_size=8192)) if t.num_rows]
    if not tables:
        return rd.from_arrow(pa.table({
            "qid": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64())}))
    merged = pa.concat_tables(tables).to_pandas()
    merged = merged.sort_values(
        ["qid", "sim", "vec_id"],
        ascending=[True, False, True]) \
        .groupby("qid", as_index=False).head(k)
    return rd.from_arrow(pa.Table.from_pandas(
        merged.reset_index(drop=True), preserve_index=False))
