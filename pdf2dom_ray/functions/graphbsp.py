"""BSP (bulk-synchronous-parallel) iteration machinery for the
distributed graph operators (pagerank / HITS beyond the driver-path
size).

The Dataset-join formulation pays 2 joins + 2 groupbys of fixed
operator overhead PER ITERATION (~1 s each at bench scale) because the
alternating join key (src, then target) defeats partition reuse — a
Dataset has no persistent partitioned-state abstraction. This module
is the raw-task escape hatch (same pattern as ``kmeans.py``): shard
everything ONCE by url-hash, resolve edges to integer (shard, index)
coordinates ONCE, pin it all in the object store, then run each
iteration as P scatter + P gather tasks exchanging P² small
contribution objects. No Dataset operators inside the loop; the only
driver traffic is P scalars per synchronization.

The ENTIRE layout derives from the batch-local-distinct edge set with
raw tasks — node universe, global edge dedup, and out-degrees all fall
out of the shard builds, so the former per-query init exchanges
(global distinct, outdeg groupby, node-set union + join) are gone:

- all copies of edge (s, t) hash to the same src-shard (and the same
  tgt-shard), so GLOBAL dedup is per-shard-local ``np.unique`` over
  integer-coded pairs;
- a shard's url universe is the unique endpoints hashing to it,
  collected during the same split pass;
- out-degree is a ``bincount`` over the deduped by-src edges of the
  matching shard (src-shard == node-shard by construction).

Scale shape: node shard q holds O(n/P) urls + state; edge shard p
holds O(m/P) integer-coded edges grouped by destination shard; a
scatter task touches one edge shard + its own state; a gather task
touches P contribution pieces totalling O(m/P) + its node shard. Peak
task memory is therefore O((n+m)/P); P derives from cluster CPUs
(``scale.scale_partitions``). Object-store spill handles the pinned
shards if they outgrow memory.

Determinism: shard assignment uses ``pd.util.hash_pandas_object``
(fixed-key siphash — identical across processes and runs); all
arithmetic on int64 with order-independent ``np.add.at`` scatter-adds,
so results are bit-exact under any P (locked against the driver path
by tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["ShardedGraph"]


def _shard_of(urls: np.ndarray, n_part: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(pd.Series(urls), index=False)
    return (h.to_numpy() % n_part).astype(np.int64)


def _empty_piece(weighted: bool = False):
    e = np.empty(0, dtype=object)
    if weighted:
        w = np.empty(0, dtype=np.int64)
        return (e, e, w), (e, e, w), e
    return (e, e), (e, e), e


def _split_by(key: np.ndarray, other: np.ndarray, n_part: int,
              w: np.ndarray | None = None):
    """(key, other[, w]) edge rows → per-shard slices by the key
    endpoint's hash shard."""
    sh = _shard_of(key, n_part)
    order = np.argsort(sh, kind="stable")
    key, other, sh = key[order], other[order], sh[order]
    bounds = np.searchsorted(sh, np.arange(n_part + 1))
    if w is None:
        return [(key[bounds[q]:bounds[q + 1]],
                 other[bounds[q]:bounds[q + 1]])
                for q in range(n_part)]
    w = w[order]
    return [(key[bounds[q]:bounds[q + 1]],
             other[bounds[q]:bounds[q + 1]],
             w[bounds[q]:bounds[q + 1]])
            for q in range(n_part)]


@ray.remote
def _split_edge_block(block: pa.Table, n_part: int,
                      weighted: bool = False):
    """One batch-distinct edge block → P pieces, each
    ((src_edges), (tgt_edges), urls): the block's edges keyed by src
    shard and by tgt shard, plus the batch-unique endpoint names
    hashing to the shard (the node universe contribution). With
    ``weighted`` each edge slice carries its int64 ``w`` column too.

    Guards the schema-less empty block Ray's sort-aggregate / join
    stages can emit (the hazard CLAUDE.md documents): ``.column()`` on
    one raises KeyError, and WHICH run sees such a block is
    load/run-order dependent — an unguarded split task flakes."""
    if block.num_columns == 0 or block.num_rows == 0:
        return tuple(_empty_piece(weighted) for _ in range(n_part)) \
            if n_part > 1 else _empty_piece(weighted)
    src = np.asarray(block.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(block.column("target").to_pandas(), dtype=object)
    w = np.asarray(block.column("w").to_pandas(),
                   dtype=np.int64) if weighted else None
    by_src = _split_by(src, tgt, n_part, w)
    by_tgt = _split_by(tgt, src, n_part, w)
    urls = np.unique(np.concatenate([src, tgt]))
    ush = _shard_of(urls, n_part)
    uorder = np.argsort(ush, kind="stable")
    urls, ush = urls[uorder], ush[uorder]
    ub = np.searchsorted(ush, np.arange(n_part + 1))
    out = tuple((by_src[q], by_tgt[q], urls[ub[q]:ub[q + 1]])
                for q in range(n_part))
    # num_returns=P unpacks the tuple for P>1; for P==1 Ray hands back
    # a bare ref to the WHOLE return value, so return the single piece
    # itself (a 1-tuple ref breaks every downstream unpack)
    return out if n_part > 1 else out[0]


@ray.remote
def _build_node_urls(*pieces):
    """One shard's sorted unique url universe."""
    if not pieces:
        return np.empty(0, dtype=object)
    return np.unique(np.concatenate([p[2] for p in pieces]))


@ray.remote(num_returns=2)
def _build_edge_shard(n_part: int, orient: int, url_shard_refs,
                      weighted: bool, *pieces):
    """Merge one key-shard's edge pieces (``orient`` 0 = by src,
    1 = by tgt) → ((key_idx, other_idx, offsets[, w]), outdeg):

    integer-coded DEDUPED edges sorted by the other endpoint's shard
    (``offsets[q]:offsets[q+1]`` slices shard q's rows) plus this
    shard's key-side degree vector. Url arrays of other shards are
    fetched ONE AT A TIME (peak memory = this shard's edges + one url
    array). Dedup is exact and global: every copy of an edge lands in
    this shard and, within it, in the same other-shard segment, where
    ``np.unique`` over key_idx·|urls_q|+other_idx kills duplicates.
    With ``weighted`` the duplicate copies' weights are SUMMED instead
    (order-independent int64 ``np.add.at``), the edge shard carries
    the per-edge weight array, and ``outdeg`` becomes the key-side
    weighted OUT-STRENGTH W(u) = Σ w."""
    key = np.concatenate([p[orient][0] for p in pieces]) if pieces \
        else np.empty(0, dtype=object)
    other = np.concatenate([p[orient][1] for p in pieces]) if pieces \
        else np.empty(0, dtype=object)
    wall = None
    if weighted:
        wall = np.concatenate([p[orient][2] for p in pieces]) \
            .astype(np.int64) if pieces else np.empty(0, dtype=np.int64)
    my_urls = ray.get(url_shard_refs[0])
    key_idx_all = np.searchsorted(my_urls, key).astype(np.int64)
    osh = _shard_of(other, n_part)
    order = np.argsort(osh, kind="stable")
    key_idx_all, other, osh = key_idx_all[order], other[order], osh[order]
    if weighted:
        wall = wall[order]
    seg = np.searchsorted(osh, np.arange(n_part + 1)).astype(np.int64)
    kparts, oparts, wparts, lens = [], [], [], []
    for q in range(n_part):
        lo, hi = seg[q], seg[q + 1]
        if hi <= lo:
            lens.append(0)
            continue
        urls_q = ray.get(url_shard_refs[1][q])
        oi = np.searchsorted(urls_q, other[lo:hi]).astype(np.int64)
        codes = key_idx_all[lo:hi] * max(len(urls_q), 1) + oi
        if weighted:
            combo, inv = np.unique(codes, return_inverse=True)
            ws = np.zeros(len(combo), dtype=np.int64)
            np.add.at(ws, inv, wall[lo:hi])
            wparts.append(ws)
        else:
            combo = np.unique(codes)
        kparts.append(combo // max(len(urls_q), 1))
        oparts.append(combo % max(len(urls_q), 1))
        lens.append(len(combo))
    key_idx = np.concatenate(kparts) if kparts else \
        np.empty(0, dtype=np.int64)
    other_idx = np.concatenate(oparts) if oparts else \
        np.empty(0, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    if weighted:
        w = np.concatenate(wparts) if wparts else \
            np.empty(0, dtype=np.int64)
        wdeg = np.zeros(len(my_urls), dtype=np.int64)
        np.add.at(wdeg, key_idx, w)
        return (key_idx, other_idx, offsets, w), wdeg
    outdeg = np.bincount(key_idx, minlength=len(my_urls)) \
        .astype(np.int64)
    return (key_idx, other_idx, offsets), outdeg


@ray.remote
def _with_outdeg(urls, outdeg):
    return urls, outdeg


class ShardedGraph:
    """Pinned sharded layout of an edge set (duplicates allowed —
    dedup happens in the shard builds).

    ``node_shards[q]`` → ref of (urls sorted, outdeg);
    ``edges_by_src[p]`` → ref of (src_idx, tgt_idx, tgt_shard_offsets)
    sorted by target shard; ``edges_by_tgt`` the mirror layout (built
    only when requested — HITS/SALSA need both, PageRank one).
    ``indegs[q]`` → ref of the shard's in-degree vector (aligned with
    its urls) — a free by-product of the tgt layout's key-side degree
    count, so it exists exactly when ``edges_by_tgt`` does.
    """

    def __init__(self, n_part: int, node_shards, edges_by_src,
                 edges_by_tgt=None, indegs=None):
        self.n_part = n_part
        self.node_shards = node_shards
        self.edges_by_src = edges_by_src
        self.edges_by_tgt = edges_by_tgt
        self.indegs = indegs

    @classmethod
    def build(cls, e: rd.Dataset, n_part: int, *,
              both_directions: bool = False,
              weighted: bool = False) -> "ShardedGraph":
        """``e``: (src, target[, w]) Dataset — batch-local distinct
        (or batch-local weight pre-sum when ``weighted``) is enough;
        global dedup / weight summing is shard-local. One raw-task
        pass: B split tasks + P node builds + P edge builds per
        layout; no Dataset operators at all. With ``weighted`` the
        edge shards gain a 4th element (per-edge int64 weights) and
        ``node_shards``' degree vector is the weighted out-strength."""
        eblocks = e.to_arrow_refs()
        esplits = [_split_edge_block.options(num_returns=n_part)
                   .remote(b, n_part, weighted) for b in eblocks]
        if n_part == 1:      # options(num_returns=1) returns a bare ref
            esplits = [[s] for s in esplits]
        url_refs = [_build_node_urls.remote(*[sp[q] for sp in esplits])
                    for q in range(n_part)]

        def _layout(orient: int):
            shards, outdegs = [], []
            for p in range(n_part):
                es, od = _build_edge_shard.options(num_returns=2).remote(
                    n_part, orient, (url_refs[p], url_refs), weighted,
                    *[sp[p] for sp in esplits])
                shards.append(es)
                outdegs.append(od)
            return shards, outdegs

        by_src, outdegs = _layout(0)
        node_shards = [_with_outdeg.remote(url_refs[q], outdegs[q])
                       for q in range(n_part)]
        by_tgt, indegs = _layout(1) if both_directions else (None, None)
        return cls(n_part, node_shards, by_src, by_tgt, indegs)
