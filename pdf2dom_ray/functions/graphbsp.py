"""BSP (bulk-synchronous-parallel) iteration machinery for the
distributed graph operators (pagerank / HITS beyond the driver-path
size).

The Dataset-join formulation pays 2 joins + 2 groupbys of fixed
operator overhead PER ITERATION (~1 s each at bench scale) because the
alternating join key (src, then target) defeats partition reuse — a
Dataset has no persistent partitioned-state abstraction. This module
is the raw-task escape hatch (same pattern as ``kmeans.py``): shard
the node state ONCE by url-hash, resolve edges to integer
(shard, index) coordinates ONCE, pin everything in the object store,
then run each iteration as P scatter + P gather tasks exchanging P²
small contribution objects. No Dataset operators inside the loop; the
only driver traffic is P scalars per synchronization.

Scale shape: node shard q holds O(n/P) urls + state; edge shard p
holds O(m/P) integer-coded edges grouped by destination shard; a
scatter task touches one edge shard + its own node shard; a gather
task touches P contribution pieces totalling O(m/P) + its node shard.
Peak task memory is therefore O((n+m)/P); P derives from cluster CPUs
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


def _empty_pieces(n_part: int, second_dtype=np.int64):
    """Typed empty pieces for a schema-less empty input block — Ray's
    sort-aggregate / join stages can emit blocks with NO columns (the
    empty-block hazard CLAUDE.md documents); ``block.column(...)`` on
    one raises KeyError, and WHICH run gets such a block is
    load/run-order dependent, so an unguarded split task flakes."""
    return tuple((np.empty(0, dtype=object), np.empty(0, dtype=second_dtype))
                 for _ in range(n_part))


@ray.remote
def _split_nodes(block: pa.Table, n_part: int):
    """One state block → P (urls, outdeg) pieces by url-hash shard."""
    if block.num_columns == 0 or block.num_rows == 0:
        return _empty_pieces(n_part)
    urls = np.asarray(block.column("url").to_pandas(), dtype=object)
    outdeg = np.asarray(block.column("outdeg").to_pandas(),
                        dtype=np.int64)
    sh = _shard_of(urls, n_part)
    order = np.argsort(sh, kind="stable")
    urls, outdeg, sh = urls[order], outdeg[order], sh[order]
    bounds = np.searchsorted(sh, np.arange(n_part + 1))
    return tuple((urls[bounds[q]:bounds[q + 1]],
                  outdeg[bounds[q]:bounds[q + 1]])
                 for q in range(n_part))


@ray.remote
def _build_node_shard(*pieces):
    """Merge a shard's pieces → (urls sorted, outdeg, n_dangling)."""
    urls = np.concatenate([p[0] for p in pieces])
    outdeg = np.concatenate([p[1] for p in pieces])
    order = np.argsort(urls, kind="stable")
    urls, outdeg = urls[order], outdeg[order]
    return urls, outdeg


@ray.remote
def _split_edges(block: pa.Table, n_part: int, by: str):
    """One distinct-edge block → P (key_url, other_url) pieces by the
    hash shard of the ``by`` endpoint ('src' or 'target')."""
    if block.num_columns == 0 or block.num_rows == 0:
        return _empty_pieces(n_part, second_dtype=object)
    src = np.asarray(block.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(block.column("target").to_pandas(), dtype=object)
    key, other = (src, tgt) if by == "src" else (tgt, src)
    sh = _shard_of(key, n_part)
    order = np.argsort(sh, kind="stable")
    key, other, sh = key[order], other[order], sh[order]
    bounds = np.searchsorted(sh, np.arange(n_part + 1))
    return tuple((key[bounds[q]:bounds[q + 1]],
                  other[bounds[q]:bounds[q + 1]])
                 for q in range(n_part))


@ray.remote
def _build_edge_shard(n_part: int, url_shard_refs, *pieces):
    """Merge edge pieces of one key-shard → integer coordinates:

    (key_idx, other_idx, offsets) with rows SORTED by the other
    endpoint's shard; ``offsets[q]:offsets[q+1]`` slices shard q's
    rows. Url arrays of other shards are fetched ONE AT A TIME
    (peak memory = this shard's edges + one url array)."""
    key = np.concatenate([p[0] for p in pieces]) if pieces else \
        np.empty(0, dtype=object)
    other = np.concatenate([p[1] for p in pieces]) if pieces else \
        np.empty(0, dtype=object)
    my_urls = ray.get(url_shard_refs[0])
    key_idx_all = np.searchsorted(my_urls, key).astype(np.int64)
    osh = _shard_of(other, n_part)
    order = np.argsort(osh, kind="stable")
    key_idx_all, other, osh = key_idx_all[order], other[order], osh[order]
    offsets = np.searchsorted(osh, np.arange(n_part + 1)).astype(np.int64)
    other_idx = np.empty(len(other), dtype=np.int64)
    for q in range(n_part):
        lo, hi = offsets[q], offsets[q + 1]
        if hi > lo:
            urls_q = ray.get(url_shard_refs[1][q])
            other_idx[lo:hi] = np.searchsorted(urls_q, other[lo:hi])
    return key_idx_all, other_idx, offsets


@ray.remote
def _urls_only(shard):
    return shard[0]


class ShardedGraph:
    """Pinned sharded layout of a distinct (src, target) edge set.

    ``node_shards[q]`` → ref of (urls sorted, outdeg);
    ``edges_by_src[p]`` → ref of (src_idx, tgt_idx, tgt_shard_offsets)
    sorted by target shard; ``edges_by_tgt`` the mirror layout (built
    only when requested — HITS needs both, PageRank one).
    """

    def __init__(self, n_part: int, node_shards, edges_by_src,
                 edges_by_tgt=None):
        self.n_part = n_part
        self.node_shards = node_shards
        self.edges_by_src = edges_by_src
        self.edges_by_tgt = edges_by_tgt

    @classmethod
    def build(cls, e: rd.Dataset, state: rd.Dataset, n_part: int, *,
              both_directions: bool = False) -> "ShardedGraph":
        """``e``: distinct (src, target) Dataset. ``state``: (url,
        outdeg) Dataset covering every node. One pass of raw tasks:
        B split tasks + P build tasks per structure."""
        sblocks = state.to_arrow_refs()
        nsplits = [_split_nodes.options(num_returns=n_part)
                   .remote(b, n_part) for b in sblocks]
        if n_part == 1:      # options(num_returns=1) returns a bare ref
            nsplits = [[s] for s in nsplits]
        node_shards = [
            _build_node_shard.remote(*[sp[q] for sp in nsplits])
            for q in range(n_part)]
        url_refs = [_urls_only.remote(s) for s in node_shards]

        eblocks = e.to_arrow_refs()

        def _layout(by: str):
            esplits = [_split_edges.options(num_returns=n_part)
                       .remote(b, n_part, by) for b in eblocks]
            if n_part == 1:
                esplits = [[s] for s in esplits]
            return [
                _build_edge_shard.remote(
                    n_part, (url_refs[p], url_refs),
                    *[sp[p] for sp in esplits])
                for p in range(n_part)]

        return cls(n_part, node_shards, _layout("src"),
                   _layout("target") if both_directions else None)
