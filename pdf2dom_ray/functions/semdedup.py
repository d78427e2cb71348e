"""SemDeDup: semantic deduplication via cluster-local cosine pruning.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) is the standard
"semantic" complement to MinHash dedup: embed every document, k-means
the embeddings, and inside each cluster drop all but one member of
every near-duplicate group — pairs are only ever compared within a
cluster, so the quadratic all-pairs scan shrinks to Σ|c|² with k
chosen so clusters stay bounded.

Scale knobs (both per the paper's own prescription):

- **k scales with corpus size**: ``k = clamp(isqrt(N), 4, 64)``
  (``semdedup_k``) when the caller doesn't pin one, so expected
  cluster size is ~√N, and Σ|c|² ≈ N^1.5, not N². The SQL oracle
  unrolls k as chained CTEs, so it derives the SAME k from the
  embedding count of the sf dir it targets (``GRAFT_ORACLE_SF``,
  default the driver's sf0.01) — both sides compute f(N), neither is
  pinned.
- **Giant-cluster band-split**: any cluster larger than
  ``band_limit`` is split into ``t = ceil(|c|/band_limit)`` bands
  (deterministic ``vec_id % t``) and its pair scan runs as t(t+1)/2
  independent band-pair tasks, each holding at most two ~band_limit
  row slabs and one ~band_limit² gram — no single task ever owns an
  O(|c|²) matrix, and a pathological hot cluster parallelizes
  instead of OOM-ing one worker. Dup marks are OR-reduced with a
  ``groupby(vec_id).max`` — no join. (Banding assumes vec_ids are
  roughly uniform mod t — true for dense ids; a production variant
  would band by per-cluster rank.)

Determinism (the driver value-hashes results): clustering reuses the
repo's bit-exact fixed-point k-means (`kmeans.kmeans_fit` — int64
quantized vectors, integer Lloyd updates), and the cosine threshold
test is exact integer arithmetic, never a float cosine:

    cos(a, b) ≥ τ   ⇔   dot > 0  AND  dot²·τ_den ≥ τ_num·|a|²·|b|²

with τ² = τ_num/τ_den rational (default 4/25, i.e. τ = 0.4 — in the
synthetic corpus's near-dup band; a production run would use ≈0.95).
dot fits int64 (64 dims × (2²¹)² < 2⁴⁸) but dot² needs 128 bits, so
the comparison runs in Python/object ints on the cluster-local pair
matrix (DuckDB side: HUGEINT casts).

Keep rule (deterministic, SQL-expressible): a vector is kept iff no
SAME-CLUSTER vector with a smaller vec_id is τ-similar to it — the
same "earliest representative survives" convention as the repo's
other dedup ops, stated as a NOT EXISTS so the oracle is one
anti-join rather than a greedy chain.

Scale shape: k-means is the narrow combiner pattern (see kmeans.py);
assignment is one broadcast-centroid map_batches pass; the prune is
``groupby(cluster).map_groups`` for within-limit clusters — one task
per cluster, peak memory one cluster's |c|×D block plus its |c|²
gram — and the band-pair fan-out above for oversize ones.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd
import pyarrow as pa
import pyarrow.parquet as pq
from ray.data.aggregate import Max

from .kmeans import kmeans_fit, kmeans_with_clause

__all__ = ["semdedup_keep", "semdedup_oracle_sql", "semdedup_k",
           "BAND_LIMIT"]

TAU2_NUM = 4            # τ = 0.4 → τ² = 4/25 (the synthetic
TAU2_DEN = 25           # corpus's near-dup band tops out near 0.48)

# Max rows a single prune task may hold in one gram dimension: a
# 2048² int64 gram (+ its object-int threshold copy) stays well under
# a worker's heap; clusters above this band-split.
BAND_LIMIT = 2048

ORACLE_SF_ENV = "GRAFT_ORACLE_SF"
DRIVER_SF = "/root/testdata/sf0.01"


def semdedup_k(n: int) -> int:
    """Paper-style corpus-scaled k: ~√N clusters (expected cluster
    size √N, pair work Σ|c|² ≈ N^1.5), clamped to [4, 64] so tiny
    fixtures still cluster and the unrolled SQL oracle stays
    buildable."""
    return max(4, min(64, math.isqrt(max(1, n))))


def _derived_k(sf_dir: str) -> int:
    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet") \
        .metadata.num_rows
    return semdedup_k(n)


def _dup_mask(xa: np.ndarray, xb: np.ndarray,
              tau2_num: int, tau2_den: int) -> np.ndarray:
    """Exact integer τ-test for every (row of xa) × (row of xb) pair:
    boolean |a|×|b| matrix. int64 dot (< 2⁴⁸), object-int square vs
    product of norms (needs 128 bits)."""
    gram = xa @ xb.T                     # int64-exact
    n2a = np.einsum("ij,ij->i", xa, xa)
    n2b = np.einsum("ij,ij->i", xb, xb)
    go = gram.astype(object)
    return (gram > 0) & (go * go * tau2_den
                         >= tau2_num * (n2a.astype(object)[:, None]
                                        * n2b.astype(object)[None, :]))


def _group_np(g: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = g["vec_id"].to_numpy()
    x = np.stack([np.asarray(v, dtype=np.int64) for v in g["v"]])
    return ids, x


def semdedup_keep(sf_dir: str, k: int | None = None, iters: int = 2,
                  tau2_num: int = TAU2_NUM,
                  tau2_den: int = TAU2_DEN,
                  band_limit: int = BAND_LIMIT) -> rd.Dataset:
    """(vec_id, cluster, kept) for every embedding row: ``kept`` is
    false iff a smaller-vec_id member of the same k-means cluster is
    cosine-similar above τ (exact integer test, see module doc).
    ``k=None`` derives ``semdedup_k(N)`` from the table size."""
    if k is None:
        k = _derived_k(sf_dir)
    quant, cent = kmeans_fit(sf_dir, k, iters)
    ref = ray.put(cent)

    def assign_batch(t: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        x = t.column("v").combine_chunks().flatten().to_numpy() \
             .reshape(t.num_rows, -1)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            "v": t.column("v"),
        })

    assigned = quant.map_batches(assign_batch, batch_format="pyarrow")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        _, x = _group_np(g)
        dup = _dup_mask(x, x, tau2_num, tau2_den)
        kept = ~np.tril(dup, -1).any(axis=1)  # row v vs cols u < v
        return pd.DataFrame({"vec_id": g["vec_id"],
                             "cluster": g["cluster"],
                             "kept": kept})

    # Cluster sizes: k narrow rows — the only driver-side state.
    # assigned is consumed twice (sizes + the prune) → materialize
    # once (CLAUDE.md lineage rule).
    assigned = assigned.materialize()
    sizes = {int(r["cluster"]): int(r["count()"])
             for r in assigned.groupby("cluster").count()
                              .take_all()}
    nbands = {c: -(-n // band_limit) for c, n in sizes.items()}
    if all(t == 1 for t in nbands.values()):
        return assigned.groupby("cluster").map_groups(
            prune, batch_format="pandas")

    # Band-split path: fan each row of an oversize cluster out to its
    # t(t+1)/2 band-pair tasks (t copies per row), τ-test per band
    # pair, OR-reduce the dup marks.
    nb_ref = ray.put(nbands)

    def fan(t: pa.Table, _nb=nb_ref) -> pa.Table:
        nb = ray.get(_nb)
        ids = t.column("vec_id").to_numpy()
        cls = t.column("cluster").to_numpy()
        reps, bi, bj, own = [], [], [], []
        for r in range(t.num_rows):
            tt = nb.get(int(cls[r]), 1)
            b = int(ids[r]) % tt
            for p in range(tt):
                reps.append(r)
                bi.append(min(b, p))
                bj.append(max(b, p))
                own.append(b)
        sub = t.take(pa.array(reps, pa.int64()))
        return sub.append_column("bi", pa.array(bi, pa.int64())) \
                  .append_column("bj", pa.array(bj, pa.int64())) \
                  .append_column("b", pa.array(own, pa.int64()))

    def pair_prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        lo, hi = int(g["bi"].iloc[0]), int(g["bj"].iloc[0])
        if lo == hi:
            ids, x = _group_np(g)
            dup = np.tril(_dup_mask(x, x, tau2_num, tau2_den), -1) \
                .any(axis=1)
            return pd.DataFrame({"vec_id": ids,
                                 "cluster": g["cluster"],
                                 "dup": dup.astype(np.int64)})
        a, b = g[g["b"] == lo], g[g["b"] == hi]
        if not len(a) or not len(b):
            # skewed ids can leave a band empty (vec_id % t misses a
            # residue): the cross task then has no pairs to test
            ids = g["vec_id"].to_numpy()
            return pd.DataFrame({
                "vec_id": ids, "cluster": g["cluster"],
                "dup": np.zeros(len(ids), dtype=np.int64)})
        ia, xa = _group_np(a)
        ib, xb = _group_np(b)
        m = _dup_mask(xa, xb, tau2_num, tau2_den)
        # similar pair → mark the larger vec_id (either side)
        dup_a = (m & (ia[:, None] > ib[None, :])).any(axis=1)
        dup_b = (m & (ia[:, None] < ib[None, :])).any(axis=0)
        return pd.DataFrame({
            "vec_id": np.concatenate([ia, ib]),
            "cluster": pd.concat([a["cluster"], b["cluster"]]),
            "dup": np.concatenate([dup_a, dup_b]).astype(np.int64),
        })

    marks = assigned.map_batches(fan, batch_format="pyarrow") \
        .groupby(["cluster", "bi", "bj"]) \
        .map_groups(pair_prune, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vec_id": df["vec_id"],
                             "cluster": df["cluster"],
                             "kept": df["max(dup)"] == 0})

    return marks.groupby(["vec_id", "cluster"]) \
        .aggregate(Max("dup")) \
        .map_batches(finish, batch_format="pandas")


def semdedup_oracle_sql(k: int | None = None, iters: int = 2,
                        tau2_num: int = TAU2_NUM,
                        tau2_den: int = TAU2_DEN) -> str:
    """k-means WITH clause (shared CTEs, `kmeans_with_clause`) + the
    pair scan: same-cluster ordered pairs → integer dot/norm sums →
    the HUGEINT threshold test → NOT EXISTS as a LEFT JOIN.
    ``k=None`` derives ``semdedup_k(N)`` from the sf dir named by
    ``GRAFT_ORACLE_SF`` (default the driver's sf0.01) — mirroring
    ``semdedup_keep``'s derivation so both sides unroll the same k."""
    if k is None:
        k = _derived_k(os.environ.get(ORACLE_SF_ENV, DRIVER_SF))
    return kmeans_with_clause(k, iters) + f""",
        pairs AS MATERIALIZED (
          SELECT a.vec_id AS ua, b.vec_id AS ub
          FROM assign a JOIN assign b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        ),
        norms AS MATERIALIZED (
          SELECT vec_id, SUM(qe * qe) AS n2 FROM q GROUP BY vec_id
        ),
        dots AS MATERIALIZED (
          SELECT p.ua, p.ub, SUM(qa.qe * qb.qe) AS dot
          FROM pairs p
          JOIN q qa ON qa.vec_id = p.ua
          JOIN q qb ON qb.vec_id = p.ub AND qb.i = qa.i
          GROUP BY p.ua, p.ub
        ),
        dup AS MATERIALIZED (
          SELECT d.ub AS vec_id
          FROM dots d
          JOIN norms na ON na.vec_id = d.ua
          JOIN norms nb ON nb.vec_id = d.ub
          WHERE d.dot > 0
            AND CAST(d.dot AS HUGEINT) * d.dot * {tau2_den}
                >= CAST({tau2_num} AS HUGEINT) * na.n2 * nb.n2
          GROUP BY d.ub
        )
        SELECT a.vec_id, a.cluster,
               (dup.vec_id IS NULL) AS kept
        FROM assign a LEFT JOIN dup ON dup.vec_id = a.vec_id
    """
