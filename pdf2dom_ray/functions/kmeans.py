"""Distributed Lloyd's k-means over the embeddings table, bit-exact.

Corpus clustering is the standard "understand / mix your training
data" op (cluster-then-sample curation). The twist here is
determinism under distribution: float centroid updates are
order-dependent in the last ulps, so the same data can assign a
boundary vector differently between runs — and would flake the
driver's value-hash. Everything therefore runs in int64 fixed point:

- quantize once: ``q = floor(float64(x) * 2^20)`` (exact — the
  float32→float64 widening and the 2^20 exponent shift are both
  lossless, so floor is the only rounding and it matches SQL FLOOR),
- distances are integer squared-L2 (64 dims × (2^21)² ≈ 2^42, safely
  inside int64; argmin ties break to the lowest cluster index),
- centroid update is ``floor(sum / count)`` per dimension — integer
  sums are associative, so the result is partitioning-independent.

Scale shape per Lloyd iteration: centroids are tiny (k×D int64) and
broadcast via ``ray.put``; each batch computes its own per-cluster
partial sums (≤ k×(D+1) narrow rows per batch — a combiner), which a
small ``groupby((cluster, dim))`` reduces; the driver only ever holds
the k×(D+1) reduced table. The quantized table is materialized once
because every iteration re-consumes it (re-executing the parquet scan
per iteration would re-read the corpus L times — CLAUDE.md lineage
rule). Empty clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["kmeans_clusters", "kmeans_fit", "kmeans_oracle_sql",
           "kmeans_with_clause"]

SCALE_BITS = 20


def _quantize(t: pa.Table) -> pa.Table:
    emb = t.column("embedding")
    flat = emb.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    n = t.num_rows
    dim = len(flat) // n if n else 0
    q = np.floor(flat.astype(np.float64)
                 * (1 << SCALE_BITS)).astype(np.int64)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
    return pa.table({
        "vec_id": t.column("vec_id").cast(pa.int64()),
        "v": pa.ListArray.from_arrays(offsets, pa.array(q)),
    })


def _assign(x: np.ndarray, cent: np.ndarray):
    # (N,1,D) - (k,D) broadcast: exact int64 squared distances
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)            # first minimum → lowest index
    return cl, d2[np.arange(len(cl)), cl]


def _block_np(b) -> tuple[np.ndarray, np.ndarray]:
    """Block (arrow or pandas) → (ids, int64 matrix)."""
    t = b if isinstance(b, pa.Table) else \
        pa.Table.from_pandas(b, preserve_index=False)
    if not t.num_rows or "vec_id" not in t.schema.names:
        return np.array([], dtype=np.int64), \
            np.empty((0, 0), dtype=np.int64)
    ids = t.column("vec_id").to_numpy()
    x = t.column("v").combine_chunks().flatten().to_numpy() \
         .reshape(t.num_rows, -1)
    return ids, x


@ray.remote
def _block_far(b, seeds: np.ndarray):
    """Per-block farthest-point candidate for one seeding round."""
    ids, x = _block_np(b)
    if not len(ids):
        return None
    md = ((x[:, None, :] - seeds[None, :, :]) ** 2) \
        .sum(axis=2).min(axis=1)
    top = md.max()
    i = int(ids[md == top].min())       # lowest-id tie-break
    row = int(np.flatnonzero(ids == i)[0])
    return int(top), i, x[row].copy()


@ray.remote
def _block_partial(b, cent: np.ndarray):
    """Per-block (cluster → component sums + count) for one Lloyd
    round; ≤ k×(D+1) values."""
    ids, x = _block_np(b)
    if not len(ids):
        return None
    cl, _ = _assign(x, cent)
    out = {}
    for j in np.unique(cl):
        xj = x[cl == j]
        out[int(j)] = (xj.sum(axis=0), len(xj))
    return out


def _farthest_point_seeds(quant: rd.Dataset, k: int) -> np.ndarray:
    """Deterministic farthest-point init (the greedy 2-approximation
    k-center sweep kmeans++ randomizes): seed 0 is vec_id 0; each
    round adds the vector with the largest min-distance to the chosen
    seeds (ties → lowest vec_id).

    Iterative-refinement escape hatch: ``quant`` is materialized, so
    each round launches one RAW Ray task per existing object-store
    block (ms of launch overhead) instead of paying a full Dataset
    operator pass per round — k rounds stay fully distributed and the
    driver reduces one candidate per block per round."""
    refs = quant.to_arrow_refs()
    first = quant.filter(expr="vec_id == 0").take_all()
    seeds = [np.asarray(first[0]["v"], dtype=np.int64)]
    for _ in range(1, k):
        s = np.stack(seeds)
        cands = [c for c in ray.get([_block_far.remote(r, s)
                                     for r in refs]) if c is not None]
        cands.sort(key=lambda c: (-c[0], c[1]))
        seeds.append(np.asarray(cands[0][2], dtype=np.int64))
    return np.stack(seeds)


def kmeans_fit(sf_dir: str, k: int = 10,
               iters: int = 2) -> tuple[rd.Dataset, np.ndarray]:
    """Fit k-means (deterministic farthest-point init, ``iters``
    centroid updates); return the materialized quantized table
    ``(vec_id, v)`` and the final ``k×D`` int64 centroid matrix —
    the reusable core shared with the SemDeDup operator."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    quant = ds.map_batches(_quantize, batch_format="pyarrow") \
              .materialize()

    cent = _farthest_point_seeds(quant, k)
    dim = cent.shape[1]

    refs = quant.to_arrow_refs()
    for _ in range(iters):
        # same raw-task-per-block shape as the seeding rounds: the
        # per-block partial is ≤ k×(D+1) values, reduced on the driver
        parts = [p for p in ray.get([_block_partial.remote(r, cent)
                                     for r in refs]) if p]
        sums = {}
        for part in parts:
            for j, (v, n) in part.items():
                if j in sums:
                    sums[j] = (sums[j][0] + v, sums[j][1] + n)
                else:
                    sums[j] = (v, n)
        nxt = cent.copy()                 # empty cluster → keep old
        for j, (v, n) in sums.items():
            if n > 0:
                nxt[j] = np.floor_divide(v.astype(np.int64), n)
        cent = nxt

    return quant, cent


def kmeans_clusters(sf_dir: str, k: int = 10,
                    iters: int = 2) -> rd.Dataset:
    """Fit k-means, then emit the final assignment
    ``(vec_id, cluster, dist2)``."""
    quant, cent = kmeans_fit(sf_dir, k, iters)
    ref = ray.put(cent)

    def final(t: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        x = t.column("v").combine_chunks().flatten().to_numpy() \
             .reshape(t.num_rows, -1)
        cl, d2 = _assign(x, c)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "cluster": pa.array(cl.astype(np.int64)),
            "dist2": pa.array(d2.astype(np.int64)),
        })

    return quant.map_batches(final, batch_format="pyarrow")


def kmeans_with_clause(k: int = 10, iters: int = 2) -> str:
    """The fixed-point algorithm unrolled into a WITH clause ending in
    an ``assign(vec_id, cluster, dist2)`` CTE — shared by the k-means
    oracle and the SemDeDup oracle (which appends pair CTEs over the
    same ``q`` and ``assign``): positional UNNEST zips the vector
    lists; the farthest-point init is k-1 chained rounds of "min-dist
    so far → argmax pick" (incremental LEAST against only the newest
    seed); each Lloyd assignment is an argmin via QUALIFY, each update
    a floor-division GROUP BY (COALESCE keeps the previous centroid
    for empty clusters)."""
    scale = 1 << SCALE_BITS
    sql = [f"""
        WITH q AS MATERIALIZED (
          SELECT vec_id, i, CAST(FLOOR(CAST(e AS DOUBLE) * {scale})
                                 AS BIGINT) AS qe
          FROM (SELECT vec_id, unnest(embedding) AS e,
                       unnest(range(len(embedding))) AS i
                FROM embeddings)
        ),
        s_0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS cl, i, qe AS ce
                             FROM q WHERE vec_id = 0),
        md_0 AS MATERIALIZED (
          SELECT q.vec_id, SUM((q.qe - s.ce) * (q.qe - s.ce)) AS md
          FROM q JOIN s_0 s ON q.i = s.i GROUP BY q.vec_id
        )"""]
    for j in range(1, k):
        sql.append(f""",
        p_{j} AS MATERIALIZED (
          SELECT vec_id FROM md_{j - 1}
          QUALIFY row_number() OVER (ORDER BY md DESC, vec_id) = 1
        ),
        s_{j} AS MATERIALIZED (
          SELECT CAST({j} AS BIGINT) AS cl, q.i, q.qe AS ce
          FROM q JOIN p_{j} p ON q.vec_id = p.vec_id
        )""")
        if j < k - 1:
            sql.append(f""",
        md_{j} AS MATERIALIZED (
          SELECT m.vec_id, LEAST(m.md, d.d) AS md
          FROM md_{j - 1} m JOIN (
            SELECT q.vec_id, SUM((q.qe - s.ce) * (q.qe - s.ce)) AS d
            FROM q JOIN s_{j} s ON q.i = s.i GROUP BY q.vec_id
          ) d ON d.vec_id = m.vec_id
        )""")
    seed_union = " UNION ALL ".join(
        f"SELECT * FROM s_{j}" for j in range(k))
    sql.append(f""",
        c_0 AS MATERIALIZED ({seed_union})""")
    for it in range(iters):
        sql.append(f""",
        a_{it} AS MATERIALIZED (
          SELECT q.vec_id, c.cl,
                 SUM((q.qe - c.ce) * (q.qe - c.ce)) AS d2
          FROM q JOIN c_{it} c ON q.i = c.i
          GROUP BY q.vec_id, c.cl
          QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                     ORDER BY d2, c.cl) = 1
        ),
        u_{it} AS MATERIALIZED (
          SELECT a.cl, q.i,
                 CAST(FLOOR(CAST(SUM(q.qe) AS DOUBLE) / COUNT(*))
                      AS BIGINT) AS ce
          FROM a_{it} a JOIN q ON q.vec_id = a.vec_id
          GROUP BY a.cl, q.i
        ),
        c_{it + 1} AS MATERIALIZED (
          SELECT p.cl, p.i, COALESCE(u.ce, p.ce) AS ce
          FROM c_{it} p LEFT JOIN u_{it} u
            ON u.cl = p.cl AND u.i = p.i
        )""")
    sql.append(f""",
        assign AS MATERIALIZED (
          SELECT q.vec_id, c.cl AS cluster,
                 CAST(SUM((q.qe - c.ce) * (q.qe - c.ce))
                      AS BIGINT) AS dist2
          FROM q JOIN c_{iters} c ON q.i = c.i
          GROUP BY q.vec_id, c.cl
          QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                     ORDER BY dist2, c.cl) = 1
        )""")
    return "".join(sql)


def kmeans_oracle_sql(k: int = 10, iters: int = 2) -> str:
    """`kmeans_with_clause` + the assignment projection."""
    return (kmeans_with_clause(k, iters)
            + "\n        SELECT vec_id, cluster, dist2 FROM assign")
