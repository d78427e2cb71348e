"""SemDeDup: semantic deduplication via cluster-local cosine pruning.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) is the standard
"semantic" complement to MinHash dedup: embed every document, k-means
the embeddings, and inside each cluster drop all but one member of
every near-duplicate group — pairs are only ever compared within a
cluster, so the quadratic all-pairs scan shrinks to Σ|c|² with k
chosen so clusters stay bounded (the paper scales k with corpus size;
at 100 TB that means k in the tens of thousands and cluster-local
tiles of a few thousand vectors — each an independent task).

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
``groupby(cluster).map_groups`` — one task per cluster, peak memory
one cluster's |c|×D block plus its |c|² gram matrix. Hot-cluster skew
is bounded by k (SemDeDup's own prescription); a pathological giant
cluster would need a secondary split (sub-cluster or band the
pair-scan), which the paper also resorts to.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd
import pyarrow as pa

from .kmeans import kmeans_fit, kmeans_with_clause

__all__ = ["semdedup_keep", "semdedup_oracle_sql"]

TAU2_NUM = 4            # τ = 0.4 → τ² = 4/25 (the synthetic
TAU2_DEN = 25           # corpus's near-dup band tops out near 0.48)


def semdedup_keep(sf_dir: str, k: int = 10, iters: int = 2,
                  tau2_num: int = TAU2_NUM,
                  tau2_den: int = TAU2_DEN) -> rd.Dataset:
    """(vec_id, cluster, kept) for every embedding row: ``kept`` is
    false iff a smaller-vec_id member of the same k-means cluster is
    cosine-similar above τ (exact integer test, see module doc)."""
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
        x = np.stack([np.asarray(v, dtype=np.int64) for v in g["v"]])
        gram = x @ x.T                       # int64-exact (< 2^48)
        n2 = np.diag(gram).copy()
        go, n2o = gram.astype(object), n2.astype(object)
        dup = (gram > 0) & (go * go * tau2_den
                            >= tau2_num * (n2o[:, None] * n2o[None, :]))
        kept = ~np.tril(dup, -1).any(axis=1)  # row v vs cols u < v
        return pd.DataFrame({"vec_id": g["vec_id"],
                             "cluster": g["cluster"],
                             "kept": kept})

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas")


def semdedup_oracle_sql(k: int = 10, iters: int = 2,
                        tau2_num: int = TAU2_NUM,
                        tau2_den: int = TAU2_DEN) -> str:
    """k-means WITH clause (shared CTEs, `kmeans_with_clause`) + the
    pair scan: same-cluster ordered pairs → integer dot/norm sums →
    the HUGEINT threshold test → NOT EXISTS as a LEFT JOIN."""
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
