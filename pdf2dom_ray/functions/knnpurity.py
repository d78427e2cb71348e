"""k-NN label purity: the embedding-quality / label-noise audit.

For each anchor vector, the fraction of its k nearest neighbors that
share its label — THE quick diagnostic for "are these embeddings
consistent with these labels" (mislabeled clusters and collapsed
embedding spaces both crater it). Anchors are the deterministic
``vec_id % anchor_mod == 0`` slice so the all-pairs scan is
anchors × corpus, not corpus².

Exactness (driver value-hash): distances are integer squared-L2 over
the repo's fixed-point quantization (kmeans.SCALE_BITS — int64-exact,
ordering has no float ulps), neighbor ties break by the lower vec_id,
and purity is integer ppm. Cosine ordering would need HUGEINT
cross-ratios; L2 needs nothing.

Scale shape: the quantized matrix broadcasts once via ``ray.put``
(N×D int64 — the ANN family's brute-force baseline convention; past
broadcast scale the IVF/LSH bucketing in functions/ann.py is the
escalation path), each anchor batch computes its distance block with
one int64 matmul identity (|a|² + |b|² − 2ab), selects k+1 by
argpartition, and emits one narrow row per anchor. No shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .kmeans import SCALE_BITS

__all__ = ["label_knn_purity", "knn_purity_oracle_sql"]


def label_knn_purity(sf_dir: str, k: int = 10, *,
                     anchor_mod: int = 4) -> rd.Dataset:
    """(vec_id, label, n_match, purity_ppm) for every anchor
    (vec_id % anchor_mod == 0)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    lab = t.column("label").to_numpy().astype(np.int64)
    emb = t.column("embedding").combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False)
    n = len(ids)
    x = np.floor(emb.astype(np.float64).reshape(n, -1)
                 * (1 << SCALE_BITS)).astype(np.int64)
    order = np.argsort(ids)
    ids, lab, x = ids[order], lab[order], x[order]
    n2 = np.einsum("ij,ij->i", x, x)
    mat_ref = ray.put((ids, lab, x, n2))

    from ..scale import read_parallelism
    anchors = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id"],
                              override_num_blocks=read_parallelism())

    def score(t: pa.Table, _ref=mat_ref) -> pa.Table:
        ids, lab, x, n2 = ray.get(_ref)
        a_all = t.column("vec_id").to_numpy().astype(np.int64)
        a_ids = a_all[a_all % anchor_mod == 0]
        if not len(a_ids):
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
                "n_match": pa.array([], pa.int64()),
                "purity_ppm": pa.array([], pa.int64())})
        pos = np.searchsorted(ids, a_ids)
        xa = x[pos]
        d2 = (n2[pos][:, None] + n2[None, :]
              - 2 * (xa @ x.T))                 # int64-exact
        kk = min(k, len(ids) - 1)
        nn_ = len(ids)
        if nn_ <= 4096:
            # pack (d2, column index) into one int64 key: with
            # SCALE_BITS=20 quantization, d2 ≤ dims·(2·2^20)² ≈ 2^48
            # leaves 12 low bits for the index, so one argpartition
            # per batch does exact ties-to-lower-id selection with no
            # Python loop. Guard the bound instead of assuming it: a
            # larger SCALE_BITS / dims / embedding range must fail
            # loudly, not silently corrupt neighbor selection.
            assert d2.size == 0 or \
                int(d2.max()) < (2 ** 63) // 4096, \
                "knn purity int64 key packing overflow: d2 too large"
            key = d2 * np.int64(4096) \
                + np.arange(nn_, dtype=np.int64)[None, :]
            key[np.arange(len(a_ids)), pos] = np.iinfo(np.int64).max
            sel = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            out_m = (lab[sel] == lab[pos][:, None]) \
                .sum(axis=1).astype(np.int64)
        else:
            out_m = np.empty(len(a_ids), dtype=np.int64)
            for r in range(len(a_ids)):
                ordr = np.lexsort((ids, d2[r]))
                s = [j for j in ordr if j != pos[r]][:kk]
                out_m[r] = int((lab[s] == lab[pos[r]]).sum())
        ppm = (1_000_000 * out_m) // max(kk, 1)
        return pa.table({
            "vec_id": pa.array(a_ids, pa.int64()),
            "label": pa.array(lab[pos], pa.int64()),
            "n_match": pa.array(out_m, pa.int64()),
            "purity_ppm": pa.array(ppm, pa.int64())})

    return anchors.map_batches(score, batch_format="pyarrow")


def knn_purity_oracle_sql(k: int = 10, *, anchor_mod: int = 4) -> str:
    """Quantized pair distances + QUALIFY top-k + label agreement."""
    scale = 1 << SCALE_BITS
    return f"""
        WITH q AS MATERIALIZED (
          SELECT vec_id, i,
                 CAST(FLOOR(CAST(e AS DOUBLE) * {scale}) AS BIGINT)
                     AS qe
          FROM (SELECT vec_id, unnest(embedding) AS e,
                       unnest(range(len(embedding))) AS i
                FROM embeddings)),
        lab AS MATERIALIZED (
          SELECT CAST(vec_id AS BIGINT) AS vec_id,
                 CAST(label AS BIGINT) AS label FROM embeddings),
        d AS MATERIALIZED (
          SELECT qa.vec_id AS a, qb.vec_id AS b,
                 SUM((qa.qe - qb.qe) * (qa.qe - qb.qe)) AS d2
          FROM q qa JOIN q qb ON qa.i = qb.i
          WHERE qa.vec_id % {anchor_mod} = 0
            AND qa.vec_id <> qb.vec_id
          GROUP BY 1, 2),
        nn AS MATERIALIZED (
          SELECT a, b FROM d
          QUALIFY row_number() OVER (PARTITION BY a
                                     ORDER BY d2, b) <= {k})
        SELECT la.vec_id, la.label,
               CAST(SUM(CASE WHEN la.label = lb.label
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
               CAST((1000000 * SUM(CASE WHEN la.label = lb.label
                                   THEN 1 ELSE 0 END))
                    // GREATEST(COUNT(*), 1) AS BIGINT)
                   AS purity_ppm
        FROM nn
        JOIN lab la ON la.vec_id = nn.a
        JOIN lab lb ON lb.vec_id = nn.b
        GROUP BY 1, 2"""
