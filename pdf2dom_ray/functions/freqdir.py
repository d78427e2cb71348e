"""Frequent Directions — a mergeable covariance sketch for embedding
matrices (Liberty 2013, "Simple and deterministic matrix sketching";
Ghashami et al. 2016 for the mergeability proof).

The matrix sibling of the repo's CMS/HLL/Misra-Gries family: a tiny
ℓ×d matrix B whose Gram product approximates the full corpus
covariance,

    0 ≼ AᵀA − BᵀB ≼ (‖A‖_F² − ‖B‖_F²)/(ℓ−k) · I   for every k < ℓ,

which is what PCA-whitening, IVF/PQ codebook seeding, SemDeDup
cluster counts and embedding-drift monitors actually need from a
100 TB embedding table — none of them need the rows, only AᵀA.

The sketch is a true COMMUTATIVE MONOID under merge (stack two
sketches, shrink back to ℓ — associativity up to the same error
bound), so the distributed shape is the canonical sketch fold:
one pass of per-batch numpy sketches (SVD of an ℓ×d buffer per
shrink), then a driver tree-fold of O(blocks) ℓ×d partials — no
shuffle whatsoever, O(ℓ·d) memory everywhere.

SVD floats make the result ORDER-DEPENDENT in the last ulps across
partitionings, so there is deliberately NO value-hash SQL oracle —
the driver registers it rows-only (the HLL precedent) and pytest
locks the published guarantees instead: the spectral error bound, the
within-bound reconstruction of a planted low-rank spectrum, and exact
equality to the single-process reference implementation when run on
one block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["frequent_directions", "fd_reference"]


def _shrink(buf: np.ndarray, ell: int) -> np.ndarray:
    """One FD shrink: SVD, subtract the (ell)-th squared singular
    value from every kept direction."""
    _, s, vt = np.linalg.svd(buf, full_matrices=False)
    if len(s) <= ell:
        return (s[:, None] * vt)
    delta = s[ell - 1] ** 2
    s2 = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
    return s2[:, None] * vt[:ell]


def fd_reference(rows: np.ndarray, ell: int) -> np.ndarray:
    """Classic single-process FD over ``rows`` (n×d), buffer 2ℓ —
    the reference the distributed fold is locked against."""
    d = rows.shape[1]
    b = np.zeros((0, d))
    for i in range(0, len(rows), ell):
        b = np.vstack([b, rows[i:i + ell]])
        if len(b) > ell:
            b = _shrink(b, ell)
    return b


def frequent_directions(ds: rd.Dataset, *, ell: int = 16,
                        vec_col: str = "embedding") -> rd.Dataset:
    """One row per sketch direction: (dir_id, weight, vector) — the
    ℓ×d Frequent Directions sketch of the embedding column, plus its
    Frobenius-mass bookkeeping row (dir_id = −1, weight = ‖A‖_F² −
    ‖B‖_F², the error-bound numerator)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64)
             for v in t.column(vec_col).to_pylist()])
        if mat.size == 0:
            return pa.table({"b": pa.array([], pa.binary()),
                             "fro": pa.array([], pa.float64()),
                             "d": pa.array([], pa.int64())})
        b = fd_reference(mat, ell)
        return pa.table({
            "b": pa.array([b.astype(np.float64).tobytes()],
                          pa.binary()),
            "fro": pa.array([float((mat ** 2).sum())], pa.float64()),
            "d": pa.array([mat.shape[1]], pa.int64())})

    parts = [b for b in ray.get(
        ds.map_batches(sketch_batch, batch_format="pyarrow")
          .to_arrow_refs()) if b.num_columns and b.num_rows]
    if not parts:
        return rd.from_arrow(pa.table({
            "dir_id": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
            "vector": pa.array([], pa.list_(pa.float64()))}))
    tab = pa.concat_tables(parts)
    d = int(tab.column("d")[0].as_py())
    fro_total = float(sum(tab.column("fro").to_pylist()))
    sketches = [np.frombuffer(raw, dtype=np.float64).reshape(-1, d)
                for raw in tab.column("b").to_pylist()]
    # driver tree-fold: merge = stack + shrink (mergeability per
    # Ghashami et al. 2016); tree order bounds the fold depth
    while len(sketches) > 1:
        nxt = []
        for i in range(0, len(sketches) - 1, 2):
            nxt.append(_shrink(
                np.vstack([sketches[i], sketches[i + 1]]), ell))
        if len(sketches) % 2:
            nxt.append(sketches[-1])
        sketches = nxt
    b = sketches[0]
    weights = (b ** 2).sum(axis=1)
    err_mass = fro_total - float(weights.sum())
    dir_ids = list(range(len(b))) + [-1]
    out_w = weights.tolist() + [err_mass]
    vecs = [row.tolist() for row in b] + [[0.0] * d]
    return rd.from_arrow(pa.table({
        "dir_id": pa.array(dir_ids, pa.int64()),
        "weight": pa.array(out_w, pa.float64()),
        "vector": pa.array(vecs, pa.list_(pa.float64()))}))
