"""Fixed-point distributed k-means (functions/kmeans.py): equality
with a local numpy reference of the same algorithm, the DuckDB
unrolled-CTE oracle, and cluster recovery on planted separable data.

(The driver embeddings table's `label` column is geometrically random
— 1-NN label agreement ≈ chance — so purity there is meaningless; the
recovery test plants real structure.)
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf2dom_ray.functions.kmeans import (
    SCALE_BITS, kmeans_clusters, kmeans_oracle_sql)


def _reference(emb: np.ndarray, k: int, iters: int):
    q = np.floor(emb.astype(np.float64) * (1 << SCALE_BITS)) \
        .astype(np.int64)
    # farthest-point init
    cent = [q[0]]
    for _ in range(1, k):
        md = ((q[:, None, :] - np.stack(cent)[None, :, :]) ** 2) \
            .sum(2).min(1)
        cent.append(q[md.argmax()])       # argmax → first max (low id)
    cent = np.stack(cent)
    for _ in range(iters):
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(2)
        cl = d2.argmin(1)
        for j in range(k):
            if (cl == j).any():
                cent[j] = np.floor_divide(q[cl == j].sum(0),
                                          (cl == j).sum())
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(2)
    cl = d2.argmin(1)
    return cl, d2[np.arange(len(cl)), cl]


def test_kmeans_matches_numpy_reference(ray_session, sf_dir):
    got = kmeans_clusters(sf_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .sort_values("vec_id")
    cl, d2 = _reference(np.stack(emb["embedding"].to_numpy()),
                        k=10, iters=2)
    assert (got["cluster"].to_numpy() == cl).all()
    assert (got["dist2"].to_numpy() == d2).all()


def test_kmeans_matches_sql_oracle(ray_session, sf_dir):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'")
    want = con.sql(kmeans_oracle_sql()).df() \
        .sort_values("vec_id").reset_index(drop=True)
    got = kmeans_clusters(sf_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (got["cluster"].to_numpy()
            == want["cluster"].to_numpy()).all()
    assert (got["dist2"].to_numpy()
            == want["dist2"].to_numpy().astype(np.int64)).all()


def test_kmeans_recovers_planted_clusters(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    k, per, dim = 3, 40, 16
    centers = np.array([[5.0] * dim, [-5.0] * dim,
                        [5.0] * (dim // 2) + [-5.0] * (dim // 2)])
    rows, labels = [], []
    for j in range(k):
        pts = centers[j] + rng.normal(0, 0.2, size=(per, dim))
        rows.extend(pts.astype(np.float32))
        labels.extend([j] * per)
    order = rng.permutation(k * per)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(k * per, dtype=np.int64)),
        "embedding": pa.array(
            [rows[i].tolist() for i in order],
            pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    got = kmeans_clusters(str(tmp_path), k=3, iters=2).to_pandas()
    lab = pd.Series([labels[i] for i in order],
                    index=np.arange(k * per))
    m = got.assign(label=got["vec_id"].map(lab))
    # perfect recovery: each k-means cluster = exactly one planted label
    tab = pd.crosstab(m["cluster"], m["label"])
    assert (tab.gt(0).sum(axis=1) == 1).all()
    assert m["cluster"].nunique() == 3
