"""SemDeDup (functions/semdedup.py): hand cases for the keep rule and
its cluster-locality, numpy-reference equality on the driver table,
the DuckDB unrolled-CTE oracle, the corpus-scaled k derivation, and
the giant-cluster band-split (bounded per-task pair matrices)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf2dom_ray.functions.semdedup import (
    TAU2_DEN, TAU2_NUM, semdedup_k, semdedup_keep, semdedup_oracle_sql)


def _write(tmp_path, vecs, ids=None):
    if ids is None:
        ids = np.arange(len(vecs), dtype=np.int64)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_keep_rule_single_cluster(ray_session, tmp_path):
    # k=1: pure cosine NOT-EXISTS semantics, no clustering effects.
    sf = _write(tmp_path, [
        (1.0, 0.0),     # 0: kept (first)
        (1.0, 0.01),    # 1: cos≈1 with 0 → dropped
        (0.0, 1.0),     # 2: orthogonal → kept
        (-1.0, 0.0),    # 3: negative dot with everything → kept
        (0.0, 1.5),     # 4: cos 1 with 2 → dropped
    ])
    got = semdedup_keep(sf, k=1, iters=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["kept"].tolist() == [True, False, True, True, False]


def test_keep_rule_is_cluster_local(ray_session, tmp_path):
    # Same direction, different magnitude → different k-means cluster:
    # vec 2 has cos=1 with vec 0 but is NOT dropped (different
    # cluster); within each cluster the later member is dropped.
    sf = _write(tmp_path, [
        (1000.0, 0.0),   # 0: cluster A, kept
        (1000.0, 50.0),  # 1: cluster A, cos≈0.999 with 0 → dropped
        (10.0, 0.0),     # 2: cluster B, kept despite cos=1 with 0
        (12.0, 0.0),     # 3: cluster B, cos=1 with 2 → dropped
    ])
    got = semdedup_keep(sf, k=2, iters=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["kept"].tolist() == [True, False, True, False]
    assert got.loc[0, "cluster"] != got.loc[2, "cluster"]
    assert got.loc[0, "cluster"] == got.loc[1, "cluster"]
    assert got.loc[2, "cluster"] == got.loc[3, "cluster"]


def test_matches_numpy_reference(ray_session, sf_dir):
    got = semdedup_keep(sf_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .sort_values("vec_id").reset_index(drop=True)
    q = np.floor(np.stack(emb["embedding"].to_numpy())
                 .astype(np.float64) * (1 << 20)).astype(np.int64)
    # replay the keep rule per cluster with exact integer arithmetic
    kept = np.ones(len(q), dtype=bool)
    for cl, grp in got.groupby("cluster"):
        ids = grp["vec_id"].to_numpy()
        x = q[ids]
        gram = x @ x.T
        n2 = np.diag(gram).copy()
        go, n2o = gram.astype(object), n2.astype(object)
        dup = (gram > 0) & (go * go * TAU2_DEN
                            >= TAU2_NUM * (n2o[:, None] * n2o[None, :]))
        kept[ids] = ~np.tril(dup, -1).any(axis=1)
    assert (got["kept"].to_numpy() == kept).all()
    assert (~got["kept"]).sum() > 0          # non-vacuous at sf0.001


def test_matches_sql_oracle(ray_session, sf_dir, monkeypatch):
    import duckdb
    monkeypatch.setenv("GRAFT_ORACLE_SF", sf_dir)  # same derived k
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'")
    want = con.sql(semdedup_oracle_sql()).df() \
        .sort_values("vec_id").reset_index(drop=True)
    got = semdedup_keep(sf_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (got["cluster"].to_numpy()
            == want["cluster"].to_numpy()).all()
    assert (got["kept"].to_numpy()
            == want["kept"].to_numpy().astype(bool)).all()


def test_k_scales_with_corpus():
    # paper prescription: ~√N clusters, clamped for tiny fixtures and
    # for the unrolled SQL oracle
    assert semdedup_k(1) == 4
    assert semdedup_k(500) == 22
    assert semdedup_k(2000) == 44
    assert semdedup_k(10**12) == 64


def test_band_split_matches_single_task(ray_session, tmp_path):
    # Skewed synthetic: one hot direction holds most vectors, so one
    # k-means cluster is "giant" relative to a tiny band_limit. The
    # banded path must (a) agree exactly with the one-task-per-cluster
    # path and (b) never give any band-pair task a pair matrix larger
    # than ~band_limit² (the whole point of the split).
    rng = np.random.default_rng(7)
    hot = [(100.0 + rng.uniform(-1, 1), rng.uniform(-1, 1))
           for _ in range(60)]
    cold = [(-100.0 + rng.uniform(-1, 1), 50.0 + rng.uniform(-1, 1))
            for _ in range(6)]
    sf = _write(tmp_path, hot + cold)
    limit = 8
    base = semdedup_keep(sf, k=2, iters=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    banded = semdedup_keep(sf, k=2, iters=1, band_limit=limit) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, banded, check_dtype=False)
    assert (~banded["kept"]).sum() > 0     # non-vacuous
    # bound check: replay the band rule on the actual assignment
    for _, grp in banded.groupby("cluster"):
        n = len(grp)
        t = -(-n // limit)
        band_sizes = grp["vec_id"].to_numpy() % t
        counts = np.bincount(band_sizes, minlength=t)
        assert counts.max() ** 2 <= 4 * limit * limit


def test_band_split_survives_empty_band(ray_session, tmp_path):
    # all-even vec_ids with t=2 leave band 1 empty: the cross task
    # must emit no-dup rows instead of stacking an empty frame
    rng = np.random.default_rng(11)
    vecs = [(50.0 + rng.uniform(-1, 1), rng.uniform(-1, 1))
            for _ in range(20)]
    ids = np.arange(20) * 2          # every id ≡ 0 (mod 2)
    sf = _write(tmp_path, vecs, ids=ids)
    base = semdedup_keep(sf, k=1, iters=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    banded = semdedup_keep(sf, k=1, iters=1, band_limit=10) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, banded, check_dtype=False)
    assert (~banded["kept"]).sum() > 0
