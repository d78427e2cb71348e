"""Sharded HNSW (functions/hnsw.py): exact hand-graph results,
build/search determinism, and recall@k vs the brute-force baseline
on the driver embeddings."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.ann import brute_topk
from pdf2dom_ray.functions.hnsw import (HnswIndex, _level_of,
                                        hnsw_knn_join, hnsw_topk)


def test_levels_deterministic_geometric():
    lv = [_level_of(v) for v in range(100000)]
    assert min(lv) == 0
    # geometric(1/2): about half at level 0, tail decays 2x per level
    frac0 = sum(1 for x in lv if x == 0) / len(lv)
    assert 0.45 < frac0 < 0.55
    assert [_level_of(v) for v in range(64)] == \
        [_level_of(v) for v in range(64)]


def test_small_graph_exact():
    # 4 well-separated points: any sane search is exact
    x = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0],
                  [0.9, 0.1]])
    idx = HnswIndex(np.arange(4), x, m=2)
    ids, sims = idx.search(np.array([1.0, 0.05]), 2)
    assert ids.tolist()[0] in (0, 3)
    assert set(ids.tolist()) == {0, 3}
    assert sims[0] >= sims[1]


def test_index_deterministic():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 16))
    a = HnswIndex(np.arange(300), x)
    b = HnswIndex(np.arange(300), x)
    assert a.nbrs == b.nbrs
    q = rng.normal(size=16)
    ia, sa = a.search(q, 10)
    ib, sb = b.search(q, 10)
    assert ia.tolist() == ib.tolist()
    assert np.allclose(sa, sb)


def test_recall_vs_brute(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    first = ds.take(1)[0]
    q = np.asarray(first["embedding"], dtype=np.float64)
    want = set(brute_topk(ds, q, k=10).to_pandas()
               ["vec_id"].tolist())
    got = set(hnsw_topk(ds, q, k=10).to_pandas()
              ["vec_id"].tolist())
    assert len(got) == 10
    assert len(got & want) / 10 >= 0.9


def test_knn_join_shapes(ray_session):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(200, 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32())),
    })
    out = hnsw_knn_join(rd.from_arrow(t), x[:3], [0, 1, 2],
                        k=4).to_pandas()
    assert sorted(out["qid"].unique().tolist()) == [0, 1, 2]
    assert (out.groupby("qid").size() == 4).all()
    # every query's own vector is its best neighbor
    best = out.sort_values(["qid", "sim"], ascending=[True, False]) \
        .groupby("qid").head(1)
    assert best["vec_id"].tolist() == [0, 1, 2]
