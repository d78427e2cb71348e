"""Bounded driver folds (functions/fold.py) and the banded near-dup
default (functions/ann.py::embedding_near_dup_pairs_banded)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.ann import (embedding_near_dup_pairs,
                                       embedding_near_dup_pairs_banded)
from pdf2dom_ray.functions.fold import bounded_fold_tables


def _topk(t: pa.Table, k: int = 3) -> pa.Table:
    idx = pa.compute.sort_indices(
        t, sort_keys=[("v", "descending"), ("i", "ascending")])
    return t.take(idx[:k])


def test_bounded_fold_matches_plain_fetch(ray_session):
    ds = rd.from_pandas(pd.DataFrame({
        "i": np.arange(200, dtype=np.int64),
        "v": (np.arange(200, dtype=np.int64) * 37) % 199,
    })).repartition(100).map_batches(_topk, batch_format="pyarrow",
                                     batch_size=None)

    # pre-merge path (100 blocks > max_blocks=8) vs pure fetch
    merged_pre = pa.concat_tables(
        bounded_fold_tables(ds, _topk, max_blocks=8))
    merged_plain = pa.concat_tables(bounded_fold_tables(ds, None))

    def top3(t):
        return _topk(t.combine_chunks()).to_pydict()

    assert top3(merged_pre) == top3(merged_plain)
    # the pre-merge actually bounded the driver table
    assert merged_pre.num_rows <= 3 * 11   # k * (isqrt(100)+1)


def test_banded_near_dup_subset_of_exact(ray_session):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((12, 16))
    # planted near-dups: rows 12..17 are jittered copies of rows 0..5
    dups = base[:6] + 0.01 * rng.standard_normal((6, 16))
    m = np.vstack([base, dups])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float64())),
    }))

    exact = embedding_near_dup_pairs(ds, threshold=0.8).to_pandas()
    banded = embedding_near_dup_pairs_banded(
        ds, threshold=0.8, bands=4, planes=4, dim=16).to_pandas()

    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    banded_pairs = set(zip(banded["id_a"], banded["id_b"]))
    # banded candidates are verified exactly → subset of the exact set
    assert banded_pairs <= exact_pairs
    # no duplicate pair rows despite multi-band collisions
    assert len(banded_pairs) == len(banded)
    # the tight planted dups collide in ≥1 of 4 bands
    planted = {(i, i + 12) for i in range(6)} & exact_pairs
    assert planted and planted <= banded_pairs
    # sims agree with the exact computation
    merged = banded.merge(exact, on=["id_a", "id_b"],
                          suffixes=("_b", "_e"))
    assert (merged["sim_b"] == merged["sim_e"]).all()
