"""Frequent Directions: published error bound, planted-spectrum
recovery, single-block exactness vs the classic reference."""

import numpy as np


def _gram(b):
    return b.T @ b


def _ds(mat):
    import ray.data as rd
    return rd.from_items([{"vec_id": i, "embedding": row.tolist()}
                          for i, row in enumerate(mat)], override_num_blocks=4)


def _sketch(ds, ell):
    from pdf2dom_ray.functions.freqdir import frequent_directions
    rows = frequent_directions(ds, ell=ell).take_all()
    b = np.array([r["vector"] for r in rows if r["dir_id"] >= 0])
    err_mass = [r["weight"] for r in rows if r["dir_id"] == -1][0]
    return b, err_mass


def test_fd_spectral_error_bound(ray_session):
    rng = np.random.RandomState(97)
    a = rng.normal(size=(400, 24))
    ell = 12
    b, _ = _sketch(_ds(a), ell)
    diff = _gram(a) - _gram(b)
    eig = np.linalg.eigvalsh(diff)
    # 0 ≼ AᵀA − BᵀB (up to fp noise) and ‖diff‖₂ ≤ ‖A‖F²/(ℓ−k), k=0
    assert eig.min() > -1e-6 * (a ** 2).sum()
    assert eig.max() <= (a ** 2).sum() / ell + 1e-6


def test_fd_recovers_planted_low_rank(ray_session):
    rng = np.random.RandomState(101)
    # rank-3 planted spectrum + small noise
    u = np.linalg.qr(rng.normal(size=(300, 3)))[0]
    v = np.linalg.qr(rng.normal(size=(20, 3)))[0]
    a = (u * np.array([50.0, 30.0, 20.0])) @ v.T \
        + 0.01 * rng.normal(size=(300, 20))
    b, err_mass = _sketch(_ds(a), ell=8)
    # top-3 sketch directions align with the planted subspace
    top = b[np.argsort(-(b ** 2).sum(1))[:3]]
    overlap = np.linalg.norm(top @ v, ord="fro") ** 2 \
        / np.linalg.norm(top, ord="fro") ** 2
    assert overlap > 0.99
    assert err_mass >= -1e-6


def test_fd_single_block_equals_reference(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.freqdir import fd_reference
    rng = np.random.RandomState(103)
    a = rng.normal(size=(64, 10))
    ell = 6
    ds = rd.from_items(
        [{"vec_id": i, "embedding": r.tolist()} for i, r in
         enumerate(a)], override_num_blocks=4).repartition(1)
    b, _ = _sketch(ds, ell)
    ref = fd_reference(a, ell)
    assert np.allclose(_gram(b), _gram(ref), atol=1e-8)


def test_fd_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.freqdir import frequent_directions
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    assert frequent_directions(ds).take_all() == []
