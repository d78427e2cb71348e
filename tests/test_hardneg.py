"""Hard-negative mining: band exclusion, self exclusion, tie-break,
partition invariance vs a numpy reference."""

import numpy as np
import pyarrow as pa


def _ds(vecs):
    import ray.data as rd
    return rd.from_items(
        [{"vec_id": i, "embedding": v.tolist()}
         for i, v in enumerate(vecs)], override_num_blocks=4)


def _ref(vecs, qids, hi=0.9):
    V = np.stack(vecs)
    n = np.maximum(np.linalg.norm(V, axis=1), 1e-30)
    out = {}
    for q in qids:
        sims = np.round(V @ V[q] / (n * n[q]), 4)
        best, bid = -np.inf, None
        for i, s in enumerate(sims):
            if i == q or s >= hi:
                continue
            if s > best or (s == best and i < bid):
                best, bid = s, i
        if bid is not None:
            out[q] = (bid, best)
    return out


def test_band_and_self_exclusion(ray_session):
    from pdf2dom_ray.functions.ann import hard_negatives
    rng = np.random.default_rng(9)
    base = rng.standard_normal(12)
    vecs = [base,
            base + rng.standard_normal(12) * 0.01,   # near-dup (>0.9)
            base + rng.standard_normal(12) * 0.8,    # hard negative
            rng.standard_normal(12),                 # easy negative
            -base]                                   # anti-correlated
    got = {int(r["qid"]): (int(r["vec_id"]), float(r["sim"]))
           for r in hard_negatives(
               _ds(vecs), np.stack([vecs[0]]), [0]).take_all()}
    want = _ref(vecs, [0])
    assert got == want
    assert got[0][0] not in (0, 1)        # neither self nor near-dup


def test_partition_invariance_matches_reference(ray_session):
    from pdf2dom_ray.functions.ann import hard_negatives
    rng = np.random.default_rng(21)
    vecs = [rng.standard_normal(8) for _ in range(60)]
    qids = [0, 10, 20]
    Q = np.stack([vecs[q] for q in qids])
    want = _ref(vecs, qids)
    import ray.data as rd
    ds = rd.from_items(
        [{"vec_id": i, "embedding": v.tolist()}
         for i, v in enumerate(vecs)], override_num_blocks=11)
    got = {int(r["qid"]): (int(r["vec_id"]), float(r["sim"]))
           for r in hard_negatives(ds, Q, qids).take_all()}
    assert got == want
