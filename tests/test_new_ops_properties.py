"""Property tests (hypothesis) for the closing-wave numeric ops:
each distributed operator against a brute-force reference on small
random inputs — the fast/slow equivalence convention of the walker
suite applied to the analytics layer."""
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=1, max_size=40))
def test_gini_rank_sum_equals_pairwise(ray_session, vals):
    from pdf2dom_ray.functions.gini import group_gini
    rows = [{"source": "g", "n_chars": int(v)} for v in vals]
    got = group_gini(rd.from_items(rows, override_num_blocks=4)).to_pandas()
    x = np.array(vals, dtype=np.int64)
    tot = int(x.sum())
    if tot == 0:
        assert int(got.gini_ppm[0]) == 0
        return
    num = int(np.abs(x[:, None] - x[None, :]).sum()) // 2
    want = (1_000_000 * 2 * num) // (2 * len(x) * tot)
    assert int(got.gini_ppm[0]) == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9),
                          st.integers(1, 30)),
                min_size=1, max_size=25))
def test_boruvka_weight_optimal_on_random_graphs(ray_session,
                                                 triples):
    from pdf2dom_ray.functions.boruvka import boruvka_forest
    dd = {}
    for a, b, w in triples:
        if a != b:
            lo, hi = min(a, b), max(a, b)
            dd[(lo, hi)] = max(dd.get((lo, hi), -1), w)
    if not dd:
        return
    rows = [{"src": a, "target": b, "w": w}
            for (a, b), w in dd.items()]
    got = boruvka_forest(rd.from_items(rows, override_num_blocks=4), rounds=8,
                         label_rounds=16).to_pandas()
    # Kruskal reference
    nodes = sorted({n for ab in dd for n in ab})
    idx = {n: i for i, n in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    tot = 0
    for (a, b), w in sorted(dd.items(),
                            key=lambda kv: (-kv[1], kv[0])):
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            parent[ra] = rb
            tot += w
    assert int(got.w.sum()) == tot


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=12))
def test_peak_concurrency_brute(ray_session, tss, window_s):
    from pdf2dom_ray.functions.temporal import peak_concurrency
    import pyarrow.parquet as pq
    import tempfile, os
    w_us = window_s * 1_000_000
    # write a scratch events file with the required columns
    t = pa.table({
        "event_id": pa.array(range(len(tss)), pa.int64()),
        "ts": pa.array(np.array(tss, dtype="int64") * 1000,
                       pa.timestamp("us")),
        "user_id": pa.array([0] * len(tss), pa.int64()),
        "event_type": pa.array(["click"] * len(tss)),
        "value": pa.array([1.0] * len(tss))})
    d = tempfile.mkdtemp(prefix="peak_prop_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = peak_concurrency(d, window_s=window_s,
                           bucket_s=7).to_pandas()
    us = np.array(tss, dtype=np.int64) * 1000
    bounds = np.concatenate([
        np.stack([us, np.ones(len(us), np.int64)], axis=1),
        np.stack([us + w_us, -np.ones(len(us), np.int64)],
                 axis=1)])
    order = np.lexsort((bounds[:, 1], bounds[:, 0]))
    run = np.cumsum(bounds[order, 1])
    assert int(got.peak[0]) == int(run.max())


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500),
                min_size=1, max_size=50),
       st.integers(min_value=1, max_value=16))
def test_kmv_bottom_k_is_exact_set_function(ray_session, ids, k):
    """The bottom-k sample equals the brute bottom-k of md5 hashes
    regardless of batching; quantiles select from that set."""
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    from pdf2dom_ray.functions.kmv import kmv_quantiles
    ids = list(dict.fromkeys(ids))          # unique event ids
    t = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([0] * len(ids), pa.timestamp("us")),
        "user_id": pa.array([0] * len(ids), pa.int64()),
        "event_type": pa.array(["click"] * len(ids)),
        "value": pa.array([float(i % 97) for i in ids])})
    d = tempfile.mkdtemp(prefix="kmv_prop_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = kmv_quantiles(d, k=k).to_pandas()
    hs = sorted((hashlib.md5(str(i).encode()).hexdigest(), i)
                for i in ids)[:k]
    sample = np.sort(np.array(
        [int(np.floor((i % 97) * 100.0)) for _, i in hs],
        dtype=np.int64))
    n = len(sample)
    for p in (25, 50, 75, 90):
        idx = max((p * n + 99) // 100, 1)
        assert int(got.loc[got.pct == p, "value_cents"].iloc[0]) \
            == int(sample[idx - 1])


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),
                          st.integers(0, 10**5)),
                min_size=1, max_size=40))
def test_interval_coverage_brute(ray_session, pairs):
    """Union length equals the brute interval-merge sweep."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from pdf2dom_ray.functions.temporal import interval_coverage
    w_us = 60 * 1_000_000
    t = pa.table({
        "event_id": pa.array(range(len(pairs)), pa.int64()),
        "ts": pa.array(np.array([p[1] for p in pairs],
                                dtype="int64") * 1000,
                       pa.timestamp("us")),
        "user_id": pa.array([p[0] for p in pairs], pa.int64()),
        "event_type": pa.array(["click"] * len(pairs)),
        "value": pa.array([1.0] * len(pairs))})
    d = tempfile.mkdtemp(prefix="cov_prop_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = interval_coverage(d, window_s=60).to_pandas() \
        .set_index("user_id")
    by_user: dict = {}
    for u, ts in pairs:
        by_user.setdefault(u, []).append(ts * 1000)
    for u, tss in by_user.items():
        ivs = sorted((s, s + w_us) for s in tss)
        total = 0
        n_iv = 0
        cur_s, cur_e = None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total += cur_e - cur_s
                cur_s, cur_e = s, e
                n_iv += 1
            else:
                cur_e = max(cur_e, e)
        total += cur_e - cur_s
        assert int(got.loc[u, "covered_us"]) == total
        assert int(got.loc[u, "n_intervals"]) == n_iv
