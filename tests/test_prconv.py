"""PageRank convergence curve: monotone-ish decay, driver/BSP
identity, unrolled oracle."""

import numpy as np
import pyarrow as pa


def _ds(pairs, nb=3):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in pairs],
                         override_num_blocks=nb)


PAIRS = [(f"n{i}", f"n{(2 * i + 1) % 17}") for i in range(17)] \
    + [("n3", "n3"), ("n0", "n1"), ("n0", "n1")]     # loop + dups


def test_driver_and_bsp_identical(ray_session):
    from pdf2dom_ray.functions.pagerank import pagerank_convergence
    drv = pagerank_convergence(_ds(PAIRS), iterations=3).to_pandas()
    bsp = pagerank_convergence(_ds(PAIRS), iterations=3,
                               driver_edge_limit=0).to_pandas()
    assert drv.astype("int64").equals(bsp.astype("int64"))
    assert list(drv["iteration"]) == [1, 2, 3]
    assert (drv["l1_delta"] > 0).all()


def test_converged_graph_reaches_zero_delta(ray_session):
    from pdf2dom_ray.functions.pagerank import pagerank_convergence
    # 2-cycle: symmetric ranks converge immediately after round 1
    out = pagerank_convergence(_ds([("a", "b"), ("b", "a")]),
                               iterations=4).to_pandas()
    assert int(out["l1_delta"].iloc[-1]) == 0


def test_matches_oracle(ray_session):
    import duckdb
    from pdf2dom_ray.functions.pagerank import (
        pagerank_convergence, pagerank_convergence_oracle_sql)
    got = pagerank_convergence(_ds(PAIRS), iterations=4).to_pandas() \
        .sort_values("iteration").reset_index(drop=True)
    vals = " UNION ALL ".join(
        f"SELECT '{u}' AS src, '{v}' AS target" for u, v in PAIRS)
    want = duckdb.sql(
        pagerank_convergence_oracle_sql(vals, iterations=4)).df() \
        .sort_values("iteration").reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))
