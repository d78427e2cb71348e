"""Attack-tolerance curve: hand star graph, hub tie-break, oracle
replay, partition invariance."""

import pyarrow as pa


def _edges(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in rows], pa.string()),
        "target": pa.array([b for _, b in rows], pa.string())}))


def _run(rows, **kw):
    from pdf2dom_ray.functions.robustness import robustness_curve
    out = robustness_curve(_edges(rows), **kw).to_pandas()
    return {int(r.k_removed): (int(r.n_nodes), int(r.giant),
                               int(r.frac_ppm))
            for r in out.itertuples()}


def test_star_collapses_under_hub_removal(ray_session):
    # hub h connected to 5 leaves + a disjoint edge x-y
    rows = [("h", f"l{i}") for i in range(5)] + [("x", "y")]
    got = _run(rows, ks=(0, 1))
    assert got[0] == (8, 6, 750_000)      # giant = star of 6
    # removing the hub isolates the leaves: only x-y survives
    assert got[1] == (2, 2, 1_000_000)


def test_hub_tiebreak_lowest_id(ray_session):
    # two degree-2 hubs "a" and "b": removal order must pick "a"
    rows = [("a", "p"), ("a", "q"), ("b", "r"), ("b", "s")]
    got = _run(rows, ks=(1,))
    # "a" removed -> its component gone, b's star of 3 remains
    assert got[1] == (3, 3, 1_000_000)


def test_matches_oracle(ray_session):
    import duckdb
    from pdf2dom_ray.functions.robustness import robustness_oracle_sql
    rows = ([(f"n{i}", f"n{(2 * i + 1) % 19}") for i in range(19)]
            + [("n3", "n3"), ("n1", "n0")])       # self-loop + dup
    got = sorted(_run(rows).items())
    vals = " UNION ALL ".join(
        f"SELECT '{a}' AS src, '{b}' AS target" for a, b in rows)
    want = sorted(
        (int(r[0]), (int(r[1]), int(r[2]), int(r[3])))
        for r in duckdb.sql(robustness_oracle_sql(vals)).fetchall())
    assert got == want


def test_partition_invariance(ray_session):
    rows = [(f"u{i}", f"u{(3 * i + 7) % 37}") for i in range(37)]
    a = _run(rows)
    import ray.data as rd
    from pdf2dom_ray.functions.robustness import robustness_curve
    out = robustness_curve(_edges(rows).repartition(9)).to_pandas()
    b = {int(r.k_removed): (int(r.n_nodes), int(r.giant),
                            int(r.frac_ppm)) for r in out.itertuples()}
    assert a == b
