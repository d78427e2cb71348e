"""Directed triad census: hand triads, class-size LUT sanity, totals,
brute-SQL oracle, partition invariance."""

import numpy as np
import pyarrow as pa


def _ds(pairs, nb=3):
    import ray.data as rd
    return rd.from_items([{"src": a, "target": b} for a, b in pairs],
                         override_num_blocks=nb)


def _run(pairs, nb=3):
    from pdf2dom_ray.functions.triadcensus import triad_census
    out = triad_census(_ds(pairs, nb)).to_pandas()
    return dict(zip(out.triad_type, (int(x) for x in out.n_triples)))


def test_lut_class_sizes():
    """The 64 codes must split into the published isomorphism-class
    multiplicities — an independent check of the classification."""
    from collections import Counter

    from pdf2dom_ray.functions.triadcensus import TRIAD_LUT
    assert Counter(TRIAD_LUT) == {
        "003": 1, "012": 6, "102": 3, "021D": 3, "021U": 3,
        "021C": 6, "111D": 6, "111U": 6, "030T": 6, "030C": 2,
        "201": 3, "120D": 3, "120U": 3, "120C": 6, "210": 6,
        "300": 1}


def test_hand_triads(ray_session):
    assert _run([(0, 1), (0, 2), (1, 2)])["030T"] == 1
    assert _run([(0, 1), (1, 2), (2, 0)])["030C"] == 1
    g = _run([(0, 1), (1, 0), (2, 0), (2, 1)])     # 0<->1, 2->both
    assert g["120D"] == 1
    g = _run([(0, 1), (1, 0), (0, 2), (1, 2)])     # 0<->1 -> 2
    assert g["120U"] == 1
    g = _run([(0, 1), (1, 0), (2, 3), (3, 2), (0, 2), (1, 3)])
    assert sum(g.values()) == 4                    # C(4,3)


def test_closed_form_classes(ray_session):
    # 0<->1 plus 2->3: dups + a self-loop must be ignored
    g = _run([(0, 1), (1, 0), (2, 3), (2, 3), (1, 1)])
    assert g["102"] == 2 and g["012"] == 2 and g["003"] == 0
    assert sum(g.values()) == 4


def test_matches_brute_oracle_and_invariance(ray_session):
    import duckdb

    from pdf2dom_ray.functions.triadcensus import \
        triad_census_oracle_sql
    rng = np.random.RandomState(11)
    pairs = list({(int(a), int(b))
                  for a, b in rng.randint(0, 20, size=(90, 2))
                  if a != b})
    got = _run(pairs, nb=2)
    got2 = _run(list(reversed(pairs)), nb=9)
    assert got == got2                             # partitioning
    vals = " UNION ALL ".join(
        f"SELECT {a} AS src, {b} AS target" for a, b in pairs)
    want = {t: int(v) for t, v in duckdb.sql(
        triad_census_oracle_sql(vals)).fetchall()}
    assert got == want
    n = len({x for p in pairs for x in p})
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
