"""Market-basket lift: hand case, attract/repel directions, basket
cap, DuckDB oracle."""

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def test_basket_hand_case(ray_session):
    from pdf2dom_ray.functions.basket import basket_lift
    rows = [{"user_id": u, "event_type": t}
            for u, ts in ((1, "ab"), (2, "ab"), (3, "ac"), (4, "c"))
            for t in ts]
    got = {(r["item_a"], r["item_b"]):
           (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"],
            r["lift_ppm"])
           for r in basket_lift(_ds(rows)).take_all()}
    # a&b co-occur 2/2 of a-baskets: lift = (2·4)/(3·2) = 4/3
    assert got[("a", "b")] == (2, 3, 2, 4, 1_333_333)
    assert got[("a", "c")] == (1, 3, 2, 4, 666_666)
    assert ("b", "c") not in got             # never co-occur


def test_basket_cap_drops_whole_basket(ray_session):
    from pdf2dom_ray.functions.basket import basket_lift
    rows = ([{"user_id": 1, "event_type": t} for t in "abcde"]
            + [{"user_id": 2, "event_type": t} for t in "ab"])
    got = basket_lift(_ds(rows), basket_cap=3).take_all()
    # user 1's 5-item basket dropped whole; only user 2 remains
    assert {(r["item_a"], r["item_b"]) for r in got} == {("a", "b")}
    assert got[0]["n_baskets"] == 1


def test_basket_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.basket import (basket_lift,
                                              basket_oracle_sql)
    rng = np.random.RandomState(239)
    types = ["view", "click", "buy", "share"]
    rows = []
    for u in range(50):
        for t in rng.choice(4, size=rng.randint(1, 5),
                            replace=False):
            rows.append({"user_id": int(u), "event_type": types[t]})
    got = sorted(tuple(r[c] for c in
                       ("item_a", "item_b", "n_ab", "n_a", "n_b",
                        "n_baskets", "lift_ppm"))
                 for r in basket_lift(_ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT {r['user_id']} AS user_id, "
        f"'{r['event_type']}' AS event_type" for r in rows)
    want = sorted(map(tuple, duckdb.sql(basket_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_basket_partition_invariance(ray_session):
    """The fused single-exchange arm (pair counts + item totals +
    basket counts all emitted partition-locally) must not depend on
    how input rows are blocked: 1 block vs 16 shuffled blocks."""
    from pdf2dom_ray.functions.basket import basket_lift
    rng = np.random.RandomState(71)
    types = [f"t{i}" for i in range(7)]
    rows = []
    for u in range(120):
        for t in rng.choice(7, size=rng.randint(1, 6),
                            replace=False):
            rows.append({"user_id": int(u), "event_type": types[t]})

    def run(ds):
        return sorted(
            tuple(r[c] for c in ("item_a", "item_b", "n_ab", "n_a",
                                 "n_b", "n_baskets", "lift_ppm"))
            for r in basket_lift(ds, basket_cap=4).take_all())

    one = run(_ds(rows).repartition(1))
    rng.shuffle(rows)
    many = run(_ds(rows).repartition(16))
    assert one == many and len(one) > 0


def test_basket_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.basket import basket_lift
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string())}))
    assert basket_lift(ds).take_all() == []
