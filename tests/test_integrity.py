"""FK orphan audit: planted orphans, both membership paths, DuckDB
oracle over the driver tables."""

import pyarrow as pa
import pytest


def _dsets():
    import ray.data as rd
    child = rd.from_items(
        [{"fk": k} for k in [1, 2, 2, 3, 99, 99, 100]], override_num_blocks=4)   # 3 orphans
    parent = rd.from_items([{"pk": k} for k in [1, 2, 3, 4]], override_num_blocks=4)
    return child, parent


@pytest.mark.parametrize("limit", [50_000_000, 0])
def test_orphans_planted_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.integrity import fk_orphans
    child, parent = _dsets()
    got = fk_orphans([("c->p", child, "fk", parent, "pk")],
                     broadcast_limit=limit).take_all()
    assert got == [{"relationship": "c->p", "n_child": 7,
                    "n_orphans": 3}]


def test_orphans_clean_and_empty_parent(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.integrity import fk_orphans
    child = rd.from_items([{"fk": 1}, {"fk": 2}], override_num_blocks=4)
    parent = rd.from_items([{"pk": 1}, {"pk": 2}, {"pk": 3}], override_num_blocks=4)
    empty = rd.from_arrow(pa.table({"pk": pa.array([], pa.int64())}))
    got = fk_orphans([
        ("clean", child, "fk", parent, "pk"),
        ("all_orphan", child, "fk", empty, "pk")]).take_all()
    by = {r["relationship"]: (r["n_child"], r["n_orphans"])
          for r in got}
    assert by == {"clean": (2, 0), "all_orphan": (2, 2)}


def test_orphans_oracle_sql_matches(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.integrity import (fk_orphans,
                                                 fk_orphans_oracle_sql)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    got = sorted((r["relationship"], r["n_child"], r["n_orphans"])
                 for r in fk_orphans(
                     [("li->o", li, "l_orderkey", orders,
                       "o_orderkey")]).take_all())
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = sorted(map(tuple, con.sql(fk_orphans_oracle_sql(
        [("li->o", "lineitem", "l_orderkey", "orders",
          "o_orderkey")])).fetchall()))
    assert got == want
