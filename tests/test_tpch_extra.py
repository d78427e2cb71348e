"""TPC-H Q2/Q11/Q16/Q20 over the deterministic synthetic partsupp
(pipelines/tpch.py): slot-construction invariants plus DuckDB-oracle
equality — with these four the repo covers all 22 TPC-H queries."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf2dom_ray.pipelines.tpch import (
    PS_SLOTS, _partsupp_arrays, partsupp_cte, q2_min_cost_supplier,
    q2_oracle_sql, q11_important_stock, q11_oracle_sql,
    q16_oracle_sql, q16_parts_supplier_relationship, q20_oracle_sql,
    q20_potential_promotion)

TABLES = ("region nation customer supplier part orders "
          "lineitem").split()


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _cmp(got, want):
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_partsupp_slots_distinct_and_sql_identical(sf_dir):
    # the synth rule must give each part PS_SLOTS distinct suppliers
    # (guaranteed for n_supp > 51) and the SQL CTE must replay the
    # integer arithmetic bit-for-bit
    keys = np.arange(2000, dtype=np.int64)
    pk, supp, qty, cost = _partsupp_arrays(keys, 100)
    assert len(pk) == len(keys) * PS_SLOTS
    for s in supp.reshape(-1, PS_SLOTS):
        assert len(set(s.tolist())) == PS_SLOTS
    assert qty.min() >= 1 and qty.max() <= 1000
    assert cost.min() >= 10000 and cost.max() <= 100000

    con = _con(sf_dir)
    sql = con.execute(
        "SELECT * FROM (" + partsupp_cte()
        + ") ORDER BY ps_partkey, ps_suppkey").df()
    ours = pd.DataFrame({
        "ps_partkey": pk, "ps_suppkey": supp,
        "ps_availqty": qty, "ps_supplycost_cents": cost})
    import pyarrow.parquet as pq
    n = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    ns = pq.ParquetFile(f"{sf_dir}/supplier.parquet") \
        .metadata.num_rows
    pk2, s2, q2, c2 = _partsupp_arrays(
        pq.read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey"])
        .column("p_partkey").to_numpy(), ns)
    ours = pd.DataFrame({"ps_partkey": pk2, "ps_suppkey": s2,
                         "ps_availqty": q2,
                         "ps_supplycost_cents": c2}) \
        .sort_values(["ps_partkey", "ps_suppkey"]) \
        .reset_index(drop=True)
    assert len(sql) == n * PS_SLOTS
    pd.testing.assert_frame_equal(ours, sql.reset_index(drop=True),
                                  check_dtype=False)


def test_q2_matches_duckdb(ray_session, sf_dir):
    got = q2_min_cost_supplier(sf_dir).to_pandas()
    want = _con(sf_dir).execute(q2_oracle_sql()).df()
    assert len(got) > 0
    _cmp(got, want)


def test_q11_matches_duckdb(ray_session, sf_dir):
    # sf0.001 has 10 suppliers and none in the default NATION_7 —
    # NATION_3 is populated at every scale
    got = q11_important_stock(sf_dir, nation="NATION_3").to_pandas()
    want = _con(sf_dir).execute(
        q11_oracle_sql(nation="NATION_3")).df()
    assert len(got) > 0
    _cmp(got, want)


def test_q16_matches_duckdb(ray_session, sf_dir):
    got = q16_parts_supplier_relationship(sf_dir).to_pandas()
    want = _con(sf_dir).execute(q16_oracle_sql()).df()
    assert len(got) > 0
    _cmp(got, want)


def test_q20_matches_duckdb(ray_session, sf_dir):
    got = q20_potential_promotion(sf_dir).to_pandas()
    want = _con(sf_dir).execute(q20_oracle_sql()).df()
    _cmp(got, want)
