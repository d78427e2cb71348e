"""HRW rendezvous sharding: minimal-disruption property + oracle."""

import duckdb
import pandas as pd
import pytest


def _assign(ray_session, df, shards):
    import ray.data as rd
    from pdf2dom_ray.functions.rendezvous import rendezvous_assign
    return {r["url"]: r["shard"]
            for r in rendezvous_assign(rd.from_pandas(df),
                                       shards).take_all()}


def test_rendezvous_minimal_disruption(ray_session):
    df = pd.DataFrame({"url": [f"u{i}" for i in range(60)]})
    full = _assign(ray_session, df, ["s0", "s1", "s2", "s3"])
    # reasonably balanced
    counts = pd.Series(list(full.values())).value_counts()
    assert len(counts) == 4 and counts.min() >= 3
    # drop s2: ONLY s2's keys move (the HRW property)
    reduced = _assign(ray_session, df, ["s0", "s1", "s3"])
    for k, s in full.items():
        if s != "s2":
            assert reduced[k] == s
        else:
            assert reduced[k] in ("s0", "s1", "s3")


def test_rendezvous_matches_oracle(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.rendezvous import (rendezvous_assign,
                                                  rendezvous_oracle_sql)
    df = pd.DataFrame({"url": [f"k{i}" for i in range(25)]})
    got = {(r["url"], r["shard"], r["weight_hex"])
           for r in rendezvous_assign(
               rd.from_pandas(df), ["a", "b", "c"]).take_all()}
    con = duckdb.connect()
    con.register("t", df)
    sql = rendezvous_oracle_sql(["a", "b", "c"], table="t",
                                key_expr="url")
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_rendezvous_requires_shards(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.rendezvous import rendezvous_assign
    with pytest.raises(ValueError):
        rendezvous_assign(rd.from_items([{"url": "x"}], override_num_blocks=4), [])
