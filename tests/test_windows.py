

def test_hopping_distinct_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.functions.windows import (hopping_distinct_sql,
                                               hopping_distinct_users)
    got = hopping_distinct_users(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(hopping_distinct_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0


def test_hopping_distinct_bounded_by_volume(ray_session, sf_dir):
    from pdf2dom_ray.functions.windows import (hopping_distinct_users,
                                               hopping_window_volume)
    d = hopping_distinct_users(sf_dir).to_pandas()
    v = hopping_window_volume(sf_dir).to_pandas()
    m = d.merge(v, on="window_start")
    assert len(m) == len(d) == len(v)
    # distinct users never exceed raw event count per window
    assert (m.n_users <= m.n).all()


def test_hopping_distinct_partition_invariance(ray_session, sf_dir):
    from pdf2dom_ray.functions.windows import hopping_distinct_users
    a = hopping_distinct_users(sf_dir, num_partitions=2).to_pandas()
    b = hopping_distinct_users(sf_dir, num_partitions=5).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
