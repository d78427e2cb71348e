"""TPC-H Q3 pipeline: broadcast vs semi-join path equality and
DuckDB ground truth (integer-cents revenue is bit-exact).
"""

import duckdb


def _duck(sf_dir, segment="BUILDING", cutoff="1998-06-01"):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM customer, orders, lineitem
        WHERE c_mktsegment = '{segment}' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '{cutoff}'
          AND l_shipdate > TIMESTAMP '{cutoff}'
        GROUP BY 1, 2, 3 ORDER BY revenue_cents DESC, o_orderkey
        LIMIT 10""").fetchdf()


def _rows(df):
    return [(int(r.o_orderkey), str(r.o_orderdate),
             r.o_orderpriority, int(r.revenue_cents))
            for r in df.itertuples()]


def test_q3_broadcast_path_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q3_top_unshipped
    got = q3_top_unshipped(sf_dir).to_pandas()
    assert _rows(got) == _rows(_duck(sf_dir))


def test_q3_semi_join_path_identical(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q3_top_unshipped
    a = q3_top_unshipped(sf_dir, segment="MACHINERY").to_pandas()
    b = q3_top_unshipped(sf_dir, segment="MACHINERY",
                         broadcast_limit=0).to_pandas()
    assert _rows(a) == _rows(b) == \
        _rows(_duck(sf_dir, segment="MACHINERY"))


def _duck_q5(sf_dir, region="ASIA"):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier",
              "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(f"""
        SELECT n_name,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = '{region}'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
        GROUP BY n_name ORDER BY n_name""").fetchdf()


def _q5_rows(df):
    return sorted((r.n_name, int(r.revenue_cents))
                  for r in df.itertuples())


def test_q5_broadcast_path_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q5_local_supplier_volume
    got = q5_local_supplier_volume(sf_dir).to_pandas()
    assert _q5_rows(got) == _q5_rows(_duck_q5(sf_dir))
    assert len(got) > 0


def test_q5_join_path_identical(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q5_local_supplier_volume
    a = q5_local_supplier_volume(sf_dir, region="EUROPE").to_pandas()
    b = q5_local_supplier_volume(sf_dir, region="EUROPE",
                                 broadcast_limit=0).to_pandas()
    assert _q5_rows(a) == _q5_rows(b) == \
        _q5_rows(_duck_q5(sf_dir, region="EUROPE"))


def _duck_q13(sf_dir, exclude="5-LOW"):
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(f"""
        WITH per_cust AS (
          SELECT c.c_custkey, count(o.o_custkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '{exclude}'
          GROUP BY c.c_custkey)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count""").fetchdf()


def _q13_rows(df):
    return sorted((int(r.c_count), int(r.custdist))
                  for r in df.itertuples())


def test_q13_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q13_customer_distribution
    got = q13_customer_distribution(sf_dir).to_pandas()
    want = _duck_q13(sf_dir)
    assert _q13_rows(got) == _q13_rows(want)
    # histogram mass covers every customer
    assert got["custdist"].sum() == want["custdist"].sum() > 0
    # the explicit LEFT OUTER join path (no referential-integrity
    # assumption) lands on the identical histogram
    join_path = q13_customer_distribution(
        sf_dir, assume_referential_integrity=False).to_pandas()
    assert _q13_rows(join_path) == _q13_rows(want)


def test_q13_all_orders_excluded_collapses_to_zero_bucket(
        ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q13_customer_distribution
    got = q13_customer_distribution(
        sf_dir, exclude_priority="__no_such_priority__").to_pandas()
    # nothing excluded → no zero bucket unless a customer has no orders
    want = _duck_q13(sf_dir, exclude="__no_such_priority__")
    assert _q13_rows(got) == _q13_rows(want)


def _duck_q10(sf_dir, lo="1996-01-01", hi="1996-04-01"):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '{lo}'
          AND o_orderdate <  TIMESTAMP '{hi}'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY 1, 2, 3
        ORDER BY revenue_cents DESC, c_custkey LIMIT 20""").fetchdf()


def _q10_rows(df):
    return [(int(r.c_custkey), str(r.c_name), str(r.n_name),
             int(r.revenue_cents)) for r in df.itertuples()]


def test_q10_broadcast_path_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q10_returned_items
    got = q10_returned_items(sf_dir).to_pandas()
    assert _q10_rows(got) == _q10_rows(_duck_q10(sf_dir))


def test_q10_join_path_identical(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q10_returned_items
    a = q10_returned_items(sf_dir, broadcast_limit=0).to_pandas()
    assert _q10_rows(a) == _q10_rows(_duck_q10(sf_dir))


def _duck_q12(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute("""
        SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 120 DAY
                    THEN 'late' ELSE 'very_late' END AS delay_bucket,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                   THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                   THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY 1 ORDER BY 1""").fetchdf()


def _q12_rows(df):
    return [(str(r.delay_bucket), int(r.high_line_count),
             int(r.low_line_count))
            for r in df.sort_values("delay_bucket").itertuples()]


def test_q12_broadcast_path_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q12_late_shipments
    got = q12_late_shipments(sf_dir).to_pandas()
    assert _q12_rows(got) == _q12_rows(_duck_q12(sf_dir))


def test_q12_join_path_identical(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q12_late_shipments
    got = q12_late_shipments(sf_dir, broadcast_limit=0).to_pandas()
    assert _q12_rows(got) == _q12_rows(_duck_q12(sf_dir))


def test_empty_broadcast_sides_yield_empty_results(ray_session, sf_dir):
    """A segment/region matching nothing must yield 0 rows, not an
    IndexError from the empty broadcast probe arrays."""
    from pdf2dom_ray.pipelines.tpch import (q3_top_unshipped,
                                            q5_local_supplier_volume,
                                            q10_returned_items,
                                            q12_late_shipments)
    assert q3_top_unshipped(sf_dir, segment="__NOPE__") \
        .to_pandas().empty
    assert q5_local_supplier_volume(sf_dir, region="__NOPE__") \
        .to_pandas().empty
    assert q10_returned_items(sf_dir, date_lo="2990-01-01",
                              date_hi="2991-01-01").to_pandas().empty
    assert q12_late_shipments(sf_dir, late_days=100_000) \
        .to_pandas().empty


def test_q6_matches_duckdb(ray_session, sf_dir):
    import duckdb
    from pdf2dom_ray.pipelines.tpch import q6_forecast_revenue
    got = q6_forecast_revenue(sf_dir).to_pandas()
    want = duckdb.sql(f"""
        SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM '{sf_dir}/lineitem.parquet'
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""").df()
    assert int(got["revenue_cents"][0] or 0) == \
        int(want["revenue_cents"][0] or 0)
    assert int(got["n_lines"][0]) == int(want["n_lines"][0])


def test_q6_empty_filter_window(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q6_forecast_revenue
    got = q6_forecast_revenue(sf_dir, year=2990).to_pandas()
    assert int(got["revenue_cents"][0]) == 0
    assert int(got["n_lines"][0]) == 0


def _duck_q18(sf_dir, min_qty=250, limit=100):
    import duckdb
    return duckdb.sql(f"""
        WITH qual AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty
          FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
          HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {min_qty})
        SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
               CAST(round(o_totalprice*100) AS BIGINT)
                 AS totalprice_cents,
               qual.sum_qty
        FROM qual
        JOIN '{sf_dir}/orders.parquet' ON o_orderkey = qual.l_orderkey
        JOIN '{sf_dir}/customer.parquet' ON c_custkey = o_custkey
        ORDER BY totalprice_cents DESC, o_orderdate, o_orderkey
        LIMIT {limit}""").df()


def _q18_rows(df):
    return [tuple(str(v) for v in r)
            for r in df.sort_values(
                ["totalprice_cents", "o_orderdate", "o_orderkey"],
                ascending=[False, True, True]).itertuples(index=False)]


def test_q18_broadcast_path_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q18_large_volume_customers
    got = q18_large_volume_customers(sf_dir).to_pandas()
    assert len(got) > 0
    assert _q18_rows(got) == _q18_rows(_duck_q18(sf_dir))


def test_q18_join_path_identical(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q18_large_volume_customers
    got = q18_large_volume_customers(sf_dir,
                                     broadcast_limit=0).to_pandas()
    assert _q18_rows(got) == _q18_rows(_duck_q18(sf_dir))


def test_q18_no_qualifying_orders_is_empty(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q18_large_volume_customers
    got = q18_large_volume_customers(sf_dir,
                                     min_qty=10_000_000).to_pandas()
    assert got.empty


def test_q18_small_limit(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q18_large_volume_customers
    got = q18_large_volume_customers(sf_dir, limit=3).to_pandas()
    assert len(got) == 3
    assert _q18_rows(got) == _q18_rows(_duck_q18(sf_dir, limit=3))


def _duck_q1(sf_dir, ship_before="1998-09-02"):
    import duckdb
    return duckdb.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS base_price_cents,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT))
                    AS BIGINT) AS disc_price_cents,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100) AS BIGINT))
                    AS BIGINT) AS charge_cents,
               CAST(SUM(CAST(round(l_discount * 100) AS BIGINT))
                    AS BIGINT) AS sum_disc_centi,
               CAST(count(*) AS BIGINT) AS count_order
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        WHERE l_shipdate <= TIMESTAMP '{ship_before}'
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchdf()


def _q1_rows(df):
    df = df.sort_values(["l_returnflag", "l_linestatus"])
    return [tuple(r) for r in df[[
        "l_returnflag", "l_linestatus", "sum_qty", "base_price_cents",
        "disc_price_cents", "charge_cents", "sum_disc_centi",
        "count_order"]].itertuples(index=False)]


def test_q1_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q1_pricing_summary
    got = q1_pricing_summary(sf_dir).to_pandas()
    assert _q1_rows(got) == _q1_rows(_duck_q1(sf_dir))


def test_q1_empty_window(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q1_pricing_summary
    assert q1_pricing_summary(sf_dir, ship_before="1901-01-01") \
        .to_pandas().empty


def _duck_q4(sf_dir, late_days=60):
    import duckdb
    return duckdb.sql(f"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM read_parquet('{sf_dir}/orders.parquet')
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM
                      read_parquet('{sf_dir}/lineitem.parquet')
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate
                                         + INTERVAL {late_days} DAY)
        GROUP BY 1 ORDER BY 1""").fetchdf()


def _q4_rows(df):
    df = df.sort_values("o_orderpriority")
    return [(r.o_orderpriority, int(r.order_count))
            for r in df.itertuples()]


def test_q4_broadcast_path_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q4_order_priority_check
    got = q4_order_priority_check(sf_dir).to_pandas()
    assert _q4_rows(got) == _q4_rows(_duck_q4(sf_dir))


def test_q4_join_path_identical(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q4_order_priority_check
    got = q4_order_priority_check(sf_dir, broadcast_limit=0) \
        .to_pandas()
    assert _q4_rows(got) == _q4_rows(_duck_q4(sf_dir))


def test_q4_no_late_orders(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q4_order_priority_check
    assert q4_order_priority_check(sf_dir, late_days=100_000) \
        .to_pandas().empty


def test_q14_matches_duckdb(ray_session, sf_dir):
    import duckdb
    from pdf2dom_ray.pipelines.tpch import q14_promo_revenue
    got = q14_promo_revenue(sf_dir).to_pandas()
    want = duckdb.sql(f"""
        WITH s AS (
          SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(floor(l_extendedprice
                                          * (1 - l_discount) * 100)
                                    AS BIGINT) ELSE 0 END) AS BIGINT)
                     AS promo_cents,
                 CAST(SUM(CAST(floor(l_extendedprice
                                     * (1 - l_discount) * 100)
                               AS BIGINT)) AS BIGINT) AS total_cents
          FROM read_parquet('{sf_dir}/lineitem.parquet') li
          JOIN read_parquet('{sf_dir}/part.parquet') pt
            ON pt.p_partkey = li.l_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-07-01'
            AND l_shipdate < TIMESTAMP '1996-08-01')
        SELECT promo_cents, total_cents,
               (1000000 * promo_cents) // total_cents AS promo_ppm
        FROM s""").fetchdf()
    assert int(got.promo_cents[0]) == int(want.promo_cents[0])
    assert int(got.total_cents[0]) == int(want.total_cents[0])
    assert int(got.promo_ppm[0]) == int(want.promo_ppm[0])
    assert 0 < int(got.promo_ppm[0]) < 1_000_000


def test_q14_empty_month(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q14_promo_revenue
    got = q14_promo_revenue(sf_dir, year=2990).to_pandas()
    assert int(got.promo_cents[0]) == 0
    assert int(got.promo_ppm[0]) == 0


def test_q19_matches_duckdb(ray_session, sf_dir):
    import duckdb
    from pdf2dom_ray.pipelines.tpch import q19_disjunctive_revenue
    got = q19_disjunctive_revenue(sf_dir).to_pandas()
    want = duckdb.sql(f"""
        SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice
                     * (1 - l_discount) * 100) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM read_parquet('{sf_dir}/lineitem.parquet') li
        JOIN read_parquet('{sf_dir}/part.parquet') pt
          ON pt.p_partkey = li.l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)""").fetchdf()
    assert int(got.revenue_cents[0]) == int(want.revenue_cents[0])
    assert int(got.n_lines[0]) == int(want.n_lines[0])
    assert int(got.n_lines[0]) > 0


def test_q19_absent_brand_clause_is_empty_set(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q19_disjunctive_revenue
    got = q19_disjunctive_revenue(
        sf_dir, clauses=(("Brand#99", 1, 50, 1, 50),)).to_pandas()
    assert int(got.revenue_cents[0]) == 0
    assert int(got.n_lines[0]) == 0


def _duck_q7(sf_dir, a="NATION_1", b="NATION_2"):
    import duckdb
    return duckdb.sql(f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT) AS cents
          FROM read_parquet('{sf_dir}/supplier.parquet') s
          JOIN read_parquet('{sf_dir}/lineitem.parquet') l
            ON s_suppkey = l_suppkey
          JOIN read_parquet('{sf_dir}/orders.parquet') o
            ON o_orderkey = l_orderkey
          JOIN read_parquet('{sf_dir}/customer.parquet') c
            ON c_custkey = o_custkey
          JOIN read_parquet('{sf_dir}/nation.parquet') n1
            ON s_nationkey = n1.n_nationkey
          JOIN read_parquet('{sf_dir}/nation.parquet') n2
            ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name='{a}' AND n2.n_name='{b}')
              OR (n1.n_name='{b}' AND n2.n_name='{a}'))
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01')
        GROUP BY 1,2,3 ORDER BY 1,2,3""").fetchdf()


def test_q7_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q7_volume_shipping
    # NATION_13 <-> NATION_19 is the busiest pair at sf0.001 (the
    # sf0.01 driver oracle exercises the NATION_1/2 default)
    got = q7_volume_shipping(sf_dir, nation_a="NATION_13",
                             nation_b="NATION_19").to_pandas()
    want = _duck_q7(sf_dir, a="NATION_13", b="NATION_19")
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.revenue_cents > 0).all()


def test_q7_join_fallback_matches_broadcast(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q7_volume_shipping
    got = q7_volume_shipping(sf_dir, nation_a="NATION_13",
                             nation_b="NATION_19",
                             broadcast_limit=0).to_pandas()
    want = _duck_q7(sf_dir, a="NATION_13", b="NATION_19")
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_q7_same_nation_is_empty(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q7_volume_shipping
    got = q7_volume_shipping(sf_dir, nation_a="NATION_3",
                             nation_b="NATION_3").to_pandas()
    # opposite-side filter kills every pair when both sides are the
    # same nation
    assert got.empty


def test_q7_empty_window(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q7_volume_shipping
    got = q7_volume_shipping(sf_dir, date_lo="2990-01-01",
                             date_hi="2991-01-01").to_pandas()
    assert got.empty


def _duck_q8(sf_dir, nationkey=6, regionkey=1, p_type="STANDARD"):
    import duckdb
    return duckdb.sql(f"""
        WITH base AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(floor(l_extendedprice*(1-l_discount)*100)
                      AS BIGINT) AS cents,
                 CASE WHEN s_nationkey = {nationkey} THEN 1 ELSE 0
                     END AS is_tgt
          FROM read_parquet('{sf_dir}/lineitem.parquet') l
          JOIN read_parquet('{sf_dir}/part.parquet') p
            ON p_partkey = l_partkey AND p_type = '{p_type}'
          JOIN read_parquet('{sf_dir}/supplier.parquet') s
            ON s_suppkey = l_suppkey
          JOIN read_parquet('{sf_dir}/orders.parquet') o
            ON o_orderkey = l_orderkey
          JOIN read_parquet('{sf_dir}/customer.parquet') c
            ON c_custkey = o_custkey
          JOIN read_parquet('{sf_dir}/nation.parquet') n
            ON c_nationkey = n_nationkey
          WHERE n_regionkey = {regionkey}
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01')
        SELECT o_year, CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(cents*is_tgt) AS BIGINT) AS nation_cents,
               CAST((1000000 * SUM(cents*is_tgt)) // SUM(cents)
                    AS BIGINT) AS share_ppm
        FROM base GROUP BY 1 ORDER BY 1""").fetchdf()


def test_q8_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q8_market_share
    # NATION_3 is a supplier nation at sf0.001 (regionkey 3 customers
    # = EUROPE); the sf0.01 driver oracle exercises the defaults
    got = q8_market_share(sf_dir, nation="NATION_3",
                          region="EUROPE").to_pandas()
    want = _duck_q8(sf_dir, nationkey=3, regionkey=3)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.total_cents > 0).all()


def test_q8_join_fallback_matches(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q8_market_share
    got = q8_market_share(sf_dir, nation="NATION_3", region="EUROPE",
                          broadcast_limit=0).to_pandas()
    want = _duck_q8(sf_dir, nationkey=3, regionkey=3)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_q8_empty_window(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q8_market_share
    got = q8_market_share(sf_dir, date_lo="2990-01-01",
                          date_hi="2991-01-01").to_pandas()
    assert got.empty


def test_q15_matches_duckdb(ray_session, sf_dir):
    import duckdb
    from pdf2dom_ray.pipelines.tpch import q15_top_supplier
    got = q15_top_supplier(sf_dir).to_pandas()
    want = duckdb.sql(f"""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)
                                     *100) AS BIGINT)) AS BIGINT)
                     AS total_revenue_cents
          FROM read_parquet('{sf_dir}/lineitem.parquet')
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
               total_revenue_cents
        FROM read_parquet('{sf_dir}/supplier.parquet')
        JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue_cents =
              (SELECT MAX(total_revenue_cents) FROM rev)
        ORDER BY s_suppkey""").fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) >= 1 and (got.total_revenue_cents > 0).all()


def test_q15_empty_window(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q15_top_supplier
    got = q15_top_supplier(sf_dir, date_lo="2990-01-01",
                          date_hi="2991-01-01").to_pandas()
    assert got.empty


def test_q17_matches_duckdb(ray_session, sf_dir):
    import duckdb
    from pdf2dom_ray.pipelines.tpch import q17_small_quantity_revenue
    got = q17_small_quantity_revenue(sf_dir).to_pandas()
    want = duckdb.sql(f"""
        WITH agg AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(round(l_quantity*100) AS BIGINT))
                      AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM read_parquet('{sf_dir}/lineitem.parquet') li
          JOIN read_parquet('{sf_dir}/part.parquet') pt
            ON p_partkey = l_partkey AND p_brand = 'Brand#23'
          GROUP BY 1)
        SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice*100)
                                      AS BIGINT)), 0) // 7
                    AS BIGINT) AS avg_yearly_cents,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN agg ON l.l_partkey = agg.l_partkey
        WHERE 5 * CAST(round(l_quantity*100) AS BIGINT) * c < s
        """).fetchdf()
    assert int(got.avg_yearly_cents[0]) == int(want.avg_yearly_cents[0])
    assert int(got.n_lines[0]) == int(want.n_lines[0])
    assert int(got.n_lines[0]) > 0


def test_q17_absent_brand(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q17_small_quantity_revenue
    got = q17_small_quantity_revenue(sf_dir,
                                     brand="Brand#99").to_pandas()
    assert int(got.avg_yearly_cents[0]) == 0
    assert int(got.n_lines[0]) == 0


def _duck_q21(sf_dir, limit=20):
    import duckdb
    return duckdb.sql(f"""
        WITH pairs AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     AS has_r
          FROM read_parquet('{sf_dir}/lineitem.parquet')
          GROUP BY 1, 2),
        per_order AS (
          SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_r) AS n_r,
                 SUM(l_suppkey * has_r) AS r_supp
          FROM pairs GROUP BY 1),
        culprits AS (
          SELECT r_supp AS s_suppkey
          FROM per_order
          JOIN read_parquet('{sf_dir}/orders.parquet')
            ON o_orderkey = l_orderkey
          WHERE n_supp >= 2 AND n_r = 1 AND o_orderstatus = 'F')
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM culprits
        JOIN read_parquet('{sf_dir}/supplier.parquet')
          USING (s_suppkey)
        GROUP BY 1, 2 ORDER BY numwait DESC, s_name
        LIMIT {limit}""").fetchdf()


def test_q21_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q21_waiting_suppliers
    got = q21_waiting_suppliers(sf_dir).to_pandas()
    want = _duck_q21(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.numwait > 0).all()


def test_q21_join_fallback_matches(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q21_waiting_suppliers
    got = q21_waiting_suppliers(sf_dir, broadcast_limit=0).to_pandas()
    want = _duck_q21(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def _duck_q22(sf_dir, cut):
    import duckdb
    return duckdb.sql(f"""
        WITH cand AS (
          SELECT c_custkey, CAST(c_nationkey AS BIGINT)
                     AS c_nationkey,
                 CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
          FROM read_parquet('{sf_dir}/customer.parquet')
          WHERE c_nationkey IN (1,5,8,12,15,18,21)),
        thr AS (SELECT SUM(bal_cents) s, COUNT(*) n
                FROM cand WHERE bal_cents > 0)
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
        FROM cand, thr
        WHERE bal_cents * n > s
          AND NOT EXISTS (
              SELECT 1 FROM read_parquet('{sf_dir}/orders.parquet') o
              WHERE o.o_custkey = cand.c_custkey
                AND o.o_orderdate >= TIMESTAMP '{cut}')
        GROUP BY 1 ORDER BY 1""").fetchdf()


def test_q22_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q22_sales_opportunity
    # sf0.001 needs a later dormancy cutoff to surface candidates
    # (the sf0.01 driver oracle exercises the 2000-06-01 default)
    got = q22_sales_opportunity(sf_dir,
                                dormant_since="2001-06-01") \
        .to_pandas()
    want = _duck_q22(sf_dir, "2001-06-01")
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.numcust > 0).all()


def test_q22_anti_join_fallback_matches(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q22_sales_opportunity
    got = q22_sales_opportunity(sf_dir, dormant_since="2001-06-01",
                                broadcast_limit=0).to_pandas()
    want = _duck_q22(sf_dir, "2001-06-01")
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_q22_no_dormant_customers(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q22_sales_opportunity
    # cutoff before the order history starts: every customer active
    got = q22_sales_opportunity(sf_dir,
                                dormant_since="1994-01-01") \
        .to_pandas()
    assert got.empty


def _duck_q9(sf_dir, token="bolt", cost_pct=60):
    import duckdb
    return duckdb.sql(f"""
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)
                                   *100) AS BIGINT)
                        - CAST(round(l_quantity) AS BIGINT)
                          * ((CAST(floor(p_retailprice*100)
                                   AS BIGINT) * {cost_pct}) // 100))
                    AS BIGINT) AS profit_cents
        FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN read_parquet('{sf_dir}/part.parquet') p
          ON p_partkey = l_partkey AND p_name LIKE '%{token}%'
        JOIN read_parquet('{sf_dir}/supplier.parquet') s
          ON s_suppkey = l_suppkey
        JOIN read_parquet('{sf_dir}/orders.parquet') o
          ON o_orderkey = l_orderkey
        JOIN read_parquet('{sf_dir}/nation.parquet') n
          ON s_nationkey = n_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchdf()


def test_q9_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q9_product_profit
    got = q9_product_profit(sf_dir).to_pandas()
    want = _duck_q9(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0


def test_q9_join_fallback_matches(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q9_product_profit
    got = q9_product_profit(sf_dir, broadcast_limit=0).to_pandas()
    want = _duck_q9(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_q9_absent_token(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.tpch import q9_product_profit
    got = q9_product_profit(sf_dir, name_token="zzzz").to_pandas()
    assert got.empty


def test_order_fill_time(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    import duckdb
    got = E.queries()["order_fill_time"](sf_dir).to_pandas()
    want = duckdb.sql(f"""
        WITH f AS (
          SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS mx
          FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1),
        j AS (
          SELECT o_orderpriority,
                 (f.mx - epoch_us(o_orderdate)) // 86400000000
                     AS days
          FROM f JOIN read_parquet('{sf_dir}/orders.parquet')
            ON o_orderkey = l_orderkey)
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST((1000000 * SUM(days)) // GREATEST(COUNT(*), 1)
                    AS BIGINT) AS mean_days_ppm,
               CAST(MAX(days) AS BIGINT) AS max_days
        FROM j GROUP BY 1 ORDER BY 1""").fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert (got.max_days >= got.mean_days_ppm // 1_000_000).all()
