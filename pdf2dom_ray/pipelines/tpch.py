"""TPC-H-style relational pipelines over the driver tables.

`q3_top_unshipped` is the Q3 shape — the canonical multi-way
distributed join — expressed Ray-Data-first:

1. **small side broadcast**: the segment's customer keys are collected
   once (bounded: one segment ≈ 1/5 of customers), `ray.put` into the
   object store, and each orders batch filters map-side with a sorted
   `np.searchsorted` membership probe — no customer⋈orders shuffle.
   Past ``broadcast_limit`` keys it falls back to a `left_semi`
   hash join (the honest big-side path).
2. **combiner before the exchange**: lineitem rows collapse to
   per-batch (l_orderkey, revenue_cents) partials first; under
   ``broadcast_limit`` the filtered-orders side is broadcast too
   (map-side semi-filter + attach — no hash join at all), past it the
   hash join moves only the pre-aggregated narrow rows.
   All broadcast lookups are plain TASK functions — ``ray.get`` of a
   numpy broadcast is a zero-copy shared-memory read, so no
   actor-pool spin-up cost per stage (measured 2.5x on Q3).
3. **integer money**: revenue is accumulated in int64 cents
   (``floor(extendedprice*(1-discount)*100)``) — distributed sums are
   order-independent and the DuckDB oracle is bit-exact (float sums
   would differ in the last ulps between partitionings).

Reads are column-pruned; dates filter at the batch level (Arrow
compute) right after the scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["q3_top_unshipped", "q5_local_supplier_volume",
           "q13_customer_distribution", "q10_returned_items",
           "q12_late_shipments", "q6_forecast_revenue",
           "q1_pricing_summary", "q4_order_priority_check",
           "q14_promo_revenue", "q19_disjunctive_revenue",
           "q7_volume_shipping", "q8_market_share", "q15_top_supplier",
           "q17_small_quantity_revenue",
           "q21_waiting_suppliers",
           "q22_sales_opportunity", "q9_product_profit",
           "q2_min_cost_supplier", "q11_important_stock",
           "q16_parts_supplier_relationship",
           "q20_potential_promotion", "partsupp_cte"]


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def q3_top_unshipped(sf_dir: str, *, segment: str = "BUILDING",
                     cutoff: str = "1998-06-01", limit: int = 10,
                     broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """Top unshipped orders by revenue for one market segment."""
    cut = np.datetime64(cutoff, "us")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment))
                   .select(["c_custkey"]),
        batch_format="pyarrow").materialize()
    # materialized: count() + the key collection (or the semi-join)
    # would otherwise re-execute the customer scan (shared lineage)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"),
                                   pa.scalar(cut.item(),
                                             pa.timestamp("us")))),
        batch_format="pyarrow")

    n_keys = cust.count()
    if n_keys <= broadcast_limit:
        keys = np.sort(np.concatenate(
            [b["c_custkey"].to_numpy()
             for b in cust.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        keys_ref = ray.put(keys)

        def in_segment(t: pa.Table) -> pa.Table:
            # plain task fn: ray.get of a numpy broadcast is a
            # zero-copy shared-memory read — no actor-pool spin-up
            ks = ray.get(keys_ref)
            out_cols = ["o_orderkey", "o_orderdate", "o_orderpriority"]
            if not len(ks):
                return t.slice(0, 0).select(out_cols)
            ck = t.column("o_custkey").to_numpy()
            idx = np.searchsorted(ks, ck)
            idx[idx == len(ks)] = 0
            hit = ks[idx] == ck
            return t.filter(pa.array(hit)).select(out_cols)

        orders = orders.map_batches(in_segment, batch_format="pyarrow")
    else:
        from ..functions.dedup import join_ready
        orders = orders.join(join_ready(cust, _n_partitions()),
                             join_type="left_semi",
                             num_partitions=_n_partitions(),
                             on=("o_custkey",), right_on=("c_custkey",)) \
            .select_columns(["o_orderkey", "o_orderdate",
                             "o_orderpriority"])
        # chained-join hazard: this join's output feeds the next join
        orders = join_ready(orders, _n_partitions())

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("l_shipdate"),
                          pa.scalar(cut.item(), pa.timestamp("us")))
        t = t.filter(keep)
        ok = t.column("l_orderkey").to_numpy()
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": ok, "revenue_cents": cents})
        g = df.groupby("l_orderkey", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # the filtered-orders side is usually small (one segment × date
    # window) — broadcast it and finish with a map-side semi-filter +
    # hash-partitioned aggregate + map-side attach: no big⋈big hash
    # join and no Ray sort-aggregate on the composite key. Past
    # ``broadcast_limit`` filtered orders, the honest hash-join path.
    orders = orders.materialize()
    n_ord = orders.count()

    if n_ord <= broadcast_limit:
        ots = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(orders.to_arrow_refs())]
        ots = [b for b in ots if b.num_rows and b.num_columns]
        if not ots:
            return rd.from_arrow(pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
                "revenue_cents": pa.array([], pa.int64())}))
        ot = pa.concat_tables(ots).combine_chunks()
        ot = ot.take(pc.sort_indices(
            ot, sort_keys=[("o_orderkey", "ascending")]))
        okey = ot.column("o_orderkey").to_numpy()
        odate = ot.column("o_orderdate").cast(pa.int64()).to_numpy()
        oprio = np.asarray(ot.column("o_orderpriority").to_pylist(),
                           dtype=object)
        ord_ref = ray.put((okey, odate, oprio))

        def li_semi(t: pa.Table) -> pa.Table:
            ks, _, _ = ray.get(ord_ref)   # zero-copy broadcast read
            t = li_partial(t)
            if not len(ks):
                return t.slice(0, 0)
            ok = t.column("l_orderkey").to_numpy()
            idx = np.searchsorted(ks, ok)
            idx[idx == len(ks)] = 0
            return t.filter(pa.array(ks[idx] == ok))

        parts = li.map_batches(li_semi, batch_format="pyarrow")

        from ..stages.hashagg import hash_aggregate

        def comb(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("l_orderkey", as_index=False) \
                .agg(revenue_cents=("revenue_cents", "sum"))

        agg = hash_aggregate(parts, ["l_orderkey"], comb,
                             num_partitions=_n_partitions())

        def attach_order(df: pd.DataFrame) -> pa.Table:
            if "l_orderkey" not in df.columns:
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "o_orderpriority": pa.array([], pa.string()),
                    "revenue_cents": pa.array([], pa.int64())})
            ks, dates, prios = ray.get(ord_ref)
            ok = df["l_orderkey"].to_numpy(np.int64)
            pos = np.searchsorted(ks, ok)
            return pa.table({
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_orderdate": pa.array(dates[pos], pa.int64())
                                 .cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(prios[pos], pa.string()),
                "revenue_cents": pa.array(
                    df["revenue_cents"].to_numpy(np.int64),
                    pa.int64())})

        out = agg.map_batches(attach_order, batch_format="pandas")
    else:
        parts = li.map_batches(li_partial, batch_format="pyarrow")

        joined = parts.join(orders, join_type="inner",
                            num_partitions=_n_partitions(),
                            on=("l_orderkey",), right_on=("o_orderkey",))

        agg = joined.groupby(["l_orderkey", "o_orderdate",
                              "o_orderpriority"]).aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"))

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
                "revenue_cents": t.column("revenue_cents")
                                  .cast(pa.int64()),
            })

        out = agg.map_batches(finish, batch_format="pyarrow")

    # take-ordered instead of a global sort: per-batch top-k partial,
    # then a driver merge over <= blocks*k narrow rows (the pattern of
    # Spark takeOrdered) — a full Sort operator is pure fixed cost for
    # a k-row result
    def topk_partial(t: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            t, sort_keys=[("revenue_cents", "descending"),
                          ("o_orderkey", "ascending")])
        return t.take(idx[:limit])

    parts = out.map_batches(topk_partial, batch_format="pyarrow")
    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(parts, topk_partial)
    if not tables:
        return parts.limit(0)
    merged = pa.concat_tables(tables)
    idx = pa.compute.sort_indices(
        merged, sort_keys=[("revenue_cents", "descending"),
                           ("o_orderkey", "ascending")])
    return rd.from_arrow(merged.take(idx[:limit]))


def q5_local_supplier_volume(sf_dir: str, *, region: str = "ASIA",
                             date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01",
                             broadcast_limit: int = 5_000_000
                             ) -> rd.Dataset:
    """TPC-H Q5 shape: revenue per nation where the customer and the
    supplier share the nation, for one region and a one-year window.

    Distributed shape (six tables, one big⋈big exchange):

    * region⋈nation is driver-side (tens of rows), producing the
      in-region nationkey→name map.
    * supplier is the classic broadcast dim: suppkey→nationkey for
      in-region suppliers, ``ray.put`` once and applied map-side
      inside the lineitem combiner (TPC-H supplier is 1/10000 of
      lineitem — if a real deployment outgrows ``broadcast_limit``
      the same hash-join fallback as the customer arm applies).
    * customer is the big dim: broadcast custkey→nationkey probe
      under ``broadcast_limit``, else an inner hash join.
    * lineitem collapses to per-batch (l_orderkey, s_nationkey,
      cents) partials before the single orderkey hash exchange with
      the filtered orders; the c_nation = s_nation equality filters
      after the join, then one tiny nationkey groupby finishes.
    * integer cents keep the distributed sum bit-exact vs the oracle.
    """
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    # tiny dimension files: plain driver-side pyarrow reads (a Ray
    # read job per dim table is ~0.3 s of pure fixed cost each)
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"]
    nat = nat[nat["n_regionkey"].isin(rk)]
    nation_name = dict(zip(nat["n_nationkey"].astype(int),
                           nat["n_name"]))
    nkeys = np.sort(nat["n_nationkey"].to_numpy(np.int64))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    supp = supp[supp["s_nationkey"].isin(nkeys)]
    s_keys = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    s_nat = supp.set_index("s_suppkey")["s_nationkey"] \
        .loc[s_keys].to_numpy(np.int64)
    supp_ref = ray.put((s_keys, s_nat))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    in_region = pa.array(nkeys)
    cust = cust.map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_nationkey"),
                                    value_set=in_region)),
        batch_format="pyarrow").materialize()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def date_filter(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        keep = pc.and_(pc.greater_equal(
            d, pa.scalar(lo.item(), pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi.item(), pa.timestamp("us"))))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(date_filter, batch_format="pyarrow")

    _q5_empty = pa.table({"n_name": pa.array([], pa.string()),
                          "revenue_cents": pa.array([], pa.int64())})
    n_cust = cust.count()
    if n_cust == 0:     # region matches no customers → no revenue
        return rd.from_arrow(_q5_empty)
    if n_cust <= broadcast_limit:
        cdf = cust.to_pandas()
        c_keys = np.sort(cdf["c_custkey"].to_numpy(np.int64))
        c_nat = cdf.set_index("c_custkey")["c_nationkey"] \
            .loc[c_keys].to_numpy(np.int64)
        cust_ref = ray.put((c_keys, c_nat))

        def attach_cust_nation(t: pa.Table) -> pa.Table:
            # plain task fn: ray.get of a numpy broadcast is a
            # zero-copy shared-memory read — no actor-pool spin-up
            ks, nat = ray.get(cust_ref)
            if not len(ks):
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "c_nationkey": pa.array([], pa.int64())})
            ck = t.column("o_custkey").to_numpy()
            idx = np.searchsorted(ks, ck)
            idx[idx == len(ks)] = 0
            t = t.filter(pa.array(ks[idx] == ck))
            nk = nat[np.searchsorted(
                ks, t.column("o_custkey").to_numpy())]
            return pa.table({
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "c_nationkey": pa.array(nk, pa.int64())})

        orders = orders.map_batches(attach_cust_nation,
                                    batch_format="pyarrow")
    else:
        from ..functions.dedup import join_ready
        orders = orders.join(join_ready(cust, _n_partitions()),
                             join_type="inner",
                             num_partitions=_n_partitions(),
                             on=("o_custkey",), right_on=("c_custkey",)) \
            .select_columns(["o_orderkey", "c_nationkey"])
        # chained-join hazard: this join's output feeds the next join
        orders = join_ready(orders, _n_partitions())

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def _li_filter_supp(t: pa.Table):
        skeys, snats = ray.get(supp_ref)   # zero-copy broadcast read
        if not len(skeys):
            z = np.array([], dtype=np.int64)
            return z, z, z
        sk = t.column("l_suppkey").to_numpy()
        idx = np.searchsorted(skeys, sk)
        idx[idx == len(skeys)] = 0
        t = t.filter(pa.array(skeys[idx] == sk))
        sk = t.column("l_suppkey").to_numpy()
        snat = snats[np.searchsorted(skeys, sk)]
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        return t.column("l_orderkey").to_numpy(), snat, cents

    # the date-windowed in-region orders side is usually small —
    # broadcast (o_orderkey -> c_nationkey) and collapse the lineitem
    # combiner straight to per-nation partials (≤ 25 rows per batch,
    # driver-merged); past ``broadcast_limit`` rows, the hash join
    orders = orders.materialize()
    n_ord = orders.count()

    if n_ord == 0:
        return rd.from_arrow(pa.table({
            "n_name": pa.array([], pa.string()),
            "revenue_cents": pa.array([], pa.int64())}))

    if n_ord <= broadcast_limit:
        odf = orders.to_pandas().sort_values("o_orderkey")
        ord_ref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                           odf["c_nationkey"].to_numpy(np.int64)))

        def li_nation_partial(t: pa.Table) -> pa.Table:
            ok, snat, cents = _li_filter_supp(t)
            oks, cnats = ray.get(ord_ref)
            idx = np.searchsorted(oks, ok)
            idx[idx == len(oks)] = 0
            # in-window membership AND the local-supplier predicate
            hit = (oks[idx] == ok) & (cnats[idx] == snat)
            snat, cents = snat[hit], cents[hit]
            df = pd.DataFrame({"s_nationkey": snat,
                               "revenue_cents": cents})
            g = df.groupby("s_nationkey", sort=False,
                           as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = li.map_batches(li_nation_partial,
                                  batch_format="pyarrow")
        def resum_nat(t: pa.Table) -> pa.Table:
            g = (t.to_pandas().groupby("s_nationkey", as_index=False)
                  .agg(revenue_cents=("revenue_cents", "sum")))
            return pa.Table.from_pandas(g, preserve_index=False)

        from ..functions.fold import bounded_fold_tables
        tabs = bounded_fold_tables(partials, resum_nat)
        if not tabs:
            return rd.from_arrow(pa.table({
                "n_name": pa.array([], pa.string()),
                "revenue_cents": pa.array([], pa.int64())}))
        agg = rd.from_pandas(
            pa.concat_tables(tabs).to_pandas()
            .groupby("s_nationkey", as_index=False)
            .agg(revenue_cents=("revenue_cents", "sum")))
    else:
        def li_partial_q5(t: pa.Table) -> pa.Table:
            ok, snat, cents = _li_filter_supp(t)
            df = pd.DataFrame({
                "l_orderkey": ok,
                "s_nationkey": snat, "revenue_cents": cents})
            g = df.groupby(["l_orderkey", "s_nationkey"], sort=False,
                           as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = li.map_batches(li_partial_q5, batch_format="pyarrow")

        joined = parts.join(orders, join_type="inner",
                            num_partitions=_n_partitions(),
                            on=("l_orderkey",), right_on=("o_orderkey",))

        def local_only(t: pa.Table) -> pa.Table:
            if not t.num_rows or "s_nationkey" not in t.schema.names:
                return pa.table({
                    "s_nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64())})
            keep = pc.equal(t.column("s_nationkey"),
                            t.column("c_nationkey"))
            t = t.filter(keep)
            return pa.table({
                "s_nationkey": t.column("s_nationkey").cast(pa.int64()),
                "revenue_cents": t.column("revenue_cents")
                                  .cast(pa.int64())})

        agg = joined.map_batches(local_only, batch_format="pyarrow") \
            .groupby("s_nationkey") \
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue_cents": pa.array([], pa.int64())})
        nk = t.column("s_nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([nation_name[k] for k in nk],
                               pa.string()),
            "revenue_cents": t.column("revenue_cents").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def q13_customer_distribution(sf_dir: str, *,
                              exclude_priority: str = "5-LOW",
                              assume_referential_integrity: bool = True
                              ) -> rd.Dataset:
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING customers with zero qualifying orders. Q13's
    ``o_comment NOT LIKE`` anti-filter becomes
    ``o_orderpriority <> exclude_priority`` (the driver's orders table
    carries no comment column).

    Distributed shape, default path: orders collapse to per-batch
    ``(o_custkey, n)`` count partials (combiner), one small
    ``groupby(o_custkey)`` sums them, a tiny second-level
    ``groupby(c_count)`` builds the active-customer histogram — and
    because TPC-H guarantees every ``o_custkey`` references a real
    customer (referential integrity), the zero-order bucket is pure
    arithmetic: ``|customer| - |active customers|``, with
    ``|customer|`` a parquet-METADATA count (no data read). The
    customer table never enters an exchange at all; total traffic is
    one row per active customer.

    ``assume_referential_integrity=False`` keeps the explicit
    LEFT OUTER join of customer keys to counts (the null-fill arm IS
    the zero bucket) for inputs where orders may reference unknown
    customers — both paths are locked identical by tests and the
    driver oracle.

    All-integer output keeps the driver's value-hash exact.
    """
    from ray.data.aggregate import Count

    from ..functions.dedup import _to_arrow_blocks

    n_part = _n_partitions()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("o_orderpriority"),
                                  exclude_priority))
        df = t.select(["o_custkey"]).to_pandas()
        g = df.groupby("o_custkey", as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = _to_arrow_blocks(
        orders.map_batches(count_partial, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("n", alias_name="c_count")))

    def fix_empty(t: pa.Table) -> pa.Table:
        # empty groupby outputs can be schema-less (CLAUDE.md Arrow
        # gaps); a schema-less block poisons the join's partitioning
        if not t.num_columns:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "c_count": pa.array([], pa.int64())})
        return pa.table({"o_custkey": t.column("o_custkey")
                         .cast(pa.int64()),
                         "c_count": t.column("c_count").cast(pa.int64())})

    counts = counts.map_batches(fix_empty,
                                batch_format="pyarrow").materialize()
    n_counts = counts.count()

    if assume_referential_integrity:
        import pyarrow.parquet as pq
        n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
        if n_counts == 0:  # every order excluded → one all-zero bucket
            return rd.from_arrow(pa.table({
                "c_count": pa.array([0], pa.int64()),
                "custdist": pa.array([n_cust], pa.int64())}))
        hist = counts.groupby("c_count").aggregate(
            Count(alias_name="custdist"))

        def finish_ri(t) -> pa.Table:
            t = t if isinstance(t, pa.Table) else \
                pa.Table.from_pandas(t, preserve_index=False)
            if not t.num_columns:
                return pa.table({"c_count": pa.array([], pa.int64()),
                                 "custdist": pa.array([], pa.int64())})
            return pa.table({
                "c_count": t.column("c_count").cast(pa.int64()),
                "custdist": t.column("custdist").cast(pa.int64())})

        hist = hist.map_batches(finish_ri, batch_format="pyarrow")
        n_zero = n_cust - n_counts
        if n_zero > 0:
            hist = hist.union(rd.from_arrow(pa.table({
                "c_count": pa.array([0], pa.int64()),
                "custdist": pa.array([n_zero], pa.int64())})))
        return hist

    # NOTE: overlapping these two independent materializations from
    # driver threads was tried (round 3) and showed no reliable win —
    # two streaming executors contend for the same task slots and
    # occasionally livelock into a 2x slowdown; serial is predictable.
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).materialize()
    n_cust = cust.count()
    if n_counts == 0:  # every order excluded → one all-zero bucket
        return rd.from_arrow(pa.table({
            "c_count": pa.array([0], pa.int64()),
            "custdist": pa.array([n_cust], pa.int64())}))

    # the hash join rejects 0-row blocks on either side: even-
    # repartition both narrow sides so no block is empty
    cust = cust.repartition(min(n_part, max(1, n_cust)))
    counts = counts.repartition(min(n_part, n_counts))

    joined = cust.join(counts, join_type="left_outer",
                       num_partitions=n_part,
                       on=("c_custkey",), right_on=("o_custkey",))

    def to_hist_key(t: pa.Table) -> pa.Table:
        c = t.column("c_count") if "c_count" in t.schema.names else \
            pa.nulls(t.num_rows, pa.int64())
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return pa.table({"c_count": pc.fill_null(c.cast(pa.int64()), 0)})

    hist = joined.map_batches(to_hist_key, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Count(alias_name="custdist"))

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return pa.table({"c_count": pa.array([], pa.int64()),
                             "custdist": pa.array([], pa.int64())})
        return pa.table({
            "c_count": t.column("c_count").cast(pa.int64()),
            "custdist": t.column("custdist").cast(pa.int64())})

    return hist.map_batches(finish, batch_format="pyarrow")


def q10_returned_items(sf_dir: str, *, date_lo: str = "1996-01-01",
                       date_hi: str = "1996-04-01", limit: int = 20,
                       broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """TPC-H Q10 shape: revenue lost to returned items per customer
    over a one-quarter order window, top ``limit`` customers.

    Distributed shape (the Q3 playbook with the dim join on the OTHER
    side of the aggregate):

    1. lineitem filters ``l_returnflag = 'R'`` at the scan batch and
       collapses to per-batch (l_orderkey, cents) partials — the only
       big⋈big exchange then moves pre-aggregated narrow rows into the
       date-windowed orders (o_orderkey, o_custkey) hash join.
    2. the join output re-keys to o_custkey through the repo's
       hash-partitioned aggregate (high-cardinality key, combiner
       first — never Ray's sort-aggregate).
    3. customer attaches map-side from a broadcast (custkey → name,
       nationkey) under ``broadcast_limit``; past it, the same
       ``join_ready``-guarded hash-join fallback as Q3. nation is a
       driver-side dict (25 rows).
    4. top-k by (revenue_cents desc, c_custkey) via per-batch top-k
       partials + a driver merge over ≤ blocks×k narrow rows.

    Integer cents (``floor(extendedprice*(1-discount)*100)``) keep the
    distributed sum bit-exact vs the DuckDB oracle.
    """
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    n_part = _n_partitions()

    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nation_name = dict(zip(nat["n_nationkey"].astype(int),
                           nat["n_name"]))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def date_filter(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        keep = pc.and_(pc.greater_equal(
            d, pa.scalar(lo.item(), pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi.item(), pa.timestamp("us"))))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(date_filter, batch_format="pyarrow")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    from ..stages.hashagg import hash_aggregate

    def by_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df[["o_custkey", "revenue_cents"]] \
            .groupby("o_custkey", as_index=False) \
            .agg(revenue_cents=("revenue_cents", "sum"))

    # the date-windowed orders side is small (one quarter of the
    # order history) — broadcast (o_orderkey -> o_custkey) and re-key
    # the lineitem combiner map-side; past ``broadcast_limit`` rows,
    # the honest hash-join path below
    orders = orders.materialize()
    n_ord = orders.count()

    if n_ord <= broadcast_limit:
        ots = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(orders.to_arrow_refs())]
        ots = [b for b in ots if b.num_rows and b.num_columns]
        if not ots:
            return rd.from_arrow(pa.table({
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "revenue_cents": pa.array([], pa.int64())}))
        ot = pa.concat_tables(ots).combine_chunks()
        ot = ot.take(pc.sort_indices(
            ot, sort_keys=[("o_orderkey", "ascending")]))
        ord_ref = ray.put((ot.column("o_orderkey").to_numpy(),
                           ot.column("o_custkey").to_numpy()))

        def li_partial_bcast(t: pa.Table) -> pa.Table:
            ks, custs = ray.get(ord_ref)  # zero-copy broadcast read
            t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
            if not len(ks):
                t = t.slice(0, 0)
            ok = t.column("l_orderkey").to_numpy()
            idx = np.searchsorted(ks, ok)
            idx[idx == len(ks)] = 0
            hit = (len(ks) > 0) & (ks[idx] == ok) if len(ks) else \
                np.zeros(0, dtype=bool)
            t = t.filter(pa.array(hit))
            ok = t.column("l_orderkey").to_numpy()
            ck = custs[np.searchsorted(ks, ok)]
            ep = t.column("l_extendedprice").to_numpy()
            disc = t.column("l_discount").to_numpy()
            cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
            df = pd.DataFrame({"o_custkey": ck, "revenue_cents": cents})
            g = df.groupby("o_custkey", sort=False, as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = li.map_batches(li_partial_bcast, batch_format="pyarrow")
        per_cust = hash_aggregate(parts, ["o_custkey"], by_cust,
                                  num_partitions=n_part)
    else:
        def li_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
            ep = t.column("l_extendedprice").to_numpy()
            disc = t.column("l_discount").to_numpy()
            cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
            df = pd.DataFrame({"l_orderkey": t.column("l_orderkey")
                               .to_numpy(), "revenue_cents": cents})
            g = df.groupby("l_orderkey", sort=False,
                           as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = li.map_batches(li_partial, batch_format="pyarrow")

        # narrow side guarded against schema-less empty blocks
        # (CLAUDE.md hash-join flake: passes alone, fails under load)
        from ..functions.dedup import join_ready
        joined = parts.join(join_ready(orders, n_part),
                            join_type="inner",
                            num_partitions=n_part,
                            on=("l_orderkey",), right_on=("o_orderkey",))

        per_cust = hash_aggregate(joined, ["o_custkey"], by_cust,
                                  num_partitions=n_part)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name",
                                    "c_nationkey"]).materialize()

    if cust.count() <= broadcast_limit:
        cdf = cust.to_pandas().sort_values("c_custkey")
        c_keys = cdf["c_custkey"].to_numpy(np.int64)
        c_names = cdf["c_name"].to_numpy(object)
        c_nat = cdf["c_nationkey"].to_numpy(np.int64)
        cust_ref = ray.put((c_keys, c_names, c_nat))

        def attach_customer(df: pd.DataFrame) -> pa.Table:
            if "o_custkey" not in df.columns:
                return pa.table({
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "c_nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64())})
            ks, names, nats = ray.get(cust_ref)  # zero-copy broadcast
            if not len(ks):
                return pa.table({
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "c_nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64())})
            ck = df["o_custkey"].to_numpy(np.int64)
            pos = np.searchsorted(ks, ck)
            pos[pos == len(ks)] = 0
            hit = ks[pos] == ck
            ck, pos = ck[hit], pos[hit]
            cents = df["revenue_cents"].to_numpy(np.int64)[hit]
            return pa.table({
                "c_custkey": pa.array(ck, pa.int64()),
                "c_name": pa.array(names[pos], pa.string()),
                "c_nationkey": pa.array(nats[pos], pa.int64()),
                "revenue_cents": pa.array(cents, pa.int64())})

        rows = per_cust.map_batches(attach_customer,
                                    batch_format="pandas")
    else:
        from ..functions.dedup import join_ready
        rows = join_ready(per_cust, n_part).join(
            join_ready(cust, n_part), join_type="inner",
            num_partitions=n_part,
            on=("o_custkey",), right_on=("c_custkey",))

        def narrow(t: pa.Table) -> pa.Table:
            return pa.table({
                "c_custkey": t.column("o_custkey").cast(pa.int64()),
                "c_name": t.column("c_name").cast(pa.string()),
                "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                "revenue_cents": t.column("revenue_cents")
                                  .cast(pa.int64())})

        rows = rows.map_batches(narrow, batch_format="pyarrow")

    def topk_partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("revenue_cents", "descending"),
                          ("c_custkey", "ascending")])
        return t.take(idx[:limit])

    partials = rows.map_batches(topk_partial, batch_format="pyarrow")
    # empty map_groups partitions can surface as pandas blocks — the
    # bounded fold coerces them and pre-merges past 64 blocks
    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(partials, topk_partial)
    empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                      "c_name": pa.array([], pa.string()),
                      "n_name": pa.array([], pa.string()),
                      "revenue_cents": pa.array([], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(tables)
    idx = pc.sort_indices(
        merged, sort_keys=[("revenue_cents", "descending"),
                           ("c_custkey", "ascending")])
    top = merged.take(idx[:limit])
    nk = top.column("c_nationkey").to_pylist()
    return rd.from_arrow(pa.table({
        "c_custkey": top.column("c_custkey").cast(pa.int64()),
        "c_name": top.column("c_name").cast(pa.string()),
        "n_name": pa.array([nation_name[k] for k in nk], pa.string()),
        "revenue_cents": top.column("revenue_cents").cast(pa.int64())}))


def q12_late_shipments(sf_dir: str, *, late_days: int = 60,
                       very_late_days: int = 120,
                       broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """TPC-H Q12 shape: CONDITIONAL aggregation over a fact⋈dim join —
    late lineitems (shipped > ``late_days`` after order) bucketed by
    delay, counting high- vs low-priority order lines per bucket.

    Distributed shape: orders broadcast as three parallel arrays
    (okey → orderdate, is_high) under ``broadcast_limit``; the
    lineitem scan then joins map-side and collapses to ≤ 4 partial
    rows per batch (2 buckets × high/low), merged on the driver.
    Past the limit: the honest orderkey hash join + hash-partitioned
    aggregate. Integer counts keep the oracle hash exact.
    """
    us_day = 86_400_000_000
    n_part = _n_partitions()
    high_set = ("1-URGENT", "2-HIGH")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"]).materialize()
    n_ord = orders.count()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def bucket_counts(delay_us: np.ndarray,
                      is_high: np.ndarray) -> pa.Table:
        late = delay_us > late_days * us_day
        delay_us, is_high = delay_us[late], is_high[late]
        very = delay_us > very_late_days * us_day
        rows = {"delay_bucket": [], "high_line_count": [],
                "low_line_count": []}
        for name, mask in (("late", ~very), ("very_late", very)):
            if mask.any():
                rows["delay_bucket"].append(name)
                rows["high_line_count"].append(
                    int(is_high[mask].sum()))
                rows["low_line_count"].append(
                    int((~is_high[mask]).sum()))
        return pa.table({
            "delay_bucket": pa.array(rows["delay_bucket"], pa.string()),
            "high_line_count": pa.array(rows["high_line_count"],
                                        pa.int64()),
            "low_line_count": pa.array(rows["low_line_count"],
                                       pa.int64())})

    empty = pa.table({"delay_bucket": pa.array([], pa.string()),
                      "high_line_count": pa.array([], pa.int64()),
                      "low_line_count": pa.array([], pa.int64())})
    if n_ord == 0:
        return rd.from_arrow(empty)

    if n_ord <= broadcast_limit:
        odf = orders.to_pandas().sort_values("o_orderkey")
        ord_ref = ray.put((
            odf["o_orderkey"].to_numpy(np.int64),
            odf["o_orderdate"].astype("datetime64[us]")
               .astype("int64").to_numpy(),
            odf["o_orderpriority"].isin(high_set).to_numpy()))

        def li_partial(t: pa.Table) -> pa.Table:
            oks, odates, ohigh = ray.get(ord_ref)  # zero-copy arrays
            if not len(oks):
                return bucket_counts(np.array([], dtype=np.int64),
                                     np.array([], dtype=bool))
            ok = t.column("l_orderkey").to_numpy()
            idx = np.searchsorted(oks, ok)
            idx[idx == len(oks)] = 0
            hit = oks[idx] == ok
            idx, ok = idx[hit], ok[hit]
            ship = t.column("l_shipdate").cast(pa.int64()) \
                    .to_numpy()[hit]
            return bucket_counts(ship - odates[idx], ohigh[idx])

        partials = li.map_batches(li_partial, batch_format="pyarrow")
    else:
        from ..functions.dedup import join_ready
        joined = li.join(join_ready(orders, n_part),
                         join_type="inner", num_partitions=n_part,
                         on=("l_orderkey",), right_on=("o_orderkey",))

        def join_partial(t: pa.Table) -> pa.Table:
            if not t.num_rows or "o_orderdate" not in t.schema.names:
                return empty
            ship = t.column("l_shipdate").cast(pa.int64()).to_numpy()
            odate = t.column("o_orderdate").cast(pa.int64()).to_numpy()
            pr = np.asarray(t.column("o_orderpriority").to_pylist(),
                            dtype=object)
            is_high = np.isin(pr, high_set)
            return bucket_counts(ship - odate, is_high)

        partials = joined.map_batches(join_partial,
                                      batch_format="pyarrow")

    # ≤ 2 rows per batch: merge on the driver (pre-merged past 64
    # blocks — re-sum per merged block keeps the fold bounded)
    def resum(t: pa.Table) -> pa.Table:
        g = (t.to_pandas().groupby("delay_bucket", as_index=False)
              .agg(high_line_count=("high_line_count", "sum"),
                   low_line_count=("low_line_count", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.fold import bounded_fold_tables
    tabs = bounded_fold_tables(partials, resum)
    if not tabs:
        return rd.from_arrow(empty)
    merged = (pa.concat_tables(tabs).to_pandas()
              .groupby("delay_bucket", as_index=False)
              .agg(high_line_count=("high_line_count", "sum"),
                   low_line_count=("low_line_count", "sum"))
              .sort_values("delay_bucket").reset_index(drop=True))
    merged["high_line_count"] = merged["high_line_count"].astype("int64")
    merged["low_line_count"] = merged["low_line_count"].astype("int64")
    return rd.from_pandas(merged)


def q6_forecast_revenue(sf_dir: str, *, year: int = 1996,
                        disc_lo: float = 0.05, disc_hi: float = 0.07,
                        qty_below: float = 24.0) -> rd.Dataset:
    """TPC-H Q6 shape: the pure scan-filter-aggregate — forecast
    revenue change from discount elimination.

    Distributed shape: every predicate is PUSHED INTO THE SCAN
    (``read_parquet(filter=...)`` → Arrow row-group pruning at
    storage — non-matching rows never enter the object store; the
    complement of the column pruning), then each batch collapses to a
    single (revenue_cents, n_lines) int64 partial and the driver folds
    O(blocks) scalar rows. No exchange at all — the op every engine
    uses to measure raw scan bandwidth, which is exactly what it
    measures here too. Integer cents (floor(price·discount·100), the
    Q3 convention) keep the oracle hash exact."""
    import pyarrow.dataset as pads
    from datetime import datetime

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= datetime(year, 1, 1))
                & (pads.field("l_shipdate") < datetime(year + 1, 1, 1))
                & (pads.field("l_discount") >= disc_lo)
                & (pads.field("l_discount") <= disc_hi)
                & (pads.field("l_quantity") < qty_below)))

    def partial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * disc * 100).astype(np.int64)
        return pa.table({
            "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
            "n_lines": pa.array([len(cents)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    rev = parts.sum("revenue_cents") or 0
    n = parts.sum("n_lines") or 0
    return rd.from_arrow(pa.table({
        "revenue_cents": pa.array([rev], pa.int64()),
        "n_lines": pa.array([n], pa.int64())}))


def q18_large_volume_customers(sf_dir: str, *, min_qty: int = 250,
                               limit: int = 100,
                               broadcast_limit: int = 5_000_000
                               ) -> rd.Dataset:
    """TPC-H Q18 shape: large-volume customers — a HAVING filter on a
    fact-table groupby gates a two-dim join, top-``limit`` by order
    value.

    Distributed shape: per-batch (orderkey → qty) partial sums
    combine BEFORE the one orderkey exchange (the only all-to-all:
    lineitem is the fact table and must co-locate by key to finish
    the HAVING sum); the surviving qualifying orders are a tiny set
    (HAVING > ``min_qty`` keeps the tail), so orders and customer
    attach by BROADCAST searchsorted probe under ``broadcast_limit``
    (hash-join fallback kept) and the top-``limit`` is a driver sort
    of ≤|qualifying| rows — never a distributed Sort operator.
    Integer cents for o_totalprice keep the oracle hash exact.
    """
    n_part = _n_partitions()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        qty = np.rint(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uk, pa.int64()),
            "sum_qty": pa.array(np.bincount(inv, qty, len(uk))
                                .astype(np.int64), pa.int64())})

    from ..functions.dedup import _to_arrow_blocks
    from ..stages.hashagg import hash_aggregate

    def qty_combine(df: pd.DataFrame) -> pd.DataFrame:
        # ~|orders| nearly-unique keys: hash-partitioned, not sorted
        return df.groupby("l_orderkey", as_index=False)[
            "sum_qty"].sum()

    per_order = _to_arrow_blocks(hash_aggregate(
        li.map_batches(li_partial, batch_format="pyarrow"),
        ["l_orderkey"], qty_combine))
    def having(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.int64())})
        return t.filter(pc.greater(t.column("sum_qty"), min_qty))

    qual = per_order.map_batches(having,
                                 batch_format="pyarrow").materialize()
    if qual.count() == 0:
        return rd.from_arrow(pa.table({
            "c_name": pa.array([], pa.string()),
            "c_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "totalprice_cents": pa.array([], pa.int64()),
            "sum_qty": pa.array([], pa.int64())}))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice", "o_orderdate"])
    n_ord_meta = orders.count()

    if n_ord_meta <= broadcast_limit:
        qdf = qual.to_pandas().sort_values("l_orderkey")
        q_ref = ray.put((qdf["l_orderkey"].to_numpy(np.int64),
                         qdf["sum_qty"].to_numpy(np.int64)))

        def attach(t: pa.Table) -> pa.Table:
            qk, qs = ray.get(q_ref)     # zero-copy numpy broadcast
            ok = t.column("o_orderkey").to_numpy()
            idx = np.searchsorted(qk, ok)
            idx[idx == len(qk)] = 0
            hit = qk[idx] == ok
            idx = idx[hit]
            price = t.column("o_totalprice").to_numpy(
                zero_copy_only=False)[hit]
            return pa.table({
                "o_orderkey": pa.array(ok[hit], pa.int64()),
                "o_custkey": t.column("o_custkey").filter(
                    pa.array(hit)),
                "o_orderdate": t.column("o_orderdate").filter(
                    pa.array(hit)),
                "totalprice_cents": pa.array(
                    np.rint(price * 100).astype(np.int64), pa.int64()),
                "sum_qty": pa.array(qs[idx], pa.int64())})

        big = orders.map_batches(attach, batch_format="pyarrow")
    else:
        from ..functions.dedup import join_ready
        joined = orders.join(
            join_ready(qual, n_part), join_type="inner",
            num_partitions=n_part,
            on=("o_orderkey",), right_on=("l_orderkey",))

        def fix(t: pa.Table) -> pa.Table:
            if not t.num_rows or "o_totalprice" not in t.schema.names:
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "totalprice_cents": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64())})
            price = t.column("o_totalprice").to_numpy(
                zero_copy_only=False)
            return pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_orderdate": t.column("o_orderdate"),
                "totalprice_cents": pa.array(
                    np.rint(price * 100).astype(np.int64), pa.int64()),
                "sum_qty": t.column("sum_qty")})

        big = joined.map_batches(fix, batch_format="pyarrow")

    # qualifying rows are few: driver top-k (never a Sort operator)
    from ..functions.fold import bounded_fold_tables

    def keep_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["totalprice_cents", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True]).head(limit)
        return pa.Table.from_pandas(df, preserve_index=False)

    tabs = bounded_fold_tables(
        big.map_batches(keep_top, batch_format="pyarrow"), keep_top)
    top = (pa.concat_tables(tabs).to_pandas()
           .sort_values(["totalprice_cents", "o_orderdate",
                         "o_orderkey"],
                        ascending=[False, True, True]).head(limit)
           .reset_index(drop=True))

    # only the ≤limit winning custkeys need names: push the key set
    # into the customer scan (row-group pruning — the full dim table
    # never reaches the driver)
    import pyarrow.dataset as pads
    want = sorted(set(top["o_custkey"].astype("int64").tolist()))
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey").isin(want)) \
        .to_pandas().sort_values("c_custkey")
    ck = cust["c_custkey"].to_numpy(np.int64)
    idx = np.searchsorted(ck, top["o_custkey"].to_numpy(np.int64))
    idx[idx == len(ck)] = 0
    top["c_name"] = cust["c_name"].to_numpy(object)[idx]
    top["c_custkey"] = top["o_custkey"].astype("int64")
    out = top[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "totalprice_cents", "sum_qty"]].copy()
    for c in ("o_orderkey", "totalprice_cents", "sum_qty"):
        out[c] = out[c].astype("int64")
    return rd.from_pandas(out)


def q1_pricing_summary(sf_dir: str,
                       ship_before: str = "1998-09-02") -> rd.Dataset:
    """TPC-H Q1 shape: the pricing-summary report — full-fact-table
    scan collapsing into a handful of (returnflag, linestatus) groups
    with stacked aggregates. The canonical COMBINER showcase: the
    group universe is tiny (≤ R×S groups), so every batch collapses
    to at most that many partial rows and the exchange moves
    O(blocks × groups) rows regardless of table size — at 100 TB the
    shuffle stays kilobytes.

    Averages are deliberately emitted UN-DIVIDED (count_order plus the
    integer sums they derive from — avg = sum/count post-hoc): the
    CLAUDE.md integer-aggregate invariant. Per-line money terms use
    the repo's float→cents rule, floor(expr · 100) per ROW then int64
    sums, which both numpy and DuckDB evaluate identically (same IEEE
    expression), so the oracle hash-matches bit-exactly:

        base_price_cents = Σ floor(l_extendedprice · 100)
        disc_price_cents = Σ floor(l_extendedprice·(1-l_discount)·100)
        charge_cents     = Σ floor(l_extendedprice·(1-l_discount)
                                   ·(1+l_tax)·100)
        sum_disc_centi   = Σ rint(l_discount · 100)
    """
    from datetime import datetime

    import pyarrow.dataset as pads

    lim = datetime.fromisoformat(ship_before)
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
        filter=pads.field("l_shipdate") <= lim)

    def partial(t: pa.Table) -> pa.Table:
        rf = np.asarray(t.column("l_returnflag").to_pandas(),
                        dtype=object)
        lst = np.asarray(t.column("l_linestatus").to_pandas(),
                         dtype=object)
        qty = np.rint(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        price = t.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        tax = t.column("l_tax").to_numpy(zero_copy_only=False)
        base = np.floor(price * 100).astype(np.int64)
        dp = np.floor(price * (1 - disc) * 100).astype(np.int64)
        ch = np.floor(price * (1 - disc) * (1 + tax) * 100) \
            .astype(np.int64)
        dc = np.rint(disc * 100).astype(np.int64)
        key = np.char.add(np.char.add(rf.astype(str), "|"),
                          lst.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        def seg(v):
            return np.bincount(inv, v, len(uk)).astype(np.int64)
        flags = np.array([k.split("|") for k in uk], dtype=object) \
            if len(uk) else np.empty((0, 2), dtype=object)
        return pa.table({
            "l_returnflag": pa.array(
                [f[0] for f in flags], pa.string()),
            "l_linestatus": pa.array(
                [f[1] for f in flags], pa.string()),
            "sum_qty": pa.array(seg(qty), pa.int64()),
            "base_price_cents": pa.array(seg(base), pa.int64()),
            "disc_price_cents": pa.array(seg(dp), pa.int64()),
            "charge_cents": pa.array(seg(ch), pa.int64()),
            "sum_disc_centi": pa.array(seg(dc), pa.int64()),
            "count_order": pa.array(
                np.bincount(inv, minlength=len(uk)).astype(np.int64),
                pa.int64())})

    from ..functions.dedup import _to_arrow_blocks
    agg = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["l_returnflag", "l_linestatus"])
          .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                     Sum("base_price_cents",
                         alias_name="base_price_cents"),
                     Sum("disc_price_cents",
                         alias_name="disc_price_cents"),
                     Sum("charge_cents", alias_name="charge_cents"),
                     Sum("sum_disc_centi",
                         alias_name="sum_disc_centi"),
                     Sum("count_order", alias_name="count_order")))
    return agg


def q4_order_priority_check(sf_dir: str, *,
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1996-04-01",
                            late_days: int = 60,
                            broadcast_limit: int = 5_000_000
                            ) -> rd.Dataset:
    """TPC-H Q4 shape: order-priority checking — an EXISTS semi-join
    from the fact table gating a dimension groupby. The reference
    predicate (l_commitdate < l_receiptdate) uses columns the driver
    tables don't carry, so the semi-join condition is the Q12 late
    rule instead: EXISTS a lineitem shipped > ``late_days`` after the
    order date — same shape, same distributed plan.

    Distributed shape: lineitem collapses per batch to its DISTINCT
    (l_orderkey, max_shipdate_day) partials (narrow), one orderkey
    groupby finishes the max; orders in the window attach by
    broadcast searchsorted probe under ``broadcast_limit`` (join
    fallback beyond) and the per-priority count is a tiny final
    groupby. The EXISTS never materializes matching line rows — only
    one derived row per orderkey leaves a batch."""
    from datetime import datetime

    import pyarrow.dataset as pads

    from ..functions.dedup import _to_arrow_blocks, join_ready
    from ..scale import scale_partitions

    lo = datetime.fromisoformat(date_lo)
    hi = datetime.fromisoformat(date_hi)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        day = (t.column("l_shipdate").cast(pa.int64()).to_numpy()
               // 86_400_000_000)
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, day)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "max_ship_day": pa.array(mx, pa.int64())})

    # ~|orders| nearly-unique keys: hash-partitioned aggregate, not
    # the sort-based one (stages/hashagg.py rationale)
    from ..stages.hashagg import hash_aggregate

    def max_by_key(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False)[
            "max_ship_day"].max()

    per_order = _to_arrow_blocks(hash_aggregate(
        li.map_batches(li_partial, batch_format="pyarrow"),
        ["l_orderkey"], max_by_key)).materialize()

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=((pads.field("o_orderdate") >= lo)
                & (pads.field("o_orderdate") < hi)))

    n_li = per_order.count()
    if n_li <= broadcast_limit:
        # hashagg's empty sentinel blocks stay PANDAS through the
        # arrow coercion (zero-column blocks skip the UDF) — filter
        # on the attribute, not just its value
        tabs = [b for b in ray.get(per_order.to_arrow_refs())
                if getattr(b, "num_columns", 0)]
        lt = pa.concat_tables(tabs) if tabs else pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "max_ship_day": pa.array([], pa.int64())})
        order_arr = np.argsort(lt.column("l_orderkey").to_numpy())
        keys_ref = ray.put(
            lt.column("l_orderkey").to_numpy()[order_arr])
        mx_ref = ray.put(
            lt.column("max_ship_day").to_numpy()[order_arr])

        def probe(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            mx = ray.get(mx_ref)
            ok = t.column("o_orderkey").to_numpy()
            day = (t.column("o_orderdate").cast(pa.int64()).to_numpy()
                   // 86_400_000_000)
            pos = np.searchsorted(keys, ok)
            pos_c = np.minimum(pos, max(len(keys) - 1, 0))
            hit = (keys[pos_c] == ok) if len(keys) else \
                np.zeros(len(ok), dtype=bool)
            late = hit & (mx[pos_c] > day + late_days)
            pr = np.asarray(t.column("o_orderpriority").to_pandas(),
                            dtype=object)[late]
            uk, cnt = np.unique(pr.astype(str), return_counts=True)
            return pa.table({
                "o_orderpriority": pa.array(uk.tolist(), pa.string()),
                "order_count": pa.array(cnt.astype(np.int64),
                                        pa.int64())})

        partials = orders.map_batches(probe, batch_format="pyarrow")
    else:
        n_part = scale_partitions()
        j = join_ready(orders, n_part).join(
            join_ready(per_order, n_part), join_type="inner",
            num_partitions=n_part, on=("o_orderkey",),
            right_on=("l_orderkey",))

        def late_counts(t: pa.Table) -> pa.Table:
            if not t.num_columns or not t.num_rows:
                return pa.table({
                    "o_orderpriority": pa.array([], pa.string()),
                    "order_count": pa.array([], pa.int64())})
            day = (t.column("o_orderdate").cast(pa.int64()).to_numpy()
                   // 86_400_000_000)
            late = t.column("max_ship_day").to_numpy() > \
                day + late_days
            pr = np.asarray(t.column("o_orderpriority").to_pandas(),
                            dtype=object)[late]
            uk, cnt = np.unique(pr.astype(str), return_counts=True)
            return pa.table({
                "o_orderpriority": pa.array(uk.tolist(), pa.string()),
                "order_count": pa.array(cnt.astype(np.int64),
                                        pa.int64())})

        partials = j.map_batches(late_counts, batch_format="pyarrow")

    return _to_arrow_blocks(
        partials.groupby("o_orderpriority").aggregate(
            Sum("order_count", alias_name="order_count")))


def q14_promo_revenue(sf_dir: str, *, year: int = 1996, month: int = 7,
                      promo_type: str = "PROMO") -> rd.Dataset:
    """TPC-H Q14 shape: promotion-effect ratio — a conditional
    aggregate over a fact⋈dimension month slice, reported as one
    integer ppm ratio (float division happens ONCE on two exact int64
    sums, then floors to ppm — hash-stable).

    Distributed shape: the promo partkey set is a broadcast sorted
    numpy array (parts are a dimension table; at 100 TB it is still
    the small side — hash-join fallback is the q3 pattern, not needed
    for a key SET probe), the month predicate pushes into the scan,
    and each batch folds to two int64 scalars; the driver folds
    O(blocks) partial rows."""
    from datetime import datetime

    import pyarrow.dataset as pads

    lo = datetime(year, month, 1)
    hi = datetime(year + (month == 12), month % 12 + 1, 1)

    promo = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pads.field("p_type") == promo_type).to_pandas()
    promo_ref = ray.put(np.sort(promo["p_partkey"].to_numpy(
        np.int64)))

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)))

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(promo_ref)
        pk = t.column("l_partkey").to_numpy()
        price = t.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        pos = np.searchsorted(keys, pk)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        is_promo = (keys[pos_c] == pk) if len(keys) else \
            np.zeros(len(pk), dtype=bool)
        return pa.table({
            "promo_cents": pa.array([int(cents[is_promo].sum())],
                                    pa.int64()),
            "total_cents": pa.array([int(cents.sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    promo_c = parts.sum("promo_cents") or 0
    total_c = parts.sum("total_cents") or 0
    ppm = (1_000_000 * promo_c) // total_c if total_c else 0
    return rd.from_arrow(pa.table({
        "promo_cents": pa.array([promo_c], pa.int64()),
        "total_cents": pa.array([total_c], pa.int64()),
        "promo_ppm": pa.array([ppm], pa.int64())}))


Q19_CLAUSES = (("Brand#12", 1, 5, 1, 11),
               ("Brand#23", 1, 10, 10, 20),
               ("Brand#3", 1, 15, 20, 30))


def q19_disjunctive_revenue(sf_dir: str,
                            clauses=Q19_CLAUSES) -> rd.Dataset:
    """TPC-H Q19 shape: discounted revenue under DISJUNCTIVE
    multi-table predicates — the classic "OR of brand/size/quantity
    envelopes" the optimizer literature uses to test predicate
    decomposition.

    Distributed shape: the part side collapses to one broadcast
    sorted partkey array PER CLAUSE (brand + size range are part-side
    predicates), the lineitem scan pushes the UNION quantity envelope
    into the Arrow reader (row-group pruning with the widest
    [min qty_lo, max qty_hi] bound), and each batch evaluates the
    OR as a vectorized union of per-clause (partkey ∈ set AND qty in
    range) masks before folding to one int64 revenue partial — no
    join at all, the q14 pattern with a disjunctive twist. Integer
    cents keep the oracle hash exact."""
    import pyarrow.dataset as pads

    refs = []
    for brand, size_lo, size_hi, _, _ in clauses:
        pk = rd.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey"],
            filter=((pads.field("p_brand") == brand)
                    & (pads.field("p_size") >= size_lo)
                    & (pads.field("p_size") <= size_hi))).to_pandas()
        # a clause matching nothing yields a columnless empty frame
        keys = pk["p_partkey"].to_numpy(np.int64) \
            if "p_partkey" in pk.columns else np.empty(0, np.int64)
        refs.append(ray.put(np.sort(keys)))

    qty_lo = min(c[3] for c in clauses)
    qty_hi = max(c[4] for c in clauses)
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
        filter=((pads.field("l_quantity") >= qty_lo)
                & (pads.field("l_quantity") <= qty_hi)))

    bounds = [(c[3], c[4]) for c in clauses]

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy()
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        hit = np.zeros(len(pk), dtype=bool)
        for ref, (lo, hi) in zip(refs, bounds):
            keys = ray.get(ref)
            pos = np.minimum(np.searchsorted(keys, pk),
                             max(len(keys) - 1, 0))
            in_set = (keys[pos] == pk) if len(keys) else \
                np.zeros(len(pk), dtype=bool)
            hit |= in_set & (qty >= lo) & (qty <= hi)
        cents = np.floor(price[hit] * (1 - disc[hit]) * 100) \
            .astype(np.int64)
        return pa.table({
            "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
            "n_lines": pa.array([int(hit.sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    return rd.from_arrow(pa.table({
        "revenue_cents": pa.array([parts.sum("revenue_cents") or 0],
                                  pa.int64()),
        "n_lines": pa.array([parts.sum("n_lines") or 0],
                            pa.int64())}))


def q7_volume_shipping(sf_dir: str, *,
                       nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2",
                       date_lo: str = "1995-01-01",
                       date_hi: str = "1997-01-01",
                       broadcast_limit: int = 5_000_000
                       ) -> rd.Dataset:
    """TPC-H Q7 shape: bilateral shipping volume — revenue shipped
    between two nations (supplier in one, customer in the other),
    broken out by direction and ship year.

    Distributed shape: supplier and customer both narrow to the two
    nations BEFORE anything wide runs, so each side is a sorted numpy
    broadcast (suppkey→side, custkey→side). The date-windowed orders
    slice probes the customer broadcast and — under
    ``broadcast_limit`` — itself becomes a broadcast
    (orderkey→cust_side), making the whole query ONE lineitem scan
    with map-side folds to ≤ 2×years partial rows per batch; past the
    limit the honest path joins pre-aggregated narrow lineitem
    partials (l_orderkey, supp_side, l_year, cents) against
    (o_orderkey, cust_side) on the repo's ``join_ready``-guarded hash
    join. Integer cents keep the distributed sum bit-exact vs the
    DuckDB oracle.
    """
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    n_part = _n_partitions()

    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name2key = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    if nation_a not in name2key or nation_b not in name2key:
        raise ValueError("unknown nation name")
    key_a, key_b = name2key[nation_a], name2key[nation_b]
    side_name = {0: nation_a, 1: nation_b}

    def _side_map(path: str, key_col: str, nat_col: str):
        df = pq.read_table(path, columns=[key_col, nat_col]) \
            .to_pandas()
        df = df[df[nat_col].isin([key_a, key_b])]
        df = df.sort_values(key_col)
        keys = df[key_col].to_numpy(np.int64)
        side = (df[nat_col].to_numpy(np.int64) == key_b) \
            .astype(np.int8)
        return keys, side

    s_keys, s_side = _side_map(f"{sf_dir}/supplier.parquet",
                               "s_suppkey", "s_nationkey")
    c_keys, c_side = _side_map(f"{sf_dir}/customer.parquet",
                               "c_custkey", "c_nationkey")
    supp_ref = ray.put((s_keys, s_side))
    cust_ref = ray.put((c_keys, c_side))

    empty = pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "revenue_cents": pa.array([], pa.int64())})
    if not len(s_keys) or not len(c_keys):
        return rd.from_arrow(empty)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def order_side(t: pa.Table) -> pa.Table:
        ks, side = ray.get(cust_ref)   # zero-copy broadcast read
        ck = t.column("o_custkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, ck), len(ks) - 1)
        hit = ks[pos] == ck
        return pa.table({
            "o_orderkey": pa.array(
                t.column("o_orderkey").to_numpy()[hit], pa.int64()),
            "cust_side": pa.array(side[pos[hit]].astype(np.int64),
                                  pa.int64())})

    orders = orders.map_batches(order_side,
                                batch_format="pyarrow").materialize()
    n_ord = orders.count()
    if n_ord == 0:
        return rd.from_arrow(empty)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount",
                                  "l_shipdate"])

    def _li_core(t: pa.Table):
        """shipdate window + supplier-side probe; returns the kept
        (orderkey, supp_side, year, cents) numpy columns."""
        d = t.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(
            d, pa.scalar(lo.item(), pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi.item(), pa.timestamp("us"))))
        t = t.filter(keep)
        ks, side = ray.get(supp_ref)
        sk = t.column("l_suppkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, sk), len(ks) - 1)
        hit = ks[pos] == sk
        t = t.filter(pa.array(hit))
        supp_side = side[pos[hit]].astype(np.int64)
        year = t.column("l_shipdate").to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        return (t.column("l_orderkey").to_numpy(), supp_side, year,
                cents)

    def small_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["supp_side", "l_year"], as_index=False) \
            .agg(revenue_cents=("revenue_cents", "sum"))

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            small_combine(t.to_pandas()), preserve_index=False)

    if n_ord <= broadcast_limit:
        ots = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(orders.to_arrow_refs())]
        ots = [b for b in ots if b.num_rows and b.num_columns]
        ot = pa.concat_tables(ots).combine_chunks()
        ot = ot.take(pc.sort_indices(
            ot, sort_keys=[("o_orderkey", "ascending")]))
        ord_ref = ray.put((ot.column("o_orderkey").to_numpy(),
                           ot.column("cust_side").to_numpy()))

        def li_partial(t: pa.Table) -> pa.Table:
            ok, supp_side, year, cents = _li_core(t)
            ks, cside = ray.get(ord_ref)
            pos = np.minimum(np.searchsorted(ks, ok),
                             max(len(ks) - 1, 0))
            hit = (ks[pos] == ok) if len(ks) else \
                np.zeros(len(ok), dtype=bool)
            # opposite sides only: (a→b) or (b→a)
            cs = cside[pos]
            hit &= cs != supp_side
            df = pd.DataFrame({"supp_side": supp_side[hit],
                               "l_year": year[hit],
                               "revenue_cents": cents[hit]})
            return pa.Table.from_pandas(small_combine(df),
                                        preserve_index=False)

        partials = li.map_batches(li_partial, batch_format="pyarrow")
    else:
        def li_narrow(t: pa.Table) -> pa.Table:
            ok, supp_side, year, cents = _li_core(t)
            df = pd.DataFrame({"l_orderkey": ok,
                               "supp_side": supp_side,
                               "l_year": year,
                               "revenue_cents": cents})
            g = df.groupby(["l_orderkey", "supp_side", "l_year"],
                           sort=False, as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        narrow = li.map_batches(li_narrow, batch_format="pyarrow")
        from ..functions.dedup import join_ready
        joined = narrow.join(join_ready(orders, n_part),
                             join_type="inner",
                             num_partitions=n_part,
                             on=("l_orderkey",),
                             right_on=("o_orderkey",))

        def opposite(t: pa.Table) -> pa.Table:
            keep = pc.not_equal(t.column("supp_side"),
                                t.column("cust_side"))
            t = t.filter(keep)
            return pa.Table.from_pandas(small_combine(pd.DataFrame({
                "supp_side": t.column("supp_side").to_numpy(),
                "l_year": t.column("l_year").to_numpy(),
                "revenue_cents": t.column("revenue_cents")
                                  .to_numpy()})),
                preserve_index=False)

        partials = joined.map_batches(opposite,
                                      batch_format="pyarrow")

    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(partials, fold_block)
    if not tables:
        return rd.from_arrow(empty)
    merged = small_combine(pa.concat_tables(tables).to_pandas())
    merged["supp_nation"] = merged["supp_side"].map(side_name)
    merged["cust_nation"] = (1 - merged["supp_side"]).map(side_name)
    merged = merged.sort_values(
        ["supp_nation", "cust_nation", "l_year"])
    return rd.from_arrow(pa.table({
        "supp_nation": pa.array(merged["supp_nation"], pa.string()),
        "cust_nation": pa.array(merged["cust_nation"], pa.string()),
        "l_year": pa.array(merged["l_year"].to_numpy(np.int64),
                           pa.int64()),
        "revenue_cents": pa.array(
            merged["revenue_cents"].to_numpy(np.int64), pa.int64())}))


def q8_market_share(sf_dir: str, *, nation: str = "NATION_6",
                    region: str = "AMERICA",
                    p_type: str = "STANDARD",
                    date_lo: str = "1995-01-01",
                    date_hi: str = "1997-01-01",
                    broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """TPC-H Q8 shape: national market share — the target nation's
    fraction of revenue for one part type sold into one customer
    region, by order year.

    Distributed shape: part-type keys and the suppkey→is-target-nation
    map are sorted numpy broadcasts; the date-windowed orders slice
    probes a region-customer key broadcast and becomes
    (orderkey→year) — broadcast under ``broadcast_limit`` so the whole
    query is ONE lineitem scan folding to ≤ years partial rows per
    batch (total/nation int64 cents), else the ``join_ready`` hash
    join moves pre-aggregated narrow partials. The ppm division
    happens once per year on two exact int64 sums — hash-stable vs
    the DuckDB oracle.
    """
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    n_part = _n_partitions()

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    name2key = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    if nation not in name2key:
        raise ValueError("unknown nation name")
    target_key = name2key[nation]
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"]
    region_nkeys = nat.loc[nat["n_regionkey"].isin(rk),
                           "n_nationkey"].to_numpy(np.int64)

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_type"]).to_pandas()
    part_keys = np.sort(pk.loc[pk["p_type"] == p_type, "p_partkey"]
                        .to_numpy(np.int64))
    sp = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas().sort_values("s_suppkey")
    s_keys = sp["s_suppkey"].to_numpy(np.int64)
    s_target = (sp["s_nationkey"].to_numpy(np.int64) == target_key) \
        .astype(np.int8)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]) \
        .to_pandas()
    cust_keys = np.sort(cust.loc[cust["c_nationkey"]
                                 .isin(region_nkeys), "c_custkey"]
                        .to_numpy(np.int64))

    empty = pa.table({"o_year": pa.array([], pa.int64()),
                      "total_cents": pa.array([], pa.int64()),
                      "nation_cents": pa.array([], pa.int64()),
                      "share_ppm": pa.array([], pa.int64())})
    if not len(part_keys) or not len(cust_keys) or not len(s_keys):
        return rd.from_arrow(empty)

    part_ref = ray.put(part_keys)
    supp_ref = ray.put((s_keys, s_target))
    cust_ref = ray.put(cust_keys)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= lo.item())
                & (pads.field("o_orderdate") < hi.item())))

    def order_year(t: pa.Table) -> pa.Table:
        ks = ray.get(cust_ref)   # zero-copy broadcast read
        ck = t.column("o_custkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, ck), len(ks) - 1)
        hit = ks[pos] == ck
        t = t.filter(pa.array(hit))
        year = t.column("o_orderdate").to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_year": pa.array(year, pa.int64())})

    orders = orders.map_batches(order_year,
                                batch_format="pyarrow").materialize()
    n_ord = orders.count()
    if n_ord == 0:
        return rd.from_arrow(empty)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_suppkey", "l_extendedprice",
                                  "l_discount"])

    def _li_core(t: pa.Table):
        pks = ray.get(part_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.minimum(np.searchsorted(pks, lp), len(pks) - 1)
        t = t.filter(pa.array(pks[pos] == lp))
        ks, tgt = ray.get(supp_ref)
        sk = t.column("l_suppkey").to_numpy()
        spos = np.minimum(np.searchsorted(ks, sk), len(ks) - 1)
        is_tgt = np.where(ks[spos] == sk, tgt[spos], 0) \
            .astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        return t.column("l_orderkey").to_numpy(), is_tgt, cents

    def small_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_year", as_index=False) \
            .agg(total_cents=("total_cents", "sum"),
                 nation_cents=("nation_cents", "sum"))

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            small_combine(t.to_pandas()), preserve_index=False)

    if n_ord <= broadcast_limit:
        ots = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(orders.to_arrow_refs())]
        ots = [b for b in ots if b.num_rows and b.num_columns]
        ot = pa.concat_tables(ots).combine_chunks()
        ot = ot.take(pc.sort_indices(
            ot, sort_keys=[("o_orderkey", "ascending")]))
        ord_ref = ray.put((ot.column("o_orderkey").to_numpy(),
                           ot.column("o_year").to_numpy()))

        def li_partial(t: pa.Table) -> pa.Table:
            ok, is_tgt, cents = _li_core(t)
            ks, yr = ray.get(ord_ref)
            pos = np.minimum(np.searchsorted(ks, ok),
                             max(len(ks) - 1, 0))
            hit = (ks[pos] == ok) if len(ks) else \
                np.zeros(len(ok), dtype=bool)
            df = pd.DataFrame({
                "o_year": yr[pos[hit]],
                "total_cents": cents[hit],
                "nation_cents": cents[hit] * is_tgt[hit]})
            return pa.Table.from_pandas(small_combine(df),
                                        preserve_index=False)

        partials = li.map_batches(li_partial, batch_format="pyarrow")
    else:
        def li_narrow(t: pa.Table) -> pa.Table:
            ok, is_tgt, cents = _li_core(t)
            df = pd.DataFrame({"l_orderkey": ok,
                               "total_cents": cents,
                               "nation_cents": cents * is_tgt})
            g = df.groupby("l_orderkey", sort=False,
                           as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        narrow = li.map_batches(li_narrow, batch_format="pyarrow")
        from ..functions.dedup import join_ready
        joined = narrow.join(join_ready(orders, n_part),
                             join_type="inner",
                             num_partitions=n_part,
                             on=("l_orderkey",),
                             right_on=("o_orderkey",))

        def rekey(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(small_combine(pd.DataFrame({
                "o_year": t.column("o_year").to_numpy(),
                "total_cents": t.column("total_cents").to_numpy(),
                "nation_cents": t.column("nation_cents").to_numpy()})),
                preserve_index=False)

        partials = joined.map_batches(rekey, batch_format="pyarrow")

    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(partials, fold_block)
    if not tables:
        return rd.from_arrow(empty)
    merged = small_combine(pa.concat_tables(tables).to_pandas())
    merged = merged.sort_values("o_year")
    tot = merged["total_cents"].to_numpy(np.int64)
    natc = merged["nation_cents"].to_numpy(np.int64)
    ppm = np.where(tot > 0, (1_000_000 * natc) // np.maximum(tot, 1),
                   0).astype(np.int64)
    return rd.from_arrow(pa.table({
        "o_year": pa.array(merged["o_year"].to_numpy(np.int64),
                           pa.int64()),
        "total_cents": pa.array(tot, pa.int64()),
        "nation_cents": pa.array(natc, pa.int64()),
        "share_ppm": pa.array(ppm, pa.int64())}))


def q15_top_supplier(sf_dir: str, *, date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01") -> rd.Dataset:
    """TPC-H Q15 shape: top supplier(s) — revenue per supplier over a
    one-quarter ship window, returning every supplier tied at the
    maximum (the reference query's correlated MAX subquery).

    Distributed shape: the quarter predicate pushes into the scan;
    each batch folds to (l_suppkey, cents) partials, the repo's
    hash-partitioned aggregate finishes the supplier totals (supplier
    cardinality is SF×10k — the small side of lineitem by 4 orders of
    magnitude), and the driver takes the MAX + ties over that already
    tiny table. s_name attaches from a driver-read dimension probe.
    Integer cents keep the MAX comparison bit-exact vs DuckDB.
    """
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo.item())
                & (pads.field("l_shipdate") < hi.item())))

    def partial(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        df = pd.DataFrame({"l_suppkey": t.column("l_suppkey")
                           .to_numpy(), "total_revenue_cents": cents})
        g = df.groupby("l_suppkey", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def by_supp(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_suppkey", as_index=False) \
            .agg(total_revenue_cents=("total_revenue_cents", "sum"))

    from ..stages.hashagg import hash_aggregate
    per_supp = hash_aggregate(li.map_batches(partial,
                                             batch_format="pyarrow"),
                              ["l_suppkey"], by_supp)

    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(per_supp)
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "total_revenue_cents": pa.array([], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(tables).to_pandas()
    best = merged["total_revenue_cents"].max()
    top = merged[merged["total_revenue_cents"] == best] \
        .sort_values("l_suppkey")

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    keys = top["l_suppkey"].to_numpy(np.int64)
    return rd.from_arrow(pa.table({
        "s_suppkey": pa.array(keys, pa.int64()),
        "s_name": pa.array([name.get(int(k), "") for k in keys],
                           pa.string()),
        "total_revenue_cents": pa.array(
            top["total_revenue_cents"].to_numpy(np.int64),
            pa.int64())}))


def q17_small_quantity_revenue(sf_dir: str, *,
                               brand: str = "Brand#23") -> rd.Dataset:
    """TPC-H Q17 shape: small-quantity-order revenue — average yearly
    revenue lost if orders below 20% of a part's average quantity were
    no longer taken, for one brand (the schema carries no
    p_container, so brand is the whole filter).

    Distributed shape: the brand partkey set broadcasts into BOTH
    passes over the brand-filtered lineitem slice (1/|brands| of the
    table). Pass 1 folds (l_partkey, Σq100, count) partials through
    the hash aggregate into a per-part threshold table — bounded by
    the brand's part count, so it broadcasts back as three sorted
    numpy arrays. Pass 2 keeps rows with ``5·q100·count < Σq100``
    (exact integers — quantity scaled ×100, the 0.2 factor folded
    into the 5× on the left) and folds extendedprice cents. The /7
    "yearly average" happens once on the exact int64 sum — bit-exact
    vs DuckDB (the `//` numerator is provably non-negative).
    """
    import pyarrow.parquet as pq

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand"]).to_pandas()
    part_keys = np.sort(pk.loc[pk["p_brand"] == brand, "p_partkey"]
                        .to_numpy(np.int64))
    empty = pa.table({"avg_yearly_cents": pa.array([0], pa.int64()),
                      "n_lines": pa.array([0], pa.int64())})
    if not len(part_keys):
        return rd.from_arrow(empty)
    part_ref = ray.put(part_keys)

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def brand_slice(t: pa.Table) -> pa.Table:
        ks = ray.get(part_ref)   # zero-copy broadcast read
        lp = t.column("l_partkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, lp), len(ks) - 1)
        return t.filter(pa.array(ks[pos] == lp))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=li_cols)

    def qty_partial(t: pa.Table) -> pa.Table:
        t = brand_slice(t)
        q100 = np.round(t.column("l_quantity").to_numpy() * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"l_partkey": t.column("l_partkey")
                           .to_numpy(), "sum_q100": q100,
                           "cnt": np.ones(len(q100), np.int64)})
        g = df.groupby("l_partkey", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def by_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", as_index=False) \
            .agg(sum_q100=("sum_q100", "sum"), cnt=("cnt", "sum"))

    from ..stages.hashagg import hash_aggregate
    from ..functions.fold import bounded_fold_tables
    per_part = hash_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_partkey"], by_part)
    tables = bounded_fold_tables(per_part)
    if not tables:
        return rd.from_arrow(empty)
    agg = pa.concat_tables(tables).to_pandas() \
        .sort_values("l_partkey")
    thr_ref = ray.put((agg["l_partkey"].to_numpy(np.int64),
                       agg["sum_q100"].to_numpy(np.int64),
                       agg["cnt"].to_numpy(np.int64)))

    def small_partial(t: pa.Table) -> pa.Table:
        t = brand_slice(t)
        ks, s, c = ray.get(thr_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, lp),
                         max(len(ks) - 1, 0))
        hit = (ks[pos] == lp) if len(ks) else \
            np.zeros(len(lp), dtype=bool)
        q100 = np.round(t.column("l_quantity").to_numpy() * 100.0) \
            .astype(np.int64)
        hit &= 5 * q100 * c[pos] < s[pos]
        cents = np.floor(t.column("l_extendedprice").to_numpy()[hit]
                         * 100.0).astype(np.int64)
        return pa.table({
            "cents": pa.array([int(cents.sum())], pa.int64()),
            "n_lines": pa.array([int(hit.sum())], pa.int64())})

    li2 = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=li_cols)
    parts = li2.map_batches(small_partial, batch_format="pyarrow") \
        .materialize()
    total = parts.sum("cents") or 0
    n = parts.sum("n_lines") or 0
    return rd.from_arrow(pa.table({
        "avg_yearly_cents": pa.array([total // 7], pa.int64()),
        "n_lines": pa.array([n], pa.int64())}))


def q21_waiting_suppliers(sf_dir: str, *, limit: int = 20,
                          broadcast_limit: int = 5_000_000
                          ) -> rd.Dataset:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the
    EXISTS / NOT-EXISTS double-correlated self-join, adapted to this
    schema (no commit/receipt dates): for finished orders
    (``o_orderstatus = 'F'``) touched by ≥2 distinct suppliers where
    EXACTLY ONE supplier produced returned lines
    (``l_returnflag = 'R'``), charge that supplier; report the top
    ``limit`` suppliers by count.

    Distributed shape: two narrow hash exchanges replace the classic
    triple self-join — (1) distinct (orderkey, suppkey, max has_r)
    pairs, (2) per-order sums of (n_supp=1, n_r=has_r,
    r_supp=suppkey·has_r) — so the "exactly one R supplier" test is
    ``n_r == 1`` and its culprit is the exact sum ``r_supp``. The
    F-order membership probes a broadcast sorted orderkey set under
    ``broadcast_limit`` (else the ``join_ready`` hash join). The
    final per-supplier count is supplier-cardinality small; top-k is
    per-batch partials + a bounded driver merge.
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    n_part = _n_partitions()
    from ..functions.dedup import join_ready
    from ..functions.fold import bounded_fold_tables
    from ..stages.hashagg import hash_aggregate

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_returnflag"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": t.column("l_orderkey").to_numpy(),
            "l_suppkey": t.column("l_suppkey").to_numpy(),
            "has_r": pc.equal(t.column("l_returnflag"), "R")
                       .to_numpy(zero_copy_only=False)
                       .astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["l_orderkey", "l_suppkey"], sort=False,
                       as_index=False).agg(has_r=("has_r", "max")),
            preserve_index=False)

    def pair_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_orderkey", "l_suppkey"],
                          as_index=False).agg(has_r=("has_r", "max"))

    pairs = hash_aggregate(
        li.map_batches(pair_partial, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"], pair_combine,
        num_partitions=n_part)

    def order_moments(df: pd.DataFrame) -> pd.DataFrame:
        if "n_supp" not in df.columns:
            df = pd.DataFrame({
                "l_orderkey": df["l_orderkey"],
                "n_supp": np.ones(len(df), np.int64),
                "n_r": df["has_r"].to_numpy(np.int64),
                "r_supp": df["l_suppkey"].to_numpy(np.int64)
                * df["has_r"].to_numpy(np.int64)})
        return df.groupby("l_orderkey", as_index=False) \
            .agg(n_supp=("n_supp", "sum"), n_r=("n_r", "sum"),
                 r_supp=("r_supp", "sum"))

    per_order = hash_aggregate(pairs, ["l_orderkey"], order_moments,
                               num_partitions=n_part)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=(pads.field("o_orderstatus") == "F")).materialize()
    n_f = orders.count()
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "numwait": pa.array([], pa.int64())})
    if n_f == 0:
        return rd.from_arrow(empty)

    def culprit_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n_supp"] >= 2) & (df["n_r"] == 1)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"][keep],
            "s_suppkey": df["r_supp"][keep].astype(np.int64)})

    if n_f <= broadcast_limit:
        fdf = orders.to_pandas()
        f_ref = ray.put(np.sort(fdf["o_orderkey"]
                                .to_numpy(np.int64)))

        def culprits(df: pd.DataFrame) -> pd.DataFrame:
            df = culprit_filter(df)
            ks = ray.get(f_ref)   # zero-copy broadcast read
            ok = df["l_orderkey"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(ks, ok),
                             max(len(ks) - 1, 0))
            hit = (ks[pos] == ok) if len(ks) else \
                np.zeros(len(ok), dtype=bool)
            return df[hit]

        culprit_rows = per_order.map_batches(culprits,
                                             batch_format="pandas")
    else:
        narrowed = per_order.map_batches(culprit_filter,
                                         batch_format="pandas")
        nr = narrowed.materialize()
        if nr.count() == 0:
            return rd.from_arrow(empty)
        culprit_rows = join_ready(nr, n_part).join(
            join_ready(orders, n_part), join_type="inner",
            num_partitions=n_part,
            on=("l_orderkey",), right_on=("o_orderkey",))

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        if "s_suppkey" not in df.columns:
            return pd.DataFrame({"s_suppkey": [], "numwait": []})
        if "numwait" not in df.columns:
            df = pd.DataFrame({"s_suppkey": df["s_suppkey"],
                               "numwait": np.ones(len(df),
                                                  np.int64)})
        return df.groupby("s_suppkey", as_index=False) \
            .agg(numwait=("numwait", "sum"))

    per_supp = hash_aggregate(culprit_rows, ["s_suppkey"],
                              count_partial, num_partitions=n_part)
    tables = bounded_fold_tables(per_supp)
    if not tables:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(
        [t.cast(pa.schema([("s_suppkey", pa.int64()),
                           ("numwait", pa.int64())]))
         for t in tables]).to_pandas()

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    merged["s_name"] = merged["s_suppkey"].map(
        lambda k: name.get(int(k), ""))
    merged = merged.sort_values(
        ["numwait", "s_name"], ascending=[False, True]).head(limit)
    return rd.from_arrow(pa.table({
        "s_suppkey": pa.array(merged["s_suppkey"].to_numpy(np.int64),
                              pa.int64()),
        "s_name": pa.array(merged["s_name"], pa.string()),
        "numwait": pa.array(merged["numwait"].to_numpy(np.int64),
                            pa.int64())}))


Q22_NATIONS = (1, 5, 8, 12, 15, 18, 21)


def q22_sales_opportunity(sf_dir: str, *,
                          nationkeys=Q22_NATIONS,
                          dormant_since: str = "2000-06-01",
                          broadcast_limit: int = 5_000_000
                          ) -> rd.Dataset:
    """TPC-H Q22 shape: global sales opportunity — above-average-
    balance customers in a 7-country set with no recent orders
    (schema-adapted: nationkey set replaces the phone-prefix country
    code, and "no orders since ``dormant_since``" replaces "no orders
    ever" — this corpus gives every customer an order history).

    Distributed shape: pass 1 folds the candidate slice to two int64
    scalars (Σ positive balance cents, count) so the AVG threshold is
    the exact rational ``bal·n > Σ`` — no float average anywhere.
    The anti-join probes a broadcast sorted array of recently-active
    custkeys under ``broadcast_limit`` (the date-windowed distinct
    custkey set), else Ray's hash ``left_anti`` join through
    ``join_ready``. The final per-nation rollup is ≤25 rows — a
    bounded driver fold.
    """
    import pyarrow.dataset as pads

    since = np.datetime64(dormant_since, "us")
    n_part = _n_partitions()
    nset = pa.array(np.asarray(sorted(nationkeys), np.int64))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def cand_slice(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("c_nationkey"),
                              value_set=nset))
        bal = np.round(t.column("c_acctbal").to_numpy() * 100.0) \
            .astype(np.int64)
        return pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
            "bal_cents": pa.array(bal, pa.int64())})

    cand = cust.map_batches(cand_slice,
                            batch_format="pyarrow").materialize()

    def thr_partial(t: pa.Table) -> pa.Table:
        bal = t.column("bal_cents").to_numpy()
        pos = bal[bal > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([int(len(pos))], pa.int64())})

    thr = cand.map_batches(thr_partial,
                           batch_format="pyarrow").materialize()
    s_tot = thr.sum("s") or 0
    n_pos = thr.sum("n") or 0
    empty = pa.table({"c_nationkey": pa.array([], pa.int64()),
                      "numcust": pa.array([], pa.int64()),
                      "totacctbal_cents": pa.array([], pa.int64())})
    if n_pos == 0:
        return rd.from_arrow(empty)

    def above_avg(t: pa.Table) -> pa.Table:
        bal = t.column("bal_cents").to_numpy()
        return t.filter(pa.array(bal * n_pos > s_tot))

    rich = cand.map_batches(above_avg, batch_format="pyarrow") \
        .materialize()
    if rich.count() == 0:
        return rd.from_arrow(empty)

    active = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=(pads.field("o_orderdate") >= since.item()))

    def distinct_cust(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(
            t.column("o_custkey")).cast(pa.int64())})

    active = active.map_batches(distinct_cust,
                                batch_format="pyarrow").materialize()
    n_act = active.count()

    if n_act <= broadcast_limit:
        ats = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(active.to_arrow_refs())]
        ats = [b for b in ats if b.num_rows and b.num_columns]
        act = np.unique(np.concatenate(
            [b.column("o_custkey").to_numpy() for b in ats])) \
            if ats else np.empty(0, np.int64)
        act_ref = ray.put(act)

        def dormant(t: pa.Table) -> pa.Table:
            ks = ray.get(act_ref)   # zero-copy broadcast read
            ck = t.column("c_custkey").to_numpy()
            if not len(ks):
                return t
            pos = np.minimum(np.searchsorted(ks, ck), len(ks) - 1)
            return t.filter(pa.array(ks[pos] != ck))

        dorm = rich.map_batches(dormant, batch_format="pyarrow")
    else:
        from ..functions.dedup import join_ready
        dorm = join_ready(rich, n_part).join(
            join_ready(active, n_part), join_type="left_anti",
            num_partitions=n_part,
            on=("c_custkey",), right_on=("o_custkey",))

    def nation_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_nationkey": t.column("c_nationkey").to_numpy(),
            "numcust": np.ones(t.num_rows, np.int64),
            "totacctbal_cents": t.column("bal_cents").to_numpy()})
        return pa.Table.from_pandas(
            df.groupby("c_nationkey", as_index=False).sum(),
            preserve_index=False)

    from ..functions.fold import bounded_fold_tables
    parts = dorm.map_batches(nation_partial, batch_format="pyarrow")
    tables = bounded_fold_tables(parts, nation_partial)
    if not tables:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(tables).to_pandas() \
        .groupby("c_nationkey", as_index=False).sum() \
        .sort_values("c_nationkey")
    return rd.from_arrow(pa.table({
        "c_nationkey": pa.array(merged["c_nationkey"]
                                .to_numpy(np.int64), pa.int64()),
        "numcust": pa.array(merged["numcust"].to_numpy(np.int64),
                            pa.int64()),
        "totacctbal_cents": pa.array(
            merged["totacctbal_cents"].to_numpy(np.int64),
            pa.int64())}))


def q9_product_profit(sf_dir: str, *, name_token: str = "bolt",
                      cost_pct: int = 60,
                      broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """TPC-H Q9 shape: product-type profit by supplier nation and
    order year, for parts whose name contains ``name_token``
    (schema-adapted: no partsupp table, so supply cost is modeled as
    ``cost_pct``% of ``p_retailprice`` — the profit formula keeps
    Q9's two-term "revenue − quantity·cost" structure).

    Distributed shape: the matching parts broadcast as
    (partkey → cost-cents) sorted arrays, supplier as
    (suppkey → nationkey); lineitem folds map-side to per-batch
    (l_orderkey, n_nationkey, profit_cents) partials — profit =
    ``floor(ep·(1−disc)·100) − q·cost_cents`` exactly in int64 — and
    the one wide exchange attaches the order year (broadcast
    orderkey→year under ``broadcast_limit``, else the ``join_ready``
    hash join), finishing in a ≤ nations×years driver fold.
    """
    import pyarrow.parquet as pq

    n_part = _n_partitions()

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name",
                                "p_retailprice"]).to_pandas()
    pk = pk[pk["p_name"].str.contains(name_token, regex=False)] \
        .sort_values("p_partkey")
    part_keys = pk["p_partkey"].to_numpy(np.int64)
    # integer cost cents: cost_pct% of retail, floored once per part
    cost_cents = (np.floor(pk["p_retailprice"].to_numpy() * 100.0)
                  .astype(np.int64) * cost_pct) // 100

    sp = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas().sort_values("s_suppkey")
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nation_name = dict(zip(nat["n_nationkey"].astype(int),
                           nat["n_name"]))

    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "o_year": pa.array([], pa.int64()),
                      "profit_cents": pa.array([], pa.int64())})
    if not len(part_keys):
        return rd.from_arrow(empty)

    part_ref = ray.put((part_keys, cost_cents))
    supp_ref = ray.put((sp["s_suppkey"].to_numpy(np.int64),
                        sp["s_nationkey"].to_numpy(np.int64)))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def order_year(t: pa.Table) -> pa.Table:
        year = t.column("o_orderdate").to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_year": pa.array(year, pa.int64())})

    orders = orders.map_batches(order_year,
                                batch_format="pyarrow").materialize()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_suppkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def _li_core(t: pa.Table):
        ks, cost = ray.get(part_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.minimum(np.searchsorted(ks, lp), len(ks) - 1)
        hit = ks[pos] == lp
        t = t.filter(pa.array(hit))
        c = cost[pos[hit]]
        sk, snat = ray.get(supp_ref)
        sp_ = t.column("l_suppkey").to_numpy()
        spos = np.minimum(np.searchsorted(sk, sp_), len(sk) - 1)
        nkey = snat[spos]
        q = np.round(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        profit = np.floor(ep * (1.0 - disc) * 100.0) \
            .astype(np.int64) - q * c
        return t.column("l_orderkey").to_numpy(), nkey, profit

    def small_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["n_nationkey", "o_year"],
                          as_index=False) \
            .agg(profit_cents=("profit_cents", "sum"))

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            small_combine(t.to_pandas()), preserve_index=False)

    n_ord = orders.count()
    if n_ord == 0:
        return rd.from_arrow(empty)
    if n_ord <= broadcast_limit:
        ots = [b if isinstance(b, pa.Table)
               else pa.Table.from_pandas(b, preserve_index=False)
               for b in ray.get(orders.to_arrow_refs())]
        ots = [b for b in ots if b.num_rows and b.num_columns]
        ot = pa.concat_tables(ots).combine_chunks()
        ot = ot.take(pc.sort_indices(
            ot, sort_keys=[("o_orderkey", "ascending")]))
        ord_ref = ray.put((ot.column("o_orderkey").to_numpy(),
                           ot.column("o_year").to_numpy()))

        def li_partial(t: pa.Table) -> pa.Table:
            ok, nkey, profit = _li_core(t)
            ks, yr = ray.get(ord_ref)
            pos = np.minimum(np.searchsorted(ks, ok),
                             max(len(ks) - 1, 0))
            df = pd.DataFrame({"n_nationkey": nkey,
                               "o_year": yr[pos],
                               "profit_cents": profit})
            return pa.Table.from_pandas(small_combine(df),
                                        preserve_index=False)

        partials = li.map_batches(li_partial, batch_format="pyarrow")
    else:
        def li_narrow(t: pa.Table) -> pa.Table:
            ok, nkey, profit = _li_core(t)
            df = pd.DataFrame({"l_orderkey": ok,
                               "n_nationkey": nkey,
                               "profit_cents": profit})
            g = df.groupby(["l_orderkey", "n_nationkey"],
                           sort=False, as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        narrow = li.map_batches(li_narrow, batch_format="pyarrow")
        from ..functions.dedup import join_ready
        joined = narrow.join(join_ready(orders, n_part),
                             join_type="inner",
                             num_partitions=n_part,
                             on=("l_orderkey",),
                             right_on=("o_orderkey",))

        def rekey(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(small_combine(pd.DataFrame({
                "n_nationkey": t.column("n_nationkey").to_numpy(),
                "o_year": t.column("o_year").to_numpy(),
                "profit_cents": t.column("profit_cents")
                                 .to_numpy()})),
                preserve_index=False)

        partials = joined.map_batches(rekey, batch_format="pyarrow")

    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(partials, fold_block)
    if not tables:
        return rd.from_arrow(empty)
    merged = small_combine(pa.concat_tables(tables).to_pandas())
    merged["n_name"] = merged["n_nationkey"].map(nation_name)
    merged = merged.sort_values(["n_name", "o_year"])
    return rd.from_arrow(pa.table({
        "n_name": pa.array(merged["n_name"], pa.string()),
        "o_year": pa.array(merged["o_year"].to_numpy(np.int64),
                           pa.int64()),
        "profit_cents": pa.array(
            merged["profit_cents"].to_numpy(np.int64), pa.int64())}))


# ------------------------------------------------ synthetic partsupp
# The driver tables carry no partsupp; Q2/Q11/Q16/Q20 run over a
# DETERMINISTIC synthetic one derived from part × 4 supplier slots —
# the same synth-rule-IS-the-oracle coupling as synth/corpus.py (the
# SQL twin below replays the identical integer arithmetic). Slot
# suppkeys (p_partkey + i·17) % n_supp are distinct per part whenever
# n_supp > 51 (all driver scales). Everything stays non-negative so
# DuckDB's truncating % / // agree with numpy (CLAUDE.md invariant).

PS_SLOTS = 4


def _partsupp_arrays(part_keys: np.ndarray, n_supp: int):
    """Vectorized synthetic partsupp rows for the given part keys:
    (ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents)."""
    pk = np.repeat(part_keys.astype(np.int64), PS_SLOTS)
    i = np.tile(np.arange(PS_SLOTS, dtype=np.int64), len(part_keys))
    supp = (pk + i * 17) % n_supp
    qty = (pk * 7 + i * 13) % 1000 + 1
    cost = (pk * 31 + i * 97) % 90001 + 10000
    return pk, supp, qty, cost


def partsupp_cte() -> str:
    """DuckDB twin of ``_partsupp_arrays`` over the part view."""
    return """
        SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
               CAST((p_partkey + i * 17) %
                    (SELECT COUNT(*) FROM supplier) AS BIGINT)
                   AS ps_suppkey,
               CAST((p_partkey * 7 + i * 13) % 1000 + 1 AS BIGINT)
                   AS ps_availqty,
               CAST((p_partkey * 31 + i * 97) % 90001 + 10000
                    AS BIGINT) AS ps_supplycost_cents
        FROM part CROSS JOIN (SELECT unnest(range(4)) AS i)"""


def _n_supp(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(f"{sf_dir}/supplier.parquet") \
        .metadata.num_rows


def q2_min_cost_supplier(sf_dir: str, *, size: int = 7,
                         type_: str = "ECONOMY",
                         region: str = "EUROPE") -> rd.Dataset:
    """TPC-H Q2 shape: for every part of a given size and type, the
    region's supplier(s) offering it at the minimum supply cost
    (ties keep every minimum-cost supplier, like the reference's
    correlated MIN subquery).

    Distributed shape: supplier⋈nation⋈region is a driver-read
    dimension probe (suppliers are the 10k-per-SF side) broadcast as
    sorted arrays; the part scan filter-pushes size+type; partsupp
    rows are GENERATED in the same map_batches that consumes each
    part batch — all 4 slots of a part are co-batch by construction,
    so the per-part MIN is taken in-batch and NOTHING shuffles:
    scan → one vectorized task stage → result.
    """
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet").to_pandas()
    n_supp = len(sup)
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"]
                .astype(int))
    nat = nat[nat["n_regionkey"].astype(int).isin(rkeys)]
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = sup[sup["s_nationkey"].astype(int).isin(nname)] \
        .sort_values("s_suppkey")
    sk = sup["s_suppkey"].to_numpy(np.int64)
    s_name = sup["s_name"].to_numpy(object)
    s_acct = np.floor(sup["s_acctbal"].to_numpy() * 100.0) \
        .astype(np.int64)
    s_nat = sup["s_nationkey"].to_numpy(np.int64)
    dim_ref = ray.put((sk, s_name, s_acct, s_nat))

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=((pads.field("p_size") == size)
                & (pads.field("p_type") == type_)))

    def min_cost(t: pa.Table) -> pa.Table:
        sk, s_name, s_acct, s_nat = ray.get(dim_ref)
        keys = t.column("p_partkey").to_numpy()
        pk, supp, _, cost = _partsupp_arrays(keys, n_supp)
        if len(sk):
            pos = np.minimum(np.searchsorted(sk, supp), len(sk) - 1)
            hit = sk[pos] == supp
        else:
            pos = np.zeros(len(supp), dtype=np.int64)
            hit = np.zeros(len(supp), dtype=bool)
        pk, supp, cost, pos = pk[hit], supp[hit], cost[hit], pos[hit]
        if len(pk):
            # per-part min over the (≤4) surviving slots: all slots
            # of a part are contiguous in this batch
            dfm = pd.DataFrame({"pk": pk, "cost": cost})
            mins = dfm.groupby("pk")["cost"].transform("min")
            keep = cost == mins.to_numpy()
        else:
            keep = np.zeros(0, dtype=bool)
        pk, supp, cost, pos = (pk[keep], supp[keep], cost[keep],
                               pos[keep])
        return pa.table({
            "s_acctbal_cents": pa.array(s_acct[pos], pa.int64()),
            "s_name": pa.array(s_name[pos].tolist(), pa.string()),
            "n_name": pa.array(
                [nname[int(n)] for n in s_nat[pos]], pa.string()),
            "p_partkey": pa.array(pk, pa.int64()),
            "ps_supplycost_cents": pa.array(cost, pa.int64())})

    return parts.map_batches(min_cost, batch_format="pyarrow")


def q2_oracle_sql(size: int = 7, type_: str = "ECONOMY",
                  region: str = "EUROPE") -> str:
    return f"""
        WITH partsupp AS ({partsupp_cte()}),
        rs AS (
          SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                 CAST(FLOOR(s_acctbal * 100) AS BIGINT)
                     AS s_acctbal_cents, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = '{region}'),
        cand AS (
          SELECT p.ps_partkey, p.ps_suppkey, p.ps_supplycost_cents
          FROM partsupp p
          JOIN rs ON p.ps_suppkey = rs.s_suppkey
          JOIN part ON p_partkey = p.ps_partkey
          WHERE p_size = {size} AND p_type = '{type_}'
          QUALIFY p.ps_supplycost_cents =
                  MIN(p.ps_supplycost_cents)
                      OVER (PARTITION BY p.ps_partkey))
        SELECT rs.s_acctbal_cents, rs.s_name, rs.n_name,
               CAST(cand.ps_partkey AS BIGINT) AS p_partkey,
               cand.ps_supplycost_cents
        FROM cand JOIN rs ON cand.ps_suppkey = rs.s_suppkey"""


def q11_important_stock(sf_dir: str, *, nation: str = "NATION_7",
                        frac_den: int = 1000) -> rd.Dataset:
    """TPC-H Q11 shape: per-part inventory value (Σ cost·availqty)
    over one nation's suppliers, keeping parts whose value exceeds
    total/frac_den. Exact int64 cents.

    Distributed shape: the nation's supplier keys broadcast; partsupp
    generates in the part scan's map stage with the per-part value
    reduced in-batch (slots are co-batch) — no exchange; the
    value table (≤ one narrow row per part) is materialized once,
    its total read off a Sum aggregate, and the threshold filter is
    one more vectorized pass.
    """
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nk = set(nat[nat["n_name"] == nation]["n_nationkey"].astype(int))
    n_supp = len(sup)
    keys = np.sort(sup[sup["s_nationkey"].astype(int).isin(nk)]
                   ["s_suppkey"].to_numpy(np.int64))
    key_ref = ray.put(keys)

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"])

    def value(t: pa.Table) -> pa.Table:
        sk = ray.get(key_ref)
        pk, supp, qty, cost = _partsupp_arrays(
            t.column("p_partkey").to_numpy(), n_supp)
        if len(sk):
            pos = np.minimum(np.searchsorted(sk, supp), len(sk) - 1)
            hit = sk[pos] == supp
        else:
            hit = np.zeros(len(supp), dtype=bool)
        dfm = pd.DataFrame({"ps_partkey": pk[hit],
                            "value_cents": qty[hit] * cost[hit]})
        g = dfm.groupby("ps_partkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    vals = parts.map_batches(value,
                             batch_format="pyarrow").materialize()
    total = vals.sum("value_cents") or 0
    floor = total // frac_den

    def keep(t: pa.Table) -> pa.Table:
        v = t.column("value_cents").to_numpy()
        return t.filter(pa.array(v > floor))

    return vals.map_batches(keep, batch_format="pyarrow")


def q11_oracle_sql(nation: str = "NATION_7",
                   frac_den: int = 1000) -> str:
    return f"""
        WITH partsupp AS ({partsupp_cte()}),
        ns AS (
          SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = '{nation}'),
        v AS (
          SELECT ps_partkey,
                 CAST(SUM(ps_supplycost_cents * ps_availqty)
                      AS BIGINT) AS value_cents
          FROM partsupp JOIN ns ON ps_suppkey = ns.s_suppkey
          GROUP BY ps_partkey)
        SELECT ps_partkey, value_cents FROM v
        WHERE value_cents >
              (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
                  // {frac_den}"""


def q16_parts_supplier_relationship(
        sf_dir: str, *, brand: str = "Brand#2", type_: str = "PROMO",
        sizes: tuple = (1, 4, 7, 10, 13, 16, 19, 22)) -> rd.Dataset:
    """TPC-H Q16 shape: distinct supplier count per
    (p_brand, p_type, p_size) for parts NOT of the excluded
    brand/type and within the size list, minus "complaint" suppliers
    (schema-adapted: no s_comment column, so the excluded-supplier
    set is the deterministic ``s_suppkey % 10 == 0`` — mirrored in
    the SQL twin).

    Distributed shape: the part scan generates partsupp rows
    map-side; stage 1 hash-partitions the (brand, type, size,
    suppkey) quadruples with a drop-duplicates combiner (idempotent),
    stage 2 hash-partitions the now-globally-distinct quadruples by
    group key and sums ones — two narrow exchanges, no sort, no
    distinct-of-distinct error.
    """
    import pyarrow.dataset as pads

    from ..stages.hashagg import hash_aggregate

    n_supp = _n_supp(sf_dir)

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=((pads.field("p_brand") != brand)
                & (pads.field("p_type") != type_)
                & (pads.field("p_size").isin(list(sizes)))))

    def quads(t: pa.Table) -> pa.Table:
        keys = t.column("p_partkey").to_numpy()
        _, supp, _, _ = _partsupp_arrays(keys, n_supp)
        ok = supp % 10 != 0                    # complaint stand-in
        rep = np.repeat(np.arange(t.num_rows), PS_SLOTS)[ok]
        return pa.table({
            "p_brand": t.column("p_brand").take(pa.array(rep)),
            "p_type": t.column("p_type").take(pa.array(rep)),
            "p_size": pa.array(
                t.column("p_size").to_numpy()[rep].astype(np.int64),
                pa.int64()),
            "ps_suppkey": pa.array(supp[ok], pa.int64())})

    qk = ["p_brand", "p_type", "p_size", "ps_suppkey"]
    distinct = hash_aggregate(
        parts.map_batches(quads, batch_format="pyarrow"),
        qk, lambda df: df.drop_duplicates(qk))

    def ones(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["ps_suppkey"])
        df["supplier_cnt"] = np.int64(1)
        return df

    gk = ["p_brand", "p_type", "p_size"]
    return hash_aggregate(
        distinct.map_batches(ones, batch_format="pandas"),
        gk,
        lambda df: df.groupby(gk, as_index=False)["supplier_cnt"]
                     .sum())


def q16_oracle_sql(brand: str = "Brand#2", type_: str = "PROMO",
                   sizes: tuple = (1, 4, 7, 10, 13, 16, 19, 22)
                   ) -> str:
    inlist = ", ".join(str(s) for s in sizes)
    return f"""
        WITH partsupp AS ({partsupp_cte()})
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT)
                   AS supplier_cnt
        FROM partsupp JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> '{brand}' AND p_type <> '{type_}'
          AND p_size IN ({inlist})
          AND ps_suppkey % 10 <> 0
        GROUP BY 1, 2, 3"""


def q20_potential_promotion(sf_dir: str, *,
                            name_token: str = "bolt",
                            year: int = 1996,
                            nation: str = "NATION_3") -> rd.Dataset:
    """TPC-H Q20 shape: suppliers in one nation holding excess stock
    of a promoted part — ps_availqty > half the quantity they shipped
    of that part in the target year (2·availqty > Σqty in exact
    int64; pairs with no shipments are excluded, matching the
    reference's NULL-comparison semantics).

    Distributed shape: matching part keys broadcast; lineitem
    filter-pushes the ship year and semi-filters map-side, folding to
    (l_partkey, l_suppkey, qty) per-batch partials finished by the
    hash-partitioned aggregate (pair cardinality ≤ parts×slots — the
    narrow side); the synthetic partsupp for the matching parts and
    the nation's supplier names are driver-built dimension probes the
    final ≤-pairs merge joins against.
    """
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    from ..functions.fold import bounded_fold_tables
    from ..stages.hashagg import hash_aggregate

    n_supp = _n_supp(sf_dir)
    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name"]).to_pandas()
    pk = pk[pk["p_name"].str.contains(name_token, regex=False)]
    part_keys = np.sort(pk["p_partkey"].to_numpy(np.int64))
    key_ref = ray.put(part_keys)

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name",
                                 "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nk = set(nat[nat["n_name"] == nation]["n_nationkey"].astype(int))
    sup = sup[sup["s_nationkey"].astype(int).isin(nk)]
    sname = dict(zip(sup["s_suppkey"].astype(int), sup["s_name"]))

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=((pads.field("l_shipdate") >= lo.item())
                & (pads.field("l_shipdate") < hi.item())))

    def partial(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        lp = t.column("l_partkey").to_numpy()
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, lp), len(ks) - 1)
            hit = ks[pos] == lp
        else:
            hit = np.zeros(len(lp), dtype=bool)
        dfm = pd.DataFrame({
            "l_partkey": lp[hit],
            "l_suppkey": t.column("l_suppkey").to_numpy()[hit],
            "qty": t.column("l_quantity").to_numpy()[hit]
                   .astype(np.int64)})
        g = dfm.groupby(["l_partkey", "l_suppkey"],
                        as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = hash_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        lambda df: df.groupby(["l_partkey", "l_suppkey"],
                              as_index=False)["qty"].sum())

    tables = [t for t in bounded_fold_tables(sums) if t.num_rows]
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string())})
    if not tables:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(tables).to_pandas()

    ppk, psupp, pqty, _ = _partsupp_arrays(part_keys, n_supp)
    ps = pd.DataFrame({"l_partkey": ppk, "l_suppkey": psupp,
                       "availqty": pqty})
    j = merged.merge(ps, on=["l_partkey", "l_suppkey"], how="inner")
    j = j[2 * j["availqty"] > j["qty"]]
    out = sorted({int(s) for s in j["l_suppkey"] if int(s) in sname})
    return rd.from_arrow(pa.table({
        "s_suppkey": pa.array(out, pa.int64()),
        "s_name": pa.array([sname[s] for s in out], pa.string())}))


def q20_oracle_sql(name_token: str = "bolt", year: int = 1996,
                   nation: str = "NATION_3") -> str:
    return f"""
        WITH partsupp AS ({partsupp_cte()}),
        shipped AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                     AS qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
            AND l_shipdate < TIMESTAMP '{year + 1}-01-01'
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%{name_token}%')
          GROUP BY 1, 2)
        SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS s_suppkey,
               s_name
        FROM partsupp
        JOIN shipped ON ps_partkey = l_partkey
                    AND ps_suppkey = l_suppkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{nation}'
          AND 2 * ps_availqty > qty"""
