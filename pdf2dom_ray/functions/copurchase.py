"""Co-purchase part pairs (the retail "bought together" self-join).

Classic market-basket pair mining over the order fact table: two
parts co-occur when some order contains lines for both; report the
top pairs by distinct-order support. (The events-table analog is
``functions/basket.py`` — this one exercises the lineitem self-join
shape TPC-H users actually run.)

Scale shape: NO self-join. One hash exchange co-locates each order's
lines (orderkey-keyed, same space as every other lineitem exchange);
each partition emits its orders' distinct-part pairs vectorized —
fan-out per order is C(k,2) with k = lines/order, a SCHEMA-bounded
constant (≤7 here, ~[1,7] in TPC-H), so the pair stream is O(rows),
never O(rows²). Pair counts then collapse through the standard
combiner → hash-aggregate chain and the top-k is per-batch partials
+ a bounded driver merge with a total (count desc, pa, pb) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["copurchase_pairs", "copurchase_oracle_sql"]


def copurchase_pairs(sf_dir: str, *, limit: int = 20,
                     num_partitions: int | None = None) -> rd.Dataset:
    """Top ``limit`` (part_a, part_b, n_orders) pairs, part_a <
    part_b, ordered by (n_orders desc, part_a, part_b)."""
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def dedup_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates()
        out = out.copy()
        h = pd.util.hash_pandas_object(out["l_orderkey"],
                                       index=False)
        out["__part"] = (h % num_partitions).astype("int64") \
            .to_numpy()
        return out

    tagged = li.map_batches(dedup_partial, batch_format="pandas")

    def emit_pairs(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__part").drop_duplicates()
        g = g.sort_values(["l_orderkey", "l_partkey"],
                          kind="mergesort")
        ok = g["l_orderkey"].to_numpy(np.int64)
        pk = g["l_partkey"].to_numpy(np.int64)
        # vectorized within-order pair emission: for each order run
        # of length k, all C(k,2) (i<j) index pairs
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        empty = pa.table({"pa_": pa.array([], pa.int64()),
                          "pb_": pa.array([], pa.int64()),
                          "n_orders": pa.array([], pa.int64())})
        kmax = int(lens.max()) if len(lens) else 0
        if kmax < 2:
            return empty
        ia, ib = [], []
        for d1 in range(kmax - 1):
            for d2 in range(d1 + 1, kmax):
                sel = lens > d2
                if not sel.any():
                    break
                s = starts[sel]
                ia.append(s + d1)
                ib.append(s + d2)
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        a, b = pk[ia], pk[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi          # same part twice in an order
        df = pd.DataFrame({"pa_": lo[keep], "pb_": hi[keep],
                           "n_orders": np.ones(keep.sum(),
                                               np.int64)})
        agg = df.groupby(["pa_", "pb_"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    pairs = tagged.groupby("__part").map_groups(emit_pairs,
                                                batch_format="pandas")

    def pair_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["pa_", "pb_"], as_index=False) \
            .agg(n_orders=("n_orders", "sum"))

    from ..stages.hashagg import hash_aggregate
    counts = hash_aggregate(pairs, ["pa_", "pb_"], pair_combine,
                            num_partitions=num_partitions)

    def topk_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if not t.num_rows:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("n_orders", "descending"),
                          ("pa_", "ascending"),
                          ("pb_", "ascending")])
        return t.take(idx[:limit])

    from .fold import bounded_fold_tables
    parts = counts.map_batches(topk_partial, batch_format="pyarrow")
    tables = bounded_fold_tables(parts, topk_partial)
    schema = pa.schema([("pa_", pa.int64()), ("pb_", pa.int64()),
                        ("n_orders", pa.int64())])
    if not tables:
        return rd.from_arrow(schema.empty_table())
    import pyarrow.compute as pc
    merged = pa.concat_tables([t.cast(schema) for t in tables])
    idx = pc.sort_indices(
        merged, sort_keys=[("n_orders", "descending"),
                           ("pa_", "ascending"),
                           ("pb_", "ascending")])
    top = merged.take(idx[:limit])
    return rd.from_arrow(pa.table({
        "part_a": top.column("pa_").cast(pa.int64()),
        "part_b": top.column("pb_").cast(pa.int64()),
        "n_orders": top.column("n_orders").cast(pa.int64())}))


def copurchase_oracle_sql(limit: int = 20) -> str:
    return f"""
        WITH op AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pr AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 COUNT(*) AS n_orders
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
        SELECT CAST(part_a AS BIGINT) AS part_a,
               CAST(part_b AS BIGINT) AS part_b,
               CAST(n_orders AS BIGINT) AS n_orders
        FROM pr
        ORDER BY n_orders DESC, part_a, part_b LIMIT {limit}
    """
