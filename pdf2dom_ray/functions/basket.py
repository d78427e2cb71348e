"""Market-basket association over per-key item sets (support/lift).

The association-rule primitive (Agrawal & Srikant's Apriori output
layer): for every unordered pair of items co-occurring in a key's
basket — event types per user, hosts per session, tags per document —
report exact integer support and LIFT

    lift_ppm(a, b) = (1e6 · n_ab · N) // (n_a · n_b)

(> 1e6 means the pair attracts, < 1e6 repels; the engagement-analysis
and bundle-detection number). All-integer (the CLAUDE.md rule);
n_ab·N < 2^63 bounds to ~3e9 baskets.

Distributed shape (single-exchange after the basket dedup): per-batch
DISTINCT (key, item) combiners → one narrow (key, item) hash-partition
groupby co-locating each basket → per-partition fused emission of
pair counts AND per-item totals AND kept-basket counts (the cap is
enforced basket-locally, so no driver-side (basket, item) collect is
ever needed) → one small (kind, item_a, item_b) groupby whose output
is bounded by the item universe (items² + items + 1 rows) — only THAT
dashboard-small table reaches the driver. Pair emission per basket is
bounded by C(items-per-basket, 2); a ``basket_cap`` guard drops
pathological baskets whole, the way index.py caps hot postings
(documented, and the SQL twin applies the same cap)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["basket_lift", "basket_oracle_sql"]

# row-kind discriminator in the fused exchange (a separate column, not
# an in-band sentinel: "" is a legal item value)
_K_PAIR, _K_ITEM, _K_BASKET = 0, 1, 2


def basket_lift(ds: rd.Dataset, *, key_col: str = "user_id",
                item_col: str = "event_type",
                basket_cap: int = 64) -> rd.Dataset:
    """(item_a, item_b, n_ab, n_a, n_b, n_baskets, lift_ppm) for
    every co-occurring unordered item pair (a < b); baskets larger
    than ``basket_cap`` distinct items are dropped whole (both
    sides)."""
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object),
            "item": np.asarray(t.column(item_col).to_pandas(),
                               dtype=object)}).drop_duplicates()
        return pa.table({
            "key": pa.array(df["key"].astype(str).tolist(),
                            pa.string()),
            "item": pa.array(df["item"].tolist(), pa.string())})

    def dedup_baskets(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["key", "item"])

    baskets = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key", "item"], dedup_baskets)

    def emit(g: pd.DataFrame) -> pa.Table:
        """Per hash partition (all of each basket is local): emit
        pair-count rows, per-item total rows and one basket-count
        row per kept basket — the cap decision is basket-local, so
        everything the lift formula needs rides ONE exchange."""
        empty = pa.table({"k": pa.array([], pa.int8()),
                          "item_a": pa.array([], pa.string()),
                          "item_b": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if not len(g):
            return empty
        ks, outs_a, outs_b = [], [], []
        for _, grp in g.groupby("key", sort=False):
            items = np.sort(np.asarray(grp["item"].unique(),
                                       dtype=object))
            if len(items) > basket_cap:
                continue                     # dropped whole
            ks.append(np.full(len(items), _K_ITEM, dtype=np.int8))
            outs_a.append(items)
            outs_b.append(np.full(len(items), "", dtype=object))
            ks.append(np.array([_K_BASKET], dtype=np.int8))
            outs_a.append(np.array([""], dtype=object))
            outs_b.append(np.array([""], dtype=object))
            if len(items) >= 2:
                ia, ib = np.triu_indices(len(items), k=1)
                ks.append(np.full(len(ia), _K_PAIR, dtype=np.int8))
                outs_a.append(items[ia])
                outs_b.append(items[ib])
        if not ks:
            return empty
        df = pd.DataFrame({"k": np.concatenate(ks),
                           "item_a": np.concatenate(outs_a),
                           "item_b": np.concatenate(outs_b)}) \
            .groupby(["k", "item_a", "item_b"], as_index=False).size()
        return pa.table({
            "k": pa.array(df["k"].to_numpy(np.int8), pa.int8()),
            "item_a": pa.array(df["item_a"].tolist(), pa.string()),
            "item_b": pa.array(df["item_b"].tolist(), pa.string()),
            "c": pa.array(df["size"].to_numpy(np.int64),
                          pa.int64())})

    # one map_groups call per HASH PARTITION, not per basket — the
    # in-call per-key loop over tiny baskets is cheap, per-group
    # callable dispatch over thousands of baskets is not
    P = scale_partitions()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["key"], index=False)
        return df.assign(__part=(h % P).astype("int64").to_numpy())

    agg = _to_arrow_blocks(
        baskets.map_batches(tag, batch_format="pandas")
        .groupby("__part").map_groups(emit, batch_format="pandas")
        .groupby(["k", "item_a", "item_b"])
        .aggregate(Sum("c", alias_name="n"))).to_pandas()
    if not len(agg):
        return rd.from_arrow(_empty())
    n_baskets = int(agg.loc[agg["k"] == _K_BASKET, "n"].sum())
    it = agg[agg["k"] == _K_ITEM]
    item_tot = pd.Series(it["n"].to_numpy(np.int64),
                         index=it["item_a"])
    pairs = agg[agg["k"] == _K_PAIR]
    if not len(pairs) or n_baskets == 0:
        return rd.from_arrow(_empty())
    na = item_tot.reindex(pairs["item_a"]).to_numpy(np.int64)
    nb = item_tot.reindex(pairs["item_b"]).to_numpy(np.int64)
    nab = pairs["n"].to_numpy(np.int64)
    lift = (1_000_000 * nab * n_baskets) // (na * nb)
    return rd.from_arrow(pa.table({
        "item_a": pa.array(pairs["item_a"].tolist(), pa.string()),
        "item_b": pa.array(pairs["item_b"].tolist(), pa.string()),
        "n_ab": pa.array(nab, pa.int64()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nb, pa.int64()),
        "n_baskets": pa.array(
            np.full(len(nab), n_baskets, dtype=np.int64),
            pa.int64()),
        "lift_ppm": pa.array(lift.astype(np.int64), pa.int64())}))


def _empty() -> pa.Table:
    return pa.table({
        "item_a": pa.array([], pa.string()),
        "item_b": pa.array([], pa.string()),
        "n_ab": pa.array([], pa.int64()),
        "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()),
        "n_baskets": pa.array([], pa.int64()),
        "lift_ppm": pa.array([], pa.int64())})


def basket_oracle_sql(rows_cte: str, *, key_col: str = "user_id",
                      item_col: str = "event_type",
                      basket_cap: int = 64) -> str:
    """Distinct-basket pair join twin with the same cap."""
    return f"""
        WITH b0 AS MATERIALIZED (
            SELECT DISTINCT CAST({key_col} AS VARCHAR) AS key,
                   {item_col} AS item
            FROM ({rows_cte})),
        ok AS MATERIALIZED (
            SELECT key FROM b0 GROUP BY key
            HAVING count(*) <= {basket_cap}),
        b AS MATERIALIZED (
            SELECT b0.* FROM b0 JOIN ok USING (key)),
        nb AS MATERIALIZED (
            SELECT CAST(count(DISTINCT key) AS BIGINT) AS n FROM b),
        tot AS MATERIALIZED (
            SELECT item, CAST(count(*) AS BIGINT) AS c
            FROM b GROUP BY 1),
        p AS MATERIALIZED (
            SELECT x.item AS item_a, y.item AS item_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM b x JOIN b y ON x.key = y.key AND x.item < y.item
            GROUP BY 1, 2)
        SELECT p.item_a, p.item_b, p.n_ab,
               ta.c AS n_a, tb.c AS n_b, nb.n AS n_baskets,
               CAST((1000000 * p.n_ab * nb.n) // (ta.c * tb.c)
                    AS BIGINT) AS lift_ppm
        FROM p JOIN tot ta ON ta.item = p.item_a
               JOIN tot tb ON tb.item = p.item_b
        CROSS JOIN nb"""
