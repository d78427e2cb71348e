"""Market-basket association over per-key item sets (support/lift).

The association-rule primitive (Agrawal & Srikant's Apriori output
layer): for every unordered pair of items co-occurring in a key's
basket — event types per user, hosts per session, tags per document —
report exact integer support and LIFT

    lift_ppm(a, b) = (1e6 · n_ab · N) // (n_a · n_b)

(> 1e6 means the pair attracts, < 1e6 repels; the engagement-analysis
and bundle-detection number). All-integer (the CLAUDE.md rule);
n_ab·N < 2^63 bounds to ~3e9 baskets.

Distributed shape: per-batch DISTINCT (key, item) combiners → one
narrow (key, item) groupby co-locating each basket → per-basket pair
emission bounded by C(items-per-basket, 2) — the item universe is
dashboard-small (event types, tags), so baskets are tiny by
construction; a ``basket_cap`` guard drops pathological baskets the
way index.py caps hot postings (documented, and the SQL twin applies
the same cap) → one pair groupby + broadcast item totals."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["basket_lift", "basket_oracle_sql"]


def basket_lift(ds: rd.Dataset, *, key_col: str = "user_id",
                item_col: str = "event_type",
                basket_cap: int = 64) -> rd.Dataset:
    """(item_a, item_b, n_ab, n_a, n_b, n_baskets, lift_ppm) for
    every co-occurring unordered item pair (a < b); baskets larger
    than ``basket_cap`` distinct items are dropped whole (both
    sides)."""
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

    from ..stages.hashagg import hash_aggregate
    baskets = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key", "item"], dedup_baskets).materialize()
    # cap filter + item totals collect the DISTINCT (basket, item)
    # relation — O(baskets·items) driver rows, fine for dashboard
    # item universes; past ~1e7 rows move both into groupbys (the
    # pair stage below already re-enforces the cap in-group)
    tabs = [b for b in ray.get(baskets.to_arrow_refs())
            if getattr(b, "num_columns", 0)]
    if not tabs:
        return rd.from_arrow(_empty())
    flat = pa.concat_tables(tabs).to_pandas()
    sizes = flat.groupby("key").size()
    keep_keys = set(sizes[sizes <= basket_cap].index)
    flat = flat[flat["key"].isin(keep_keys)]
    if not len(flat):
        return rd.from_arrow(_empty())
    n_baskets = int(flat["key"].nunique())
    item_tot = flat.groupby("item").size()

    def emit_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"item_a": pa.array([], pa.string()),
                          "item_b": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if not len(g):
            return empty
        outs_a, outs_b = [], []
        for _, grp in g.groupby("key", sort=False):
            items = np.sort(np.asarray(grp["item"].unique(),
                                       dtype=object))
            if len(items) < 2 or len(items) > basket_cap:
                continue
            ia, ib = np.triu_indices(len(items), k=1)
            outs_a.append(items[ia])
            outs_b.append(items[ib])
        if not outs_a:
            return empty
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        df = pd.DataFrame({"item_a": a, "item_b": b}) \
            .groupby(["item_a", "item_b"], as_index=False).size()
        return pa.table({
            "item_a": pa.array(df["item_a"].tolist(), pa.string()),
            "item_b": pa.array(df["item_b"].tolist(), pa.string()),
            "c": pa.array(df["size"].to_numpy(np.int64),
                          pa.int64())})

    # one map_groups call per HASH PARTITION, not per basket — the
    # in-call per-key loop over tiny baskets is cheap, per-group
    # callable dispatch over thousands of baskets is not
    from ..scale import scale_partitions
    P = scale_partitions()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["key"], index=False)
        return df.assign(__part=(h % P).astype("int64").to_numpy())

    pair_counts = _to_arrow_blocks(
        baskets.map_batches(tag, batch_format="pandas")
        .groupby("__part").map_groups(emit_pairs,
                                      batch_format="pandas")
        .groupby(["item_a", "item_b"])
        .aggregate(Sum("c", alias_name="n_ab"))).to_pandas()
    if not len(pair_counts):
        return rd.from_arrow(_empty())
    na = item_tot.reindex(pair_counts["item_a"]).to_numpy(np.int64)
    nb = item_tot.reindex(pair_counts["item_b"]).to_numpy(np.int64)
    nab = pair_counts["n_ab"].to_numpy(np.int64)
    lift = (1_000_000 * nab * n_baskets) // (na * nb)
    return rd.from_arrow(pa.table({
        "item_a": pa.array(pair_counts["item_a"].tolist(),
                           pa.string()),
        "item_b": pa.array(pair_counts["item_b"].tolist(),
                           pa.string()),
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
