"""Referential-integrity audit: orphan foreign keys per relationship.

The first ETL health check on any freshly-landed warehouse drop:
"does every fact row still have its dimension parent?" A nonzero
orphan count after an ingest means a partial load, a truncated
partition, or key drift — caught here before any join silently drops
rows. Emits one row per declared relationship:

    (relationship, n_child, n_orphans)

all int64 (COUNTs — trivially hash-exact).

Distributed shape per relationship: the parent key UNIVERSE collapses
to a broadcast sorted int64 array (dimension side — one distinct
pass, `ray.put` once) and each child batch folds to a single orphan-
count partial via a searchsorted membership probe — no join, no
shuffle, O(blocks) scalar rows to the driver. Past
``broadcast_limit`` parent keys the honest fallback is a
``join_ready``-guarded left_anti hash join (the linedup.py pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["fk_orphans", "fk_orphans_oracle_sql"]


def fk_orphans(pairs, *, broadcast_limit: int = 50_000_000,
               n_part: int | None = None) -> rd.Dataset:
    """``pairs``: list of (name, child_ds, child_key, parent_ds,
    parent_key). Returns (relationship, n_child, n_orphans) rows."""
    from ..scale import scale_partitions

    # group relationships by their child Dataset: every child table
    # is scanned ONCE with a single multi-parent probe pass (the
    # lineitem trio would otherwise pay three parquet scans)
    grouped: dict = {}
    order = []
    for name, child, child_key, parent, parent_key in pairs:
        grouped.setdefault(id(child), (child, []))[1].append(
            (name, child_key, parent, parent_key))
        order.append(name)

    # collect every parent-key universe CONCURRENTLY — each is its
    # own small Ray job and the serial per-dimension materialize was
    # the dominant fixed cost of the audit (one thread per parent;
    # the GIL releases while each waits on its job)
    from concurrent.futures import ThreadPoolExecutor
    all_parents = [(name, parent, parent_key)
                   for _, specs in grouped.values()
                   for name, _, parent, parent_key in specs]
    with ThreadPoolExecutor(max_workers=max(len(all_parents), 1)) \
            as ex:
        key_futs = {name: ex.submit(_parent_keys, parent, pk)
                    for name, parent, pk in all_parents}
        key_arrays = {name: f.result()
                      for name, f in key_futs.items()}

    results: dict = {}
    for child, specs in grouped.values():
        broadcastable = []
        for name, child_key, parent, parent_key in specs:
            keys = key_arrays[name]
            if len(keys) <= broadcast_limit:
                broadcastable.append((name, child_key,
                                      ray.put(keys)))
            else:
                results[name] = _anti_join_count(
                    child, child_key, keys, parent, parent_key,
                    n_part or scale_partitions())
        if broadcastable:
            cols = sorted({ck for _, ck, _ in broadcastable})

            def probe(t: pa.Table, _bc=tuple(broadcastable)
                      ) -> pa.Table:
                out = {"n": pa.array([t.num_rows], pa.int64())}
                for name_, ck_, ref_ in _bc:
                    kv = ray.get(ref_)
                    c = t.column(ck_).to_numpy()
                    pos = np.minimum(np.searchsorted(kv, c),
                                     max(len(kv) - 1, 0))
                    hit = (kv[pos] == c) if len(kv) else \
                        np.zeros(len(c), dtype=bool)
                    out[name_] = pa.array([int((~hit).sum())],
                                          pa.int64())
                return pa.table(out)

            parts = child.select_columns(cols).map_batches(
                probe, batch_format="pyarrow").materialize()
            # one direct block fetch — a .sum() per column would be
            # a separate Ray job each (measured ~0.1 s apiece)
            tabs = [b for b in ray.get(parts.to_arrow_refs())
                    if b.num_columns and b.num_rows]
            folded = pa.concat_tables(tabs) if tabs else None
            n_child = int(folded.column("n").to_numpy().sum()) \
                if folded is not None else 0
            for name_, _, _ in broadcastable:
                cnt = int(folded.column(name_).to_numpy().sum()) \
                    if folded is not None else 0
                results[name_] = (n_child, cnt)

    return rd.from_arrow(pa.table({
        "relationship": pa.array(order, pa.string()),
        "n_child": pa.array([results[n][0] for n in order],
                            pa.int64()),
        "n_orphans": pa.array([results[n][1] for n in order],
                              pa.int64())}))


def _parent_keys(parent: rd.Dataset, parent_key: str) -> np.ndarray:
    def pk_partial(t: pa.Table, _k=parent_key) -> pa.Table:
        return pa.table({"k": pa.array(
            np.unique(t.column(_k).to_numpy()), pa.int64())})

    tabs = [b for b in ray.get(
        parent.select_columns([parent_key])
        .map_batches(pk_partial, batch_format="pyarrow")
        .to_arrow_refs()) if b.num_columns]
    return np.unique(np.concatenate(
        [b.column("k").to_numpy() for b in tabs])) if tabs else \
        np.empty(0, dtype=np.int64)


def _anti_join_count(child, child_key, keys, parent, parent_key,
                     P):
    """Honest big-dimension path: left_anti hash join count."""
    from .dedup import join_ready

    ckeys = child.select_columns([child_key])
    n_child = ckeys.count()
    pkeys = rd.from_arrow(pa.table({
        parent_key: pa.array(keys, pa.int64())})) if len(keys) else \
        parent.select_columns([parent_key])
    anti = join_ready(ckeys, P).join(
        join_ready(pkeys, P), join_type="left_anti",
        num_partitions=P, on=(child_key,), right_on=(parent_key,))
    return n_child, anti.count()


def fk_orphans_oracle_sql(specs) -> str:
    """``specs``: list of (name, child_table, child_key, parent_table,
    parent_key) — UNION ALL of per-relationship orphan counts."""
    parts = []
    for name, ct, ck, pt, pk in specs:
        parts.append(f"""
            SELECT '{name}' AS relationship,
                   CAST(count(*) AS BIGINT) AS n_child,
                   CAST(SUM(CASE WHEN NOT EXISTS (
                        SELECT 1 FROM {pt} WHERE {pt}.{pk} = c.{ck})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM {ct} c""")
    return " UNION ALL ".join(parts)
