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
    from .dedup import join_ready

    out_names, out_child, out_orph = [], [], []
    for name, child, child_key, parent, parent_key in pairs:
        pk = parent.select_columns([parent_key])

        def pk_partial(t: pa.Table, _k=parent_key) -> pa.Table:
            return pa.table({"k": pa.array(
                np.unique(t.column(_k).to_numpy()), pa.int64())})

        keys_ds = pk.map_batches(pk_partial, batch_format="pyarrow")
        tabs = [b for b in ray.get(keys_ds.to_arrow_refs())
                if b.num_columns]
        keys = np.unique(np.concatenate(
            [b.column("k").to_numpy() for b in tabs])) if tabs else \
            np.empty(0, dtype=np.int64)

        if len(keys) <= broadcast_limit:
            keys_ref = ray.put(keys)

            def probe(t: pa.Table, _k=child_key) -> pa.Table:
                kv = ray.get(keys_ref)
                ck = t.column(_k).to_numpy()
                pos = np.minimum(np.searchsorted(kv, ck),
                                 max(len(kv) - 1, 0))
                hit = (kv[pos] == ck) if len(kv) else \
                    np.zeros(len(ck), dtype=bool)
                return pa.table({
                    "n": pa.array([len(ck)], pa.int64()),
                    "orph": pa.array([int((~hit).sum())],
                                     pa.int64())})

            parts = child.select_columns([child_key]).map_batches(
                probe, batch_format="pyarrow").materialize()
            n_child = int(parts.sum("n") or 0)
            n_orph = int(parts.sum("orph") or 0)
        else:                        # honest big-dimension path
            P = n_part or scale_partitions()
            ckeys = child.select_columns([child_key])
            n_child = ckeys.count()
            pkeys = rd.from_arrow(pa.table({
                parent_key: pa.array(keys, pa.int64())})) \
                if tabs else parent.select_columns([parent_key])
            anti = join_ready(ckeys, P).join(
                join_ready(pkeys, P), join_type="left_anti",
                num_partitions=P, on=(child_key,),
                right_on=(parent_key,))
            n_orph = anti.count()
        out_names.append(name)
        out_child.append(n_child)
        out_orph.append(n_orph)

    return rd.from_arrow(pa.table({
        "relationship": pa.array(out_names, pa.string()),
        "n_child": pa.array(out_child, pa.int64()),
        "n_orphans": pa.array(out_orph, pa.int64())}))


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
