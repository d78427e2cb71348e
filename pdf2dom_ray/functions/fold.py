"""Bounded driver-side folds.

Several k-row / sketch-row pipelines finish with a driver concat over
per-block partials (the takeOrdered pattern). That concat is k×blocks
rows — fine at sandbox block counts, a 10⁷-row driver table at ~10⁶
blocks. ``bounded_fold_tables`` inserts ONE distributed pre-merge
round when the block count exceeds ``max_blocks``: repartition to
~√blocks and re-apply the caller's partial combine once per merged
block, bounding the driver concat at O(k·√blocks) rows. Below the
threshold it is a plain ``ray.get`` of the block refs (zero extra
passes — the common case on small/medium runs).
"""

from __future__ import annotations

import math

import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["bounded_fold_tables"]


def bounded_fold_tables(ds: rd.Dataset, per_block=None, *,
                        max_blocks: int = 64) -> list[pa.Table]:
    """Arrow tables of ``ds`` for a driver-side fold.

    ``per_block``: the same idempotent partial-combine the caller
    already applied map-side (Arrow table → Arrow table); re-applied
    once per merged block in the pre-merge round. ``None`` skips the
    pre-merge (pure fetch). Empty / schema-less blocks are dropped
    (sort-aggregate artifacts; see CLAUDE.md).
    """
    m = ds.materialize()
    nb = m.num_blocks()
    if per_block is not None and nb > max_blocks:
        m = (m.repartition(max(1, math.isqrt(nb)))
              .map_batches(per_block, batch_format="pyarrow",
                           batch_size=None)
              .materialize())
    tabs = [b if isinstance(b, pa.Table)
            else pa.Table.from_pandas(b, preserve_index=False)
            for b in ray.get(m.to_arrow_refs())]
    return [b for b in tabs if b.num_rows and b.num_columns]
