"""Heavy hitters: a mergeable Misra-Gries top-k sketch.

The frequency twin of the HLL distinct sketch (`functions/hll.py`):
find the most frequent tokens of a corpus in one pass with bounded
memory. Exact counting needs vocabulary-sized state; the Misra-Gries
summary keeps at most ``capacity`` counters and guarantees, for every
token, ``counter <= true_count <= counter + err`` where ``err`` is the
total mass subtracted by compressions — any token with true count
above ``n_tokens / capacity`` is guaranteed present (the classic
frequent-elements bound, Misra & Gries 1982; merge rule from Agarwal
et al., "Mergeable Summaries", PODS 2012).

Distributed shape mirrors HLL: each batch builds an exact local
Counter (vectorized Arrow token split + pandas value_counts), cuts it
to a summary, and the driver folds one ``capacity``-sized summary per
block — O(blocks x capacity) driver state, no shuffle at all. The
merge (sum counters -> subtract the (capacity+1)-th largest -> drop
non-positive, accumulating the subtraction into ``err``) is
associative and commutative, so the result is partition-invariant.

When ``capacity`` >= the true vocabulary size no compression ever
fires, err stays 0, and the sketch IS the exact top-k — the regime
the SQL oracle checks (the synthetic vocab is tiny); tests exercise
the lossy regime's bounds separately.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["mg_merge", "top_tokens_sketch"]


def _compress(counts: dict, capacity: int) -> tuple[dict, int]:
    """Cut to <= capacity counters; returns (counters, subtracted)."""
    if len(counts) <= capacity:
        return counts, 0
    vals = sorted(counts.values(), reverse=True)
    m = vals[capacity]          # (capacity+1)-th largest
    out = {t: c - m for t, c in counts.items() if c > m}
    return out, m


def mg_merge(a: tuple[dict, int], b: tuple[dict, int],
             capacity: int) -> tuple[dict, int]:
    """Merge two (counters, err) summaries (associative/commutative)."""
    counts = dict(a[0])
    for t, c in b[0].items():
        counts[t] = counts.get(t, 0) + c
    counts, m = _compress(counts, capacity)
    return counts, a[1] + b[1] + m


def top_tokens_sketch(ds: rd.Dataset, *, k: int = 20,
                      capacity: int = 4096,
                      text_col: str = "text") -> pa.Table:
    """Top-k tokens by (bounded-error) count: (token, count_min,
    count_max) rows, count desc then token asc. count_min == count_max
    whenever no compression fired (capacity >= vocab)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(col, " "))
        vc = flat.to_pandas().value_counts()
        counts, m = _compress(
            dict(zip(vc.index, vc.to_numpy().astype(int))), capacity)
        return pa.table({
            "token": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
            "err": pa.array([m] + [0] * (len(counts) - 1)
                            if counts else [], pa.int64()),
        })

    summary: tuple[dict, int] = ({}, 0)
    for block in ray.get(
            ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()):
        if not block.num_rows:
            continue
        blk = (dict(zip(block.column("token").to_pylist(),
                        block.column("n").to_pylist())),
               int(pa.compute.sum(block.column("err")).as_py() or 0))
        summary = mg_merge(summary, blk, capacity)

    counts, err = summary
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "token": pa.array([t for t, _ in rows], pa.string()),
        "count_min": pa.array([c for _, c in rows], pa.int64()),
        "count_max": pa.array([c + err for _, c in rows], pa.int64()),
    })
