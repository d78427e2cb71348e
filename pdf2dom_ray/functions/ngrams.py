"""Bigram collocation statistics — LM-style co-occurrence counts.

The n-gram statistics pass of a training-data pipeline (phrase
tables, collocation mining, tokenizer-merge candidates): adjacent
token pairs counted corpus-wide, enriched with each side's unigram
frequency and an association score.

Shape: per-batch Counter partials (narrow (w1, w2, c) rows — the
payload never shuffles), one groupby merge per table, then two hash
joins against the unigram table to attach c1/c2 — the standard
"enrich aggregate with dimension" pattern, done as joins rather than
a broadcast because a real corpus vocabulary (10^7+ tokens) outgrows
a driver-side map.

The association score is the **rational core of PMI** in integer
arithmetic: ``assoc_ppm = c12 * 1_000_000 // (c1 * c2)`` — monotone
in PMI at fixed corpus size, and exactly reproducible in SQL (a float
log would differ in last-ulp libm flavor between engines).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["bigram_stats"]


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def bigram_stats(ds: rd.Dataset, *, text_col: str = "text",
                 min_count: int = 1) -> rd.Dataset:
    """(w1, w2, c12, c1, c2, assoc_ppm) over adjacent token pairs."""

    def uni_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            c.update(w for w in (text or "").split(" ") if w)
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_col).to_pylist():
            toks = [w for w in (text or "").split(" ") if w]
            c.update(zip(toks, toks[1:]))
        w1 = [k[0] for k in c.keys()]
        w2 = [k[1] for k in c.keys()]
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "c12": pa.array(list(c.values()), pa.int64())})

    text_only = ds.select_columns([text_col])
    uni = text_only.map_batches(uni_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("c", alias_name="c"))
    # the two w1/w2 joins both consume uni — materialize the narrow
    # vocab table once, or its lineage (including the payload scan)
    # would execute twice (Ray does not dedupe shared lineage)
    uni = uni.map_batches(lambda t: t,
                          batch_format="pyarrow").materialize()
    bi = text_only.map_batches(bi_partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("c12", alias_name="c12"))
    bi = bi.map_batches(lambda t: t, batch_format="pyarrow")
    if min_count > 1:
        bi = bi.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t.column("c12"), min_count)),
            batch_format="pyarrow")

    n_part = _n_partitions()
    from .dedup import join_ready
    u1 = join_ready(uni.rename_columns({"token": "t1", "c": "c1"}), n_part)
    u2 = join_ready(uni.rename_columns({"token": "t2", "c": "c2"}), n_part)
    j = join_ready(bi, n_part).join(
        u1, join_type="inner", num_partitions=n_part,
        on=("w1",), right_on=("t1",))
    # chained-join hazard: guard the first join's output too
    j = join_ready(j, n_part).join(
        u2, join_type="inner", num_partitions=n_part,
        on=("w2",), right_on=("t2",))

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np
        c12 = t.column("c12").to_numpy().astype(np.int64)
        c1 = t.column("c1").to_numpy().astype(np.int64)
        c2 = t.column("c2").to_numpy().astype(np.int64)
        assoc = (c12 * 1_000_000) // (c1 * c2)
        return pa.table({
            "w1": t.column("w1"), "w2": t.column("w2"),
            "c12": pa.array(c12, pa.int64()),
            "c1": pa.array(c1, pa.int64()),
            "c2": pa.array(c2, pa.int64()),
            "assoc_ppm": pa.array(assoc, pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")
