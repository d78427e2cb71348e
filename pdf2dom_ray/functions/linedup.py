"""Line-level corpus deduplication (CCNet / RefinedWeb style).

Web corpora repeat whole lines across documents (navigation fragments,
cookie banners, licence footers); CCNet (Wenzek et al., LREC 2020) and
RefinedWeb (Penedo et al., 2023) strip every line that occurs in ≥ K
documents before model training.  This operator reproduces that
semantics over a (doc_id, text) table where a "line" is a fixed-width
run of ``line_words`` consecutive words (the corpus texts are
single-line; the PDF synth corpus already treats 10-word runs as
layout lines, so the same unit is used here).

Plan (two scans of the narrow documents table — aggregate, then apply,
exactly like ``text_stats.unigram_logprob``):

1. line-count pass: per doc, DISTINCT 8-byte line hashes →
   per-batch partial counts (numpy unique) → small ``groupby(h).sum``
   (sum of per-doc-distinct partials = distinct-doc count).
2. common set = hashes with count ≥ ``min_docs``.
   * ≤ ``broadcast_limit`` rows: ``ray.put`` one int64 array, filter
     docs in an actor-pool map (set built once per actor).
   * larger: fully distributed — explode docs to line rows,
     ``left_anti`` join against the common table on the hash, then
     ``groupby(doc_id)`` reassembly (narrow rows; the same shape CCNet
     runs sharded).

Output: (doc_id, kept_text, n_lines, n_dropped) for EVERY input doc
(kept_text = "" when all lines are common).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["LINE_WORDS", "doc_lines", "common_line_filter"]

LINE_WORDS = 10


def doc_lines(text: str, line_words: int = LINE_WORDS) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i:i + line_words])
            for i in range(0, len(words), line_words)]


def _h64(line: str) -> int:
    """Deterministic 8-byte content hash (collision ~2^-64 — safe to
    treat hash identity as line identity for filtering)."""
    return int.from_bytes(blake2b(line.encode(), digest_size=8).digest(),
                          "little", signed=True)


def _partial_counts(batch: pa.Table, line_words: int) -> pa.Table:
    """Per-batch combiner: distinct (doc, line) → summed line counts."""
    per_doc: list[np.ndarray] = []
    for text in batch.column("text").to_pylist():
        hs = np.fromiter((_h64(ln) for ln in doc_lines(text, line_words)),
                         dtype=np.int64)
        per_doc.append(np.unique(hs))          # distinct within the doc
    allh = np.concatenate(per_doc) if per_doc else np.array([], np.int64)
    uniq, counts = np.unique(allh, return_counts=True)
    return pa.table({"h": pa.array(uniq, pa.int64()),
                     "n": pa.array(counts, pa.int64())})


def common_line_filter(ds: rd.Dataset, *, min_docs: int = 2,
                       line_words: int = LINE_WORDS,
                       broadcast_limit: int = 10_000_000,
                       concurrency=None) -> rd.Dataset:
    """Strip every line occurring in ≥ ``min_docs`` documents."""
    import ray
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        lambda t: _partial_counts(t, line_words),
        batch_format="pyarrow").groupby("h").aggregate(
            Sum("n", alias_name="n"))
    common = counts.filter(expr=f"n >= {min_docs}").select_columns(["h"])
    common = common.map_batches(lambda t: t, batch_format="pyarrow")
    common = common.materialize()          # counted + consumed below
    n_common = common.count()

    if n_common <= broadcast_limit:
        # 8 B per common line: 10 M lines ≈ 80 MB — one object-store
        # broadcast read once per actor, never re-shipped per batch
        arr = np.sort(np.concatenate(
            [np.asarray(b["h"], dtype=np.int64)
             for b in common.iter_batches(batch_format="numpy")]
        )) if n_common else np.array([], np.int64)
        common_ref = ray.put(arr)

        class Strip:
            def __init__(self):
                self.common = ray.get(common_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                kept_txt, n_lines, n_drop = [], [], []
                for text in t.column("text").to_pylist():
                    lines = doc_lines(text, line_words)
                    hs = np.fromiter((_h64(ln) for ln in lines),
                                     dtype=np.int64, count=len(lines))
                    idx = np.searchsorted(self.common, hs)
                    idx[idx == len(self.common)] = 0
                    is_common = (len(self.common) > 0) & \
                        (self.common[idx] == hs)
                    kept = [ln for ln, c in zip(lines, is_common) if not c]
                    kept_txt.append(" ".join(kept))
                    n_lines.append(len(lines))
                    n_drop.append(int(is_common.sum()))
                return pa.table({
                    "doc_id": t.column("doc_id"),
                    "kept_text": pa.array(kept_txt, pa.string()),
                    "n_lines": pa.array(n_lines, pa.int64()),
                    "n_dropped": pa.array(n_drop, pa.int64()),
                })

        # driver-built instance shipped per task (small numpy set)
        return ds.map_batches(Strip(), batch_format="pyarrow")

    # distributed path: explode → anti-join → reassemble (narrow rows)
    def explode(t: pa.Table) -> pa.Table:
        did, idx, line, h, tot = [], [], [], [], []
        for d, text in zip(t.column("doc_id").to_pylist(),
                           t.column("text").to_pylist()):
            lines = doc_lines(text, line_words)
            for i, ln in enumerate(lines):
                did.append(d); idx.append(i)
                line.append(ln); h.append(_h64(ln))
                tot.append(len(lines))
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "line_idx": pa.array(idx, pa.int64()),
                         "line": pa.array(line, pa.string()),
                         "h": pa.array(h, pa.int64()),
                         "n_lines": pa.array(tot, pa.int64())})

    from ..scale import scale_partitions
    n_part = scale_partitions()
    from .dedup import join_ready
    kept = ds.map_batches(explode, batch_format="pyarrow").join(
        join_ready(common, n_part), join_type="left_anti",
        num_partitions=n_part, on=("h",))

    def reassemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("line_idx")
        tot = int(g["n_lines"].iloc[0])
        return pa.table({
            "doc_id": pa.array([int(g["doc_id"].iloc[0])], pa.int64()),
            "kept_text": pa.array([" ".join(g["line"])], pa.string()),
            "n_lines": pa.array([tot], pa.int64()),
            "n_dropped": pa.array([tot - len(g)], pa.int64()),
        })

    surv = kept.groupby("doc_id").map_groups(reassemble,
                                             batch_format="pandas")
    surv = surv.map_batches(lambda t: t, batch_format="pyarrow")
    # docs whose lines were ALL common vanish in the anti-join — union
    # an all-dropped row per doc and keep the first (max kept lines)
    def empties(t: pa.Table) -> pa.Table:
        n = [len(doc_lines(x, line_words))
             for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "kept_text": pa.array([""] * len(n), pa.string()),
            "n_lines": pa.array(n, pa.int64()),
            "n_dropped": pa.array(n, pa.int64()),
        })

    fallback = ds.map_batches(empties, batch_format="pyarrow")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("n_dropped").head(1)

    return surv.union(fallback).groupby("doc_id").map_groups(
        pick, batch_format="pandas").map_batches(
        lambda t: t, batch_format="pyarrow")
