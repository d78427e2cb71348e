"""Corpus-trained linear quality classifier (fastText/DCLM-style).

Large-scale training-data pipelines gate documents with a cheap linear
bag-of-words classifier (fastText in CCNet/DCLM, logistic models in
Gopher's quality ablations). The distributed shape is always the same
two passes:

1. **Train** — per-class token counts, computed with the combiner
   pattern (per-batch Arrow ``group_by`` partials, then one narrow
   global groupby over (word, n_pos, n_neg) rows — the shuffle moves
   vocab-sized partials, never document payloads).
2. **Score** — the weight table is ``ray.put`` once and fetched per
   actor in ``__init__``; scoring is a single vectorized map_batches
   (flatten tokens → dict-map → segment-sum), no join.

Weights are **integer fixed-point class-normalized likelihood
ratios** — the Naive-Bayes per-token evidence
``P(w|pos) / P(w|neg)`` with add-one smoothing, in ppm::

    w_ppm(w) = (1e6 * (n_pos+1) * (T_neg+V)) // ((n_neg+1) * (T_pos+V))

(T_c = total class token count, V = vocab size), clamped to 1e12 so a
document sum stays inside int64. A document scores the integer mean of
its token weights; pred = score >= the neutral 1e6. Real fastText uses
log-ratio weights; plain ratios are kept because the repo's oracle
rule (CLAUDE.md) requires distributed aggregates that must hash-match
DuckDB to stay in integer arithmetic — per token it is the same
monotone transform, and class-normalization removes the class-prior
skew that raw count ratios would bake in.

Scale note: the broadcast weight table is bounded by ``max_vocab``
(most-frequent words kept, ties broken lexicographically); out-of-vocab
tokens score the neutral 1_000_000. The synthetic corpus vocabulary is
tiny, so the small-SF oracle keeps the full vocab and stays exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["train_classifier_weights", "classifier_score"]

NEUTRAL_PPM = 1_000_000
W_CLAMP_PPM = 10 ** 12


def _pool():
    from pdf2dom_ray.stages.pool import default_pool
    return default_pool()


def train_classifier_weights(ds: rd.Dataset, *,
                             pos_expr=None,
                             max_vocab: int | None = None):
    """Distributed per-class token counts -> {word: w_ppm} dict.

    ``pos_expr(table) -> BooleanArray`` labels each row (default:
    ``lang == 'en'``). Returns a plain dict (driver-side, vocab-bounded
    by ``max_vocab``) ready for ``ray.put``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        pos = pos_expr(t) if pos_expr is not None else \
            pc.equal(t.column("lang"), "en")
        pos = pc.cast(pos, pa.int64())
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        y = pos.take(parent)
        g = pa.table({"word": flat, "n_pos": y,
                      "n_neg": pc.subtract(1, y)}) \
            .group_by("word").aggregate([("n_pos", "sum"),
                                         ("n_neg", "sum")])
        return g.rename_columns(["word", "n_pos", "n_neg"])

    counts = ds.select_columns(
        [c for c in ("text", "lang") if c in ds.schema().names]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n_pos", alias_name="n_pos"),
                                   Sum("n_neg", alias_name="n_neg")) \
        .to_pandas()
    if max_vocab is not None and len(counts) > max_vocab:
        counts["_n"] = counts["n_pos"] + counts["n_neg"]
        counts = counts.sort_values(["_n", "word"],
                                    ascending=[False, True]) \
            .head(max_vocab)
    # Python-int arithmetic over the (vocab-bounded) count table: the
    # numerator can exceed int64 at crawl scale before the divide
    t_pos = int(counts["n_pos"].sum())
    t_neg = int(counts["n_neg"].sum())
    v = len(counts)
    return {w: min((1_000_000 * (np_ + 1) * (t_neg + v))
                   // ((nn + 1) * (t_pos + v)), W_CLAMP_PPM)
            for w, np_, nn in zip(counts["word"],
                                  counts["n_pos"].astype(int),
                                  counts["n_neg"].astype(int))}


def classifier_score(ds: rd.Dataset, *, pos_expr=None,
                     max_vocab: int | None = None,
                     concurrency=None) -> rd.Dataset:
    """(doc_id, score_ppm, pred): integer mean token class-ratio weight
    per document, pred = 1 when score_ppm >= the neutral 1_000_000."""
    import ray

    weights_ref = ray.put(train_classifier_weights(
        ds, pos_expr=pos_expr, max_vocab=max_vocab))

    class Score:
        def __init__(self):
            import pandas as pd
            self.w = pd.Series(ray.get(weights_ref), dtype=np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            text = t.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            toks = pc.split_pattern(text, " ")
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks) \
                .to_numpy(zero_copy_only=False)
            # vectorized dict lookup: reindex is a C-level hash join;
            # fill_value keeps int64 exact (no NaN/float64 round-trip)
            wv = self.w.reindex(flat.to_pandas(),
                                fill_value=NEUTRAL_PPM) \
                .to_numpy(np.int64)
            n = t.num_rows
            sums = np.zeros(n, np.int64)
            np.add.at(sums, parent, wv)
            ntok = np.bincount(parent, minlength=n).astype(np.int64)
            ntok[ntok == 0] = 1
            score = sums // ntok
            return pa.table({
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "score_ppm": pa.array(score, pa.int64()),
                "pred": pa.array((score >= NEUTRAL_PPM).astype(np.int64),
                                 pa.int64()),
            })

    return ds.select_columns(
        [c for c in ("doc_id", "text", "lang")
         if c in ds.schema().names]) \
        .map_batches(Score(), batch_format="pyarrow")
