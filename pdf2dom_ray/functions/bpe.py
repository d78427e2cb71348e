"""Distributed BPE vocabulary learning over the documents table.

Implements byte-pair-encoding merge learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") the
way a training-data pipeline needs it at corpus scale:

- The corpus is scanned ONCE to build the distinct-word frequency
  table (``word_counts`` — per-batch Arrow group_by partials, then a
  small global groupby; the shuffle moves vocab-sized rows, never the
  corpus). Pre-tokenization is the repo-wide ``BPE_SPLIT_PATTERN``
  (text_stats.py), whitespace-only tokens dropped — identical to the
  ``token_stats_bpe`` oracle semantics.
- Every merge round then operates only on that narrow word table
  (word, n, symbols: list<string>): a vectorized adjacent-pair count
  (numpy over the flattened list column — no per-word Python loop), a
  two-key groupby over per-batch partial counts, a per-block top-1 +
  driver argmax, and a vectorized merge rewrite. Per-round cost is
  O(vocab), independent of corpus bytes — at 100 TB the distinct-word
  table is a few million rows no matter the input size.
- Determinism: counts are exact integer sums and the winning pair is
  the unique maximum of the total order (count desc, lhs asc, rhs
  asc), so the learned merge table is independent of partitioning.

The reference (radkovo/Pdf2Dom) has no tokenizer; this operator is
part of the training-data suite layered over the extraction engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .text_stats import BPE_SPLIT_PATTERN

__all__ = ["word_counts", "initial_pair_counts", "learn_bpe",
           "apply_bpe", "learn_bpe_reference"]

_RE = None


def _compiled():
    global _RE
    if _RE is None:
        import re
        _RE = re.compile(BPE_SPLIT_PATTERN)
    return _RE


def word_counts(ds: rd.Dataset) -> rd.Dataset:
    """documents(text) → (word, n): corpus-wide BPE pre-token counts.

    Combiner pattern: per-batch Arrow group_by first; the global
    groupby shuffles only (distinct-words-per-batch) narrow rows.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        rx = _compiled()
        words: list[str] = []
        for txt in t.column("text").to_pylist():
            words.extend(m for m in rx.findall(txt) if m.strip())
        g = pa.table({"word": pa.array(words, pa.string())}) \
            .group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("word").aggregate(Sum("n", alias_name="n"))


def _pairs_of_batch(t: pa.Table) -> pa.Table:
    """(symbols: list<string>, n) batch → partial (lhs, rhs, c) counts
    of in-word adjacent symbol pairs weighted by word count. Fully
    vectorized over the flattened list column."""
    sym = t.column("symbols")
    if isinstance(sym, pa.ChunkedArray):
        sym = sym.combine_chunks()
    n = t.column("n").to_numpy()
    offsets = sym.offsets.to_numpy()
    offsets = offsets - offsets[0]     # re-base: offsets of a sliced
    flat = np.asarray(sym.flatten().to_pylist(), dtype=object)
    # ListArray are relative to .values while .flatten() re-bases
    empty = pa.table({"lhs": pa.array([], pa.string()),
                      "rhs": pa.array([], pa.string()),
                      "c": pa.array([], pa.int64())})
    if len(flat) < 2:
        return empty
    lens = np.diff(offsets)
    valid = np.ones(len(flat) - 1, dtype=bool)
    ends = offsets[1:] - 1                     # last symbol of each word
    ends = ends[(ends >= 0) & (ends < len(flat) - 1)]
    valid[ends] = False                        # no cross-word pairs
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return empty
    wid = np.repeat(np.arange(len(lens)), lens)
    part = pa.table({
        "lhs": pa.array(flat[idx], pa.string()),
        "rhs": pa.array(flat[idx + 1], pa.string()),
        "c": pa.array(n[wid[idx]], pa.int64()),
    })
    g = part.group_by(["lhs", "rhs"]).aggregate([("c", "sum")])
    return g.rename_columns(["lhs", "rhs", "c"])


def _global_pair_counts(words: rd.Dataset) -> rd.Dataset:
    from ray.data.aggregate import Sum
    parts = words.map_batches(_pairs_of_batch, batch_format="pyarrow")
    return parts.groupby(["lhs", "rhs"]).aggregate(
        Sum("c", alias_name="pair_count"))


def _to_symbols(words: rd.Dataset) -> rd.Dataset:
    def split(t: pa.Table) -> pa.Table:
        ws = t.column("word").to_pylist()
        return pa.table({
            "word": t.column("word"),
            "n": t.column("n"),
            "symbols": pa.array([list(w) for w in ws],
                                pa.list_(pa.string())),
        })
    return words.map_batches(split, batch_format="pyarrow")


def initial_pair_counts(ds: rd.Dataset, *, top: int = 50) -> rd.Dataset:
    """documents(text) → top-``top`` character-level adjacent-pair
    counts (lhs, rhs, pair_count), the round-0 BPE statistics. Fully
    SQL-expressible (integer counts, deterministic order: count desc,
    lhs, rhs)."""
    pc_ds = _global_pair_counts(_to_symbols(word_counts(ds)))
    return pc_ds.sort(["pair_count", "lhs", "rhs"],
                      descending=[True, False, False]).limit(top)


def _merge_in_batch(lhs: str, rhs: str):
    """Batch fn: rewrite symbols, merging adjacent (lhs, rhs) →
    lhs+rhs left-to-right (overlapping runs merge greedily from the
    left, matching the classic BPE reference)."""
    def fn(t: pa.Table) -> pa.Table:
        sym = t.column("symbols")
        if isinstance(sym, pa.ChunkedArray):
            sym = sym.combine_chunks()
        offsets = sym.offsets.to_numpy()
        offsets = offsets - offsets[0]         # re-base (sliced arrays)
        flat = np.asarray(sym.flatten().to_pylist(), dtype=object)
        if len(flat) >= 2:
            cand = np.nonzero((flat[:-1] == lhs) & (flat[1:] == rhs))[0]
            ends = offsets[1:] - 1
            ends = ends[(ends >= 0) & (ends < len(flat) - 1)]
            bad = np.zeros(len(flat) - 1, dtype=bool)
            bad[ends] = True
            cand = cand[~bad[cand]]
        else:
            cand = np.array([], dtype=np.int64)
        if len(cand):
            # left-to-right non-overlapping within runs: drop a match
            # whose left element was consumed by the previous match
            keep = []
            last = -2
            for p in cand:                     # cand is small (matches only)
                if p == last + 1:
                    continue
                keep.append(p)
                last = p
            keep = np.asarray(keep, dtype=np.int64)
            flat[keep] = lhs + rhs
            drop = np.zeros(len(flat), dtype=bool)
            drop[keep + 1] = True
            # new per-word lengths: subtract merges that landed in each word
            lens = np.diff(offsets)
            wid = np.repeat(np.arange(len(lens)), lens)
            dropped_per_word = np.bincount(wid[keep + 1],
                                           minlength=len(lens))
            new_lens = lens - dropped_per_word
            flat = flat[~drop]
            new_offsets = np.concatenate(([0], np.cumsum(new_lens)))
            sym_out = pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()),
                pa.array(flat, pa.string()))
        else:
            sym_out = sym
        return pa.table({"word": t.column("word"), "n": t.column("n"),
                         "symbols": sym_out})
    return fn


def learn_bpe(ds: rd.Dataset, *, num_merges: int = 32,
              min_count: int = 2) -> pa.Table:
    """documents(text) → merge table (rank, lhs, rhs, pair_count) of
    the first ``num_merges`` BPE merges. Stops early when the best
    pair's count falls below ``min_count``.

    The returned table is tiny (num_merges rows) and deterministic;
    the word table stays distributed throughout — only per-block
    top-1 candidate rows (one per block per round) reach the driver.
    """
    words = _to_symbols(word_counts(ds)).materialize()
    ranks: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pair_ds = _global_pair_counts(words)

        def top1(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            df = t.to_pandas()
            df = df.sort_values(["pair_count", "lhs", "rhs"],
                                ascending=[False, True, True])
            return pa.Table.from_pandas(df.head(1),
                                        preserve_index=False)

        cands = pair_ds.map_batches(top1, batch_format="pyarrow") \
            .take_all()
        if not cands:
            break
        best = min(cands, key=lambda r: (-int(r["pair_count"]),
                                         r["lhs"], r["rhs"]))
        cnt = int(best["pair_count"])
        if cnt < min_count:
            break
        lhs, rhs = best["lhs"], best["rhs"]
        ranks.append((rank, lhs, rhs, cnt))
        words = words.map_batches(_merge_in_batch(lhs, rhs),
                                  batch_format="pyarrow").materialize()
    return pa.table({
        "rank": pa.array([r[0] for r in ranks], pa.int64()),
        "lhs": pa.array([r[1] for r in ranks], pa.string()),
        "rhs": pa.array([r[2] for r in ranks], pa.string()),
        "pair_count": pa.array([r[3] for r in ranks], pa.int64()),
    })


def apply_bpe(ds: rd.Dataset, merges: pa.Table, *,
              concurrency=None) -> rd.Dataset:
    """documents(text) → (doc_id, n_tokens) token counts under the
    learned merge ranks. The merge table is broadcast once via
    ``ray.put`` and fetched per actor in ``__init__``; encoding is the
    standard lowest-rank-first pair substitution per pre-token, with
    an LRU word cache (Zipf makes the cache hit rate very high)."""
    import ray

    from ..stages.pool import default_pool
    rank_of = {(l, r): i for i, (l, r) in
               enumerate(zip(merges.column("lhs").to_pylist(),
                             merges.column("rhs").to_pylist()))}
    ref = ray.put(rank_of)

    class Encoder:
        def __init__(self):
            self.rank_of = ray.get(ref)
            self.cache: dict[str, int] = {}

        def _encode_len(self, word: str) -> int:
            hit = self.cache.get(word)
            if hit is not None:
                return hit
            syms = list(word)
            ro = self.rank_of
            while len(syms) > 1:
                best_i, best_rank = -1, None
                for i in range(len(syms) - 1):
                    rk = ro.get((syms[i], syms[i + 1]))
                    if rk is not None and (best_rank is None
                                           or rk < best_rank):
                        best_i, best_rank = i, rk
                if best_rank is None:
                    break
                syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            out = len(syms)
            if len(self.cache) < 262_144:
                self.cache[word] = out
            return out

        def __call__(self, t: pa.Table) -> pa.Table:
            rx = _compiled()
            counts = [sum(self._encode_len(m) for m in rx.findall(txt)
                          if m.strip())
                      for txt in t.column("text").to_pylist()]
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(counts, pa.int64()),
            })

    conc = concurrency if concurrency is not None else default_pool()
    return ds.map_batches(Encoder, batch_format="pyarrow",
                          concurrency=conc)


def learn_bpe_reference(texts: list[str], *, num_merges: int = 32,
                        min_count: int = 2) -> list[tuple]:
    """Single-process reference implementation (classic dict-of-words
    BPE) used by tests to lock ``learn_bpe`` exactly."""
    rx = _compiled()
    vocab: dict[tuple, int] = {}
    for txt in texts:
        for m in rx.findall(txt):
            if m.strip():
                key = tuple(m)
                vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for rank in range(num_merges):
        pairs: dict[tuple, int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, lhs, rhs, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges
