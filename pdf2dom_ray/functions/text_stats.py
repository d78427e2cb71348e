"""Text analysis stages for training-data pipelines.

Vectorized per-batch kernels over the ``documents`` table (or any table
with a ``text`` column): token counting, quality scoring, document
fingerprinting (md5 + rolling hash), n-gram-profile language ID. All
stages are single-pass ``map_batches`` — no shuffle anywhere.

The token/stopword semantics are deliberately SQL-expressible
(``string_split(text, ' ')`` + list lambdas) so DuckDB oracles verify
them value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["STOPWORDS", "text_quality_batch", "text_quality",
           "fingerprint_batch", "fingerprint", "lang_id_batch", "lang_id",
           "compression_ratio_batch", "compression_ratio",
           "BPE_SPLIT_PATTERN", "bpe_token_count_batch", "bpe_token_count",
           "gopher_quality_batch", "gopher_quality", "unigram_counts",
           "unigram_logprob", "repetition_stats_batch",
           "repetition_stats"]

# fixed set, mirrored verbatim in the SQL oracle (__ray_entry__)
STOPWORDS = ("the", "a", "of", "and", "to")

# tiny per-language stopword profiles for the heuristic language ID
# (n-gram/stopword scoring; deterministic, no model download)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "fr": {"le", "la", "et", "est", "un", "une"},
    "es": {"el", "la", "y", "es", "un", "una"},
    "zh": set(),  # non-latin: detected via script ratio below
}


def text_quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_chars, stop_ratio, mean_token_len).

    Fully Arrow-vectorized: split_pattern → list lengths + flattened
    per-token kernels (is_in / utf8_length) + segment sums via
    ``np.add.reduceat`` over the list offsets. Empty texts get zero
    tokens (mirroring ``"".split(" ") == []`` in the SQL-less path)."""
    import pyarrow.compute as pc
    text_col = batch.column("text")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.split_pattern(text_col, " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # Python semantics: "".split(" ") → [] (Arrow gives [""])
    empty = pc.equal(pc.utf8_length(text_col), 0).to_numpy(
        zero_copy_only=False)
    counts[empty] = 0
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    offsets = np.asarray(toks.offsets).astype(np.int64)
    offsets = (offsets - offsets[0])[:-1]   # rebase (sliced arrays)
    n = len(counts)
    if len(flat):
        idx = np.minimum(offsets, len(flat) - 1)
        stop_counts = np.add.reduceat(is_stop, idx)
        len_sums = np.add.reduceat(tok_lens, idx)
        tail_empty = offsets >= len(flat)
        stop_counts[tail_empty] = 0.0
        len_sums[tail_empty] = 0.0
    else:
        stop_counts = np.zeros(n)
        len_sums = np.zeros(n)
    stop_counts[counts == 0] = 0.0
    len_sums[counts == 0] = 0.0
    safe = np.maximum(counts, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(counts, pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(text_col), pa.int64()),
        "stop_ratio": pa.array(np.round(stop_counts / safe, 6), pa.float64()),
        "mean_token_len": pa.array(np.round(len_sums / safe, 6), pa.float64()),
    })


def text_quality(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(text_quality_batch, batch_format="pyarrow")


_FNV = np.uint64(1099511628211)


def _rolling_fp(text: str) -> int:
    """63-bit polynomial fingerprint over 8-byte windows (Rabin-Karp
    closed form Σ wᵢ·pⁱ mod 2⁶⁴, masked to 63 bits) — three numpy ops
    per document instead of a per-window Python loop."""
    b = text.encode("utf-8")
    if not b:
        return 0
    pad = (-len(b)) % 8
    arr = np.frombuffer(b + b"\x00" * pad, dtype="<u8")
    powers = np.empty(len(arr), dtype=np.uint64)
    powers[0] = 1
    if len(arr) > 1:
        np.multiply.accumulate(
            np.full(len(arr) - 1, _FNV, dtype=np.uint64), out=powers[1:])
    with np.errstate(over="ignore"):
        h = np.uint64((arr * powers).sum(dtype=np.uint64))
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp=md5 hex, rolling_fp=vectorized polynomial hash)."""
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    rolls = [_rolling_fp(t) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp": pa.array(fps, pa.string()),
        "rolling_fp": pa.array(rolls, pa.int64()),
    })


def fingerprint(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# GPT-2-style pre-tokenizer split, restricted to constructs RE2 and
# Python `re` evaluate identically (no lookahead, ASCII classes) so the
# DuckDB oracle can run the SAME pattern. Both engines use
# leftmost-first alternation.
BPE_SPLIT_PATTERN = (r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+"
                     r"| ?[^ A-Za-z0-9]+| +")

_BPE_RE = None


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): BPE-ish regex pre-tokenization count
    (whitespace-only matches excluded — they merge into neighbours in a
    real BPE)."""
    global _BPE_RE
    if _BPE_RE is None:
        import re
        _BPE_RE = re.compile(BPE_SPLIT_PATTERN)
    texts = batch.column("text").to_pylist()
    counts = [sum(1 for m in _BPE_RE.findall(t) if m.strip())
              for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": pa.array(counts, pa.int64()),
    })


def bpe_token_count(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(bpe_token_count_batch, batch_format="pyarrow")


# Gopher-style document-quality rules (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1 — public filter heuristics),
# restricted to the rules meaningful for single-line corpus text and
# expressed identically in SQL:
#   R1: 3 ≤ word count (whitespace tokens)
#   R2: 1 ≤ mean word length ≤ 10
#   R3: alpha ratio — ≥ 80% of words contain an alphabetic character
#   R4: stopword signal — at least one STOPWORDS member present
GOPHER_MIN_WORDS = 3
GOPHER_MEAN_LEN_LO = 1.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_ALPHA_RATIO = 0.8


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_words, mean_word_len, alpha_ratio, has_stopword,
    passes)."""
    import pyarrow.compute as pc
    text_col = batch.column("text")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.split_pattern(text_col, " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    empty = pc.equal(pc.utf8_length(text_col), 0).to_numpy(
        zero_copy_only=False)
    counts[empty] = 0
    flat = pc.list_flatten(toks)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    has_alpha = pc.match_substring_regex(flat, "[A-Za-z]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = np.asarray(toks.offsets).astype(np.int64)
    offsets = (offsets - offsets[0])[:-1]
    n = len(counts)
    if len(flat):
        idx = np.minimum(offsets, len(flat) - 1)
        len_sums = np.add.reduceat(tok_lens, idx)
        alpha_counts = np.add.reduceat(has_alpha, idx)
        stop_counts = np.add.reduceat(is_stop, idx)
        tail_empty = offsets >= len(flat)
        for a in (len_sums, alpha_counts, stop_counts):
            a[tail_empty] = 0.0
    else:
        len_sums = np.zeros(n)
        alpha_counts = np.zeros(n)
        stop_counts = np.zeros(n)
    for a in (len_sums, alpha_counts, stop_counts):
        a[counts == 0] = 0.0
    safe = np.maximum(counts, 1).astype(np.float64)
    mean_len = np.round(len_sums / safe, 6)
    alpha_ratio = np.round(alpha_counts / safe, 6)
    has_stop = stop_counts > 0
    passes = ((counts >= GOPHER_MIN_WORDS)
              & (mean_len >= GOPHER_MEAN_LEN_LO)
              & (mean_len <= GOPHER_MEAN_LEN_HI)
              & (alpha_ratio >= GOPHER_ALPHA_RATIO)
              & has_stop)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array(counts, pa.int64()),
        "mean_word_len": pa.array(mean_len, pa.float64()),
        "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
        "has_stopword": pa.array(has_stop, pa.bool_()),
        "passes": pa.array(passes, pa.bool_()),
    })


def gopher_quality(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(gopher_quality_batch, batch_format="pyarrow")


def unigram_counts(ds: rd.Dataset) -> rd.Dataset:
    """(word, n): corpus-wide whitespace-token counts via the combiner
    pattern — per-batch Arrow group_by first, tiny global groupby over
    the partial (word, n) rows. The shuffle moves vocab × batches rows,
    never the corpus."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text_col = t.column("text")
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(text_col, " "))
        g = pa.table({"word": flat}).group_by("word") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("word").aggregate(Sum("n", alias_name="n"))


def unigram_logprob(ds: rd.Dataset, *, concurrency=None) -> rd.Dataset:
    """(doc_id, mean_logprob): per-document mean natural-log unigram
    probability under the corpus' own empirical distribution.

    The aggregate→broadcast pattern: corpus unigram counts are computed
    distributed (one narrow combiner shuffle), ``ray.put`` once, and
    fetched per actor in ``__init__`` — the scoring pass is a single
    map_batches with no join. Scale note: for crawl-scale vocabularies
    broadcast the top-K table with an OOV floor instead of the full
    vocab (the synthetic corpus vocabulary is tiny, so the full table
    is exact and keeps the SQL oracle exact too)."""
    import ray

    counts = unigram_counts(ds).to_pandas()
    total = float(counts["n"].sum())
    table_ref = ray.put(dict(zip(counts["word"],
                                 np.log(counts["n"].to_numpy(dtype=float)
                                        / total))))

    class Score:
        def __init__(self):
            self.logp = ray.get(table_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            lp = self.logp
            out = []
            for txt in texts:
                toks = txt.split(" ") if txt else []
                if not toks:
                    out.append(0.0)
                    continue
                s = sum(lp.get(w, 0.0) for w in toks)
                out.append(round(s / len(toks), 6))
            return pa.table({
                "doc_id": t.column("doc_id"),
                "mean_logprob": pa.array(out, pa.float64()),
            })

    return ds.map_batches(Score(), batch_format="pyarrow")


class LangId:
    """Actor-pool language-ID stage (stateful: profiles built once)."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = [self._predict(t) for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
        })

    def _predict(self, text: str) -> str:
        if not text:
            return "und"
        non_ascii = sum(1 for ch in text[:200] if ord(ch) > 0x2E80)
        if non_ascii > len(text[:200]) * 0.3:
            return "zh"
        toks = set(text.lower().split(" ")[:100])
        best, best_score = "und", 0
        for lang, prof in self.profiles.items():
            score = len(toks & prof)
            if score > best_score:
                best, best_score = lang, score
        return best


def lang_id_batch(batch: pa.Table) -> pa.Table:
    return LangId()(batch)


def lang_id(ds: rd.Dataset, concurrency=None) -> rd.Dataset:
    return ds.map_batches(LangId(), batch_format="pyarrow")


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, dup_token_ppm, top_token_ppm, top_bigram_ppm,
    repetitive): Gopher-style repetition signals, row-local and
    integer-exact.

    * dup_token_ppm — fraction of tokens that are repeats of an
      already-counted token: ``1e6 * (ntok - ndistinct) // ntok``.
    * top_token_ppm — mass of the most frequent token.
    * top_bigram_ppm — token mass covered by the most frequent
      *duplicated* adjacent pair, ``1e6 * 2 * max_bigram_count //
      ntok`` with max taken over pairs occurring >= 2 times (0
      otherwise — a unique bigram is not repetition, and without the
      floor every short doc would trip the flag).
    * repetitive — the Gopher-inspired reject flag:
      dup_token_ppm > 300_000 or top_bigram_ppm > 200_000.

    Vectorized: flatten tokens once, pandas C-level groupbys for the
    per-doc distinct/max counts; no Python loop over rows.
    """
    import pandas as pd
    import pyarrow.compute as pc
    text_col = batch.column("text")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.split_pattern(text_col, " ")
    flat = pc.list_flatten(toks).to_pandas()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = batch.num_rows
    ntok = np.bincount(parent, minlength=n).astype(np.int64)
    df = pd.DataFrame({"p": parent, "w": flat})
    uc = df.groupby(["p", "w"], sort=False).size()
    per = uc.groupby(level=0)
    ndis = np.zeros(n, np.int64)
    maxu = np.zeros(n, np.int64)
    ndis[per.size().index] = per.size().to_numpy()
    maxu[per.max().index] = per.max().to_numpy()
    # adjacent pairs: shift the flat array, mask doc boundaries
    maxb = np.zeros(n, np.int64)
    if len(df) > 1:
        same = parent[1:] == parent[:-1]
        bg = pd.DataFrame({"p": parent[1:][same],
                           "a": flat.to_numpy()[:-1][same],
                           "b": flat.to_numpy()[1:][same]})
        if len(bg):
            bc = bg.groupby(["p", "a", "b"], sort=False).size() \
                .groupby(level=0).max()
            mb = bc.to_numpy()
            maxb[bc.index] = np.where(mb >= 2, mb, 0)
    safe = np.maximum(ntok, 1)
    dup = 1_000_000 * (ntok - ndis) // safe
    topu = 1_000_000 * maxu // safe
    topb = 1_000_000 * 2 * maxb // safe
    return pa.table({
        "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
        "dup_token_ppm": pa.array(dup, pa.int64()),
        "top_token_ppm": pa.array(topu, pa.int64()),
        "top_bigram_ppm": pa.array(topb, pa.int64()),
        "repetitive": pa.array(
            ((dup > 300_000) | (topb > 200_000)).astype(np.int64),
            pa.int64()),
    })


def repetition_stats(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# compression-ratio quality signal (zlib)
# ---------------------------------------------------------------------------

def compression_ratio_batch(batch: pa.Table, *,
                            level: int = 6) -> pa.Table:
    """(doc_id, n_bytes, n_compressed, ratio_ppm) per document.

    The classic repetition/templating detector (used by the Gopher
    and FineWeb curation recipes): highly repetitive or templated
    text compresses far below natural prose, and near-random noise
    barely compresses at all — both tails get filtered. zlib level 6
    is deterministic for a given input, so the column is stable
    across runs/partitionings, but NOT SQL-expressible (DuckDB has no
    zlib) — the driver records a rows-only check and pytest locks the
    semantics.

        ratio_ppm = 10⁶ · n_compressed // max(n_bytes, 1)
    """
    import zlib
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    nb, nc = [], []
    for t in texts:
        raw = (t or "").encode("utf-8")
        nb.append(len(raw))
        nc.append(len(zlib.compress(raw, level)))
    nbv = np.asarray(nb, dtype=np.int64)
    ncv = np.asarray(nc, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bytes": pa.array(nbv, pa.int64()),
        "n_compressed": pa.array(ncv, pa.int64()),
        "ratio_ppm": pa.array(
            (1_000_000 * ncv) // np.maximum(nbv, 1), pa.int64())})


def compression_ratio(ds: "rd.Dataset") -> "rd.Dataset":
    """Shuffle-free per-document map (payload read once, narrow out)."""
    return ds.map_batches(compression_ratio_batch,
                          batch_format="pyarrow")
