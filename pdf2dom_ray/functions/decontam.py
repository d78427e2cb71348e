"""Benchmark decontamination and exact-substring duplicate spans.

Two classic training-data hygiene passes over a document corpus:

* :func:`contamination_flags` — flag every training document whose
  text shares at least one n-token window with a benchmark/eval set
  (the PaLM/GPT-3-style "13-gram overlap" decontamination rule,
  parameterized n).  The benchmark side is distilled to its distinct
  n-gram set with a per-batch partial, unioned driver-side and
  ``ray.put`` ONCE; scoring is an actor pool that fetches the set in
  ``__init__`` and never shuffles the corpus payload.  The scale
  assumption — stated, not hidden — is that the *benchmark* n-gram
  set fits in a worker heap: eval suites are MBs against a 100 TB
  corpus, which is exactly the broadcast-small-side shape.

* :func:`duplicate_spans` — find every w-token window that occurs in
  two or more distinct documents (the ExactSubstr signal of Lee et
  al., "Deduplicating Training Data Makes Language Models Better",
  arXiv:2107.06499, re-expressed as a bounded-window groupby instead
  of a suffix array).  Each document lives in exactly one input
  batch, so the per-batch (window, doc_id, occ) partial rows are
  already globally unique per (window, doc) — one narrow groupby on
  the window string finishes the job.  The shuffle moves only
  (window, doc_id, occ) rows, never document payloads; boilerplate
  hot windows are safe because the aggregate is count/sum.

Windows are built over single-space tokenization (the corpus-wide
convention shared by tfidf/bm25/inverted_index and their SQL twins),
joined back with single spaces, so the DuckDB oracle can rebuild the
identical window strings with ``string_split`` + list slicing.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

__all__ = ["contamination_flags", "duplicate_spans",
           "source_overlap"]


def _doc_grams(text: str | None, n: int) -> list[str]:
    toks = [w for w in (text or "").split(" ") if w]
    return [" ".join(toks[i:i + n])
            for i in range(len(toks) - n + 1)]


def benchmark_gram_set(bench: rd.Dataset, *, text_col: str = "text",
                       n: int = 8) -> set[str]:
    """Distinct n-gram strings of the benchmark set, gathered on the
    driver (bounded by benchmark size — see module docstring)."""

    def partial(t: pa.Table) -> pa.Table:
        s: set[str] = set()
        for text in t.column(text_col).to_pylist():
            s.update(_doc_grams(text, n))
        return pa.table({"g": pa.array(sorted(s), pa.string())})

    parts = bench.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow")
    out: set[str] = set()
    for b in ray.get(parts.to_arrow_refs()):
        if b.num_columns:
            out.update(b.column("g").to_pylist())
    return out


class _ContamScorer:
    """Actor-pool stage: benchmark n-gram set fetched once per actor."""

    def __init__(self, bench_ref, text_col: str, id_col: str, n: int):
        self.bench: set[str] = ray.get(bench_ref)
        self.text_col, self.id_col, self.n = text_col, id_col, n

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, n_ngrams, n_overlap, flags = [], [], [], []
        for d, text in zip(t.column(self.id_col).to_pylist(),
                           t.column(self.text_col).to_pylist()):
            grams = set(_doc_grams(text, self.n))
            ov = len(grams & self.bench)
            ids.append(d)
            n_ngrams.append(len(grams))
            n_overlap.append(ov)
            flags.append(ov >= 1)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_ngrams": pa.array(n_ngrams, pa.int64()),
            "n_overlap": pa.array(n_overlap, pa.int64()),
            "contaminated": pa.array(flags, pa.bool_())})


def contamination_flags(ds: rd.Dataset, bench: rd.Dataset, *,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        n: int = 8) -> rd.Dataset:
    """(doc_id, n_ngrams, n_overlap, contaminated) for EVERY input
    document; n_ngrams/n_overlap count DISTINCT n-grams.  Documents
    shorter than n tokens get (0, 0, false)."""
    from pdf2dom_ray.stages.pool import default_pool

    bench_ref = ray.put(benchmark_gram_set(
        bench, text_col=text_col, n=n))
    return ds.select_columns([id_col, text_col]).map_batches(
        _ContamScorer(bench_ref, text_col, id_col, n),
        batch_format="pyarrow")


def duplicate_spans(ds: rd.Dataset, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    w: int = 20) -> rd.Dataset:
    """(gram, n_docs, n_occ) for every w-token window occurring in
    ≥2 distinct documents; n_occ counts total occurrences (including
    repeats inside one document)."""

    def partial(t: pa.Table) -> pa.Table:
        # (gram, doc_id) pairs are globally unique: each doc lives in
        # exactly one batch, so these are final per-(gram, doc) counts
        from collections import Counter
        gs, ids, occ = [], [], []
        for d, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            c = Counter(_doc_grams(text, w))
            gs.extend(c.keys())
            ids.extend([d] * len(c))
            occ.extend(c.values())
        return pa.table({"gram": pa.array(gs, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "occ": pa.array(occ, pa.int64())})

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow")
    agg = pairs.groupby("gram").aggregate(
        Count(alias_name="n_docs"), Sum("occ", alias_name="n_occ"))
    # sort-aggregate emits pandas blocks; coerce to Arrow (uniform
    # block-type rule) and keep only cross-document windows
    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.greater_equal(t.column("n_docs"), 2))
        return pa.table({
            "gram": t.column("gram").cast(pa.string()),
            "n_docs": t.column("n_docs").cast(pa.int64()),
            "n_occ": t.column("n_occ").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def source_overlap(ds: rd.Dataset, *, text_col: str = "text",
                   source_col: str = "source",
                   n: int = 8) -> rd.Dataset:
    """(src_a, src_b, shared_ngrams): cross-source contamination
    matrix — for every unordered source pair, how many distinct
    n-token windows the two sources share.  The corpus-mixing
    diagnostic behind "is Common Crawl already inside my Wikipedia
    slice": high overlap means the mixture double-counts content.

    Scale shape: per-batch *distinct* (gram, source) partials first,
    then one narrow groupby on the gram whose group size is bounded by
    the number of sources (the distinct reduction, not the corpus,
    bounds the join blowup — C(k,2) pairs per gram where k <= the
    mixture's component count).  This targets source-level mixtures
    (tens of components); for host-level granularity cap k per gram or
    pre-bucket hosts, or the hot grams explode quadratically.
    """

    def partial(t: pa.Table) -> pa.Table:
        gs, srcs = [], []
        for s, text in zip(t.column(source_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            for g in set(_doc_grams(text, n)):
                gs.append(g)
                srcs.append(s)
        return pa.table({"gram": pa.array(gs, pa.string()),
                         "source": pa.array(srcs, pa.string())})

    def pairs_of(g) -> pa.Table:
        # g: all (gram, source) rows for one gram (per-batch distinct,
        # so <= n_batches x n_sources rows); emit ordered source pairs
        srcs = sorted(set(g.column("source").to_pylist()))
        a = [srcs[i] for i in range(len(srcs))
             for _ in range(len(srcs) - i - 1)]
        b = [srcs[j] for i in range(len(srcs))
             for j in range(i + 1, len(srcs))]
        return pa.table({"src_a": pa.array(a, pa.string()),
                         "src_b": pa.array(b, pa.string())})

    grams = ds.select_columns([source_col, text_col]).map_batches(
        partial, batch_format="pyarrow")
    pair_rows = grams.groupby("gram").map_groups(
        pairs_of, batch_format="pyarrow")
    return pair_rows.groupby(["src_a", "src_b"]).aggregate(
        Count(alias_name="shared_ngrams")) \
        .map_batches(_overlap_finish, batch_format="pyarrow")


def _overlap_finish(t: pa.Table) -> pa.Table:
    # sort-aggregate can emit pandas/schema-less empty blocks
    if not t.num_columns:
        return pa.table({"src_a": pa.array([], pa.string()),
                         "src_b": pa.array([], pa.string()),
                         "shared_ngrams": pa.array([], pa.int64())})
    return pa.table({
        "src_a": t.column("src_a").cast(pa.string()),
        "src_b": t.column("src_b").cast(pa.string()),
        "shared_ngrams": t.column("shared_ngrams").cast(pa.int64())})
