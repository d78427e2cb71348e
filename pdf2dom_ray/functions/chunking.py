"""Fixed-size sequence chunking — the training-data last mile.

Before tokens reach a trainer they are cut into fixed-length
sequences. Two forms:

* :func:`chunk_documents` — per-document chunking: each document's
  token stream is split into ceil(n/seq_len) chunks independently —
  row-local, shuffle-free, deterministic under any partitioning.
  Output: one row per chunk (doc_id, chunk_idx 1-based, n_tokens,
  chunk_text) — the final chunk is the short remainder, matching the
  SQL oracle's list-slice semantics exactly.

* :func:`pack_sequences` — GPT-style concat-and-split packing: the
  corpus token stream (documents in doc_id order) is conceptually
  concatenated and cut every seq_len tokens; the output maps each
  document to the training sequences it lands in.  The global offset
  that threads through the corpus is NOT sequential at execution
  time: it's a distributed prefix sum — the narrow (doc_id, ntok)
  table is sorted by key, per-block token totals come back as one
  int per block (O(blocks) driver state), and each block then emits
  its span rows in parallel from its base offset.  This is the one
  place the module drops to raw Ray tasks: a prefix-scan is exactly
  what the Dataset API can't express, and the payload never leaves
  the workers (``from_arrow_refs`` re-enters the Dataset world).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(ds: rd.Dataset, *, seq_len: int = 64,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> rd.Dataset:
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, ns, texts = [], [], [], []
        for d, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            toks = (text or "").split(" ")
            for i in range(0, len(toks), seq_len):
                chunk = toks[i:i + seq_len]
                ids.append(d)
                idxs.append(i // seq_len + 1)
                ns.append(len(chunk))
                texts.append(" ".join(chunk))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "n_tokens": pa.array(ns, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def _to_arrow(t) -> pa.Table:
    return pa.Table.from_pandas(t) if not isinstance(t, pa.Table) \
        else t


@ray.remote
def _block_ntok_sum(t) -> int:
    import pyarrow.compute as pc
    t = _to_arrow(t)
    # empty sort outputs can be schema-less (see CLAUDE.md Arrow gaps)
    if not t.num_rows or "ntok" not in t.schema.names:
        return 0
    return int(pc.sum(t.column("ntok")).as_py() or 0)


@ray.remote
def _pack_block(t, base: int, seq_len: int) -> pa.Table:
    import numpy as np
    t = _to_arrow(t)
    if not t.num_rows or "doc_id" not in t.schema.names:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "seq_id": pa.array([], pa.int64()),
                         "tok_start": pa.array([], pa.int64()),
                         "n_toks": pa.array([], pa.int64())})
    doc = t.column("doc_id").to_numpy(zero_copy_only=False)
    ntok = t.column("ntok").to_numpy(zero_copy_only=False)
    off = base + np.concatenate(([0], np.cumsum(ntok)[:-1])) \
        if len(ntok) else np.zeros(0, np.int64)
    keep = ntok > 0
    doc, ntok, off = doc[keep], ntok[keep], off[keep]
    first = off // seq_len
    nseq = (off + ntok - 1) // seq_len + 1 - first
    # within-group index 0..nseq-1 for each emitted span row
    ends = np.cumsum(nseq)
    within = np.arange(int(ends[-1]) if len(ends) else 0) \
        - np.repeat(ends - nseq, nseq)
    seq = np.repeat(first, nseq) + within
    o = np.repeat(off, nseq)
    lo = np.maximum(o, seq * seq_len)
    hi = np.minimum(np.repeat(off + ntok, nseq), (seq + 1) * seq_len)
    return pa.table({"doc_id": pa.array(np.repeat(doc, nseq), pa.int64()),
                     "seq_id": pa.array(seq, pa.int64()),
                     "tok_start": pa.array(lo - o, pa.int64()),
                     "n_toks": pa.array(hi - lo, pa.int64())})


def pack_sequences(ds: rd.Dataset, *, seq_len: int = 128,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> rd.Dataset:
    """(doc_id, seq_id, tok_start, n_toks): which slice of each
    document lands in which fixed-length training sequence when the
    corpus token stream is concatenated in doc_id order and cut every
    seq_len tokens.  seq_id and tok_start are 0-based; tokens are
    ``text.split(" ")`` (same as :func:`chunk_documents`), so every
    document has >= 1 token and contributes >= 1 span row."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def meta(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # len(text.split(" ")) == count of spaces + 1, matching the
        # doc_chunks oracle's string_split(text, ' ') tokenization
        ntok = pc.add(pc.count_substring(
            pc.cast(t.column(text_col), pa.string()), " "), 1)
        return pa.table({"doc_id": pc.cast(t.column(id_col), pa.int64()),
                         "ntok": pc.cast(ntok, pa.int64())})

    narrow = ds.select_columns([id_col, text_col]).map_batches(
        meta, batch_format="pyarrow").sort("doc_id")
    refs = narrow.to_arrow_refs()
    sums = ray.get([_block_ntok_sum.remote(r) for r in refs])
    bases, acc = [], 0
    for s in sums:
        bases.append(acc)
        acc += s
    packed = [_pack_block.remote(r, b, seq_len)
              for r, b in zip(refs, bases)]
    return rd.from_arrow_refs(packed)
