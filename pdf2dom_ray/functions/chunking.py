"""Fixed-size sequence chunking — the training-data last mile.

Before tokens reach a trainer they are cut into fixed-length
sequences. Cross-document *packing* is an inherently sequential
assignment (an offset threads through the whole corpus), so the
scalable form every pipeline actually ships is per-document chunking:
each document's token stream is split into ceil(n/seq_len) chunks
independently — row-local, shuffle-free, deterministic under any
partitioning. (True packing is then a per-partition concat of these
chunks at load time.)

Output: one row per chunk (doc_id, chunk_idx 1-based, n_tokens,
chunk_text) — the final chunk is the short remainder, matching the
SQL oracle's list-slice semantics exactly.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

__all__ = ["chunk_documents"]


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
