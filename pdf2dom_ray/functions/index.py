"""Inverted-index construction: token → (doc-frequency, posting list).

The classic high-cardinality + hot-key aggregate: stopword tokens
appear in nearly every document, so a naive ``groupby(token)`` with
full posting lists ships an O(corpus) value for the hottest keys.
Bounded construction instead:

* per-batch partial: distinct (token, doc_id) pairs within the batch
  → per-token **first-K** sorted doc list + full distinct-doc count —
  partial state per token is capped at K regardless of how hot the
  token is;
* merge: the first-K + count merge is associative and commutative, so
  it runs as a **salted two-level reduction**: level 1 groups on
  (token, salt) — the salt spreads a hot token's partial rows over
  ``salt_buckets`` groups, bounding any single group at
  n_batches/salt_buckets rows — and level 2 merges the ≤salt_buckets
  survivors per token. Without this, a stopword's merge group grows
  with the number of batches (O(corpus) at 100 TB).

The full-index variant (uncapped postings, the thing search engines
shard) would partition postings by (token, doc-range) buckets; the
capped form here is what corpus-analysis pipelines actually read
(doc-frequency table + example docs) and keeps every shuffled row
O(K).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["inverted_index"]


def inverted_index(ds: rd.Dataset, *, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 20,
                   salt_buckets: int = 16) -> rd.Dataset:
    """(token, n_docs, postings) — postings = first k doc ids, sorted,
    comma-joined (stable cross-engine representation)."""
    import zlib

    def partial(t: pa.Table) -> pa.Table:
        tok_rows: dict[str, list[int]] = {}
        for d, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            for tok in set((text or "").split(" ")):
                if tok:
                    tok_rows.setdefault(tok, []).append(d)
        toks, counts, posts, salts = [], [], [], []
        for tok, docs in tok_rows.items():
            docs.sort()
            toks.append(tok)
            counts.append(len(docs))
            posts.append(docs[:k])
            # deterministic per-(token, batch) spread: the merge is
            # associative+commutative so ANY salt assignment yields
            # the same final result
            salts.append(zlib.crc32(f"{tok}:{docs[0]}".encode())
                         % salt_buckets)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "salt": pa.array(salts, pa.int64()),
            "n_docs": pa.array(counts, pa.int64()),
            "postings": pa.array(posts, pa.list_(pa.int64())),
        })

    def _merge_rows(g: pd.DataFrame) -> tuple[int, list[int]]:
        import heapq
        docs = heapq.merge(*[list(p) for p in g["postings"]])
        first_k: list[int] = []
        for d in docs:
            first_k.append(int(d))
            if len(first_k) == k:
                break
        return int(g["n_docs"].sum()), first_k

    def merge_l1(g: pd.DataFrame) -> pd.DataFrame:
        n, first_k = _merge_rows(g)
        return pd.DataFrame({"token": [g["token"].iloc[0]],
                             "n_docs": [n], "postings": [first_k]})

    def merge_l2(g: pd.DataFrame) -> pd.DataFrame:
        n, first_k = _merge_rows(g)
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "n_docs": [n],
            "postings": [",".join(str(d) for d in first_k)],
        })

    parts = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow")
    lvl1 = parts.groupby(["token", "salt"]).map_groups(
        merge_l1, batch_format="pandas")
    out = lvl1.groupby("token").map_groups(merge_l2,
                                           batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "token": t.column("token"),
            "n_docs": t.column("n_docs").cast(pa.int64()),
            "postings": t.column("postings"),
        }), batch_format="pyarrow")
