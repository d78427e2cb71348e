"""Vocabulary-coverage / OOV-rate scoring (tokenizer-fit diagnostic).

Before committing a tokenizer or a vocabulary budget, training-data
pipelines measure how much of each document falls OUTSIDE a fixed
top-V vocabulary — high OOV rate flags boilerplate-free foreign text,
OCR noise and codes that will fragment into bytes at training time
(cf. the fertility/coverage audits in the Gopher and BLOOM data
papers). This operator elects the exact global top-``vocab_size``
tokens (count desc, token asc — a total order, so the vocabulary is
deterministic) and scores every document against it:

    oov_ppm = n_oov · 10⁶ // n_tokens        (exact integer)

Zero-token documents are dropped (no denominator), matching the SQL
twin.

Scale shape: per-batch pandas token-count partials → one narrow
hash-partitioned groupby (the classifier.py combiner pattern) →
per-block top-V cut + bounded driver merge (``ann._take_ordered``:
O(V·√blocks) driver rows past 64 blocks) → the V-token vocabulary is
``ray.put`` ONCE and probed per batch with a zero-copy
``np.searchsorted`` over Arrow's flattened token buffer — the scoring
pass is one vectorized scan, no exchange, no Python per-row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = ["oov_rate"]


def _flat_tokens(col: pa.ChunkedArray):
    """(values, parent_row_index) of space-split tokens, vectorized."""
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(toks)), np.diff(offsets))
    vals = np.asarray(toks.values.to_pandas(), dtype=object)
    keep = vals != ""
    return vals[keep], parent[keep]


def oov_rate(ds: rd.Dataset, *, text_col: str = "text",
             id_col: str = "doc_id", vocab_size: int = 256,
             num_partitions: int | None = None) -> rd.Dataset:
    """(doc_id, n_tokens, n_oov, oov_ppm) per document with ≥1 token,
    against the exact global top-``vocab_size`` token vocabulary."""
    from ..stages.hashagg import hash_aggregate
    from .ann import _take_ordered

    src = ds.select_columns([id_col, text_col]).materialize()

    def narrow(t: pa.Table) -> pa.Table:
        vals, _ = _flat_tokens(t.column(text_col))
        tok, cnt = np.unique(vals, return_counts=True)
        return pa.table({"token": pa.array(tok.tolist(), pa.string()),
                         "c": pa.array(cnt, pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).agg(c=("c", "sum"))

    counts = hash_aggregate(
        src.map_batches(narrow, batch_format="pyarrow"),
        ["token"], combine, num_partitions=num_partitions)
    empty = pa.table({"token": pa.array([], pa.string()),
                      "c": pa.array([], pa.int64())})
    vocab_tab = pa.concat_tables(
        b for b in ray.get(
            _take_ordered(counts,
                          [("c", "descending"), ("token", "ascending")],
                          vocab_size, empty).to_arrow_refs())
        if b.num_columns)
    vocab = np.sort(np.asarray(vocab_tab.column("token").to_pandas(),
                               dtype=object))
    vref = ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        voc = ray.get(vref)                 # zero-copy numpy read
        vals, parent = _flat_tokens(t.column(text_col))
        n_rows = t.num_rows
        n_tok = np.zeros(n_rows, dtype=np.int64)
        np.add.at(n_tok, parent, 1)
        oov = np.zeros(n_rows, dtype=np.int64)
        if len(vals):
            if len(voc):
                pos = np.minimum(np.searchsorted(voc, vals),
                                 len(voc) - 1)
                miss = voc[pos] != vals
            else:
                miss = np.ones(len(vals), dtype=bool)
            np.add.at(oov, parent[miss], 1)
        keep = n_tok > 0
        ids = np.asarray(t.column(id_col), dtype=np.int64)[keep]
        n_tok, oov = n_tok[keep], oov[keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_oov": pa.array(oov, pa.int64()),
            "oov_ppm": pa.array(oov * 1_000_000 // n_tok, pa.int64())})

    return src.map_batches(score, batch_format="pyarrow")


def oov_oracle_sql(*, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text",
                   vocab_size: int = 256) -> str:
    """DuckDB twin: same tokenization, same (count desc, token asc)
    vocabulary election, same integer ppm."""
    return f"""
        WITH toks AS (
          SELECT {id_col} AS doc_id,
                 unnest(string_split({text_col}, ' ')) AS tok
          FROM {table}
        ), tnz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        vocab AS (
          SELECT tok FROM (SELECT tok, count(*) AS c FROM tnz
                           GROUP BY tok)
          ORDER BY c DESC, tok ASC LIMIT {vocab_size}
        ), per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN tok IN (SELECT tok FROM vocab)
                          THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
          FROM tnz GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_oov,
               CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
        FROM per"""
