"""Vocabulary growth curve (Heaps' law audit).

The corpus-diagnostics staple: cumulative distinct-token count as a
function of cumulative corpus size, V(n) ≈ K·n^β (Heaps 1978; Baeza-
Yates & Ribeiro-Neto §6). Tokenizer and dedup teams read this curve
directly — a sub-Heaps flattening means duplication/templating, a
super-Heaps blowup means OCR noise or boilerplate explosion, and the
absolute level drives BPE vocab sizing. Computed over ``n_buckets``
equal doc_id ranges: bucket(d) = d·B // N, reported per bucket as the
CUMULATIVE (tokens seen, distinct tokens seen) prefix.

Scale shape: the distinct reduction makes this cheap — each batch
emits per-token MIN first-bucket partials (distinct within batch) and
per-bucket token-count partials; one narrow vocab-bounded groupby
folds the MINs (min-merge is associative ⇒ partition-invariant), one
tiny groupby folds bucket counts; the final cumsum walks B rows on
the driver. Token text never rides a payload exchange twice and the
curve itself is B rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min, Sum

__all__ = ["vocab_growth", "vocab_growth_oracle_sql"]


def vocab_growth(ds: rd.Dataset, *, n_docs: int, n_buckets: int = 10,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> rd.Dataset:
    """(bucket, n_tokens_cum, n_distinct_cum): the Heaps curve over
    ``n_buckets`` doc_id ranges of a corpus with ids 0..n_docs-1."""
    if n_buckets <= 0 or n_docs <= 0:
        raise ValueError("n_buckets and n_docs must be positive")

    def parts(t: pa.Table):
        """Non-empty tokens with their row buckets — empty tokens
        (empty texts, doubled spaces) dropped exactly like the SQL
        twin's ``list_filter(t -> t <> '')``."""
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        b = ids * n_buckets // n_docs
        toks = pc.split_pattern(text, " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        row_idx = row_idx[nonempty]
        counts = np.bincount(row_idx, minlength=len(lens)) \
            .astype(np.int64)
        return flat, b[row_idx], b, counts

    def first_partial(t: pa.Table) -> pa.Table:
        flat, tok_bucket, _, _ = parts(t)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "fb": pa.array([], pa.int64())})
        g = pa.table({"token": flat,
                      "fb": pa.array(tok_bucket, pa.int64())}) \
            .group_by("token").aggregate([("fb", "min")])
        return g.rename_columns(["token", "fb"])

    def count_partial(t: pa.Table) -> pa.Table:
        _, _, b, counts = parts(t)
        agg = pd.DataFrame({"bucket": b, "nt": counts}) \
            .groupby("bucket", as_index=False)["nt"].sum()
        return pa.table({"bucket": pa.array(agg["bucket"], pa.int64()),
                         "nt": pa.array(agg["nt"], pa.int64())})

    thin = ds.select_columns([id_col, text_col]).materialize()
    firsts = thin.map_batches(first_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Min("fb", alias_name="fb"))

    def new_per_bucket(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "nv": pa.array([], pa.int64())})
        fb = np.asarray(t.column("fb"), dtype=np.int64)
        agg = pd.DataFrame({"bucket": fb}).groupby(
            "bucket", as_index=False).size()
        return pa.table({"bucket": pa.array(agg["bucket"], pa.int64()),
                         "nv": pa.array(agg["size"], pa.int64())})

    nv = firsts.map_batches(new_per_bucket, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("nv", alias_name="nv")) \
        .to_pandas()
    nt = thin.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("nt", alias_name="nt")) \
        .to_pandas()

    buckets = np.arange(n_buckets, dtype=np.int64)
    ntv = np.zeros(n_buckets, dtype=np.int64)
    if len(nt):
        ntv[nt["bucket"].to_numpy(dtype=np.int64)] = \
            nt["nt"].to_numpy(dtype=np.int64)
    nvv = np.zeros(n_buckets, dtype=np.int64)
    if len(nv):
        nvv[nv["bucket"].to_numpy(dtype=np.int64)] = \
            nv["nv"].to_numpy(dtype=np.int64)
    return rd.from_arrow(pa.table({
        "bucket": pa.array(buckets, pa.int64()),
        "n_tokens_cum": pa.array(np.cumsum(ntv), pa.int64()),
        "n_distinct_cum": pa.array(np.cumsum(nvv), pa.int64()),
    }))


def vocab_growth_oracle_sql(*, n_docs, n_buckets: int = 10) -> str:
    """DuckDB twin: the same bucket rule, per-token MIN first bucket,
    and window cumsums (buckets with no docs fill from the generated
    series). ``n_docs`` may be an int or a SQL snippet like
    ``(SELECT count(*) FROM documents)``."""
    return f"""
        WITH toks AS (
            SELECT doc_id * {n_buckets} // {n_docs} AS b,
                   list_filter(string_split(text, ' '),
                               t -> t <> '') AS ts
            FROM documents),
        flat AS (
            SELECT b, ts[i] AS token
            FROM toks, LATERAL unnest(generate_series(
                   1, greatest(len(ts), 0))) t(i)),
        firsts AS (
            SELECT token, MIN(b) AS fb FROM flat GROUP BY token),
        per_nt AS (
            SELECT b, CAST(count(*) AS BIGINT) AS nt
            FROM flat GROUP BY b),
        per_nv AS (
            SELECT fb AS b, CAST(count(*) AS BIGINT) AS nv
            FROM firsts GROUP BY fb),
        grid AS (
            SELECT unnest(generate_series(0, {n_buckets - 1}))
                AS bucket)
        SELECT g.bucket,
               CAST(SUM(COALESCE(t.nt, 0)) OVER (ORDER BY g.bucket)
                    AS BIGINT) AS n_tokens_cum,
               CAST(SUM(COALESCE(v.nv, 0)) OVER (ORDER BY g.bucket)
                    AS BIGINT) AS n_distinct_cum
        FROM grid g
        LEFT JOIN per_nt t ON t.b = g.bucket
        LEFT JOIN per_nv v ON v.b = g.bucket
        ORDER BY g.bucket"""
