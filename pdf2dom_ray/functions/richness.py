"""Vocabulary richness / coverage estimators (Good–Turing, Chao1).

The two classic "how much vocabulary have we NOT seen yet"
estimators corpus teams run before committing a tokenizer vocab:

* **Good–Turing unseen mass** (Good 1953): the probability mass of
  unseen types is estimated by the singleton fraction, p₀ ≈ f₁/N —
  reported here as exact-integer ppm ``(10⁶·f₁)//N``.
* **Chao1 richness** (Chao 1984, bias-corrected form): total species
  (type) count estimate ``V + f₁(f₁−1)/(2(f₂+1))`` from the
  singleton/doubleton counts — the standard lower bound on true
  vocabulary size.

Tokenization matches the repo convention (split on single space,
drop empty tokens) so the DuckDB oracle's
``list_filter(str_split(text,' '), t -> t <> '')`` is exact.

Scale shape: per-batch (token, count) partials collapse through the
hash-partitioned aggregate (one narrow vocab-bounded exchange — token
text crosses the wire once, pre-reduced); each result block then
folds to FOUR int64 scalars (N, V, f₁, f₂) and the driver sums
O(blocks) scalar rows. All downstream arithmetic is integer — the
result is bit-exact under any partitioning (CLAUDE.md invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["vocab_richness", "vocab_richness_oracle_sql",
           "source_ttr", "source_ttr_oracle_sql"]


def _token_count_partial(t: pa.Table, text_col: str,
                         ngram: int) -> pa.Table:
    """Per-batch (type, count) partials; ``ngram > 1`` counts
    WITHIN-DOCUMENT adjacent token n-grams (space-joined) so type
    identity matches the SQL twin's ``ts[i] || ' ' || ts[i+1]``."""
    text = t.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, " ")
    lens = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(lens)), lens)[keep]
    toks = flat.filter(pa.array(keep))
    empty = pa.table({"token": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if not len(toks):
        return empty
    if ngram > 1:
        words = np.asarray(toks, dtype=object)
        # adjacency within the same source row only
        parts = [words]
        same_row = np.ones(len(words) - (ngram - 1), dtype=bool) \
            if len(words) >= ngram else np.zeros(0, dtype=bool)
        for k in range(1, ngram):
            same_row &= row_idx[k:len(words) - (ngram - 1) + k] == \
                row_idx[:len(words) - (ngram - 1)]
        if not same_row.any():
            return empty
        joined = words[:len(words) - (ngram - 1)]
        for k in range(1, ngram):
            joined = np.char.add(np.char.add(
                joined.astype(str), " "),
                words[k:len(words) - (ngram - 1) + k].astype(str))
        toks = pa.array(joined[same_row], pa.string())
    g = pa.table({"token": toks}).group_by("token") \
        .aggregate([("token", "count")])
    return g.rename_columns(["token", "cnt"])


def vocab_richness(ds: rd.Dataset, *, text_col: str = "text",
                   ngram: int = 1,
                   num_partitions: int | None = None) -> rd.Dataset:
    """One-row table: (n_tokens, vocab, f1, f2, p0_ppm, chao1) over
    ``ngram``-token types (1 = unigrams, 2 = within-doc bigrams)."""
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    partials = ds.map_batches(
        lambda t: _token_count_partial(t, text_col, ngram),
        batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False) \
            .agg(cnt=("cnt", "sum"))

    from ..stages.hashagg import hash_aggregate
    per_token = hash_aggregate(partials, ["token"], combine,
                               num_partitions=num_partitions)

    def moments(df: pd.DataFrame) -> pa.Table:
        if "cnt" not in df.columns or not len(df):
            z = pa.array([0], pa.int64())
            return pa.table({"n_tokens": z, "vocab": z,
                             "f1": z, "f2": z})
        c = df["cnt"].to_numpy(np.int64)
        return pa.table({
            "n_tokens": pa.array([int(c.sum())], pa.int64()),
            "vocab": pa.array([int(len(c))], pa.int64()),
            "f1": pa.array([int((c == 1).sum())], pa.int64()),
            "f2": pa.array([int((c == 2).sum())], pa.int64())})

    m = per_token.map_batches(moments,
                              batch_format="pandas").materialize()
    n = m.sum("n_tokens") or 0
    v = m.sum("vocab") or 0
    f1 = m.sum("f1") or 0
    f2 = m.sum("f2") or 0
    p0 = (1_000_000 * f1) // n if n else 0
    chao1 = v + (f1 * (f1 - 1)) // (2 * (f2 + 1))
    return rd.from_arrow(pa.table({
        "n_tokens": pa.array([n], pa.int64()),
        "vocab": pa.array([v], pa.int64()),
        "f1": pa.array([f1], pa.int64()),
        "f2": pa.array([f2], pa.int64()),
        "p0_ppm": pa.array([p0], pa.int64()),
        "chao1": pa.array([chao1], pa.int64())}))


def vocab_richness_oracle_sql(table: str = "documents",
                              text_col: str = "text",
                              ngram: int = 1) -> str:
    """DuckDB twin — integer arithmetic throughout; every ``//``
    numerator is provably non-negative (CLAUDE.md invariant)."""
    if ngram == 2:
        tok_cte = f"""
        WITH ts AS (
          SELECT list_filter(str_split({text_col}, ' '),
                             t -> t <> '') AS l
          FROM {table}),
        toks AS (
          SELECT l[i] || ' ' || l[i + 1] AS tok
          FROM ts, unnest(range(1, len(l))) AS u(i)),"""
    elif ngram == 1:
        tok_cte = f"""
        WITH toks AS (
          SELECT unnest(list_filter(str_split({text_col}, ' '),
                                    t -> t <> '')) AS tok
          FROM {table}),"""
    else:
        raise ValueError("oracle supports ngram 1 or 2")
    return tok_cte + f"""
        cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        s AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS vocab,
                     CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1
                                       ELSE 0 END), 0) AS BIGINT)
                         AS f1,
                     CAST(COALESCE(SUM(CASE WHEN c = 2 THEN 1
                                       ELSE 0 END), 0) AS BIGINT)
                         AS f2
              FROM cnt)
        SELECT n_tokens, vocab, f1, f2,
               CAST(CASE WHEN n_tokens = 0 THEN 0
                    ELSE (1000000 * f1) // n_tokens END AS BIGINT)
                   AS p0_ppm,
               CAST(vocab + (f1 * (f1 - 1)) // (2 * (f2 + 1))
                    AS BIGINT) AS chao1
        FROM s
    """


def source_ttr(ds: rd.Dataset, *, group_col: str = "source",
               text_col: str = "text",
               num_partitions: int | None = None) -> rd.Dataset:
    """Per-group type-token ratio (the lexical-diversity screen run
    per source before mixing): (group, n_tokens, n_types, ttr_ppm)
    with ``ttr_ppm = 10⁶·types//tokens`` — exact integers.

    Scale shape: per-batch (group, token, cnt) partials → ONE
    (group, token) hash exchange (pre-reduced, token text crosses
    once) → per-block fold to (group, Σcnt, #rows) → driver fold over
    O(groups·blocks) narrow rows.
    """
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    def partial(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lists = pc.split_pattern(text, " ")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(lens)), lens)[keep]
        toks = flat.filter(pa.array(keep))
        grp = np.asarray(t.column(group_col), dtype=object)[row_idx]
        if not len(toks):
            return pa.table({
                "grp": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64())})
        df = pd.DataFrame({"grp": grp,
                           "token": np.asarray(toks, dtype=object),
                           "cnt": np.ones(len(toks), np.int64)})
        g = df.groupby(["grp", "token"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["grp", "token"], as_index=False) \
            .agg(cnt=("cnt", "sum"))

    from ..stages.hashagg import hash_aggregate
    per_tok = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["grp", "token"], combine, num_partitions=num_partitions)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if "cnt" not in df.columns or not len(df):
            return pd.DataFrame({"grp": [], "n_tokens": [],
                                 "n_types": []})
        out = df.groupby("grp", as_index=False) \
            .agg(n_tokens=("cnt", "sum"), n_types=("cnt", "size"))
        return out

    from .fold import bounded_fold_tables
    parts = per_tok.map_batches(moments, batch_format="pandas")
    tables = bounded_fold_tables(parts)
    empty = pa.table({"source": pa.array([], pa.string()),
                      "n_tokens": pa.array([], pa.int64()),
                      "n_types": pa.array([], pa.int64()),
                      "ttr_ppm": pa.array([], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    schema = pa.schema([("grp", pa.string()),
                        ("n_tokens", pa.int64()),
                        ("n_types", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().groupby("grp", as_index=False).sum() \
        .sort_values("grp")
    nt = merged["n_tokens"].to_numpy(np.int64)
    ty = merged["n_types"].to_numpy(np.int64)
    return rd.from_arrow(pa.table({
        "source": pa.array(merged["grp"], pa.string()),
        "n_tokens": pa.array(nt, pa.int64()),
        "n_types": pa.array(ty, pa.int64()),
        "ttr_ppm": pa.array((1_000_000 * ty) // np.maximum(nt, 1),
                            pa.int64())}))


def source_ttr_oracle_sql(table: str = "documents",
                          group_col: str = "source",
                          text_col: str = "text") -> str:
    return f"""
        WITH toks AS (
          SELECT {group_col} AS grp,
                 unnest(list_filter(str_split({text_col}, ' '),
                                    t -> t <> '')) AS tok
          FROM {table}),
        cnt AS (SELECT grp, tok, COUNT(*) AS c FROM toks
                GROUP BY 1, 2),
        s AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_types
              FROM cnt GROUP BY 1)
        SELECT grp AS source, n_tokens, n_types,
               -- numerator non-negative: truncation == floor
               CAST((1000000 * n_types) // n_tokens AS BIGINT)
                   AS ttr_ppm
        FROM s ORDER BY 1
    """
