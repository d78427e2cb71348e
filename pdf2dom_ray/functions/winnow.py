"""Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS local document fingerprinting algorithm).

Per document: hash every k-token shingle, slide a w-wide window over
the hash sequence, and select the MINIMUM hash of each window with
the RIGHTMOST-tie rule. Winnowing guarantees any shared substring of
length ≥ w + k - 1 tokens contributes at least one shared selected
fingerprint (the matching guarantee that makes it the standard
plagiarism / near-dup candidate generator), while keeping the
selected set a ~2/(w+1) fraction of all shingles.

The per-doc summary (n_grams, n_selected, density_ppm) is all-integer
(CLAUDE.md oracle rule). Hashes are the first 10 hex digits of
md5(gram) — the repo's SQL-replayable hashing idiom
(functions/sampling.py) — packed with the gram position as
``h·2^20 + (2^20 - 1 - pos)`` so a single windowed MIN implements
min-hash + rightmost-tie exactly on both sides.

Scale shape: a pure per-document ``map_batches`` — no shuffle, no
driver state; the narrow summary is the only output. Docs shorter
than k tokens hash the whole text as one gram; the window truncates
at the tail (short docs select their global min).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["winnow_stats", "winnow_oracle_sql",
           "winnow_candidates", "winnow_candidates_oracle_sql"]

_POS_BITS = 20
_POS_CAP = 1 << _POS_BITS


def _select_count(hashes: np.ndarray, w: int) -> int:
    """#distinct packed window minima (rightmost-tie winnowing)."""
    n = len(hashes)
    if n == 0:
        return 0
    assert n < _POS_CAP, "winnow position packing overflow (>1M grams)"
    pos = np.arange(n, dtype=np.int64)
    key = hashes * _POS_CAP + (_POS_CAP - 1 - pos)
    n_win = max(n - w, 0) + 1
    mins = key[:n_win].copy()
    for s in range(1, w):
        end = min(n_win + s, n)
        np.minimum(mins[: end - s], key[s:end], out=mins[: end - s])
    return len(np.unique(mins))


def winnow_stats(ds: rd.Dataset, *, k: int = 3, w: int = 4,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> rd.Dataset:
    """(doc_id, n_grams, n_selected, density_ppm) per document."""

    def per_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        n_grams, n_sel = [], []
        for text in texts:
            ws = [x for x in (text or "").split(" ") if x]
            if len(ws) >= k:
                grams = [" ".join(ws[i:i + k])
                         for i in range(len(ws) - k + 1)]
            elif ws:
                grams = [text]
            else:
                grams = []
            h = np.array(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:10],
                     16) for g in grams], dtype=np.int64)
            n_grams.append(len(grams))
            n_sel.append(_select_count(h, w))
        ng = np.asarray(n_grams, dtype=np.int64)
        ns = np.asarray(n_sel, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(ng, pa.int64()),
            "n_selected": pa.array(ns, pa.int64()),
            "density_ppm": pa.array(
                (1_000_000 * ns) // np.maximum(ng, 1), pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def winnow_oracle_sql(docs_cte: str, *, k: int = 3, w: int = 4,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin: same md5-prefix hash, same packed windowed MIN."""
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(k))
    return f"""
        WITH t AS MATERIALIZED (
          SELECT CAST({id_col} AS BIGINT) AS doc_id, {text_col} AS txt,
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS ws
          FROM ({docs_cte})),
        g AS MATERIALIZED (
          SELECT doc_id, u.pos AS pos, u.h AS h FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, len(ws) - {k} + 1),
                     i -> struct_pack(
                       pos := i - 1,
                       h := CAST(('0x' || substr(md5({gram}), 1, 10))
                                 AS BIGINT)))) AS u
            FROM t WHERE len(ws) >= {k})
          UNION ALL
          SELECT doc_id, 0,
                 CAST(('0x' || substr(md5(txt), 1, 10)) AS BIGINT)
          FROM t WHERE len(ws) BETWEEN 1 AND {k - 1}),
        mk AS (
          SELECT doc_id, pos,
                 MIN(h * {_POS_CAP} + ({_POS_CAP - 1} - pos)) OVER
                   (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW
                    AND {w - 1} FOLLOWING) AS mkey,
                 COUNT(*) OVER (PARTITION BY doc_id) AS n
          FROM g),
        sel AS (
          SELECT doc_id, MAX(n) AS n,
                 COUNT(DISTINCT mkey) AS n_sel
          FROM mk WHERE pos <= GREATEST(n - {w}, 0)
          GROUP BY doc_id)
        SELECT doc_id, CAST(n AS BIGINT) AS n_grams,
               CAST(n_sel AS BIGINT) AS n_selected,
               CAST((1000000 * n_sel) // GREATEST(n, 1) AS BIGINT)
                   AS density_ppm
        FROM sel
        UNION ALL
        SELECT doc_id, 0, 0, 0 FROM t WHERE len(ws) = 0"""


def winnow_candidates(ds: rd.Dataset, *, k: int = 3, w: int = 4,
                      df_cap: int = 32, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_partitions: int | None = None) -> rd.Dataset:
    """(doc_a, doc_b, n_shared) — the MOSS candidate generator: pairs
    of documents sharing ≥ 1 selected winnowing fingerprint, with the
    count of shared selected fingerprints. The matching guarantee
    makes this the local-similarity complement of MinHash banding:
    any shared run of ≥ w + k − 1 tokens SURFACES here.

    Scale shape: per-doc selected-hash sets (the shuffle-free
    ``winnow_stats`` pass) → one fingerprint-keyed exchange emits
    pairs bucket-locally — fingerprints selected by more than
    ``df_cap`` documents are dropped WHOLE (boilerplate shingles; the
    index.py hot-postings discipline, replayed by the SQL twin's
    HAVING) so no bucket is quadratic — → one pair-keyed aggregate
    sums shared counts. Payloads never shuffle."""
    import pandas as pd

    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate

    n_part = num_partitions or scale_partitions()

    def selected(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_d, out_h = [], []
        for did, text in zip(ids, texts):
            ws = [x for x in (text or "").split(" ") if x]
            if len(ws) >= k:
                grams = [" ".join(ws[i:i + k])
                         for i in range(len(ws) - k + 1)]
            elif ws:
                grams = [text]
            else:
                continue
            h = np.array(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:10],
                     16) for g in grams], dtype=np.int64)
            n = len(h)
            pos = np.arange(n, dtype=np.int64)
            key = h * _POS_CAP + (_POS_CAP - 1 - pos)
            n_win = max(n - w, 0) + 1
            mins = key[:n_win].copy()
            for s in range(1, w):
                end = min(n_win + s, n)
                np.minimum(mins[: end - s], key[s:end],
                           out=mins[: end - s])
            sel = np.unique(np.unique(mins) // _POS_CAP)
            out_d.append(np.full(len(sel), did, dtype=np.int64))
            out_h.append(sel)
        if not out_d:
            return pa.table({"h": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        return pa.table({
            "h": pa.array(np.concatenate(out_h), pa.int64()),
            "d": pa.array(np.concatenate(out_d), pa.int64())})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        hsh = pd.util.hash_pandas_object(df["h"], index=False)
        return df.assign(__part=(hsh % n_part).astype("int64")
                         .to_numpy())

    def pairs(g: pd.DataFrame) -> pa.Table:
        out_a, out_b = [], []
        for _, grp in g.groupby("h", sort=False):
            mem = np.unique(grp["d"].to_numpy(np.int64))
            if len(mem) < 2 or len(mem) > df_cap:
                continue                     # solo or boilerplate
            ia, ib = np.triu_indices(len(mem), k=1)
            out_a.append(mem[ia])
            out_b.append(mem[ib])
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        df = pd.DataFrame({"doc_a": np.concatenate(out_a),
                           "doc_b": np.concatenate(out_b)}) \
            .groupby(["doc_a", "doc_b"], as_index=False).size()
        return pa.table({
            "doc_a": pa.array(df["doc_a"].to_numpy(np.int64),
                              pa.int64()),
            "doc_b": pa.array(df["doc_b"].to_numpy(np.int64),
                              pa.int64()),
            "n_shared": pa.array(df["size"].to_numpy(np.int64),
                                 pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False) \
            .agg(n_shared=("n_shared", "sum"))

    emitted = ds.map_batches(selected, batch_format="pyarrow") \
        .map_batches(tag, batch_format="pandas") \
        .groupby("__part").map_groups(
            lambda g: pairs(g.drop(columns="__part")),
            batch_format="pandas")
    out = hash_aggregate(emitted, ["doc_a", "doc_b"], combine,
                         num_partitions=n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "doc_a" not in df.columns:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64")})
        for c in ("doc_a", "doc_b", "n_shared"):
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(finish, batch_format="pandas")


def winnow_candidates_oracle_sql(docs_cte: str, *, k: int = 3,
                                 w: int = 4, df_cap: int = 32,
                                 text_col: str = "text",
                                 id_col: str = "doc_id") -> str:
    """Winnow CTEs → per-doc distinct selected hashes → df-capped
    self-join twin."""
    base = winnow_oracle_sql(docs_cte, k=k, w=w, text_col=text_col,
                             id_col=id_col)
    # reuse the mk CTE chain: rebuild it here with a sel-hash tail
    head = base.split("sel AS (")[0].rstrip().rstrip(",")
    return f"""{head},
        selh AS MATERIALIZED (
          SELECT DISTINCT doc_id, mkey // {_POS_CAP} AS h
          FROM mk WHERE pos <= GREATEST(n - {w}, 0)),
        ok AS MATERIALIZED (
          SELECT h FROM selh GROUP BY h
          HAVING COUNT(*) BETWEEN 2 AND {df_cap})
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM selh x JOIN selh y
          ON x.h = y.h AND x.doc_id < y.doc_id
        WHERE x.h IN (SELECT h FROM ok)
        GROUP BY 1, 2"""
