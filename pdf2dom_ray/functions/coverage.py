"""Greedy maximum-coverage document selection (submodular curation).

The data-selection primitive behind "pick the k most informative
documents": coverage of distinct tokens is monotone submodular, so
the greedy sweep (pick the document adding the most not-yet-covered
tokens, repeat) is the classic (1 − 1/e)-approximation — the shape
facility-location / coreset curation pipelines use to seed diverse
training mixes and dedup-aware samplers.

Deterministic closed form (the repo convention): k greedy rounds,
ties broken by the LOWEST doc id; the coverage unit is the distinct
3-word SHINGLE (documents shorter than 3 words contribute their
whole text — the dedup family's convention), so coverage favors
genuinely novel text rather than a shared tiny vocabulary, and gains
are exact integer counts the unrolled DuckDB twin hash-matches.

Scale shape: the (doc_id, token) incidence materializes ONCE as a
narrow distinct table (combiner-deduped per batch; the text never
re-enters). Each round is one broadcast + one map + a top-1 fold:
the covered-token set ships via ``ray.put`` (sorted array probe —
at web scale swap in the repo's Bloom filter, functions/bloom.py,
accepting the ε of false-covered tokens), every batch computes its
docs' marginal gains vectorized and emits its local argmax, the
driver folds blocks to the global argmax (k and per-round driver
traffic are both O(blocks), never O(docs)), and the winner's tokens
(one doc's set) extend the covered array. k rounds = k narrow
passes over the materialized incidence — no shuffle after the
initial dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["coverage_select", "coverage_oracle_sql",
           "shingle_novelty", "novelty_oracle_sql"]


def _shingle_incidence(t: "pa.Table", id_col: str,
                       text_col: str) -> "pa.Table":
    """Distinct (doc, 3-gram) incidence rows, VECTORIZED: flattened
    Arrow token buffer + two shifted pandas concats instead of a
    per-document Python loop (was the slowest shingler of the repo —
    the oov.py flat-buffer discipline). Empty tokens filtered exactly
    like the SQL twins' list_filter; docs with 1-2 nonempty tokens
    contribute their whole text as the single unit."""
    import pyarrow.compute as pc
    col = t.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(toks)), np.diff(offsets))
    vals = toks.values
    keep = pc.greater(pc.utf8_length(vals), 0).to_numpy(
        zero_copy_only=False)
    parent = parent[keep]
    ids_all = np.asarray(t.column(id_col), dtype=np.int64)
    s = pd.Series(np.asarray(vals.filter(pa.array(keep)).to_pandas(),
                             dtype=object))
    ids_out, tok_out = [], []
    if len(s) >= 3:
        same = parent[:-2] == parent[2:]
        if same.any():
            g = (s.iloc[:-2].reset_index(drop=True)
                 + " " + s.iloc[1:-1].reset_index(drop=True)
                 + " " + s.iloc[2:].reset_index(drop=True))
            df = pd.DataFrame({
                "d": ids_all[parent[:-2][same]],
                "u": g[same].to_numpy(dtype=object)}).drop_duplicates()
            ids_out.append(df["d"].to_numpy(np.int64))
            tok_out.append(df["u"].to_numpy(dtype=object))
    tok_counts = np.zeros(len(toks), dtype=np.int64)
    np.add.at(tok_counts, parent, 1)
    short = (tok_counts > 0) & (tok_counts < 3)
    if short.any():
        texts = col.to_pylist()
        sid = np.nonzero(short)[0]
        ids_out.append(ids_all[sid])
        tok_out.append(np.array([texts[i] for i in sid], dtype=object))
    if not ids_out:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "token": pa.array([], pa.string())})
    return pa.table({
        id_col: pa.array(np.concatenate(ids_out), pa.int64()),
        "token": pa.array(np.concatenate(tok_out).tolist(),
                          pa.string())})



def coverage_select(ds: rd.Dataset, k: int = 8, *,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> rd.Dataset:
    """(rank, doc_id, gain) — the k greedily-selected documents and
    the number of new tokens each contributed (rank is 1-based
    selection order)."""
    from ..stages.hashagg import hash_aggregate

    def incidence(t: pa.Table) -> pa.Table:
        return _shingle_incidence(t, id_col, text_col)

    # hash-partition by DOC (not the pair): every doc's rows must be
    # co-located so a block's per-doc gain is total, not partial —
    # dedup of (doc, token) still holds within the doc's partition
    inc = hash_aggregate(
        ds.select_columns([id_col, text_col])
          .map_batches(incidence, batch_format="pyarrow"),
        [id_col],
        lambda df: df.drop_duplicates([id_col, "token"])) \
        .materialize()

    refs = inc.to_arrow_refs()
    covered = np.empty(0, dtype=object)     # sorted token array
    out_rank, out_doc, out_gain = [], [], []

    @ray.remote
    def block_best(blk, cov: np.ndarray):
        t = blk if isinstance(blk, pa.Table) else \
            pa.Table.from_pandas(blk, preserve_index=False)
        if not t.num_rows or id_col not in t.schema.names:
            return None
        d = t.column(id_col).to_numpy()
        w = t.column("token").to_numpy(zero_copy_only=False)
        if len(cov):
            p = np.minimum(np.searchsorted(cov, w), len(cov) - 1)
            new = cov[p] != w
        else:
            new = np.ones(len(w), dtype=bool)
        g = pd.DataFrame({"d": d, "n": new.astype(np.int64)}) \
            .groupby("d")["n"].sum()
        if not len(g):
            return None
        best = g.sort_values(ascending=False)
        top = best.iloc[0]
        cand = best[best == top].index.min()   # tie → lowest id
        return int(top), int(cand)

    @ray.remote
    def block_tokens(blk, doc: int):
        t = blk if isinstance(blk, pa.Table) else \
            pa.Table.from_pandas(blk, preserve_index=False)
        if not t.num_rows or id_col not in t.schema.names:
            return np.empty(0, dtype=object)
        d = t.column(id_col).to_numpy()
        w = t.column("token").to_numpy(zero_copy_only=False)
        return w[d == doc]

    for r in range(k):
        # ship the covered set ONCE per round (zero-copy object-store
        # read in every task), not re-serialized per block_best call
        cov_ref = ray.put(covered)
        cands = [c for c in ray.get(
            [block_best.remote(b, cov_ref) for b in refs])
            if c is not None]
        if not cands:
            break
        cands.sort(key=lambda c: (-c[0], c[1]))
        gain, doc = cands[0]
        if gain == 0:
            # all tokens covered: remaining picks still take the
            # lowest unselected id with gain 0? No — the greedy stops
            # (the SQL twin's argmax over 0-gain rows would pick
            # already-selected docs; stopping keeps both sides exact)
            break
        out_rank.append(r + 1)
        out_doc.append(doc)
        out_gain.append(gain)
        toks = np.concatenate(ray.get(
            [block_tokens.remote(b, doc) for b in refs])
            or [np.empty(0, dtype=object)])
        covered = np.unique(np.concatenate([covered, toks]))

    return rd.from_arrow(pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "gain": pa.array(out_gain, pa.int64())}))


def coverage_oracle_sql(docs_cte: str, k: int = 8, *,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """Unrolled greedy: per round, per-doc uncovered-token counts,
    the (gain DESC, doc_id) argmax, and the grown covered set — all
    AS MATERIALIZED (CLAUDE.md invariant)."""
    parts = [f"""
        WITH inc AS MATERIALIZED (
          SELECT DISTINCT CAST({id_col} AS BIGINT) AS doc_id, tok
          FROM (
            SELECT {id_col}, unnest(
              CASE WHEN len(w) < 3 THEN [{text_col}]
                   ELSE list_distinct(list_transform(
                          generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' '
                               || w[i+2]))
              END) AS tok
            FROM (SELECT {id_col}, {text_col},
                         list_filter(string_split({text_col}, ' '),
                                     x -> x <> '') AS w
                  FROM ({docs_cte})))
          WHERE tok <> ''),
        cov_0 AS MATERIALIZED (SELECT tok FROM inc WHERE 1 = 0)"""]
    for r in range(1, k + 1):
        parts.append(f""",
        gain_{r} AS MATERIALIZED (
          SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
          FROM inc i
          WHERE i.tok NOT IN (SELECT tok FROM cov_{r - 1})
          GROUP BY i.doc_id),
        sel_{r} AS MATERIALIZED (
          SELECT CAST({r} AS BIGINT) AS rank, doc_id, gain
          FROM gain_{r} WHERE gain > 0
          ORDER BY gain DESC, doc_id LIMIT 1),
        cov_{r} AS MATERIALIZED (
          SELECT tok FROM cov_{r - 1}
          UNION
          SELECT i.tok FROM inc i
          JOIN sel_{r} s ON i.doc_id = s.doc_id)""")
    sel = " UNION ALL ".join(
        f"SELECT rank, doc_id, gain FROM sel_{r}"
        for r in range(1, k + 1))
    return "".join(parts) + f"\n        {sel}"


def shingle_novelty(ds: rd.Dataset, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    n_part: int | None = None) -> rd.Dataset:
    """(doc_id, n_shingles, n_novel, novelty_ppm): per-document
    first-occurrence attribution — a shingle is NOVEL for the lowest
    doc_id that contains it (the dedup family's earliest-
    representative convention), and a document's novelty is the ppm
    fraction of its distinct shingles it introduced. The curation
    signal behind "contamination curves" and keep-the-original
    near-dup policies.

    Scale shape: the same doc-partitioned incidence as
    ``coverage_select``; shingle owners come from ONE hash aggregate
    keyed by shingle (min doc per shingle — a combiner-friendly
    reduction); both per-doc counts (total, novel) are narrow
    hash aggregates, stitched by a ``join_ready`` left join over
    ≤ one row per doc. No driver pass anywhere.
    """
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .dedup import join_ready

    npart = n_part or scale_partitions()

    def incidence(t: pa.Table) -> pa.Table:
        return _shingle_incidence(t, id_col, text_col)

    inc = hash_aggregate(
        ds.select_columns([id_col, text_col])
          .map_batches(incidence, batch_format="pyarrow"),
        [id_col],
        lambda df: df.drop_duplicates([id_col, "token"])) \
        .materialize()

    # inc is globally (doc, token)-distinct, so the total is a
    # sum-of-ones — the idempotent combiner shape hash_aggregate
    # requires (nunique would re-count its own output on the merge
    # pass)
    totals = hash_aggregate(
        inc.map_batches(
            lambda df: df.assign(n_shingles=np.int64(1))
            [[id_col, "n_shingles"]],
            batch_format="pandas"),
        [id_col],
        lambda df: df.groupby(id_col, as_index=False)
        ["n_shingles"].sum())

    owners = hash_aggregate(
        inc.map_batches(
            lambda df: df.rename(columns={id_col: "owner"}),
            batch_format="pandas"),
        ["token"],
        lambda df: df.groupby("token", as_index=False)
        .agg(owner=("owner", "min")))

    novel = hash_aggregate(
        owners.map_batches(
            lambda df: df.assign(n_novel=np.int64(1))
            [["owner", "n_novel"]],
            batch_format="pandas"),
        ["owner"],
        lambda df: df.groupby("owner", as_index=False)
        ["n_novel"].sum())

    joined = join_ready(totals, npart).join(
        join_ready(novel, npart), join_type="left_outer",
        num_partitions=npart, on=(id_col,), right_on=("owner",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = df["n_shingles"].to_numpy(np.int64)
        nov = df["n_novel"].fillna(0).to_numpy(np.int64)
        ppm = np.where(tot > 0, (1_000_000 * nov) // np.maximum(tot, 1),
                       0).astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_shingles": tot, "n_novel": nov,
            "novelty_ppm": ppm})

    return joined.map_batches(finish, batch_format="pandas")


def novelty_oracle_sql(docs_cte: str, *, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """Shingle incidence CTE + min-owner + the two counts."""
    return f"""
        WITH inc AS MATERIALIZED (
          SELECT DISTINCT CAST({id_col} AS BIGINT) AS doc_id, tok
          FROM (
            SELECT {id_col}, unnest(
              CASE WHEN len(w) < 3 THEN [{text_col}]
                   ELSE list_distinct(list_transform(
                          generate_series(1, len(w) - 2),
                          i -> w[i] || ' ' || w[i+1] || ' '
                               || w[i+2]))
              END) AS tok
            FROM (SELECT {id_col}, {text_col},
                         list_filter(string_split({text_col}, ' '),
                                     x -> x <> '') AS w
                  FROM ({docs_cte})))
          WHERE tok <> ''),
        own AS MATERIALIZED (
          SELECT tok, MIN(doc_id) AS owner FROM inc GROUP BY tok),
        nov AS MATERIALIZED (
          SELECT owner AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
          FROM own GROUP BY owner),
        tot AS MATERIALIZED (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
          FROM inc GROUP BY doc_id)
        SELECT t.doc_id, t.n_shingles,
               CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
               CAST(CASE WHEN t.n_shingles > 0
                    THEN (1000000 * COALESCE(n.n_novel, 0))
                         // t.n_shingles
                    ELSE 0 END AS BIGINT) AS novelty_ppm
        FROM tot t LEFT JOIN nov n ON t.doc_id = n.doc_id"""
