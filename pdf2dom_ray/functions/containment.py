"""Shingle-containment near-dup pairs (Broder 1997 containment).

Jaccard resemblance (the MinHash target) misses the asymmetric case a
crawl corpus is full of: a page CONTAINED in a longer one (article +
boilerplate wrapper, quoted post, syndicated excerpt).  Broder's
containment C(A,B) = |S(A)∩S(B)| / |S(A)| is the measure built for
it; this operator emits the max-containment form over document pairs

    containment_ppm = |shared shingles| · 10⁶ // min(|S(A)|, |S(B)|)

as an exact integer (CLAUDE.md invariant — a float ratio would flake
the oracle hash).

Candidate generation is the standard inverted-shingle trick with a
document-frequency cap: only shingles shared by 2..``df_cap``
documents generate pairs, so a stop-phrase shingle never explodes
quadratically — the same bound ``source_overlap`` (decontam.py) and
the capped inverted index (index.py) rely on.  Consequently
``shared_shingles`` counts shared RARE shingles and the ratio is a
lower bound on true containment — the conservative direction for
dedup (no false positives from boilerplate phrases), and exactly what
the SQL oracle replays.

Scale shape: per-batch distinct (shingle, doc) partials → ONE shingle
groupby whose per-group work is ≤ C(df_cap, 2) pairs → one narrow
pair groupby; per-doc shingle sizes attach via a broadcast
searchsorted probe under ``broadcast_limit`` docs (task fn, zero-copy
numpy ``ray.get``) with a ``join_ready``-guarded hash-join fallback
beyond.  No payload ever shuffles — only (shingle, id) and (id, id)
rows move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count

from .decontam import _doc_grams
from .dedup import _to_arrow_blocks, join_ready

__all__ = ["containment_pairs", "containment_oracle_sql"]


def containment_pairs(ds: rd.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 5,
                      df_cap: int = 8, min_shared: int = 2,
                      broadcast_limit: int = 10_000_000,
                      n_part: int | None = None) -> rd.Dataset:
    """(doc_a, doc_b, shared_shingles, containment_ppm) for unordered
    doc pairs sharing ≥ ``min_shared`` rare (df ≤ ``df_cap``) k-token
    shingles; ppm relative to the smaller document's distinct-shingle
    count."""
    from ..scale import scale_partitions
    npart = n_part or scale_partitions()

    def shingle_partial(t: pa.Table) -> pa.Table:
        gs, ids = [], []
        for i, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            s = set(_doc_grams(text, k))
            gs.extend(s)
            ids.extend([i] * len(s))
        return pa.table({"g": pa.array(gs, pa.string()),
                         "doc": pa.array(ids, pa.int64())})

    # grams feed BOTH the sizes groupby and the pair generation —
    # materialize once or the shingling lineage executes twice
    grams = ds.select_columns([id_col, text_col]).map_batches(
        shingle_partial, batch_format="pyarrow").materialize()
    # per-doc distinct-shingle count: grams are already distinct per
    # doc (each doc lives in one batch row), so a count IS the size;
    # zero-shingle docs are absent here and in every pair — consistent
    sizes = _to_arrow_blocks(
        grams.groupby("doc").aggregate(Count(alias_name="n_sh"))) \
        .materialize()

    def pairs_of(g: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        if not g.num_columns or not g.num_rows:
            return empty
        docs = sorted(set(g.column("doc").to_pylist()))
        if len(docs) < 2 or len(docs) > df_cap:
            return empty            # hot-shingle cap: no pairs
        a = [docs[i] for i in range(len(docs))
             for _ in range(len(docs) - i - 1)]
        b = [docs[j] for i in range(len(docs))
             for j in range(i + 1, len(docs))]
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    pair_rows = grams.groupby("g").map_groups(
        pairs_of, batch_format="pyarrow")
    shared = _to_arrow_blocks(
        pair_rows.groupby(["doc_a", "doc_b"]).aggregate(
            Count(alias_name="shared_shingles")))

    n_docs = sizes.count()
    if n_docs == 0:
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "shared_shingles": pa.array([], pa.int64()),
            "containment_ppm": pa.array([], pa.int64())}))

    if n_docs <= broadcast_limit:
        sdf = sizes.to_pandas().sort_values("doc")
        ref = ray.put((sdf["doc"].to_numpy(np.int64),
                       sdf["n_sh"].to_numpy(np.int64)))

        def attach(t: pa.Table) -> pa.Table:
            if not t.num_columns or not t.num_rows:
                return pa.table({
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "shared_shingles": pa.array([], pa.int64()),
                    "containment_ppm": pa.array([], pa.int64())})
            keys, vals = ray.get(ref)       # zero-copy numpy
            da = np.asarray(t.column("doc_a"), dtype=np.int64)
            db = np.asarray(t.column("doc_b"), dtype=np.int64)
            sh = np.asarray(t.column("shared_shingles"),
                            dtype=np.int64)
            na = vals[np.searchsorted(keys, da)]
            nb = vals[np.searchsorted(keys, db)]
            denom = np.maximum(np.minimum(na, nb), 1)
            ppm = sh * 1_000_000 // denom
            keep = sh >= min_shared
            return pa.table({
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "shared_shingles": pa.array(sh[keep], pa.int64()),
                "containment_ppm": pa.array(ppm[keep], pa.int64())})

        return shared.map_batches(attach, batch_format="pyarrow")

    # big-corpus path: two narrow hash joins on the doc key
    shared = join_ready(shared, npart)
    sa = join_ready(sizes.rename_columns({"doc": "doc_a",
                                          "n_sh": "n_a"}), npart)
    sb = join_ready(sizes.rename_columns({"doc": "doc_b",
                                          "n_sh": "n_b"}), npart)
    j = shared.join(sa, join_type="inner", num_partitions=npart,
                    on=("doc_a",)) \
        .join(sb, join_type="inner", num_partitions=npart,
              on=("doc_b",))

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "shared_shingles": pa.array([], pa.int64()),
                "containment_ppm": pa.array([], pa.int64())})
        sh = np.asarray(t.column("shared_shingles"), dtype=np.int64)
        na = np.asarray(t.column("n_a"), dtype=np.int64)
        nb = np.asarray(t.column("n_b"), dtype=np.int64)
        denom = np.maximum(np.minimum(na, nb), 1)
        ppm = sh * 1_000_000 // denom
        keep = sh >= min_shared
        return pa.table({
            "doc_a": t.column("doc_a").cast(pa.int64()).filter(
                pa.array(keep)),
            "doc_b": t.column("doc_b").cast(pa.int64()).filter(
                pa.array(keep)),
            "shared_shingles": pa.array(sh[keep], pa.int64()),
            "containment_ppm": pa.array(ppm[keep], pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


def containment_oracle_sql(*, table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text", k: int = 5,
                           df_cap: int = 8,
                           min_shared: int = 2) -> str:
    """DuckDB twin: LATERAL shingle generation (the source_overlap
    convention), df-capped pair join, integer ppm."""
    return f"""
        WITH clean AS (
          SELECT {id_col} AS doc,
                 list_filter(string_split({text_col}, ' '),
                             t -> t <> '') AS ts
          FROM {table}
        ), grams AS (
          -- DuckDB list slices are 1-based INCLUSIVE: [i : i+k-1]
          -- is exactly k tokens (the source_overlap convention)
          SELECT DISTINCT doc,
                 array_to_string(ts[i:i+{k - 1}], ' ') AS g
          FROM clean, LATERAL unnest(generate_series(
                 1, greatest(len(ts) - {k} + 1, 0))) AS t(i)
        ), sizes AS (
          SELECT doc, CAST(count(*) AS BIGINT) AS n_sh
          FROM grams GROUP BY doc
        ), keep AS (
          SELECT g FROM grams GROUP BY g
          HAVING count(*) BETWEEN 2 AND {df_cap}
        ), p AS (
          SELECT a.doc AS doc_a, b.doc AS doc_b,
                 CAST(count(*) AS BIGINT) AS shared_shingles
          FROM grams a JOIN grams b
            ON a.g = b.g AND a.doc < b.doc
          WHERE a.g IN (SELECT g FROM keep)
          GROUP BY 1, 2
          HAVING count(*) >= {min_shared}
        )
        SELECT doc_a, doc_b, shared_shingles,
               CAST(shared_shingles * 1000000
                    // greatest(least(sa.n_sh, sb.n_sh), 1)
                    AS BIGINT) AS containment_ppm
        FROM p JOIN sizes sa ON sa.doc = p.doc_a
               JOIN sizes sb ON sb.doc = p.doc_b"""
