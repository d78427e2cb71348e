"""Exact-threshold Jaccard set-similarity self-join (AllPairs prefix
filtering — Bayardo et al. 2007 / Chaudhuri et al. 2006).

MinHash+LSH (dedup.py) finds near-dups PROBABILISTICALLY; when the
pipeline must certify "every pair with resemblance ≥ τ, no misses"
(legal-grade dedup audits, eval-set leakage sweeps), the exact
algorithm is prefix filtering over a global rare-first token order:
sort each document's shingle set by (df, shingle) ascending and keep
only its PREFIX of length

    p = s − ⌈τ·s⌉ + 1       (⌈τ·s⌉ = (τ_pct·s + 99) // 100)

— any pair with J ≥ τ must share ≥ ⌈τ·max(s_a,s_b)⌉ shingles, which
cannot all hide in both suffixes, so the pair surfaces in some
prefix-shingle group (no false negatives; the published AllPairs
guarantee). Candidates also pass the length filter
100·min(s) ≥ τ_pct·max(s) in-group before they are ever emitted.

Everything stays exact integers: the verified output carries
(inter, uni, jaccard_ppm = 1e6·inter // uni) and the threshold test
is 100·inter ≥ τ_pct·uni — no float ever (CLAUDE.md invariant).

Distributed shape (narrow rows only, payload never shuffles):
1. per-doc distinct shingles (one (g, doc) table, materialized — it
   feeds sizes, df, prefixes AND verification);
2. df per shingle: one groupby; attached back by broadcast sorted
   arrays under ``broadcast_limit`` (join_ready hash-join fallback);
3. prefix pick: one doc groupby (sort-by-(df,g) inside the ≤s-row
   group);
4. candidates: one prefix-shingle groupby, C(group,2) pairs after
   the length filter — rare-first ordering keeps prefix groups
   small (a hot shingle lands in prefixes only for docs that have
   almost nothing rarer, the documented AllPairs behavior);
5. verification WITHOUT shipping sets anywhere: distinct pairs
   expand to (doc, a, b) rows ×2, one hash join back to the gram
   table, and a (a, b, g) groupby counts each shared shingle twice —
   inter = #rows with count 2, finished by one (a, b) groupby. Cost
   Σ_pairs (s_a + s_b) narrow rows — linear in candidate volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .decontam import _doc_grams
from .dedup import _to_arrow_blocks, join_ready

__all__ = ["jaccard_pairs", "jaccard_oracle_sql"]


def _empty_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.int64()),
                     "doc_b": pa.array([], pa.int64()),
                     "inter": pa.array([], pa.int64()),
                     "uni": pa.array([], pa.int64()),
                     "jaccard_ppm": pa.array([], pa.int64())})


def jaccard_pairs(ds: rd.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 5,
                  tau_pct: int = 50,
                  broadcast_limit: int = 2_000_000,
                  n_part: int | None = None) -> rd.Dataset:
    """(doc_a, doc_b, inter, uni, jaccard_ppm) for EVERY unordered
    doc pair whose k-shingle Jaccard ≥ ``tau_pct``/100 — exact, no
    probabilistic misses."""
    from ..scale import scale_partitions
    P = n_part or scale_partitions()

    def shingle_partial(t: pa.Table) -> pa.Table:
        gs, ids = [], []
        for i, text in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            s = set(_doc_grams(text, k))
            gs.extend(s)
            ids.extend([i] * len(s))
        return pa.table({"g": pa.array(gs, pa.string()),
                         "doc": pa.array(ids, pa.int64())})

    grams = ds.select_columns([id_col, text_col]).map_batches(
        shingle_partial, batch_format="pyarrow").materialize()
    if grams.count() == 0:
        return rd.from_arrow(_empty_pairs())

    df_tab = _to_arrow_blocks(
        grams.groupby("g").aggregate(Count(alias_name="df"))) \
        .materialize()
    n_vocab = df_tab.count()

    if n_vocab <= broadcast_limit:
        dfp = df_tab.to_pandas().sort_values("g")
        keys_ref = ray.put(np.asarray(dfp["g"], dtype=object))
        dfs_ref = ray.put(dfp["df"].to_numpy(np.int64))

        def with_df(t: pa.Table) -> pa.Table:
            if not t.num_columns or not t.num_rows:
                return pa.table({"g": pa.array([], pa.string()),
                                 "doc": pa.array([], pa.int64()),
                                 "df": pa.array([], pa.int64())})
            keys = ray.get(keys_ref)
            dv = ray.get(dfs_ref)
            g = np.asarray(t.column("g").to_pandas(), dtype=object)
            return pa.table({
                "g": t.column("g"), "doc": t.column("doc"),
                "df": pa.array(dv[np.searchsorted(keys, g)],
                               pa.int64())})

        gdf = grams.map_batches(with_df, batch_format="pyarrow")
    else:                            # honest big-vocab path
        gdf = join_ready(grams, P).join(
            join_ready(df_tab, P), join_type="inner",
            num_partitions=P, on=("g",))

    def pick_prefix(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.string()),
                          "doc": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if not len(g):
            return empty
        s = len(g)
        need = (tau_pct * s + 99) // 100
        p = s - need + 1
        if p <= 0:
            return empty
        g = g.sort_values(["df", "g"], kind="mergesort").head(p)
        return pa.table({
            "g": pa.array(g["g"].tolist(), pa.string()),
            "doc": pa.array(g["doc"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(np.full(len(g), s, dtype=np.int64),
                          pa.int64())})

    prefixes = gdf.groupby("doc").map_groups(pick_prefix,
                                             batch_format="pandas")

    def pairs_of(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        if len(g) < 2:
            return empty
        g = g.drop_duplicates("doc").sort_values("doc")
        docs = g["doc"].to_numpy(np.int64)
        ss = g["s"].to_numpy(np.int64)
        ia, ib = np.triu_indices(len(docs), k=1)
        sa, sb = ss[ia], ss[ib]
        keep = 100 * np.minimum(sa, sb) >= \
            tau_pct * np.maximum(sa, sb)     # length filter
        return pa.table({
            "doc_a": pa.array(docs[ia[keep]], pa.int64()),
            "doc_b": pa.array(docs[ib[keep]], pa.int64())})

    cand = _to_arrow_blocks(
        prefixes.groupby("g").map_groups(pairs_of,
                                         batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_src"))).materialize()
    if cand.count() == 0:
        return rd.from_arrow(_empty_pairs())

    def expand(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return pa.table({
            "doc": pa.array(np.concatenate([a, b]), pa.int64()),
            "doc_a": pa.array(np.tile(a, 2), pa.int64()),
            "doc_b": pa.array(np.tile(b, 2), pa.int64())})

    sides = cand.map_batches(expand, batch_format="pyarrow")
    matched = join_ready(sides, P).join(
        join_ready(grams, P), join_type="inner",
        num_partitions=P, on=("doc",))

    def shared_partial(t: pa.Table) -> pa.Table:
        # batch-local combiner for the (a, b, g) count
        if not t.num_columns or not t.num_rows:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "doc_a": t.column("doc_a").to_numpy(),
            "doc_b": t.column("doc_b").to_numpy(),
            "g": np.asarray(t.column("g").to_pandas(), dtype=object)})
        g = df.groupby(["doc_a", "doc_b", "g"],
                       as_index=False).size()
        return pa.table({
            "doc_a": pa.array(g["doc_a"].to_numpy(np.int64),
                              pa.int64()),
            "doc_b": pa.array(g["doc_b"].to_numpy(np.int64),
                              pa.int64()),
            "g": pa.array(g["g"].tolist(), pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    per_gram = _to_arrow_blocks(
        matched.map_batches(shared_partial, batch_format="pyarrow")
               .groupby(["doc_a", "doc_b", "g"])
               .aggregate(Sum("c", alias_name="c")))

    def inter_partial(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64())})
        both = t.column("c").to_numpy() == 2    # in A and in B
        df = pd.DataFrame({
            "doc_a": t.column("doc_a").to_numpy()[both],
            "doc_b": t.column("doc_b").to_numpy()[both]})
        g = df.groupby(["doc_a", "doc_b"], as_index=False).size()
        return pa.table({
            "doc_a": pa.array(g["doc_a"].to_numpy(np.int64),
                              pa.int64()),
            "doc_b": pa.array(g["doc_b"].to_numpy(np.int64),
                              pa.int64()),
            "inter": pa.array(g["size"].to_numpy(np.int64),
                              pa.int64())})

    inter = _to_arrow_blocks(
        per_gram.map_batches(inter_partial, batch_format="pyarrow")
                .groupby(["doc_a", "doc_b"])
                .aggregate(Sum("inter", alias_name="inter")))

    sizes = _to_arrow_blocks(
        grams.groupby("doc").aggregate(Count(alias_name="s"))) \
        .to_pandas().sort_values("doc")
    sz_ref = ray.put((sizes["doc"].to_numpy(np.int64),
                      sizes["s"].to_numpy(np.int64)))

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return _empty_pairs()
        docs, sz = ray.get(sz_ref)
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        it = t.column("inter").to_numpy()
        sa = sz[np.searchsorted(docs, a)]
        sb = sz[np.searchsorted(docs, b)]
        uni = sa + sb - it
        keep = 100 * it >= tau_pct * uni
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "inter": pa.array(it[keep], pa.int64()),
            "uni": pa.array(uni[keep], pa.int64()),
            "jaccard_ppm": pa.array(
                1_000_000 * it[keep] // uni[keep], pa.int64())})

    return inter.map_batches(finish, batch_format="pyarrow")


def jaccard_oracle_sql(docs_cte: str, *, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 5,
                       tau_pct: int = 50) -> str:
    """Brute all-shared-shingle twin: LATERAL k-shingling (the
    containment.py 1-based-inclusive list-slice convention), pairwise
    shared counts, exact integer threshold."""
    return f"""
        WITH docs AS MATERIALIZED (
            SELECT {id_col} AS doc,
                   list_filter(string_split({text_col}, ' '),
                               t -> t <> '') AS ts
            FROM ({docs_cte})),
        sh AS MATERIALIZED (
            -- DuckDB list slices are 1-based INCLUSIVE (the
            -- containment.py convention): [i : i+k-1] is k tokens
            SELECT DISTINCT doc,
                   array_to_string(ts[i:i+{k - 1}], ' ') AS g
            FROM docs, LATERAL unnest(generate_series(
                   1, greatest(len(ts) - {k} + 1, 0))) AS t(i)),
        sz AS MATERIALIZED (
            SELECT doc, CAST(count(*) AS BIGINT) AS s
            FROM sh GROUP BY 1),
        inter AS MATERIALIZED (
            SELECT a.doc AS doc_a, b.doc AS doc_b,
                   CAST(count(*) AS BIGINT) AS i
            FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, i AS inter,
               CAST(sa.s + sb.s - i AS BIGINT) AS uni,
               CAST(1000000 * i // (sa.s + sb.s - i) AS BIGINT)
                   AS jaccard_ppm
        FROM inter
        JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
        WHERE 100 * i >= {tau_pct} * (sa.s + sb.s - i)"""
