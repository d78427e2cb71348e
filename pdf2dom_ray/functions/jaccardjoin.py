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
                  driver_verify_limit: int = 100_000,
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

    # df counts over ~|corpus| nearly-unique shingles: the sort-based
    # Aggregate is the wrong tool (see stages/hashagg.py) — hash-
    # partitioned pandas combiners are ~2× faster here
    from ..stages.hashagg import hash_aggregate

    def df_combine(df: pd.DataFrame) -> pd.DataFrame:
        if "df" in df.columns:
            return df.groupby("g", as_index=False)["df"].sum()
        out = df.groupby("g", as_index=False).size()
        return out.rename(columns={"size": "df"})

    df_tab = _to_arrow_blocks(
        hash_aggregate(grams, ["g"], df_combine, P)).materialize()
    n_vocab = df_tab.count()

    def _prefix_df(g: pd.DataFrame) -> pa.Table:
        """Per-doc prefix over a frame that holds WHOLE docs (the
        shingle_partial block invariant) with a ``df`` column; only
        df ≥ 2 prefix rows survive — a df-1 shingle can never pair."""
        empty = pa.table({"g": pa.array([], pa.string()),
                          "doc": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if not len(g):
            return empty
        outs = []
        for doc, grp in g.groupby("doc", sort=False):
            s = len(grp)
            p = s - (tau_pct * s + 99) // 100 + 1
            if p <= 0:
                continue
            pre = grp.sort_values(["df", "g"],
                                  kind="mergesort").head(p)
            pre = pre[pre["df"] >= 2]
            if not len(pre):
                continue
            outs.append(pd.DataFrame({
                "g": pre["g"].to_numpy(object),
                "doc": np.full(len(pre), doc, dtype=np.int64),
                "s": np.full(len(pre), s, dtype=np.int64)}))
        if not outs:
            return empty
        cat = pd.concat(outs)
        return pa.table({
            "g": pa.array(cat["g"].tolist(), pa.string()),
            "doc": pa.array(cat["doc"].to_numpy(np.int64),
                            pa.int64()),
            "s": pa.array(cat["s"].to_numpy(np.int64), pa.int64())})

    if n_vocab <= broadcast_limit:
        dfp = df_tab.to_pandas().sort_values("g")
        keys_ref = ray.put(np.asarray(dfp["g"], dtype=object))
        dfs_ref = ray.put(dfp["df"].to_numpy(np.int64))

        def prefix_local(t: pa.Table) -> pa.Table:
            """df attach + prefix pick in ONE batch-local pass: each
            gram block holds whole docs by construction, so no doc
            exchange is needed at all on the broadcast path."""
            if not t.num_columns or not t.num_rows:
                return pa.table({"g": pa.array([], pa.string()),
                                 "doc": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            keys = ray.get(keys_ref)
            dv = ray.get(dfs_ref)
            g = np.asarray(t.column("g").to_pandas(), dtype=object)
            frame = pd.DataFrame({
                "g": g, "doc": t.column("doc").to_numpy(),
                "df": dv[np.searchsorted(keys, g)]})
            return _prefix_df(frame)

        prefixes = grams.map_batches(prefix_local,
                                     batch_format="pyarrow")
    else:                            # honest big-vocab path
        gdf = join_ready(grams, P).join(
            join_ready(df_tab, P), join_type="inner",
            num_partitions=P, on=("g",))
        prefixes = gdf.groupby("doc").map_groups(
            _prefix_df, batch_format="pandas")

    # candidate generation as a hash SELF-JOIN on the prefix shingle
    # (C-speed; a per-group Python callable over mostly-tiny groups
    # pays ~ms of overhead each) — both orders + self-pairs drop in
    # the vectorized filter below. The df ≥ 2 cut already shrank the
    # prefix table to shingles that CAN pair, so under
    # ``driver_verify_limit`` rows one driver pandas merge replaces
    # the whole join chain's fixed operator costs.
    prefixes = prefixes.materialize()
    n_pref = prefixes.count()
    if n_pref <= driver_verify_limit:
        pf = prefixes.to_pandas()
        j = pf.merge(pf.rename(columns={"doc": "doc_b",
                                        "s": "s_b"}), on="g")
        keep = (j["doc"] < j["doc_b"]) & \
            (100 * np.minimum(j["s"], j["s_b"])
             >= tau_pct * np.maximum(j["s"], j["s_b"]))
        cp = j[keep][["doc", "doc_b"]].drop_duplicates()
        cand = rd.from_arrow(pa.table({
            "doc_a": pa.array(cp["doc"].to_numpy(np.int64),
                              pa.int64()),
            "doc_b": pa.array(cp["doc_b"].to_numpy(np.int64),
                              pa.int64()),
            "n_src": pa.array(np.ones(len(cp), dtype=np.int64),
                              pa.int64())})).materialize()
        if len(cp) == 0:
            return rd.from_arrow(_empty_pairs())
        return _verify(cand, grams, P, tau_pct,
                       driver_verify_limit)

    def rename_b(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.table({"g": pa.array([], pa.string()),
                             "doc_b": pa.array([], pa.int64()),
                             "s_b": pa.array([], pa.int64())})
        return pa.table({"g": t.column("g"),
                         "doc_b": t.column("doc"),
                         "s_b": t.column("s")})

    paired = join_ready(prefixes, P).join(
        join_ready(prefixes.map_batches(rename_b,
                                        batch_format="pyarrow"), P),
        join_type="inner", num_partitions=P, on=("g",))

    def pair_filter(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        a = t.column("doc").to_numpy()
        b = t.column("doc_b").to_numpy()
        sa = t.column("s").to_numpy()
        sb = t.column("s_b").to_numpy()
        keep = (a < b) & (100 * np.minimum(sa, sb)
                          >= tau_pct * np.maximum(sa, sb))
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64())})

    cand = _to_arrow_blocks(
        paired.map_batches(pair_filter, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_src"))).materialize()
    if cand.count() == 0:
        return rd.from_arrow(_empty_pairs())

    return _verify(cand, grams, P, tau_pct,
                   driver_verify_limit)


def _verify(cand: rd.Dataset, grams: rd.Dataset, P: int,
            tau_pct: int, driver_verify_limit: int) -> rd.Dataset:
    """Exact intersection counts for the candidate pairs: one
    vectorized driver pass (two pandas hash merges) under
    ``driver_verify_limit`` pairs, else the distributed chain —
    expand pairs to (doc, a, b) rows, hash-join back to the gram
    table restricted to candidate docs, count shared shingles via
    an (a, b, g) groupby (count == 2 means both sides carry g).
    """
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

    # verification touches only candidate docs: broadcast their id
    # set (bounded by candidate volume) and pre-filter the gram table
    # before the hash join — the join then moves Σ(s_a+s_b) rows over
    # candidates instead of the whole corpus
    cand_tabs = [b for b in ray.get(cand.to_arrow_refs())
                 if b.num_columns]
    cand_docs = np.unique(np.concatenate(
        [np.concatenate([b.column("doc_a").to_numpy(),
                         b.column("doc_b").to_numpy()])
         for b in cand_tabs]))
    n_pairs = sum(b.num_rows for b in cand_tabs)
    cd_ref = ray.put(cand_docs)

    def only_cand(t: pa.Table) -> pa.Table:
        cd = ray.get(cd_ref)
        doc = t.column("doc").to_numpy()
        pos = np.searchsorted(cd, doc)
        pos_c = np.minimum(pos, max(len(cd) - 1, 0))
        return t.filter(pa.array((cd[pos_c] == doc) if len(cd)
                                 else np.zeros(len(doc), bool)))

    gsub = grams.map_batches(only_cand, batch_format="pyarrow")

    if n_pairs <= driver_verify_limit:
        # surviving candidates are a tiny fraction of the corpus:
        # verify them in one vectorized driver pass (two pandas hash
        # merges — NO Dataset join/aggregate fixed costs); the
        # distributed chain below is the honest path past the bound
        gp = gsub.to_pandas()
        pairs = pd.concat([b.select(["doc_a", "doc_b"]).to_pandas()
                           for b in cand_tabs])
        shared = pairs.merge(
            gp.rename(columns={"doc": "doc_a"}), on="doc_a").merge(
            gp.rename(columns={"doc": "doc_b"}), on=["doc_b", "g"])
        it = shared.groupby(["doc_a", "doc_b"]).size()
        sz = gp.groupby("doc").size()
        out = pairs.copy()
        key = list(zip(out["doc_a"], out["doc_b"]))
        out["inter"] = it.reindex(key, fill_value=0).to_numpy()
        out["uni"] = (sz.reindex(out["doc_a"]).to_numpy()
                      + sz.reindex(out["doc_b"]).to_numpy()
                      - out["inter"].to_numpy())
        keep = 100 * out["inter"] >= tau_pct * out["uni"]
        out = out[keep]
        return rd.from_arrow(pa.table({
            "doc_a": pa.array(out["doc_a"].to_numpy(np.int64),
                              pa.int64()),
            "doc_b": pa.array(out["doc_b"].to_numpy(np.int64),
                              pa.int64()),
            "inter": pa.array(out["inter"].to_numpy(np.int64),
                              pa.int64()),
            "uni": pa.array(out["uni"].to_numpy(np.int64),
                            pa.int64()),
            "jaccard_ppm": pa.array(
                1_000_000 * out["inter"].to_numpy(np.int64)
                // out["uni"].to_numpy(np.int64), pa.int64())}))

    sides = cand.map_batches(expand, batch_format="pyarrow")
    matched = join_ready(sides, P).join(
        join_ready(gsub, P), join_type="inner",
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

    def sizes_local(t: pa.Table) -> pa.Table:
        # whole docs per block (shingle_partial invariant): the
        # per-block count IS the doc's distinct-shingle size
        uv, cnt = np.unique(t.column("doc").to_numpy(),
                            return_counts=True)
        return pa.table({"doc": pa.array(uv, pa.int64()),
                         "s": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    sizes = gsub.map_batches(sizes_local, batch_format="pyarrow") \
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
