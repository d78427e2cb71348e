"""Pairwise total-variation divergence between corpus slices.

Corpus-mixing decisions (source weighting, domain-shift detection,
"did this crawl snapshot drift?") need a DISTANCE between the token
distributions of two slices. KL and JS are the textbook choices but
need logs — float transcendentals whose distributed sums flake the
last ulps (the CLAUDE.md integer-aggregate invariant exists for
exactly this). Total variation

    TV(a, b) = ½ Σ_t |p_a(t) − p_b(t)|

is the L1 sibling (bounds JS: ½·TV² ≤ JS ≤ TV·ln2 via Pinsker) and
has an exact integer form: quantize each per-source probability to
parts-per-billion with ONE floor division per (source, token) —
q_s(t) = (SCALE·c_s(t)) // N_s — then every downstream sum, |diff|
and the final //2 are pure int64, bit-exact under any partitioning
and replayable by the DuckDB oracle. SCALE·c must stay < 2^63: with
SCALE = 1e9 that caps per-source token totals at ~9.2e9; at true
100 TB scale drop SCALE to 1e6 (ppm quantization).

Distributed shape (all exchanges narrow, payload never shuffled):

1. per-batch tokenize (Arrow ``split_pattern``, the repo's
   ``string_split(text, ' ')`` twin) + batch-local (source, token)
   count combiner;
2. ONE (source, token) groupby finishes the counts; per-source totals
   are a tiny second groupby over those partials, broadcast as sorted
   numpy arrays (searchsorted probe — zero-copy task fn, no actor);
3. ONE token groupby co-locates each token's ≤S source rows;
   ``map_groups`` emits the C(S,2) pairwise |q_a − q_b| rows per
   token (S = #sources, a handful — the emit is O(vocab·S²) narrow
   int rows);
4. a final (source_a, source_b) groupby sums the per-token terms and
   floors //2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["source_tv_divergence", "source_tv_oracle_sql"]

SCALE = 1_000_000_000


def source_tv_divergence(ds: rd.Dataset, *, text_col: str = "text",
                         key_col: str = "source",
                         scale: int = SCALE,
                         driver_limit: int = 2_000_000) -> rd.Dataset:
    """(source_a, source_b, tv_ppb) for every unordered source pair
    (a < b lexicographically): the quantized total-variation distance
    between the two slices' whitespace-token distributions.

    After the one (source, token) count exchange the remaining state
    is S×V narrow rows; under ``driver_limit`` rows the pair loop is
    one numpy pass on the driver (each downstream Dataset stage costs
    ~0.5 s of fixed operator overhead at any size — five of them
    dwarfed the actual arithmetic), with the distributed token-keyed
    path kept beyond."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(toks).to_pandas(),
                          dtype=object)
        src = np.repeat(np.asarray(t.column(key_col).to_pandas(),
                                   dtype=object), lens)
        df = pd.DataFrame({"source": src, "token": flat})
        g = df.groupby(["source", "token"], as_index=False).size()
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "token": pa.array(g["token"].tolist(), pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    counts = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["source", "token"])
          .aggregate(Sum("c", alias_name="c"))).materialize()

    totals = _to_arrow_blocks(
        counts.groupby("source").aggregate(Sum("c", alias_name="n"))
    ).to_pandas().sort_values("source")
    srcs = np.asarray(totals["source"], dtype=object)
    if len(srcs) < 2:
        return rd.from_arrow(pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "tv_ppb": pa.array([], pa.int64())}))
    ns = totals["n"].to_numpy(np.int64)
    if counts.count() <= driver_limit:
        cdf = counts.to_pandas()
        s = np.searchsorted(srcs, np.asarray(cdf["source"],
                                             dtype=object))
        toks, tok_idx = np.unique(np.asarray(cdf["token"],
                                             dtype=object),
                                  return_inverse=True)
        q = np.zeros((len(toks), len(srcs)), dtype=np.int64)
        q[tok_idx, s] = scale * cdf["c"].to_numpy() // ns[s]
        ia, ib = np.triu_indices(len(srcs), k=1)
        tv = np.abs(q[:, ia] - q[:, ib]).sum(axis=0) // 2
        return rd.from_arrow(pa.table({
            "source_a": pa.array([srcs[i] for i in ia], pa.string()),
            "source_b": pa.array([srcs[i] for i in ib], pa.string()),
            "tv_ppb": pa.array(tv.astype(np.int64), pa.int64())}))

    srcs_ref = ray.put(srcs)
    ns_ref = ray.put(ns)

    def quantize(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"token": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "q": pa.array([], pa.int64())})
        ss = ray.get(srcs_ref)
        nn = ray.get(ns_ref)
        s = np.asarray(t.column("source").to_pandas(), dtype=object)
        c = t.column("c").to_numpy()
        pos = np.searchsorted(ss, s)
        return pa.table({
            "token": t.column("token"),
            "source": t.column("source"),
            "q": pa.array(scale * c // nn[pos], pa.int64())})

    q = counts.map_batches(quantize, batch_format="pyarrow")

    s_list = srcs.tolist()          # small; ships with the task
    ia, ib = np.triu_indices(len(s_list), k=1)

    def emit_pairs(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "d": pa.array([], pa.int64())})
        qq = np.zeros(len(s_list), dtype=np.int64)
        pos = np.searchsorted(np.asarray(s_list, dtype=object),
                              np.asarray(g["source"], dtype=object))
        qq[pos] = g["q"].to_numpy(np.int64)
        d = np.abs(qq[ia] - qq[ib])
        keep = d > 0                 # zero terms don't move the sum
        return pa.table({
            "source_a": pa.array([s_list[i] for i in ia[keep]],
                                 pa.string()),
            "source_b": pa.array([s_list[i] for i in ib[keep]],
                                 pa.string()),
            "d": pa.array(d[keep], pa.int64())})

    diffs = _to_arrow_blocks(
        q.groupby("token").map_groups(emit_pairs,
                                      batch_format="pandas"))

    # the result is inherently ≤ C(S,2) rows: finish on the driver,
    # reindexing against the full pair grid so IDENTICAL quantized
    # distributions still emit their pair at tv_ppb = 0 (the oracle's
    # pair grid always does)
    agg = diffs.groupby(["source_a", "source_b"]) \
        .aggregate(Sum("d", alias_name="d_sum"))
    tabs = [b for b in ray.get(agg.to_arrow_refs())
            if b.num_columns]       # schema-less empty-block guard
    per_pair = pa.concat_tables(tabs).to_pandas() if tabs else \
        pd.DataFrame({"source_a": [], "source_b": [], "d_sum": []})
    grid = pd.DataFrame({
        "source_a": [s_list[i] for i in ia],
        "source_b": [s_list[i] for i in ib]})
    out = grid.merge(per_pair, on=["source_a", "source_b"],
                     how="left")
    out["tv_ppb"] = (out["d_sum"].fillna(0).astype("int64") // 2)
    return rd.from_pandas(out[["source_a", "source_b", "tv_ppb"]])


def source_tv_oracle_sql(docs_cte: str, *, text_col: str = "text",
                         key_col: str = "source",
                         scale: int = SCALE) -> str:
    """The same quantized-TV arithmetic in DuckDB (floor division //
    matches numpy's; abs/sum/half all integer). The pair grid emits
    every source pair even at tv = 0, matching the Ray side's
    zero-row union."""
    return f"""
        WITH docs AS MATERIALIZED ({docs_cte}),
        tok AS MATERIALIZED (
            SELECT {key_col} AS source,
                   unnest(string_split({text_col}, ' ')) AS token
            FROM docs),
        cnt AS MATERIALIZED (
            SELECT source, token, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2),
        tot AS MATERIALIZED (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n
            FROM cnt GROUP BY 1),
        q AS MATERIALIZED (
            SELECT cnt.token, cnt.source,
                   CAST(({scale} * cnt.c) // tot.n AS BIGINT) AS q
            FROM cnt JOIN tot USING (source)),
        pairs AS MATERIALIZED (
            SELECT a.source AS source_a, b.source AS source_b
            FROM tot a JOIN tot b ON a.source < b.source),
        toks AS MATERIALIZED (SELECT DISTINCT token FROM q),
        d AS MATERIALIZED (
            SELECT p.source_a, p.source_b,
                   abs(COALESCE(qa.q, 0) - COALESCE(qb.q, 0)) AS d
            FROM pairs p CROSS JOIN toks t
            LEFT JOIN q qa ON qa.token = t.token
                          AND qa.source = p.source_a
            LEFT JOIN q qb ON qb.token = t.token
                          AND qb.source = p.source_b)
        SELECT source_a, source_b,
               CAST(SUM(d) // 2 AS BIGINT) AS tv_ppb
        FROM d GROUP BY 1, 2"""
