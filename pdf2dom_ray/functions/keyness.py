"""Source-distinctive vocabulary (keyness by exact ppm lift).

"What terms characterize THIS slice?" is the corpus auditor's first
question about a new source (spam vocabularies, boilerplate leaks,
domain jargon, language contamination). The classic keyness statistics
(Dunning log-likelihood, χ²) need logs or fractional denominators; the
relative-risk LIFT of a token t in source s versus the rest of the
corpus,

    lift(t, s) = [c_s(t) / N_s] / [c_rest(t) / N_rest]

is a pure ratio of integers, quantized here with ONE floor division —
lift_ppm = (1e6 · c_s(t) · N_rest) // ((c_rest(t) + 1) · N_s) — the
+1 is add-one smoothing on the REST count so tokens exclusive to s
(c_rest = 0) get a large finite lift instead of a division by zero.
All-integer, so the distributed result hash-matches the DuckDB oracle
(the CLAUDE.md invariant). Products must stay < 2^63: fine to ~1e9
tokens per slice; quantize counts (e.g. //1000) past that.

Distributed shape: one (source, token) count exchange (batch-local
combiners first), per-source totals broadcast, global per-token
totals attached by broadcast sorted-array searchsorted under
``broadcast_limit`` (the tfidf df-table pattern; a ``join_ready``
hash join is the honest fallback past it), then ``grouped_topk``
bounds the answer to k rows per source with its idempotent per-batch
partial cut — no stage ever materializes the vocabulary on one worker
beyond the broadcast bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["source_keyness", "keyness_oracle_sql"]


def source_keyness(ds: rd.Dataset, *, text_col: str = "text",
                   key_col: str = "source", k: int = 5,
                   min_count: int = 2,
                   broadcast_limit: int = 2_000_000,
                   n_part: int | None = None) -> rd.Dataset:
    """(source, token, c, lift_ppm, rank): the ``k`` most
    source-distinctive tokens per source by smoothed ppm lift
    (ties broken by token asc); tokens below ``min_count`` in-source
    occurrences are ignored (hapax noise floor)."""
    from ..scale import scale_partitions
    from .dedup import _to_arrow_blocks, join_ready
    from .topk import grouped_topk

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(toks).to_pandas(),
                          dtype=object)
        src = np.repeat(np.asarray(t.column(key_col).to_pandas(),
                                   dtype=object), lens)
        g = pd.DataFrame({"source": src, "token": flat}) \
            .groupby(["source", "token"], as_index=False).size()
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "token": pa.array(g["token"].tolist(), pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    counts = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["source", "token"])
          .aggregate(Sum("c", alias_name="c"))).materialize()
    if counts.count() == 0:
        return rd.from_arrow(_empty_out())

    totals = _to_arrow_blocks(
        counts.groupby("source").aggregate(Sum("c", alias_name="n"))
    ).to_pandas().sort_values("source")
    srcs = np.asarray(totals["source"], dtype=object)
    ns = totals["n"].to_numpy(np.int64)
    n_total = int(ns.sum())
    srcs_ref, ns_ref = ray.put(srcs), ray.put(ns)

    gtok = _to_arrow_blocks(
        counts.groupby("token").aggregate(Sum("c", alias_name="g"))) \
        .materialize()
    n_vocab = gtok.count()

    def lift_from(gt_keys_ref, gt_g_ref):
        def lift(t: pa.Table) -> pa.Table:
            if not t.num_columns or not t.num_rows:
                return _empty_counts()
            keys = ray.get(gt_keys_ref)
            gv = ray.get(gt_g_ref)
            ss = ray.get(srcs_ref)
            nn = ray.get(ns_ref)
            tok = np.asarray(t.column("token").to_pandas(),
                             dtype=object)
            src = np.asarray(t.column("source").to_pandas(),
                             dtype=object)
            c = t.column("c").to_numpy()
            keep = c >= min_count
            tok, src, c = tok[keep], src[keep], c[keep]
            g = gv[np.searchsorted(keys, tok)]
            n_s = nn[np.searchsorted(ss, src)]
            lp = (1_000_000 * c * (n_total - n_s)) \
                // ((g - c + 1) * n_s)
            return pa.table({
                "source": pa.array(src.tolist(), pa.string()),
                "token": pa.array(tok.tolist(), pa.string()),
                "c": pa.array(c, pa.int64()),
                "lift_ppm": pa.array(lp, pa.int64())})
        return lift

    if n_vocab <= broadcast_limit:
        gt = gtok.to_pandas().sort_values("token")
        gt_keys = ray.put(np.asarray(gt["token"], dtype=object))
        gt_g = ray.put(gt["g"].to_numpy(np.int64))
        lifted = counts.map_batches(lift_from(gt_keys, gt_g),
                                    batch_format="pyarrow")
    else:                            # honest big-vocab path
        P = n_part or scale_partitions()

        def join_lift(t: pa.Table) -> pa.Table:
            if not t.num_columns or not t.num_rows:
                return _empty_counts()
            ss = ray.get(srcs_ref)
            nn = ray.get(ns_ref)
            src = np.asarray(t.column("source").to_pandas(),
                             dtype=object)
            c = t.column("c").to_numpy()
            g = t.column("g").to_numpy()
            keep = c >= min_count
            src, c, g = src[keep], c[keep], g[keep]
            tok = np.asarray(t.column("token").to_pandas(),
                             dtype=object)[keep]
            n_s = nn[np.searchsorted(ss, src)]
            lp = (1_000_000 * c * (n_total - n_s)) \
                // ((g - c + 1) * n_s)
            return pa.table({
                "source": pa.array(src.tolist(), pa.string()),
                "token": pa.array(tok.tolist(), pa.string()),
                "c": pa.array(c, pa.int64()),
                "lift_ppm": pa.array(lp, pa.int64())})

        joined = join_ready(counts, P).join(
            join_ready(gtok, P), join_type="inner",
            num_partitions=P, on=("token",))
        lifted = joined.map_batches(join_lift, batch_format="pyarrow")

    return grouped_topk(lifted, "source",
                        ["lift_ppm", "token"], [False, True], k)


def _empty_counts() -> pa.Table:
    return pa.table({"source": pa.array([], pa.string()),
                     "token": pa.array([], pa.string()),
                     "c": pa.array([], pa.int64()),
                     "lift_ppm": pa.array([], pa.int64())})


def _empty_out() -> pa.Table:
    t = _empty_counts()
    return t.append_column("rank", pa.array([], pa.int64()))


def keyness_oracle_sql(docs_cte: str, *, text_col: str = "text",
                       key_col: str = "source", k: int = 5,
                       min_count: int = 2) -> str:
    """The same smoothed integer lift + per-source rank in DuckDB
    (floor division // both engines; QUALIFY row_number with the
    identical (lift DESC, token ASC) tie-break)."""
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
        g AS MATERIALIZED (
            SELECT token, CAST(SUM(c) AS BIGINT) AS g
            FROM cnt GROUP BY 1),
        nt AS MATERIALIZED (SELECT CAST(SUM(n) AS BIGINT) AS n_total
                            FROM tot),
        lifted AS MATERIALIZED (
            SELECT cnt.source, cnt.token, cnt.c,
                   CAST((1000000 * cnt.c * (nt.n_total - tot.n))
                        // ((g.g - cnt.c + 1) * tot.n)
                        AS BIGINT) AS lift_ppm
            FROM cnt
            JOIN tot USING (source) JOIN g USING (token)
            CROSS JOIN nt
            WHERE cnt.c >= {min_count})
        SELECT source, token, c, lift_ppm,
               CAST(row_number() OVER (PARTITION BY source
                    ORDER BY lift_ppm DESC, token) AS BIGINT) AS rank
        FROM lifted
        QUALIFY rank <= {k}"""
