"""Host-level quality gating (domain filtering).

The FineWeb / RefinedWeb curation move the row-local quality filters
cannot make: judge the DOMAIN, not the document. Content farms and
machine-generated mirrors produce individually-plausible pages; what
gives them away is the host-wide quality mass. The gate aggregates a
per-document quality signal to its host, flags hosts whose MEAN falls
below a threshold, and annotates every document with its host's
verdict — the standard "domain-level blocklist learned from the
corpus itself" step (RefinedWeb §G.1 runs URL/domain filtering before
any per-document rule; FineWeb ablates domain-mean gates the same
way).

Signal and arithmetic are exact-integer per CLAUDE.md (the driver
hash-checks values): per-doc ``q_ppm = alpha_chars·10⁶ // n_chars``
(ASCII-letter density — the cheap proxy for prose vs. markup/number
dumps), and the host verdict compares cross-multiplied
``sum(q_ppm) < threshold_ppm · n_docs`` — no division, no floats, so
distributed partial sums match DuckDB bit-for-bit.

Scale shape: ONE scan over the payload produces narrow
(doc_id, host, q_ppm) rows — text never enters an exchange; the
narrow table is materialized once and consumed twice (host aggregate
+ annotate pass, the CLAUDE.md double-consume rule). Host verdicts
are a per-batch combiner → small hash groupby (rows ≤ hosts×batches).
The verdict table ships back by broadcast (sorted numpy +
searchsorted, ``ray.put`` once) under ``broadcast_limit`` hosts, or a
``join_ready``-guarded left join beyond — the hostgraph.py attach
convention. At 100 TB the host table is ~10⁷ rows (hosts, not pages):
comfortably the broadcast arm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = ["host_quality_gate", "host_quality_oracle_sql"]


def _doc_quality(t: pa.Table, url_col: str, text_col: str,
                 id_col: str) -> pa.Table:
    """Narrow (doc_id, host, q_ppm) rows: lowercased canonical host +
    integer ASCII-letter density. Empty texts score 0."""
    from .urlnorm import canonicalize, host_of
    text = t.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    alpha = pc.count_substring_regex(text, "[A-Za-z]") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    q = np.where(n_chars > 0, alpha * 1_000_000 // np.maximum(n_chars, 1),
                 0).astype(np.int64)
    return pa.table({
        id_col: t.column(id_col),
        "host": host_of(canonicalize(t.column(url_col))),
        "q_ppm": pa.array(q, pa.int64()),
    })


def host_quality_gate(ds: rd.Dataset, *, url_col: str = "url",
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold_ppm: int = 500_000,
                      broadcast_limit: int = 5_000_000,
                      num_partitions: int | None = None) -> rd.Dataset:
    """(doc_id, host, q_ppm, host_n_docs, host_q_sum,
    host_low_quality, kept): every document annotated with its host's
    corpus-learned quality verdict; ``kept`` = host mean quality ≥
    ``threshold_ppm`` (cross-multiplied integer comparison)."""
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate

    thin = ds.select_columns([id_col, url_col, text_col]).map_batches(
        lambda t: _doc_quality(t, url_col, text_col, id_col),
        batch_format="pyarrow").materialize()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # idempotent under re-application (hash_aggregate contract)
        return df.groupby("host", as_index=False).agg(
            host_q_sum=("host_q_sum", "sum"),
            host_n_docs=("host_n_docs", "sum"))

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t.column("host"),
            "host_q_sum": t.column("q_ppm"),
            "host_n_docs": pa.array(
                np.ones(t.num_rows, dtype=np.int64))})

    n_part = num_partitions or scale_partitions()
    hosts_tbl = hash_aggregate(
        thin.map_batches(narrow, batch_format="pyarrow"),
        ["host"], combine, num_partitions=n_part).materialize()
    n_hosts = hosts_tbl.count()

    keep = [id_col, "host", "q_ppm"]

    if n_hosts <= broadcast_limit:
        ht = pa.concat_tables(
            b for b in ray.get(hosts_tbl.to_arrow_refs())
            if b.num_columns)
        hs = np.asarray(ht.column("host").to_pandas(), dtype=object)
        sums = np.asarray(ht.column("host_q_sum").to_pandas(),
                          dtype=np.int64)
        ns = np.asarray(ht.column("host_n_docs").to_pandas(),
                        dtype=np.int64)
        order = np.argsort(hs)
        hs_ref = ray.put(hs[order])
        sums_ref = ray.put(sums[order])
        ns_ref = ray.put(ns[order])

        def attach(t: pa.Table) -> pa.Table:
            hsv = ray.get(hs_ref)
            sv = ray.get(sums_ref)
            nv = ray.get(ns_ref)
            h = np.asarray(t.column("host").to_pandas(), dtype=object)
            # every row's host came out of the same scan that built the
            # verdict table, so the probe always hits
            pos = np.searchsorted(hsv, h)
            n_docs = nv[pos]
            q_sum = sv[pos]
            low = q_sum < threshold_ppm * n_docs
            cols = {c: t.column(c) for c in keep}
            cols["host_n_docs"] = pa.array(n_docs, pa.int64())
            cols["host_q_sum"] = pa.array(q_sum, pa.int64())
            cols["host_low_quality"] = pa.array(low, pa.bool_())
            cols["kept"] = pa.array(~low, pa.bool_())
            return pa.table(cols)

        return thin.map_batches(attach, batch_format="pyarrow")

    from .dedup import join_ready
    left = join_ready(thin, n_part)
    rside = join_ready(hosts_tbl, n_part)
    out = left.join(rside, join_type="inner",
                    num_partitions=min(n_part, max(1, n_hosts)),
                    on=("host",))

    def finish(t: pa.Table) -> pa.Table:
        q_sum = t.column("host_q_sum").cast(pa.int64())
        n_docs = t.column("host_n_docs").cast(pa.int64())
        low = pc.less(q_sum, pc.multiply(
            pa.scalar(threshold_ppm, pa.int64()), n_docs))
        cols = {c: t.column(c) for c in keep}
        cols["host_n_docs"] = n_docs
        cols["host_q_sum"] = q_sum
        cols["host_low_quality"] = low
        cols["kept"] = pc.invert(low)
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def host_quality_oracle_sql(docs_cte: str, *,
                            threshold_ppm: int = 500_000,
                            id_col: str = "doc_id") -> str:
    """DuckDB twin over a (doc_id, host, text) CTE: the same integer
    alpha-density ppm, host sums, and cross-multiplied verdict."""
    return f"""
        WITH docs AS ({docs_cte}),
        dq AS (
            SELECT {id_col}, host,
                   CASE WHEN length(text) > 0
                        THEN length(regexp_replace(text, '[^A-Za-z]',
                                                   '', 'g'))
                             * 1000000 // length(text)
                        ELSE 0 END AS q_ppm
            FROM docs),
        hq AS (
            SELECT host, CAST(SUM(q_ppm) AS BIGINT) AS host_q_sum,
                   COUNT(*) AS host_n_docs
            FROM dq GROUP BY host)
        SELECT d.{id_col}, d.host, d.q_ppm,
               h.host_n_docs, h.host_q_sum,
               (h.host_q_sum < {threshold_ppm} * h.host_n_docs)
                   AS host_low_quality,
               NOT (h.host_q_sum < {threshold_ppm} * h.host_n_docs)
                   AS kept
        FROM dq d JOIN hq h USING (host)"""
