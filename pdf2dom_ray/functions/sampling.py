"""Deterministic hash sampling and stratified corpus mixing.

Training-data pipelines down-sample and re-mix corpora by source /
language / quality bucket (e.g. the C4 / Gopher / LLaMA data recipes:
"keep X% of stratum S"). Requirements at 100 TB: no global state, no
shuffle, reproducible under re-runs and partition changes — i.e. a
pure row-local decision. The standard construction: hash a stable key
to a uniform value and keep the row iff ``hash < fraction``.

Key design point here: the hash is **md5 of the key column**, and the
threshold compare happens on the first 8 hex characters as a STRING —
``substr(md5(url), 1, 8) < hex(floor(frac * 16^8))`` — which DuckDB
evaluates identically (md5 is a SQL builtin), making every sampling
decision bit-reproducible in the oracle with no integer-parsing or
endianness pitfalls. md5's uniformity makes the realized rate converge
to ``frac`` with binomial error.

Row-local => embarrassingly parallel `map_batches`; the only cost is
one md5 per row over a NARROW key column (the payload never moves).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["hash_threshold", "sample_hash", "stratified_sample",
           "sample_sql_predicate", "group_quota", "weighted_sample",
           "weighted_sample_sql", "train_val_test_split",
           "split_sql_case"]

_SPACE = 1 << 32      # first 8 hex chars


def hash_threshold(fraction: float) -> str:
    """fraction in [0,1] → lexicographic threshold over 8 hex chars.

    fraction >= 1 returns "g", which every hex string sorts below."""
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(int(f * _SPACE), "08x")


def _keep_mask(keys: list[str], threshold: str) -> np.ndarray:
    return np.array([hashlib.md5(k.encode("utf-8")).hexdigest()[:8]
                     < threshold for k in keys], dtype=bool)


def sample_hash(ds: rd.Dataset, fraction: float, *,
                key: str = "url") -> rd.Dataset:
    """Keep each row iff md5(key)[:8] < threshold(fraction)."""
    thr = hash_threshold(fraction)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            _keep_mask(t.column(key).to_pylist(), thr)))
    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: rd.Dataset, fractions: dict[str, float], *,
                      stratum: str = "lang", key: str = "url",
                      default: float = 0.0) -> rd.Dataset:
    """Per-stratum keep fractions (corpus mixing).

    ``fractions`` maps stratum value → keep fraction; strata not
    listed use ``default``. Decision stays row-local — no shuffle,
    no global pass, stable under re-partitioning.
    """
    thresholds = {s: hash_threshold(f) for s, f in fractions.items()}
    thr_default = hash_threshold(default)

    def keep(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pylist()
        strata = t.column(stratum).to_pylist()
        mask = np.array(
            [hashlib.md5(k.encode("utf-8")).hexdigest()[:8]
             < thresholds.get(s, thr_default)
             for k, s in zip(keys, strata)], dtype=bool)
        return t.filter(pa.array(mask))
    return ds.map_batches(keep, batch_format="pyarrow")


def sample_sql_predicate(fraction: float, key_sql: str = "url") -> str:
    """The DuckDB predicate that replays ``sample_hash`` exactly."""
    return f"substr(md5({key_sql}), 1, 8) < '{hash_threshold(fraction)}'"


def group_quota(ds: rd.Dataset, *, group_col: str,
                id_col: str = "doc_id", cap: int = 60,
                seed: str = "cap") -> rd.Dataset:
    """(id, group, rank): keep at most ``cap`` rows per group, chosen
    by deterministic md5 priority — the C4/CommonCrawl "per-domain
    document quota" that stops boilerplate-heavy hosts from dominating
    a training mix.

    The selection must be a *global* per-group cut (row-local hash
    thresholding can't bound a group's count), so it rides the bounded
    grouped-top-k combiner: each batch is cut to its own per-group
    top-``cap`` first, and the exchange moves <= cap × groups narrow
    (id, group, priority) rows — never payloads. rank is 1-based
    priority order within the group, usable downstream as an epoch-
    weighting signal.
    """
    from .topk import grouped_topk

    def key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = t.column(id_col).to_pylist()
        pri = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
               for d in ids]
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         group_col: t.column(group_col),
                         "pri": pa.array(pri, pa.string())})

    narrow = ds.select_columns([id_col, group_col]).map_batches(
        key, batch_format="pyarrow")
    return grouped_topk(narrow, group_col, ["pri", id_col],
                        [True, True], cap) \
        .select_columns([id_col, group_col, "rank"])


SAMPLE_SCALE_BITS = 20


def weighted_sample(ds: rd.Dataset, *, k: int = 25,
                    stratum: str = "lang", id_col: str = "doc_id",
                    text_col: str = "text",
                    seed: str = "ws") -> rd.Dataset:
    """Weighted sampling without replacement, ``k`` rows per stratum,
    inclusion odds ∝ text length (the "token-budget" pick: longer
    documents proportionally likelier, the fixed-point analogue of
    Efraimidis-Spirakis priority sampling).

    Priority = ``(md5_32(seed:id) << SCALE_BITS) // weight`` — an
    integer division, never ``u^(1/w)`` floats, so the bottom-k cut is
    bit-reproducible in SQL. Smaller priority wins; a heavier row
    divides its uniform hash by more and sinks toward the front.
    h < 2³², shift 20 → products < 2⁵², safely int64.

    Scale shape: one narrow (id, stratum, weight, priority) projection
    per batch (payload length via `pc.utf8_length` — the payload
    itself never leaves the scan task), then the bounded grouped-top-k
    combiner: exchange ≤ k × strata rows per batch.
    """
    import pyarrow.compute as pc

    from .topk import grouped_topk

    def pri(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = np.array([int(hashlib.md5(f"{seed}:{d}".encode())
                          .hexdigest()[:8], 16) for d in ids],
                     dtype=np.int64)
        w = np.maximum(
            pc.utf8_length(t.column(text_col)).to_numpy(
                zero_copy_only=False).astype(np.int64), 1)
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            stratum: t.column(stratum),
            "weight": pa.array(w),
            "priority": pa.array((h << SAMPLE_SCALE_BITS) // w),
        })

    narrow = ds.select_columns([id_col, stratum, text_col]) \
        .map_batches(pri, batch_format="pyarrow")
    return grouped_topk(narrow, stratum, ["priority", id_col],
                        [True, True], k)


def weighted_sample_sql(*, k: int = 25, stratum: str = "lang",
                        id_col: str = "doc_id", text_col: str = "text",
                        table: str = "documents",
                        seed: str = "ws") -> str:
    """DuckDB twin of ``weighted_sample`` — identical md5 priorities."""
    shift = 1 << SAMPLE_SCALE_BITS
    return f"""
        WITH w AS (
          SELECT {id_col}, {stratum},
                 GREATEST(CAST(length({text_col}) AS BIGINT), 1)
                   AS weight,
                 CAST(('0x' || substr(md5('{seed}:' ||
                      CAST({id_col} AS VARCHAR)), 1, 8)) AS BIGINT) AS h
          FROM {table}
        )
        SELECT {id_col}, {stratum}, weight,
               (h * {shift}) // weight AS priority,
               CAST(row_number() OVER (
                    PARTITION BY {stratum}
                    ORDER BY (h * {shift}) // weight, {id_col})
                 AS BIGINT) AS rank
        FROM w
        QUALIFY rank <= {k}
    """


def train_val_test_split(ds: rd.Dataset, *, key: str = "doc_id",
                         train: float = 0.8, val: float = 0.1,
                         salt: str = "split") -> rd.Dataset:
    """Append a deterministic ``split`` column (train/val/test) from
    the md5 of the salted key — the standard leakage-safe holdout
    assignment (membership is a pure function of the key, so it is
    stable across reruns, re-partitioning, and corpus growth: a doc
    can never migrate between splits when new data arrives).

    Row-local (no shuffle); thresholds are 8-hex-char string cuts so
    the SQL oracle replays the decision byte-for-byte.
    """
    t1 = hash_threshold(train)
    t2 = hash_threshold(train + val)

    def assign(t: pa.Table) -> pa.Table:
        keys = [f"{salt}:{k}" for k in t.column(key).to_pylist()]
        hexes = [hashlib.md5(k.encode("utf-8")).hexdigest()[:8]
                 for k in keys]
        split = ["train" if h < t1 else "val" if h < t2 else "test"
                 for h in hexes]
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def split_sql_case(train: float = 0.8, val: float = 0.1,
                   key_sql: str = "CAST(doc_id AS VARCHAR)",
                   salt: str = "split") -> str:
    """The DuckDB CASE that replays ``train_val_test_split`` exactly
    (same constants, same function → the two sides cannot drift)."""
    t1 = hash_threshold(train)
    t2 = hash_threshold(train + val)
    h = f"substr(md5('{salt}:' || {key_sql}), 1, 8)"
    return (f"CASE WHEN {h} < '{t1}' THEN 'train' "
            f"WHEN {h} < '{t2}' THEN 'val' ELSE 'test' END")
