"""Fuzzy string self-join: all pairs within edit distance ≤ k.

The record-linkage primitive web pipelines use for typo-variant host
merging, plagiarised-title linking and vocabulary normalization: find
every unordered pair of DISTINCT values of a string column with
unit-cost Levenshtein distance ≤ ``max_dist`` — without the O(N²)
all-pairs scan.

Blocking is the FastSS deletion neighborhood (Bocek et al. 2007):
every string emits its ≤``max_dist``-deletion variants (the string
itself included); an alignment witnessing ed(s,t) ≤ k yields a common
subsequence reachable from BOTH by ≤ k deletions, so every true pair
shares at least one variant — the filter is complete, unlike q-gram
count filters which break on strings shorter than q·k. Candidates are
verified with an exact banded O(k·n) Levenshtein DP.

Scale shape: distinct values via one narrow groupby; variant
generation is a row-local flat map emitting O(len^k) narrow
(variant, s) rows; ONE groupby on the variant co-locates candidates;
per-variant pair expansion is capped at ``df_cap`` strings per
variant (C(df_cap, 2) pairs max — the containment.py bound; a variant
shared by more strings than that is a degenerate token, not a typo
neighborhood, and the drop is documented behavior); ONE narrow
(a, b) groupby dedups pairs sharing several variants; the verify DP
runs per surviving candidate only. The payload column never moves —
only the distinct strings themselves, which ARE the keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count

__all__ = ["fuzzy_self_join", "banded_levenshtein",
           "fuzzy_pairs_reference", "fuzzy_join_oracle_sql"]


def banded_levenshtein(s: str, t: str, k: int) -> int:
    """Unit-cost Levenshtein distance, early-exit > ``k`` → k+1.
    Classic banded DP: only the |i−j| ≤ k diagonal strip is live."""
    if abs(len(s) - len(t)) > k:
        return k + 1
    if s == t:
        return 0
    n, m = len(s), len(t)
    big = k + 1
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        lo = max(1, i - k)
        hi = min(m, i + k)
        cur = [big] * (m + 1)
        cur[0] = i if i <= k else big
        for j in range(lo, hi + 1):
            cost = 0 if s[i - 1] == t[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost, prev[j] + 1, cur[j - 1] + 1)
        if min(cur[lo:hi + 1]) > k:
            return big
        prev = cur
    return prev[m] if prev[m] <= k else big


def _deletion_variants(s: str, k: int) -> set:
    """All strings reachable from ``s`` by ≤ k single-char deletions
    (``s`` itself included)."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def fuzzy_self_join(ds: rd.Dataset, col: str, *, max_dist: int = 1,
                    df_cap: int = 256) -> rd.Dataset:
    """(a, b, dist): every unordered pair of distinct non-empty values
    of ``col`` with Levenshtein distance in [1, ``max_dist``]."""
    k = max_dist

    # 1. distinct values — one narrow exchange on the string key
    from .dedup import _to_arrow_blocks
    distinct = _to_arrow_blocks(
        ds.select_columns([col]).groupby(col)
          .aggregate(Count(alias_name="__c")))

    # 2. deletion-variant scatter (row-local flat map)
    def variants(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.table({"v": pa.array([], pa.string()),
                             "s": pa.array([], pa.string())})
        vs, ss = [], []
        for s in t.column(col).to_pylist():
            if not s:
                continue
            for v in _deletion_variants(s, k):
                vs.append(v)
                ss.append(s)
        return pa.table({"v": pa.array(vs, pa.string()),
                         "s": pa.array(ss, pa.string())})

    scattered = distinct.map_batches(variants, batch_format="pyarrow")

    # 3. co-locate by variant, expand capped pairs per group
    def pairs(df: pd.DataFrame) -> pa.Table:
        ss = sorted(set(df["s"])) if len(df) else []
        a, b = [], []
        if 2 <= len(ss) <= df_cap:
            for i in range(len(ss) - 1):
                si = ss[i]
                for j in range(i + 1, len(ss)):
                    if abs(len(si) - len(ss[j])) <= k:
                        a.append(si)
                        b.append(ss[j])
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    cand = scattered.groupby("v").map_groups(pairs,
                                             batch_format="pandas")

    # 4. dedup pairs sharing several variants — one narrow groupby
    dedup = _to_arrow_blocks(
        cand.groupby(["a", "b"]).aggregate(Count(alias_name="__c")))

    # 5. exact banded-DP verify, row-local
    def verify(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "dist": pa.array([], pa.int64())})
        av = t.column("a").to_pylist()
        bv = t.column("b").to_pylist()
        oa, ob, od = [], [], []
        for s, tt in zip(av, bv):
            d = banded_levenshtein(s, tt, k)
            if 1 <= d <= k:
                oa.append(s)
                ob.append(tt)
                od.append(d)
        return pa.table({"a": pa.array(oa, pa.string()),
                         "b": pa.array(ob, pa.string()),
                         "dist": pa.array(od, pa.int64())})

    return dedup.map_batches(verify, batch_format="pyarrow")


def fuzzy_pairs_reference(values, k: int = 1) -> dict:
    """Single-process brute force: {(a, b) sorted: dist} over distinct
    non-empty values (for tests)."""
    vs = sorted({v for v in values if v})
    out = {}
    for i in range(len(vs) - 1):
        for j in range(i + 1, len(vs)):
            d = banded_levenshtein(vs[i], vs[j], k)
            if 1 <= d <= k:
                out[(vs[i], vs[j])] = d
    return out


def fuzzy_join_oracle_sql(values_cte: str, k: int = 1) -> str:
    """DuckDB twin: brute-force levenshtein over the distinct values
    of a one-column (``s``) CTE — feasible because the oracle runs at
    test scale only."""
    return f"""
        WITH vals AS ({values_cte}),
        d AS (SELECT DISTINCT s FROM vals WHERE s IS NOT NULL
              AND s <> '')
        SELECT a.s AS a, b.s AS b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM d a JOIN d b
          ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= {k}
        WHERE levenshtein(a.s, b.s) <= {k}"""
