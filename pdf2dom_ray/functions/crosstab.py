"""Crosstab / PIVOT: a categorical count matrix, one row per key.

The reporting shape every corpus dashboard wants — source × language,
host × status-code, day × crawl-outcome — as a WIDE table with one
int64 column per category value. Ray Data has no PIVOT operator; the
idiomatic re-expression is a fixed-column combiner: discover the
(small) category universe once, then every batch collapses to a
per-key row of per-category counts REINDEXED against that universe
(missing combinations are explicit 0s, matching DuckDB PIVOT's
count(*) fill), so the one exchange moves |keys per batch| × (C+1)
narrow rows and plain ``Sum`` aggregates finish each column — counts
stay int64 end to end.

Scale notes: C (category cardinality) must be dashboard-small (tens);
the category discovery is its own narrow distinct pass. The wide
output schema is DATA-DEPENDENT by design — exactly like SQL PIVOT —
so downstream consumers must read the schema, not assume it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["crosstab", "crosstab_oracle_sql", "melt",
           "melt_oracle_sql"]


def crosstab(ds: rd.Dataset, *, row_col: str = "source",
             cat_col: str = "lang") -> rd.Dataset:
    """One row per ``row_col`` value with one int64 count column per
    distinct ``cat_col`` value (sorted), 0-filled."""
    from .dedup import _to_arrow_blocks

    ds = ds.materialize()           # consumed twice (cats + counts)
    cats = sorted(str(c) for c in (ds.unique(cat_col) or []))
    if not cats:
        return rd.from_arrow(pa.table({row_col:
                                       pa.array([], pa.string())}))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": np.asarray(t.column(row_col).to_pandas(),
                            dtype=object),
            "c": np.asarray(t.column(cat_col).to_pandas(),
                            dtype=object).astype(str)})
        x = pd.crosstab(df["k"], df["c"]) \
            .reindex(columns=cats, fill_value=0)
        cols = {row_col: pa.array(x.index.tolist(), pa.string())}
        for c in cats:
            cols[c] = pa.array(x[c].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    return _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(row_col)
          .aggregate(*[Sum(c, alias_name=c) for c in cats]))


def crosstab_oracle_sql(rows_cte: str, *, row_col: str = "source",
                        cat_col: str = "lang") -> str:
    """DuckDB PIVOT twin — discovers the same sorted category columns
    and 0-fills missing combinations under count(*)."""
    return f"""
        PIVOT (SELECT {row_col}, {cat_col} FROM ({rows_cte}))
        ON {cat_col} USING count(*)
        GROUP BY {row_col}"""


def melt(ds: rd.Dataset, *, id_col: str,
         var_name: str = "variable",
         value_name: str = "value") -> rd.Dataset:
    """UNPIVOT: every non-``id_col`` column becomes a (variable,
    value) row — the wide→long inverse of :func:`crosstab`. Pure
    batch-local reshape (each output row derives from one input
    cell), so the operator is shuffle-free at ANY scale; column set
    is read from the schema once. int64 values assumed (the count
    matrices crosstab emits)."""
    value_cols = [c for c in ds.schema().names if c != id_col]

    def reshape(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({
                id_col: pa.array([], pa.string()),
                var_name: pa.array([], pa.string()),
                value_name: pa.array([], pa.int64())})
        n = t.num_rows
        ids = np.asarray(t.column(id_col).to_pandas(), dtype=object)
        return pa.table({
            id_col: pa.array(np.tile(ids, len(value_cols)).tolist(),
                             pa.string()),
            var_name: pa.array(
                np.repeat(np.asarray(value_cols, dtype=object), n)
                .tolist(), pa.string()),
            value_name: pa.array(np.concatenate(
                [t.column(c).to_numpy() for c in value_cols])
                .astype(np.int64), pa.int64())})

    return ds.map_batches(reshape, batch_format="pyarrow")


def melt_oracle_sql(wide_cte: str, *, id_col: str,
                    var_name: str = "variable",
                    value_name: str = "value") -> str:
    """DuckDB UNPIVOT twin (dynamic column set via COLUMNS(*)
    exclusion)."""
    return f"""
        UNPIVOT (SELECT * FROM ({wide_cte}))
        ON COLUMNS(* EXCLUDE ({id_col}))
        INTO NAME {var_name} VALUE {value_name}"""
