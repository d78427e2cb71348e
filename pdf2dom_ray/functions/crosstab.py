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

__all__ = ["crosstab", "crosstab_oracle_sql"]


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
