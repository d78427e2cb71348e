"""CUBE grouping-sets counts (the OLAP operator Ray Data lacks).

Every corpus dashboard eventually wants the same table at every
roll-up level at once — (source, lang), (source, ·), (·, lang),
(·, ·) — which is SQL's GROUP BY CUBE. Ray Data has no grouping-sets
operator; the idiomatic re-expression is a combiner that emits ALL
2^k grouping rows per batch (each input row contributes one count to
each of its 2^k ancestors) with the rolled-up dimensions replaced by
the ``'<all>'`` sentinel — NULL-free on purpose, because the driver's
value-hash comparison would have to agree on NULL encodings — and
ONE narrow groupby summing the counts. Exchange volume is
2^k × |distinct combos per batch| — k is dashboard-small (2..4), and
the combiner keeps the exchange narrow regardless of row count."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["cube_counts", "cube_oracle_sql"]

ALL = "<all>"


def cube_counts(ds: rd.Dataset, dims: list[str]) -> rd.Dataset:
    """(dim1, ..., dimk, n) for every CUBE grouping set; rolled-up
    dimensions carry the ``'<all>'`` sentinel."""
    from .dedup import _to_arrow_blocks

    subsets = [frozenset(s) for r in range(len(dims) + 1)
               for s in combinations(dims, r)]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            d: np.asarray(t.column(d).to_pandas(), dtype=object)
            for d in dims})
        outs = []
        for keep in subsets:
            g = df.copy()
            for d in dims:
                if d not in keep:
                    g[d] = ALL
            outs.append(g.groupby(dims, as_index=False).size()
                        .rename(columns={"size": "n"}))
        cat = pd.concat(outs, ignore_index=True)
        cols = {d: pa.array(cat[d].tolist(), pa.string())
                for d in dims}
        cols["n"] = pa.array(cat["n"].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    return _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(dims).aggregate(Sum("n", alias_name="n")))


def cube_oracle_sql(rows_cte: str, dims: list[str]) -> str:
    """GROUP BY CUBE twin with the same NULL→sentinel encoding."""
    sel = ", ".join(f"COALESCE({d}, '{ALL}') AS {d}" for d in dims)
    return f"""
        SELECT {sel}, CAST(count(*) AS BIGINT) AS n
        FROM ({rows_cte})
        GROUP BY CUBE ({", ".join(dims)})"""
