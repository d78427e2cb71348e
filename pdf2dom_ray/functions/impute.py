"""Group-median imputation (missing-value repair before training).

The feature-pipeline staple: fill missing numeric values with their
group's median. The corpus tables carry no nulls, so missingness is
DETERMINISTICALLY SIMULATED with the repo's seeded-decision
convention — ``md5('null:' ‖ event_id) < '2'`` marks ~1/16 of events
missing (DuckDB's ``md5()`` replays the mask verbatim) — and the
fill value is the LOWER-MEDIAN of the observed values per
``event_type`` (the ``robust.py`` integer-selection convention; an
interpolating median is a float and would flake the driver's
value-hash, CLAUDE.md).

Scale shape: one scan → (group, cents, observed-count) histogram
partials → ONE narrow value-histogram groupby → driver median
selection over the folded histogram (O(groups·distinct values)
rows) — the whole operator never moves a payload twice.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["impute_group_median", "impute_oracle_sql"]


def _lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
    cum = np.cumsum(cnts)
    k = (cum[-1] + 1) // 2
    return int(vals[np.searchsorted(cum, k)])


def impute_group_median(sf_dir: str, *,
                        group_col: str = "event_type"
                        ) -> rd.Dataset:
    """(event_type, n_rows, n_missing, fill_cents,
    sum_cents_imputed) per group, sorted."""
    from .dedup import _to_arrow_blocks

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", group_col, "value"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("event_id"), dtype=np.int64)
        miss = np.fromiter(
            (hashlib.md5(f"null:{i}".encode()).hexdigest() < "2"
             for i in ids.tolist()), dtype=bool, count=len(ids))
        cents = np.floor(np.asarray(t.column("value"),
                                    dtype=np.float64) * 100.0) \
            .astype(np.int64)
        g = pd.DataFrame({
            "grp": np.asarray(t.column(group_col), dtype=object),
            # missing rows keep a sentinel value bucket so the
            # histogram also carries the missing count per group
            "v": np.where(miss, np.int64(0), cents),
            "m": miss.astype(np.int64),
            "c": np.ones(len(ids), np.int64)}) \
            .groupby(["grp", "v", "m"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["grp", "v", "m"])
          .aggregate(Sum("c", alias_name="c"))).to_pandas()
    out = {"event_type": [], "n_rows": [], "n_missing": [],
           "fill_cents": [], "sum_cents_imputed": []}
    if len(hist):
        hist = hist.sort_values(["grp", "v"])
        for key, g in hist.groupby("grp", sort=True):
            obs = g[g["m"] == 0]
            n_miss = int(g.loc[g["m"] == 1, "c"].sum())
            n_rows = int(g["c"].sum())
            if len(obs):
                med = _lower_median(obs["v"].to_numpy(np.int64),
                                    obs["c"].to_numpy(np.int64))
                total = int((obs["v"] * obs["c"]).sum()) \
                    + n_miss * med
            else:
                med, total = 0, 0
            out["event_type"].append(key)
            out["n_rows"].append(n_rows)
            out["n_missing"].append(n_miss)
            out["fill_cents"].append(med)
            out["sum_cents_imputed"].append(total)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_missing": pa.array(out["n_missing"], pa.int64()),
        "fill_cents": pa.array(out["fill_cents"], pa.int64()),
        "sum_cents_imputed": pa.array(out["sum_cents_imputed"],
                                      pa.int64())}))


def impute_oracle_sql(group_col: str = "event_type") -> str:
    return f"""
        WITH m AS MATERIALIZED (
            SELECT {group_col} AS grp,
                   CAST(floor(value * 100) AS BIGINT) AS v,
                   CASE WHEN md5('null:' || CAST(event_id AS VARCHAR))
                             < '2' THEN 1 ELSE 0 END AS miss
            FROM events),
        tot AS MATERIALIZED (
            SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(SUM(miss) AS BIGINT) AS n_missing
            FROM m GROUP BY 1),
        obs AS MATERIALIZED (
            SELECT grp, v FROM m WHERE miss = 0),
        onn AS MATERIALIZED (
            SELECT grp, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS s
            FROM obs GROUP BY 1),
        med AS MATERIALIZED (
            SELECT grp, MIN(v) AS med FROM (
                SELECT obs.grp, obs.v,
                       count(*) OVER (PARTITION BY obs.grp
                                      ORDER BY obs.v) AS cum,
                       onn.n
                FROM obs JOIN onn USING (grp))
            WHERE cum >= (n + 1) // 2 GROUP BY grp)
        SELECT tot.grp AS event_type, tot.n_rows, tot.n_missing,
               CAST(med.med AS BIGINT) AS fill_cents,
               CAST(onn.s + tot.n_missing * med.med AS BIGINT)
                   AS sum_cents_imputed
        FROM tot JOIN med USING (grp) JOIN onn USING (grp)
        ORDER BY 1
    """
