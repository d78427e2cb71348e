"""Per-label embedding centroid dispersion (cluster tightness audit).

The embedding-quality screen run before clustering-based curation
(SemDeDup / DCLM-style): per label, the total squared deviation from
the label centroid — algebraically ``n·Σᵢ(n·qᵢ − sᵢ²)`` where
``sᵢ = Σⱼ xⱼᵢ`` and ``qᵢ = Σⱼ xⱼᵢ²`` over fixed-point int64
components ``x = floor(v·1000 + 0.5)`` (half-up — ``floor(+0.5)``
evaluates identically on the same double in numpy and DuckDB,
avoiding banker's-rounding skew). The identity makes it ONE pass: no
centroid broadcast, no second scan, and the integer moments make the
result bit-exact under any partitioning (CLAUDE.md invariant).
Magnitude check: |x| ≤ 531, n ≤ rows/label, q ≤ n·531²,
n·Σ(n·q − s²) ≤ n²·D·531² — int64-safe to ~10⁶ rows/label at D=64;
beyond that drop the scale factor a decade.

Scale shape: per-batch (label, dim) moment partials (labels×D rows,
pre-reduced) → driver fold of O(labels·D·blocks) narrow rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["label_dispersion", "label_dispersion_oracle_sql",
           "label_centroid_distances",
           "centroid_distances_oracle_sql",
           "nearest_centroid_confusion",
           "nearest_centroid_oracle_sql"]


def label_dispersion(ds: rd.Dataset, *, label_col: str = "label",
                     vec_col: str = "embedding",
                     scale: int = 1000) -> rd.Dataset:
    """(label, n_vecs, dispersion): Σ squared deviation from the
    label centroid, in fixed-point (scale²) units × n."""

    def partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column(label_col), dtype=np.int64)
        vecs = t.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = np.asarray(vecs.values, dtype=np.float64)
        offs = np.asarray(vecs.offsets, dtype=np.int64)
        lens = np.diff(offs)
        if not len(labels) or not lens.sum():
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        x = np.floor(flat * scale + 0.5).astype(np.int64)
        row = np.repeat(np.arange(len(lens)), lens)
        dim = np.arange(len(flat)) - offs[:-1][row]
        df = pd.DataFrame({"label": labels[row], "i": dim,
                           "n": np.ones(len(x), np.int64),
                           "s": x, "q": x * x})
        g = df.groupby(["label", "i"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            t.to_pandas().groupby(["label", "i"],
                                  as_index=False).sum(),
            preserve_index=False)

    from .fold import bounded_fold_tables
    parts = ds.map_batches(partial, batch_format="pyarrow")
    tables = bounded_fold_tables(parts, fold_block)
    if not tables:
        return rd.from_arrow(pa.table({
            "label": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
            "dispersion": pa.array([], pa.int64())}))
    g = pa.concat_tables(tables).to_pandas() \
        .groupby(["label", "i"], as_index=False).sum()
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    q = g["q"].to_numpy(np.int64)
    g["t"] = n * q - s * s
    out = g.groupby("label", as_index=False) \
        .agg(n_dim=("n", "max"), t=("t", "sum")) \
        .sort_values("label")
    return rd.from_arrow(pa.table({
        "label": pa.array(out["label"].to_numpy(np.int64),
                          pa.int64()),
        "n_vecs": pa.array(out["n_dim"].to_numpy(np.int64),
                           pa.int64()),
        "dispersion": pa.array(
            (out["n_dim"] * out["t"]).to_numpy(np.int64),
            pa.int64())}))


def label_dispersion_oracle_sql(table: str = "embeddings",
                                scale: int = 1000) -> str:
    return f"""
        WITH e AS (
          SELECT label, generate_subscripts(embedding, 1) AS i,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * {scale} + 0.5)
                      AS BIGINT) AS x
          FROM {table}),
        g AS (SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS s,
                     CAST(SUM(x * x) AS BIGINT) AS q
              FROM e GROUP BY 1, 2),
        d AS (SELECT label, MAX(n) AS n,
                     SUM(n * q - s * s) AS t
              FROM g GROUP BY 1)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(n AS BIGINT) AS n_vecs,
               CAST(n * t AS BIGINT) AS dispersion
        FROM d ORDER BY 1
    """


def label_centroid_distances(ds: rd.Dataset, *,
                             label_col: str = "label",
                             vec_col: str = "embedding",
                             scale: int = 1000) -> rd.Dataset:
    """(label_a, label_b, dist_sq_micro) for every label pair
    (a < b): squared Euclidean centroid distance in ORIGINAL units,
    floored to micro-units — ``⌊10⁶·Σᵢ(s_aᵢ/n_a − s_bᵢ/n_b)²/scale²⌋``
    evaluated EXACTLY as ``(10⁶·Σᵢ(s_aᵢ·n_b − s_bᵢ·n_a)²) //
    (n_a²·n_b²·scale²)`` in arbitrary-precision integers (Python
    bigints here, HUGEINT in the oracle) — the inter-cluster
    separation matrix that pairs with ``label_dispersion``'s
    within-cluster tightness for a full cluster-quality audit.

    Scale shape: the SAME per-(label, dim) integer moment partials
    as ``label_dispersion`` (labels×D narrow rows per batch, one
    driver fold); the k×k pair loop runs on k·D driver integers.
    """

    def partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column(label_col), dtype=np.int64)
        vecs = t.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = np.asarray(vecs.values, dtype=np.float64)
        offs = np.asarray(vecs.offsets, dtype=np.int64)
        lens = np.diff(offs)
        if not len(labels) or not lens.sum():
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        x = np.floor(flat * scale + 0.5).astype(np.int64)
        row = np.repeat(np.arange(len(lens)), lens)
        dim = np.arange(len(flat)) - offs[:-1][row]
        df = pd.DataFrame({"label": labels[row], "i": dim,
                           "n": np.ones(len(x), np.int64), "s": x})
        return pa.Table.from_pandas(
            df.groupby(["label", "i"], as_index=False).sum(),
            preserve_index=False)

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            t.to_pandas().groupby(["label", "i"],
                                  as_index=False).sum(),
            preserve_index=False)

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(
        ds.map_batches(partial, batch_format="pyarrow"), fold_block)
    empty = pa.table({"label_a": pa.array([], pa.int64()),
                      "label_b": pa.array([], pa.int64()),
                      "dist_sq_micro": pa.array([], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    g = pa.concat_tables(tables).to_pandas() \
        .groupby(["label", "i"], as_index=False).sum()
    labels = sorted(g["label"].unique().tolist())
    piv_s = g.pivot(index="i", columns="label", values="s") \
        .fillna(0).astype("int64")
    n_of = g.groupby("label")["n"].max().to_dict()
    la, lb, dd = [], [], []
    for ai in range(len(labels)):
        for bi in range(ai + 1, len(labels)):
            a, b = labels[ai], labels[bi]
            na, nb = int(n_of[a]), int(n_of[b])
            sa = piv_s[a].to_numpy()
            sb = piv_s[b].to_numpy()
            num = sum((int(sa[i]) * nb - int(sb[i]) * na) ** 2
                      for i in range(len(sa)))   # exact bigints
            d = (1_000_000 * num) // (na * na * nb * nb
                                      * scale * scale)
            la.append(a)
            lb.append(b)
            dd.append(d)
    return rd.from_arrow(pa.table({
        "label_a": pa.array(la, pa.int64()),
        "label_b": pa.array(lb, pa.int64()),
        "dist_sq_micro": pa.array(dd, pa.int64())}))


def centroid_distances_oracle_sql(table: str = "embeddings",
                                  scale: int = 1000) -> str:
    """HUGEINT twin — exact integer arithmetic end-to-end."""
    return f"""
        WITH e AS (
          SELECT label, generate_subscripts(embedding, 1) AS i,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * {scale} + 0.5)
                      AS BIGINT) AS x
          FROM {table}),
        g AS (SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS s
              FROM e GROUP BY 1, 2),
        p AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 -- explicit product: DuckDB ** promotes to DOUBLE
                 SUM((CAST(a.s AS HUGEINT) * b.n
                      - CAST(b.s AS HUGEINT) * a.n)
                     * (CAST(a.s AS HUGEINT) * b.n
                        - CAST(b.s AS HUGEINT) * a.n)) AS num,
                 MAX(a.n) AS na, MAX(b.n) AS nb
          FROM g a JOIN g b ON a.i = b.i AND a.label < b.label
          GROUP BY 1, 2)
        SELECT CAST(label_a AS BIGINT) AS label_a,
               CAST(label_b AS BIGINT) AS label_b,
               CAST((1000000 * num)
                    // (CAST(na AS HUGEINT) * na * nb * nb
                        * {scale} * {scale}) AS BIGINT)
                   AS dist_sq_micro
        FROM p ORDER BY 1, 2
    """


def nearest_centroid_confusion(ds: rd.Dataset, *,
                               label_col: str = "label",
                               vec_col: str = "embedding",
                               scale: int = 100,
                               cent_scale: int = 10_000
                               ) -> rd.Dataset:
    """(label, assigned, n) confusion census of the nearest-centroid
    classifier (Rocchio): every vector is assigned to the label with
    the closest QUANTIZED centroid — centroid coordinates round once
    to ``cent_scale`` fixed-point (``floor(s·cent_scale/n + 0.5)``,
    an identical double expression in numpy and DuckDB), then the
    assignment is a pure int64 ``argmin Σ(x·(cent_scale/scale) −
    c)²`` with ties to the smaller label. Quantizing the centroid
    (not the comparison) keeps every distance inside int64 with
    orders of magnitude of headroom — the earlier cross-multiplied
    exact-rational form overflowed at D=64. The diagonal census is
    the "are my labels geometrically coherent" audit run before
    centroid-based curation (SemDeDup-style).

    Scale shape: pass 1 = the shared (label, dim) moment partials
    (labels×D narrow rows, driver fold) → quantized centroid matrix
    broadcast once; pass 2 folds per-batch (label, assigned) count
    partials — two scans, nothing wider than labels² moves.
    """
    import ray as _ray

    if cent_scale % scale:
        raise ValueError("cent_scale must be a multiple of scale")
    up = cent_scale // scale

    def partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column(label_col), dtype=np.int64)
        vecs = t.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = np.asarray(vecs.values, dtype=np.float64)
        offs = np.asarray(vecs.offsets, dtype=np.int64)
        lens = np.diff(offs)
        if not len(labels) or not lens.sum():
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        x = np.floor(flat * scale + 0.5).astype(np.int64)
        row = np.repeat(np.arange(len(lens)), lens)
        dim = np.arange(len(flat)) - offs[:-1][row]
        df = pd.DataFrame({"label": labels[row], "i": dim,
                           "n": np.ones(len(x), np.int64), "s": x})
        return pa.Table.from_pandas(
            df.groupby(["label", "i"], as_index=False).sum(),
            preserve_index=False)

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: pa.Table.from_pandas(
            t.to_pandas().groupby(["label", "i"],
                                  as_index=False).sum(),
            preserve_index=False))
    empty = pa.table({"label": pa.array([], pa.int64()),
                      "assigned": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    g = pa.concat_tables(tables).to_pandas() \
        .groupby(["label", "i"], as_index=False).sum()
    labels_sorted = np.array(sorted(g["label"].unique().tolist()),
                             dtype=np.int64)
    D = int(g["i"].max()) + 1
    C = np.zeros((len(labels_sorted), D), dtype=np.int64)
    pos = {int(l): j for j, l in enumerate(labels_sorted)}
    for lab, sub in g.groupby("label"):
        n = int(sub["n"].max())
        s = np.zeros(D, dtype=np.int64)
        s[sub["i"].to_numpy(np.int64)] = sub["s"].to_numpy(np.int64)
        C[pos[int(lab)]] = np.floor(
            s * float(cent_scale) / n + 0.5).astype(np.int64)
    cent_ref = _ray.put((labels_sorted, C))

    def assign(t: pa.Table) -> pa.Table:
        labs, C_ = _ray.get(cent_ref)   # zero-copy broadcast read
        true = np.asarray(t.column(label_col), dtype=np.int64)
        vecs = t.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = np.asarray(vecs.values, dtype=np.float64)
        lens = np.diff(np.asarray(vecs.offsets, dtype=np.int64))
        if not len(true):
            return pa.table({"label": pa.array([], pa.int64()),
                             "assigned": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        X = (np.floor(flat * scale + 0.5).astype(np.int64) * up) \
            .reshape(len(lens), -1)
        # int64 distances via the expansion x² − 2xC + C²
        q = (X * X).sum(axis=1)
        dists = q[:, None] - 2 * (X @ C_.T) \
            + (C_ * C_).sum(axis=1)[None, :]
        best = np.argmin(dists, axis=1)   # ties → first = smaller c
        out = pd.DataFrame({"label": true,
                            "assigned": labs[best],
                            "n": np.ones(len(q), np.int64)}) \
            .groupby(["label", "assigned"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(assign, batch_format="pyarrow")
    tables = bounded_fold_tables(
        parts, lambda t: pa.Table.from_pandas(
            t.to_pandas().groupby(["label", "assigned"],
                                  as_index=False).sum(),
            preserve_index=False))
    if not tables:
        return rd.from_arrow(empty)
    out = pa.concat_tables(tables).to_pandas() \
        .groupby(["label", "assigned"], as_index=False).sum() \
        .sort_values(["label", "assigned"])
    return rd.from_arrow(pa.Table.from_pandas(out,
                                              preserve_index=False))


def nearest_centroid_oracle_sql(table: str = "embeddings",
                                scale: int = 100,
                                cent_scale: int = 10_000) -> str:
    """Integer twin: identical quantized centroid + int64 argmin
    (row_number over (dist, c))."""
    up = cent_scale // scale
    return f"""
        WITH e AS (
          SELECT vec_id, label,
                 generate_subscripts(embedding, 1) AS i,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * {scale} + 0.5)
                      AS BIGINT) AS x
          FROM {table}),
        cent AS (
          SELECT label AS c, i, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s
          FROM e GROUP BY 1, 2),
        cq AS (
          SELECT c, i,
                 CAST(floor(s * {float(cent_scale)} / n + 0.5)
                      AS BIGINT) AS cv
          FROM cent),
        dist AS (
          SELECT e.vec_id, MAX(e.label) AS label, cq.c,
                 SUM((e.x * {up} - cq.cv) * (e.x * {up} - cq.cv))
                     AS d
          FROM e JOIN cq ON e.i = cq.i
          GROUP BY e.vec_id, cq.c),
        pick AS (
          SELECT vec_id, label, c FROM (
            SELECT vec_id, label, c,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, c) AS rn
            FROM dist) WHERE rn = 1)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(c AS BIGINT) AS assigned,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pick GROUP BY 1, 2 ORDER BY 1, 2
    """
