"""Similarity search over an embedding column (list<float>).

* Brute-force cosine top-k: the baseline — numpy matmul per batch
  against a broadcast query vector (``ray.put`` once, fetched in each
  actor's ``__init__``), with a per-batch local top-k combiner so the
  global sort runs over ≤ k rows per batch, not the full table.
* LSH-bucketed variant: random-hyperplane signatures bucket vectors;
  queries search only their bucket (the scale path — bucket groupby is
  the only shuffle and it's over (bucket, id) pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["brute_topk", "knn_join", "hard_negatives",
           "lsh_buckets", "lsh_topk", "ivf_topk",
           "embedding_near_dup_pairs", "embedding_near_dup_pairs_lsh",
           "embedding_near_dup_pairs_banded",
           "ivf_build_centroids", "pq_train_codebooks", "pq_topk"]


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()          # zero-copy values buffer
    dim = len(flat) // len(col)
    return flat.to_numpy(zero_copy_only=False).reshape(len(col), dim)


def _take_ordered(ds: rd.Dataset, sort_keys, k: int,
                  empty: pa.Table) -> rd.Dataset:
    """Driver merge over per-batch top-k partials (the takeOrdered
    pattern) — a full Sort operator is pure fixed cost for a k-row
    result. Input batches must already be ≤ k rows each; past 64
    blocks a distributed pre-merge round bounds the driver concat at
    O(k·√blocks) rows (functions.fold)."""
    from .fold import bounded_fold_tables

    def local_topk(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        idx = pa.compute.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx[:k])

    tables = bounded_fold_tables(ds, local_topk)
    if not tables:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(tables).combine_chunks()
    idx = pa.compute.sort_indices(merged, sort_keys=sort_keys)
    return rd.from_arrow(merged.take(idx[:k]))


_TOPK_EMPTY = pa.table({"vec_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64())})


def brute_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10, *,
               concurrency=None) -> rd.Dataset:
    """Global cosine top-k: per-batch top-k combiner (plain task fn —
    ``ray.get`` of the broadcast query is a zero-copy shared-memory
    read, no actor-pool spin-up) → driver merge over ≤ k×blocks rows."""
    query_ref = ray.put(np.asarray(query, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _TOPK_EMPTY
        q = ray.get(query_ref)
        e = _emb_matrix(batch).astype(np.float64)
        norms = np.linalg.norm(e, axis=1)
        sims = e @ q / np.maximum(norms * np.linalg.norm(q), 1e-30)
        kk = min(k, len(sims))
        idx = np.argpartition(-sims, kk - 1)[:kk]  # local combiner
        return pa.table({
            "vec_id": pa.array(np.asarray(batch.column("vec_id"))[idx],
                               pa.int64()),
            "sim": pa.array(np.round(sims[idx], 4), pa.float64()),
        })

    local = ds.map_batches(score, batch_format="pyarrow")
    return _take_ordered(local, [("sim", "descending"),
                                 ("vec_id", "ascending")], k,
                         _TOPK_EMPTY)


_KNN_EMPTY = pa.table({"qid": pa.array([], pa.int64()),
                       "vec_id": pa.array([], pa.int64()),
                       "sim": pa.array([], pa.float64())})


def knn_join(ds: rd.Dataset, queries: np.ndarray, qids, k: int = 5, *,
             round_decimals: int = 4) -> rd.Dataset:
    """(qid, vec_id, sim, rank): cosine top-k similarity JOIN — every
    query row gets its k nearest candidates (the kNN-graph /
    batch-ANN primitive behind retrieval eval sets, SemDeDup-style
    neighbor analysis, and embedding-index validation).

    Scale shape: the m×D query matrix broadcasts ONCE (``ray.put``;
    zero-copy shared-memory read per task — for query sets beyond
    broadcast size, shard the queries and union the joins). Each
    candidate batch pays one b×m matmul and a per-query local top-k
    combiner, so the exchange moves ≤ k·m narrow rows per batch, never
    embeddings; ``grouped_topk`` finishes per query. sims are rounded
    BEFORE ranking (ties then broken by vec_id) so the rank order is
    exactly the SQL oracle's."""
    from .topk import grouped_topk

    Q = np.asarray(queries, dtype=np.float64)
    qid_arr = np.asarray(qids, dtype=np.int64)
    qn = np.maximum(np.linalg.norm(Q, axis=1), 1e-30)
    qref = ray.put((Q, qn, qid_arr))

    def score(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _KNN_EMPTY
        Qm, qnorm, qi = ray.get(qref)
        e = _emb_matrix(batch).astype(np.float64)
        en = np.maximum(np.linalg.norm(e, axis=1), 1e-30)
        sims = np.round((e @ Qm.T) / np.outer(en, qnorm),
                        round_decimals)                    # b×m
        m = Qm.shape[0]
        kk = min(k, e.shape[0])
        idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # kk×m
        rows = idx.ravel(order="F")
        cols = np.repeat(np.arange(m), kk)
        vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
        return pa.table({
            "qid": pa.array(qi[cols], pa.int64()),
            "vec_id": pa.array(vid[rows], pa.int64()),
            "sim": pa.array(sims[rows, cols], pa.float64()),
        })

    partials = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(partials, "qid", ["sim", "vec_id"],
                        [False, True], k)


def hard_negatives(ds: rd.Dataset, queries: np.ndarray, qids, *,
                   hi: float = 0.9,
                   round_decimals: int = 4) -> rd.Dataset:
    """(qid, vec_id, sim): for each anchor, the single most similar
    OTHER vector whose ROUNDED cosine sim is strictly below ``hi`` —
    contrastive-training hard-negative mining (the "most confusable
    non-duplicate" per anchor; pairs at/above ``hi`` are near-dup
    territory and excluded). Same broadcast/b×m-matmul/narrow-partial
    shape as ``knn_join`` with k=1 and a band mask; rounding before
    selection + vec_id tie-break make it exactly the SQL twin.
    """
    from .topk import grouped_topk

    Q = np.asarray(queries, dtype=np.float64)
    qid_arr = np.asarray(qids, dtype=np.int64)
    qn = np.maximum(np.linalg.norm(Q, axis=1), 1e-30)
    qref = ray.put((Q, qn, qid_arr))

    def score(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _KNN_EMPTY
        Qm, qnorm, qi = ray.get(qref)
        e = _emb_matrix(batch).astype(np.float64)
        en = np.maximum(np.linalg.norm(e, axis=1), 1e-30)
        sims = np.round((e @ Qm.T) / np.outer(en, qnorm),
                        round_decimals)                    # b×m
        vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
        masked = np.where((sims < hi) & (vid[:, None] != qi[None, :]),
                          sims, -np.inf)
        out_q, out_v, out_s = [], [], []
        for c in range(Qm.shape[0]):                       # m anchors
            col = masked[:, c]
            best = col.max()
            if not np.isfinite(best):
                continue
            cand = vid[col == best]
            out_q.append(qi[c])
            out_v.append(int(cand.min()))                  # tie → low id
            out_s.append(best)
        return pa.table({
            "qid": pa.array(np.asarray(out_q, np.int64), pa.int64()),
            "vec_id": pa.array(np.asarray(out_v, np.int64),
                               pa.int64()),
            "sim": pa.array(np.asarray(out_s, np.float64),
                            pa.float64())})

    partials = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(partials, "qid", ["sim", "vec_id"],
                        [False, True], 1) \
        .select_columns(["qid", "vec_id", "sim"])


class _LshSigner:
    def __init__(self, dim: int, planes: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        bits = (e @ self.h) > 0
        buckets = (bits.astype(np.int64)
                   * (1 << np.arange(bits.shape[1], dtype=np.int64))).sum(axis=1)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def lsh_buckets(ds: rd.Dataset, dim: int, planes: int = 8,
                concurrency=None) -> rd.Dataset:
    """Append a random-hyperplane LSH bucket column. The signer is a
    driver-built INSTANCE shipped per task (a few KB of plane matrix) —
    task-based, no actor pool."""
    return ds.map_batches(_LshSigner(dim, planes),
                          batch_format="pyarrow")


@ray.remote
def _prep_block(t: pa.Table):
    """Block → compact (ids, unit-normalized matrix) numpy pair."""
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    m = _emb_matrix(t).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1)[:, None], 1e-30)
    return ids, m


@ray.remote
def _block_pair_sims(blk_a, blk_b, same: bool, threshold: float) -> pa.Table:
    """Cosine sims for one (block_a × block_b) tile; emits id_a < id_b."""
    ids_a, ma = blk_a
    ids_b, mb = blk_b
    sims = ma @ mb.T
    if same:
        # upper triangle only — the diagonal is self-similarity
        sims = np.triu(sims, k=1)
    rows, cols = np.nonzero(sims > threshold)
    a = ids_a[rows]
    b = ids_b[cols]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo < hi
    return pa.table({
        "id_a": pa.array(lo[keep], pa.int64()),
        "id_b": pa.array(hi[keep], pa.int64()),
        "sim": pa.array(np.round(sims[rows, cols][keep], 4), pa.float64()),
    })


def embedding_near_dup_pairs(ds: rd.Dataset, threshold: float = 0.85, *,
                             concurrency=None) -> rd.Dataset:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b).

    Distributed blocked cross-product: the dataset is materialized into
    object-store blocks (never onto the driver), each block is
    normalized once, and one Ray task per ordered block pair (i ≤ j)
    computes its similarity tile and emits pairs above ``threshold``.
    Peak task memory is two blocks; compute is the inherent O(N²/2) of
    an EXACT all-pairs scan, spread over B(B+1)/2 independent tasks.

    This is the raw-task escape hatch the Dataset API genuinely lacks
    (self-cross-join); everything stays in the object store and the
    returned Dataset is lazy over the tile results. For web-scale
    corpora at real near-dup thresholds (≥0.7) prefer
    ``embedding_near_dup_pairs_lsh`` — candidate generation there is
    bucket-local and avoids the quadratic tile count.
    """
    refs = ds.materialize().to_arrow_refs()
    blocks = [_prep_block.remote(r) for r in refs]
    out = []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            out.append(_block_pair_sims.remote(
                blocks[i], blocks[j], i == j, threshold))
    return rd.from_arrow_refs(out)


def embedding_near_dup_pairs_lsh(ds: rd.Dataset, threshold: float = 0.85,
                                 planes: int = 8, dim: int = 64, *,
                                 concurrency=None) -> rd.Dataset:
    """Approximate near-dup pairs: candidates limited to vectors that
    share a random-hyperplane LSH bucket (id_a < id_b, sim rounded).

    The scale path: one narrow shuffle on ``bucket`` then exact cosine
    within each bucket — candidate volume is sum(bucket²) instead of
    N². Recall follows the hyperplane collision bound (1 − θ/π)^planes;
    at near-dup thresholds the planted dup mass is angularly tight so
    buckets capture it. The bucketing (seeded plane matrix) is
    deterministic, so results are reproducible and SQL-oracle-checkable
    with the plane matrix inlined as literals.
    """
    import pandas as pd

    bucketed = lsh_buckets(ds, dim=dim, planes=planes,
                           concurrency=concurrency)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack(g["embedding"].to_numpy())
        m = m.astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1)[:, None], 1e-30)
        sims = np.triu(m @ m.T, k=1)
        rows, cols = np.nonzero(sims > threshold)
        a, b = ids[rows], ids[cols]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "sim": np.round(sims[rows, cols], 4)})

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket,
                                                 batch_format="pandas")


class _BandedSigner:
    """One pass computes ``bands`` independent hyperplane buckets per
    vector (plane matrix column-sliced per band; same seed convention
    as ``_LshSigner`` so the SQL oracle can inline the literals) and
    FLATTENS to one row per (vector, band)."""

    def __init__(self, dim: int, bands: int = 4, planes: int = 8,
                 seed: int = 11):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, bands * planes))
        self.bands, self.planes = bands, planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        bits = (e @ self.h) > 0                    # (n, bands*planes)
        weights = (1 << np.arange(self.planes, dtype=np.int64))
        n = len(e)
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        out_band, out_bucket, out_idx = [], [], []
        for b in range(self.bands):
            sl = bits[:, b * self.planes:(b + 1) * self.planes]
            out_bucket.append((sl.astype(np.int64) * weights).sum(axis=1))
            out_band.append(np.full(n, b, dtype=np.int64))
            out_idx.append(np.arange(n))
        idx = np.concatenate(out_idx)
        return pa.table({
            "vec_id": pa.array(ids[idx], pa.int64()),
            "embedding": emb.take(pa.array(idx, pa.int64())),
            "band": pa.array(np.concatenate(out_band), pa.int64()),
            "bucket": pa.array(np.concatenate(out_bucket), pa.int64()),
        })


def embedding_near_dup_pairs_banded(ds: rd.Dataset,
                                    threshold: float = 0.85, *,
                                    bands: int = 4, planes: int = 8,
                                    dim: int = 64, seed: int = 11,
                                    num_partitions: int | None = None,
                                    concurrency=None) -> rd.Dataset:
    """Near-dup pairs via BANDED hyperplane LSH: a candidate pair must
    share the full bucket in at least ONE of ``bands`` independent
    plane sets, then is verified with exact cosine (> ``threshold``).

    This is the wired near-dup default — recall is
    1 − (1 − p^planes)^bands per pair (p = 1 − θ/π), a strict
    improvement over the single-table variant at the same total
    candidate volume, and the plan is sub-quadratic end-to-end:
    candidate work is Σ_band Σ_bucket |bucket|², the only exchanges
    are a (band, bucket) hash shuffle and a narrow (id_a, id_b)
    dedup — no O(blocks²) tile fan-out anywhere. The exact blocked
    cross-product (``embedding_near_dup_pairs``) remains the
    explicit bounded-input tool.

    Determinism: the plane matrix is seeded, so results are
    reproducible and the DuckDB oracle inlines the same literals
    (`__ray_entry__._band_bucket_sql`).
    """
    import pandas as pd

    from ..stages.hashagg import hash_aggregate

    signer = _BandedSigner(dim, bands=bands, planes=planes, seed=seed)
    banded = ds.map_batches(signer, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1)[:, None], 1e-30)
        sims = np.triu(m @ m.T, k=1)
        rows, cols = np.nonzero(sims > threshold)
        a, b = ids[rows], ids[cols]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "sim": np.round(sims[rows, cols], 4)})

    per_band = banded.groupby(["band", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pandas")

    # a pair colliding in several bands appears once per band — dedup
    # on the narrow (id_a, id_b) key (sim is identical across copies)
    def first_pair(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        return df.drop_duplicates(subset=["id_a", "id_b"])

    n_part = num_partitions or _scale_partitions()
    return hash_aggregate(per_band, ["id_a", "id_b"], first_pair,
                          num_partitions=n_part)


def _scale_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


class _IvfAssign:
    """Driver-built instance shipped per task (tiny centroid matrix)."""
    def __init__(self, cents_ref):
        self.cents = ray.get(cents_ref)          # (C, D), L2-normalized
    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1)[:, None], 1e-30)
        cells = np.argmax(en @ self.cents.T, axis=1)
        return batch.append_column("cell", pa.array(cells, pa.int64()))


def ivf_build_centroids(ds: rd.Dataset, n_cells: int = 16,
                        iters: int = 5) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (the
    coarse quantizer is tiny; training data is a bounded sample)."""
    sample = ds.limit(4096).take_all()
    x = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1)[:, None], 1e-30)
    cents = x[:n_cells].copy()                    # deterministic init
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-30)
    return cents


def ivf_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
             n_cells: int = 16, nprobe: int = 2) -> rd.Dataset:
    """IVF ANN: coarse-quantize into cells, search only the query's
    ``nprobe`` nearest cells (the scale path next to ``lsh_topk``)."""
    cents = ivf_build_centroids(ds, n_cells)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probe = set(np.argsort(-(cents @ qn))[:nprobe].tolist())
    assigned = ds.map_batches(_IvfAssign(ray.put(cents)),
                              batch_format="pyarrow")
    mine = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(
            t.column("cell"), value_set=pa.array(sorted(probe), pa.int64()))),
        batch_format="pyarrow")
    return brute_topk(mine, q, k)


def lsh_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
             planes: int = 8) -> rd.Dataset:
    """ANN top-k restricted to the query's LSH bucket (scale path)."""
    q = np.asarray(query, dtype=np.float64)
    signer = _LshSigner(len(q), planes)
    qbits = (q @ signer.h) > 0
    qbucket = int((qbits.astype(np.int64)
                   * (1 << np.arange(planes, dtype=np.int64))).sum())
    bucketed = ds.map_batches(signer, batch_format="pyarrow")
    mine = bucketed.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("bucket"), qbucket)),
        batch_format="pyarrow")
    return brute_topk(mine, q, k)


def pq_train_codebooks(ds: rd.Dataset, n_sub: int = 8, n_codes: int = 16,
                       iters: int = 8) -> np.ndarray:
    """Product-quantization codebooks (Jégou/Douze/Schmid, "Product
    quantization for nearest neighbor search", TPAMI 2011): the vector
    splits into ``n_sub`` subspaces, each with its own ``n_codes``-entry
    L2 k-means codebook → (n_sub, n_codes, d_sub).

    Trained on a bounded driver-side sample (same budget as the IVF
    coarse quantizer); deterministic first-rows init, empty clusters
    keep their previous centroid."""
    sample = ds.limit(4096).take_all()
    x = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1)[:, None], 1e-30)
    n, dim = x.shape
    if dim % n_sub:
        raise ValueError(f"n_sub {n_sub} must divide dim {dim}")
    d_sub = dim // n_sub
    books = np.empty((n_sub, n_codes, d_sub), dtype=np.float64)
    for m in range(n_sub):
        xm = x[:, m * d_sub:(m + 1) * d_sub]
        c = xm[:n_codes].copy()
        for _ in range(iters):
            d2 = ((xm[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(n_codes):
                members = xm[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books[m] = c
    return books


class _PqScorer:
    """PQ asymmetric-distance scan (driver-built, shipped per task) — encode each vector to
    ``n_sub`` uint8 codes (L2-nearest codeword per subspace) and score
    it as the sum of per-subspace LUT dot products with the query; a
    per-batch top-``c`` combiner bounds the exchange."""

    def __init__(self, books_ref, query_ref, c: int):
        self.books = ray.get(books_ref)      # (n_sub, n_codes, d_sub)
        q = ray.get(query_ref)
        self.c = c
        n_sub, n_codes, d_sub = self.books.shape
        qn = q / max(np.linalg.norm(q), 1e-30)
        # LUT[m][j] = <q_m, codeword_mj>: the ADC partial similarity
        self.lut = np.einsum("md,mjd->mj",
                             qn.reshape(n_sub, d_sub), self.books)

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        e = e / np.maximum(np.linalg.norm(e, axis=1)[:, None], 1e-30)
        n_sub, n_codes, d_sub = self.books.shape
        n = len(e)
        approx = np.zeros(n, dtype=np.float64)
        sub = e.reshape(n, n_sub, d_sub)
        for m in range(n_sub):
            d2 = ((sub[:, m, None, :] - self.books[m][None, :, :]) ** 2) \
                .sum(axis=2)
            codes = np.argmin(d2, axis=1)
            approx += self.lut[m][codes]
        c = min(self.c, n)
        idx = np.argpartition(-approx, c - 1)[:c]
        return pa.table({
            "vec_id": pa.array(np.asarray(batch.column("vec_id"))[idx],
                               pa.int64()),
            "approx": pa.array(approx[idx], pa.float64()),
        })


def pq_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10, *,
            n_sub: int = 8, n_codes: int = 16, candidates: int = 50,
            concurrency=None) -> rd.Dataset:
    """PQ-ADC ANN with exact re-rank: codes-scan selects ``candidates``
    by approximate similarity, then ONE filtered re-read re-ranks them
    by exact cosine — output equals the brute-force top-k whenever the
    candidate set covers it (locked by tests; the brute SQL is the
    oracle).

    Scale shape: the scan stage ships two broadcast blobs (codebooks +
    LUT) and emits ≤ ``candidates`` rows per batch; at deployment the
    codes are a precomputed uint8 column 32× smaller than the
    embeddings, and the re-rank touches only ``candidates`` full
    vectors (predicate-pushdown read)."""
    q = np.asarray(query, dtype=np.float64)
    ds = ds.materialize()
    # materialized: the codes scan and the re-rank read are two
    # consumers of the same input — without it lineage re-executes
    books = pq_train_codebooks(ds, n_sub=n_sub, n_codes=n_codes)
    scorer = _PqScorer(ray.put(books), ray.put(q), candidates)
    # driver-built instance shipped per task (codebooks+LUT, a few KB)
    local = ds.map_batches(scorer, batch_format="pyarrow")
    short = _take_ordered(local, [("approx", "descending"),
                                  ("vec_id", "ascending")], candidates,
                          pa.table({"vec_id": pa.array([], pa.int64()),
                                    "approx": pa.array([],
                                                       pa.float64())}))
    cand = pa.array(sorted(r["vec_id"] for r in short.take_all()),
                    pa.int64())
    mine = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("vec_id"),
                                            value_set=cand)),
        batch_format="pyarrow")
    return brute_topk(mine, q, k)
