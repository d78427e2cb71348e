"""Deduplication operators for training-data pipelines.

Algorithms follow the published formulations: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
SEQUENCES 1997) with banded LSH (Leskovec/Rajaraman/Ullman, Mining of
Massive Datasets ch.3), and SimHash random-hyperplane signatures
(Charikar, "Similarity estimation techniques from rounding
algorithms", STOC 2002).

* exact: partial (per-batch) min-doc_id per key, then a small global
  ``groupby(key)`` over the pre-aggregated rows — the combiner pattern
  keeps the shuffle tiny (keys × batches, not rows).
* MinHash+LSH: shingle → minhash signature → banded bucket rows →
  ``groupby(band_id, band_hash)`` → candidate clusters; one round of
  min-label propagation assigns cluster ids (documented approximation
  of connected components; additional rounds converge transitively).
* SimHash: 64-bit signature from token hashes; near-dups share the
  high-k-bit bucket.
* n-gram Jaccard verify: exact similarity inside LSH candidate buckets.

Scale notes: every shuffle here is over *narrow* derived rows
(key/hash/id), never over document payloads; hot keys can be salted by
raising ``bands``; signatures are numpy-vectorized per batch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["exact_dedup", "minhash_cluster", "simhash", "shingles",
           "jaccard"]

_MERSENNE = (1 << 61) - 1


def shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-word shingles."""
    words = text.split(" ")
    if len(words) < k:
        return {zlib.crc32(text.encode())}
    return {zlib.crc32(" ".join(words[i:i + k]).encode())
            for i in range(len(words) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, key_prefix_chars: int = 20) -> rd.Dataset:
    """Keep min(doc_id) per exact content key (prefix of text).

    Combiner-style: per-batch local min first, tiny global groupby after.
    """
    def local_min(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": [t[:key_prefix_chars] for t in batch.column("text").to_pylist()],
            "doc_id": batch.column("doc_id").to_pylist(),
        })
        out = df.groupby("k", as_index=False)["doc_id"].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Min
    partial = ds.map_batches(local_min, batch_format="pyarrow")
    return partial.groupby("k").aggregate(Min("doc_id", alias_name="doc_id"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-state minhash signatures (hash coefficients built once)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = np.fromiter(shingles(text, self.shingle_k), dtype=np.int64)
        # (a*x + b) mod p for all perms × shingles, then min per perm
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


class _MinHashBands:
    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        self.hasher = MinHasher(num_perm, shingle_k)
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        r = self.rows_per_band
        for did, text in zip(doc_ids, texts):
            sig = self.hasher.signature(text)
            for b in range(self.bands):
                h = zlib.crc32(sig[b * r:(b + 1) * r].tobytes())
                out_doc.append(did)
                out_band.append(b)
                out_hash.append(h)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        })


def minhash_cluster(ds: rd.Dataset, *, num_perm: int = 64, bands: int = 16,
                    shingle_k: int = 3, concurrency=None) -> rd.Dataset:
    """(doc_id, cluster_id): EXACT connected components over the LSH
    candidate graph; cluster_id = min doc_id in the component.

    Shuffle plan: one hash-partitioned aggregate over narrow (band,
    hash) rows finds buckets with >1 member; those collision buckets
    are ≈ the duplicate rate of the corpus, so their member edges fit
    on the driver, where union-find computes the transitive closure
    (the "union-find on the driver only when the candidate set is
    provably small" pattern). The root map is then broadcast and every
    doc labeled in a vectorized pass — no per-group Python, no large
    join, no iteration.
    """
    import ray

    band_rows = ds.map_batches(
        _MinHashBands,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k},
        batch_format="pyarrow", concurrency=concurrency or default_pool())

    # high-cardinality (band, hash) keys: the hash-partitioned aggregate
    # (stages/hashagg.py) avoids Ray's slow sort-based Aggregate here
    from ..stages.hashagg import hash_aggregate

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if "n" not in df.columns:
            return (df.groupby(["band_id", "band_hash"], as_index=False)
                      .agg(n=("doc_id", "size"), bucket_min=("doc_id", "min")))
        return (df.groupby(["band_id", "band_hash"], as_index=False)
                  .agg(n=("n", "sum"), bucket_min=("bucket_min", "min")))

    stats = hash_aggregate(band_rows, ["band_id", "band_hash"], combine)
    dup_buckets = stats.map_batches(
        lambda df: df[df.n > 1], batch_format="pandas").to_pandas()
    dup_keys = set(zip(dup_buckets.band_id, dup_buckets.band_hash))
    keys_ref = ray.put(dup_keys)

    # collect (bucket, member) edges for collision buckets only (small)
    class Edges:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            docs = t.column("doc_id").to_pylist()
            bb = t.column("band_id").to_pylist()
            hh = t.column("band_hash").to_pylist()
            ks = self.keys
            rows = [(d, b, h) for d, b, h in zip(docs, bb, hh)
                    if (b, h) in ks]
            return pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "band_id": pa.array([r[1] for r in rows], pa.int32()),
                "band_hash": pa.array([r[2] for r in rows], pa.int64()),
            })

    edges = band_rows.map_batches(
        Edges, batch_format="pyarrow",
        concurrency=concurrency or default_pool()).to_pandas()

    # union-find over collision-bucket membership → exact components
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    first_member: dict[tuple, int] = {}
    for d, b, h in zip(edges.doc_id, edges.band_id, edges.band_hash):
        k = (b, h)
        if k in first_member:
            union(first_member[k], int(d))
        else:
            first_member[k] = int(d)
    roots = {d: find(int(d)) for d in edges.doc_id.unique()}
    roots_ref = ray.put(roots)

    class Label:
        def __init__(self):
            self.roots = ray.get(roots_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            docs = t.column("doc_id").to_pylist()
            rt = self.roots
            return pa.table({
                "doc_id": pa.array(docs, pa.int64()),
                "cluster_id": pa.array([rt.get(d, d) for d in docs],
                                       pa.int64()),
            })

    return ds.select_columns(["doc_id"]).map_batches(
        Label, batch_format="pyarrow",
        concurrency=concurrency or default_pool())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    sigs, buckets = [], []
    for t in texts:
        toks = t.split(" ")
        if toks:
            hashes = np.fromiter((zlib.crc32(w.encode()) * 2654435761 % (1 << 64)
                                  for w in toks), dtype=np.uint64)
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sig = int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)
        else:
            sig = 0
        sigs.append(sig & 0x7FFFFFFFFFFFFFFF)
        buckets.append(sig >> 48)
    return pa.table({"doc_id": doc_ids,
                     "simhash": pa.array(sigs, pa.int64()),
                     "bucket": pa.array(buckets, pa.int64())})


def simhash(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash, bucket): bucket = top-16-bit near-dup bucket."""
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")
