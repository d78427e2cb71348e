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
  ONE narrow hash-partition shuffle → per-bucket star edges → EXACT
  connected components (driver union-find when the edge set is small,
  distributed hash-min label propagation otherwise).
* SimHash: 64-bit signature from hashed shingle features; clustering
  bands the signature into ⌈64/b⌉ buckets so any pair within the
  Hamming radius shares ≥1 band (pigeonhole), verifies exact Hamming
  distance inside candidate buckets, then runs the same connected
  components.
* n-gram Jaccard verify: exact similarity inside LSH candidate buckets.

Scale notes: every shuffle here is over *narrow* derived rows
(key/hash/id/signature), never over document payloads; hot keys can
be salted by raising ``bands``; signatures are numpy-vectorized per
batch; each pipeline scans its input exactly once (no shared-lineage
forks).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["exact_dedup", "keep_best", "minhash_cluster", "simhash",
           "simhash_cluster", "shingles", "jaccard",
           "connected_component_labels", "incremental_dedup"]

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
    import pyarrow.compute as pc

    def local_min(batch: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(batch.column("text"), 0,
                                    key_prefix_chars)
        return pa.table({"k": k, "doc_id": batch.column("doc_id")}) \
            .group_by("k").aggregate([("doc_id", "min")]) \
            .rename_columns(["k", "doc_id"])

    from ray.data.aggregate import Min
    partial = ds.map_batches(local_min, batch_format="pyarrow")
    return partial.groupby("k").aggregate(Min("doc_id", alias_name="doc_id"))


def keep_best(ds: rd.Dataset, *, key_prefix_chars: int = 20,
              quality_col: str = "n_chars") -> rd.Dataset:
    """(k, doc_id, n_chars, n_members): canonical-document selection —
    per exact-content cluster keep the HIGHEST-quality member (max
    ``quality_col``, ties to min doc_id), the RefinedWeb/FineWeb
    "keep best, not first" dedup convention, plus the cluster size.

    Same shape as ``exact_dedup`` but the partial is an argmax + count
    instead of a min: each batch reduces to one narrow
    (k, doc_id, quality, n) candidate row per key, the exchange moves
    candidates only, and a per-group argmax finishes. n_members sums
    across partials so it counts every member, not survivors.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(batch.column("text"), 0,
                                    key_prefix_chars)
        df = pd.DataFrame({
            "k": k.to_pandas(),
            "doc_id": batch.column("doc_id").to_pandas(),
            "q": batch.column(quality_col).to_pandas(),
        })
        df["n"] = 1
        counts = df.groupby("k", sort=False)["n"].sum()
        best = df.sort_values(["k", "q", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort").drop_duplicates("k")
        best = best.assign(n=best["k"].map(counts))
        return pa.Table.from_pandas(best, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        total = int(g["n"].sum())
        g = g.sort_values(["q", "doc_id"], ascending=[False, True],
                          kind="mergesort")
        out = g.head(1).copy()
        out["n"] = total
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby("k").map_groups(final, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "k": t.column("k"),
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_chars": t.column("q").cast(pa.int64()),
            "n_members": t.column("n").cast(pa.int64())}),
        batch_format="pyarrow")


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


# ---------------------------------------------------------------------------
# connected components (shared by minhash_cluster / simhash_cluster)
# ---------------------------------------------------------------------------

def _to_arrow_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Coerce block type to Arrow (Ray's sort-aggregate emits pandas
    blocks; union/join require a uniform block type)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def join_ready(ds: rd.Dataset, n_part: int) -> rd.Dataset:
    """Prepare a narrow dataset to be a hash-join input.

    Ray's hash-shuffle join finalize fails with "No match ... for key
    field reference" when a partition is fed only schema-less empty
    blocks (sort-aggregate / chained-join artifacts; which partition
    gets them is load- and order-dependent, so it flakes). Coerce to
    Arrow, materialize, and even-repartition to at most one block per
    row so no input block is empty. Only for narrow (combined /
    key-level) tables — never payload-bearing ones.
    """
    out = _to_arrow_blocks(ds).materialize()
    return out.repartition(max(1, min(n_part, out.count())))


def _star_edges(rows: rd.Dataset, key_cols: list[str],
                num_partitions: int = 64) -> rd.Dataset:
    """(doc_id, *key_cols) bucket-membership rows → star edges
    (a=bucket-min, b=member) for every bucket with >1 member.

    ONE narrow hash-partition shuffle; per-partition edge emission is a
    vectorized pandas transform (no per-group Python). Components of
    the star-edge graph equal components of the bucket-clique graph.
    """
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols], index=False)
        return df.assign(__part=(h % num_partitions).astype("int64"))

    def edges(g: pd.DataFrame) -> pa.Table:
        root = g.groupby(key_cols)["doc_id"].transform("min")
        mask = g["doc_id"].ne(root)
        return pa.table({
            "a": pa.array(root[mask].to_numpy(dtype="int64"), pa.int64()),
            "b": pa.array(g["doc_id"][mask].to_numpy(dtype="int64"),
                          pa.int64())})

    return (rows.map_batches(tag, batch_format="pandas")
                .groupby("__part").map_groups(edges, batch_format="pandas"))


def _union_find_roots(a, b) -> dict[int, int]:
    """Driver-side exact union-find; smaller id becomes the root."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_component_labels(edges: rd.Dataset, *,
                               driver_edge_limit: int = 5_000_000,
                               max_rounds: int = 32) -> rd.Dataset:
    """Edge list (a, b) → (doc_id, cluster_id=min of component) for every
    node that appears in an edge (isolated nodes are absent — label
    them with their own id downstream).

    Small edge sets (≤ ``driver_edge_limit`` rows — narrow int pairs,
    so ~16 B/row) use exact driver union-find. Larger sets run
    distributed hash-min label propagation: per round, each node takes
    the min label among itself and its neighbors (join + groupby over
    narrow rows); the global label sum is monotone decreasing, so
    convergence is detected by an unchanged sum. Rounds needed =
    component diameter (LSH dup components are shallow stars).
    """
    edges = edges.materialize()   # counted + consumed: execute once
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    if n_edges <= driver_edge_limit:
        df = edges.to_pandas()
        roots = _union_find_roots(df["a"].to_numpy(), df["b"].to_numpy())
        items = sorted(roots.items())
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([k for k, _ in items], pa.int64()),
            "cluster_id": pa.array([v for _, v in items], pa.int64()),
        }))

    # distributed hash-min (Arrow blocks throughout — groupby/join
    # require a uniform block type)
    def sym(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "src": pa.array(pd.concat([df["a"], df["b"]], ignore_index=True),
                            pa.int64()),
            "dst": pa.array(pd.concat([df["b"], df["a"]], ignore_index=True),
                            pa.int64()),
        })

    sym_edges = edges.map_batches(sym, batch_format="pandas").materialize()

    # join hash-partition count sized to the cluster: each partition is
    # an aggregator actor — more partitions than CPUs deadlocks a small
    # cluster and oversubscribes a large one
    from ..scale import scale_partitions
    n_part = scale_partitions()

    def init_labels(df: pd.DataFrame) -> pa.Table:
        lab = df.groupby("src", as_index=False)["dst"].min()
        lab["dst"] = lab[["src", "dst"]].min(axis=1)
        return pa.table({"node": pa.array(lab["src"], pa.int64()),
                         "label": pa.array(lab["dst"], pa.int64())})

    from ray.data.aggregate import Min
    # even-repartition both join sides: a hash partition fed only
    # schema-less empty groupby blocks makes the join's finalize fail
    # with "No match for key field" (see pagerank.py / hits.py)
    sym_edges = sym_edges.repartition(
        min(n_part, max(1, 2 * n_edges))).materialize()
    labels = _to_arrow_blocks(
        sym_edges.map_batches(init_labels, batch_format="pandas")
        .groupby("node").aggregate(Min("label", alias_name="label"))
    ).materialize()
    npn = min(n_part, max(1, labels.count()))
    labels = labels.repartition(npn).materialize()
    prev_sum = None
    for _ in range(max_rounds):
        cur = labels.sum("label")
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
        prop = sym_edges.join(labels, join_type="inner",
                              num_partitions=n_part,
                              on=("src",), right_on=("node",))
        cand = _to_arrow_blocks(prop.select_columns(["dst", "label"])
                                .rename_columns({"dst": "node"}))
        labels = _to_arrow_blocks(
            cand.union(labels)
            .groupby("node").aggregate(Min("label", alias_name="label"))
        ).repartition(npn).materialize()
    return labels.rename_columns({"node": "doc_id", "label": "cluster_id"})


def _label_all_docs(ds: rd.Dataset, edges: rd.Dataset, *,
                    driver_edge_limit: int = 5_000_000,
                    concurrency=None) -> rd.Dataset:
    """(doc_id, cluster_id) for EVERY doc in ``ds``: component min for
    docs in the candidate graph, own id otherwise. The component label
    map is broadcast when small; otherwise a distributed outer merge
    via union + groupby(min) over narrow rows."""
    import ray

    edges = edges.materialize()   # counted + consumed: execute once
    n_edges = edges.count()
    if n_edges <= driver_edge_limit:
        if n_edges == 0:
            roots: dict[int, int] = {}
        else:
            df = edges.to_pandas()
            roots = _union_find_roots(df["a"].to_numpy(), df["b"].to_numpy())
        # broadcast as SORTED numpy key/value arrays: ray.get of numpy
        # is zero-copy per batch, a dict would re-deserialize every call
        rkeys = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
        rvals = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
        order = np.argsort(rkeys, kind="stable")
        keys_ref = ray.put(rkeys[order])
        vals_ref = ray.put(rvals[order])

        def label(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            vals = ray.get(vals_ref)
            docs = t.column("doc_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            out = docs.copy()
            if len(keys):
                pos = np.searchsorted(keys, docs)
                pos[pos == len(keys)] = 0
                hit = keys[pos] == docs
                out[hit] = vals[pos[hit]]
            return pa.table({
                "doc_id": pa.array(docs, pa.int64()),
                "cluster_id": pa.array(out, pa.int64()),
            })

        return ds.select_columns(["doc_id"]).map_batches(
            label, batch_format="pyarrow")

    labels = _to_arrow_blocks(connected_component_labels(
        edges, driver_edge_limit=driver_edge_limit))
    identity = ds.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "cluster_id": t.column("doc_id")}),
        batch_format="pyarrow")
    from ray.data.aggregate import Min
    return _to_arrow_blocks(
        identity.union(labels)
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id")))


def minhash_cluster(ds: rd.Dataset, *, num_perm: int = 64, bands: int = 16,
                    shingle_k: int = 3, concurrency=None,
                    driver_edge_limit: int = 5_000_000) -> rd.Dataset:
    """(doc_id, cluster_id): EXACT connected components over the LSH
    candidate graph; cluster_id = min doc_id in the component.

    Single-scan plan: signature stage → narrow (doc, band, hash) rows
    → one hash-partition shuffle → per-bucket star edges → connected
    components (driver union-find for small edge sets, distributed
    hash-min label propagation beyond ``driver_edge_limit``) → labels.
    Nothing unbounded ever lands on the driver.
    """
    # driver-built instance shipped per task (KB of permutation
    # state) — task-based, no actor-pool spin-up
    band_rows = ds.map_batches(
        _MinHashBands(num_perm=num_perm, bands=bands,
                      shingle_k=shingle_k),
        batch_format="pyarrow")
    edges = _star_edges(band_rows, ["band_id", "band_hash"])
    return _label_all_docs(ds, edges, driver_edge_limit=driver_edge_limit,
                           concurrency=concurrency)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (numpy<2 lacks
    ``bitwise_count``): per-byte table lookup, summed."""
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def _simhash_sig(text: str, shingle_k: int = 3) -> int:
    """64-bit SimHash over hashed k-word shingle features (Charikar
    random-hyperplane rounding; feature hash = crc32 shingle spread by
    a Knuth multiplier). Shingle features (vs unigrams) keep unrelated
    same-vocabulary documents far apart in Hamming space."""
    feats = np.fromiter(shingles(text, shingle_k), dtype=np.int64)
    # uint64 multiply wraps mod 2^64 (C semantics) — no explicit modulo
    hashes = feats.astype(np.uint64) * np.uint64(2654435761)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if x > 0 else "0" for x in v[::-1]), 2)


def _simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    sigs = [_simhash_sig(t) for t in texts]
    return pa.table({"doc_id": doc_ids,
                     "simhash": pa.array([s & 0x7FFFFFFFFFFFFFFF for s in sigs],
                                         pa.int64()),
                     "bucket": pa.array([s >> 48 for s in sigs], pa.int64())})


def simhash(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash, bucket): bucket = top-16-bit coarse bucket.
    (Signature inspection surface; near-dup clustering with a Hamming
    radius guarantee is ``simhash_cluster``.)"""
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")


class _SimHashBands:
    """(doc_id, text) → (doc_id, sig, band_id, band_val) rows: the
    64-bit signature split into ``bands`` contiguous bit-bands. Any
    pair with Hamming distance < bands differs in < bands bit
    positions, so at least one band is untouched (pigeonhole) and the
    pair meets in that band's bucket."""

    def __init__(self, bands: int = 13, shingle_k: int = 3):
        self.bands = bands
        self.shingle_k = shingle_k
        width = 64 // bands
        extras = 64 - width * bands
        widths = [width + (1 if i < extras else 0) for i in range(bands)]
        starts = np.cumsum([0] + widths[:-1])
        self.starts = starts
        self.masks = [(1 << w) - 1 for w in widths]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        sigs = np.array([_simhash_sig(t, self.shingle_k) for t in texts],
                        dtype=np.uint64)
        # sorted shingle-hash sets ride along for the exact-Jaccard
        # verify inside the bucket (the Hamming radius alone is a
        # PROBABILISTIC similarity proxy — at sf0.1 three background
        # pairs landed at Hamming 11 and silently merged clusters)
        shs = [np.array(sorted(shingles(t, self.shingle_k)),
                        dtype=np.int64) for t in texts]
        n = len(texts)
        out_doc = np.repeat(doc_ids, self.bands)
        out_sig = np.repeat(sigs.view(np.int64), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        out_sh = [shs[i] for i in range(n) for _ in range(self.bands)]
        vals = np.empty((n, self.bands), dtype=np.int64)
        for i, (s, m) in enumerate(zip(self.starts, self.masks)):
            vals[:, i] = ((sigs >> np.uint64(s)) & np.uint64(m)).view(np.int64)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "sig": pa.array(out_sig, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_val": pa.array(vals.reshape(-1), pa.int64()),
            "sh": pa.array(out_sh, pa.list_(pa.int64())),
        })


def _simhash_edges(band_rows: rd.Dataset, hamming_thresh: int,
                   num_partitions: int = 64) -> rd.Dataset:
    """Candidate pairs from band buckets, verified by exact Hamming
    distance (vectorized XOR+popcount), emitted as (a, b) edges."""
    key_cols = ["band_id", "band_val"]

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols], index=False)
        return df.assign(__part=(h % num_partitions).astype("int64"))

    def edges(g: pd.DataFrame) -> pa.Table:
        """Per bucket: exact local connected components of the
        verified (ham <= t) subgraph, emitted as <= m-1 star edges to
        each component's min doc id — NOT the O(m^2) verified pair
        list. Global components are identical (every qualifying pair
        shares >= 1 bucket by pigeonhole, and within that bucket the
        pair lands in one local component, which the star edges span).
        Identical signatures collapse to one representative before the
        pairwise popcount, bounding the quadratic step by DISTINCT
        sigs per bucket (a giant identical-content bucket costs O(m))."""
        out_a, out_b = [], []
        imax = np.iinfo(np.int64).max
        for _, grp in g.groupby(key_cols, sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(dtype=np.int64)
            sigs = grp["sig"].to_numpy(dtype=np.int64).view(np.uint64)
            sig_u, inv = np.unique(sigs, return_inverse=True)
            md = len(sig_u)
            iu, ju = np.triu_indices(md, k=1)
            hd = _popcount64(sig_u[iu] ^ sig_u[ju])
            keep = hd <= hamming_thresh
            pi, pj = iu[keep], ju[keep]
            if len(pi) and "sh" in g.columns:
                # exact-Jaccard verify (2·|∩| > |∪| — integer-exact)
                # on one representative per distinct sig: the Hamming
                # radius is a proxy, and rare background pairs DO
                # land inside it; identical-sig docs stay implicitly
                # merged (a 64-bit sig collision below the corpus's
                # similarity gap is negligible). Callers whose band
                # rows carry no shingle sets (perceptual dHash —
                # phash.py — where Hamming IS the semantic) skip it.
                rep_of = {}
                for r, (v, d) in enumerate(zip(inv, ids)):
                    if v not in rep_of or d < ids[rep_of[v]]:
                        rep_of[v] = r
                shl = grp["sh"].to_numpy()
                jok = np.zeros(len(pi), dtype=bool)
                for e in range(len(pi)):
                    a = np.asarray(shl[rep_of[pi[e]]], dtype=np.int64)
                    b = np.asarray(shl[rep_of[pj[e]]], dtype=np.int64)
                    inter = np.intersect1d(a, b,
                                           assume_unique=True).size
                    union = len(a) + len(b) - inter
                    jok[e] = 2 * inter > union
                pi, pj = pi[jok], pj[jok]
            # vectorized hash-min local CC over distinct sigs
            lab = np.arange(md, dtype=np.int64)
            while True:
                old = lab.copy()
                np.minimum.at(lab, pj, lab[pi])
                np.minimum.at(lab, pi, lab[pj])
                lab = np.minimum(lab, lab[lab])   # pointer jump
                if np.array_equal(lab, old):
                    break
            rep = np.full(md, imax, dtype=np.int64)   # min doc per sig
            np.minimum.at(rep, inv, ids)
            comp = np.full(md, imax, dtype=np.int64)  # min doc per comp
            np.minimum.at(comp, lab, rep)
            hub = comp[lab][inv]                      # per member
            mask = hub != ids
            if mask.any():
                out_a.append(hub[mask])
                out_b.append(ids[mask])
        if not out_a:
            out_a, out_b = [np.array([], dtype=np.int64)], \
                           [np.array([], dtype=np.int64)]
        return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                         "b": pa.array(np.concatenate(out_b), pa.int64())})

    return (band_rows.map_batches(tag, batch_format="pandas")
            .groupby("__part").map_groups(edges, batch_format="pandas"))


def simhash_cluster(ds: rd.Dataset, *, hamming_thresh: int = 12,
                    bands: int = 13, shingle_k: int = 3, concurrency=None,
                    driver_edge_limit: int = 5_000_000) -> rd.Dataset:
    """(doc_id, cluster_id): connected components over pairs with
    SimHash Hamming distance ≤ ``hamming_thresh``; cluster_id = min
    doc_id of the component.

    Guarantee: with ``bands`` ≥ hamming_thresh + 1 contiguous bit-bands
    every qualifying pair shares at least one band bucket (pigeonhole),
    so candidate generation has perfect recall; exact Hamming
    verification inside buckets removes banding false positives, and
    an exact integer Jaccard verify (2·|∩| > |∪| over the hashed
    shingle sets, one representative per distinct sig) removes the
    HAMMING false positives — the radius is only a similarity proxy,
    and at sf0.1 three sub-threshold background pairs sat at Hamming
    11 and would silently merge clusters. Same shuffle shape as
    ``minhash_cluster``: band rows (now carrying the shingle sets) →
    one hash-partition shuffle → edges → connected components.
    """
    if bands <= hamming_thresh:
        raise ValueError("need bands > hamming_thresh for the pigeonhole "
                         "recall guarantee")
    band_rows = ds.map_batches(
        _SimHashBands(bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow")
    edges = _simhash_edges(band_rows, hamming_thresh)
    return _label_all_docs(ds, edges, driver_edge_limit=driver_edge_limit,
                           concurrency=concurrency)


def incremental_dedup(new_ds: rd.Dataset, ref_ds: rd.Dataset, *,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3,
                      broadcast_limit: int = 5_000_000,
                      num_partitions: int = 64) -> rd.Dataset:
    """(doc_id, dup_of, is_new): every NEW document flagged against a
    REFERENCE corpus — the delta-dedup step of a continuously updated
    corpus (Dolma/CC re-crawls dedupe each snapshot against all prior
    ones rather than re-clustering the union). ``dup_of`` = smallest
    reference doc_id sharing a MinHash LSH band bucket with the new
    doc (−1 when none; ``is_new`` = no collision).

    Same recall contract as :func:`minhash_cluster`: a pair above the
    Jaccard threshold collides in ≥1 of the ``bands`` band buckets
    (pigeonhole), and band collisions below threshold are
    vanishingly rare — production would add an exact-verify pass on
    the candidate pairs; the driver oracle replays the semantics as
    exact cross-side Jaccard.

    Scale shape: signatures stream map-side on BOTH inputs (payload
    never shuffles); the one exchange carries narrow
    (side, doc, band, hash) rows; per bucket only (new_doc,
    min_ref) rows are emitted — NO pair expansion, so a hot template
    bucket costs its membership, not its square; a final narrow
    groupby min-merges across buckets; new docs without candidates
    fill via a broadcast id probe (sorted numpy + searchsorted) under
    ``broadcast_limit``, left join beyond."""
    import ray

    def tag_side(side: int):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side,
                                         dtype=np.int8)))
        return add

    nb = new_ds.map_batches(
        _MinHashBands(num_perm=num_perm, bands=bands,
                      shingle_k=shingle_k),
        batch_format="pyarrow").map_batches(
        tag_side(1), batch_format="pyarrow")
    rb = ref_ds.map_batches(
        _MinHashBands(num_perm=num_perm, bands=bands,
                      shingle_k=shingle_k),
        batch_format="pyarrow").map_batches(
        tag_side(0), batch_format="pyarrow")

    def part_tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["band_id", "band_hash"]],
                                       index=False)
        return df.assign(__part=(h % num_partitions).astype("int64"))

    def bucket_candidates(g: pd.DataFrame) -> pa.Table:
        """(new_doc, min ref in the same bucket) — one row per
        (bucket, new doc), never a pair expansion."""
        g = g.drop(columns="__part")
        ref_min = g[g["side"] == 0].groupby(
            ["band_id", "band_hash"])["doc_id"].min()
        news = g[g["side"] == 1]
        if not len(news) or not len(ref_min):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64())})
        joined = news.join(ref_min.rename("dup_of"),
                           on=["band_id", "band_hash"], how="inner")
        out = joined.groupby("doc_id", as_index=False)["dup_of"].min()
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "dup_of": pa.array(out["dup_of"], pa.int64())})

    cand = (nb.union(rb)
              .map_batches(part_tag, batch_format="pandas")
              .groupby("__part")
              .map_groups(bucket_candidates, batch_format="pandas")
              .materialize())
    # per-partition rows are already per-doc minima — ≤ |new docs|
    # rows per partition; under the broadcast limit the cross-
    # partition min-merge is a bounded driver fold (saves the whole
    # sort-aggregate exchange the round-2 code paid here)
    n_cand = cand.count()
    if n_cand <= broadcast_limit:
        def min_fold(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            if "doc_id" not in df.columns or not len(df):
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "dup_of": pa.array([], pa.int64())})
            g = df.groupby("doc_id", as_index=False)["dup_of"].min()
            return pa.Table.from_pandas(g, preserve_index=False)

        from .fold import bounded_fold_tables
        tables = bounded_fold_tables(cand, min_fold)
        if tables:
            bt = pa.concat_tables(
                [t.cast(pa.schema([("doc_id", pa.int64()),
                                   ("dup_of", pa.int64())]))
                 for t in tables]).to_pandas() \
                .groupby("doc_id", as_index=False)["dup_of"].min()
            keys = bt["doc_id"].to_numpy(np.int64)
            vals = bt["dup_of"].to_numpy(np.int64)
        else:
            keys = np.empty(0, np.int64)
            vals = np.empty(0, np.int64)
        order = np.argsort(keys)
        keys_ref = ray.put(keys[order])
        vals_ref = ray.put(vals[order])

        def attach(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            vs = ray.get(vals_ref)
            ids = np.asarray(t.column("doc_id"), dtype=np.int64)
            pos = np.minimum(np.searchsorted(ks, ids),
                             max(len(ks) - 1, 0))
            hit = (ks[pos] == ids) if len(ks) else \
                np.zeros(len(ids), dtype=bool)
            dup = np.where(hit, vs[pos] if len(vs) else -1,
                           -1).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "dup_of": pa.array(dup, pa.int64()),
                "is_new": pa.array(~hit),
            })

        return new_ds.select_columns(["doc_id"]).map_batches(
            attach, batch_format="pyarrow")

    from ray.data.aggregate import Min
    best = _to_arrow_blocks(
        cand.groupby("doc_id").aggregate(Min("dup_of",
                                             alias_name="dup_of")))
    n_part = max(2, num_partitions // 8)
    left = join_ready(new_ds.select_columns(["doc_id"]), n_part)
    out = left.join(join_ready(best, n_part), join_type="left_outer",
                    num_partitions=n_part, on=("doc_id",))

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup = pc.coalesce(t.column("dup_of"),
                          pa.scalar(-1, pa.int64())).cast(pa.int64())
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "dup_of": dup,
            "is_new": pc.equal(dup, pa.scalar(-1, pa.int64())),
        })

    return out.map_batches(fill, batch_format="pyarrow")
