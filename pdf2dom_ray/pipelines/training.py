"""Training-data last mile: the composed curation pipeline.

quality filter → exact-dedup keeper selection → stratified language
mixing → GPT-style sequence packing, as ONE streaming chain — the
pipeline a pretraining data team actually ships, assembled from the
same operators the standalone driver queries check individually
(functions/text_stats.py, dedup.py, sampling.py, chunking.py), so the
composite has a closed-form SQL twin and hash-matches end to end.

Scale shape per stage:
- quality filter: row-local Arrow kernels, zero shuffle;
- dedup keeper: narrow (key → min doc_id) combiner + small groupby;
  the keeper-id SET broadcasts once via ``ray.put`` under
  ``broadcast_limit`` (int64 ids — ~8 B/doc; a 10⁹-doc mix fits a
  worker heap) and the survivor filter is a vectorized ``np.isin``
  probe; beyond the limit the probe becomes one hash-partitioned
  inner join over (doc_id) — the standard two-phase physical dedup;
- language mixing: row-local md5-threshold decisions (sampling.py),
  zero shuffle, reproducible under any partitioning;
- packing: distributed prefix sum over per-block token totals
  (chunking.py::pack_sequences — O(blocks) driver scalars only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["training_mix"]


def training_mix(sf_dir: str, *, fracs: dict[str, float],
                 default_frac: float, url_prefix: str,
                 seq_len: int = 128,
                 key_prefix_chars: int = 20,
                 broadcast_limit: int = 50_000_000) -> rd.Dataset:
    """(doc_id, seq_id, tok_start, n_toks) for the curated mix."""
    import pyarrow.compute as pc

    from ..functions.chunking import pack_sequences
    from ..functions.dedup import exact_dedup, join_ready
    from ..functions.sampling import hash_threshold
    from ..functions.text_stats import gopher_quality_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    # 1. Gopher quality gate — row-local, text retained
    def quality_gate(t: pa.Table) -> pa.Table:
        g = gopher_quality_batch(t)       # row-aligned with the input
        return t.filter(g.column("passes"))

    passing = docs.map_batches(quality_gate, batch_format="pyarrow")

    # 2. exact-dedup keeper selection over the PASSING set
    keepers = exact_dedup(passing, key_prefix_chars=key_prefix_chars) \
        .materialize()                    # consumed for count + probe
    n_keep = keepers.count()

    if n_keep <= broadcast_limit:
        ids = np.sort(keepers.to_pandas()["doc_id"]
                      .to_numpy(dtype=np.int64))
        ids_ref = ray.put(ids)

        def keep_keepers(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t
            keep_ids = ray.get(ids_ref)   # zero-copy numpy broadcast
            col = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keep_ids, col)
            pos = np.minimum(pos, len(keep_ids) - 1)
            return t.filter(pa.array(keep_ids[pos] == col))

        surv = passing.map_batches(keep_keepers, batch_format="pyarrow")
    else:
        from ..scale import scale_partitions
        n_part = scale_partitions()
        thin = join_ready(
            keepers.select_columns(["doc_id"])
            .rename_columns({"doc_id": "keep_id"}), n_part)
        surv = passing.join(thin, join_type="inner",
                            num_partitions=n_part,
                            on=("doc_id",), right_on=("keep_id",))
        surv = surv.map_batches(
            lambda t: t.select(["doc_id", "text", "lang"]),
            batch_format="pyarrow")

    # 3. stratified language mixing — the corpus_sample decision rule
    thresholds = {lang: hash_threshold(f) for lang, f in fracs.items()}
    thr_default = hash_threshold(default_frac)

    def mix(t: pa.Table) -> pa.Table:
        import hashlib
        if not t.num_rows:
            return t.select(["doc_id", "text"])
        ids = t.column("doc_id").to_pylist()
        langs = t.column("lang").to_pylist()
        keep = [hashlib.md5(f"{url_prefix}{d}".encode())
                .hexdigest()[:8] < thresholds.get(lg, thr_default)
                for d, lg in zip(ids, langs)]
        return t.filter(pa.array(keep)).select(["doc_id", "text"])

    mixed = surv.map_batches(mix, batch_format="pyarrow")

    # 4. GPT-style packing over the survivors in doc_id order
    return pack_sequences(mixed, seq_len=seq_len)
