"""Count-min sketch: mergeable approximate frequency table.

The frequency-sketch counterpart of `functions/hll.py` (distinct) and
`functions/heavyhitters.py` (Misra-Gries top-k): a d×w int64 matrix
where cell (j, b) sums the counts of every token hashing to bucket b
under hash j (Cormode & Muthukrishnan 2005). Point estimate =
``min_j cell[j, bucket_j(token)]`` — always an over-estimate (never
under), error bounded by collisions mass per row.

Distributed shape: per-batch partial sketches (exact vectorized
``np.add.at`` over flattened tokens), driver sum-fold of one
d×w-int64 blob per block. Addition is associative/commutative, so the
sketch — and every estimate — is invariant to partitioning.

Determinism: bucket_j(t) = ``int(md5(f"{t}#{j}")[:8], 16) % w``, so a
DuckDB oracle can replay every collision exactly: the estimate for a
probe token equals the min over j of the summed true counts of all
tokens sharing its bucket — an exact SQL twin of the sketch output,
collisions included.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = ["cms_build", "cms_estimate", "cms_token_counts",
           "cms_token_counts_sql"]


def _buckets(tokens, j: int, w: int) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(f"{t}#{j}".encode("utf-8")).hexdigest()[:8],
             16) % w for t in tokens),
        dtype=np.int64, count=len(tokens))


def _sketch_tokens(tokens: list[str], counts: np.ndarray, d: int,
                   w: int) -> np.ndarray:
    """(token, count) pairs → d×w partial sketch."""
    cms = np.zeros((d, w), dtype=np.int64)
    for j in range(d):
        np.add.at(cms[j], _buckets(tokens, j, w), counts)
    return cms


def cms_build(ds: rd.Dataset, *, text_col: str = "text", d: int = 4,
              w: int = 1024) -> np.ndarray:
    """Distributed build over whitespace tokens of ``text_col``."""

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(col, " ")).to_pandas()
        vc = flat.value_counts()
        cms = _sketch_tokens(list(vc.index),
                             vc.to_numpy(np.int64), d, w)
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = np.zeros((d, w), dtype=np.int64)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_columns == 0:
            continue
        for blob in t.column("cms").to_pylist():
            merged += np.frombuffer(blob, dtype=np.int64).reshape(d, w)
    return merged


def cms_estimate(cms: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point estimates (int64) for a token list."""
    d, w = cms.shape
    if not tokens:
        return np.zeros(0, dtype=np.int64)
    ests = np.stack([cms[j, _buckets(tokens, j, w)] for j in range(d)])
    return ests.min(axis=0)


def cms_token_counts(sf_dir: str, *, d: int = 4, w: int = 1024,
                     probe_docs: int = 10) -> pa.Table:
    """(token, est): sketch estimates for every distinct token of the
    first ``probe_docs`` documents (a deterministic, SQL-expressible
    probe set), from a CMS built over the WHOLE documents table."""
    import pyarrow.dataset as pads

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    cms = cms_build(docs, d=d, w=w)
    # probe list: tiny by construction (few docs, predicate pushed
    # into the fresh scan — no shared-lineage re-execution)
    head = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"],
                           filter=pads.field("doc_id") < probe_docs)
    toks: set[str] = set()
    for row in head.take_all():
        toks.update(row["text"].split(" "))
    tokens = sorted(toks)
    return pa.table({
        "token": pa.array(tokens, pa.string()),
        "est": pa.array(cms_estimate(cms, tokens), pa.int64()),
    })


def cms_token_counts_sql(*, d: int = 4, w: int = 1024,
                         probe_docs: int = 10) -> str:
    """DuckDB twin replaying the md5 bucket collisions exactly."""
    js = ", ".join(str(j) for j in range(d))
    bucket = ("CAST(CAST(('0x' || substr(md5(w || '#' || "
              f"CAST(j AS VARCHAR)), 1, 8)) AS UBIGINT) % {w} "
              "AS BIGINT)")
    return f"""
        WITH js AS (SELECT unnest([{js}]) AS j),
        toks AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
        tot AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                FROM toks GROUP BY 1),
        buck AS (SELECT j, {bucket} AS b, c
                 FROM tot CROSS JOIN js),
        cells AS (SELECT j, b, CAST(sum(c) AS BIGINT) AS cell
                  FROM buck GROUP BY 1, 2),
        probes AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                   FROM documents WHERE doc_id < {probe_docs}),
        pb AS (SELECT w, j, {bucket} AS b
               FROM probes CROSS JOIN js),
        est_j AS (SELECT pb.w, pb.j, cells.cell
                  FROM pb JOIN cells USING (j, b))
        SELECT w AS token, CAST(min(cell) AS BIGINT) AS est
        FROM est_j GROUP BY 1
    """
