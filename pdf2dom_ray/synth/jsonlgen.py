"""Deterministic JSONL shard writer for the synthetic corpus.

Serializes each ``documents`` row as one compact JSON object per line
in the Dolma/C4 interchange layout: gzipped ``.jsonl.gz`` shards,
shard assignment ``doc_id % n_shards`` with doc_id-sorted order
inside a shard, ``sort_keys`` + compact separators + ``mtime=0`` gzip
headers so re-running the writer produces byte-identical files. The
rule "shards reproduce documents.parquet exactly" IS the SQL oracle
for the ``jsonl_ingest`` roundtrip query (same coupling convention as
synth/warcgen.py — bump JSONLGEN_VERSION when either side changes).
"""

from __future__ import annotations

import gzip
import json
import os

__all__ = ["JSONLGEN_VERSION", "doc_line", "write_jsonl_shards"]

JSONLGEN_VERSION = 1


def doc_line(row: dict) -> bytes:
    return json.dumps(row, sort_keys=True, ensure_ascii=False,
                      separators=(",", ":")).encode("utf-8") + b"\n"


def _write_shard(path: str, rows: list[dict]) -> None:
    buf = b"".join(doc_line(r) for r in rows)
    with open(path, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(buf)


def write_jsonl_shards(sf_dir: str, out_dir: str, *,
                       n_shards: int = 8) -> str:
    """documents.parquet → ``out_dir/shard-NNNNN.jsonl.gz``.

    Idempotent (keyed by a ``_DONE`` marker); shard writes run as Ray
    tasks when a cluster is up, else sequentially.
    """
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    cols = t.column_names
    shards: list[list[dict]] = [[] for _ in range(n_shards)]
    for row in t.to_pylist():
        shards[row["doc_id"] % n_shards].append(
            {c: row[c] for c in cols})
    for rows in shards:
        rows.sort(key=lambda r: r["doc_id"])

    jobs = [(os.path.join(out_dir, f"shard-{i:05d}.jsonl.gz"), rows)
            for i, rows in enumerate(shards) if rows]

    import ray
    if ray.is_initialized():
        task = ray.remote(num_cpus=1)(_write_shard)
        ray.get([task.remote(p, rows) for p, rows in jobs])
    else:
        for p, rows in jobs:
            _write_shard(p, rows)
    with open(done, "w") as f:
        f.write(str(JSONLGEN_VERSION))
    return out_dir
