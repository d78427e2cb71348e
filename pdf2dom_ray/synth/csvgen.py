"""Deterministic CSV shard writer for the synthetic corpus.

The third interchange layout next to WARC and JSONL: gzipped
``.csv.gz`` shards with a header row, RFC-4180 minimal quoting,
shard assignment ``doc_id % n_shards`` with doc_id-sorted rows and
``mtime=0`` gzip headers — byte-identical across runs. The rule
"shards reproduce documents.parquet exactly" IS the SQL oracle for
the ``csv_ingest`` roundtrip query (same coupling convention as
synth/jsonlgen.py — bump CSVGEN_VERSION when either side changes).
"""

from __future__ import annotations

import csv
import gzip
import io
import os

__all__ = ["CSVGEN_VERSION", "write_csv_shards"]

CSVGEN_VERSION = 1


def _write_shard(path: str, header: list, rows: list) -> None:
    buf = io.StringIO()
    w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL,
                   lineterminator="\n")
    w.writerow(header)
    w.writerows(rows)
    with open(path, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(buf.getvalue().encode("utf-8"))


def write_csv_shards(sf_dir: str, out_dir: str, *,
                     n_shards: int = 8) -> str:
    """documents.parquet → ``out_dir/shard-NNNNN.csv.gz``
    (idempotent, keyed by a ``_DONE`` marker)."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    cols = t.column_names
    df = t.to_pandas().sort_values("doc_id")
    for s in range(n_shards):
        part = df[df["doc_id"] % n_shards == s]
        _write_shard(os.path.join(out_dir,
                                  f"shard-{s:05d}.csv.gz"),
                     cols, part.itertuples(index=False))
    with open(done, "w", encoding="utf-8") as f:
        f.write("ok\n")
    return out_dir
