"""CSV shard writer + ingest roundtrip (synth/csvgen.py)."""
import gzip
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def test_csv_roundtrip_reproduces_documents(ray_session, sf_dir,
                                            tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["csv_ingest"](sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)])


def test_csv_writer_deterministic(sf_dir, tmp_path):
    from pdf2dom_ray.synth.csvgen import write_csv_shards
    d1 = write_csv_shards(sf_dir, str(tmp_path / "a"))
    d2 = write_csv_shards(sf_dir, str(tmp_path / "b"))
    f1 = sorted(os.listdir(d1))
    assert f1 == sorted(os.listdir(d2))
    for f in f1:
        if f.startswith("shard"):
            assert open(os.path.join(d1, f), "rb").read() == \
                open(os.path.join(d2, f), "rb").read()


def test_csv_writer_quotes_special_chars(tmp_path, ray_session):
    from pdf2dom_ray.synth.csvgen import _write_shard
    p = str(tmp_path / "x.csv.gz")
    _write_shard(p, ["doc_id", "text"],
                 [(1, 'a,b'), (2, 'say "hi"'), (3, 'line\nbreak')])
    import pyarrow.csv as pacsv
    t = pacsv.read_csv(
        p, convert_options=pacsv.ConvertOptions(
            column_types={"doc_id": pa.int64(),
                          "text": pa.string()}))
    assert t.column("text").to_pylist() == \
        ['a,b', 'say "hi"', 'line\nbreak']


def test_federated_union_reproduces_documents(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["federated_union"](sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
