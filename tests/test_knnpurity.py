"""k-NN label purity (functions/knnpurity.py): hand case on a
constructed embedding file, vectorized/loop path equality, and the
quantized-L2 DuckDB oracle on the driver table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf2dom_ray.functions.knnpurity import (knn_purity_oracle_sql,
                                             label_knn_purity)


def _write(tmp_path, vecs, labels):
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.asarray(labels, dtype=np.int32)),
    }), tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_hand_case_two_clusters(ray_session, tmp_path):
    # two tight clusters with one mislabeled member each side
    vecs = [(0.0, 0.0), (0.1, 0.0), (0.0, 0.1),     # cluster A
            (9.0, 9.0), (9.1, 9.0), (9.0, 9.1)]     # cluster B
    labels = [0, 0, 1,          # vec 2 mislabeled inside A
              1, 1, 1]
    sf = _write(tmp_path, vecs, labels)
    got = label_knn_purity(sf, k=2, anchor_mod=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # anchors 0,1: both 2-NN inside A = {other A members}, one of
    # which (vec 2) is mislabeled → 1/2 match
    assert got["n_match"].tolist() == [1, 1, 0, 2, 2, 2]
    assert got["purity_ppm"].tolist() == [500000, 500000, 0,
                                          1000000, 1000000, 1000000]


def test_matches_oracle_driver_table(ray_session, sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.execute(knn_purity_oracle_sql(k=10)).df() \
        .sort_values("vec_id").reset_index(drop=True)
    got = label_knn_purity(sf_dir, k=10).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    pd.testing.assert_frame_equal(got[cols], want[cols],
                                  check_dtype=False)
    assert len(got) > 0
