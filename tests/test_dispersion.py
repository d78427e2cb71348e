"""Per-label embedding dispersion (functions/dispersion.py)."""
import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.dispersion import (
    label_dispersion, label_dispersion_oracle_sql)


def test_dispersion_matches_duckdb(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    got = label_dispersion(ds).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.execute(label_dispersion_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.dispersion > 0).all()


def test_dispersion_hand_case(ray_session):
    # label 0: vecs (0,0) and (1,1) at scale 1000 -> x in {0, 1000}
    # per dim: n=2 s=1000 q=1e6 -> n*q - s^2 = 1e6; t=2e6; disp=4e6
    # label 1: single vec -> zero dispersion
    ds = rd.from_items([
        {"label": 0, "embedding": [0.0, 0.0]},
        {"label": 0, "embedding": [1.0, 1.0]},
        {"label": 1, "embedding": [0.5, -0.5]}], override_num_blocks=4)
    got = label_dispersion(ds).to_pandas()
    assert got.values.tolist() == [[0, 2, 4_000_000], [1, 1, 0]]


def test_dispersion_partition_invariance(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    a = label_dispersion(ds.repartition(2)).to_pandas()
    b = label_dispersion(ds.repartition(9)).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_centroid_distances_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.functions.dispersion import (
        centroid_distances_oracle_sql, label_centroid_distances)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    got = label_centroid_distances(ds).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.execute(centroid_distances_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.dist_sq_micro > 0).all()


def test_centroid_distances_hand_case(ray_session):
    from pdf2dom_ray.functions.dispersion import \
        label_centroid_distances
    # centroids (0.5, 0.5) and (-0.5, 0.5): d^2 = 1.0 -> 1e6 micro
    ds = rd.from_items([
        {"label": 0, "embedding": [0.0, 0.5]},
        {"label": 0, "embedding": [1.0, 0.5]},
        {"label": 1, "embedding": [-0.5, 0.5]}], override_num_blocks=4)
    got = label_centroid_distances(ds).to_pandas()
    assert got.values.tolist() == [[0, 1, 1_000_000]]


def test_centroid_distances_partition_invariance(ray_session,
                                                 sf_dir):
    from pdf2dom_ray.functions.dispersion import \
        label_centroid_distances
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    a = label_centroid_distances(ds.repartition(2)).to_pandas()
    b = label_centroid_distances(ds.repartition(9)).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_centroid_confusion_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.functions.dispersion import (
        nearest_centroid_confusion, nearest_centroid_oracle_sql)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = nearest_centroid_confusion(ds).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.execute(nearest_centroid_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    # census covers every vector exactly once
    import pyarrow.parquet as pq
    assert got.n.sum() == pq.read_metadata(
        f"{sf_dir}/embeddings.parquet").num_rows


def test_centroid_confusion_separated_clusters(ray_session):
    from pdf2dom_ray.functions.dispersion import \
        nearest_centroid_confusion
    # two well-separated clusters classify perfectly
    rows = [{"vec_id": i, "label": 0,
             "embedding": [1.0 + 0.01 * i, 0.0]} for i in range(4)]
    rows += [{"vec_id": 10 + i, "label": 1,
              "embedding": [-1.0 - 0.01 * i, 0.0]}
             for i in range(4)]
    got = nearest_centroid_confusion(rd.from_items(rows, override_num_blocks=4)).to_pandas()
    assert got.values.tolist() == [[0, 0, 4], [1, 1, 4]]


def test_centroid_confusion_partition_invariance(ray_session,
                                                 sf_dir):
    from pdf2dom_ray.functions.dispersion import \
        nearest_centroid_confusion
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    a = nearest_centroid_confusion(ds.repartition(2)).to_pandas()
    b = nearest_centroid_confusion(ds.repartition(9)).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
