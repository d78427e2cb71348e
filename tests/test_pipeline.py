"""Ray Data pipeline tests: extraction end-to-end, skew routing,
checkpoint/resume, corpus metrics. One Ray session per pytest run
(tests/conftest.py)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def parsed_small(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.extract import extract_from_documents
    return extract_from_documents(sf_dir).materialize()


def test_extract_schema_and_counts(parsed_small, sf_dir):
    from pdf2dom_ray.stages.parser_stage import OUTPUT_SCHEMA
    t = pa.Table.from_pandas(parsed_small.to_pandas())
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert parsed_small.count() == n_docs
    assert set(OUTPUT_SCHEMA.names) <= set(t.column_names)


def test_extract_roundtrip_text(parsed_small, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    expect = {f"https://docs.synth.test/{d}": t for d, t in
              zip(docs.column("doc_id").to_pylist(),
                  docs.column("text").to_pylist())}
    df = parsed_small.to_pandas()
    ok_rows = df[df.error.isna()]
    assert len(ok_rows) > 0
    for url, text in zip(ok_rows.url, ok_rows.extracted_text):
        assert text.replace("\n", " ") == expect[url]


def test_malformed_rows_isolated(parsed_small):
    df = parsed_small.to_pandas()
    errs = df[df.error.notna()]
    for url in errs.url:
        doc_id = int(url.rsplit("/", 1)[1])
        assert doc_id % 97 == 13
    assert len(errs) == sum(1 for u in df.url
                            if int(u.rsplit("/", 1)[1]) % 97 == 13)


def test_url_byte_identity_across_runs(ray_session, sf_dir):
    """Same input → byte-identical html_dom/extracted_text per url."""
    from pdf2dom_ray.pipelines.extract import extract_from_documents
    a = extract_from_documents(sf_dir).to_pandas().set_index("url")
    b = extract_from_documents(sf_dir).to_pandas().set_index("url")
    b = b.loc[a.index]
    assert (a.html_dom == b.html_dom).all()
    assert (a.extracted_text == b.extracted_text).all()


def test_skew_routing(ray_session):
    """Giant payloads route through the singleton-batch pool and parse."""
    import ray.data as rd
    from pdf2dom_ray.pipelines.extract import extract
    from pdf2dom_ray.synth.corpus import doc_to_pdf

    rows = [{"url": f"u{i}", "html": doc_to_pdf(i, "small doc text")}
            for i in range(4)]
    giant_text = " ".join(f"w{i}" for i in range(30000))  # many pages
    rows.append({"url": "giant", "html": doc_to_pdf(1000, giant_text)})
    ds = rd.from_items(rows, override_num_blocks=4)
    out = extract(ds, skew_threshold=50_000, emit_html=False).to_pandas()
    assert len(out) == 5
    g = out[out.url == "giant"].iloc[0]
    assert g.error is None
    assert g.num_pages == (30000 // 10 + 39) // 40


def test_checkpoint_resume(ray_session, sf_dir, tmp_path):
    import ray.data as rd
    from pdf2dom_ray.pipelines.extract import extract_from_documents
    from pdf2dom_ray.state.checkpoint import (completed_partitions,
                                              resume_filter, write_resumable)
    out_dir = str(tmp_path / "ckpt")
    parsed = extract_from_documents(sf_dir, emit_html=False)
    manifest = write_resumable(parsed, out_dir, num_partitions=8)
    assert len(manifest["partitions"]) == 8
    assert sum(p["rows"] for p in manifest["partitions"]) == parsed.count()
    assert sum(p["errors"] for p in manifest["partitions"]) > 0
    done = completed_partitions(out_dir)
    assert done == set(range(8))
    # resume: everything completed → nothing left to parse
    from pdf2dom_ray.pipelines.extract import synth_pages
    remaining = resume_filter(synth_pages(sf_dir), out_dir, 8)
    assert remaining.count() == 0


def test_corpus_metrics(parsed_small, sf_dir):
    from pdf2dom_ray.pipelines.metrics import corpus_metrics
    m = corpus_metrics(parsed_small).iloc[0]
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert m.docs == n_docs
    assert m.errors > 0
    assert m.spans > 0
    assert m.parse_ms > 0


def test_events_rollup_levels_consistent(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.metrics import events_rollup
    df = events_rollup(sf_dir).to_pandas()
    fine = df[(df.hour >= 0)]
    by_type = df[(df.hour == -1) & (df.event_type != "ALL")]
    total = df[(df.event_type == "ALL")]
    assert len(total) == 1
    assert total.n.iloc[0] == fine.n.sum() == by_type.n.sum()
    assert total.cents.iloc[0] == fine.cents.sum() == by_type.cents.sum()
    # per-type rollup equals the sum of its fine rows
    for r in by_type.itertuples():
        sub = fine[fine.event_type == r.event_type]
        assert r.n == sub.n.sum() and r.cents == sub.cents.sum()
