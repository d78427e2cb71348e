"""Sitemap source + gap census: XML parsing (urlset / sitemapindex /
malformed), generator rules, gap hand case, both DuckDB oracles."""

import pyarrow as pa
import pytest


def test_parse_urlset_rows():
    from pdf2dom_ray.sources.sitemap import parse_sitemap
    xml = b"""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p/1</loc>
       <lastmod>2024-01-02</lastmod></url>
  <url><loc> https://b.example/p/2 </loc></url>
  <url><lastmod>2024-05-05</lastmod></url>
</urlset>"""
    rows = parse_sitemap(xml)
    assert rows == [("a.example", "https://a.example/p/1",
                     "2024-01-02"),
                    ("b.example", "https://b.example/p/2", "")]


def test_parse_no_namespace_and_index():
    from pdf2dom_ray.sources.sitemap import parse_sitemap
    assert parse_sitemap(
        b"<urlset><url><loc>https://x.y/z</loc></url></urlset>") == \
        [("x.y", "https://x.y/z", "")]
    assert parse_sitemap(
        b"<sitemapindex><sitemap><loc>https://x.y/s.xml</loc>"
        b"</sitemap></sitemapindex>") == []


def test_parse_malformed_raises():
    from pdf2dom_ray.sources.sitemap import parse_sitemap
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(b"<urlset><url></urlset>")
    with pytest.raises(ValueError, match="unexpected"):
        parse_sitemap(b"<rss></rss>")


def test_generator_rules(tmp_path):
    from pdf2dom_ray.synth.sitemapgen import (lastmod_date, page_url,
                                              sitemap_ids_for_host)
    ids = sitemap_ids_for_host(20, "docs")    # host 0: i%4==0
    # crawled listed: 0,4,8,16 (12%5==2 dropped); phantoms 20
    assert ids == [0, 4, 8, 16, 20]
    assert page_url(20) == "https://docs.synth.test/d/20"
    assert lastmod_date(0) == "2024-01-01"
    assert lastmod_date(25) == "2024-01-02"


def test_ingest_reads_written_files(ray_session, tmp_path):
    from pdf2dom_ray.sources.sitemap import read_sitemaps
    from pdf2dom_ray.synth.sitemapgen import (sitemap_ids_for_host,
                                              write_sitemap_files)
    sf = "/root/testdata/sf0.001"
    out = write_sitemap_files(sf, str(tmp_path / "sm"), chunk=7)
    got = read_sitemaps(out).to_pandas()
    import pyarrow.parquet as pq
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    want_n = sum(len(sitemap_ids_for_host(n, s))
                 for s in ("docs", "news", "blog", "cdn"))
    assert len(got) == want_n
    assert set(got.columns) == {"host", "url", "lastmod"}
    assert got["lastmod"].str.match(r"\d{4}-\d{2}-\d{2}").all()


def test_gap_hand_case(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.sitemapgap import sitemap_gap
    sm = rd.from_items([
        {"host": "h1", "url": "u1"}, {"host": "h1", "url": "u2"},
        {"host": "h2", "url": "u5"}], override_num_blocks=4)
    cr = rd.from_items([
        {"host": "h1", "url": "u1"}, {"host": "h1", "url": "u3"},
        {"host": "h1", "url": "u3"}], override_num_blocks=4)            # dup crawl row
    got = {r["host"]: (r["n_sitemap"], r["n_crawled"], r["n_both"],
                       r["n_sitemap_only"], r["n_crawl_only"])
           for r in sitemap_gap(sm, cr).take_all()}
    assert got == {"h1": (2, 2, 1, 1, 1), "h2": (1, 0, 0, 1, 0)}


def test_queries_match_oracles(ray_session):
    import importlib.util

    import duckdb
    spec = importlib.util.spec_from_file_location(
        "entry_sm", "/root/repo/__ray_entry__.py")
    E = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(E)
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    for name in ("sitemap_ingest", "sitemap_gap"):
        got = E.queries()[name](sf).to_pandas()
        want = con.execute(E.oracle_sql()[name]).df()
        a = got.sort_index(axis=1).sort_values(
            sorted(got.columns)).reset_index(drop=True)
        b = want.sort_index(axis=1).sort_values(
            sorted(want.columns)).reset_index(drop=True)
        assert a.dtypes.tolist() == b.dtypes.tolist(), name
        assert a.equals(b), name
