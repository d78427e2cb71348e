"""Host-graph collapse + host PageRank composition."""

import pytest

# two pages per host on a/b, one on c; a→b twice (two url pairs),
# a→a self-host link, b→c once
EDGES = [
    ("https://a.test/1", "https://b.test/1"),
    ("https://a.test/2", "https://b.test/2"),
    ("https://a.test/1", "https://a.test/2"),
    ("https://b.test/1", "https://c.test/1"),
]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


def test_host_collapse_counts_occurrences(ray_session):
    from pdf2dom_ray.functions.hostgraph import host_collapse
    # a duplicate URL edge counts twice (occurrence semantics)
    got = {(r["src_host"], r["target_host"]): r["n_links"]
           for r in host_collapse(_ds(EDGES + [EDGES[0]])).take_all()}
    assert got == {("a.test", "b.test"): 3, ("a.test", "a.test"): 1,
                   ("b.test", "c.test"): 1}


def test_host_rank_equals_pagerank_on_collapsed_graph(ray_session):
    from pdf2dom_ray.functions.hostgraph import host_rank
    from pdf2dom_ray.functions.pagerank import pagerank_reference
    got = {r["host"]: r["rank"]
           for r in host_rank(_ds(EDGES), iterations=4).take_all()}
    want = pagerank_reference(
        [("a.test", "b.test"), ("a.test", "a.test"),
         ("b.test", "c.test")], iterations=4)
    assert got == want


@pytest.mark.parametrize("broadcast_limit", [5_000_000, 0])
def test_page_host_rank_both_paths(ray_session, broadcast_limit):
    from pdf2dom_ray.functions.hostgraph import (host_rank,
                                                 page_host_rank)
    ranks = {r["host"]: r["rank"]
             for r in host_rank(_ds(EDGES), iterations=4).take_all()}
    rows = page_host_rank(_ds(EDGES), iterations=4,
                          broadcast_limit=broadcast_limit).take_all()
    urls = {u for e in EDGES for u in e}
    assert {r["url"] for r in rows} == urls
    for r in rows:
        host = r["url"].split("/")[2]
        assert r["host"] == host
        assert r["host_rank"] == ranks[host], r


def test_hostgraph_oracles_match_duckdb(ray_session):
    import duckdb
    from pdf2dom_ray.functions.hostgraph import (
        host_collapse, host_collapse_oracle_sql, host_rank,
        host_rank_oracle_sql, page_host_rank,
        page_host_rank_oracle_sql)
    vals = ", ".join(f"('{u}', '{v}')" for u, v in EDGES)
    cte = f"SELECT * FROM (VALUES {vals}) AS t(src, target)"

    got = sorted((r["src_host"], r["target_host"], r["n_links"])
                 for r in host_collapse(_ds(EDGES)).take_all())
    want = sorted(map(tuple, duckdb.sql(
        host_collapse_oracle_sql(cte)).fetchall()))
    assert got == want

    got = sorted((r["host"], r["rank"]) for r in
                 host_rank(_ds(EDGES), iterations=3).take_all())
    want = sorted(map(tuple, duckdb.sql(
        host_rank_oracle_sql(cte, iterations=3)).fetchall()))
    assert got == want

    got = sorted((r["url"], r["host"], r["host_rank"]) for r in
                 page_host_rank(_ds(EDGES), iterations=3).take_all())
    want = sorted(map(tuple, duckdb.sql(
        page_host_rank_oracle_sql(cte, iterations=3)).fetchall()))
    assert got == want


@pytest.mark.parametrize("broadcast_limit", [5_000_000, 0])
def test_crawl_priority_composition(ray_session, broadcast_limit):
    import ray.data as rd
    from pdf2dom_ray.functions.hostgraph import crawl_priority, host_rank
    from pdf2dom_ray.functions.urlnorm import crawl_schedule
    frontier_urls = [u for e in EDGES for u in e] + \
        ["https://ghost.test/z"]          # host absent from the graph
    frontier = rd.from_items([{"url": u}
                              for u in sorted(set(frontier_urls))], override_num_blocks=4)
    got = {r["url"]: (r["host"], r["shard"], r["fetch_round"],
                      r["host_rank"])
           for r in crawl_priority(frontier, _ds(EDGES), iterations=4,
                                   broadcast_limit=broadcast_limit)
           .take_all()}
    sched = {r["url"]: (r["host"], r["shard"], r["fetch_round"])
             for r in crawl_schedule(frontier).take_all()}
    ranks = {r["host"]: r["rank"]
             for r in host_rank(_ds(EDGES), iterations=4).take_all()}
    assert set(got) == set(sched)
    for u, (h, s, fr, hr) in got.items():
        assert (h, s, fr) == sched[u]
        assert hr == ranks.get(h, 0)
    assert got["https://ghost.test/z"][3] == 0
