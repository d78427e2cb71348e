"""URL canonicalization / host stats / politeness schedule / keep-best."""

import pyarrow as pa
import pytest

from pdf2dom_ray.functions.urlnorm import (canonicalize, host_of,
                                           shard_of_host,
                                           synth_canonical_url,
                                           synth_messy_url)


CASES = [
    # RFC 3986 §6.2.2 case + §6.2.3 default-port normalization
    ("HTTP://Example.COM:80/a", "http://example.com/a"),
    ("https://Example.com:443/", "https://example.com/"),
    ("http://ex.com:8080/p", "http://ex.com:8080/p"),     # non-default kept
    # fragment dropped, empty path → '/'
    ("https://ex.com#top", "https://ex.com/"),
    ("https://ex.com/a#b", "https://ex.com/a"),
    # dot segments (§5.2.4) + duplicate slashes
    ("https://ex.com/a/b/../../c/./d//e", "https://ex.com/c/d/e"),
    ("https://ex.com/../..", "https://ex.com/"),
    ("https://ex.com/x/..", "https://ex.com/"),
    ("https://ex.com/..name/../a", "https://ex.com/a"),   # '..name' is a segment
    # tracking params stripped, remainder sorted, bare '?' dropped
    ("https://ex.com/p?utm_source=x&z=1&a=2", "https://ex.com/p?a=2&z=1"),
    ("https://ex.com/p?utm_source=x", "https://ex.com/p"),
    ("https://ex.com/p?fbclid=abc&gclid=1", "https://ex.com/p"),
    ("https://ex.com/p?", "https://ex.com/p"),
    # unparseable rows pass through
    ("not a url", "not a url"),
    ("/relative/only", "/relative/only"),
]


def test_canonicalize_cases():
    got = canonicalize(pa.array([c[0] for c in CASES], pa.string()))
    assert got.to_pylist() == [c[1] for c in CASES]


def test_canonicalize_idempotent():
    once = canonicalize(pa.array([c[0] for c in CASES], pa.string()))
    twice = canonicalize(once)
    assert twice.to_pylist() == once.to_pylist()


def test_synth_rule_roundtrip():
    ids = list(range(200))
    got = canonicalize(pa.array([synth_messy_url(i) for i in ids],
                                pa.string())).to_pylist()
    assert got == [synth_canonical_url(i) for i in ids]


def test_host_of():
    got = host_of(pa.array(["https://A.B.c/x", "nope"], pa.string()))
    assert got.to_pylist() == ["a.b.c", None]


def test_crawl_schedule_politeness(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.urlnorm import crawl_schedule
    urls = [f"https://h{i % 3}.test/p{i}" for i in range(60)]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    rows = crawl_schedule(ds, n_shards=4).take_all()
    assert len(rows) == 60
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
        assert r["shard"] == shard_of_host(r["host"], 4)
    for host, rs in by_host.items():
        # one fetch per round: rounds are exactly 0..n-1 within a host
        assert sorted(r["fetch_round"] for r in rs) == list(range(len(rs)))
    # deterministic under a different partitioning
    rows2 = crawl_schedule(ds.repartition(7), n_shards=4).take_all()
    key = lambda r: (r["url"], r["host"], r["shard"], r["fetch_round"])
    assert sorted(map(key, rows)) == sorted(map(key, rows2))


def test_keep_best_matches_reference(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.dedup import keep_best
    rows = [
        {"doc_id": 1, "text": "alpha " * 5, "n_chars": 30},
        {"doc_id": 2, "text": "alpha " * 5 + "x", "n_chars": 31},
        {"doc_id": 3, "text": "alpha " * 5 + "yy", "n_chars": 31},
        {"doc_id": 4, "text": "beta", "n_chars": 4},
    ]
    got = {r["k"]: (r["doc_id"], r["n_chars"], r["n_members"])
           for r in keep_best(rd.from_items(rows, override_num_blocks=4)).take_all()}
    # cluster 'alpha...' keeps max n_chars then min doc_id (doc 2 of 2,3)
    assert got[("alpha " * 5)[:20]] == (2, 31, 3)
    assert got["beta"] == (4, 4, 1)


def test_mirror_hosts_hand_case(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.urlnorm import mirror_hosts
    rows = [
        {"k": "k1", "host": "a"}, {"k": "k1", "host": "b"},
        {"k": "k2", "host": "a"}, {"k": "k2", "host": "b"},
        {"k": "k2", "host": "b"},              # dup (k, host) row
        {"k": "k3", "host": "a"}, {"k": "k3", "host": "c"},
        {"k": "k4", "host": "c"},              # lone host: no pair
    ]
    got = {(r["host_a"], r["host_b"]): r["shared"]
           for r in mirror_hosts(rd.from_items(rows, override_num_blocks=4)).take_all()}
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_mirror_hosts_cap_drops_template_keys(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.urlnorm import mirror_hosts
    rows = [{"k": "tpl", "host": f"h{i}"} for i in range(5)] + \
           [{"k": "real", "host": "h0"}, {"k": "real", "host": "h1"}]
    got = {(r["host_a"], r["host_b"]): r["shared"]
           for r in mirror_hosts(rd.from_items(rows, override_num_blocks=4),
                                 max_hosts_per_key=4).take_all()}
    assert got == {("h0", "h1"): 1}            # 'tpl' on 5 hosts: capped


def test_training_mix_paths_identical(ray_session, sf_dir):
    """The composed curation pipeline: broadcast keeper probe and the
    hash-join fallback land on identical packed spans."""
    from pdf2dom_ray.pipelines.training import training_mix
    kw = dict(fracs={"en": 0.5, "zh": 0.125, "es": 0.25, "de": 0.25},
              default_frac=0.75,
              url_prefix="https://docs.synth.test/")
    a = sorted(map(tuple, training_mix(sf_dir, **kw).to_pandas()
                   .itertuples(index=False)))
    b = sorted(map(tuple, training_mix(sf_dir, broadcast_limit=0, **kw)
                   .to_pandas().itertuples(index=False)))
    assert a == b and len(a) > 0
    # packed spans tile each sequence: per-seq token mass ≤ seq_len
    import collections
    per_seq = collections.Counter()
    for _, seq_id, _, n_toks in a:
        per_seq[seq_id] += n_toks
    full = [s for s, n in per_seq.items() if n == 128]
    assert len(full) >= len(per_seq) - 1      # only the tail partial


def test_url_templates_hand_case(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.urlnorm import url_templates
    urls = ["https://a.test/d/1", "https://a.test/d/23?p=4",
            "https://a.test/d/5#frag", "https://a.test/about",
            "https://b.test/cal/2024/01", "https://b.test/cal/2024/02"]
    ds = rd.from_items([{"url": u} for u in urls], override_num_blocks=4)
    got = {r["template"]: r["n_urls"]
           for r in url_templates(ds).take_all()}
    assert got == {"https://a.test/d/{n}": 3, "https://a.test/about": 1,
                   "https://b.test/cal/{n}/{n}": 2}
    got2 = {r["template"]: r["n_urls"]
            for r in url_templates(ds, min_count=2).take_all()}
    assert got2 == {"https://a.test/d/{n}": 3,
                    "https://b.test/cal/{n}/{n}": 2}


def test_url_templates_oracle_matches(ray_session):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.urlnorm import (url_templates,
                                               url_templates_oracle_sql)
    urls = [f"https://h{i % 3}.test/p{i % 5}/x{i}?s={i}"
            for i in range(40)]
    ds = rd.from_items([{"url": u} for u in urls], override_num_blocks=4)
    got = sorted((r["template"], r["n_urls"])
                 for r in url_templates(ds, min_count=2).take_all())
    vals = ", ".join(f"('{u}')" for u in urls)
    want = sorted(map(tuple, duckdb.sql(url_templates_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(url)",
        min_count=2)).fetchall()))
    assert got == want
