"""robots.txt source: RFC 9309 parsing edge cases, generator
coupling, file-parallel read."""

import pytest


def test_multi_agent_group_and_global_sitemap():
    from pdf2dom_ray.sources.robots import parse_robots_rows
    text = """# comment
User-agent: a
User-agent: b
Disallow: /x

Sitemap: https://h/s.xml
User-agent: *
Allow: /
Crawl-delay: 2
Unknown-field: zzz
"""
    rows = parse_robots_rows(text, "h")
    assert ("h", "a", 0, "disallow", "/x") in rows
    assert ("h", "b", 0, "disallow", "/x") in rows
    assert ("h", "", 1, "sitemap", "https://h/s.xml") in rows
    assert ("h", "*", 2, "allow", "/") in rows
    assert ("h", "*", 3, "crawl-delay", "2") in rows
    assert all(r[3] != "unknown-field" for r in rows)


def test_blank_line_only_breaks_after_rules():
    from pdf2dom_ray.sources.robots import parse_robots_rows
    # blank line between UA lines of the SAME group must not split it
    text = "User-agent: a\n\nUser-agent: b\nDisallow: /q\n"
    rows = parse_robots_rows(text, "h")
    assert ("h", "a", 0, "disallow", "/q") in rows
    assert ("h", "b", 0, "disallow", "/q") in rows


def test_rules_before_any_group_default_to_star():
    from pdf2dom_ray.sources.robots import parse_robots_rows
    rows = parse_robots_rows("Disallow: /lost\n", "h")
    assert rows == [("h", "*", 0, "disallow", "/lost")]


def test_generator_roundtrip(ray_session, tmp_path):
    from pdf2dom_ray.sources.robots import read_robots
    from pdf2dom_ray.synth.robotsgen import (expected_rows,
                                             write_robots_files)
    out = write_robots_files(str(tmp_path / "rb"))
    got = sorted(map(tuple, read_robots(out).to_pandas()
                     .itertuples(index=False)))
    want = sorted(r for h in range(4) for r in expected_rows(h))
    assert got == want
