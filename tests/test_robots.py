"""robots.txt engine (RFC 9309 subset) + frontier filter stage."""

import pytest

from pdf2dom_ray.engine.robots import parse_robots

BODY = b"""
# comment
User-agent: badbot
Disallow: /

User-agent: googlebot
User-agent: pdf2dom
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /r
Allow: /r2$
Disallow: /buy$
Disallow: /tmp/*.bak$
Allow: /
"""


@pytest.mark.parametrize("path,ok", [
    ("/", True), ("/news", True), ("/ref", False), ("/r0", False),
    ("/r2", True), ("/r2x", False), ("/buy", False), ("/buynow", True),
    ("/tmp/a.bak", False), ("/tmp/a.bak.old", True), ("/tmp/x", True),
])
def test_star_group_semantics(path, ok):
    r = parse_robots(BODY, agent="somebot")
    assert r.allowed(path) is ok, path


def test_specific_group_wins_over_star():
    r = parse_robots(BODY, agent="pdf2dom-ray/1.0")
    assert r.allowed("/private/x") is False
    assert r.allowed("/private/ok/y") is True
    assert r.allowed("/r0") is True       # star group does not apply


def test_blanket_disallow_group():
    r = parse_robots(BODY, agent="BadBot")
    assert r.allowed("/") is False
    assert r.allowed("/anything") is False


def test_empty_and_missing():
    assert parse_robots(b"", agent="x").allowed("/a") is True
    assert parse_robots(b"User-agent: *\nDisallow:",
                        agent="x").allowed("/a") is True


def test_allow_wins_ties():
    r = parse_robots(b"User-agent: *\nDisallow: /dir\nAllow: /dir",
                     agent="x")
    assert r.allowed("/dir/a") is True


def test_frontier_filter_stage(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.frontier import (SYNTH_ROBOTS,
                                                filter_frontier)
    targets = rd.from_items([
        {"target": "https://docs.synth.test/r0"},
        {"target": "https://docs.synth.test/r2"},
        {"target": "https://docs.synth.test/buy"},
        {"target": "https://docs.synth.test/news"},
        {"target": "https://other.example/x"},       # no robots → allowed
    ], override_num_blocks=4)
    out = filter_frontier(targets, {"docs.synth.test": SYNTH_ROBOTS})
    got = {r["target"].rsplit("/", 1)[1]: r["allowed"]
           for r in out.take_all()}
    assert got == {"r0": False, "r2": True, "buy": False,
                   "news": True, "x": True}
