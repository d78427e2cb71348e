"""HTML boilerplate strip: kernel unit tests + Ray stage E2E.

Kernel spec: jusText/Boilerpipe-style shallow-text-block heuristics
(engine/htmltext.py docstring). The synthetic corpus rules in
synth/htmlgen.py are the SQL oracle for the driver query
``html_main_text`` — the E2E test here locks the same invariant.
"""

import math

import pytest

from pdf2dom_ray.engine.htmltext import (MAX_LINK_DENSITY, classify_blocks,
                                         extract_main, segment_blocks)
from pdf2dom_ray.synth.htmlgen import doc_to_html, words_per_paragraph

REALISTIC = b"""<!DOCTYPE html><html><head><title>t</title>
<style>nav{color:red}</style><script>var x=1;</script></head><body>
<header><nav><a href="/">Home</a> | <a href="/a">About</a> |
<a href="/c">Contact</a></nav></header>
<article><h1>Quarterly results beat expectations</h1>
<p>The company reported revenue of four billion for the quarter,
beating analyst expectations by a wide margin and raising its
guidance for the rest of the year.</p>
<p>Shares rose five percent in after-hours trading as investors
digested the stronger than expected outlook, with analysts citing
the cloud division as the main driver of the growth.</p>
<p>More below.</p>
<p>Margins expanded for the third consecutive quarter, helped by
cost controls and a favorable shift in the overall product mix of
the business according to the earnings call.</p></article>
<ul><li><a href="/r1">Related story one</a></li>
<li><a href="/r2">Related story two</a></li></ul>
<div>&copy; 2024 Example Corp. All rights reserved.
<a href="/p">Privacy</a></div>
</body></html>"""


def test_realistic_page_keeps_article_drops_chrome():
    mc = extract_main(REALISTIC)
    assert mc.title == "Quarterly results beat expectations"
    paras = mc.main_text.split("\n")
    assert len(paras) == 4
    assert paras[0].startswith("The company reported revenue")
    assert paras[2] == "More below."          # short → inherits good prev
    assert "Home" not in mc.main_text         # nav stripped
    assert "Related story" not in mc.main_text
    assert "All rights reserved" not in mc.main_text
    assert "var x=1" not in mc.main_text      # script skipped
    assert "color:red" not in mc.main_text    # style skipped


def test_link_density_feature():
    blocks = segment_blocks(
        b'<p><a href="/x">click here now</a> ok</p>'
        b'<p>plain text with just <a href="/y">one</a> link in a long '
        b'enough sentence to be content</p>')
    assert blocks[0].link_density > MAX_LINK_DENSITY
    assert blocks[1].link_density < MAX_LINK_DENSITY
    classify_blocks(blocks)
    assert blocks[0].label == "bad"
    assert blocks[1].label == "good"


def test_short_block_inherits_bad_neighbour():
    blocks = classify_blocks(segment_blocks(
        b'<nav><a href="/">Home</a> <a href="/n">News</a></nav>'
        b'<div>Menu</div>'))  # short, prev is bad nav
    assert [b.label for b in blocks] == ["bad", "bad"]


def test_entities_and_li_blocks():
    blocks = segment_blocks(b"<p>a &amp; b &lt;c&gt;</p><ul><li>x</li>"
                            b"<li>y</li></ul>")
    assert blocks[0].text == "a & b <c>"
    assert [b.text for b in blocks[1:]] == ["x", "y"]


def test_heading_is_title_not_body():
    mc = extract_main(b"<h1>The Headline</h1><p>Body text long enough to "
                      b"stand on its own as content.</p>")
    assert mc.title == "The Headline"
    assert "Headline" not in mc.main_text


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 13, 23, 97])
def test_synth_rules_roundtrip(doc_id):
    text = " ".join(["alpha beta gamma delta epsilon zeta eta theta"] * 3)
    mc = extract_main(doc_to_html(doc_id, text))
    assert mc.title == f"Doc {doc_id}"
    assert mc.main_text.replace("\n", " ") == text
    n_para = math.ceil(len(text.split(" ")) / words_per_paragraph(doc_id))
    n_bp = 3 + (doc_id % 4 == 1) + (doc_id % 5 == 3)
    assert mc.n_boilerplate == n_bp
    assert mc.n_blocks == n_bp + 1 + n_para


def test_extract_determinism():
    payload = doc_to_html(42, "one two three four five six seven eight "
                              "nine ten eleven twelve")
    a, b = extract_main(payload), extract_main(payload)
    assert (a.title, a.main_text, a.n_blocks, a.n_boilerplate) == \
           (b.title, b.main_text, b.n_blocks, b.n_boilerplate)


def test_ray_stage_e2e(ray_session, sf_dir):
    import pyarrow.parquet as pq
    from pdf2dom_ray.pipelines.html_extract import extract_html_from_documents

    out = extract_html_from_documents(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    exp = {f"https://docs.synth.test/{d}": t
           for d, t in zip(docs.doc_id, docs.text)}
    assert len(out) == len(docs)
    got = {u: t.replace("\n", " ")
           for u, t in zip(out.url, out.main_text)}
    assert got == exp


# ---------------------------------------------------------------------------
# outlinks / web graph
# ---------------------------------------------------------------------------

from pdf2dom_ray.engine.htmltext import canonical_url, extract_outlinks


@pytest.mark.parametrize("href,expect", [
    ("/news", "https://ex.com/news"),
    ("sub/page.html", "https://ex.com/dir/sub/page.html"),
    ("../up", "https://ex.com/up"),
    ("#frag", "https://ex.com/dir/page"),
    ("HTTPS://Other.COM:443/X?q=1#f", "https://other.com/X?q=1"),
    ("http://h.com:80/", "http://h.com/"),
    ("http://h.com:8080/", "http://h.com:8080/"),
    ("https://h.com", "https://h.com/"),
    ("mailto:x@y.z", None),
    ("javascript:void(0)", None),
    ("ftp://h.com/f", None),
])
def test_canonical_url(href, expect):
    assert canonical_url("https://ex.com/dir/page", href) == expect


def test_extract_outlinks_content_vs_chrome():
    html = (b'<nav><a href="/a">A</a> <a href="/b">B</a></nav>'
            b'<p>A long enough paragraph of editorial prose with an '
            b'<a href="/ref">inline link</a> inside real content text '
            b'that keeps the link density well below the threshold.</p>'
            b'<footer>All rights reserved <a href="/legal">Legal</a>'
            b'</footer>')
    links = extract_outlinks(html, "https://ex.com/p")
    assert ("https://ex.com/ref", True) in links
    assert ("https://ex.com/a", False) in links
    assert ("https://ex.com/legal", False) in links
    assert len(links) == 4


def test_extract_outlinks_imagelink_block_kept():
    # an <a> with no text (image link) must still yield its href, as chrome
    links = extract_outlinks(b'<div><a href="/img-target"></a></div>'
                             b'<p>Plain paragraph with enough words to be '
                             b'counted as actual page content here.</p>',
                             "https://ex.com/")
    assert links == [("https://ex.com/img-target", False)]


def test_synth_outlink_rules(ray_session, sf_dir):
    """Ray E2E: edge counts per page follow the htmlgen modular rules."""
    from pdf2dom_ray.pipelines.html_extract import (extract_outlinks_ds,
                                                    synth_html_pages)
    out = extract_outlinks_ds(synth_html_pages(sf_dir)).to_pandas()
    per_src = out.groupby("src").size()
    for url, n in per_src.items():
        d = int(url.rsplit("/", 1)[1])
        exp = 7                       # nav(5) + footer(2)
        exp += 2 if d % 3 == 0 else 4  # breadcrumb xor sidebar
        exp += d % 4 == 1              # ad
        exp += 2 * (d % 5 == 3)        # share bar (fragment self-links)
        exp += d % 6 == 2              # inline content link
        assert n == exp, url
    n_content = out[out.is_content].groupby("src").size()
    for url in n_content.index:
        assert int(url.rsplit("/", 1)[1]) % 6 == 2


def test_adjacency_lists(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.html_extract import (adjacency_lists,
                                                    extract_outlinks_ds,
                                                    synth_html_pages)
    edges = extract_outlinks_ds(synth_html_pages(sf_dir))
    adj = adjacency_lists(edges).to_pandas()
    raw = edges.to_pandas()
    exp = raw.groupby("src")["target"].apply(
        lambda s: sorted(set(s)))
    assert len(adj) == len(exp)
    for r in adj.itertuples():
        assert r.targets.split(",") == exp[r.src]
        assert r.n_targets == len(exp[r.src])


def test_extract_anchors_texts_and_targets():
    from pdf2dom_ray.engine.htmltext import extract_anchors
    html = (b'<html><body><nav><a href="/">Home</a> '
            b'<a href="/x">Go <b>deep</b> now</a></nav>'
            b'<p>Long enough content sentence here to classify well. '
            b'<a href="/ref">word</a> trailing.</p>'
            b'<a>no href</a>'
            b'<a href="#frag">Self</a></body></html>')
    got = extract_anchors(html, "https://ex.test/page")
    assert ("https://ex.test/", "Home", False) in got
    # nested inline tags concatenate, whitespace-normalized
    assert ("https://ex.test/x", "Go deep now", False) in got
    assert ("https://ex.test/ref", "word", True) in got
    # fragment-only href canonicalizes to the page itself
    assert ("https://ex.test/page", "Self", False) in got
    assert len(got) == 4      # href-less anchor contributes nothing


def test_extract_anchors_entity_roundtrip():
    from pdf2dom_ray.engine.htmltext import extract_anchors
    html = b'<p><a href="/e">A&amp;B &lt;ok&gt;</a></p>'
    got = extract_anchors(html, "https://ex.test/")
    assert got[0][1] == "A&B <ok>"


def test_anchor_text_counts_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.pipelines.html_extract import anchor_text_counts
    html = (b'<html><body><a href="/t">same</a>'
            b'<a href="/t">same</a><a href="/t">other</a>'
            b'</body></html>')
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://ex.test/1", "https://ex.test/2"],
                        pa.string()),
        "html": pa.array([html, html], pa.binary())}))
    got = {(r["target"], r["anchor_text"]): r["n_refs"]
           for r in anchor_text_counts(pages).take_all()}
    assert got == {("https://ex.test/t", "same"): 4,
                   ("https://ex.test/t", "other"): 2}


def test_anchor_profiles(ray_session):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.pipelines.html_extract import anchor_profiles
    counts = [("t1", "Home", 5), ("t1", "News", 5), ("t1", "Zed", 1),
              ("t2", "Only", 3)]
    ds = rd.from_items([{"target": t, "anchor_text": a, "n_refs": n}
                        for t, a, n in counts], override_num_blocks=4)
    got = {r["target"]: (r["anchor_profile"], r["n_anchors"],
                         r["total_refs"])
           for r in anchor_profiles(ds, top_k=2).take_all()}
    # ties break on anchor text asc; Zed falls outside top_k but
    # still counts in n_anchors/total_refs
    assert got == {"t1": ("Home | News", 3, 11), "t2": ("Only", 1, 3)}
    # oracle-convention cross-check via DuckDB window + string_agg
    vals = ", ".join(f"('{t}', '{a}', {n})" for t, a, n in counts)
    sql = f"""
        WITH counts AS (SELECT * FROM (VALUES {vals})
                        AS t(target, anchor_text, n_refs)),
        rk AS (SELECT target, anchor_text, n_refs,
                      row_number() OVER (PARTITION BY target
                          ORDER BY n_refs DESC, anchor_text) AS rn
               FROM counts),
        prof AS (SELECT target,
                        string_agg(anchor_text, ' | ' ORDER BY rn)
                            AS anchor_profile
                 FROM rk WHERE rn <= 2 GROUP BY target),
        tot AS (SELECT target, CAST(count(*) AS BIGINT) AS n_anchors,
                       CAST(sum(n_refs) AS BIGINT) AS total_refs
                FROM counts GROUP BY target)
        SELECT t.target, p.anchor_profile, t.n_anchors, t.total_refs
        FROM tot t JOIN prof p ON t.target = p.target"""
    want = {r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(sql).fetchall()}
    assert got == want
