"""Synthetic Common-Crawl-style HTML pages (boilerplate + article).

Mirror of ``synth/corpus.py`` for the HTML branch of the input_hint's
``html`` binary column: each ``documents`` row becomes one web page
whose article body carries exactly that document's text, wrapped in
deterministic boilerplate (nav / breadcrumbs / sidebar / ads / share
bar / legal footer plus script+style noise).  The rules are modular
functions of ``doc_id`` so DuckDB oracles can predict the extractor's
output in pure SQL (CLAUDE.md invariant: these rules ARE the oracle).

Rules (v1 — bump HTMLGEN_VERSION on change):

* words-per-paragraph  P = 8 + doc_id % 7; article = ceil(n_words/P)
  ``<p>`` blocks carrying the doc words in order (single-space joins,
  so joining the extracted paragraphs with spaces reproduces ``text``
  byte-identically)
* inline anchor        first word of paragraph 0 is a link when
  doc_id % 6 == 2 (link density stays far below the 0.33 threshold)
* nav bar              always (5 links, one block)
* breadcrumbs          when doc_id % 3 == 0, else sidebar of related
  links (so exactly one of the two per page)
* ad block             when doc_id % 4 == 1
* share bar            when doc_id % 5 == 3
* legal footer         always ("All rights reserved" + links)
* title                <h1>Doc {doc_id}</h1> (heading → ``title``)

Expected extractor output per page (the SQL oracle):
  title        = 'Doc ' || doc_id
  main_text    = documents.text (newlines → spaces)
  n_blocks     = 3 + (%4==1) + (%5==3) + 1 + ceil(n_words/P)
                 [nav + one-of(breadcrumb|sidebar) + footer = 3]
  n_boilerplate = 3 + (%4==1) + (%5==3)
"""

from __future__ import annotations

from html import escape as html_escape

import pyarrow as pa

from .corpus import URL_PREFIX, _EPOCH_US

__all__ = ["HTMLGEN_VERSION", "doc_to_html", "html_pages_batch_from_documents"]

HTMLGEN_VERSION = 1

_NAV = ('<header><nav><a href="/">Home</a> · <a href="/news">News</a> · '
        '<a href="/archive">Archive</a> · <a href="/about">About</a> · '
        '<a href="/contact">Contact</a></nav></header>')
_FOOTER = ('<footer>© 2024 Synth Media — All rights reserved. '
           '<a href="/privacy">Privacy</a> <a href="/terms">Terms</a>'
           '</footer>')
_SHARE = ('<div class="share"><a href="#t">Share on Twitter</a> '
          '<a href="#f">Share on Facebook</a></div>')
_SCRIPT = ('<script>var t=window.performance.now();'
           'console.log("tracker",t);</script>')
_STYLE = '<style>p{margin:0 0 1em}nav a{color:#246}</style>'


def words_per_paragraph(doc_id: int) -> int:
    return 8 + doc_id % 7


def doc_to_html(doc_id: int, text: str) -> bytes:
    """Render one document's text into a deterministic boilerplated page."""
    words = [html_escape(w, quote=False) for w in text.split(" ")]
    p = words_per_paragraph(doc_id)
    paras = [" ".join(words[i:i + p]) for i in range(0, len(words), p)]
    if doc_id % 6 == 2 and paras and paras[0]:
        first, _, rest = paras[0].partition(" ")
        paras[0] = f'<a href="/ref">{first}</a>' + (" " + rest if rest else "")

    parts = ["<!DOCTYPE html><html><head><title>synth page</title>",
             _STYLE, "</head><body>", _NAV, _SCRIPT]
    if doc_id % 3 == 0:
        parts.append(f'<div class="crumb"><a href="/">Home</a> » '
                     f'<a href="/s{doc_id % 5}">Section {doc_id % 5}</a>'
                     f'</div>')
    parts.append(f"<article><h1>Doc {doc_id}</h1>")
    parts.extend(f"<p>{para}</p>" for para in paras)
    parts.append("</article>")
    if doc_id % 3 != 0:
        links = " ".join(f'<a href="/r{j}">Story {(doc_id + j) % 9}</a>'
                         for j in range(4))
        parts.append(f'<aside>Related: {links}</aside>')
    if doc_id % 4 == 1:
        parts.append('<div class="ad">Sponsored — '
                     '<a href="/buy">Buy now and save big</a></div>')
    if doc_id % 5 == 3:
        parts.append(_SHARE)
    parts.append(_FOOTER)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def html_pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """documents → (url, warc_ts, html, text, lang) with HTML payloads."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = (batch.column("lang").to_pylist()
             if "lang" in batch.column_names else [""] * len(doc_ids))
    return pa.table({
        "url": pa.array([f"{URL_PREFIX}{d}" for d in doc_ids], pa.string()),
        "warc_ts": pa.array([_EPOCH_US + int(d) * 1_000_000
                             for d in doc_ids], pa.timestamp("us")),
        "html": pa.array([doc_to_html(d, t)
                          for d, t in zip(doc_ids, texts)], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
