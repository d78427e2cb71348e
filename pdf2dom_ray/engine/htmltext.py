"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north_rule names "HTML boilerplate strip … DOM heuristics" as part of
the main-content extraction surface alongside the PDF parse.  The
reference (Pdf2Dom) has no HTML path, so this kernel is specified from
the published literature instead: block segmentation + link-density /
length / stopword features follow jusText (Pomikálek 2011, "Removing
boilerplate and duplicate content from web corpora", ch. 3) and
Boilerpipe (Kohlschütter et al., WSDM 2010) — shallow-text-feature
classification of block-level segments, with a context pass that lets
short blocks inherit the class of neighbouring content.

Pure per-document kernel: no Ray, stdlib ``html.parser`` only.  The
Ray-side stage wraps :func:`extract_main` in an actor-pool
``map_batches`` (see ``pdf2dom_ray/pipelines/html_extract.py``).

Classification rules (context-free pass, applied per block):

* ``bad``   — link_density > ``MAX_LINK_DENSITY`` (0.33), or the block
  matches the copyright/boilerplate regex (``© / all rights reserved /
  cookie policy``-style footers whose link density alone is too low).
* ``heading`` — h1–h6 blocks; the first h1 becomes the document title.
  Headings count as content ("good" neighbours) but are not part of
  ``main_text`` (they are routed to ``title``).
* ``short`` — fewer than ``MIN_BLOCK_CHARS`` (25) normalized chars and
  zero links; resolved by the context pass.
* ``good``  — everything else.

Context pass (jusText §3.4 simplified): each ``short`` block inherits
the class of the nearest preceding non-short block (``heading`` counts
as good); if none exists, the nearest following one; defaults to good.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

__all__ = ["Block", "segment_blocks", "classify_blocks", "extract_main",
           "canonical_url", "extract_outlinks",
           "MAX_LINK_DENSITY", "MIN_BLOCK_CHARS"]

MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 25

# Footer/legal boilerplate that is mostly plain text (low link density):
# the one tag-blind textual prior both jusText and Boilerpipe ship.
_COPYRIGHT_RE = re.compile(
    r"©|\(c\)\s*\d{4}|\ball rights reserved\b|\bcookie polic|"
    r"\bterms of (?:use|service)\b",
    re.IGNORECASE)

# Tags that open/close a block-level segment (HTML5 flow content that
# renders as a box); text between two of these boundaries is one block.
_BLOCK_TAGS = frozenset("""
    p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td th
    blockquote pre article section header footer nav aside main figure
    figcaption form fieldset hr br body
""".split())

# Subtrees whose text is never content.
_SKIP_TAGS = frozenset(["script", "style", "template", "noscript",
                        "svg", "head"])

_HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])


@dataclass
class Block:
    """One block-level text segment with its shallow-text features."""
    tag: str
    text: str = ""
    link_chars: int = 0
    label: str = ""       # filled by classify_blocks
    hrefs: list = field(default_factory=list)
    anchors: list = field(default_factory=list)   # (href, anchor_text)

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def n_words(self) -> int:
        return len(self.text.split())

    @property
    def link_density(self) -> float:
        return self.link_chars / self.n_chars if self.n_chars else 0.0


class _BlockParser(HTMLParser):
    """Flushes a Block at every block-tag boundary.

    Fragments are accumulated as (text, in_link) pairs and normalized
    (whitespace-collapsed) at flush time, so source indentation and
    entity references never leak into features or output text.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._frags: list[tuple[str, bool]] = []
        self._hrefs: list[str] = []
        self._anchors: list[tuple[str, str]] = []
        self._open_anchor: list | None = None     # [href, parts]
        self._cur_tag = "body"
        self._skip_depth = 0
        self._link_depth = 0

    # -- flush ------------------------------------------------------------
    def _flush(self) -> None:
        if not self._frags and not self._hrefs:
            return
        raw = "".join(f for f, _ in self._frags)
        text = " ".join(raw.split())
        if text or self._hrefs:
            # text-less blocks (image links etc.) are kept so their
            # hrefs survive for outlink extraction; they are never
            # content and are excluded from block counts
            link_chars = sum(
                len(" ".join(f.split())) for f, in_link in self._frags
                if in_link)
            self.blocks.append(Block(self._cur_tag, text, link_chars,
                                     hrefs=self._hrefs,
                                     anchors=self._anchors))
            self._hrefs = []
            self._anchors = []
        self._frags = []

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
            href = next((v for k, v in attrs if k == "href"), None)
            if href:
                self._hrefs.append(href)
                self._open_anchor = [href, []]
        elif tag in _BLOCK_TAGS:
            self._flush()
            if tag not in ("br", "hr"):
                self._cur_tag = tag

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            if self._open_anchor is not None:
                href, parts = self._open_anchor
                self._anchors.append(
                    (href, " ".join("".join(parts).split())))
                self._open_anchor = None
        elif tag in _BLOCK_TAGS:
            self._flush()
            self._cur_tag = "body"

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in ("br", "hr"):
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        if self._open_anchor is not None and self._link_depth > 0:
            self._open_anchor[1].append(data)
        self._frags.append((data, self._link_depth > 0))

    def close(self) -> None:  # final flush
        super().close()
        self._flush()


def segment_blocks(html: bytes | str) -> list[Block]:
    """Parse HTML into block-level text segments with features."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def classify_blocks(blocks: list[Block]) -> list[Block]:
    """Context-free labels, then the short-block context pass (in place)."""
    for b in blocks:
        if not b.text:
            b.label = "bad"   # href-only block: never content
        elif b.tag in _HEADING_TAGS:
            b.label = "heading"
        elif b.link_density > MAX_LINK_DENSITY or _COPYRIGHT_RE.search(b.text):
            b.label = "bad"
        elif b.n_chars < MIN_BLOCK_CHARS and b.link_chars == 0:
            b.label = "short"
        else:
            b.label = "good"

    # context pass: nearest preceding resolved block, else following
    resolved_prev: list[str | None] = []
    last = None
    for b in blocks:
        resolved_prev.append(last)
        if b.label != "short":
            last = "good" if b.label == "heading" else b.label
    last = None
    resolved_next: list[str | None] = [None] * len(blocks)
    for i in range(len(blocks) - 1, -1, -1):
        resolved_next[i] = last
        if blocks[i].label != "short":
            last = "good" if blocks[i].label == "heading" else blocks[i].label
    for i, b in enumerate(blocks):
        if b.label == "short":
            b.label = resolved_prev[i] or resolved_next[i] or "good"
    return blocks


@dataclass
class MainContent:
    title: str
    main_text: str
    n_blocks: int
    n_boilerplate: int
    blocks: list[Block] = field(repr=False, default_factory=list)


def extract_main(html: bytes | str) -> MainContent:
    """Boilerplate-strip one page: (title, main_text, block counts)."""
    blocks = classify_blocks(segment_blocks(html))
    title = next((b.text for b in blocks if b.tag == "h1" and b.text), "")
    main_text = "\n".join(b.text for b in blocks if b.label == "good")
    n_text = sum(1 for b in blocks if b.text)
    n_bad = sum(1 for b in blocks if b.label == "bad" and b.text)
    return MainContent(title, main_text, n_text, n_bad, blocks)


_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def canonical_url(base: str, href: str) -> str | None:
    """Resolve + canonicalize an outlink target.

    Rules (the standard crawl-frontier normalization): resolve relative
    against the page url, lowercase scheme/host, drop the fragment,
    drop an explicit default port, empty path → "/". Non-fetchable
    schemes (javascript:, mailto:, data:) → None.
    """
    try:
        u = urlsplit(urljoin(base, href.strip()))
    except ValueError:
        return None
    scheme = u.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = u.netloc.lower()
    if netloc.endswith(_DEFAULT_PORT[scheme]):
        netloc = netloc.rsplit(":", 1)[0]
    return urlunsplit((scheme, netloc, u.path or "/", u.query, ""))


def extract_outlinks(html: bytes | str, base_url: str) \
        -> list[tuple[str, bool]]:
    """(target, is_content) per canonicalized outlink of a page.

    ``is_content`` = the link sits in a main-content (good) block vs
    page chrome (nav / sidebar / footer / ads) — the distinction a
    web-graph builder wants (content links carry editorial signal;
    chrome links are template artifacts repeated site-wide).
    """
    blocks = classify_blocks(segment_blocks(html))
    out: list[tuple[str, bool]] = []
    for b in blocks:
        for href in b.hrefs:
            target = canonical_url(base_url, href)
            if target is not None:
                out.append((target, b.label == "good"))
    return out


def extract_anchors(html: bytes | str, base_url: str) \
        -> list[tuple[str, str, bool]]:
    """(target, anchor_text, is_content) per canonicalized outlink —
    the anchor-text view of the link graph (anchor text is the classic
    external description of a target page: search indexing, link-spam
    detection, entity salience all consume this aggregate)."""
    blocks = classify_blocks(segment_blocks(html))
    out: list[tuple[str, str, bool]] = []
    for b in blocks:
        for href, text in b.anchors:
            target = canonical_url(base_url, href)
            if target is not None:
                out.append((target, text, b.label == "good"))
    return out
