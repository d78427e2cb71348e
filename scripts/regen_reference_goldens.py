#!/usr/bin/env python
"""Regenerate tests/goldens/reference_corpus.json (sha256 of html_dom
per reference test PDF). Run CONSCIOUSLY — the hashes are the spec
for the real-PDF conformance corpus (CLAUDE.md golden invariant)."""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.test_reference_corpus import FILES, GOLDEN, REF  # noqa: E402


STATS = os.path.join(os.path.dirname(GOLDEN),
                     "reference_corpus_stats.json")


def main() -> int:
    from pdf2dom_ray.engine.parse import parse_document
    out, stats = {}, {}
    for rel in FILES:
        with open(os.path.join(REF, rel), "rb") as f:
            r = parse_document(f.read())
        assert r.error is None, f"{rel}: {r.error}"
        sha = hashlib.sha256(r.html_dom.encode()).hexdigest()
        out[rel] = sha
        stats[rel] = {
            "num_pages": r.num_pages, "n_spans": r.n_boxes,
            "n_images": r.n_images,
            "n_chars": len(r.extracted_text), "html_sha": sha}
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    with open(STATS, "w") as f:
        json.dump(stats, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} hashes to {GOLDEN} and stats to {STATS}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
