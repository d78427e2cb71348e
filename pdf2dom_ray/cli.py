"""Job driver CLI — the reference's ``PDFToHTML.main`` surface
(`/root/reference/src/main/java/org/fit/pdfdom/PDFToHTML.java:41-164`)
re-expressed as a Ray Data job entry point.

The reference converts one local PDF per invocation with flags
``-fm/-fdir/-im/-idir`` selecting font/image resource handlers; this
driver runs the same conversion over a Parquet pages table (or a single
local file for parity) and is what ``ray job submit`` would invoke on a
cluster.

Usage:
    python -m pdf2dom_ray.cli <in.pdf|pages.parquet dir> [out]
        [--fm embed_base64|ignore|save_to_dir] [--fdir DIR]
        [--im embed_base64|ignore|save_to_dir] [--idir DIR]
        [--start-page N] [--end-page N] [--num-cpus N]
        [--partitions P] [--resume]
"""

from __future__ import annotations

import argparse
import os
import sys

from .config import EMBED_BASE64, IGNORE, SAVE_TO_DIR, PdfDomConfig

_HANDLERS = {"embed_base64": EMBED_BASE64, "ignore": IGNORE,
             "save_to_dir": SAVE_TO_DIR,
             # reference flag spellings (PDFToHTML.java:100-136)
             "EMBED_BASE64": EMBED_BASE64, "IGNORE": IGNORE,
             "SAVE_TO_DIR": SAVE_TO_DIR}


def build_config(args) -> PdfDomConfig:
    return PdfDomConfig(
        font_handler=_HANDLERS[args.fm],
        image_handler=_HANDLERS[args.im],
        start_page=args.start_page,
        end_page=args.end_page,
    )


def convert_single(path: str, out: str | None, cfg: PdfDomConfig) -> int:
    """One-file parity mode (PDFToHTML.java:56-98) — no Ray needed."""
    from .engine.parse import parse_document
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError as e:
        print(f"error: cannot read {path}: {e.strerror}", file=sys.stderr)
        return 1
    r = parse_document(data, cfg)
    if r.error:
        print(f"error: {r.error}", file=sys.stderr)
        return 1
    out = out or (os.path.splitext(path)[0] + ".html")
    with open(out, "w", encoding="utf-8") as f:
        f.write(r.html_dom)
    for res in r.resources:
        res_path = os.path.join(os.path.dirname(out) or ".", res["path"])
        os.makedirs(os.path.dirname(res_path), exist_ok=True)
        with open(res_path, "wb") as f:
            f.write(res["data"])
    return 0


def convert_table(path: str, out: str, cfg: PdfDomConfig, args) -> int:
    if not os.path.exists(path):
        print(f"error: cannot read {path}: No such file or directory",
              file=sys.stderr)
        return 1
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    from .pipelines.extract import extract
    from .state.checkpoint import resume_filter, write_resumable
    from .state.checkpoint import completed_partitions
    pages = rd.read_parquet(path, columns=["url", "html"])
    skipped = 0
    if args.resume:
        skipped = len(completed_partitions(out))
        pages = resume_filter(pages, out, args.partitions)
    parsed = extract(pages, cfg)
    manifest = write_resumable(parsed, out, args.partitions)
    done = sum(p["rows"] for p in manifest["partitions"])
    errs = sum(p["errors"] for p in manifest["partitions"])
    note = f" (skipped {skipped} completed partitions)" if skipped else ""
    print(f"corpus complete: {done} docs / {errs} errors across "
          f"{len(manifest['partitions'])} partitions at {out}{note}")
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf2dom-ray")
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--fm", default="embed_base64", choices=list(_HANDLERS))
    ap.add_argument("--fdir")
    ap.add_argument("--im", default="embed_base64", choices=list(_HANDLERS))
    ap.add_argument("--idir")
    ap.add_argument("--start-page", type=int, default=0)
    ap.add_argument("--end-page", type=int, default=2**31 - 1)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)
    if args.fdir:
        args.fm = "save_to_dir"
    if args.idir:
        args.im = "save_to_dir"
    cfg = build_config(args)
    if args.input.endswith(".pdf"):
        return convert_single(args.input, args.output, cfg)
    return convert_table(args.input, args.output or "out", cfg, args)


if __name__ == "__main__":
    raise SystemExit(main())
