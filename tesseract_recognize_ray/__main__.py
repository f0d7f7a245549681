"""CLI entry point — the typed equivalent of the reference's option surface
(`/root/reference/tesseract-recognize.cc:94-152`, §2.12): interleaved docs +
media parquet in, ordered span rows (or PAGE XML) out.

    python -m tesseract_recognize_ray --docs D --media M -o OUT
        [--format spans|pagexml] [--layout-level region|line|word|glyph]
        [--text-levels region,line] [--only-layout] [--pages 0,2-4]
        [--save-crops] [--quarantine] [--resume-sharded]
        [--num-cpus N] [--concurrency N]

    # §3.2 re-recognition (reference's PAGE-XML input entry point):
    python -m tesseract_recognize_ray --xml X.parquet --media M -o OUT
        [--inplace] [--selection-level region|line|word] [--psm N]
        [--image MEDIA_REF]

Owns its Ray session (guarded init — never called from driver-managed code).
Exit status follows the reference's convention: nonzero when nothing was
written (tesseract-recognize.cc:866-877).
"""

from __future__ import annotations

import argparse
import os
import sys


def _write_and_count(ds, output: str) -> int:
    """Write the dataset and return the ROW count of files created by THIS
    run (pre-existing parquet in the directory doesn't count) — the exit
    convention follows the reference's bytes-written check
    (tesseract-recognize.cc:866-877)."""
    import pyarrow.parquet as pq

    before = set(os.listdir(output)) if os.path.isdir(output) else set()
    ds.write_parquet(output)
    new = [f for f in os.listdir(output) if f.endswith(".parquet") and f not in before]
    rows = sum(pq.read_metadata(os.path.join(output, f)).num_rows for f in new)
    print(f"wrote {rows} row(s) in {len(new)} parquet file(s) -> {output}", file=sys.stderr)
    return rows


def _xml_dataset(path: str):
    """--xml input: a (doc_id, xml) parquet path, or ``-`` = ONE PAGE XML
    document read from stdin — the reference's stdin entry point
    (tesseract-recognize.cc:402-406)."""
    import pyarrow as pa
    import ray.data as rd

    if path == "-":
        text = sys.stdin.read()
        return rd.from_arrow(pa.table({"doc_id": pa.array(["stdin"]), "xml": pa.array([text])}))
    return rd.read_parquet(path, columns=["doc_id", "xml"])


def build_config(args) -> "PipelineConfig":
    from .config import PipelineConfig

    return PipelineConfig(
        psm=args.psm,
        layout_level=args.layout_level,
        text_levels=tuple(s for s in args.text_levels.split(",") if s) if args.text_levels else (),
        only_layout=args.only_layout,
        page_set=args.pages,
        save_crops=args.save_crops,
        crops_dir=args.crops_dir,
        quarantine=args.quarantine,
        recognize_concurrency=(2, args.concurrency),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tesseract_recognize_ray")
    ap.add_argument("--docs", help="interleaved docs parquet file or directory")
    ap.add_argument("--media", required=True, help="media parquet file or directory")
    ap.add_argument("--xml", help="PAGE XML parquet (doc_id, xml), or '-' to read ONE XML document "
                    "from stdin (reference stdin path): the re-recognition entry point (§3.2)")
    ap.add_argument("--inplace", action="store_true",
                    help="with --xml: write the UPDATED XML documents (H2 write-back) instead of flat rows")
    ap.add_argument("--selection-level", choices=["region", "line", "word"], default="region",
                    help="with --xml: element type to re-recognize (node-level PSM rules apply)")
    ap.add_argument("--psm", type=int, default=3)
    ap.add_argument("--image", default=None,
                    help="with --xml: media_ref override replacing the XML imageFilename (reference --image)")
    ap.add_argument("-o", "--output", required=True, help="output directory (partitioned parquet)")
    ap.add_argument("--format", choices=["spans", "pagexml"], default="spans")
    ap.add_argument("--layout-level", choices=["region", "line", "word", "glyph"], default="line")
    ap.add_argument("--text-levels", default="", help="comma list, e.g. region,line (M3)")
    ap.add_argument("--only-layout", action="store_true")
    ap.add_argument("--pages", default=None, help='page selection, e.g. "0,2-4" (S2)')
    ap.add_argument("--save-crops", action="store_true")
    ap.add_argument("--crops-dir", default="/tmp/trr_crops")
    ap.add_argument("--quarantine", action="store_true", help="bad media -> error rows, not abort")
    ap.add_argument("--resume-sharded", action="store_true",
                    help="file-aligned resumable run (docs/media must be matching shard dirs)")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    ap.add_argument("--concurrency", type=int, default=None, help="max recognizer actors")
    args = ap.parse_args(argv)
    if args.docs is None and args.xml is None:
        ap.error("one of --docs or --xml is required")
    if args.concurrency is None:
        args.concurrency = max(2, min(args.num_cpus - 2, 16))

    os.environ.setdefault("RAY_worker_niceness", "0")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    try:
        cfg = build_config(args)
        if args.resume_sharded:
            from .pipelines.runner import run_partitioned_sharded

            res = run_partitioned_sharded(args.docs, args.media, args.output, cfg)
            print(f"ran={len(res['ran'])} skipped={len(res['skipped'])} -> {args.output}", file=sys.stderr)
            return 0 if (res["ran"] or res["skipped"]) else 1
        if args.xml:
            from .pipelines.rerecognize import rerecognize_inplace, rerecognize_pagexml

            xml_ds = _xml_dataset(args.xml)
            fn = rerecognize_inplace if args.inplace else rerecognize_pagexml
            ds = fn(xml_ds, args.media, cfg, level=args.selection_level, image_override=args.image)
            return 0 if _write_and_count(ds, args.output) > 0 else 1
        if args.format == "pagexml":
            from .pagexml import extract_pagexml

            ds = extract_pagexml(args.docs, args.media, cfg)
        else:
            from .pipelines.extract import extract_spans

            ds = extract_spans(args.docs, args.media, cfg)
        return 0 if _write_and_count(ds, args.output) > 0 else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
