"""Fused media-path source: read → decode → segment → recognize in ONE
actor-pool stage over parquet file splits.

Why this exists (the 100 TB shape): the media table's pixel payload is 10-50x
the size of every other column put together. A pipeline that materializes
pixels at each stage boundary (read block -> decode block -> segment block)
pushes the whole payload through the object store several times — at
cluster scale that is pure cross-node traffic, and even single-node it is
bounded by shared-memory copy bandwidth, not compute (measured here:
~0.5 GB/s effective vs ~20x less data after recognition). Fusing the media
path into one operator means pixels live only inside the task: what reaches
the object store is recognized LINE TEXT rows — a ~100x payload reduction at
the first boundary (the same reason the reference holds exactly one page
raster in memory at a time, `/root/reference/tesseract-recognize.cc:540-548,790`).

The stage is a callable CLASS for ``map_batches(..., concurrency=(a,b))`` —
the warm-engine actor pool the north_star requires (template bank built once
per actor in ``__init__``, reference A1 `tesseract-recognize.cc:340-354`).
Inputs are (path, row_start, row_count) splits, so task granularity is
decoupled from file count; the generator body yields one output table per
row-chunk, keeping worker heap bounded by chunk size x page size (streaming,
never a whole file of rasters).
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import ocr_core as oc
from ..glyphs import GLYPH_PITCH
from tesseract_recognize_ray.imagecodecs import iter_page_images
from .recognize import REC_COLUMNS, REC_SCHEMA

MEDIA_COLUMNS = ["media_ref", "bytes", "kind", "n_pages"]


def media_splits(files: list[str], rows_per_split: int | None = None) -> list[dict]:
    """Work list of (path, row_start, row_count) splits. With
    rows_per_split=None, one split per parquet row group (the natural unit of
    parquet IO — row-group pruning reads only that byte range)."""
    out = []
    for f in sorted(files):
        md = pq.read_metadata(f)
        if rows_per_split is None:
            start = 0
            for rg in range(md.num_row_groups):
                n = md.row_group(rg).num_rows
                out.append({"path": f, "row_start": start, "row_count": n})
                start += n
        else:
            for s in range(0, md.num_rows, rows_per_split):
                out.append(
                    {"path": f, "row_start": s, "row_count": min(rows_per_split, md.num_rows - s)}
                )
    return out


def media_splits_by_cost(files: list[str], n_splits: int) -> list[dict]:
    """Cost-balanced work list (SURVEY.md §4 skew): split budgets are set by
    serialized BYTES, the metadata-only proxy for pixel cost (est_cost =
    w*h; compressed page bytes scale with it). A file of 2400x1600 pads gets
    proportionally more, smaller splits than a file of thumbnails — without
    reading a single payload byte. Uniform per-row cost is assumed WITHIN a
    file (rows in one shard share a generator distribution); cross-file skew
    is what actually hurts task balance."""
    metas = []
    total_bytes = 0
    for f in sorted(files):
        md = pq.read_metadata(f)
        b = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
        metas.append((f, md.num_rows, b))
        total_bytes += b
    target = max(1, total_bytes // max(1, n_splits))
    out = []
    for f, rows, b in metas:
        n_f = max(1, round(b / target))
        per = max(1, -(-rows // n_f))  # ceil
        for s in range(0, rows, per):
            out.append({"path": f, "row_start": s, "row_count": min(per, rows - s)})
    return out


def media_splits_by_pixel_cost(files: list[str], n_splits: int) -> list[dict]:
    """EXACT pixel-cost split planning (the north_star's "explicit
    repartitioning by estimated pixel-count cost"): the media table carries
    width/height columns, so per-row cost = w*h*n_pages is a cheap COLUMN
    read — no payload bytes move at planning time. Split boundaries cut
    each file's prefix-sum of row costs into equal-cost ranges, so a run of
    2400x1600 pads lands in many short splits while a thumbnail run shares
    one — row-level balancing where media_splits_by_cost (byte proxy,
    uniform-within-file assumption) can only balance across files. Falls
    back to the byte planner for files missing the dimension columns."""
    per_file = []
    total = 0.0
    for f in sorted(files):
        md = pq.read_metadata(f)
        names = md.schema.names
        if not {"width", "height", "n_pages"} <= set(names):
            return media_splits_by_cost(files, n_splits)
        t = pq.read_table(f, columns=["width", "height", "n_pages"])
        cost = (
            t.column("width").to_numpy().astype(np.float64)
            * t.column("height").to_numpy().astype(np.float64)
            * np.maximum(t.column("n_pages").to_numpy().astype(np.float64), 1.0)
        )
        per_file.append((f, cost))
        total += float(cost.sum())
    target = max(total / max(1, n_splits), 1.0)
    out = []
    for f, cost in per_file:
        csum = np.cumsum(cost)
        start = 0
        acc0 = 0.0
        for i in range(len(cost)):
            if csum[i] - acc0 >= target and i + 1 > start:
                out.append({"path": f, "row_start": start, "row_count": i + 1 - start})
                start, acc0 = i + 1, float(csum[i])
        if start < len(cost):
            out.append({"path": f, "row_start": start, "row_count": len(cost) - start})
    return out


class MediaPathReader:
    """read+decode+segment+recognize for one split, pixels never leaving the
    task. __init__ = once-per-actor state (A1); __call__ = generator over
    row-chunks of the split."""

    def __init__(
        self,
        page_set: list[int] | None = None,
        only_layout: bool = False,
        emit_words: bool = False,
        emit_glyphs: bool = False,
        save_crops_dir: str | None = None,
        rows_per_chunk: int = 16,
        quarantine: bool = False,
        ref_filter=None,
        density: int = 300,
    ):
        # once-per-actor state: template bank tables (the warm engine, A1)
        self.bank_exact = oc._EXACT
        self.bank_by_width = oc._BY_WIDTH
        self.pset = set(page_set) if page_set is not None else None
        # --density render dpi for vector-content PDFs (reference
        # tesseract-recognize.cc:45,108,132; config.PipelineConfig.density)
        self.density = density
        self.only_layout = only_layout
        self.emit_words = emit_words
        self.emit_glyphs = emit_glyphs
        self.save_crops_dir = save_crops_dir
        self.rows_per_chunk = rows_per_chunk
        # poison-row quarantine (SURVEY.md §4): with quarantine=True a media
        # row whose decode/segment/recognize raises becomes ONE error row
        # (level="error", text=exception) instead of aborting the job — a
        # deliberate deviation from the reference's abort-on-failure
        # (tesseract-recognize.cc:412,461,517,545), which at 10^12-doc scale
        # would let one corrupt blob kill a cluster-day of work. Default
        # False = reference semantics (fail fast).
        self.quarantine = quarantine
        # optional media_ref subset (ObjectRef of a set, ray.get ONCE per
        # actor): the partitioned runner restricts each partition to its own
        # docs' media without a separate filter stage shipping pixel rows
        if ref_filter is not None:
            import ray

            refs = ray.get(ref_filter) if not isinstance(ref_filter, (set, frozenset)) else ref_filter
            self.refs = pa.array(sorted(refs), pa.string())
        else:
            self.refs = None
        self._crop_n = 0

    def _run_chunk(self, chunk: pa.Table) -> pa.Table:
        """decode+segment+recognize for one arrow chunk of media rows, with
        zero page-sized temporaries beyond the projection pass: pixel blobs
        are viewed in place (scalar.as_buffer), projections run straight off
        uint8 (ocr_core.analyse_orientation_u8), only line crops materialize.
        Output = recognized line rows (REC_SCHEMA, no pixels)."""
        col_ref = chunk.column("media_ref")
        col_bytes = chunk.column("bytes")
        col_np = chunk.column("n_pages")
        out: dict[str, list] = {k: [] for k in REC_COLUMNS}

        def emit(ref, page, n_pages, block, para, line, word, level, x0, y0, x1, y1, by, s, k_up, pw, ph, text, conf):
            out["media_ref"].append(ref)
            out["page"].append(page)
            out["n_pages"].append(n_pages)
            out["block"].append(block)
            out["para"].append(para)
            out["line"].append(line)
            out["word"].append(word)
            out["level"].append(level)
            out["x0"].append(x0)
            out["y0"].append(y0)
            out["x1"].append(x1)
            out["y1"].append(y1)
            out["baseline_y"].append(by)
            out["scale"].append(s)
            out["orientation_k"].append(k_up)
            out["page_w"].append(pw)
            out["page_h"].append(ph)
            out["text"].append(text)
            out["conf"].append(conf)

        for i in range(chunk.num_rows):
            ref = col_ref[i].as_py()
            n_pages = col_np[i].as_py()
            try:
                buf = memoryview(col_bytes[i].as_buffer())
                self._process_media(emit, ref, n_pages, buf)
            except Exception as e:  # noqa: BLE001
                if not self.quarantine:
                    raise
                emit(ref, -1, n_pages, -1, -1, -1, -1, "error",
                     0, 0, 0, 0, 0, 0, 0, 0, 0, f"{type(e).__name__}: {e}", None)
        return pa.Table.from_pydict(
            {f.name: pa.array(out[f.name], f.type) for f in REC_SCHEMA}
        )

    def _process_media(self, emit, ref: str, n_pages: int, buf: memoryview) -> None:
        seen = 0
        # magic-byte dispatch (PNG / uncompressed TIFF / raw fixture blobs):
        # raw pages stay zero-copy frombuffer views; encoded formats decode
        # once per page here, inside the actor (imagecodecs module docstring).
        # PDFs come in three classes: scanned (image-wrapped -> unwrap+OCR
        # below), born-digital (text layer -> extracted exactly, no OCR)
        # and vector-drawn (paths only -> rasterize at --density + OCR).
        # The image route rejects non-image PDFs BEFORE yielding any page,
        # so a first-page probe cleanly cascades text-layer -> vector —
        # the reference ghostscript-renders all three identically
        # (tesseract-recognize.cc:490-511); extracting the text layer
        # directly is exact and skips OCR entirely.
        pages = iter_page_images(buf)
        try:
            first = next(pages, None)
        except ValueError:
            if bytes(buf[:4]) == b"%PDF":
                if self._emit_pdf_text_layer(emit, ref, n_pages, buf):
                    return
                # third PDF class: vector-DRAWN content (outlined text,
                # filled paths) — no image wrapper, no extractable text
                # layer. Rasterize at --density dpi and OCR the pixels,
                # which is the reference's route for EVERY pdf
                # (tesseract-recognize.cc:490-511).
                if self._emit_pdf_vector(emit, ref, n_pages, buf):
                    return
            raise
        if first is None:
            pages = iter(())
        else:
            pages = itertools.chain([first], pages)
        for p, img in pages:
            seen += 1
            if self.pset is not None and p not in self.pset:
                continue
            self._ocr_page(emit, ref, p, n_pages, img)
        if self.pset is not None and max(self.pset, default=-1) >= seen:
            raise ValueError(
                f"page selection {sorted(self.pset)} out of range for {ref} "
                f"({seen} pages); reference errors likewise "
                "(tesseract-recognize.cc:461-466)"
            )

    def _emit_pdf_vector(self, emit, ref: str, n_pages: int, buf: memoryview) -> bool:
        """Vector-content PDF path: render each page at self.density dpi
        (pdfcodec.rasterize_pdf_pages) and run the rendered pixels through
        the SAME segment+recognize path as decoded images. Returns False
        (caller re-raises the image route's error) when the PDF paints no
        ink anywhere — a blank render must quarantine, not emit silence."""
        from tesseract_recognize_ray.pdfcodec import rasterize_pdf_pages

        try:
            page_imgs = rasterize_pdf_pages(buf, dpi=self.density)
        except ValueError:
            return False
        for p, img in enumerate(page_imgs):
            if self.pset is not None and p not in self.pset:
                continue
            self._ocr_page(emit, ref, p, n_pages, img)
        if self.pset is not None and max(self.pset, default=-1) >= len(page_imgs):
            raise ValueError(
                f"page selection {sorted(self.pset)} out of range for {ref} "
                f"({len(page_imgs)} pages); reference errors likewise "
                "(tesseract-recognize.cc:461-466)"
            )
        return True

    def _ocr_page(self, emit, ref: str, p: int, n_pages: int, img) -> None:
        """Segment + recognize one decoded page image (shared by the image
        route and the vector-PDF rasterize route)."""
        k_up, s, bands = oc.analyse_orientation_u8(img)
        up = np.rot90(img, k_up) if k_up else img
        for b in bands:
            crop_ink = up[b.y0 : b.y1, b.x0 : b.x1] < oc.BIN_THRESHOLD
            if self.save_crops_dir:
                self._save_crop(ref, p, b, crop_ink)
            if self.only_layout:
                text, conf = None, None
            else:
                text, conf = oc.recognize_line(crop_ink, s)
            emit(ref, p, n_pages, b.block, 0, b.line, -1, "line",
                 b.x0, b.y0, b.x1, b.y1, b.y1, s, k_up, up.shape[1], up.shape[0], text, conf)
            if self.emit_words and text:
                pos = 0
                for w_idx, word in enumerate(text.split(" ")):
                    if word:
                        wx0 = b.x0 + pos * GLYPH_PITCH * s
                        wx1 = wx0 + len(word) * GLYPH_PITCH * s - s
                        emit(ref, p, n_pages, b.block, 0, b.line, w_idx, "word",
                             wx0, b.y0, wx1, b.y1, b.y1, s, k_up, up.shape[1], up.shape[0], word, conf)
                    pos += len(word) + 1
            if self.emit_glyphs and not self.only_layout:
                # RIL_SYMBOL depth (reference :758-788): one row per
                # glyph, band-local coords translated to page space
                for g_idx, (ch, gconf, gx0, gx1) in enumerate(
                    oc.recognize_line_glyphs(crop_ink, s)
                ):
                    emit(ref, p, n_pages, b.block, 0, b.line, g_idx, "glyph",
                         b.x0 + gx0, b.y0, b.x0 + gx1, b.y1, b.y1, s, k_up, up.shape[1], up.shape[0], ch, gconf)

    def _emit_pdf_text_layer(self, emit, ref: str, n_pages: int, buf: memoryview) -> bool:
        """Born-digital PDF path: emit one 'line' row per embedded text span
        in (-y, x) reading order, conf 100.0 (the layer is exact, not
        recognized). Coordinates map PDF bottom-left user space to the
        top-down pixel convention (y0 = page_h - y - size); x1 is a
        0.5*size-per-char advance ESTIMATE — widths need font metrics the
        simple-font subset doesn't carry. Returns False (caller re-raises
        the rasterizer's error) when the text layer is absent or itself
        unsupported (e.g. /Type0 fonts). Honors the page set with the same
        out-of-range contract as the OCR path; word rows are not emitted
        (no glyph grid to derive word cells from)."""
        from tesseract_recognize_ray.pdfcodec import iter_pdf_page_text

        try:
            text_pages = list(iter_pdf_page_text(buf, with_boxes=True))
        except ValueError:
            return False
        if not any(spans for spans, _box in text_pages):
            return False
        for p, (spans, (pw, ph)) in enumerate(text_pages):
            if self.pset is not None and p not in self.pset:
                continue
            for idx, s in enumerate(spans):
                x0 = int(round(s["x"]))
                y1 = int(round(ph - s["y"]))
                y0 = int(round(ph - s["y"] - s["size"]))
                x1 = x0 + int(round(0.5 * s["size"] * len(s["text"])))
                text = None if self.only_layout else s["text"]
                conf = None if self.only_layout else 100.0
                emit(ref, p, n_pages, 0, 0, idx, -1, "line",
                     x0, y0, x1, y1, y1, 1, 0, int(round(pw)), int(round(ph)),
                     text, conf)
        if self.pset is not None and max(self.pset, default=-1) >= len(text_pages):
            raise ValueError(
                f"page selection {sorted(self.pset)} out of range for {ref} "
                f"({len(text_pages)} pages); reference errors likewise "
                "(tesseract-recognize.cc:461-466)"
            )
        return True

    def _save_crop(self, ref: str, page: int, b, crop_ink: np.ndarray) -> None:
        """K3 --save-crops debug sink (tesseract-recognize.cc:48,551-555)."""
        os.makedirs(self.save_crops_dir, exist_ok=True)
        h, w = crop_ink.shape
        blob = (
            np.uint32(w).tobytes() + np.uint32(h).tobytes()
            + (np.where(crop_ink, 0, 255).astype(np.uint8)).tobytes()
        )
        name = f"crop_{self._crop_n}_{ref}_p{page}_b{b.block}_l{b.line}.bin"
        with open(os.path.join(self.save_crops_dir, name), "wb") as f:
            f.write(blob)
        self._crop_n += 1

    def __call__(self, batch: pa.Table):
        for path, start, count in zip(
            batch.column("path").to_pylist(),
            batch.column("row_start").to_pylist(),
            batch.column("row_count").to_pylist(),
        ):
            pf = pq.ParquetFile(path)
            # iter_batches streams pages lazily, single-threaded by design —
            # the actor pool provides the parallelism; per-task arrow thread
            # fans (use_threads=True) thrash at pool width (measured 20x)
            done = 0
            for rb in pf.iter_batches(batch_size=self.rows_per_chunk, columns=MEDIA_COLUMNS):
                lo, hi = done, done + rb.num_rows
                done = hi
                if lo >= start + count:
                    break
                s, e = max(lo, start), min(hi, start + count)
                if s < e:
                    chunk = pa.Table.from_batches([rb]).slice(s - lo, e - s)
                    if self.refs is not None:
                        import pyarrow.compute as pc

                        chunk = chunk.filter(
                            pc.is_in(chunk.column("media_ref"), value_set=self.refs)
                        )
                        if chunk.num_rows == 0:
                            continue
                    yield self._run_chunk(chunk)


def recognized_lines_from_files(
    files: list[str],
    cfg,
    rows_per_split: int | None = None,
    min_splits: int = 64,
    splits: list[dict] | None = None,
    ref_filter=None,
):
    """Dataset of recognized line rows from media parquet files, via the
    fused source. cfg is a PipelineConfig.

    Split granularity: per row group when the file set already yields enough
    splits to keep the pool busy, otherwise re-split by row ranges so a
    single big file (or few files) still fans out (min_splits ~ 4x the max
    pool size keeps stragglers short without per-task overhead dominating)."""
    import ray.data as rd

    from ..idscheme import parse_pages_set

    if splits is None:
        splits = media_splits(files, rows_per_split)
        if rows_per_split is None and len(splits) < min_splits:
            # few large files: re-split with exact pixel-cost budgets (row-
            # level prefix-sum cuts; §4 skew) so one big-page shard doesn't
            # become the straggler — byte-proxy fallback inside the planner
            splits = media_splits_by_pixel_cost(files, min_splits)
    if not splits:
        return rd.from_arrow(
            pa.Table.from_pydict({f.name: pa.array([], f.type) for f in REC_SCHEMA})
        )
    src = rd.from_items(splits)
    return src.map_batches(
        MediaPathReader,
        fn_constructor_kwargs={
            "page_set": parse_pages_set(cfg.page_set) if cfg.page_set else None,
            "only_layout": cfg.only_layout,
            "emit_words": cfg.layout_level in ("word", "glyph"),
            "emit_glyphs": cfg.layout_level == "glyph",
            "save_crops_dir": cfg.crops_dir if cfg.save_crops else None,
            "rows_per_chunk": cfg.decode_batch_size,
            "quarantine": cfg.quarantine,
            "density": cfg.density,
            "ref_filter": ref_filter,
        },
        batch_size=1,
        batch_format="pyarrow",
        concurrency=cfg.recognize_concurrency,
        num_cpus=1,
    )
