"""Seeded synthetic corpus generator — the conformance oracle (SURVEY.md §5).

The reference ships zero tests/goldens (SURVEY.md §0), so correctness is
anchored on a deterministic corpus rendered from the closed glyph bank in
``glyphs.py``: ground-truth region/line text, reading order, coords and ids
are recorded *at render time* into ``golden_spans`` — playing the role of
"the reference's own example-image Page XML outputs" demanded by the
north_star invariant (per-doc span-sequence equality on
(kind, text, media_ref, order)).

Tables produced (FIXTURES.md; all seeded, byte-stable across runs):

  docs   : doc_id:string, spans:list<struct<kind,text,media_ref,offset:int32>>
           -- exactly BASELINE.json:input_hint
  media  : media_ref, bytes:large_binary, width, height, kind, n_pages
  golden_spans : doc_id, seq, kind, text, media_ref, order, region_id,
                 line_id  -- final reading-order output per doc
  golden_layout: per-line debug coords/baselines (unit tests only)

Raster encoding (no PIL/cv2 in env): per page, 8-byte header
(width:uint32le, height:uint32le) + width*height uint8 row-major grayscale,
255=white, 0=ink. Multi-page media ("tiff_multi"/"pdf" kinds, reference S2/S3,
`/root/reference/tesseract-recognize.cc:455-511`) concatenate page blobs.

Geometry constants (segmentation relies on the *relative* structure, not the
exact values; thresholds derived in stages/segment.py):
  scale s in {2,3,4} per page; glyph cell 5s x 7s; pitch 6s; line box
  stride 13s (7s ink + 6s leading); inter-region gap 28s; margin 6s.
Every rendered line starts with an alphanumeric word, so each line's ink
band is exactly 7s tall (glyphs.py invariant) — this pins the scale
estimate s = band_height // 7 used by the segmenter.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .glyphs import GLYPH_PITCH, GLYPH_W, ALNUM, scaled_glyph
from .idscheme import line_id as make_line_id
from .idscheme import region_id as make_region_id

SEED = 42

# vocabulary drawn from the closed alphabet (A-Z 0-9 . , - space)
_WORDS = (
    "THE QUICK BROWN FOX JUMPS OVER A LAZY DOG AND RUNS FAR AWAY INTO "
    "GREEN HILLS WHERE 7 RED BIRDS SING 42 SONGS AT DAWN WHILE OLD SHIPS "
    "SAIL NORTH PAST TALL CLIFFS UNDER PALE STARS EVERY NIGHT UNTIL DAY "
    "BREAKS ON COLD STONE TOWERS NEAR DEEP BLUE LAKES FULL OF SILVER FISH"
).split()

LINE_STRIDE = 13  # logical px between line box tops (x scale s)
REGION_GAP = 28  # logical px blank between regions (x scale s)
MARGIN = 6  # logical px page margin (x scale s)
INK_H = 7  # glyph ink rows


def encode_raster(img: np.ndarray) -> bytes:
    """8-byte (w,h) uint32le header + row-major uint8 pixels."""
    h, w = img.shape
    return (
        np.uint32(w).tobytes() + np.uint32(h).tobytes() + img.astype(np.uint8).tobytes()
    )


def decode_raster(buf: bytes) -> np.ndarray:
    """Inverse of encode_raster (used by stages/decode.py; ~zero-copy)."""
    w = int(np.frombuffer(buf, dtype=np.uint32, count=1, offset=0)[0])
    h = int(np.frombuffer(buf, dtype=np.uint32, count=1, offset=4)[0])
    return np.frombuffer(buf, dtype=np.uint8, offset=8, count=w * h).reshape(h, w)


def split_pages(buf: bytes) -> list[bytes]:
    """Split a concatenated multi-page blob into per-page blobs."""
    out, off = [], 0
    view = memoryview(buf)
    while off < len(buf):
        w = int(np.frombuffer(view, dtype=np.uint32, count=1, offset=off)[0])
        h = int(np.frombuffer(view, dtype=np.uint32, count=1, offset=off + 4)[0])
        n = 8 + w * h
        out.append(bytes(view[off : off + n]))
        off += n
    return out


@dataclass
class RenderedLine:
    region: int  # 0-based block index on the page
    line: int  # 0-based line index within region
    text: str
    x0: int
    y0: int
    x1: int
    y1: int  # ink bbox [x0,x1) x [y0,y1) in page coords
    baseline_y: int  # bottom ink row + 1


@dataclass
class RenderedPage:
    img: np.ndarray
    scale: int
    rotation_k: int  # page stored rotated by np.rot90(img, k)
    lines: list[RenderedLine] = field(default_factory=list)


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    ws = []
    for i in range(n_words):
        w = _WORDS[rng.integers(0, len(_WORDS))]
        if i < n_words - 1 and rng.random() < 0.12:
            w += ","
        ws.append(w)
    s = " ".join(ws)
    r = rng.random()
    if r < 0.55:
        s += "."
    elif r < 0.65:
        s += " - " + _WORDS[rng.integers(0, len(_WORDS))]
    return s


def render_page(
    rng: np.random.Generator,
    n_regions: int | None = None,
    rotate: bool | None = None,
    pad_to: tuple[int, int] | None = None,
) -> RenderedPage:
    """Render one page; every line starts with an alnum word (see module doc)."""
    s = int(rng.choice([2, 3, 4]))
    if n_regions is None:
        n_regions = 1 if rng.random() < 0.55 else 2
    regions: list[list[str]] = []
    for _ in range(n_regions):
        n_lines = int(rng.integers(1, 6))
        regions.append([_sentence(rng, int(rng.integers(2, 7))) for _ in range(n_lines)])

    margin = MARGIN * s
    max_chars = max(len(t) for reg in regions for t in reg)
    width = 2 * margin + max_chars * GLYPH_PITCH * s - s
    total_lines = sum(len(r) for r in regions)
    height = (
        2 * margin
        + total_lines * LINE_STRIDE * s
        - (LINE_STRIDE - INK_H) * s  # last line needs only its ink rows
        + (n_regions - 1) * REGION_GAP * s
    )
    # optional extra whitespace padding to diversify pixel cost (skew exercise)
    if pad_to is not None:
        width, height = max(width, pad_to[0]), max(height, pad_to[1])

    img = np.full((height, width), 255, dtype=np.uint8)
    page = RenderedPage(img=img, scale=s, rotation_k=0)
    y = margin
    for ri, reg in enumerate(regions):
        for li, text in enumerate(reg):
            assert text[0] in ALNUM, text
            x = margin
            for ch in text:
                if ch != " ":
                    g = scaled_glyph(ch, s)
                    img[y : y + INK_H * s, x : x + GLYPH_W * s][g] = 0
                x += GLYPH_PITCH * s
            page.lines.append(
                RenderedLine(
                    region=ri,
                    line=li,
                    text=text,
                    x0=margin,
                    y0=y,
                    x1=margin + len(text) * GLYPH_PITCH * s - s,
                    y1=y + INK_H * s,
                    baseline_y=y + INK_H * s,
                )
            )
            y += LINE_STRIDE * s
        y += REGION_GAP * s - (LINE_STRIDE - INK_H) * s
    if rotate is None:
        rotate = rng.random() < 0.05
    if rotate:
        page.rotation_k = int(rng.integers(1, 4))
        page.img = np.ascontiguousarray(np.rot90(img, page.rotation_k))
    return page


def _doc_span_plan(rng: np.random.Generator, i: int) -> list[str]:
    """Span kinds for doc i; forced degenerate cases at fixed indices."""
    if i == 0:
        return []
    if i == 1:
        return ["text", "text"]
    if i == 2:
        return ["media"]
    if i == 3:
        return ["text", "media"] * 4
    n = int(rng.integers(1, 9))
    return ["text" if rng.random() < 0.6 else "media" for _ in range(n)]


def build_tables(
    rng: np.random.Generator,
    start: int,
    n_docs: int,
    multipage_frac: float = 0.07,
    rotate_frac: float = 0.05,
    media_encoding: str = "raw",
) -> dict[str, pa.Table]:
    """Render docs [start, start+n_docs) into the four corpus tables.
    Deterministic given (rng state, start, n_docs) — the unit of work for
    both the sequential generator and the Ray-sharded one.

    media_encoding: payload format for the media `bytes` column —
      "raw"   (default) 8-byte-header fixture blobs (byte-identical to the
              pre-codec corpora);
      "png"   single-page media as real PNG, multi-page as uncompressed
              TIFF (PNG has no pages);
      "tiff"  everything as uncompressed TIFF (single- or multi-IFD);
      "jpeg"  single-page media as baseline JPEG q95 (mode drawn among
              gray / ycbcr444 / ycbcr420 to exercise every decode path;
              lossless-for-binarization on the bilevel glyph pages, so
              golden spans still hold), multi-page as TIFF (JPEG has no
              page chain);
      "jpeg_progressive"  like "jpeg" but SOF2 progressive scans (drawn
              mode + drawn restart interval), exercising the Annex-G
              DC/AC first+refine decode paths end-to-end;
      "png_adam7"  like "png" but Adam7-interlaced;
      "tiff_lzw"  TIFF with drawn compression (LZW / Deflate / PackBits),
              drawn predictor-2 differencing and drawn multi-strip layout;
      "tiff_jpeg"  JPEG-in-TIFF (compression 7, TIFF6 TechNote 2): q95
              JPEG strips with drawn multi-strip layout and drawn shared
              JPEGTables-tag factoring (abbreviated streams);
      "legacy"  drawn GIF (plain/interlaced) / BMP (bottom-up/top-down) /
              PNM (P5 or bilevel P4) per single-page media, TIFF for
              multi-page;
      "pdf"   image-wrapped scanned PDF (drawn FlateDecode / DCTDecode),
              natively multi-page via the /Kids page tree;
      "pdf_text"  born-digital text PDFs — no raster at all; the payload
              is the embedded text layer (Helvetica Tj lines), golden
              truth is the generated lines (region 0, line j per page);
              exercises the media source's text-layer route end-to-end;
      "pdf_text_type0"  like "pdf_text" but through a composite /Type0
              /Identity-H font with subset-style CIDs + /ToUnicode CMap
              (pdfcodec.encode_pdf_text_type0) — the real-world
              born-digital class; exercises the CID decode path
              end-to-end with the same golden truth;
      "pdf_objstm"  PDF 1.5+ COMPRESSED layout: the scanned-PDF class
              repacked via pdfcodec.repack_pdf_objstm — non-stream objects
              inside a /Type /ObjStm, cross-reference STREAM (drawn
              predictor 1 / 12), no classic trailer; exercises the
              object-stream expansion + XRef-root discovery;
      "pdf_vector"  DRAWN PDFs: each page's ink as filled paths (re +
              m/l/h polygons + q/cm translations) in a 1-unit-=-1-px user
              space — no raster stream, no text layer; readable only via
              the rasterize-at-density route (pdfcodec.rasterize_pdf_pages,
              bit-exact at any density that is an integer multiple of 72);
      "webp"  lossless VP8L WebP per single-page media, drawn across the
              transform/coding paths (plain / subtract-green+cache /
              predictor / palette / meta-prefix+VP8X), TIFF for
              multi-page (WebP is single-frame without ANIM);
      "mixed" deterministic per-media rng choice among the four
              single-draw encodings (raw/png/tiff/jpeg).
    Decode dispatch is on magic bytes (imagecodecs.iter_page_images), so
    golden spans are encoding-independent."""
    doc_ids: list[str] = []
    doc_spans: list[list[dict]] = []
    media_rows = {"media_ref": [], "bytes": [], "width": [], "height": [], "kind": [], "n_pages": []}
    g = {k: [] for k in ("doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id")}
    lay = {k: [] for k in ("media_ref", "page", "region", "line", "x0", "y0", "x1", "y1", "baseline_y", "scale", "rotation_k", "text")}

    for i in range(start, start + n_docs):
        doc_id = f"doc-{i:08d}"
        kinds = _doc_span_plan(rng, i)
        spans: list[dict] = []
        golden: list[tuple] = []  # (order, page, region, line, kind, text, media_ref, rid, lid)
        offset = 0
        mj = 0
        for kind in kinds:
            if kind == "text":
                text = _sentence(rng, int(rng.integers(2, 8)))
                spans.append({"kind": "text", "text": text, "media_ref": None, "offset": offset})
                golden.append((offset, -1, -1, -1, "text", text, None, None, None))
                offset += len(text)
            else:
                media_ref = f"m-{i:08d}-{mj:04d}"
                mj += 1
                multi = rng.random() < multipage_frac
                n_pages = int(rng.integers(2, 4)) if multi else 1
                mkind = "tiff_multi" if multi else "page"
                if media_encoding in ("pdf_text", "pdf_text_type0"):
                    # born-digital media: the payload IS a text layer (no
                    # raster at all) — the golden truth is the generated
                    # lines themselves, region 0 / line j per page in the
                    # writer's reading order, which is exactly what the
                    # media source's text-layer route must reproduce
                    from tesseract_recognize_ray.pdfcodec import (
                        encode_pdf_text,
                        encode_pdf_text_type0,
                    )

                    enc_text = (
                        encode_pdf_text_type0
                        if media_encoding == "pdf_text_type0"
                        else encode_pdf_text
                    )

                    pages_lines = []
                    for p in range(n_pages):
                        lines = [
                            _sentence(rng, int(rng.integers(2, 7)))
                            for _ in range(int(rng.integers(2, 6)))
                        ]
                        pages_lines.append(lines)
                        for j, text in enumerate(lines):
                            rid = make_region_id(0, page=p, n_pages=n_pages)
                            lid = make_line_id(rid, para=0, line=j)
                            golden.append((offset, p, 0, j, "text", text, media_ref, rid, lid))
                    media_rows["media_ref"].append(media_ref)
                    media_rows["bytes"].append(enc_text(pages_lines))
                    media_rows["width"].append(612)
                    media_rows["height"].append(792 * n_pages)
                    media_rows["kind"].append("pdf")
                    media_rows["n_pages"].append(n_pages)
                    spans.append({"kind": "media", "text": None, "media_ref": media_ref, "offset": offset})
                    offset += 1
                    continue
                if not multi and rng.random() < 0.15:
                    mkind = "pdf"  # same raster encoding; exercises kind dispatch (M1)
                blobs, page_imgs, tot_h, max_w = [], [], 0, 0
                pad = None
                if rng.random() < 0.3:  # skewed size distribution (FIXTURES.md §2)
                    pad = (
                        int(np.exp(rng.uniform(np.log(160), np.log(2400)))),
                        int(np.exp(rng.uniform(np.log(120), np.log(1600)))),
                    )
                for p in range(n_pages):
                    pg = render_page(rng, rotate=(rng.random() < rotate_frac), pad_to=pad if p == 0 else None)
                    blobs.append(encode_raster(pg.img))
                    page_imgs.append(pg.img)
                    ph, pw = pg.img.shape
                    tot_h += ph
                    max_w = max(max_w, pw)
                    for ln in pg.lines:
                        rid = make_region_id(ln.region, page=p, n_pages=n_pages)
                        lid = make_line_id(rid, para=0, line=ln.line)
                        golden.append((offset, p, ln.region, ln.line, "text", ln.text, media_ref, rid, lid))
                        lay["media_ref"].append(media_ref)
                        lay["page"].append(p)
                        lay["region"].append(ln.region)
                        lay["line"].append(ln.line)
                        lay["x0"].append(ln.x0)
                        lay["y0"].append(ln.y0)
                        lay["x1"].append(ln.x1)
                        lay["y1"].append(ln.y1)
                        lay["baseline_y"].append(ln.baseline_y)
                        lay["scale"].append(pg.scale)
                        lay["rotation_k"].append(pg.rotation_k)
                        lay["text"].append(ln.text)
                enc = media_encoding
                if enc == "mixed":  # rng draw only on non-raw corpora: keeps
                    # the default corpora byte-identical to pre-codec rounds
                    enc = ("raw", "png", "tiff", "jpeg")[int(rng.integers(0, 4))]
                if enc in ("jpeg", "jpeg_progressive"):
                    if n_pages == 1:
                        from tesseract_recognize_ray.jpegcodec import encode_jpeg_gray

                        mode = ("gray", "ycbcr444", "ycbcr420")[int(rng.integers(0, 3))]
                        if enc == "jpeg_progressive":
                            ri = (0, 2, 5)[int(rng.integers(0, 3))]
                            payload = encode_jpeg_gray(
                                page_imgs[0], quality=95, mode=mode,
                                progressive=True, restart_interval=ri,
                            )
                        else:
                            payload = encode_jpeg_gray(page_imgs[0], quality=95, mode=mode)
                    else:
                        from tesseract_recognize_ray.imagecodecs import encode_tiff_gray

                        payload = encode_tiff_gray(page_imgs)
                elif enc in ("png", "png_adam7"):
                    from tesseract_recognize_ray.imagecodecs import encode_png_gray, encode_tiff_gray

                    payload = (
                        encode_png_gray(page_imgs[0], interlace=enc == "png_adam7")
                        if n_pages == 1
                        else encode_tiff_gray(page_imgs)
                    )
                elif enc == "tiff":
                    from tesseract_recognize_ray.imagecodecs import encode_tiff_gray

                    payload = encode_tiff_gray(page_imgs)
                elif enc == "pdf":
                    from tesseract_recognize_ray.pdfcodec import encode_pdf_scanned

                    # flate is pixel-exact; dct (q95 gray JPEG) is lossless
                    # for binarization on the bilevel glyph pages (same
                    # argument as the jpeg corpus encoding)
                    payload = encode_pdf_scanned(
                        page_imgs,
                        image_filter=("flate", "dct")[int(rng.integers(0, 2))],
                    )
                elif enc == "webp":
                    if n_pages == 1:
                        from tesseract_recognize_ray.webpcodec import encode_webp_gray

                        # rotate through the transform/coding paths so the
                        # golden e2e exercises each decoder branch
                        pick = int(rng.integers(0, 5))
                        if pick == 0:
                            payload = encode_webp_gray(page_imgs[0])
                        elif pick == 1:
                            payload = encode_webp_gray(page_imgs[0], subtract_green=True, cache_bits=6)
                        elif pick == 2:
                            payload = encode_webp_gray(
                                page_imgs[0], predictor_mode=int(rng.integers(0, 14))
                            )
                        elif pick == 3 and len(np.unique(page_imgs[0])) <= 256:
                            payload = encode_webp_gray(page_imgs[0], palette=True)
                        else:
                            payload = encode_webp_gray(page_imgs[0], meta_groups=2, vp8x=True)
                    else:  # WebP has no multi-page form; page chains go TIFF
                        from tesseract_recognize_ray.imagecodecs import encode_tiff_gray

                        payload = encode_tiff_gray(page_imgs)
                elif enc == "legacy":
                    if n_pages == 1:
                        from tesseract_recognize_ray import legacycodecs as lcod

                        pick = int(rng.integers(0, 4))
                        if pick == 0:
                            payload = lcod.encode_gif_gray(
                                page_imgs[0], interlace=bool(rng.integers(0, 2))
                            )
                        elif pick == 1:
                            rle = bool(rng.integers(0, 2))
                            payload = lcod.encode_bmp_gray(
                                page_imgs[0],
                                # RLE bitmaps are bottom-up by spec
                                top_down=bool(rng.integers(0, 2)) and not rle,
                                rle=rle,
                            )
                        elif pick == 2:
                            payload = lcod.encode_pnm_gray(page_imgs[0])
                        else:  # bilevel P4: glyph pages are already 0/255
                            payload = lcod.encode_pnm_gray(page_imgs[0], bilevel=True)
                    else:  # no legacy format carries a page chain
                        from tesseract_recognize_ray.imagecodecs import encode_tiff_gray

                        payload = encode_tiff_gray(page_imgs)
                elif enc == "pdf_objstm":
                    from tesseract_recognize_ray.pdfcodec import (
                        encode_pdf_scanned,
                        repack_pdf_objstm,
                    )

                    # PDF 1.5 compressed layout: the scanned class repacked
                    # into ObjStm members + an xref STREAM (no trailer) —
                    # the post-2005 on-disk norm
                    payload = repack_pdf_objstm(
                        encode_pdf_scanned(
                            page_imgs,
                            image_filter=("flate", "dct")[int(rng.integers(0, 2))],
                        ),
                        xref_predictor=(1, 12)[int(rng.integers(0, 2))],
                    )
                    mkind = "pdf"
                elif enc == "pdf_vector":
                    from tesseract_recognize_ray.pdfcodec import encode_pdf_vector

                    # DRAWN pages: ink as filled paths (re + m/l/h polygons
                    # + q/cm translations), no raster stream, no text layer
                    # — the class only rasterize-at-density + OCR can read.
                    # 1 user unit = 1 logical pixel, so any density that is
                    # an integer multiple of 72 reproduces the glyph grid
                    # exactly (pdfcodec.encode_pdf_vector docstring).
                    payload = encode_pdf_vector(
                        page_imgs, seed=int(rng.integers(0, 2**31))
                    )
                    mkind = "pdf"
                elif enc == "tiff_lzw":
                    from tesseract_recognize_ray.imagecodecs import encode_tiff_gray

                    comp = (5, 8, 32773)[int(rng.integers(0, 3))]
                    payload = encode_tiff_gray(
                        page_imgs,
                        compression=comp,
                        predictor=2 if comp in (5, 8) and rng.random() < 0.5 else 1,
                        rows_per_strip=(None, 16)[int(rng.integers(0, 2))],
                    )
                elif enc == "tiff_jpeg":  # JPEG-in-TIFF (TechNote 2), lossy
                    from tesseract_recognize_ray.imagecodecs import encode_tiff_gray

                    payload = encode_tiff_gray(
                        page_imgs,
                        compression=7,
                        jpeg_quality=95,
                        rows_per_strip=(None, 24)[int(rng.integers(0, 2))],
                        jpeg_tables=bool(rng.integers(0, 2)),
                    )
                else:
                    payload = b"".join(blobs)
                media_rows["media_ref"].append(media_ref)
                media_rows["bytes"].append(payload)
                media_rows["width"].append(max_w)
                media_rows["height"].append(tot_h)
                media_rows["kind"].append(mkind)
                media_rows["n_pages"].append(n_pages)
                spans.append({"kind": "media", "text": None, "media_ref": media_ref, "offset": offset})
                offset += 1
        doc_ids.append(doc_id)
        doc_spans.append(spans)
        golden.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
        for seq, (order, _pg, _r, _l, kind, text, media_ref, rid, lid) in enumerate(golden):
            g["doc_id"].append(doc_id)
            g["seq"].append(seq)
            g["kind"].append(kind)
            g["text"].append(text)
            g["media_ref"].append(media_ref)
            g["order"].append(order)
            g["region_id"].append(rid)
            g["line_id"].append(lid)

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    docs_tbl = pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()), "spans": pa.array(doc_spans, pa.list_(span_t))}
    )
    media_tbl = pa.table(
        {
            "media_ref": pa.array(media_rows["media_ref"], pa.string()),
            "bytes": pa.array(media_rows["bytes"], pa.large_binary()),
            "width": pa.array(media_rows["width"], pa.int32()),
            "height": pa.array(media_rows["height"], pa.int32()),
            "kind": pa.array(media_rows["kind"], pa.string()),
            "n_pages": pa.array(media_rows["n_pages"], pa.int32()),
        }
    )
    golden_tbl = pa.table(
        {
            "doc_id": pa.array(g["doc_id"], pa.string()),
            "seq": pa.array(g["seq"], pa.int32()),
            "kind": pa.array(g["kind"], pa.string()),
            "text": pa.array(g["text"], pa.string()),
            "media_ref": pa.array(g["media_ref"], pa.string()),
            "order": pa.array(g["order"], pa.int32()),
            "region_id": pa.array(g["region_id"], pa.string()),
            "line_id": pa.array(g["line_id"], pa.string()),
        }
    )
    layout_tbl = pa.table({k: pa.array(v) for k, v in lay.items()})
    return {
        "docs": docs_tbl,
        "media": media_tbl,
        "golden_spans": golden_tbl,
        "golden_layout": layout_tbl,
    }


def generate_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = SEED,
    multipage_frac: float = 0.07,
    rotate_frac: float = 0.05,
    media_encoding: str = "raw",
) -> dict[str, str]:
    """Write docs/media/golden_spans/golden_layout parquet under out_dir.

    Returns {table_name: path}. Byte-stable for a given (n_docs, seed,
    media_encoding)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    tables = build_tables(rng, 0, n_docs, multipage_frac, rotate_frac, media_encoding)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def generate_corpus_sharded(
    out_dir: str,
    n_docs: int,
    seed: int = SEED,
    shard_docs: int = 1000,
    **kw,
) -> dict[str, str]:
    """Parallel corpus generation: one Ray task per shard of shard_docs docs,
    shard i seeded with default_rng([seed, i]) — deterministic regardless of
    scheduling (NOT byte-identical to the sequential generator: different rng
    stream). Each table becomes a directory of per-shard parquet files, the
    layout every reader here already handles. Requires an initialized Ray."""
    import ray

    names = ("docs", "media", "golden_spans", "golden_layout")
    paths = {n: os.path.join(out_dir, n) for n in names}
    for p in paths.values():
        os.makedirs(p, exist_ok=True)

    @ray.remote
    def gen_shard(i: int, start: int, count: int) -> int:
        rng = np.random.default_rng([seed, i])
        tables = build_tables(rng, start, count, **kw)
        for name, tbl in tables.items():
            pq.write_table(tbl, os.path.join(paths[name], f"part-{i:05d}.parquet"))
        return count

    refs = [
        gen_shard.remote(i, s, min(shard_docs, n_docs - s))
        for i, s in enumerate(range(0, n_docs, shard_docs))
    ]
    assert sum(ray.get(refs)) == n_docs
    return paths


def corpus_sharded_cached(out_dir: str, n_docs: int, seed: int = SEED, **kw) -> dict[str, str]:
    """generate_corpus_sharded, skipped if the output dirs already exist
    (marker file records (n_docs, seed) to catch mismatched reuse)."""
    import json

    marker = os.path.join(out_dir, "_corpus.json")
    names = ("docs", "media", "golden_spans", "golden_layout")
    paths = {n: os.path.join(out_dir, n) for n in names}
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta == {"n_docs": n_docs, "seed": seed}:
            return paths
    paths = generate_corpus_sharded(out_dir, n_docs, seed, **kw)
    with open(marker, "w") as f:
        json.dump({"n_docs": n_docs, "seed": seed}, f)
    return paths


def corpus_cached(out_dir: str, n_docs: int, seed: int = SEED, **kw) -> dict[str, str]:
    """generate_corpus, skipped if all four tables already exist."""
    names = ("docs", "media", "golden_spans", "golden_layout")
    paths = {n: os.path.join(out_dir, f"{n}.parquet") for n in names}
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    return generate_corpus(out_dir, n_docs, seed=seed, **kw)
