"""Layout-analysis stage (reference A2/A3, driven through Tesseract at
`/root/reference/tesseract-recognize.cc:591-628`; here a from-scratch
projection-profile segmenter, see ocr_core.py).

A stateless ``map_batches`` function: page rows in, one row per detected text
line out, carrying the cropped line raster for the downstream recognizer
actor pool. Reading order is **fully data-carried** in the (page, block,
para, line) int columns (SURVEY.md §4 'Ordering'): Ray Data block order is
never relied on.

Also emits the page-property fields the reference stores as Page XML
<Property> elements (deskew/orientation, `tesseract-recognize.cc:602-628`)
and applies the non-text block filter M9 (`:630-655`) via the block_type
column (synthetic corpora only produce flowing text, type 0; the filter is
exercised by unit tests).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .. import ocr_core as oc
from .decode import decode_page_pixels

PT_CAPTION_TEXT = 8  # keep block types 0..8, drop 9..14 (M9, reference :651)

LINE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("page", pa.int32()),
        ("n_pages", pa.int32()),
        ("block", pa.int32()),
        ("para", pa.int32()),
        ("line", pa.int32()),
        ("x0", pa.int32()),
        ("y0", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
        ("baseline_y", pa.int32()),
        ("scale", pa.int32()),
        ("orientation_k", pa.int32()),
        ("page_w", pa.int32()),
        ("page_h", pa.int32()),
        ("block_type", pa.int32()),
        ("line_pixels", pa.large_binary()),
    ]
)


def filter_text_blocks(batch: pa.Table) -> pa.Table:
    """M9: keep Tesseract block types 0..PT_CAPTION_TEXT (text-bearing),
    drop images/rules/noise (reference tesseract-recognize.cc:630-655)."""
    import pyarrow.compute as pc

    return batch.filter(pc.less_equal(batch["block_type"], PT_CAPTION_TEXT))


def segment_page(img: np.ndarray) -> tuple[int, int, list[dict]]:
    """Segment one page raster. Returns (orientation_k, scale, line dicts).

    orientation_k is the number of CCW rot90 turns that make the stored
    raster upright (A3); line coords are in upright space — the reference
    likewise rotates the page image before emitting coords when
    apply-image-orientation is set (`tesseract-recognize.cc:793-799`)."""
    k_up, s, bands = oc.analyse_orientation(oc.binarize(img))
    up = np.ascontiguousarray(np.rot90(img, k_up)) if k_up else img
    lines = []
    for b in bands:
        crop = up[b.y0 : b.y1, b.x0 : b.x1]
        lines.append(
            {
                "block": b.block,
                "para": 0,  # paragraphs are flattened into line ids (reference :709-727)
                "line": b.line,
                "x0": b.x0,
                "y0": b.y0,
                "x1": b.x1,
                "y1": b.y1,
                "baseline_y": b.y1,  # bottom ink row + 1 == glyph baseline
                "scale": s,
                "orientation_k": k_up,
                # upright page dims (post-rotation) — the Page element's
                # imageWidth/imageHeight and the full-page sentinel check
                "page_w": up.shape[1],
                "page_h": up.shape[0],
                "block_type": 0,  # PT_FLOWING_TEXT; non-text never produced here
                "line_pixels": _encode_crop(crop),
            }
        )
    return k_up, s, lines


def _encode_crop(crop: np.ndarray) -> bytes:
    h, w = crop.shape
    return (
        np.uint32(w).tobytes()
        + np.uint32(h).tobytes()
        + np.ascontiguousarray(crop).tobytes()
    )


def make_segment_batch(save_crops_dir: str | None = None):
    """Build the segmentation batch fn; save_crops_dir mirrors the
    reference's --save-crops debug sink (K3, tesseract-recognize.cc:48,551-555)."""

    def segment_batch(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in LINE_SCHEMA.names}
        refs = batch.column("media_ref").to_pylist()
        pages = batch.column("page").to_pylist()
        n_pages_col = batch.column("n_pages").to_pylist()
        pix = batch.column("pixels")
        crop_n = 0
        for i, (ref, page, n_pages) in enumerate(zip(refs, pages, n_pages_col)):
            img = decode_page_pixels(pix[i].as_py())
            _k, _s, lines = segment_page(img)
            for ln in lines:
                out["media_ref"].append(ref)
                out["page"].append(page)
                out["n_pages"].append(n_pages)
                for key, val in ln.items():
                    out[key].append(val)
                if save_crops_dir:
                    os.makedirs(save_crops_dir, exist_ok=True)
                    name = f"crop_{crop_n}_{ref}_p{page}_b{ln['block']}_l{ln['line']}.bin"
                    with open(os.path.join(save_crops_dir, name), "wb") as f:
                        f.write(ln["line_pixels"])
                    crop_n += 1
        return pa.Table.from_pydict(
            {name: pa.array(out[name], LINE_SCHEMA.field(name).type) for name in LINE_SCHEMA.names}
        )

    return segment_batch


segment_batch = make_segment_batch()
