"""Decode / page-expansion stage (reference sources S1-S3, M1 dispatch).

One vectorized ``map_batches`` function over the media table: each media row
(`media_ref, bytes, kind, n_pages`) expands to one row per selected page with
a self-describing single-page raster blob. Mirrors:

  * plain image read        — `/root/reference/tesseract-recognize.cc:514-531`
  * multi-page TIFF expand  — `:455-487` (page-subset spec `:222-235`)
  * PDF page expand         — `:490-511` (lazy Ghostscript render at
    `--density` dpi; here the fixture raster IS the rendered page, density
    recorded for provenance only — the reference itself marks its PDF render
    "broken", CMakeLists.txt:22)
  * input-type dispatch M1  — `:362-368` (regex on filename; here the typed
    `kind` column plays that role)

Input payloads may be any supported encoding — PNG (incl. Adam7), JPEG
(baseline + progressive), TIFF (uncompressed/LZW/Deflate/PackBits,
multi-page IFD chain), GIF, BMP, PNM, image-wrapped PDF (natively
multi-page) or the raw fixture format — dispatched on magic bytes by
`imagecodecs.iter_page_images` (the reference's pixRead front door,
tesseract-recognize.cc:514-531, plus its Ghostscript PDF path
`:490-511` via `pdfcodec`). Output pixel payloads are NORMALIZED to
the raw format (8-byte header + u8 rows, FIXTURES.md §2) so every
downstream stage views them zero-copy via np.frombuffer regardless of the
source encoding. ``est_cost = width*height`` feeds the skew-aware batching
in SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tesseract_recognize_ray.imagecodecs import iter_page_images

PAGE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("page", pa.int32()),
        ("n_pages", pa.int32()),
        ("pixels", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("est_cost", pa.int64()),
    ]
)


def _iter_page_blobs(buf: memoryview):
    """Yield (page_index, blob, w, h) from a concatenated multi-page blob."""
    off, p = 0, 0
    n = len(buf)
    while off < n:
        w = int.from_bytes(buf[off : off + 4], "little")
        h = int.from_bytes(buf[off + 4 : off + 8], "little")
        size = 8 + w * h
        yield p, buf[off : off + size], w, h
        off += size
        p += 1


def make_decode_pages(page_set: list[int] | None = None):
    """Build the decode/expand batch fn; page_set filters pages (S2).

    Out-of-range page selections raise, matching the reference's hard error
    (`tesseract-recognize.cc:461-466`).
    """
    pset = set(page_set) if page_set is not None else None

    def decode_pages(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        n_pages_col = batch.column("n_pages").to_pylist()
        out = {k: [] for k in ("media_ref", "page", "n_pages", "pixels", "width", "height", "est_cost")}
        for ref, blob, n_pages in zip(refs, blobs, n_pages_col):
            seen = 0
            for p, img in iter_page_images(memoryview(blob)):
                seen += 1
                if pset is not None and p not in pset:
                    continue
                h, w = img.shape
                out["media_ref"].append(ref)
                out["page"].append(p)
                out["n_pages"].append(n_pages)
                out["pixels"].append(
                    np.uint32(w).tobytes() + np.uint32(h).tobytes() + img.tobytes()
                )
                out["width"].append(w)
                out["height"].append(h)
                out["est_cost"].append(w * h)
            if pset is not None and max(pset, default=-1) >= seen:
                raise ValueError(
                    f"page selection {sorted(pset)} out of range for {ref} "
                    f"({seen} pages); reference errors likewise "
                    "(tesseract-recognize.cc:461-466)"
                )
        return pa.Table.from_pydict(
            {name: pa.array(out[name], PAGE_SCHEMA.field(name).type) for name in out}
        )

    return decode_pages


def decode_page_pixels(blob: bytes | memoryview) -> np.ndarray:
    """Zero-copy view of a single-page blob as an (h, w) uint8 array."""
    mv = memoryview(blob)
    w = int.from_bytes(mv[0:4], "little")
    h = int.from_bytes(mv[4:8], "little")
    return np.frombuffer(mv, dtype=np.uint8, offset=8, count=w * h).reshape(h, w)
