"""Recognition stage (reference A1): the stateful actor-pool stage.

The reference initializes one warm TessBaseAPI per process and reuses it for
every image (`/root/reference/tesseract-recognize.cc:340-354,550,597`); its
REST tier instead pays a cold engine init per request
(`tesseract_recognize_api.py:270-316`) — the main inefficiency this design
fixes. Here the warm engine is a ``Recognizer`` callable class passed to
``map_batches(Recognizer, concurrency=(min,max), batch_size=B)``: template
bank and scratch state are built once per actor in ``__init__``, every
``__call__`` recognizes a batch of line crops vectorized per line.

Word-level emission (reference H1 walk at RIL_WORD, `:741-788`) is optional:
``emit_words=True`` adds one row per word with its own bbox and id columns,
including the whole-line sentinel-coords case handled by the G4 filler.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import ocr_core as oc
from ..glyphs import GLYPH_PITCH
from .decode import decode_page_pixels

REC_COLUMNS = [
    "media_ref",
    "page",
    "n_pages",
    "block",
    "para",
    "line",
    "word",
    "level",
    "x0",
    "y0",
    "x1",
    "y1",
    "baseline_y",
    "scale",
    "orientation_k",
    "page_w",
    "page_h",
    "text",
    "conf",
]

REC_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("page", pa.int32()),
        ("n_pages", pa.int32()),
        ("block", pa.int32()),
        ("para", pa.int32()),
        ("line", pa.int32()),
        ("word", pa.int32()),
        ("level", pa.string()),
        ("x0", pa.int32()),
        ("y0", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
        ("baseline_y", pa.int32()),
        ("scale", pa.int32()),
        ("orientation_k", pa.int32()),
        ("page_w", pa.int32()),
        ("page_h", pa.int32()),
        ("text", pa.string()),
        ("conf", pa.float64()),
    ]
)


class Recognizer:
    """Warm-engine actor: one template bank per actor, reused across batches.

    Passing only_layout=True skips text emission, mirroring --only-layout /
    InitForAnalysePage (`tesseract-recognize.cc:342-343,592-593`).
    """

    def __init__(self, only_layout: bool = False, emit_words: bool = False):
        # ocr_core builds its template tables at import; referencing them here
        # makes the amortized-init explicit and gives actors scratch space.
        self.bank_exact = oc._EXACT
        self.bank_by_width = oc._BY_WIDTH
        self.only_layout = only_layout
        self.emit_words = emit_words

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {name: batch.column(name).to_pylist() for name in batch.schema.names if name != "line_pixels"}
        pix = batch.column("line_pixels")
        out: dict[str, list] = {name: [] for name in REC_COLUMNS}

        def emit(row_i: int, level: str, word: int, text: str | None, conf: float | None, bbox=None):
            out["media_ref"].append(cols["media_ref"][row_i])
            out["page"].append(cols["page"][row_i])
            out["n_pages"].append(cols["n_pages"][row_i])
            out["block"].append(cols["block"][row_i])
            out["para"].append(cols["para"][row_i])
            out["line"].append(cols["line"][row_i])
            out["word"].append(word)
            out["level"].append(level)
            if bbox is None:
                for k in ("x0", "y0", "x1", "y1"):
                    out[k].append(cols[k][row_i])
            else:
                x0, y0, x1, y1 = bbox
                out["x0"].append(x0)
                out["y0"].append(y0)
                out["x1"].append(x1)
                out["y1"].append(y1)
            out["baseline_y"].append(cols["baseline_y"][row_i])
            out["scale"].append(cols["scale"][row_i])
            out["orientation_k"].append(cols["orientation_k"][row_i])
            out["page_w"].append(cols["page_w"][row_i])
            out["page_h"].append(cols["page_h"][row_i])
            out["text"].append(text)
            out["conf"].append(conf)

        for i in range(n):
            s = cols["scale"][i]
            if self.only_layout:
                emit(i, "line", -1, None, None)
                continue
            band = decode_page_pixels(pix[i].as_py())
            ink = oc.binarize(band)
            text, conf = oc.recognize_line(ink, s)
            emit(i, "line", -1, text, conf)
            if self.emit_words:
                self._emit_words(emit, i, text, conf, cols, s)

        return pa.Table.from_pydict({f.name: pa.array(out[f.name], f.type) for f in REC_SCHEMA})

    @staticmethod
    def _emit_words(emit, row_i: int, line_text: str, conf: float, cols: dict, s: int) -> None:
        """One row per word; word bboxes derived from the cell grid (glyph
        pitch 6*s), matching the reference's RIL_WORD walk (H1, :741-788)."""
        lx0 = cols["x0"][row_i]
        pos = 0
        for w_idx, word in enumerate(line_text.split(" ")):
            if word:
                x0 = lx0 + pos * GLYPH_PITCH * s
                x1 = x0 + len(word) * GLYPH_PITCH * s - s
                emit(
                    row_i,
                    "word",
                    w_idx,
                    word,
                    conf,
                    bbox=(x0, cols["y0"][row_i], x1, cols["y1"][row_i]),
                )
            pos += len(word) + 1


def drop_pixels(batch: pa.Table) -> pa.Table:
    """Project away the heavy binary column before the reassembly shuffle so
    the groupby moves text rows only (SURVEY.md §4 memory note)."""
    if "line_pixels" in batch.schema.names:
        return batch.drop_columns(["line_pixels"])
    return batch
