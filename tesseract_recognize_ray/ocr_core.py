"""From-scratch page analysis + template OCR core (pure numpy, no Ray).

This is the engine's replacement for the parts of Tesseract the reference
drives through `TessBaseAPI` (`/root/reference/tesseract-recognize.cc:340-354,
591-598`): binarization, text-line finding, block (region) grouping via
projection-profile cuts (the Manhattan-layout case of recursive XY-cut),
orientation detection (OSD, reference A3 `:602-628`), and glyph recognition
against the closed template bank of ``glyphs.py``.

All functions are deterministic and vectorized per page; they are called from
``map_batches`` bodies (stages/segment.py, stages/recognize.py).

Threshold derivation (see fixtures.py geometry constants; scale s in {2,3,4}):
  * intra-line row gaps   <= 1*s <= 4 px   (sparse glyphs like '-' vs '.')
  * inter-line row gaps   == 6*s >= 12 px  (every line has a full-height
    alnum glyph, so bands are exactly 7s tall)
  * inter-region row gaps == 28*s          -> split regions at > 14*s
  * intra-word col gaps   <= 4*s           (spacing s + blank glyph edge cols)
  * inter-word col gaps   >= 7*s           -> split words at > 5.5*s
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .glyphs import GLYPH_H, template_bank

BIN_THRESHOLD = 128  # Otsu is overkill for bilevel fixtures; fixed threshold
LINE_MERGE_GAP = 5  # px; merges intra-line row gaps (<=4), keeps inter-line (>=12)

# --- template bank, prepared once at import (the recognizer actor's state
# is this module's tables — the analog of a warm TessBaseAPI per process) ---
_EXACT: dict[tuple[int, bytes], str] = {}
_BY_WIDTH: dict[int, tuple[list[str], np.ndarray]] = {}
for _ch, _pat, _w in template_bank():
    _EXACT[(_w, _pat.tobytes())] = _ch
    chars, pats = _BY_WIDTH.setdefault(_w, ([], []))  # type: ignore[assignment]
    chars.append(_ch)
    pats.append(_pat)
_BY_WIDTH = {w: (chs, np.stack(ps)) for w, (chs, ps) in _BY_WIDTH.items()}

# integer-key template table for the vectorized line path: a 7 x w cell
# pattern packs into sum_j colbits_j * 128^j (7 bits per column). Widths
# cannot collide: ink-cropped glyphs have ink in their last column, so the
# top base-128 digit is nonzero and the key range of width w sits strictly
# above that of any narrower glyph.
_COL_W = (1 << np.arange(GLYPH_H, dtype=np.int64))[:, None]  # (7, 1)
_RUN_POW = 128 ** np.arange(6, dtype=np.int64)
_EXACT_CODE: dict[int, str] = {}
for (_w, _pb), _ch in _EXACT.items():
    _pat = np.frombuffer(_pb, dtype=bool).reshape(GLYPH_H, _w)
    _code = int(((_pat * _COL_W).sum(axis=0) * _RUN_POW[:_w]).sum())
    _EXACT_CODE[_code] = _ch


def binarize(img: np.ndarray) -> np.ndarray:
    """uint8 grayscale -> bool ink mask (ink = dark), reference binarization
    being Leptonica/Tesseract-internal (`tesseract-recognize.cc:591-598`)."""
    return img < BIN_THRESHOLD


def runs_1d(profile: np.ndarray, merge_gap: int) -> list[tuple[int, int]]:
    """[start, end) runs of positive profile entries, merging gaps <= merge_gap."""
    nz = np.flatnonzero(profile > 0)
    if nz.size == 0:
        return []
    brk = np.flatnonzero(np.diff(nz) - 1 > merge_gap)
    starts = np.concatenate([nz[:1], nz[brk + 1]])
    ends = np.concatenate([nz[brk], nz[-1:]]) + 1
    return list(zip(starts.tolist(), ends.tolist()))


def match_glyph(pattern: np.ndarray) -> tuple[str, float]:
    """Recognize one 7 x w ink-cropped pattern. Exact dict hit -> conf 1.0
    (the common case by construction); otherwise nearest-Hamming among
    same-width templates, conf = 1 - dist/(7*w) — the deterministic analog of
    `conf = 0.01*iter->Confidence` (M6, tesseract-recognize.cc:206)."""
    w = pattern.shape[1]
    ch = _EXACT.get((w, pattern.tobytes()))
    if ch is not None:
        return ch, 1.0
    cand = _BY_WIDTH.get(w)
    if cand is None:
        return "-", 0.0
    chars, pats = cand
    d = (pats != pattern[None]).reshape(len(chars), -1).sum(axis=1)
    i = int(np.argmin(d))
    return chars[i], float(1.0 - d[i] / (GLYPH_H * w))


def recognize_line(ink_band: np.ndarray, s: int) -> tuple[str, float]:
    """OCR one line band (bool ink mask, exactly 7*s rows tall).

    Glyphs separate into single column runs (glyphs.py contiguity invariant);
    word gaps > 5.5*s insert a single space. Returns (text, mean glyph conf);
    the text needs no further trimming (leading/trailing space never emitted —
    reference trims with regex, M5 `tesseract-recognize.cc:205-212`).

    Fast path: since glyph ink is blitted in s x s cells aligned to the
    band's first ink column, the whole band downsamples to its 7 x C cell
    grid with ONE reduction; glyph runs/gaps/patterns then live on the tiny
    grid (pixel run == s x cell run; word gap > 5.5*s px == >= 6 cells).
    Off-grid bands (foreign sizes) take the tolerant per-run pixel path."""
    h, w = ink_band.shape
    if h == GLYPH_H * s and w % s == 0 and w > 0:
        grid = ink_band.reshape(GLYPH_H, s, w // s, s).any(axis=(1, 3))  # (7, C)
        # pack columns to 7-bit codes ONCE; glyph runs, word gaps and the
        # per-glyph template keys are then all integer arithmetic — no
        # per-glyph slicing/copy/bytes-hash in the hot loop
        colcodes = (grid * _COL_W).sum(axis=0)  # (C,) int64, 0 = blank col
        nz = np.flatnonzero(colcodes)
        if nz.size == 0:
            return "", 0.0
        brk = np.flatnonzero(np.diff(nz) > 1)
        starts = np.concatenate([nz[:1], nz[brk + 1]])
        ends = np.concatenate([nz[brk], nz[-1:]]) + 1
        lens = ends - starts
        kmax = int(lens.max())
        if kmax <= 5:
            idx = np.minimum(starts[:, None] + np.arange(kmax), len(colcodes) - 1)
            vals = np.where(np.arange(kmax) < lens[:, None], colcodes[idx], 0)
            keys = (vals * _RUN_POW[:kmax]).sum(axis=1).tolist()
            spaces = np.zeros(len(keys), dtype=bool)
            spaces[1:] = (starts[1:] - ends[:-1]) >= 6
            parts: list[str] = []
            conf_sum = 0.0
            for i, key in enumerate(keys):
                if spaces[i]:
                    parts.append(" ")
                ch = _EXACT_CODE.get(key)
                if ch is None:  # noisy cell pattern: nearest-Hamming fallback
                    ch, cf = match_glyph(np.ascontiguousarray(grid[:, starts[i] : ends[i]]))
                    conf_sum += cf
                else:
                    conf_sum += 1.0
                parts.append(ch)
            return "".join(parts), conf_sum / len(keys)
        # a run wider than any template (merged blob): legacy per-run path
        parts = []
        confs: list[float] = []
        prev_end: int | None = None
        for c0, c1 in zip(starts.tolist(), ends.tolist()):
            if prev_end is not None and (c0 - prev_end) >= 6:
                parts.append(" ")
            prev_end = c1
            ch, conf = match_glyph(np.ascontiguousarray(grid[:, c0:c1]))
            parts.append(ch)
            confs.append(conf)
        return "".join(parts), sum(confs) / len(confs) if confs else 0.0
    return _recognize_line_offgrid(ink_band, s)


def recognize_line_glyphs(ink_band: np.ndarray, s: int) -> list[tuple[str, float, int, int]]:
    """Per-glyph recognition for one grid-aligned line band: returns
    (char, conf, x0_px, x1_px) per glyph in order — band-local pixel coords
    (the reference's RIL_SYMBOL walk, tesseract-recognize.cc:758-788).
    Off-grid bands return an empty list (glyph geometry undefined there)."""
    h, w = ink_band.shape
    if not (h == GLYPH_H * s and w % s == 0 and w > 0):
        return []
    grid = ink_band.reshape(GLYPH_H, s, w // s, s).any(axis=(1, 3))
    runs = runs_1d(grid.any(axis=0).astype(np.int8), merge_gap=0)
    out = []
    for c0, c1 in runs:
        ch, conf = match_glyph(np.ascontiguousarray(grid[:, c0:c1]))
        out.append((ch, conf, c0 * s, c1 * s))
    return out


def _recognize_line_offgrid(ink_band: np.ndarray, s: int) -> tuple[str, float]:
    """Tolerant pixel-level path for bands that don't sit on the cell grid."""
    colprof = ink_band.sum(axis=0)
    runs = runs_1d(colprof, merge_gap=0)
    if not runs:
        return "", 0.0
    word_gap = (11 * s) // 2  # 5.5*s
    parts: list[str] = []
    confs: list[float] = []
    prev_end: int | None = None
    h = ink_band.shape[0]
    rows = h // GLYPH_H  # == s for clean bands
    for c0, c1 in runs:
        if prev_end is not None and (c0 - prev_end) > word_gap:
            parts.append(" ")
        prev_end = c1
        w_px = c1 - c0
        w = max(1, round(w_px / s))
        crop = ink_band[:, c0:c1]
        if crop.shape != (GLYPH_H * rows, w * s) or rows != s:
            # tolerant path for off-grid crops: pad/trim to the cell grid
            fixed = np.zeros((GLYPH_H * s, w * s), dtype=bool)
            hh = min(crop.shape[0], fixed.shape[0])
            ww = min(crop.shape[1], fixed.shape[1])
            fixed[:hh, :ww] = crop[:hh, :ww]
            crop = fixed
        pattern = crop.reshape(GLYPH_H, s, w, s).any(axis=(1, 3))
        ch, conf = match_glyph(pattern)
        parts.append(ch)
        confs.append(conf)
    return "".join(parts), sum(confs) / len(confs) if confs else 0.0


@dataclass
class LineBand:
    block: int  # 0-based region index (reading order, top-to-bottom)
    line: int  # 0-based line index within region
    y0: int
    y1: int  # ink row extent in upright coords
    x0: int
    x1: int  # ink col extent in upright coords


def find_lines(ink: np.ndarray) -> tuple[int, list[LineBand]]:
    """Row-projection line finding + region grouping (the engine's A2 core;
    reference delegates to Tesseract's internal textline finder,
    `tesseract-recognize.cc:591-598`). Returns (scale s, bands in reading
    order). Region split at row gaps > 14*s (inter-region == 28*s)."""
    rowprof = ink.sum(axis=1)
    bands = runs_1d(rowprof, merge_gap=LINE_MERGE_GAP)
    if not bands:
        return 1, []
    s = max(1, round(max(y1 - y0 for y0, y1 in bands) / GLYPH_H))
    out: list[LineBand] = []
    block = 0
    line = 0
    prev_end: int | None = None
    for y0, y1 in bands:
        if prev_end is not None and (y0 - prev_end) > 14 * s:
            block += 1
            line = 0
        prev_end = y1
        colprof = ink[y0:y1].sum(axis=0)
        cols = np.flatnonzero(colprof > 0)
        out.append(
            LineBand(block=block, line=line, y0=int(y0), y1=int(y1), x0=int(cols[0]), x1=int(cols[-1]) + 1)
        )
        line += 1
    return s, out


def _score_rotation(up_ink: np.ndarray) -> tuple[float, int, list[LineBand]]:
    """Mean template confidence of the first few line bands of one rotation."""
    s, bands = find_lines(up_ink)
    if not bands:
        return -1.0, s, bands
    confs = [
        recognize_line(np.ascontiguousarray(up_ink[b.y0 : b.y1, b.x0 : b.x1]), s)[1]
        for b in bands[:3]
    ]
    return sum(confs) / len(confs), s, bands


def analyse_orientation(ink: np.ndarray) -> tuple[int, int, list[LineBand]]:
    """Orientation detection (reference A3/OSD, tesseract-recognize.cc:602-628):
    returns (k, scale, bands) such that np.rot90(ink, k) is upright, with the
    line bands of the winning rotation (so callers never re-run find_lines).

    Fast path: the unrotated page is scored first and accepted outright when
    its template confidence is ~1.0 — the overwhelmingly common case — so the
    4-rotation sweep only runs on pages that actually look rotated. Ties in
    the sweep prefer the smaller k. The residual ambiguity — a page whose
    scored lines use only 180-symmetric glyphs (H I N O S X Z 0 8 -) — is the
    same ambiguity Tesseract's OSD resolves statistically."""
    if not ink.any():
        return 0, 1, []
    conf0, s0, bands0 = _score_rotation(ink)
    if conf0 >= 0.999:
        return 0, s0, bands0
    best = (0, s0, bands0)
    best_conf = conf0
    for k in range(1, 4):
        up = np.ascontiguousarray(np.rot90(ink, k))
        conf, s, bands = _score_rotation(up)
        if conf > best_conf + 1e-9:
            best, best_conf = (k, s, bands), conf
    return best


def detect_upright_k(img: np.ndarray) -> int:
    """Back-compat wrapper over analyse_orientation (bool-ink based)."""
    return analyse_orientation(binarize(img))[0]


# --------------------------------------------------------------------------
# uint8 fast path: projection profiles off the raw page via a bit-7 shift
# ((v >> 7) == 1 iff v >= BIN_THRESHOLD == 128), so the profiles agree with
# binarize() EXACTLY for every gray value. The earlier w - rowsum/255 trick
# counted near-white pixels fractionally, which turned lossy-codec noise
# (254-valued JPEG ringing on white paper) into phantom line bands.
# --------------------------------------------------------------------------


def find_lines_u8(img: np.ndarray) -> tuple[int, list[LineBand]]:
    """find_lines for a uint8 page without materializing a bool ink mask:
    ink-per-row = w - sum(img >> 7) (one u8 temp + one sum pass; per-band
    column profiles touch only the band's rows)."""
    h, w = img.shape
    if h == 0 or w == 0:
        return 1, []
    rowprof = w - (img >> 7).sum(axis=1, dtype=np.int64)
    bands = runs_1d(rowprof, merge_gap=LINE_MERGE_GAP)
    if not bands:
        return 1, []
    s = max(1, round(max(y1 - y0 for y0, y1 in bands) / GLYPH_H))
    out: list[LineBand] = []
    block = 0
    line = 0
    prev_end: int | None = None
    for y0, y1 in bands:
        if prev_end is not None and (y0 - prev_end) > 14 * s:
            block += 1
            line = 0
        prev_end = y1
        colbg = (img[y0:y1] >> 7).sum(axis=0, dtype=np.int64)
        cols = np.flatnonzero(colbg < (y1 - y0))
        out.append(
            LineBand(block=block, line=line, y0=int(y0), y1=int(y1), x0=int(cols[0]), x1=int(cols[-1]) + 1)
        )
        line += 1
    return s, out


def _score_rotation_u8(up: np.ndarray) -> tuple[float, int, list[LineBand]]:
    s, bands = find_lines_u8(up)
    if not bands:
        return -1.0, s, bands
    confs = [
        recognize_line(up[b.y0 : b.y1, b.x0 : b.x1] < BIN_THRESHOLD, s)[1] for b in bands[:3]
    ]
    return sum(confs) / len(confs), s, bands


def analyse_orientation_u8(img: np.ndarray) -> tuple[int, int, list[LineBand]]:
    """analyse_orientation off the raw uint8 page (same fast-accept logic;
    rot90 views are summed directly — no contiguous copies for the sweep)."""
    conf0, s0, bands0 = _score_rotation_u8(img)
    if conf0 >= 0.999:
        return 0, s0, bands0
    best = (0, s0, bands0)
    best_conf = conf0
    for k in range(1, 4):
        conf, s, bands = _score_rotation_u8(np.rot90(img, k))
        if conf > best_conf + 1e-9:
            best, best_conf = (k, s, bands), conf
    return best
