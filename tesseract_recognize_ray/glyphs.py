"""Deterministic 5x7 bitmap glyph bank.

This single table plays two roles (SURVEY.md §5.1, FIXTURES.md §4):

1. The fixture generator renders synthetic pages from it, so the golden
   region/line text is known by construction.
2. The recognition stage (stages/recognize.py) uses the very same table as
   its template bank, standing in for the reference's Tesseract LSTM model
   data loaded once per process (`/root/reference/tesseract-recognize.cc:340-354`).
   With a closed alphabet and exact rendering, 100% span-sequence equality is
   achievable by construction — the environment has no tesseract binary.

Alphabet: A-Z 0-9 space . , -  (40 symbols, 39 inked templates). Each glyph is 7 rows x 5 cols,
'#' = ink. Invariants (tested in tests/test_glyphs.py):
  * every glyph's inked-column set is a contiguous run (so glyphs separate
    into single x-runs under projection segmentation),
  * ink-cropped patterns are pairwise distinct (so template matching is exact),
  * every A-Z0-9 glyph has ink in row 0 or row 6 span covering full height
    (full 7-row extent), so a line containing at least one alphanumeric
    glyph has exactly a 7*s-pixel-tall ink band.
"""

from __future__ import annotations

import numpy as np

GLYPH_H = 7
GLYPH_W = 5
# horizontal advance between glyph cells, in logical pixels (scaled by s)
GLYPH_PITCH = 6  # 5 ink columns + 1 spacing column

_FONT_SRC: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "####.", "#...#", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "####.", "#....", "#....", "#....", "#####"),
    "F": ("#####", "#....", "####.", "#....", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    "H": ("#...#", "#...#", "#####", "#...#", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "..##.", ".#...", "#....", "#####"),
    "3": ("#####", "...#.", "..#..", "...#.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    " ": (".....", ".....", ".....", ".....", ".....", ".....", "....."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    ",": (".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."),
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
}

ALPHABET: str = "".join(_FONT_SRC.keys())
ALNUM: str = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def _parse(rows: tuple[str, ...]) -> np.ndarray:
    a = np.array([[c == "#" for c in row] for row in rows], dtype=bool)
    assert a.shape == (GLYPH_H, GLYPH_W)
    return a


# char -> (7,5) bool ink mask
FONT: dict[str, np.ndarray] = {ch: _parse(rows) for ch, rows in _FONT_SRC.items()}


def ink_col_span(ch: str) -> tuple[int, int]:
    """[c0, c1) columns of the glyph that contain any ink; (0,0) for space."""
    g = FONT[ch]
    cols = np.flatnonzero(g.any(axis=0))
    if cols.size == 0:
        return (0, 0)
    return (int(cols[0]), int(cols[-1]) + 1)


def cropped_pattern(ch: str) -> np.ndarray:
    """The glyph's 7 x w ink-column-cropped pattern (template-match key)."""
    c0, c1 = ink_col_span(ch)
    return FONT[ch][:, c0:c1]


def template_bank() -> list[tuple[str, np.ndarray, int]]:
    """Recognition templates: (char, cropped 7xw bool pattern, width w) for
    every non-space symbol. Built once at import by the recognizer actor
    (the moral equivalent of TessBaseAPI::Init,
    /root/reference/tesseract-recognize.cc:340-354)."""
    out = []
    for ch in ALPHABET:
        if ch == " ":
            continue
        p = cropped_pattern(ch)
        out.append((ch, p, p.shape[1]))
    return out


_SCALED_CACHE: dict[tuple[str, int], np.ndarray] = {}


def scaled_glyph(ch: str, s: int) -> np.ndarray:
    """Glyph ink mask scaled by integer factor s (block replication, cached)."""
    key = (ch, s)
    g = _SCALED_CACHE.get(key)
    if g is None:
        g = np.kron(FONT[ch], np.ones((s, s), dtype=bool))
        _SCALED_CACHE[key] = g
    return g
