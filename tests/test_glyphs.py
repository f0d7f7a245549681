"""Glyph-bank invariants the segmenter/recognizer depend on (glyphs.py doc)."""

import numpy as np

from tesseract_recognize_ray.glyphs import (
    ALNUM,
    ALPHABET,
    FONT,
    GLYPH_H,
    GLYPH_W,
    cropped_pattern,
    scaled_glyph,
    template_bank,
)


def test_alphabet_size_and_shapes():
    assert len(ALPHABET) == 40  # 26 letters + 10 digits + space . , -
    assert len(template_bank()) == 39  # space has no template
    for ch in ALPHABET:
        assert FONT[ch].shape == (GLYPH_H, GLYPH_W)


def test_cropped_patterns_pairwise_distinct():
    seen = {}
    for ch, pat, w in template_bank():
        key = (w, pat.tobytes())
        assert key not in seen, f"{ch} collides with {seen.get(key)}"
        seen[key] = ch


def test_ink_columns_contiguous():
    for ch in ALPHABET:
        if ch == " ":
            continue
        cols = np.flatnonzero(FONT[ch].any(axis=0))
        assert (np.diff(cols) == 1).all(), ch


def test_alnum_full_height():
    for ch in ALNUM:
        rows = np.flatnonzero(FONT[ch].any(axis=1))
        assert rows[0] == 0 and rows[-1] == GLYPH_H - 1, ch


def test_scaled_glyph_block_replication():
    g = scaled_glyph("A", 3)
    assert g.shape == (21, 15)
    assert (g[0:3, 3:6] == FONT["A"][0, 1]).all()


def test_cropped_pattern_space_empty():
    assert cropped_pattern(" ").shape[1] == 0
