"""Template recognizer: exactness on the closed alphabet, confidence range,
trim semantics (M5/M6), word emission (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa

from tesseract_recognize_ray import ocr_core as oc
from tesseract_recognize_ray.fixtures import render_page
from tesseract_recognize_ray.glyphs import ALPHABET
from tesseract_recognize_ray.stages.recognize import Recognizer
from tesseract_recognize_ray.stages.segment import make_segment_batch
from tesseract_recognize_ray.stages.decode import PAGE_SCHEMA
from tesseract_recognize_ray.fixtures import encode_raster


def _render_line(text: str, s: int) -> np.ndarray:
    from tesseract_recognize_ray.glyphs import GLYPH_PITCH, GLYPH_W, scaled_glyph

    w = len(text) * GLYPH_PITCH * s
    img = np.full((7 * s, w), 255, dtype=np.uint8)
    x = 0
    for ch in text:
        if ch != " ":
            img[:, x : x + GLYPH_W * s][scaled_glyph(ch, s)] = 0
        x += GLYPH_PITCH * s
    return img


def test_recognize_full_alphabet_each_scale():
    text = "THE QUICK BROWN FOX 0123456789, JUMPS - OVER."
    for s in (2, 3, 4):
        got, conf = oc.recognize_line(oc.binarize(_render_line(text, s)), s)
        assert got == text
        assert conf == 1.0


def test_every_single_glyph_roundtrip():
    for ch in ALPHABET:
        if ch == " ":
            continue
        got, conf = oc.recognize_line(oc.binarize(_render_line("A" + ch, 2)), 2)
        assert got == "A" + ch, ch
        assert conf == 1.0


def test_no_leading_trailing_whitespace_m5():
    # reference trims text with ^\s+|\s+$ (tesseract-recognize.cc:205-212);
    # the recognizer never emits edge spaces by construction
    got, _ = oc.recognize_line(oc.binarize(_render_line("AB CD", 3)), 3)
    assert got == got.strip()


def test_confidence_degrades_on_corruption_m6():
    img = _render_line("HELLO", 2)
    ink = oc.binarize(img)
    ink[0, 0:4] ^= True  # flip pixels inside the first glyph's cell
    text, conf = oc.recognize_line(ink, 2)
    assert 0.0 < conf < 1.0


def test_recognizer_actor_batch_and_words():
    rng = np.random.default_rng(21)
    pg = render_page(rng, rotate=False)
    page_batch = pa.Table.from_pydict(
        {
            "media_ref": pa.array(["m-x"], pa.string()),
            "page": pa.array([0], pa.int32()),
            "n_pages": pa.array([1], pa.int32()),
            "pixels": pa.array([encode_raster(pg.img)], pa.large_binary()),
            "width": pa.array([pg.img.shape[1]], pa.int32()),
            "height": pa.array([pg.img.shape[0]], pa.int32()),
            "est_cost": pa.array([pg.img.size], pa.int64()),
        },
        schema=PAGE_SCHEMA,
    )
    lines = make_segment_batch()(page_batch)
    rec = Recognizer(emit_words=True)(lines)
    line_rows = rec.filter(pa.compute.equal(rec["level"], "line"))
    assert line_rows.column("text").to_pylist() == [ln.text for ln in pg.lines]
    assert all(c == 1.0 for c in line_rows.column("conf").to_pylist())
    word_rows = rec.filter(pa.compute.equal(rec["level"], "word"))
    first_line_words = [
        w
        for w, b, l in zip(
            word_rows.column("text").to_pylist(),
            word_rows.column("block").to_pylist(),
            word_rows.column("line").to_pylist(),
        )
        if b == 0 and l == 0
    ]
    assert first_line_words == pg.lines[0].text.split()


def test_only_layout_mode():
    rng = np.random.default_rng(22)
    pg = render_page(rng, rotate=False)
    page_batch = pa.Table.from_pydict(
        {
            "media_ref": pa.array(["m-y"], pa.string()),
            "page": pa.array([0], pa.int32()),
            "n_pages": pa.array([1], pa.int32()),
            "pixels": pa.array([encode_raster(pg.img)], pa.large_binary()),
            "width": pa.array([pg.img.shape[1]], pa.int32()),
            "height": pa.array([pg.img.shape[0]], pa.int32()),
            "est_cost": pa.array([pg.img.size], pa.int64()),
        },
        schema=PAGE_SCHEMA,
    )
    lines = make_segment_batch()(page_batch)
    rec = Recognizer(only_layout=True)(lines)
    assert rec.column("text").null_count == rec.num_rows
    assert rec.num_rows == len(pg.lines)


def test_glyph_level_emission(ray_session, tiny_corpus):
    """M3 layout_level='glyph': one row per glyph (RIL_SYMBOL depth), glyphs
    concatenate back to the line text, per-glyph coords nest inside the line."""
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.stages.media_source import recognized_lines_from_files

    cfg = PipelineConfig(layout_level="glyph")
    rec = recognized_lines_from_files([tiny_corpus["media"]], cfg).to_pandas()
    assert set(rec["level"]) == {"line", "word", "glyph"}
    lines = rec[rec["level"] == "line"]
    glyphs = rec[rec["level"] == "glyph"]
    for key, ln in lines.head(20).groupby(["media_ref", "page", "block", "line"]):
        g = glyphs[
            (glyphs["media_ref"] == key[0]) & (glyphs["page"] == key[1])
            & (glyphs["block"] == key[2]) & (glyphs["line"] == key[3])
        ].sort_values("word")
        text = ln["text"].iloc[0]
        assert "".join(g["text"]) == text.replace(" ", "")
        assert (g["x0"] >= ln["x0"].iloc[0]).all() and (g["x1"] <= ln["x1"].iloc[0]).all()
        assert (g["conf"] == 1.0).all()


def test_quarantine_bad_media(ray_session, tmp_path):
    """Poison-row quarantine (SURVEY.md §4): a corrupt blob becomes one error
    row when quarantine=True, aborts the job when False (reference default)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest
    import ray

    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.fixtures import encode_raster
    from tesseract_recognize_ray.stages.media_source import recognized_lines_from_files
    import numpy as np

    good = encode_raster(np.full((40, 60), 255, dtype=np.uint8))
    bad = b"\xff\xff\xff\x7f\xff\xff\xff\x7f corrupt"  # absurd w/h header
    t = pa.table(
        {
            "media_ref": pa.array(["m-good", "m-bad"], pa.string()),
            "bytes": pa.array([good, bad], pa.large_binary()),
            "kind": pa.array(["page", "page"], pa.string()),
            "n_pages": pa.array([1, 1], pa.int32()),
        }
    )
    path = str(tmp_path / "media.parquet")
    pq.write_table(t, path)

    out = recognized_lines_from_files([path], PipelineConfig(quarantine=True)).to_pandas()
    errs = out[out["level"] == "error"]
    assert len(errs) == 1 and errs["media_ref"].iloc[0] == "m-bad"
    assert "Error" in errs["text"].iloc[0] or "error" in errs["text"].iloc[0].lower()
    assert (out[out["level"] != "error"]["media_ref"] == "m-good").all() or len(out) == 1

    with _pytest.raises(ray.exceptions.RayTaskError):
        recognized_lines_from_files([path], PipelineConfig(quarantine=False)).to_pandas()


def test_merged_blob_run_wider_than_any_template():
    """Two glyphs bridged by an ink smear form one >5-cell run: the legacy
    per-run path must keep the line (unknown blob -> '-', conf 0 for that
    run) instead of crashing the vectorized key path."""
    img = _render_line("AB CD", 2)
    ink = oc.binarize(img)
    # bridge A and B: fill the spacing column between their cells with ink
    ink[: 7 * 2, 5 * 2 : 6 * 2] = True
    text, conf = oc.recognize_line(ink, 2)
    assert text.endswith(" CD")
    assert 0.0 <= conf < 1.0


def test_noisy_glyph_takes_hamming_fallback_not_garbage():
    """A single flipped pixel inside one glyph cell: the packed-key lookup
    misses, the nearest-Hamming fallback still recognizes the right char
    with conf just under 1."""
    img = _render_line("QUICK", 3)
    ink = oc.binarize(img)
    ink[1, 1] ^= True  # one pixel of the Q cell
    text, conf = oc.recognize_line(ink, 3)
    assert text == "QUICK"
    assert 0.9 < conf < 1.0
