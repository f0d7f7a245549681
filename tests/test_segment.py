"""Segmentation core on hand-built and rendered rasters (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa

from tesseract_recognize_ray import ocr_core as oc
from tesseract_recognize_ray.fixtures import encode_raster, render_page
from tesseract_recognize_ray.stages.segment import (
    filter_text_blocks,
    segment_page,
)


def test_runs_1d_gap_semantics():
    prof = np.array([1, 1, 0, 1, 0, 0, 0, 1, 1])
    assert oc.runs_1d(prof, merge_gap=0) == [(0, 2), (3, 4), (7, 9)]
    assert oc.runs_1d(prof, merge_gap=1) == [(0, 4), (7, 9)]
    assert oc.runs_1d(prof, merge_gap=3) == [(0, 9)]
    assert oc.runs_1d(np.zeros(5), merge_gap=1) == []


def test_binarize_threshold():
    img = np.array([[0, 127, 128, 255]], dtype=np.uint8)
    assert oc.binarize(img).tolist() == [[True, True, False, False]]


def test_find_lines_two_regions():
    rng = np.random.default_rng(3)
    pg = render_page(rng, n_regions=2, rotate=False)
    ink = oc.binarize(pg.img)
    s, bands = oc.find_lines(ink)
    assert s == pg.scale
    assert [(b.block, b.line) for b in bands] == [(ln.region, ln.line) for ln in pg.lines]
    # bands sit inside the golden line boxes, baseline exact
    for b, ln in zip(bands, pg.lines):
        assert b.y0 == ln.y0 and b.y1 == ln.y1
        assert ln.x0 <= b.x0 <= b.x1 <= ln.x1


def test_orientation_detection_all_rotations():
    rng = np.random.default_rng(5)
    base = render_page(rng, rotate=False)
    for k in range(4):
        stored = np.ascontiguousarray(np.rot90(base.img, k))
        k_up = oc.detect_upright_k(stored)
        up = np.rot90(stored, k_up)
        assert np.array_equal(up, base.img), f"rotation {k} not undone"


def test_segment_page_rotated_matches_golden():
    rng = np.random.default_rng(11)
    pg = render_page(rng, rotate=True)
    k_up, s, lines = segment_page(pg.img)
    assert s == pg.scale
    assert [(d["block"], d["line"]) for d in lines] == [
        (ln.region, ln.line) for ln in pg.lines
    ]
    assert (k_up + pg.rotation_k) % 4 == 0


def test_block_type_filter_m9():
    batch = pa.table(
        {
            "media_ref": ["a"] * 4,
            "block_type": pa.array([0, 8, 9, 13], pa.int32()),
        }
    )
    kept = filter_text_blocks(batch)
    assert kept.column("block_type").to_pylist() == [0, 8]


def test_encode_decode_roundtrip():
    from tesseract_recognize_ray.stages.decode import decode_page_pixels

    img = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
    assert np.array_equal(decode_page_pixels(encode_raster(img)), img)


def test_media_splits_by_cost(tmp_path):
    """Byte-balanced splits: a fat file gets proportionally more splits than
    a thin one; every row is covered exactly once."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import encode_raster
    from tesseract_recognize_ray.stages.media_source import media_splits_by_cost

    def write(path, n, hw):
        rng = np.random.default_rng(0)
        blobs = [encode_raster(rng.integers(0, 255, size=hw, dtype=np.uint8).astype(np.uint8)) for _ in range(n)]
        t = pa.table(
            {
                "media_ref": pa.array([f"m{i}" for i in range(n)], pa.string()),
                "bytes": pa.array(blobs, pa.large_binary()),
                "kind": pa.array(["page"] * n, pa.string()),
                "n_pages": pa.array([1] * n, pa.int32()),
            }
        )
        pq.write_table(t, path)

    fat = str(tmp_path / "fat.parquet")
    thin = str(tmp_path / "thin.parquet")
    write(fat, 20, (800, 800))   # ~640KB/row (random = incompressible)
    write(thin, 20, (40, 40))    # ~1.6KB/row
    splits = media_splits_by_cost([fat, thin], n_splits=10)
    fat_splits = [s for s in splits if s["path"] == fat]
    thin_splits = [s for s in splits if s["path"] == thin]
    assert len(fat_splits) >= 8 and len(thin_splits) <= 2
    for f, n in ((fat, 20), (thin, 20)):
        ss = sorted((s["row_start"], s["row_count"]) for s in splits if s["path"] == f)
        covered = [r for st, c in ss for r in range(st, st + c)]
        assert covered == list(range(n))
