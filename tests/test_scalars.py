"""Unit tests for the reference-exact scalar semantics (SURVEY.md §5.2):
M2 page-set parse, M4 PSM legality, M5 trim, M7 quad vertex order + sentinel,
M8 baseline clip / polystripe, M10 id scheme, G1 angle buckets."""

import math

import pytest

from tesseract_recognize_ray.config import PipelineConfig
from tesseract_recognize_ray.geometry import (
    DOWN,
    LEFT,
    RIGHT,
    SENTINEL_QUAD,
    UP,
    bucket_angle,
    clip_baseline,
    dominant_angle,
    polystripe,
    quad_from_bbox,
    seg_intersection,
)
from tesseract_recognize_ray.idscheme import line_id, parse_pages_set, region_id


# --- M2, tesseract-recognize.cc:222-235 ---
def test_page_set_parse():
    assert parse_pages_set("0,2-4") == [0, 2, 3, 4]
    assert parse_pages_set("3,1,1,0-1") == [0, 1, 3]  # dedup + ascending (O2)
    with pytest.raises(ValueError):
        parse_pages_set("4-2")
    with pytest.raises(ValueError):
        parse_pages_set("1,,2")


# --- M4, tesseract-recognize.cc:256-271,560-588 ---
def test_psm_oem_validation():
    PipelineConfig(psm=3)
    PipelineConfig(psm=1)
    for bad in (0, 2, 14):
        with pytest.raises(ValueError):
            PipelineConfig(psm=bad)
    with pytest.raises(ValueError):
        PipelineConfig(oem=7)


def test_node_level_psm():
    PipelineConfig.check_node_psm("line", 7)
    PipelineConfig.check_node_psm("word", 8)
    PipelineConfig.check_node_psm("glyph", 10)
    PipelineConfig.check_node_psm("region", 3)
    with pytest.raises(ValueError):
        PipelineConfig.check_node_psm("line", 3)
    with pytest.raises(ValueError):
        PipelineConfig.check_node_psm("glyph", 8)


def test_selection_level():
    cfg = PipelineConfig(layout_level="line")
    cfg.check_selection_level("region")
    cfg.check_selection_level("line")
    with pytest.raises(ValueError):
        cfg.check_selection_level("word")


# --- M7, tesseract-recognize.cc:155-175 ---
def test_quad_vertex_order_by_orientation():
    bbox = (1, 2, 5, 8)
    assert quad_from_bbox(*bbox, UP) == [(1, 2), (5, 2), (5, 8), (1, 8)]
    assert quad_from_bbox(*bbox, RIGHT) == [(5, 2), (5, 8), (1, 8), (1, 2)]
    assert quad_from_bbox(*bbox, LEFT) == [(1, 8), (1, 2), (5, 2), (5, 8)]
    assert quad_from_bbox(*bbox, DOWN) == [(5, 8), (1, 8), (1, 2), (5, 2)]


def test_quad_sentinel_whole_page():
    assert quad_from_bbox(0, 0, 100, 50, UP, page_w=100, page_h=50) == SENTINEL_QUAD


def test_quad_crop_offsets():
    q = quad_from_bbox(1, 1, 2, 2, UP, off_x=10, off_y=20)
    assert q == [(11, 21), (12, 21), (12, 22), (11, 22)]


# --- M8, tesseract-recognize.cc:177-203 ---
def test_seg_intersection():
    assert seg_intersection((0, 0), (2, 2), (0, 2), (2, 0)) == (1, 1)
    assert seg_intersection((0, 0), (1, 0), (0, 1), (1, 1)) is None


def test_clip_baseline_to_quad_edges():
    quad = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (0.0, 4.0)]
    clipped = clip_baseline(((2.0, 3.0), (8.0, 3.0)), quad)
    assert clipped == ((0.0, 3.0), (10.0, 3.0))


def test_clip_baseline_no_intersection_keeps_raw():
    degenerate = [(0.0, 0.0), (0.0, 0.0), (0.0, 0.0), (0.0, 0.0)]
    bl = ((2.0, 3.0), (8.0, 3.0))
    assert clip_baseline(bl, degenerate) == bl


def test_polystripe_formulas():
    quad = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (0.0, 4.0)]
    bl = ((0.0, 3.0), (10.0, 3.0))
    h, off = polystripe(bl, quad)
    # up1=up2=3, down1=down2=1 -> height=0.5*8=4, offset=0.5*2/4=0.25
    assert h == 4.0
    assert off == 0.25


# --- G1, tesseract-recognize.cc:800-813 ---
def test_angle_buckets():
    assert bucket_angle(0.0) == 0
    assert bucket_angle(math.pi / 2) == -90
    assert bucket_angle(-math.pi / 2) == 90
    assert bucket_angle(math.pi) == 180
    assert bucket_angle(math.pi / 4) == -90  # inclusive lower edge
    assert bucket_angle(-math.pi / 4) == 90
    assert bucket_angle(3 * math.pi / 4) == 180  # |theta| >= 3pi/4 wins
    assert bucket_angle(0.2) == 0


def test_dominant_angle_weighted():
    assert abs(dominant_angle([0.0, math.pi / 2], [10.0, 0.001])) < 0.01
    assert dominant_angle([]) == 0.0


# --- M10, tesseract-recognize.cc:657-674,724-727 ---
def test_id_scheme():
    assert region_id(0) == "b1"
    assert region_id(2, page=1, n_pages=3) == "pg2_b3"
    assert region_id(0, page=0, n_pages=1) == "b1"
    assert region_id(1, crop_prefix="r7") == "r7_b2"
    assert line_id("b1", para=0, line=0) == "b1_p1_l1"
    assert line_id("pg2_b3", para=1, line=4) == "pg2_b3_p2_l5"
