"""G3 ordering / id scheme and G4 sentinel filler unit tests (SURVEY.md §5.2)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from tesseract_recognize_ray.stages.assemble import (
    assemble_group,
    explode_media_map,
    explode_text_spans,
    fill_sentinel_words,
)


def _docs_batch():
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    spans = [
        [
            {"kind": "text", "text": "  HELLO  ", "media_ref": None, "offset": 0},
            {"kind": "media", "text": None, "media_ref": "m-1", "offset": 9},
            {"kind": "text", "text": "WORLD", "media_ref": None, "offset": 10},
        ],
        [],
        [{"kind": "media", "text": None, "media_ref": "m-2", "offset": 0}],
    ]
    return pa.table(
        {
            "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "spans": pa.array(spans, pa.list_(span_t)),
        }
    )


def test_explode_text_spans_untouched():
    t = explode_text_spans(_docs_batch())
    assert t.column("doc_id").to_pylist() == ["d1", "d1"]
    # pass-through text is NOT trimmed (north_star: untouched)
    assert t.column("text").to_pylist() == ["  HELLO  ", "WORLD"]
    assert t.column("order").to_pylist() == [0, 10]


def test_explode_media_map():
    t = explode_media_map(_docs_batch())
    assert t.column("media_ref").to_pylist() == ["m-1", "m-2"]
    assert t.column("doc_id").to_pylist() == ["d1", "d3"]
    assert t.column("order").to_pylist() == [9, 0]


def _group_df():
    # one doc: text span at order 5, media lines at order 2 (2 pages, multi)
    return pd.DataFrame(
        {
            "doc_id": ["d1"] * 4,
            "order": [5, 2, 2, 2],
            "media_ref": [None, "m-1", "m-1", "m-1"],
            "page": [-1, 1, 0, 0],
            "n_pages": [0, 2, 2, 2],
            "block": [-1, 0, 1, 0],
            "para": [-1, 0, 0, 0],
            "line": [-1, 0, 2, 0],
            "text": ["TXT", "P2", "B2L3", "P1"],
            "conf": [None, 1.0, 1.0, 1.0],
        }
    )


def test_assemble_group_order_and_ids():
    out = assemble_group(_group_df())
    # reading order: media order 2 (page0 block0, page0 block1, page1), then text at 5
    assert out["text"].tolist() == ["P1", "B2L3", "P2", "TXT"]
    assert out["seq"].tolist() == [0, 1, 2, 3]
    assert out["region_id"].tolist() == ["pg1_b1", "pg1_b2", "pg2_b1", None]
    assert out["line_id"].tolist() == ["pg1_b1_p1_l1", "pg1_b2_p1_l3", "pg2_b1_p1_l1", None]
    assert out["kind"].tolist() == ["text"] * 4


def test_assemble_group_single_page_no_prefix():
    df = _group_df()
    df = df[df["page"] != 1].copy()
    df.loc[df["media_ref"].notna(), "n_pages"] = 1
    out = assemble_group(df)
    assert out["region_id"].tolist() == ["b1", "b2", None]


def _words(coords):
    return pd.DataFrame(
        {
            "word": range(len(coords)),
            "x0": [c[0] for c in coords],
            "y0": [c[1] for c in coords],
            "x1": [c[2] for c in coords],
            "y1": [c[3] for c in coords],
        }
    )


LINE_BBOX = (100, 10, 200, 20)


def test_sentinel_filler_interpolation():
    w = fill_sentinel_words(
        _words([(100, 10, 120, 20), (0, 0, 0, 0), (150, 10, 200, 20)]), LINE_BBOX
    )
    assert w.loc[1, ["x0", "y0", "x1", "y1"]].tolist() == [120, 10, 150, 20]
    assert w["coords_filled"].tolist() == [False, True, False]


def test_sentinel_filler_extrapolation_single_neighbor():
    w = fill_sentinel_words(_words([(100, 10, 120, 20), (0, 0, 0, 0)]), LINE_BBOX)
    assert w.loc[1, ["x0", "y0", "x1", "y1"]].tolist() == [120, 10, 121, 20]
    w = fill_sentinel_words(_words([(0, 0, 0, 0), (150, 10, 200, 20)]), LINE_BBOX)
    assert w.loc[0, ["x0", "y0", "x1", "y1"]].tolist() == [149, 10, 150, 20]


def test_sentinel_filler_parent_copy():
    w = fill_sentinel_words(_words([(0, 0, 0, 0)]), LINE_BBOX)
    assert w.loc[0, ["x0", "y0", "x1", "y1"]].tolist() == list(LINE_BBOX)
    assert w["coords_filled"].tolist() == [True]
