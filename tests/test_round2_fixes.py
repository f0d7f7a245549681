"""Regression tests for the round-1 review findings (ADVICE.md):

  * topk tiebreak pruned with the wrong direction when >= k rows tie at the
    cutoff value inside one batch;
  * tumbling_agg truncated toward zero instead of flooring, mis-binning
    pre-epoch timestamps;
  * quarantined media (level='error') silently dropped from the flagship
    span output;
  * a page with no detected lines omitted from the PAGE XML, shifting the
    global page counter off the reference's addPage semantics.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from tesseract_recognize_ray.functions import relational as F


def test_topk_ties_at_cutoff(ray_session):
    """100 equal values in ONE block, k=10, tiebreak asc -> keys 0..9 (the
    global sort's answer), not an arbitrary/descending tied subset."""
    df = pd.DataFrame({"key": np.arange(100, dtype=np.int64), "val": np.ones(100)})
    ds = rd.from_pandas(df).repartition(1)
    out = F.topk(ds, "val", 10, descending=True, tiebreak=["key"]).to_pandas()
    assert sorted(out["key"].tolist()) == list(range(10))


def test_tumbling_pre_epoch_floor(ray_session):
    """Floor semantics: ts = 1us before the epoch belongs to the window
    starting at -window_seconds, not window 0 (SQL `//` floors)."""
    from tesseract_recognize_ray.functions import streams as F_st

    ts = pd.to_datetime(
        ["1969-12-31 23:59:59.999999", "1970-01-01 00:00:00", "1969-12-31 23:00:00"],
        format="ISO8601",
    )
    df = pd.DataFrame({"ts": ts, "k": ["a", "a", "a"], "v": [1, 1, 1]})
    out = F_st.tumbling_agg(
        rd.from_pandas(df), "ts", 3600, ["k"], [("v", "sum", "s")], window_col="w"
    ).to_pandas()
    got = dict(zip(out["w"], out["s"]))
    assert got == {-3600: 2, 0: 1}


def test_quarantine_error_rows_reach_span_output(ray_session, tmp_path):
    """A quarantined media row must appear in the flagship output as a
    kind='error' span at its document position — observable, never dropped."""
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.fixtures import encode_raster
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    good = encode_raster(np.full((40, 60), 255, dtype=np.uint8))
    bad = b"\xff\xff\xff\x7f\xff\xff\xff\x7f corrupt"
    media = pa.table(
        {
            "media_ref": pa.array(["m-good", "m-bad"], pa.string()),
            "bytes": pa.array([good, bad], pa.large_binary()),
            "kind": pa.array(["page", "page"], pa.string()),
            "n_pages": pa.array([1, 1], pa.int32()),
        }
    )
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    docs = pa.table(
        {
            "doc_id": pa.array(["d0"], pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": "text", "text": "intro", "media_ref": None, "offset": 0},
                        {"kind": "media", "text": None, "media_ref": "m-good", "offset": 5},
                        {"kind": "media", "text": None, "media_ref": "m-bad", "offset": 6},
                    ]
                ],
                pa.list_(span_t),
            ),
        }
    )
    mp, dp = str(tmp_path / "media.parquet"), str(tmp_path / "docs.parquet")
    pq.write_table(media, mp)
    pq.write_table(docs, dp)
    out = extract_spans(dp, mp, PipelineConfig(quarantine=True)).to_pandas()
    errs = out[out["kind"] == "error"]
    assert len(errs) == 1
    assert errs["media_ref"].iloc[0] == "m-bad" and errs["order"].iloc[0] == 6
    assert "intro" in set(out["text"])  # the rest of the doc is intact


def test_minhash_truncation_flagged(ray_session):
    """A hot LSH bucket larger than max_bucket is truncated but never
    silently: every surviving pair from it carries bucket_truncated=True."""
    from tesseract_recognize_ray.functions import dedup as F_dedup

    text = "identical content repeated across many documents " * 4
    df = pd.DataFrame({"id": np.arange(30, dtype=np.int64), "text": [text] * 30})
    out = F_dedup.minhash_lsh_pairs(
        rd.from_pandas(df), "id", "text", num_perm=16, bands=4, max_bucket=8
    ).to_pandas()
    assert len(out) > 0 and out["bucket_truncated"].all()
    # ids beyond the per-bucket cap never appear (truncation is real)
    assert out[["id_a", "id_b"]].to_numpy().max() < 8

    small = pd.DataFrame(
        {"id": np.arange(4, dtype=np.int64), "text": [text, text, "other words entirely", "third thing here"]}
    )
    out2 = F_dedup.minhash_lsh_pairs(
        rd.from_pandas(small), "id", "text", num_perm=16, bands=4, max_bucket=8
    ).to_pandas()
    assert not out2["bucket_truncated"].any()


def test_pagexml_blank_page_emitted(ray_session):
    """A multipage media whose page 0 has no lines still emits an (empty)
    <Page> element, and the next page's region ids keep the pg{N}_ prefix
    derived from the FULL page count (reference addPage counter)."""
    import xml.etree.ElementTree as ET

    from tesseract_recognize_ray.pagexml import PAGE_NS, elements_to_pagexml

    rows = pd.DataFrame(
        {
            "media_ref": ["m0"],
            "page": [1],
            "n_pages": [2],
            "order": [0],
            "block": [0],
            "para": [0],
            "line": [0],
            "word": [-1],
            "level": ["line"],
            "x0": [10],
            "y0": [10],
            "x1": [50],
            "y1": [20],
            "baseline_y": [20],
            "orientation_k": [0],
            "text": ["HELLO"],
            "conf": [1.0],
        }
    )
    xml = elements_to_pagexml("d0", rows)
    root = ET.fromstring(xml)
    pages = root.findall(f"{{{PAGE_NS}}}Page")
    assert len(pages) == 2
    assert len(pages[0]) == 0  # blank page: no children
    regs = pages[1].findall(f"{{{PAGE_NS}}}TextRegion")
    assert [r.get("id") for r in regs] == ["pg2_b1"]
