"""§3.2 entry point: PAGE XML input -> region crops -> re-recognition.
Round-trip: extract XML from the corpus, re-recognize every TextRegion from
the XML + media only, and the line texts must match the golden spans."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from tesseract_recognize_ray.pagexml import extract_pagexml
from tesseract_recognize_ray.pipelines.rerecognize import rerecognize_pagexml


def test_rerecognize_matches_golden(ray_session, tiny_corpus):
    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"])
    out = rerecognize_pagexml(rd.from_pandas(xml.to_pandas()), tiny_corpus["media"]).to_pandas()

    gold = pq.read_table(tiny_corpus["golden_spans"]).to_pandas()
    media_gold = gold[gold["media_ref"].notna()]

    # per-doc multiset of recognized line texts matches golden exactly
    got = out.groupby("doc_id")["text"].apply(lambda s: sorted(s)).to_dict()
    want = media_gold.groupby("doc_id")["text"].apply(lambda s: sorted(s)).to_dict()
    assert got == want

    # crop-prefixed id scheme (reference :663-666): region ids start with
    # the originating crop's id, lines nest under them
    assert (out["region_id"] == out["crop_id"] + "_b1").all()
    assert out["line_id"].str.startswith(out["region_id"].iloc[0][:2]).any()
    # coords are translated back to page space: all non-negative, x1>x0
    assert (out["x1"] > out["x0"]).all() and (out["y1"] > out["y0"]).all()
    assert (out["conf"] == 1.0).all()
