"""End-to-end golden run + parallelism invariance (SURVEY.md §5.3-5.4).

The north_star gate: full pipeline over the seeded corpus must reproduce
per-document span-sequence equality (kind, text, media_ref, order) plus the
structural columns (seq, region_id, line_id) against golden_spans.
"""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tesseract_recognize_ray.config import PipelineConfig
from tesseract_recognize_ray.pipelines.extract import extract_spans

GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[GOLD_COLS]
        .sort_values(["doc_id", "seq"], kind="mergesort")
        .reset_index(drop=True)
        .fillna("<NULL>")
    )


@pytest.fixture(scope="module")
def golden(tiny_corpus):
    return pq.read_table(tiny_corpus["golden_spans"]).to_pandas()


def test_e2e_span_equality_broadcast(ray_session, tiny_corpus, golden):
    out = extract_spans(tiny_corpus["docs"], tiny_corpus["media"], join_strategy="broadcast").to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))
    # recognized spans all carry full confidence on the closed alphabet
    assert (out.loc[out["media_ref"].notna(), "conf"] == 1.0).all()


def test_e2e_span_equality_hash_join(ray_session, tiny_corpus, golden):
    cfg = PipelineConfig(join_partitions=4)
    out = extract_spans(tiny_corpus["docs"], tiny_corpus["media"], cfg, join_strategy="hash").to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


def test_e2e_batchsize_invariance(ray_session, tiny_corpus, golden):
    """Same corpus under different batch/parallelism shapes -> identical
    sorted output (guards the data-carried ordering design, SURVEY.md O1)."""
    cfg = PipelineConfig(
        decode_batch_size=3,
        segment_batch_size=2,
        recognize_batch_size=5,
        recognize_concurrency=(1, 2),
    )
    out = extract_spans(tiny_corpus["docs"], tiny_corpus["media"], cfg).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


def test_page_set_selection(ray_session, tiny_corpus):
    """S2: page selection drops non-selected pages of multipage media."""
    cfg = PipelineConfig(page_set="0")
    out = extract_spans(tiny_corpus["docs"], tiny_corpus["media"], cfg).to_pandas()
    media_rows = out[out["media_ref"].notna()]
    assert not media_rows["region_id"].str.startswith("pg2").any()
