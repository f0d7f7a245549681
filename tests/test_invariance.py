"""Ordering invariance (SURVEY.md §5.4) and property-based span semantics
(§5.6): reading order must be fully data-carried, never an artifact of block
order or scheduling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from tesseract_recognize_ray.config import PipelineConfig
from tesseract_recognize_ray.pipelines.extract import extract_spans, extract_spans_from
from tesseract_recognize_ray.stages.assemble import _assemble_frame

OUT_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[OUT_COLS].sort_values(["doc_id", "seq"], kind="mergesort").reset_index(drop=True).fillna("<N>")


def test_shuffled_input_same_output(ray_session, tiny_corpus):
    """Randomly shuffled input block order -> byte-identical sorted output."""
    base = _canon(extract_spans(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas())

    docs = rd.read_parquet(tiny_corpus["docs"], override_num_blocks=7).random_shuffle(seed=13)
    media = rd.read_parquet(
        tiny_corpus["media"], columns=["media_ref", "bytes", "kind", "n_pages"], override_num_blocks=5
    ).random_shuffle(seed=99)
    shuffled = _canon(extract_spans_from(docs, media, PipelineConfig()).to_pandas())
    pd.testing.assert_frame_equal(base, shuffled)


def test_join_strategies_agree(ray_session, tiny_corpus):
    """Broadcast and hash J1 strategies produce identical output."""
    a = _canon(extract_spans(tiny_corpus["docs"], tiny_corpus["media"], join_strategy="broadcast").to_pandas())
    b = _canon(
        extract_spans_from(
            rd.read_parquet(tiny_corpus["docs"]),
            rd.read_parquet(tiny_corpus["media"], columns=["media_ref", "bytes", "kind", "n_pages"]),
            PipelineConfig(),
            join_strategy="hash",
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------- property-based

_span_row = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "media"]),
        "text": st.text(alphabet="ABC .,-", min_size=0, max_size=12),
    }
)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(st.lists(_span_row, min_size=0, max_size=6), min_size=1, max_size=5),
    n_lines=st.integers(min_value=1, max_value=3),
)
def test_assemble_properties(docs, n_lines):
    """For ANY interleaving of text/media spans: text spans pass through
    untouched in offset order; media expansions replace their span in place,
    internally ordered by (page, block, line); seq is dense per doc."""
    rows = []
    for di, spans in enumerate(docs):
        doc_id = f"d{di:03d}"
        offset = 0
        for si, sp in enumerate(spans):
            if sp["kind"] == "text":
                rows.append(
                    {
                        "doc_id": doc_id, "order": offset, "media_ref": None,
                        "page": -1, "n_pages": 0, "block": -1, "para": -1,
                        "line": -1, "text": sp["text"], "conf": None,
                    }
                )
                offset += max(1, len(sp["text"]))
            else:
                ref = f"m{di}-{si}"
                for ln in range(n_lines):
                    rows.append(
                        {
                            "doc_id": doc_id, "order": offset, "media_ref": ref,
                            "page": 0, "n_pages": 1, "block": 0, "para": 0,
                            "line": ln, "text": f"L{ln}", "conf": 1.0,
                        }
                    )
                offset += 1
    if not rows:
        return
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=7)  # scramble
    out = _assemble_frame(df)

    for doc_id, g in out.groupby("doc_id"):
        # dense seq
        assert g["seq"].tolist() == list(range(len(g)))
        # non-decreasing order column; text spans untouched and in offset order
        assert (np.diff(g["order"].to_numpy()) >= 0).all()
        texts = g[g["media_ref"].isna()]
        src = df[(df["doc_id"] == doc_id) & (df["media_ref"].isna())].sort_values("order")
        assert texts["text"].tolist() == src["text"].tolist()
        # media expansions are contiguous and line-ordered within each span
        for ref, m in g[g["media_ref"].notna()].groupby("media_ref"):
            idx = m.index.to_numpy()
            assert (np.diff(g.index.get_indexer(idx)) == 1).all()
            assert m["line_id"].str.extract(r"_l(\d+)$")[0].astype(int).is_monotonic_increasing
