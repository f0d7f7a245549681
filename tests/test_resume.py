"""Resume semantics: partial run -> resume -> identical output, finished
partitions never re-processed (SURVEY.md §5.5)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from tesseract_recognize_ray.config import PipelineConfig
from tesseract_recognize_ray.pipelines.runner import doc_partition, run_partitioned
from tesseract_recognize_ray.state import manifest as mf

GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _read_out(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    return (
        pd.concat([pq.read_table(f).to_pandas() for f in files])
        .sort_values(["doc_id", "seq"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_partial_then_resume(ray_session, tiny_corpus, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig()
    n_parts = 4

    # simulated crash: only partitions 0 and 1 complete
    r1 = run_partitioned(tiny_corpus["docs"], tiny_corpus["media"], out_dir, cfg, n_parts, parts=[0, 1])
    assert r1["ran"] == [0, 1] and r1["skipped"] == []
    stamps = {i: mf.read_entry(out_dir, i)["completed_at"] for i in (0, 1)}

    # resume: 0/1 skipped untouched, 2/3 run
    r2 = run_partitioned(tiny_corpus["docs"], tiny_corpus["media"], out_dir, cfg, n_parts)
    assert r2["skipped"] == [0, 1] and r2["ran"] == [2, 3]
    for i in (0, 1):
        assert mf.read_entry(out_dir, i)["completed_at"] == stamps[i]  # not re-run

    out = _read_out(out_dir)
    gold = (
        pq.read_table(tiny_corpus["golden_spans"])
        .to_pandas()
        .sort_values(["doc_id", "seq"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[GOLD_COLS].fillna("<N>"), gold[GOLD_COLS].fillna("<N>")
    )

    # partition assignment is deterministic and matches the manifest metrics
    total_docs = sum(e["docs"] for e in mf.read_all(out_dir))
    n_docs_with_spans = pq.read_table(tiny_corpus["docs"]).num_rows
    assert total_docs == n_docs_with_spans
    assert doc_partition("doc-00000000", 4) == doc_partition("doc-00000000", 4)


def test_lineage_change_invalidates(ray_session, tiny_corpus, tmp_path):
    out_dir = str(tmp_path / "out2")
    run_partitioned(tiny_corpus["docs"], tiny_corpus["media"], out_dir, PipelineConfig(), 2, parts=[0])
    # a config change must re-run the partition (different semantics)
    r = run_partitioned(
        tiny_corpus["docs"], tiny_corpus["media"], out_dir, PipelineConfig(only_layout=True), 2, parts=[0]
    )
    assert r["ran"] == [0]


def test_sharded_runner_resume(ray_session, tmp_path):
    """File-aligned shard mode: zero-read-amplification partitions, same
    resume semantics, golden equality across the union of parts."""
    from tesseract_recognize_ray.fixtures import generate_corpus_sharded
    from tesseract_recognize_ray.pipelines.runner import run_partitioned_sharded

    corp = str(tmp_path / "corpus")
    paths = generate_corpus_sharded(corp, 200, shard_docs=50)
    names = sorted(os.listdir(paths["docs"]))
    assert len(names) == 4

    out_dir = str(tmp_path / "out_sharded")
    cfg = PipelineConfig()
    r1 = run_partitioned_sharded(paths["docs"], paths["media"], out_dir, cfg, parts=names[:2])
    assert r1["ran"] == names[:2] and r1["skipped"] == []
    r2 = run_partitioned_sharded(paths["docs"], paths["media"], out_dir, cfg)
    assert r2["skipped"] == names[:2] and r2["ran"] == names[2:]

    out = _read_out(out_dir)
    gold = (
        pd.concat(
            pq.read_table(os.path.join(paths["golden_spans"], n)).to_pandas() for n in names
        )
        .sort_values(["doc_id", "seq"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[GOLD_COLS].fillna("<N>"), gold[GOLD_COLS].fillna("<N>")
    )
