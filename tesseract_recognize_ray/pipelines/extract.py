"""Flagship extraction pipeline (reference lifecycle §3.1 -> SURVEY.md target
shape): interleaved docs + media tables in, ordered per-document span rows out.

    read(media)  ── decode/expand (S1-S3) ── segment (A2/A3, stateless tasks)
                 ── recognize (A1, actor pool, warm template bank)
                 ── drop pixels ── attach (doc_id, order)   [J1]
    read(docs)   ── explode text spans ────────────┐
                                                   union
                                      groupby(doc_id).map_groups(assemble)  [G3]
                                                   └── flat span rows (SPANS_OUT_SCHEMA)

Scale notes (SURVEY.md §4):
  * the ONLY required shuffle is the groupby(doc_id) reassembly; the J1
    attach is a broadcast lookup when the media->doc map fits in the object
    store (ray.put once, read per actor) and a hash-partitioned
    ``Dataset.join`` otherwise — never a per-batch re-ship;
  * pixels never cross the reassembly shuffle (drop_pixels projects the
    binary column right after recognition);
  * skew from variable page sizes is handled by small pixel-capped batches on
    the segment/recognize stages and, on the fused file path, byte-balanced
    splits (media_splits_by_cost — serialized bytes proxy est_cost=w*h,
    known from parquet metadata before any payload read).
"""

from __future__ import annotations

import os

import ray
from ray.data import Dataset

from ..config import PipelineConfig
from ..idscheme import parse_pages_set
from ..sources.io import read_docs, read_media
from ..stages.assemble import (
    add_doc_bucket,
    assemble_bucket,
    explode_media_map,
    explode_text_spans,
    recognized_to_union,
)
from ..stages.decode import make_decode_pages
from ..stages.recognize import Recognizer, drop_pixels
from ..stages.segment import make_segment_batch

def recognized_lines(media: Dataset | str, cfg: PipelineConfig) -> Dataset:
    """media table -> recognized line rows (no doc context yet)."""
    page_set = parse_pages_set(cfg.page_set) if cfg.page_set else None
    if isinstance(media, str):
        media = read_media(media)
    pages = media.map_batches(
        make_decode_pages(page_set),
        batch_format="pyarrow",
        batch_size=cfg.decode_batch_size,
    )
    lines = pages.map_batches(
        make_segment_batch(cfg.crops_dir if cfg.save_crops else None),
        batch_format="pyarrow",
        batch_size=cfg.segment_batch_size,
    )
    rec = lines.map_batches(
        Recognizer,
        fn_constructor_kwargs={
            "only_layout": cfg.only_layout,
            "emit_words": cfg.layout_level in ("word", "glyph"),
        },
        batch_format="pyarrow",
        batch_size=cfg.recognize_batch_size,
        concurrency=cfg.recognize_concurrency,
        num_cpus=1,
    )
    return rec.map_batches(drop_pixels, batch_format="pyarrow")


def attach_doc_order(rec: Dataset, media_map: Dataset, cfg: PipelineConfig, strategy: str = "auto") -> Dataset:
    """J1: give each recognized line its (doc_id, order).

    'broadcast' ships the (media_ref -> doc_id, order) dict to the object
    store once and looks it up inside map_batches (no shuffle); 'hash' uses
    the hash-partitioned Dataset.join. 'auto' picks by map size."""
    if strategy == "auto":
        # avoid triggering an execution just to pick a strategy: the map is
        # (media_ref, doc_id, order) — tiny relative to the docs file — so
        # gate on the docs file size (a safe over-estimate of the map size)
        try:
            sz = sum(os.path.getsize(f) for f in media_map.input_files())
        except Exception:
            sz = 0
        strategy = "broadcast" if sz <= 256 * 1024 * 1024 else "hash"
    if strategy == "hash":
        # cap partitions by cluster CPUs: the hash join runs one aggregator
        # actor per partition, and partitions > CPUs starves the rest of the
        # pipeline (same failure mode as an over-wide actor pool, §4)
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n_parts = max(2, min(cfg.join_partitions, cpus - 2))
        return rec.join(
            media_map,
            join_type="inner",
            num_partitions=n_parts,
            on=("media_ref",),
        )

    import pyarrow as pa
    import pyarrow.compute as pc

    # broadcast map as ALIGNED ARROW ARRAYS: vectorized concat driver-side,
    # vectorized pc.index_in/pc.take lookup inside every task — no per-row
    # python dict build or list-comprehension probe anywhere on the path
    batches = list(media_map.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not batches:  # empty partition: no media to attach (valid — all-text docs)
        batches = [
            pa.table(
                {"media_ref": pa.array([], pa.string()), "doc_id": pa.array([], pa.string()),
                 "order": pa.array([], pa.int32())}
            )
        ]
    m = pa.concat_tables(batches)
    ref_handle = ray.put(
        (
            m.column("media_ref").combine_chunks(),
            m.column("doc_id").combine_chunks(),
            m.column("order").cast(pa.int32()).combine_chunks(),
        )
    )

    def lookup(batch: pa.Table) -> pa.Table:
        keys, docs, orders = ray.get(ref_handle)
        idx = pc.index_in(batch.column("media_ref"), value_set=keys)
        valid = pc.is_valid(idx)
        if not pc.all(valid).as_py():  # inner-join semantics: unmapped dropped
            batch = batch.filter(valid)
            idx = idx.filter(valid)
        return batch.append_column("doc_id", pc.take(docs, idx)).append_column(
            "order", pc.take(orders, idx)
        )

    return rec.map_batches(lookup, batch_format="pyarrow")


_COALESCE_BLOCK_BYTES = 256 << 20  # target exchange-input block size
_COALESCE_CAP_BYTES = 64 << 30  # above this the stream is already big-block


def auto_assemble_coalesce(est_bytes: int) -> int | None:
    """Derive the reassembly-exchange coalesce width from a byte estimate of
    the span stream (docs-file size is a safe over-estimate: spans are the
    docs' text plus recognized lines, never pixels). The exchange cost in
    Ray 2.49 scales with INPUT BLOCK COUNT, not bytes (config.py sizing
    note; measured 13.8s -> 8.0s at 6k docs / 32 CPUs when 100+ tiny
    post-union blocks coalesce to 16), so small streams coalesce to 16
    blocks and larger ones to ~256 MB each. Unknown (<=0) or huge (>64 GB)
    estimates return None — no coalesce, the scale-safe default: forcing a
    100 TB span stream through few blocks would OOM the exchange."""
    if est_bytes <= 0 or est_bytes > _COALESCE_CAP_BYTES:
        return None
    return max(16, -(-est_bytes // _COALESCE_BLOCK_BYTES))


def _assemble_tail(docs: Dataset, rec: Dataset, cfg: PipelineConfig, join_strategy: str) -> Dataset:
    """Shared pipeline tail: doc-order attach (J1) -> union with untouched
    text spans -> bucketed reassembly shuffle (G3)."""
    text_spans = docs.map_batches(explode_text_spans, batch_format="pyarrow")
    media_map = docs.map_batches(explode_media_map, batch_format="pyarrow")
    rec = attach_doc_order(rec, media_map, cfg, strategy=join_strategy)
    rec_u = rec.map_batches(recognized_to_union, batch_format="pyarrow")

    all_spans = rec_u.union(text_spans)
    # bucketed reassembly shuffle: co-locate by crc32(doc_id) % P, then one
    # vectorized assemble per bucket (amortizes per-group overhead ~1000x vs
    # groupby(doc_id); same correctness — all rows of a doc share a bucket)
    bucketed = all_spans.map_batches(add_doc_bucket(cfg.assemble_buckets), batch_format="pyarrow")
    coalesce = cfg.assemble_coalesce
    if coalesce is None:
        # auto-size from the docs-file byte estimate (same no-execution gate
        # as attach_doc_order's strategy pick); non-file inputs -> est 0 ->
        # no coalesce. CPU gate: the Repartition is one more all-to-all
        # operator in the plan, and on a tiny session (4 CPUs) Ray 2.49's
        # per-operator resource reservation can then leave the recognize
        # actor pool permanently pending (observed: invariance-test plan
        # with 2 RandomShuffles + Repartition + Sort deadlocks at 4 CPUs,
        # runs clean at 8+). The coalesce is a perf knob, never worth a
        # scheduling risk on small sessions.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            cpus = 0
        if cpus >= 8:
            try:
                est = sum(os.path.getsize(f) for f in docs.input_files())
            except Exception:
                est = 0
            coalesce = auto_assemble_coalesce(est)
        else:
            coalesce = 0
    if coalesce:
        # see config.assemble_coalesce: exchange cost ~ input block count;
        # only when the span stream is known reducer-sized
        bucketed = bucketed.repartition(coalesce)
    return bucketed.groupby("__bucket").map_groups(assemble_bucket, batch_format="pandas")


def extract_spans_from(
    docs: Dataset,
    media: Dataset,
    cfg: PipelineConfig | None = None,
    join_strategy: str = "auto",
) -> Dataset:
    """Flagship pipeline over already-constructed datasets (used by the
    partitioned resumable runner, pipelines/runner.py, and any caller whose
    media already lives in a Dataset). NOTE: this path ships pixels across
    stage boundaries; prefer extract_spans (fused file source) when the
    media sits in parquet."""
    cfg = cfg or PipelineConfig()
    rec = recognized_lines(media, cfg)
    return _assemble_tail(docs, rec, cfg, join_strategy)


def extract_spans(
    docs_path: str,
    media_path: str,
    cfg: PipelineConfig | None = None,
    join_strategy: str = "auto",
) -> Dataset:
    """The flagship pipeline; returns the flat ordered span table
    (SPANS_OUT_SCHEMA: doc_id, seq, kind, text, media_ref, order, region_id,
    line_id, conf). Lazy — consume with write/iter/to_pandas.

    The media path is the FUSED source (stages/media_source.py): one
    actor-pool stage does read+decode+segment+recognize per parquet split, so
    pixels never cross the object store — only recognized line rows do."""
    cfg = cfg or PipelineConfig()
    from ..stages.media_source import recognized_lines_from_files

    files = _parquet_files(media_path)
    rec = recognized_lines_from_files(files, cfg)
    return _assemble_tail(read_docs(docs_path), rec, cfg, join_strategy)


def _parquet_files(path: str) -> list[str]:
    import glob as _glob

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
        return files
    return [path]
