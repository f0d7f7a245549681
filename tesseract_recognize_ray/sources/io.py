"""Dataset readers/writers (reference sources S1-S4 / sink K1, SURVEY.md §2.1-2.2).

The canonical input is a Lance table of interleaved documents
(BASELINE.json: input_hint); this sandbox has no lance package, so Parquet is
the physical format and Lance is attempted first and gated behind an import
check. The reader prunes columns at the read (scale rule: never load bytes a
stage won't touch).
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset


def _read(path: str, columns: list[str] | None = None) -> Dataset:
    if path.endswith(".lance") or path.endswith(".lance/"):
        try:
            import lance  # noqa: F401

            return rd.read_lance(path, columns=columns)
        except ImportError as e:
            raise ImportError(
                "lance input requested but the lance package is unavailable "
                "in this environment; use parquet"
            ) from e
    return rd.read_parquet(path, columns=columns)


def read_docs(path: str) -> Dataset:
    """Interleaved docs table: doc_id, spans (input_hint shape)."""
    return _read(path, columns=["doc_id", "spans"])


def read_media(path: str, with_bytes: bool = True) -> Dataset:
    """Media payload table (FIXTURES.md §2). with_bytes=False reads only the
    metadata columns (for cost estimation / validation joins)."""
    cols = ["media_ref", "bytes", "kind", "n_pages"] if with_bytes else ["media_ref", "width", "height", "kind", "n_pages"]
    return _read(path, columns=cols)


def write_spans(ds: Dataset, out_dir: str, **kw) -> None:
    """K1 sink: partitioned parquet directory (never one giant file);
    deterministic resume layout is handled by state/manifest.py."""
    try:
        import lance  # noqa: F401

        if out_dir.endswith(".lance"):
            ds.write_lance(out_dir, **kw)
            return
    except ImportError:
        pass
    ds.write_parquet(out_dir, **kw)


def compact_parquet(in_dir: str, out_dir: str, target_rows: int = 1_000_000) -> int:
    """Small-file compaction (the maintenance half of resumable partitioned
    output: many per-partition files from incremental/resumed runs -> few
    target-sized files): one streaming read, a count, a coalescing
    repartition to ceil(n/target_rows) blocks, one write. Returns the row
    count. Purely physical — row content and schema are untouched."""
    import math

    import ray.data as rd

    ds = rd.read_parquet(in_dir)
    n = ds.count()
    if n == 0:
        return 0
    blocks = max(1, math.ceil(n / target_rows))
    rd.read_parquet(in_dir).repartition(blocks).write_parquet(out_dir)
    return n
