"""Incrementally-maintained aggregate state: persist per-key mergeable
partials (count / sum) as parquet, then refresh with a delta batch WITHOUT
rescanning the accumulated history — the materialized-view maintenance
primitive a 100 TB ingest pipeline needs (recomputing a corpus-wide
aggregate per arriving shard is O(history) per shard; merging partials is
O(delta + |keys|)).

Beyond-reference scale path (the reference engine, tesseract-recognize.cc,
recomputes every run and keeps no state); same persistence philosophy as
state/shard_index.py (cross-run dedup) and functions/dedup.build_lsh_index
(cross-run LSH): state lives in parquet, each run is a pure Ray Data job.

Only self-mergeable aggregates are accepted — count/sum merge by summing
the partials, min/max by re-min/maxing them — so a refresh is one bucketed
reduce over |state keys| + |delta combiner| rows. mean/quantiles must be
derived from mergeable parts (sum+count / sketches — see
functions/sketches.py)."""

from __future__ import annotations

import os
import shutil

import ray.data

from ..functions.relational import grouped_agg

# alias -> the reduce that merges two partials of that aggregate
_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def _check_specs(specs: list[tuple[str, str, str]]) -> list[tuple[str, str]]:
    merges = []
    for col, fn, alias in specs:
        if fn not in _MERGE_FN:
            raise ValueError(
                f"agg_state: fn {fn!r} is not self-mergeable "
                f"({sorted(_MERGE_FN)} only); decompose mean into sum+count, "
                "quantiles into a sketch"
            )
        merges.append((alias, _MERGE_FN[fn]))
    if len({a for a, _ in merges}) != len(merges):
        raise ValueError("agg_state: duplicate aliases")
    return merges


def agg_state_build(
    ds: "ray.data.Dataset",
    keys: list[str],
    specs: list[tuple[str, str, str]],
    path: str,
) -> str:
    """Aggregate ``ds`` by ``keys`` with specs [(col, fn, alias)] and persist
    one row per key of partials at ``path`` (a parquet directory). The
    aggregate itself is grouped_agg's combine path (per-block pyarrow
    pre-aggregation, bucketed reduce)."""
    _check_specs(specs)
    os.makedirs(path, exist_ok=True)
    grouped_agg(ds, keys, specs).write_parquet(path)
    return path


def agg_state_refresh(
    delta: "ray.data.Dataset",
    keys: list[str],
    specs: list[tuple[str, str, str]],
    path: str,
    *,
    update: bool = False,
) -> "ray.data.Dataset":
    """Merge a delta batch into the persisted state: aggregate ONLY the
    delta (combiner path), union with the stored per-key partials, and
    re-reduce by summing each alias — exactly equal to re-aggregating
    base ∪ delta from scratch, at O(delta) cost. With ``update=True`` the
    merged state replaces the stored one (write-new / swap — a failed run
    leaves the old state intact, the resume contract of state/manifest.py)."""
    merges = _check_specs(specs)
    state = ray.data.read_parquet(path)
    dp = grouped_agg(delta, keys, specs)
    merged = grouped_agg(state.union(dp), keys, [(a, fn, a) for a, fn in merges])
    if update:
        merged = merged.materialize()
        nxt = path.rstrip("/") + ".next"
        old = path.rstrip("/") + ".old"
        shutil.rmtree(nxt, ignore_errors=True)
        os.makedirs(nxt)
        merged.write_parquet(nxt)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(nxt, path)
        shutil.rmtree(old, ignore_errors=True)
    return merged
