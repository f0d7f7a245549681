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

import pyarrow as pa
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
    reduce_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Merge a delta batch into the persisted state: aggregate ONLY the
    delta (combiner path), union with the stored per-key partials, and
    re-reduce by summing each alias — exactly equal to re-aggregating
    base ∪ delta from scratch, at O(delta) cost. With ``update=True`` the
    merged state replaces the stored one (write-new / swap — a failed run
    leaves the old state intact, the resume contract of state/manifest.py).

    ``reduce_blocks`` forwards to both grouped_agg exchanges (the sort
    exchange pays per input block — see grouped_agg's docstring): set it
    ONLY when the key domain is known reducer-sized; the default None is
    the scale-safe choice for unbounded key domains."""
    merges = _check_specs(specs)
    state = ray.data.read_parquet(path)
    # the delta needs only the MAP-SIDE combiner (one pyarrow group_by per
    # block), not its own bucketed reduce: the single merge reduce below is
    # shared with the state partials — one exchange total, not two
    uniq = list(dict.fromkeys((col, fn) for col, fn, _ in specs))

    def partial(b: "pa.Table") -> "pa.Table":
        gb = b.group_by(keys).aggregate(uniq)
        cols = {k: gb.column(k) for k in keys}
        for col, fn, alias in specs:
            cols[alias] = gb.column(f"{col}_{fn}")
        return pa.table(cols)

    dp = delta.map_batches(partial, batch_format="pyarrow")
    merged = grouped_agg(
        state.union(dp),
        keys,
        [(a, fn, a) for a, fn in merges],
        reduce_blocks=reduce_blocks,
    )
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
