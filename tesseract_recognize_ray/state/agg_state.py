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

Only count and sum are accepted: they are their own merge (sum of partials
== aggregate of the union), so a refresh is one bucketed reduce over
|state keys| + |delta combiner| rows. min/max are also mergeable and could
be added; mean/quantiles must be derived from mergeable parts (sum+count /
sketches — see functions/sketches.py)."""

from __future__ import annotations

import os
import shutil

import ray.data

from ..functions.relational import grouped_agg

_MERGEABLE = {"count", "sum"}


def _check_specs(specs: list[tuple[str, str, str]]) -> list[str]:
    aliases = []
    for col, fn, alias in specs:
        if fn not in _MERGEABLE:
            raise ValueError(
                f"agg_state: fn {fn!r} is not self-mergeable (count/sum only); "
                "decompose mean into sum+count, quantiles into a sketch"
            )
        aliases.append(alias)
    if len(set(aliases)) != len(aliases):
        raise ValueError("agg_state: duplicate aliases")
    return aliases


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
    aliases = _check_specs(specs)
    state = ray.data.read_parquet(path)
    dp = grouped_agg(delta, keys, specs)
    merged = grouped_agg(state.union(dp), keys, [(a, "sum", a) for a in aliases])
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
