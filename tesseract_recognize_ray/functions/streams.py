"""Event-stream operators over the events table: sessionization and
tumbling-window aggregation. The reference has no streaming constructs
(SURVEY.md §2.11) — these are the brief's large-scale-pipeline additions,
expressed batch-first (Ray Data's streaming executor is an execution
strategy, not a semantic):

  sessionize       — per-key gap-based session ids: groupby(key).map_groups,
                     vectorized cumsum over gap > timeout (the shuffle key is
                     the partition key, same co-location as any window op).
  tumbling_agg     — fixed-window aggregate: window start derived per row
                     with vectorized timestamp arithmetic (no shuffle beyond
                     the one grouped_agg), then combiner + groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .relational import grouped_agg


def sessionize(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap_seconds: float,
    out_col: str = "session_id",
    order_cols: list[str] | None = None,
) -> Dataset:
    """Assign per-key session ids: a new session starts when the gap to the
    previous event exceeds gap_seconds. session_id is 0-based per key in
    time order — deterministic given (key, ts, tiebreak order)."""
    order = [ts_col] + (order_cols or [])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        # normalize to ns regardless of the parquet/pandas unit (datetime64[us]
        # under pandas>=2 — a bare astype(int64) would silently be µs)
        ts = g[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64")
        gap = np.diff(ts, prepend=ts[0] if len(ts) else 0) > gap_seconds * 1e9
        if len(gap):
            gap[0] = False
        g[out_col] = np.cumsum(gap).astype(np.int64)
        return g

    return ds.groupby(key).map_groups(fn, batch_format="pandas")


def tumbling_agg(
    ds: Dataset,
    ts_col: str,
    window_seconds: int,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    window_col: str = "window_start",
) -> Dataset:
    """Fixed (tumbling) window aggregate: floor each timestamp to its window
    start, then combiner-style grouped_agg on (window, *keys). Epoch-aligned
    windows (same semantics as SQL's epoch-based date binning).

    The window column is int64 EPOCH SECONDS, not a timestamp: timestamp
    units do not survive the groupby shuffle intact (observed unit coercion),
    and integer keys hash/compare bit-exactly everywhere."""
    # timestamp[us] casts to int64 MICROseconds — keep all arithmetic in us
    w_us = int(window_seconds) * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        # normalize the unit first: parquet yields timestamp[us], pandas
        # sources yield timestamp[ns] — a bare int64 cast would be off 1000x
        ts = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
        start_s = pc.multiply(pc.divide(ts, w_us), window_seconds)
        return batch.append_column(window_col, start_s)

    with_w = ds.map_batches(add_window, batch_format="pyarrow")
    return grouped_agg(with_w, [window_col, *keys], specs)
