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
    num_buckets: int = 64,
) -> Dataset:
    """Assign per-key session ids: a new session starts when the gap to the
    previous event exceeds gap_seconds. session_id is 0-based per key in
    time order — deterministic given (key, ts, tiebreak order).

    Scale shape: the shuffle groups by hash(key) % num_buckets, NOT by key —
    one map_groups call per bucket, with the per-key session arithmetic fully
    vectorized inside (sort + shift + cumsum + transform('first'); no python
    per key). At 10^6+ keys, per-key group dispatch would dominate."""
    order = [ts_col] + (order_cols or [])

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..hashing import stable_bucket

        batch["__bucket"] = stable_bucket(batch[key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([key, *order], kind="mergesort")
        # normalize to ns regardless of the parquet/pandas unit (datetime64[us]
        # under pandas>=2 — a bare astype(int64) would silently be µs)
        ts = g[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64")
        new_key = g[key].ne(g[key].shift()).to_numpy()
        gap = np.diff(ts, prepend=ts[0] if len(ts) else 0) > gap_seconds * 1e9
        starts = new_key | gap
        gs = np.cumsum(starts)
        g["__gs"] = gs
        g[out_col] = (gs - g.groupby(key, sort=False)["__gs"].transform("first").to_numpy()).astype(np.int64)
        return g.drop(columns="__gs")

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(fn, batch_format="pandas")


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
        # FLOOR division (SQL `//` semantics): pc.divide truncates toward
        # zero, binning pre-epoch timestamps one window too late — compute
        # the euclidean remainder explicitly so negatives floor correctly
        rem = pc.subtract(ts, pc.multiply(pc.divide(ts, w_us), w_us))
        rem = pc.if_else(pc.less(rem, 0), pc.add(rem, w_us), rem)
        start_s = pc.multiply(pc.divide(pc.subtract(ts, rem), w_us), window_seconds)
        return batch.append_column(window_col, start_s)

    with_w = ds.map_batches(add_window, batch_format="pyarrow")
    return grouped_agg(with_w, [window_col, *keys], specs)


def hopping_agg(
    ds: Dataset,
    ts_col: str,
    window_seconds: int,
    hop_seconds: int,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    window_col: str = "window_start",
) -> Dataset:
    """Hopping (sliding, hop-aligned) window aggregate: every row belongs to
    window_seconds/hop_seconds overlapping windows; a vectorized per-batch
    replication assigns each copy its window start (int64 epoch seconds, same
    rationale as tumbling_agg), then ONE combiner grouped_agg on
    (window, *keys). The replication factor k = window/hop multiplies map
    output rows, never shuffle keys — the exchange still moves one row per
    (window, key) per block. window_seconds must be a multiple of
    hop_seconds."""
    if window_seconds % hop_seconds:
        raise ValueError("hopping_agg: window_seconds must be a multiple of hop_seconds")
    k = window_seconds // hop_seconds
    h_us = int(hop_seconds) * 1_000_000

    def add_windows(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
        # euclidean floor to the hop grid (see tumbling_agg for the negative
        # timestamp rationale)
        rem = pc.subtract(ts, pc.multiply(pc.divide(ts, h_us), h_us))
        rem = pc.if_else(pc.less(rem, 0), pc.add(rem, h_us), rem)
        base_s = pc.multiply(pc.divide(pc.subtract(ts, rem), h_us), hop_seconds)
        parts = []
        for i in range(k):
            parts.append(
                batch.append_column(window_col, pc.subtract(base_s, i * hop_seconds))
            )
        return pa.concat_tables(parts)

    with_w = ds.map_batches(add_windows, batch_format="pyarrow")
    return grouped_agg(with_w, [window_col, *keys], specs)


def funnel_conversions(
    ds: Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    first_type: str,
    then_type: str,
    window_seconds: float,
    num_buckets: int = 64,
) -> Dataset:
    """Two-step windowed funnel (the MATCH_RECOGNIZE-shaped conversion
    query): for every `first_type` event, a conversion is the first
    `then_type` event of the same key STRICTLY later and within
    window_seconds. Returns one row per key with >= 1 conversion:
    (key, conversions, min_latency_us).

    Scale shape: events pre-filter to the two step types at the scan, then
    ONE hash(key) bucket shuffle; inside a bucket every key is matched at
    once with the per-key time-rebasing idiom (same as window_range_sum) —
    key i's timestamps shift by i * GAP where GAP > bucket time span +
    window, so a single global searchsorted of step-1 times into the sorted
    step-2 array can never match across keys. No per-key dispatch, no
    self-join. int64 bound: GAP * keys_per_bucket must stay < 2^63 —
    ~3.5M keys per bucket at a one-month span; raise num_buckets for more."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..hashing import stable_bucket

        batch = batch[batch[type_col].isin([first_type, then_type])][
            [key, ts_col, type_col]
        ]
        batch["__bucket"] = stable_bucket(batch[key], num_buckets)
        return batch

    w_us = int(round(window_seconds * 1e6))
    empty = pd.DataFrame(
        {
            key: pd.Series([], dtype="int64"),
            "conversions": pd.Series([], dtype="int64"),
            "min_latency_us": pd.Series([], dtype="int64"),
        }
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g[key], sort=False)
        ts_us = g[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        if not len(ts_us):
            return empty
        gap = (ts_us.max() - ts_us.min()) + w_us + 2
        reb = (ts_us - ts_us.min()) + codes.astype(np.int64) * gap
        is_first = (g[type_col] == first_type).to_numpy()
        p = np.sort(reb[~is_first])
        c = reb[is_first]
        c_codes = codes[is_first]
        if not len(p) or not len(c):
            return empty
        pos = np.searchsorted(p, c, side="right")  # first strictly-later step-2
        ok = pos < len(p)
        lat = np.where(ok, p[np.minimum(pos, max(len(p) - 1, 0))] - c, np.int64(0))
        ok &= lat <= w_us
        if not ok.any():
            return empty
        hit_codes = c_codes[ok]
        conv = np.bincount(hit_codes, minlength=len(uniq))
        best = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(best, hit_codes, lat[ok])
        mask = conv > 0
        return pd.DataFrame(
            {
                key: pd.Series(np.asarray(uniq)[mask]).astype("int64"),
                "conversions": conv[mask].astype("int64"),
                "min_latency_us": best[mask].astype("int64"),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda d: fn(d.drop(columns="__bucket")), batch_format="pandas")
    )


def time_fill(
    ds: Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    window_seconds: float,
    num_buckets: int = 64,
    max_windows_per_key: int = 1_000_000,
) -> Dataset:
    """Gap-filled tumbling-window aggregate (resample): per key, one row for
    EVERY window between the key's first and last event — count and sum,
    zeros for empty windows. The dense range a SQL engine builds with
    generate_series + LEFT JOIN.

    Scale shape: one combiner groupby collapses events to (key, window)
    partials, then one hash(key) bucket shuffle; the dense ranges are
    generated vectorized inside each bucket (grouped arange over per-key
    spans — no per-key Python) and merged against the sparse rows. A key
    whose span exceeds max_windows_per_key raises ValueError instead of
    silently truncating — densifying a decade of 1-second windows is a
    caller bug, not something to paper over."""
    from ray.data.aggregate import Count, Sum

    from ..hashing import stable_bucket

    w_us = int(round(window_seconds * 1e6))

    def to_win(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                key: b[key],
                "win": np.floor_divide(ts_us, w_us),
                value_col: b[value_col],
            }
        )

    from tesseract_recognize_ray.functions.relational import grouped_agg

    sparse = grouped_agg(
        ds.map_batches(to_win, batch_format="pandas"),
        [key, "win"],
        [(value_col, "sum", "val_sum"), (value_col, "count", "n_events")],
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = stable_bucket(b[key], num_buckets)
        return b

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "win"], kind="mergesort")
        bounds = g.groupby(key, sort=False)["win"].agg(["min", "max"])
        spans = (bounds["max"] - bounds["min"] + 1).to_numpy()
        if (spans > max_windows_per_key).any():
            worst = int(spans.max())
            raise ValueError(
                f"time_fill: a key spans {worst} windows (> max_windows_per_key="
                f"{max_windows_per_key}); widen the window or raise the cap"
            )
        total = spans.sum()
        off = np.cumsum(spans) - spans
        idx = np.arange(total, dtype=np.int64) - np.repeat(off, spans)
        dense = pd.DataFrame(
            {
                key: np.repeat(bounds.index.to_numpy(), spans),
                "win": np.repeat(bounds["min"].to_numpy(), spans) + idx,
            }
        )
        m = dense.merge(g[[key, "win", "val_sum", "n_events"]], on=[key, "win"], how="left")
        m["val_sum"] = m["val_sum"].fillna(0).astype("int64")
        m["n_events"] = m["n_events"].fillna(0).astype("int64")
        return m

    return (
        sparse.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda d: fill(d.drop(columns="__bucket")), batch_format="pandas")
    )


def cohort_retention(
    ds: Dataset,
    user_col: str,
    ts_col: str,
    *,
    cohort_col: str = "cohort_day",
    offset_col: str = "day_offset",
    users_col: str = "users",
    num_partitions: int = 16,
) -> Dataset:
    """Cohort retention matrix over an event log: each user's cohort is its
    first active calendar day; for every (cohort day, day offset) count the
    users active on that day. Days are int64 epoch days end-to-end (no
    date-type hashing ambiguity). Scale shape: (1) a per-batch DISTINCT
    (user, day) combiner so at most one row per user-day per block shuffles;
    (2) ONE bucketed shuffle on hash(user) co-locates each user's activity —
    cohort day (min) and offsets are vectorized pandas transforms inside the
    bucket (per-user state is bounded by the calendar span, never the raw
    event count); (3) a final counting groupby whose output cardinality is
    cohorts x offsets. No join and no driver-side state anywhere."""
    from ..hashing import stable_bucket
    from .relational import grouped_agg

    _US_PER_DAY = 86_400_000_000

    def to_day_pairs(b: pa.Table) -> pd.DataFrame:
        ts = pc.cast(pc.cast(b.column(ts_col), pa.timestamp("us")), pa.int64())
        days = np.floor_divide(ts.to_numpy(zero_copy_only=False), _US_PER_DAY)
        out = pd.DataFrame({user_col: b.column(user_col).to_pandas(), "__day": days})
        out = out.drop_duplicates()  # map-side combiner
        out["__bucket"] = stable_bucket(out[user_col], num_partitions)
        return out

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([user_col, "__day"])
        d0 = g.groupby(user_col, sort=False)["__day"].transform("min")
        return pd.DataFrame(
            {
                cohort_col: d0.to_numpy(),
                offset_col: (g["__day"] - d0).to_numpy(),
            }
        )

    pairs = (
        ds.map_batches(to_day_pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(offsets, batch_format="pandas")
    )
    return grouped_agg(pairs, [cohort_col, offset_col], [(offset_col, "count", users_col)])


def interval_merge(
    ds: Dataset,
    key: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 64,
) -> Dataset:
    """Gaps-and-islands over VARIABLE-LENGTH intervals: merge per-key
    [start, end] intervals that overlap or touch (next.start <= running
    max(end)) into islands. Returns one row per island:
    (key, island, island_start, island_end, n_rows), island 1-based per key
    in start order — exactly SQL's lag-max/cumsum-of-breaks idiom.

    Distinct from sessionize: sessionize merges POINTS by gap (constant
    timeout); here each row carries its own duration, so a long interval can
    absorb many later short ones (running-cummax semantics, not prev-row).

    Scale shape: ONE hash(key) % num_buckets shuffle; inside a bucket every
    key is processed at once — sort by (key, start, end), per-key running
    cummax of end (pandas C groupby.cummax), breaks + cumsum, then ONE
    groupby aggregate for the island bounds. No per-key dispatch."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key, start_col, end_col]]
        batch["__bucket"] = stable_bucket(batch[key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, start_col, end_col], kind="mergesort")
        cm = g.groupby(key, sort=False)[end_col].cummax().to_numpy()
        # exact int64 shift — Series.shift() would round-trip epoch-us
        # values through float64 and lose sub-1024us precision above 2^53
        prev_cm = np.empty_like(cm)
        if len(cm):
            prev_cm[1:] = cm[:-1]
            prev_cm[0] = cm[0]  # overridden: row 0 is always a new key
        new_key = g[key].ne(g[key].shift()).to_numpy()  # forces a break at key boundaries
        s = g[start_col].to_numpy()
        brk = new_key | (s > prev_cm)
        gs = np.cumsum(brk)
        first = pd.Series(gs).groupby(g[key].to_numpy(), sort=False).transform("first").to_numpy()
        g["island"] = gs - first + 1
        out = g.groupby([key, "island"], sort=False).agg(
            island_start=(start_col, "min"),
            island_end=(end_col, "max"),
            n_rows=(start_col, "size"),
        )
        out["n_rows"] = out["n_rows"].astype("int64")
        return out.reset_index()

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(fn, batch_format="pandas")
