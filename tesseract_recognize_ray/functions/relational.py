"""Relational primitives over ray.data.Dataset, built for scale:

  * grouped_agg     — map-side partial aggregation (combiner) before the
    groupby shuffle, so the all-to-all exchange moves one row per key per
    input block instead of every input row (SURVEY.md §4 / ray_guide).
  * broadcast_semi_join / broadcast_anti_join — small-side key set shipped
    once via ray.put, filter inside map_batches; no shuffle (reference J2's
    image↔XML validation pattern, tesseract_recognize_api.py:86-103).
  * hash_join       — hash-partitioned Dataset.join wrapper (both sides big).
  * window_lag      — per-key lag/lead via groupby().map_groups (reference
    J3's prev/next-sibling lookup pattern, tesseract-recognize.cc:817-858).
  * topk            — per-batch local prune, then tiny global sort+limit.
  * distinct_on     — multi-column distinct via groupby-count projection.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    filter: "pa.compute.Expression | None" = None,
) -> Dataset:
    """Column-pruned parquet read of one testdata table. ``num_blocks``
    splits the READ itself (override_num_blocks — no shuffle): a
    single-file table otherwise yields ~1 block, serializing every
    downstream map_batches; production corpora with many input files
    don't need it. ``filter`` is a pyarrow expression pushed INTO the scan
    (row-group statistics pruning + pre-materialization row filtering):
    measured ~2x faster warm than read-then-Dataset.filter on a 25-percent
    selectivity predicate, and the predicate column itself never needs to
    be in ``columns``."""
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=columns,
        override_num_blocks=num_blocks,
        filter=filter,
    )


# ---------------------------------------------------------------- grouped agg
_PARTIAL_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max", "any": "any", "all": "all"}


def grouped_agg(
    ds: Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    *,
    combine: bool = True,
    reduce_blocks: int | None = None,
) -> Dataset:
    """groupby(keys) with aggregate specs [(col, fn, alias)], fn in
    {sum, count, min, max, mean, any, all} (any/all = SQL bool_or/bool_and
    over a boolean column; combine path only — both are their own
    mergeable partial). With combine=True (default), a vectorized
    per-batch pyarrow group_by pre-aggregates before the shuffle; mean is
    decomposed into sum+count and finalized after the reduce.

    The combine-path reduce is a BUCKETED shuffle (hash(keys) % 64 int32
    bucket + one pyarrow group_by per bucket), not Ray's sort-based
    ``groupby(keys).aggregate``: sorting multi-column / string key blocks in
    the sort-shuffle was ~10x slower than hashing them (measured 3.9s vs
    0.4s reducing 119k (src, dst) pair rows), and an int32 bucket key keeps
    the shuffle payload flat. All-Arrow inside the bucket: null keys stay a
    group and dtypes never round-trip through pandas.

    reduce_blocks coalesces the combiner output before the reduce shuffle:
    Ray's sort exchange pays per-block scheduling/object overhead on the
    input-block x output-block grid, so a 64-block post-combiner stream of
    a few MB sorts ~5x slower than the same rows in 16 blocks (measured
    1.2M pair rows: 1.7s at 64 blocks, 0.3s at 16). Set it ONLY where the
    partial-agg output is known to be reducer-sized (pair counting on a
    thresholded graph, enum keys); leave None when the combiner output can
    be data-sized — coalescing a 100 TB stream into 16 blocks would OOM."""
    # expand mean -> sum + count
    expanded: list[tuple[str, str, str]] = []
    finals: list[tuple[str, str]] = []  # (alias, kind)
    for col, fn, alias in specs:
        if fn == "mean":
            expanded.append((col, "sum", f"__{alias}_sum"))
            expanded.append((col, "count", f"__{alias}_cnt"))
            finals.append((alias, "mean"))
        else:
            expanded.append((col, fn, alias))
            finals.append((alias, fn))

    if combine:
        # dedupe (col, fn): two specs may share a physical aggregate (e.g.
        # sum + mean of the same column both need its sum) and pyarrow names
        # results "{col}_{fn}" — duplicates would collide in the schema
        uniq = list(dict.fromkeys((col, fn) for col, fn, _ in expanded))

        def partial(batch: pa.Table) -> pa.Table:
            gb = batch.group_by(keys).aggregate(uniq)
            cols = {k: gb.column(k) for k in keys}
            for col, fn, alias in expanded:
                cols[alias] = gb.column(f"{col}_{fn}")
            return pa.table(cols)

        ds = ds.map_batches(partial, batch_format="pyarrow")
        red_specs = [(alias, _PARTIAL_FN[fn]) for col, fn, alias in expanded]

        def add_bucket(t: pa.Table) -> pa.Table:
            from tesseract_recognize_ray.hashing import stable_bucket_table

            bk = stable_bucket_table(t, keys, 64)
            return t.append_column("__bucket", pa.array(bk, pa.int32()))

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["__bucket"])
            gb = t.group_by(keys).aggregate(red_specs)
            cols = {k: gb.column(k) for k in keys}
            for alias, fn in red_specs:
                cols[alias] = gb.column(f"{alias}_{fn}")
            return pa.table(cols)

        bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
        if reduce_blocks is not None:
            bucketed = bucketed.repartition(reduce_blocks)
        out = bucketed.groupby("__bucket").map_groups(
            reduce_bucket, batch_format="pyarrow"
        )
        # Known Ray 2.49 caveat (applies to every aggregate/map path, not
        # just this one): an all-empty input yields ZERO blocks and the
        # schema is dropped with them, so a fully-empty result loses its
        # column names. Sort-based groupby.aggregate behaves the same.
    else:
        reducers = []
        for col, fn, alias in expanded:
            if fn in ("any", "all"):
                raise ValueError("grouped_agg: any/all require combine=True")
            cls = {"sum": Sum, "count": Count, "min": Min, "max": Max}[fn]
            reducers.append(cls(col, alias_name=alias) if fn != "count" else Count(alias_name=alias))
        out = ds.groupby(keys).aggregate(*reducers)

    mean_aliases = [a for a, kind in finals if kind == "mean"]
    if mean_aliases:

        def finalize(batch: pa.Table) -> pa.Table:
            for alias in mean_aliases:
                m = pc.divide(
                    pc.cast(batch[f"__{alias}_sum"], pa.float64()),
                    pc.cast(batch[f"__{alias}_cnt"], pa.float64()),
                )
                batch = batch.append_column(alias, m)
            return batch.drop_columns(
                [c for a in mean_aliases for c in (f"__{a}_sum", f"__{a}_cnt")]
            )

        out = out.map_batches(finalize, batch_format="pyarrow")
    return out


# -------------------------------------------------------------------- joins
def collect_key_set(ds: Dataset, key: str) -> set:
    """Materialize the distinct keys of a SMALL dataset on the driver."""
    out: set = set()
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out.update(b.column(key).drop_null().to_pylist())
    return out


def collect_key_array(ds: Dataset, key: str) -> pa.Array:
    """Distinct non-null keys of a SMALL dataset as ONE Arrow array —
    the broadcast payload for semi/anti joins. Built once on the driver so
    probe tasks never re-materialize a Python set into Arrow per batch
    (VERDICT r02 #3: at 10^7 keys x thousands of batches that conversion
    was real CPU)."""
    chunks = [
        b.column(key).drop_null().combine_chunks()
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
        if len(b)
    ]
    if not chunks:
        return pa.array([], pa.string())
    return pc.unique(pa.chunked_array(chunks))


def _key_filter(ds: Dataset, key: str, keys_ref, keep_matches: bool) -> Dataset:
    """Probe-side filter against a broadcast key ARRAY: `keys_ref` holds a
    ready-to-use pa.Array in the object store (zero-copy read per task),
    so the per-batch work is exactly one pc.is_in kernel call."""

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        if len(ks) == 0:  # typed is_in would raise on the placeholder type
            mask = pa.array(np.zeros(len(batch), dtype=bool))
        else:
            mask = pc.is_in(batch.column(key), value_set=ks)
        if not keep_matches:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_semi_join(big: Dataset, small: Dataset, key: str, small_key: str | None = None) -> Dataset:
    """Rows of `big` whose key appears in `small` (key array broadcast once)."""
    keys = collect_key_array(small, small_key or key)
    return _key_filter(big, key, ray.put(keys), keep_matches=True)


def broadcast_anti_join(big: Dataset, small: Dataset, key: str, small_key: str | None = None) -> Dataset:
    """Rows of `big` whose key does NOT appear in `small`."""
    keys = collect_key_array(small, small_key or key)
    return _key_filter(big, key, ray.put(keys), keep_matches=False)


def hash_join(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> Dataset:
    """Hash-partitioned join for two large sides (Dataset.join)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def broadcast_lookup_join(
    big: Dataset, small_df: pd.DataFrame, key: str, small_key: str | None = None
) -> Dataset:
    """Attach columns of a small pandas dimension table to every row of `big`
    via an object-store broadcast + per-batch pandas merge (no shuffle)."""
    ref = ray.put(small_df)
    skey = small_key or key

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref)
        return batch.merge(dim, left_on=key, right_on=skey, how="inner")

    return big.map_batches(fn, batch_format="pandas")


# ------------------------------------------------------------------ windows
def salted_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    *,
    salt: int = 8,
    num_partitions: int = 16,
) -> Dataset:
    """Skew-resistant inner equi-join: every left row gets a salt in
    [0, salt) (round-robin per batch — any assignment is correct, it only
    spreads rows), the right side is replicated `salt` times, and the join
    key becomes (key, salt) — a hot key's rows now land on `salt` shuffle
    partitions instead of one. Output is row-identical to hash_join; use
    when BOTH sides are too large to broadcast and the key histogram is
    skewed (the classic event_type / hot-domain case)."""
    rkey = right_on or on

    def add_salt(batch: pa.Table) -> pa.Table:
        s = (np.arange(batch.num_rows, dtype=np.int64) % salt).astype(np.int32)
        return batch.append_column("__salt", pa.array(s))

    def replicate(batch: pa.Table) -> pa.Table:
        parts = []
        for i in range(salt):
            parts.append(
                batch.append_column(
                    "__salt_r", pa.array(np.full(batch.num_rows, i, dtype=np.int32))
                )
            )
        return pa.concat_tables(parts)

    j = left.map_batches(add_salt, batch_format="pyarrow").join(
        right.map_batches(replicate, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(rkey, "__salt_r"),
    )
    return j.map_batches(
        lambda b: b.drop_columns([c for c in ("__salt", "__salt_r") if c in b.column_names]),
        batch_format="pyarrow",
    )


def window_lag(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "lag_value",
    shift: int = 1,
    num_buckets: int = 64,
) -> Dataset:
    """Per-key lag (shift>0) / lead (shift<0) over rows ordered by order_cols.

    Scale shape: shuffle by hash(key) % num_buckets (co-location guarantee
    unchanged — all rows of a key share a bucket), then ONE vectorized
    pandas groupby(key).shift per bucket. Grouping Ray-side by the raw key
    would dispatch a python call per key — ruinous at 10^6+ keys."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        g[out_col] = g.groupby(part_key, sort=False)[value_col].shift(shift)
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


# ------------------------------------------------------------------- topk
def topk(ds: Dataset, col: str, k: int, descending: bool = True, tiebreak: list[str] | None = None) -> Dataset:
    """Global top-k: per-batch local prune to k rows, then a tiny global
    sort+limit — the shuffle never sees more than k rows per block."""
    sort_cols = [col] + (tiebreak or [])
    # per-column directions: the value column follows `descending`, tiebreak
    # columns are ALWAYS ascending — one shared flag would prune ties in the
    # opposite order from the global sort and keep the wrong rows when >= k
    # rows tie at the cutoff value inside one batch
    asc = [not descending] + [True] * len(tiebreak or [])

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(sort_cols, ascending=asc, kind="mergesort").head(k)

    pruned = ds.map_batches(prune, batch_format="pandas")
    keys = [(c, "descending" if descending else "ascending") for c in [col]] + [
        (c, "ascending") for c in (tiebreak or [])
    ]
    return pruned.sort([c for c, _ in keys], descending=[d == "descending" for _, d in keys]).limit(k)


def grouped_topk(
    ds: Dataset,
    key: str,
    col: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
    num_buckets: int = 64,
) -> Dataset:
    """Top-k rows PER GROUP (SQL QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY ...) <= k). Map-side combiner: each batch first prunes to at
    most k rows per key (one vectorized sort + groupby.head), so the shuffle
    moves <= k rows per key per block — never the full group; then a bucketed
    hash shuffle co-locates each key and ONE sorted groupby.head per bucket
    finishes. Same per-column sort directions as topk: the value column
    follows `descending`, tiebreak columns are always ascending."""
    from ..hashing import stable_bucket

    sort_cols = [key, col] + (tiebreak or [])
    asc = [True, not descending] + [True] * len(tiebreak or [])

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        pruned = batch.sort_values(sort_cols, ascending=asc, kind="mergesort").groupby(
            key, sort=False
        ).head(k)
        pruned["__bucket"] = stable_bucket(pruned[key], num_buckets)
        return pruned

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(sort_cols, ascending=asc, kind="mergesort")
        return g.groupby(key, sort=False).head(k)

    return ds.map_batches(prune, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
) -> Dataset:
    """AS-OF join (left): each left row picks the most recent right row with
    right.ts <= left.ts for the same key (inclusive — SQL ASOF `>=`
    semantics). A custom operator Ray Data lacks, composed per the brief:
    hash-bucket BOTH sides by key (one shuffle, co-location guaranteed: all
    rows of a key land in one bucket), then ONE vectorized pd.merge_asof per
    bucket. Right-side columns other than (key, ts) are attached; on exact
    duplicate (key, ts) right rows the later one in (ts, stable input order)
    wins — pre-dedupe the right side if that matters. Pass left_cols /
    right_cols explicitly to avoid a schema probe on lazy inputs."""
    from ..hashing import stable_bucket

    left_cols = left_cols or list(left.schema().names)
    right_cols = right_cols or list(right.schema().names)
    all_cols = list(dict.fromkeys(left_cols + right_cols))
    attach = [c for c in right_cols if c not in (key, ts_col)]

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__bucket"] = stable_bucket(batch[key], num_buckets)
            batch["__side"] = side
            for c in all_cols:  # align schemas so the two sides union
                if c not in batch.columns:
                    batch[c] = pd.NA
            return batch[all_cols + ["__bucket", "__side"]]

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def bucket_asof(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == "l"][left_cols].sort_values(ts_col, kind="mergesort")
        rf = g[g["__side"] == "r"][right_cols].sort_values(ts_col, kind="mergesort")
        if len(rf) == 0:
            out = lf.copy()
            for c in attach:
                out[c] = pd.NA
            return out
        return pd.merge_asof(
            lf, rf, on=ts_col, by=key, direction="backward", allow_exact_matches=True
        )

    return both.groupby("__bucket").map_groups(bucket_asof, batch_format="pandas")


def window_rolling_sum(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "rolling_sum",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key rolling sum over the last `window` rows (SQL ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW). Fully vectorized per bucket:
    grouped cumsum minus its window-shifted self — no per-key dispatch."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        grp = g.groupby(part_key, sort=False)[value_col]
        cs = grp.cumsum()
        lag = cs.groupby(g[part_key], sort=False).shift(window)
        g[out_col] = (cs - lag.fillna(0)).astype(g[value_col].dtype)
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def window_rolling_extremum(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    *,
    kind: str = "min",
    out_col: str = "rolling_min",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key sliding MIN/MAX over the last `window` rows — SQL
    ``MIN(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``. Unlike the rolling sum (cumsum minus its
    shifted self) an extremum has no inverse, so the per-bucket kernel is
    pandas' C-implemented grouped rolling min/max (monotonic-deque,
    O(rows)); the shuffle shape is identical to window_rolling_sum: one
    hash(key) bucket exchange, all rows of a key co-located."""
    if kind not in ("min", "max"):
        raise ValueError("window_rolling_extremum: kind must be 'min' or 'max'")
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        r = g.groupby(part_key, sort=False)[value_col].rolling(window, min_periods=1)
        vals = (r.min() if kind == "min" else r.max()).to_numpy()
        # rolling preserves group-major row order and g is already sorted
        # key-major, so positions align 1:1
        g[out_col] = vals.astype(g[value_col].dtype)
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def window_range_sum(
    ds: Dataset,
    part_key: str,
    ts_col: str,
    value_col: str,
    range_us: int,
    out_sum: str = "range_sum",
    out_n: str = "range_n",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key trailing TIME-RANGE window (SQL RANGE BETWEEN INTERVAL x
    PRECEDING AND CURRENT ROW): for each row, sum/count of the key's rows
    with ts in [ts_i - range_us, ts_i] — equal-ts peers included, exactly
    the SQL RANGE peer semantics.

    Fully vectorized per bucket, no per-key dispatch: rows sort by
    (key, ts); each key's timestamps are rebased to its own first ts and
    offset by group_index * (bucket_span + range_us + 1), making the
    concatenation globally sorted so ONE np.searchsorted pair resolves every
    row's frame bounds; prefix sums turn bounds into sums."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, ts_col], kind="mergesort")
        ts = g[ts_col].to_numpy()
        ts = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        vals = g[value_col].to_numpy()
        codes, _ = pd.factorize(g[part_key].to_numpy(), sort=False)
        # first ts of each group, broadcast per row (groups are contiguous)
        starts = np.flatnonzero(np.diff(codes, prepend=-1))
        base = np.repeat(ts[starts], np.diff(np.append(starts, len(ts))))
        rel = ts - base
        span = int(rel.max()) if len(rel) else 0
        stride = span + int(range_us) + 1
        if len(codes) and int(codes[-1]) >= (np.iinfo(np.int64).max - span) // max(stride, 1):
            raise OverflowError(
                "window_range_sum: bucket group-count x time-span exceeds int64; "
                "raise num_buckets"
            )
        adj = codes.astype(np.int64) * stride + rel
        lo = np.searchsorted(adj, adj - int(range_us), side="left")
        hi = np.searchsorted(adj, adj, side="right")
        cs = np.concatenate(([0], np.cumsum(vals)))
        g[out_sum] = (cs[hi] - cs[lo]).astype(vals.dtype)
        g[out_n] = (hi - lo).astype(np.int64)
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def window_cumsum(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key running total (SQL SUM(...) OVER (PARTITION BY key ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)). Same bucketed shape as
    window_rolling_sum: hash(key) % num_buckets co-locates each key, then
    ONE vectorized grouped cumsum per bucket — no per-key dispatch."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        g[out_col] = g.groupby(part_key, sort=False)[value_col].cumsum()
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def window_cum_distinct(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_distinct",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key CUMULATIVE DISTINCT COUNT of value_col in order_cols order —
    SQL has no COUNT(DISTINCT) OVER, so this is the canonical rewrite:
    flag each row that is the FIRST occurrence of its (key, value) pair in
    order, then running-sum the flag. Same bucketed shape as window_cumsum:
    hash(key) % num_buckets co-locates each key whole, ONE vectorized pass
    per bucket (sort -> duplicated() -> grouped cumsum), no per-key
    dispatch. Requires order_cols to be a total order within each key
    (ties would make "first" ambiguous on both engine and oracle). NULL
    values count as ONE distinct value (pandas duplicated() semantics) —
    SQL COUNT(DISTINCT) would skip them; pre-filter nulls for SQL parity
    on nullable value columns."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        first = (~g.duplicated([part_key, value_col], keep="first")).astype("int64")
        g[out_col] = first.groupby(g[part_key], sort=False).cumsum()
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def grouped_median(ds: Dataset, key: str, value_col: str, out_col: str = "median") -> Dataset:
    """Exact per-group median. Partitioning assumption (documented per the
    brief's custom-operator rule): groupby(key) co-locates each group whole,
    so this is safe when per-group cardinality fits a worker (bounded key
    domains like enums/dates); for unbounded groups use a sort-based
    quantile instead."""

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].dropna()  # SQL aggregates ignore NULLs
        m = float(np.median(v)) if len(v) else float("nan")
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [m]})

    return ds.groupby(key).map_groups(med, batch_format="pandas")


def grouped_quantile_disc(
    ds: Dataset, key: str, value_col: str, q: float, out_col: str = "quantile"
) -> Dataset:
    """Exact DISCRETE per-group quantile (SQL quantile_disc: the element at
    ceil(q*n)-1 of the sorted values — always an actual data value, so
    integer columns stay exact). Same co-location assumption as
    grouped_median."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].dropna().to_numpy())  # SQL ignores NULLs
        if len(v) == 0:
            return pd.DataFrame({key: [g[key].iloc[0]], out_col: [float("nan")]})
        idx = max(0, int(np.ceil(q * len(v))) - 1)
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [v[idx]]})

    return ds.groupby(key).map_groups(fn, batch_format="pandas")


def grouped_quantile_cont(
    ds: Dataset, key: str, value_col: str, q: float, out_col: str = "quantile"
) -> Dataset:
    """Exact CONTINUOUS (interpolated) per-group quantile, replicating SQL
    quantile_cont / percentile_cont: rn = q·(n−1); result =
    v[⌊rn⌋]·(⌈rn⌉−rn) + v[⌈rn⌉]·(rn−⌊rn⌋), evaluated in float64 from the
    sorted values — the exact expression DuckDB's interpolator computes, so
    integer inputs reproduce the oracle bit-for-bit. Same bounded-group
    co-location assumption as grouped_median."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].dropna().to_numpy()).astype(np.float64)
        if len(v) == 0:
            return pd.DataFrame({key: [g[key].iloc[0]], out_col: [float("nan")]})
        rn = q * (len(v) - 1)
        frn, crn = int(np.floor(rn)), int(np.ceil(rn))
        r = v[frn] if crn == frn else v[frn] * (crn - rn) + v[crn] * (rn - frn)
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [float(r)]})

    return ds.groupby(key).map_groups(fn, batch_format="pandas")


def window_rank(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    *,
    rank_col: str = "rnk",
    dense_col: str | None = "drnk",
    descending: bool = False,
    num_buckets: int = 64,
) -> Dataset:
    """Per-key RANK() (gap ranking) and DENSE_RANK() over order_cols.
    Bucketed like every window op; within a bucket one sort + vectorized
    first-of-tie detection (no per-key dispatch): rank = row_number at the
    first row of each distinct order tuple, carried forward across ties;
    dense rank = running count of distinct tuples."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            [part_key, *order_cols],
            ascending=[True] + [not descending] * len(order_cols),
            kind="mergesort",
        )
        rn = g.groupby(part_key, sort=False).cumcount().to_numpy() + 1
        new_key = g[part_key].ne(g[part_key].shift()).to_numpy()
        new_tuple = (
            g[order_cols].ne(g[order_cols].shift()).any(axis=1).to_numpy() | new_key
        )
        # carry the row number at each tie-group start forward across ties
        idx = np.maximum.accumulate(np.where(new_tuple, np.arange(len(g)), 0))
        g[rank_col] = rn[idx]
        if dense_col:
            dense = np.cumsum(new_tuple)
            # restart the dense counter per key: subtract the running count
            # at the key's first row (where rank is 1 by construction)
            key_start = np.maximum.accumulate(np.where(new_key, np.arange(len(g)), 0))
            g[dense_col] = dense - dense[key_start] + 1
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def window_percent_rank(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    *,
    pr_col: str = "pr",
    cd_col: str | None = "cd",
    descending: bool = False,
    num_buckets: int = 64,
) -> Dataset:
    """Per-key PERCENT_RANK() = (rank-1)/(n-1) (0 for single-row groups)
    and CUME_DIST() = (# rows with order tuple <= current)/n. Both are exact
    rationals evaluated once in float64 → bit-identical to any SQL engine
    computing the same definition. Same bucketed shape as window_rank; the
    tie-group last-row index comes from one cumsum/take, no per-key
    dispatch."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            [part_key, *order_cols],
            ascending=[True] + [not descending] * len(order_cols),
            kind="mergesort",
        )
        n = len(g)
        rn = g.groupby(part_key, sort=False).cumcount().to_numpy() + 1
        cnt = g.groupby(part_key, sort=False)[part_key].transform("size").to_numpy()
        new_key = g[part_key].ne(g[part_key].shift()).to_numpy()
        new_tuple = (
            g[order_cols].ne(g[order_cols].shift()).any(axis=1).to_numpy() | new_key
        )
        start_idx = np.maximum.accumulate(np.where(new_tuple, np.arange(n), 0))
        rank = rn[start_idx]
        g[pr_col] = np.where(cnt > 1, (rank - 1) / np.maximum(cnt - 1, 1), 0.0)
        if cd_col:
            starts = np.nonzero(new_tuple)[0]
            ends = np.append(starts[1:], n) - 1  # last row index of each tie group
            group_idx = np.cumsum(new_tuple) - 1
            g[cd_col] = rn[ends[group_idx]] / cnt
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def window_row_number(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    out_col: str = "rn",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key ROW_NUMBER() ordered by order_cols (1-based). Bucketed like
    every window op: one vectorized groupby(key).cumcount per bucket."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        g[out_col] = g.groupby(part_key, sort=False).cumcount().to_numpy() + 1
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def _null_zero(t: pa.DataType):
    return pa.scalar("", t) if pa.types.is_string(t) or pa.types.is_large_string(t) else pa.scalar(0).cast(t)


def _split_nulls_fn(cols: list[str], prefix: str, extra_present: bool):
    """Per-batch transform implementing SQL IS-NOT-DISTINCT-FROM key
    equality for hash joins: each key column becomes an (is_null,
    filled-value) pair so null keys hash-match each other."""

    def fn(b: pa.Table) -> pa.Table:
        out: dict[str, object] = {}
        for c in cols:
            col = b.column(c)
            out[f"{prefix}{c}_n"] = pc.cast(pc.is_null(col), pa.int8())
            out[f"{prefix}{c}_v"] = pc.fill_null(col, _null_zero(col.type))
        if not extra_present:  # left carries originals for the output
            for c in cols:
                out[c] = b.column(c)
        t = pa.table(out)
        if extra_present:
            t = t.append_column("__present", pa.array(np.ones(b.num_rows, dtype=np.int8)))
        return t

    return fn


def except_rows(left: Dataset, right: Dataset, cols: list[str], num_partitions: int = 8) -> Dataset:
    """SQL EXCEPT (distinct rows of left absent from right): dedupe left,
    then one hash LEFT-ANTI-style join via a null-probe — both sides shuffle
    only the key columns. NULL keys follow SQL's IS-NOT-DISTINCT-FROM
    semantics (null matches null): every key column is split into an
    (is_null, filled-value) pair before the join, so hash equality treats
    nulls as equal instead of silently keeping them."""
    split_nulls = lambda prefix, extra_present: _split_nulls_fn(cols, prefix, extra_present)  # noqa: E731

    key_cols = [k for c in cols for k in (f"{c}_n", f"{c}_v")]
    # materialize the deduped keys ONCE: count() below executes the branch,
    # and without this the join would re-execute the whole right lineage a
    # second time. Post-distinct keys only — never the raw right table.
    right_keys = distinct_on(
        right.map_batches(lambda b: b.select(cols), batch_format="pyarrow"), cols
    ).materialize()
    probe = right_keys.map_batches(split_nulls("__r_", True), batch_format="pyarrow")
    # an empty right side has no schema for the join to resolve — EXCEPT
    # with empty right is just DISTINCT(left). The count touches only the
    # deduped key rows (already shuffled), not the raw right table.
    left_d = distinct_on(left, cols)
    if right_keys.count() == 0:
        return left_d
    joined = hash_join(
        left_d.map_batches(split_nulls("__l_", False), batch_format="pyarrow"),
        probe,
        on=tuple(f"__l_{k}" for k in key_cols),
        right_on=tuple(f"__r_{k}" for k in key_cols),
        join_type="left_outer",
        num_partitions=num_partitions,
    )

    def keep_absent(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["__present"].isna()][cols]
        # keep the key dtypes on empty batches: an all-matched block must
        # not degrade the dataset schema to objectless/empty
        return out.astype({c: b[c].dtype for c in cols})

    return joined.map_batches(keep_absent, batch_format="pandas")


def distinct_on(ds: Dataset, cols: list[str], *, reduce_blocks: int | None = None) -> Dataset:
    """Multi-column distinct — grouped_agg's bucketed reduce (per-batch
    distinct combiner + one int32-bucket shuffle), not the sort aggregate.
    reduce_blocks: as in grouped_agg — coalesce the combined (already
    distinct-per-block) stream before the exchange only when the DISTINCT
    domain is known reducer-sized."""
    return grouped_agg(
        ds, cols, [(cols[0], "count", "__n")], reduce_blocks=reduce_blocks
    ).drop_columns(["__n"])


def intersect_rows(left: Dataset, right: Dataset, cols: list[str], num_partitions: int = 8) -> Dataset:
    """SQL INTERSECT (distinct rows present in BOTH inputs): dedupe both
    sides, then one hash INNER join on null-split keys (same
    IS-NOT-DISTINCT-FROM null semantics as :func:`except_rows`). Both sides
    shuffle only the deduped key columns — never the raw tables."""
    key_cols = [k for c in cols for k in (f"{c}_n", f"{c}_v")]
    left_d = distinct_on(left.map_batches(lambda b: b.select(cols), batch_format="pyarrow"), cols)
    right_d = distinct_on(right.map_batches(lambda b: b.select(cols), batch_format="pyarrow"), cols)
    joined = hash_join(
        left_d.map_batches(_split_nulls_fn(cols, "__l_", False), batch_format="pyarrow"),
        right_d.map_batches(_split_nulls_fn(cols, "__r_", True), batch_format="pyarrow"),
        on=tuple(f"__l_{k}" for k in key_cols),
        right_on=tuple(f"__r_{k}" for k in key_cols),
        join_type="inner",
        num_partitions=num_partitions,
    )

    def project(b: pa.Table) -> pa.Table:
        return b.select(cols)

    return joined.map_batches(project, batch_format="pyarrow")


def grouped_variance(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    *,
    var_col: str = "var_samp",
    std_col: str | None = "stddev_samp",
    n_col: str = "n_rows",
) -> Dataset:
    """Per-group sample variance / stddev via EXACT integer moments: the
    combiner pre-aggregates (n, Σx, Σx²) per batch as int64, the groupby
    shuffle moves one moment row per key per block, and the final float64
    expression (n·Σx² − (Σx)²)/(n·(n−1)) is evaluated once per group — so
    the result is bit-identical regardless of partitioning/reduction order
    (unlike a naive float stddev whose sum order varies run to run).
    Requires an integer value column (use exact cents); moments must fit
    int64 per group (Σx² ≲ 9.2e18 — at larger scale promote the sumsq column
    to float64 or a two-level decimal combiner)."""

    def add_sq(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(value_col), pa.int64())
        return b.append_column("__xsq", pc.multiply(x, x))

    moments = grouped_agg(
        ds.map_batches(add_sq, batch_format="pyarrow"),
        keys,
        [
            (value_col, "count", n_col),
            (value_col, "sum", "__sx"),
            ("__xsq", "sum", "__sxx"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column(n_col), pa.float64())
        sx = pc.cast(b.column("__sx"), pa.float64())
        sxx = pc.cast(b.column("__sxx"), pa.float64())
        var = pc.divide(
            pc.subtract(pc.multiply(n, sxx), pc.multiply(sx, sx)),
            pc.multiply(n, pc.subtract(n, pa.scalar(1.0))),
        )
        b = b.append_column(var_col, var)
        if std_col:
            b = b.append_column(std_col, pc.sqrt(var))
        return b.drop_columns(["__sx", "__sxx"])

    return moments.map_batches(finalize, batch_format="pyarrow")


def grouped_corr(
    ds: Dataset,
    keys: list[str],
    x_col: str,
    y_col: str,
    *,
    corr_col: str = "corr",
    covar_col: str | None = "covar_samp",
    n_col: str = "n_rows",
) -> Dataset:
    """Per-group Pearson correlation (and sample covariance) via EXACT
    integer moments — same design as grouped_variance: the combiner
    pre-aggregates (n, Σx, Σy, Σx², Σy², Σxy) as int64, the shuffle moves
    one moment row per key per block, and the final float64 expressions
      corr  = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
      covar = (n·Σxy − Σx·Σy) / (n·(n−1))
    are evaluated once per group → bit-identical across partitionings.
    Requires integer value columns; per-group Σx², Σy², Σxy must fit int64."""

    def add_moments(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(x_col), pa.int64())
        y = pc.cast(b.column(y_col), pa.int64())
        b = b.append_column("__xx", pc.multiply(x, x))
        b = b.append_column("__yy", pc.multiply(y, y))
        return b.append_column("__xy", pc.multiply(x, y))

    moments = grouped_agg(
        ds.map_batches(add_moments, batch_format="pyarrow"),
        keys,
        [
            (x_col, "count", n_col),
            (x_col, "sum", "__sx"),
            (y_col, "sum", "__sy"),
            ("__xx", "sum", "__sxx"),
            ("__yy", "sum", "__syy"),
            ("__xy", "sum", "__sxy"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column(n_col), pa.float64())
        sx = pc.cast(b.column("__sx"), pa.float64())
        sy = pc.cast(b.column("__sy"), pa.float64())
        sxx = pc.cast(b.column("__sxx"), pa.float64())
        syy = pc.cast(b.column("__syy"), pa.float64())
        sxy = pc.cast(b.column("__sxy"), pa.float64())
        num = pc.subtract(pc.multiply(n, sxy), pc.multiply(sx, sy))
        dx = pc.sqrt(pc.subtract(pc.multiply(n, sxx), pc.multiply(sx, sx)))
        dy = pc.sqrt(pc.subtract(pc.multiply(n, syy), pc.multiply(sy, sy)))
        b = b.append_column(corr_col, pc.divide(num, pc.multiply(dx, dy)))
        if covar_col:
            b = b.append_column(
                covar_col,
                pc.divide(num, pc.multiply(n, pc.subtract(n, pa.scalar(1.0)))),
            )
        return b.drop_columns(["__sx", "__sy", "__sxx", "__syy", "__sxy"])

    return moments.map_batches(finalize, batch_format="pyarrow")


def window_ntile(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    n: int,
    out_col: str = "ntile",
    num_buckets: int = 64,
) -> Dataset:
    """SQL NTILE(n) OVER (PARTITION BY key ORDER BY order_cols): rows of
    each group split into n tiles whose sizes differ by at most one, the
    first (count mod n) tiles one row larger. Bucketed shuffle co-locates
    each key; inside a bucket everything is numpy on cumcount/size arrays —
    no per-key dispatch. order_cols should totally order each group (add a
    unique tiebreak) or tile assignment at equal keys is partition-dependent."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        grp = g.groupby(part_key, sort=False)
        rn = grp.cumcount().to_numpy()
        cnt = grp[order_cols[0]].transform("size").to_numpy()
        q, r = cnt // n, cnt % n
        boundary = (q + 1) * r  # rows below this index sit in the larger tiles
        tile = np.where(
            rn < boundary,
            rn // np.maximum(q + 1, 1),
            r + (rn - boundary) // np.maximum(q, 1),
        )
        g[out_col] = (tile + 1).astype("int64")
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def grouping_sets_agg(
    ds: Dataset,
    sets: list[list[str]],
    specs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
) -> Dataset:
    """GROUP BY GROUPING SETS(sets): arbitrary grouping-key subsets in one
    pass. The base table is scanned ONCE into a leaf `grouped_agg` over the
    union of all set keys; every requested set then re-aggregates the tiny
    materialized leaf, with absent key columns emitted as typed nulls —
    ROLLUP and CUBE are thin wrappers over this. Aggregate fns limited to
    the re-aggregable set {sum, count, min, max} (count re-reduces by sum).

    Scale shape: the only big-data work is the leaf combiner reduce; each
    grouping set is a re-aggregation of the already-tiny leaf (one row per
    full key combination), so adding sets costs no extra base scans."""
    for _, fn, _ in specs:
        if fn not in _PARTIAL_FN:
            raise ValueError(f"grouping_sets_agg: fn {fn!r} is not re-aggregable")
    if keys is None:
        keys = []
        for s in sets:
            for k in s:
                if k not in keys:
                    keys.append(k)
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping_sets_agg: set {s} not within keys {keys}")
    # leaf is one row per key combination — tiny; materialize so schema()
    # and the per-set re-aggregations don't re-execute the base scan.
    leaf = grouped_agg(ds, keys, specs).materialize()
    schema = leaf.schema().base_schema
    aliases = [alias for _, _, alias in specs]
    order = keys + aliases
    re_specs = [(alias, _PARTIAL_FN[fn], alias) for _, fn, alias in specs]

    def pad(present: list[str]):
        missing = [k for k in keys if k not in present]

        def fn(b: pa.Table) -> pa.Table:
            for k in missing:
                b = b.append_column(k, pa.nulls(b.num_rows, schema.field(k).type))
            return b.select(order)

        return fn

    levels = []
    for sub in sets:
        if list(sub) == keys:
            lvl = leaf
        elif sub:
            lvl = grouped_agg(leaf, list(sub), re_specs)
        else:  # grand total: constant-key groupby (no driver-side collect)
            lvl = grouped_agg(
                leaf.map_batches(
                    lambda b: b.append_column("__all", pa.array(np.zeros(b.num_rows, dtype=np.int8))),
                    batch_format="pyarrow",
                ),
                ["__all"],
                re_specs,
            ).drop_columns(["__all"])
        levels.append(lvl.map_batches(pad(list(sub)), batch_format="pyarrow"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup_agg(ds: Dataset, keys: list[str], specs: list[tuple[str, str, str]]) -> Dataset:
    """GROUP BY ROLLUP(keys): the full key list plus every prefix down to
    the grand total — `grouping_sets_agg` with prefix sets."""
    return grouping_sets_agg(
        ds, [keys[:i] for i in range(len(keys), -1, -1)], specs, keys=keys
    )


def cube_agg(ds: Dataset, keys: list[str], specs: list[tuple[str, str, str]]) -> Dataset:
    """GROUP BY CUBE(keys): every subset of the grouping keys —
    `grouping_sets_agg` with the full powerset."""
    from itertools import combinations

    subsets = [
        list(c) for r in range(len(keys), -1, -1) for c in combinations(keys, r)
    ]
    return grouping_sets_agg(ds, subsets, specs, keys=keys)


def broadcast_cross_join(big: Dataset, small_df: pd.DataFrame) -> Dataset:
    """CROSS JOIN with a small broadcast side: every batch of `big` pairs
    with every row of `small_df` (object-store broadcast, zero shuffle).
    Output size is |big|x|small| — callers own keeping the small side
    dimension-table sized."""
    ref = ray.put(small_df)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), how="cross")

    return big.map_batches(fn, batch_format="pandas")


def window_first_last(
    ds: Dataset,
    part_key: str,
    order_cols: list[str],
    value_col: str,
    *,
    first_col: str = "first_value",
    last_col: str | None = "last_value",
    num_buckets: int = 64,
) -> Dataset:
    """Per-key FIRST_VALUE / LAST_VALUE over the WHOLE partition (SQL frame
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), ordered by
    order_cols. One sort + two grouped transforms per bucket. order_cols
    should totally order each group or the boundary rows are ambiguous."""
    from ..hashing import stable_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[part_key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([part_key, *order_cols], kind="mergesort")
        grp = g.groupby(part_key, sort=False)[value_col]
        g[first_col] = grp.transform("first")
        if last_col:
            g[last_col] = grp.transform("last")
        return g

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def grid_range_join(
    points: Dataset,
    intervals: Dataset,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    *,
    cell: int,
    num_partitions: int = 16,
    point_schema: "pa.Schema | None" = None,
    interval_schema: "pa.Schema | None" = None,
) -> Dataset:
    """Interval-containment join for two BIG sides (ts in [lo, hi], both
    inclusive) — the scale path past broadcast_range_join: each interval is
    replicated to every fixed-width grid cell it overlaps, each point hashes
    to its single cell, and a hash join on the cell id co-locates the
    candidates; an exact bound filter finishes. Every matching pair appears
    exactly once (a point owns exactly one cell — no dedup shuffle).

    Pass point_schema + interval_schema (both sides' column types, pre
    __cell) to run the cell join as a single bucket_join co-shuffle instead
    of Dataset.join — measured 3.4s vs 5.2s on the events-in-type-windows
    shape at sf0.1 (single-join plans favor the bucketed exchange; the
    explicit schemas keep lazy upstreams single-execution).

    `cell` tunes the replication-vs-cartesian tradeoff: replication factor
    is width/cell + 1, per-cell candidate product is cell occupancy of each
    side. Pick cell ~ median interval width. ts/lo/hi must be int64 on a
    shared scale (e.g. epoch microseconds); point and interval payload
    column names must not collide."""

    def add_cell(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy()
        return batch.append_column(
            "__cell", pa.array(np.floor_divide(ts, cell).astype(np.int64))
        )

    def replicate(batch: pa.Table) -> pa.Table:
        lo = batch.column(lo_col).to_numpy()
        hi = batch.column(hi_col).to_numpy()
        lo_c = np.floor_divide(lo, cell).astype(np.int64)
        cnt = np.floor_divide(hi, cell).astype(np.int64) - lo_c + 1
        idx = np.repeat(np.arange(len(lo), dtype=np.int64), cnt)
        offs = np.arange(len(idx), dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        t = batch.take(pa.array(idx))
        return t.append_column("__cell_i", pa.array(lo_c[idx] + offs, pa.int64()))

    if (point_schema is None) != (interval_schema is None):
        raise ValueError(
            "grid_range_join: pass BOTH point_schema and interval_schema or "
            "neither — a half-specified pair would silently fall back to the "
            "double-executing Dataset.join path"
        )
    p = points.map_batches(add_cell, batch_format="pyarrow")
    r = intervals.map_batches(replicate, batch_format="pyarrow")
    if point_schema is not None and interval_schema is not None:
        j = bucket_join(
            p,
            r,
            on=("__cell",),
            right_on=("__cell_i",),
            left_schema=pa.schema(list(point_schema) + [pa.field("__cell", pa.int64())]),
            right_schema=pa.schema(list(interval_schema) + [pa.field("__cell_i", pa.int64())]),
            num_buckets=num_partitions * 4,
        )
    else:
        j = p.join(
            r,
            join_type="inner",
            num_partitions=num_partitions,
            on=("__cell",),
            right_on=("__cell_i",),
        )

    def finish(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        keep = pc.and_(
            pc.greater_equal(ts, batch.column(lo_col)),
            pc.less_equal(ts, batch.column(hi_col)),
        )
        return batch.filter(keep).drop_columns(
            [c for c in ("__cell", "__cell_i") if c in batch.column_names]
        )

    return j.map_batches(finish, batch_format="pyarrow")


def broadcast_range_join(
    big: Dataset,
    intervals_df: pd.DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
) -> Dataset:
    """Range (interval) join with a small broadcast side: attach every
    interval row whose [start, end) contains the timestamp. Handles
    OVERLAPPING intervals (a row can match several) by one vectorized mask
    per interval — cost O(|intervals| x batch), so the interval side must be
    dimension-sized (calendars, session windows, SLA buckets); a big x big
    range join needs a bucketed sort-merge instead. Zero shuffle."""
    ref = ray.put(intervals_df)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        iv = ray.get(ref)
        ts = batch[ts_col].to_numpy()
        pieces = []
        for row in iv.itertuples(index=False):
            m = (ts >= getattr(row, start_col)) & (ts < getattr(row, end_col))
            if not m.any():
                continue
            piece = batch[m].copy()
            for c in iv.columns:
                piece[c] = getattr(row, c)
            pieces.append(piece)
        if not pieces:
            out = batch.head(0).copy()
            for c in iv.columns:
                out[c] = iv[c].head(0)
            return out
        return pd.concat(pieces, ignore_index=True)

    return big.map_batches(fn, batch_format="pandas")


def unpivot(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    name_col: str = "measure",
    value_col: str = "value",
) -> Dataset:
    """UNPIVOT / melt: one output row per (input row, value column). Pure
    Arrow per batch — id columns are reused zero-copy n times via concat,
    never row-looped. Value columns must share (or cast to) one type."""

    def fn(b: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            t = pa.table(
                {**{k: b.column(k) for k in id_cols},
                 name_col: pa.array([c] * b.num_rows, pa.string()),
                 value_col: b.column(c)}
            )
            pieces.append(t)
        return pa.concat_tables(pieces)

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_sample(
    ds: Dataset, mix: list[tuple[str, int]], mod: int, keep_lt: int
) -> Dataset:
    """Deterministic, reproducible row sampling: keep rows where
    (Σ column·multiplier) mod `mod` < `keep_lt`. Pure int64 arithmetic on
    key columns — the SAME predicate is expressible in ANSI SQL, so samples
    are stable across engines, runs, and partitionings (unlike
    random_sample). Zero shuffle: a per-batch filter. Multipliers must keep
    Σ column·multiplier inside int64."""

    def fn(b: pa.Table) -> pa.Table:
        acc = None
        for col, mult in mix:
            term = pc.multiply(pc.cast(b.column(col), pa.int64()), pa.scalar(mult, pa.int64()))
            acc = term if acc is None else pc.add(acc, term)
        rem = np.mod(acc.to_numpy(zero_copy_only=False), mod)
        return b.filter(pa.array(rem < keep_lt))

    return ds.map_batches(fn, batch_format="pyarrow")


def inverted_index(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    min_df: int = 1,
    num_buckets: int = 64,
) -> Dataset:
    """Inverted-index build: token -> comma-joined posting list of the
    distinct doc ids containing it (ordered by id) + document frequency.
    Map-side combiner emits DISTINCT (token, id) pairs only — the shuffle
    moves one row per distinct (token, doc) per block, never one per
    occurrence; a bucketed hash shuffle on the token then co-locates each
    token's postings (unlike a Ray groupby(token), which would dispatch a
    Python call per token — ruinous at web vocabularies)."""
    from ..hashing import stable_bucket

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].fillna("").str.split().explode().dropna()
        out = pd.DataFrame(
            {"token": ex.to_numpy(dtype=object), id_col: b[id_col].reindex(ex.index).to_numpy()}
        )
        out = out[out["token"] != ""].drop_duplicates()
        out["__bucket"] = stable_bucket(out["token"], num_buckets)
        return out

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").drop_duplicates().sort_values(["token", id_col])
        grp = g.groupby("token", sort=False)[id_col]
        agg = grp.agg(lambda s: ",".join(s.astype(str)))
        out = pd.DataFrame(
            {
                "token": agg.index.to_numpy(dtype=object),
                "postings": agg.to_numpy(dtype=object),
                "df": grp.size().to_numpy().astype("int64"),
            }
        )
        return out[out["df"] >= min_df]

    return ds.map_batches(pairs, batch_format="pandas").groupby("__bucket").map_groups(
        fn, batch_format="pandas"
    )


def grouped_string_agg(
    ds: Dataset,
    key: str,
    value_col: str,
    *,
    sep: str = ",",
    order_cols: list[str] | None = None,
    out_col: str = "agg",
    num_buckets: int = 64,
) -> Dataset:
    """SQL string_agg(value, sep ORDER BY ...) per key — ordered group
    concatenation, NULL values skipped (SQL aggregate semantics). Default
    order is the value itself; pass order_cols for an explicit ORDER BY
    (must totally order each group for a deterministic result). One
    bucketed shuffle (hash(key) % num_buckets int32, the grouped_agg reduce
    shape) co-locates each key whole; inside a bucket one mergesort orders
    every group at once and a single str-join per key emits the row. The
    concatenation inherently needs every member string, so the shuffle
    moves the value column — at scale keep value_col narrow (names/ids,
    not documents)."""
    order = order_cols or []

    def add_bucket(batch: pa.Table) -> pa.Table:
        # Arrow-side routing: null-safe, dtype-canonical (see stable_bucket_table)
        from ..hashing import stable_bucket_table

        batch = batch.select([key, value_col, *order])
        bk = stable_bucket_table(batch, [key], num_buckets)
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # SQL string_agg: NULL VALUES are skipped inside a group, but the
        # GROUP itself survives (all-NULL group -> NULL result), and a NULL
        # key is a group like any other (dropna=False)
        g = g.copy()
        nn = g[value_col].notna()
        g.loc[nn, value_col] = g.loc[nn, value_col].astype(str)
        g = g.sort_values([key, *(order or [value_col])], kind="mergesort")
        out = g.groupby(key, sort=False, dropna=False)[value_col].agg(
            lambda s: sep.join(s.dropna()) if s.notna().any() else None
        )
        return pd.DataFrame({key: out.index, out_col: out.to_numpy()})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fn, batch_format="pandas")
    )


def keep_latest(
    ds: Dataset,
    key: "str | list[str]",
    order_cols: list[str],
    *,
    ascending: bool = False,
    num_buckets: int = 64,
) -> Dataset:
    """Extremal-row-per-key dedup — SQL ``QUALIFY ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY order_cols DESC) = 1`` (ascending=True gives
    the FIRST row instead — windowed first-event compaction). `key` may be
    a composite (list), e.g. (user, day-window). Scale shape: a per-batch
    prune keeps ONE candidate row per key per block (sort +
    drop_duplicates — the map-side combiner), then a bucketed shuffle on
    hash(key) resolves the global winner, so the shuffle moves at most one
    row per key per block, never the full table. ``order_cols`` must totally
    order each key's rows (include a unique tiebreak such as the event id) or
    the winner at ties is partition-dependent.

    Fully Arrow-side (no pandas seam): a nullable-int key column stays
    int64-with-nulls through prune, bucket hash and final resolve, so the
    same key can never hash into two buckets via float64 coercion (ADVICE
    r02). Prune = stable sort_by(order_cols) + ordered group_by "first"
    with skip_nulls=False (null VALUES in the winning row are kept)."""
    from ..hashing import stable_bucket_table

    keys = [key] if isinstance(key, str) else list(key)
    direction = "ascending" if ascending else "descending"

    def prune_t(b: pa.Table) -> pa.Table:
        cols = b.column_names
        s = b.sort_by([(c, direction) for c in order_cols])  # stable, nulls last
        others = [c for c in cols if c not in keys]
        g = pa.TableGroupBy(s, keys, use_threads=False).aggregate(
            [(c, "first", pc.ScalarAggregateOptions(skip_nulls=False)) for c in others]
        )
        g = g.rename_columns(keys + others)  # strip the _first suffixes
        return g.select(cols)

    def add_bucket(b: pa.Table) -> pa.Table:
        b = prune_t(b)
        bk = stable_bucket_table(b, keys, num_buckets)
        return b.append_column("__bucket", pa.array(bk, pa.int32()))

    def fn(g: pa.Table) -> pa.Table:
        return prune_t(g.drop_columns(["__bucket"]))

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby("__bucket").map_groups(
        fn, batch_format="pyarrow"
    )


def grouped_regr(
    ds: Dataset,
    keys: list[str],
    x_col: str,
    y_col: str,
    *,
    slope_col: str = "slope",
    intercept_col: str = "intercept",
    n_col: str = "n_rows",
    round_digits: int | None = 4,
) -> Dataset:
    """Per-group simple linear regression (SQL regr_slope / regr_intercept)
    via EXACT integer moments — same design as grouped_corr: the combiner
    pre-aggregates (n, Σx, Σy, Σx², Σxy) as int64, the shuffle moves one
    moment row per key per block, and
      slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
      intercept = (Σy − slope·Σx) / n
    are evaluated once per group in float64 → bit-identical across
    partitionings. round_digits absorbs the ulp-level difference vs engines
    that stream running covariances (DuckDB). Requires integer value
    columns; per-group Σx² and Σxy must fit int64 (Σy² is never formed, so
    y may be large — e.g. exact cents)."""

    def add_moments(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(x_col), pa.int64())
        y = pc.cast(b.column(y_col), pa.int64())
        b = b.append_column("__xx", pc.multiply(x, x))
        return b.append_column("__xy", pc.multiply(x, y))

    moments = grouped_agg(
        ds.map_batches(add_moments, batch_format="pyarrow"),
        keys,
        [
            (x_col, "count", n_col),
            (x_col, "sum", "__sx"),
            (y_col, "sum", "__sy"),
            ("__xx", "sum", "__sxx"),
            ("__xy", "sum", "__sxy"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column(n_col), pa.float64())
        sx = pc.cast(b.column("__sx"), pa.float64())
        sy = pc.cast(b.column("__sy"), pa.float64())
        sxx = pc.cast(b.column("__sxx"), pa.float64())
        sxy = pc.cast(b.column("__sxy"), pa.float64())
        slope = pc.divide(
            pc.subtract(pc.multiply(n, sxy), pc.multiply(sx, sy)),
            pc.subtract(pc.multiply(n, sxx), pc.multiply(sx, sx)),
        )
        intercept = pc.divide(pc.subtract(sy, pc.multiply(slope, sx)), n)
        if round_digits is not None:
            slope = pc.round(slope, ndigits=round_digits)
            intercept = pc.round(intercept, ndigits=round_digits)
        b = b.append_column(slope_col, slope)
        b = b.append_column(intercept_col, intercept)
        return b.drop_columns(["__sx", "__sy", "__sxx", "__sxy"])

    return moments.map_batches(finalize, batch_format="pyarrow")


def grouped_skew_kurt(
    ds: Dataset,
    key: str,
    value_col: str,
    *,
    skew_col: str = "skew",
    kurt_col: str = "kurt",
    n_col: str = "n_rows",
    round_digits: int | None = 6,
) -> Dataset:
    """Per-group sample skewness and excess kurtosis (bias-corrected, the
    DuckDB/SQL-standard estimators
      skew = √(n(n−1))/(n−2) · (m3/n)/(m2/n)^{3/2}
      kurt = (n−1)/((n−2)(n−3)) · ((n+1)·((m4/n)/(m2/n)² − 3) + 6)
    ) via TWO passes: pass 1 the exact-int (n, Σx) combiner → exact group
    means; pass 2 centered float64 moments Σd², Σd³, Σd⁴ (d = x − mean,
    numerically safe — raw 3rd/4th int moments overflow int64 at scale and
    uncentered float moments cancel catastrophically). The mean map is
    broadcast into pass 2 (one row per group — grouped keys are assumed
    low-cardinality dimension values); both passes move one combiner row per
    key per block. round_digits absorbs summation-order ulp noise vs
    streaming engines."""
    means_df = grouped_agg(
        ds, [key], [(value_col, "count", n_col), (value_col, "sum", "__sx")]
    ).to_pandas()
    means_df["__mean"] = means_df["__sx"].astype(np.float64) / means_df[n_col].astype(
        np.float64
    )
    mean_map = dict(zip(means_df[key], means_df["__mean"]))

    def centered(b: pd.DataFrame) -> pd.DataFrame:
        d = b[value_col].astype(np.float64) - b[key].map(mean_map).astype(np.float64)
        d2 = d * d
        t = pd.DataFrame({key: b[key], "__d2": d2, "__d3": d2 * d, "__d4": d2 * d2})
        return t.groupby(key, as_index=False).sum()  # map-side combiner

    sums = grouped_agg(
        ds.map_batches(centered, batch_format="pandas"),
        [key],
        [("__d2", "sum", "__m2"), ("__d3", "sum", "__m3"), ("__d4", "sum", "__m4")],
    ).to_pandas()
    out = sums.merge(means_df[[key, n_col]], on=key)
    n = out[n_col].astype(np.float64)
    v = out["__m2"] / n  # population variance
    g1 = (out["__m3"] / n) / np.power(v, 1.5)
    skew = g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
    g2 = (out["__m4"] / n) / (v * v) - 3.0
    kurt = ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
    if round_digits is not None:
        skew = skew.round(round_digits)
        kurt = kurt.round(round_digits)
    res = pd.DataFrame(
        {key: out[key], n_col: out[n_col].astype("int64"), skew_col: skew, kurt_col: kurt}
    )
    return rd.from_pandas(res.sort_values(key).reset_index(drop=True))


# -------------------------------------------------- global ordering / audit
def _range_bucketed(
    ds: Dataset, first: str, num_buckets: int, sample_per_block: int
) -> Dataset:
    """Shared sampled-range-partition step for the global-order primitives
    (global_row_number / global_cummax / global_cumsum): sample up to
    sample_per_block leading-key values per block, derive split points on
    the driver, tag every row with its int32 range bucket ``__rb`` via one
    vectorized searchsorted. side='right' keeps equal leading keys in ONE
    bucket — the boundary property all three scans rely on."""

    def sample(b: pa.Table) -> pa.Table:
        col = b.column(first)
        n = len(col)
        idx = np.unique(np.linspace(0, max(n - 1, 0), num=min(sample_per_block, n)).astype(np.int64))
        return pa.table({first: col.take(pa.array(idx))})

    parts = [
        b[first].to_numpy()
        for b in ds.map_batches(sample, batch_format="pyarrow").iter_batches(batch_size=None, batch_format="pandas")
    ]
    samples = np.sort(np.concatenate(parts)) if parts else np.array([])
    if len(samples) == 0:
        splits = np.array([])
    else:
        qs = np.linspace(0, len(samples) - 1, num=num_buckets + 1).astype(np.int64)[1:-1]
        splits = np.unique(samples[qs])

    def add_bucket(b: pa.Table) -> pa.Table:
        v = b.column(first).to_numpy(zero_copy_only=False)
        bk = np.searchsorted(splits, v, side="right").astype(np.int32)
        return b.append_column("__rb", pa.array(bk, pa.int32()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def global_row_number(
    ds: Dataset,
    order_cols: list[str],
    out_col: str = "ordinal",
    num_buckets: int = 32,
    sample_per_block: int = 32,
) -> Dataset:
    """Distributed zipWithIndex: assign the 1-based global ordinal of each
    row under ORDER BY order_cols — ROW_NUMBER() OVER (ORDER BY ...) without
    a single-node sort or any driver materialization of data rows.

    Classic sampled range partitioning (the same shape Ray's sort uses, but
    exposed as a reusable primitive that yields *ordinals*, which
    Dataset.sort does not):
      1. sample up to sample_per_block values of order_cols[0] per block
         (driver sees blocks x sample rows, bounded and tiny);
      2. derive num_buckets-1 split points; every row gets its range bucket
         via ONE vectorized searchsorted — rows with equal first-key always
         co-locate, so cross-bucket order is total;
      3. per-bucket row counts (tiny shuffle) -> driver prefix sum ->
         broadcast base offsets;
      4. one map_groups per bucket: vectorized lexsort + arange + base.

    Needs two passes over the input (count pass + number pass); upstream
    lineage re-executes, so feed it a cheap scan (read->project), not an
    expensive pipeline. Heavy skew on a single first-key value lands that
    value in one bucket (documented partitioning assumption)."""
    bucketed = _range_bucketed(ds, order_cols[0], num_buckets, sample_per_block)

    counts = grouped_agg(bucketed, ["__rb"], [("__rb", "count", "n")]).to_pandas()
    counts = counts.sort_values("__rb")
    base = dict(zip(counts["__rb"].to_numpy(), np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]])))

    def number(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["__rb"].iloc[0])
        g = g.drop(columns="__rb").sort_values(order_cols, kind="mergesort")
        g[out_col] = np.arange(1, len(g) + 1, dtype=np.int64) + np.int64(base[bk])
        return g

    return bucketed.groupby("__rb").map_groups(number, batch_format="pandas")


def polynomial_checksum(
    ds: Dataset,
    cols: list[str],
    mult: int = 1_000_003,
    prime: int = 2_147_483_647,
) -> int:
    """Order-independent content checksum over integer columns: per-row
    Horner polynomial hash mod a 31-bit prime, summed mod the prime. One
    streaming scan, fully vectorized, no shuffle — the per-batch partial is
    a single int64. Exactly reproducible in ANSI SQL (all intermediates stay
    under 2^62, so BIGINT arithmetic never overflows on either side):

        SUM(((col0 % p) * m + col1) % p * m + ... ) % p

    The 100 TB audit primitive: run on source and on sink, compare two
    numbers. Row order, partitioning and file layout don't matter."""
    p = np.int64(prime)
    m = np.int64(mult)

    def partial(b: pa.Table) -> pa.Table:
        h = np.mod(b.column(cols[0]).to_numpy(zero_copy_only=False).astype(np.int64), p)
        for c in cols[1:]:
            v = b.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            h = np.mod(h * m + v, p)
        return pa.table({"partial": pa.array([int(np.sum(h % p) % p)], pa.int64())})

    total = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_size=None, batch_format="pandas"):
        total = (total + int(b["partial"].sum())) % prime
    return total


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (public-domain
    mixing constants; wraparound is numpy's native uint64 arithmetic)."""
    v = v + np.uint64(0x9E3779B97F4A7C15)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def _bloom_hashes(v: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) uint64 bit positions via double hashing h1 + i*h2 mod m."""
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def bloom_build(build: Dataset, key: str, m_bits: int = 1 << 23, k: int = 5):
    """Build a Bloom filter over an int64 key column, distributed: every
    block emits ONE packed m_bits/8-byte bitmap partial (keys never reach
    the driver), the driver ORs the partials — a mergeable commutative
    sketch, exactly the 100 TB shape (partials are fixed-size regardless of
    block row count; OR-reduce trees if block count ever made the driver OR
    a bottleneck). Returns a ray.ObjectRef to the packed uint8 bitmap for
    broadcast into probe-side tasks.

    With m_bits=2^23 (1 MiB) and k=5 the false-positive rate at 1M build
    keys is ~0.4% — FPs only cost wasted probe rows downstream, never
    correctness, because callers re-verify with an exact join."""
    words = m_bits // 8

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        bits = _bloom_hashes(v, m_bits, k).ravel()
        bools = np.zeros(m_bits, dtype=bool)
        bools[bits.astype(np.int64)] = True
        return pa.table({"bm": pa.array([np.packbits(bools, bitorder="little").tobytes()])})

    acc = np.zeros(words, dtype=np.uint8)
    for b in build.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for buf in b.column("bm").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
    return ray.put(acc)


def bloom_prune(ds: Dataset, key: str, bloom_ref, m_bits: int = 1 << 23, k: int = 5) -> Dataset:
    """Drop rows whose key is definitely NOT in the filter (no false
    negatives; ~0.4% false positives pass through). The probe tests packed
    bits by gather — `(bm[pos>>3] >> (pos&7)) & 1` — so the bitmap is never
    unpacked per task. This is the shuffle-avoidance primitive: prune the
    big probe side BEFORE a semi/hash join so only plausible matches enter
    the exchange."""

    def fn(b: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        v = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        keep = np.ones(len(v), dtype=bool)
        pos = _bloom_hashes(v, m_bits, k)
        for i in range(k):
            p = pos[i]
            keep &= (bm[(p >> np.uint64(3)).astype(np.int64)] >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return b.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def _frontier_mask(vals: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-optimal rows of an (n, k) float64 OR int64
    matrix (int64 stays exact beyond 2^53; a wrapped int sum in the k>2
    pre-sort only perturbs the pruning heuristic, never the exact final
    pairwise filter) with every dimension MINIMIZED. Exact SQL NOT-EXISTS dominance: q dominates p
    iff q <= p on every dim AND q < p on at least one — so duplicate points
    never dominate each other and all copies of a frontier point survive.

    k == 2 is a vectorized O(n log n) sweep (lexsort, per-equal-x group min,
    prefix min over strictly-smaller x). k > 2 collects candidates in a
    near-frontier-first pass (sorted by coordinate sum: a dominator's real
    sum is strictly smaller, so most dominated rows hit an existing
    candidate immediately and the candidate list stays frontier-sized),
    then finishes with an exact O(f^2) pairwise filter over the candidates
    — the sum sort is a pruning heuristic only, never a correctness
    dependency (float-sum ties can reorder dominator/dominated)."""
    n, k = vals.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    if k == 2:
        a, b = vals[:, 0], vals[:, 1]
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = sa[1:] != sa[:-1]
        gid = np.cumsum(new_grp) - 1
        # min b within each equal-a group == b of the group's first row
        # (lexsort put the smallest b first)
        grp_min = sb[new_grp][gid]
        # prefix min of b over all STRICTLY smaller a values — kept in the
        # INPUT dtype (int64 stays exact beyond 2^53; a float64 staging
        # array here would collide distinct large ints and false-drop);
        # the first x-group has no predecessor, masked explicitly instead
        # of via an infinity sentinel
        run_min = np.minimum.accumulate(sb)
        first_idx = np.flatnonzero(new_grp)
        no_prev = gid == 0
        before = np.zeros(n, dtype=sb.dtype)
        if len(first_idx) > 1:
            prev_end = first_idx[1:] - 1
            before_grp = run_min[prev_end]  # min over groups 0..g-1
            before[gid > 0] = before_grp[gid[gid > 0] - 1]
        keep_sorted = (sb == grp_min) & (no_prev | (before > sb))
        mask = np.zeros(n, dtype=bool)
        mask[order] = keep_sorted
        return mask
    order = np.argsort(vals.sum(axis=1), kind="mergesort")
    cand: list[np.ndarray] = []
    cand_idx: list[int] = []
    for i in order:
        p = vals[i]
        if cand:
            F = np.asarray(cand)
            if ((F <= p).all(axis=1) & (F < p).any(axis=1)).any():
                continue
        cand.append(p)
        cand_idx.append(i)
    F = np.asarray(cand)
    A, B = F[:, None, :], F[None, :, :]
    dominated = ((B <= A).all(-1) & (B < A).any(-1)).any(axis=1)
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(cand_idx)[~dominated]] = True
    return mask


def skyline(ds: Dataset, cols: list[str], directions: list[str] | None = None) -> Dataset:
    """Distributed Pareto frontier (SQL skyline: rows for which NO other row
    is at-least-as-good on every `cols` dimension and strictly better on
    one; `directions[i]` in {'min','max'} per column, default all 'min').

    Two-level frontier-of-frontiers — the merge is exact because dominance
    is transitive and block-local: any row dominated globally is dominated
    by some row of the global frontier, and every global-frontier row
    survives its own block's local pass. So pass 1 computes each block's
    frontier inside map_batches (whole-block batches, no shuffle — the
    frontier is typically tiny vs the block), and pass 2 reduces the
    union of local frontiers (frontier-sized, not data-sized) in a single
    task. At 100 TB only per-block frontiers ever leave the scan tasks."""
    dirs = directions or ["min"] * len(cols)
    if len(dirs) != len(cols):
        raise ValueError("skyline: directions must match cols")

    def to_mat(b: pa.Table) -> np.ndarray:
        # integer dims stay int64 end-to-end (dominance on exact-cents
        # columns beyond 2^53 must not blur through float64); any float
        # dim switches the whole matrix to float64
        all_int = all(pa.types.is_integer(b.column(c).type) for c in cols)
        dt = np.int64 if all_int else np.float64
        sign = np.array([1 if d == "min" else -1 for d in dirs], dtype=dt)
        m = np.column_stack(
            [b.column(c).to_numpy(zero_copy_only=False).astype(dt) for c in cols]
        )
        return m * sign

    def local(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_frontier_mask(to_mat(b))))

    locals_ = ds.map_batches(local, batch_format="pyarrow", batch_size=None)
    return locals_.repartition(1).map_batches(local, batch_format="pyarrow", batch_size=None)


def bucket_join(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    *,
    how: str = "inner",
    num_buckets: int = 64,
    reduce_blocks: int | None = None,
    suffix: str = "_r",
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
) -> Dataset:
    """Equi-join via ONE bucketed co-shuffle — the Dataset.join alternative
    this engine prefers for mid-sized sides: both inputs are tagged and
    null-padded onto a shared schema, union'd, hashed on the join keys into
    an int32 bucket, and each bucket group runs a single vectorized pandas
    merge. Compared with Ray 2.49's acero-backed Dataset.join this (a) has
    no per-partition aggregator actors (measured ~2s fixed overhead per
    join at 150k x 150k rows vs ~0.6s for the bucketed exchange), and (b)
    cannot hit the zero-column empty-partition crash a sparse build side
    produces (join.py:118). `how` in {'inner', 'left'}. Right key columns
    take the LEFT names; right payload columns colliding with left names
    get `suffix`. reduce_blocks: as in grouped_agg — coalesce before the
    exchange only when both sides are known reducer-sized.

    Integer payloads survive exactly: the group table is filtered and
    column-pruned per side IN ARROW before any pandas conversion, so the
    null padding (which would force int64 -> float64 in pandas) never
    reaches a real row. For two genuinely 100 TB sides prefer Dataset.join
    (its exchange spills per partition); this operator's sweet spot is a
    big-but-bounded side pair below that, above the broadcast gate."""
    right_on = right_on or on

    def _pa_type(t) -> pa.DataType:
        # pandas-backed Ray schemas carry numpy dtypes / classes, not Arrow
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()  # object dtype: strings in this engine

    # pass left_schema/right_schema for a lazy side whose plan contains a
    # shuffle: Dataset.schema() would otherwise execute that upstream once
    # for the sample block and the join would then run it again
    ls = left_schema if left_schema is not None else left.schema()
    rs = right_schema if right_schema is not None else right.schema()
    ltypes = {n: _pa_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rs.names, rs.types)}
    key_map = dict(zip(right_on, on))  # right key name -> left key name
    left_cols = list(ls.names)
    r_payload = [c for c in rs.names if c not in key_map]
    r_out = {c: (c + suffix if c in ltypes else c) for c in r_payload}
    out_r_cols = [r_out[c] for c in r_payload]
    if len(set(left_cols) & set(out_r_cols)):
        raise ValueError("bucket_join: suffixed right columns still collide")

    def pad_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in left_cols}
        for c in r_payload:
            cols[r_out[c]] = pa.nulls(b.num_rows, rtypes[c])
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c in key_map.values():
                rkey = next(k for k, v in key_map.items() if v == c)
                cols[c] = b.column(rkey).cast(ltypes[c])
            else:
                cols[c] = pa.nulls(b.num_rows, ltypes[c])
        for c in r_payload:
            cols[r_out[c]] = b.column(c)
        cols["__side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow")
    )
    keys = list(on)

    def add_bucket(t: pa.Table) -> pa.Table:
        from tesseract_recognize_ray.hashing import stable_bucket_table

        bk = stable_bucket_table(t, keys, num_buckets)
        return t.append_column("__bucket", pa.array(bk, pa.int32()))

    def join_bucket(t: pa.Table) -> pa.Table:
        side = t.column("__side")
        lf = t.filter(pc.equal(side, 0)).select(left_cols).to_pandas()
        # SQL equi-join semantics: NULL never equals NULL — drop null-key
        # build rows IN ARROW so pandas merge can't match NaN against NaN
        # (left null-key rows then simply stay unmatched, correct for both
        # inner and left)
        rt = t.filter(pc.equal(side, 1)).select(keys + out_r_cols)
        keep = pc.is_valid(rt.column(keys[0]))
        for k in keys[1:]:
            keep = pc.and_(keep, pc.is_valid(rt.column(k)))
        out = lf.merge(rt.filter(keep).to_pandas(), on=keys, how=how)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        # TYPE-STABLE output: the pandas round trip upcasts int columns that
        # ever carried padding nulls to float64, which silently breaks a
        # chained bucket_join (float keys hash into different buckets than
        # the other side's ints). Cast every column back to its declared
        # type; pandas NaNs became Arrow nulls above, so int casts succeed —
        # anything genuinely uncastable keeps the merged type.
        want = {c: ltypes[c] for c in left_cols}
        want.update({r_out[c]: rtypes[c] for c in r_payload})
        arrays = []
        for name in tbl.column_names:
            col = tbl.column(name)
            wt = want.get(name)
            if wt is not None and col.type != wt and not pa.types.is_null(wt):
                try:
                    col = pc.cast(col, wt)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    pass
            arrays.append(col)
        return pa.table(dict(zip(tbl.column_names, arrays)))

    tagged = tagged.map_batches(add_bucket, batch_format="pyarrow")
    if reduce_blocks is not None:
        tagged = tagged.repartition(reduce_blocks)
    return tagged.groupby("__bucket").map_groups(
        lambda t: join_bucket(t.drop_columns(["__bucket"])), batch_format="pyarrow"
    )


def grouped_mad(
    ds: Dataset, key: str, value_col: str, *, out_col: str = "mad", num_buckets: int = 64
) -> Dataset:
    """Per-group median absolute deviation — SQL mad(): median(|x -
    median(x)|), NULLs ignored, even-count medians interpolated (np.median
    == DuckDB's interpolating median on the same values, so results
    value-match bit-for-bit on integer inputs). One bucketed shuffle
    co-locates each group whole (same bounded-group assumption as
    grouped_median); both medians compute inside the group, nothing else
    moves."""
    from ..hashing import stable_bucket_table

    def add_bucket(batch: pa.Table) -> pa.Table:
        # Arrow-side routing (stable_bucket_table): an int key column with
        # nulls in some batch must not re-route through pandas float coercion
        batch = batch.select([key, value_col])
        bk = stable_bucket_table(batch, [key], num_buckets)
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, sub in g.groupby(key, sort=False, dropna=False):
            v = sub[value_col].dropna().to_numpy(dtype=np.float64)
            m = float(np.median(np.abs(v - np.median(v)))) if len(v) else float("nan")
            out.append((k, m))
        return pd.DataFrame(out, columns=[key, out_col])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fn, batch_format="pandas")
    )


def write_bucketed(
    ds: Dataset, out_dir: str, keys: list[str], num_buckets: int = 16
) -> None:
    """Hive-write a table CO-PARTITIONED by a stable hash of the join keys:
    `out_dir/__bucket=i/...`. Two tables written with the same (keys domain,
    num_buckets) are join-aligned — bucket i of one can only match bucket i
    of the other — which is what copartitioned_join exploits to run an
    equi-join with ZERO exchange. The 100 TB pattern: pay the partitioning
    once at ingest, join many times for free (Hive/Spark bucketing,
    re-expressed as a hive-partitioned parquet layout)."""
    from tesseract_recognize_ray.hashing import stable_bucket_table

    def add_bucket(t: pa.Table) -> pa.Table:
        bk = stable_bucket_table(t, keys, num_buckets)
        return t.append_column("__bucket", pa.array(bk, pa.int32()))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["__bucket"]
    )


def copartitioned_join(
    dir_left: str,
    dir_right: str,
    on: list[str],
    *,
    num_buckets: int = 16,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    how: str = "inner",
    fold=None,
) -> Dataset:
    """ZERO-SHUFFLE equi-join of two write_bucketed tables: each task reads
    bucket i's fragment from BOTH directories and merges locally — no
    exchange, no broadcast, parallelism = num_buckets (size num_buckets so
    one bucket pair fits a worker's heap; at 100 TB that is thousands of
    buckets, each a few GB). `fold(joined_df) -> df` optionally combines
    each bucket's join output BEFORE it leaves the task (map-side
    aggregation fused into the join — the usual consumer shape), so only
    fold partials cross task boundaries. Missing bucket directories (hive
    skips empty partitions) behave as empty sides. `how` in
    {'inner', 'left'} — right/outer would need the empty-LEFT-dir path the
    skip logic does not implement."""
    import os

    import ray.data as rd

    if how not in ("inner", "left"):
        raise ValueError("copartitioned_join: how must be 'inner' or 'left'")

    def join_bucket(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for i in b["bucket"]:
            dl = os.path.join(dir_left, f"__bucket={int(i)}")
            dr = os.path.join(dir_right, f"__bucket={int(i)}")
            if not (os.path.isdir(dl) and os.path.isdir(dr)):
                if how == "inner" or not os.path.isdir(dl):
                    continue
            lf = pd.read_parquet(dl, columns=columns_left)
            if os.path.isdir(dr):
                rf = pd.read_parquet(dr, columns=columns_right)
            else:
                # typed empty right side: key columns must carry the LEFT
                # key dtypes or pandas refuses the int64-vs-object merge
                rf = pd.DataFrame({c: pd.Series(dtype=lf[c].dtype) if c in on else pd.Series(dtype="object")
                                   for c in (columns_right or on)})
            out = lf.merge(rf, on=on, how=how)
            frames.append(fold(out) if fold is not None else out)
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    ids = rd.from_items([{"bucket": i} for i in range(num_buckets)]).repartition(num_buckets)
    return ids.map_batches(join_bucket, batch_format="pandas", batch_size=1)


def skew_split_join(
    big: Dataset,
    small: Dataset,
    on: str,
    right_on: str | None = None,
    *,
    how: str = "inner",
    hot_keys: int = 32,
    num_buckets: int = 64,
    big_schema: "pa.Schema | None" = None,
    small_schema: "pa.Schema | None" = None,
    reduce_blocks: int | None = None,
) -> Dataset:
    """Skew-splitting hybrid equi-join: the probe side's hottest keys are
    detected from per-block count partials (each block ships at most
    4*hot_keys (key, n) rows — never the data), the small side's rows for
    those keys are broadcast once via ray.put and joined MAP-SIDE (hot rows
    never enter an exchange — the rows that would have formed the oversized
    shuffle partitions), and only the COLD remainder goes through the
    bucketed exchange. Output is identical to a plain join for any hot-key
    choice — the split is purely an execution strategy, so the same query
    stays SQL-replayable. `how` in {'inner', 'left'}.

    Partitioning assumptions (documented per the custom-operator rule): the
    small side holds a BOUNDED number of rows per hot key (they are pulled
    to the driver and broadcast — dimension-table shape), and per-block
    top-count pruning can miss a key that is globally hot but block-diffuse
    (it then simply joins on the cold path: slower, never wrong). The probe
    is consumed THREE times (counts, hot split, cold split) — pass a
    materialized or cheap-to-rescan dataset (Ray has no lineage cache)."""
    if how not in ("inner", "left"):
        raise ValueError("skew_split_join: how must be 'inner' or 'left'")
    right_on = right_on or on
    bs = big_schema if big_schema is not None else _ray_schema_to_arrow(big.schema())
    ss = small_schema if small_schema is not None else _ray_schema_to_arrow(small.schema())
    small_payload = [c for c in ss.names if c != right_on]
    collide = set(small_payload) & set(bs.names)
    if collide:
        raise ValueError(f"skew_split_join: small payload columns collide with big: {collide}")

    # 1. hot-key detection: per-block pruned count partials
    prune = 4 * hot_keys

    def block_counts(b: pa.Table) -> pa.Table:
        vc = b.column(on).value_counts()
        t = pa.table({on: vc.field("values"), "__n": vc.field("counts")})
        t = t.filter(pc.is_valid(t.column(on)))  # null keys never join
        if t.num_rows > prune:
            idx = pc.select_k_unstable(t, prune, [("__n", "descending")])
            t = t.take(idx)
        return t

    # the count-partial stream is at most prune x blocks rows (pruned per
    # block) — reducer-sized, so coalesce its exchange; at extreme block
    # counts (100 TB: millions of blocks) raise the coalesce target with
    # the block count (grouped_agg docstring rule)
    totals = grouped_agg(
        big.map_batches(block_counts, batch_format="pyarrow"),
        [on],
        [("__n", "sum", "__n")],
        reduce_blocks=16,
    )
    top = topk(totals, "__n", hot_keys, descending=True, tiebreak=[on]).to_pandas()
    hot_vals = pa.array(top[on].tolist(), bs.field(on).type)

    # 2. hot path: broadcast the small side's hot rows, merge map-side
    def split_small(keep: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.is_in(b.column(right_on), value_set=hot_vals)
            return b.filter(m if keep else pc.and_not(pc.is_valid(b.column(right_on)), m))

        return fn

    small_hot = small.map_batches(split_small(True), batch_format="pyarrow").to_pandas()
    if set(ss.names) - set(small_hot.columns):
        # zero hot rows on the small side: Ray 2.49 drops the empty
        # dataset's schema entirely — rebuild a TYPED empty frame or the
        # broadcast merge loses its key column
        small_hot = pa.Table.from_arrays(
            [pa.array([], f.type) for f in ss], schema=ss
        ).to_pandas()
    small_hot = small_hot.rename(columns={right_on: on})
    hot_ref = ray.put(small_hot)

    def split_big(keep: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.is_in(b.column(on), value_set=hot_vals), False)
            return b.filter(m if keep else pc.invert(m))

        return fn

    # for how='left', unmatched rows make pandas coerce int64 payload to
    # float64 NaN in whichever path has them — normalize BOTH paths'
    # integer payload columns to nullable Int64 so every union block
    # carries the same Arrow type (int64 with nulls), never a float/int mix
    int_payload = [c for c in small_payload if pa.types.is_integer(ss.field(c).type)]

    def _stabilize(df: pd.DataFrame) -> pd.DataFrame:
        if how == "left":
            for c in int_payload:
                df[c] = df[c].astype("Int64")
        return df

    def merge_hot(b: pd.DataFrame) -> pd.DataFrame:
        return _stabilize(b.merge(ray.get(hot_ref), on=on, how=how))

    hot_joined = big.map_batches(split_big(True), batch_format="pyarrow").map_batches(
        merge_hot, batch_format="pandas"
    )

    # 3. cold path: bucketed exchange join of the remainders
    cold_joined = bucket_join(
        big.map_batches(split_big(False), batch_format="pyarrow"),
        small.map_batches(split_small(False), batch_format="pyarrow"),
        on=(on,),
        right_on=(right_on,),
        how=how,
        num_buckets=num_buckets,
        left_schema=bs,
        right_schema=ss,
        reduce_blocks=reduce_blocks,
    )
    if how == "left":
        cold_joined = cold_joined.map_batches(_stabilize, batch_format="pandas")
    return hot_joined.union(cold_joined)


def _ray_schema_to_arrow(sch) -> pa.Schema:
    """Ray Schema wrapper -> pa.Schema (numpy/object dtypes become Arrow)."""

    def _pa_t(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    return pa.schema({n: _pa_t(t) for n, t in zip(sch.names, sch.types)})


def global_cummax(
    ds: Dataset,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cummax",
    num_buckets: int = 64,
    sample_per_block: int = 32,
) -> Dataset:
    """Distributed PREFIX SCAN: running max of value_col over a GLOBAL
    total order — SQL ``MAX(v) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)``. The streaming-watermark primitive (max event-time seen so
    far in arrival order). Shape: sampled range partitioning on the leading
    order column (global_row_number's machinery — no single-node sort),
    ONE tiny per-range max aggregate whose driver fold yields each range's
    PREFIX max (ranges are ordered), then a per-range sort + running max
    seeded with the broadcast prefix. order_cols must totally order rows
    (unique tiebreak) and the leading column's equal values never split
    across ranges (searchsorted boundary property)."""
    bucketed = _range_bucketed(ds, order_cols[0], num_buckets, sample_per_block)

    # per-range max -> ordered driver fold -> prefix max BEFORE each range.
    # The fold stays in the column's NATIVE dtype: int64 values beyond 2^53
    # must never round-trip through float64 (sentinel = iinfo.min / -inf)
    rmax = grouped_agg(bucketed, ["__rb"], [(value_col, "max", "__m")]).to_pandas()
    rmax = rmax.sort_values("__rb")
    ids = rmax["__rb"].to_numpy()
    mvals = rmax["__m"].to_numpy()
    is_int = np.issubdtype(mvals.dtype, np.integer)
    sentinel = np.iinfo(np.int64).min if is_int else -np.inf
    pref_vals = np.concatenate([[sentinel], np.maximum.accumulate(mvals)[:-1]])
    prefix = dict(zip(ids.tolist(), pref_vals.tolist()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["__rb"].iloc[0])
        g = g.drop(columns="__rb").sort_values(order_cols, kind="mergesort")
        v = g[value_col].to_numpy()
        run = np.maximum.accumulate(v)
        g[out_col] = np.maximum(run, v.dtype.type(prefix.get(bk, sentinel)))
        return g

    return bucketed.groupby("__rb").map_groups(scan, batch_format="pandas")


def global_cumsum(
    ds: Dataset,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
    num_buckets: int = 64,
    sample_per_block: int = 32,
) -> Dataset:
    """Distributed prefix SUM over a global total order — SQL ``SUM(v)
    OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``. Same
    range-partitioned scan shape as global_cummax: per-range sums fold to
    exact int64 prefix offsets on the driver (one value per range — never
    float64), each range then cumsums locally seeded with its prefix.
    order_cols must totally order rows; leading-column ties never split
    across ranges."""
    bucketed = _range_bucketed(ds, order_cols[0], num_buckets, sample_per_block)
    rsum = grouped_agg(bucketed, ["__rb"], [(value_col, "sum", "__s")]).to_pandas()
    rsum = rsum.sort_values("__rb")
    sums = rsum["__s"].to_numpy()
    zero = sums.dtype.type(0)
    pref_vals = np.concatenate([[zero], np.cumsum(sums)[:-1]])
    prefix = dict(zip(rsum["__rb"].to_numpy().tolist(), pref_vals.tolist()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["__rb"].iloc[0])
        g = g.drop(columns="__rb").sort_values(order_cols, kind="mergesort")
        v = g[value_col].to_numpy()
        g[out_col] = np.cumsum(v) + v.dtype.type(prefix.get(bk, 0))
        return g

    return bucketed.groupby("__rb").map_groups(scan, batch_format="pandas")


def zorder_key(cols: list[np.ndarray], bits: int = 16) -> np.ndarray:
    """Vectorized Morton (Z-order) key: each column is rank-normalized to
    `bits` bits and the bits of all columns are interleaved, so rows close
    in ANY dimension cluster together. Sorting a table by this key before a
    parquet write gives row-group statistics that prune selective filters
    on EVERY participating column — the lakehouse multi-dimensional
    clustering trick (public: Morton 1966; Delta/Iceberg OPTIMIZE ZORDER),
    where a plain sort prunes only its leading column. Inputs are int-like
    numpy arrays; ranks (not raw values) make skewed domains fill the key
    space evenly."""
    m = len(cols)
    if m * bits > 63:
        raise ValueError("zorder_key: m*bits must fit a signed int64")
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    scaled = []
    for c in cols:
        c = np.asarray(c)
        order = np.argsort(c, kind="mergesort")
        ranks = np.empty(len(c), dtype=np.uint64)
        ranks[order] = np.arange(len(c), dtype=np.uint64)
        denom = max(len(c) - 1, 1)
        scaled.append((ranks * ((1 << bits) - 1) // denom).astype(np.uint64))
    for b in range(bits):
        for j in range(m):
            out |= ((scaled[j] >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * m + j)
    return out.view(np.int64)


def write_zordered(
    ds: Dataset,
    out_dir: str,
    zcols: list[str],
    *,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write a table as parquet physically clustered by the Z-order of
    `zcols`: one pass adds the Morton key (rank-normalized PER BLOCK — a
    block-local approximation of the global rank that preserves locality
    without a global sort pass), a range exchange orders by it, and each
    output file covers one key range, so the parquet row-group min/max
    stats of EVERY zcol become selective. Readers filter with plain
    `read_parquet(filter=...)` — pruning needs no index, just the stats."""

    def add_key(b: pa.Table) -> pa.Table:
        cols = [b.column(c).to_numpy(zero_copy_only=False) for c in zcols]
        return b.append_column("__z", pa.array(zorder_key(cols, bits), pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    keyed.sort("__z").repartition(num_files).map_batches(
        lambda t: t.drop_columns(["__z"]), batch_format="pyarrow"
    ).write_parquet(out_dir)


def theta_join(
    left: Dataset,
    right: Dataset,
    pred,
    *,
    grid: tuple[int, int] = (8, 8),
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    chunk_rows: int = 4096,
) -> Dataset:
    """General THETA join (arbitrary predicate, no equality component
    required) via the 1-Bucket-Theta cross-product grid (Okcan &
    Riedewald, SIGMOD 2011 — public literature): the conceptual |L| x |R|
    pair matrix is tiled into a gr x gc grid; every left row is
    stable-hashed to ONE row-block and replicated to that row's gc cells,
    every right row to ONE column-block and replicated down its gr cells,
    and each of the gr*gc cells evaluates the predicate over its local
    cross product (chunked so no cell materializes its full pair block).

    Scale shape: works for ANY predicate with NO broadcastable side —
    shipped volume is |L|*gc + |R|*gr rows (pick gr ~ gc ~ sqrt(cells)),
    and every cell gets ~|L||R|/(gr*gc) pairs regardless of value skew
    (balance comes from hashing, not from the data). The total work IS the
    cross product — that is the price of generality. Prefer, in order:
    hash/bucket_join when the predicate has an equality component;
    asof/grid_range_join when it is a band over an orderable key (sort
    prunes the pair space); this operator when neither applies (e.g.
    |f(a) - g(b)| conditions over unrelated keys).

    `pred(merged: pd.DataFrame) -> bool mask` over the cross-merged chunk
    with final column names (right columns colliding with left names get
    `suffix`). Output columns: left_cols + right_cols (renamed)."""
    from ..hashing import stable_bucket_table

    gr, gc = grid
    lcols = left_cols or [str(c) for c in left.schema().names]
    rcols_in = right_cols or [str(c) for c in right.schema().names]
    ren = {c: (c + suffix if c in lcols else c) for c in rcols_in}
    rcols_out = [ren[c] for c in rcols_in]

    def explode_left(t: pa.Table) -> pa.Table:
        t = t.select(lcols)
        n = len(t)
        if not n:
            return t.append_column("__cell", pa.array([], pa.int32()))
        blocks = stable_bucket_table(t, lcols, gr).astype(np.int64)
        idx = np.repeat(np.arange(n), gc)
        cells = (np.repeat(blocks, gc) * gc + np.tile(np.arange(gc), n)).astype(np.int32)
        return t.take(pa.array(idx)).append_column("__cell", pa.array(cells, pa.int32()))

    def explode_right(t: pa.Table) -> pa.Table:
        t = t.select(rcols_in).rename_columns(rcols_out)
        n = len(t)
        if not n:
            return t.append_column("__cell", pa.array([], pa.int32()))
        blocks = stable_bucket_table(t, rcols_out, gc).astype(np.int64)
        idx = np.repeat(np.arange(n), gr)
        cells = (np.tile(np.arange(gr), n) * gc + np.repeat(blocks, gr)).astype(np.int32)
        return t.take(pa.array(idx)).append_column("__cell", pa.array(cells, pa.int32()))

    # pad each side onto the shared (left + right) schema IN ARROW; the
    # cell fn prunes back per side before pandas, so null padding never
    # coerces an int column (same trick as bucket_join). Pad types come
    # from the INPUT schemas: an all-empty exploded side loses its schema
    # entirely (Ray 2.49 empty-block pitfall) and must not crash the pad.
    def _arrow_schema(ds_in: Dataset, names: list[str], rename: dict | None) -> pa.Schema:
        base = ds_in.schema().base_schema
        if isinstance(base, pa.Schema):
            types = {f.name: f.type for f in base}
        else:  # pandas-backed block schema: numpy dtypes / classes
            types = {}
            for n, t in zip(base.names, base.types):
                try:
                    types[n] = pa.from_numpy_dtype(np.dtype(t))
                except (TypeError, pa.ArrowNotImplementedError):
                    types[n] = pa.string()
        inv = {v: k for k, v in rename.items()} if rename else {}
        return pa.schema([pa.field(n, types[inv.get(n, n)]) for n in names])

    l_schema = _arrow_schema(left, lcols, None)
    r_schema = _arrow_schema(right, rcols_out, ren)
    l_ex = left.map_batches(explode_left, batch_format="pyarrow")
    r_ex = right.map_batches(explode_right, batch_format="pyarrow")

    def pad(to_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            side = pa.array(np.full(n, 0 if to_left else 1, dtype=np.int8))
            cols = {"__side": side}
            for name in lcols + rcols_out + ["__cell"]:
                if name in t.column_names:
                    cols[name] = t.column(name)
                else:
                    src = r_schema if to_left else l_schema
                    cols[name] = pa.nulls(n, src.field(name).type)
            return pa.table(cols)

        return fn

    both = l_ex.map_batches(pad(True), batch_format="pyarrow").union(
        r_ex.map_batches(pad(False), batch_format="pyarrow")
    )

    def cell(t: pa.Table) -> pd.DataFrame:
        side = t.column("__side")
        lf = t.filter(pc.equal(side, 0)).select(lcols).to_pandas()
        rf = t.filter(pc.equal(side, 1)).select(rcols_out).to_pandas()
        # dtype-correct empty frame (head(0) cross merge keeps both schemas)
        empty = lf.head(0).merge(rf.head(0), how="cross")
        if not len(lf) or not len(rf):
            return empty
        outs = []
        for s in range(0, len(lf), chunk_rows):
            merged = lf.iloc[s : s + chunk_rows].merge(rf, how="cross")
            mask = np.asarray(pred(merged), dtype=bool)
            if mask.any():
                outs.append(merged[mask])
        return pd.concat(outs, ignore_index=True) if outs else empty

    return both.groupby("__cell").map_groups(cell, batch_format="pyarrow")


def scd2_compact(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    ts_col: str,
    *,
    open_end: str | None = None,
    num_buckets: int = 64,
) -> Dataset:
    """Change-log -> SCD Type-2 validity intervals: per key, ordered by
    order_cols, collapse each consecutive run of an unchanged ``value_col``
    into ONE row (key, value, valid_from = first ts of the run, valid_to =
    first ts of the NEXT run, n_events = run length) — the
    slowly-changing-dimension compaction a warehouse backfill runs over an
    event stream. The last (open) run's valid_to is ``open_end`` (an ISO
    timestamp sentinel, SCD-2 convention) or NaT when None.

    Scale shape: ONE hash(key) % num_buckets shuffle (all rows of a key
    share a bucket — the same co-location contract as window_lag), then per
    bucket a single mergesort + numpy run-length pass: no per-key Python
    dispatch, no state beyond the bucket. Output is one row per run — a
    large compaction of the input, so the result stream is strictly smaller
    than what was shuffled in. Equality on value_col is numpy ``!=`` per
    adjacent pair: None == None counts as "unchanged" (SQL IS NOT DISTINCT
    FROM); float NaN values would each start a new run — use a sentinel
    for NaN-able change columns."""
    from ..hashing import stable_bucket

    sentinel = np.datetime64(open_end) if open_end is not None else np.datetime64("NaT")

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = stable_bucket(batch[key], num_buckets)
        return batch

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            [key, *order_cols], kind="mergesort"
        )
        k = g[key].to_numpy()
        v = g[value_col].to_numpy()
        ts = g[ts_col].to_numpy()
        n = len(g)
        newkey = np.empty(n, dtype=bool)
        newkey[0] = True
        np.not_equal(k[1:], k[:-1], out=newkey[1:])
        chg = np.empty(n, dtype=bool)
        chg[0] = True
        np.not_equal(v[1:], v[:-1], out=chg[1:])
        starts = np.flatnonzero(newkey | chg)
        ends = np.append(starts[1:], n)
        rk, rv, vf = k[starts], v[starts], ts[starts]
        vt = np.empty(len(starts), dtype=ts.dtype)
        vt[:-1] = vf[1:]
        vt[-1] = sentinel
        open_run = np.empty(len(starts), dtype=bool)
        open_run[:-1] = rk[1:] != rk[:-1]
        open_run[-1] = True
        vt[open_run] = sentinel
        return pd.DataFrame(
            {
                key: rk,
                value_col: rv,
                "valid_from": vf,
                "valid_to": vt,
                "n_events": (ends - starts).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fn, batch_format="pandas")
    )


def snapshot_diff(
    base: Dataset,
    new: Dataset,
    keys: list[str],
    compare_cols: list[str],
    *,
    num_buckets: int = 64,
    out_col: str = "change",
) -> Dataset:
    """CDC-style snapshot compare: rows keyed by ``keys`` are classified as
    'added' (key only in new), 'removed' (key only in base) or 'changed'
    (key in both, any compare_col differs under IS DISTINCT FROM — NaN/None
    equal themselves, matching the SQL oracle). UNCHANGED ROWS ARE DROPPED
    map-side of nothing — they simply never leave the per-bucket compare,
    so the output is proportional to the churn, not the table.

    Scale shape: one side-tagged union + one hash(keys) % num_buckets
    co-location exchange (the bucket_join layout), then per bucket a single
    vectorized pandas merge + column compare. Assumes keys are unique per
    snapshot (a snapshot is a keyed table); duplicate keys raise."""
    from ..hashing import stable_bucket_table

    cols = keys + compare_cols

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            bk = stable_bucket_table(t, keys, num_buckets)
            return t.append_column(
                "__bucket", pa.array(bk, pa.int32())
            ).append_column("__side", pa.array(np.full(t.num_rows, side, np.int8)))

        return fn

    both = base.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["__side"] == 0].drop(columns=["__bucket", "__side"])
        n = g[g["__side"] == 1].drop(columns=["__bucket", "__side"])
        for side, frame in (("base", b), ("new", n)):
            if frame.duplicated(keys).any():
                raise ValueError(f"snapshot_diff: duplicate keys in {side} snapshot")
        m = b.merge(n, on=keys, how="outer", suffixes=("__b", "__n"), indicator=True)
        status = np.where(
            m["_merge"] == "right_only",
            "added",
            np.where(m["_merge"] == "left_only", "removed", ""),
        ).astype(object)
        in_both = (m["_merge"] == "both").to_numpy()
        if in_both.any():
            differs = np.zeros(len(m), dtype=bool)
            for c in compare_cols:
                lv, rv = m[f"{c}__b"], m[f"{c}__n"]
                # IS DISTINCT FROM: NaN == NaN, None == None
                neq = (lv != rv) & ~(lv.isna() & rv.isna())
                differs |= neq.to_numpy()
            status[in_both & differs] = "changed"
        keep = status != ""
        out = m.loc[keep, keys].copy()
        out[out_col] = status[keep]
        return out

    return both.groupby("__bucket").map_groups(diff, batch_format="pandas")


def constraint_audit(
    ds: Dataset,
    checks: list[tuple[str, str, dict]],
) -> Dataset:
    """Deequ-style data-quality audit: evaluate a list of declarative
    constraints in one streaming pass and emit (check_name, n_violations)
    — one tiny row per constraint, the pre-ingest gate a training pipeline
    runs before accepting a shard.

    checks = [(name, kind, params)] with kinds:
      not_null(col)            — nulls violate
      min_value(col, lo) / max_value(col, hi) — out-of-range violates
                                 (nulls do NOT violate value checks; add a
                                 not_null check for that)
      in_set(col, values)      — membership
      unique(cols)             — rows beyond the first per key violate
                                 (keys assumed non-null)

    Scale shape: every ROW-LOCAL kind folds in ONE shared map pass — each
    block emits |checks| int64 partial rows, so the reduce sees
    |checks| x |blocks| rows regardless of data size. Each unique() check
    adds one grouped_agg key-count exchange (per-block combiner, the only
    shuffle a uniqueness proof fundamentally needs) whose count stream
    folds to a single row per block before the shared tiny reduce
    (reduce_blocks is safe here: the stream is |checks|-bounded)."""
    rowlocal = [(n, k, p) for n, k, p in checks if k != "unique"]
    uniques = [(n, k, p) for n, k, p in checks if k == "unique"]
    kinds = {"not_null", "min_value", "max_value", "in_set", "unique"}
    for _, k, _ in checks:
        if k not in kinds:
            raise ValueError(f"constraint_audit: unknown kind {k!r}")

    def partial(t: pa.Table) -> pa.Table:
        names, ns = [], []
        for name, kind, p in rowlocal:
            col = t.column(p["col"])
            if kind == "not_null":
                bad = pc.is_null(col)
            elif kind == "max_value":
                bad = pc.fill_null(pc.greater(col, p["hi"]), False)
            elif kind == "min_value":
                bad = pc.fill_null(pc.less(col, p["lo"]), False)
            else:  # in_set — pc.is_in maps null to False (never null), so
                # mask nulls explicitly: they don't violate membership
                bad = pc.and_(
                    pc.invert(pc.is_in(col, value_set=pa.array(list(p["values"])))),
                    pc.is_valid(col),
                )
            names.append(name)
            ns.append(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "n_violations": pa.array(ns, pa.int64()),
            }
        )

    streams = [ds.map_batches(partial, batch_format="pyarrow")] if rowlocal else []
    for name, _, p in uniques:
        cols = list(p["cols"])
        cnt = grouped_agg(ds, cols, [(cols[0], "count", "__c")])

        def over(t: pa.Table, name=name) -> pa.Table:
            dup = pc.sum(pc.subtract(t.column("__c"), 1)).as_py() or 0
            return pa.table(
                {
                    "check_name": pa.array([name], pa.string()),
                    "n_violations": pa.array([int(dup)], pa.int64()),
                }
            )

        streams.append(cnt.map_batches(over, batch_format="pyarrow"))

    allp = streams[0]
    for s in streams[1:]:
        allp = allp.union(s)
    return grouped_agg(
        allp,
        ["check_name"],
        [("n_violations", "sum", "n_violations")],
        reduce_blocks=4,
    )


def decayed_count(
    ds: Dataset,
    key: str,
    ts_col: str,
    *,
    half_life_s: float,
    now=None,
    out_col: str = "decay_e9",
) -> Dataset:
    """Exponentially-decayed event count per key (the trending-topics /
    recency-weighted-frequency primitive): score = sum over the key's
    events of 2^(-(now - t)/half_life). Each addend is quantized to an
    int64 BEFORE the sum (round(w * 1e9) — the unigram_logprob micro-unit
    trick), so the distributed reduce is exact integer addition in any
    order and a SQL oracle replays it bit-for-bit; emitting the raw float
    sum instead would flip 1e-9-rounded comparisons at ~1e-12 probability
    per key, which a 10^9-key corpus turns into certainties.

    Scale shape: one tiny Max(ts) pass when ``now`` is None (the decay
    anchor must be one global constant), then per-block pyarrow partials
    feed grouped_agg's bucketed combiner reduce — one row per key per
    block on the wire."""
    if now is None:
        agg = ds.aggregate(Max(ts_col))
        now = agg[f"max({ts_col})"]
    now64 = np.datetime64(now, "us").astype("int64")
    lam = np.log(2.0) / float(half_life_s)

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]")
        dt_s = (now64 - ts.astype("int64")).astype(np.float64) / 1e6
        q = np.round(np.exp(-lam * dt_s) * 1e9).astype(np.int64)
        return pa.table({key: t.column(key), "__q": pa.array(q)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(parts, [key], [("__q", "sum", out_col)])
