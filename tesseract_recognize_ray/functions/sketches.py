"""Probabilistic sketches for web-scale profiling, built mergeable-first:
the map side emits tiny partial summaries per batch, the shuffle moves only
summary rows (never raw values), and a small reduce finalizes.

  * hll_approx_distinct — HyperLogLog cardinality: per-batch register
    partials (vectorized 64-bit hashing, numpy leading-zero ranks) →
    groupby(register).max → driver-side estimate over ≤2^p rows. Standard
    bias handling: linear counting below the small-range threshold.
  * frequent_terms — a SpaceSaving/Misra-Gries-style frequent-items
    sketch: per-batch top-m counters with the (m+1)-th count subtracted
    (undercount ≤ batch_N/(m+1), summed ≤ N/(m+1) globally), groupby-sum,
    then top-k. Bounds shuffle rows to m per batch regardless of the
    distinct-token blowup — the exact wordcount's combiner can't promise
    that on adversarial vocabulary.

No external dependencies — hashing is pandas' fixed-key SipHash
(hashing.stable_bucket's underlying kernel), estimates are pure numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def _hash64(values: pd.Series) -> np.ndarray:
    """Deterministic (process-stable) vectorized 64-bit hash."""
    return pd.util.hash_pandas_object(values, index=False).to_numpy()


def _md5_hash64(values: pd.Series) -> np.ndarray:
    """First 8 big-endian bytes of md5(str(value)) as uint64 — the one
    64-bit hash an ANSI-SQL oracle can recompute exactly
    (``('0x' || substr(md5(v::VARCHAR), 1, 16))::UBIGINT`` in DuckDB; same
    pattern as textstats.fingerprint's hash_fn='md5'). Hashes each DISTINCT
    value once (python md5 per unique, vectorized map-back) — bounded by
    the batch's value cardinality, not its row count."""
    import hashlib

    uniq = pd.unique(values)
    lut = {
        v: np.uint64(int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16))
        for v in uniq
    }
    return values.map(lut).to_numpy(dtype=np.uint64)


def _pick_hash(hash_fn: str):
    if hash_fn == "pandas":
        return _hash64
    if hash_fn == "md5":
        return _md5_hash64
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'pandas' or 'md5')")


def _bit_length(tail: np.ndarray) -> np.ndarray:
    """Exact bit length of non-negative int64/uint64 values < 2^53 via
    frexp (x = mant * 2^exp, mant in [0.5, 1) -> exp IS the bit length;
    float64 conversion is exact below 2^53, unlike floor(log2(x)) whose
    correctly-rounded log can round up at 2^k boundaries)."""
    return np.frexp(tail.astype(np.float64))[1].astype(np.int64)


def hll_approx_distinct(ds: Dataset, col: str, p: int = 14, *, hash_fn: str = "pandas") -> int:
    """Approximate COUNT(DISTINCT col) with a 2^p-register HyperLogLog
    (standard error ≈ 1.04/sqrt(2^p); p=14 → ~0.8%).

    Scale shape: each batch contributes at most 2^p (register, rank) rows
    (already maximized locally), the groupby(register).max shuffle moves
    register summaries only, and the final estimate folds ≤2^p rows on the
    driver — the raw column never leaves the map stage. Deterministic: the
    hash is fixed-key, so the estimate is reproducible run to run.
    ``hash_fn='md5'`` makes the whole sketch VALUE-replayable by a SQL
    oracle (registers from md5 prefixes, exact bit-length ranks, the same
    estimator arithmetic)."""
    hasher = _pick_hash(hash_fn)
    m = 1 << p
    tail_bits = 64 - p

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = hasher(b[col].dropna())
        if len(h) == 0:
            return pd.DataFrame({"reg": pd.Series(dtype="int64"), "rank": pd.Series(dtype="int64")})
        reg = (h >> np.uint64(tail_bits)).astype(np.int64)
        tail = h & np.uint64((1 << tail_bits) - 1)
        # rank = leading zeros of the tail (within tail_bits) + 1
        rank = tail_bits - _bit_length(tail) + 1
        df = pd.DataFrame({"reg": reg, "rank": rank})
        return df.groupby("reg", as_index=False)["rank"].max()

    regs = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("reg")
        .aggregate(Max("rank", alias_name="rank"))
        .to_pandas()
    )
    M = np.zeros(m, dtype=np.float64)
    M[regs["reg"].to_numpy()] = regs["rank"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-M))
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:  # small-range linear counting
        est = m * np.log(m / zeros)
    return int(round(est))


def histogram_quantile_sketch(
    ds: Dataset, col: str, qs: list[float], nbins: int = 4096
) -> dict[float, float]:
    """Mergeable approximate quantiles via an exact fixed-bin histogram:
    pass 1 is a tiny Min/Max aggregate, pass 2 bins every value
    (vectorized bincount per batch — at most `nbins` partial rows per
    batch) and groupby(bin).sum moves only bin summaries; the driver folds
    ≤nbins rows and interpolates uniformly inside the target bin.

    Error ≤ one bin width = (max-min)/nbins — DETERMINISTIC regardless of
    block order (exact counts, exact extremes), unlike sampling sketches.
    The scale contrast: an exact quantile needs a full sort (all-to-all on
    every row); this moves O(blocks x nbins) summary rows."""
    stats = ds.aggregate(Min(col), Max(col))
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if hi == lo:
        return {q: lo for q in qs}
    w = (hi - lo) / nbins

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        bins = np.minimum(((v - lo) / w).astype(np.int64), nbins - 1)
        cnt = np.bincount(bins, minlength=nbins)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bin": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)})

    hdf = ds.map_batches(partial, batch_format="pandas").groupby("bin").sum("n").to_pandas()
    counts = np.zeros(nbins, dtype=np.float64)
    counts[hdf["bin"].to_numpy()] = hdf["sum(n)"].to_numpy()
    c = np.cumsum(counts)
    total = c[-1]
    out: dict[float, float] = {}
    for q in qs:
        target = q * total
        i = int(np.searchsorted(c, target, side="left"))
        i = min(i, nbins - 1)
        prev = c[i - 1] if i else 0.0
        frac = (target - prev) / counts[i] if counts[i] else 0.0
        out[q] = lo + (i + min(frac, 1.0)) * w
    return out


def frequent_terms(
    ds: Dataset, text_col: str, k: int = 20, m: int = 4096
) -> Dataset:
    """Frequent-items sketch over whitespace tokens: returns the top-k
    (token, n_min) with n_min an UNDERestimate off by at most
    total_tokens/(m+1) (the per-batch Misra-Gries decrement, summed). Use
    when the distinct-token count is unbounded and the exact wordcount's
    one-row-per-distinct-token-per-block combiner is itself the bottleneck;
    candidates can be re-counted exactly in a second cheap pass."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[text_col].fillna("").str.split().explode().dropna().value_counts()
        if len(vc) > m:
            vc = (vc.iloc[:m] - int(vc.iloc[m])).clip(lower=0)
            vc = vc[vc > 0]
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object), "n_min": vc.to_numpy()})

    summed = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n_min", alias_name="n_min"))
    )
    from .relational import topk

    return topk(summed, "n_min", k, descending=True, tiebreak=["token"]).select_columns(
        ["token", "n_min"]
    )


def count_min_sketch(
    ds: Dataset, col: str, depth: int = 4, width: int = 2048, *, hash_fn: str = "pandas"
) -> np.ndarray:
    """Count-Min sketch of a column's value frequencies (Cormode &
    Muthukrishnan 2005): a depth x width int64 counter matrix; query an
    item's estimate with :func:`count_min_query` (min over rows — never an
    undercount, overcount ≤ e*N/width with prob 1-e^-depth).

    Scale shape (mergeable-first like the module's other sketches): every
    batch bincounts its values into ONE fixed-size (depth*width) partial —
    batch row count never changes the partial's size — the shuffle moves
    flattened partial rows keyed by cell index, and a groupby-sum reduce
    yields the global matrix (counters are additive, so partials compose
    exactly like the 100 TB tree-reduce would). The driver folds depth*width
    rows, independent of input size.

    ``hash_fn='md5'`` makes sketch AND queries SQL-replayable: the base
    hash is the md5 prefix and the per-row remix is plain mod-2^64
    arithmetic + xor-shift (DuckDB: HUGEINT products % 2^64, xor(), >>)."""
    hasher = _pick_hash(hash_fn)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = hasher(b[col])
        mat = np.zeros(depth * width, dtype=np.int64)
        for d in range(depth):
            # row-d hash: splitmix-style remix of the base hash, then mod width
            salt = np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
            hd = (h ^ salt) * np.uint64(0xBF58476D1CE4E5B9)
            hd ^= hd >> np.uint64(31)
            cells = (hd % np.uint64(width)).astype(np.int64) + d * width
            mat += np.bincount(cells, minlength=depth * width)
        nz = np.nonzero(mat)[0]
        return pd.DataFrame({"cell": nz.astype("int64"), "cnt": mat[nz]})

    parts = ds.map_batches(partial, batch_format="pandas")
    acc = np.zeros(depth * width, dtype=np.int64)
    for b in parts.iter_batches(batch_size=None, batch_format="pandas"):
        np.add.at(acc, b["cell"].to_numpy(), b["cnt"].to_numpy())
    return acc.reshape(depth, width)


def count_min_query(
    sketch: np.ndarray, items: pd.Series, *, hash_fn: str = "pandas"
) -> np.ndarray:
    """Frequency estimates for `items` from a count_min_sketch matrix: the
    min across depth rows (vectorized over the whole probe set). hash_fn
    must match the sketch's."""
    depth, width = sketch.shape
    h = _pick_hash(hash_fn)(items)
    est = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        salt = np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
        hd = (h ^ salt) * np.uint64(0xBF58476D1CE4E5B9)
        hd ^= hd >> np.uint64(31)
        est = np.minimum(est, sketch[d, (hd % np.uint64(width)).astype(np.int64)])
    return est


def hll_grouped_distinct(
    ds: Dataset,
    key: str,
    col: str,
    p: int = 12,
    *,
    out_col: str = "approx_distinct",
    num_buckets: int = 64,
    hash_fn: str = "pandas",
) -> Dataset:
    """Per-group approximate COUNT(DISTINCT col) — the grouped HyperLogLog
    (standard error ~1.04/sqrt(2^p); p=12 -> ~1.6%). The scale primitive
    for per-domain/per-language cardinality dashboards where exact distinct
    per group would shuffle every raw value.

    Scale shape: each batch emits at most 2^p (key, register, rank) rows
    PER KEY IN THE BATCH (locally maximized — the raw column never leaves
    the map stage); one bucketed shuffle co-locates each key's register
    summaries; inside the bucket a vectorized (key, reg) max and a per-key
    fold produce the estimate (with the standard small-range linear
    counting correction). Register partials are max-mergeable, so block
    order and partitioning cannot change the estimate."""
    from tesseract_recognize_ray.hashing import stable_bucket_table

    hasher = _pick_hash(hash_fn)
    m = 1 << p
    tail_bits = 64 - p

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[key, col]][b[col].notna()]
        if len(d) == 0:
            return pd.DataFrame(
                {key: d[key], "reg": pd.Series(dtype="int64"), "rank": pd.Series(dtype="int64")}
            )
        h = hasher(d[col])
        reg = (h >> np.uint64(tail_bits)).astype(np.int64)
        tail = h & np.uint64((1 << tail_bits) - 1)
        rank = tail_bits - _bit_length(tail) + 1
        df = pd.DataFrame({key: d[key].to_numpy(), "reg": reg, "rank": rank})
        return df.groupby([key, "reg"], as_index=False, dropna=False)["rank"].max()

    def add_bucket(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        bk = stable_bucket_table(t, [key], num_buckets)
        return t.append_column("__bucket", pa.array(bk, pa.int32()))

    alpha = 0.7213 / (1.0 + 1.079 / m)

    def est_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mx = g.groupby([key, "reg"], sort=False, dropna=False, as_index=False)["rank"].max()
        out = []
        for k, sub in mx.groupby(key, sort=False, dropna=False):
            M = np.zeros(m, dtype=np.float64)
            M[sub["reg"].to_numpy()] = sub["rank"].to_numpy()
            est = alpha * m * m / np.sum(np.exp2(-M))
            zeros = m - len(sub)
            if est <= 2.5 * m and zeros > 0:
                est = m * np.log(m / zeros)
            out.append((k, int(round(est))))
        return pd.DataFrame(out, columns=[key, out_col])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: est_bucket(g.drop(columns="__bucket")), batch_format="pandas")
    )


def grouped_histogram_quantile(
    ds: Dataset, key: str, col: str, qs: list[float], nbins: int = 1024, num_buckets: int = 64
) -> Dataset:
    """PER-GROUP approximate quantiles for UNBOUNDED key domains — the
    scale path the exact grouped_quantile_* family documents itself out of
    (those co-locate each group whole, so a hot key's rows must fit one
    worker). Here per-key state is AT MOST nbins bin counts regardless of
    group size: one global Min/Max pass fixes shared bin edges, each block
    emits (key, bin, n) partials (one vectorized pandas groupby), a
    bucketed exchange merges them, and the per-key quantile fold walks
    ≤nbins rows. Error ≤ one bin width = (max-min)/nbins, deterministic
    (exact counts, exact extremes). Output: (key, q, value)."""
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    # the per-block partial drops NaNs — the EDGE pass must too, or one NaN
    # poisons lo/hi and every bin index silently goes to garbage
    def _drop_nan(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        return pd.DataFrame({col: v[~np.isnan(v)]})

    stats = ds.map_batches(_drop_nan, batch_format="pandas").aggregate(_Min(col), _Max(col))
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    from .relational import grouped_agg

    if hi == lo:
        def const(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({key: b[key], "__one": np.ones(len(b), dtype=np.int64)})

        keys = grouped_agg(ds.map_batches(const, batch_format="pandas"), [key], [("__one", "sum", "__n")])

        def emit_const(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({key: [g[key].iloc[0]] * len(qs), "q": qs, "value": [lo] * len(qs)})

        return keys.groupby(key).map_groups(emit_const, batch_format="pandas")
    w = (hi - lo) / nbins

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        bins = np.minimum(((v[ok] - lo) / w).astype(np.int64), nbins - 1)
        df = pd.DataFrame({key: b[key].to_numpy()[ok], "bin": bins})
        g = df.groupby([key, "bin"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    merged = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"), [key, "bin"], [("n", "sum", "n")]
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        b = g["bin"].to_numpy()
        n = g["n"].to_numpy(np.float64)
        c = np.cumsum(n)
        total = c[-1]
        vals = []
        for q in qs:
            target = q * total
            i = int(np.searchsorted(c, target, side="left"))
            i = min(i, len(b) - 1)
            prev = c[i - 1] if i else 0.0
            frac = (target - prev) / n[i] if n[i] else 0.0
            vals.append(lo + (b[i] + min(frac, 1.0)) * w)
        return pd.DataFrame({key: [g[key].iloc[0]] * len(qs), "q": qs, "value": vals})

    return merged.groupby(key).map_groups(fold, batch_format="pandas")


def exact_quantile_2pass(
    ds: Dataset, col: str, qs: list[float], nbins: int = 4096
) -> dict[float, float]:
    """EXACT quantiles (k-th order statistics, k = ceil(q*N), discrete /
    lower semantics) in TWO streaming passes — no all-to-all sort:

      pass 1: the histogram_quantile_sketch layout (Min/Max + exact
              per-bin counts, one bin-summary exchange) locates, for every
              requested q, the bin that CONTAINS the k-th value and how
              many values fall below that bin;
      pass 2: ONE filtered scan materializes only the candidate bins'
              values (expected N/nbins rows per bin — bounded and tiny),
              and the driver picks the (k - below)-th smallest inside each.

    The classic distributed-selection contrast: an exact quantile via sort
    moves EVERY row through an all-to-all; this moves bin summaries plus
    one bin's worth of raw values per quantile. Ties are harmless (the
    k-th order statistic is tie-order-independent). NaNs are excluded,
    matching SQL aggregate semantics."""
    stats = ds.aggregate(Min(col), Max(col))
    if (
        stats is None
        or stats.get(f"min({col})") is None
        or np.isnan(float(stats[f"min({col})"]))
    ):
        # empty dataset or all-NaN column: there is no order statistic to
        # return; fail loudly instead of indexing an empty candidate array
        # in pass 2 (and instead of letting w=NaN poison the binning)
        raise ValueError(
            f"exact_quantile_2pass: column {col!r} has no non-NaN values"
        )
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if hi == lo:
        return {q: lo for q in qs}
    w = (hi - lo) / nbins

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        bins = np.minimum(((v - lo) / w).astype(np.int64), nbins - 1)
        cnt = np.bincount(bins, minlength=nbins)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bin": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)})

    hdf = ds.map_batches(partial, batch_format="pandas").groupby("bin").sum("n").to_pandas()
    counts = np.zeros(nbins, dtype=np.int64)
    counts[hdf["bin"].to_numpy()] = hdf["sum(n)"].to_numpy()
    csum = np.cumsum(counts)
    total = int(csum[-1])

    want: dict[float, tuple[int, int, int]] = {}  # q -> (bin, k, below)
    for q in qs:
        k = max(1, int(-(-q * total // 1)))  # ceil, 1-based
        k = min(k, total)
        b = int(np.searchsorted(csum, k, side="left"))
        below = int(csum[b - 1]) if b else 0
        want[q] = (b, k, below)

    target_bins = sorted({b for b, _k, _below in want.values()})
    blo = {b: lo + b * w for b in target_bins}

    def grab(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        bins = np.minimum(((v - lo) / w).astype(np.int64), nbins - 1)
        keep = np.isin(bins, target_bins)
        return pd.DataFrame({"bin": bins[keep], "v": v[keep]})

    cand = ds.map_batches(grab, batch_format="pandas").to_pandas()
    out: dict[float, float] = {}
    for q, (b, k, below) in want.items():
        vals = np.sort(cand.loc[cand["bin"] == b, "v"].to_numpy())
        out[q] = float(vals[k - below - 1])
    return out


def grouped_exact_quantile(
    ds: Dataset,
    key: str,
    col: str,
    qs: list[float],
    nbins: int = 1024,
    num_buckets: int = 64,
) -> Dataset:
    """EXACT per-key quantiles (k-th order statistics, k = ceil(q*n_key))
    for UNBOUNDED key domains — the selection upgrade of
    grouped_histogram_quantile, and the scale upgrade of the exact
    grouped_quantile_* family (those co-locate each key's FULL history;
    here a hot key never ships more than its candidate-bin values):

      pass 1: per-(key, bin) exact counts (map-side combiner, bucketed
              reduce) -> per-key locate (one vectorized pandas pass per
              bucket) -> candidate set {key -> (q, bin, k, below)};
      pass 2: rows prune MAP-SIDE against the broadcast candidate pairs
              (expected N*|qs|/nbins rows survive), one co-location
              shuffle, and a per-key sort of ONLY those values picks each
              (k - below)-th.

    The broadcast candidate set is |keys| x |qs| entries — the same size
    as the operator's OUTPUT, the fits-one-heap contract every
    output-sized driver structure here documents. Ties are harmless
    (order statistics are tie-order-independent); NaNs excluded."""
    from tesseract_recognize_ray.hashing import stable_bucket

    import ray

    if key in ("q", "value"):
        raise ValueError("grouped_exact_quantile: key may not be named 'q' or 'value'")
    stats = ds.aggregate(Min(col), Max(col))
    if (
        stats is None
        or stats.get(f"min({col})") is None
        or np.isnan(float(stats[f"min({col})"]))
    ):
        raise ValueError(
            f"grouped_exact_quantile: column {col!r} has no non-NaN values"
        )
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if hi == lo:
        keys = ds.groupby(key).count().to_pandas()
        rows = [(k, q, lo) for k in keys[key] for q in qs]
        return ray.data.from_pandas(
            pd.DataFrame(rows, columns=[key, "q", "value"])
        )
    w = (hi - lo) / nbins

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        bins = np.minimum(((v[ok] - lo) / w).astype(np.int64), nbins - 1)
        g = (
            pd.DataFrame({key: b[key].to_numpy()[ok], "bin": bins})
            .groupby([key, "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype("int64")
        return g

    from .relational import grouped_agg

    merged = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"), [key, "bin"], [("n", "sum", "n")]
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = stable_bucket(b[key], num_buckets)
        return b

    def locate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values([key, "bin"], kind="mergesort")
        out = []
        for k_, sub in g.groupby(key, sort=False):
            c = sub["n"].to_numpy().cumsum()
            total = int(c[-1])
            for q in qs:
                kth = min(max(1, int(-(-q * total // 1))), total)
                i = int(np.searchsorted(c, kth, side="left"))
                below = int(c[i - 1]) if i else 0
                out.append((k_, float(q), int(sub["bin"].iloc[i]), kth, below))
        # dunder names: the caller's key column may be called anything
        return pd.DataFrame(out, columns=[key, "__q", "__bin", "__kth", "__below"])

    cand = (
        merged.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(locate, batch_format="pandas")
        .to_pandas()
    )
    # broadcast: (key, bin) -> list of (q, k, below); output-sized
    pairs: dict = {}
    for kv, qv, bv, kt, bl in zip(
        cand[key], cand["__q"], cand["__bin"], cand["__kth"], cand["__below"]
    ):
        pairs.setdefault((kv, bv), []).append((qv, kt, bl))
    pref = ray.put(pairs)

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        pm = ray.get(pref)
        v = b[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        kk = b[key].to_numpy()[ok]
        v = v[ok]
        bins = np.minimum(((v - lo) / w).astype(np.int64), nbins - 1)
        # vectorized membership: MultiIndex.isin is a C hash probe
        mi = pd.MultiIndex.from_arrays([kk, bins])
        keep = mi.isin(list(pm.keys()))
        out = pd.DataFrame({key: kk[keep], "__bin": bins[keep], "__v": v[keep]})
        out["__bucket"] = stable_bucket(out[key], num_buckets)
        return out

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        pm = ray.get(pref)
        g = g.drop(columns="__bucket")
        out = []
        for (k_, b_), sub in g.groupby([key, "__bin"], sort=False):
            vals = np.sort(sub["__v"].to_numpy())
            for q, kth, below in pm[(k_, b_)]:
                out.append((k_, float(q), float(vals[kth - below - 1])))
        return pd.DataFrame(out, columns=[key, "q", "value"])

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(pick, batch_format="pandas")
    )
