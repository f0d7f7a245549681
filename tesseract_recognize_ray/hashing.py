"""Stable, vectorized shuffle-key hashing.

Every bucketed shuffle in the engine (doc reassembly G3, window_lag,
sessionize, the resumable doc-hash partitioner) needs bucket = H(key) % P
where H is deterministic across processes/sessions (Python's builtin hash is
salted and must never be used) and vectorized (a per-row Python hash loop on
the hottest shuffle inputs was round 1's #4 anti-pattern — VERDICT.md).

pandas' fixed-key SipHash-like hasher (``pd.util.hash_pandas_object``, C
kernels for both object-string and integer arrays, hash key hardcoded to
"0123456789123456") gives both properties in one call. Bucket VALUES differ
from the old crc32 scheme — only co-location matters, not which bucket a key
lands in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_bucket(values, num_buckets: int) -> np.ndarray:
    """int32 bucket id per value, vectorized and process-stable.

    Accepts a pandas Series, numpy array, pyarrow Array/ChunkedArray, or any
    sequence; strings and integers both take C-speed paths."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def stable_bucket_table(t: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    """int32 bucket id per row of an Arrow table over multi-column keys,
    null-safe and dtype-canonical. The single-Series path above is wrong for
    an INT column that carries nulls in SOME batches: to_pandas coerces that
    batch to float64 and pandas hashes float64 5.0 differently from int64 5,
    so the same key routes to different buckets depending on which batch it
    arrived in. Here integer/temporal columns hash from their Arrow int64
    values (nulls filled, flagged separately — never a dtype coercion), and
    only string/other columns take the pandas hasher, whose dtype is stable
    per column. Co-location is the contract, not specific bucket values."""
    n = len(t)
    h = np.zeros(n, dtype=np.uint64)
    P = np.uint64(1099511628211)
    NULLMIX = np.uint64(0x9E3779B97F4A7C15)
    for k in keys:
        col = t.column(k)
        isnull = np.asarray(pa.chunked_array([col]).is_null()).astype(np.uint64)
        typ = col.type
        if pa.types.is_integer(typ) or pa.types.is_temporal(typ) or pa.types.is_boolean(typ):
            import pyarrow.compute as pc

            filled = pc.fill_null(pc.cast(col, pa.int64()), 0)
            v = filled.to_numpy(zero_copy_only=False).astype(np.uint64)
            # spread with the pandas hasher's multiplicative finalizer shape
            v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        else:
            s = col.to_pandas()
            # dtype-preserving null slot (flagged separately below): "" for
            # object/string columns, 0.0 for floats — filling a float column
            # with "" would flip it to object and desync from null-free batches
            s = s.fillna("" if s.dtype == object else 0.0)
            v = pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)
        h = (h * P) ^ (v + isnull * NULLMIX)
    return (h % np.uint64(num_buckets)).astype(np.int32)
