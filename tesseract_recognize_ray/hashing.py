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
