"""Sharded mutable key-value index on raw Ray actors — the one stateful
shape the Dataset API genuinely can't express (a shared index that many
concurrently-running map tasks read AND write). Everything else in this
engine is a Dataset transform; this module is the documented escape hatch.

Design (SURVEY.md §2.4 / ray_guide actor patterns):
  * N `_KeyShard` actors, each owning a disjoint hash slice of the key
    space (`hashing.stable_bucket` routing — the same fixed-key hash used
    by every shuffle in this repo, so routing is deterministic and a key
    always lands on the same shard).
  * Shards store a key -> min(int64 value) map with commutative,
    idempotent updates (`offer_min`): update order across concurrent
    callers CANNOT change the fixpoint, which is what makes a two-phase
    offer-then-probe pipeline deterministic even though Ray Data schedules
    blocks in any order.
  * Actors request `num_cpus=0.05`: the index is memory, not compute — it
    must not steal scheduling slots from the map stages that call it.
  * At 100 TB the per-shard dict becomes the bounded resource: shards scale
    horizontally (num_shards), each holds only its hash slice, and `dump()`
    spills a shard's contents as an Arrow table for persistence; nodes hold
    shards, not replicas, so memory is |distinct keys| / N per actor.

Used by `canonical_min_keep`: global min-id-per-key canonical selection in
two streaming passes with NO shuffle — pass 1 offers per-batch (key, min
id) partials to the shards, pass 2 keeps rows whose id equals the global
minimum. The same built index can then decontaminate a SECOND dataset
(`filter_members`) without rescanning the first — mutable cross-pipeline
state, which no pure Dataset lineage can provide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from tesseract_recognize_ray.hashing import stable_bucket


@ray.remote(num_cpus=0.05)
class _KeyShard:
    """One hash slice of the index: key -> min int64 value."""

    def __init__(self) -> None:
        self._min: dict = {}

    def offer_min(self, keys: list, vals: np.ndarray) -> int:
        d = self._min
        for k, v in zip(keys, vals):
            prev = d.get(k)
            if prev is None or v < prev:
                d[k] = v
        return len(d)

    def get_min(self, keys: list) -> np.ndarray:
        d = self._min
        return np.array([d.get(k, -1) for k in keys], dtype=np.int64)

    def contains(self, keys: list) -> np.ndarray:
        d = self._min
        return np.fromiter((k in d for k in keys), dtype=bool, count=len(keys))

    def size(self) -> int:
        return len(self._min)

    def dump(self) -> pa.Table:
        # key type INFERRED (string or int keys both live in the dict);
        # forcing pa.string() would crash save() for integer key domains
        keys = list(self._min.keys())
        try:
            karr = pa.array(keys)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            karr = pa.array([None if k is None else str(k) for k in keys], pa.string())
        return pa.table(
            {"key": karr, "value": pa.array(list(self._min.values()), pa.int64())}
        )


class ShardedMinIndex:
    """Client handle: routes vectorized offer/lookup calls to shard actors.

    Serializable into map_batches closures (actor handles pickle); every
    call groups its batch by destination shard so each actor receives ONE
    message per (batch, shard) pair, not per key."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self._shards = [_KeyShard.remote() for _ in range(num_shards)]

    def _route(self, keys: pd.Series) -> np.ndarray:
        return stable_bucket(keys, self.num_shards)

    def offer_min(self, keys: pd.Series, vals: np.ndarray) -> None:
        sh = self._route(keys)
        refs = []
        kv = keys.to_numpy()
        for s in np.unique(sh):
            m = sh == s
            refs.append(self._shards[s].offer_min.remote(kv[m].tolist(), vals[m]))
        ray.get(refs)

    def get_min(self, keys: pd.Series) -> np.ndarray:
        sh = self._route(keys)
        out = np.empty(len(keys), dtype=np.int64)
        kv = keys.to_numpy()
        pend = []
        for s in np.unique(sh):
            m = sh == s
            pend.append((m, self._shards[s].get_min.remote(kv[m].tolist())))
        for m, ref in pend:
            out[m] = ray.get(ref)
        return out

    def contains(self, keys: pd.Series) -> np.ndarray:
        """Membership mask — the presence test filter_members uses (unlike
        get_min's -1 sentinel it cannot be confused by negative values)."""
        sh = self._route(keys)
        out = np.empty(len(keys), dtype=bool)
        kv = keys.to_numpy()
        pend = []
        for s in np.unique(sh):
            m = sh == s
            pend.append((m, self._shards[s].contains.remote(kv[m].tolist())))
        for m, ref in pend:
            out[m] = ray.get(ref)
        return out

    def total(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self._shards])))

    def dump(self) -> pa.Table:
        parts = ray.get([s.dump.remote() for s in self._shards])
        nonempty = [t for t in parts if t.num_rows]  # empty shards infer a
        if not nonempty:  # null key type that would poison the concat
            return pa.table({"key": pa.array([], pa.string()), "value": pa.array([], pa.int64())})
        return pa.concat_tables(nonempty)

    def save(self, path: str) -> int:
        """Persist the whole map as one parquet file (key, value); returns
        row count. Pair with ``load`` for cross-RUN state: a later pipeline
        run restores the index and keeps deduplicating against it without
        rescanning earlier corpora."""
        import pyarrow.parquet as pq

        t = self.dump()
        pq.write_table(t, path)
        return t.num_rows

    @classmethod
    def load(cls, path: str, num_shards: int = 8) -> "ShardedMinIndex":
        """Restore a saved index into fresh shard actors (keys re-route via
        the same stable hash, so a different num_shards is fine)."""
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        idx = cls(num_shards)
        if t.num_rows:
            keys = t.column("key").to_pandas()
            keys = keys.where(keys.notna(), None)
            idx.offer_min(keys, t.column("value").to_numpy(zero_copy_only=False).astype(np.int64))
        return idx


def canonical_min_keep(
    ds: Dataset, key_col: str, id_col: str, num_shards: int = 8
) -> tuple[Dataset, ShardedMinIndex]:
    """Keep exactly the min-`id_col` row per distinct `key_col` value via a
    sharded mutable index — NO shuffle touches the data rows; only (key,
    min-id) partials (pre-reduced per batch) travel as actor messages.

    Phase 1 (executed eagerly here): every batch offers its per-key min id;
    offers are commutative+idempotent, so block scheduling order is
    irrelevant. Phase 2 (returned lazily): re-scan keeps rows whose id
    equals the global min. Also returns the live index so follow-up
    pipelines can probe it (`index.get_min`) — e.g. cross-corpus
    decontamination without rescanning this dataset."""
    index = ShardedMinIndex(num_shards)

    def offer(b: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL's PARTITION BY keeps the NULL group; keys are
        # canonicalized to None (a singleton — NaN dict keys are identity-
        # unstable) so routing and shard lookups stay consistent
        keyed = b[key_col].where(b[key_col].notna(), None)
        part = b.assign(**{key_col: keyed}).groupby(key_col, sort=False, dropna=False)[id_col].min()
        index.offer_min(part.index.to_series(), part.to_numpy().astype(np.int64))
        return pd.DataFrame({"n": [len(part)]})

    # drain phase 1 fully before anyone can probe
    for _ in ds.map_batches(offer, batch_format="pandas").iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        pass

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        keyed = b[key_col].where(b[key_col].notna(), None)
        winners = index.get_min(keyed)
        return b[b[id_col].to_numpy().astype(np.int64) == winners]

    return ds.map_batches(keep, batch_format="pandas"), index


def filter_members(
    ds: Dataset, key_col: str, index: ShardedMinIndex, keep_matches: bool
) -> Dataset:
    """Semi/anti filter of a (different) dataset against an already-built
    index: keep rows whose key is (not) present. The cross-pipeline read
    path of the mutable index."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        keyed = b[key_col].where(b[key_col].notna(), None)
        present = index.contains(keyed)
        return b[present if keep_matches else ~present]

    return ds.map_batches(fn, batch_format="pandas")
