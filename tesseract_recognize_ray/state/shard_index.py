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

from tesseract_recognize_ray.hashing import stable_bucket_table


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


def _canon_keys(values) -> pa.Array:
    """Canonicalize a key column to an Arrow array with identity-stable
    values: nulls become Arrow nulls (never NaN), and a float column whose
    non-null values are all integral is cast back to int64 — reversing the
    pandas seam where an int64 column that carries nulls in SOME batches
    arrives float64 (so key 5 would otherwise enter the dict as 5.0 in one
    batch and 5 in another, and route to two different shards)."""
    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    else:
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        arr = pa.Array.from_pandas(s)  # NaN -> null for float dtypes
    if pa.types.is_floating(arr.type):
        import pyarrow.compute as pc

        valid = pc.drop_null(arr)
        if len(valid) == 0 or pc.all(pc.equal(valid, pc.floor(valid))).as_py():
            try:
                arr = pc.cast(arr, pa.int64())
            except pa.ArrowInvalid:
                pass  # out of int64 range: keep float keys as-is
    return arr


class ShardedMinIndex:
    """Client handle: routes vectorized offer/lookup calls to shard actors.

    Serializable into map_batches closures (actor handles pickle); every
    call groups its batch by destination shard so each actor receives ONE
    message per (batch, shard) pair, not per key. Keys are canonicalized
    Arrow-side (``_canon_keys``) and routed via ``stable_bucket_table`` so a
    nullable-int key hashes identically in null-carrying and null-free
    batches; dict keys on the shards are Python int/str/None (to_pylist),
    never NaN."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self._shards = [_KeyShard.remote() for _ in range(num_shards)]

    def _route(self, keys: pa.Array) -> np.ndarray:
        return stable_bucket_table(pa.table({"k": keys}), ["k"], self.num_shards)

    def offer_min(self, keys, vals: np.ndarray) -> None:
        karr = _canon_keys(keys)
        sh = self._route(karr)
        kv = karr.to_pylist()
        refs = []
        for s in np.unique(sh):
            m = sh == s
            refs.append(
                self._shards[s].offer_min.remote(
                    [kv[i] for i in np.flatnonzero(m)], vals[m]
                )
            )
        ray.get(refs)

    def get_min(self, keys) -> np.ndarray:
        karr = _canon_keys(keys)
        sh = self._route(karr)
        out = np.empty(len(karr), dtype=np.int64)
        kv = karr.to_pylist()
        pend = []
        for s in np.unique(sh):
            m = sh == s
            pend.append((m, self._shards[s].get_min.remote([kv[i] for i in np.flatnonzero(m)])))
        for m, ref in pend:
            out[m] = ray.get(ref)
        return out

    def contains(self, keys) -> np.ndarray:
        """Membership mask — the presence test filter_members uses (unlike
        get_min's -1 sentinel it cannot be confused by negative values)."""
        karr = _canon_keys(keys)
        sh = self._route(karr)
        out = np.empty(len(karr), dtype=bool)
        kv = karr.to_pylist()
        pend = []
        for s in np.unique(sh):
            m = sh == s
            pend.append((m, self._shards[s].contains.remote([kv[i] for i in np.flatnonzero(m)])))
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
            # pass the Arrow column straight through — offer_min canonicalizes
            idx.offer_min(
                t.column("key"),
                t.column("value").to_numpy(zero_copy_only=False).astype(np.int64),
            )
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

    def offer(b: pa.Table) -> pa.Table:
        # pyarrow batch format: a nullable-int key column stays int64-with-
        # nulls end to end (the pandas seam would coerce it to float64 in
        # null-carrying batches and split one key across two shards). Arrow
        # group_by keeps the null group, matching SQL PARTITION BY.
        part = b.select([key_col, id_col]).group_by(key_col).aggregate([(id_col, "min")])
        index.offer_min(
            part.column(key_col),
            part.column(f"{id_col}_min").to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"n": pa.array([len(part)], pa.int64())})

    # drain phase 1 fully before anyone can probe
    for _ in ds.map_batches(offer, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        pass

    def keep(b: pa.Table) -> pa.Table:
        winners = index.get_min(b.column(key_col))
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(ids == winners))

    return ds.map_batches(keep, batch_format="pyarrow"), index


def filter_members(
    ds: Dataset, key_col: str, index: ShardedMinIndex, keep_matches: bool
) -> Dataset:
    """Semi/anti filter of a (different) dataset against an already-built
    index: keep rows whose key is (not) present. The cross-pipeline read
    path of the mutable index."""

    def fn(b: pa.Table) -> pa.Table:
        present = index.contains(b.column(key_col))
        return b.filter(pa.array(present if keep_matches else ~present))

    return ds.map_batches(fn, batch_format="pyarrow")
